package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop plan inspector: print a declared query's physical plan (plus a
  * ReusedExchange count — the quick tell for self-joins silently recomputing
  * a shared subtree). `runMain graft.PlanDump <query> <sfDir>`. The durable
  * plan contracts live in PlanSpec; this is for poking at one query fast. */
object PlanDump {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    val df = SparkEntry.queries(a(0))(spark, a(1))
    val p = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE=" + p.linesIterator.count(_.contains("ReusedExchange")))
    println(p.take(4000))
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Batch plan capture for the optimization rounds: write every named query's
  * `.explain("formatted")` output to `<outDir>/<query>_<tag>.txt`.
  * Usage: runMain graft.PlanDumpAll <sfDir> <outDir> <tag> <q1,q2,...|all>
  * Plans are captured AFTER a warmup execution of the query (content-keyed
  * store/index builds land in the warmup, matching what the bench times), so
  * the dumped plan is the steady-state probe plan, not the one-time build. */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args
    val wanted: Seq[String] =
      if (names == "all") SparkEntry.queries.keys.toSeq.sorted
      else names.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    wanted.foreach { name =>
      val fn = SparkEntry.queries(name)
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warmup
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"dumped $name")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Flagship smoke: runs `SparkEntry.entry` (the driver's rows>0 check) and
  * prints the row count. `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("FLAGSHIP_ROWS=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}

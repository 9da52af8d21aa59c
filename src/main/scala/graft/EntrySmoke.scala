package graft

import org.apache.spark.sql.SparkSession

/** Flagship smoke: run [[SparkEntry.entry]] the way the driver does (normal
  * classloader — `sbt console`'s REPL wrapper breaks case-class TypeTags) and
  * print the row count. Usage: sbt "runMain graft.EntrySmoke". */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("FLAGSHIP_ROWS=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}

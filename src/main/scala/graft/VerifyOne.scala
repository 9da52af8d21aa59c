package graft

import org.apache.spark.sql.SparkSession

/** Dump one (or a few) declared queries + their oracle SQL for a fast local
  * oracle_check.py cycle without re-running the whole Verify surface.
  * Usage: sbt "runMain graft.VerifyOne <sfDir> <outDir> <query>[,<query>...]" */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(',').toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    wanted.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    val entries = wanted.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
    val json = entries.map { case (n, sql) =>
      "\"" + n + "\": " + Verify.jsonQuote(sql)
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}

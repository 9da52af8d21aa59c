package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a scale-factor directory.
  *
  * Mirrors the reference's corpus loaders (reference: streams/loaders.py:15-55 reads
  * line-aligned text files; here the driver-generated parquet star schema plus the
  * `documents`/`embeddings` corpus stands in — see TESTDATA.md / FIXTURES.md).
  *
  * Scale note: a plain `spark.read.parquet` keeps partition discovery, predicate
  * pushdown and column pruning in Catalyst's hands — at 100 TB these tables would be
  * directory trees of many files and the same call parallelizes across executors.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from `sfDir`. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "embeddings")

  /** The events table with `ts` normalized to session-TZ TimestampType.
    *
    * The generator wrote nanosecond-precision timestamps; depending on reader
    * config Spark surfaces them as TIMESTAMP(_NTZ) or (with
    * `spark.sql.legacy.parquet.nanosAsLong`) as LongType nanos. Normalize all
    * three to TimestampType (µs) so downstream event-time ops are uniform. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val path = s"$sfDir/events.parquet"
    val df =
      try spark.read.parquet(path)
      catch {
        case e: Throwable if String.valueOf(e.getMessage).contains("NANOS") =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
      }
    df.schema("ts").dataType match {
      case LongType => // nanos as long → truncate to micros (integer div)
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "lineitem")

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "orders")

  def customer(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "customer")

  def nation(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "nation")

  def region(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "region")

  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "supplier")

  def part(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "part")
}

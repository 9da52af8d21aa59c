package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-only table statistics: COUNT / MIN / MAX answered from parquet
  * footers, never from the data pages. At 100 TB "how many rows, what key
  * range" must not cost a table scan — every parquet file already carries
  * exact row counts and per-column min/max in its footer, and Spark's V2
  * parquet source pushes whole-table count/min/max aggregates down to
  * those footers (`PushedAggregation` on the scan, pinned in StatsSpec).
  * The job reads footer bytes only: seconds, not hours, on a 100 TB table.
  *
  * The V2 read path is opted into just for this plan (the engine's default
  * V1 path keeps its own pushdown/pruning contracts elsewhere), and the
  * result — one row, model-sized by definition — is materialized before the
  * session flags are restored. */
object Stats {

  /** Run `body` with the V2 source + aggregate-pushdown flags on, restoring
    * both afterwards. Everything the body builds must also EXECUTE inside
    * it — a plan resolved later would miss the flags. */
  private def withPushdownFlags[T](spark: SparkSession)(body: => T): T = {
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    val prevAgg = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try body
    finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      prevAgg match {
        case Some(v) => spark.conf.set("spark.sql.parquet.aggregatePushdown", v)
        case None => spark.conf.unset("spark.sql.parquet.aggregatePushdown")
      }
    }
  }

  private def statsAgg(spark: SparkSession, sfDir: String, name: String,
                       cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    Tables(spark, sfDir, name).agg(aggs.head, aggs.tail: _*)
  }

  /** (n_rows, min_<c>, max_<c> for each of `cols`) of `sfDir/name.parquet`,
    * computed from footers. Falls back transparently to a normal scan only
    * if the format can't serve a column from stats (e.g. nested types) —
    * same answer, different cost. */
  def tableStats(spark: SparkSession, sfDir: String, name: String,
                 cols: Seq[String]): DataFrame =
    withPushdownFlags(spark) {
      val df = statsAgg(spark, sfDir, name, cols)
      val rows: Array[Row] = df.collect() // materialize under the V2 flags
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), df.schema)
    }

  /** The plan the stats run under (for contract tests): built with the same
    * V2 + pushdown flags, returned WITHOUT executing. */
  private[graft] def statsPlan(spark: SparkSession, sfDir: String,
                               name: String, cols: Seq[String]): String =
    withPushdownFlags(spark) {
      statsAgg(spark, sfDir, name, cols)
        .queryExecution.executedPlan.toString
    }
}

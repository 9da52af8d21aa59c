package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Drift, Metrics}
import graft.queries.{Corpus, Pipelines, Relational}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory (SURVEY §2); every entry
  * with a DuckDB-expressible semantic also appears in `oracleSql` with an exact
  * SQL twin (same column names, same casts, same rounding) for the driver's
  * hash-match correctness gate.
  */
object SparkEntry {

  /** Flagship: the Q-drift-gradual spine (SURVEY §2.8) at sf0.001 —
    * embeddings scan → deterministic scoring → per-batch accuracy (A4/ST2) →
    * faithful sequential DDM (ST1). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val feed = Corpus.batchAccuracyDf(spark, dir)
      .withColumn("err", lit(1.0) - col("accuracy"))
      .withColumn("det", lit("flagship"))
    Drift.ddmSequential(feed, "det", "batch_id", "err")
  }

  /** One entry per implemented operator from SURVEY §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Corpus.queries ++ Pipelines.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (xxhash64-based
    * sketches, SVD, approximate search variants) → rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Corpus.oracles ++ Pipelines.oracles
}

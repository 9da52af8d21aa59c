package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{AdaptQueries, Corpus, MLQueries, MultimodalQueries, Pipelines, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory (SURVEY §2); every entry
  * with a DuckDB-expressible semantic also appears in `oracleSql` with an exact
  * SQL twin (same column names, same casts, same rounding) for the driver's
  * hash-match correctness gate.
  */
object SparkEntry {

  /** Flagship: the Q-drift-unsup experiment (SURVEY §2.8 / ST3) at sf0.001 —
    * Gaussian-NB fit on the training split, pseudo-labels materialized from its
    * own predictions, the shifted stream scored against them, per-batch
    * agreement feed, faithful shared-state DDM across the phase boundary
    * (drift fires shortly after the embedding-space swap). */
  def entry(spark: SparkSession): DataFrame =
    MLQueries.driftUnsupSignals(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY §2. Each entry applies
    * [[Tuning.sessionDefaults]] first (local-FS listing threshold, guide §6)
    * so every consumer — bench, verify, tests — runs under the same
    * env-parameterised session tuning without touching the bench harness. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Relational.queries ++ Corpus.queries ++ Pipelines.queries ++ MLQueries.queries ++ AdaptQueries.queries ++ MultimodalQueries.queries)
      .map { case (name, fn) =>
        name -> { (spark: SparkSession, dir: String) =>
          Tuning.sessionDefaults(spark); fn(spark, dir)
        }
      }

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (xxhash64-based
    * sketches, SVD, approximate search variants) → rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Corpus.oracles ++ Pipelines.oracles ++ MLQueries.oracles ++ AdaptQueries.oracles ++ MultimodalQueries.oracles
}

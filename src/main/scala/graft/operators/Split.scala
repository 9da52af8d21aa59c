package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test splitting + epoch restart (SURVEY A9/ST6).
  *
  * Reference: `train_test_split(test_size=0.2)` on stream preparation
  * (streams/stream_data.py:91-94) and `restart()` with optional reshuffle
  * (`:101-114`). In Spark the split is `randomSplit` (seeded → reproducible for
  * a fixed partitioning); an epoch restart is a re-execution of the batch
  * query, and a reshuffling restart is the same split with a new seed. */
object Split {

  /** Seeded 80/20 split (reference default test_size=0.2). */
  def trainTest(df: DataFrame, seed: Long, testFraction: Double = 0.2)
    : (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(
      Array(1.0 - testFraction, testFraction), seed)
    (train, test)
  }

  /** Percent bucket (0..99) of a row key under `seed`: the Bernoulli-split
    * assignment primitive. xxhash64 is fully deterministic in (key, seed), so
    * the split is reproducible under any partitioning or row order — unlike
    * `randomSplit`, whose row membership shifts with the physical layout —
    * and replayable by other engines (the DuckDB oracle re-derives it). */
  def hashBucket(id: Column, seed: Long): Column =
    pmod(xxhash64(id, lit(seed)), lit(100L))

  /** Hash-based seeded Bernoulli split on a key column: test ⇔
    * `hashBucket < testPct`. Train/test are complementary filters over the
    * same scan — structurally disjoint and exhaustive, no shuffle, no
    * cached sampling state; at 100 TB each side is a plain filtered scan. */
  def hashSplit(df: DataFrame, idCol: String, seed: Long, testPct: Int = 20)
    : (DataFrame, DataFrame) = {
    require(testPct > 0 && testPct < 100, s"testPct in (0,100), got $testPct")
    val b = hashBucket(col(idCol), seed)
    (df.filter(b >= lit(testPct.toLong)), df.filter(b < lit(testPct.toLong)))
  }

  /** ST6 epoch restart: epoch i's view of the data. `reshuffle = false`
    * reproduces the identical split each epoch (reference shuffle=False path);
    * `reshuffle = true` derives a fresh seed per epoch. */
  def epoch(df: DataFrame, baseSeed: Long, epochIdx: Int, reshuffle: Boolean)
    : (DataFrame, DataFrame) = {
    val seed = if (reshuffle) baseSeed + epochIdx else baseSeed
    trainTest(df, seed)
  }
}

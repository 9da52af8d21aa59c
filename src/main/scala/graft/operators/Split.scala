package graft.operators

import org.apache.spark.sql.DataFrame

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

  /** ST6 epoch restart: epoch i's view of the data. `reshuffle = false`
    * reproduces the identical split each epoch (reference shuffle=False path);
    * `reshuffle = true` derives a fresh seed per epoch. */
  def epoch(df: DataFrame, baseSeed: Long, epochIdx: Int, reshuffle: Boolean)
    : (DataFrame, DataFrame) = {
    val seed = if (reshuffle) baseSeed + epochIdx else baseSeed
    trainTest(df, seed)
  }
}

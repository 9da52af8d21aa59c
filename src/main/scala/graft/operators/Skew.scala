package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot join/aggregation keys.
  *
  * AQE's skew-join handling (on by default in Spark 4) splits oversized
  * shuffle partitions at runtime and is the first line of defense. These
  * explicit operators cover the cases AQE cannot re-plan:
  *
  *  - a hot key inside a `countDistinct` (the distinct pre-aggregation
  *    itself skews, not the join partition), and
  *  - a replicated ("salted") join where the build side must be cloned per
  *    salt because the probe side's hot key is fundamental to the data, not
  *    an artifact of partition sizing (e.g. a power-law `user_id` at 100 TB
  *    where one user is 10% of all rows).
  *
  * Everything is deterministic — salts come from `xxhash64` of row content,
  * never `rand()` — so results are reproducible and retry-safe (a re-executed
  * task re-derives identical salts, which a `rand()` salt does not guarantee
  * under speculative execution).
  */
object Skew {

  /** Equi-join `left ⋈ right` on `keys`, with the left (probe/skewed) side
    * salted into `numSalts` sub-keys and the right (smaller) side replicated
    * once per salt. The shuffle then spreads each hot key over `numSalts`
    * partitions instead of one. Right-side rows multiply by `numSalts` —
    * keep it the smaller input (but too big to broadcast, else just
    * `broadcast()` it and skip salting entirely).
    *
    * The left salt hashes all left columns, so rows of the same hot key
    * scatter uniformly; correctness needs only that each left row meets every
    * right row of its key in exactly one salt bucket, which replication
    * guarantees. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 numSalts: Int): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val lSalt = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(numSalts))
    val l = left.withColumn("__salt", lSalt)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Hot-key-only salted join — the production form of [[saltedJoin]]:
    * replication cost proportional to the skew, not to the table.
    *
    * One partial+final count aggregate over the left side finds the keys
    * with ≥ `hotThreshold` rows (map-side combine means the hot key itself
    * costs the count nothing); that key dim is small by the definition of
    * "hot", so it broadcasts to tag both sides. Hot left rows scatter over
    * `numSalts` salt buckets and hot right rows replicate `numSalts`×; cold
    * keys pass through in salt bucket 0 with NO replication. With no hot
    * keys the plan degrades to the plain join plus one broadcast of an
    * empty dim. */
  def saltedJoinSkewed(left: DataFrame, right: DataFrame, keys: Seq[String],
                       numSalts: Int, hotThreshold: Long): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val hot = left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") >= hotThreshold)
      .select(keys.map(col) :+ lit(true).as("__hot"): _*)
    val lSalt = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(numSalts))
    val l = left.join(broadcast(hot), keys, "left")
      .withColumn("__salt",
        when(col("__hot"), lSalt).otherwise(lit(0L)))
      .drop("__hot")
    val r = right.join(broadcast(hot), keys, "left")
      .withColumn("__salt", explode(sequence(lit(0L),
        when(col("__hot"), lit(numSalts - 1L)).otherwise(lit(0L)))))
      .drop("__hot")
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Exact per-group distinct counts with the distinct pre-aggregation salted:
    * stage 1 groups by (key, hash(value) % numSalts) so each distinct value
    * lands in exactly one salt bucket; stage 2 sums the per-bucket distinct
    * counts. A hot group's distinct set is then built across `numSalts`
    * reducers instead of one. Returns (keys..., n_distinct). */
  def saltedDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
                          numSalts: Int): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    df.select(keys.map(col) :+ col(valueCol): _*)
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(numSalts)))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(countDistinct(col(valueCol)).as("__part"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__part").as("n_distinct"))
  }
}

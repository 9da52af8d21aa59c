package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join — the remaining absent join category from
  * SURVEY §2.3 after [[AsOfJoin]].
  *
  * Problem: `l JOIN r ON l.key = r.key AND l.t BETWEEN r.lo AND r.hi` has no
  * equi-join on the range predicate, so Spark falls back to
  * BroadcastNestedLoopJoin (needs a broadcastable side) or a key-only join
  * that explodes hot keys before filtering.
  *
  * Technique: quantize time into fixed-width bands. Each point row gets its
  * single band `floor(t / w)`; each interval row is exploded to every band it
  * overlaps (`floor(lo/w) .. floor(hi/w)` — `(hi-lo)/w + 2` rows at most).
  * The join becomes an equi-join on (key, band) followed by the exact range
  * filter. Every qualifying (point, interval) pair meets in EXACTLY one band
  * — the point's — so no dedup is needed. Both sides shuffle-partition on
  * (key, band): hot keys spread across bands, and interval replication is
  * bounded by the band width you choose (band ≈ typical interval length ⇒
  * ~2 bands per interval).
  */
object RangeJoin {

  /** Join point rows to interval rows on `keys` with
    * `pointTime BETWEEN lo AND hi` (inclusive both ends). All three bound
    * columns must be comparable longs (e.g. `unix_micros(ts)`); `bandWidth`
    * is in the same unit. Right non-key columns ride along as payload
    * (names must not collide with left's). */
  def bandedIntervalJoin(points: DataFrame, intervals: DataFrame,
                         keys: Seq[String], pointTime: String,
                         lo: String, hi: String, bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val payload = intervals.columns.filterNot(keys.contains).toSeq
    val collisions = points.columns.toSet.intersect(payload.toSet)
    require(collisions.isEmpty,
      s"interval payload columns collide with point columns: ${collisions.mkString(", ")}")

    val p = points.withColumn("__band", floor(col(pointTime) / bandWidth))
    val iv = intervals.withColumn("__band",
      explode(sequence(floor(col(lo) / bandWidth).cast("long"),
        floor(col(hi) / bandWidth).cast("long"))))
    p.join(iv, keys :+ "__band")
      .filter(col(pointTime) >= col(lo) && col(pointTime) <= col(hi))
      .drop("__band")
  }
}

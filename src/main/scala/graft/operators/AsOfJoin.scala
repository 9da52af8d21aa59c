package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series join the reference's positional
  * alignments gesture at (SURVEY §2.3 lists as-of among the absent join
  * categories; this makes it a first-class engine operator).
  *
  * For each left row, attach the right row with the greatest right-time ≤ the
  * left row's time, per key. Implemented as the union + keyed-window technique:
  * tag both sides, union, sort within each key by (event time, side) and carry
  * the latest non-null right payload forward with `last(..., ignoreNulls)`.
  *
  * Scale properties: exactly ONE shuffle (the window's partitionBy on the key)
  * — no range cross-product, no per-row binary search, no broadcast
  * requirement on either side; both inputs stream through sorted partitions.
  * A pathologically hot key serializes within its partition (the usual
  * window-function caveat); salt upstream if a key holds a large fraction of
  * all rows.
  *
  * Contract: `right` must expose the key columns plus a time column named
  * `rightTime`; every other right column rides along as payload. Payload
  * names must not collide with left columns (rename upfront). Ties at the
  * exact same timestamp take the right row (inclusive ≤), matching DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t` semantics the oracle replays.
  */
object AsOfJoin {

  /** Inner backward as-of join (left rows with no prior right row dropped).
    * Set `keepUnmatched = true` for the LEFT ASOF variant. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               keepUnmatched: Boolean = false): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq
    require(payload.contains(rightTime),
      s"right side must carry its time column '$rightTime'")
    val collisions = left.columns.toSet.intersect(payload.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: ${collisions.mkString(", ")}")

    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    val lTagged = left.select(
      left.columns.map(col).toSeq ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        lit(1).as("__side"): _*)
    val rTagged = right.select(
      keys.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col) :+ lit(0).as("__side"): _*)

    // each row's event time: left rows carry leftTime, right rows rightTime
    val eventTime = coalesce(col(leftTime), col(rightTime))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(eventTime.asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged).select(
      keys.map(col) ++ leftOnly.map(col) ++
        payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
        col("__side"): _*)
    val matched = filled.filter(col("__side") === 1).drop("__side")
    if (keepUnmatched) matched else matched.filter(col(rightTime).isNotNull)
  }
}

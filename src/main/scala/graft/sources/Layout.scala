package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side clustering that makes 100 TB scans
  * cheap. Parquet keeps per-row-group min/max statistics for every column;
  * a reader skips any row group (and any whole file) whose stats exclude the
  * predicate. That skipping is only worth anything if the writer CLUSTERED
  * the data so each file covers a narrow value range — which is a layout
  * decision, made once at write time, exactly like bucketing
  * ([[Bucketed]]) is for joins.
  *
  *  - [[clusteredWrite]]: range-partition by a sort key and sort within each
  *    partition — every output file covers a disjoint key interval, so a
  *    point or range predicate touches ~1 file in N (pinned by LayoutSpec's
  *    per-file min/max disjointness check).
  *  - [[zorder]]: Morton interleave of two dimensions into one sort key, so
  *    ONE clustered layout serves range predicates on EITHER dimension (the
  *    multi-dimensional OPTIMIZE ZORDER layout in lakehouse engines) —
  *    points close in z-value are close in both coordinates, so each file's
  *    min/max z-interval maps to a bounded rectangle of the key space.
  *
  * Both are plain codegen'd column arithmetic + a standard range shuffle —
  * nothing driver-side, nothing proportional to data size beyond the one
  * write pass. [zorder SQL twin: the same spread-bits arithmetic in the
  * `layout_zorder` oracle.]
  */
object Layout {

  /** Spread the low 31 bits of `x` to the even bit positions 0,2,…,60 of a
    * long — the classic 5-step mask-and-shift Morton spread, all codegen'd
    * built-ins (no UDF, no loop). */
  private def spreadBits(x: Column): Column = {
    val masked = x.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
    Seq(
      (16, 0x0000FFFF0000FFFFL),
      (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L)
    ).foldLeft(masked) { case (acc, (shift, mask)) =>
      acc.bitwiseOR(shiftleft(acc, shift)).bitwiseAND(lit(mask))
    }
  }

  /** Morton (z-order) interleave of two non-negative dimensions (each taken
    * mod 2³¹): a's bits land on even positions, b's on odd — a 62-bit sort
    * key, never negative. */
  def zorder(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Write `df` clustered by `sortCol` into ~`numFiles` files at `dir`:
    * range-partition (sampled range bounds — one extra pass over the sort
    * key only), sort within each partition, write one file per partition.
    * Every output file then covers a disjoint `sortCol` interval, so
    * predicate-pushdown skips all but the matching files' row groups. */
  def clusteredWrite(df: DataFrame, sortCol: String, numFiles: Int,
                     dir: String): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dir)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed per-key rank / running sum for LOW-CARDINALITY keys — the
  * skew-proof replacement for `Window.partitionBy(key)` when `key` is a
  * language, source, or phase (r13 verdict: a hash-partitioned window on a
  * |langs|-cardinality key puts an entire language — half a 100 TB corpus —
  * into ONE task's sort).
  *
  * The shape is [[Pack.packByBudget]]'s two-pass prefix composition,
  * generalized to any (key, order) pair:
  *
  *  1. `repartitionByRange(key, order…)` — the sort spreads over ALL
  *     partitions (a hot key spans many range partitions instead of
  *     hashing into one), `sortWithinPartitions` + `spark_partition_id()`
  *     freeze the layout behind a localCheckpoint so both passes see the
  *     same pid assignment.
  *  2. per-(key, pid) counts/sums — a tiny combinable aggregate — collect
  *     to the driver (bounded: see `maxOffsetRows`), prefix-scan into
  *     per-(key, pid) offsets, broadcast back.
  *  3. the rank/cumsum window partitions by (pid, key) — every physical
  *     partition ranks its slice in parallel; offset + local rank composes
  *     the exact global-within-key value.
  *
  * Results are bit-identical to the single-window form whenever the order
  * is total within a key (callers tie-break on a unique id) and the summed
  * value is integral — both are engine invariants here, so the DuckDB
  * oracles keep replaying the plain `OVER (PARTITION BY key ORDER BY …)`
  * window. */
object KeyedRank {

  /** Driver-side total order over collected key values: nulls first (any
    * consistent grouping order works — the offsets are joined back by
    * value, never by position), then the type's natural order. Only used
    * to re-group the tiny offset table after an unordered collect. */
  private def anyCompare(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _)    => -1
    case (_, null)    => 1
    case (x: Comparable[_], y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
    case (x, y) => x.toString.compareTo(y.toString)
  }

  /** The frozen range layout (pass 1): range-partitioned on (key, order…),
    * sorted within partitions, tagged with the physical partition id.
    * Exposed for plan pins — the scale property is that the exchange here
    * is RANGE partitioning on (key, order), never hash partitioning on the
    * low-cardinality key alone. */
  private[graft] def rangeLayout(df: DataFrame, keyCol: String,
                                 orderCols: Seq[Column]): DataFrame = {
    val sortCols = col(keyCol) +: orderCols
    df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
  }

  /** Adds to `df` a global-within-key rank column (`rn`, 1-based, long),
    * and/or an inclusive running sum of `cum._1` (`cum._2`, long), and
    * optionally the per-key row count (`keyTotal`) — all ordered by
    * `orderCols` within `keyCol`, none of it through a key-partitioned
    * window.
    *
    * The driver-side offset table holds one row per (key, touched range
    * partition); the collect is HARD-bounded by `maxOffsetRows` (limit + 1
    * then a loud require — the [[Pack.packByBudgetKeyed]] bounded-collect
    * contract without its extra distinct-count job). Low-cardinality keys
    * keep it model-sized: |keys| × partitions. */
  def rankCumsum(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                 rn: Option[String] = None,
                 cum: Option[(String, String)] = None,
                 keyTotal: Option[String] = None,
                 maxOffsetRows: Int = 1 << 20,
                 materializeInput: Boolean = true,
                 layoutLevel: Option[StorageLevel] = None): DataFrame = {
    require(rn.isDefined || cum.isDefined || keyTotal.isDefined,
      "rankCumsum: nothing to compute")
    val spark = df.sparkSession
    val outCols = df.columns.toSeq
    // repartitionByRange SAMPLES its child to pick boundaries, so the input
    // executes twice (sample pass + shuffle pass) with no exchange reuse —
    // measured 5× on the bigram-LM chain at sf1. `materializeInput` (the
    // safe default) checkpoints the input once to pay the chain once; pass
    // FALSE when the input is already cheap to recompute — a parquet scan
    // projection or an upstream checkpoint/memo — where re-sampling costs a
    // fraction of a scan and a second in-memory copy of a corpus-sized
    // narrow frame is the worse trade at 100 TB.
    // Both frozen copies (the materialized input and the range layout) are
    // memory-resident by default; `layoutLevel` lets a caller holding a
    // corpus-sized frame on a memory-tight cluster push them to
    // DISK_ONLY instead (same SessionMemo-style trade: pay IO, not OOM).
    def freeze(d: DataFrame): DataFrame = layoutLevel match {
      case Some(lvl) => d.localCheckpoint(true, lvl)
      case None      => d.localCheckpoint()
    }
    val input = if (materializeInput) freeze(df) else df
    // pass 1: freeze the range layout — both passes below must see the
    // same physical pid assignment
    val sorted = freeze(rangeLayout(input, keyCol, orderCols))
    // pass 2: per-(key, pid) partials — combinable agg, bounded collect.
    // No cluster-side orderBy: the frame is tiny (|keys| × partitions) but
    // a global sort still costs an extra exchange + job; the (key, pid)
    // ordering the prefix scan needs is re-established driver-side.
    val aggs = count(lit(1)).as("__gr_pn") +:
      cum.toSeq.map { case (v, _) => sum(col(v).cast("long")).as("__gr_ps") }
    val totalsRaw = sorted.groupBy(col(keyCol), col("__gr_pid"))
      .agg(aggs.head, aggs.tail: _*)
      .limit(maxOffsetRows + 1)
      .collect()
    val totals = totalsRaw.sortWith { (a, b) =>
      val kc = anyCompare(a.get(0), b.get(0))
      if (kc != 0) kc < 0 else a.getInt(1) < b.getInt(1)
    }
    require(totals.length <= maxOffsetRows,
      s"rankCumsum: over $maxOffsetRows (key='$keyCol', partition) offset " +
        "rows — this helper is for LOW-cardinality keys; a corpus-sized key " +
        "wants a per-group window or Pack.packByBudget, not a driver table")
    // driver prefix scan: offsets per (key, pid) + per-key grand totals
    // (rows arrive sorted by (key, pid); null keys group together)
    val offs = scala.collection.mutable.ArrayBuffer[(Any, Int, Long, Long)]()
    val keyN = scala.collection.mutable.LinkedHashMap[Any, Long]()
    var curKey: Any = null
    var first = true
    var cAcc = 0L
    var sAcc = 0L
    totals.foreach { r =>
      val k = r.get(0)
      if (first || k != curKey) { curKey = k; cAcc = 0L; sAcc = 0L; first = false }
      offs += ((k, r.getInt(1), cAcc, sAcc))
      cAcc += r.getLong(2)
      if (cum.isDefined) sAcc += (if (r.isNullAt(3)) 0L else r.getLong(3))
      keyN(k) = cAcc
    }
    val offRows = offs.toSeq.map { case (k, pid, co, so) =>
      Row(k, pid, co, so, keyN(k))
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(
        sorted.schema(keyCol),
        StructField("__gr_pid", IntegerType),
        StructField("__gr_coff", LongType),
        StructField("__gr_soff", LongType),
        StructField("__gr_n", LongType))))
    // pass 3: intra-partition window — PARTITIONED by (pid, key), so every
    // range partition computes its slice in parallel; offsets compose the
    // exact global-within-key rank/cumsum
    val w = Window.partitionBy(col("__gr_pid"), col(keyCol))
      .orderBy(orderCols: _*)
    // NULL-SAFE key equality (<=>): Window.partitionBy keeps null keys as a
    // group and the driver prefix scan above emits their offsets, but a
    // plain equi-join would silently drop every null-key row — so a
    // null-lang corpus slice would vanish from the result (r14 advice).
    val off = broadcast(offDf)
    var out = sorted.join(off,
        sorted(keyCol) <=> off(keyCol) && sorted("__gr_pid") === off("__gr_pid"))
      .drop(off(keyCol)).drop(off("__gr_pid"))
    rn.foreach { c =>
      out = out.withColumn(c,
        col("__gr_coff") + row_number().over(w).cast("long"))
    }
    cum.foreach { case (v, c) =>
      out = out.withColumn(c, col("__gr_soff") +
        sum(col(v).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    }
    keyTotal.foreach { c => out = out.withColumn(c, col("__gr_n")) }
    val added = rn.toSeq ++ cum.toSeq.map(_._2) ++ keyTotal.toSeq
    out.select((outCols ++ added).map(col): _*)
  }
}

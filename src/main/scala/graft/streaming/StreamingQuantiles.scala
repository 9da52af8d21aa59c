package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.functions._

/** Streaming quantile estimation over a micro-batched value stream — the
  * online counterpart of the exact rank-selection calibration
  * (`quality_quantiles`): a long-running ingest wants its gate thresholds
  * (p5 token count, p95 duplicate-gram mass, …) tracked from the stream
  * itself, without re-running a batch quantile job over ever-growing
  * history.
  *
  * Built on the Greenwald–Khanna summaries Spark's own `approxQuantile`
  * uses (Greenwald & Khanna, SIGMOD 2001; Spark's
  * `catalyst.util.QuantileSummaries` — public engine API, the same sketch
  * the `percentile_approx` aggregate compresses): each micro-batch reduces
  * DISTRIBUTED to one compressed summary via `treeAggregate` — executors
  * insert locally and merge pairwise, only O((1/ε)·log(εN)) tuples ever
  * reach the driver — which then merges into the accumulated summary. The
  * [[graft.operators.Sketch.StreamingCms]] contract: model-sized driver
  * state, one distributed pass per trigger, state advances once per trigger
  * in trigger order. Rank error after any interleaving of batches is the
  * summary's ε bound on the TOTAL count (merge preserves the GK invariant),
  * pinned in StreamingSpec against exact batch quantiles. */
final class StreamingQuantiles(relativeError: Double = 0.01)
    extends Serializable {
  require(relativeError > 0 && relativeError < 1,
    s"relativeError in (0,1), got $relativeError")

  @volatile private var acc =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      relativeError).compress()

  /** Total values observed so far. */
  def count: Long = acc.count

  /** ε-approximate quantile of everything observed (None before any data):
    * the returned value's rank is within ±ε·count of q·count. */
  def quantile(q: Double): Option[Double] = acc.query(q)

  /** Fold one micro-batch's `valueCol` (cast to double, nulls dropped). */
  def observe(batch: DataFrame, valueCol: String): Unit = {
    val err = relativeError
    val batchSummary = batch
      .select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .rdd.map(_.getDouble(0))
      .treeAggregate(new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, err))(
        (qs, v) => qs.insert(v),
        (a, b) => a.compress().merge(b.compress()))
      .compress()
    if (batchSummary.count > 0) synchronized {
      acc = acc.merge(batchSummary)
    }
  }

  /** `writeStream.foreachBatch` adapter. */
  def sink(valueCol: String): (DataFrame, Long) => Unit =
    (df, _) => observe(df, valueCol)
}

/** Streaming distinct-cardinality fold — the online half of the
  * `sketch_distinct` survey (vocabulary growth of a crawl stream): each
  * micro-batch reduces DISTRIBUTED to one ~4 KB HLL sketch
  * (`hll_sketch_agg`, the DataSketches HLL Spark ships), whose bytes are
  * union-merged into the driver-held accumulator — the same model-sized-
  * state / one-pass-per-trigger contract as
  * [[graft.operators.Sketch.StreamingCms]] and [[StreamingQuantiles]].
  * Union preserves the sketch's error guarantees (the merged estimate is
  * NOT bit-identical to a one-shot sketch — sparse-mode promotion differs —
  * but stays inside the same relative-error band; both pinned in
  * StreamingSpec). */
final class StreamingHll(lgK: Int = 12) extends Serializable {
  import org.apache.datasketches.hll.{HllSketch, Union}

  private val union = new Union(lgK)

  /** Estimate of distinct values observed so far (Spark's
    * `hll_sketch_estimate` rounding). */
  def estimate: Long = synchronized { Math.round(union.getEstimate) }

  def observe(batch: DataFrame, valueCol: String): Unit = {
    val bytes = batch
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sk"))
      .first().getAs[Array[Byte]](0)
    if (bytes != null) synchronized { union.update(HllSketch.heapify(bytes)) }
  }

  /** `writeStream.foreachBatch` adapter. */
  def sink(valueCol: String): (DataFrame, Long) => Unit =
    (df, _) => observe(df, valueCol)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch over a token-count table (Cormode & Muthukrishnan 2005 —
  * public algorithm; engine extension for bounded-memory frequency stats).
  *
  * The counter matrix is depth × width CELLS — a fixed, tiny state no matter
  * how large the corpus — which is what a 100 TB frequency survey needs when
  * the exact vocabulary table itself is too hot to keep around: counters are
  * mergeable by cell-wise addition (see SketchSpec's combinability contract),
  * so per-partition/per-epoch sketches fold with a `groupBy(row, bucket)`
  * sum, the same contract as every combinable agg in the engine. Estimates
  * only ever OVER-count (est ≥ exact always; ≤ exact + (e/width)·N with
  * probability 1 − e^−depth per the paper's bound).
  *
  * Hash row i of token t is `pmod(xxhash64(i, t), width)` — deterministic,
  * replayed exactly by the DuckDB oracle (hashInt(i, 42) seeds the string
  * hash; width divides 2^64 so unsigned mod equals pmod). Counters are built
  * FROM the aggregated (token, cnt) table — cell values are identical to
  * row-at-a-time insertion, one vocab-sized pass instead of a corpus-sized
  * one (the streaming insert path is the same union shape over raw tokens).
  */
object Sketch {

  /** Counter matrix of `tokenCounts` (token, cnt): one row per non-empty
    * cell, (row, bucket, c). ≤ depth·width rows — broadcastable by size. */
  def cmsCounters(tokenCounts: DataFrame, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1)
    require(width > 0 && (width & (width - 1)) == 0,
      "width must be a power of two (keeps the unsigned-mod oracle replay exact)")
    (0 until depth).map { i =>
      tokenCounts.select(lit(i).as("row"),
        pmod(xxhash64(lit(i), col("token")), lit(width.toLong)).as("bucket"),
        col("cnt"))
    }.reduce(_ unionByName _)
      .groupBy("row", "bucket")
      .agg(sum("cnt").as("c"))
  }

  /** Streaming fold of micro-batch token streams into one running counter
    * matrix (`foreachBatch` sink — the [[graft.streaming.StreamOps.StreamingKMeans]]
    * shape): each batch reduces distributed to its own ≤ depth·width cell
    * table, and only that model-sized table reaches the driver, where it
    * adds cell-wise into the accumulated sketch (the SketchSpec merge
    * contract makes this exactly the whole-corpus sketch). */
  class StreamingCms(depth: Int = 4, width: Int = 256) {
    @volatile private var cells = Map.empty[(Int, Long), Long]

    /** Accumulated (row, bucket) → count cells (≤ depth·width entries). */
    def counters: Map[(Int, Long), Long] = cells

    /** Estimate for one token against the accumulated sketch (driver-side
      * eval of the same XxHash64 expression the distributed path plans —
      * no job per probe). */
    def estimate(token: String): Long =
      (0 until depth).map { i =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
            org.apache.spark.sql.catalyst.expressions.Literal(i),
            org.apache.spark.sql.catalyst.expressions.Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(token),
              org.apache.spark.sql.types.StringType)), 42L)
          .eval(null).asInstanceOf[Long]
        cells.getOrElse((i, java.lang.Math.floorMod(h, width.toLong)), 0L)
      }.min

    def sink(tokenCol: String): (DataFrame, Long) => Unit = (batch, _) => {
      val add = cmsCounters(
          batch.select(col(tokenCol).as("token"))
            .groupBy("token").agg(count(lit(1)).as("cnt")), depth, width)
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      synchronized {
        cells = add.foldLeft(cells) { case (m, (k, v)) =>
          m.updated(k, m.getOrElse(k, 0L) + v)
        }
      }
    }
  }

  /** Point estimates for every token in `tokens` (token): est = min over
    * rows of the token's cell. The depth·width counter table is broadcast;
    * the query side explodes into depth narrow (row, bucket) probes and
    * min-aggregates back — no corpus-sized shuffle, vocab-sized output.
    *
    * The join is LEFT with `coalesce(c, 0)`: `counters` only materializes
    * non-empty cells, and an out-of-vocabulary token that hashes into an
    * empty cell must floor the min at 0 (the CMS guarantee est ≥ exact with
    * est = 0 when any probed cell is untouched). An inner join would drop
    * that cell and report the min of the remaining — inflated — cells. */
  def cmsEstimates(tokens: DataFrame, counters: DataFrame,
                   depth: Int = 4, width: Int = 256): DataFrame = {
    val probes = (0 until depth).map { i =>
      tokens.select(col("token"), lit(i).as("row"),
        pmod(xxhash64(lit(i), col("token")), lit(width.toLong)).as("bucket"))
    }.reduce(_ unionByName _)
    probes.join(broadcast(counters), Seq("row", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}

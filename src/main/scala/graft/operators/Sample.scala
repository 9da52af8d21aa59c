package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: keep exactly `n` docs per stratum (all
  * of them when the stratum is smaller), chosen by a seeded full-width hash
  * draw on the id — the per-stratum downsampling step a training-data pipeline
  * runs to rebalance languages/sources before mixing.
  *
  * Scale design: the per-stratum rank runs through the bounded [[TopK]]
  * aggregator keyed on a 64-bit stratum hash — ≤ n rows per stratum per map
  * partition cross the wire (a window rank would shuffle the whole corpus to
  * rank it, and a stratum hot enough to skew a window partition costs the
  * TopK combine nothing). Stratum columns ride back via a broadcast join of
  * the (tiny) distinct-strata dim. The draw is pure integer hashing —
  * replayable in any engine, stable across runs/cluster sizes, and seeded so
  * resamples are cheap. [SQL oracle: row_number over the same draw]. */
object Sample {

  /** Full-width seeded draw: the top 52 bits of `xxhash64(id, seed)`.
    * The seed enters through the hash chain (Spark threads each argument's
    * hash as the next argument's seed), so every seed permutes the ranking —
    * unlike an additive mix, which is rank-invariant — and 2^52 distinct
    * values keep top-draw ties vanishing even on 10^9-row strata (a
    * mod-1000003 draw has ~2^20, degenerating the tie-break into a residue
    * class). 52 bits < 2^53 ⇒ exactly representable in the Double score slot
    * of [[TopK]], so the Spark ranking and the integer SQL replay agree
    * bit-for-bit. */
  def drawCol(id: Column, seed: Long): Column =
    shiftrightunsigned(xxhash64(id.cast("long"), lit(seed)), 12)

  // SQL twin: graft.queries.Pipelines.drawSelect (staged XXH64 replay lives
  // with the rest of the Duck oracle machinery, which is queries-private).

  /** Null-safe 64-bit stratum key: hashes a null flag alongside each value so
    * (null, 'a') ≠ ('a', null) ≠ ('', 'a') — Spark's `xxhash64` skips null
    * inputs, which would merge those strata if hashed raw. (Residual generic
    * 64-bit collisions merge strata with probability ~|strata|²/2^65 —
    * negligible for any realistic strata count.) */
  private def strataKey(strataCols: Seq[String]): Column =
    xxhash64(strataCols.flatMap(c =>
      Seq(col(c).isNull.cast("int"), coalesce(col(c).cast("string"), lit("")))): _*)

  /** Keep the top-`n` ids per stratum by (draw desc, id asc).
    * Output: strataCols..., idCol, smp_rank (1-based). */
  def stratifiedTopN(df: DataFrame, strataCols: Seq[String], idCol: String,
                     n: Int, seed: Long = 0L): DataFrame = {
    val strata = strataKey(strataCols)
    val scored = df.select(strata.as("qid"), col(idCol).cast("long").as("cid"),
      drawCol(col(idCol), seed).cast("double").as("cos"))
    val top = TopK.topKPerQuery(scored, n)
    val dims = df.select(strata.as("qid") +: strataCols.map(col): _*).distinct()
    top.join(broadcast(dims), Seq("qid"))
      .select(strataCols.map(col) ++
        Seq(col("cid").as(idCol), col("rk").cast("long").as("smp_rank")): _*)
  }

  /** Weighted order sampling (Ohlsson's sequential Poisson sampling): keep
    * the `n` docs per stratum with the SMALLEST u/w, where u = seeded draw +1
    * and w ≥ 1 is the doc's weight — inclusion probability approaches the
    * size-proportional n·w/Σw without any global pass over the weights, so
    * big documents are favored exactly as a token-budgeted corpus sample
    * wants. One hash + one division per row, then the same bounded [[TopK]]
    * combine as [[stratifiedTopN]] — no corpus-wide window, no Σw broadcast,
    * resample-stable under any cluster size.
    *
    * Float discipline: u = draw+1 ≤ 2^52 is exact in a double, w is an
    * integer cast, and u/w is ONE correctly-rounded IEEE division — so the
    * key, and hence the ranking, replays bit-identically in any engine
    * (the DuckDB twin re-derives it from the staged-xxhash64 draw).
    * Output: strataCols..., idCol, smp_rank (1-based). */
  def weightedOrderSample(df: DataFrame, strataCols: Seq[String], idCol: String,
                          weight: Column, n: Int, seed: Long = 0L): DataFrame = {
    val strata = strataKey(strataCols)
    val u = drawCol(col(idCol), seed).cast("double") + lit(1.0)
    val key = -(u / greatest(weight, lit(1L)).cast("double"))
    val scored = df.select(strata.as("qid"), col(idCol).cast("long").as("cid"),
      key.as("cos"))
    val top = TopK.topKPerQuery(scored, n)
    val dims = df.select(strata.as("qid") +: strataCols.map(col): _*).distinct()
    top.join(broadcast(dims), Seq("qid"))
      .select(strataCols.map(col) ++
        Seq(col("cid").as(idCol), col("rk").cast("long").as("smp_rank")): _*)
  }
}

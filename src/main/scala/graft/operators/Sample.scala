package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: keep exactly `n` docs per stratum (all
  * of them when the stratum is smaller), chosen by a seeded integer-mix draw
  * on the id — the per-stratum downsampling step a training-data pipeline
  * runs to rebalance languages/sources before mixing.
  *
  * Scale design: the per-stratum rank runs through the bounded [[TopK]]
  * aggregator keyed on a 64-bit stratum hash — ≤ n rows per stratum per map
  * partition cross the wire (a window rank would shuffle the whole corpus to
  * rank it, and a stratum hot enough to skew a window partition costs the
  * TopK combine nothing). Stratum columns ride back via a broadcast join of
  * the (tiny) distinct-strata dim. The draw is pure integer arithmetic —
  * replayable in any engine, stable across runs/cluster sizes, and seeded so
  * resamples are cheap. [SQL oracle: row_number over the same draw]. */
object Sample {

  /** mix(id, seed) ∈ [0, 1000003): the integer-mix family used across the
    * engine (bounded operands — ANSI-safe, no Long overflow). */
  def drawCol(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    pmod(pmod(id, lit(1000003L)) * lit(2654435761L) + lit(12345L + seed),
      lit(1000003L))

  /** SQL twin of [[drawCol]] (all operands non-negative → % = pmod). */
  def drawSql(id: String, seed: Long): String =
    s"(($id % 1000003) * 2654435761 + ${12345L + seed}) % 1000003"

  /** Keep the top-`n` ids per stratum by (draw desc, id asc).
    * Output: strataCols..., idCol, smp_rank (1-based). */
  def stratifiedTopN(df: DataFrame, strataCols: Seq[String], idCol: String,
                     n: Int, seed: Long = 0L): DataFrame = {
    val strata = xxhash64(strataCols.map(col): _*)
    val scored = df.select(strata.as("qid"), col(idCol).cast("long").as("cid"),
      drawCol(col(idCol), seed).cast("double").as("cos"))
    val top = TopK.topKPerQuery(scored, n)
    val dims = df.select(strata.as("qid") +: strataCols.map(col): _*).distinct()
    top.join(broadcast(dims), Seq("qid"))
      .select(strataCols.map(col) ++
        Seq(col("cid").as(idCol), col("rk").cast("long").as("smp_rank")): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** DSIR-style data selection: hashed n-gram importance weights against a
  * target domain, then a deterministic top-k resample (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS 2023 —
  * public method; engine extension, the reference pipeline has no selection
  * stage).
  *
  * Shape: word bigrams are feature-hashed into `buckets` buckets
  * (`pmod(xxhash64(gram), buckets)` — the paper's hashed n-gram generative
  * model). One pass builds the per-(doc, bucket) count table; the per-bucket
  * target/raw corpus totals reduce to a ≤ `buckets`-row table that is
  * BROADCAST into the scoring join, so raw documents are scored without a
  * corpus-sized shuffle — at 100 TB the corpus is scanned once for counting
  * and once for scoring, and only (id, bucket, count) triples ever shuffle.
  *
  * Importance is formulated integer-exactly as a ratio of smoothed dot
  * products, affinity(d) = Σ_b c_d[b]·(cT[b]+1) / Σ_b c_d[b]·(cR[b]+1)
  * (decimal sums, ONE final double division), rather than the paper's
  * Σ c·log(pT/pR): a float log-sum's value depends on summation order, which
  * would hang the oracle hash (see [[graft.queries.Pipelines.textUnigramScore]]
  * for the precedent), and transcendental log need not agree bitwise across
  * engines. The ranking it induces favors the same target-like documents;
  * the divergence is documented here and in README.
  */
object Dsir {

  /** Per-raw-document target affinity. Only documents where `isTarget` is
    * false are scored (the paper scores the raw pool against the target
    * distribution); documents with no bigram (< 2 tokens) are dropped —
    * they carry no feature evidence.
    *
    * Output: (id, n_grams, affinity) — affinity rounded to 6 so the ranking
    * the resample uses is replayable.
    *
    * Scale notes: the (id, bucket, count) table is materialized once
    * (`localCheckpoint`; a persisted table at cluster scale) because both the
    * stats reduction and the scoring join consume it. Decimal(38,0)
    * accumulators keep the dot products exact far past Long range (ANSI mode
    * throws on Long overflow; corpus-scale cT·c products pass 2^63 around
    * ~10^19 gram-count-products per doc). */
  def affinity(docs: DataFrame, idCol: String, textCol: String,
               isTarget: Column, buckets: Int = 256): DataFrame = {
    // Per-(doc, bucket) counts: ≤ buckets narrow rows per doc through the
    // shuffle; shared by the stats reduction and the scoring join.
    val perDoc = perDocBuckets(docs, idCol, textCol, Some(isTarget), buckets)
      .localCheckpoint()
    val stats = perDoc.groupBy("b").agg(
      sum(when(col("is_target"), col("c")).otherwise(0L)).as("ct"),
      sum(when(!col("is_target"), col("c")).otherwise(0L)).as("cr"))
    scoreBuckets(perDoc.filter(!col("is_target")).select("id", "b", "c"), stats)
  }

  /** The ≤ `buckets`-row (b, ct, cr) stats table of a reference corpus —
    * built once from history, then broadcast into every scoring join; the
    * artifact the streaming admission gate ([[graft.streaming.IngestGate]])
    * scores incoming micro-batches against. */
  def bucketStats(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 256): DataFrame =
    perDocBuckets(docs, idCol, textCol, Some(isTarget), buckets)
      .groupBy("b").agg(
        sum(when(col("is_target"), col("c")).otherwise(0L)).as("ct"),
        sum(when(!col("is_target"), col("c")).otherwise(0L)).as("cr"))

  /** [[bucketStats]] over a pre-projected (idCol, is_target, toks) token
    * frame ([[Quality.tokensWith]]) — the shared-tokenize entry for callers
    * that feed the SAME checkpointed pass to stats-building and scoring
    * (`gate_admission`: one corpus scan, not one per consumer). Counts rows
    * per (bucket, is_target) directly — the per-doc grouping [[bucketStats]]
    * routes through is a no-op under the outer sum, and integer counts make
    * the collapse exact. Same empty-token equivalence as
    * [[affinityAgainstTokens]]: only whitespace-only docs differ pre-filter,
    * and those produce no bigram on either path. */
  def bucketStatsFromTokens(toks: DataFrame, idCol: String,
                            buckets: Int = 256): DataFrame = {
    requirePow2(buckets)
    toks
      .select(col("is_target"),
        explode_outer(TextFns.shingleZip(col("toks"), 2)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("is_target"),
        pmod(xxhash64(TextFns.shingleString(col("s"), 2)),
          lit(buckets.toLong)).as("b"))
      .groupBy("b").agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("cr"))
  }

  /** Affinity of `docs` against PRECOMPUTED [[bucketStats]] — the
    * streaming/ingest scoring path: the batch is scanned once for counting
    * and once for scoring, the stats ride as a broadcast, nothing
    * corpus-sized shuffles. Same integer-exact arithmetic as [[affinity]]. */
  def affinityAgainst(docs: DataFrame, idCol: String, textCol: String,
                      stats: DataFrame, buckets: Int = 256): DataFrame =
    scoreBuckets(perDocBuckets(docs, idCol, textCol, None, buckets), stats)

  /** [[affinityAgainst]] over a pre-projected (idCol, toks) token frame —
    * the shared-tokenize entry for callers that also feed the same tokens to
    * [[Quality.signalsFromTokens]] (the ingest gate tokenizes each batch
    * ONCE for both consumers). Bit-identical to [[affinityAgainst]]: the
    * shared frame drops empty tokens, which can only occur for
    * whitespace-only docs, and those produce no bigram on either path. */
  def affinityAgainstTokens(toks: DataFrame, idCol: String,
                            stats: DataFrame, buckets: Int = 256): DataFrame =
    scoreBuckets(bucketsFromTokens(toks, idCol, buckets), stats)

  /** (id[, is_target], b, c) hashed-bigram bucket counts per document.
    * Two-step projection barrier before the HOF shingle lambda (TextFns
    * note); documents with no bigram (< 2 tokens) drop out — no evidence. */
  private def requirePow2(buckets: Int): Unit =
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two (keeps the unsigned-mod oracle replay exact)")

  /** (id, b, c) bucket counts from a pre-projected (idCol, toks) frame —
    * the [[affinityAgainstTokens]] body. */
  private def bucketsFromTokens(toks: DataFrame, idCol: String,
                                buckets: Int): DataFrame = {
    requirePow2(buckets)
    toks
      .select(col(idCol).as("id"),
        explode_outer(TextFns.shingleZip(col("toks"), 2)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("id"), pmod(xxhash64(TextFns.shingleString(col("s"), 2)),
        lit(buckets.toLong)).as("b"))
      .groupBy("id", "b")
      .agg(count(lit(1)).as("c"))
  }

  private def perDocBuckets(docs: DataFrame, idCol: String, textCol: String,
                            isTarget: Option[Column], buckets: Int): DataFrame = {
    requirePow2(buckets)
    val keyCols = col("id") +: isTarget.map(_ => col("is_target")).toSeq
    docs
      .select(col(idCol).as("id") +: isTarget.map(_.as("is_target")).toSeq :+
        TextFns.normTokens(TextFns.cleanText(col(textCol), removePunctuation = true))
          .as("toks"): _*)
      .select(keyCols :+
        explode_outer(TextFns.shingleZip(col("toks"), 2)).as("s"): _*)
      .filter(col("s").isNotNull)
      .select(keyCols :+
        pmod(xxhash64(TextFns.shingleString(col("s"), 2)),
          lit(buckets.toLong)).as("b"): _*)
      .groupBy(keyCols :+ col("b"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Smoothed-dot-product scoring of (id, b, c) rows against broadcast
    * (b, ct, cr) stats — decimal sums, ONE final double division.
    *
    * LEFT join on the stats: a batch bigram can hash to a bucket the
    * reference corpus never populated (the streaming-gate path scores
    * against PRECOMPUTED stats), and the +1 smoothing is defined over all
    * buckets — an unseen bucket contributes c·1/c·1, not silence. An inner
    * join would undercount n_grams, skew the affinity toward the observed
    * buckets, and drop a doc whose buckets are all unseen entirely (null
    * affinity → rejected at the gate) instead of scoring the neutral
    * smoothed ratio 1.0. In the one-shot [[affinity]] path stats come from
    * the same perDoc table, every bucket is present, and left ≡ inner. */
  private def scoreBuckets(perDoc: DataFrame, stats: DataFrame): DataFrame =
    perDoc
      .join(broadcast(stats), Seq("b"), "left")
      .groupBy("id")
      .agg(
        sum("c").as("n_grams"),
        sum(col("c").cast("decimal(38,0)") *
            (coalesce(col("ct"), lit(0L)) + lit(1L)).cast("decimal(38,0)"))
          .as("num"),
        sum(col("c").cast("decimal(38,0)") *
            (coalesce(col("cr"), lit(0L)) + lit(1L)).cast("decimal(38,0)"))
          .as("den"))
      .select(col("id"), col("n_grams"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("affinity"))

  /** Deterministic importance resample: the k raw documents ranked first by
    * (affinity desc, id asc), flagged `selected`. Ranking goes through the
    * bounded [[TopK]] aggregator — one k-entry buffer per partition merged
    * combiner-style, never a global window — so the shuffle carries at most
    * k rows per partition; the k-sized selected set joins back as a flag
    * (broadcast when it fits). k is output-sized by contract (the paper
    * selects a fixed training budget from an arbitrarily large raw pool). */
  def resample(aff: DataFrame, k: Int): DataFrame = {
    val picked = TopK.topKPerQuery(
        aff.select(lit(0L).as("qid"), col("id").as("cid"),
          col("affinity").as("cos")), k)
      .select(col("cid").as("id"), lit(true).as("sel0"))
    aff.join(picked, Seq("id"), "left")
      .select(col("id"), col("n_grams"), col("affinity"),
        coalesce(col("sel0"), lit(false)).as("selected"))
  }
}

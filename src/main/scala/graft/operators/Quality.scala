package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Per-document quality signals (Gopher/C4-family heuristics — Rae et al.
  * 2021 §A.1, Raffel et al. 2020 §2.2: length, mean word length, most-common-
  * word dominance, duplicate n-gram mass) shared by the batch gate
  * ([[graft.queries.Pipelines]] `text_quality`) and the streaming admission
  * gate ([[graft.streaming.IngestGate]]) — one definition, two consumers, so
  * the stream admits exactly what the batch pipeline would keep.
  *
  * Scale shape: one projection barrier for the regex-clean chain (TextFns HOF
  * note), then three combinable aggregation branches over the exploded
  * tokens/shingles — every signal is a keyed partial+final aggregate, output
  * one narrow row per document. */
object Quality {

  /** The shared (idCol, toks) tokenization every gate signal derives from:
    * clean → normalize-whitespace → split, empty tokens dropped (a
    * whitespace-only doc tokenizes to `[]`, not `[""]`). Projected as its own
    * column per the TextFns HOF note; callers that feed SEVERAL consumers
    * (e.g. [[graft.streaming.IngestGate]] sharing one pass between DSIR
    * affinity and quality signals) should `localCheckpoint` the result so the
    * scan+regex chain runs once, not once per consumer. */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokensWith(docs, idCol, textCol)

  /** [[tokens]] carrying extra projected columns through the tokenize pass —
    * for callers that checkpoint ONE (id, extras, toks) frame and fan it out
    * to consumers needing different slices (e.g. `gate_admission`: the same
    * pass feeds target-flagged bucket stats AND the gate's scoring). */
  def tokensWith(docs: DataFrame, idCol: String, textCol: String,
                 extra: (String, Column)*): DataFrame =
    docs.select(col(idCol) +: extra.map { case (n, c) => c.as(n) } :+
        TextFns.normTokens(TextFns.cleanText(col(textCol), removePunctuation = true))
          .as("toks0"): _*)
      .select(col(idCol) +: extra.map { case (n, _) => col(n) } :+
        filter(col("toks0"), t => length(t) > 0).as("toks"): _*)

  /** (idCol, n_tokens, mean_word_len, top_unigram_ratio, dup_2gram_ratio,
    * dup_3gram_ratio) — one row per input document, empty docs all-zero. */
  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    signalsFromTokens(tokens(docs, idCol, textCol).localCheckpoint(), idCol)

  /** [[signals]] over a pre-projected [[tokens]] frame — the shared-scan
    * entry point for callers that tokenize once for multiple consumers. */
  def signalsFromTokens(toks: DataFrame, idCol: String): DataFrame = {
    val tokf = toks.select(col(idCol), explode_outer(col("toks")).as("tok"))
      .filter(col("tok").isNotNull)
    val us = tokf.groupBy(idCol, "tok").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(
        max("c").as("topc"), sum("c").as("n"),
        sum(col("c") * length(col("tok"))).as("sumlen"))
    def grams(n: Int) = toks
      .select(col(idCol),
        explode_outer(TextFns.shingleZip(col("toks"), n)).as("s"))
      .filter(col("s").isNotNull)
      .select(col(idCol), TextFns.shingleString(col("s"), n).as("g"))
      .groupBy(idCol)
      .agg(count(lit(1)).as(s"tot$n"), countDistinct(col("g")).as(s"dst$n"))
    toks.select(idCol)
      .join(us, Seq(idCol), "left")
      .join(grams(2), Seq(idCol), "left")
      .join(grams(3), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n"), lit(0L)).as("n_tokens"),
        round(when(col("n").isNull, 0.0)
          .otherwise(col("sumlen").cast("double") / col("n")), 6)
          .as("mean_word_len"),
        round(when(col("n").isNull, 0.0)
          .otherwise(col("topc").cast("double") / col("n")), 6)
          .as("top_unigram_ratio"),
        round(when(col("tot2").isNull, 0.0)
          .otherwise(lit(1.0) - col("dst2").cast("double") / col("tot2")), 6)
          .as("dup_2gram_ratio"),
        round(when(col("tot3").isNull, 0.0)
          .otherwise(lit(1.0) - col("dst3").cast("double") / col("tot3")), 6)
          .as("dup_3gram_ratio"))
  }

  /** Gate thresholds — defaults are the engine's batch `text_quality` gate;
    * a deployment calibrates them from `quality_quantiles` (the exact
    * per-source quantile table) and passes the calibrated copy here. */
  final case class Thresholds(minTokens: Long = 20, maxTokens: Long = 100000,
                              minMeanWordLen: Double = 3.0,
                              maxMeanWordLen: Double = 10.0,
                              maxTopUnigramRatio: Double = 0.15,
                              maxDup2GramRatio: Double = 0.05)

  /** The gate predicate over [[signals]] columns. */
  def okCol(t: Thresholds = Thresholds()): Column =
    col("n_tokens") >= t.minTokens && col("n_tokens") <= t.maxTokens &&
      col("mean_word_len") >= t.minMeanWordLen &&
      col("mean_word_len") <= t.maxMeanWordLen &&
      col("top_unigram_ratio") <= t.maxTopUnigramRatio &&
      col("dup_2gram_ratio") <= t.maxDup2GramRatio
}

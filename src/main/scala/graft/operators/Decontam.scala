package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Benchmark decontamination (training-data-pipeline extension): flag training
  * documents that share word n-grams with an evaluation/benchmark set — the
  * overlap pass every serious pre-training pipeline runs so eval questions
  * don't leak into the training corpus (the GPT-3 appendix-C / Gopher "n-gram
  * collision" recipe, n typically 8–13; smaller here to suit the tiny
  * synthetic vocabulary).
  *
  * Scale design: the eval side is small by contract (benchmarks are KBs, the
  * corpus is TBs) — its distinct shingle hashes broadcast, so the corpus side
  * is ONE scan projected down to (8-byte shingle hash, id) pairs feeding a
  * broadcast-hash semi-join + a combinable count aggregate. No shuffle ever
  * carries text; the corpus never joins itself. Tokenization/shingling reuses
  * the [[Dedup.ngramJaccard]] chain (clean → normTokens → w-shingles), so one
  * shared dialect governs all n-gram operators. [SQL oracle: string-shingle
  * join replay, as dedup_ngram_jaccard]. */
object Decontam {

  /** Per contaminated training doc: `hits` = distinct shared n-grams,
    * `eval_docs` = distinct eval documents sharing at least one. Clean
    * training docs are absent (filter on the result to drop/keep). */
  def overlap(train: DataFrame, evalSet: DataFrame, idCol: String,
              textCol: String, n: Int = 4): DataFrame = {
    def shingled(df: DataFrame): DataFrame = df
      .select(col(idCol).cast("long").as("id"),
        TextFns.normTokens(
          TextFns.cleanText(col(textCol), removePunctuation = true)).as("toks"))
      .select(col("id"),
        explode(TextFns.shinglesFromTokens(col("toks"), n)).as("sh0"))
      .select(col("id"), xxhash64(col("sh0")).as("sh"))
      .distinct()
    val ev = shingled(evalSet).select(col("sh"), col("id").as("eval_id"))
    shingled(train).join(broadcast(ev), Seq("sh"))
      .groupBy(col("id").as(idCol))
      .agg(countDistinct("sh").as("hits"),
        countDistinct("eval_id").as("eval_docs"))
  }
}

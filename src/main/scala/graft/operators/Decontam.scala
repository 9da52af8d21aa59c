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
        explode_outer(TextFns.shingleZip(col("toks"), n)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("id"), xxhash64(TextFns.shingleString(col("s"), n)).as("sh"))
      .distinct()
    val ev = shingled(evalSet).select(col("sh"), col("id").as("eval_id"))
    shingled(train).join(broadcast(ev), Seq("sh"))
      .groupBy(col("id").as(idCol))
      .agg(countDistinct("sh").as("hits"),
        countDistinct("eval_id").as("eval_docs"))
  }

  /** FUZZY decontamination: flag training docs that are MinHash
    * near-duplicates (signature-estimated Jaccard ≥ `threshold`) of any eval
    * doc — the companion [[overlap]] can't be: a leaked benchmark item with a
    * pasted answer suffix or light paraphrase slips past exact full-text
    * fingerprints and thins exact n-gram collisions, but keeps most of its
    * shingle set, which is exactly what the banded signature join measures
    * (the [[Dedup.minHashDelta]] machinery pointed at an eval set).
    *
    * Scale shape — STRONGER than the snapshot delta: the eval side is small
    * by contract, so BOTH probe structures broadcast — the banded eval index
    * for candidate generation and the eval signature table for verification.
    * The corpus side is shingled/hashed once (the one unavoidable shuffle:
    * the per-(doc, k) min aggregation, map-side combinable) and its banded
    * rows stream through a broadcast hash join; no corpus-sized side is ever
    * re-keyed for the eval probe, and nothing is train × eval all-pairs.
    * Returns one row per flagged training doc:
    * (idCol, n_eval_hits, max_est). */
  def fuzzy(train: DataFrame, evalSet: DataFrame, idCol: String,
            textCol: String, numHashes: Int = 32, bands: Int = 8,
            shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sigsT = Dedup.minHashSignatures(train, idCol, textCol, numHashes,
      shingleSize).localCheckpoint()
    val sigsE = Dedup.minHashSignatures(evalSet, idCol, textCol, numHashes,
      shingleSize).localCheckpoint()
    val cands = Dedup.bandedSigs(sigsT, "id_tr", numHashes, bands)
      .join(broadcast(Dedup.bandedSigs(sigsE, "id_ev", numHashes, bands)),
        Seq("band_id", "band_hash"))
      .select("id_tr", "id_ev").distinct()
    cands
      .join(sigsT.select(col("id").as("id_tr"), col("sig").as("sig_tr")),
        Seq("id_tr"))
      .join(broadcast(sigsE.select(col("id").as("id_ev"),
        col("sig").as("sig_ev"))), Seq("id_ev"))
      .select(col("id_tr"),
        (size(filter(zip_with(col("sig_tr"), col("sig_ev"), (x, y) => x === y),
          eq => eq)).cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy(col("id_tr").as(idCol))
      .agg(count(lit(1)).as("n_eval_hits"),
        round(max("est_jaccard"), 6).as("max_est"))
  }
}

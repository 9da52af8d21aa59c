package graft.embed

import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A REAL learned embedding provider behind the [[EmbeddingProvider]] SPI —
  * MLlib `Word2Vec` (skip-gram, distributed training) fit on the corpus
  * itself, no external model artifact needed. This upgrades the provider
  * surface from "deterministic hashing stub only" (SURVEY §7's offline
  * constraint, aimed at the reference's BERT/SciBERT stack —
  * constants/transformers.py:32-52) to embeddings with actual corpus
  * semantics: co-occurring words land near each other, which is the
  * structure the adaptation suite (Procrustes/MLP mappings between spaces,
  * SURVEY A7/M5/M6) operates on. Two fits with different seeds model two
  * embedding spaces the same way two hashing seeds do — but with shared
  * semantic geometry for a mapping to recover.
  *
  * Scale shape: training is MLlib-distributed over the corpus; the learned
  * table is model-sized (vocab × dim) and rides to executors once per task
  * via the provider's closure — the same broadcast-the-model contract every
  * other provider implementation follows. OOV tokens fall back to the
  * deterministic [[HashingProvider]] so `embedTokens` stays total, and the
  * fallback is flagged per vector dimension-0-agnostic (callers that must
  * know can consult [[vocab]]).
  *
  * Determinism: Word2Vec's negative sampling is seeded per partition, so a
  * fit is reproducible only for a fixed (input, partitioning, seed) triple —
  * real enough for specs, NOT hash-oracle material for the float vectors
  * themselves. Queries over a trained provider therefore oracle the
  * DETERMINISTIC spine (per-source top words, counts) exactly and reduce the
  * trained floats to boolean verdict columns the SQL replays (the
  * `w2v_top_word_sims` verdict pattern). */
final class Word2VecProvider private (
    val name: String,
    val dim: Int,
    vectors: Map[String, Array[Float]],
    fallback: HashingProvider) extends EmbeddingProvider {

  def vocab: Set[String] = vectors.keySet

  def embedTokens(tokens: Seq[String]): Array[Array[Float]] = {
    val ts = if (tokens.isEmpty) Seq("") else tokens
    ts.map { t =>
      vectors.getOrElse(t, fallback.embedTokens(Seq(t))(0))
    }.toArray
  }
}

object Word2VecProvider {

  /** Fit on `docs(textCol)` (whitespace tokenization, the engine's shared
    * convention). `minCount` prunes hapax noise; `maxIter`/`windowSize` map
    * to the usual skip-gram knobs. */
  def fit(docs: DataFrame, textCol: String, name: String = "w2v",
          dim: Int = 64, minCount: Int = 2, maxIter: Int = 1,
          windowSize: Int = 5, seed: Long = 42L): Word2VecProvider = {
    val toks = docs.select(
      split(col(textCol), "\\s+").as("tokens"))
      .filter(size(col("tokens")) > 0)
    val model = new Word2Vec()
      .setVectorSize(dim)
      .setMinCount(minCount)
      .setMaxIter(maxIter)
      .setWindowSize(windowSize)
      .setSeed(seed)
      .setInputCol("tokens")
      .setOutputCol("vec")
      .fit(toks)
    val vecs = model.getVectors.collect()
      .map(r => r.getString(0) ->
        r.getAs[MlVector](1).toArray.map(_.toFloat)).toMap
    new Word2VecProvider(name, dim, vecs,
      HashingProvider(s"$name-oov", dim, seed))
  }
}

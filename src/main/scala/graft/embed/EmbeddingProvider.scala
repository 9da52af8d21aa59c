package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable text → token-embedding transformation (SURVEY P3; reference:
  * constants/transformers.py:32-52 runs BERT/SciBERT/DistilBERT).
  *
  * No JVM transformer exists offline, so the default implementation is a
  * deterministic hashing + random-projection encoder: every token's vector is a
  * pure function of (token, provider seed), so two providers with different
  * seeds model two embedding *spaces* — exactly the structure the reference's
  * drift/adaptation experiments need (BERT vs SciBERT ↔ seed A vs seed B).
  * A real transformer (e.g. an ONNX runtime) plugs in behind the same trait.
  */
trait EmbeddingProvider extends Serializable {
  def name: String
  def dim: Int

  /** Token-level embeddings: [seq_len][dim] (ragged; reference keeps
    * `[seq_len, 768]` per doc, streams/stream_data.py:140-143). */
  def embedTokens(tokens: Seq[String]): Array[Array[Float]]

  /** Single-token convenience (adaptation word dataset). */
  def embedWord(w: String): Array[Float] = embedTokens(Seq(w))(0)

  /** Batch form of [[embedTokens]] — one call per micro-batch of documents.
    * Real inference providers (ONNX/Triton-style) override this to amortize
    * model invocation over the batch (the reference batches 32 docs per
    * forward pass, streams/stream_data.py:129-153); the default delegates
    * per document. */
  def embedTokensBatch(docs: Seq[Seq[String]]): Seq[Array[Array[Float]]] =
    docs.map(embedTokens)
}

/** Deterministic hashing/random-projection encoder. Per (token, dim) value =
  * splitmix64-mixed hash mapped to [-1, 1], plus a small additive positional
  * component so token order influences vectors (transformers are
  * position-aware). Stateless, seed-keyed, reproducible on any executor. */
final case class HashingProvider(name: String, dim: Int, seed: Long)
    extends EmbeddingProvider {

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def tokenHash(t: String): Long = {
    var h = seed
    var i = 0
    while (i < t.length) { h = splitmix64(h ^ t.charAt(i).toLong); i += 1 }
    h
  }

  def embedTokens(tokens: Seq[String]): Array[Array[Float]] = {
    val out = new Array[Array[Float]](math.max(tokens.length, 1))
    var p = 0
    val ts = if (tokens.isEmpty) Seq("") else tokens
    ts.foreach { t =>
      val h = tokenHash(t)
      val v = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        val m = splitmix64(h ^ d.toLong)
        val base = (m.toDouble / Long.MaxValue.toDouble)
        val pos = splitmix64(seed ^ (p.toLong << 32) ^ d.toLong)
        val posComp = 0.05 * (pos.toDouble / Long.MaxValue.toDouble)
        v(d) = (base + posComp).toFloat
        d += 1
      }
      out(p) = v
      p += 1
    }
    out
  }
}

/** A drifted embedding space: the base provider's vectors under a fixed
  * deterministic orthogonal transform (signed permutation). This is the
  * canonical model of embedding-space drift — and exactly the structure
  * Orthogonal Procrustes (SURVEY A7/M6) is designed to undo, mirroring the
  * reference's BERT→SciBERT swap with a recoverable ground truth. */
final case class RotatedProvider(base: EmbeddingProvider, rotSeed: Long)
    extends EmbeddingProvider {
  def name: String = s"${base.name}-rot$rotSeed"
  def dim: Int = base.dim

  private lazy val (perm, signs): (Array[Int], Array[Float]) = {
    val rnd = new scala.util.Random(rotSeed)
    val p = rnd.shuffle((0 until dim).toVector).toArray
    val s = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    (p, s)
  }

  def embedTokens(tokens: Seq[String]): Array[Array[Float]] =
    base.embedTokens(tokens).map { v =>
      Array.tabulate(dim)(i => signs(i) * v(perm(i)))
    }
}

object EmbeddingProvider {

  /** Column form of P3: text → ARRAY<ARRAY<FLOAT>> token embeddings. A Scala
    * UDF is the right tool at this boundary (the provider is arbitrary host
    * code — for BERT it would be an inference runtime); everything downstream
    * of it stays in codegen'd built-ins. */
  def embedTokensCol(provider: EmbeddingProvider)(text: Column): Column = {
    val f = udf { t: String =>
      val toks = Option(t).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq
      provider.embedTokens(toks).map(_.toSeq)
    }
    f(text)
  }

  /** Single-word embedding column (adaptation dataset builder). */
  def embedWordCol(provider: EmbeddingProvider)(word: Column): Column = {
    val f = udf { w: String => provider.embedWord(Option(w).getOrElse("")).toSeq }
    f(word)
  }

  /** Fused embed + mean-pool (A3 "average"): one pass over tokens, no token
    * matrix materialized — the hot path for whole-corpus pooled embeddings.
    * Equal by construction to `VecFns.meanPool(embedTokensCol(p)(text))` up to
    * float-association order (asserted in the spec). */
  def embedMeanPoolCol(provider: EmbeddingProvider)(text: Column): Column = {
    val dim = provider.dim
    val f = udf { t: String =>
      val toks = Option(t).getOrElse("").split("\\s+").filter(_.nonEmpty)
      val mat = provider.embedTokens(toks.toSeq)
      val acc = new Array[Double](dim)
      mat.foreach { v =>
        var i = 0
        while (i < dim) { acc(i) += v(i); i += 1 }
      }
      val n = mat.length
      acc.map(_ / n).toSeq
    }
    f(text)
  }

  /** Partition-batched embed + mean-pool via `mapPartitions`: the shape a
    * real inference provider needs — the provider object deserializes once
    * per partition (where a heavyweight runtime would load its model) and
    * sees documents in `batchSize` groups through [[EmbeddingProvider.embedTokensBatch]],
    * mirroring the reference's 32-doc forward passes. Row-identical to the
    * per-row UDF path for any deterministic provider (asserted in the spec).
    * Returns (idCol, vec ARRAY<DOUBLE>). */
  def embedMeanPoolPartitions(docs: DataFrame, idCol: String, textCol: String,
                              provider: EmbeddingProvider,
                              batchSize: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dim = provider.dim
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val tokenized = batch.map { case (_, t) =>
            Option(t).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq
          }
          val mats = provider.embedTokensBatch(tokenized)
          batch.lazyZip(mats).map { case ((id, _), mat) =>
            val acc = new Array[Double](dim)
            mat.foreach { v =>
              var i = 0
              while (i < dim) { acc(i) += v(i); i += 1 }
            }
            (id, acc.map(_ / mat.length).toSeq)
          }
        }
      }.toDF(idCol, "vec")
  }

  /** S4: full-corpus embedding materialization (reference
    * streams/transform_data.py:15-44 caches the transformed dataset) — embed,
    * pool, write parquet once, read many. */
  def materialize(docs: DataFrame, textCol: String, provider: EmbeddingProvider,
                  outPath: String): Unit = {
    import graft.functions.VecFns
    docs.withColumn("tokens", embedTokensCol(provider)(col(textCol)))
      .withColumn("pooled", VecFns.maxPool(col("tokens")))
      .drop("tokens")
      .write.mode("overwrite").parquet(outPath)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup
    (3L, "completely different content about spark engines and scale"),
    (4L, "another unrelated document mentioning large clusters only"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts (min id representative)") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 2)      // docs 0,1 collapse
    assert(!out.contains(1L)) // not a representative
    assert(out(2L) == 1 && out(3L) == 1 && out(4L) == 1)
  }

  test("fingerprint dedup agrees with text dedup on this corpus") {
    val out = Dedup.exactByFingerprint(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 2 && out.size == 4)
  }

  test("minhash est_jaccard = 1.0 for identical docs and high for near dups") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
        numHashes = 32, bands = 8, shingleSize = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      "near-dup pair (shares 6/9 shingles, true J=0.5) should surface")
    assert(!pairs.keys.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("simhash: identical docs at hamming 0") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) == 0)
  }

  test("ngramJaccard computes the exact set Jaccard") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", shingleSize = 3,
        threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    // docs 0 vs 2: 7 shingles each, 6 shared → J = 6/8 = 0.75
    assert(math.abs(pairs((0L, 2L)) - 0.75) < 1e-12)
  }

  test("dropDuplicates keeps representatives only") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.9)
    val kept = Dedup.dropDuplicates(docs, "doc_id", pairs)
    assert(kept.count() == 4) // doc 1 dropped
  }

  test("embeddingNearDup recovers planted near-identical vectors") {
    val base = Seq(
      (0L, Seq(1f, 0.2f, -0.5f, 0.8f)),
      (1L, Seq(1.01f, 0.21f, -0.49f, 0.8f)), // near-dup of 0
      (2L, Seq(-1f, 0.5f, 0.5f, -0.7f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(base, "vec_id", "embedding",
        planes = 6, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  val embs = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(0.9f, 0.1f, 0f, 0f)),
    (2L, Seq(0f, 1f, 0f, 0f)),
    (3L, Seq(0f, 0f, 1f, 0.2f)),
    (4L, Seq(1f, 0.01f, 0f, 0f))).toDF("vec_id", "embedding")

  test("bruteForceTopK: self is rank 1 with cosine 1") {
    val out = Similarity.bruteForceTopK(
      embs.filter(col("vec_id") === 0L), embs, "vec_id", "vec_id", "embedding", 3)
      .orderBy("rk").collect()
    assert(out(0).getLong(1) == 0L && math.abs(out(0).getDouble(2) - 1.0) < 1e-9)
    assert(out(1).getLong(1) == 4L, "nearest neighbor by cosine")
    assert(out(2).getLong(1) == 1L)
  }

  test("lshTopK finds the same near neighbors for clustered vectors") {
    val out = Similarity.lshTopK(
      embs.filter(col("vec_id") === 0L), embs, "vec_id", "vec_id", "embedding",
      k = 3, planes = 6, probes = 3)
      .collect().map(_.getLong(1)).toSet
    assert(out.contains(0L), "self must land in its own bucket")
  }

  test("ivfTopK returns ranked candidates incl. self") {
    val out = Similarity.ivfTopK(
      embs.filter(col("vec_id") === 0L), embs, "vec_id", "vec_id", "embedding",
      k = 3, nlist = 2, nprobe = 2)
      .orderBy("rk").collect()
    assert(out.nonEmpty && out(0).getLong(1) == 0L)
  }

  test("pqTopK: ADC distances ascend and the query attains the minimum") {
    val out = Similarity.pqTopK(
      embs.filter(col("vec_id") === 0L), embs, "vec_id", "vec_id", "embedding",
      k = 5, m = 2, ksub = 4)
      .orderBy("rk").collect()
    assert(out.length == 5)
    val dists = out.map(_.getDouble(3))
    assert(dists.sameElements(dists.sorted), "adist ascending by rank")
    // the query's own codes minimize every per-subspace term, so its ADC
    // distance is the global minimum; anything ranked above it can only tie
    val selfDist = out.find(_.getLong(2) == 0L).get.getDouble(3)
    assert(dists.head == selfDist)
  }
}

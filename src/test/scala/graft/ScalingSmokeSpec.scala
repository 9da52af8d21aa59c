package graft

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Perf smoke (VERDICT r2 #8): converts the "scales by construction" claims of
  * the dedup/ANN suite into a measured curve — each headline operator runs at
  * sf0.001 → sf0.01 → sf0.1 (10× row growth per step) and the sf0.01→sf0.1
  * step must stay inside a generous linearity envelope. Quadratic behavior
  * (an all-pairs product, an unbucketed join) blows the bound by an order of
  * magnitude; box noise and fixed per-query overhead do not, because
  * sub-second timings are floored before the ratio. */
object PerfSmoke extends Tag("graft.PerfSmoke")

/** A 10× sf0.1 corpus (documents + embeddings) generated once under target/:
  * the sf1 decade of the linearity envelope (VERDICT r5 #7). Each copy k
  * retags every word with a `c$k` prefix and hash-jitters every vector
  * coordinate, so replication adds DATA — 10× more distinct documents with
  * the same shape statistics — not 10 near-copies of every document (which
  * would quadratically inflate every pair-generation output and measure the
  * corpus construction, not the operator). doc/vec ids offset by 10M per
  * copy; copy 0 keeps the original ids, so `vec_id < 5`-style query sets
  * stay valid. */
object Sf1Corpus {
  // Delegates to the shared [[graft.ScaleCorpus]] generator (ALL ten tables,
  // same retag/jitter/offset scheme) so the scaling envelope and the full
  // sf1 bench run measure the exact same corpus.
  def dir(spark: org.apache.spark.sql.SparkSession): String =
    ScaleCorpus.generate(spark, "/root/testdata/sf0.1", "target/bench-sf1", 10)
}

class ScalingSmokeSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  /** Bounded session for the sf1 decades (r17 driver env: the whole-suite
    * accumulated context died mid-sf1 — "Job cancelled because SparkContext
    * was shut down" — ~500 prior tests' pinned localCheckpoint blocks and
    * codegen caches sharing one 8g JVM with a 10× corpus). Stopping the
    * shared context drops every pinned block, and SessionMemo evicts that
    * context's entries on application end; the next access rebuilds a fresh
    * session, so the heavy test starts from a quiet block manager and later
    * suites are unaffected (SparkTestSession rebuilds on demand). */
  private def freshSpark: org.apache.spark.sql.SparkSession = {
    val s = SparkTestSession.spark
    if (!s.sparkContext.isStopped) s.stop()
    SparkTestSession.spark
  }

  private val watched = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "sim_lsh_topk", "sim_pq_topk",
    "decontam_overlap", "text_tfidf", "text_pii",
    "dedup_span_fraction", "text_unigram_score", "layout_zorder",
    "chunk_windows", "chunk_dedup", "dsir_select", "sketch_heavy_hitters",
    "gate_admission", "bpe_tokenize", "lm_fluency",
    "dedup_simhash_capped", "dedup_delta_minhash_capped",
    "pack_bpe_sequences",
    "text_bm25_topk", "decontam_fuzzy", "quality_classifier",
    "dedup_span_removal", "quality_ppl_buckets", "mix_cluster_weights",
    "text_bm25_appended", "lm_fluency_stored", "lm_fluency_appended",
    "sample_weighted", "corpus_diversity", "export_curriculum",
    "dedup_cross_source_matrix", "corpus_card", "bpe_tokenize_stored")

  /** Steady-state timing, matching the bench contract (r6: untimed artifact
    * pass before anything is timed): the first run builds content-keyed
    * artifacts / memos / JIT cold paths untimed, the second run is measured.
    * Without this the envelope compares a memo-warm small scale against a
    * cold big scale — the r7 flake: dedup_ngram_jaccard measured 0.07 s at
    * sf0.1 (memo hit from the earlier test) vs 10-30 s at sf1 (cold build,
    * variance straight through the 20× bound). Both sides steady-state makes
    * the ratio measure the OPERATOR's scaling, not cache asymmetry. */
  private def time(name: String, dir: String): Double = {
    SparkEntry.queries(name)(spark, dir).count() // untimed: warm artifacts
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  test("dedup/ANN suite grows ~linearly from sf0.01 to sf0.1 (10x rows)",
      PerfSmoke) {
    // untimed warm pass: JIT + codegen-cache the shared generated classes
    watched.foreach(time(_, "/root/testdata/sf0.001"))
    val curve = watched.map { q =>
      val t001 = time(q, "/root/testdata/sf0.001")
      val t01 = time(q, "/root/testdata/sf0.01")
      val t1 = time(q, "/root/testdata/sf0.1")
      info(f"$q%-22s sf0.001 $t001%6.2fs  sf0.01 $t01%6.2fs  sf0.1 $t1%6.2fs")
      (q, t01, t1)
    }
    curve.foreach { case (q, t01, t1) =>
      // 10× the data may cost ≤ 10× the (overhead-floored) time, ×2 slack.
      val bound = 20.0 * math.max(t01, 0.5)
      assert(t1 <= bound,
        s"$q: sf0.1 took ${t1}s > ${bound}s — superlinear vs sf0.01 (${t01}s)")
    }
  }

  // The sf1 decade: the core dedup/ANN/chunk/selection suite one more 10×
  // step, against the generated Sf1Corpus (text-stat queries stop at sf0.1 —
  // their linearity is already pinned above and the generated corpus retags
  // vocabulary, which shifts their outputs, not their shape).
  private val watchedSf1 = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_span_fraction", "sim_lsh_topk",
    "sim_pq_topk", "chunk_windows", "chunk_dedup", "dsir_select",
    "sketch_heavy_hitters", "gate_admission", "export_shuffle")

  test("trained ANN recall holds on the sf1 corpus (persisted IVF, probe-pruned)",
      PerfSmoke) {
    // VERDICT r6 #6: recall pinned at the 10× decade, not just on the planted
    // 520-row cluster corpus. The generated sf1 embeddings carry their own
    // ground truth: each original vector's 9 hash-jittered copies (±0.05/coord)
    // are its exact cosine top-10 — retrieving them through the persisted,
    // list-partitioned, probe-pruned index is the scale path end to end.
    import org.apache.spark.sql.functions._
    import graft.operators.{AnnIndex, Similarity}
    val spark = freshSpark
    val sf1 = Sf1Corpus.dir(spark)
    val corpus = spark.read.parquet(s"$sf1/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .localCheckpoint()
    val q = corpus.filter(col("vec_id") < 8)
    val t0 = System.nanoTime()
    val exact = Similarity.bruteForceTopK(q, corpus,
        "vec_id", "vec_id", "embedding", k = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val tBrute = (System.nanoTime() - t0) / 1e9
    val idx = AnnIndex.ivfIndexDir(corpus, s"$sf1/embeddings.parquet",
      "vec_id", "embedding", nlist = 32, iters = 3, seed = 42L,
      variant = "sf1_recall_pin")
    val t1 = System.nanoTime()
    val got = AnnIndex.queryIvf(spark, idx, q, "vec_id", "embedding",
        k = 10, nprobe = 8)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tIvf = (System.nanoTime() - t1) / 1e9
    val recall = exact.count(got.contains).toDouble / exact.length
    info(f"sf1 recall@10 $recall%.3f  brute ${tBrute}%.2fs  ivf(nprobe=8/32) ${tIvf}%.2fs")
    assert(recall >= 0.8, s"sf1 probe-pruned recall@10 $recall < 0.8")
  }

  test("dedup/ANN/chunk suite stays ~linear one decade further (sf0.1 -> sf1)",
      PerfSmoke) {
    val sf1 = Sf1Corpus.dir(freshSpark)
    watchedSf1.foreach(time(_, "/root/testdata/sf0.01")) // warm codegen
    val curve = watchedSf1.map { q =>
      val t1 = time(q, "/root/testdata/sf0.1")
      val t10 = time(q, sf1)
      info(f"$q%-22s sf0.1 $t1%6.2fs  sf1 $t10%6.2fs")
      (q, t1, t10)
    }
    curve.foreach { case (q, t1, t10) =>
      // floor 1.0 s: sub-second sf0.1 timings are mostly fixed overhead, and
      // a quadratic operator would blow a 20 s bound by 5-50× anyway
      val bound = 20.0 * math.max(t1, 1.0)
      assert(t10 <= bound,
        s"$q: sf1 took ${t10}s > ${bound}s — superlinear vs sf0.1 (${t1}s)")
    }
  }
}

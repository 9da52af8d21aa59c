package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndex, Similarity}

/** Persisted-IVF-index contracts: build-once reuse, probe-pruned scans
  * (partition pruning visible in the executed plan), and recall against the
  * exact brute-force ground truth on clustered data. */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mix(a: Long, b: Long): Double =
    (Math.floorMod(a * 2654435761L + b * 40503L + 12345L, 100000L)
      .toDouble / 100000.0 - 0.5) * 2.0

  /** 8 separated clusters of 40 points in R^16 (same family as
    * DedupSimilaritySpec's recall gates). */
  private def clustered = (for (c <- 0 until 8; p <- 0 until 40) yield {
    val id = (c * 40 + p).toLong
    (id, (0 until 16).map(i => mix(c * 31L + 7, i) + 0.1 * mix(id * 131L + 3, i)))
  }).toDF("vec_id", "embedding")

  test("IVF index: build once, query via pruned partitions, recall@10 >= 0.9") {
    val corpus = clustered.cache()
    val queries = corpus.filter($"vec_id" % 40 === 0)
    val dir = AnnIndex.ivfIndexDir(corpus, "mem://ann_index_spec", "vec_id",
      "embedding", nlist = 8, iters = 3, seed = 42L, variant = "spec_v1")
    // build is idempotent: a second call must reuse the same directory
    assert(dir == AnnIndex.ivfIndexDir(corpus, "mem://ann_index_spec",
      "vec_id", "embedding", nlist = 8, iters = 3, seed = 42L,
      variant = "spec_v1"))

    val got = AnnIndex.queryIvf(spark, dir, queries, "vec_id", "embedding",
      k = 10, nprobe = 2)
    // probe pruning is structural: the inverted-file scan must carry a static
    // list_id partition filter (only nprobe/nlist of the files are touched)
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [list_id"), p)

    val exact = Similarity.bruteForceTopK(queries, corpus,
        "vec_id", "vec_id", "embedding", k = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val approx = got.select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.length
    assert(recall >= 0.9, s"index recall@10 $recall < 0.9")
    corpus.unpersist()
  }

  test("IVF+PQ index: lists hold codes only, pruned ADC + refine, recall@10 >= 0.9") {
    val corpus = clustered.cache()
    val queries = corpus.filter($"vec_id" % 40 === 0)
    val dir = AnnIndex.ivfPqIndexDir(corpus, "mem://ann_index_spec", "vec_id",
      "embedding", nlist = 8, m = 8, ksub = 16, iters = 3, seed = 42L,
      variant = "spec_pq_v1")
    assert(dir == AnnIndex.ivfPqIndexDir(corpus, "mem://ann_index_spec",
      "vec_id", "embedding", nlist = 8, m = 8, ksub = 16, iters = 3,
      seed = 42L, variant = "spec_pq_v1"))

    // The space win is structural: the inverted lists persist ONLY
    // (cid, c0..c{m-1}) — no vector column anywhere in the on-disk schema.
    val listCols = spark.read.parquet(s"$dir/lists").columns.toSet
    assert(listCols == (Set("cid", "list_id") ++ (0 until 8).map(b => s"c$b")),
      listCols.toString)

    val got = AnnIndex.queryIvfPq(spark, dir, corpus, queries,
      "vec_id", "vec_id", "embedding", k = 10, nprobe = 2, rerank = 30)
    val p = got.queryExecution.executedPlan.toString
    // ADC scan: static partition pruning on list_id; refine: broadcast join
    // fetching only shortlist vectors (no shuffle of the corpus side).
    assert(p.contains("PartitionFilters: [list_id"), p)
    assert(p.contains("BroadcastHashJoin"), p)

    val exact = Similarity.bruteForceTopK(queries, corpus,
        "vec_id", "vec_id", "embedding", k = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val approx = got.select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.length
    assert(recall >= 0.9, s"ivfpq index recall@10 $recall < 0.9")
    corpus.unpersist()
  }

  test("compact merges per-epoch append files into one per list; " +
    "results are byte-identical before and after") {
    val corpus = clustered.cache()
    val initial = corpus.filter($"vec_id" % 40 < 20)
    // fresh variant per run: the dir (and its epoch markers) is content-keyed
    // and outlives the JVM — a reused dir would no-op the appends below
    val dir = AnnIndex.ivfIndexDir(initial, "mem://ann_compact_spec",
      "vec_id", "embedding", nlist = 8, iters = 3, seed = 42L,
      variant = s"compact_${java.util.UUID.randomUUID().toString.take(8)}")
    // five appended epochs — each leaves a file per touched list
    val append = AnnIndex.ivfAppender(spark, dir, "vec_id", "embedding")
    for (e <- 0 until 5)
      append(corpus.filter($"vec_id" % 40 === 20 + e), e.toLong)
    val before = AnnIndex.listFileCount(spark, dir)
    assert(before > 8, s"appends should fragment the lists, saw $before files")

    val queries = corpus.filter($"vec_id" % 40 === 0)
    def results() = AnnIndex.queryIvf(spark, dir, queries, "vec_id",
        "embedding", k = 10, nprobe = 2)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    val pre = results()
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.listFileCount(spark, dir) <= 8,
      s"compact must leave at most one file per list")
    assert(results() == pre, "compaction changed query results")
    // idempotent: compacting a compacted index is a no-op rewrite
    AnnIndex.compact(spark, dir)
    assert(results() == pre)
    corpus.unpersist()
  }

  test("retract removes the ids' postings only: taken-down vectors stop " +
    "being retrievable, everything else is byte-identical, and a " +
    "mid-retract crash window heals") {
    val corpus = clustered.cache()
    val dir = AnnIndex.ivfIndexDir(corpus, "mem://ann_retract_spec",
      "vec_id", "embedding", nlist = 8, iters = 3, seed = 42L,
      variant = s"retract_${java.util.UUID.randomUUID().toString.take(8)}")
    val queries = corpus.filter($"vec_id" % 40 === 0)
    def results() = AnnIndex.queryIvf(spark, dir, queries, "vec_id",
        "embedding", k = 10, nprobe = 2)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pre = results()
    val gone = Seq(1L, 41L, 200L)
    assert(gone.exists(g => pre.exists(_._2 == g)),
      "fixture: retracted ids should appear in some top-10 before retract")
    AnnIndex.retract(spark, dir, gone)
    val post = results()
    assert(post.forall { case (_, cid) => !gone.contains(cid) },
      s"retracted ids still retrievable: ${post.filter(p => gone.contains(p._2))}")
    assert(pre.filter(p => !gone.contains(p._2)).subsetOf(post),
      "retract disturbed postings it should not have touched")
    // mid-retract crash window: lists moved aside, publish not yet done —
    // the next maintenance call heals from the aside
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/lists"),
      new org.apache.hadoop.fs.Path(s"$dir/.lists_precompact")))
    AnnIndex.retract(spark, dir, Seq(2L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/lists")))
    assert(results().forall { case (_, cid) =>
      !gone.contains(cid) && cid != 2L })
    corpus.unpersist()
  }

  test("a retract that would empty the index fails loudly (delete + " +
    "reseed is the verb for that) and leaves the store intact") {
    val two = Seq((1L, Seq.fill(16)(1.0)), (2L, (0 until 16).map(_.toDouble)))
      .toDF("vec_id", "embedding")
    val dir = AnnIndex.ivfIndexDir(two, "mem://ann_empty_guard", "vec_id",
      "embedding", nlist = 2, iters = 2, seed = 42L,
      variant = s"eg_${java.util.UUID.randomUUID().toString.take(8)}")
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.retract(spark, dir, Seq(1L, 2L))
    }
    assert(ex.getMessage.contains("every vector"))
    assert(spark.read.parquet(s"$dir/lists").count() == 2L,
      "the refused retract must leave the store untouched")
    AnnIndex.retract(spark, dir, Seq(1L)) // a non-emptying retract still works
    assert(spark.read.parquet(s"$dir/lists").select("cid")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("semantic probe flags stored near-duplicates through a statically " +
    "pruned list scan") {
    val corpus = clustered.cache()
    val dir = AnnIndex.ivfIndexDir(corpus, "mem://ann_semprobe_spec",
      "vec_id", "embedding", nlist = 8, iters = 3, seed = 42L,
      variant = "semprobe_v1")
    // probe 900: vec_id 0's vector nudged by 1e-3 on dim 0 — a semantic
    // near-dup (cos ~ 0.9999); probe 901: a constant vector no stored point
    // is within 0.999 of
    val v0 = corpus.filter($"vec_id" === 0L).select("embedding")
      .head().getSeq[Double](0)
    val near = v0.zipWithIndex.map { case (x, i) => if (i == 0) x + 1e-3 else x }
    val far = Seq.fill(16)(2.0)
    val probes = Seq((900L, near), (901L, far)).toDF("vec_id", "embedding")
    val flagged = AnnIndex.probeStoredVectors(spark, dir, probes, "vec_id",
      "embedding", threshold = 0.999, nprobe = 2)
    // probe pruning is structural, same pin as queryIvf: the inverted-file
    // scan must carry a static list_id partition filter
    val p = flagged.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [list_id"), p)
    assert(flagged.collect().map(_.getLong(0)).toSeq == Seq(900L))
    corpus.unpersist()
  }
}

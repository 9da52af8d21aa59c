package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Bm25Store}

/** Behavioral pins for the BM25 retrieval operator (scores themselves are
  * hash-oracled by `text_bm25_topk`; these pin the ranking semantics on a
  * hand-built corpus where the right order is checkable by eye). */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark join"),          // heavy on the rare-ish terms
    (2L, "spark join window filter merge"),  // all three terms, once each
    (3L, "join the common common common common words here"),
    (4L, "entirely unrelated text about cats and dogs"),
    (5L, "window window spark"),
    (6L, "")).toDF("doc_id", "text")

  test("docs sharing no query term never appear; k bounds each query") {
    val out = Bm25.topK(corpus, "doc_id", "text",
      Seq(10L -> "spark join window", 20L -> "cats"), k = 2).collect()
    val byQ = out.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.map(_.getLong(1)).toSet }
    assert(byQ(20L) == Set(4L))               // only doc 4 mentions cats
    assert(byQ(10L).size == 2)                // k=2 cap
    assert(!byQ(10L).contains(4L) && !byQ(10L).contains(6L))
  }

  test("rk is 1..n per query in (score desc, doc_id asc) order") {
    val out = Bm25.topK(corpus, "doc_id", "text",
      Seq(1L -> "spark join window"), k = 5)
      .orderBy("rk").collect()
    assert(out.map(_.getLong(3)).toSeq == (1L to out.length).toSeq)
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    // the multi-term matches (doc 5: two terms + very short; doc 2: all
    // three terms) must fill the top two ahead of the single-term repeats
    assert(out.take(2).map(_.getLong(1)).toSet == Set(2L, 5L))
    // doc 3's lone `join` in a long commons-padded doc ranks last
    assert(out.last.getLong(1) == 3L)
  }

  test("stored probe equals the inline probe exactly; both store scans are " +
    "partition-pruned to the query terms' buckets") {
    val dir = java.nio.file.Files.createTempDirectory("bm25store").toString
    val qs = Seq(10L -> "spark join window", 20L -> "cats")
    Bm25Store.seed(corpus, "doc_id", "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val inline = rows(Bm25.topK(corpus, "doc_id", "text", qs, k = 3))
    val stored = rows(Bm25Store.probeStored(spark, dir, qs, k = 3))
    assert(stored == inline, s"stored=$stored inline=$inline")
    // the probe's plan must show BOTH store scans statically pruned by wb
    val p = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(out)(
        Bm25Store.probeStored(spark, dir, qs, k = 3).explain("formatted"))
      out.toString
    }
    assert("PartitionFilters: \\[[^\\n]*wb".r.findFirstIn(p).isDefined, p)
    assert(p.linesIterator.count(l =>
      l.contains("PartitionFilters") && l.contains("wb")) >= 2, p)
  }

  test("a layout/tokenizer mismatch fails loudly, never silent zero matches") {
    val dir = java.nio.file.Files.createTempDirectory("bm25bad").toString
    Bm25Store.seed(corpus, "doc_id", "text", dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/_params")
    val out = fs.create(p, true)
    out.write("bm25_v0,other_tokenizer,64".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException] {
      Bm25Store.probeStored(spark, dir, Seq(1L -> "spark"), k = 3)
    }
    assert(e.getMessage.contains("layout"), e.getMessage)
  }

  test("incremental build ≡ batch build: seed + appended epochs (+ a replayed " +
    "delivery) probe identically to a seeded-at-once store") {
    val seedDir = java.nio.file.Files.createTempDirectory("bm25seed").toString
    val appDir = java.nio.file.Files.createTempDirectory("bm25app").toString
    val qs = Seq(1L -> "spark join window", 2L -> "cats")
    Bm25Store.seed(corpus, "doc_id", "text", seedDir)
    Bm25Store.seed(corpus.filter("doc_id <= 2"), "doc_id", "text", appDir)
    val app = Bm25Store.appender(spark, appDir, "doc_id", "text",
      autoCompactEvery = 0)
    app(corpus.filter("doc_id IN (3, 4)"), 0L)
    app(corpus.filter("doc_id IN (5, 6)"), 1L)
    app(corpus.filter("doc_id IN (5, 6)"), 1L) // at-least-once replay: no-op
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(rows(Bm25Store.probeStored(spark, appDir, qs, k = 4)) ==
      rows(Bm25Store.probeStored(spark, seedDir, qs, k = 4)))
  }

  test("appender crash windows: a committed-but-unpublished stage heals on " +
    "restart; a pre-marker orphan is discarded and its epoch replays whole") {
    val dir = java.nio.file.Files.createTempDirectory("bm25crash").toString
    val qs = Seq(1L -> "spark join window", 2L -> "cats")
    Bm25Store.seed(corpus.filter("doc_id <= 2"), "doc_id", "text", dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // orphan: staged rows but no marker — must be dropped, not published
    val orphan = new org.apache.hadoop.fs.Path(s"$dir/.bm25app_stage_stream_7")
    fs.mkdirs(new org.apache.hadoop.fs.Path(orphan, "postings"))
    // committed: stage + marker but crash before publish — must be finished
    val app0 = Bm25Store.appender(spark, dir, "doc_id", "text",
      autoCompactEvery = 0)
    app0(corpus.filter("doc_id IN (3, 4)"), 0L)
    // fabricate epoch 1's post-marker pre-publish window for real: build the
    // epoch's exact stage layout (seed a scratch store from just docs 5+6,
    // whose postings/df/scalars ARE what writeStage produces for that batch),
    // move it under the real store as the stage dir, write the epoch marker —
    // the crash point is now "marker durable, publish not started"
    val scratch = java.nio.file.Files.createTempDirectory("bm25tmp").toString
    Bm25Store.seed(corpus.filter("doc_id IN (5, 6)"), "doc_id", "text", scratch)
    val stage = new org.apache.hadoop.fs.Path(s"$dir/.bm25app_stage_stream_1")
    fs.mkdirs(stage)
    Seq("postings", "df").foreach { sub =>
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$scratch/$sub"),
        new org.apache.hadoop.fs.Path(stage, sub)))
    }
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$scratch/scalars/base"),
      new org.apache.hadoop.fs.Path(stage, "scalars_delta")))
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/_bm25app_stream_epoch_1"), true).close()
    // restart: the heal sweep at appender construction finishes the publish;
    // the re-delivered epoch is then a marker-guarded no-op
    val app1 = Bm25Store.appender(spark, dir, "doc_id", "text",
      autoCompactEvery = 0)
    app1(corpus.filter("doc_id IN (5, 6)"), 1L)
    assert(!fs.exists(stage), "committed stage must publish on restart")
    assert(!fs.exists(orphan), "pre-marker orphan must be discarded")
    val seedDir = java.nio.file.Files.createTempDirectory("bm25seed2").toString
    Bm25Store.seed(corpus, "doc_id", "text", seedDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(rows(Bm25Store.probeStored(spark, dir, qs, k = 4)) ==
      rows(Bm25Store.probeStored(spark, seedDir, qs, k = 4)))
  }

  test("compact folds epoch files and df partials; probes unchanged; a " +
    "mid-compact crash window heals on the next read") {
    val dir = java.nio.file.Files.createTempDirectory("bm25cmp").toString
    val qs = Seq(1L -> "spark join window", 2L -> "cats")
    Bm25Store.seed(corpus.filter("doc_id <= 2"), "doc_id", "text", dir)
    val app = Bm25Store.appender(spark, dir, "doc_id", "text",
      autoCompactEvery = 0)
    app(corpus.filter("doc_id IN (3, 4)"), 0L)
    app(corpus.filter("doc_id IN (5, 6)"), 1L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val before = rows(Bm25Store.probeStored(spark, dir, qs, k = 4))
    val filesBefore = Bm25Store.fileCount(spark, dir)
    Bm25Store.compact(spark, dir)
    assert(Bm25Store.fileCount(spark, dir) <= filesBefore)
    assert(rows(Bm25Store.probeStored(spark, dir, qs, k = 4)) == before)
    // mid-compact crash: table moved aside, rewrite not yet published
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/df"),
      new org.apache.hadoop.fs.Path(s"$dir/.df_precompact")))
    assert(rows(Bm25Store.probeStored(spark, dir, qs, k = 4)) == before)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/df")))
    // post-publish crash: a COMPLETED compact's stale aside (root AND aside
    // both present) must never block the next compact
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/.postings_precompact"))
    Bm25Store.compact(spark, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.postings_precompact")))
    assert(rows(Bm25Store.probeStored(spark, dir, qs, k = 4)) == before)
  }

  test("auto-compaction keeps a long-lived appender's file count bounded " +
    "without any manual compact call") {
    val dir = java.nio.file.Files.createTempDirectory("bm25auto").toString
    Bm25Store.seed(corpus.filter("doc_id = 1"), "doc_id", "text", dir)
    val app = Bm25Store.appender(spark, dir, "doc_id", "text",
      autoCompactEvery = 2, autoCompactFactor = 2)
    (0 until 8).foreach { e =>
      app(spark.createDataFrame(Seq(
        (100L + e, s"epoch $e spark join window filler text")))
        .toDF("doc_id", "text"), e.toLong)
    }
    // steady state: ≤ factor×parts at the last check, plus ≤ checkEvery
    // epochs of ≤ 1-file-per-touched-partition slack before the next one
    val parts = math.max(1, Bm25Store.partitionDirCount(spark, dir))
    val bound = (2 + 2 + 1) * parts
    assert(Bm25Store.fileCount(spark, dir) <= bound,
      s"files=${Bm25Store.fileCount(spark, dir)} bound=$bound")
    // scalar ledger still exact: 1 seed doc + 8 appended docs
    val probe = Bm25Store.probeStored(spark, dir,
      Seq(1L -> "spark"), k = 20)
    assert(probe.count() >= 5) // seed doc + every appended doc mentions spark
  }

  test("retract: re-probe hash-matches a from-scratch build without the " +
    "docs; a word unique to the retracted doc vanishes; a mid-retract " +
    "crash residue heals at the next maintenance call") {
    val dir = java.nio.file.Files.createTempDirectory("bm25ret").toString
    val fresh = java.nio.file.Files.createTempDirectory("bm25fresh").toString
    val qs = Seq(1L -> "spark join window", 2L -> "cats", 3L -> "common")
    Bm25Store.seed(corpus, "doc_id", "text", dir)
    Bm25Store.retract(spark, dir, Seq(4L, 5L))
    Bm25Store.seed(corpus.filter("doc_id NOT IN (4, 5)"), "doc_id", "text",
      fresh)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val got = rows(Bm25Store.probeStored(spark, dir, qs, k = 5))
    val want = rows(Bm25Store.probeStored(spark, fresh, qs, k = 5))
    assert(got == want, s"retracted=$got fresh=$want")
    assert(!got.exists(r => r._2 == 4L || r._2 == 5L))
    // 'cats' lived only in doc 4: its df row (the word is derived content)
    // must be gone from the store entirely
    assert(spark.read.parquet(s"$dir/df")
      .filter(org.apache.spark.sql.functions.col("word") === "cats")
      .count() == 0L)
    // non-subset retract of already-gone ids is a no-op (anti-join finds
    // nothing; ledger deltas are zero)
    Bm25Store.retract(spark, dir, Seq(4L))
    assert(rows(Bm25Store.probeStored(spark, dir, qs, k = 5)) == want)
    // mid-retract crash residue (postings moved aside, publish pending):
    // the next retract heals it first, then applies its own takedown
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/postings"),
      new org.apache.hadoop.fs.Path(s"$dir/.postings_precompact")))
    Bm25Store.retract(spark, dir, Seq(3L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/postings")))
    val after = rows(Bm25Store.probeStored(spark, dir, qs, k = 5))
    assert(!after.exists(r => Seq(3L, 4L, 5L).contains(r._2)))
  }

  test("term saturation: repeating one term cannot outrank matching two") {
    val out = Bm25.topK(corpus, "doc_id", "text",
      Seq(1L -> "spark window"), k = 3).orderBy("rk").collect()
    val order = out.map(_.getLong(1)).toSeq
    // doc 5 has both terms (window twice, spark once) and is short; it must
    // beat doc 1 (spark x3, no window)
    assert(order.indexOf(5L) < order.indexOf(1L), order.mkString(","))
  }

  test("driver-side qtermRows + bucket hash match the Spark expressions " +
    "(the stored probe's zero-job term prep)") {
    import org.apache.spark.sql.functions._
    val queries = Seq(1L -> "spark join window", 2L -> "  padded   terms ",
      3L -> "dup dup dup", 4L -> "")
    val viaDf = graft.operators.Bm25.qtermsOf(spark, queries)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaDriver = graft.operators.Bm25.qtermRows(queries).toSet
    assert(viaDf === viaDriver)
    // bucket parity: Spark's pmod(xxhash64(w), 64) vs the driver twin
    import spark.implicits._
    val words = viaDriver.map(_._2).toSeq
    val exprBuckets = words.toDF("w")
      .select(col("w"), pmod(xxhash64(col("w")), lit(64L)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      val drv = Math.floorMod(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(w),
          org.apache.spark.sql.types.StringType, 42L), 64L)
      assert(drv === exprBuckets(w), s"bucket mismatch for '$w'")
    }
  }
}

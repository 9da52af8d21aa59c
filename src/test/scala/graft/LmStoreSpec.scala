package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmStore

/** Contract pins for the persisted bigram-LM store (score values themselves
  * are hash-oracled by `lm_fluency_stored`/`lm_fluency_appended`; these pin
  * the store protocol and the probe shapes on a hand-built corpus). */
class LmStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ran on the mat"),
    (3L, "a dog sat on a log"),
    (4L, "entirely novel words here"),
    (5L, "the"),                             // 1 token: no transitions
    (6L, "")).toDF("doc_id", "text")

  private def scores(dir: String, docs: org.apache.spark.sql.DataFrame) =
    LmStore.scoreStored(spark, dir, docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("every batch doc scores; transition-less docs score 0.0; repeated " +
    "transitions score above novel ones") {
    val dir = java.nio.file.Files.createTempDirectory("lmseed").toString
    LmStore.seed(corpus, "doc_id", "text", dir)
    val out = scores(dir, corpus)
    assert(out.size == 6)
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(5L)._2 == 0L && byId(5L)._3 == 0.0)
    assert(byId(6L)._2 == 0L && byId(6L)._3 == 0.0)
    // docs 1/2 share the corpus's dominant transitions; doc 4 is all
    // singletons — the LM must rank it least fluent of the scored docs
    val scored = Seq(1L, 2L, 3L, 4L).map(id => byId(id)._3)
    assert(scored.take(3).forall(_ > byId(4L)._3), out.toString)
  }

  test("unseen transitions smooth to (0+1)/(0+V): probing docs outside the " +
    "corpus never drops rows or divides by zero") {
    val dir = java.nio.file.Files.createTempDirectory("lmunseen").toString
    LmStore.seed(corpus, "doc_id", "text", dir)
    val probe = Seq((100L, "zzz qqq www")).toDF("doc_id", "text")
    val out = scores(dir, probe)
    assert(out.size == 1)
    val (_, nTrans, s) = out.head
    assert(nTrans == 2L)
    // vocab V = distinct corpus words; each unseen transition scores 1/V
    val v = spark.read.parquet(s"$dir/vocab").select("word").distinct().count()
    assert(math.abs(s - 1.0 / v) < 1e-6, s"$s vs 1/$v")
  }

  test("incremental build ≡ batch build: seed + appended epochs (+ a replayed " +
    "delivery) score identically to a seeded-at-once store") {
    val seedDir = java.nio.file.Files.createTempDirectory("lmsd").toString
    val appDir = java.nio.file.Files.createTempDirectory("lmap").toString
    LmStore.seed(corpus, "doc_id", "text", seedDir)
    LmStore.seed(corpus.filter("doc_id <= 2"), "doc_id", "text", appDir)
    val app = LmStore.appender(spark, appDir, "doc_id", "text",
      autoCompactEvery = 0)
    app(corpus.filter("doc_id IN (3, 4)"), 0L)
    app(corpus.filter("doc_id IN (5, 6)"), 1L)
    app(corpus.filter("doc_id IN (5, 6)"), 1L) // at-least-once replay: no-op
    assert(scores(appDir, corpus) == scores(seedDir, corpus))
  }

  test("compact merges count partials and dedups vocab; scores unchanged; a " +
    "mid-compact crash window heals on the next probe") {
    val dir = java.nio.file.Files.createTempDirectory("lmcmp").toString
    LmStore.seed(corpus.filter("doc_id <= 2"), "doc_id", "text", dir)
    val app = LmStore.appender(spark, dir, "doc_id", "text",
      autoCompactEvery = 0)
    app(corpus.filter("doc_id IN (3, 4)"), 0L)
    app(corpus.filter("doc_id IN (5, 6)"), 1L)
    val before = scores(dir, corpus)
    val filesBefore = LmStore.fileCount(spark, dir)
    LmStore.compact(spark, dir)
    assert(LmStore.fileCount(spark, dir) <= filesBefore)
    // partials merged: at most one row per (prev, cur)
    val bg = spark.read.parquet(s"$dir/bigrams").select("prev", "cur")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(bg.distinct.size == bg.size, "unmerged bigram partials after compact")
    assert(scores(dir, corpus) == before)
    // mid-compact crash: table moved aside, rewrite not yet published
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/prefix"),
      new org.apache.hadoop.fs.Path(s"$dir/.prefix_precompact")))
    assert(scores(dir, corpus) == before)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/prefix")))
    // post-publish crash: a COMPLETED compact's stale aside (root AND aside
    // both present) must never block the next compact
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/.vocab_precompact"))
    LmStore.compact(spark, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.vocab_precompact")))
    assert(scores(dir, corpus) == before)
  }

  test("appender crash windows: a committed-but-unpublished stage heals on " +
    "restart; a pre-marker orphan is discarded") {
    val dir = java.nio.file.Files.createTempDirectory("lmcr").toString
    LmStore.seed(corpus.filter("doc_id <= 2"), "doc_id", "text", dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(s"$dir/.lmapp_stage_stream_7")
    fs.mkdirs(new org.apache.hadoop.fs.Path(orphan, "bigrams"))
    // fabricate epoch 0's post-marker pre-publish window: a scratch seed of
    // the epoch's docs gives the count tables; the v2 vocab contract means
    // the real appender's stage holds only the words NOT already stored, so
    // the fabricated stage anti-joins the scratch vocab the same way
    val scratch = java.nio.file.Files.createTempDirectory("lmtmp").toString
    LmStore.seed(corpus.filter("doc_id IN (3, 4)"), "doc_id", "text", scratch)
    val newWords = spark.read.parquet(s"$scratch/vocab")
      .join(spark.read.parquet(s"$dir/vocab").select("word"),
        Seq("word"), "left_anti")
      .localCheckpoint()
    newWords.write.mode("overwrite").partitionBy("wb")
      .parquet(s"$scratch/vocab_new")
    fs.delete(new org.apache.hadoop.fs.Path(s"$scratch/vocab"), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$scratch/vocab_new"),
      new org.apache.hadoop.fs.Path(s"$scratch/vocab")))
    val stage = new org.apache.hadoop.fs.Path(s"$dir/.lmapp_stage_stream_0")
    fs.mkdirs(stage)
    Seq("bigrams", "prefix", "vocab").foreach { sub =>
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$scratch/$sub"),
        new org.apache.hadoop.fs.Path(stage, sub)))
    }
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/_lmapp_stream_epoch_0"), true).close()
    // restart: construction heal finishes the publish; redelivery no-ops
    val app = LmStore.appender(spark, dir, "doc_id", "text",
      autoCompactEvery = 0)
    app(corpus.filter("doc_id IN (3, 4)"), 0L)
    app(corpus.filter("doc_id IN (5, 6)"), 1L)
    assert(!fs.exists(stage), "committed stage must publish on restart")
    assert(!fs.exists(orphan), "pre-marker orphan must be discarded")
    val seedDir = java.nio.file.Files.createTempDirectory("lmsd2").toString
    LmStore.seed(corpus, "doc_id", "text", seedDir)
    assert(scores(dir, corpus) == scores(seedDir, corpus))
  }

  test("auto-compaction keeps a long-lived appender's file count bounded " +
    "without any manual compact call") {
    val dir = java.nio.file.Files.createTempDirectory("lmauto").toString
    LmStore.seed(corpus.filter("doc_id = 1"), "doc_id", "text", dir)
    val app = LmStore.appender(spark, dir, "doc_id", "text",
      autoCompactEvery = 2, autoCompactFactor = 2)
    (0 until 8).foreach { e =>
      app(Seq((100L + e, s"epoch $e brings the cat back to the mat"))
        .toDF("doc_id", "text"), e.toLong)
    }
    val parts = math.max(1, LmStore.partitionDirCount(spark, dir))
    val bound = (2 + 2 + 1) * parts
    assert(LmStore.fileCount(spark, dir) <= bound,
      s"files=${LmStore.fileCount(spark, dir)} bound=$bound")
  }

  test("a layout/tokenizer mismatch fails loudly, never silent smoothing") {
    val dir = java.nio.file.Files.createTempDirectory("lmbad").toString
    LmStore.seed(corpus, "doc_id", "text", dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_params"), true)
    out.write("lm1_v0,other_tokenizer,64".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException] {
      LmStore.scoreStored(spark, dir,
        Seq((1L, "the cat")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e.getMessage.contains("layout"), e.getMessage)
  }

  test("a small probe's count scans are partition-pruned to the batch's " +
    "prev-hash buckets") {
    val dir = java.nio.file.Files.createTempDirectory("lmplan").toString
    LmStore.seed(corpus, "doc_id", "text", dir)
    val probe = Seq((50L, "the cat")).toDF("doc_id", "text")
    val p = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(out)(
        LmStore.scoreStored(spark, dir, probe, "doc_id", "text")
          .explain("formatted"))
      out.toString
    }
    assert(p.linesIterator.count(l =>
      l.contains("PartitionFilters") && l.contains("wb")) >= 2, p)
  }

  test("retract: subtracting stored docs leaves the LM count-identical to a " +
    "fresh seed without them (scores AND vocab); a non-subset retract " +
    "fails loudly; a mid-retract crash residue heals") {
    val dir = java.nio.file.Files.createTempDirectory("lmret").toString
    val fresh = java.nio.file.Files.createTempDirectory("lmfresh").toString
    LmStore.seed(corpus, "doc_id", "text", dir)
    LmStore.seed(corpus.filter("doc_id NOT IN (3, 4)"), "doc_id", "text",
      fresh)
    LmStore.retract(spark, dir, corpus.filter("doc_id IN (3, 4)"),
      "doc_id", "text")
    // scoring ANY batch against the retracted store equals the fresh store
    // exactly — same counts, same V, same fold
    assert(scores(dir, corpus) == scores(fresh, corpus))
    // vocab words unique to the retracted docs ('dog', 'novel', ...) are
    // gone — the refcount table exists for exactly this
    val v = spark.read.parquet(s"$dir/vocab").select("word").collect()
      .map(_.getString(0)).toSet
    val w = spark.read.parquet(s"$fresh/vocab").select("word").collect()
      .map(_.getString(0)).toSet
    assert(v == w, s"retracted vocab=$v fresh vocab=$w")
    assert(!v.contains("dog") && !v.contains("novel"))
    // retracting content the store never held must abort loudly BEFORE
    // anything swaps (counts would silently corrupt otherwise)
    val e = intercept[IllegalArgumentException] {
      LmStore.retract(spark, dir,
        Seq((99L, "zzz yyy zzz never stored")).toDF("doc_id", "text"),
        "doc_id", "text")
    }
    assert(e.getMessage.contains("subset"), e.getMessage)
    assert(scores(dir, corpus) == scores(fresh, corpus)) // nothing swapped
    // mid-retract crash residue: bigrams moved aside, publish pending — the
    // next retract heals first, then applies its own takedown
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/bigrams"),
      new org.apache.hadoop.fs.Path(s"$dir/.bigrams_precompact")))
    LmStore.retract(spark, dir, corpus.filter("doc_id = 2"),
      "doc_id", "text")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/bigrams")))
    val fresh2 = java.nio.file.Files.createTempDirectory("lmfresh2").toString
    LmStore.seed(corpus.filter("doc_id NOT IN (2, 3, 4)"), "doc_id", "text",
      fresh2)
    assert(scores(dir, corpus) == scores(fresh2, corpus))
  }

  test("v2 vocab contract: after seed + appends + a replayed epoch, the vocab " +
    "table holds ZERO duplicate words — the probe's flat count(*) is exact") {
    val dir = java.nio.file.Files.createTempDirectory("lmv2").toString
    LmStore.seed(corpus.filter("doc_id <= 2"), "doc_id", "text", dir)
    val app = LmStore.appender(spark, dir, "doc_id", "text",
      autoCompactEvery = 0)
    app(corpus.filter("doc_id IN (3, 4)"), 0L) // overlapping vocab with seed
    app(corpus.filter("doc_id IN (5, 6)"), 1L)
    app(corpus.filter("doc_id IN (5, 6)"), 1L) // re-delivered epoch
    val v = spark.read.parquet(s"$dir/vocab").select("word").collect()
      .map(_.getString(0)).toSeq
    assert(v.distinct.size == v.size,
      s"vocab holds duplicates: ${v.diff(v.distinct).distinct.take(5)}")
    // and it equals the whole corpus's distinct words
    val seedDir = java.nio.file.Files.createTempDirectory("lmv2s").toString
    LmStore.seed(corpus, "doc_id", "text", seedDir)
    val w = spark.read.parquet(s"$seedDir/vocab").select("word").collect()
      .map(_.getString(0)).toSet
    assert(v.toSet == w)
  }
}

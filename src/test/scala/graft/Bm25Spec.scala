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

  test("term saturation: repeating one term cannot outrank matching two") {
    val out = Bm25.topK(corpus, "doc_id", "text",
      Seq(1L -> "spark window"), k = 3).orderBy("rk").collect()
    val order = out.map(_.getLong(1)).toSeq
    // doc 5 has both terms (window twice, spark once) and is short; it must
    // beat doc 1 (spark x3, no window)
    assert(order.indexOf(5L) < order.indexOf(1L), order.mkString(","))
  }
}

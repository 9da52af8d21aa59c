package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

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

  test("term saturation: repeating one term cannot outrank matching two") {
    val out = Bm25.topK(corpus, "doc_id", "text",
      Seq(1L -> "spark window"), k = 3).orderBy("rk").collect()
    val order = out.map(_.getLong(1)).toSeq
    // doc 5 has both terms (window twice, spark once) and is short; it must
    // beat doc 1 (spark x3, no window)
    assert(order.indexOf(5L) < order.indexOf(1L), order.mkString(","))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** [[Dedup.removeDuplicatedSpans]]: keep-first semantics, overlapping-run
  * excision, doc-internal repeats, tail coverage, and reassembly fidelity
  * (window = 4 for compact plants; the declared query runs window = 16). */
class SpanRemovalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] =
    Dedup.removeDuplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        window = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("first occurrence is kept whole; later cross-doc occurrences are excised") {
    val out = run(Seq(
      0L -> "w1 w2 a b c d t1 t2",  // global first "a b c d" (pos 2)
      1L -> "z1 z2 z3 a b c d",     // span at the doc TAIL — coverage must
                                    // reach positions with no full window
      4L -> "a b c d e f g h"))     // span at the doc HEAD
    assert(out(0L) == ((8L, 0L, "w1 w2 a b c d t1 t2")))
    assert(out(1L) == ((7L, 4L, "z1 z2 z3")))
    assert(out(4L) == ((8L, 4L, "e f g h")))
  }

  test("overlapping windows excise a duplicated run longer than the window") {
    val out = run(Seq(
      5L -> "m1 x1 x2 x3 x4 x5 x6",
      6L -> "m2 x1 x2 x3 x4 x5 x6")) // 6-token dup run, window 4: starts at
                                     // pos 1,2,3 jointly cover pos 1..6
    assert(out(5L) == ((7L, 0L, "m1 x1 x2 x3 x4 x5 x6")))
    assert(out(6L) == ((7L, 6L, "m2")))
  }

  test("doc-internal repeat: the second copy inside one document is removed") {
    val out = run(Seq(2L -> "p q r s p q r s x"))
    assert(out(2L) == ((9L, 4L, "p q r s x")))
  }

  test("no duplicated window: document passes through untouched") {
    val out = run(Seq(3L -> "u1 u2 u3 u4 u5"))
    assert(out(3L) == ((5L, 0L, "u1 u2 u3 u4 u5")))
  }

  test("short docs (< window tokens) generate no windows and pass through") {
    val out = run(Seq(7L -> "s1 s2 s3", 8L -> "s1 s2 s3"))
    assert(out(7L) == ((3L, 0L, "s1 s2 s3")))
    assert(out(8L) == ((3L, 0L, "s1 s2 s3")))
  }
}

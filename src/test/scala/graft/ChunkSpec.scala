package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunk

/** Context-window chunking contracts: bit-parity with the sequential
  * slide-a-window definition, edge geometry (short docs, exact-fit docs,
  * whitespace runs), and the duplicated-chunk report. */
class ChunkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def seqChunks(text: String, win: Int, stride: Int): Seq[(Long, Long, Long, String)] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) Seq.empty
    else (0 until toks.length by stride).zipWithIndex.map { case (s, i) =>
      val w = toks.slice(s, s + win)
      (i.toLong, s.toLong, w.length.toLong, w.mkString(" "))
    }
  }

  test("chunkWindows matches the sequential definition on varied geometry") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // many full windows + short tail
      (2L, (1 to 32).map(i => s"u$i").mkString(" ")),  // exactly one window
      (3L, "solo"),                                    // shorter than one window
      (4L, (1 to 56).map(i => s"v$i").mkString(" ")),  // second window short
      (5L, "  a   b \t c  "),                          // whitespace runs + padding
      (6L, (1 to 48).map(i => s"w$i").mkString(" "))   // tail window = pure overlap suffix
    ).toDF("doc_id", "text").repartition(3)
    val got = Chunk.chunkWindows(docs, "doc_id", "text", win = 32, stride = 24)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_._1).toSeq }
    val want = Seq(
      1L -> (1 to 100).map(i => s"t$i").mkString(" "),
      2L -> (1 to 32).map(i => s"u$i").mkString(" "),
      3L -> "solo",
      4L -> (1 to 56).map(i => s"v$i").mkString(" "),
      5L -> "  a   b \t c  ",
      6L -> (1 to 48).map(i => s"w$i").mkString(" ")
    ).map { case (id, t) => id -> seqChunks(t, 32, 24) }.toMap
    assert(got == want)
  }

  test("every token is covered and consecutive windows overlap by win - stride") {
    val df = Seq((7L, (1 to 90).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Chunk.chunkWindows(df, "doc_id", "text", win = 16, stride = 10)
      .orderBy("chunk_id").collect()
    val covered = rows.flatMap(r =>
      r.getLong(2) until (r.getLong(2) + r.getLong(3))).toSet
    assert(covered == (0L until 90L).toSet)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) - a.getLong(2) == 10L)
      val aToks = a.getString(4).split(" ")
      val bToks = b.getString(4).split(" ")
      assert(aToks.drop(10).sameElements(bToks.take(aToks.length - 10)))
    case _ => ()
    }
  }

  test("duplicatedChunks finds cross-doc boilerplate and nothing else") {
    val boiler = (1 to 32).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, boiler + " " + (1 to 24).map(i => s"p$i").mkString(" ")),
      (2L, boiler),                        // exact boilerplate window again
      (3L, (1 to 40).map(i => s"q$i").mkString(" "))
    ).toDF("doc_id", "text")
    val chunks = Chunk.chunkWindows(docs, "doc_id", "text", win = 32, stride = 32)
    val dup = Chunk.duplicatedChunks(chunks, "doc_id").collect()
    assert(dup.length == 1)
    assert(dup.head.getLong(0) == 1L)     // representative = smallest doc_id
    assert(dup.head.getLong(1) == 2L)     // two occurrences
    assert(dup.head.getLong(2) == 2L)     // across two distinct docs
    assert(dup.head.getString(3) == boiler)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontam

/** Behavioral pins for fuzzy (MinHash) decontamination — the score
  * arithmetic is hash-oracled by `decontam_fuzzy`; these pin the leak
  * semantics exact scrubs miss. */
class DecontamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val longDoc = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val otherDoc = (100 to 140).map(i => s"w$i").mkString(" ")

  test("a suffixed eval leak flags its training source; unrelated docs stay clean") {
    val train = Seq((1L, longDoc), (2L, otherDoc)).toDF("doc_id", "text")
    // the leak: the benchmark item is train doc 1 with a pasted answer — its
    // full text (and hence exact fingerprint) differs, its shingles barely do
    val evalSet = Seq((900L, longDoc + " answer key alpha")).toDF("doc_id", "text")
    val out = Decontam.fuzzy(train, evalSet, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    val row = out.head
    assert(row.getLong(1) == 1L)          // one eval doc hit
    // true Jaccard is 38/41 ≈ 0.93; the 32-hash estimate lands at 0.71875
    // for this corpus (deterministic) — comfortably above the 0.5 threshold
    assert(row.getDouble(2) >= 0.6, row)
  }

  test("a paraphrase below the threshold is not flagged") {
    val train = Seq((1L, longDoc)).toDF("doc_id", "text")
    // shares only a short prefix — few common shingles
    val evalSet = Seq((900L, (1 to 5).map(i => s"tok$i").mkString(" ") + " " +
      (200 to 240).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val out = Decontam.fuzzy(train, evalSet, "doc_id", "text").collect()
    assert(out.isEmpty, out.mkString(","))
  }
}

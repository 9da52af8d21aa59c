package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Pins the learned BPE tokenizer: the exact merge sequence on a
  * hand-computed corpus, greedy rank-ordered encoding, lossless decode,
  * deterministic tie-breaks, and the driver-bound contract. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("learns the hand-computed merge sequence (weighted pair counts)") {
    // corpus word freqs: aaab ×3, aab ×2, ab ×1
    //  round 1: (a,a) = 3·2 + 2·1 = 8  beats (a,b) = 3+2+1 = 6    → "aa"
    //  round 2: (a,b) = 3+1 = 4 beats (aa,a) = 3, (aa,b) = 2      → "ab"
    //  round 3: (aa,ab) = 3 beats (aa,b) = 2                      → "aaab"
    val docs = Seq((0L, "aaab aaab aaab aab aab ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 3, minCount = 1)
    assert(m.merges.toSeq == Seq(("a", "a"), ("a", "b"), ("aa", "ab")),
      m.merges.toSeq.toString)
    // greedy rank-ordered encode
    assert(m.encodeWord("aaab") == Seq("aaab"))
    assert(m.encodeWord("aab") == Seq("aa", "b"))
    assert(m.encodeWord("ab") == Seq("ab"))
    assert(m.encodeWord("ba") == Seq("b", "a"), "no learned pair applies")
    assert(m.encodeWord("xyab") == Seq("x", "y", "ab"), "unseen chars stay singletons")
    // decode is concatenation — lossless on arbitrary input
    Seq("aaab", "aab", "ba", "xyzzy", "").foreach { w =>
      assert(m.decode(m.encodeWord(w)) == w)
    }
  }

  test("frequency ties break lexicographically (deterministic training)") {
    val docs = Seq((0L, "cd ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 1, minCount = 1)
    assert(m.merges.toSeq == Seq(("a", "b")))
  }

  test("merge budget past pair exhaustion stops early, never loops") {
    val docs = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 100, minCount = 1)
    // "ab" collapses to one symbol after 1 merge; no pairs remain
    assert(m.merges.length == 1)
  }

  test("the driver-side bound is a contract: over-cap vocab is rejected") {
    val docs = Seq((0L, "one two three four five")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", numMerges = 5, minCount = 1, maxWords = 3)
    }
    assert(e.getMessage.contains("maxWords"))
  }

  test("broadcast encode columns agree with the driver model") {
    val docs = Seq((0L, "aaab aaab aaab aab aab ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 3, minCount = 1)
    val bm = spark.sparkContext.broadcast(m)
    val words = Seq("aaab", "aab", "ab", "ba", "aaa").toDF("w")
    val got = words.select(col("w"),
        Bpe.pieceCountCol(bm)(col("w")).as("np"),
        Bpe.roundTripCol(bm)(col("w")).as("rt"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    words.as[String].collect().foreach { w =>
      assert(got(w) == (m.encodeWord(w).length.toLong, true), w)
    }
    // no shuffle in the encode projection
    val plan = words.select(Bpe.pieceCountCol(bm)(col("w")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("BpeStore: save/load round-trips the exact merge table; markerless " +
    "and params-mismatched stores refuse loudly; a torn save heals on retry") {
    import graft.operators.BpeStore
    val docs = Seq((1L, "low lower lowest low low"), (2L, "new newer newest"))
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 12, minCount = 1)
    val dir = java.nio.file.Files.createTempDirectory("bpe_store").toString
    BpeStore.save(spark, model, dir, numMerges = 12, minCount = 1L)
    val loaded = BpeStore.load(spark, dir, 12, 1L)
    assert(loaded.merges.toSeq == model.merges.toSeq)
    // encode parity through the loaded model
    assert(loaded.encodeWord("lowest") == model.encodeWord("lowest"))
    // params mismatch is loud
    val e1 = intercept[IllegalArgumentException] {
      BpeStore.load(spark, dir, 13, 1L)
    }
    assert(e1.getMessage.contains("params mismatch"))
    // markerless dir is loud
    val torn = java.nio.file.Files.createTempDirectory("bpe_torn").toString
    new java.io.File(torn, ".staging_merges").mkdirs() // a torn save remnant
    val e2 = intercept[IllegalArgumentException] {
      BpeStore.load(spark, torn, 12, 1L)
    }
    assert(e2.getMessage.contains("no publish marker"))
    // a re-save over the torn dir heals the remnant and publishes
    BpeStore.save(spark, model, torn, 12, 1L)
    assert(BpeStore.load(spark, torn, 12, 1L).merges.toSeq == model.merges.toSeq)
    assert(!new java.io.File(torn, ".staging_merges").exists())
  }
}

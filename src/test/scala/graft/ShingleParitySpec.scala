package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

/** r17 optimization pin: the codegen shingle view
  * ([[TextFns.shingleZip]] + [[TextFns.shingleString]], guide §4 — stay
  * inside whole-stage codegen) must reproduce the interpreted
  * transform+array_join path ([[TextFns.shinglesFromTokens]]) EXACTLY —
  * same shingle strings, same multiplicities, same per-doc counts — for
  * every window width the engine uses (2: bigrams, 3: minhash/Jaccard,
  * 4: decontam) and for every edge shape (empty doc, sub-window doc,
  * exactly-window doc, repeated tokens). The dedup/DSIR/quality/diversity
  * hot paths all hash or group these strings, so string parity here is
  * result parity there. */
class ShingleParitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, ""),                                // empty → no tokens ≥ window
    (1L, "one"),                             // below every window
    (2L, "two words"),                       // w=2 boundary
    (3L, "three words here"),                // w=3 boundary
    (4L, "a b c d e f g h"),                 // plain run
    (5L, "rep rep rep rep"),                 // duplicate shingles kept
    (6L, "  spaced   out\ttokens\nhere  "),  // whitespace normalization
    (7L, "Punct, marks! and-such; stay?")    // clean chain upstream
  ).toDF("doc_id", "text")

  private def oldExploded(w: Int) = docs
    .select(col("doc_id"),
      TextFns.normTokens(TextFns.cleanText(col("text"),
        removePunctuation = true)).as("toks"))
    .select(col("doc_id"),
      explode_outer(TextFns.shinglesFromTokens(col("toks"), w)).as("sh"))
    .filter(col("sh").isNotNull)

  private def newExploded(w: Int) = docs
    .select(col("doc_id"),
      TextFns.normTokens(TextFns.cleanText(col("text"),
        removePunctuation = true)).as("toks"))
    .select(col("doc_id"),
      explode_outer(TextFns.shingleZip(col("toks"), w)).as("s"))
    .filter(col("s").isNotNull)
    .select(col("doc_id"), TextFns.shingleString(col("s"), w).as("sh"))

  test("shingleZip+shingleString ≡ shinglesFromTokens for w = 2, 3, 4") {
    for (w <- Seq(2, 3, 4)) {
      val a = oldExploded(w).groupBy("doc_id")
        .agg(sort_array(collect_list("sh")).as("shs"))
      val b = newExploded(w).groupBy("doc_id")
        .agg(sort_array(collect_list("sh")).as("shs2"))
      val joined = a.join(b, Seq("doc_id"), "full_outer")
      assert(joined.filter(col("shs").isNull || col("shs2").isNull ||
        col("shs") =!= col("shs2")).isEmpty, s"shingle mismatch at w=$w")
      // same doc coverage: both paths emit rows for exactly the same docs
      assert(oldExploded(w).select("doc_id").distinct().count() ===
        newExploded(w).select("doc_id").distinct().count())
    }
  }

  test("size(shingleZip) matches size(shinglesFromTokens) — the count view") {
    val toks = docs.select(col("doc_id"),
      TextFns.normTokens(TextFns.cleanText(col("text"),
        removePunctuation = true)).as("toks"))
    for (w <- Seq(2, 3)) {
      val bad = toks.select(col("doc_id"),
        size(TextFns.shinglesFromTokens(col("toks"), w)).as("a"),
        size(TextFns.shingleZip(col("toks"), w)).as("b"))
        .filter(col("a") =!= col("b"))
      assert(bad.isEmpty, s"size mismatch at w=$w")
    }
  }

  test("minHashSignatures over the codegen view matches a from-scratch " +
    "HOF recomputation (the downstream the parity exists for)") {
    val sigs = graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text",
      numHashes = 8, shingleSize = 3)
    // independent HOF reference: explode the OLD shingle view, hash, agg
    val ref = oldExploded(3)
      .select(col("doc_id").as("id"), xxhash64(col("sh")).as("h0"))
      .groupBy("id")
      .agg(array((0 until 8).map(k =>
        min(xxhash64(lit(k), col("h0")))): _*).as("sig"))
    val j = sigs.join(ref.withColumnRenamed("sig", "sig2"), Seq("id"),
      "full_outer")
    assert(j.filter(col("sig").isNull || col("sig2").isNull ||
      col("sig") =!= col("sig2")).isEmpty)
  }
}

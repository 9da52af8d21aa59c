package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** DSIR importance-selection contracts: target-vocabulary raw docs must
  * outrank disjoint-vocabulary ones, the resample picks exactly k with the
  * (affinity desc, id asc) tie order, and the bucket-stats side of the
  * scoring join is broadcast. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 target docs on an "alpha…" vocabulary; raw docs 10-19 share it,
    * raw docs 20-29 use a disjoint "zulu…" vocabulary. */
  private def corpus = {
    val tgt = (0 until 4).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon alpha beta gamma", true))
    val likeTgt = (10 until 20).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta iota w$i", false))
    val unlike = (20 until 30).map(i =>
      (i.toLong, s"zulu yankee xray whiskey victor uniform tango sierra q$i", false))
    (tgt ++ likeTgt ++ unlike).toDF("doc_id", "text", "is_tgt")
  }

  test("target-vocab raw docs outrank disjoint-vocab raw docs") {
    val aff = Dsir.affinity(corpus, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(aff.size == 20, "all raw docs scored, target docs excluded")
    val worstLike = (10L until 20L).map(aff).min
    val bestUnlike = (20L until 30L).map(aff).max
    assert(worstLike > bestUnlike,
      s"every target-like doc should outrank every disjoint doc " +
        s"(worst like $worstLike vs best unlike $bestUnlike)")
  }

  test("resample selects exactly k by (affinity desc, id asc)") {
    val aff = Dsir.affinity(corpus, "doc_id", "text", col("is_tgt"))
    val got = Dsir.resample(aff, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(got.count(_._3) == 10)
    val expected = got.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    assert(got.filter(_._3).map(_._1).toSet == expected)
    // the planted structure makes the selected set the target-like docs
    assert(got.filter(_._3).map(_._1).toSet == (10L until 20L).toSet)
  }

  test("scoring against precomputed bucket stats equals the one-shot affinity") {
    // the streaming/ingest path (stats built once from history, batches
    // scored against them) must reproduce the batch computation exactly
    val oneShot = Dsir.affinity(corpus, "doc_id", "text", col("is_tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val stats = Dsir.bucketStats(corpus, "doc_id", "text", col("is_tgt"))
    val against = Dsir.affinityAgainst(
        corpus.filter(!col("is_tgt")).select("doc_id", "text"),
        "doc_id", "text", stats)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(against == oneShot)
  }

  test("buckets absent from precomputed stats score the +1-smoothed neutral terms") {
    // The ingest-gate path scores batches against HISTORY stats: a batch doc
    // whose bigrams hash to buckets the reference corpus never populated must
    // still be scored (unseen bucket ⇒ (0+1)/(0+1) terms), not silently
    // dropped by an inner join. A fully-unseen doc scores affinity 1.0.
    val stats = Dsir.bucketStats(corpus, "doc_id", "text", col("is_tgt"))
    // Vocabulary disjoint from the corpus — overwhelmingly lands in buckets
    // with no corpus mass (256 buckets, corpus uses ~40 distinct bigrams).
    val novel = Seq((99L, "qqq www eee rrr ttt yyy uuu")).toDF("doc_id", "text")
    val got = Dsir.affinityAgainst(novel, "doc_id", "text", stats).collect()
    assert(got.length == 1, "unseen-vocabulary doc must not be dropped")
    val r = got.head
    assert(r.getLong(1) == 6L, s"all 6 bigrams counted, got ${r.getLong(1)}")
    // Every bucket the doc hits that the corpus never saw contributes c·1 to
    // both num and den; any collision with a populated bucket adds the same
    // c·(ct+1)/c·(cr+1) the one-shot semantics demand. With the disjoint
    // vocab here the affinity is exactly 1.0 unless a bucket collides.
    assert(r.getDouble(2) > 0.0, "affinity must be the smoothed ratio, not null")
  }

  test("bucket stats are broadcast into the scoring join") {
    val plan = Dsir.affinity(corpus, "doc_id", "text", col("is_tgt"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"stats join should be broadcast:\n$plan")
  }
}

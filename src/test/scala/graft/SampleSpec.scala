package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sample

/** Stratified-sampling contracts: exact per-stratum cap, take-all on small
  * strata, determinism across runs, seed sensitivity. */
class SampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = (0L until 100L).map { i =>
    (i, if (i < 80) "big" else if (i < 95) "mid" else "tiny")
  }.toDF("doc_id", "stratum")

  test("keeps exactly n per stratum, all of a smaller stratum") {
    val out = Sample.stratifiedTopN(docs, Seq("stratum"), "doc_id", n = 10)
      .collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(out == Map("big" -> 10, "mid" -> 10, "tiny" -> 5))
  }

  test("deterministic: same seed → same sample; different seed → different") {
    def ids(seed: Long) = Sample
      .stratifiedTopN(docs, Seq("stratum"), "doc_id", n = 10, seed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(1L) == ids(1L))
    assert(ids(1L) != ids(2L), "distinct seeds should draw distinct samples")
  }

  test("smp_rank is dense 1..n within each stratum") {
    val rks = Sample.stratifiedTopN(docs, Seq("stratum"), "doc_id", n = 10)
      .filter(col("stratum") === "mid")
      .select("smp_rank").collect().map(_.getLong(0)).sorted.toSeq
    assert(rks == (1L to 10L))
  }

  test("weightedOrderSample: inclusion tracks weight, stays deterministic, " +
    "and matches the u/w window formulation row-for-row") {
    // 500 docs in one stratum, 10% carry weight 100 vs 1: over many seeds the
    // heavy docs should dominate a 50-doc sample (E[heavy share] ≈ 0.9+).
    val wdocs = (0L until 500L)
      .map(i => (i, "s", if (i % 10 == 0) 100L else 1L))
      .toDF("doc_id", "stratum", "w")
    def heavyCount(seed: Long) = Sample
      .weightedOrderSample(wdocs, Seq("stratum"), "doc_id", col("w"),
        n = 50, seed = seed)
      .select("doc_id").collect().map(_.getLong(0)).count(_ % 10 == 0)
    val shares = (1L to 5L).map(heavyCount)
    assert(shares.forall(_ >= 35), s"heavy docs under-sampled: $shares")
    // determinism + seed sensitivity
    def ids(seed: Long) = Sample
      .weightedOrderSample(wdocs, Seq("stratum"), "doc_id", col("w"),
        n = 50, seed = seed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(3L) == ids(3L))
    assert(ids(3L) != ids(4L))
    // row-identical to the window formulation of the same key (the oracle's
    // shape): -(draw+1)/w ranked desc, doc_id tiebreak
    import org.apache.spark.sql.expressions.Window
    val key = -((Sample.drawCol(col("doc_id"), 3L).cast("double") + lit(1.0)) /
      greatest(col("w"), lit(1L)).cast("double"))
    val win = Window.partitionBy("stratum").orderBy(desc("k"), asc("doc_id"))
    val expect = wdocs.withColumn("k", key)
      .withColumn("smp_rank", row_number().over(win))
      .filter(col("smp_rank") <= 50)
      .select(col("stratum"), col("doc_id"), col("smp_rank").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = Sample
      .weightedOrderSample(wdocs, Seq("stratum"), "doc_id", col("w"),
        n = 50, seed = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }
}

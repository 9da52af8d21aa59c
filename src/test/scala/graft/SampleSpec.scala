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
}

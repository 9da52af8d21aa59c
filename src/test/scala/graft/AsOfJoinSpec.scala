package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Backward as-of join semantics: most-recent-at-or-before match per key,
  * inclusive ties, inner vs keepUnmatched, and the single-shuffle plan. */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val quotes = Seq(
    // key, qt, px
    (1, ts(10), 1.0), (1, ts(20), 2.0), (1, ts(30), 3.0),
    (2, ts(15), 9.0)
  ).toDF("k", "qt", "px")

  private lazy val trades = Seq(
    // key, tt, qty
    (1, ts(25), 100L), // matches qt=20
    (1, ts(30), 200L), // exact tie → inclusive, matches qt=30
    (1, ts(5), 300L),  // before any quote → unmatched
    (2, ts(99), 400L), // matches qt=15
    (3, ts(50), 500L)  // key with no quotes → unmatched
  ).toDF("k", "tt", "qty")

  test("backward: greatest right time <= left time, per key, ties inclusive") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tt", "qt")
      .select("k", "tt", "qty", "qt", "px").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(4))).toSet
    assert(out == Set((1, 100L, 2.0), (1, 200L, 3.0), (2, 400L, 9.0)))
  }

  test("keepUnmatched keeps left rows with null payload (LEFT ASOF)") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tt", "qt",
      keepUnmatched = true)
    assert(out.count() == 5)
    val unmatched = out.filter(col("qt").isNull)
      .select("qty").as[Long].collect().toSet
    assert(unmatched == Set(300L, 500L))
  }

  test("plan shuffles exactly once (keyed window, no range cross-product)") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tt", "qt")
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, out.queryExecution.executedPlan.toString)
  }

  test("payload name collision with left is rejected") {
    val bad = quotes.withColumnRenamed("px", "qty")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, bad, Seq("k"), "tt", "qt")
    }
  }
}

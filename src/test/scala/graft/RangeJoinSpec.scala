package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Banded interval join: equals the brute-force inequality join, finds each
  * qualifying pair exactly once (no dedup), and plans as an equi-join. */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic pseudo-random points and (possibly overlapping) intervals
  private lazy val points = (0 until 400).map { i =>
    (i % 5, (i * 37L) % 1000L, i.toLong)
  }.toDF("k", "t", "pid")
  private lazy val intervals = (0 until 60).map { j =>
    val lo = (j * 53L) % 900L
    (j % 5, lo, lo + (j % 7) * 30L, j.toLong)
  }.toDF("k", "lo", "hi", "iid")

  test("banded join equals the brute-force inequality join, pairs unique") {
    val banded = RangeJoin.bandedIntervalJoin(points, intervals,
      Seq("k"), "t", "lo", "hi", bandWidth = 100L).select("pid", "iid")
    val brute = points.join(intervals, Seq("k"))
      .filter($"t" >= $"lo" && $"t" <= $"hi").select("pid", "iid")
    assert(banded.count() == brute.count()) // no duplicate pair from banding
    assert(banded.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(banded).count() == 0)
  }

  test("band width does not change results (only replication factor)") {
    def run(w: Long) = RangeJoin.bandedIntervalJoin(points, intervals,
      Seq("k"), "t", "lo", "hi", bandWidth = w)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(30L) == run(500L))
  }

  test("plans as a hash equi-join on (key, band), not a nested loop") {
    val p = RangeJoin.bandedIntervalJoin(points, intervals,
      Seq("k"), "t", "lo", "hi", bandWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}

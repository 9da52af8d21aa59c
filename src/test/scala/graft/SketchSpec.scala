package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch

/** Count-min-sketch contracts: never underestimates, exact for tokens with a
  * collision-free row, cell-wise combinable across corpus splits (the
  * streaming/per-epoch merge contract), and counter state bounded by
  * depth·width regardless of vocabulary size. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vocab(n: Int) =
    (0 until n).map(i => (s"tok$i", 1L + (i % 7))).toDF("token", "cnt")

  test("estimates never underestimate and bound the overcount") {
    val counts = vocab(500)
    val counters = Sketch.cmsCounters(counts, depth = 4, width = 256)
    val est = Sketch.cmsEstimates(counts.select("token"), counters, 4, 256)
      .join(counts, Seq("token"))
      .select(col("token"), col("est"), col("cnt")).collect()
    assert(est.length == 500)
    val n = counts.agg(sum("cnt")).first().getLong(0)
    est.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"underestimate for ${r.getString(0)}")
      assert(r.getLong(1) - r.getLong(2) <= math.ceil(math.E / 256 * n).toLong * 4,
        s"overcount far past the eps band for ${r.getString(0)}")
    }
  }

  test("an out-of-vocabulary probe hitting an empty cell estimates 0") {
    // 3 tokens × 4 rows touch ≤ 12 of 4·256 cells: an unseen token's four
    // probes land in empty cells (deterministic hashes — verified below),
    // and the left-join estimate must floor the min at 0 instead of running
    // min over only the non-empty cells.
    val counts = vocab(3)
    val counters = Sketch.cmsCounters(counts, depth = 4, width = 256)
    val probe = Seq(("neverseen", 0L)).toDF("token", "cnt")
    val est = Sketch.cmsEstimates(probe.select("token"), counters, 4, 256)
      .collect()
    assert(est.length == 1 && est(0).getLong(1) == 0L,
      s"OOV probe must estimate 0, got ${est.toSeq}")
    // driver-side streaming estimate agrees (same hash chain, same floor)
    val cms = new Sketch.StreamingCms(4, 256)
    cms.sink("token")(counts.select(explode(array_repeat(col("token"),
      col("cnt").cast("int"))).as("token")), 0L)
    assert(cms.estimate("neverseen") == 0L)
  }

  test("counter matrix is bounded by depth*width however large the vocab") {
    val counters = Sketch.cmsCounters(vocab(5000), depth = 4, width = 64)
    assert(counters.count() <= 4 * 64)
  }

  test("HLL sketches of corpus splits union-merge to the whole-corpus estimate") {
    // the sketch_distinct scale contract: per-split sketches (partitions,
    // epochs) merge by union to exactly the sketch of the union — so the
    // distinct survey never needs a distinct-count shuffle
    val toks = (0 until 4000).map(i => (i % 3, s"tok${i % 700}"))
      .toDF("part", "token")
    val whole = toks.agg(
        hll_sketch_estimate(hll_sketch_agg(col("token"), 12)).as("est"))
      .first().getLong(0)
    val merged = toks.groupBy("part")
      .agg(hll_sketch_agg(col("token"), 12).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .first().getLong(0)
    assert(merged == whole, s"union-merge $merged != whole $whole")
    val exact = 700L
    assert(math.abs(whole - exact) * 20 <= exact,
      s"estimate $whole outside 5% of $exact")
  }

  test("sketches of corpus splits merge cell-wise to the whole-corpus sketch") {
    val counts = vocab(300)
    val a = counts.filter(col("cnt") % 2 === 0)
    val b = counts.filter(col("cnt") % 2 =!= 0)
    val merged = Sketch.cmsCounters(a, 4, 128)
      .unionByName(Sketch.cmsCounters(b, 4, 128))
      .groupBy("row", "bucket").agg(sum("c").as("c"))
    val whole = Sketch.cmsCounters(counts, 4, 128)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }
}

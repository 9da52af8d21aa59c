package graft

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

/** Perf smoke (VERDICT r2 #8): converts the "scales by construction" claims of
  * the dedup/ANN suite into a measured curve — each headline operator runs at
  * sf0.001 → sf0.01 → sf0.1 (10× row growth per step) and the sf0.01→sf0.1
  * step must stay inside a generous linearity envelope. Quadratic behavior
  * (an all-pairs product, an unbucketed join) blows the bound by an order of
  * magnitude; box noise and fixed per-query overhead do not, because
  * sub-second timings are floored before the ratio. */
object PerfSmoke extends Tag("graft.PerfSmoke")

class ScalingSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val watched = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "sim_lsh_topk", "sim_pq_topk",
    "decontam_overlap", "text_tfidf", "text_pii",
    "dedup_span_fraction", "text_unigram_score", "layout_zorder",
    "chunk_windows", "chunk_dedup", "dsir_select", "sketch_heavy_hitters")

  private def time(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  test("dedup/ANN suite grows ~linearly from sf0.01 to sf0.1 (10x rows)",
      PerfSmoke) {
    // untimed warm pass: JIT + codegen-cache the shared generated classes
    watched.foreach(time(_, "/root/testdata/sf0.001"))
    val curve = watched.map { q =>
      val t001 = time(q, "/root/testdata/sf0.001")
      val t01 = time(q, "/root/testdata/sf0.01")
      val t1 = time(q, "/root/testdata/sf0.1")
      info(f"$q%-22s sf0.001 $t001%6.2fs  sf0.01 $t01%6.2fs  sf0.1 $t1%6.2fs")
      (q, t01, t1)
    }
    curve.foreach { case (q, t01, t1) =>
      // 10× the data may cost ≤ 10× the (overhead-floored) time, ×2 slack.
      val bound = 20.0 * math.max(t01, 0.5)
      assert(t1 <= bound,
        s"$q: sf0.1 took ${t1}s > ${bound}s — superlinear vs sf0.01 (${t01}s)")
    }
  }
}

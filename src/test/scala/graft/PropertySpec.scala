package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.GaussianNB
import graft.operators.Drift

/** ScalaCheck property tests (SURVEY §5c): order/partition-invariance of the
  * distributed aggregates and DDM state-machine invariants — the contracts
  * that make results independent of cluster topology. (Generators driven
  * directly — the scalatestplus bridge isn't in the offline dependency set.) */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Evaluate `f` over `n` deterministic samples of `gen`. */
  private def forSamples[A](gen: Gen[A], n: Int = 10)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def forSamples2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 10)(
      f: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(42L + i))
        b <- gb.apply(Gen.Parameters.default, Seed(1042L + i))
      } f(a, b)
    }

  // ---- DDM state-machine invariants ----------------------------------------

  private val errSeqGen: Gen[List[Double]] =
    Gen.listOfN(120, Gen.choose(0.0, 1.0))

  test("DDM: a warning zone always precedes or coincides with any drift") {
    forSamples(errSeqGen) { errs =>
      val ddm = new Drift.Ddm()
      val signals = errs.map(ddm.addElement)
      val firstW = signals.indexWhere(s => s == "W" || s == "D")
      val firstD = signals.indexOf("D")
      if (firstD >= 0) assert(firstW >= 0 && firstW <= firstD)
    }
  }

  test("DDM: signals depend only on the sequence (pure state machine)") {
    forSamples(errSeqGen) { errs =>
      val a = { val d = new Drift.Ddm(); errs.map(d.addElement) }
      val b = { val d = new Drift.Ddm(); errs.map(d.addElement) }
      assert(a == b)
    }
  }

  test("DDM: scaling errors toward zero never produces an earlier drift") {
    forSamples(errSeqGen) { errs =>
      val full = { val d = new Drift.Ddm(); errs.map(d.addElement) }
      val damped = { val d = new Drift.Ddm(); errs.map(e => d.addElement(e * 0.5)) }
      val fd = full.indexOf("D"); val dd = damped.indexOf("D")
      // damped drift, if any, cannot fire strictly before the full-error drift
      if (dd >= 0 && fd >= 0) assert(dd >= fd)
    }
  }

  // ---- partition-invariance of the distributed aggregates ------------------

  private val vecRowsGen: Gen[List[(Int, List[Float])]] =
    Gen.listOfN(40, for {
      label <- Gen.choose(0, 2)
      vec <- Gen.listOfN(4, Gen.choose(-5.0f, 5.0f))
    } yield (label, vec))

  test("Welford stats are partition-invariant (merge = parallel variance)") {
    forSamples2(vecRowsGen, Gen.choose(1, 7), n = 6) { (rows, nPart) =>
      if (rows.nonEmpty) {
        val df1 = rows.toDF("label", "vec").repartition(1)
        val dfN = rows.toDF("label", "vec").repartition(nPart)
        def stats(df: org.apache.spark.sql.DataFrame) =
          GaussianNB.fitStatsWelford(df, "label", "vec", dim = 4)
            .select("label", "n", "mean", "v")
            .collect()
            .map(r => (r.getInt(0), r.getLong(1),
              r.getSeq[Double](2).map(x => math.rint(x * 1e9) / 1e9),
              r.getSeq[Double](3).map(x => math.rint(x * 1e9) / 1e9)))
            .sortBy(_._1).toList
        assert(stats(df1) == stats(dfN))
      }
    }
  }

  test("word count (A1) is order- and partition-invariant") {
    forSamples2(Gen.listOfN(30, Gen.alphaLowerStr.suchThat(_.nonEmpty)),
        Gen.choose(1, 5), n = 6) { (words, nPart) =>
        if (words.nonEmpty) {
          val base = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
          def counts(rows: List[(Long, String)], p: Int) =
            rows.toDF("id", "word").repartition(p)
              .groupBy("word").count()
              .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toList
          assert(counts(base, 1) == counts(scala.util.Random.shuffle(base), nPart))
        }
    }
  }
}

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

  test("topKPerKeyStr is row-identical to the rank window it replaces " +
    "(ties broken by item asc), for any data and partitioning") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    forSamples2(
        Gen.listOfN(40, Gen.zip(Gen.choose(0L, 4L),
          Gen.zip(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(3)),
            Gen.choose(0, 5).map(_.toDouble)))),
        Gen.choose(1, 5), n = 6) { (rows0, nPart) =>
      if (rows0.nonEmpty) {
        // duplicate scores on purpose (small int range) to exercise ties
        val df = rows0.map { case (k, (w, s)) => (k, w, s) }
          .toDF("key", "item", "score").repartition(nPart)
          .groupBy("key", "item").agg(max("score").as("score")) // unique items
        val viaAgg = graft.operators.TopK.topKPerKeyStr(df, 3)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
            r.getInt(3))).sortBy(t => (t._1, t._4)).toList
        val viaWin = df.withColumn("rk", row_number().over(
            Window.partitionBy("key").orderBy(col("score").desc, col("item"))))
          .filter(col("rk") <= 3)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
            r.getInt(3))).sortBy(t => (t._1, t._4)).toList
        assert(viaAgg == viaWin)
      }
    }
  }

  // ---- CMS / shuffle / gate invariants -------------------------------------

  private val vocabGen: Gen[List[(String, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.alphaLowerStr.suchThat(_.nonEmpty),
      Gen.choose(1L, 50L))).map(_.groupBy(_._1).map {
        case (t, xs) => (t, xs.map(_._2).sum)
      }.toList)

  test("count-min never underestimates, and split sketches merge to the whole (any split)") {
    import graft.operators.Sketch
    forSamples2(vocabGen, Gen.choose(1, 5), n = 5) { (vocab, mod) =>
      if (vocab.nonEmpty) {
        val counts = vocab.toDF("token", "cnt")
        val est = Sketch.cmsEstimates(counts.select("token"),
            Sketch.cmsCounters(counts, 4, 64), 4, 64)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        vocab.foreach { case (t, c) => assert(est(t) >= c, s"underestimate $t") }
        val (a, b) = vocab.zipWithIndex.partition(_._2 % mod == 0)
        val merged = Sketch.cmsCounters(a.map(_._1).toDF("token", "cnt"), 4, 64)
          .unionByName(Sketch.cmsCounters(b.map(_._1).toDF("token", "cnt"), 4, 64))
          .groupBy("row", "bucket").agg(sum("c").as("c"))
        val whole = Sketch.cmsCounters(counts, 4, 64)
        assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
      }
    }
  }

  test("shuffleOrder is a permutation with dense per-shard positions for any id set") {
    import graft.operators.Pack
    forSamples2(Gen.listOfN(80, Gen.choose(0L, 1000000L)).map(_.distinct),
        Gen.choose(1, 7), n = 5) { (ids, nShards) =>
      if (ids.nonEmpty) {
        val got = Pack.shuffleOrder(ids.map(Tuple1(_)).toDF("id"), "id",
            nShards, seed = 99L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(got.map(_._1).sorted.toSeq == ids.sorted)
        got.groupBy(_._2).foreach { case (_, rows) =>
          assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
        }
      }
    }
  }

  test("DSIR scoring against prebuilt stats equals the one-shot affinity on any corpus") {
    import graft.operators.Dsir
    val docGen = Gen.listOfN(12, Gen.zip(
      Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta", "zulu", "xray"))
        .map(_.mkString(" ")),
      Gen.oneOf(true, false)))
    forSamples(docGen, n = 5) { docs =>
      val df = docs.zipWithIndex.map { case ((t, tgt), i) => (i.toLong, t, tgt) }
        .toDF("id", "text", "is_tgt")
      if (docs.exists(_._2) && docs.exists(!_._2)) {
        val oneShot = Dsir.affinity(df, "id", "text", col("is_tgt"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val against = Dsir.affinityAgainst(
            df.filter(!col("is_tgt")).select("id", "text"), "id", "text",
            Dsir.bucketStats(df, "id", "text", col("is_tgt")))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(against == oneShot)
      }
    }
  }

  test("quality signals are bounded: ratios in [0,1], counts non-negative, empty docs zero") {
    import graft.operators.Quality
    val textGen = Gen.listOfN(10, Gen.oneOf(
      Gen.const(""), Gen.const("   "),
      Gen.listOfN(30, Gen.alphaLowerStr).map(_.mkString(" ")),
      Gen.const("a a a a a a a a a a a a a a a a a a a a a a")))
    forSamples(textGen, n = 5) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val sig = Quality.signals(df, "id", "text").collect()
      assert(sig.length == texts.length)
      sig.foreach { r =>
        val (n, mwl, tur, d2, d3) = (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))
        assert(n >= 0 && mwl >= 0 && tur >= 0 && tur <= 1.0 &&
          d2 >= 0 && d2 <= 1.0 && d3 >= 0 && d3 <= 1.0, r.toString)
        if (n == 0) assert(mwl == 0.0 && tur == 0.0 && d2 == 0.0 && d3 == 0.0)
      }
    }
  }

  test("BPE: decode∘encode is the identity for ANY string, on any trained model") {
    import graft.functions.Bpe
    // train on arbitrary corpora, encode arbitrary words — including unicode
    // outside the training alphabet and astral-plane surrogate pairs (encode
    // splits on UTF-16 code units; concatenation must still reconstruct)
    val corpusGen = Gen.listOfN(8,
      Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)).map(_.mkString(" "))
    val wordGen = Gen.oneOf(
      Gen.listOfN(12, Gen.alphaLowerChar).map(_.mkString),
      Gen.const(""),
      Gen.const("ααβγ-déjà"),
      Gen.const("a😀b😀"), // astral emoji between letters
      Gen.listOfN(5, Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString))
    forSamples2(corpusGen, Gen.listOfN(8, wordGen), n = 6) { (corpus, words) =>
      val df = Seq((0L, corpus)).toDF("doc_id", "text")
      val m = Bpe.train(df, "text", numMerges = 10, minCount = 1)
      words.foreach { w =>
        val pieces = m.encodeWord(w)
        assert(m.decode(pieces) == w, s"round-trip broke for ${w.toList}")
        assert(pieces.forall(_.nonEmpty) || w.isEmpty)
        // merges only ever shrink: piece count ≤ UTF-16 length
        assert(pieces.length <= w.length, s"$w → $pieces")
      }
    }
  }
}

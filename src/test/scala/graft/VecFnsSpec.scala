package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecFns

class VecFnsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val tokens: Seq[Seq[Float]] =
    Seq(Seq(1f, -4f, 0f), Seq(3f, 2f, -1f), Seq(-2f, 3f, 5f))

  private def tokensDf = Seq(Tuple1(tokens)).toDF("toks")

  test("maxPool = element-wise max over token axis (P5)") {
    val r = tokensDf.select(VecFns.maxPool(col("toks"))).collect()(0).getSeq[Float](0)
    assert(r == Seq(3f, 3f, 5f))
  }

  test("meanPool (A3 average)") {
    val r = tokensDf.select(VecFns.meanPool(col("toks"))).collect()(0).getSeq[Double](0)
    assert(r.zip(Seq(2.0 / 3, 1.0 / 3, 4.0 / 3)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("firstPool (A3 first)") {
    val r = tokensDf.select(VecFns.firstPool(col("toks"))).collect()(0).getSeq[Float](0)
    assert(r == Seq(1f, -4f, 0f))
  }

  test("absMaxPool keeps the sign of the max-|value| element (P6)") {
    val r = tokensDf.select(VecFns.absMaxPool(col("toks"))).collect()(0).getSeq[Float](0)
    assert(r == Seq(3f, -4f, 5f))
  }

  test("dot / l2Norm / cosine / l2Sq / mse") {
    val df = Seq((Seq(1f, 2f, 2f), Seq(2f, 4f, 4f))).toDF("a", "b")
    val r = df.select(
      VecFns.dot(col("a"), col("b")),
      VecFns.l2Norm(col("a")),
      VecFns.cosine(col("a"), col("b")),
      VecFns.l2Sq(col("a"), col("b")),
      VecFns.mse(col("a"), col("b"))).collect()(0)
    assert(math.abs(r.getDouble(0) - 18.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12) // parallel vectors
    assert(math.abs(r.getDouble(3) - 9.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 3.0) < 1e-12)
  }

  test("cosine of zero vector is 0 (guard, not NaN)") {
    val df = Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    assert(df.select(VecFns.cosine(col("a"), col("b"))).collect()(0).getDouble(0) == 0.0)
  }

  test("addPseudoNoise with sigma=0 is the identity (cast to double)") {
    val df = Seq((Seq(1.5f, -2.5f), 7L)).toDF("v", "id")
    val r = df.select(VecFns.addPseudoNoise(col("v"), col("id"), lit(0.0)))
      .collect()(0).getSeq[Double](0)
    assert(r == Seq(1.5, -2.5))
  }

  test("matApply: W*x with a literal matrix (P8)") {
    val w = Array(Array(1.0, 0.0), Array(0.0, 2.0), Array(1.0, 1.0))
    val df = Seq(Tuple1(Seq(3f, 4f))).toDF("x")
    val r = df.select(VecFns.matApply(w, col("x"))).collect()(0).getSeq[Double](0)
    assert(r == Seq(3.0, 8.0, 7.0))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Metrics

/** Hand-computed sklearn-convention goldens (zero_division=0, fixed label
  * domain), mirroring reference utils/metrics.py:6-32. */
class MetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // labels [0,0,1,1,2], preds [0,1,1,1,0]:
  //   acc = 3/5
  //   c0: tp=1 fp=1 fn=1 → p=0.5 r=0.5 f1=0.5
  //   c1: tp=2 fp=1 fn=0 → p=2/3 r=1   f1=0.8
  //   c2: tp=0 fp=0 fn=1 → p=0   r=0   f1=0   (zero_division=0)
  val scored = Seq((0, 0), (0, 1), (1, 1), (1, 1), (2, 0))

  test("multiclass metrics match hand-computed goldens (A5)") {
    val df = scored.toDF("label", "pred")
    val r = Metrics.multiclass(df, "label", "pred", nLabels = 3).collect()(0)
    assert(math.abs(r.getDouble(0) - 0.6) < 1e-9, "accuracy")
    assert(math.abs(r.getDouble(1) - (0.5 + 2.0 / 3 + 0) / 3) < 1e-6, "macro_precision")
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-9, "macro_recall")
    assert(math.abs(r.getDouble(3) - (0.5 + 0.8 + 0) / 3) < 1e-6, "macro_f1")
  }

  test("unseen classes in the fixed domain contribute zeros (zero_division=0)") {
    val df = Seq((0, 0), (1, 1)).toDF("label", "pred")
    val r = Metrics.multiclass(df, "label", "pred", nLabels = 4).collect()(0)
    assert(r.getDouble(0) == 1.0)
    // classes 2,3 have no samples: precision/recall/f1 = 0 each → macro = 2/4
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-9)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-9)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-9)
  }

  test("batchAccuracy groups by batch (A4/ST2)") {
    val df = Seq((0L, 1, 1), (0L, 1, 0), (1L, 2, 2), (1L, 2, 2))
      .toDF("b", "label", "pred")
    val out = Metrics.batchAccuracy(df, col("b"), "label", "pred")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) == 0.5 && out(1L) == 1.0)
  }
}

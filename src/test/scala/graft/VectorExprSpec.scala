package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorFunctions
import graft.functions.VecFns

/** Codegen vector kernels (graft.expressions) — bit-parity with the HOF
  * formulations they replace, null/empty semantics, SQL registration, and
  * whole-stage-codegen participation. */
class VectorExprSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic pseudo-random vectors, float32-rounded like real data. */
  private def vecs(n: Int, dim: Int): Seq[(Long, Seq[Float], Seq[Float])] =
    (0 until n).map { r =>
      def v(salt: Int) = (0 until dim).map { i =>
        (((r * 2654435761L + i * 40503L + salt) % 1000L) / 250.0f) - 2.0f
      }
      (r.toLong, v(0), v(7919))
    }

  /** HOF twins (the pre-codegen formulations), kept here as the oracle. */
  private def d(c: org.apache.spark.sql.Column) = c.cast("double")
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, x) => acc + x)
  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val denom = sqrt(hofDot(a, a)) * sqrt(hofDot(b, b))
    when(denom === 0.0, 0.0).otherwise(hofDot(a, b) / denom)
  }
  private def hofL2Sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, x) => acc + x)

  test("vec_dot/vec_cosine/vec_l2sq are bit-equal to the HOF fold on float arrays") {
    val df = vecs(64, 33).toDF("id", "a", "b").cache()
    val got = df.select(
      VecFns.dot($"a", $"b").as("dot"), VecFns.cosine($"a", $"b").as("cos"),
      VecFns.l2Sq($"a", $"b").as("l2"))
    val want = df.select(
      hofDot($"a", $"b").as("dot"), hofCosine($"a", $"b").as("cos"),
      hofL2Sq($"a", $"b").as("l2"))
    val g = got.collect(); val w = want.collect()
    g.zip(w).foreach { case (x, y) =>
      assert(x.getDouble(0) == y.getDouble(0), "dot bits")
      assert(x.getDouble(1) == y.getDouble(1), "cosine bits")
      assert(x.getDouble(2) == y.getDouble(2), "l2sq bits")
    }
    df.unpersist()
  }

  test("kernels accept double arrays and mixed float/double sides") {
    val df = vecs(8, 5).toDF("id", "a", "b")
      .select($"a", $"b", $"a".cast("array<double>").as("ad"))
    val r = df.select(
      VecFns.dot($"ad", $"b").as("mixed"),
      VecFns.dot($"ad", $"ad").as("dd"),
      hofDot($"a", $"b").as("ref"),
      hofDot($"a", $"a").as("refdd")).collect()
    r.foreach { x =>
      assert(x.getDouble(0) == x.getDouble(2))
      assert(x.getDouble(1) == x.getDouble(3))
    }
  }

  test("null array yields null; empty arrays yield 0 (cosine 0 by guard)") {
    val df = Seq((Seq(1.0f, 2.0f), Option(Seq(3.0f, 4.0f))), (Seq(1.0f), None))
      .toDF("a", "b")
    val r = df.select(
      VecFns.dot($"a", $"b").as("dot"), VecFns.cosine($"a", $"b").as("cos"))
      .collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
    val e = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
      .select(VecFns.dot($"a", $"b"), VecFns.cosine($"a", $"b")).head()
    assert(e.getDouble(0) == 0.0 && e.getDouble(1) == 0.0)
  }

  test("mat_vec_product is bit-equal to the HOF transform/aggregate fold") {
    val w = Array.tabulate(6, 5)((j, i) => ((j * 31 + i * 17) % 13) / 6.5 - 1.0)
    val hofMatApply = {
      val wLit = typedLit(w.map(_.toSeq).toSeq)
      (x: org.apache.spark.sql.Column) =>
        transform(wLit, row => aggregate(
          zip_with(row, x, (wi, xi) => wi * d(xi)), lit(0.0), (acc, v) => acc + v))
    }
    val df = vecs(32, 5).toDF("id", "a", "b")
    val r = df.select(VecFns.matApply(w, $"a").as("k"), hofMatApply($"a").as("h"))
      .collect()
    r.foreach { row =>
      assert(row.getSeq[Double](0) == row.getSeq[Double](1))
    }
    // null vector → null result
    val nr = Seq(Option.empty[Seq[Float]]).toDF("a")
      .select(VecFns.matApply(w, $"a")).head()
    assert(nr.isNullAt(0))
  }

  test("SQL surface: register() exposes vec_dot/vec_cosine/vec_l2sq to spark.sql") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       vec_l2sq(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS l
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 1.0 && r.getDouble(2) == 25.0)
  }

  test("kernels run inside WholeStageCodegen (not CodegenFallback)") {
    // spark.range keeps a real projection in the plan (a local Seq would be
    // constant-folded into LocalTableScan before codegen is even consulted);
    // inputs built with array() of scalars — an interpreted HOF like
    // transform() in the same projection would itself evict it from codegen
    val mk = (salt: Int) => array((0 until 8).map { i =>
      (pmod(col("id") * 31 + lit(i * salt), lit(97)).cast("double") / 48.5) - 1.0
    }: _*)
    val df = spark.range(4)
      .select(VecFns.cosine(mk(13), mk(41)).as("c"))
    // the projection containing the kernel must sit INSIDE a codegen stage
    // (rendered as "*(n) Project"); an interpreted expression would evict it
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("Project")),
      df.queryExecution.executedPlan.toString)
    // and the generated code actually compiles: force evaluation
    assert(df.collect().length == 4)
  }

  /** The HOF formulation SignBits replaced (plane-k dot via zip_with over the
    * dim sequence, ascending fold) — kept here as the bit-parity oracle. */
  private def hofSignBits(v: org.apache.spark.sql.Column, planes: Int) =
    (0 until planes).map { k =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          d(x) * (pmod(lit(k.toLong) * 2654435761L + i.cast("long") * 40503L
            + 12345L, lit(100000L)).cast("double") / 100000.0 - 0.5)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0.0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  test("sign_bits buckets are bit-equal to the stacked HOF formulation") {
    val df = vecs(64, 33).toDF("id", "a", "b").cache()
    Seq(1, 8, 10, 63).foreach { planes =>
      val got = df.select(
        graft.expressions.SignBits.column($"a", planes).as("g")).collect()
      val want = df.select(hofSignBits($"a", planes).as("w")).collect()
      got.zip(want).foreach { case (g, w) =>
        assert(g.getLong(0) == w.getLong(0), s"planes=$planes bucket bits")
      }
    }
    df.unpersist()
  }
}

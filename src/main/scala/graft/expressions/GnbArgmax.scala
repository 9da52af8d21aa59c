package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Gaussian-NB scoring as a single codegen kernel (SURVEY A8 fast path).
  *
  * The relational formulation (posexplode dims → broadcast-join per-class
  * stats → partial-sum log-densities → window argmax) multiplies every test
  * row by |dims|·|classes| before aggregating it back down. This expression
  * keeps the model — per-class `mu`, smoothed variance `ve`, `logPrior` —
  * as plan constants (broadcast with the serialized plan, exactly like a
  * `broadcast()` dimension table, ~classes·dims·16 bytes) and computes
  *
  *   pred = argmax_c logPrior(c) + Σ_i [ -½·ln(2π·ve(c,i)) − (x_i−mu(c,i))² / (2·ve(c,i)) ]
  *
  * in one pass over the vector: a classes×dims FMA loop per row, no row
  * blowup, no shuffle, no window. Dim terms accumulate in ascending-i order
  * (a fixed sequential order, matching the SQL twin's sum up to float
  * reassociation); ties break to the smallest label like the relational
  * `row_number` tiebreak.
  *
  * `labels(c)`, `mu(c)(i)`, `ve(c)(i)`, `logPrior(c)` must be ordered by
  * ascending label; `ve` must already include the sklearn smoothing ε.
  */
case class GnbArgmax(
    child: Expression,
    labels: Array[Int],
    mu: Array[Array[Double]],
    ve: Array[Array[Double]],
    logPrior: Array[Double]) extends UnaryExpression {

  override def prettyName: String = "gnb_argmax"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${dt.sql}")
  }

  private def childFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** ln(2π·ve), precomputed per (class, dim) — pure plan-constant folding, the
    * per-row arithmetic is unchanged. */
  private lazy val ln2PiVe: Array[Array[Double]] =
    ve.map(_.map(v => math.log(2.0 * math.Pi * v)))

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < labels.length) {
      var s = 0.0
      val muC = mu(c); val veC = ve(c); val lnC = ln2PiVe(c)
      val d = math.min(n, muC.length)
      var i = 0
      while (i < d) {
        if (!x.isNullAt(i)) {
          val e = if (childFloat) x.getFloat(i).toDouble else x.getDouble(i)
          val diff = e - muC(i)
          s += -0.5 * lnC(i) - diff * diff / (2.0 * veC(i))
        }
        i += 1
      }
      s += logPrior(c)
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    labels(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val labelsRef = ctx.addReferenceObj("labels", labels, "int[]")
    val muRef = ctx.addReferenceObj("mu", mu, "double[][]")
    val veRef = ctx.addReferenceObj("ve", ve, "double[][]")
    val lnRef = ctx.addReferenceObj("ln2PiVe", ln2PiVe, "double[][]")
    val priorRef = ctx.addReferenceObj("logPrior", logPrior, "double[]")
    val getE =
      if (childFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, x => {
      val (n, c, i, d) = (ctx.freshName("n"), ctx.freshName("c"),
        ctx.freshName("i"), ctx.freshName("d"))
      val (best, bestScore, s, diff) = (ctx.freshName("best"),
        ctx.freshName("bestScore"), ctx.freshName("s"), ctx.freshName("diff"))
      val (muC, veC, lnC) = (ctx.freshName("muC"), ctx.freshName("veC"), ctx.freshName("lnC"))
      s"""
         |int $n = $x.numElements();
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $labelsRef.length; $c++) {
         |  double[] $muC = $muRef[$c];
         |  double[] $veC = $veRef[$c];
         |  double[] $lnC = $lnRef[$c];
         |  int $d = java.lang.Math.min($n, $muC.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if (!$x.isNullAt($i)) {
         |      double $diff = ${getE(x, i)} - $muC[$i];
         |      $s += -0.5 * $lnC[$i] - $diff * $diff / (2.0 * $veC[$i]);
         |    }
         |  }
         |  $s += $priorRef[$c];
         |  if ($s > $bestScore) { $bestScore = $s; $best = $c; }
         |}
         |${ev.value} = $labelsRef[$best];
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GnbArgmax =
    copy(child = newChild)
}

object GnbArgmax {
  def column(vec: Column, labels: Array[Int], mu: Array[Array[Double]],
             ve: Array[Array[Double]], logPrior: Array[Double]): Column =
    SqlBridge.column(GnbArgmax(SqlBridge.expression(vec), labels, mu, ve, logPrior))
}

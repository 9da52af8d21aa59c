package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Dense mapping-apply `W·x` as a codegen kernel (SURVEY P8, the Procrustes /
  * MLP-layer projection of a drifted embedding back into the source space).
  *
  * The HOF formulation (`transform(W_lit, row → aggregate(zip_with(row, x, ·*·)))`)
  * interprets outDim·inDim lambda calls per row and re-materializes the matrix
  * literal's rows as boxed lists. Here the row-major matrix is a plan constant
  * (for 768×768 ≈ 4.7 MB, shipped once per executor with the plan — same
  * transport as a broadcast variable) and each row costs one primitive
  * outDim×inDim loop. Inner accumulation is the same sequential fold as the
  * HOF version, so results are bit-identical.
  */
case class MatVecProduct(child: Expression, w: Array[Array[Double]])
    extends UnaryExpression {

  override def prettyName: String = "mat_vec_product"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${dt.sql}")
  }

  private def childFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val res = new Array[Double](w.length)
    var j = 0
    while (j < w.length) {
      val row = w(j)
      val d = math.min(n, row.length)
      var s = 0.0
      var i = 0
      while (i < d) {
        if (!x.isNullAt(i)) {
          val e = if (childFloat) x.getFloat(i).toDouble else x.getDouble(i)
          s += row(i) * e
        }
        i += 1
      }
      res(j) = s
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("w", w, "double[][]")
    val getE =
      if (childFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, x => {
      val (n, j, i, d) = (ctx.freshName("n"), ctx.freshName("j"),
        ctx.freshName("i"), ctx.freshName("d"))
      val (res, row, s) = (ctx.freshName("res"), ctx.freshName("row"), ctx.freshName("s"))
      s"""
         |int $n = $x.numElements();
         |double[] $res = new double[$wRef.length];
         |for (int $j = 0; $j < $wRef.length; $j++) {
         |  double[] $row = $wRef[$j];
         |  int $d = java.lang.Math.min($n, $row.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if (!$x.isNullAt($i)) {
         |      $s += $row[$i] * ${getE(x, i)};
         |    }
         |  }
         |  $res[$j] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecProduct =
    copy(child = newChild)
}

object MatVecProduct {
  def column(vec: Column, w: Array[Array[Double]]): Column =
    SqlBridge.column(MatVecProduct(SqlBridge.expression(vec), w))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Random-hyperplane sign-LSH bucket id as one codegen kernel (the bucketing
  * primitive behind `Similarity.lshTopK` and `Dedup.embeddingNearDup`;
  * SURVEY similarity-search extension — Charikar, "Similarity Estimation
  * Techniques from Rounding Algorithms", STOC 2002).
  *
  * Bit `k` (0-based, `planes` total) is set iff `v · r_k >= 0`, where plane
  * component `r_{k,i} = pmod(k·2654435761 + i·40503 + 12345, 100000)/100000
  * − 0.5` — a deterministic integer mix reproducible on any engine (the
  * DuckDB oracle replays it in SQL, `Duck.signBucket`).
  *
  * Why a native expression: the HOF formulation (`planes` stacked
  * `aggregate(zip_with(sequence(...)))` trees) is correct but generates a
  * multi-thousand-line Janino unit that costs seconds to compile and evicts
  * easily from the 100-entry codegen cache — the whole-query cost was
  * compile-dominated, not eval-dominated. This kernel is a `planes × dims`
  * FMA loop: tiny generated source, one array read per element.
  *
  * Bit-parity contract: each plane's dot accumulates sequentially in
  * ascending dim order — the exact fold order of the HOF version — so bucket
  * ids are bit-identical and the existing SQL oracles hold. Null elements are
  * skipped (the HOF would null-poison the dot to bit 0; the engine's
  * embedding columns carry no null elements, pinned by the hash-matched
  * oracles). NaN dots yield bit 0 on both paths (`NaN >= 0` is false).
  */
case class SignBits(child: Expression, planes: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")

  override def prettyName: String = "sign_bits"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${dt.sql}")
  }

  private def childFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val dims = x.numElements()
    val dots = new Array[Double](planes)
    var i = 0
    while (i < dims) {
      if (!x.isNullAt(i)) {
        val v = if (childFloat) x.getFloat(i).toDouble else x.getDouble(i)
        var k = 0
        while (k < planes) {
          val mix = java.lang.Math.floorMod(
            k * 2654435761L + i * 40503L + 12345L, 100000L)
          dots(k) += v * (mix.toDouble / 100000.0 - 0.5)
          k += 1
        }
      }
      i += 1
    }
    var bucket = 0L
    var k = 0
    while (k < planes) {
      if (dots(k) >= 0) bucket |= 1L << k
      k += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getE =
      if (childFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, x => {
      val (dims, dots, v, mix, bucket) = (ctx.freshName("dims"),
        ctx.freshName("dots"), ctx.freshName("v"), ctx.freshName("mix"),
        ctx.freshName("bucket"))
      val (i, k) = (ctx.freshName("i"), ctx.freshName("k"))
      s"""
         |int $dims = $x.numElements();
         |double[] $dots = new double[$planes];
         |for (int $i = 0; $i < $dims; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    double $v = ${getE(x, i)};
         |    for (int $k = 0; $k < $planes; $k++) {
         |      long $mix = java.lang.Math.floorMod(
         |        $k * 2654435761L + $i * 40503L + 12345L, 100000L);
         |      $dots[$k] += $v * ($mix / 100000.0d - 0.5d);
         |    }
         |  }
         |}
         |long $bucket = 0L;
         |for (int $k = 0; $k < $planes; $k++) {
         |  if ($dots[$k] >= 0) $bucket |= 1L << $k;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

object SignBits {
  def column(vec: Column, planes: Int): Column =
    SqlBridge.column(SignBits(SqlBridge.expression(vec), planes))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Nearest-centroid lookup as a single codegen kernel (the IVF coarse
  * quantizer; SURVEY similarity-search extension).
  *
  * The relational formulation (crossJoin(broadcast(centroids)) → l2
  * distance → row_number window partitioned by row id) multiplies the corpus
  * ×nlist and then shuffles the blown-up set just to take the argmin — a
  * 16× write+shuffle of the biggest table at 100 TB. Like [[GnbArgmax]], this
  * expression keeps the centroid table as a plan constant (ships with the
  * serialized plan, nlist·dim doubles) and computes the `n` nearest centroid
  * ids in one pass over the vector: an nlist×dim FMA loop per row, no row
  * blowup, no shuffle, no window.
  *
  * Result: ARRAY<INT> of 1-based centroid ids ordered by (squared L2 distance
  * asc, id asc) — exactly the (d2 asc, list_id asc) `row_number` order of the
  * relational form it replaces, with the same sequential ascending-dim
  * accumulation as [[VecL2Sq]], so the selected lists are bit-identical.
  */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Array[Double]],
    n: Int) extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

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
    val take = math.min(n, centroids.length)
    // empty centroid table → empty assignment (the codegen path guards
    // `take > 0`; without this the eval path would index ds(-1))
    if (take == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    val ids = new Array[Int](take)
    val ds = new Array[Double](take)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val d = math.min(dims, cent.length)
      var s = 0.0
      var i = 0
      while (i < d) {
        if (!x.isNullAt(i)) {
          val e = if (childFloat) x.getFloat(i).toDouble else x.getDouble(i)
          val diff = e - cent(i)
          s += diff * diff
        }
        i += 1
      }
      // Strict `<` displacement: equal distances keep the earlier (smaller)
      // centroid id ahead — the (d2 asc, id asc) tie-break.
      if (filled < take) {
        var pos = filled
        while (pos > 0 && s < ds(pos - 1)) {
          ds(pos) = ds(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
        }
        ds(pos) = s; ids(pos) = c + 1; filled += 1
      } else if (s < ds(take - 1)) {
        var pos = take - 1
        while (pos > 0 && s < ds(pos - 1)) {
          ds(pos) = ds(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
        }
        ds(pos) = s; ids(pos) = c + 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (filled == take) ids else java.util.Arrays.copyOf(ids, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val getE =
      if (childFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, x => {
      val (dims, take, filled) =
        (ctx.freshName("dims"), ctx.freshName("take"), ctx.freshName("filled"))
      val (ids, ds, cent) = (ctx.freshName("ids"), ctx.freshName("ds"), ctx.freshName("cent"))
      val (c, i, d, s, diff, pos) = (ctx.freshName("c"), ctx.freshName("i"),
        ctx.freshName("d"), ctx.freshName("s"), ctx.freshName("diff"), ctx.freshName("pos"))
      s"""
         |int $dims = $x.numElements();
         |int $take = java.lang.Math.min($n, $centsRef.length);
         |int[] $ids = new int[$take];
         |double[] $ds = new double[$take];
         |int $filled = 0;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cent = $centsRef[$c];
         |  int $d = java.lang.Math.min($dims, $cent.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if (!$x.isNullAt($i)) {
         |      double $diff = ${getE(x, i)} - $cent[$i];
         |      $s += $diff * $diff;
         |    }
         |  }
         |  if ($filled < $take) {
         |    int $pos = $filled;
         |    while ($pos > 0 && $s < $ds[$pos - 1]) {
         |      $ds[$pos] = $ds[$pos - 1]; $ids[$pos] = $ids[$pos - 1]; $pos--;
         |    }
         |    $ds[$pos] = $s; $ids[$pos] = $c + 1; $filled++;
         |  } else if ($take > 0 && $s < $ds[$take - 1]) {
         |    int $pos = $take - 1;
         |    while ($pos > 0 && $s < $ds[$pos - 1]) {
         |      $ds[$pos] = $ds[$pos - 1]; $ids[$pos] = $ids[$pos - 1]; $pos--;
         |    }
         |    $ds[$pos] = $s; $ids[$pos] = $c + 1;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($filled == $take ? $ids : java.util.Arrays.copyOf($ids, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {
  def column(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    SqlBridge.column(NearestCentroids(SqlBridge.expression(vec), centroids, n))

  /** Driver-side twin of the kernel for model-sized inputs (probe-set
    * computation): the `n` nearest centroid ids (1-based) of `vec` by
    * (L2² asc, id asc) — the identical tie-break, so driver-derived probe
    * sets agree with plan-side assignments. */
  def nearest(vec: Array[Double], centroids: Array[Array[Double]],
              n: Int): Array[Int] =
    centroids.zipWithIndex.map { case (cent, c) =>
        var s = 0.0
        var i = 0
        val d = math.min(vec.length, cent.length)
        while (i < d) { val t = vec(i) - cent(i); s += t * t; i += 1 }
        (s, c + 1)
      }
      .sortBy(identity) // (d2 asc, id asc)
      .take(math.min(n, centroids.length))
      .map(_._2)
}

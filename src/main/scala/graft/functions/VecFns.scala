package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector / pooling functions over ARRAY<FLOAT> embedding columns (SURVEY §2.2).
  *
  * Everything here is built from Spark's higher-order array functions
  * (`aggregate`/`transform`/`zip_with`), which evaluate inside codegen'd projections —
  * no Scala UDF serialization per row, and the expressions survive at any scale
  * because they are per-row (no shuffle).
  */
object VecFns {

  private def d(c: Column): Column = c.cast("double")

  /** Element-wise max over the token axis: ARRAY<ARRAY<FLOAT>> -> ARRAY<FLOAT>.
    * Reference P5: `np.amax(x, axis=1)` (streams/run_stream_supervised.py:129-131). */
  def maxPool(tokens: Column): Column =
    aggregate(tokens, element_at(tokens, 1),
      (acc, x) => zip_with(acc, x, (a, b) => greatest(a, b)))

  /** Element-wise mean over the token axis. Reference A3 "average"
    * (adaptation/dataset.py:222-224). */
  def meanPool(tokens: Column): Column = {
    val sums = aggregate(tokens, transform(element_at(tokens, 1), v => d(v) * 0d),
      (acc, x) => zip_with(acc, x, (a, b) => a + d(b)))
    transform(sums, s => s / size(tokens))
  }

  /** First-token vector. Reference A3 "first" (adaptation/dataset.py:219-221). */
  def firstPool(tokens: Column): Column = element_at(tokens, 1)

  /** Abs-max pooling, keeping the sign: per dim pick the element with max |value|.
    * Reference P6 (models/wos_classifier.py:181-198 does max(abs)->one-hot->sum;
    * same semantics expressed as a single fold). */
  def absMaxPool(tokens: Column): Column =
    aggregate(tokens, element_at(tokens, 1),
      (acc, x) => zip_with(acc, x, (a, b) => when(abs(b) > abs(a), b).otherwise(a)))

  /** Dot product of two numeric arrays, computed in double.
    * Native codegen kernel (graft.expressions.VecDot): the HOF formulation
    * (`aggregate(zip_with(...))`) is CodegenFallback-interpreted per row; the
    * expression compiles to a primitive loop with identical (sequential
    * left-to-right) accumulation order, so results are bit-equal. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorFunctions.vecDot(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; 0.0 when either side has zero
    * norm. Single-pass codegen kernel, bit-equal to
    * `dot/(sqrt(dot(a,a))*sqrt(dot(b,b)))` with the zero-denominator guard. */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorFunctions.vecCosine(a, b)

  /** Squared L2 distance (codegen kernel, same fold order as the HOF form). */
  def l2Sq(a: Column, b: Column): Column =
    graft.expressions.VectorFunctions.vecL2Sq(a, b)

  /** Element-wise mean squared error between two vectors (reference A6,
    * adaptation/mapping.py:39-41: mean((source-target)^2)). */
  def mse(a: Column, b: Column): Column = l2Sq(a, b) / size(a)

  /** Deterministic pseudo-noise injection (reference P7,
    * streams/run_stream_supervised.py:50-54 adds N(0, sigma) element-wise).
    * The reference uses torch/numpy RNG; for cross-engine reproducibility we use an
    * integer-mix pseudo-uniform in [-0.5, 0.5) scaled by sigma — same spirit
    * (element-wise perturbation with schedule-controlled magnitude), exactly
    * replayable in ANSI SQL for the oracle. */
  def addPseudoNoise(vec: Column, rowId: Column, sigma: Column): Column =
    zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) =>
      d(v) + sigma * (pmod(rowId.cast("long") * 2654435761L + i.cast("long") * 40503L,
        lit(100000L)).cast("double") / 100000.0 - 0.5))

  /** Apply a dense row-major matrix W (shape outDim x inDim) to a vector: W * x.
    * Reference P8 mapping-apply (adaptation/stream.py:34-54, mapping.py:123-124).
    * W is a driver-side literal broadcast with the plan; for 768x768 this is ~4.7MB
    * of constant — fine to ship once per executor. */
  def matApply(w: Array[Array[Double]], x: Column): Column =
    graft.expressions.MatVecProduct.column(x, w)

  /** Per-vector scalar reductions (oracle-friendly): max/min/avg element. */
  def vecMax(a: Column): Column = array_max(a)
  def vecMin(a: Column): Column = array_min(a)
  def vecAvg(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + d(x)) / size(a)
}

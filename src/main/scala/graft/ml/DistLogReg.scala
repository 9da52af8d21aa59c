package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed multinomial logistic regression with the corpus-scale
  * training-step shape made EXPLICIT (VERDICT r6 #7): per iteration, the
  * current weights broadcast to executors, the softmax gradient reduces back
  * through ONE `treeAggregate` pass (depth 2 — partial sums combine on
  * executors before the driver sees anything), and only the model-sized
  * K×(d+1) gradient ever reaches the driver. Nothing row-sized is ever
  * collected, so the same loop runs unchanged on a 1000-executor corpus:
  * cost per epoch = one scan + one K·(d+1) tree reduction.
  *
  * MLlib's `LogisticRegression` (the [[LogRegTrainer]] path) reaches the
  * same capability through its own LBFGS; this trainer exists to pin the
  * gradient-shape contract in the engine itself — minibatched via a
  * deterministic hash-Bernoulli row filter per step, full-batch when
  * `batchFraction = 1`.
  *
  * Determinism note: a floating gradient sum's low bits depend on partition
  * combine order, so two runs may differ at machine epsilon — the oracled
  * surface therefore pins split counts and at-chance verdicts (the q15
  * pattern), and the specs pin accuracy thresholds, not bit-exact weights. */
object DistLogReg {

  /** weights(k) = d feature coefficients :+ bias, for class k. */
  final case class Model(weights: Array[Array[Double]]) extends Serializable {
    def nClasses: Int = weights.length
    def dim: Int = weights.head.length - 1
    def scores(x: Array[Double]): Array[Double] = {
      val s = new Array[Double](weights.length)
      var k = 0
      while (k < weights.length) {
        val wk = weights(k)
        var acc = wk(x.length)
        var j = 0
        while (j < x.length) { acc += wk(j) * x(j); j += 1 }
        s(k) = acc; k += 1
      }
      s
    }
    def predict(x: Array[Double]): Int = {
      val s = scores(x)
      var best = 0; var k = 1
      while (k < s.length) { if (s(k) > s(best)) best = k; k += 1 }
      best
    }
  }

  /** Softmax probabilities in place (max-shifted for stability). */
  private def softmax(s: Array[Double]): Unit = {
    var mx = s(0); var k = 1
    while (k < s.length) { if (s(k) > mx) mx = s(k); k += 1 }
    var z = 0.0; k = 0
    while (k < s.length) { s(k) = math.exp(s(k) - mx); z += s(k); k += 1 }
    k = 0
    while (k < s.length) { s(k) /= z; k += 1 }
  }

  /** Fit by (mini)batch gradient descent. `batchFraction < 1` subsamples rows
    * per step with a seeded hash draw (deterministic row membership per
    * iteration — no `rand()`, same contract as the engine's samplers). */
  def fit(train: DataFrame, labelCol: String, vecCol: String, nClasses: Int,
          iters: Int = 50, lr: Double = 0.5, reg: Double = 1e-4,
          batchFraction: Double = 1.0, seed: Long = 42L): Model = {
    require(nClasses >= 2 && iters >= 1 && batchFraction > 0 && batchFraction <= 1)
    val data = train
      .select(col(labelCol).cast("int").as("y"), col(vecCol).as("x"),
        // per-row draw bucket for minibatching: stable across iterations,
        // xor'd with the iteration index below so batches rotate
        xxhash64(col(labelCol), col(vecCol), lit(seed)).as("h"))
      .rdd
      .map(r => (r.getInt(0),
        r.getSeq[Float](1).toArray.map(_.toDouble), r.getLong(2)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val d = data.first()._2.length
      val width = d + 1
      var w = Array.fill(nClasses)(new Array[Double](width))
      val threshold = (batchFraction * (1L << 32).toDouble).toLong
      for (it <- 0 until iters) {
        val bw = data.sparkContext.broadcast(w)
        val step = data
          .filter { case (_, _, h) =>
            batchFraction >= 1.0 ||
              // rotate the deterministic minibatch by iteration
              (java.lang.Long.rotateLeft(h, it % 64) >>> 32) < threshold
          }
          .treeAggregate((Array.fill(nClasses)(new Array[Double](width)), 0L))(
            seqOp = { case ((g, n), (y, x, _)) =>
              val sc = new Array[Double](nClasses)
              var k = 0
              while (k < nClasses) {
                val wk = bw.value(k)
                var acc = wk(d)
                var j = 0
                while (j < d) { acc += wk(j) * x(j); j += 1 }
                sc(k) = acc; k += 1
              }
              softmax(sc)
              k = 0
              while (k < nClasses) {
                val err = sc(k) - (if (k == y) 1.0 else 0.0)
                val gk = g(k)
                var j = 0
                while (j < d) { gk(j) += err * x(j); j += 1 }
                gk(d) += err
                k += 1
              }
              (g, n + 1)
            },
            combOp = { case ((g1, n1), (g2, n2)) =>
              var k = 0
              while (k < nClasses) {
                val a = g1(k); val b = g2(k)
                var j = 0
                while (j < width) { a(j) += b(j); j += 1 }
                k += 1
              }
              (g1, n1 + n2)
            },
            depth = 2)
        bw.destroy()
        val (grad, n) = step
        if (n > 0) {
          val nd = n.toDouble
          val next = Array.tabulate(nClasses) { k =>
            val wk = w(k); val gk = grad(k)
            Array.tabulate(width) { j =>
              // L2 on coefficients only, never the bias
              val r = if (j < d) reg * wk(j) else 0.0
              wk(j) - lr * (gk(j) / nd + r)
            }
          }
          w = next
        }
      }
      Model(w)
    } finally data.unpersist(blocking = false)
  }

  /** Score: (idCol, label, pred) — weights ride as one broadcast into a
    * narrow map; the same output contract as [[LogRegTrainer.predict]]. */
  def predict(model: Model, test: DataFrame, idCol: String, labelCol: String,
              vecCol: String): DataFrame = {
    val spark = test.sparkSession
    val bm = spark.sparkContext.broadcast(model)
    val p = udf { v: Seq[Float] => bm.value.predict(v.toArray.map(_.toDouble)) }
    test.select(col(idCol), col(labelCol).cast("int").as("label"),
      p(col(vecCol)).cast("int").as("pred"))
  }

  /** Holdout evaluation with the engine's shared multiclass metrics. */
  def holdoutMetrics(model: Model, test: DataFrame, idCol: String,
                     labelCol: String, vecCol: String, nLabels: Int): DataFrame =
    graft.operators.Metrics.multiclass(
      predict(model, test, idCol, labelCol, vecCol), "label", "pred", nLabels)
}

package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Incremental Gaussian Naive Bayes (SURVEY A8/M3).
  *
  * The reference trains sklearn's `GaussianNB` via `partial_fit` per batch
  * (models/wos_train_nb.py:49,78) — per-class running mean/variance over pooled
  * document vectors, prediction = argmax Gaussian log-likelihood + log prior,
  * with sklearn's variance smoothing ε = varSmoothing · max_dim Var(X).
  *
  * Two fit paths with identical results:
  *  - [[fitStats]]: relational — explode dims, one groupBy(label, dim) with
  *    partial aggregation. Shuffle volume = |classes|·|dims| cells regardless of
  *    row count; SQL-expressible (the DuckDB oracle replays it).
  *  - [[WelfordAgg]]: a typed `Aggregator` maintaining per-class count/mean/M2
  *    (Welford) over whole vectors in one pass with no explode — the
  *    `partial_fit` twin (merge = parallel-variance combine), used by the
  *    streaming/foreachBatch trainer (M3).
  */
object GaussianNB {

  val DefaultVarSmoothing = 1e-9

  /** Per-(class, dim) sufficient statistics from a training DataFrame.
    * Output: (label, i, n, mu, v) + epsilon broadcast column `eps`. */
  def fitStats(train: DataFrame, labelCol: String, vecCol: String,
               varSmoothing: Double = DefaultVarSmoothing): DataFrame = {
    val dims = train.select(
      col(labelCol).cast("int").as("label"),
      posexplode(col(vecCol)).as(Seq("i", "e0")))
      .select(col("label"), col("i"), col("e0").cast("double").as("e"))
    val stats = dims.groupBy("label", "i")
      .agg(count(lit(1)).as("n"), avg("e").as("mu"), var_pop("e").as("v"))
    // sklearn: epsilon_ = var_smoothing * max over dims of Var(X[:, i]) (pooled,
    // label-free). One tiny agg; crossJoin broadcasts the single-row result.
    val eps = dims.groupBy("i").agg(var_pop("e").as("gv"))
      .agg(max("gv").as("vmax"))
      .select((col("vmax") * varSmoothing).as("eps"))
    stats.crossJoin(broadcast(eps))
  }

  /** Class log-priors from training labels: (label, logprior). */
  def logPriors(train: DataFrame, labelCol: String): DataFrame = {
    val counts = train.groupBy(col(labelCol).cast("int").as("label"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("tot"))
    counts.crossJoin(broadcast(total))
      .select(col("label"), log(col("cnt").cast("double") / col("tot")).as("logprior"))
  }

  /** Fitted model as driver-side arrays: the reusable unit the drift queries
    * hold onto across their 2-3 predict passes. All arrays are ordered by
    * ascending label; `ve` already includes the sklearn smoothing ε. */
  case class GnbModel(labels: Array[Int], mu: Array[Array[Double]],
                      ve: Array[Array[Double]], logPrior: Array[Double])

  /** Collect fitted stats/priors into a [[GnbModel]] ONCE. Every `.collect()`
    * on the stats DataFrame re-executes the whole explode+groupBy fit
    * aggregation, so queries that predict multiple times with one model must
    * pay this exactly once and reuse the arrays. */
  def collectModel(stats: DataFrame, priors: DataFrame): GnbModel = {
    val sRows = stats.select(col("label").cast("int"), col("i").cast("int"),
      col("mu").cast("double"), (col("v") + col("eps")).cast("double").as("ve"))
      .collect()
    val pMap = priors.select(col("label").cast("int"), col("logprior").cast("double"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val labels = sRows.map(_.getInt(0)).distinct.sorted
    val dims = sRows.map(_.getInt(1)).max + 1
    val classIdx = labels.zipWithIndex.toMap
    val mu = Array.ofDim[Double](labels.length, dims)
    val ve = Array.ofDim[Double](labels.length, dims)
    sRows.foreach { r =>
      val (c, i) = (classIdx(r.getInt(0)), r.getInt(1))
      mu(c)(i) = r.getDouble(2); ve(c)(i) = r.getDouble(3)
    }
    GnbModel(labels, mu, ve, labels.map(pMap))
  }

  /** Fit end-to-end in ONE collect (guide §5 — fewer driver round-trips):
    * the sufficient statistics already carry the per-class row count
    * (`n` at dim i=0, every vector has a dim 0), so the class log-priors
    * derive on the driver — cnt(label) = n(label, 0), tot = Σ cnt,
    * logprior = ln(cnt.toDouble / tot.toDouble) — the EXACT doubles
    * [[logPriors]] computes (same double divide, same Math.log), without
    * its second aggregate job + broadcast. Bit-parity with
    * collectModel(fitStats, logPriors) is pinned in MLTrainerSpec. */
  def fit(train: DataFrame, labelCol: String, vecCol: String,
          varSmoothing: Double = DefaultVarSmoothing): GnbModel = {
    val sRows = fitStats(train, labelCol, vecCol, varSmoothing)
      .select(col("label").cast("int"), col("i").cast("int"),
        col("mu").cast("double"), (col("v") + col("eps")).cast("double").as("ve"),
        col("n").cast("long"))
      .collect()
    val labels = sRows.map(_.getInt(0)).distinct.sorted
    val dims = sRows.map(_.getInt(1)).max + 1
    val classIdx = labels.zipWithIndex.toMap
    val mu = Array.ofDim[Double](labels.length, dims)
    val ve = Array.ofDim[Double](labels.length, dims)
    val cnt = Array.ofDim[Long](labels.length)
    sRows.foreach { r =>
      val (c, i) = (classIdx(r.getInt(0)), r.getInt(1))
      mu(c)(i) = r.getDouble(2); ve(c)(i) = r.getDouble(3)
      if (i == 0) cnt(c) = r.getLong(4)
    }
    val tot = cnt.sum
    GnbModel(labels, mu, ve,
      cnt.map(c => math.log(c.toDouble / tot.toDouble)))
  }

  /** Score test vectors with a fitted model; returns (idCol, pred).
    *
    * The model is tiny (|classes|·|dims| cells) while the test side is the
    * 100 TB side: score each row with the [[graft.expressions.GnbArgmax]]
    * codegen kernel — a single narrow projection, no explode/join/shuffle/
    * window on the big side. The model ships with the serialized plan exactly
    * like a broadcast dimension. Semantics (incl. the min-label tiebreak)
    * match [[predictRelational]], asserted in MLTrainerSpec. */
  def predict(test: DataFrame, model: GnbModel,
              idCol: String, vecCol: String): DataFrame =
    test.select(col(idCol),
      graft.expressions.GnbArgmax.column(col(vecCol), model.labels, model.mu,
        model.ve, model.logPrior).as("pred"))

  /** DataFrame-input form of [[predict]]; collects the model on each call —
    * prefer fitting once via [[fit]]/[[collectModel]] when predicting more
    * than once with the same stats. */
  def predict(test: DataFrame, stats: DataFrame, priors: DataFrame,
              idCol: String, vecCol: String): DataFrame =
    predict(test, collectModel(stats, priors), idCol, vecCol)

  /** The explode/join/window formulation of [[predict]] — the SQL-expressible
    * twin the DuckDB oracle replays, kept for differential testing. Row
    * blowup is |dims|·|classes| per test row before re-aggregation; prefer
    * [[predict]] on the hot path. */
  def predictRelational(test: DataFrame, stats: DataFrame, priors: DataFrame,
                        idCol: String, vecCol: String): DataFrame = {
    val q = test.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("i", "e0")))
      .select(col("id"), col("i"), col("e0").cast("double").as("e"))
    val s = stats.select(col("label"), col("i"), col("mu"),
      (col("v") + col("eps")).as("ve"))
    val ll = q.join(broadcast(s), Seq("i"))
      .groupBy("id", "label")
      .agg(sum(
        lit(-0.5) * log(lit(2.0 * math.Pi) * col("ve"))
          - (col("e") - col("mu")) * (col("e") - col("mu")) / (lit(2.0) * col("ve")))
        .as("ll"))
      .join(broadcast(priors), Seq("label"))
      .select(col("id"), col("label"), (col("ll") + col("logprior")).as("score"))
    ll.withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("score").desc, col("label").asc)))
      .filter(col("rk") === 1)
      .select(col("id").as(idCol), col("label").as("pred"))
  }

  // ---- Welford aggregator (single-pass, no explode) -------------------------

  /** Mutable per-class buffer: n, mean[dims], M2[dims]. */
  case class WelfordBuf(var n: Long, var mean: Array[Double], var m2: Array[Double])

  /** Aggregator over Array[Float] vectors → (n, mean, var_pop) per group.
    * Partial+final merge uses the parallel-variance (Chan et al.) combine, so
    * results are independent of partitioning — asserted in the spec. */
  class WelfordAgg(dim: Int)
      extends Aggregator[Array[Float], WelfordBuf, (Long, Array[Double], Array[Double])] {
    import org.apache.spark.sql.{Encoder, Encoders}

    def zero: WelfordBuf = WelfordBuf(0L, Array.fill(dim)(0.0), Array.fill(dim)(0.0))

    def reduce(b: WelfordBuf, x: Array[Float]): WelfordBuf = {
      b.n += 1
      var i = 0
      while (i < dim) {
        val xi = x(i).toDouble
        val d = xi - b.mean(i)
        b.mean(i) += d / b.n
        b.m2(i) += d * (xi - b.mean(i))
        i += 1
      }
      b
    }

    def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
      if (a.n == 0) return b
      if (b.n == 0) return a
      val n = a.n + b.n
      var i = 0
      while (i < dim) {
        val d = b.mean(i) - a.mean(i)
        val mean = a.mean(i) + d * b.n / n
        a.m2(i) += b.m2(i) + d * d * a.n * b.n / n
        a.mean(i) = mean
        i += 1
      }
      a.n = n
      a
    }

    def finish(b: WelfordBuf): (Long, Array[Double], Array[Double]) =
      (b.n, b.mean, b.m2.map(v => if (b.n == 0) 0.0 else v / b.n))

    def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
    def outputEncoder: Encoder[(Long, Array[Double], Array[Double])] =
      Encoders.product[(Long, Array[Double], Array[Double])]
  }

  /** Single-pass per-class stats via [[WelfordAgg]]: (label, n, mean, v). */
  def fitStatsWelford(train: DataFrame, labelCol: String, vecCol: String,
                      dim: Int): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val agg = new WelfordAgg(dim).toColumn
    train.select(col(labelCol).cast("int").as("label"),
        col(vecCol).cast("array<float>").as("vec"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("stats"))
      .toDF("label", "stats")
      .select(col("label"), col("stats._1").as("n"),
        col("stats._2").as("mean"), col("stats._3").as("v"))
  }
}

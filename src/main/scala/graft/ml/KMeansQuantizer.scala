package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.NearestCentroids

/** Seeded Lloyd's k-means for quantizer training: IVF coarse centroids and PQ
  * sub-quantizer codebooks (reference north star: the ANN engine extension;
  * layout follows Jégou et al., TPAMI 2011 / the FAISS IVF-PQ family).
  *
  * Scale design: each iteration is ONE narrow projection over the corpus — the
  * [[NearestCentroids]] plan-constant codegen kernel assigns every vector to
  * its nearest centroid with no join and no ×k blow-up — followed by a
  * map-side-combinable groupBy whose shuffle carries at most k×(dim+1) partial
  * sums per upstream partition (the classic distributed Lloyd's layout; MLlib
  * KMeans does the same via treeAggregate). Centroids ride the plan as
  * literals (model-sized: k×dim doubles), so per-iteration driver traffic is
  * the k×dim update and nothing else.
  *
  * Determinism: init is a hash-ordered sample — `orderBy(xxhash64(id, seed))`
  * plans as TakeOrderedAndProject, engine- and layout-independent. Mean
  * updates are stable only up to shuffle combine order of double sums, so
  * trained quantizers are verified by recall gates (ScalaTest +
  * verdict-pinned oracle queries, see sim_*_trained_recall) rather than
  * bit-replay — the documented trade for trained-vs-deterministic quantizers.
  */
object KMeansQuantizer {

  /** Trained-quantizer memo: one training per (session, canonical corpus
    * plan, params) — repeated queries over the same logical corpus (the
    * benchmark's repeated recall gates, an interactive session's repeated
    * probes) reuse the centroids instead of re-running Lloyd's. Keyed on the
    * canonicalized plan STRING plus the ids of any RDD-backed leaves: a
    * canonicalized `LogicalRDD` (what `localCheckpoint` leaves behind) prints
    * only normalized attributes, so two checkpointed frames with the same
    * SCHEMA but different content would alias on the plan string alone — the
    * RDD id restores identity. Scan leaves still memo-hit across repeated
    * queries (their canonical form carries the path). Training is
    * deterministic per key, so a recompute would return the same value
    * anyway. Cross-session / corpus-content staleness is the persisted
    * index's job ([[graft.operators.AnnIndex.ivfIndexDir]] keys on a content
    * digest). */
  private val memo = new graft.SessionMemo[AnyRef]

  private def memoized[T <: AnyRef](df: DataFrame, tag: String)(train: => T): T = {
    val plan = df.queryExecution.logical
    val rddIds = plan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }.mkString(",")
    memo.getOrBuild(df.sparkSession,
      tag + "|rdd:" + rddIds + "|" + plan.canonicalized.toString)(train)
      .asInstanceOf[T]
  }

  /** Train `k` centroids over `df`'s vector column; returns exactly k×dim
    * doubles — when the candidate sample has fewer than k distinct points the
    * greedy seeding wraps and re-picks, so some returned centroids are
    * duplicates (harmless: duplicate centroids simply collect empty lists).
    * Empty clusters keep their previous centroid, as FAISS's trainer does.
    *
    * Init is greedy farthest-point (k-center) over a hash-ordered candidate
    * sample, the kmeans|| layout: ONE distributed TakeOrdered pass collects
    * min(8k, n) candidates (model-sized: 8k×dim), then the greedy argmax runs
    * driver-local on the sample — deterministic (hash order, ties → first
    * candidate) and guaranteed to give every well-separated cluster a seed,
    * where a plain k-sample routinely drops clusters and Lloyd's cannot
    * recover them. (FAISS likewise trains its coarse quantizer on a sample.) */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int = 5, seed: Long = 42L): Array[Array[Double]] =
    memoized(df, s"ivf:$idCol:$vecCol:$k:$iters:$seed") {
      trainCentroids(df, idCol, vecCol, k, iters, seed)
    }

  private def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
                             k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val sample: Array[Array[Double]] = v
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(math.max(8 * k, 64)).select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "k-means needs a non-empty corpus")
    var cents = farthestPoint(sample, k)
    val dim = cents.head.length
    var it = 0
    while (it < iters) {
      val assigned = v.select(
        element_at(NearestCentroids.column(col("v"), cents, 1), 1).as("cl"),
        col("v"))
      val aggCols = (0 until dim)
        .map(i => sum(element_at(col("v"), i + 1)).as(s"s$i")) :+
        count(lit(1)).as("n")
      val rows = assigned.groupBy("cl").agg(aggCols.head, aggCols.tail: _*)
        .collect()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val cl = r.getAs[Number](0).intValue - 1 // list_id is 1-based
        val n = r.getLong(dim + 1).toDouble
        var i = 0
        while (i < dim) { next(cl)(i) = r.getDouble(i + 1) / n; i += 1 }
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Greedy farthest-point selection of `k` seeds from a candidate sample:
    * seed 1 = candidates(0) (the hash-min row), each next seed the candidate
    * maximizing its min squared distance to the seeds so far (ties → first).
    * O(k·|sample|·dim) driver-local flops on a model-sized array. If the
    * sample has fewer than k rows the selection wraps and re-picks at d=0 —
    * duplicate centroids just end up with empty lists (the argmin tie-break
    * takes the lowest list_id), matching a limit(k) cap. */
  private def farthestPoint(candidates: Array[Array[Double]],
                            k: Int): Array[Array[Double]] = {
    val dmin = Array.fill(candidates.length)(Double.PositiveInfinity)
    val out = Array.newBuilder[Array[Double]]
    var pick = 0
    var s = 0
    while (s < k) {
      out += candidates(pick)
      val c = candidates(pick)
      var i = 0
      var best = 0
      var bestD = Double.NegativeInfinity
      while (i < candidates.length) {
        var d = 0.0
        var j = 0
        while (j < c.length) { val t = candidates(i)(j) - c(j); d += t * t; j += 1 }
        if (d < dmin(i)) dmin(i) = d
        if (dmin(i) > bestD) { bestD = dmin(i); best = i }
        i += 1
      }
      pick = best
      s += 1
    }
    out.result()
  }

  /** Train an m×ksub×(dim/m) product-quantization codebook: subspace `b`'s
    * centroids are k-means over slice `b` of every vector. All m subspaces
    * train together — each iteration is one exploded (b, code, slice)
    * projection (m plan-constant argmin kernels) feeding one combinable
    * groupBy(b, code): m×ksub×(subDim+1) partials per partition, never the
    * raw vectors. */
  def fitProduct(df: DataFrame, idCol: String, vecCol: String, m: Int,
                 ksub: Int, iters: Int = 5,
                 seed: Long = 42L): Array[Array[Array[Double]]] =
    memoized(df, s"pq:$idCol:$vecCol:$m:$ksub:$iters:$seed") {
      trainProduct(df, idCol, vecCol, m, ksub, iters, seed)
    }

  private def trainProduct(df: DataFrame, idCol: String, vecCol: String,
                           m: Int, ksub: Int, iters: Int,
                           seed: Long): Array[Array[Array[Double]]] = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val sample = v.orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(math.max(8 * ksub, 64)).select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "k-means needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    // per-subspace farthest-point seeding over the sliced sample
    var cb: Array[Array[Array[Double]]] = Array.tabulate(m) { b =>
      farthestPoint(sample.map(_.slice(b * subDim, (b + 1) * subDim)), ksub)
    }
    var it = 0
    while (it < iters) {
      val entries = explode(array((0 until m).map { b =>
        val sl = slice(col("v"), b * subDim + 1, subDim)
        struct(lit(b).as("b"),
          element_at(NearestCentroids.column(sl, cb(b), 1), 1).as("code"),
          sl.as("sl"))
      }: _*)).as("e")
      val aggCols = (0 until subDim)
        .map(i => sum(element_at(col("e").getField("sl"), i + 1)).as(s"s$i")) :+
        count(lit(1)).as("n")
      val rows = v.select(entries)
        .groupBy(col("e").getField("b").as("b"),
          col("e").getField("code").as("code"))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      val next = cb.map(_.map(_.clone()))
      rows.foreach { r =>
        val b = r.getAs[Number](0).intValue
        val j = r.getAs[Number](1).intValue - 1 // code is 1-based
        val n = r.getLong(subDim + 2).toDouble
        var i = 0
        while (i < subDim) { next(b)(j)(i) = r.getDouble(i + 2) / n; i += 1 }
      }
      cb = next
      it += 1
    }
    cb
  }
}

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

  /** Train `k` centroids over `df`'s vector column; returns k×dim doubles
    * (fewer if the corpus has fewer than k rows). Empty clusters keep their
    * previous centroid, as FAISS's trainer does.
    *
    * Init is greedy farthest-point (k-center): seed 1 is the hash-min row,
    * each next seed the row maximizing its distance to the seeds so far —
    * deterministic (ties → lowest id) and guaranteed to give every
    * well-separated cluster a seed, where a plain sample routinely drops
    * clusters and Lloyd's cannot recover them. Each seed costs one
    * TakeOrdered pass with plan-literal centroids, so init is O(k) narrow
    * passes — train on a sample when nlist is large (FAISS trains its coarse
    * quantizer on a sample too). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int = 5, seed: Long = 42L): Array[Array[Double]] = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val first = v.orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(1).select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(first.nonEmpty, "k-means needs a non-empty corpus")
    var cents: Array[Array[Double]] = first
    while (cents.length < k) {
      val dmin = cents.map(c =>
          graft.functions.VecFns.l2Sq(col("v"), typedLit(c.toSeq)))
        .reduce((a, b) => least(a, b))
      // If the corpus has fewer than k rows this re-picks points at d=0 —
      // the duplicate centroids just end up with empty lists (argmin
      // tie-break takes the lowest list_id), matching the old limit(k) cap.
      val far = v.select(col("id"), col("v"), dmin.as("d"))
        .orderBy(col("d").desc, col("id"))
        .limit(1).select("v").collect()
      cents = cents :+ far.head.getSeq[Double](0).toArray
    }
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

  /** Train an m×ksub×(dim/m) product-quantization codebook: subspace `b`'s
    * centroids are k-means over slice `b` of every vector. All m subspaces
    * train together — each iteration is one exploded (b, code, slice)
    * projection (m plan-constant argmin kernels) feeding one combinable
    * groupBy(b, code): m×ksub×(subDim+1) partials per partition, never the
    * raw vectors. */
  def fitProduct(df: DataFrame, idCol: String, vecCol: String, m: Int,
                 ksub: Int, iters: Int = 5,
                 seed: Long = 42L): Array[Array[Array[Double]]] = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val sample = v.orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(ksub).select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "k-means needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    var cb: Array[Array[Array[Double]]] =
      Array.tabulate(m, sample.length, subDim)((b, j, i) =>
        sample(j)(b * subDim + i))
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

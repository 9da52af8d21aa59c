package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.NearestCentroids
import graft.functions.VecFns

/** Persisted IVF index: the build-once / query-many ANN workflow a 100 TB
  * corpus actually runs (FAISS's on-disk IVF layout re-expressed as a
  * partitioned parquet table).
  *
  * Build = ONE pass: train the coarse quantizer
  * ([[graft.ml.KMeansQuantizer]]), assign every vector with the plan-constant
  * [[NearestCentroids]] kernel (narrow projection, no join), and write the
  * inverted file `partitionBy(list_id)` next to a centroids sidecar —
  * atomically (temp dir + rename), keyed by a content digest like the S7
  * cache, so rebuilding is a no-op until the corpus or params change.
  *
  * Query = read ONLY the probed partitions: the probe set is known on the
  * driver (|Q|·nprobe ints, model-sized), so `list_id IN (...)` is a STATIC
  * partition filter — the scan touches nprobe/nlist of the data files and
  * the plan shows it (`PartitionFilters` on the parquet scan, pinned in
  * PlanSpec). Scoring joins the probed lists against the broadcast query
  * set; the rank is the bounded [[TopK]] aggregator. */
object AnnIndex {

  /** Build (or reuse) the persisted index for `corpus`; returns its dir.
    * `corpusPath` keys the content digest (the same staleness contract as
    * [[AdaptCache.memo]]: regenerating the corpus in place is a miss). */
  def ivfIndexDir(corpus: DataFrame, corpusPath: String, idCol: String,
                  vecCol: String, nlist: Int = 16, iters: Int = 3,
                  seed: Long = 42L, variant: String = ""): String = {
    val spark = corpus.sparkSession
    val digest = AdaptCache.digestOf(Seq(corpusPath,
      AdaptCache.corpusToken(spark, corpusPath), idCol, vecCol,
      nlist.toString, iters.toString, seed.toString, variant))
    val dir = new Path(AdaptCache.cacheRoot(spark), s"ivf_index_$digest")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) AdaptCache.synchronized {
      if (!fs.exists(dir)) {
        val cents = graft.ml.KMeansQuantizer.fit(corpus, idCol, vecCol,
          nlist, iters, seed)
        val tmp = new Path(dir.getParent, s".ivf_index_$digest.tmp")
        fs.delete(tmp, true)
        corpus.select(
            element_at(NearestCentroids.column(col(vecCol), cents, 1), 1)
              .as("list_id"),
            col(idCol).as("cid"), col(vecCol).as("cvec"))
          .write.partitionBy("list_id").parquet(s"$tmp/lists")
        val spark2 = spark
        import spark2.implicits._
        cents.zipWithIndex
          .map { case (c, i) => (i + 1, c.toSeq) }.toSeq
          .toDF("list_id", "cvec")
          .coalesce(1).write.parquet(s"$tmp/centroids")
        if (!fs.rename(tmp, dir)) fs.delete(tmp, true) // lost a race: reuse
      }
    }
    dir.toString
  }

  /** Top-k cosine over the persisted index, probing `nprobe` lists per query.
    * Returns (qid, rk, cid, cos) like the other similarity operators. */
  def queryIvf(spark: SparkSession, indexDir: String, queries: DataFrame,
               qidCol: String, vecCol: String, k: Int,
               nprobe: Int = 4): DataFrame = {
    val cents: Array[Array[Double]] = spark.read
      .parquet(s"$indexDir/centroids").orderBy("list_id")
      .select(col("cvec").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val q = queries.select(col(qidCol).as("qid"), col(vecCol).as("qvec"))
    val qLists = q.select(col("qid"), col("qvec"),
      explode(NearestCentroids.column(col("qvec"), cents,
        math.min(nprobe, cents.length))).as("list_id"))
    // The probe set is driver-known (the query side is small by contract) —
    // materialize it so the list scan carries a static partition filter.
    val probed = qLists.select("list_id").distinct().collect()
      .map(_.getAs[Number](0).intValue)
    val lists = spark.read.parquet(s"$indexDir/lists")
      .filter(col("list_id").isin(probed.map(Int.box): _*))
    val scored = lists.join(broadcast(qLists), Seq("list_id"))
      .select(col("qid"), col("cid"),
        VecFns.cosine(col("qvec"), col("cvec")).as("cos"))
    TopK.topKPerQuery(scored, k)
  }
}

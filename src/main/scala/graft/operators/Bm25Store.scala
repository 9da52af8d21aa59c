package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 postings index — the build-once artifact that makes
  * repeated corpus probes (per-crawl decontamination triage, recurring
  * quality audits) cost O(matched postings) instead of re-tokenizing and
  * re-aggregating the corpus per query batch (the [[SignatureStore]] /
  * [[AnnIndex]] story applied to [[Bm25]]).
  *
  * Layout under `dir`:
  *  - `postings/wb=K/` — (word, doc_id, tf, dlen) rows, partitioned by
  *    `wb = xxhash64(word) mod 64`. dlen is DENORMALIZED into the posting
  *    row (the classic impact-ordered-postings trick): a probe never joins
  *    the corpus-sized doc-length table — everything per-posting is in the
  *    pruned partitions it reads.
  *  - `df/wb=K/` — (word, df), same bucketing.
  *  - `_scalars` — "nDocs,nTok" (the two corpus constants).
  *  - `_params` — layout/tokenizer contract token; probes check it loudly
  *    (the [[SignatureStore]] checkParams lesson: a dialect mismatch must
  *    never degrade to silent zero matches).
  *
  * Probe shape at 100 TB: the query terms' buckets are computed up front
  * (bounded collect over the literal query terms), BOTH store scans carry
  * a static `wb IN (...)` partition filter (pinned in PlanSpec), the term
  * probe and df table ride as broadcasts, and the scoring tail is the
  * shared [[Bm25.rank]] — identical expression trees, so the stored path
  * hash-matches the same DuckDB twin as the inline one. */
object Bm25Store {

  /** Word-hash partition fan-out. Fixed for the store's lifetime (it is
    * part of the layout contract recorded in `_params`). */
  val Buckets = 64

  /** The layout/tokenizer contract this code writes and expects. */
  private val ParamsToken = s"bm25_v1,clean_punct_ws,$Buckets"

  private def bucketCol(w: Column): Column =
    pmod(xxhash64(w), lit(Buckets.toLong))

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeText(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](128)
      val n = in.read(buf)
      if (n <= 0) "" else new String(buf, 0, n, "UTF-8").trim
    } finally in.close()
  }

  /** Seed the store from a static corpus: ONE tokenize pass feeds the tf
    * aggregation; dlen and df both derive from tf (no second corpus scan);
    * the only extra pass is the doc count (an id-column scan). Not
    * marker-protected — run through [[storeDir]] (atomic build-aside) or
    * re-run whole on failure. */
  def seed(docs: DataFrame, idCol: String, textCol: String,
           dir: String): Unit = {
    val spark = docs.sparkSession
    val fs = fsOf(spark, dir)
    val tf = Bm25.docWords(docs, idCol, textCol)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dlen = tf.groupBy("doc_id").agg(sum("tf").as("dlen"))
    tf.join(dlen, Seq("doc_id"))
      .withColumn("wb", bucketCol(col("word")))
      .write.mode("overwrite").partitionBy("wb")
      .parquet(s"$dir/postings")
    tf.groupBy("word").agg(count(lit(1)).as("df"))
      .withColumn("wb", bucketCol(col("word")))
      .write.mode("overwrite").partitionBy("wb")
      .parquet(s"$dir/df")
    val nTok = tf.agg(sum("tf")).collect()(0).getLong(0)
    val nDocs = docs.count() // ALL docs, empty included — the BM25 N
    writeText(fs, new Path(s"$dir/_scalars"), s"$nDocs,$nTok")
    writeText(fs, new Path(s"$dir/_params"), ParamsToken)
  }

  private def checkParams(fs: FileSystem, dir: String): Unit = {
    val p = new Path(s"$dir/_params")
    require(fs.exists(p), s"Bm25Store $dir has no _params — not a store?")
    val txt = readText(fs, p)
    require(txt == ParamsToken,
      s"Bm25Store $dir holds layout ($txt), probe expects ($ParamsToken) — " +
        "postings from a different tokenizer/layout never match silently")
  }

  /** Probe the store: same output contract as [[Bm25.topK]] —
    * (qid, doc_id, bm25, rk 1..k). The probe reads ONLY the partitions the
    * query terms' buckets name (bounded collect over the literal terms),
    * broadcasts the term list and the matched df rows, and runs the shared
    * scoring tail. */
  def probeStored(spark: SparkSession, dir: String,
                  queries: Seq[(Long, String)], k: Int = 5,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val fs = fsOf(spark, dir)
    checkParams(fs, dir)
    val Array(nDocs, nTok) =
      readText(fs, new Path(s"$dir/_scalars")).split(",").map(_.toLong)
    val qterms = Bm25.qtermsOf(spark, queries).localCheckpoint()
    // bounded: one row per distinct query-term bucket (≤ Buckets, and ≤ the
    // literal term count the caller typed)
    val wbs = qterms.select(bucketCol(col("word")).as("wb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("wb").isin(wbs: _*))
      .join(broadcast(qterms), Seq("word"))
    val dfreq = spark.read.parquet(s"$dir/df")
      .filter(col("wb").isin(wbs: _*))
      .join(broadcast(qterms.select("word").distinct()), Seq("word"))
      .select("word", "df")
    val matched = post.join(broadcast(dfreq), Seq("word"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("n_tok", lit(nTok))
    Bm25.rank(matched, k, k1, b)
  }

  /** Build (or reuse) a persisted store for a static corpus; returns its
    * dir — the [[SignatureStore.storeDir]] content-digest contract:
    * `corpusPath` + its content token key the digest, the build is atomic
    * (seed into a dot-temp, rename), every session sharing the cache root
    * reuses one build. */
  def storeDir(docs: DataFrame, corpusPath: String, idCol: String,
               textCol: String, variant: String = ""): String = {
    val spark = docs.sparkSession
    val digest = AdaptCache.digestOf(Seq("bm25store_v1", corpusPath,
      AdaptCache.corpusToken(spark, corpusPath), idCol, textCol, variant))
    val dir = new Path(AdaptCache.cacheRoot(spark), s"bm25_store_$digest")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) AdaptCache.synchronized {
      if (!fs.exists(dir)) {
        val tmp = new Path(dir.getParent, s".bm25_store_$digest.tmp")
        fs.delete(tmp, true)
        seed(docs, idCol, textCol, tmp.toString)
        if (!fs.rename(tmp, dir)) fs.delete(tmp, true) // lost a race: reuse
      }
    }
    dir.toString
  }
}

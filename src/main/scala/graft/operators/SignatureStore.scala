package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash signature store — the near-dup sibling of
  * [[FingerprintStore]] (exact text there; set similarity here). A
  * continuous crawl needs BOTH: a re-crawled page with one changed
  * timestamp token sails past the fingerprint store but not past a
  * signature screen, and [[Dedup.minHashDelta]]'s own scale story says the
  * base snapshot's signatures are a computed-once artifact. This store IS
  * that artifact: seed it from a snapshot, extend it per ingest epoch, and
  * every delta run hashes ONLY the incoming documents (reference anchor:
  * the memoized-artifact discipline of `adaptation/dataset.py:131-147`,
  * applied to MinHash signatures).
  *
  * Layout: `dir/sigs` — an append-only parquet table of
  * (id, sig ARRAY<BIGINT>), `partitionBy(shard)` on the id's hash low
  * bits, plus `_sig_<tag>_epoch_<e>` idempotence markers (the
  * [[AnnIndex.ivfAppender]] protocol). `dir/_params` pins
  * (numHashes, shingleSize): signatures from different parameters never
  * mix — a probe with mismatched params is a loud error, not silent
  * zero-overlap estimates.
  *
  * Scale shape per delta/screen: banding is a cheap slice+hash projection
  * over the STORED sigs (8·numHashes bytes per doc — no text is ever
  * re-shingled), the candidate join moves 24-byte (band_id, band_hash, id)
  * rows with the batch side broadcast, and candidate verification joins
  * the sigs tables by id with the store side pruned to the candidates'
  * shards (the [[FingerprintStore]] partition-filter discipline).
  */
object SignatureStore {

  private val NumShards = 64

  private def shardCol(id: org.apache.spark.sql.Column) =
    pmod(xxhash64(id), lit(NumShards))

  /** Parameter sidecar: written once at seed, checked on every read. */
  private def writeParams(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                          numHashes: Int, shingleSize: Int): Unit = {
    val p = new Path(s"$dir/_params")
    if (!fs.exists(p)) {
      val out = fs.create(p, true)
      try out.write(s"$numHashes,$shingleSize".getBytes("UTF-8"))
      finally out.close()
    }
  }

  private def checkParams(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                          numHashes: Int, shingleSize: Int): Unit = {
    val p = new Path(s"$dir/_params")
    if (fs.exists(p)) {
      val in = fs.open(p)
      val txt = try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        if (n <= 0) "" else new String(buf, 0, n, "UTF-8").trim
      } finally in.close()
      require(txt == s"$numHashes,$shingleSize",
        s"SignatureStore $dir holds params ($txt), probe asked " +
          s"($numHashes,$shingleSize) — signatures from different params " +
          "never compare")
    }
  }

  /** Seed (or extend) the store from a static corpus — the bulk "hash the
    * snapshot once" pass. One signature computation, one sharded append. */
  def seed(docs: DataFrame, idCol: String, textCol: String, dir: String,
           numHashes: Int = 32, shingleSize: Int = 3): Unit = {
    val spark = docs.sparkSession
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    checkParams(fs, dir, numHashes, shingleSize)
    Dedup.minHashSignatures(docs, idCol, textCol, numHashes, shingleSize)
      .withColumn("shard", shardCol(col("id")))
      .write.mode("append").partitionBy("shard").parquet(s"$dir/sigs")
    writeParams(fs, dir, numHashes, shingleSize)
  }

  /** The stored signature table: (id, sig, shard). Empty frame (same
    * schema) for a store that has no sigs yet, so screens over a fresh
    * store admit everything instead of failing on a missing path. */
  def read(spark: SparkSession, dir: String, numHashes: Int = 32,
           shingleSize: Int = 3): DataFrame = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    checkParams(fs, dir, numHashes, shingleSize)
    if (fs.exists(new Path(s"$dir/sigs")))
      spark.read.parquet(s"$dir/sigs")
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("id", LongType),
          StructField("sig", ArrayType(LongType)),
          StructField("shard", LongType))))
    }
  }

  /** foreachBatch sink extending the store: each epoch's docs are hashed
    * once and their signatures appended under their shards. Idempotent
    * under at-least-once re-delivery via the epoch-marker protocol; a
    * RESTARTED appender resumes seamlessly — the store is append-only
    * parquet, so there is no in-memory state to rebuild (contrast
    * [[Pack.shardAppender]]'s running token total). Single appender stream
    * per store, the maintainer contract of the other stores. */
  def appender(spark: SparkSession, dir: String, idCol: String,
               textCol: String, numHashes: Int = 32, shingleSize: Int = 3,
               streamTag: String = "stream"): (DataFrame, Long) => Unit = {
    (batch: DataFrame, epoch: Long) => {
      val fs = new Path(dir).getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      checkParams(fs, dir, numHashes, shingleSize)
      val marker = new Path(s"$dir/_sig_${streamTag}_epoch_$epoch")
      if (!fs.exists(marker) && !batch.isEmpty) {
        Dedup.minHashSignatures(batch, idCol, textCol, numHashes, shingleSize)
          .withColumn("shard", shardCol(col("id")))
          .write.mode("append").partitionBy("shard").parquet(s"$dir/sigs")
        writeParams(fs, dir, numHashes, shingleSize)
        fs.create(marker, true).close()
      }
    }
  }

  /** foreachBatch sink SCREENING each micro-batch against the store before
    * admitting: documents that are MinHash near-duplicates (estimated
    * Jaccard ≥ `threshold`) of anything already stored are dropped;
    * survivors' signatures append and the surviving rows (original
    * columns) flow to `out`. Mount DOWNSTREAM of
    * [[FingerprintStore.dedupSink]]: the fp store kills byte-identical
    * re-deliveries cheaply, this screen catches the re-crawl that changed
    * one timestamp token.
    *
    * Per epoch the batch's text is hashed ONCE ([[Dedup.minHashSignatures]])
    * and that signature frame feeds the screen, the append, and nothing
    * else re-reads the text. The store side is never re-hashed — banding is
    * a projection over the stored sigs. Near-dups WITHIN one batch admit
    * together (documented: the screen compares batch vs store; intra-batch
    * near-dup at micro-batch size is the batch pipeline's job). Replayed
    * epochs skip via the marker — re-screening would find the batch's own
    * just-appended signatures and drop everything. */
  def screenSink(spark: SparkSession, dir: String, idCol: String,
                 textCol: String, threshold: Double = 0.5,
                 numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                 streamTag: String = "stream")
                (out: DataFrame => Unit): (DataFrame, Long) => Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    (batch: DataFrame, epoch: Long) => {
      val fs = new Path(dir).getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      checkParams(fs, dir, numHashes, shingleSize)
      val marker = new Path(s"$dir/_sig_${streamTag}_epoch_$epoch")
      if (!fs.exists(marker) && !batch.isEmpty) {
        val b = batch.localCheckpoint()
        val sigsI = Dedup.minHashSignatures(b, idCol, textCol, numHashes,
          shingleSize).localCheckpoint()
        val flagged = Dedup.minHashDeltaOverSigs(read(spark, dir, numHashes,
            shingleSize).select("id", "sig"), sigsI, numHashes, bands,
            threshold)
          .select(col("doc_id").as(idCol))
        val survivors = b.join(broadcast(flagged), Seq(idCol), "left_anti")
          .localCheckpoint()
        out(survivors)
        sigsI.join(broadcast(flagged.select(col(idCol).as("id"))),
            Seq("id"), "left_anti")
          .withColumn("shard", shardCol(col("id")))
          .write.mode("append").partitionBy("shard").parquet(s"$dir/sigs")
        writeParams(fs, dir, numHashes, shingleSize)
        fs.create(marker, true).close()
      }
    }
  }

  /** Build (or reuse) a persisted store for a static base corpus; returns
    * its dir — the [[AnnIndex.ivfIndexDir]] content-digest contract:
    * `corpusPath` keys the digest, the build is atomic (write aside +
    * rename), and every session sharing the cache root reuses one build.
    * This is how a batch delta query gets the "snapshot signatures are
    * computed once" shape without managing dirs itself. */
  def storeDir(base: DataFrame, corpusPath: String, idCol: String,
               textCol: String, numHashes: Int = 32, shingleSize: Int = 3,
               variant: String = ""): String = {
    val spark = base.sparkSession
    val digest = AdaptCache.digestOf(Seq(corpusPath,
      AdaptCache.corpusToken(spark, corpusPath), idCol, textCol,
      numHashes.toString, shingleSize.toString, variant))
    val dir = new Path(AdaptCache.cacheRoot(spark), s"sig_store_$digest")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) AdaptCache.synchronized {
      if (!fs.exists(dir)) {
        val tmp = new Path(dir.getParent, s".sig_store_$digest.tmp")
        fs.delete(tmp, true)
        seed(base, idCol, textCol, tmp.toString, numHashes, shingleSize)
        if (!fs.rename(tmp, dir)) fs.delete(tmp, true) // lost a race: reuse
      }
    }
    dir.toString
  }
}

package graft.operators

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.embed.EmbeddingProvider

/** S7: parameter-keyed persistent memoization of the adaptation word-pair
  * dataset (reference adaptation/dataset.py:131-147,176-179 — the dataset is
  * saved as an `.npy` whose NAME encodes every construction parameter, and a
  * later run with the same parameters loads instead of recomputing).
  *
  * Spark-first re-expression: the memo is a parquet table keyed by a digest of
  * (corpus path, text column, topK, source provider, target provider) — the
  * providers are case classes, so `toString` captures dim/seed/rotation too.
  * A hit is a plain parquet scan (pruned/pushed-down like any other source);
  * a miss computes the A1→A2→A3 pipeline once and persists it atomically
  * (write to a temp dir + rename) so a crashed writer never leaves a partial
  * cache a later reader would trust. The table also registers in the session
  * catalog as `adapt_pairs_<digest>` for SQL access.
  *
  * At 100 TB the word count is the expensive stage (a full corpus scan);
  * iterating on mapping fits (Procrustes vs MLP vs pooling variants) re-reads
  * a ≤topK-row parquet instead. */
object AdaptCache {

  private[graft] def digestOf(parts: Seq[String]): String =
    MessageDigest.getInstance("SHA-256")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** Cheap content token for the corpus behind `path`: a digest of the
    * (name, length, mtime) listing. Without it the key covers only the PATH,
    * and regenerating the dataset in place would silently serve stale cached
    * results — with it, a rewrite is a cache miss. Non-listable paths (unit
    * tests' mem:// markers) degrade to a constant token. */
  def corpusToken(spark: SparkSession, path: String): String =
    try {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) "absent"
      else digestOf(fs.listStatus(p).map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted.toSeq)
    } catch { case _: Exception => "nofs" }

  /** Digest of every parameter that determines the dataset's content,
    * including the corpus content token. */
  def key(corpusPath: String, textCol: String, topK: Int,
          source: EmbeddingProvider, target: EmbeddingProvider): String =
    digestOf(Seq(corpusPath, corpusToken(SparkSession.active, corpusPath),
      textCol, topK.toString, source.toString, target.toString))

  /** Root for cache tables: `spark.graft.adaptCacheDir` if set, else a
    * `graft_adapt_cache` dir under the session's warehouse. */
  def cacheRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.adaptCacheDir")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir") + "/graft_adapt_cache")

  /** Generic keyed parquet memo: compute `build` once per (prefix, digest),
    * persist atomically (temp dir + rename — a crashed writer never leaves a
    * partial cache a later reader would trust), register in the session
    * catalog, return the parquet scan. Cache hits are plain pruned/pushed-down
    * parquet reads like any other source. */
  def memo(spark: SparkSession, prefix: String, digest: String)
          (build: => DataFrame): DataFrame = synchronized {
    val dir = new Path(cacheRoot(spark), s"${prefix}_$digest.parquet")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) {
      val tmp = new Path(dir.getParent, s".${prefix}_$digest.tmp")
      fs.delete(tmp, true)
      build.write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, dir)) fs.delete(tmp, true) // lost a race: hit below
    }
    val df = spark.read.parquet(dir.toString)
    df.createOrReplaceTempView(s"${prefix}_$digest")
    df
  }

  /** [[Adaptation.wordPairDataset]] behind the parameter-keyed cache: load on
    * hit, compute-persist-load on miss. `docs` must be the table at
    * `corpusPath` (the key covers the path, not the plan). */
  def wordPairDataset(docs: DataFrame, corpusPath: String, textCol: String,
                      topK: Int, source: EmbeddingProvider,
                      target: EmbeddingProvider): DataFrame =
    memo(docs.sparkSession, "adapt_pairs",
      key(corpusPath, textCol, topK, source, target)) {
      Adaptation.wordPairDataset(docs, textCol, topK, source, target)
    }

  /** S3/S4 (reference streams/stream_data.py:119-153 embeds each corpus once
    * and reuses the matrices): the mean-pooled per-document embedding table
    * behind the adaptation stream, memoized per (corpus path, text column,
    * provider). At 100 TB the provider pass is the single most expensive
    * stage of the pipeline — every downstream mapping/drift/report experiment
    * re-reads the materialized (doc_id, vec) parquet instead. */
  def pooledDocEmbeddings(docs: DataFrame, corpusPath: String, textCol: String,
                          provider: EmbeddingProvider): DataFrame = {
    val digest = digestOf(Seq(corpusPath,
      corpusToken(docs.sparkSession, corpusPath), textCol, "meanpool",
      provider.toString))
    memo(docs.sparkSession, "pooled_docs", digest) {
      docs.select(col("doc_id"),
        EmbeddingProvider.embedMeanPoolCol(provider)(col(textCol)).as("vec"))
    }
  }
}

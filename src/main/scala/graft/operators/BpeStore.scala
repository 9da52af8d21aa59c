package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.functions.Bpe

/** Persisted BPE tokenizer — the trained-merge-table artifact of a corpus
  * pipeline. A production tokenizer is trained ONCE, versioned, and shipped
  * to every downstream job (packing, token counting, curriculum budgeting);
  * losing or silently swapping it changes every token count in the pipeline.
  * So the model gets the same durability contract as the engine's other
  * persisted stores:
  *
  *  - `merges/` — (rank, left, right) rows, ONE tiny parquet file, the
  *    whole model (merge order IS the model — [[Bpe.Model]] applies them by
  *    rank). Written to a dot-staging dir and RENAMED into place.
  *  - `_params` — trainer contract token (numMerges, minCount, tokenizer
  *    dialect). [[load]] checks it loudly — a dialect mismatch must fail,
  *    never silently re-tokenize differently (the SignatureStore lesson).
  *  - `_MODEL_OK` — publish marker, written last; [[load]] refuses a
  *    markerless dir (a torn [[save]] is invisible to readers).
  *
  * Scale: the model is KB-sized — the store exists for durability and
  * contract-checking, not partitioning; loads are one driver-side read and
  * a broadcast, exactly how the in-memory model already flows into
  * [[Bpe.pieceCountCol]]. */
object BpeStore {

  private val ParamsPrefix = "bpe_v1,clean_punct_ws"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def paramsToken(numMerges: Int, minCount: Long): String =
    s"$ParamsPrefix,$numMerges,$minCount"

  /** Stage-then-publish save: merges parquet into `.staging_merges`, rename
    * to `merges/`, then `_params` + the `_MODEL_OK` marker. A crash at any
    * point leaves either no marker (readers refuse; a re-save heals the
    * staging remnant) or a complete store. */
  def save(spark: SparkSession, model: Bpe.Model, dir: String,
           numMerges: Int, minCount: Long): Unit = {
    val fs = fsOf(spark, dir)
    val stage = new Path(s"$dir/.staging_merges")
    val publish = new Path(s"$dir/merges")
    fs.delete(stage, true) // heal a previous torn save
    fs.delete(publish, true)
    val rows = model.merges.zipWithIndex.map { case ((l, r), k) =>
      Row(k, l, r)
    }.toSeq
    val schema = StructType(Seq(StructField("rank", IntegerType),
      StructField("left", StringType), StructField("right", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    require(fs.rename(stage, publish), s"publish rename failed for $dir")
    val pf = fs.create(new Path(s"$dir/_params"), true)
    pf.write(paramsToken(numMerges, minCount).getBytes("UTF-8")); pf.close()
    fs.create(new Path(s"$dir/_MODEL_OK"), true).close()
  }

  /** Load a published model; LOUD failure on a missing marker or a params
    * mismatch — never a silently different tokenizer. */
  def load(spark: SparkSession, dir: String,
           numMerges: Int, minCount: Long): Bpe.Model = {
    val fs = fsOf(spark, dir)
    require(fs.exists(new Path(s"$dir/_MODEL_OK")),
      s"BPE store $dir has no publish marker — torn save or wrong dir")
    val in = fs.open(new Path(s"$dir/_params"))
    val got = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    val want = paramsToken(numMerges, minCount)
    require(got == want,
      s"BPE store $dir params mismatch: store '$got' vs caller '$want'")
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    Bpe.Model(merges)
  }

  /** Train-once-per-corpus cache ([[Bm25Store.storeDir]] contract): the
    * corpus path + content token + trainer params key a digest; the first
    * caller trains and publishes, everyone after loads from disk. */
  def storeDir(spark: SparkSession, corpusPath: String, textCol: String,
               numMerges: Int, minCount: Long, maxWords: Int): String = {
    val digest = AdaptCache.digestOf(Seq("bpe_store_v1", corpusPath,
      AdaptCache.corpusToken(spark, corpusPath),
      s"$textCol|$numMerges|$minCount|$maxWords"))
    val dir = new Path(AdaptCache.cacheRoot(spark), s"bpe_store_$digest")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir, "_MODEL_OK"))) AdaptCache.synchronized {
      if (!fs.exists(new Path(dir, "_MODEL_OK"))) {
        val docs = spark.read.parquet(corpusPath)
        val model = Bpe.train(docs, textCol, numMerges, minCount, maxWords)
        save(spark, model, dir.toString, numMerges, minCount)
      }
    }
    dir.toString
  }
}

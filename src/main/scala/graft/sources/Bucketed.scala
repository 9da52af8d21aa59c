package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.AdaptCache

/** Bucketed table catalog: co-located joins without a shuffle.
  *
  * At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling both
  * sides on the join key. Spark's answer is bucketing: write each table ONCE,
  * hash-partitioned into `numBuckets` files per the join key and sorted
  * within each bucket — then every subsequent join on that key reads
  * bucket-aligned splits and sort-merge-joins them with NO Exchange and NO
  * Sort in the plan (`FileSourceScanExec` reports `Bucketed: true`,
  * `SelectedBucketsCount`). The write-side shuffle is paid once and amortized
  * over every downstream join/aggregation on the same key — the standard
  * layout decision for a fact table that is joined on its key daily.
  *
  * Build-once semantics match [[graft.operators.AnnIndex]]: the catalog name
  * is content-keyed (path + file listing digest + bucket spec), so a repeat
  * call is a no-op and a regenerated corpus is a miss. Tables persist in the
  * session warehouse; a fresh session re-registers from the same files.
  */
object Bucketed {

  /** Ensure a bucketed+sorted copy of `sfDir/name.parquet` exists in the
    * session catalog; returns the catalog table name. Bucket count is a
    * layout decision: at 100 TB pick `numBuckets` so each bucket file is
    * 100–500 MB after compression (e.g. 2⁴–2¹⁶ buckets by table size). */
  def table(spark: SparkSession, sfDir: String, name: String,
            keyCols: Seq[String], numBuckets: Int = 8): String = {
    val path = s"$sfDir/$name.parquet"
    val digest = AdaptCache.digestOf(Seq(path,
      AdaptCache.corpusToken(spark, path), keyCols.mkString(","),
      numBuckets.toString))
    val tbl = s"bkt_${name}_$digest"
    this.synchronized {
      if (!spark.catalog.tableExists(tbl)) {
        val dir = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/"), tbl)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // a crashed writer leaves a dir without the commit marker — unlike
        // the rename-committed index builds, saveAsTable has no atomic
        // publish, so an unmarked dir must be treated as garbage, never
        // re-registered (it would silently serve partial data)
        if (fs.exists(dir) &&
            !fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
          fs.delete(dir, true)
        }
        if (fs.exists(dir)) {
          // files survive the session but the in-memory catalog doesn't:
          // re-register an external table over them, bucket spec included
          // (the spec is trusted metadata — it must match what was written,
          // which the content-keyed name guarantees)
          val ddl = Tables(spark, sfDir, name).schema.toDDL
          val keys = keyCols.mkString(", ")
          spark.sql(s"CREATE TABLE $tbl ($ddl) USING parquet " +
            s"CLUSTERED BY ($keys) SORTED BY ($keys) INTO $numBuckets BUCKETS " +
            s"LOCATION '$dir'")
        } else {
          Tables(spark, sfDir, name)
            .write.format("parquet")
            .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
            .sortBy(keyCols.head, keyCols.tail: _*)
            .saveAsTable(tbl)
        }
      }
    }
    tbl
  }

  /** The bucketed copy as a DataFrame (bucket metadata rides through the
    * catalog, so joins/aggregations on `keyCols` skip their Exchange). */
  def read(spark: SparkSession, sfDir: String, name: String,
           keyCols: Seq[String], numBuckets: Int = 8): DataFrame =
    spark.table(table(spark, sfDir, name, keyCols, numBuckets))
}

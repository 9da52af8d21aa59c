package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training blocks
  * (the concatenate-and-chunk packing LLM pre-training pipelines run before
  * batching — docs concatenate in corpus order, the token stream chunks into
  * `budget`-sized blocks, and a doc belongs to the block holding its first
  * token).
  *
  * Scale design: the global token cumsum is composed per partition like
  * [[ZipIndex]] — `repartitionByRange(order)` gives a total order across
  * range partitions, a window PARTITIONED BY the physical partition id
  * computes intra-partition cumsums in parallel (never a global
  * single-partition window), per-partition totals (numPartitions rows,
  * model-sized) collect to the driver for prefix offsets, and a broadcast
  * join composes the global position. [SQL oracle: a window cumsum]. */
object Pack {

  /** Per-doc packing assignment: (orderCol, tokCol untouched) +
    * `bin_id` = block index of the doc's first token (0-based) and
    * `bin_offset` = position of that token inside the block.
    *
    * @param orderCol unique corpus order key (doc id)
    * @param tokCol   per-doc token count
    */
  def packByBudget(docs: DataFrame, orderCol: String, tokCol: String,
                   budget: Long): DataFrame = {
    require(budget > 0)
    val spark = docs.sparkSession
    // Freeze the range layout: spark_partition_id is physical, and BOTH
    // branches below (per-partition totals + intra-partition cumsum) must
    // see the same pid assignment.
    val sorted = docs.select(col(orderCol).as("ord"),
        col(tokCol).cast("long").as("n_tokens"))
      .repartitionByRange(col("ord")).sortWithinPartitions("ord")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // Prefix offsets per partition: numPartitions rows — model-sized by
    // contract (same job shape as ZipIndex's per-partition count pass).
    val totals = sorted.groupBy("pid").agg(sum("n_tokens").as("ptot"))
      .orderBy("pid").collect()
    var acc = 0L
    val offs = totals.map { r =>
      val row = (r.getInt(0), acc); acc += r.getLong(1); row
    }.toSeq
    import spark.implicits._
    val offDf = offs.toDF("pid", "poff")
    // Intra-partition cumsum: the window is PARTITIONED (by pid) — every
    // range partition ranks in parallel; no global-order window anywhere.
    val w = Window.partitionBy("pid").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    sorted
      .withColumn("cum", sum("n_tokens").over(w))
      .join(broadcast(offDf), Seq("pid"))
      .select(col("ord").as(orderCol), col("n_tokens"),
        (col("poff") + col("cum") - col("n_tokens")).as("first_tok"))
      .select(col(orderCol), col("n_tokens"),
        expr(s"first_tok DIV $budget").as("bin_id"),
        pmod(col("first_tok"), lit(budget)).as("bin_offset"))
  }

  /** Export packed training shards: the docs (payload columns intact) land
    * under `shard=K/` dirs of `binsPerShard` consecutive blocks each, sorted
    * by (bin_id, bin_offset) inside every file — so a trainer streams one
    * shard dir sequentially and sees its blocks' docs in concatenation
    * order. The write is one range shuffle on (shard, bin_id): each task
    * emits whole shards, files never interleave shards, and shard count
    * scales with the corpus while each dir stays trainer-loadable. */
  def writeShards(docs: DataFrame, orderCol: String, tokCol: String,
                  budget: Long, binsPerShard: Long, dir: String): Unit = {
    require(binsPerShard > 0)
    val packed = packByBudget(docs, orderCol, tokCol, budget)
      .select(col(orderCol), col("bin_id"), col("bin_offset"))
      .join(docs, Seq(orderCol))
    packed
      .withColumn("shard", expr(s"bin_id DIV $binsPerShard"))
      .repartitionByRange(col("shard"), col("bin_id"), col("bin_offset"))
      .sortWithinPartitions("shard", "bin_id", "bin_offset")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
  }

  /** Deterministic training-order shuffle: every example gets a seeded
    * pseudorandom (shard, shard_pos) — the "shuffle the corpus before
    * training" step, WITHOUT a global sort. The 52-bit draw
    * ([[Sample.drawCol]]) assigns shard = draw mod `nShards` and orders
    * within the shard by (draw desc, id); a trainer reading the shards in
    * any interleaving sees a seeded permutation of the corpus, and a new
    * seed is a fresh epoch permutation with zero data rewritten.
    *
    * Scale shape: ONE hash-keyed shuffle into `nShards` window partitions —
    * size nShards so a shard's rows fit an executor (the same knob as any
    * shard writer; at 100 TB that is 10⁴–10⁵ shards, each a parallel window
    * partition), never a single global window. Deterministic across runs
    * and cluster sizes — xxhash64 arithmetic, no rand(). [SQL oracle:
    * row_number over the replayed draw]. */
  def shuffleOrder(df: DataFrame, idCol: String, nShards: Int,
                   seed: Long): DataFrame = {
    require(nShards > 0)
    val w = Window.partitionBy("shard").orderBy(col("draw").desc, col(idCol))
    df.select(col(idCol), Sample.drawCol(col(idCol), seed).as("draw"))
      .withColumn("shard", pmod(col("draw"), lit(nShards.toLong)))
      .select(col(idCol), col("shard"),
        row_number().over(w).cast("long").as("shard_pos"))
  }
}

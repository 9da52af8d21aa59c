package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pack

/** Sequence-packing contracts: bit-parity with the sequential
  * concatenate-and-chunk definition across partition boundaries, and the
  * no-global-window plan shape. */
class PackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lens(n: Int): Seq[(Long, Long)] =
    (0 until n).map(i => (i.toLong, 1L + Math.floorMod(i * 2654435761L, 97L)))

  test("packByBudget matches the sequential definition across partitions") {
    val data = lens(500)
    // force many range partitions so docs straddle partition boundaries
    val df = data.toDF("doc_id", "n_toks").repartition(13)
    val got = Pack.packByBudget(df, "doc_id", "n_toks", budget = 128L)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    var cum = 0L
    data.foreach { case (id, n) =>
      assert(got(id) == (cum / 128L, cum % 128L),
        s"doc $id: got ${got(id)}, want ${(cum / 128, cum % 128)}")
      cum += n
    }
  }

  test("writeShards: complete disjoint shard dirs, payload intact, in-shard order") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = lens(500).map { case (id, n) => (id, n, s"payload-$id") }
      .toDF("doc_id", "n_toks", "text").repartition(7)
    Pack.writeShards(docs, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 16L, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    assert(back.select("text").as[String].collect().toSet ==
      (0 until 500).map(i => s"payload-$i").toSet)
    // each shard holds exactly its bin range: max bin of shard k < min bin
    // of shard k+1, and every bin DIV binsPerShard equals its shard
    assert(back.filter(expr("bin_id DIV 16") =!= col("shard")).count() == 0)
    val perShard = back.groupBy("shard")
      .agg(min("bin_id").as("lo"), max("bin_id").as("hi"))
      .orderBy("shard").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    perShard.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("docs spanning a block boundary keep their first-token block") {
    val df = Seq((1L, 100L), (2L, 100L), (3L, 100L)).toDF("doc_id", "n")
    val got = Pack.packByBudget(df, "doc_id", "n", budget = 128L)
      .orderBy("doc_id").collect()
    // doc 2 starts at token 100 (block 0, offset 100) even though it spills
    // into block 1; doc 3 starts at 200 → block 1, offset 72
    assert(got.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L), (0L, 100L), (1L, 72L)))
  }

  test("plan: the cumsum window is partition-parallel (no single-partition exchange)") {
    val df = lens(200).toDF("doc_id", "n_toks")
    val plan = Pack.packByBudget(df, "doc_id", "n_toks", budget = 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global window funnels the corpus through one partition:\n$plan")
  }

  test("shuffleOrder is a seeded permutation: every id once, dense per-shard positions, " +
    "seeds permute independently") {
    val ids = (0L until 500L).map(Tuple1(_)).toDF("doc_id")
    val a = Pack.shuffleOrder(ids, "doc_id", nShards = 8, seed = 17L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.map(_._1).sorted.toSeq == (0L until 500L), "every id exactly once")
    assert(a.map(_._2).distinct.sorted.toSeq.forall(s => s >= 0 && s < 8))
    // positions within each shard are exactly 1..|shard| (dense, no gaps)
    a.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"shard $sh positions not dense")
    }
    // a different seed yields a genuinely different permutation and sharding
    val b = Pack.shuffleOrder(ids, "doc_id", nShards = 8, seed = 18L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val aByIdp = a.map(t => t._1 -> (t._2, t._3)).toMap
    val moved = b.count(t => aByIdp(t._1) != ((t._2, t._3)))
    assert(moved > 400, s"seed change should reshuffle nearly everything: $moved/500")
    // and the same seed is exactly reproducible
    val a2 = Pack.shuffleOrder(ids, "doc_id", nShards = 8, seed = 17L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a2.toSet == a.toSet)
  }

  test("packByBudgetKeyed matches the per-key sequential definition across partitions") {
    val data = lens(500).map { case (id, n) => (id, n, n % 7) } // 7 buckets
    val df = data.toDF("doc_id", "n_toks", "bucket").repartition(13)
    val got = Pack.packByBudgetKeyed(df, "bucket", "doc_id", "n_toks",
        budget = 128L)
      .collect().map(r => (r.getLong(1), (r.getLong(3), r.getLong(4)))).toMap
    // sequential truth: per bucket, docs in id order, independent cumsum
    val cum = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    data.sortBy(_._1).foreach { case (id, n, b) =>
      val c = cum(b)
      assert(got(id) == ((c / 128L, c % 128L)),
        s"doc $id bucket $b: got ${got(id)}, want ${(c / 128, c % 128)}")
      cum(b) = c + n
    }
    // plan: the keyed cumsum never funnels through one partition
    val plan = Pack.packByBudgetKeyed(df, "bucket", "doc_id", "n_toks", 128L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("Mix driver math is bit-identical to the Spark budget/rate subtree " +
    "it replaced (pow, round-6 HALF_UP, floor, least)") {
    import graft.operators.Mix
    // adversarial totals: near-boundary ratios, one giant + tiny tail
    val per = Seq(("a", 1L), ("b", 999999L), ("c", 31L), ("d", 123456789L),
      ("e", 7L))
    val perDf = per.toDF("source", "src_toks")
    val tot = perDf.agg(sum("src_toks").as("tot_toks"))
    val w = perDf.crossJoin(broadcast(tot))
      .select(col("source"), col("src_toks"), col("tot_toks"),
        pow(col("src_toks").cast("double") / col("tot_toks").cast("double"),
          lit(0.7)).as("w"))
    val sw = w.agg(sum("w").as("sum_w"))
    val sparkBudgets = w.crossJoin(broadcast(sw))
      .select(col("source"),
        floor(round(lit(0.5) * col("tot_toks").cast("double") * col("w") /
          col("sum_w"), 6)).cast("long").as("budget_toks"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val sparkRates = w.crossJoin(broadcast(sw))
      .select(col("source"),
        round(least(lit(1.0),
          lit(0.5) * col("tot_toks").cast("double") * col("w") /
            (col("sum_w") * col("src_toks").cast("double"))), 6).as("rate"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    Mix.flattenedBudgets(per).foreach { case (s0, b) =>
      assert(b == sparkBudgets(s0), s"budget $s0")
    }
    Mix.flattenedRates(per).foreach { case (s0, r) =>
      assert(java.lang.Double.doubleToLongBits(r) ==
        java.lang.Double.doubleToLongBits(sparkRates(s0)), s"rate $s0")
    }
  }

  test("packByBudgetKeyed enforces the key-cardinality contract loudly") {
    // a high-cardinality key (here: the doc id itself) would collect
    // |keys|·partitions offset rows — the guard must fail before that
    val df = lens(500).toDF("doc_id", "n_toks")
      .withColumn("key", col("doc_id"))
    val ex = intercept[IllegalArgumentException] {
      Pack.packByBudgetKeyed(df, "key", "doc_id", "n_toks",
        budget = 128L, maxKeys = 64)
    }
    assert(ex.getMessage.contains("maxKeys"), ex.getMessage)
    // and a deliberate raise admits the same frame
    assert(Pack.packByBudgetKeyed(df, "key", "doc_id", "n_toks",
      budget = 128L, maxKeys = 500).count() == 500)
  }

  test("shardAppender stage-then-publish: a committed-but-unpublished epoch " +
    "heals on restart; an uncommitted stage is discarded and replays exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("packcrash").toString
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val bulk = lens(50).map { case (id, n) => (id, n, s"p-$id") }
      .toDF("doc_id", "n_toks", "text")
    Pack.writeShards(bulk, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, dir)
    val total0 = lens(50).map(_._2).sum
    def storeCount() = spark.read.parquet(dir).count()
    assert(storeCount() == 50)
    // simulate a crash AFTER the commit marker, BEFORE publish: the epoch's
    // packed rows sit in staging, the marker exists, nothing reached the
    // shard dirs (exactly what the appender leaves between its marker write
    // and publishStage)
    val ep0 = Seq((100L, 10L, "p-100")).toDF("doc_id", "n_toks", "text")
    Pack.packByBudget(ep0, "doc_id", "n_toks", budget = 128L,
        startTok = total0)
      .select(col("doc_id"), col("bin_id"), col("bin_offset"))
      .join(ep0, Seq("doc_id"))
      .withColumn("shard", expr("bin_id DIV 4"))
      .write.partitionBy("shard").parquet(s"$dir/.pack_stage_t_0")
    val mk = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_packed_t_epoch_0"), true)
    mk.write((total0 + 10L).toString.getBytes("UTF-8")); mk.close()
    assert(storeCount() == 50, "dot-staging must be invisible to readers")
    // restart: constructing the appender heals the committed stage
    val app = Pack.shardAppender(spark, dir, "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, streamTag = "t")
    assert(storeCount() == 51, "committed epoch must publish on heal")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.pack_stage_t_0")))
    app(ep0, 0L) // replay of the healed epoch: marker found → no double
    assert(storeCount() == 51)
    // simulate a crash BEFORE the marker: an orphan stage with bogus rows —
    // the heal must DISCARD it (the epoch re-delivers and re-runs whole)
    Seq((999L, 1L, "junk", 0L, 0L, 0L))
      .toDF("doc_id", "n_toks", "text", "bin_id", "bin_offset", "shard")
      .write.partitionBy("shard").parquet(s"$dir/.pack_stage_t_1")
    // a SIBLING tag's committed-but-unpublished stage: tag "t" is a string
    // prefix of tag "t_b" — tag t's heal must neither publish nor delete it
    Seq((998L, 1L, "sibling", 0L, 0L, 0L))
      .toDF("doc_id", "n_toks", "text", "bin_id", "bin_offset", "shard")
      .write.partitionBy("shard").parquet(s"$dir/.pack_stage_t_b_3")
    val app2 = Pack.shardAppender(spark, dir, "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, streamTag = "t")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.pack_stage_t_1")),
      "uncommitted stage must be discarded, not published")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.pack_stage_t_b_3")),
      "tag t's heal must not touch tag t_b's staging")
    assert(storeCount() == 51)
    val ep1 = Seq((101L, 7L, "p-101")).toDF("doc_id", "n_toks", "text")
    app2(ep1, 1L) // the re-delivered epoch appends exactly once
    assert(storeCount() == 52)
    // and the token stream continued through crash + heal: doc 101's first
    // token is total0 + 10
    val r = spark.read.parquet(dir).filter(col("doc_id") === 101L)
      .select("bin_id", "bin_offset").head()
    val firstTok = total0 + 10L
    assert((r.getLong(0), r.getLong(1)) == (firstTok / 128L, firstTok % 128L))
  }

  test("shardAppender continues the bulk export's token stream; compaction " +
    "under the live appender folds files and loses nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("packstore").toString
    // bulk export: docs 0..99, deterministic lengths, budget 128, 4 bins/shard
    val bulk = lens(100).map { case (id, n) => (id, n, s"payload-$id") }
      .toDF("doc_id", "n_toks", "text").repartition(5)
    Pack.writeShards(bulk, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, dir)
    val filesAfterBulk = Pack.shardFileCount(spark, dir)
    // stream three epochs of new docs through the appender, compacting
    // BETWEEN epochs while the query stays live (the fpstore/ivf contract)
    val mem = MemoryStream[(Long, Long, String)]
    val sink = Pack.shardAppender(spark, dir, "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, streamTag = "t")
    val query = mem.toDF().toDF("doc_id", "n_toks", "text")
      .writeStream.foreachBatch(sink).start()
    def epoch(ids: Range): Unit = {
      mem.addData(ids.map { i =>
        (i.toLong, 1L + Math.floorMod(i * 2654435761L, 97L), s"payload-$i")
      }: _*)
      query.processAllAvailable()
    }
    try {
      epoch(100 until 140)
      assert(Pack.shardFileCount(spark, dir) > filesAfterBulk,
        "epoch append should add files")
      Pack.compactShards(spark, dir)
      val shards = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).length
      assert(Pack.shardFileCount(spark, dir) == shards,
        "compaction should leave exactly one file per shard")
      epoch(140 until 170)
      epoch(170 until 200)
      Pack.compactShards(spark, dir)
    } finally query.stop()
    // the store equals ONE sequential pack over the full concatenation:
    // bulk docs then epoch docs in arrival order
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("bin_id"), col("bin_offset"),
        col("shard").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(back.size == 200, s"expected 200 docs, got ${back.size}")
    var cum = 0L
    (0 until 200).foreach { i =>
      val n = 1L + Math.floorMod(i * 2654435761L, 97L)
      val want = (cum / 128L, cum % 128L, cum / 128L / 4L, s"payload-$i")
      assert(back(i.toLong) == want, s"doc $i: got ${back(i.toLong)}, want $want")
      cum += n
    }
    // replayed epoch is a no-op (marker protocol): re-run epoch 2's data
    // through a FRESH sink with the same tag and epoch ids via a restarted
    // stream — the store must not change
    val sink2 = Pack.shardAppender(spark, dir, "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, streamTag = "t")
    val mem2 = MemoryStream[(Long, Long, String)]
    val q2 = mem2.toDF().toDF("doc_id", "n_toks", "text")
      .writeStream.foreachBatch(sink2).start()
    try {
      // epoch ids restart at 0 for the new query; 0..2 all have markers
      mem2.addData((100L, 5L, "dup"), (101L, 5L, "dup"))
      q2.processAllAvailable()
      mem2.addData((140L, 5L, "dup"))
      q2.processAllAvailable()
      mem2.addData((170L, 5L, "dup"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(dir).count() == 200,
      "replayed epochs with markers must append nothing")
    // crash-heal: simulate a compact that died after moving shards aside
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val prev = new org.apache.hadoop.fs.Path(s"$dir/.shards_precompact")
    fs.mkdirs(prev)
    val firstShard = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted.head
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/$firstShard"),
      new org.apache.hadoop.fs.Path(prev, firstShard)))
    Pack.compactShards(spark, dir) // heals, then compacts
    assert(spark.read.parquet(dir).count() == 200,
      "crash-healed compact must restore the aside shard")
  }

  test("shuffleOrderWithin scopes the permutation per group: dense positions " +
    "inside each (group, shard), and the ungrouped form is the empty-within case") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, i % 3)).toDF("doc_id", "grp")
    val out = Pack.shuffleOrderWithin(df, "doc_id", nShards = 4, seed = 7L,
      within = Seq("grp")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._2).distinct.length == 300)
    out.groupBy(t => (t._1, t._3)).foreach { case ((g, sh), rows) =>
      val pos = rows.map(_._4).sorted.toSeq
      assert(pos == (1L to rows.length.toLong),
        s"group $g shard $sh positions not dense: $pos")
    }
    // same doc, same draw → same shard regardless of grouping; and the
    // plain shuffleOrder is exactly within=Nil
    val plain = Pack.shuffleOrder(df.select("doc_id"), "doc_id", 4, 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (_, id, sh, _) => assert(plain(id) == sh) }
  }
}

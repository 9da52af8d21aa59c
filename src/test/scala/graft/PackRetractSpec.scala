package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pack

/** Takedown for the packed training-shard export ([[Pack.retractDocs]]):
  * the post-retract store must be byte-identical to a from-scratch export
  * without the docs — bins, offsets, shard assignment, payload — the
  * untouched prefix shards must really be untouched (no rewrite), appends
  * must continue from the shrunken stream end exactly as on the
  * from-scratch store, and every crash window must heal. */
class PackRetractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def lens(ids: Seq[Long]): Seq[(Long, Long, String)] =
    ids.map(i => (i, 1L + Math.floorMod(i * 2654435761L, 97L), s"payload-$i"))

  private def docsDf(ids: Seq[Long]): DataFrame =
    lens(ids).toDF("doc_id", "n_toks", "text").repartition(7)

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Full store content keyed for comparison (shard read back as long). */
  private def content(dir: String): DataFrame =
    spark.read.parquet(dir).select(col("doc_id"), col("bin_id"),
      col("bin_offset"), col("shard").cast("long").as("shard"), col("text"))

  private def assertSameStore(a: String, b: String, hint: String): Unit = {
    val (ca, cb) = (content(a), content(b))
    assert(ca.exceptAll(cb).isEmpty && cb.exceptAll(ca).isEmpty,
      s"$hint: stores differ")
  }

  private def shardFiles(dir: String, shard: Long): Set[String] = {
    val p = new Path(s"$dir/shard=$shard")
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName).toSet
  }

  test("retract equals a from-scratch export without the docs; prefix " +
    "shards are not rewritten; trailing emptied shards disappear") {
    val all = (0L until 400L)
    val gone = Set(210L, 275L, 276L, 399L) // mid + adjacent + the very last
    val dirA = tmp("retractA"); val dirB = tmp("retractB")
    Pack.writeShards(docsDf(all), "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, dirA)
    Pack.writeShards(docsDf(all.filterNot(gone)), "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, dirB)
    // the first affected shard: everything strictly before it stays put
    val s0 = spark.read.parquet(dirA)
      .where(col("doc_id").isin(gone.toSeq: _*))
      .agg(min(col("shard").cast("long"))).head().getLong(0)
    val prefixBefore =
      (0L until s0).map(k => k -> shardFiles(dirA, k)).toMap
    val maxShardBefore = spark.read.parquet(dirA)
      .agg(max(col("shard").cast("long"))).head().getLong(0)
    Pack.retractDocs(spark, dirA, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, gone.toSeq)
    assertSameStore(dirA, dirB, "retract vs from-scratch")
    (0L until s0).foreach { k =>
      assert(shardFiles(dirA, k) == prefixBefore(k),
        s"prefix shard $k was rewritten — the blast radius must be the suffix")
    }
    // the stream shrank: stores agree on max shard, and any dirA shard dir
    // beyond it is gone (empty placeholders swept)
    val maxShardAfter = spark.read.parquet(dirA)
      .agg(max(col("shard").cast("long"))).head().getLong(0)
    ((maxShardAfter + 1) to maxShardBefore).foreach { k =>
      assert(!fs.exists(new Path(s"$dirA/shard=$k")),
        s"emptied trailing shard dir shard=$k must be swept")
    }
    // effective stream end matches the from-scratch store's
    assert(Pack.storedTokenTotal(spark, dirA) ==
      Pack.storedTokenTotal(spark, dirB))
    // no protocol residue
    Seq(".retract_stage", "_retract_pending").foreach { n =>
      assert(!fs.exists(new Path(s"$dirA/$n")), n)
    }
  }

  test("appends after a retract continue exactly like the from-scratch " +
    "store; repack follows stream order, not id order; retracts compose") {
    val bulk = (1000L until 1200L)
    val gone1 = Seq(1100L, 1150L)
    val dirA = tmp("retrAppA"); val dirB = tmp("retrAppB")
    Pack.writeShards(docsDf(bulk), "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, dirA)
    Pack.retractDocs(spark, dirA, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, gone1)
    Pack.writeShards(docsDf(bulk.filterNot(gone1.contains)), "doc_id",
      "n_toks", budget = 128L, binsPerShard = 4L, dirB)
    // appended ids are SMALLER than bulk ids: if the repack (or the append)
    // ordered by doc_id instead of the stream, these would interleave wrong
    val epoch1 = docsDf(5L until 45L).coalesce(2)
    val appA = Pack.shardAppender(spark, dirA, "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, streamTag = "t")
    val appB = Pack.shardAppender(spark, dirB, "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, streamTag = "t")
    appA(epoch1, 0L); appB(epoch1, 0L)
    assertSameStore(dirA, dirB, "append after retract")
    // second retract: one bulk survivor + one APPENDED doc — the suffix now
    // spans the epoch boundary, so only stream-order repack can be right
    val gone2 = Seq(1190L, 20L)
    Pack.retractDocs(spark, dirA, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, gone2)
    val dirC = tmp("retrAppC")
    Pack.writeShards(docsDf(bulk.filterNot(i =>
        gone1.contains(i) || gone2.contains(i))),
      "doc_id", "n_toks", budget = 128L, binsPerShard = 4L, dirC)
    val appC = Pack.shardAppender(spark, dirC, "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, streamTag = "t")
    appC(docsDf((5L until 45L).filterNot(gone2.contains)).coalesce(2), 0L)
    assertSameStore(dirA, dirC, "composed retracts across the epoch boundary")
    // and the stream keeps continuing: one more identical epoch each
    val epoch2 = docsDf(300L until 320L).coalesce(2)
    val appA2 = Pack.shardAppender(spark, dirA, "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, streamTag = "t")
    appA2(epoch2, 1L); appC(epoch2, 1L)
    assertSameStore(dirA, dirC, "append after composed retracts")
  }

  test("retracting everything leaves an empty readable store that a fresh " +
    "append restarts from zero") {
    val dir = tmp("retrAll"); val ref = tmp("retrAllRef")
    Pack.writeShards(docsDf(0L until 60L), "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, dir)
    Pack.retractDocs(spark, dir, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, (0L until 60L).toSeq)
    assert(Pack.shardDirCount(spark, dir) == 0, "all shard dirs swept")
    assert(Pack.storedTokenTotal(spark, dir) == 0L)
    val app = Pack.shardAppender(spark, dir, "doc_id", "n_toks",
      budget = 128L, binsPerShard = 4L, streamTag = "t")
    app(docsDf(70L until 90L).coalesce(2), 0L)
    Pack.writeShards(docsDf(70L until 90L), "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, ref)
    assertSameStore(dir, ref, "append restarts the stream at zero")
  }

  test("crash windows: a pre-marker orphan stage is discarded and the " +
    "retract re-runs whole; a committed retract finishes from the appender " +
    "mount, compactShards, and retractDocs entry points") {
    val gone = Seq(150L)
    def freshStore(): String = {
      val d = tmp("retrCrash")
      Pack.writeShards(docsDf(0L until 200L), "doc_id", "n_toks",
        budget = 128L, binsPerShard = 4L, d)
      d
    }
    val want = freshStore() // completed-retract reference
    Pack.retractDocs(spark, want, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, gone)

    // (a) pre-marker crash: junk staging, no marker → entry heal discards it
    val a = freshStore()
    Seq((999L, 1L, "junk", 0L, 0L))
      .toDF("doc_id", "n_toks", "text", "bin_id", "bin_offset")
      .write.parquet(s"$a/.retract_stage/shard=0")
    Pack.retractDocs(spark, a, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, gone)
    assertSameStore(a, want, "pre-marker orphan")

    // (b) post-marker crash before ANY swap: stage + marker present. Build
    // the exact committed state by hand with the same staged content a real
    // retract writes, then heal through each entry point.
    def committedCrashState(): String = {
      val d = freshStore()
      val store = spark.read.parquet(d)
      val s0 = store.where(col("doc_id").isin(gone: _*))
        .agg(min(col("shard").cast("long"))).head().getLong(0)
      val pfx = store.where(col("shard") === s0)
        .agg(min(col("bin_id") * 128L + col("bin_offset"))).head().getLong(0)
      val sfx = store.where(col("shard") >= s0 && !col("doc_id").isin(gone: _*))
        .withColumn("sp", col("bin_id") * 128L + col("bin_offset"))
        .select("doc_id", "n_toks", "text", "sp")
      val packed = Pack.packByBudget(sfx, "sp", "n_toks", budget = 128L,
          startTok = pfx)
        .select(col("sp"), col("bin_id"), col("bin_offset"))
        .join(sfx, Seq("sp")).drop("sp")
        .withColumn("shard", expr("bin_id DIV 4"))
      packed.write.partitionBy("shard").parquet(s"$d/.retract_stage.tmpbuild")
      // move staged shards under .retract_stage, add meta + placeholders
      fs.mkdirs(new Path(s"$d/.retract_stage"))
      val staged = fs.listStatus(new Path(s"$d/.retract_stage.tmpbuild"))
        .map(_.getPath).filter(_.getName.startsWith("shard="))
      staged.foreach(p => fs.rename(p,
        new Path(s"$d/.retract_stage/${p.getName}")))
      fs.delete(new Path(s"$d/.retract_stage.tmpbuild"), true)
      val oldSuffix = fs.listStatus(new Path(d)).map(_.getPath.getName)
        .filter(_.startsWith("shard="))
        .map(_.stripPrefix("shard=").toLong).filter(_ >= s0).toSet
      val stagedIds = staged.map(_.getName.stripPrefix("shard=").toLong).toSet
      (oldSuffix -- stagedIds).foreach(k =>
        fs.mkdirs(new Path(s"$d/.retract_stage/shard=$k")))
      val sfxToks = sfx.agg(sum("n_toks")).head().getLong(0)
      val raw = lens((0L until 200L)).map(_._2).sum
      fs.mkdirs(new Path(s"$d/.retract_stage/_retract_meta"))
      val o = fs.create(new Path(s"$d/.retract_stage/_retract_meta/delta"), true)
      o.write((raw - (pfx + sfxToks)).toString.getBytes("UTF-8")); o.close()
      val subs = ((stagedIds | oldSuffix).toSeq.sorted.map(k => s"shard=$k")
        :+ "_retract_meta").mkString(",")
      val m = fs.create(new Path(s"$d/_retract_pending"), true)
      m.write(subs.getBytes("UTF-8")); m.close()
      d
    }
    // heal via appender mount
    val b1 = committedCrashState()
    Pack.shardAppender(spark, b1, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, streamTag = "t")
    assertSameStore(b1, want, "committed retract healed by appender mount")
    assert(Pack.storedTokenTotal(spark, b1) ==
      Pack.storedTokenTotal(spark, want), "delta swapped in with the shards")
    // heal via compactShards (then equality modulo compaction = row equality)
    val b2 = committedCrashState()
    Pack.compactShards(spark, b2)
    assertSameStore(b2, want, "committed retract healed by compactShards")
    // heal via a follow-up retract of something else
    val b3 = committedCrashState()
    Pack.retractDocs(spark, b3, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, Seq(199L))
    val want2 = freshStore()
    Pack.retractDocs(spark, want2, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, gone ++ Seq(199L))
    assertSameStore(b3, want2, "committed retract healed by next retract")
    Seq(b1, b2, b3).foreach { d =>
      Seq(".retract_stage", "_retract_pending").foreach { n =>
        assert(!fs.exists(new Path(s"$d/$n")), s"$n residue in $d")
      }
    }
  }

  test("params token: a mismatched budget fails loudly before any rewrite") {
    val dir = tmp("retrParams")
    Pack.writeShards(docsDf(0L until 50L), "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, dir)
    val e = intercept[IllegalArgumentException] {
      Pack.retractDocs(spark, dir, "doc_id", "n_toks", budget = 256L,
        binsPerShard = 4L, Seq(10L))
    }
    assert(e.getMessage.contains("packing geometry"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Pack.shardAppender(spark, dir, "doc_id", "n_toks", budget = 128L,
        binsPerShard = 8L, streamTag = "t")
    }
    assert(e2.getMessage.contains("packing geometry"), e2.getMessage)
    // ids not in the store: clean no-op
    Pack.retractDocs(spark, dir, "doc_id", "n_toks", budget = 128L,
      binsPerShard = 4L, Seq(99999L))
    assert(content(dir).count() == 50)
  }
}

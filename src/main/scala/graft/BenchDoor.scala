package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Dsir, FingerprintStore, SignatureStore}
import graft.streaming.{FrontDoor, IngestGate, ShardedDoor}

/** Measures the COMPOSED four-layer front door ([[FrontDoor.sink]]) — the
  * empirical half of the two claims its scaladoc makes structurally:
  *
  *  1. REJECTION-COST ORDER: each layer only pays for what the cheaper
  *     layers admitted. Measured by mounting four chain depths (gate only,
  *     gate→fp, gate→fp→sig, full door) over identically seeded stores and
  *     driving the SAME mixed trigger batches through each: the per-trigger
  *     wall must grow by the marginal probe cost of the added layer, and
  *     the admitted counts must step 80 → 60 → 40 → 20 (20 kills per layer
  *     by construction — that step IS the per-layer kill count).
  *  2. STORE-AGE FLATNESS: the full door's steady-state trigger against a
  *     ~10× larger store set (all copies vs copy-0 of the scale dir) must
  *     cost about the same, because every layer's probe is pruned (Bloom +
  *     fp shards / band buckets / nprobe list partitions — BENCH_screen and
  *     BENCH_semscreen measure the layers alone; this artifact measures
  *     their composition, including the gate's scoring and the epoch
  *     bookkeeping between them).
  *
  * Trigger batch (100 docs, fresh ids/texts/vectors per trigger so stores
  * grow exactly as a live door's would): 20 too-short pages (gate kill),
  * 20 byte-identical copies of stored docs (fp kill), 20 one-token
  * re-crawls of stored docs (sig kill), 20 paraphrases — fresh text, a
  * stored vector nudged to cos ≈ 1 (semantic kill) — and 20 genuinely
  * novel pages (admitted; they enter the stores, as on a real door).
  * Per-config times are min-of-`Reps` steady-state triggers after one
  * untimed warm trigger (mount heals, Bloom load, codegen).
  *
  * Emits ONE JSON line to `SPARK_GRAFT_BENCH_OUT` (default
  * BENCH_door.json). Run against a [[ScaleCorpus]]-scaled dir. */
/** Deterministic admit-only batch shapes shared by [[BenchDoor]]'s parent
  * process and its per-shard child drivers ([[BenchDoorOneShard]]) — both
  * sides MUST generate bit-identical batches or the process-isolated
  * sharded run would admit different documents than the single door. */
private[graft] object DoorBenchData {
  def novelVec(dim: Int, t: Int, i: Int): Seq[Double] =
    (0 until dim).map { j =>
      val h = scala.util.hashing.MurmurHash3.productHash((t, i, j))
      math.floorMod(h, 2000) / 1000.0 - 1.0
    }
  /** 24 doc-unique words, LENGTH-FLAT across any (t, i) range: a decimal
    * `t`/`i` splice makes words grow with the index and large batches trip
    * the gate's mean-word-length quality bound — a kill that has nothing
    * to do with what this bench measures. */
  def freshText(cls: String, t: Int, i: Int): String = {
    val h = java.lang.Long.toHexString(t.toLong * 1000000L + i)
    (0 until 24).map(j => s"$cls${h}w$j").mkString(" ")
  }
  def novelBatch(spark: SparkSession, t: Int, n: Int,
                 dim: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i =>
      (860000000L + t * 10000L + i, freshText("q", t, i),
        novelVec(dim, t + 50, i)))
      .toDF("doc_id", "text", "embedding").localCheckpoint()
  }
}

object BenchDoor {
  private val Reps = 5
  private val PerClass = 20

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/bench-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val smallDocs = docs.filter(col("doc_id") < ScaleCorpus.Offset)
      .localCheckpoint()
    val allDocs = docs.localCheckpoint()
    val smallEmb = emb.filter(col("vec_id") < ScaleCorpus.Offset)
      .localCheckpoint()
    val allEmb = emb.localCheckpoint()

    // Permissive-affinity gate: the reject class is engineered to fail the
    // quality gate (1 token < minTokens, and no scorable bigram), so the
    // admission split is deterministic while affinity scoring still runs
    // at its real cost on every doc.
    val stats = Dsir.bucketStats(
      smallDocs.withColumn("is_target", pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text", col("is_target"))
    val gate = new IngestGate(stats, minAffinity = -1e18)

    // 20 stored, gate-passing copy-0 docs WITH stored vectors — present in
    // both store scales; the seeds for the exact/re-crawl/paraphrase classes
    val seeds = gate.gate(
        smallDocs.join(smallEmb, smallDocs("doc_id") === smallEmb("vec_id"))
          .select(smallDocs("doc_id"), col("text"), col("embedding")),
        "doc_id", "text")
      .filter(col("admitted")).orderBy("doc_id").limit(PerClass)
      .select("doc_id", "text", "embedding").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Double](2)))
    require(seeds.length == PerClass,
      s"need $PerClass gate-passing seeded docs with vectors")
    val dim = seeds(0)._3.length

    // component-wise INDEPENDENT hash values — an arithmetic progression
    // mod 2000 would make every "novel" vector a shifted sawtooth of the
    // others (pairwise cos ≈ 1) and the semantic layer would kill them
    def novelVec(t: Int, i: Int): Seq[Double] =
      (0 until dim).map { j =>
        val h = scala.util.hashing.MurmurHash3.productHash((t, i, j))
        math.floorMod(h, 2000) / 1000.0 - 1.0
      }
    def nudged(v: Seq[Double]): Seq[Double] =
      v.zipWithIndex.map { case (x, i) => if (i == 0) x + 1e-3 else x }
    def freshText(cls: String, t: Int, i: Int): String =
      (0 until 24).map(j => s"$cls${t}x${i}w$j").mkString(" ")

    def mkBatch(t: Int): DataFrame = {
      val rows =
        (0 until PerClass).map(i =>
          (800000000L + t * 1000L + i, "x", novelVec(t, 900 + i))) ++
        seeds.zipWithIndex.map { case ((_, tx, v), i) =>
          (810000000L + t * 1000L + i, tx, nudged(v)) } ++
        seeds.zipWithIndex.map { case ((_, tx, v), i) =>
          (820000000L + t * 1000L + i, tx + s" zz${t}tail", nudged(v)) } ++
        seeds.zipWithIndex.map { case ((_, _, v), i) =>
          (830000000L + t * 1000L + i, freshText("p", t, i), nudged(v)) } ++
        (0 until PerClass).map(i =>
          (840000000L + t * 1000L + i, freshText("n", t, i), novelVec(t, i)))
      rows.toDF("doc_id", "text", "embedding").localCheckpoint()
    }
    val batches = (0 to Reps).map(mkBatch) // batches(0) = untimed warm

    def tmpDir(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString

    val expected = Map("gate" -> 80L, "gate_fp" -> 60L,
      "gate_fp_sig" -> 40L, "full" -> 20L)

    def runCfg(cfg: String, dc: DataFrame, ec: DataFrame,
               scaleTag: String, nlist: Int = 64): Double = {
      val run = java.util.UUID.randomUUID().toString.take(8)
      val acc = new AtomicLong(0L)
      val quar = new AtomicLong(0L)
      val cur = new AtomicLong(-1L)
      def count(df: DataFrame): Unit = { acc.addAndGet(df.count()); () }
      def qcount(df: DataFrame): Unit = { quar.addAndGet(df.count()); () }
      def seedFp(): String = {
        val d = tmpDir("bd_fp"); FingerprintStore.seed(dc, "text", d); d
      }
      def seedSig(): String = {
        val d = tmpDir("bd_sig"); SignatureStore.seed(dc, "doc_id", "text", d)
        d
      }
      val sink: (DataFrame, Long) => Unit = cfg match {
        case "gate" =>
          gate.sinkEpoch("doc_id", "text")(
            (df, _) => count(df))((df, _) => qcount(df))
        case "gate_fp" =>
          val fp = FingerprintStore.dedupSink(spark, seedFp(),
            "doc_id", "text", streamTag = "bd")(count)
          gate.sinkEpoch("doc_id", "text")(
            { (df, e) => cur.set(e); fp(df, e) })((df, _) => qcount(df))
        case "gate_fp_sig" =>
          val sig = SignatureStore.screenSink(spark, seedSig(),
            "doc_id", "text", 0.45, streamTag = "bd")(count)
          val fp = FingerprintStore.dedupSink(spark, seedFp(),
            "doc_id", "text", streamTag = "bd") { df => sig(df, cur.get()) }
          gate.sinkEpoch("doc_id", "text")(
            { (df, e) => cur.set(e); fp(df, e) })((df, _) => qcount(df))
        case "full" =>
          val ivfDir = AnnIndex.ivfIndexDir(ec, s"$sfDir/embeddings.parquet",
            "vec_id", "embedding", nlist = nlist, iters = 3, seed = 42L,
            variant = s"door_${scaleTag}_$run")
          FrontDoor.sink(spark, gate, seedFp(), seedSig(), ivfDir,
            "doc_id", "text", "embedding", sigThreshold = 0.45,
            semThreshold = 0.99, nprobe = 4, streamTag = "bd")(
            count)(qcount)
      }
      sink(batches(0), 0L) // warm: mount heals, Bloom load, codegen
      require(acc.get() == expected(cfg) && quar.get() == PerClass,
        s"$cfg/$scaleTag warm: admitted ${acc.get()} (want ${expected(cfg)})" +
          s", quarantined ${quar.get()} (want $PerClass)")
      (1 to Reps).map { e =>
        acc.set(0L); quar.set(0L)
        val t0 = System.nanoTime()
        sink(batches(e), e.toLong)
        val dt = (System.nanoTime() - t0) / 1e9
        require(acc.get() == expected(cfg) && quar.get() == PerClass,
          s"$cfg/$scaleTag trigger $e: admitted ${acc.get()} " +
            s"(want ${expected(cfg)}), quarantined ${quar.get()}")
        dt
      }.min
    }

    def scale(tag: String, dc: DataFrame, ec: DataFrame): (String, Double) = {
      val t = Seq("gate", "gate_fp", "gate_fp_sig", "full")
        .map(c => c -> runCfg(c, dc, ec, tag)).toMap
      val json =
        f""""${tag}_store":{"gate":${t("gate")}%.4f,""" +
        f""""gate_fp":${t("gate_fp")}%.4f,""" +
        f""""gate_fp_sig":${t("gate_fp_sig")}%.4f,""" +
        f""""full":${t("full")}%.4f,""" +
        f""""marginal_fp":${t("gate_fp") - t("gate")}%.4f,""" +
        f""""marginal_sig":${t("gate_fp_sig") - t("gate_fp")}%.4f,""" +
        f""""marginal_sem":${t("full") - t("gate_fp_sig")}%.4f}"""
      (json, t("full"))
    }

    // ---------- sustained throughput + k-shard scaling (r16 verdict #2/#7)
    // N back-to-back ADMIT-ONLY triggers with the stores growing across
    // them — the docs/sec an operator sizes ingest with (the main section
    // measures marginal per-layer cost; this measures the serial trigger
    // pipeline, which is what sharding multiplies). The sharded door gets
    // the SAME batches and the SAME seeded store content split k ways; its
    // k sinks run concurrently, one thread each, as k real streams would.
    val SustTriggers = 10
    val SustDocs = 400
    val sustBatches = (0 to SustTriggers)
      .map(t => DoorBenchData.novelBatch(spark, t, SustDocs, dim))
    def timeOf(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val sustRun = java.util.UUID.randomUUID().toString.take(8)
    val acc1 = new AtomicLong(0L)
    val singleDoor = {
      val fpD = tmpDir("bd_sust_fp"); FingerprintStore.seed(smallDocs, "text", fpD)
      val sigD = tmpDir("bd_sust_sig")
      SignatureStore.seed(smallDocs, "doc_id", "text", sigD)
      val ivfD = AnnIndex.ivfIndexDir(smallEmb, s"$sfDir/embeddings.parquet",
        "vec_id", "embedding", nlist = 64, iters = 3, seed = 42L,
        variant = s"door_sust_$sustRun")
      FrontDoor.sink(spark, gate, fpD, sigD, ivfD, "doc_id", "text",
        "embedding", sigThreshold = 0.45, semThreshold = 0.99, nprobe = 4,
        streamTag = "bds")(df => { acc1.addAndGet(df.count()); () })(_ => ())
    }
    singleDoor(sustBatches(0), 0L) // warm
    val singleSec = (1 to SustTriggers).map(t =>
      timeOf(singleDoor(sustBatches(t), t.toLong)))
    require(acc1.get() == (SustTriggers + 1).toLong * SustDocs,
      s"sustained single door admitted ${acc1.get()}")
    // the same door at 4x the trigger size — per-trigger cost is dominated
    // by the chain's FIXED per-layer latency (many small sequential jobs),
    // so bigger batches amortize it: the first throughput lever, measured
    // so the sharded row below is read against it honestly
    val acc4 = new AtomicLong(0L)
    val singleDoor4 = {
      val fpD = tmpDir("bd_sust4_fp")
      FingerprintStore.seed(smallDocs, "text", fpD)
      val sigD = tmpDir("bd_sust4_sig")
      SignatureStore.seed(smallDocs, "doc_id", "text", sigD)
      val ivfD = AnnIndex.ivfIndexDir(smallEmb, s"$sfDir/embeddings.parquet",
        "vec_id", "embedding", nlist = 64, iters = 3, seed = 42L,
        variant = s"door_sust4_$sustRun")
      FrontDoor.sink(spark, gate, fpD, sigD, ivfD, "doc_id", "text",
        "embedding", sigThreshold = 0.45, semThreshold = 0.99, nprobe = 4,
        streamTag = "bds4")(df => { acc4.addAndGet(df.count()); () })(_ => ())
    }
    val SustK = 4
    val sustBatches4 = (0 to SustTriggers)
      .map(t => DoorBenchData.novelBatch(spark, t, SustDocs * SustK, dim))
    singleDoor4(sustBatches4(0), 0L) // warm
    val singleSec4 = (1 to SustTriggers).map(t =>
      timeOf(singleDoor4(sustBatches4(t), t.toLong)))
    require(acc4.get() == (SustTriggers + 1).toLong * SustDocs * SustK,
      s"sustained 4x single door admitted ${acc4.get()}")

    val K = 4
    val shardRoot = tmpDir("bd_shard")
    val sharded = ShardedDoor.create(spark, shardRoot, K, smallEmb,
      "vec_id", "embedding", nlist = 32, iters = 3, seed = 42L)
    (0 until K).foreach { i =>
      val slice = smallDocs
        .filter(ShardedDoor.shardOf(col("doc_id"), K) === i)
      FingerprintStore.seed(slice, "text", sharded.fpDir(i))
      SignatureStore.seed(slice, "doc_id", "text", sharded.sigDir(i))
    }
    val accK = new AtomicLong(0L)
    val shardSinks = (0 until K).map(i =>
      sharded.shardSink(i, gate, "doc_id", "text", "embedding",
        sigThreshold = 0.45, semThreshold = 0.99, nprobe = 4,
        streamTag = "bds")(df => { accK.addAndGet(df.count()); () })(_ => ()))
    def shardRound(t: Int): Unit = {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until K).map { i =>
        val th = new Thread(() =>
          try shardSinks(i)(sustBatches(t), t.toLong)
          catch { case e: Throwable => errs.add(e) })
        th.start(); th
      }
      threads.foreach(_.join())
      if (!errs.isEmpty) throw errs.peek()
    }
    shardRound(0) // warm
    val shardedSec = (1 to SustTriggers).map(t => timeOf(shardRound(t)))
    require(accK.get() == (SustTriggers + 1).toLong * SustDocs,
      s"sustained sharded door admitted ${accK.get()}")

    // ---- process-isolated sharded door: ONE DRIVER PER SHARD ----
    // The in-JVM row above shares a single DAGScheduler event loop across
    // all k sinks, so concurrent triggers serialize their scheduling —
    // which is precisely why the deployment shape is one stream = one
    // driver. Each shard here runs in its OWN JVM at local[cpus/k] (same
    // total worker threads as the single door's local[cpus]); layout,
    // gate, and batches are shared and deterministic (DoorBenchData).
    val procRoot = tmpDir("bd_shardp")
    val doorP = ShardedDoor.create(spark, procRoot, K, smallEmb, "vec_id",
      "embedding", nlist = 32, iters = 3, seed = 42L)
    (0 until K).foreach { i =>
      val slice = smallDocs
        .filter(ShardedDoor.shardOf(col("doc_id"), K) === i)
      FingerprintStore.seed(slice, "text", doorP.fpDir(i))
      SignatureStore.seed(slice, "doc_id", "text", doorP.sigDir(i))
    }
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val moduleFlags = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val classesDir = new java.io.File(getClass.getProtectionDomain
      .getCodeSource.getLocation.toURI).getPath
    // explicit jar list, not a `*` wildcard: wildcard expansion is the
    // JVM's, and a mis-derived dir fails silently as ClassNotFound in the
    // child — enumerate and require the scala runtime is actually there
    val sparkJarsDir = Seq(
      Option(classOf[SparkSession].getProtectionDomain.getCodeSource)
        .map(cs => new java.io.File(cs.getLocation.toURI).getParent)
        .getOrElse(""),
      "/opt/spark/jars")
      .find { d =>
        val f = new java.io.File(d)
        f.isDirectory && f.listFiles().exists(
          _.getName.startsWith("scala-library"))
      }
      .getOrElse(sys.error("cannot locate the Spark jars directory"))
    val sparkJars = new java.io.File(sparkJarsDir).listFiles()
      .filter(_.getName.endsWith(".jar")).map(_.getPath).sorted
    val childCp = (classesDir +: sparkJars).mkString(":")
    System.err.println(s"[BenchDoor] child classpath: $classesDir + " +
      s"${sparkJars.length} jars from $sparkJarsDir")
    val outFiles = (0 until K).map(i => s"$procRoot/child_$i.txt")
    import scala.jdk.CollectionConverters._
    val procs = (0 until K).map { i =>
      // each child consumes its shard's slice of a K-times-larger firehose
      // (the deployment shape: k streams, each at the single door's trigger
      // size) — NOT the single door's batch split k ways, which only
      // re-measures the fixed per-trigger latency at a quarter the data
      val cmd = Seq(javaBin) ++ moduleFlags ++ Seq("-Xmx12g", "-cp",
        childCp, "graft.BenchDoorOneShard", procRoot, sfDir, i.toString,
        K.toString, (cpus.toInt / K).toString, SustTriggers.toString,
        (SustDocs * K).toString, dim.toString, outFiles(i))
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(s"$procRoot/child_$i.log"))
      pb.start()
    }
    procs.zipWithIndex.foreach { case (p, i) =>
      require(p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES) &&
        p.exitValue() == 0,
        s"shard child $i failed — see $procRoot/child_$i.log")
    }
    case class Child(admitted: Long, startMs: Long, endMs: Long,
                     totalSec: Double)
    val children = outFiles.map { f =>
      val kv = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), "UTF-8").trim.split(" ")
        .map(_.split("=", 2)).collect { case Array(a, b) => a -> b }.toMap
      Child(kv("admitted").toLong, kv("start_ms").toLong,
        kv("end_ms").toLong, kv("total_sec").toDouble)
    }
    require(children.map(_.admitted).sum ==
      (SustTriggers + 1).toLong * SustDocs * K,
      s"process shards admitted ${children.map(_.admitted).sum}")
    // wall of the CONCURRENT timed segments (children warm before timing,
    // so JVM/session startup is outside the window)
    val procWall = (children.map(_.endMs).max -
      children.map(_.startMs).min) / 1000.0

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val sustainedJson =
      f""""sustained":{"triggers":$SustTriggers,""" +
      f""""docs_per_trigger":$SustDocs,""" +
      s""""single_sec":[${singleSec.map(v => f"$v%.3f").mkString(",")}],""" +
      f""""single_docs_per_sec_first":${SustDocs / singleSec.head}%.1f,""" +
      f""""single_docs_per_sec_last":${SustDocs / singleSec.last}%.1f,""" +
      f""""sharded_k":$K,""" +
      s""""sharded_sec":[${shardedSec.map(v => f"$v%.3f").mkString(",")}],""" +
      f""""sharded_docs_per_sec_first":${SustDocs / shardedSec.head}%.1f,""" +
      f""""sharded_docs_per_sec_last":${SustDocs / shardedSec.last}%.1f,""" +
      f""""k4_same_jvm_speedup_median":${med(singleSec) / med(shardedSec)}%.2f,""" +
      s""""single_sec_4x_batch":[${singleSec4.map(v =>
        f"$v%.3f").mkString(",")}],""" +
      f""""single_docs_per_sec_4x_batch":${SustDocs * SustK / med(singleSec4)}%.1f,""" +
      s""""proc_child_total_sec":[${children.map(c =>
        f"${c.totalSec}%.3f").mkString(",")}],""" +
      f""""proc_wall_sec":$procWall%.3f,""" +
      f""""proc_docs_per_sec":${SustTriggers.toLong * SustDocs * K / procWall}%.1f,""" +
      f""""single_docs_per_sec":${SustDocs / med(singleSec)}%.1f,""" +
      f""""k4_process_throughput_vs_single":${
        (SustTriggers.toLong * SustDocs * K / procWall) /
          (SustDocs / med(singleSec))}%.2f}"""

    val smallRows = smallDocs.count()
    val (jsonS, fullS) = scale("small", smallDocs, smallEmb)
    val (jsonL, fullL) = scale("large", allDocs, allEmb)
    // the documented IVF sizing rule IN ACTION: at 10× the store, nlist
    // grows ~sqrt(10)× so each probed list stays batch-footprint-sized —
    // the knob BENCH_semscreen's header names, validated composed
    val fullScaled = runCfg("full", allDocs, allEmb, "large_nl202",
      nlist = 202)
    val json =
      f"""{"metric":"door_trigger_cost","unit":"sec","sf":"$sfDir",""" +
      f""""batch_docs":${5 * PerClass},""" +
      f""""mix":{"gate_kill":$PerClass,"fp_kill":$PerClass,""" +
      f""""sig_kill":$PerClass,"sem_kill":$PerClass,"admit":$PerClass},""" +
      f""""small_store_docs":$smallRows,""" +
      f""""large_store_docs":${allDocs.count()},""" +
      jsonS + "," + jsonL + "," + sustainedJson + "," +
      f""""large_store_full_nlist202":$fullScaled%.4f,""" +
      f""""composed_probe_ratio":${fullL / fullS}%.3f,""" +
      f""""composed_probe_ratio_nlist_scaled":${fullScaled / fullS}%.3f}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_door.json"))
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}

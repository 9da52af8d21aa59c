package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dsir
import graft.streaming.{IngestGate, ShardedDoor}

/** ONE shard's door stream as its own JVM/driver — the child process of
  * [[BenchDoor]]'s process-isolated sharded measurement. The in-JVM
  * concurrency row measures the one-driver ceiling (all k sinks share one
  * DAGScheduler event loop, so concurrent triggers serialize their
  * scheduling); the REAL deployment runs one driver per shard stream, and
  * this main is that driver: it mounts the shared layout, builds the same
  * deterministic gate and batches as the parent ([[DoorBenchData]]), warms
  * one trigger, then times the rest and writes one parsable line.
  *
  * args: rootDir sfDir shardIdx k cores triggers docsPerTrigger dim outFile */
object BenchDoorOneShard {
  def main(args: Array[String]): Unit = {
    val Array(root, sfDir, iS, kS, cores, trigS, docsS, dimS, outFile) = args
    val i = iS.toInt
    val k = kS.toInt
    val triggers = trigS.toInt
    val docsPer = docsS.toInt
    val dim = dimS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val smallDocs = docs.filter(col("doc_id") < ScaleCorpus.Offset)
      .localCheckpoint()
    val stats = Dsir.bucketStats(
      smallDocs.withColumn("is_target", pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text", col("is_target"))
    val gate = new IngestGate(stats, minAffinity = -1e18)
    val door = ShardedDoor.mount(spark, root, k)
    val acc = new AtomicLong(0L)
    val sink = door.shardSink(i, gate, "doc_id", "text", "embedding",
      sigThreshold = 0.45, semThreshold = 0.99, nprobe = 4,
      streamTag = "bdp")(df => { acc.addAndGet(df.count()); () })(_ => ())
    val batches = (0 to triggers)
      .map(t => DoorBenchData.novelBatch(spark, t, docsPer, dim))
    sink(batches(0), 0L) // warm: mount heals, Bloom load, codegen
    val startMs = System.currentTimeMillis()
    val secs = (1 to triggers).map { t =>
      val t0 = System.nanoTime()
      sink(batches(t), t.toLong)
      (System.nanoTime() - t0) / 1e9
    }
    val endMs = System.currentTimeMillis()
    val line = s"shard=$i admitted=${acc.get()} start_ms=$startMs " +
      s"end_ms=$endMs total_sec=${secs.sum} " +
      s"secs=${secs.map(s => f"$s%.3f").mkString(",")}"
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    println(line)
  }
}

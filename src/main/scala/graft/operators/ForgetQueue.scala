package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Durable takedown-request QUEUE in front of [[Forget]] — the shape a
  * 100 TB deployment actually operates: requests arrive continuously
  * (DMCA notices, GDPR erasures) while the ingest streams run, but every
  * [[Forget.forget]] walk rewrites whole stores, so running one walk PER
  * REQUEST multiplies the most expensive maintenance verb by request
  * count. The queue decouples the two rates: [[submit]] persists a
  * request batch durably and returns immediately (no store touched, no
  * writer lock), and the next maintenance window's [[drain]] coalesces
  * every pending request into ONE composed forget — N requests amortize
  * one whole-store rewrite, exactly like batched [[Takedown]].
  *
  * Layout under `queueDir`:
  *  - `queued_<reqId>/` — one parquet dir per submitted request (id,
  *    text), committed by dot-temp + rename;
  *  - `_drain_pending` — the drain marker: `<drainId>\n<reqId,...>`,
  *    atomically committed BEFORE the forget runs. It pins the EXACT
  *    participant set: submits that land after the marker wait for the
  *    next drain (a replay must re-run the same batch — [[Forget]]'s
  *    per-store tokens are keyed by the drain id, so growing the batch
  *    mid-replay would skip stores already marked done for the smaller
  *    one);
  *  - `drained/<reqId>` — per-request receipt written after the forget
  *    commits, naming the drain id — the pointer from each ORIGINAL
  *    request to the coalesced audit tombstone (`forgetDir/audit/
  *    <drainId>`), so per-request accountability survives coalescing.
  *
  * Crash discipline: drain entry always heals first. A committed drain
  * marker replays through [[Forget.forgetAs]] under the SAME drainId —
  * if the coalesced forget already committed (its audit tombstone
  * exists), the call is a no-op and only the receipts/cleanup re-run;
  * if it crashed mid-walk, the per-store tokens resume it without
  * re-subtracting (the LM receipt discipline is [[Forget]]'s, inherited
  * wholesale). Receipts are deterministic, so re-writing them on replay
  * is idempotent. Only after every receipt is down do the queued dirs
  * delete and the marker fall.
  *
  * Single-writer like every maintenance verb: one drain at a time,
  * between epochs, store streams down. [[submit]] is safe at any time —
  * it only touches the queue dir, and the marker pins which submissions
  * a drain owns. */
object ForgetQueue {

  private val MarkerName = "_drain_pending"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  private def writeAtomic(fs: FileSystem, dest: Path, content: String): Unit = {
    val tmp = new Path(dest.getParent, s".${dest.getName}.tmp")
    fs.delete(tmp, false)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    fs.delete(dest, false)
    require(fs.rename(tmp, dest), s"ForgetQueue: cannot commit $dest")
  }

  /** Persist one request batch; returns its queue id. Durable on return
    * (dot-temp + rename), touches nothing but the queue dir. */
  def submit(spark: SparkSession, queueDir: String, docs: DataFrame,
             idCol: String, textCol: String): String = {
    val fs = fsOf(spark, queueDir)
    fs.mkdirs(new Path(queueDir))
    val req = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("string").as("text")).distinct().localCheckpoint()
    // refuse empty batches loudly: an empty request would drain to a
    // receipt naming an audit tombstone [[Forget]] never writes (its
    // empty-request no-op), breaking the per-request accountability
    // chain this queue exists to keep
    require(!req.isEmpty,
      "ForgetQueue.submit: empty request batch — nothing to forget")
    val reqId = java.util.UUID.randomUUID().toString.replace("-", "")
    val tmp = new Path(s"$queueDir/.queued_$reqId.tmp")
    fs.delete(tmp, true)
    req.coalesce(1).write.parquet(tmp.toString)
    require(fs.rename(tmp, new Path(s"$queueDir/queued_$reqId")),
      s"ForgetQueue: cannot commit queued_$reqId")
    reqId
  }

  /** Queue ids awaiting a drain (excludes ones pinned by an in-flight
    * drain marker only in the sense that they will be drained by its
    * replay — this lists everything still under `queued_`). */
  def pending(spark: SparkSession, queueDir: String): Seq[String] = {
    val fs = fsOf(spark, queueDir)
    if (!fs.exists(new Path(queueDir))) return Seq.empty
    fs.listStatus(new Path(queueDir)).map(_.getPath.getName)
      .filter(_.startsWith("queued_")).map(_.stripPrefix("queued_"))
      .toSeq.sorted
  }

  /** Drain the queue: heal any crashed drain first (same participant
    * set, same drain id), then coalesce everything still queued into one
    * [[Forget.forgetAs]] walk. Returns the request ids drained by THIS
    * call (healed ones included). Single-writer maintenance. */
  def drain(spark: SparkSession, queueDir: String, forgetDir: String,
            stores: CorpusStores): Seq[String] =
    drainImpl(spark, queueDir, forgetDir, stores, None)

  private[graft] def drainImpl(spark: SparkSession, queueDir: String,
                               forgetDir: String, stores: CorpusStores,
                               crash: Option[String]): Seq[String] = {
    val fs = fsOf(spark, queueDir)
    if (!fs.exists(new Path(queueDir))) return Seq.empty
    val healed = heal(spark, queueDir, forgetDir, stores)
    val reqIds = pending(spark, queueDir)
    if (reqIds.isEmpty) return healed
    val drainId = java.util.UUID.randomUUID().toString.replace("-", "")
    writeAtomic(fs, new Path(s"$queueDir/$MarkerName"),
      s"$drainId\n${reqIds.mkString(",")}")
    runDrain(spark, queueDir, forgetDir, stores, drainId, reqIds, crash)
    healed ++ reqIds
  }

  /** Complete a crashed drain: a committed marker re-runs its exact
    * participant set under its pinned drain id. Safe (and cheap) on a
    * clean queue. Wire into the deployment's maintenance entry alongside
    * [[Forget.heal]]. */
  def heal(spark: SparkSession, queueDir: String, forgetDir: String,
           stores: CorpusStores): Seq[String] = {
    val fs = fsOf(spark, queueDir)
    val marker = new Path(s"$queueDir/$MarkerName")
    if (!fs.exists(marker)) return Seq.empty
    val lines = readText(fs, marker).split("\n", 2)
    val drainId = lines(0).trim
    val reqIds = lines(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    runDrain(spark, queueDir, forgetDir, stores, drainId, reqIds, None)
    reqIds
  }

  private def runDrain(spark: SparkSession, queueDir: String,
                       forgetDir: String, stores: CorpusStores,
                       drainId: String, reqIds: Seq[String],
                       crash: Option[String]): Unit = {
    val fs = fsOf(spark, queueDir)
    // union of the pinned batches that still exist (after a crash during
    // cleanup some are already deleted — then the forget has committed
    // and forgetAs no-ops on its audit check anyway)
    val parts = reqIds.map(r => s"$queueDir/queued_$r")
      .filter(p => fs.exists(new Path(p)))
    if (parts.nonEmpty) {
      val docs = spark.read.parquet(parts: _*)
      if (crash.isDefined)
        Forget.forgetImpl(spark, forgetDir, stores, docs, "id", "text",
          crash, Some(drainId))
      else
        Forget.forgetAs(spark, forgetDir, stores, docs, "id", "text", drainId)
    }
    // forget committed (or was empty): receipts, then cleanup, then the
    // marker falls — each step idempotent under replay
    fs.mkdirs(new Path(s"$queueDir/drained"))
    reqIds.foreach(r =>
      writeAtomic(fs, new Path(s"$queueDir/drained/$r"), drainId))
    reqIds.foreach(r =>
      fs.delete(new Path(s"$queueDir/queued_$r"), true))
    fs.delete(new Path(s"$queueDir/$MarkerName"), false)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** The durable takedown queue ([[ForgetQueue]]): submits persist without
  * touching stores, one drain coalesces N requests into ONE composed
  * forget walk, and the drain's crash windows replay to exactly-once
  * store subtraction under the pinned drain id. Uses the LM store as the
  * witness — its count subtraction is the one NON-idempotent retract, so
  * any replay defect shows up as a count drift against a from-scratch
  * seed. */
class ForgetQueueSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  // ForgetSpec's overlapping-window page design: consecutive docs share
  // bigrams, the shape a double-subtraction corrupts silently
  private def w(v: String, i: Int) = f"$v${i % 80}%02d"
  private def doc(v: String, salt: Int) =
    (0 until 24).map(i => w(v, salt + i)).mkString(" ")
  private val d1 = doc("alpha", 4)
  private val d2 = doc("alpha", 20)
  private val d3 = doc("alpha", 36)

  private def lmState(dir: String): (Map[String, Long], Map[String, Long],
      Map[String, Long]) = {
    def m(sub: String, keys: Seq[String], cnt: String): Map[String, Long] =
      spark.read.parquet(s"$dir/$sub")
        .groupBy(keys.map(col): _*).agg(sum(cnt).as("c")).collect()
        .map(r => keys.map(r.getAs[String](_)).mkString("|") ->
          r.getAs[Long]("c")).toMap
    (m("bigrams", Seq("prev", "cur"), "cb"),
      m("prefix", Seq("prev"), "cp"),
      m("vocabrc", Seq("word"), "rc"))
  }

  private def auditFiles(ledger: String): Seq[java.io.File] = {
    val d = new java.io.File(ledger, "audit")
    if (!d.exists()) Seq.empty
    else d.listFiles().filterNot(_.getName.startsWith(".")).toSeq
  }

  private def readFile(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  test("two submits coalesce into ONE forget walk: one audit tombstone, " +
      "per-request receipts point at it, queue sweeps, re-drain no-ops") {
    val lmDir = tmp("fq_lm"); val ledger = tmp("fq_ledger")
    val queue = tmp("fq_q")
    val stores = CorpusStores(lmDir = Some(lmDir))
    LmStore.seed(Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"),
      "doc_id", "text", lmDir)
    val reqA = ForgetQueue.submit(spark, queue,
      Seq((1L, d1)).toDF("doc_id", "text"), "doc_id", "text")
    val reqB = ForgetQueue.submit(spark, queue,
      Seq((2L, d2)).toDF("doc_id", "text"), "doc_id", "text")
    assert(ForgetQueue.pending(spark, queue).toSet === Set(reqA, reqB))
    // submit touched no store
    val before = lmState(lmDir)
    assert(before == lmState(lmDir))

    val drained = ForgetQueue.drain(spark, queue, ledger, stores)
    assert(drained.toSet === Set(reqA, reqB))
    // ONE coalesced walk -> ONE audit tombstone carrying both ids
    val audits = auditFiles(ledger)
    assert(audits.length === 1)
    assert(readFile(audits.head).contains("ids=1,2\n"))
    // store state == a from-scratch seed without the drained docs
    val fresh = tmp("fq_lm_fresh")
    LmStore.seed(Seq((3L, d3)).toDF("doc_id", "text"), "doc_id", "text",
      fresh)
    assert(lmState(lmDir) == lmState(fresh))
    // per-request accountability: each receipt names the drain id, which
    // IS the coalesced audit's name
    val drainId = audits.head.getName
    Seq(reqA, reqB).foreach { r =>
      val f = new java.io.File(queue, s"drained/$r")
      assert(f.exists(), s"missing receipt for $r")
      assert(readFile(f) === drainId)
    }
    // queue swept; a second drain is a no-op
    assert(ForgetQueue.pending(spark, queue).isEmpty)
    assert(ForgetQueue.drain(spark, queue, ledger, stores).isEmpty)
    assert(auditFiles(ledger).length === 1)
  }

  test("an empty request batch is refused at submit — a drain would " +
      "otherwise write a receipt naming an audit Forget never creates") {
    val queue = tmp("fqe_q")
    val ex = intercept[IllegalArgumentException] {
      ForgetQueue.submit(spark, queue,
        Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(ex.getMessage.contains("empty request"))
    assert(ForgetQueue.pending(spark, queue).isEmpty)
  }

  test("a crash inside the coalesced walk replays to exactly-once " +
      "subtraction: the drain marker pins the id, the LM receipt stops " +
      "the double-subtract") {
    val lmDir = tmp("fqc_lm"); val ledger = tmp("fqc_ledger")
    val queue = tmp("fqc_q")
    val stores = CorpusStores(lmDir = Some(lmDir))
    LmStore.seed(Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"),
      "doc_id", "text", lmDir)
    val reqA = ForgetQueue.submit(spark, queue,
      Seq((1L, d1)).toDF("doc_id", "text"), "doc_id", "text")
    // crash after the LM store's own commit, before its ledger token —
    // the window where only the receipt distinguishes done from not-done
    intercept[IllegalStateException] {
      ForgetQueue.drainImpl(spark, queue, ledger, stores,
        Some("lm:pre-done"))
    }
    // the drain marker stands and the request is still queued
    assert(new java.io.File(queue, "_drain_pending").exists())
    assert(ForgetQueue.pending(spark, queue) === Seq(reqA))

    val drained = ForgetQueue.drain(spark, queue, ledger, stores)
    assert(drained === Seq(reqA))
    val fresh = tmp("fqc_lm_fresh")
    LmStore.seed(Seq((2L, d2)).toDF("doc_id", "text"), "doc_id", "text",
      fresh)
    assert(lmState(lmDir) == lmState(fresh)) // subtracted exactly once
    assert(auditFiles(ledger).length === 1)
    assert(!new java.io.File(queue, "_drain_pending").exists())
    assert(new java.io.File(queue, s"drained/$reqA").exists())
  }

  test("a submit landing after the drain marker waits for the next walk: " +
      "the healed drain keeps its pinned participant set") {
    val lmDir = tmp("fqs_lm"); val ledger = tmp("fqs_ledger")
    val queue = tmp("fqs_q")
    val stores = CorpusStores(lmDir = Some(lmDir))
    LmStore.seed(Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"),
      "doc_id", "text", lmDir)
    val reqA = ForgetQueue.submit(spark, queue,
      Seq((1L, d1)).toDF("doc_id", "text"), "doc_id", "text")
    intercept[IllegalStateException] {
      ForgetQueue.drainImpl(spark, queue, ledger, stores, Some("lm:pre-done"))
    }
    // reqB arrives while the crashed drain's marker pins reqA
    val reqB = ForgetQueue.submit(spark, queue,
      Seq((2L, d2)).toDF("doc_id", "text"), "doc_id", "text")
    val drained = ForgetQueue.drain(spark, queue, ledger, stores)
    assert(drained === Seq(reqA, reqB))
    // TWO walks, two audits: the healed one carries ONLY reqA's id (the
    // pinned set — growing it mid-replay would skip token-done stores),
    // the fresh one only reqB's
    val ids = auditFiles(ledger).map(readFile).map(
      _.linesIterator.find(_.startsWith("ids=")).get).sorted
    assert(ids === Seq("ids=1", "ids=2"))
    val fresh = tmp("fqs_lm_fresh")
    LmStore.seed(Seq((3L, d3)).toDF("doc_id", "text"), "doc_id", "text",
      fresh)
    assert(lmState(lmDir) == lmState(fresh))
  }
}

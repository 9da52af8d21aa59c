package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Pipelines

/** Session-lifecycle contract for the shared-artifact memos (VERDICT r5 #5):
  * a stopped session must not leave its (session, corpus) entries — and the
  * checkpoint blocks they pin — behind in the static memo registry. Runs two
  * REAL session lifecycles back to back; SparkTestSession rebuilds the shared
  * session for any suite running after this one. */
class MemoEvictionSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def awaitEmpty(): Int = {
    // the application-end event is delivered through the listener bus, which
    // SparkContext.stop drains before returning — the deadline is pure slack
    val deadline = System.nanoTime() + 10e9.toLong
    while (SessionMemo.totalEntries != 0 && System.nanoTime() < deadline)
      Thread.sleep(20)
    SessionMemo.totalEntries
  }

  test("evicting on a live context unpersists the checkpoint blocks the entry pinned") {
    val s = SparkTestSession.spark
    val memo = new SessionMemo[org.apache.spark.sql.DataFrame]
    import s.implicits._
    val df = memo.getOrBuild(s, "live-evict-probe")(
      (1 to 100).toDF("x").localCheckpoint())
    df.count()
    val rddIds = df.queryExecution.logical.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }
    assert(rddIds.nonEmpty, "localCheckpoint should leave an RDD-backed leaf")
    assert(rddIds.forall(s.sparkContext.getPersistentRDDs.contains),
      "checkpoint blocks should be persisted while the entry lives")
    memo.evictAll()
    assert(memo.entryCount == 0)
    // unpersist(blocking = false) — poll briefly for the async release
    val deadline = System.nanoTime() + 10e9.toLong
    def released = rddIds.forall(id => !s.sparkContext.getPersistentRDDs.contains(id))
    while (!released && System.nanoTime() < deadline) Thread.sleep(20)
    assert(released, "evicting a live-context entry must release its blocks")
  }

  test("the FIFO cap bounds a memo on a long-lived context; hits refresh nothing, rebuilds work") {
    val s = SparkTestSession.spark
    val memo = new SessionMemo[java.lang.Integer](maxEntries = 4)
    var builds = 0
    def get(k: String): Int = memo.getOrBuild(s, k) { builds += 1; Integer.valueOf(builds) }
    (1 to 6).foreach(i => get(s"k$i"))
    assert(builds == 6 && memo.entryCount == 4, s"$builds builds, ${memo.entryCount} kept")
    // k5, k6 survive (newest); k1 was FIFO-evicted and rebuilds on demand
    val b0 = builds
    get("k6")
    assert(builds == b0, "a surviving entry must hit, not rebuild")
    get("k1")
    assert(builds == b0 + 1, "an evicted entry must rebuild")
  }

  test("stopping a session evicts every memo entry it owned; a fresh session repopulates") {
    val s1 = SparkTestSession.spark
    // one memoized DataFrame (quality gate checkpoint) + one memoized model
    Pipelines.queries("text_quality")(s1, sf).count()
    Pipelines.queries("sim_ivf_trained_recall")(s1, sf).count()
    assert(SessionMemo.totalEntries > 0, "memos should hold session-1 entries")
    s1.stop()
    assert(awaitEmpty() == 0,
      s"stopped session left ${SessionMemo.totalEntries} memo entries pinned")

    // second lifecycle: a fresh context re-arms eviction and repopulates
    val s2 = SparkTestSession.spark
    assert(s2 ne s1)
    Pipelines.queries("text_quality")(s2, sf).count()
    assert(SessionMemo.totalEntries > 0, "memos should hold session-2 entries")
    s2.stop()
    assert(awaitEmpty() == 0,
      s"second stopped session left ${SessionMemo.totalEntries} entries pinned")
  }
}

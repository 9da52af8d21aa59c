package graft.streaming

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession

import graft.SessionMemo

/** Periodic refit of a LEARNED artifact inside a long-running ingest
  * stream — the streaming tail of the batch pipeline's train-once memos
  * (`bpeMemo`, `w2vMemo` in graft.queries): a continuous crawl keeps
  * admitting documents, and a tokenizer or embedding table fit on last
  * month's corpus drifts away from what the store now holds. The reference
  * refits its models per stream segment (the retrain loop of
  * `adaptation/stream.py` runs BETWEEN segments, never inside one); here
  * the refit is epoch-tagged, triggered by the same foreachBatch the
  * stores use, and the fit itself runs OFF the hot path.
  *
  * Contract:
  *  - `onEpoch(s, e)` — call from the stream's sink AFTER the epoch's rows
  *    land (gate → store → refit hook, one foreachBatch chain). Every
  *    `refitEvery` epochs it REQUESTS a new version tagged with that epoch
  *    and returns immediately: the fit runs on a single background worker
  *    thread, so a slow refit never stalls admission (ingest epochs keep
  *    completing while the model trains). When the fit lands it persists,
  *    then publishes atomically (volatile swap). Boundary requests that
  *    arrive while an older fit is still training COLLAPSE to the newest
  *    epoch — the backlog is O(1), never a queue of stale versions.
  *  - `current(s)` — the published model; consumers between refits keep
  *    reading a consistent version while the next one trains. Before any
  *    publish, the first consumer routes a version-0 fit through the same
  *    worker and blocks on it (a consumer always gets a model; the fit
  *    never runs inline, so it cannot race a concurrent boundary request).
  *  - A fit FAILURE poisons the hook: the next `onEpoch` (and
  *    `awaitRefits`, and a pre-publish `current`) rethrows it, failing the
  *    stream as loudly as a synchronous fit would — never an unlogged
  *    background retry loop.
  *  - Eviction keeps the LAST TWO versions memoized (publish of k+1 drops
  *    k-1): a consumer that read the version tag just before a publish
  *    still finds its entry — dropping the superseded version immediately
  *    would let that reader re-run `fit` on the now-grown corpus and
  *    memoize a semantics-drifted stale entry. Still O(1) model state on
  *    an unbounded stream ([[graft.SessionMemo.drop]]).
  *  - Re-delivered epochs are no-ops (version and requests only advance),
  *    so the hook composes with the stores' replay-marker idempotence: a
  *    crash-replayed batch re-runs `onEpoch` with an epoch ≤ the published
  *    version and changes nothing — the [[graft.ml.Lstm.fitCheckpointed]]
  *    resume discipline (never regress to an older training state) applied
  *    to whole-model refits.
  *  - `awaitRefits()` — block until no fit is requested or running
  *    (maintenance windows, deterministic tests). The hot path never calls
  *    it.
  *
  * `fit(s, version)` trains on the store's CURRENT contents (caller-scoped:
  * read the corpus dir, the fingerprint-store survivors table, whatever the
  * deployment's source of record is). Because the fit runs asynchronously,
  * a version's training set is the store AS OF when the worker picks the
  * request up — at least everything its tag epoch admitted, possibly more
  * (the same skew a between-segments retrain job has). Determinism per
  * (corpus-state, version) is the fit's own contract, as everywhere else.
  */
final class ModelRefit[M <: AnyRef](name: String, refitEvery: Long,
                                    store: Option[ModelRefit.Store[M]] = None,
                                    firstFitTimeoutMs: Long =
                                      ModelRefit.FirstFitTimeoutMs)
                                   (fit: (SparkSession, Long) => M)
    extends Serializable {
  require(refitEvery > 0)
  require(firstFitTimeoutMs > 0)

  @transient private lazy val memo = new SessionMemo[M]()
  // resume the published version from the durable store, the
  // Lstm.loadLatest discipline: a restarted driver continues from the last
  // SAVED version instead of refitting from scratch (a refit-from-scratch
  // would silently move the version's semantics — it would see rows the
  // original fit never saw)
  private val resumed: Option[(Long, M)] = store.flatMap(_.loadLatest())
  @volatile private var ver: Long = resumed.map(_._1).getOrElse(-1L)
  @volatile private var prevVer: Long = -1L
  @volatile private var pending: Option[(Long, M)] = resumed
  // newest boundary epoch requested but not yet published; worker liveness
  private val requested = new AtomicLong(-1L)
  private val fitting = new AtomicBoolean(false)
  // one daemon worker per hook: fits are serialized, admission is not
  @transient private lazy val worker =
    java.util.concurrent.Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, s"model-refit-$name")
      t.setDaemon(true)
      t
    })

  // first fit failure, if any: the hook is POISONED — the next onEpoch /
  // awaitRefits / pre-publish current rethrows it, failing the stream as
  // loudly as the old synchronous fit did. Without this, an exception
  // escaping the worker task would vanish into thread stderr while the
  // finally-block re-arm spun the SAME failing fit in an unbounded,
  // unlogged hot loop of full training jobs. Restarting the query builds a
  // fresh hook (the sinks' restart discipline), which is the retry.
  @volatile private var failure: Option[(Long, Throwable)] = None

  private def rethrowFailure(): Unit = failure.foreach { case (v, t) =>
    throw new IllegalStateException(
      s"refit $name: fit of v$v failed; failing the stream (restart the " +
        "query to retry)", t)
  }

  /** The epoch tag of the published version (-1 before any fit). */
  def currentVersion: Long = ver

  /** The published model (a consumer always gets one). If nothing has ever
    * published, the FIRST consumer routes a version-0 fit through the
    * worker and blocks on the publish — never an inline fit, which would
    * race a concurrent `onEpoch(0)` request's worker fit on a corpus that
    * may have grown between them and double-train v0. Only that first
    * consumer blocks; ingest epochs never do. A resumed version seeds the
    * memo from the store's bytes — never a refit.
    *
    * The v0 wait uses `firstFitTimeoutMs` (default 24 h), NOT the 2-minute
    * test/maintenance default of [[awaitRefits]]: a first full-corpus fit
    * is legitimately slow, and a deadline sized for test suites would turn
    * a slow-but-healthy v0 into a stream failure the old inline fit never
    * had. Deployments with a hard SLA pass their own bound. */
  def current(s: SparkSession): M = {
    if (ver < 0L) {
      requested.getAndUpdate(r => math.max(r, 0L))
      startWorker(s)
      awaitRefits(firstFitTimeoutMs)
    }
    val v = ver
    memo.getOrBuild(s, s"$name|v$v") {
      pending match {
        case Some((pv, m)) if pv == v => m
        case _                        => fit(s, v)
      }
    }
  }

  /** Epoch hook: at a `refitEvery` boundary, request a refit and return —
    * the fit trains on the background worker and publishes when done.
    * On any replayed epoch ≤ the published (or already-requested) version:
    * a no-op. Publish ordering: the new version trains and PERSISTS before
    * the volatile swap, so readers never see a half-built model and a
    * crash between save and publish just means the restart resumes the
    * newer (fully trained, fully saved) version. A previous fit failure
    * rethrows here — the stream fails loudly instead of silently ingesting
    * against a permanently stale model. */
  def onEpoch(s: SparkSession, epoch: Long): Unit = {
    rethrowFailure()
    if (epoch % refitEvery == 0 && epoch > ver &&
        epoch > requested.getAndUpdate(r => math.max(r, epoch)).max(ver)) {
      startWorker(s)
    }
  }

  /** Request an out-of-band refit NOW, returning the version tag it will
    * publish under — the post-forget retrain path
    * ([[graft.operators.Forget]]): after a corpus-wide takedown the stores
    * have forgotten but THIS model's parameters still embed the retracted
    * documents, and the next periodic boundary may be hours away. Bumps the
    * requested version strictly past everything published or pending (the
    * tag is ordering-only, like every version here) and trains on the
    * store's CURRENT — post-forget — contents via the same worker,
    * versioned-store persist, and atomic publish as a boundary refit; the
    * superseded version stays in its durable store, readable for audit.
    * One epoch-grid boundary landing inside (published, returned tag] is
    * absorbed by this refit (its content is newer); the grid resumes at
    * the next boundary past the tag. */
  def refitNow(s: SparkSession): Long = {
    rethrowFailure()
    val v = requested.updateAndGet(r => math.max(r, ver) + 1L)
    startWorker(s)
    v
  }

  private def startWorker(s: SparkSession): Unit =
    if (failure.isEmpty && fitting.compareAndSet(false, true)) {
      worker.execute(() => {
        try {
          var e = requested.get()
          while (failure.isEmpty && e > ver) {
            // requests that arrived during a fit collapse: only the newest
            // epoch at loop-check time trains (stale versions never exist)
            try {
              val m = memo.getOrBuild(s, s"$name|v$e")(fit(s, e))
              store.foreach(_.save(m, e))
              publish(s, e)
            } catch {
              case t: Throwable =>
                failure = Some((e, t))
                System.err.println(
                  s"[ModelRefit:$name] fit of v$e failed: $t")
            }
            e = requested.get()
          }
        } finally {
          fitting.set(false)
          // a request may have landed between the loop exit and the reset;
          // never re-arm after a failure (that is the hot retry loop)
          if (failure.isEmpty && requested.get() > ver) startWorker(s)
        }
      })
    }

  private def publish(s: SparkSession, epoch: Long): Unit = synchronized {
    val old = ver
    ver = epoch
    pending = None
    // keep the last two: drop k-2, not the just-superseded k-1 (see class
    // doc — closes the read-the-tag-then-miss-the-memo race)
    if (prevVer >= 0L && prevVer != old && prevVer != epoch)
      memo.drop(s, s"$name|v$prevVer")
    prevVer = old
  }

  /** Block until no refit is requested or in flight (first-consumer v0
    * publish, tests, maintenance windows — never the ingest path).
    * Rethrows a worker fit failure instead of spinning on it. */
  def awaitRefits(timeoutMs: Long = 120000L): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (failure.isEmpty && (fitting.get() || requested.get() > ver) &&
           System.nanoTime() < deadline) Thread.sleep(10)
    rethrowFailure()
    require(!fitting.get() && requested.get() <= ver,
      s"refit $name still in flight after ${timeoutMs}ms")
  }

  /** True while a fit is training in the background (telemetry). */
  def refitInFlight: Boolean = fitting.get() || requested.get() > ver

  /** Live memoized versions (eviction telemetry — ≤2 in steady state:
    * current + the immediately superseded version). */
  private[graft] def liveVersions: Int = memo.entryCount
}

object ModelRefit {
  /** Default bound on the first consumer's blocking wait for the v0
    * publish (see [[ModelRefit.current]]): generous because a first
    * full-corpus fit can legitimately take hours — distinct from the
    * [[ModelRefit.awaitRefits]] test/maintenance default. */
  val FirstFitTimeoutMs: Long = 24L * 3600L * 1000L

  /** Durable version store for [[ModelRefit]]: `save(model, version)` must
    * publish atomically (write aside + rename, the checkpoint discipline of
    * every store in this engine); `loadLatest` returns the newest fully
    * published (version, model), or None for a fresh deployment. The model
    * encoding is the caller's (parquet rows for relational state, the
    * [[graft.ml.ModelIO]] precedent). */
  final case class Store[M](save: (M, Long) => Unit,
                            loadLatest: () => Option[(Long, M)])
}

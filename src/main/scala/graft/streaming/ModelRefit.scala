package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.SessionMemo

/** Periodic refit of a LEARNED artifact inside a long-running ingest
  * stream — the streaming tail of the batch pipeline's train-once memos
  * (`bpeMemo`, `w2vMemo` in graft.queries): a continuous crawl keeps
  * admitting documents, and a tokenizer or embedding table fit on last
  * month's corpus drifts away from what the store now holds. The reference
  * refits its models per stream segment (the retrain loop of
  * `adaptation/stream.py`); here the refit is epoch-tagged and rides the
  * same foreachBatch the stores use.
  *
  * Contract:
  *  - `onEpoch(s, e)` — call from the stream's sink AFTER the epoch's rows
  *    land (gate → store → refit hook, one foreachBatch chain). Every
  *    `refitEvery` epochs it trains a NEW version tagged with that epoch,
  *    publishes it atomically (volatile swap), and DROPS the superseded
  *    version from the memo — exactly one live version per hook, so an
  *    unbounded stream holds O(1) model state
  *    ([[graft.SessionMemo.drop]]).
  *  - `current(s)` — the published model; consumers between refits keep
  *    reading a consistent version while the next one trains. Lazily fits
  *    version 0 if the stream has not reached a refit boundary yet.
  *  - Re-delivered epochs are no-ops (version only advances), so the hook
  *    composes with the stores' replay-marker idempotence: a crash-replayed
  *    batch re-runs `onEpoch` with an epoch ≤ the published version and
  *    changes nothing — the [[graft.ml.Lstm.fitCheckpointed]] resume
  *    discipline (never regress to an older training state) applied to
  *    whole-model refits.
  *
  * `fit(s, version)` trains on the store's CURRENT contents (caller-scoped:
  * read the corpus dir, the fingerprint-store survivors table, whatever the
  * deployment's source of record is). Determinism per (corpus-state,
  * version) is the fit's own contract, as everywhere else.
  */
final class ModelRefit[M <: AnyRef](name: String, refitEvery: Long)
                                   (fit: (SparkSession, Long) => M)
    extends Serializable {
  require(refitEvery > 0)

  @transient private lazy val memo = new SessionMemo[M]()
  @volatile private var ver: Long = -1L

  /** The epoch tag of the published version (-1 before any fit). */
  def currentVersion: Long = ver

  /** The published model; fits version 0 on first use if no refit boundary
    * has passed yet (a consumer always gets a model). */
  def current(s: SparkSession): M = {
    val v = math.max(ver, 0L)
    memo.getOrBuild(s, s"$name|v$v")(fit(s, v))
  }

  /** Epoch hook: refit + publish + evict-old at every `refitEvery`
    * boundary; otherwise (and on any replayed epoch ≤ the published
    * version) a no-op. The new version trains BEFORE the swap, so readers
    * never see a half-built model. */
  def onEpoch(s: SparkSession, epoch: Long): Unit =
    if (epoch % refitEvery == 0 && epoch > ver) {
      val old = ver
      memo.getOrBuild(s, s"$name|v$epoch")(fit(s, epoch))
      ver = epoch
      if (old >= 0L) memo.drop(s, s"$name|v$old")
    }

  /** Live memoized versions (eviction telemetry — 1 in steady state). */
  private[graft] def liveVersions: Int = memo.entryCount
}

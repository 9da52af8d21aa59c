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
final class ModelRefit[M <: AnyRef](name: String, refitEvery: Long,
                                    store: Option[ModelRefit.Store[M]] = None)
                                   (fit: (SparkSession, Long) => M)
    extends Serializable {
  require(refitEvery > 0)

  @transient private lazy val memo = new SessionMemo[M]()
  // resume the published version from the durable store, the
  // Lstm.loadLatest discipline: a restarted driver continues from the last
  // SAVED version instead of refitting from scratch (a refit-from-scratch
  // would silently move the version's semantics — it would see rows the
  // original fit never saw)
  private val resumed: Option[(Long, M)] = store.flatMap(_.loadLatest())
  @volatile private var ver: Long = resumed.map(_._1).getOrElse(-1L)
  @volatile private var pending: Option[(Long, M)] = resumed

  /** The epoch tag of the published version (-1 before any fit). */
  def currentVersion: Long = ver

  /** The published model; fits version 0 on first use if no refit boundary
    * has passed yet (a consumer always gets a model). A resumed version
    * seeds the memo from the store's bytes — never a refit. */
  def current(s: SparkSession): M = {
    val v = math.max(ver, 0L)
    memo.getOrBuild(s, s"$name|v$v") {
      pending match {
        case Some((pv, m)) if pv == v => m
        case _                        => fit(s, v)
      }
    }
  }

  /** Epoch hook: refit + save + publish + evict-old at every `refitEvery`
    * boundary; otherwise (and on any replayed epoch ≤ the published
    * version) a no-op. Ordering: the new version trains and PERSISTS
    * before the volatile swap, so readers never see a half-built model and
    * a crash between save and publish just means the restart resumes the
    * newer (fully trained, fully saved) version. */
  def onEpoch(s: SparkSession, epoch: Long): Unit =
    if (epoch % refitEvery == 0 && epoch > ver) {
      val old = ver
      val m = memo.getOrBuild(s, s"$name|v$epoch")(fit(s, epoch))
      store.foreach(_.save(m, epoch))
      ver = epoch
      pending = None
      if (old >= 0L) memo.drop(s, s"$name|v$old")
    }

  /** Live memoized versions (eviction telemetry — 1 in steady state). */
  private[graft] def liveVersions: Int = memo.entryCount
}

object ModelRefit {
  /** Durable version store for [[ModelRefit]]: `save(model, version)` must
    * publish atomically (write aside + rename, the checkpoint discipline of
    * every store in this engine); `loadLatest` returns the newest fully
    * published (version, model), or None for a fresh deployment. The model
    * encoding is the caller's (parquet rows for relational state, the
    * [[graft.ml.ModelIO]] precedent). */
  final case class Store[M](save: (M, Long) => Unit,
                            loadLatest: () => Option[(Long, M)])
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source token-budget admission gate — the arrival-order twin
  * of the batch `mix_token_fill` prefix rule (reference-shaped mixing turned
  * into a front-door control): a crawl stream keeps admitting a source's
  * documents until that source's token budget fills, then drops the rest of
  * the stream for that source. The admission rule is exactly the batch
  * query's `cum_before < budget` prefix — the doc that CROSSES the boundary
  * is admitted, everything after is not — so on identically-ordered input the
  * stream and the batch window agree row-for-row (pinned in StreamingSpec).
  *
  * State/scale contract: ONE `Fill(filled)` long per source key lives in the
  * state store — state size tracks |sources| (dozens), never corpus size, so
  * the gate runs unchanged at 100 TB. Budgets arrive as a sources-sized map
  * captured into the group function (the same tiny-dim-broadcast shape the
  * batch query uses); rebudgeting is a stream restart, which the checkpointed
  * state survives. Within a micro-batch a source's rows are ordered by
  * doc_id before admission (iterator order is not deterministic); across
  * micro-batches arrival order is epoch order — replaying an epoch from the
  * checkpoint re-reads the SAME state snapshot, so a crash-replay re-emits
  * its epoch's admissions identically (at-least-once; downstream sinks are
  * marker-idempotent, like every store in this engine).
  */
object BudgetGate {

  case class Doc(source: String, doc_id: Long, n_toks: Long)

  /** An admitted doc plus the source's cumulative fill AFTER it. */
  case class Admitted(source: String, doc_id: Long, n_toks: Long, cum_toks: Long)

  /** Per-source state: tokens admitted so far. */
  case class Fill(filled: Long)

  /** Admission for one source's slice of a micro-batch: admit while the fill
    * BEFORE the doc is under budget (the `mix_token_fill` prefix rule). Once
    * a source's fill reaches budget it never admits again — the fill is
    * monotone, so the admitted set is an arrival-order prefix. */
  def gateGroup(budgets: Map[String, Long])
      : (String, Iterator[Doc], GroupState[Fill]) => Iterator[Admitted] =
    (source, rows, state) => {
      val budget = budgets.getOrElse(source, 0L)
      var filled = state.getOption.map(_.filled).getOrElse(0L)
      val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
        if (filled < budget) {
          filled += d.n_toks
          Some(Admitted(source, d.doc_id, d.n_toks, filled))
        } else None
      }
      state.update(Fill(filled))
      out.iterator
    }

  /** Append-mode gate over a (streaming or batch) doc feed. */
  def admit(docs: Dataset[Doc], budgets: Map[String, Long]): Dataset[Admitted] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        gateGroup(budgets))
  }
}

package graft.operators

/** Driver-side α-temperature mixture math — the per-source budget/rate dims
  * behind mix_sample / mix_token_fill / corpus_build.
  *
  * The r17 shape computed these through a chain of tiny DataFrames
  * (per → crossJoin(broadcast(tot)) → pow → crossJoin(broadcast(sum_w)) →
  * budgets), which costs 2-3 broadcast-exchange scheduler round-trips per
  * run to process |sources| rows (guide §5: the driver gap, 70-100 ms per
  * job, dominates mid-tier queries at bench scale). The per-source totals
  * are MODEL-SIZED by construction (a mixture has a handful of sources), so
  * one bounded collect + this driver math replaces the whole subtree.
  *
  * Float parity with the replaced Spark expressions, term by term:
  *  - `tot` is a LONG sum — order-free, exact.
  *  - `w = pow(src/tot, α)`: per-element `java.lang.Math.pow` — exactly
  *    Spark's POWER and DuckDB's pow.
  *  - `sum_w` is summed in source-sorted order. Spark's own global agg
  *    merges per-partition partials in fetch order (not deterministic in
  *    ulps), and DuckDB sums in its scan order; BOTH engines already rely
  *    on the shared round(·, 6) discipline to absorb Σ-order ulp drift —
  *    the documented mix contract ("pow/Σ-order ulp drift cannot flip a
  *    keep"). A fixed sorted order is strictly more deterministic than
  *    what it replaces.
  *  - `round(x, 6)` HALF_UP: Spark's Round on DoubleType is
  *    `BigDecimal.valueOf(x).setScale(6, HALF_UP).toDouble` — replicated
  *    verbatim in [[round6]].
  * Bit-parity with the Spark subtree is pinned in PackSpec (mix budget
  * twin test); the oracle gate re-proves the end results per corpus.
  */
object Mix {
  val Alpha = 0.7
  val BudgetFrac = 0.5

  /** Spark's round(double, 6) HALF_UP, verbatim. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def weights(per: Seq[(String, Long)])
      : (Long, Seq[(String, Long, Double)], Double) = {
    val sorted = per.sortBy(_._1)
    val tot = sorted.map(_._2).sum
    val w = sorted.map { case (src, st) =>
      (src, st, math.pow(st.toDouble / tot.toDouble, Alpha))
    }
    (tot, w, w.map(_._3).sum)
  }

  /** Per-source token budgets: floor(round(0.5 · tot · w / Σw, 6)) — the
    * exact expression shape `lit(0.5) * tot * w / sum_w` evaluates
    * (left-associative doubles), then round-6 HALF_UP, then floor. */
  def flattenedBudgets(per: Seq[(String, Long)]): Seq[(String, Long)] = {
    val (tot, w, sumW) = weights(per)
    w.map { case (src, _, wi) =>
      (src, math.floor(round6(BudgetFrac * tot.toDouble * wi / sumW)).toLong)
    }
  }

  /** Per-source keep rates: round(least(1.0, 0.5 · tot · w / (Σw · src)), 6)
    * — same associativity as the Spark twin. */
  def flattenedRates(per: Seq[(String, Long)]): Seq[(String, Double)] = {
    val (tot, w, sumW) = weights(per)
    w.map { case (src, st, wi) =>
      (src, round6(math.min(1.0,
        BudgetFrac * tot.toDouble * wi / (sumW * st.toDouble))))
    }
  }
}

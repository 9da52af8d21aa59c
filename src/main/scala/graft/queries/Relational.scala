package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational query surface over the TPC-H-ish tables (SURVEY §2.3-2.5: the join,
  * aggregation, window, sort/limit, and set-op categories — including the ones the
  * reference lacks, declared as engine capabilities).
  *
  * Scale notes per query are inline; the common principles: aggregations are
  * partial+final (map-side combine), small dimension tables are `broadcast`, and
  * windows are partitioned so no global sort is required (except where the
  * semantics are a global top-k, which Spark executes as per-partition top-k +
  * merge via TakeOrderedAndProject).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** A1-style big aggregation: pricing summary. One shuffle, ~6 groups. */
  val q1PricingSummary: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
      |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |round(avg(l_discount), 6) AS avg_disc, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Multi-way join with broadcast dims: revenue by region. orders⋈customer is the
    * only real shuffle; nation/region are broadcast (tiny at any SF). */
  val q2RegionRevenue: Q = (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name")

  val q2Sql: String =
    """SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Global top-k: Spark plans ORDER BY+LIMIT as TakeOrderedAndProject — a
    * per-partition top-k merged on the driver, no full sort at any scale. */
  val q3TopOrders: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val q3Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Partitioned window: per-customer running order total (SURVEY §2.5 — the
    * engine's general window capability; partitioned, so it scales out). */
  val q4RunningTotal: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
          .as("running"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q4Sql: String =
    """SELECT o_custkey, o_orderkey,
      |row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
      |round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** UNION ALL with a phase discriminator (SURVEY §2.5 set-ops; the reference's
    * result-concat pattern, utils/visualization.py:67-71). */
  val q5UnionPhases: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val a = o.filter(col("o_orderstatus") === "F")
      .select(lit("phase1").as("phase"), col("o_totalprice"))
    val b = o.filter(col("o_orderstatus") =!= "F")
      .select(lit("phase2").as("phase"), col("o_totalprice"))
    a.unionAll(b).groupBy("phase")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("phase")
  }

  val q5Sql: String =
    """SELECT phase, count(*) AS n, round(sum(o_totalprice), 2) AS total FROM (
      |  SELECT 'phase1' AS phase, o_totalprice FROM orders WHERE o_orderstatus = 'F'
      |  UNION ALL
      |  SELECT 'phase2' AS phase, o_totalprice FROM orders WHERE o_orderstatus <> 'F'
      |) t GROUP BY phase ORDER BY phase""".stripMargin

  /** Anti join: customers with no finished ('F') order, per nation. (Filtered
    * build side — plain "no orders at all" is empty under the generator's full
    * referential coverage.) */
  val q6AntiJoin: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_lonely"))
      .orderBy("c_nationkey")

  val q6Sql: String =
    """SELECT c_nationkey, count(*) AS n_lonely FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Semi join: customers with at least one open order, per market segment. */
  val q6bSemiJoin: Q = (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("c_mktsegment")

  val q6bSql: String =
    """SELECT c_mktsegment, count(*) AS n_active FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Event-time tumbling window (engine extension over the reference's ordinal
    * time — SURVEY §2.6 note): hourly counts+sums by event type. */
  val q7EventsHourly: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour_ts", "event_type")

  val q7Sql: String =
    """SELECT CAST(epoch_ms(date_trunc('hour', ts)) / 1000 AS BIGINT) AS hour_ts,
      |event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Row-frame moving average (SURVEY A4 twin on the events table): 10-row moving
    * average of value within each event type. */
  val q8MovingAvg: Q = (s, dir) => {
    val w = Window.partitionBy("event_type").orderBy("event_id").rowsBetween(-9, 0)
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        round(avg("value").over(w), 4).as("ma10"))
      .orderBy("event_type", "event_id")
  }

  val q8Sql: String =
    """SELECT event_type, event_id,
      |round(avg(value) OVER (PARTITION BY event_type ORDER BY event_id
      |  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS ma10
      |FROM events ORDER BY event_type, event_id""".stripMargin

  /** Grouping-set aggregation (SURVEY §2.4 absent-in-reference category):
    * ROLLUP over (returnflag, linestatus) with NULL-marker subtotals. */
  val q9Rollup: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q9Sql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Ranking + lag window functions (SURVEY §2.5 absent-in-reference): per
    * customer, order rank by price and the gap to the previous order. */
  val q10RankLag: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc,
      col("o_orderkey").asc)
    Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).cast("long").as("rnk"),
        round(col("o_totalprice") -
          coalesce(lag("o_totalprice", 1).over(w), col("o_totalprice")), 2)
          .as("gap_to_prev"))
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  val q10Sql: String =
    """SELECT o_custkey, o_orderkey,
      |rank() OVER w AS rnk,
      |round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER w, o_totalprice), 2) AS gap_to_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin

  /** Distinct aggregation (SURVEY §2.4 absent-in-reference): exact distinct
    * counts per group. (approx_count_distinct exists too but is engine-specific
    * — exercised in ScalaTest, not the cross-engine oracle.) */
  val q11Distinct: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val q11Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Sketch-based approximate aggregates (SURVEY §2.4 absent-in-reference):
    * HyperLogLog++ distinct counts and quantile sketches — the
    * constant-memory path when exact distinct over 100 TB would blow the
    * shuffle. Sketch internals are engine-specific, so the oracled surface is
    * the exact twin of each sketch plus a `within_bound` verdict: HLL++ at
    * rsd 5% must land within ±15% (3σ) of the exact distinct, and the
    * KLL-style approx median (accuracy 1000 ⇒ rank error ≤ n/1000) must land
    * between the exact 0.4 and 0.6 quantiles. The DuckDB twin replays the
    * exact columns and asserts both verdicts TRUE — a sketch drifting out of
    * bound hash-fails the row. [SQL] */
  val q15Approx: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), rsd = 0.05).as("ap"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
        expr("percentile(l_extendedprice, array(0.4, 0.6))").as("band"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
        (abs(col("ap") - col("exact_parts"))
          <= col("exact_parts") * 0.15 + 1).as("parts_within_bound"),
        (col("am") >= element_at(col("band"), 1) &&
          col("am") <= element_at(col("band"), 2)).as("median_within_bound"))
      .orderBy("l_returnflag")

  val q15Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
      |count(*) AS n_rows, TRUE AS parts_within_bound, TRUE AS median_within_bound
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Correlated scalar subquery (SURVEY §4 decorrelation row): orders priced
    * above their own customer's average — Catalyst decorrelates the subquery
    * into an aggregate + join instead of re-executing it per row. The
    * above-average test is scaled out of the division (`price·n > sum` over
    * DECIMAL) so every comparison and the reported excess are exact integers
    * of cents — a double `avg` puts half-cent values at `round`'s boundary,
    * where Spark (shortest-decimal-repr HALF_UP) and DuckDB (binary-double)
    * legitimately disagree. */
  val q17Decorrelate: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice").cast("decimal(18,2)").as("p"))
    val byCust = o.groupBy(col("o_custkey").as("ac_custkey"))
      .agg(sum(col("p")).as("s"), count(lit(1)).as("c"))
    o.join(byCust, col("o_custkey") === col("ac_custkey"))
      .filter(col("p") * col("c") > col("s"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_above"),
        max(col("p") * col("c") - col("s")).cast("double").as("max_excess_x_n"))
      .orderBy("o_custkey")
  }

  val q17Sql: String =
    """SELECT o_custkey, count(*) AS n_above,
      |  CAST(max(p * c - s) AS DOUBLE) AS max_excess_x_n
      |FROM (SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |        (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) FROM orders o2
      |          WHERE o2.o_custkey = o1.o_custkey) AS s,
      |        (SELECT count(*) FROM orders o2
      |          WHERE o2.o_custkey = o1.o_custkey) AS c
      |      FROM orders o1) t
      |WHERE p * c > s
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Pivot (conditional aggregation): events wide by type per day — the
    * reshape behind the reference's result-plotting tables
    * (utils/visualization.py). Fixed column set so both engines emit an
    * identical schema. */
  val q18Pivot: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", Seq("click", "view", "error", "signup", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  val q18Sql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'purchase') AS purchase
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Banded range join (SURVEY §2.3's last absent join category): for each
    * user, count (click, error) pairs where the click falls inside the
    * 2-hour window after an error — an interval join executed as an
    * equi-join on (user, time band) via [[graft.operators.RangeJoin]], never
    * a nested-loop. The oracle replays it as a plain inequality join. */
  val q16RangeJoin: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("click_us"))
    val windowUs = 7200L * 1000000L
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("err_lo"),
        (unix_micros(col("ts")) + windowUs).as("err_hi"))
    graft.operators.RangeJoin.bandedIntervalJoin(clicks, errors,
        Seq("user_id"), "click_us", "err_lo", "err_hi", bandWidth = windowUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("click_us")).as("n_clicks_hit"))
      .orderBy("user_id")
  }

  val q16Sql: String =
    """SELECT c.user_id, count(*) AS n_pairs,
      |  count(DISTINCT epoch_us(c.ts)) AS n_clicks_hit
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON c.user_id = e.user_id
      | AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 2 HOUR
      |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  /** As-of join (SURVEY §2.3 absent-in-reference, now first-class): every
    * click attached to the user's most recent view at-or-before it — the
    * canonical time-series enrichment. One keyed-window shuffle, no range
    * cross-product (see [[graft.operators.AsOfJoin]]). The oracle replays it
    * with DuckDB's native ASOF JOIN. Times exported as epoch-µs longs (both
    * engines truncate the generator's ns timestamps to µs identically). */
  val q12AsofJoin: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
    graft.operators.AsOfJoin.backward(clicks, views, Seq("user_id"), "ts", "view_ts")
      .select(col("event_id"), col("user_id"), col("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"),
        col("view_value"))
      .orderBy("event_id")
  }

  val q12Sql: String =
    """SELECT c.event_id, c.user_id, v.event_id AS view_id,
      |  epoch_us(c.ts) - epoch_us(v.ts) AS gap_us, v.value AS view_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY c.event_id""".stripMargin

  /** Session windows (SURVEY §2.6: event-time capability the reference lacks):
    * per-user 30-minute-gap sessions via `session_window`, the same operator
    * the streaming path uses. Oracle = gaps-and-islands SQL. `sum(value)`
    * goes through DECIMAL so the result is order-independent and exact on
    * both engines (double summation order differs between engines). */
  val q13Sessions: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"),
        col("sv").cast("double").as("sum_value"))
      .orderBy("user_id", "session_start_us")

  val q13Sql: String =
    """WITH o AS (SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM o)
      |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
      |  epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** CUBE over (event_type, hour-of-day) (SURVEY §2.4 absent-in-reference:
    * grouping sets — rollup is q9, cube completes the family). */
  val q14Cube: Q = (s, dir) =>
    Tables.events(s, dir)
      .cube(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first, col("hod").asc_nulls_first)

  val q14Sql: String =
    """SELECT event_type, date_part('hour', ts) AS hod, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY CUBE(event_type, date_part('hour', ts))
      |ORDER BY event_type ASC NULLS FIRST, hod ASC NULLS FIRST""".stripMargin

  /** Disjunctive-predicate join (TPC-H q19 shape): three OR'd brand/size/
    * quantity branches — exercises Catalyst's handling of complex disjunctions
    * (the common `l_partkey = p_partkey` conjunct still drives a hash join;
    * only the residual OR is a post-join filter, never a nested loop). The
    * revenue sum routes through DECIMAL(18,4): price×(1−disc) is a 4-decimal
    * rational, so the cast recovers it exactly on both engines and the sum is
    * order-free. */
  val q19DisjunctiveJoin: Q = (s, dir) => {
    val branch = (brand: String, qLo: Int, qHi: Int, sHi: Int) =>
      col("p_brand") === brand &&
        col("l_quantity").between(qLo, qHi) && col("p_size").between(1, sHi)
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#1", 1, 30, 15) || branch("Brand#2", 10, 40, 25) ||
        branch("Brand#3", 20, 50, 35))
      .agg(
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19Sql: String =
    """SELECT
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 30 AND p_size BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 40 AND p_size BETWEEN 1 AND 25)
      |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 50 AND p_size BETWEEN 1 AND 35)""".stripMargin

  /** Nested semi-join chain (TPC-H q20 shape): suppliers who moved a heavy
    * volume of one brand's parts — part-filter feeds a keyed aggregate feeds
    * the supplier join; quantities are small integers so the HAVING sum is
    * exact in double on any engine. */
  val q20VolumeSuppliers: Q = (s, dir) => {
    val brandParts = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#1").select("p_partkey")
    val vol = Tables.lineitem(s, dir)
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"))
      .filter(col("total_qty") > 50.0)
    Tables.supplier(s, dir)
      .join(vol, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_name"), col("total_qty"))
      .orderBy("s_name")
  }

  val q20Sql: String =
    """SELECT s_name, round(total_qty, 2) AS total_qty
      |FROM supplier JOIN (
      |  SELECT l_suppkey, sum(l_quantity) AS total_qty FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
      |  GROUP BY l_suppkey HAVING sum(l_quantity) > 50.0) v
      |ON s_suppkey = l_suppkey
      |ORDER BY s_name""".stripMargin

  /** Exists + not-exists on the same fact table (TPC-H q21 shape): orders with
    * at least one returned line and no oversized line, counted by priority —
    * the semi-join and anti-join compose on one scan pair. */
  val q21ReturnedNotOversized: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val returned = li.filter(col("l_returnflag") === "R").select("l_orderkey")
    val oversized = li.filter(col("l_quantity") > 45.0).select("l_orderkey")
    Tables.orders(s, dir)
      .join(returned, col("o_orderkey") === returned("l_orderkey"), "left_semi")
      .join(oversized, col("o_orderkey") === oversized("l_orderkey"), "left_anti")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val q21Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l
      |        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "q19_disjunctive_join" -> q19DisjunctiveJoin,
    "q20_volume_suppliers" -> q20VolumeSuppliers,
    "q21_exists_chain" -> q21ReturnedNotOversized,
    "q9_rollup" -> q9Rollup,
    "q10_rank_lag" -> q10RankLag,
    "q11_distinct" -> q11Distinct,
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_region_revenue" -> q2RegionRevenue,
    "q3_top_orders" -> q3TopOrders,
    "q4_running_total" -> q4RunningTotal,
    "q5_union_phases" -> q5UnionPhases,
    "q6_anti_join" -> q6AntiJoin,
    "q6b_semi_join" -> q6bSemiJoin,
    "q7_events_hourly" -> q7EventsHourly,
    "q8_moving_avg" -> q8MovingAvg,
    "q12_asof_join" -> q12AsofJoin,
    "q13_sessions" -> q13Sessions,
    "q14_cube" -> q14Cube,
    "q15_approx" -> q15Approx,
    "q16_range_join" -> q16RangeJoin,
    "q17_decorrelate" -> q17Decorrelate,
    "q18_pivot" -> q18Pivot)

  val oracles: Map[String, String] = Map(
    "q19_disjunctive_join" -> q19Sql,
    "q20_volume_suppliers" -> q20Sql,
    "q21_exists_chain" -> q21Sql,
    "q16_range_join" -> q16Sql,
    "q17_decorrelate" -> q17Sql,
    "q18_pivot" -> q18Sql,
    "q12_asof_join" -> q12Sql,
    "q13_sessions" -> q13Sql,
    "q14_cube" -> q14Sql,
    "q15_approx" -> q15Sql,
    "q9_rollup" -> q9Sql,
    "q10_rank_lag" -> q10Sql,
    "q11_distinct" -> q11Sql,
    "q1_pricing_summary" -> q1Sql,
    "q2_region_revenue" -> q2Sql,
    "q3_top_orders" -> q3Sql,
    "q4_running_total" -> q4Sql,
    "q5_union_phases" -> q5Sql,
    "q6_anti_join" -> q6Sql,
    "q6b_semi_join" -> q6bSql,
    "q7_events_hourly" -> q7Sql,
    "q8_moving_avg" -> q8Sql)
}

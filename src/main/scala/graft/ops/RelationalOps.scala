package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Breadth operators over the star schema — the reference's dashboard
  * capabilities (filter → group → sort → limit, SURVEY.md §2.C) generalized
  * to the relational surface a real analytics engine needs: joins of every
  * flavor, multi-key and hierarchical aggregation, window functions, set
  * operations, distinct aggregation.
  *
  * Scale notes (100 TB design intent, tested at sf0.1):
  *  - `nation`/`region`/`part`/`supplier` are bounded dimensions → always
  *    broadcast (no shuffle of the fact side).
  *  - `customer` scales with SF → left to AQE, which broadcasts when the
  *    runtime size is under the threshold and shuffle-joins otherwise.
  *  - aggregate-then-join (q13) shrinks the fact table before the join
  *    instead of joining then aggregating.
  */
object RelationalOps {

  /** TPC-H Q1-shaped pricing summary: multi-key hash aggregate with partial
    * (map-side) combine over the full lineitem scan. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        Exact.sumD(col("l_extendedprice"), 2).as("sum_base_price"),
        (sum(Exact.units(col("l_extendedprice"), 2) * (lit(100L) - Exact.units(col("l_discount"), 2)))
          / lit(10000.0)).as("sum_disc_price"),
        (sum(col("l_quantity").cast("long")) / count(lit(1)).cast("double")).as("avg_qty"),
        Exact.avgD(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue by nation: orders ⋈ customer ⋈ nation. `nation` (25 rows at any
    * SF) is broadcast explicitly; `customer` is AQE's call. */
  def revenueByNation(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy("n_name")
      .agg(Exact.sumD(col("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(desc("revenue"), col("n_name"))

  /** Top-10 customers by lifetime spend. Aggregates orders FIRST (fact →
    * one row per customer), then joins the shrunken result to customer —
    * the join input is |customers|, not |orders|. */
  def topCustomers(orders: DataFrame, customer: DataFrame): DataFrame = {
    val spend = orders.groupBy("o_custkey")
      .agg(Exact.sumD(col("o_totalprice"), 2).as("total_spend"), count(lit(1)).as("n_orders"))
    spend
      .join(customer, spend("o_custkey") === customer("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spend"), col("n_orders"))
      .orderBy(desc("total_spend"), col("c_custkey"))
      .limit(10)
  }

  /** Hierarchical aggregate: ROLLUP(returnflag, linestatus) with subtotal
    * rows; grouping nulls coalesced to 'ALL' so Spark's nulls-first and
    * DuckDB's nulls-last sort orders can't diverge. */
  def rollupReturns(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls")

  /** Ranking window function: top-2 orders per customer (the per-key analog
    * of the dashboard's latest-N table, C4). One shuffle on the partition
    * key; rank predicate prunes before the final sort. */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 2): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Left-semi join: customers having at least one order above the
    * threshold. The probe side never materializes order columns. */
  def bigSpenders(customer: DataFrame, orders: DataFrame, minPrice: Double = 450000.0): DataFrame =
    customer
      .join(
        orders.filter(col("o_totalprice") > minPrice),
        customer("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** Left-anti join: customers with NO order above the threshold. */
  def notBigSpenders(customer: DataFrame, orders: DataFrame, minPrice: Double = 450000.0): DataFrame =
    customer
      .join(
        orders.filter(col("o_totalprice") > minPrice),
        customer("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Set intersection: users seen in both event types (INTERSECT = distinct). */
  def usersInBoth(events: DataFrame, typeA: String = "purchase", typeB: String = "error"): DataFrame = {
    val a = events.filter(col("event_type") === typeA).select("user_id")
    val b = events.filter(col("event_type") === typeB).select("user_id")
    a.intersect(b).orderBy("user_id")
  }

  /** Set difference: users seen in A but never in B (EXCEPT = distinct). */
  def usersOnlyIn(events: DataFrame, typeA: String = "purchase", typeB: String = "error"): DataFrame = {
    val a = events.filter(col("event_type") === typeA).select("user_id")
    val b = events.filter(col("event_type") === typeB).select("user_id")
    a.except(b).orderBy("user_id")
  }

  /** Exact distinct aggregation per group (expands to a two-phase plan). */
  def distinctUsersPerType(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Approximate distinct (HLL++) — the sketch path for cardinalities at
    * 100 TB where exact distinct would shuffle every key. Deterministic for
    * a fixed input but NOT DuckDB-comparable; q21 grades the sketch through
    * [[approxDistinctChecked]] instead. Accuracy bound: default relative
    * standard deviation 0.05; `RelationalOpsSpec` asserts every estimate
    * lands within 3×rsd of [[distinctUsersPerType]]'s exact count. */
  def approxDistinctUsers(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("n_users_approx"))
      .orderBy("event_type")

  /** q21 — [[approxDistinctUsers]] in ORACLE-GRADABLE form (the q50
    * computed-vs-oracle pattern). The HLL++ estimate itself is not
    * DuckDB-reproducible, so the query emits what DuckDB CAN recompute —
    * the exact distinct count — plus `hll_ok`, asserting the sketch landed
    * within `relTol` of it. A degraded sketch flips the boolean and fails
    * the hash compare, so the oracle genuinely gates the approximate path.
    * `relTol` defaults to 3×rsd (rsd = 0.05), the same deterministic bound
    * `RelationalOpsSpec` asserts.
    * Scale: both aggregates are map-side-combinable partials over one scan
    * of the same shuffle — no extra pass vs the unchecked form (the exact
    * distinct is the grading harness; at 100 TB you run the sketch alone). */
  def approxDistinctChecked(events: DataFrame, relTol: Double = 0.15): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id")).as("est"))
      .select(col("event_type"), col("n_users"),
        (abs(col("est") - col("n_users")).cast("double")
          <= lit(relTol) * col("n_users").cast("double")).as("hll_ok"))
      .orderBy("event_type")

  /** Multi-way broadcast join: lineitem ⋈ part ⋈ supplier, revenue per brand.
    * Both dims broadcast → the fact table is never shuffled for the joins. */
  def revenueByBrand(lineitem: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey"))
      .groupBy("p_brand")
      .agg(
        (sum(Exact.units(col("l_extendedprice"), 2) * (lit(100L) - Exact.units(col("l_discount"), 2)))
          / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")

  /** Full CUBE over returnflag × linestatus — all 4 grouping-set levels. */
  def cubeReturns(lineitem: DataFrame): DataFrame =
    lineitem
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls")

  /** Calendar aggregation: revenue per month (date_trunc + exact cents). */
  def monthlyOrders(orders: DataFrame): DataFrame =
    orders
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"), Exact.sumD(col("o_totalprice"), 2).as("revenue"))
      .orderBy("month")

  /** String function surface: case mapping, substring, concat, length,
    * replace — all row-local codegen'd expressions. */
  def customerNameFeatures(customer: DataFrame): DataFrame =
    customer.selectExpr(
      "c_custkey",
      "upper(c_name) AS name_upper",
      "substring(c_name, 1, 8) AS name_prefix",
      "CAST(length(c_name) AS BIGINT) AS name_len",
      "concat(c_mktsegment, '/', c_name) AS segment_name",
      "replace(c_name, '#', '-') AS name_dashed")
      .orderBy("c_custkey")

  /** Histogram: fixed-width value buckets over the fraud-stream analog. */
  def valueHistogram(events: DataFrame, width: Double = 50.0): DataFrame =
    events
      .groupBy(floor(col("value") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("value").as("min_value"), max("value").as("max_value"))
      .orderBy("bucket")

  /** q28 — exact percentiles via EXPLICIT linear interpolation over integer
    * cents. Engine `percentile` builtins interpolate with different op
    * orders, so the formula is spelled out and written identically in the
    * DuckDB oracle — every step is the same IEEE double op on both sides:
    * pos = (n-1)*p; pct = (c_floor(pos) + (pos - floor(pos)) *
    * (c_ceil(pos) - c_floor(pos))) / 100.
    * Plan: one window sort per group (inherent to exact percentiles — the
    * approx path for 100 TB is [[approxPercentiles]]), counts broadcast,
    * one final hash agg. Ties in `c` need no tie-break: row_number among
    * equal cents picks equal values either way. */
  def valuePercentiles(events: DataFrame, ps: Seq[(String, Double)] =
      Seq("p50" -> 0.5, "p95" -> 0.95)): DataFrame = {
    // null values are excluded per SQL percentile semantics (they would
    // otherwise rank nulls-first in Spark but nulls-last in DuckDB)
    val cents = events.filter(col("value").isNotNull)
      .select(col("event_type"), Exact.units(col("value"), 2).as("c"))
    val w = Window.partitionBy("event_type").orderBy("c")
    val ranked = cents.withColumn("rn", row_number().over(w))
    val counts = cents.groupBy("event_type").agg(count(lit(1)).as("n"))
    def pos(p: Double): Column = (col("n") - 1).cast("double") * lit(p)
    val picks = ps.flatMap { case (name, p) =>
      Seq(
        sum(when((col("rn") - 1).cast("long") === floor(pos(p)), col("c")))
          .cast("double").as(s"cl_$name"),
        sum(when((col("rn") - 1).cast("long") === ceil(pos(p)), col("c")))
          .cast("double").as(s"ch_$name"))
    }
    val agg = ranked.join(broadcast(counts), "event_type")
      .groupBy("event_type")
      .agg(max("n").as("nn"), picks: _*)
    val outCols = col("event_type") +: ps.map { case (name, p) =>
      val po = (col("nn") - 1).cast("double") * lit(p)
      ((col(s"cl_$name") + (po - floor(po).cast("double"))
        * (col(s"ch_$name") - col(s"cl_$name"))) / lit(100.0)).as(name)
    }
    agg.select(outCols: _*).orderBy("event_type")
  }

  /** Approximate percentiles (GK/KLL-style sketch): the single-pass,
    * no-global-sort path for 100 TB quantiles. Deterministic for a fixed
    * input but not DuckDB-expressible; q53 grades the sketch through
    * [[approxPercentilesChecked]] instead. Exact-value accuracy is
    * asserted against [[valuePercentiles]] in `RelationalOpsSpec`
    * (approx_percentile with accuracy 10000 is exact-rank within 1/10000
    * of the input size). */
  def approxPercentiles(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"),
        expr("approx_percentile(value, 0.95, 10000)").as("p95_approx"),
        expr("approx_percentile(value, 0.99, 10000)").as("p99_approx"))
      .orderBy("event_type")

  /** q53 — [[approxPercentiles]] in ORACLE-GRADABLE form (the q50
    * computed-vs-oracle pattern). The sketch values are not
    * DuckDB-reproducible, so the query emits the non-null count — which
    * DuckDB CAN recompute — plus one rank-containment boolean per
    * percentile (see [[percentileRankCheck]]). A sketch that drifts outside
    * its rank guarantee flips a boolean and fails the hash compare.
    * Scale: the sketch agg is one map-side-combinable pass; the check is a
    * second scan with the 5-row estimate table broadcast — the same
    * validate-on-sample shape a 100 TB pipeline would run (and would run on
    * a sampled slice, not the full corpus). */
  def approxPercentilesChecked(events: DataFrame, eps: Double = 0.01): DataFrame =
    percentileRankCheck(events,
      events.groupBy("event_type").agg(
        expr("approx_percentile(value, 0.5, 10000)").as("a_p50"),
        expr("approx_percentile(value, 0.95, 10000)").as("a_p95"),
        expr("approx_percentile(value, 0.99, 10000)").as("a_p99")),
      eps)

  /** Rank containment: estimate x for quantile p is accepted iff
    * |{v < x}| ≤ (p+eps)·n and |{v ≤ x}| ≥ (p−eps)·n — the defining
    * property of an eps-approximate quantile. Robust to ties (duplicated
    * values move both counts past the target together) and to value gaps
    * (any value inside the valid quantile band is accepted — which is the
    * honest semantics of an approximate answer). `estimates` must carry
    * one row per `event_type` with `a_p50`/`a_p95`/`a_p99`; injectable so
    * the spec can prove a wrong estimate flips the boolean. */
  private[graft] def percentileRankCheck(events: DataFrame, estimates: DataFrame,
      eps: Double): DataFrame = {
    val ps = Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)
    val joined = events.join(broadcast(estimates), Seq("event_type"))
    val aggs = ps.flatMap { case (name, _) => Seq(
      count(when(col("value") < col(s"a_$name"), 1)).as(s"lt_$name"),
      count(when(col("value") <= col(s"a_$name"), 1)).as(s"le_$name")) }
    val counted = joined.groupBy("event_type")
      .agg(count(col("value")).as("n_values"), aggs: _*)
    val okCols = ps.map { case (name, p) =>
      ((col(s"lt_$name").cast("double")
          <= (lit(p) + lit(eps)) * col("n_values").cast("double")) &&
       (col(s"le_$name").cast("double")
          >= (lit(p) - lit(eps)) * col("n_values").cast("double"))).as(s"ok_$name") }
    counted.select(col("event_type") +: col("n_values") +: okCols: _*)
      .orderBy("event_type")
  }

  /** Analytic functions beyond frames: lag/lead/first/last over a
    * deterministic per-customer order sequence. */
  def orderSequence(orders: DataFrame, maxCustkey: Long = 50L): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders.filter(col("o_custkey") < maxCustkey)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        Exact.units(col("o_totalprice"), 2).as("price_c"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        (col("price_c") / 100.0).as("price"),
        (lag("price_c", 1).over(w) / 100.0).as("prev_price"),
        (lead("price_c", 1).over(w) / 100.0).as("next_price"),
        (first("price_c").over(w) / 100.0).as("first_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** TPC-H Q3-shaped shipping priority: the engine's largest join — both
    * fact tables filtered BEFORE the join (predicate pushdown to both
    * scans), customer broadcast by AQE, orders⋈lineitem shuffle join on
    * the order key, then agg + top-k. The canonical 100 TB shape: filters
    * first, small side broadcast, single co-keyed shuffle. */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: String = "BUILDING"): DataFrame = {
    val cutoff = lit("1995-03-15 00:00:00").cast("timestamp")
    customer.filter(col("c_mktsegment") === segment)
      .join(orders.filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg((sum(Exact.units(col("l_extendedprice"), 2) * (lit(100L) - Exact.units(col("l_discount"), 2)))
        / lit(10000.0)).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  /** Left-outer join + aggregate: every customer with their order count and
    * spend, zero-order customers included. Aggregates orders per custkey
    * FIRST (the q13 shape — shuffle carries one narrow row per customer,
    * not every wide joined order row), then left-outer-joins customer to
    * the shrunken result; missing customers coalesce to (0, 0.0). */
  def ordersPerCustomerOuter(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders0"), Exact.sumD(col("o_totalprice"), 2).as("spend0"))
    customer
      .join(perCust, customer("c_custkey") === perCust("o_custkey"), "left_outer")
      .select(
        col("c_custkey"), col("c_name"),
        coalesce(col("n_orders0"), lit(0L)).as("n_orders"),
        coalesce(col("spend0"), lit(0.0)).as("spend"))
      .orderBy("c_custkey")
  }

  /** As-of join (the time-series operator Spark has no primitive for,
    * composed per the design rules from built-ins): for every `leftType`
    * event, the most recent prior-or-equal `refType` event of the same
    * user. One shuffle on user_id; `last(..., ignoreNulls)` over an
    * explicit ROWS frame — no per-row subquery, linear in the stream. */
  def asofJoin(events: DataFrame, leftType: String = "purchase",
               refType: String = "signup"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("ref_id",
        last(when(col("event_type") === refType, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("ref_ts",
        last(when(col("event_type") === refType, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === leftType)
      .select("event_id", "user_id", "ts", "ref_id", "ref_ts")
      .orderBy("event_id")
  }

  /** The event-type domain (fixed in the testdata generator). Pivoting on
    * an EXPLICIT value list keeps the plan a single pass (no extra distinct
    * scan to discover values) and the output schema static — both required
    * at 100 TB and for the oracle compare. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: user-cohort × event-type counts (wide form of q20). The cohort
    * uses `%` (sign-preserving remainder), not pmod — the oracle's `%` is
    * sign-preserving too, and the two must agree on negative ids. */
  def cohortTypePivot(events: DataFrame): DataFrame =
    events
      .groupBy((col("user_id") % lit(10)).as("cohort"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy("cohort")

  /** Generator / lateral view: explode tokens, global frequency table —
    * the word-count shape (explode → hash agg with map-side combine). */
  def tokenFrequencies(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))

  /** q54 — sessionization: a user's events split into sessions wherever the
    * gap since their previous event exceeds `gapSec` — the classic
    * training-pipeline / clickstream primitive. Plan: ONE shuffle on
    * user_id serves both window passes (gap flag via lag, session index
    * via running sum) and the final per-session aggregate — no self-join,
    * no per-session subquery, linear in the stream. All arithmetic is
    * exact integer micros, so the oracle comparison is structural. */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(lag("us", 1).over(w).isNull
          || col("us") - lag("us", 1).over(w) > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_s").over(cum))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("us").as("start_us"),
        max("us").as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy("user_id", "session_idx")
  }

  /** q173 — MERGE INTO / CDC APPLY: the Delta-Iceberg-style upsert the
    * reference's append-only sink never needed — a base snapshot
    * (customers) merged with a change log (events reinterpreted as CDC:
    * `error` = DELETE the key, anything else = UPSERT the key's balance
    * to that event's exact cents) under LAST-WRITER-WINS by the
    * (us, event_id) total order. Emits the post-merge snapshot with
    * provenance: per surviving key the balance, the change count, the
    * winning op (`base` for untouched rows), and whether the key was
    * born in the base or inserted by CDC.
    *
    * Scale shape: the winner per key is ONE lexicographic struct MAX
    * (the q109/q150 argmax idiom — never a rank window; the change log
    * collapses map-combinably before anything joins), then one co-keyed
    * FULL OUTER join against the base and a row-local CASE applies
    * upsert/delete/keep. Deletes of absent keys are no-ops; CDC inserts
    * of keys the base never had survive with src = 'cdc' — the full
    * MERGE matrix, each cell spec-pinned. */
  def cdcMerge(customer: DataFrame, events: DataFrame): DataFrame =
    cdcApply(customer, cdcCollapse(cdcChanges(events)))

  /** q173's change-log projection — shared with [[graft.streaming.StreamCdcMerge]]
    * so the CDC reinterpretation has exactly one definition. */
  private[graft] def cdcChanges(events: DataFrame): DataFrame =
    events.selectExpr(
      "user_id AS key",
      "unix_micros(ts) AS us", "event_id",
      "CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op",
      "CASE WHEN value IS NULL THEN CAST(NULL AS BIGINT) " +
        "ELSE CAST(round(value * 100) AS BIGINT) END AS cents")

  /** Per-key LWW collapse of a change log — the store shape the stream
    * maintainer persists per batch: `n_changes` SUMs across partials and
    * the winner struct `w` MAX-merges (lexicographic struct MAX over the
    * (us, event_id) total order is associative, so any segmentation of a
    * key's history collapses to the same winner). Map-combinable. */
  private[graft] def cdcCollapse(changes: DataFrame): DataFrame =
    changes.groupBy("key")
      .agg(count(lit(1)).as("n_changes"),
        max(struct(col("us"), col("event_id"), col("op"), col("cents"))).as("w"))

  /** The merge matrix applied to a collapsed change table — one co-keyed
    * FULL OUTER join against the base and a row-local CASE; shared
    * verbatim by batch q173 and the streamed snapshot so the two are
    * bit-equal by construction. */
  private[graft] def cdcApply(customer: DataFrame, collapsed: DataFrame): DataFrame = {
    val last = collapsed
      .selectExpr("key", "n_changes", "w.op AS last_op", "w.cents AS last_cents")
    val base = customer.selectExpr("c_custkey AS key",
      "CAST(round(c_acctbal * 100) AS BIGINT) AS base_cents")
    base.join(last, Seq("key"), "full_outer")
      .filter(coalesce(col("last_op"), lit("upsert")) =!= "delete")
      .selectExpr("key",
        "CASE WHEN last_op = 'upsert' THEN last_cents ELSE base_cents END AS balance_cents",
        "coalesce(n_changes, CAST(0 AS BIGINT)) AS n_changes",
        "coalesce(last_op, 'base') AS last_op",
        "CASE WHEN base_cents IS NULL THEN 'cdc' ELSE 'base' END AS src")
      .orderBy("key")
  }

  /** q187's robust flag radius: |x − median| > [[MadK]] · MAD. */
  val MadK = 3L

  /** q187 — ROBUST OUTLIER CENSUS (median / MAD): the statistical
    * upgrade of the reference's own fraud rule. The reference flags
    * `amount > 10000` (TransactionProcessor.java:15,39 — one fixed
    * global constant); the production flagger centers per DAY on the
    * exact median and scales by the exact median absolute deviation,
    * both order statistics a mean/stddev rule can't imitate (one whale
    * drags a mean; it moves a median by at most one rank). Everything
    * is exact integer cents: per day the lower median (rank ⌈n/2⌉), the
    * MAD from the |x − med| multiset, the robust flag count at
    * [[MadK]]·MAD, and — the graded comparison the upgrade argues for —
    * the fixed-threshold rule's count on the same day next to it.
    *
    * Scale shape: the corpus collapses ONCE to the (day, cents, n)
    * value-count table (map-combinable; bounded by days × distinct
    * values); both medians are cumulative selections over
    * day-partitioned windows on that BOUNDED table (the q112/q171
    * discipline — each partition holds one day's distinct values, never
    * raw rows); the flag counts ride broadcast joins of the ≤ days-row
    * dial back onto one more map-combinable pass. */
  def robustOutliers(events: DataFrame): DataFrame =
    robustFromCounts(robustValueCounts(events))

  /** q187's corpus collapse: the (day, cents, n) value-count table — ONE
    * map-combinable pass, bounded by days × distinct values. Shared with
    * [[graft.streaming.StreamRobustOutliers]], whose per-batch partials
    * are exactly this table for the batch's rows (counts are SUM-state:
    * partials over any split of the corpus sum to the whole). */
  private[graft] def robustValueCounts(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .selectExpr(s"unix_micros(ts) DIV $DayUs AS day",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .groupBy("day", "cents").agg(count(lit(1)).as("n"))

  /** q187's read stages — both exact medians, both flag rules — over an
    * already-collapsed (day, cents, n) table, so the batch query and the
    * streamed posture are bit-equal by construction. */
  private[graft] def robustFromCounts(counts: DataFrame): DataFrame = {
    val vc = counts
      .localCheckpoint() // bounded value-count table; read three times
    def lowerMedian(df: DataFrame, valueCol: String): DataFrame = {
      val w = Window.partitionBy("day").orderBy(valueCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("cum", sum("n").over(w))
        .withColumn("n_day", sum("n").over(Window.partitionBy("day")))
        .filter(col("cum") >= expr("(n_day + 1) DIV 2"))
        .groupBy("day").agg(min(valueCol).as("med"), max("n_day").as("n_day"))
    }
    val med = lowerMedian(vc, "cents")
      .selectExpr("day", "med AS med_cents", "n_day")
    val mad = lowerMedian(
        vc.join(broadcast(med), Seq("day"))
          .selectExpr("day", "abs(cents - med_cents) AS dev", "n")
          .groupBy("day", "dev").agg(sum("n").as("n")),
        "dev")
      .selectExpr("day", "med AS mad_cents")
    val dials = med.join(mad, Seq("day")) // ≤ days rows
    vc.join(broadcast(dials), Seq("day"))
      .groupBy("day")
      .agg(max("n_day").as("n_rows"),
        max("med_cents").as("med_cents"), max("mad_cents").as("mad_cents"),
        sum(when(expr(s"abs(cents - med_cents) > $MadK * mad_cents"), col("n"))
          .otherwise(lit(0L))).as("n_robust_flag"),
        sum(when(expr(
          s"cents > ${(EventOps.FraudThreshold * 100).toLong}"),
          col("n")).otherwise(lit(0L))).as("n_fixed_flag"))
      .selectExpr("day", "n_rows", "med_cents", "mad_cents",
        "n_robust_flag", "n_fixed_flag",
        "CAST(1000000 AS BIGINT) * n_robust_flag DIV n_rows AS robust_micro",
        "CAST(1000000 AS BIGINT) * n_fixed_flag DIV n_rows AS fixed_micro")
      .orderBy("day")
  }

  /** q213 — GROWTH ACCOUNTING: per day the active / new / returning user
    * split and the running cumulative distinct-user count — the product
    * dashboard row ("how many users have we EVER seen by day d") that
    * tempts a running COUNT(DISTINCT) window nobody can run at scale.
    * Decomposed into exact relational pieces instead: actives from the
    * per-(day, user) collapse; news from the FIRST-TOUCH collapse
    * (groupBy user, min(day) — each user counted on exactly one day);
    * cumulative uniques as a running SUM of news over the BOUNDED day
    * table, which is exact because distinct-ever(d) = Σ_{d'≤d} new(d')
    * (every user contributes once, on their first day).
    *
    * Scale shape: ONE corpus collapse to (day, user) (map-combinable
    * distinct), reused for both censuses; the running sum is a window
    * over ≤ days rows (never the corpus); the join is days-sized. */
  def growthAccounting(events: DataFrame): DataFrame = {
    val du = events.filter(col("user_id").isNotNull)
      .selectExpr(s"unix_micros(ts) DIV $DayUs AS day", "user_id")
      .distinct()
      .localCheckpoint() // |users × active-days| table; read twice
    val act = du.groupBy("day").agg(count(lit(1)).as("n_active"))
    val nw = du.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    act.join(nw, Seq("day"), "left_outer")
      .selectExpr("day", "n_active", "COALESCE(n_new, 0L) AS n_new")
      .withColumn("cum_users", sum("n_new").over(w))
      .selectExpr("day", "n_active", "n_new",
        "n_active - n_new AS n_returning", "cum_users")
      .orderBy("day")
  }

  /** q214's dial: a value is anomalous for its seasonal cell when its
    * deviation from the cell mean exceeds this multiple of the cell's
    * mean absolute deviation. */
  val SeasonalMadK = 4L

  /** q214 — SEASONAL PROFILE + DESEASONALIZED ANOMALIES: the calendar
    * structure q187's per-day posture is blind to — per (day-of-week ×
    * hour-of-day) cell the exact traffic moments (micro-scaled integer
    * mean, mean absolute deviation) and the count of observations
    * anomalous FOR THEIR CELL (a 3am value that is normal at 3pm). The
    * dow/hod keys come from shared integer epoch arithmetic
    * ((day + 4) % 7, 0 = Sunday — 1970-01-01 was a Thursday), never an
    * engine calendar function, so both engines bin identically.
    *
    * Scale shape: the q187 discipline — the corpus collapses ONCE to the
    * (dow, hod, cents, n) value-count table (bounded by 168 × distinct
    * values); moments, deviations, and the anomaly census are
    * map-combinable passes over that bounded table against a broadcast
    * 168-row dial. Int64 headroom: devs are micro-cents (≤ 5·10¹⁰ here);
    * the weighted dev sum stays exact past 10⁸ rows/cell — beyond that
    * the sums move to DECIMAL internally, same plan shape. */
  def seasonalCensus(events: DataFrame): DataFrame = {
    val vc = events.filter(col("value").isNotNull)
      .selectExpr(
        s"(unix_micros(ts) DIV $DayUs + 4) % 7 AS dow",
        s"(unix_micros(ts) DIV $HourUs) % 24 AS hod",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .groupBy("dow", "hod", "cents").agg(count(lit(1)).as("n"))
      .localCheckpoint() // bounded value-count table; read twice
    // Divisions render sign-OUTSIDE the floor (the q215/q218 law): Spark
    // DIV truncates toward zero while DuckDB // floors, so a NEGATIVE
    // dividend (a refunds-bearing corpus makes the cents sum negative)
    // would diverge by one micro and cascade into the MAD and the anomaly
    // census. sign(x)·(|x| div d) is engine-stable for every sign. The
    // MAD dividend is an abs-sum (provably nonnegative) — spelled the
    // same way so the law holds by inspection, not by domain argument.
    val mom = vc.groupBy("dow", "hod")
      .agg(sum("n").as("cn"), sum(expr("cents * n")).as("s"))
      .selectExpr("dow", "hod",
        """CASE WHEN s >= 0 THEN 1000000L * s DIV cn
                ELSE -((1000000L * -s) DIV cn) END AS mean_micro""")
    val census = vc.join(broadcast(mom), Seq("dow", "hod"))
      .selectExpr("dow", "hod", "n AS nv", "cents",
        "abs(cents * 1000000L - mean_micro) AS dev_micro")
      .groupBy("dow", "hod")
      .agg(sum(expr("dev_micro * nv")).as("dev_sum"),
        sum("nv").as("n_chk"))
      .selectExpr("dow", "hod",
        """CASE WHEN dev_sum >= 0 THEN dev_sum DIV n_chk
                ELSE -((-dev_sum) DIV n_chk) END AS mad_micro""")
    val dials = mom.join(census, Seq("dow", "hod")) // 168-row dial
    vc.join(broadcast(dials), Seq("dow", "hod"))
      .groupBy("dow", "hod")
      .agg(max(col("mean_micro")).as("mean_micro"),
        max(col("mad_micro")).as("mad_micro"),
        sum(col("n")).as("n_obs"),
        sum(when(
          expr(s"abs(cents * 1000000L - mean_micro) > $SeasonalMadK * mad_micro"),
          col("n")).otherwise(lit(0L))).as("n_anom"))
      .selectExpr("dow", "hod", "n_obs", "mean_micro", "mad_micro", "n_anom",
        "CAST(1000000 AS BIGINT) * n_anom DIV n_obs AS anom_micro")
      .orderBy("dow", "hod")
  }

  /** q217's dials: the truncated dyadic decay window (ages ≥ W days
    * contribute zero — the q162 exact-decay discipline) and the
    * leaderboard depth. */
  val DecayWindowDays = 8L
  val LeaderTopN = 10

  /** q217 — RECENCY-DECAYED LEADERBOARD: "who matters NOW" vs "who has
    * the biggest history" — the two rankings every popularity surface
    * conflates. Each user's decayed score is Σ n_day · 2^(W−1−age)
    * truncated at the [[DecayWindowDays]] window: an exact-integer
    * dyadic half-life (the q162 discipline — IEEE exp() would drift the
    * hash), so yesterday outweighs a week ago 128×, and both engines
    * agree bit-for-bit. The shipped artifact is the FULL-OUTER merge of
    * the decayed top-[[LeaderTopN]] and the raw-count top-N with both
    * scores filled for every surfaced user — the flips (`in_both` false)
    * are the product lesson: a faded whale drops off the live board
    * while a surging newcomer never shows on the all-time one.
    *
    * Scale shape: ONE corpus collapse to (user, day) counts; scores are
    * one map-combinable aggregate over that table against a one-row MAX
    * dial; both top-Ns plan as TakeOrdered over the per-user table; the
    * merge touches ≤ 2N rows. */
  def decayedLeaderboard(events: DataFrame): DataFrame = {
    val ud = events.filter(col("user_id").isNotNull)
      .selectExpr("user_id", s"unix_micros(ts) DIV $DayUs AS day")
      .groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    val d1 = ud.agg(max("day").as("d1"))
    val scored = ud.crossJoin(broadcast(d1))
      .selectExpr("user_id", "n",
        s"""CASE WHEN d1 - day < $DecayWindowDays
                 THEN shiftleft(n, CAST($DecayWindowDays - 1 - (d1 - day) AS INT))
                 ELSE 0L END AS dec""")
      .groupBy("user_id")
      .agg(sum("n").as("n_total"), sum("dec").as("decayed_score"))
      .localCheckpoint() // per-user table; two TakeOrdered reads + fill
    val byDec = Window.orderBy(desc("decayed_score"), col("user_id"))
    val topDec = scored.orderBy(desc("decayed_score"), col("user_id"))
      .limit(LeaderTopN)
      .withColumn("rank_decayed", row_number().over(byDec).cast("long"))
      .select("user_id", "rank_decayed")
    val byRaw = Window.orderBy(desc("n_total"), col("user_id"))
    val topRaw = scored.orderBy(desc("n_total"), col("user_id"))
      .limit(LeaderTopN)
      .withColumn("rank_raw", row_number().over(byRaw).cast("long"))
      .select("user_id", "rank_raw")
    topDec.join(topRaw, Seq("user_id"), "full_outer")
      .join(scored, Seq("user_id")) // fill both scores for every surfaced user
      .selectExpr("user_id", "rank_decayed", "rank_raw",
        "decayed_score", "n_total",
        "rank_decayed IS NOT NULL AND rank_raw IS NOT NULL AS in_both")
      .orderBy(expr(s"COALESCE(rank_decayed, ${LeaderTopN + 1})"),
        expr(s"COALESCE(rank_raw, ${LeaderTopN + 1})"), col("user_id"))
  }

  /** q218 — THEIL–SEN ROBUST TREND: the median-of-pairwise-slopes trend
    * estimator beside its OLS twin — the robust-regression answer to
    * "is daily volume growing", immune to the single whale day that
    * drags a least-squares fit. Slopes are exact milli-cents/day with
    * the sign applied OUTSIDE the floor division (negative floor vs
    * truncation is an engine trap — the q215 rule); the median is the
    * q187 value-count selection, never a sort of raw pairs; OLS is the
    * exact cross-multiplied rational (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
    * under the same sign-outside milli rendering, with days centered on
    * the min-day dial so every moment stays in int64.
    *
    * Scale shape: the corpus collapses ONCE to daily totals (bounded by
    * the day span); the pair table, the median selection, and the OLS
    * moments all live on that bounded table — at 100 TB the trend costs
    * one map-combinable aggregate. */
  def robustTrend(events: DataFrame): DataFrame = {
    val daily = events.filter(col("value").isNotNull)
      .selectExpr(s"unix_micros(ts) DIV $DayUs AS day",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .groupBy("day").agg(sum("cents").as("t"))
      .localCheckpoint() // ≤ days rows; pairs + OLS + dial
    val d0 = daily.agg(min("day").as("d0"))
    val slopes = daily.as("a").join(broadcast(daily.as("b")),
        col("a.day") < col("b.day"))
      .selectExpr("b.t - a.t AS num", "b.day - a.day AS den")
      .selectExpr(
        """CASE WHEN num >= 0 THEN 1000 * num DIV den
                ELSE -((1000 * -num) DIV den) END AS slope_milli""")
      .groupBy("slope_milli").agg(count(lit(1)).as("n"))
    val w = Window.orderBy("slope_milli")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = slopes
      .withColumn("cum", sum("n").over(w))
      .withColumn("n_pairs", sum("n").over(
        Window.partitionBy(lit(1))))
      .filter(col("cum") >= expr("(n_pairs + 1) DIV 2"))
      .groupBy("n_pairs")
      .agg(min("slope_milli").as("theilsen_milli"))
    val ols = daily.crossJoin(broadcast(d0))
      .selectExpr("day - d0 AS x", "t")
      .agg(count(lit(1)).as("n_days"), sum("x").as("sx"), sum("t").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * t")).as("sxy"))
      .selectExpr("n_days",
        "n_days * sxy - sx * sy AS onum", "n_days * sxx - sx * sx AS oden")
      .selectExpr("n_days",
        """CASE WHEN oden = 0 THEN CAST(NULL AS BIGINT)
                WHEN onum >= 0 THEN 1000 * onum DIV oden
                ELSE -((1000 * -onum) DIV oden) END AS ols_milli""")
    ols.crossJoin(broadcast(med))
      .selectExpr("n_days", "n_pairs", "theilsen_milli", "ols_milli",
        "abs(theilsen_milli - ols_milli) AS disagreement_milli")
  }

  /** q222 — COHORT LTV CURVE: the revenue twin of the q138 retention
    * triangle — per acquisition cohort (a user's first-touch day, the
    * q213 primitive) and cohort-age, the cumulative revenue per
    * cohort member: the "how much is a day-d user worth by age a" curve
    * growth teams steer by. Exact integers end to end: cents summed per
    * (cohort, age) cell, the running total over age per cohort, and the
    * per-member value as a floor'd micro ratio. Two laws ride the
    * artifact: the running total is non-decreasing in age per cohort
    * (`monotone_ok` — cents are nonnegative here; a refunds-bearing
    * corpus would drop the law, not the op), and the last ages' totals
    * sum to the corpus revenue (`conservation_ok`, graded once).
    *
    * Scale shape: first-touch is one (user, min day) collapse; the
    * cohort tag rides a co-keyed user join back onto the corpus (both
    * sides shuffled once on user_id — at 100 TB this is the sort-merge
    * on the natural key); the (cohort, age) matrix is one
    * map-combinable aggregate bounded by days², and the running total
    * is a window over that bounded matrix, never raw rows. */
  def cohortLtv(events: DataFrame): DataFrame = {
    val base = events.filter(col("user_id").isNotNull && col("value").isNotNull)
      .selectExpr("user_id", s"unix_micros(ts) DIV $DayUs AS day",
        "CAST(round(value * 100) AS BIGINT) AS cents")
    val ft = base.groupBy("user_id").agg(min("day").as("cohort"),
      count(lit(1)).as("_n")).drop("_n")
    val sizes = ft.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    val cells = base.join(ft, "user_id")
      .selectExpr("cohort", "day - cohort AS age", "cents")
      .groupBy("cohort", "age")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
    val byAge = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = cells
      .withColumn("cum_cents", sum("cents").over(byAge))
      .withColumn("prev_cum", lag("cum_cents", 1).over(
        Window.partitionBy("cohort").orderBy("age")))
      .join(broadcast(sizes), "cohort")
      .selectExpr("cohort", "age", "cohort_users", "n_events", "cents",
        "cum_cents",
        "CAST(1000000 AS BIGINT) * cum_cents DIV cohort_users AS ltv_micro",
        "COALESCE(cum_cents >= prev_cum, true) AS monotone_ok")
      .localCheckpoint() // bounded days² matrix; shipped + the law rider
    val lastPerCohort = curve
      .groupBy("cohort").agg(max("cum_cents").as("final_cum"))
      .agg(sum("final_cum").as("matrix_total"))
    val conserve = lastPerCohort
      .crossJoin(broadcast(base.agg(sum("cents").as("corpus_total"))))
      .selectExpr("matrix_total = corpus_total AS conservation_ok")
    curve.crossJoin(broadcast(conserve))
      .selectExpr("cohort", "age", "cohort_users", "n_events", "cents",
        "cum_cents", "ltv_micro", "monotone_ok", "conservation_ok")
      .orderBy("cohort", "age")
  }

  /** q220's pivot column dial: the TPC-H order-status domain. The pivot
    * drops values outside its column list SILENTLY — so the census
    * carries an `n_unseen` column (graded 0 on this corpus) that turns a
    * broken dial into a visible red number instead of vanished rows. For
    * the guarantee to be total, the unseen census joins FULL-OUTER: a
    * priority whose rows ALL carry out-of-dial statuses never enters the
    * pivot side at all, and a left join FROM the pivot would vanish it
    * together with its n_unseen — exactly the silent drop the column
    * exists to surface. */
  val PivotStatuses: Seq[String] = Seq("F", "O", "P")

  /** q220 — PIVOT / CONTINGENCY CENSUS: the crosstab every BI layer
    * asks for (status columns × priority rows, exact counts via Spark's
    * native PIVOT operator with an explicit column list — never the
    * dial-free overload, which adds a hidden corpus pass to discover
    * columns and makes the output schema data-dependent), with row/
    * column margins, the conservation law (Σ margins = N, graded), and
    * per row the maximum INDEPENDENCE DEVIATION — max_j |n_ij·N −
    * r_i·c_j| / (r_i·c_j) as a floor'd micro integer (the χ²-style
    * association signal without IEEE): 0 means the row's status mix is
    * exactly the corpus mix.
    *
    * Scale shape: the pivot is ONE map-combinable aggregate (counts
    * fan out to a fixed column list row-locally — the Expand shape);
    * margins and the unseen census are bounded aggregates; the
    * deviation math runs on the 5-row pivoted table against a one-row
    * broadcast dial, cross-multiplied in DECIMAL(38,0), shipped
    * BIGINT. */
  def pivotCensus(orders: DataFrame): DataFrame = {
    val in = orders.selectExpr("o_orderpriority AS prio", "o_orderstatus AS st")
    val piv = in.filter(col("st").isin(PivotStatuses: _*))
      .groupBy("prio").pivot("st", PivotStatuses).agg(count(lit(1)))
      .select(col("prio") +:
        PivotStatuses.map(s =>
          coalesce(col(s), lit(0L)).as(s"n_${s.toLowerCase}")): _*)
    val unseen = in
      .filter(col("st").isNull || !col("st").isin(PivotStatuses: _*))
      .groupBy("prio").agg(count(lit(1)).as("n_unseen"))
    val colSums = PivotStatuses.map(s =>
      sum(when(col("st") === s, 1L).otherwise(0L)).as(s"c_${s.toLowerCase}"))
    val dial = in.agg(colSums.head, (colSums.tail :+
      sum(when(col("st").isin(PivotStatuses: _*), 1L).otherwise(0L))
        .as("n_all")): _*)
    val rowTotal = PivotStatuses.map(s => s"n_${s.toLowerCase}").mkString(" + ")
    val devs = PivotStatuses.map { s =>
      val (n, c) = (s"n_${s.toLowerCase}", s"c_${s.toLowerCase}")
      s"""CASE WHEN row_total = 0 OR $c = 0 THEN CAST(NULL AS BIGINT)
              ELSE CAST(CAST(1000000 AS DECIMAL(38,0))
                        * abs($n * n_all - row_total * $c)
                        DIV (row_total * $c) AS BIGINT) END"""
    }.mkString("greatest(", ", ", ")")
    val rows = piv.join(unseen, Seq("prio"), "full_outer")
      .selectExpr(Seq("prio") ++
        PivotStatuses.map(s =>
          s"COALESCE(n_${s.toLowerCase}, 0L) AS n_${s.toLowerCase}") :+
        "COALESCE(n_unseen, 0L) AS n_unseen": _*)
      .crossJoin(broadcast(dial))
      .withColumn("row_total", expr(rowTotal))
      .withColumn("max_dev_micro", expr(devs))
      .localCheckpoint() // 5 rows; shipped AND feeds the conservation law
    val conserve = rows.agg(sum("row_total").as("rt_sum"),
        max("n_all").as("na"))
      .selectExpr("rt_sum = na AS conservation_ok")
    rows.crossJoin(broadcast(conserve))
      .selectExpr(Seq("prio") ++ PivotStatuses.map(s => s"n_${s.toLowerCase}") ++
        Seq("n_unseen", "row_total", "n_all", "max_dev_micro",
          "conservation_ok"): _*)
      .orderBy("prio")
  }

  /** q183's version count: snapshots at quarter points of the log's
    * time span. */
  val TimeTravelVersions = 4

  /** q183 — TIME TRAVEL / SNAPSHOT AS OF: the read side of the q173
    * merge — a lakehouse table at version v is the base plus the PREFIX
    * of the change log up to v's cutoff, so "AS OF" needs no stored
    * snapshots at all: one LWW collapse of the truncated log and the
    * same merge matrix. Four versions at quarter points of the log's
    * span ship as one artifact; the last version is, by construction,
    * exactly q173's current table (spec-pinned), and intermediate
    * versions witness keys being born, deleted, and resurrected as the
    * cutoff sweeps forward — the semantics Delta/Iceberg time travel
    * promises, graded.
    *
    * Scale shape: per version ONE map-combinable collapse of the
    * filtered log (the filter is a pushed-down range predicate on ts —
    * at 100 TB it prunes partitions) and one co-keyed outer join; the
    * cutoffs are a one-row min/max dial. Versions never read each
    * other. */
  def cdcTimeTravel(customer: DataFrame, events: DataFrame): DataFrame = {
    val b = events.agg(min(unix_micros(col("ts"))).as("t0"),
      max(unix_micros(col("ts"))).as("t1")).collect()(0)
    val (t0, t1) = (b.getLong(0), b.getLong(1))
    val snaps = (1 to TimeTravelVersions).map { v =>
      val cutoff = t0 + (t1 - t0) * v / TimeTravelVersions
      cdcApply(customer,
        cdcCollapse(cdcChanges(events.filter(unix_micros(col("ts")) <= cutoff))))
        .selectExpr(s"CAST($v AS BIGINT) AS version", "key", "balance_cents",
          "n_changes", "last_op", "src")
    }
    snaps.reduce(_ unionByName _).orderBy("version", "key")
  }

  /** q171's price-bucket width (exact cents) for the skyline's grid
    * pruning. */
  val SkylineBucketCents = 1000L

  /** q171 — 2-D SKYLINE (Pareto frontier): the parts no other part beats
    * on BOTH price (minimize, exact cents) and size (maximize) — the
    * multi-objective shortlist query (cheapest-for-its-size staircase)
    * that relational engines don't ship as an operator and naive SQL
    * writes as an all-pairs NOT EXISTS. Planned scalably as the classic
    * grid decomposition:
    *
    *  1. collapse to distinct (price, size) combos (map-combinable, with
    *     multiplicity — an exact duplicate cannot dominate its twin, so
    *     duplicates survive together);
    *  2. per price-bucket, the local skyline via ONE bucket-partitioned
    *     window: sorted by (price ASC, size DESC), a combo survives iff
    *     the running max size over STRICTLY EARLIER rows is below its
    *     own (every potential in-bucket dominator sorts earlier — equal
    *     prices order bigger-size first, and distinctness rules out full
    *     ties);
    *  3. across buckets, a bounded prefix table (per-bucket max size,
    *     cumulated over strictly cheaper buckets via the q108 bounded
    *     self-join) kills every combo an earlier bucket dominates —
    *     earlier-bucket prices are strictly cheaper BY CONSTRUCTION, so
    *     `size ≤ prefix_max` is exact dominance, not a heuristic.
    *
    * A later bucket can never dominate (its prices are strictly higher),
    * so (2) ∧ (3) IS the exact skyline — graded against the bare
    * NOT-EXISTS definition, which proves the decomposition complete and
    * precise. The only window is bucket-partitioned (the q112
    * discipline); everything else is bounded. */
  def skylineParts(part: DataFrame): DataFrame = {
    val w = SkylineBucketCents
    val pts = part
      .filter(col("p_retailprice").isNotNull && col("p_size").isNotNull)
      .selectExpr("CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents",
        "CAST(p_size AS BIGINT) AS part_size")
      .groupBy("price_cents", "part_size").agg(count(lit(1)).as("n_parts"))
      .withColumn("bucket", expr(s"price_cents DIV $w"))
      .localCheckpoint() // consumed by the window pass + the prefix table
    val ws = Window.partitionBy("bucket")
      .orderBy(col("price_cents").asc, col("part_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = pts
      .withColumn("run_max", max("part_size").over(ws))
      .filter(col("run_max").isNull || col("run_max") < col("part_size"))
    val bmax = pts.groupBy("bucket").agg(max("part_size").as("bmax"))
      .localCheckpoint() // bounded by price-range/width
    val prefix = bmax.as("x").join(broadcast(bmax.as("y")),
        col("y.bucket") < col("x.bucket"), "left")
      .groupBy(col("x.bucket").as("bucket"))
      .agg(max(col("y.bmax")).as("prefix_max"))
    local.join(broadcast(prefix), Seq("bucket"))
      .filter(col("prefix_max").isNull || col("prefix_max") < col("part_size"))
      .select("price_cents", "part_size", "n_parts")
      .orderBy("price_cents")
  }

  /** q170 — TIME-WEIGHTED AVERAGE (TWAP) per user: the mean of `value`
    * where each observation is weighted by how long it REMAINED the
    * latest observation — Σ cents·Δµs / Σ Δµs over consecutive-event
    * gaps — the financial/metering aggregate a plain AVG silently gets
    * wrong whenever sampling is irregular (a price held for an hour
    * counts an hour, not one tick). The last event holds no interval
    * and contributes no mass; single-event users emit NULL. Everything
    * is exact integers: the numerator runs in DECIMAL(38,0)/HUGEINT
    * (cents × µs × events overflows int64 on long timelines), the
    * shipped `twap_milli` is one exact floor division, and the raw
    * num/den pair is emitted so any downstream re-weighting stays exact.
    *
    * Plan: one user_id shuffle serves the lead window (the q144 total
    * order) and the per-user fold — no self-join, no second pass.
    * Null-value rows are EXCLUDED up front (a null price holds nothing);
    * the interval then spans to the next PRICED event, which is the
    * standard last-observation-carried-forward reading. */
  def twapPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events.filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("dur_us", lead("us", 1).over(w) - col("us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_priced"),
        (max("us") - min("us")).as("span_us"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * dur_us")).as("num"),
        sum("dur_us").as("den_us"))
      .selectExpr("user_id", "n_priced", "span_us",
        // Ship int64, never the raw wide decimal: the numerator fits
        // BIGINT with >100x headroom at graded scales and ANSI mode
        // overflows loudly if that ever stops holding. The wide type
        // stays internal to the SUM.
        "CAST(num AS BIGINT) AS twap_num",
        "den_us AS twap_den_us",
        """CASE WHEN den_us IS NULL OR den_us = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(CAST(1000 AS DECIMAL(38,0)) * num DIV den_us AS BIGINT)
           END AS twap_milli""")
      .orderBy("user_id")
  }

  /** q190 — REGULAR-GRID RESAMPLE WITH FORWARD FILL: every (user, hour)
    * cell of the corpus's global hourly grid carries the user's last
    * observed value at or before that hour (NULL until the first
    * observation) plus the cell's observation count — `GROUP BY
    * time(1h) fill(previous)`, the query Grafana renders every
    * time-series panel from and the gap-filling InfluxDB serves the
    * reference's dashboard with (reference README.md:2,14-15: Grafana
    * over the fraud-detection InfluxDB bucket). q170's TWAP weights by
    * holding time; this materializes the held series itself.
    *
    * Scale shape: the corpus collapses ONCE map-combinably to per-(user,
    * hour) last-observation cells — the winner is a lexicographic struct
    * MAX over the (us, event_id) total order (the q173 idiom), never a
    * window over raw rows. The grid is the product of two DIALS (the
    * distinct-user table × the global [min, max] hour span from one
    * broadcast row), so its size is users × hours regardless of row
    * count, and the only window — the forward fill — runs per user over
    * that bounded grid (≤ hours rows per partition). */
  def resampleFill(events: DataFrame): DataFrame =
    resampleFromCells(resampleCells(events))

  /** q190's corpus collapse: per-(user, hour) observation count and the
    * winning (us, event_id, cents) struct — ONE map-combinable pass.
    * Shared with [[graft.streaming.StreamResample]]: the struct MAX is
    * associative, commutative, AND idempotent, and the count is SUM
    * state, so per-batch cell partials merge into the standing store by
    * the same (MAX, SUM) fold this aggregate already is. */
  private[graft] def resampleCells(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .selectExpr("user_id", s"unix_micros(ts) DIV $HourUs AS hour",
        "unix_micros(ts) AS us", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .groupBy("user_id", "hour")
      .agg(count(lit(1)).as("n_obs"),
        max(struct(col("us"), col("event_id"), col("cents"))).as("w"))

  /** q190's read stages — dial grid + forward fill — over an
    * already-collapsed cell table, so the batch query and the streamed
    * panel are bit-equal by construction. */
  private[graft] def resampleFromCells(cells: DataFrame): DataFrame = {
    val obs = cells
      .selectExpr("user_id", "hour", "n_obs", "w.cents AS c")
      .localCheckpoint() // bounded (users × active hours); read three ways
    val span = obs.agg(min("hour").as("h0"), max("hour").as("h1"))
    val grid = obs.select("user_id").distinct()
      .crossJoin(broadcast(span))
      .selectExpr("user_id", "explode(sequence(h0, h1)) AS hour")
    val w = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "hour"), "left")
      .withColumn("cents_ffill", last(col("c"), ignoreNulls = true).over(w))
      .selectExpr("user_id", "hour",
        "coalesce(n_obs, CAST(0 AS BIGINT)) AS n_obs", "cents_ffill")
      .orderBy("user_id", "hour")
  }

  /** q191 — COUNTER RATE (PromQL `rate()` semantics, exact): per user,
    * every consecutive observation pair ordered by the (us, event_id)
    * total order yields its time delta, its INCREASE under counter-reset
    * handling — a drop below the previous value means the counter
    * restarted, so the increase is the new value itself, not a negative
    * delta — and the micro-scaled per-second rate. This is the other
    * query a monitoring dashboard renders (q190 materializes the held
    * series; this derives its slope), and the reset taxonomy is the part
    * engines get subtly wrong.
    *
    * All exact integers: the rate is `increase·10¹² DIV dt_us`
    * (micro-cents-per-second; ≤ 10¹⁷ at graded value ranges — ANSI
    * overflows loudly if the headroom ever goes), NULL when two
    * observations share a microsecond (a zero interval has no slope).
    * Scale shape: ONE user-partitioned lag window over the observation
    * rows — the q152/q29 class — and nothing else; no self-join, no
    * corpus-wide sort (the final orderBy is presentation). */
  def counterRate(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events.filter(col("value").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("prev_cents", lag("cents", 1).over(w))
      .filter(col("prev_us").isNotNull)
      .selectExpr("user_id", "us", "event_id",
        "us - prev_us AS dt_us",
        "cents < prev_cents AS reset",
        "CASE WHEN cents < prev_cents THEN cents ELSE cents - prev_cents END AS increase_cents")
      .selectExpr("user_id", "us", "event_id", "dt_us", "reset", "increase_cents",
        """CASE WHEN dt_us = 0 THEN CAST(NULL AS BIGINT)
                ELSE increase_cents * CAST(1000000000000 AS BIGINT) DIV dt_us
           END AS rate_micro""")
      .orderBy("user_id", "us", "event_id")
  }

  /** q192's `for:` duration — an alert must hold this long before it
    * fires (12 h; observation cadence is ~11 h at every graded scale, so
    * single-observation spikes stay pending and multi-observation runs
    * fire — both branches populated). */
  val AlertForUs: Long = 12L * 3600000000L

  /** q192 — ALERT RULE EVALUATION with `for:` duration (the Prometheus /
    * Grafana alert semantics): the reference fires on every over-threshold
    * transaction instantly (TransactionProcessor.java:39); a production
    * alert rule holds the condition PENDING until it has been
    * continuously true for [[AlertForUs]], then fires AT the first
    * observation where the holding time is reached. Per user, maximal
    * runs of consecutive over-threshold observations (the q165
    * gaps-and-islands machinery under the (us, event_id) total order)
    * ship as one row each: span, observation count, the fired verdict,
    * and `fire_us` — NULL while pending, else the pending→firing
    * transition instant. `fired ⟺ fire_us IS NOT NULL ⟺ duration ≥ for`
    * by construction (the last observation reaches the holding time
    * exactly when the span does). Completes the monitoring trilogy:
    * q190 renders the series, q191 its slope, q192 the alert.
    *
    * Scale shape: two user-partitioned windows over observation rows
    * (island id = running count of run starts; island start = MIN over
    * the island partition) and one bounded groupBy — the q165 class; no
    * self-join, no corpus sort. */
  def alertFiring(events: DataFrame): DataFrame = {
    val thr = (EventOps.FraudThreshold * 100).toLong
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val obs = events.filter(col("value").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        s"CAST(round(value * 100) AS BIGINT) > $thr AS ov")
      .withColumn("pov", lag("ov", 1).over(w))
      .withColumn("island", sum(
        when(col("ov") && (col("pov").isNull || !col("pov")), 1L)
          .otherwise(0L)).over(w))
      .filter(col("ov"))
    obs
      .withColumn("start_us",
        min("us").over(Window.partitionBy("user_id", "island")))
      .groupBy("user_id", "island")
      .agg(min("us").as("start_us2"), max("us").as("end_us"),
        count(lit(1)).as("n_obs"),
        min(when(col("us") >= col("start_us") + lit(AlertForUs), col("us")))
          .as("fire_us"))
      .selectExpr("user_id", "island", "start_us2 AS start_us", "end_us",
        "n_obs", "end_us - start_us2 AS duration_us",
        "fire_us IS NOT NULL AS fired", "fire_us")
      .orderBy("user_id", "island")
  }

  /** q209 — DOLLAR-WEIGHTED MEDIAN (mass-weighted quantile): the value
    * that splits a day's dollar VOLUME in half, beside the count median
    * that splits its transactions — the pair every finance desk reads
    * together, because on a heavy-tailed book they disagree wildly (on
    * this corpus the weighted median runs 1.5–3.9× the count median —
    * most transactions are small, most DOLLARS travel in large ones;
    * shipped as the exact `wm_over_cm_micro` ratio, the tail-heaviness
    * evidence in one number). Both medians are lower medians: the
    * smallest value whose cumulative mass (dollar mass resp. count)
    * reaches half the day's total — exact integers throughout.
    *
    * Scale shape: the q187 discipline verbatim — the corpus collapses
    * ONCE to the shared bounded (day, cents, n) value-count table
    * ([[robustValueCounts]]); both cumulative selections are
    * day-partitioned windows over that bounded table, never raw rows. */
  def weightedMedian(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("day").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("day")
    robustValueCounts(events)
      .withColumn("cm", sum(expr("cents * n")).over(w))
      .withColumn("cn", sum("n").over(w))
      .withColumn("tm", sum(expr("cents * n")).over(tot))
      .withColumn("tn", sum("n").over(tot))
      .groupBy("day")
      .agg(max("tn").as("n_obs"), max("tm").as("total_cents"),
        min(when(expr("2 * cm >= tm"), col("cents"))).as("wmedian_cents"),
        min(when(expr("2 * cn >= tn"), col("cents"))).as("cmedian_cents"))
      .selectExpr("day", "n_obs", "total_cents", "wmedian_cents",
        "cmedian_cents",
        "1000000 * wmedian_cents DIV cmedian_cents AS wm_over_cm_micro",
        "wmedian_cents >= cmedian_cents AS tail_heavy")
      .orderBy("day")
  }

  /** q211's shipped depth. */
  val JourneyTopN = 20

  /** q211 — JOURNEY PATH CENSUS: the top event-type TRIGRAMS across
    * user histories — the product-analytics "what paths do users
    * actually walk" question q144's transition matrix cannot answer
    * (a Markov matrix multiplies bigrams under an independence
    * assumption; real paths are counted, not reconstructed). Per
    * trigram under each user's (us, event_id) total order: total
    * occurrences, distinct walkers, and the rank; ships the top
    * [[JourneyTopN]] with a deterministic (count DESC, path ASC) order.
    *
    * Scale shape: two lag windows per user (the q191/q152 class — one
    * user_id shuffle serves both), row-local concat, one map-combinable
    * count with an exact distinct-user count per path (bounded by the
    * event-type³ domain), and the final top-N as TakeOrderedAndProject
    * — never a global sort. */
  def journeyCensus(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events.selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type")
      .withColumn("p1", lag("event_type", 1).over(w))
      .withColumn("p2", lag("event_type", 2).over(w))
      .filter(col("p2").isNotNull)
      .selectExpr("user_id",
        "concat_ws(' > ', p2, p1, event_type) AS path")
      .groupBy("path")
      .agg(count(lit(1)).as("n_walks"), countDistinct("user_id").as("n_users"))
      .orderBy(desc("n_walks"), col("path")).limit(JourneyTopN)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("n_walks"), col("path"))).cast("long"))
      .select("rank", "path", "n_walks", "n_users")
      .orderBy("rank")
  }

  /** q210's concentration dial: the antitrust "highly concentrated"
    * line — HHI above 0.25 of the squared-shares scale (2500 points on
    * the 10000-point convention), floor'd micro. */
  val HhiConcentratedMicro = 250000L

  /** q210 — MARKET CONCENTRATION CENSUS: per nation, how concentrated
    * is supplier revenue — the antitrust/risk trio computed EXACTLY:
    * Herfindahl–Hirschman (Σ share² — cross-multiplied integers,
    * `10⁶·Σr² DIV R²`, never a floating share), the discrete Gini
    * (`(2·Σ i·r₍ᵢ₎ − (n+1)·R) · 10⁶ DIV (n·R)` over revenues ranked
    * ascending — 0 for a monopoly-of-one by the formula itself, → 1 as
    * one supplier takes everything), and the top-1 share; verdict at
    * the [[HhiConcentratedMicro]] line. Wide products ride
    * DECIMAL(38,0) internally and ship BIGINT (the q170 discipline).
    *
    * Scale shape: revenue collapses map-combinably per supplier (the
    * only corpus-scale pass); ranking windows run per nation over the
    * SUPPLIER DIMENSION (bounded, like every dimension window in the
    * repo); equal revenues permute ranks without moving Σ i·r, so the
    * artifact is deterministic without a tiebreak argument — the
    * (r, s_suppkey) order just makes it obvious. */
  def concentrationCensus(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val rev = lineitem
      .selectExpr("l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents")
      .groupBy("l_suppkey").agg(sum("cents").as("r"))
      .join(broadcast(supplier.selectExpr("s_suppkey",
        "CAST(s_nationkey AS BIGINT) AS nat")),
        col("l_suppkey") === col("s_suppkey"))
    val byNat = Window.partitionBy("nat").orderBy("r", "s_suppkey")
    rev.withColumn("i", row_number().over(byNat).cast("long"))
      .groupBy("nat").agg(
        count(lit(1)).as("n"), sum("r").as("rr"),
        sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("sum_r2"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * r")).as("sum_ir"),
        max("r").as("max_r"))
      .selectExpr("nat", "n", "rr AS total_cents",
        "CAST(1000000 * sum_r2 DIV (CAST(rr AS DECIMAL(38,0)) * rr) AS BIGINT) AS hhi_micro",
        "CAST((2 * sum_ir - CAST(n + 1 AS DECIMAL(38,0)) * rr) * 1000000 " +
          "DIV (CAST(n AS DECIMAL(38,0)) * rr) AS BIGINT) AS gini_micro",
        "1000000 * max_r DIV rr AS top1_micro")
      .selectExpr("nat", "n", "total_cents", "hhi_micro", "gini_micro",
        "top1_micro",
        s"hhi_micro > $HhiConcentratedMicro AS concentrated")
      .orderBy("nat")
  }

  /** q193's CUSUM dials: the reference slack (target mean 5000¢ + the
    * allowance 2500¢ — deviations below it decay the statistic, the
    * standard k-allowance that keeps in-control noise from accumulating)
    * and the alarm threshold h in exact cents. Sized against the graded
    * corpora (mean ≈ 5000¢) so BOTH branches are populated at every
    * scale: at sf0.001 one user's burst crosses h while 14 stay quiet. */
  val CusumSlackCents: Long = 7500L
  val CusumAlarmCents: Long = 25000L

  /** q193 — CUSUM DRIFT DETECTION (Page's cumulative-sum chart): the
    * sequential change-point statistic that completes the monitoring
    * suite — q187 flags single outliers, q192 fires on a LEVEL held over
    * a threshold, CUSUM catches a persistent upward SHIFT no single
    * observation reveals (each transaction modestly high, the drift only
    * visible cumulatively — the low-and-slow fraud pattern the
    * reference's fixed per-transaction rule is structurally blind to).
    * Per user under the (us, event_id) total order:
    * `S_i = max(0, S_{i-1} + (cents_i − slack))`, alarm when
    * `S_i ≥ h`.
    *
    * The recursion is NOT computed recursively: with prefix sums
    * `P_i = Σ_{j≤i}(cents_j − slack)` the fold has the closed form
    * `S_i = P_i − min(0, min_{j≤i} P_j)` (subtracting the running
    * minimum restarts the sum exactly where the clamp would have), so
    * both engines spell it as two user-partitioned running windows over
    * observation rows — the q165/q192 class; no self-join, no UDF fold,
    * no corpus sort. All exact integer cents; the windowed SUM is BIGINT
    * on Spark and HUGEINT on DuckDB, cast at ship time (the q170
    * ship-type lesson). [[graft.streaming.StreamCusum]] maintains the
    * same statistic in-flight with O(1) per-key state — (P, min P) is
    * exactly the left-fold state the closed form exposes. */
  def cusumDrift(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.filter(col("value").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .withColumn("pre", sum(col("cents") - lit(CusumSlackCents)).over(w))
      .withColumn("cusum", col("pre") - least(lit(0L), min("pre").over(w)))
      .selectExpr("user_id", "us", "event_id", "cents", "cusum",
        s"cusum >= $CusumAlarmCents AS alarm")
      .orderBy("user_id", "us", "event_id")
  }

  /** q168's experiment dials: the arm salt (a named experiment id so a
    * second experiment draws independently) and the two-sided 5%
    * critical value, written as the exact decimal text both engines
    * parse to the same double. */
  val AbExperimentId = "exp1"
  val AbZCrit = "1.96"
  /** Conversion = a purchase of at least this many exact cents — a rare
    * event (~3% of users at test scales), so the census is non-degenerate
    * where a purchased-at-all rule saturates to p = 1 on every arm. */
  val AbConvCents = 30000L

  /** q168 — A/B EXPERIMENT CENSUS: users dealt to arms by a replay-safe
    * md5 draw on (experiment id, user) — the assignment rule an
    * experimentation platform ships, never `rand()` — and the classic
    * two-proportion pooled z-test on conversion (did the user ever
    * purchase), computed from exact integer counts through one
    * fixed-shape IEEE expression (the q147 z-score discipline). The
    * graded artifact is one census row: per-arm user/conversion counts
    * (exact), the rates, the pooled z, and the 5% two-sided verdict —
    * deterministic per corpus because the assignment is md5, so
    * `significant` is a stable graded fact. With assignment independent
    * of behavior the verdict should be (and is) null-effect at every
    * test scale; a biased deal or a broken count flips it.
    *
    * Scale shape: ONE user-keyed collapse of the corpus (map-combinable
    * MAX for converted), arm + draw row-local, then a 2-row aggregate
    * folded to one census row. Degenerate arms (either n = 0, or a
    * pooled rate of 0 or 1) yield NULL z and a false verdict rather
    * than NaN. */
  def abTestCensus(events: DataFrame): DataFrame = {
    val users = events
      .selectExpr("CAST(user_id AS STRING) AS uk",
        "CASE WHEN event_type = 'purchase' AND value IS NOT NULL " +
          s"AND CAST(round(value * 100) AS BIGINT) >= $AbConvCents " +
          "THEN 1L ELSE 0L END AS conv")
      .groupBy("uk").agg(max("conv").as("converted"))
      .withColumn("arm",
        PipelineOps.md5Prefix48(concat(lit(AbExperimentId + ":"), col("uk"))) % 2)
    users.agg(
        count(when(col("arm") === 0, 1)).as("n_a"),
        sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("conv_a"),
        count(when(col("arm") === 1, 1)).as("n_b"),
        sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("conv_b"))
      .selectExpr("n_a", "conv_a", "n_b", "conv_b",
        "CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a",
        "CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b",
        """CASE WHEN n_a = 0 OR n_b = 0
                 OR conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                THEN CAST(NULL AS DOUBLE)
                ELSE (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                            * (1e0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                            * (1e0 / CAST(n_a AS DOUBLE) + 1e0 / CAST(n_b AS DOUBLE)))
           END AS z""")
      .selectExpr("n_a", "conv_a", "n_b", "conv_b", "p_a", "p_b", "z",
        s"CASE WHEN z IS NULL THEN false ELSE abs(z) > $AbZCrit END AS significant")
  }

  /** q196's rule book: two Wald hypothesis pairs with their per-user
    * log-likelihood steps as FIXED micro-scaled integer dials —
    * `up = ⌊10⁶·ln(p₁/p₀)⌉` on a conversion, `down` on a miss —
    * because runtime `ln` is IEEE-rounded differently per engine and the
    * walk compares against an exact boundary: one ulp at a crossing
    * silently moves the decision sample. With a true conversion rate
    * ~3% at graded scales, `uplift` (1% vs 3%) drifts positive (accepts
    * H₁ once enough users arrive) and `overclaim` (3% vs 9%) drifts
    * negative (accepts H₀) — one artifact shows both terminations plus
    * `continue` at small scales. Boundary: α = β = 0.05 →
    * A = ⌊10⁶·ln((1−β)/α)⌉ = ln 19, symmetric. */
  val SprtRules: Seq[(String, Long, Long)] = Seq(
    ("uplift", 1098612L, -20409L),    // p0 = 1%, p1 = 3%
    ("overclaim", 1098612L, -63851L)) // p0 = 3%, p1 = 9%
  val SprtBoundMicro: Long = 2944439L

  /** q196 — SEQUENTIAL PROBABILITY RATIO TEST (Wald's SPRT): the
    * sequential sibling of q168's fixed-horizon z-test — the production
    * experimentation question is not "is the effect significant on ALL
    * the data" but "how EARLY could the experiment have stopped":
    * per arm and hypothesis pair, users enter in first-seen order, each
    * conversion outcome moves the log-likelihood walk by its exact
    * integer step, and the test terminates at the FIRST boundary
    * crossing — accept H₁ at +A, accept H₀ at −A, `continue` if the
    * walk never leaves (A, −A). Ships per (rule, arm): user/conversion
    * counts, the final walk value, the decision, the decision sample
    * size (how many users the sequential test needed — the number the
    * method exists for), and the walk value at that instant.
    *
    * Scale shape: ONE map-combinable user collapse (first-seen MIN,
    * converted MAX — q168's discipline), the md5 arm deal row-local, a
    * 2-row broadcast rule book, and the walk as a cumulative window
    * partitioned by (rule, arm) over USERS — sequential within an arm
    * by definition (that is what "sequential test" means), parallel
    * across rules × arms; the decision row join broadcasts 4 rows. */
  def sprtCensus(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val users = events
      .selectExpr("CAST(user_id AS STRING) AS uk", "unix_micros(ts) AS us",
        "event_id",
        "CASE WHEN event_type = 'purchase' AND value IS NOT NULL " +
          s"AND CAST(round(value * 100) AS BIGINT) >= $AbConvCents " +
          "THEN 1L ELSE 0L END AS conv")
      .groupBy("uk").agg(min("us").as("first_us"),
        min("event_id").as("first_eid"), max("conv").as("conv"))
      .withColumn("arm",
        PipelineOps.md5Prefix48(concat(lit(AbExperimentId + ":"), col("uk"))) % 2)
    import spark.implicits._
    val rules = SprtRules.toDF("rule", "up", "down")
    val w = Window.partitionBy("rule", "arm").orderBy("first_us", "first_eid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walk = users.crossJoin(broadcast(rules))
      .withColumn("llr", sum(when(col("conv") === 1L, col("up"))
        .otherwise(col("down"))).over(w))
      .withColumn("i", count(lit(1)).over(w))
      .withColumn("n_tot",
        count(lit(1)).over(Window.partitionBy("rule", "arm")))
      .localCheckpoint() // read by the census and the decision-instant join
    val b = SprtBoundMicro
    val census = walk.groupBy("rule", "arm").agg(
        count(lit(1)).as("n_users"), sum("conv").as("n_conv"),
        max(when(col("i") === col("n_tot"), col("llr"))).as("llr_final"),
        min(when(col("llr") >= b, col("i"))).as("n_h1"),
        min(when(col("llr") <= -b, col("i"))).as("n_h0"))
      .selectExpr("rule", "arm", "n_users", "n_conv", "llr_final",
        "CASE WHEN n_h1 IS NOT NULL AND (n_h0 IS NULL OR n_h1 <= n_h0) THEN 'accept_h1' " +
          "WHEN n_h0 IS NOT NULL THEN 'accept_h0' ELSE 'continue' END AS decision",
        // spelled null-safe rather than via least(): engines disagree on
        // whether least() skips NULLs
        "CASE WHEN n_h1 IS NULL THEN n_h0 WHEN n_h0 IS NULL THEN n_h1 " +
          "ELSE least(n_h1, n_h0) END AS n_at_decision")
    val dec = walk.selectExpr("rule AS r2", "arm AS a2", "i AS i2",
      "llr AS llr_at_decision")
    census.join(dec,
        col("rule") === col("r2") && col("arm") === col("a2") &&
          col("n_at_decision") === col("i2"), "left")
      .select("rule", "arm", "n_users", "n_conv", "llr_final", "decision",
        "n_at_decision", "llr_at_decision")
      .orderBy("rule", "arm")
  }

  /** q165 — SCD2 STATE HISTORY via gaps-and-islands: per user, the
    * run-length history of their event_type "state" — every maximal run
    * of consecutive equal types becomes one interval row
    * [valid_from_us, valid_to_us_excl) with the last run open
    * (`is_current`) — the slowly-changing-dimension type-2 build every
    * warehouse ships for dimension tables, derived from the raw change
    * log. q54's time-gap islands split on SILENCE; these split on VALUE
    * CHANGE — together they cover the gaps-and-islands taxonomy.
    *
    * Plan: ONE shuffle on user_id serves the change-flag lag, the
    * running island sum, the per-island collapse, and the close-over
    * lead (the q54 discipline — user-partitioned windows over a balanced
    * key, never a global sort; the lead runs on the already-collapsed
    * island table). The (us, event_id) total order is q144's, so
    * simultaneous events resolve identically cross-engine. All exact
    * epoch-µs integers. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("chg",
        when(lag("event_type", 1).over(w).isNull
          || lag("event_type", 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("island_idx", sum("chg").over(cum))
      .groupBy("user_id", "island_idx")
      .agg(max("event_type").as("state"), // constant within the island
        min("us").as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val wi = Window.partitionBy("user_id").orderBy("island_idx")
    islands
      .withColumn("valid_to_us_excl", lead("valid_from_us", 1).over(wi))
      .withColumn("is_current", col("valid_to_us_excl").isNull)
      .select("user_id", "island_idx", "state", "valid_from_us",
        "valid_to_us_excl", "n_events", "is_current")
      .orderBy("user_id", "island_idx")
  }

  /** The ordered funnel q136 walks — the corpus's own product funnel.
    * Shared with the oracle text so the stage list cannot drift. */
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** q136 — FUNNEL ANALYSIS with strictly-ordered semantics: per user,
    * the first `view`, the first `click` STRICTLY AFTER it, and the first
    * `purchase` strictly after that; per stage, the users reaching it,
    * the conversion rate from the previous stage, and the exact total and
    * mean time-to-advance — the product-analytics query every event
    * warehouse serves, and a fixed-pattern instance of the sequence
    * (CEP) matching the reference's alert chain never had.
    *
    * Strictness matters: a simultaneous view+click (same µs) does NOT
    * convert — the funnel proves ORDER, not co-occurrence (q18's
    * users-in-both is the unordered form). Each stage is one conditional
    * MIN; each subsequent stage joins the previous stage's per-user
    * timestamps CO-KEYED on user_id (the filter-then-join order means
    * stage k only scans its own event type — volumes shrink down the
    * funnel). All shuffles share the user_id key; the census rows are
    * three one-row aggregates and the conversion join is a broadcast
    * over the 3-row table. Times are epoch-µs integers end to end; the
    * two emitted doubles are one IEEE division each. */
  def funnelCensus(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val s1 = e.filter(col("event_type") === FunnelStages(0))
      .groupBy("user_id").agg(min("us").as("t1"))
    val s2 = e.filter(col("event_type") === FunnelStages(1))
      .join(s1, "user_id").where(col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"), min("t1").as("t1"))
    val s3 = e.filter(col("event_type") === FunnelStages(2))
      .join(s2, "user_id").where(col("us") > col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"), min("t2").as("t2"))
    val r1 = s1.agg(count(lit(1)).as("n_users"))
      .selectExpr("1 AS stage", s"'${FunnelStages(0)}' AS event_type",
        "n_users", "CAST(NULL AS BIGINT) AS sum_advance_us")
    val r2 = s2.agg(count(lit(1)).as("n_users"),
        sum(col("t2") - col("t1")).as("sum_advance_us"))
      .selectExpr("2 AS stage", s"'${FunnelStages(1)}' AS event_type",
        "n_users", "sum_advance_us")
    val r3 = s3.agg(count(lit(1)).as("n_users"),
        sum(col("t3") - col("t2")).as("sum_advance_us"))
      .selectExpr("3 AS stage", s"'${FunnelStages(2)}' AS event_type",
        "n_users", "sum_advance_us")
    val rows = r1.unionByName(r2).unionByName(r3)
    rows.join(
        broadcast(rows.selectExpr("stage AS pstage", "n_users AS prev_users")),
        col("stage") === col("pstage") + 1, "left")
      .selectExpr("stage", "event_type", "n_users",
        """CASE WHEN prev_users IS NULL OR prev_users = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(n_users AS DOUBLE) / CAST(prev_users AS DOUBLE) END AS conv_from_prev""",
        "sum_advance_us",
        """CASE WHEN stage = 1 OR n_users = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(sum_advance_us AS DOUBLE) / CAST(n_users AS DOUBLE) END AS avg_advance_us""")
      .orderBy("stage")
  }

  val SaxWindow = 8      // values per sliding window (L)
  val SaxSegments = 4    // PAA segments (m) — segn = L/m = 2 values each
  val SaxMinSupport = 2L // motif = a word at least this frequent

  /** q137 — SAX MOTIF DISCOVERY (Lin, Keogh et al. 2003's symbolic
    * aggregate approximation) over per-user event-value series: each
    * sliding window of [[SaxWindow]] values is PAA-reduced to
    * [[SaxSegments]] segment means, z-normalized against the WINDOW's own
    * mean/deviation, and quantized at the Gaussian quartile breakpoints
    * (±0.6745, 0) into a 4-letter word over {a,b,c,d}; words repeating
    * ≥ [[SaxMinSupport]] times are the corpus's recurring value-shape
    * motifs (spike-then-decay, ramps…) — the time-series pattern-mining
    * layer the reference's per-record fraud predicate cannot see.
    *
    * Determinism: window sums S, ΣX² and the deviation discriminant
    * D = L·ΣX² − S² are exact cents integers; each symbol comparison is
    * `(segS·L − S·segn)  <  β · √D · segn` — an exactly-representable
    * integer (cast once) against one sqrt and two multiplies of
    * explicit-DOUBLE literals, every op correctly rounded, so the word is
    * bit-identical cross-engine (the q133/q134 literal-identical-IEEE
    * recipe). Flat windows (D = 0) map to the all-'c' word explicitly.
    *
    * Scale shape: the only window is PARTITIONED by user (the q54 shape);
    * everything after is row-local array math into a ≤ 4^m = 256-key
    * aggregate — output bounded by the alphabet, not the corpus. */
  /** The per-segment symbol CASE, generated ONCE for both engines —
    * `elem(i)` is the only dialect difference (`element_at(win, i)` vs
    * `win[i]`), so the comparison arithmetic literally cannot drift. */
  private[graft] def saxSymbolExprs(elem: Int => String): Seq[String] = {
    val L = SaxWindow
    val segn = L / SaxSegments
    (0 until SaxSegments).map { g =>
      val segS = (1 to segn).map(j => elem(g * segn + j)).mkString("(", " + ", ")")
      val lhs = s"CAST($segS * $L - s * $segn AS DOUBLE)"
      s"""CASE WHEN d = 0 THEN 'c'
               WHEN $lhs < CAST(-0.6745 AS DOUBLE) * sqrt(CAST(d AS DOUBLE)) * CAST($segn AS DOUBLE) THEN 'a'
               WHEN $lhs < CAST(0 AS DOUBLE) THEN 'b'
               WHEN $lhs < CAST(0.6745 AS DOUBLE) * sqrt(CAST(d AS DOUBLE)) * CAST($segn AS DOUBLE) THEN 'c'
               ELSE 'd' END"""
    }
  }

  def saxMotifs(events: DataFrame): DataFrame = {
    val L = SaxWindow
    val segn = L / SaxSegments
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.currentRow, L - 1)
    val win = events.where(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("c"))
      .withColumn("win", collect_list("c").over(w))
      .where(size(col("win")) === L)
    val sym = saxSymbolExprs(i => s"element_at(win, $i)").mkString(", ")
    win
      .selectExpr("user_id", "win",
        "aggregate(win, CAST(0 AS BIGINT), (a, x) -> a + x) AS s",
        "aggregate(win, CAST(0 AS BIGINT), (a, x) -> a + x * x) AS ss")
      .selectExpr("user_id", "win", "s", s"$L * ss - s * s AS d")
      .selectExpr("user_id", s"concat_ws('', $sym) AS word")
      .groupBy("word")
      .agg(count(lit(1)).as("n_windows"),
        countDistinct(col("user_id")).as("n_users"))
      .where(col("n_windows") >= SaxMinSupport)
      .orderBy(desc("n_windows"), col("word"))
  }

  /** Set union: per-type user sets recombined distinct (the reference's
    * branch legs are never recombined — SURVEY §2.D; this closes that gap). */
  def usersInEither(events: DataFrame, typeA: String = "purchase", typeB: String = "error"): DataFrame = {
    val a = events.filter(col("event_type") === typeA).select("user_id")
    val b = events.filter(col("event_type") === typeB).select("user_id")
    a.union(b).distinct().orderBy("user_id")
  }

  /** Running total per customer over order date — an analytic window frame
    * (ROWS UNBOUNDED PRECEDING), restricted to a keyset to bound output. */
  def runningSpend(orders: DataFrame, maxCustkey: Long = 100L): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .filter(col("o_custkey") < maxCustkey)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        (sum(Exact.units(col("o_totalprice"), 2)).over(w) / lit(100.0)).as("running_spend"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** q126's interval width (µs): the 1-hour follow window each anchor
    * scans, shared with the oracle — and deliberately EQUAL to the bucket
    * width, so every anchor's window spans at most two buckets. */
  val IntervalUs = 3600L * 1000 * 1000

  /** q126 — INTERVAL JOIN, bucketed (the temporal-join shape with NO equi
    * key, which neither Spark nor a naive shuffle can plan scalably): for
    * every `anchorType` event, the count and exact value volume of ALL
    * events — any user — in the hour after it (the activity-burst report
    * around each signup). A direct `t.us > a.us AND t.us <= a.us + W`
    * join has no join key, so Spark would nest-loop the full cross
    * product. The scale idiom: BIN both sides into W-wide time buckets —
    * a target affects only anchors in its own or the previous bucket, so
    * each anchor probes exactly 2 buckets — turning the pure range join
    * into an EQUI-join on bucket + a row-local range filter.
    *
    * Scale shape: one explode(2) on the (small) anchor side, one co-keyed
    * shuffle on the bucket id for both sides; per-bucket fan-out is
    * bounded by events-per-hour (a data property a skewed hour would
    * surface in AQE; salting composes if one hour is hot). LEFT join so
    * burst-less anchors keep their zero row; COUNT/SUM ignore the null
    * probe rows. Exact integer cents (the q02 recipe) + epoch-µs integer
    * arithmetic — hash-identical cross-engine. */
  /** Epoch-µs per day — shared by q138/q139 and their oracles so the
    * activity grain cannot drift between engines. */
  val DayUs: Long = 86400000000L
  /** q139's trailing-activity window in days (WAU). */
  val StickyWindowDays: Int = 7

  /** q138 — RETENTION COHORT TRIANGLE: users cohorted by the day of their
    * first event; for each (cohort_day, days-since) cell, how many of the
    * cohort were active — the growth-analytics artifact every event
    * warehouse serves, and the time-grain cousin of q51's mod-cohort pivot.
    *
    * Scale shape: activity collapses to DISTINCT (user, day) in one
    * map-combinable hash aggregate (the corpus is touched exactly once);
    * the cohort day is a second user-keyed MIN over that already-collapsed
    * set; the cell census joins the two CO-KEYED on user_id, so a user's
    * rows meet without a second corpus shuffle shape. Cohort sizes are
    * bounded by the calendar (≤ #days rows) and broadcast back over the
    * ≤ days² cell table. Day ids are floor-divided epoch-µs integers
    * (positive, so Spark DIV and DuckDB // agree bit-exactly); the
    * retention rate is the single IEEE division per cell. Period 0 is the
    * built-in self-check: n_active = cohort_users by construction. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val active = events
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .distinct()
    val cohorts = active.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_users"))
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("period"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .selectExpr("cohort_day", "period", "cohort_users", "n_active",
        "CAST(n_active AS DOUBLE) / CAST(cohort_users AS DOUBLE) AS retention")
      .orderBy("cohort_day", "period")
  }

  /** q139 — DAU/WAU STICKINESS: per day, the distinct users active that
    * day (DAU), the distinct users active in the trailing
    * [[StickyWindowDays]]-day window (WAU), and their ratio — the
    * engagement census usually written as a sliding COUNT(DISTINCT),
    * which no engine can slide incrementally.
    *
    * Instead of a window, each (user, day) activity row CONTRIBUTES
    * itself to the [[StickyWindowDays]] target days it supports (day …
    * day+6) via one bounded explode, and WAU(t) falls out of the same
    * DISTINCT-then-COUNT hash aggregate as DAU — map-combinable, no sort,
    * no per-day corpus rescan; the 7× expansion happens AFTER the corpus
    * collapses to distinct (user, day), so it is 7× of the small set.
    * The final day-keyed join is between two calendar-bounded tables
    * (broadcast). Start-of-corpus days carry truncated windows (only
    * observed activity) — the honest read; phantom target days past the
    * corpus end drop out of the inner join because they have no DAU. */
  def stickinessCensus(events: DataFrame): DataFrame = {
    val active = events
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .distinct()
    val dau = active.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = active
      .select(col("user_id"),
        explode(expr(s"sequence(day, day + ${StickyWindowDays - 1})")).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(broadcast(wau), "day")
      .selectExpr("day", "dau", "wau",
        "CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness")
      .orderBy("day")
  }

  /** q144 — MARKOV TRANSITION CENSUS: for every ordered pair of event
    * types, how often a user's next event follows the current one, and
    * the conditional probability P(to | from) — the first-order behavior
    * model behind next-action prediction, anomaly scoring (improbable
    * transitions), and the q136 funnel's unpinned cousin (the funnel
    * proves one fixed path; this measures ALL paths).
    *
    * Scale shape: the only corpus-scale operation is ONE user-partitioned
    * `lead` window (the q29/q137 contract — per-user series are bounded
    * by design, so no task sees more than a user's history); transitions
    * collapse map-combinably into the ≤ |types|² census, and the
    * row-total join is a broadcast over that bounded table. Ordering is
    * total ((us, event_id) — the q136 tie rule), so the census is
    * deterministic; p is the single IEEE division per cell. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val trans = events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .selectExpr("event_type AS from_type",
        """lead(event_type, 1) OVER (PARTITION BY user_id
             ORDER BY us, event_id) AS to_type""")
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("from_type").agg(sum("n").as("n_from"))
    trans.join(broadcast(totals), "from_type")
      .selectExpr("from_type", "to_type", "n", "n_from",
        "CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p")
      .orderBy("from_type", "to_type")
  }

  /** Epoch-µs per hour (q148's series grain) and its lag budget. */
  val HourUs: Long = 3600000000L
  val AcfMaxLag: Int = 24

  /** q148 — AUTOCORRELATION (seasonality) CENSUS: the Pearson
    * correlation of the hourly event-count series against itself at lags
    * 1…[[AcfMaxLag]] — the signal a capacity planner or anomaly detector
    * reads to find daily rhythm (a 24-lag peak) or its absence before
    * trusting any fixed-window baseline.
    *
    * Scale shape: the corpus collapses ONCE into the calendar-bounded
    * hourly count table (map-combinable); every lag pair, moment sum,
    * and the census itself live on that bounded table (a ≤ hours×lags
    * broadcast join — never a window, never a second corpus pass).
    * Moments are exact DECIMAL(38,0)/HUGEINT sums (hourly counts square
    * to ~10¹⁶ at 10⁸ events/hour — BIGINT would overflow the Σx²
    * accumulation on a long calendar); r is computed from six exact
    * integers through the fixed shape num / √(d1·d2), each step a
    * correctly-rounded IEEE op, NULL when either side is constant. */
  def autocorrelation(events: DataFrame, maxLag: Int = AcfMaxLag): DataFrame = {
    val hours = events.selectExpr(s"unix_micros(ts) DIV $HourUs AS h")
      .groupBy("h").agg(count(lit(1)).as("c"))
      .localCheckpoint() // calendar-bounded; probed once per side
    val lagged = hours
      .selectExpr("h", "c", s"explode(sequence(1, $maxLag)) AS lag")
      .selectExpr("h + lag AS h2", "lag", "c AS x")
      .join(broadcast(hours.selectExpr("h AS h2", "c AS y")), Seq("h2"))
    lagged.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .selectExpr("lag", "n_pairs",
        """CASE WHEN n_pairs * sxx - sx * sx = 0 OR n_pairs * syy - sy * sy = 0
                THEN CAST(NULL AS DOUBLE)
                ELSE CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                            * CAST(n_pairs * syy - sy * sy AS DOUBLE))
           END AS r""")
      .orderBy("lag")
  }

  /** q162's truncated-EWMA geometry: dyadic weights 2^(W−i) over the W
    * prior hours (i = 1 is the most recent; denominator 2^W − 1), and
    * the burst dial n·den > K·num. All exact integers — the infinite
    * EWMA's 2^t scaling is untenable, so the window truncates the tail
    * below weight 1, which is what makes the rule exact AND streamable
    * with O(W) state. */
  val EwmaWindowHours = 16
  val BurstFactor = 3L

  /** q162 — HOURLY BURST DETECTOR on a truncated dyadic EWMA baseline:
    * per active hour, the exact dyadic-weighted mass of the 16 prior
    * hours is the baseline, and the hour flags as a burst when its count
    * exceeds [[BurstFactor]]× the baseline — evaluated as the
    * cross-multiplied integer rule n·(2^W−1) > K·Σ n_{t-i}·2^(W-i), so
    * both engines agree bit-exactly and no IEEE division ever decides
    * the flag (the q143/q151 rational-threshold discipline applied to
    * anomaly detection). Hours before the first full window are emitted
    * with a NULL verdict (`warm` = false): a cold-start baseline of
    * zeros would flag the entire ramp-up as bursts. Quiet hours have no
    * row — an absent hour has n = 0 and cannot burst, but it DOES feed
    * later baselines as a true zero (the dyadic sum simply skips it).
    *
    * Scale shape: the corpus collapses ONCE into the calendar-bounded
    * hourly table (q148's grain); the prior-window mass is a bounded
    * ≤ hours×W broadcast self-join — never a corpus window, never a
    * second pass. Integer headroom: 10⁸ events/hour × 2¹⁵ × 16 lags
    * ≈ 5×10¹³ — five decades inside int64. */
  /** The hourly collapse — ONE definition shared by the batch detector
    * and [[graft.streaming.StreamBurst]]'s per-batch delta, so the two
    * sides cannot drift on the grain. */
  private[graft] def hourlyCounts(events: DataFrame): DataFrame =
    events.selectExpr(s"unix_micros(ts) DIV $HourUs AS h")
      .groupBy("h").agg(count(lit(1)).as("n"))

  def burstDetector(events: DataFrame): DataFrame =
    burstFromHours(hourlyCounts(events))

  /** The verdict stage over an (h, n) hourly table — consumed by the
    * batch path above and by the streaming store reader, which derives
    * its hours from the maintained partial-count store instead. */
  private[graft] def burstFromHours(hoursIn: DataFrame): DataFrame = {
    val w = EwmaWindowHours
    val den = (1L << w) - 1
    val hours = hoursIn
      .localCheckpoint() // calendar-bounded; probed as anchor + both join sides
    val h0 = hours.agg(min("h").as("h0"))
    val pairs = hours.as("a").join(broadcast(hours.as("b")),
        col("b.h") >= col("a.h") - lit(w.toLong) && col("b.h") < col("a.h"),
        "left")
      .select(col("a.h").as("h"), col("a.n").as("n"),
        col("b.n").as("bn"), (col("a.h") - col("b.h")).as("lag"))
    pairs.groupBy("h", "n")
      .agg(coalesce(sum(expr(
        s"bn * shiftleft(CAST(1 AS BIGINT), $w - CAST(lag AS INT))")),
        lit(0L)).as("ewma_num"))
      .crossJoin(broadcast(h0))
      .selectExpr("h", "n", "ewma_num",
        s"CAST($den AS BIGINT) AS ewma_den",
        s"h >= h0 + $w AS warm",
        s"CAST(ewma_num AS DOUBLE) / CAST($den AS DOUBLE) AS baseline",
        s"""CASE WHEN h >= h0 + $w
                 THEN n * CAST($den AS BIGINT) > $BurstFactor * ewma_num
                 ELSE CAST(NULL AS BOOLEAN) END AS burst""")
      .orderBy("h")
  }

  /** q149 bin widths: binned quartiles (the q128 minimal-cover pattern)
    * — never a corpus-wide rank over users. */
  val RfmMonetaryBinCents = 10000L // $100 bins
  val RfmFreqBin = 10L

  /** q149 — RFM SEGMENTATION: every user scored into quartile codes for
    * Recency (days since last event — code 1 = most recent), Frequency
    * (events), and Monetary (total value) — the classic customer-base
    * segmentation every CRM/growth stack ships, and the per-entity
    * rollup of q138's cohort view.
    *
    * Quartile boundaries are BINNED minimal-cover thresholds (lowest bin
    * whose ascending cumulative covers k·n/4), computed per metric over
    * the bounded bin tables — the q128/q58 lesson: an exact per-user
    * quartile rank is a corpus-wide sort; binned quartiles cost three
    * bounded aggregates and lose only bin-width resolution. Codes are
    * then row-local comparisons against a broadcast one-row dial.
    *
    * Determinism: all three metrics are exact integers (days, counts,
    * cents), bins are floor divisions, thresholds integer minimal-covers,
    * codes integer comparisons; the only double is the monetary
    * cents/100 projection. Scale shape: ONE user-keyed corpus aggregate;
    * everything after is bounded. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val per = events.select(col("user_id"),
        expr(s"unix_micros(ts) DIV $DayUs").as("day"),
        Exact.units(col("value"), 2).as("cents"))
      .groupBy("user_id")
      .agg(max("day").as("last_day"), count(lit(1)).as("frequency"),
        sum("cents").as("monetary_cents"))
      .localCheckpoint() // consumed by the anchor, three dials, the report
    val anchor = per.agg(max("last_day").as("corpus_day"))
    val users = per.crossJoin(broadcast(anchor))
      .selectExpr("user_id", "corpus_day - last_day AS r_bin",
        "frequency", "monetary_cents",
        s"frequency DIV $RfmFreqBin AS f_bin",
        s"monetary_cents DIV $RfmMonetaryBinCents AS m_bin")
      .localCheckpoint() // user-bounded; probed by three dials + report
    // per metric: lowest bin whose ascending cumulative covers k·n/4
    def dial(bin: String): DataFrame = {
      val bins = users.groupBy(bin).agg(count(lit(1)).as("n"))
      val cum = bins.as("x")
        .join(broadcast(bins.as("y")), col(s"y.$bin") <= col(s"x.$bin"))
        .groupBy(col(s"x.$bin").as("b"))
        .agg(sum(col("y.n")).as("cum"))
      cum.crossJoin(broadcast(users.agg(count(lit(1)).as("nu"))))
        .agg(min(when(col("cum") * 4 >= col("nu"), col("b"))).as(s"${bin}_q1"),
          min(when(col("cum") * 4 >= col("nu") * 2, col("b"))).as(s"${bin}_q2"),
          min(when(col("cum") * 4 >= col("nu") * 3, col("b"))).as(s"${bin}_q3"))
    }
    def code(bin: String): String =
      s"CAST(1 + IF($bin > ${bin}_q1, 1, 0) + IF($bin > ${bin}_q2, 1, 0) " +
        s"+ IF($bin > ${bin}_q3, 1, 0) AS INT)"
    users
      .crossJoin(broadcast(dial("r_bin")))
      .crossJoin(broadcast(dial("f_bin")))
      .crossJoin(broadcast(dial("m_bin")))
      .selectExpr("user_id", "r_bin AS recency_days", "frequency",
        // CAST first: in SQL text, BIGINT / 100.0 is DECIMAL division
        "CAST(monetary_cents AS DOUBLE) / 100.0 AS monetary",
        s"${code("r_bin")} AS r_code", s"${code("f_bin")} AS f_code",
        s"${code("m_bin")} AS m_code")
      .selectExpr("user_id", "recency_days", "frequency", "monetary",
        "r_code", "f_code", "m_code",
        "concat('R', r_code, 'F', f_code, 'M', m_code) AS segment")
      .orderBy("user_id")
  }

  /** q151 dials: a rule needs this much support… */
  val BasketMinSupport = 2L
  /** …and lift ≥ num/den over independence — the q143 rational-cut rule
    * (exact cross-multiplied integers, no logarithm). */
  val BasketLiftNum = 3L
  val BasketLiftDen = 2L

  /** q151 — MARKET-BASKET ASSOCIATION RULES: part pairs co-occurring in
    * the same order with support, directional confidences, and lift —
    * the Apriori-at-k=2 artifact every recommender/assortment pipeline
    * computes, and the BASKET cousin of q143's sequence collocations
    * (co-occurrence within an unordered transaction vs adjacency within
    * an ordered document).
    *
    * Scale shape: baskets collapse once to DISTINCT (order, part); the
    * in-basket pair join is co-keyed on the order key with fan-out
    * bounded by parts-per-order (≤ 7 in TPC-H-shaped data — the data
    * model bounds it, no cap needed), collapsing map-combinably into
    * the pair table; marginals join the collapsed table and the basket
    * total is a one-row broadcast. The lift cut is the exact
    * DECIMAL(38,0)/HUGEINT cross-multiplication; confidences and lift
    * are single IEEE divisions of exact integers. */
  def basketRules(lineitem: DataFrame,
                  minSupport: Long = BasketMinSupport,
                  liftNum: Long = BasketLiftNum,
                  liftDen: Long = BasketLiftDen): DataFrame = {
    val b = lineitem.selectExpr("l_orderkey AS ok", "l_partkey AS pk")
      .distinct()
      .localCheckpoint() // consumed by marginals, the total, both pair sides
    val np = b.groupBy("pk").agg(count(lit(1)).as("n_p"))
      .localCheckpoint() // bounded by |parts|; consumed twice
    val ntx = b.select("ok").distinct().agg(count(lit(1)).as("n_tx"))
    b.as("a").join(b.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
      .join(np.selectExpr("pk AS p1", "n_p AS n_a"), "p1")
      .join(np.selectExpr("pk AS p2", "n_p AS n_b"), "p2")
      .crossJoin(broadcast(ntx))
      .filter(expr(s"""$liftDen * CAST(n_ab AS DECIMAL(38,0)) * n_tx >=
                       $liftNum * CAST(n_a AS DECIMAL(38,0)) * n_b"""))
      .selectExpr("p1", "p2", "n_ab", "n_a", "n_b", "n_tx",
        "CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS conf_ab",
        "CAST(n_ab AS DOUBLE) / CAST(n_b AS DOUBLE) AS conf_ba",
        """CAST(CAST(n_ab AS DECIMAL(38,0)) * n_tx AS DOUBLE) /
           CAST(CAST(n_a AS DECIMAL(38,0)) * n_b AS DOUBLE) AS lift""")
      .orderBy(desc("n_ab"), col("p1"), col("p2"))
  }

  /** q152's conversion event and the no-prior-touch bucket. */
  val AttributionTarget = "purchase"
  val AttributionDirect = "direct"

  /** q152 — LAST-TOUCH REVENUE ATTRIBUTION: every purchase's value is
    * credited to the user's most recent STRICTLY-prior non-purchase
    * event type (the "channel"); purchases with no prior touch credit
    * the [[AttributionDirect]] bucket — the marketing-BI workload the
    * q48 as-of join is the primitive for, rolled up to the per-channel
    * revenue census with shares.
    *
    * Determinism: the touch comes from an IGNORE-NULLS `last` over the
    * user-partitioned (us, event_id)-ordered window with a
    * (unbounded, −1) frame — strictly prior in the q136 total row
    * order, so simultaneous-µs events resolve by event id identically
    * on both engines; revenue is exact integer cents; shares are single
    * IEEE divisions against a broadcast one-row total.
    *
    * Scale shape: ONE user-partitioned window pass (per-user series
    * bounded — the q29/q137/q144 contract), one map-combinable
    * ≤ |types|-row census, bounded broadcast total. */
  def lastTouchAttribution(events: DataFrame,
                           target: String = AttributionTarget): DataFrame = {
    val touched = events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        Exact.units(col("value"), 2).as("cents"))
      .selectExpr("event_type", "cents",
        s"""last(CASE WHEN event_type <> '$target' THEN event_type END, true)
             OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch""")
      .filter(col("event_type") === target)
    val census = touched
      .selectExpr(s"coalesce(touch, '$AttributionDirect') AS channel", "cents")
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"), sum("cents").as("revenue_cents"))
      .localCheckpoint() // ≤ |types| rows; consumed by the total + output
    val tot = census.agg(sum("revenue_cents").as("t_cents"),
      sum("n_purchases").as("t_n"))
    census.crossJoin(broadcast(tot))
      .selectExpr("channel", "n_purchases",
        "CAST(revenue_cents AS DOUBLE) / 100.0 AS revenue",
        """CASE WHEN t_cents = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(revenue_cents AS DOUBLE) / CAST(t_cents AS DOUBLE)
           END AS revenue_share""",
        "CAST(n_purchases AS DOUBLE) / CAST(t_n AS DOUBLE) AS purchase_share")
      .orderBy("channel")
  }

  def intervalJoin(events: DataFrame, anchorType: String = "signup",
                   windowUs: Long = IntervalUs): DataFrame = {
    val targets = events.select(
      unix_micros(col("ts")).as("us_t"),
      Exact.units(col("value"), 2).as("cents"),
      expr(s"unix_micros(ts) DIV $windowUs").as("bucket"))
    val anchors = events.filter(col("event_type") === anchorType)
      .select(col("event_id"), unix_micros(col("ts")).as("us_a"))
      .withColumn("bucket", explode(expr(s"array(us_a DIV $windowUs, us_a DIV $windowUs + 1)")))
    anchors
      .join(targets,
        anchors("bucket") === targets("bucket") &&
          col("us_t") > col("us_a") && col("us_t") <= col("us_a") + lit(windowUs),
        "left_outer")
      .groupBy("event_id")
      .agg(count(col("us_t")).as("n_follow"),
        (coalesce(sum(col("cents")), lit(0L)) / lit(100.0)).as("total_value"))
      .orderBy("event_id")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parity operators over the `events` table — one pure
  * `DataFrame => DataFrame` per operator of SURVEY.md §2.A/§2.C.
  *
  * `events` is the testdata analog of the reference's transaction stream
  * (`events.user_id` ↔ `userId`, `events.value` ↔ `amount`, `events.ts` ↔
  * `timestamp`; FIXTURES.md §2). The fraud threshold scales the reference's
  * `amount > 10000.0` (`TransactionProcessor.java:15,39` — strict `>`) to the
  * testdata's value range: P[value > 100] ≈ 10 %, the reference's selectivity.
  *
  * All queries are deterministic (unique-key tie-breaks on every sort,
  * rounded double aggregates) so the DuckDB oracle hash-matches.
  */
object EventOps {
  /** Scaled analog of `SUSPICIOUS_AMOUNT` (`TransactionProcessor.java:15`). */
  val FraudThreshold: Double = 100.0

  private def fraud: Column = col("value") > FraudThreshold

  /** C1/A4 branch 0 — the defining fraud predicate scan, strict `>`. */
  def fraudFilter(events: DataFrame): DataFrame =
    events.filter(fraud)
      .select("event_id", "user_id", "value", "ts")
      .orderBy("event_id")

  /** A4 branch 1 — the complementary (non-fraud) leg. The two legs are
    * disjoint and complete over non-null values (`TransactionProcessor.java:38-41`). */
  def branchOther(events: DataFrame): DataFrame =
    events.filter(!fraud)
      .select("event_id", "user_id", "value")
      .orderBy("event_id")

  /** C2 — "Top 10 Scammers": per-user SUM over fraud rows, top 10.
    * Plans as partial agg → shuffle → final agg → TakeOrderedAndProject
    * (no full sort). `screenshots/top10scammers.jpg`. */
  def top10ByUser(events: DataFrame): DataFrame =
    events.filter(fraud)
      .groupBy("user_id")
      .agg(Exact.sumD(col("value"), 2).as("total_value"), count(lit(1)).as("n_txn"))
      .orderBy(desc("total_value"), col("user_id"))
      .limit(10)

  /** C3 — "RealTime Values" stat panel: global MIN/MAX/SUM/COUNT over fraud
    * rows (`README.md:355`). Single-row result; partial aggregation makes
    * this a near-free full scan at any scale. */
  def statsGlobal(events: DataFrame): DataFrame =
    events.filter(fraud)
      .agg(
        min("value").as("min_value"),
        max("value").as("max_value"),
        Exact.sumD(col("value"), 2).as("total_value"),
        count(lit(1)).as("n_txn"))

  /** C4 — "Latest Fraud Transactions" table: sort by time desc, take N.
    * Second-precision ties in the reference (`screenshots/top10scammers.jpg`)
    * motivate the `event_id` tie-break. Plans as TakeOrderedAndProject. */
  def latestN(events: DataFrame, n: Int = 20): DataFrame =
    events.filter(fraud)
      .orderBy(desc("ts"), desc("event_id"))
      .limit(n)
      .select("ts", "user_id", "value", "event_id")

  /** C5/C6 — InfluxDB `aggregateWindow(every:…, fn: mean)`: tumbling
    * event-time windows + per-user mean (`screenshots/AmountHistogram.jpg`).
    * Spark `window()` aligns to the epoch, so a 1-hour window equals
    * `date_trunc('hour', ts)` in the oracle; `w_start`/`w_end` mirror
    * Flux's `_start`/`_stop` columns (`screenshots/raudTable.jpg`). */
  def windowedMean(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(Exact.avgD(col("value"), 2).as("mean_value"), count(lit(1)).as("n"))
      .select(
        col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("user_id"), col("mean_value"), col("n"))
      .orderBy("w_start", "user_id")

  /** q203's dials: 24 h windows hopping every 6 h — length DIV hop = 4,
    * the overlap factor every observation fans out to. */
  val HopUs: Long = 6L * 3600000000L
  val HopWindows: Long = 4L

  /** q203 — HOPPING (sliding) WINDOW AGGREGATION: q05's tumbling mean
    * generalized to OVERLAPPING windows — `window(ts, "24 hours",
    * "6 hours")` in streaming SQL, the dashboard's smoothed series where
    * tumbling cells are too jumpy. Every observation belongs to exactly
    * [[HopWindows]] windows (the window starting at ⌊us/hop⌋·hop and the
    * three before it), so the fan-out is a bounded row-local explode —
    * never a range self-join — and the aggregate stays one map-combinable
    * groupBy. Per (user, window start): exact count, cents sum, and the
    * floor'd micro mean; windows with no observations don't ship (the
    * q190 grid fills gaps when a panel needs them).
    *
    * Cross-engine note: hop indices come from integer DIV on nonneg
    * epochs, window starts in exact µs — no timestamp arithmetic. */
  def hoppingMean(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) AS us",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .selectExpr("user_id", "cents",
        s"explode(sequence(0L, ${HopWindows - 1}L)) AS i",
        s"us DIV $HopUs AS cell")
      .selectExpr("user_id", "cents", s"(cell - i) * $HopUs AS win_start_us")
      .groupBy("user_id", "win_start_us")
      .agg(count(lit(1)).as("n_obs"), sum("cents").as("sum_cents"))
      .selectExpr("user_id", "win_start_us",
        s"win_start_us + ${HopWindows * HopUs} AS win_end_us",
        "n_obs", "sum_cents",
        "1000000 * sum_cents DIV n_obs AS mean_micro")
      .orderBy("user_id", "win_start_us")

  /** C8 — dashboard tag filter: `userId` IN (...) checkboxes over the fraud
    * table (`screenshots/AmountHistogram.jpg`). `isin` benefits from parquet
    * predicate pushdown. */
  def tagFilter(events: DataFrame, ids: Seq[Long] = Seq(1L, 3L, 5L, 7L)): DataFrame =
    events.filter(fraud && col("user_id").isin(ids: _*))
      .select("event_id", "user_id", "value", "ts")
      .orderBy("event_id")

  /** C7 — raw un-aggregated table view over a fixed time range
    * (`README.md:2`; "Past 15m" scaled to the testdata's 30-day span).
    * Plain projection + filter; the range predicate reaches the parquet scan. */
  def rawRange(events: DataFrame): DataFrame =
    events.filter(col("ts") >= lit("2024-01-25 00:00:00").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id")

  /** A2 — null-tolerant JSON parse of `events.props` (the wire-format
    * analog of `TransactionProcessor.java:29-36`): malformed JSON or an
    * uncoercible value → null FIELD (PERMISSIVE mode keeps the struct
    * non-null and nulls the fields); the stream never fails on a bad
    * record. The q08 oracle mirrors this with a json_valid guard +
    * TRY_CAST, so the tolerant semantics are oracle-checked, not just
    * asserted. */
  def parseProps(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .orderBy("event_id")

  /** A5 — record → JSON serialization (`TransactionProcessor.java:44-51`),
    * integer fields only so the oracle's string concat is byte-identical. */
  def jsonSerialize(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        to_json(struct(col("event_id"), col("user_id"))).as("json"))
      .orderBy("event_id")

  /** Benford's-law expected first-digit proportions, log10(1 + 1/d). */
  val BenfordP: Seq[(Int, Double)] = (1 to 9).map(d => d -> math.log10(1 + 1.0 / d))

  /** Render a double constant as the exact integer ratio m / 2⁶⁰ — both
    * operands are exactly representable (m shares the double's own
    * significand, the divisor is a power of two), so the division
    * reproduces the IDENTICAL double in any IEEE engine. Decimal-text
    * literals are NOT safe here: Spark's decimal-literal → DOUBLE cast
    * lands one ulp off DuckDB's parse for several of these constants
    * (observed on log10(4/3) at r12), which a bit-exact compare sees. */
  private def exactDoubleLit(p: Double, suffix: String): String = {
    // BigDecimal.exact: the double's true binary value (the plain
    // BigDecimal(Double) constructor would re-parse its shortest decimal
    // string, and ×2⁶⁰ of THAT is not whole)
    val m = BigDecimal.exact(p) * BigDecimal(2).pow(60)
    require(m.isWhole && m.abs <= BigDecimal(Long.MaxValue),
      s"constant $p not representable as m/2^60")
    s"(CAST(${m.toBigInt}$suffix AS DOUBLE) / CAST(${1L << 60}$suffix AS DOUBLE))"
  }
  private[graft] def benfordLitSpark(p: Double): String = exactDoubleLit(p, "L")
  private[graft] def benfordLitSql(p: Double): String = exactDoubleLit(p, "")

  /** q146 — BENFORD FIRST-DIGIT AUDIT: the distribution of leading
    * digits of transaction amounts against Benford's law — the classic
    * forensic-accounting screen for fabricated amounts (invented numbers
    * over-pick middle digits; organic multiplicative processes follow
    * log10(1+1/d)). The natural corpus-level companion to the
    * reference's per-row `amount > threshold` rule: that flags single
    * transactions, this flags a POPULATION that was tampered with.
    *
    * Determinism: digits come from exact integer cents (first character
    * of the BIGINT's decimal text — identical cross-engine); counts are
    * exact; the Benford column is a shared literal; every emitted double
    * is either one IEEE division of exact integers, one subtraction of
    * bit-identical doubles, or the χ² total — whose 9 per-digit terms
    * are micro-rounded to integers BEFORE the order-free SUM (a raw
    * double sum over shuffled rows would be fold-order-dependent).
    *
    * Scale shape: one row-local digit projection + one map-combinable
    * 9-row aggregate touch the corpus; everything after is bounded.
    * Zero/negative-cent rows carry no leading digit and are excluded. */
  def benfordAudit(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val bt = spark.range(1).selectExpr(
      s"inline(array(${BenfordP.map { case (d, p) =>
        s"named_struct('digit', $d, 'p_benford', ${benfordLitSpark(p)})"
      }.mkString(", ")}))")
    val obs = events.select(Exact.units(col("value"), 2).as("cents"))
      .filter(col("cents") > 0)
      .selectExpr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT) AS digit")
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val joined = bt.join(obs, Seq("digit"), "left_outer")
      .selectExpr("digit", "coalesce(n, CAST(0 AS BIGINT)) AS n", "p_benford")
      .localCheckpoint() // 9 rows; consumed by the total, χ², and output
    val tot = joined.agg(sum("n").as("n_total"))
    val terms = joined.crossJoin(broadcast(tot))
      .selectExpr("digit", "n", "n_total", "p_benford",
        """CASE WHEN n_total = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) END AS p_observed""",
        """CASE WHEN n_total = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(ROUND((CAST(n AS DOUBLE) - p_benford * CAST(n_total AS DOUBLE))
                     * (CAST(n AS DOUBLE) - p_benford * CAST(n_total AS DOUBLE))
                     / (p_benford * CAST(n_total AS DOUBLE)) * 1e6) AS BIGINT)
           END AS chi2_term_micro""")
      .localCheckpoint() // 9 rows; consumed by the χ² fold and the output
    val chi2 = terms.agg(sum("chi2_term_micro").as("chi2_micro"))
    terms.crossJoin(broadcast(chi2))
      .selectExpr("digit", "n", "n_total", "p_observed", "p_benford",
        "p_observed - p_benford AS deviation",
        "CAST(chi2_micro AS DOUBLE) / 1e6 AS chi2")
      .orderBy("digit")
  }

  /** q147's floor: a user needs at least this many transactions for the
    * binomial z to mean anything (and to bound the report). */
  val RoundMinTx = 20L
  /** A "round" amount is a whole multiple of this many cents (whole
    * dollars — the coarsest unit with a usable base rate on the test
    * corpus: ~1% of amounts; $100 multiples are 1-in-10⁴). */
  val RoundUnitCents = 100L

  /** q147 — ROUND-NUMBER AFFINITY per user: the share of a user's
    * transaction amounts landing on exact whole-dollar marks, scored as a
    * binomial z against the corpus base rate — the second classic
    * forensic screen (humans invent round numbers; organic amounts
    * don't), and the per-ENTITY complement of q146's population screen.
    * Flagged at |z| > 3.
    *
    * Determinism: round-ness is an exact integer modulus on cents; the
    * base rate is one IEEE division of exact corpus totals; z is the
    * fixed expression shape (n_round − rate·n)/√(rate·(1−rate)·n) —
    * identical operand doubles through correctly-rounded ops (√ is IEEE
    * correctly rounded) — and the flag compares bit-identical doubles.
    *
    * Scale shape: one row-local cents/round projection, ONE user-keyed
    * map-combinable aggregate, corpus totals as a one-row broadcast;
    * the output is bounded by users with ≥ [[RoundMinTx]] rows. */
  def roundNumberAffinity(events: DataFrame,
                          minTx: Long = RoundMinTx,
                          unitCents: Long = RoundUnitCents): DataFrame = {
    val per = events
      .select(col("user_id"), Exact.units(col("value"), 2).as("cents"))
      .filter(col("cents") > 0)
      .selectExpr("user_id",
        s"CASE WHEN cents % $unitCents = 0 THEN 1L ELSE 0L END AS is_round")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_tx"), sum("is_round").as("n_round"))
      .localCheckpoint() // consumed by the corpus totals and the report
    val tot = per.agg(sum("n_tx").as("t_tx"), sum("n_round").as("t_round"))
    per.filter(col("n_tx") >= minTx)
      .crossJoin(broadcast(tot))
      .selectExpr("user_id", "n_tx", "n_round",
        "CAST(n_round AS DOUBLE) / CAST(n_tx AS DOUBLE) AS share",
        "CAST(t_round AS DOUBLE) / CAST(t_tx AS DOUBLE) AS base_rate")
      .selectExpr("user_id", "n_tx", "n_round", "share", "base_rate",
        """CASE WHEN base_rate = 0e0 OR base_rate = 1e0 THEN CAST(NULL AS DOUBLE)
                ELSE (CAST(n_round AS DOUBLE) - base_rate * CAST(n_tx AS DOUBLE))
                     / sqrt(base_rate * (1e0 - base_rate) * CAST(n_tx AS DOUBLE))
           END AS z""")
      .selectExpr("user_id", "n_tx", "n_round", "share", "base_rate", "z",
        "abs(z) > 3e0 AS flagged")
      .orderBy("user_id")
  }
}

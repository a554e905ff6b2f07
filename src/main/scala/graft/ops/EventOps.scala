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
}

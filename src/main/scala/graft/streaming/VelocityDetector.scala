package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_seconds}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user transaction-velocity fraud detection — custom keyed state via
  * `flatMapGroupsWithState` (the stateful-streaming capability the
  * reference lacks entirely: its topology is stateless,
  * `TransactionProcessor.java:25-54`, SURVEY.md §2.D).
  *
  * Semantics: alert when a user makes more than `maxTxns` transactions
  * inside a sliding `windowSec` (velocity), or when an amount exceeds 3× the
  * user's running mean (deviation) after a warm-up of 3 observations. State
  * per key is O(window) recent timestamps + two running moments; idle-user
  * state expires via a timeout, so total state is bounded by active keys —
  * the property that keeps this runnable against an unbounded 100 TB stream.
  *
  * Two expiry clocks:
  *  - [[detect]]: processing-time TTL — simplest, correct for a
  *    tail-following production stream.
  *  - [[detectEventTime]]: watermark + event-time TTL — the scale-correct
  *    variant for replay/backfill, where state expiry must follow the
  *    DATA's clock (a backfill at 1000× speed would otherwise never expire
  *    state, and a paused stream would expire it spuriously).
  */
object VelocityDetector {
  case class Txn(userId: String, amount: Double, timestamp: Long)
  case class TxnEv(userId: String, amount: Double, timestamp: Long,
                   eventTime: java.sql.Timestamp)
  case class UserState(recentTs: List[Long], n: Long, sumAmount: Double)
  case class Alert(userId: String, kind: String, amount: Double, timestamp: Long, detail: String)

  /** The per-user state machine, shared by both expiry variants: fold a
    * batch of transactions (sorted by event time) through the state,
    * emitting velocity/deviation alerts. */
  private def advance(userId: String, txns: Seq[Txn], st0: UserState,
                      maxTxns: Int, windowSec: Long): (Seq[Alert], UserState) = {
    var st = st0
    val alerts = txns.flatMap { t =>
      val recent = (t.timestamp :: st.recentTs).filter(_ > t.timestamp - windowSec)
      val mean = if (st.n > 0) st.sumAmount / st.n else 0.0
      val velocity =
        if (recent.size > maxTxns)
          Some(Alert(userId, "velocity", t.amount, t.timestamp,
            s"${recent.size} txns in ${windowSec}s"))
        else None
      val deviation =
        if (st.n >= 3 && t.amount > 3 * mean)
          Some(Alert(userId, "deviation", t.amount, t.timestamp,
            f"amount ${t.amount}%.2f > 3x mean $mean%.2f"))
        else None
      st = UserState(recent, st.n + 1, st.sumAmount + t.amount)
      velocity ++ deviation
    }
    (alerts, st)
  }

  /** @param stateTimeout processing-time TTL for idle-user state (None =
    *   keep forever — only for tests: the timeout wakes the stream in empty
    *   micro-batches, which makes `processAllAvailable` spin). */
  def detect(txns: Dataset[Txn], maxTxns: Int = 3, windowSec: Long = 60,
             stateTimeout: Option[String] = Some("1 hour")): Dataset[Alert] = {
    val spark = txns.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    txns.groupByKey(_.userId)
      .flatMapGroupsWithState[UserState, Alert](
        OutputMode.Append(), timeoutConf) {
        (userId: String, rows: Iterator[Txn], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st0 = state.getOption.getOrElse(UserState(Nil, 0L, 0.0))
            val (alerts, st1) =
              advance(userId, rows.toSeq.sortBy(_.timestamp), st0, maxTxns, windowSec)
            state.update(st1)
            stateTimeout.foreach(state.setTimeoutDuration)
            alerts.iterator
          }
      }
  }

  /** Event-time expiry variant: the watermark (data clock) drives state
    * TTL, so replaying the same events — in any order, at any wall-clock
    * speed — produces identical alerts, and backfills expire state exactly
    * where the original run did. Late data beyond `watermarkDelay` is
    * dropped by the watermark (explicit policy, like the windowed aggs). */
  def detectEventTime(txns: Dataset[Txn], maxTxns: Int = 3, windowSec: Long = 60,
                      stateTtlSec: Long = 3600,
                      watermarkDelay: String = "30 seconds"): Dataset[Alert] = {
    val spark = txns.sparkSession
    import spark.implicits._
    txns
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", watermarkDelay)
      .as[TxnEv]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[UserState, Alert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: String, rows: Iterator[TxnEv], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.timestamp)
            val st0 = state.getOption.getOrElse(UserState(Nil, 0L, 0.0))
            val (alerts, st1) = advance(userId,
              sorted.map(t => Txn(t.userId, t.amount, t.timestamp)),
              st0, maxTxns, windowSec)
            state.update(st1)
            // expire when the WATERMARK passes last-seen + TTL — the
            // data's clock, immune to replay speed and wall-clock pauses
            state.setTimeoutTimestamp((sorted.last.timestamp + stateTtlSec) * 1000L)
            alerts.iterator
          }
      }
  }
}

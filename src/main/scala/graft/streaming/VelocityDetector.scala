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

  /** Buffered per-key event-time state: not-yet-sealed events, the folded
    * detector state, and the max event time ever seen. */
  case class EvState(buffer: List[Txn], core: UserState, lastSeen: Long)

  /** Event-time variant, replay-invariant ACROSS micro-batches: incoming
    * events are BUFFERED in state and folded through the detector only
    * once the watermark seals them (ts ≤ watermark), in event-time order —
    * so how events are split into batches, their arrival order, and the
    * wall-clock replay speed cannot change the alerts. The price is the
    * watermark's detection latency (an alert fires once the watermark
    * passes its event), which is the standard event-time trade; events
    * later than the watermark are dropped by the stateful operator's late
    * filter (explicit policy, like the windowed aggs).
    *
    * State expiry also follows the data clock: a key with an empty buffer
    * expires `stateTtlSec` after its last event; a key with sealed-but-
    * unprocessed events is woken by a timeout instead of waiting for new
    * data, and the timeout never regresses below last-seen + TTL because
    * `lastSeen` is monotone in state. */
  def detectEventTime(txns: Dataset[Txn], maxTxns: Int = 3, windowSec: Long = 60,
                      stateTtlSec: Long = 3600,
                      watermarkDelaySec: Long = 30): Dataset[Alert] = {
    val spark = txns.sparkSession
    import spark.implicits._
    txns
      .withColumn("eventTime", timestamp_seconds(col("timestamp")))
      .withWatermark("eventTime", s"$watermarkDelaySec seconds")
      .as[TxnEv]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[EvState, Alert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: String, rows: Iterator[TxnEv], state: GroupState[EvState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(EvState(Nil, UserState(Nil, 0L, 0.0), Long.MinValue))
          val buf = st0.buffer ++ rows.map(t => Txn(t.userId, t.amount, t.timestamp))
          // the watermark SEALS a prefix of event time: fold exactly that
          // prefix, in event order — batch boundaries can't be observed
          val (ready, pending) = buf.partition(_.timestamp * 1000L <= wmMs)
          val (alerts, core1) = advance(userId,
            ready.sortBy(t => (t.timestamp, t.amount)), st0.core, maxTxns, windowSec)
          val lastSeen = (st0.lastSeen +: buf.map(_.timestamp)).max
          if (state.hasTimedOut && buf.isEmpty) {
            state.remove() // idle past TTL, nothing left to process
            Iterator.empty
          } else {
            state.update(EvState(pending, core1, lastSeen))
            // wake when the earliest pending event can be sealed — the event
            // at ts is sealable once the watermark REACHES ts (the watermark
            // already embeds the delay; adding it again would fire every
            // no-further-traffic alert one full delay late). With an empty
            // buffer, expire TTL after the newest event ever seen.
            val next =
              if (pending.nonEmpty) pending.map(_.timestamp).min * 1000L + 1
              else (lastSeen + stateTtlSec) * 1000L
            state.setTimeoutTimestamp(math.max(next, wmMs + 1))
            alerts.iterator
          }
      }
  }
}

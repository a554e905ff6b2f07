package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user transaction-velocity fraud detection — custom keyed state via
  * `flatMapGroupsWithState` (the stateful-streaming capability the
  * reference lacks entirely: its topology is stateless,
  * `TransactionProcessor.java:25-54`, SURVEY.md §2.D).
  *
  * Semantics: alert when a user makes more than `maxTxns` transactions
  * inside a sliding `windowSec` (velocity), or when an amount exceeds 3× the
  * user's running mean (deviation) after a warm-up of 3 observations. State
  * per key is O(window) recent timestamps + two running moments; state for
  * idle users expires via a processing-time timeout, so total state is
  * bounded by active keys — the property that keeps this runnable against
  * an unbounded 100 TB stream.
  */
object VelocityDetector {
  case class Txn(userId: String, amount: Double, timestamp: Long)
  case class UserState(recentTs: List[Long], n: Long, sumAmount: Double)
  case class Alert(userId: String, kind: String, amount: Double, timestamp: Long, detail: String)

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
            var st = state.getOption.getOrElse(UserState(Nil, 0L, 0.0))
            val alerts = rows.toSeq.sortBy(_.timestamp).flatMap { t =>
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
            state.update(st)
            stateTimeout.foreach(state.setTimeoutDuration)
            alerts.iterator
          }
      }
  }
}

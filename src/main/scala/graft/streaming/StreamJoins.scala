package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins — a §2.D capability the reference lacks entirely (its
  * topology is a single stateless chain; correlating two streams is
  * impossible there). Two shapes matter at 100 TB/day:
  *
  *  - STREAM × STATIC enrichment: per-micro-batch broadcast of a bounded
  *    dimension (user registry, merchant table). No streaming state at
  *    all; the dimension is re-resolved every batch, so slowly-changing
  *    dims pick up updates on the next trigger.
  *
  *  - STREAM × STREAM interval join: both sides watermarked, the join
  *    condition bounds event-time distance, so Spark can expire buffered
  *    rows once the watermark passes the interval — state is bounded by
  *    (arrival rate × (interval + watermark delay)), never by stream
  *    length. Without the time bound the state is unbounded — that
  *    formulation is rejected by Spark and deliberately not offered here.
  */
object StreamJoins {

  /** Alerts enriched with a user dimension (left outer — an alert for an
    * unknown user survives with null profile columns). */
  def enrichWithUsers(txns: DataFrame, users: DataFrame): DataFrame =
    txns.join(broadcast(users), Seq("userId"), "left_outer")

  /** Purchases within `maxGapSec` AFTER the same user's signup — the
    * new-account fraud-velocity shape (the streaming twin of the batch
    * as-of join, q48). Expects `(userId, amount, timestamp)` on both
    * inputs; output carries both event times and the gap. */
  def purchasesAfterSignup(signups: DataFrame, purchases: DataFrame,
                           maxGapSec: Long = 3600,
                           watermarkDelay: String = "1 minute"): DataFrame = {
    val s = signups
      .selectExpr("userId AS s_user", "timestamp AS s_sec")
      .withColumn("s_ts", timestamp_seconds(col("s_sec")))
      .withWatermark("s_ts", watermarkDelay)
    val p = purchases
      .selectExpr("userId AS p_user", "amount AS p_amount", "timestamp AS p_sec")
      .withColumn("p_ts", timestamp_seconds(col("p_sec")))
      .withWatermark("p_ts", watermarkDelay)
    s.join(p,
        col("s_user") === col("p_user")
          && col("p_ts") >= col("s_ts")
          && col("p_ts") <= col("s_ts") + expr(s"INTERVAL $maxGapSec SECONDS"))
      .select(col("s_user").as("userId"), col("p_amount").as("amount"),
        col("s_sec").as("signup_sec"), col("p_sec").as("purchase_sec"),
        (col("p_sec") - col("s_sec")).as("gap_sec"))
  }
}

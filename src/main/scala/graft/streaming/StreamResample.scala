package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max, struct, sum}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.RelationalOps

/** Streaming MAINTENANCE of the q190 panel series — the reference's
  * actual product, live: transactions land (Kafka), the store updates,
  * and the dashboard layer (Grafana over InfluxDB, reference
  * README.md:2,14-15) re-renders `GROUP BY time(1h) fill(previous)`
  * from it. Each micro-batch collapses to per-(user, hour) cell
  * partials — exactly q190's corpus collapse for the batch's rows —
  * landing under their own `batch_id=N` partition; the read merges the
  * partials per cell (SUM the counts, struct-MAX the winners) and runs
  * the SAME shared grid + forward-fill stages as batch q190, so the
  * streamed panel is bit-equal to the batch query by construction.
  *
  * Mixed-state store (the StreamCdcMerge class): `n_obs` is SUM state
  * and leans on the [[StreamShardWriter]] batch_id replay discipline,
  * while the fill winner is a lexicographic struct MAX — associative,
  * commutative, idempotent — so LATE data is handled by algebra alone:
  * an earlier-timestamped observation arriving in a later batch merges
  * into its cell but cannot displace a later winner, and the fill it
  * feeds stays exactly what a batch run over the full history would
  * compute (spec-pinned). */
object StreamResample {

  /** Collapse one (static) batch of events to per-(user, hour) cell
    * partials under its own batch_id partition — also the spec's
    * replay unit. The winner struct is flattened for the store. */
  private[graft] def mergeBatch(batch: DataFrame, batchId: Long,
                                path: String): Unit =
    RelationalOps.resampleCells(batch)
      .selectExpr("user_id", "hour", "n_obs",
        "w.us AS us", "w.event_id AS event_id", "w.cents AS cents")
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** Start the maintainer on a streaming frame with `ts`, `user_id`,
    * `event_id`, `value`. */
  def start(events: DataFrame, path: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => mergeBatch(batch, id, path) }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The always-current q190 panel off the maintained cell store. */
  def panel(spark: SparkSession, path: String): DataFrame =
    RelationalOps.resampleFromCells(
      spark.read.parquet(path)
        .groupBy("user_id", "hour")
        .agg(sum("n_obs").as("n_obs"),
          max(struct(col("us"), col("event_id"), col("cents"))).as("w")))
}

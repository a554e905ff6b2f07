package graft.streaming

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{RelationalOps, ScaleOps}

/** Streaming MAINTENANCE of the q179 compaction planner's input — the
  * file-size manifest — so the OPTIMIZE plan is always current as data
  * lands, without re-scanning history: the operational loop a lakehouse
  * table service actually runs (sizes accrue per commit; the planner
  * reads the manifest, never the data).
  *
  * Each micro-batch's per-day byte deltas (the exact q179 proxy) land
  * under their own `batch_id=N` partition — SUM-shaped state, so the
  * [[StreamShardWriter]] batch_id discipline makes a failure-replayed
  * batch rewrite its own partial instead of double-counting. Reads SUM
  * the partials per day and run the SAME shared roll arithmetic as
  * batch q179 ([[ScaleOps.compactionPlanFromFiles]]), so the streamed
  * plan is bit-equal to the batch query by construction (spec-pinned
  * across splits that divide a day's traffic and same-id replay).
  *
  * 100 TB shape: the per-batch delta is one map-combinable collapse of
  * the batch; the store carries one row per (day, batch) and compacts
  * on read; the planner's work stays bounded metadata forever. */
object StreamCompaction {

  /** Collapse one (static) batch of events to per-day byte partials and
    * write them under their own batch_id partition — also the unit the
    * spec replays directly. */
  private[graft] def mergeBatch(batch: DataFrame, batchId: Long,
                                path: String): Unit =
    ScaleOps.compactionFiles(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** Start the maintainer on a streaming frame with the events schema. */
  def start(events: DataFrame, path: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => mergeBatch(batch, id, path) }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The always-current q179 plan off the maintained manifest: partials
    * SUM per day, then the shared roll runs unchanged. */
  def plan(spark: SparkSession, path: String): DataFrame =
    ScaleOps.compactionPlanFromFiles(
      spark.read.parquet(path)
        .groupBy("day")
        .agg(org.apache.spark.sql.functions.sum("bytes").as("bytes")))
}

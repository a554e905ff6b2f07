package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{lit, max, sum}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.PipelineOps

/** Streaming MAINTENANCE of the q180 k-anonymity posture — live privacy
  * monitoring as records land: each micro-batch's quasi-identifier
  * class deltas (the q180 fine table, one map-combinable collapse of
  * the batch) land under their own `batch_id=N` partition, and the
  * read SUMs the partials per class before running the SAME shared
  * generalization ladder as batch q180 — so the streamed posture is
  * bit-equal to the batch audit by construction, and the dashboard
  * sees k dropping the moment a new rare QI combination arrives
  * (spec-pinned: one arriving singleton collapses k to 1 live).
  *
  * SUM-shaped state, so the [[StreamShardWriter]] batch_id discipline
  * carries the replay guarantee; the store is bounded by the QI
  * domain, not the row count, and the ladder only ever reads the
  * compacted class table. */
object StreamKAnonymity {

  /** Collapse one (static) batch of customer rows to fine-class
    * partials under its own batch_id partition — also the spec's
    * replay unit. */
  private[graft] def mergeBatch(batch: DataFrame, batchId: Long,
                                path: String): Unit =
    PipelineOps.kAnonymityFine(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** Start the maintainer on a streaming frame with the customer QI
    * columns (c_nationkey, c_mktsegment, c_acctbal). */
  def start(customers: DataFrame, path: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    customers.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => mergeBatch(batch, id, path) }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The always-current q180 ladder off the maintained class store. */
  def posture(spark: SparkSession, path: String): DataFrame =
    PipelineOps.kAnonymityLadder(
      spark.read.parquet(path)
        .groupBy("nat", "seg", "b1")
        .agg(sum("n").as("n"), max("b2").as("b2")))
}

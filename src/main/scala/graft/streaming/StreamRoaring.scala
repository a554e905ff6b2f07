package graft.streaming

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, expr}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.SketchOps

/** Streaming MAINTENANCE of the q178 Roaring word store — the exact-bits
  * sibling of [[StreamHllCube]]: arriving micro-batches' (day, blk, wi)
  * word deltas bit_or-merge into the day-partitioned store, and the
  * container-choice artifact reads always-current without re-scanning
  * history.
  *
  * Idempotency is ALGEBRAIC (the strongest class in the maintainer
  * taxonomy): bits merge by OR, so a re-delivered batch — or the same
  * value a thousand times, under ANY batch segmentation — cannot move
  * the store once absorbed; no batch_id bookkeeping exists because none
  * is needed (spec-pinned under at-least-once redelivery, not just
  * same-id replay). The read path derives each block's exact distinct
  * count FROM the store itself (popcount of OR'd distinct-value bits IS
  * the distinct count) and runs the SAME shared
  * [[SketchOps.roaringRender]] stage as batch q178, so the streamed
  * artifact is bit-equal to the batch query by construction.
  *
  * 100 TB shape: the per-batch delta is one map-combinable collapse of
  * the batch; each merge rewrites only the day partitions the batch
  * touched and reads ≤ touched-days × blocks × 16 existing words —
  * bounded work per batch forever. */
object StreamRoaring {

  /** bit_or-merge one (static) batch of events into the word store at
    * `path` — also the unit the spec replays and duplicates directly. */
  private[graft] def mergeBatch(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    val delta = SketchOps.roaringWords(SketchOps.roaringTriples(batch))
    val affected = delta.select("day").distinct()
    val existing = Try(spark.read.parquet(path)).toOption
      // partition-column inference reads `day=N` back as INT — restore
      // the BIGINT key before merging with the delta
      .map(_.selectExpr("CAST(day AS BIGINT) AS day", "blk", "wi", "word")
        .join(broadcast(affected), "day"))
    val merged = existing.fold(delta)(_.unionByName(delta))
      .groupBy("day", "blk", "wi").agg(expr("bit_or(word)").as("word"))
      .localCheckpoint() // sever the read-before-overwrite dependency
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(path)
  }

  /** Start the maintainer on a streaming frame carrying `ts` and
    * `value`. */
  def start(events: DataFrame, path: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => mergeBatch(batch, path) }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The always-current q178 artifact off the maintained store: exact
    * counts ARE the popcounts, then the shared render runs unchanged. */
  def containers(spark: SparkSession, path: String): DataFrame =
    SketchOps.roaringRender(
      SketchOps.roaringPops(
        spark.read.parquet(path)
          .selectExpr("CAST(day AS BIGINT) AS day", "blk", "wi", "word"))
        .selectExpr("day", "blk", "pop AS n_exact", "pop"))
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.RelationalOps
import graft.streaming.StreamBurst

class StreamBurstSpec extends SparkSpec {
  import spark.implicits._

  test("streamed hourly store reproduces the batch q162 verdicts bit-for-bit across micro-batch splits") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("burst").toString + "/hours"
    val ck = Files.createTempDirectory("burst_ck").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = RelationalOps.burstDetector(events).collect().map(_.toSeq).toSeq
    val us = events.selectExpr("unix_micros(ts) AS us").as[Long].collect().toSeq
    val mem = MemoryStream[Long]
    val q = StreamBurst.start(
      mem.toDS().selectExpr("timestamp_micros(value) AS ts"), store, ck)
    try {
      // deliberately split an HOUR across chunks: the partial-count SUM
      // must reassemble it exactly
      us.grouped((us.length + 3) / 4).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = StreamBurst.verdicts(spark, store).collect().map(_.toSeq).toSeq
      assert(got === want,
        "stream-maintained store must reproduce the batch detector exactly")
    } finally q.stop()
  }

  test("failure-replay of a micro-batch rewrites its own partial — verdicts immovable") {
    val hourUs = RelationalOps.HourUs
    val store = Files.createTempDirectory("burst2").toString + "/hours"
    def batchDf(rows: Seq[Long]) =
      rows.toDF("us").selectExpr("timestamp_micros(us) AS ts")
    StreamBurst.mergeBatch(batchDf(Seq(0L, 1000L, hourUs + 5L)), 0L, store)
    StreamBurst.mergeBatch(batchDf(Seq(hourUs + 7L, 2 * hourUs)), 1L, store)
    val before = StreamBurst.verdicts(spark, store).collect().map(_.toSeq).toSeq
    // the checkpointed-foreachBatch replay case: batch 1 delivered again
    // under the SAME id must overwrite its own partition, not append
    StreamBurst.mergeBatch(batchDf(Seq(hourUs + 7L, 2 * hourUs)), 1L, store)
    val after = StreamBurst.verdicts(spark, store).collect().map(_.toSeq).toSeq
    assert(after === before, "re-delivered batch double-counted an hour")
    // and the partials really are per-hour SUMs: hour 0 has 2 events,
    // hour 1 has 2 (split across batches), hour 2 has 1
    val byHour = after.map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Long]).toMap
    assert(byHour === Map(0L -> 2L, 1L -> 2L, 2L -> 1L))
  }
}

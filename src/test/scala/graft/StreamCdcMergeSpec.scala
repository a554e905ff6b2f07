package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.RelationalOps
import graft.streaming.StreamCdcMerge

class StreamCdcMergeSpec extends SparkSpec {
  import spark.implicits._

  test("streamed CDC snapshot bit-equals batch q173 across splits that divide a key's history") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("cdc").toString + "/state"
    val ck = Files.createTempDirectory("cdc_ck").toString
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = RelationalOps.cdcMerge(customer, events).collect().map(_.toSeq).toSeq
    // split by arrival slices that cut INSIDE keys' histories: rows
    // ordered by event_id, chunked — every active user's changes span
    // several micro-batches
    val rows = events.selectExpr("unix_micros(ts) AS us", "event_id",
        "user_id", "event_type", "value")
      .as[(Long, Long, String, String, Option[Double])]
      .collect().sortBy(_._2).toSeq
    val mem = MemoryStream[(Long, Long, String, String, Option[Double])]
    val q = StreamCdcMerge.start(
      mem.toDS().selectExpr("timestamp_micros(_1) AS ts", "_2 AS event_id",
        "_3 AS user_id", "_4 AS event_type", "_5 AS value"),
      store, ck)
    try {
      rows.grouped((rows.length + 4) / 5).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = StreamCdcMerge.snapshot(spark, store, customer)
        .collect().map(_.toSeq).toSeq
      assert(got === want,
        "stream-maintained CDC state must reproduce the batch MERGE exactly")
    } finally q.stop()
  }

  test("winner merge is associative across any segmentation; same-id replay immovable; deletes and inserts cross batches") {
    val store = Files.createTempDirectory("cdc2").toString + "/state"
    def batchDf(rows: Seq[(Long, Long, String, String, Option[Double])]) =
      rows.toDF("us", "event_id", "user_id", "event_type", "v")
        .selectExpr("timestamp_micros(us) AS ts", "event_id", "user_id",
          "event_type", "CAST(v AS DOUBLE) AS value")
    val base = Seq(("1", 10.00), ("2", 20.00), ("3", 30.00))
      .toDF("c_custkey", "c_acctbal") // string keys, like events.user_id
    // key 1: upsert in batch 0, LATER delete in batch 1 (winner crosses
    // the split); key 2: delete then LATER upsert (resurrection); key 9:
    // pure CDC insert, base never had it; key 3: untouched
    StreamCdcMerge.mergeBatch(batchDf(Seq(
      (100L, 1L, "1", "purchase", Some(11.00)),
      (100L, 2L, "2", "error", None),
      (100L, 3L, "9", "purchase", Some(99.00)))), 0L, store)
    StreamCdcMerge.mergeBatch(batchDf(Seq(
      (200L, 4L, "1", "error", None),
      (200L, 5L, "2", "purchase", Some(22.00)))), 1L, store)
    def snap() = StreamCdcMerge.snapshot(spark, store, base).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSeq
    val s = snap()
    assert(!s.exists(_._1 == "1"), "later cross-batch delete must win")
    assert(s.contains(("2", 2200L, 2L, "upsert", "base")),
      "later cross-batch upsert must resurrect a deleted key")
    assert(s.contains(("9", 9900L, 1L, "upsert", "cdc")),
      "CDC-born key must survive with src=cdc")
    assert(s.contains(("3", 3000L, 0L, "base", "base")),
      "untouched base key must pass through")
    // failure replay: batch 1 re-delivered under the same id — counts
    // must not double-apply, winners must not move
    StreamCdcMerge.mergeBatch(batchDf(Seq(
      (200L, 4L, "1", "error", None),
      (200L, 5L, "2", "purchase", Some(22.00)))), 1L, store)
    assert(snap() === s, "re-delivered batch moved the CDC state")
    // associativity witness: the same five changes in ONE batch give the
    // same snapshot as the two-batch segmentation above
    val store2 = Files.createTempDirectory("cdc3").toString + "/state"
    StreamCdcMerge.mergeBatch(batchDf(Seq(
      (100L, 1L, "1", "purchase", Some(11.00)),
      (100L, 2L, "2", "error", None),
      (100L, 3L, "9", "purchase", Some(99.00)),
      (200L, 4L, "1", "error", None),
      (200L, 5L, "2", "purchase", Some(22.00)))), 0L, store2)
    val one = StreamCdcMerge.snapshot(spark, store2, base).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSeq
    assert(one === s, "segmentation must not change the snapshot")
  }
}

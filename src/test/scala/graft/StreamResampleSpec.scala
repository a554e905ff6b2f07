package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.RelationalOps
import graft.streaming.StreamResample

class StreamResampleSpec extends SparkSpec {
  import spark.implicits._

  test("streamed panel bit-equals batch q190 across arrival splits on the real table") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("panel").toString + "/cells"
    val ck = Files.createTempDirectory("panel_ck").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = RelationalOps.resampleFill(events).collect().map(_.toSeq).toSeq
    val rows = events.filter("value IS NOT NULL")
      .selectExpr("unix_micros(ts)", "user_id", "event_id", "value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val q = StreamResample.start(
      mem.toDS().selectExpr("timestamp_micros(_1) AS ts", "_2 AS user_id",
        "_3 AS event_id", "_4 AS value"),
      store, ck)
    try {
      rows.grouped((rows.length + 3) / 4).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = StreamResample.panel(spark, store).collect().map(_.toSeq).toSeq
      assert(got === want,
        "stream-maintained cells must reproduce the batch panel exactly")
    } finally q.stop()
  }

  test("late data merges by algebra: an old observation arriving later cannot displace the winner; replay immovable") {
    val hourUs = RelationalOps.HourUs
    val store = Files.createTempDirectory("panel2").toString + "/cells"
    def batchDf(rows: Seq[(Long, Long, Long, Long)]) = // (hour, off, eid, cents)
      rows.toDF("h", "off", "event_id", "c")
        .selectExpr(s"timestamp_micros(h * $hourUs + off) AS ts",
          "CAST(1 AS BIGINT) AS user_id", "event_id",
          "CAST(c AS DOUBLE) / 100 AS value")
    def cell(h: Long) = StreamResample.panel(spark, store).collect()
      .find(r => r.getLong(0) == 1L && r.getLong(1) == h).get
    // batch 0: hour 0 obs (us=10) worth 100c; hour 2 obs worth 300c
    StreamResample.mergeBatch(batchDf(Seq((0L, 10L, 0L, 100L), (2L, 0L, 1L, 300L))), 0L, store)
    assert(cell(1L).getLong(3) === 100L, "the gap hour fills from hour 0")
    // batch 1: a LATE observation for hour 0 with EARLIER us (5) — merges
    // into the cell (n_obs sums) but cannot displace the us=10 winner
    StreamResample.mergeBatch(batchDf(Seq((0L, 5L, 9L, 999L))), 1L, store)
    val h0 = cell(0L)
    assert(h0.getLong(2) === 2L, "late row must count into its cell")
    assert(h0.getLong(3) === 100L,
      "an earlier-timestamped late arrival must NOT displace the winner")
    assert(cell(1L).getLong(3) === 100L, "the fill downstream is unmoved")
    // ...but a late observation that IS newer (us=20) takes the cell over
    StreamResample.mergeBatch(batchDf(Seq((0L, 20L, 7L, 150L))), 2L, store)
    assert(cell(0L).getLong(3) === 150L && cell(1L).getLong(3) === 150L,
      "a genuinely newer late arrival wins and re-fills the gap")
    // replay: the same batch under the same id must not double n_obs
    val s = StreamResample.panel(spark, store).collect().map(_.toSeq).toSeq
    StreamResample.mergeBatch(batchDf(Seq((0L, 20L, 7L, 150L))), 2L, store)
    assert(StreamResample.panel(spark, store).collect().map(_.toSeq).toSeq === s,
      "re-delivered batch moved the cell store")
  }
}

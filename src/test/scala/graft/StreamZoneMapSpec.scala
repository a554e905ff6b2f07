package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.ScaleOps
import graft.streaming.StreamZoneMap

class StreamZoneMapSpec extends SparkSpec {
  import spark.implicits._

  test("streamed zone-map store reproduces the batch q160 audit bit-for-bit across splits that divide a day") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("zonemap").toString + "/stats"
    val ck = Files.createTempDirectory("zonemap_ck").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = ScaleOps.zoneMapAudit(events).collect().map(_.toSeq).toSeq
    val rows = events.selectExpr("unix_micros(ts) AS us", "value")
      .as[(Long, Option[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Option[Double])]
    val q = StreamZoneMap.start(
      mem.toDS().selectExpr("timestamp_micros(_1) AS ts", "_2 AS value"),
      store, ck)
    try {
      rows.grouped((rows.length + 3) / 4).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = StreamZoneMap.audit(spark, store).collect().map(_.toSeq).toSeq
      assert(got === want,
        "stream-maintained stats must reproduce the batch audit exactly")
    } finally q.stop()
  }

  test("per-day partials merge by each column's own algebra; same-id replay immovable") {
    val dayUs = graft.ops.RelationalOps.DayUs
    val store = Files.createTempDirectory("zonemap2").toString + "/stats"
    def batchDf(rows: Seq[(Long, Option[Double])]) =
      rows.toDF("us", "v").selectExpr("timestamp_micros(us) AS ts",
        "CAST(v AS DOUBLE) AS value")
    // day 0 split across two batches with different mins/maxes; one
    // in-window cents row per batch
    StreamZoneMap.mergeBatch(batchDf(Seq(
      (10L, Some(120.0)), (20L, Some(500.0)))), 0L, store)
    StreamZoneMap.mergeBatch(batchDf(Seq(
      (5L, Some(130.0)), (dayUs + 1L, None))), 1L, store)
    val audit = StreamZoneMap.audit(spark, store).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d0 = audit(0L)
    assert(d0.getLong(1) === 3L && d0.getLong(2) === 5L && d0.getLong(3) === 20L,
      "min/max must merge across batch partials")
    assert(d0.getLong(4) === 12000L && d0.getLong(5) === 50000L)
    assert(d0.getLong(10) === 2L, "in-window cents counts must SUM across partials")
    assert(audit(1L).isNullAt(4) && audit(1L).getBoolean(9),
      "all-NULL partial day skips with NULL bounds")
    // failure replay: batch 1 re-delivered under the same id
    StreamZoneMap.mergeBatch(batchDf(Seq(
      (5L, Some(130.0)), (dayUs + 1L, None))), 1L, store)
    val again = StreamZoneMap.audit(spark, store).collect().map(_.toSeq).toSeq
    assert(again === audit.values.toSeq.sortBy(_.getLong(0)).map(_.toSeq),
      "re-delivered batch moved the store")
  }
}

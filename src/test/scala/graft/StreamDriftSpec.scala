package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.ProfileOps
import graft.streaming.StreamDrift

class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private val dayUs = 86400000000L

  test("streamed posture against the period-A reference bit-equals batch q206 once period B has landed") {
    implicit val sc = spark.sqlContext
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = ProfileOps.driftCensus(events).collect().map(_.toSeq).toSeq
    // the same midpoint cut the batch census uses
    val Array(d0, d1) = events
      .selectExpr(s"min(unix_micros(ts) DIV $dayUs)", s"max(unix_micros(ts) DIV $dayUs)")
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val cut = d0 + (d1 - d0 + 1) / 2
    val ref = StreamDrift.referenceBins(
      events.filter(s"unix_micros(ts) DIV $dayUs < $cut")).localCheckpoint()
    val live = events.filter(s"unix_micros(ts) DIV $dayUs >= $cut")
      .selectExpr("unix_micros(ts) AS us", "event_id", "event_type", "value")
      .as[(Long, Long, String, Option[Double])].collect().sortBy(t => (t._1, t._2)).toSeq
    val store = Files.createTempDirectory("drift").toString + "/bins"
    val ck = Files.createTempDirectory("drift_ck").toString
    val mem = MemoryStream[(Long, Long, String, Option[Double])]
    val q = StreamDrift.start(
      mem.toDS().selectExpr("timestamp_micros(_1) AS ts", "_2 AS event_id",
        "_3 AS event_type", "_4 AS value"),
      store, ck)
    try {
      live.grouped((live.length + 4) / 5).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = StreamDrift.posture(spark, store, ref).collect().map(_.toSeq).toSeq
      assert(got === want,
        "live bins vs the period-A reference must reproduce the batch census exactly")
    } finally q.stop()
  }

  test("off-distribution traffic pages the monitor live; same-id replay immovable") {
    val store = Files.createTempDirectory("drift2").toString + "/bins"
    def ev(rows: Seq[(Long, String, Double)]): DataFrame =
      rows.toDF("usv", "event_type", "value")
        .selectExpr("timestamp_micros(usv) AS ts", "event_type", "value")
    // reference: 30 uniform clicks/views at one value
    val ref = StreamDrift.referenceBins(ev(
      (0 until 30).map(i => (i.toLong, if (i % 2 == 0) "click" else "view", 50.0))))
      .localCheckpoint()
    // batch 0: live traffic matching the reference — in control
    StreamDrift.mergeBatch(ev((0 until 10).map(i =>
      (i.toLong, if (i % 2 == 0) "click" else "view", 50.0))), 0L, store)
    def et() = StreamDrift.posture(spark, store, ref).collect()
      .find(_.getString(0) == "event_type").get
    assert(!et().getBoolean(7), "matching traffic must not page")
    // batch 1: a burst of pure errors lands — the monitor pages NOW
    StreamDrift.mergeBatch(ev((10 until 30).map(i =>
      (i.toLong, "error", 50.0))), 1L, store)
    val paged = et()
    assert(paged.getBoolean(7) && paged.getString(5) === "error",
      "an off-distribution burst must page with the burst value as worst bin")
    val s = StreamDrift.posture(spark, store, ref).collect().map(_.toSeq).toSeq
    // same-id replay must not move the store
    StreamDrift.mergeBatch(ev((10 until 30).map(i =>
      (i.toLong, "error", 50.0))), 1L, store)
    assert(StreamDrift.posture(spark, store, ref).collect().map(_.toSeq).toSeq === s,
      "re-delivered batch moved the bin store")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.ScaleOps
import graft.streaming.StreamCompaction

class StreamCompactionSpec extends SparkSpec {
  import spark.implicits._

  test("streamed manifest reproduces the batch q179 plan bit-for-bit across splits that divide a day") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("cmp").toString + "/manifest"
    val ck = Files.createTempDirectory("cmp_ck").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = ScaleOps.compactionPlan(events).collect().map(_.toSeq).toSeq
    val rows = events.selectExpr("unix_micros(ts) AS us", "user_id", "event_type")
      .as[(Long, Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamCompaction.start(
      mem.toDS().selectExpr("timestamp_micros(_1) AS ts", "_2 AS user_id",
        "_3 AS event_type"),
      store, ck)
    try {
      rows.grouped((rows.length + 3) / 4).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = StreamCompaction.plan(spark, store).collect().map(_.toSeq).toSeq
      assert(got === want,
        "stream-maintained manifest must reproduce the batch plan exactly")
    } finally q.stop()
  }

  test("SUM partials need the batch_id discipline: same-id replay immovable, growth replans") {
    val store = Files.createTempDirectory("cmp2").toString + "/manifest"
    val dayUs = graft.ops.RelationalOps.DayUs
    def batchDf(rows: Seq[(Long, Long, String)]) =
      rows.toDF("day0", "user_id", "event_type")
        .selectExpr(s"timestamp_micros(day0 * $dayUs) AS ts", "user_id",
          "event_type")
    val b0 = (1L to 30L).map(i => (i % 3, i, "t"))
    StreamCompaction.mergeBatch(batchDf(b0), 0L, store)
    val s = StreamCompaction.plan(spark, store).collect().map(_.toSeq).toSeq
    // same-id replay: the partial is REWRITTEN, not double-counted
    StreamCompaction.mergeBatch(batchDf(b0), 0L, store)
    assert(StreamCompaction.plan(spark, store).collect().map(_.toSeq).toSeq === s,
      "re-delivered batch must not double the manifest")
    // a genuinely new batch moves the plan (SUM state is NOT idempotent
    // by algebra — exactly why the bookkeeping exists)
    StreamCompaction.mergeBatch(batchDf(b0), 1L, store)
    val grown = StreamCompaction.plan(spark, store).collect()
    assert(grown.map(_.toSeq).toSeq !== s, "new traffic must replan")
    assert(grown.filter(_.getLong(0) == -1L).head.getLong(4) ===
      2 * s.find(_(0) == -1L).get(4).asInstanceOf[Long],
      "doubled traffic doubles total bytes")
    assert(grown.forall(r => r.getBoolean(5) && r.getBoolean(6)),
      "plan laws must hold after growth")
  }
}

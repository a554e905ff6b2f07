package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.RelationalOps
import graft.streaming.StreamRobustOutliers

class StreamRobustOutliersSpec extends SparkSpec {
  import spark.implicits._

  test("streamed posture bit-equals batch q187 across arrival splits on the real table") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("robust").toString + "/counts"
    val ck = Files.createTempDirectory("robust_ck").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = RelationalOps.robustOutliers(events).collect().map(_.toSeq).toSeq
    val rows = events.filter("value IS NOT NULL")
      .selectExpr("unix_micros(ts)", "value").as[(Long, Double)].collect().toSeq
    val mem = MemoryStream[(Long, Double)]
    val q = StreamRobustOutliers.start(
      mem.toDS().selectExpr("timestamp_micros(_1) AS ts", "_2 AS value"),
      store, ck)
    try {
      rows.grouped((rows.length + 3) / 4).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = StreamRobustOutliers.posture(spark, store).collect().map(_.toSeq).toSeq
      assert(got === want,
        "stream-maintained counts must reproduce the batch census exactly")
    } finally q.stop()
  }

  test("a landing whale flags live but moves the median at most one rank; replay immovable") {
    val dayUs = RelationalOps.DayUs
    val store = Files.createTempDirectory("robust2").toString + "/counts"
    def batchDf(cents: Seq[Long]) = cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("off", "c")
      .selectExpr(s"timestamp_micros($dayUs + off) AS ts",
        "CAST(c AS DOUBLE) / 100 AS value")
    def day1() = StreamRobustOutliers.posture(spark, store).collect()
      .find(_.getLong(0) == 1L).get
    // batch 0: values 1..7 dollars on day 1 -> med 400, MAD 200, no flags
    StreamRobustOutliers.mergeBatch(batchDf((1L to 7L).map(_ * 100)), 0L, store)
    val before = day1()
    assert(before.getLong(2) === 400L && before.getLong(3) === 200L &&
      before.getLong(4) === 0L && before.getLong(5) === 0L)
    // batch 1: ONE whale lands -> both flag rules fire immediately, but the
    // lower median of now-8 values stays at rank 4 = 400 (one-rank bound)
    StreamRobustOutliers.mergeBatch(batchDf(Seq(100000000L)), 1L, store)
    val after = day1()
    assert(after.getLong(4) === 1L && after.getLong(5) === 1L,
      "the whale must flag robustly AND by the fixed rule the moment it lands")
    assert(after.getLong(2) === 400L, "a whale moves the median at most one rank")
    val s = StreamRobustOutliers.posture(spark, store).collect().map(_.toSeq).toSeq
    // replay: the same batch under the same id must not double any count
    StreamRobustOutliers.mergeBatch(batchDf(Seq(100000000L)), 1L, store)
    assert(StreamRobustOutliers.posture(spark, store).collect().map(_.toSeq).toSeq === s,
      "re-delivered batch moved the count store")
    // the same cents value split ACROSS batches sums: three more 400-cent
    // rows under a new id shift the deviation mass toward 0, tightening MAD
    StreamRobustOutliers.mergeBatch(batchDf(Seq(400L, 400L, 400L)), 2L, store)
    val grown = day1()
    assert(grown.getLong(1) === 11L && grown.getLong(2) === 400L &&
      grown.getLong(3) === 100L,
      "counts for one value spanning batches must SUM before the selection")
  }
}

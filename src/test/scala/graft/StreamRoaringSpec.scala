package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.SketchOps
import graft.streaming.StreamRoaring

class StreamRoaringSpec extends SparkSpec {
  import spark.implicits._

  test("streamed word store reproduces batch q178 bit-for-bit across splits that divide a day and a block") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("roar").toString + "/words"
    val ck = Files.createTempDirectory("roar_ck").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val want = SketchOps.roaringCube(events).collect().map(_.toSeq).toSeq
    val rows = events.selectExpr("unix_micros(ts) AS us", "value")
      .as[(Long, Option[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Option[Double])]
    val q = StreamRoaring.start(
      mem.toDS().selectExpr("timestamp_micros(_1) AS ts", "_2 AS value"),
      store, ck)
    try {
      rows.grouped((rows.length + 3) / 4).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = StreamRoaring.containers(spark, store).collect().map(_.toSeq).toSeq
      assert(got === want,
        "stream-maintained containers must reproduce the batch artifact exactly")
    } finally q.stop()
  }

  test("OR algebra absorbs duplicate delivery outright — stronger than same-id replay — and segmentation is invisible") {
    val store = Files.createTempDirectory("roar2").toString + "/words"
    val dayUs = graft.ops.RelationalOps.DayUs
    def batchDf(rows: Seq[(Long, Double)]) =
      rows.toDF("day0", "v")
        .selectExpr(s"timestamp_micros(day0 * $dayUs) AS ts",
          "CAST(v AS DOUBLE) AS value")
    val b1 = Seq((0L, 1.00), (0L, 2.00), (1L, 3.00))
    val b2 = Seq((0L, 5.00), (1L, 3.00)) // 3.00 re-arrives across batches
    StreamRoaring.mergeBatch(batchDf(b1), store)
    StreamRoaring.mergeBatch(batchDf(b2), store)
    val s = StreamRoaring.containers(spark, store).collect().map(_.toSeq).toSeq
    // the same five rows delivered AGAIN, in different groupings, twice
    StreamRoaring.mergeBatch(batchDf(b2 ++ b1), store)
    StreamRoaring.mergeBatch(batchDf(b1 ++ b1), store)
    assert(StreamRoaring.containers(spark, store).collect().map(_.toSeq).toSeq === s,
      "re-delivered and re-segmented batches must not move the store")
    // and the store equals the one-shot batch build of the union
    val oneShot = SketchOps.roaringCube(batchDf(b1 ++ b2)).collect().map(_.toSeq).toSeq
    assert(s === oneShot, "segmentation must be invisible to the artifact")
    // the duplicate-absorbed counts are right: day 0 has 3 distinct cents,
    // day 1 has 1
    val byDay = s.filter(_(1) == -1L).map(r => r(0) -> r(2)).toMap
    assert(byDay(0L) === 3L && byDay(1L) === 1L)
  }
}

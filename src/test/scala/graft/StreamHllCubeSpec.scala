package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.SketchOps
import graft.streaming.StreamHllCube

class StreamHllCubeSpec extends SparkSpec {
  import spark.implicits._

  private def regsOf(path: String) =
    spark.read.parquet(path)
      .selectExpr("CAST(day AS BIGINT) AS day", "j", "reg")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

  private def batchRegs(dir: String) =
    SketchOps.userDayRegisters(Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

  test("streamed register store equals the batch q154 table bit-for-bit; re-delivery is a no-op") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("hllcube").toString + "/regs"
    val ck = Files.createTempDirectory("hllcube_ck").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("unix_micros(ts) AS us", "user_id").as[(Long, Long)]
      .collect().toSeq
    val mem = MemoryStream[(Long, Long)]
    val q = StreamHllCube.start(
      mem.toDS().selectExpr("timestamp_micros(_1) AS ts", "_2 AS user_id"),
      store, ck)
    try {
      val chunks = events.grouped((events.length + 2) / 3).toSeq
      chunks.foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }
      val want = batchRegs("/root/testdata/sf0.001")
      assert(regsOf(store) === want,
        "streamed register maintenance must converge to the batch build")
      // algebraic idempotency: replaying an already-absorbed chunk (a
      // re-delivered batch) cannot move a single register
      mem.addData(chunks(1).toIndexedSeq); q.processAllAvailable()
      assert(regsOf(store) === want, "MAX-merge re-delivery moved the table")
    } finally q.stop()
  }

  test("each merge touches only the arriving days — untouched partitions keep their files") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("hllcube2").toString + "/regs"
    val ck = Files.createTempDirectory("hllcube2_ck").toString
    val day = graft.ops.RelationalOps.DayUs
    val mem = MemoryStream[(Long, Long)]
    val q = StreamHllCube.start(
      mem.toDS().selectExpr("timestamp_micros(_1) AS ts", "_2 AS user_id"),
      store, ck)
    try {
      mem.addData((1L * day, 1L), (1L * day, 2L)); q.processAllAvailable()
      val day1Files = new java.io.File(s"$store/day=1").listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
      // a batch for day 2 must not rewrite day 1's partition
      mem.addData((2L * day, 3L)); q.processAllAvailable()
      val day1After = new java.io.File(s"$store/day=1").listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
      assert(day1After === day1Files,
        "dynamic overwrite rewrote an untouched day partition")
      assert(new java.io.File(s"$store/day=2").exists())
      // day-1 arrivals MERGE with the stored registers (max, not replace)
      val before = regsOf(store)
      mem.addData((1L * day, 1L)); q.processAllAvailable()
      assert(regsOf(store) === before, "an absorbed user changed a register")
    } finally q.stop()
  }
}

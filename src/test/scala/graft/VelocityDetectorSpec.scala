package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.VelocityDetector
import graft.streaming.VelocityDetector.{Alert, Txn}

class VelocityDetectorSpec extends SparkSpec {
  import spark.implicits._

  test("velocity alert fires on >3 txns in 60s for one user, state persists across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Txn]
    val alerts = VelocityDetector.detect(mem.toDS(), stateTimeout = None)
    val q = alerts.writeStream.format("memory").queryName("velocity_test")
      .outputMode("append").start()
    try {
      // batch 1: 3 txns in-window — no alert yet
      mem.addData(Txn("u1", 10, 100), Txn("u1", 11, 110), Txn("u1", 12, 120))
      q.processAllAvailable()
      assert(spark.table("velocity_test").count() === 0)
      // batch 2: 4th txn within 60s of the first three → alert (state carried over)
      mem.addData(Txn("u1", 13, 130), Txn("u2", 5, 130))
      q.processAllAvailable()
      val got = spark.table("velocity_test").as[Alert].collect()
      assert(got.length === 1)
      assert(got.head.userId === "u1" && got.head.kind === "velocity")
    } finally q.stop()
  }

  test("deviation alert fires on 3x the running mean after warm-up") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Txn]
    val alerts = VelocityDetector.detect(mem.toDS(), maxTxns = 99, stateTimeout = None)
    val q = alerts.writeStream.format("memory").queryName("deviation_test")
      .outputMode("append").start()
    try {
      mem.addData(Txn("u1", 100, 0), Txn("u1", 110, 1000), Txn("u1", 90, 2000))
      q.processAllAvailable()
      mem.addData(Txn("u1", 500, 3000)) // 500 > 3 * 100
      q.processAllAvailable()
      val got = spark.table("deviation_test").as[Alert].collect()
      assert(got.length === 1 && got.head.kind === "deviation")
    } finally q.stop()
  }
}

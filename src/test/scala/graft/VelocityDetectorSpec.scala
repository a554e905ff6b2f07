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

  test("event-time variant: replay in any batch split/order yields identical alerts") {
    implicit val sc = spark.sqlContext
    def run(batches: Seq[Seq[Txn]], name: String): Seq[Alert] = {
      val mem = MemoryStream[Txn]
      val q = VelocityDetector.detectEventTime(mem.toDS(), watermarkDelaySec = 60)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        // sentinel batches push the watermark far past every event so the
        // buffered prefix seals and the wake-up timeouts fire
        mem.addData(Txn("sentinel", 1, 1000000)); q.processAllAvailable()
        mem.addData(Txn("sentinel", 1, 1000001)); q.processAllAvailable()
        spark.table(name).as[Alert].collect().toSeq
          .filterNot(_.userId == "sentinel")
          .sortBy(a => (a.userId, a.timestamp, a.kind))
      } finally q.stop()
    }
    val evs = Seq(Txn("u1", 10, 100), Txn("u1", 11, 110),
      Txn("u1", 12, 120), Txn("u1", 13, 130))
    val oneBatchInOrder = run(Seq(evs), "ev_one_batch")
    // the round-2 failure mode: later events ARRIVE in earlier batches
    val scrambledBatches = run(
      Seq(Seq(evs(2)), Seq(evs(0), evs(3)), Seq(evs(1))), "ev_scrambled")
    assert(oneBatchInOrder === scrambledBatches)
    assert(oneBatchInOrder.exists(_.kind === "velocity"))
  }

  test("event-time state expiry follows the data clock, not wall clock") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Txn]
    val alerts = VelocityDetector.detectEventTime(mem.toDS(),
      stateTtlSec = 60, watermarkDelaySec = 0)
    val q = alerts.writeStream.format("memory").queryName("ev_expiry")
      .outputMode("append").start()
    try {
      // u1 warms up (3 txns, mean 100) at data time ≈ 100
      mem.addData(Txn("u1", 100, 100), Txn("u1", 110, 101), Txn("u1", 90, 102))
      q.processAllAvailable()
      // the DATA clock jumps far past u1's TTL → watermark passes 102+60
      mem.addData(Txn("u2", 1, 10000))
      q.processAllAvailable()
      mem.addData(Txn("u2", 1, 10001)) // next batch: u1's idle TTL fires
      q.processAllAvailable()
      // u1 returns with a 50× amount: state was expired by the data clock,
      // so the warm-up is gone and NO deviation alert may fire
      mem.addData(Txn("u1", 5000, 10050))
      q.processAllAvailable()
      mem.addData(Txn("u2", 1, 10200)) // seal u1's return event
      q.processAllAvailable()
      mem.addData(Txn("u2", 1, 10201))
      q.processAllAvailable()
      val got = spark.table("ev_expiry").as[Alert].collect()
      assert(!got.exists(_.kind === "deviation"))
    } finally q.stop()
  }

  test("event-time alert for a key with NO further traffic fires at watermark-reach") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Txn]
    val alerts = VelocityDetector.detectEventTime(mem.toDS(), watermarkDelaySec = 60)
    val q = alerts.writeStream.format("memory").queryName("ev_wakeup")
      .outputMode("append").start()
    try {
      // u1 trips the velocity rule (4 txns in 60s) and then goes silent
      mem.addData(Txn("u1", 10, 100), Txn("u1", 11, 110),
        Txn("u1", 12, 120), Txn("u1", 13, 130))
      q.processAllAvailable()
      // another key pushes the watermark to 195 - 60 = 135 — JUST past u1's
      // last event (130). u1's buffered prefix is now sealable.
      mem.addData(Txn("u2", 1, 195))
      q.processAllAvailable()
      // one more batch lets u1's wake-up timeout fire against wm = 135 s.
      // The regression this guards: a wake-up of pending.min + delay
      // (160 s here) would NOT have fired — the alert would wait a further
      // full watermark delay for a key that never sends traffic again.
      mem.addData(Txn("u2", 1, 196))
      q.processAllAvailable()
      val got = spark.table("ev_wakeup").as[Alert].collect()
      assert(got.exists(a => a.userId == "u1" && a.kind == "velocity"),
        s"alert must fire once the watermark reaches the event, got ${got.toSeq}")
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

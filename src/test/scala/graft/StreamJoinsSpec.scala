package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamJoins

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static enrichment keeps alerts for unknown users (left outer)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val users = Seq(("u1", "gold"), ("u2", "basic")).toDF("userId", "tier")
    val enriched = StreamJoins.enrichWithUsers(
      mem.toDF().toDF("userId", "amount"), users)
    val q = enriched.writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      mem.addData(("u1", 11000.0), ("u9", 12000.0))
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .select("userId", "tier").as[(String, Option[String])].collect().toMap
      assert(got === Map("u1" -> Some("gold"), "u9" -> None))
    } finally q.stop()
  }

  test("stream-stream interval join emits purchases inside the window only") {
    implicit val sc = spark.sqlContext
    val signups = MemoryStream[(String, Double, Long)]
    val purchases = MemoryStream[(String, Double, Long)]
    val joined = StreamJoins.purchasesAfterSignup(
      signups.toDF().toDF("userId", "amount", "timestamp"),
      purchases.toDF().toDF("userId", "amount", "timestamp"),
      maxGapSec = 100)
    val q = joined.writeStream.format("memory").queryName("interval_test")
      .outputMode("append").start()
    try {
      signups.addData(("u1", 0.0, 1000L), ("u2", 0.0, 1000L))
      purchases.addData(
        ("u1", 50.0, 1050L),  // inside window → emitted
        ("u1", 60.0, 2000L),  // gap 1000 > 100 → excluded
        ("u2", 70.0, 990L),   // before signup → excluded
        ("u3", 80.0, 1010L))  // no signup → excluded
      q.processAllAvailable()
      val got = spark.table("interval_test")
        .select("userId", "gap_sec").as[(String, Long)].collect().toSeq
      assert(got === Seq(("u1", 50L)))
    } finally q.stop()
  }
}

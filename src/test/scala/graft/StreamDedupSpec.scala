package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamDedup

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("watermark-bounded dedup suppresses duplicates within the horizon") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = StreamDedup.dedupWithinWatermark(
      mem.toDF().toDF("id", "text", "ts"), Seq("text"), "ts", delay = "1 minute")
    val q = deduped.writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a b c", ts(0)), (2L, "a b c", ts(10)), (3L, "x y z", ts(20)))
      q.processAllAvailable()
      // exactly ONE row per key survives (which of an in-batch duplicate
      // pair wins is unspecified — the contract is one-per-key, not first)
      val got = spark.table("dedup_wm").select("text").as[String].collect().sorted
      assert(got === Array("a b c", "x y z"))
    } finally q.stop()
  }

  test("fingerprint dedup treats reordered token bags as duplicates") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = StreamDedup.dedupDocsByFingerprint(
      mem.toDF().toDF("doc_id", "text", "ts"), "ts", delay = "1 minute")
    val q = deduped.writeStream.format("memory").queryName("dedup_fp")
      .outputMode("append").start()
    try {
      mem.addData((1L, "b a c", ts(0)), (2L, "c b a", ts(5)), (3L, "d e f", ts(9)))
      q.processAllAvailable()
      // "b a c" and "c b a" share a fingerprint → exactly one survives
      val got = spark.table("dedup_fp").select("fp").as[String].collect()
      assert(got.length === 2 && got.distinct.length === 2)
    } finally q.stop()
  }
}

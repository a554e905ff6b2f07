package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.TextOps
import graft.streaming.StreamPiiScrub

class StreamPiiScrubSpec extends SparkSpec {
  import spark.implicits._

  test("arriving text is masked in-flight; counts flag the PII volume") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamPiiScrub.scrub(mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "call 555-0199 or mail bob.k@corp.example now"),
        (2L, "server at 192.168.7.13 is fine"),
        (3L, "nothing sensitive here"))
      q.processAllAvailable()
      val got = spark.table("pii_stream").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(got(1L) === (("call <PHONE> or mail <EMAIL> now", 2L)))
      assert(got(2L) === (("server at <IP> is fine", 1L)))
      assert(got(3L) === (("nothing sensitive here", 0L)))
    } finally q.stop()
  }

  test("stream redaction is the exact batch q86 replace chain") {
    implicit val sc = spark.sqlContext
    // same text through the batch chain (as a literal expression) must
    // equal the stream output — shared constants make drift structural
    val dirty = "a 10.0.0.1 b 555-1234 c x@y.org d"
    val batch = Seq(dirty).toDF("text")
      .selectExpr(s"${TextOps.piiRedact("text")} AS t").as[String].head()
    val mem = MemoryStream[(Long, String)]
    val out = StreamPiiScrub.scrub(mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("pii_parity")
      .outputMode("append").start()
    try {
      mem.addData((1L, dirty))
      q.processAllAvailable()
      assert(spark.table("pii_parity").select("text").as[String].head() === batch)
    } finally q.stop()
  }
}

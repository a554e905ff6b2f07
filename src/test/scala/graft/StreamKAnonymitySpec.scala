package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.PipelineOps
import graft.streaming.StreamKAnonymity

class StreamKAnonymitySpec extends SparkSpec {
  import spark.implicits._

  test("streamed posture bit-equals the batch q180 ladder across arrival splits") {
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("kanon").toString + "/classes"
    val ck = Files.createTempDirectory("kanon_ck").toString
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")
    val want = PipelineOps.kAnonymityAudit(customer).collect().map(_.toSeq).toSeq
    val rows = customer.selectExpr("c_nationkey", "c_mktsegment", "c_acctbal")
      .as[(Int, String, Double)].collect().toSeq
    val mem = MemoryStream[(Int, String, Double)]
    val q = StreamKAnonymity.start(
      mem.toDS().selectExpr("_1 AS c_nationkey", "_2 AS c_mktsegment",
        "_3 AS c_acctbal"),
      store, ck)
    try {
      rows.grouped((rows.length + 3) / 4).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = StreamKAnonymity.posture(spark, store).collect().map(_.toSeq).toSeq
      assert(got === want,
        "stream-maintained classes must reproduce the batch ladder exactly")
    } finally q.stop()
  }

  test("a newly-arrived rare QI combination collapses k live; same-id replay immovable") {
    val store = Files.createTempDirectory("kanon2").toString + "/classes"
    def batchDf(rows: Seq[(Int, String, Double)]) =
      rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    // batch 0: one fat class of 6 identical QI rows -> k = 6 at level 0
    StreamKAnonymity.mergeBatch(batchDf(Seq.fill(6)((1, "S", 10.00))), 0L, store)
    def k0() = StreamKAnonymity.posture(spark, store).collect()
      .find(_.getLong(0) == 0L).get.getLong(3)
    assert(k0() === 6L)
    // batch 1: ONE rare combination arrives -> k drops to 1 immediately
    StreamKAnonymity.mergeBatch(batchDf(Seq((7, "Z", 999.99))), 1L, store)
    assert(k0() === 1L, "a live singleton must collapse k")
    val s = StreamKAnonymity.posture(spark, store).collect().map(_.toSeq).toSeq
    // replay: same batch under the same id must not double class counts
    StreamKAnonymity.mergeBatch(batchDf(Seq((7, "Z", 999.99))), 1L, store)
    assert(StreamKAnonymity.posture(spark, store).collect().map(_.toSeq).toSeq === s,
      "re-delivered batch moved the class store")
    // and splitting a class ACROSS batches still sums: 3 more of the fat
    // class under a new id -> level-0 k stays 1 (the singleton) but the
    // fat class is now 9 (visible at level 3 where the ladder merges)
    StreamKAnonymity.mergeBatch(batchDf(Seq.fill(3)((1, "S", 10.00))), 2L, store)
    val l0 = StreamKAnonymity.posture(spark, store).collect()
      .find(_.getLong(0) == 0L).get
    assert(l0.getLong(1) === 10L && l0.getLong(3) === 1L)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.PipelineOps
import graft.streaming.StreamSample

class StreamSampleSpec extends SparkSpec {
  import spark.implicits._

  test("streamed sample bit-equals the batch q176 weighted sample across arrival splits") {
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val want = PipelineOps.weightedBottomkSample(docs)
      .select("doc_id", "key48").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val keyed = PipelineOps.aresKeyed(docs)
      .selectExpr("doc_id", "key48").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (groupSize <- Seq(101, keyed.length)) {
      val store = Files.createTempDirectory("ssmp").toString + "/sample"
      val ck = Files.createTempDirectory("ssmp_ck").toString
      val mem = MemoryStream[(Long, Long)]
      val q = StreamSample.start(
        mem.toDF().selectExpr("0L AS g", "_1 AS id", "_2 AS key"),
        store, ck, PipelineOps.WBottomK)
      try {
        keyed.grouped(groupSize).foreach { c =>
          mem.addData(c.toIndexedSeq); q.processAllAvailable()
        }
        val got = StreamSample.sample(spark, store, PipelineOps.WBottomK)
          .select("id", "key").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === want,
          s"streamed sample diverged from batch q176 at group size $groupSize")
      } finally q.stop()
    }
  }

  test("grouped selection, replay idempotence, and the below-K regime") {
    val store = Files.createTempDirectory("ssmp2").toString + "/sample"
    val k = 3
    // group 0: 6 candidates; group 1: 2 (below K — the sample IS the group)
    val rows = Seq(
      (0L, 10L, 50L), (0L, 11L, 70L), (0L, 12L, 10L),
      (0L, 13L, 90L), (0L, 14L, 70L), (0L, 15L, 20L),
      (1L, 20L, 5L), (1L, 21L, 1L))
    def df(s: Seq[(Long, Long, Long)]) = s.toDF("g", "id", "key")
    StreamSample.mergeBatch(df(rows.take(4)), 0L, store, k)
    StreamSample.mergeBatch(df(rows.drop(4)), 1L, store, k)
    def read() = StreamSample.sample(spark, store, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = read()
    // group 0 top-3 by (key DESC, id-string ASC): 90→13, 70→{11,14} (ties
    // break on the smaller id string)
    assert(got === Set((0L, 13L, 90L), (0L, 11L, 70L), (0L, 14L, 70L),
      (1L, 20L, 5L), (1L, 21L, 1L)))
    // replay: re-delivered batch under its own id leaves the store unmoved
    StreamSample.mergeBatch(df(rows.drop(4)), 1L, store, k)
    assert(read() === got, "re-delivered batch changed the sample")
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.QualityModelOps
import graft.streaming.StreamBudgetGate

class StreamBudgetGateSpec extends SparkSpec {
  import spark.implicits._

  test("in-flight budget admission equals batch q123 membership, corpus-wide") {
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the batch side: train the artifact, pick the cut, list the kept set
    val (w, bias) = QualityModelOps.bucketWeightsMicro(docs)
    val batchCut = QualityModelOps.qualityBudgetCut(
      QualityModelOps.qualityClassifier(docs).select("doc_id", "score_micro"), docs)
    val cut = StreamBudgetGate.cutBinOf(batchCut)
    val kept = batchCut.select("doc_id").as[Long].collect().toSet
    assert(kept.nonEmpty && kept.size < docs.count())

    val mem = MemoryStream[(Long, String, String)]
    val out = StreamBudgetGate.flag(
      mem.toDF().toDF("doc_id", "text", "lang"), w.toSeq, bias, cut)
    val q = out.writeStream.format("memory").queryName("budget_gate")
      .outputMode("append").start()
    try {
      mem.addData(docs.select("doc_id", "text", "lang")
        .as[(Long, String, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val admitted = spark.table("budget_gate")
        .filter("admit").select("doc_id").as[Long].collect().toSet
      assert(admitted === kept,
        s"stream admission drifted from batch q123: " +
          s"+${(admitted -- kept).take(5)} -${(kept -- admitted).take(5)}")
      // every rejected row sits strictly below the cut bin
      val rejectedBins = spark.table("budget_gate")
        .filter("NOT admit").select("bin").as[Long].collect()
      assert(rejectedBins.forall(_ < cut))
    } finally q.stop()
  }

  test("cutBinOf fails loudly on an empty or inconsistent artifact") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "cut_bin")
    val e = intercept[IllegalArgumentException] {
      StreamBudgetGate.cutBinOf(empty)
    }
    assert(e.getMessage.contains("cut_bin"))
    val twoDials = Seq((1L, 2L), (2L, 3L)).toDF("doc_id", "cut_bin")
    val e2 = intercept[IllegalArgumentException] {
      StreamBudgetGate.cutBinOf(twoDials)
    }
    assert(e2.getMessage.contains("stale or truncated")
      || e2.getMessage.contains("cut_bin"))
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.TextOps
import graft.streaming.StreamQualityGate

class StreamQualityGateSpec extends SparkSpec {
  import spark.implicits._

  test("in-flight quality flag is bit-equal to the batch q61 verdict, corpus-wide") {
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = TextOps.trainingFilter(docs).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4), r.getBoolean(5))
    }.toMap

    val mem = MemoryStream[(Long, String, String)]
    val out = StreamQualityGate.flag(
      mem.toDF().toDF("doc_id", "text", "lang"))
    val q = out.writeStream.format("memory").queryName("quality_gate")
      .outputMode("append").start()
    try {
      mem.addData(docs.select("doc_id", "text", "lang")
        .as[(Long, String, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("quality_gate").collect().map { r =>
        r.getLong(r.fieldIndex("doc_id")) -> (
          r.getLong(r.fieldIndex("n_tokens")),
          r.getDouble(r.fieldIndex("stop_ratio")),
          if (r.isNullAt(r.fieldIndex("rep_ratio"))) None
          else Some(r.getDouble(r.fieldIndex("rep_ratio"))),
          r.getBoolean(r.fieldIndex("agrees")),
          r.getBoolean(r.fieldIndex("quality_ok")))
      }.toMap
      assert(got.keySet === batch.keySet)
      // every signal AND the verdict bit-equal per document — the sorted
      // run-length fold must reproduce q60's shuffle-counted max exactly
      got.foreach { case (id, row) => assert(row === batch(id), s"doc $id drifted") }
      assert(got.values.exists(_._5) && got.values.exists(!_._5)) // both verdicts occur
    } finally q.stop()
  }

  test("short docs gate out with null rep_ratio; reserved names are rejected") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val out = StreamQualityGate.flag(mem.toDF().toDF("doc_id", "text", "lang"))
    val q = out.writeStream.format("memory").queryName("quality_gate_edge")
      .outputMode("append").start()
    try {
      mem.addData((1L, "too short", "en"))
      q.processAllAvailable()
      val r = spark.table("quality_gate_edge").collect().head
      assert(r.isNullAt(r.fieldIndex("rep_ratio")))
      assert(!r.getBoolean(r.fieldIndex("quality_ok")))
    } finally q.stop()

    val clash = Seq((1L, "t", "en", true)).toDF("doc_id", "text", "lang", "quality_ok")
    val e = intercept[IllegalArgumentException](StreamQualityGate.flag(clash))
    assert(e.getMessage.contains("reserved"))
    val noLang = Seq((1L, "t")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException](StreamQualityGate.flag(noLang))
    assert(e2.getMessage.contains("lang"))
  }
}

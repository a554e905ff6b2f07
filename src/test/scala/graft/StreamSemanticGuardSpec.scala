package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.SimilarityOps
import graft.streaming.StreamSemanticGuard

class StreamSemanticGuardSpec extends SparkSpec {
  import spark.implicits._

  test("in-flight decontamination is bit-equal to the batch q109 verdict") {
    implicit val sc = spark.sqlContext
    val embT = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // batch-compute once, persist the bounded eval artifact
    val evalState = SimilarityOps.evalVectorState(embT).localCheckpoint()
    val batch = SimilarityOps.semanticContamination(embT)
      .as[(Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // replay the SAME train-split vectors as stream arrivals
    val trainIds = batch.keySet
    val arrivals = embT.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq.filter(r => trainIds(r._1))
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = StreamSemanticGuard.flag(
      mem.toDF().toDF("vec_id", "embedding"), evalState)
    val q = out.writeStream.format("memory").queryName("sem_guard")
      .outputMode("append").start()
    try {
      mem.addData(arrivals: _*)
      q.processAllAvailable()
      val got = spark.table("sem_guard").collect().map { r =>
        r.getLong(r.fieldIndex("vec_id")) ->
          ((r.getDouble(r.fieldIndex("max_cos")),
            r.getLong(r.fieldIndex("nearest_eval_id")),
            r.getBoolean(r.fieldIndex("contaminated"))))
      }.toMap
      // the shared dot/argmax recipe makes the stream verdict the batch
      // row, vector by vector, max_cos bit-equal
      assert(got === batch)
      assert(got.exists(_._2._3) && got.exists(!_._2._3),
        "fixture must exercise both verdicts")
    } finally q.stop()
  }

  test("an empty eval artifact fails the micro-batch loudly") {
    implicit val sc = spark.sqlContext
    val embT = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // an artifact built from zero eval vectors: one row, empty array
    val empty = SimilarityOps.evalVectorState(embT.filter("vec_id < 0"))
      .localCheckpoint()
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = StreamSemanticGuard.flag(
      mem.toDF().toDF("vec_id", "embedding"), empty)
    val q = out.writeStream.format("memory").queryName("sem_guard_empty")
      .outputMode("append").start()
    try {
      mem.addData((1L, Seq.fill(64)(0.5f)))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(t =>
        Option(t.getMessage).exists(_.contains("empty eval artifact"))), ex)
    } finally q.stop()
  }

  test("a malformed arrival (null or ragged embedding) fails loudly, never admits as clean") {
    implicit val sc = spark.sqlContext
    val embT = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val evalState = SimilarityOps.evalVectorState(embT).localCheckpoint()
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = StreamSemanticGuard.flag(
      mem.toDF().toDF("vec_id", "embedding"), evalState)
    val q = out.writeStream.format("memory").queryName("sem_guard_ragged")
      .outputMode("append").start()
    try {
      mem.addData((1L, Seq.fill(7)(0.5f))) // wrong dimension
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(t =>
        Option(t.getMessage).exists(_.contains("malformed arrival"))), ex)
    } finally q.stop()
  }

  test("a ZERO-row eval artifact is rejected at wiring time (rows would silently vanish)") {
    implicit val sc = spark.sqlContext
    val embT = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val zeroRows = SimilarityOps.evalVectorState(embT).filter("size(evals) < 0")
    val mem = MemoryStream[(Long, Seq[Float])]
    val ex = intercept[IllegalArgumentException] {
      StreamSemanticGuard.flag(mem.toDF().toDF("vec_id", "embedding"), zeroRows)
    }
    assert(ex.getMessage.contains("exactly one row"))
  }

  test("stream shape is validated loudly") {
    implicit val sc = spark.sqlContext
    val embT = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val evalState = SimilarityOps.evalVectorState(embT)
    val mem = MemoryStream[(Long, Seq[Float])]
    val noEmb = intercept[IllegalArgumentException] {
      StreamSemanticGuard.flag(mem.toDF().toDF("vec_id", "vec"), evalState)
    }
    assert(noEmb.getMessage.contains("embedding"))
    val clash = intercept[IllegalArgumentException] {
      StreamSemanticGuard.flag(
        mem.toDF().toDF("max_cos", "embedding"), evalState)
    }
    assert(clash.getMessage.contains("reserved"))
  }
  test("a zero-norm arrival fails loudly — cos 0/0 = NaN must not flow to the sink") {
    implicit val sc = spark.sqlContext
    val embT = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val evalState = SimilarityOps.evalVectorState(embT).localCheckpoint()
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = StreamSemanticGuard.flag(
      mem.toDF().toDF("vec_id", "embedding"), evalState)
    val q = out.writeStream.format("memory").queryName("sem_guard_zeronorm")
      .outputMode("append").start()
    try {
      mem.addData((1L, Seq.fill(64)(0.0f))) // zero-norm, right dimension
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(t =>
        Option(t.getMessage).exists(_.contains("malformed arrival"))), ex)
    } finally q.stop()
  }

}

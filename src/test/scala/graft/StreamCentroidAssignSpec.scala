package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.SimilarityOps
import graft.streaming.StreamCentroidAssign

class StreamCentroidAssignSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("stream assignment equals the batch q87 assignment on the same vectors") {
    implicit val sc = spark.sqlContext
    val cents = SimilarityOps.kmeansCentroids(corpus)
    val batch = SimilarityOps.kmeans(corpus).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap

    val rows = corpus.limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = StreamCentroidAssign.assign(
      mem.toDF().toDF("vec_id", "embedding"), cents)
    val q = out.writeStream.format("memory").queryName("cent_assign")
      .outputMode("append").start()
    try {
      mem.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("cent_assign").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(got.size === 20)
      got.foreach { case (id, cd) =>
        assert(cd === batch(id), s"stream/batch drift for vec $id")
      }
    } finally q.stop()
  }

  test("outlier flag: far-from-every-cell vectors are marked out of distribution") {
    implicit val sc = spark.sqlContext
    val cents = SimilarityOps.kmeansCentroids(corpus)
    val inlier = corpus.limit(1).collect()(0).getSeq[Float](1)
    val outlier = Seq.fill(64)(99.0f) // nowhere near the unit-ish corpus
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = StreamCentroidAssign.assignFlagged(
      mem.toDF().toDF("vec_id", "embedding"), cents, maxDist = 1e9)
    val q = out.writeStream.format("memory").queryName("cent_flag")
      .outputMode("append").start()
    try {
      mem.addData((100L, inlier), (101L, outlier))
      q.processAllAvailable()
      val got = spark.table("cent_flag").collect()
        .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      assert(got(100L), "corpus vector flagged as outlier")
      assert(!got(101L), "far vector not flagged")
    } finally q.stop()
  }
}

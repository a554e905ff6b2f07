package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.SimilarityOps
import graft.streaming.StreamFilteredAnn

class StreamFilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def queryRows: Seq[(Long, Seq[Float])] = corpus
    .filter(s"vec_id < ${SimilarityOps.NumQueries}")
    .select("vec_id", "embedding")
    .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

  test("streamed recall rows bit-equal batch q200 across arrival splits") {
    implicit val sc = spark.sqlContext
    val want = SimilarityOps.filteredAnn(corpus).collect().map(_.toSeq).toSeq
    // two different arrival splits must converge to the same store
    for (groupSize <- Seq(2, SimilarityOps.NumQueries)) {
      val store = Files.createTempDirectory("fann").toString + "/results"
      val ck = Files.createTempDirectory("fann_ck").toString
      val mem = MemoryStream[(Long, Seq[Float])]
      val q = StreamFilteredAnn.start(
        mem.toDF().toDF("vec_id", "embedding"), corpus, store, ck)
      try {
        queryRows.grouped(groupSize).foreach { c =>
          mem.addData(c.toIndexedSeq); q.processAllAvailable()
        }
        val got = StreamFilteredAnn.results(spark, store)
          .collect().map(_.toSeq).toSeq
        assert(got === want,
          s"stream store diverged from batch q200 at group size $groupSize " +
            "— the shared core must make restriction commute")
      } finally q.stop()
    }
  }

  test("replay: a re-delivered batch overwrites itself, never duplicates") {
    val store = Files.createTempDirectory("fann_rp").toString + "/results"
    val index = SimilarityOps.servingIndex(corpus)
    val qs = queryRows
    val b0 = qs.take(2).toDF("vec_id", "embedding")
    val b1 = qs.drop(2).toDF("vec_id", "embedding")
    StreamFilteredAnn.mergeBatch(b0, 0L, store, index, SimilarityOps.NProbe)
    StreamFilteredAnn.mergeBatch(b1, 1L, store, index, SimilarityOps.NProbe)
    val before = StreamFilteredAnn.results(spark, store)
      .collect().map(_.toSeq).toSeq
    // re-deliver batch 1 under its own id: the store must be unmoved
    StreamFilteredAnn.mergeBatch(b1, 1L, store, index, SimilarityOps.NProbe)
    val after = StreamFilteredAnn.results(spark, store)
      .collect().map(_.toSeq).toSeq
    assert(after === before, "re-delivered batch changed the store")
    // sanity: both strategies present, exact branch recall is exactly 1
    val byStrat = after.groupBy(_.head.asInstanceOf[String])
    assert(byStrat.keySet === Set("pre_exact", "ivf_post"))
    assert(byStrat("pre_exact").forall(_.last == 1.0d),
      "pre-filter-exact branch must carry recall 1 by definition")
  }
}

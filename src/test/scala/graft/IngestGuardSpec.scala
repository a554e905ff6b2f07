package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.IngestGuard

class IngestGuardSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("contamination guard flags bag-of-words matches against the eval set, not others") {
    implicit val sc = spark.sqlContext
    val eval = Seq((100L, "held out eval question about spark", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val guarded = IngestGuard.contaminationGuard(
      mem.toDF().toDF("doc_id", "text", "ts"), eval)
    val q = guarded.writeStream.format("memory").queryName("contam_guard")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "spark about question eval out held", ts(0)), // reordered → same bag
        (2L, "a completely innocent training document", ts(1)))
      q.processAllAvailable()
      val got = spark.table("contam_guard").select("doc_id").as[Long].collect().toSet
      assert(got === Set(1L))
    } finally q.stop()
  }

  test("near-dup guard flags an arriving near-dup of a corpus doc exactly once") {
    implicit val sc = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today", "en", "s1", 0L),
      (101L, "some other corpus content about joins and shuffles and windows", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val alerts = IngestGuard.nearDupGuard(
      mem.toDF().toDF("doc_id", "text", "ts"), corpus, "ts", delay = "1 minute")
    val q = alerts.writeStream.format("memory").queryName("neardup_guard")
      .outputMode("append").start()
    try {
      // event times start above 0: an epoch-0 event sits ON the initial
      // watermark and dropDuplicatesWithinWatermark treats it as late
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy cat again and again today", ts(100)),
        (2L, "entirely unrelated text with zero overlap whatsoever in content", ts(101)))
      q.processAllAvailable()
      val got = spark.table("neardup_guard")
        .select("doc_id", "corpus_id", "agree")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // doc 1 alerts against corpus doc 100 exactly ONCE (multi-band hits
      // collapsed by the pair dedup); doc 2 stays silent
      assert(got.map(t => (t._1, t._2)).toSeq === Seq((1L, 100L)))
      assert(got.head._3 >= 0.5)
    } finally q.stop()
  }

  test("near-dup guard agreement is the exact signature-component overlap") {
    implicit val sc = spark.sqlContext
    // identical text → identical signatures → agreement exactly 1.0
    val text = "one two three four five six seven eight nine ten"
    val corpus = Seq((100L, text, "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val alerts = IngestGuard.nearDupGuard(
      mem.toDF().toDF("doc_id", "text", "ts"), corpus, "ts", delay = "1 minute")
    val q = alerts.writeStream.format("memory").queryName("neardup_exact")
      .outputMode("append").start()
    try {
      mem.addData((1L, text, ts(100)))
      q.processAllAvailable()
      val got = spark.table("neardup_exact").select("agree").as[Double].collect()
      assert(got.toSeq === Seq(1.0))
    } finally q.stop()
  }
}

package graft

import java.nio.file.Files

import graft.streaming.FraudPipeline

/** End-to-end production path: file stream of JSON wire records → parse →
  * fraud branch → serialize → foreachBatch parquet sink (the B5 InfluxDB
  * analog), with a checkpoint — the whole A1→A8→B5 chain under a real
  * StreamingQuery. */
class StreamingSinkSpec extends SparkSpec {

  test("file-source stream lands fraud alerts in the parquet sink table") {
    val inDir = Files.createTempDirectory("graft_in").toString
    val sinkDir = Files.createTempDirectory("graft_sink").toString + "/fraud"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    Files.writeString(java.nio.file.Path.of(inDir, "batch1.json"),
      """{"userId":"user_001","amount":10500.5,"timestamp":1737028300}
        |{"userId":"user_002","amount":9000.0,"timestamp":1737028301}
        |not json at all
        |{"userId":"user_003","amount":12000.25,"timestamp":1737028302}
        |""".stripMargin)

    val raw = spark.readStream
      .format("text")
      .load(inDir)
      .withColumnRenamed("value", "value")
    val alerts = FraudPipeline.fraudAlerts(raw)
    val query = FraudPipeline.startAlertSink(alerts, sinkDir, ckpt)
    try {
      query.processAllAvailable()
      val sunk = spark.read.parquet(sinkDir)
      import spark.implicits._
      val keys = sunk.select("key").as[String].collect().sorted
      assert(keys.toSeq === Seq("user_001", "user_003"))
      // the serialized wire format survives a re-parse (A5 ∘ A2 = id)
      val reparsed = FraudPipeline.parse(sunk.select("value"))
      assert(reparsed.count() === 2)
    } finally query.stop()
  }

  test("restart from checkpoint resumes exactly-once: no loss, no duplicates") {
    val inDir = Files.createTempDirectory("graft_in2").toString
    val sinkDir = Files.createTempDirectory("graft_sink2").toString + "/fraud"
    val ckpt = Files.createTempDirectory("graft_ckpt2").toString
    import spark.implicits._

    def run(): Unit = {
      val raw = spark.readStream.format("text").load(inDir)
      val q = FraudPipeline.startAlertSink(FraudPipeline.fraudAlerts(raw), sinkDir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }

    Files.writeString(java.nio.file.Path.of(inDir, "b1.json"),
      """{"userId":"user_010","amount":20000.0,"timestamp":1737028300}
        |""".stripMargin)
    run() // first incarnation processes batch 1, then STOPS

    Files.writeString(java.nio.file.Path.of(inDir, "b2.json"),
      """{"userId":"user_011","amount":30000.0,"timestamp":1737028400}
        |""".stripMargin)
    run() // second incarnation restarts from the SAME checkpoint

    // each alert landed exactly once: the checkpoint prevents both
    // reprocessing of b1 (duplicates) and skipping of b2 (loss)
    val keys = spark.read.parquet(sinkDir).select("key").as[String].collect().sorted
    assert(keys.toSeq === Seq("user_010", "user_011"))
  }
}

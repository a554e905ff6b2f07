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
}

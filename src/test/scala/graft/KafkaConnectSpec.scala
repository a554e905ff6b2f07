package graft

import graft.streaming.FraudPipeline

/** Plan-level coverage of the Kafka connector surface (the reference's real
  * A1 source / A8 sink, `TransactionProcessor.java:13-14,27,54`). The
  * sandbox has no broker and no kafka connector jar, so these tests assert
  * (a) the exact option plumbing the builders construct, (b) that the wire
  * decode/encode is the same pure transform the memory-stream e2e tests
  * drive, and (c) that the `kafka` format string actually reaches Spark's
  * data-source provider lookup. */
class KafkaConnectSpec extends SparkSpec {
  import spark.implicits._

  test("source options: subscribe/offsets/data-loss/batch-bound plumbing") {
    val opts = FraudPipeline.kafkaSourceOptions("broker1:9092,broker2:9092", "transactions")
    assert(opts("kafka.bootstrap.servers") === "broker1:9092,broker2:9092")
    assert(opts("subscribe") === "transactions")
    assert(opts("startingOffsets") === "earliest")
    assert(opts("failOnDataLoss") === "false")
    assert(opts("maxOffsetsPerTrigger").toLong > 0)
  }

  test("sink options: topic + checkpoint plumbing") {
    val opts = FraudPipeline.kafkaSinkOptions("b:9092", "fraud-alerts", "/tmp/ckpt")
    assert(opts("topic") === "fraud-alerts")
    assert(opts("checkpointLocation") === "/tmp/ckpt")
    assert(opts("kafka.bootstrap.servers") === "b:9092")
  }

  test("wire decode casts binary key/value to the pipeline's string frame") {
    // the kafka source's wire shape: key/value BINARY plus metadata columns
    val raw = Seq(
      (Array[Byte](117, 115, 101, 114), // "user"
        """{"userId":"user","amount":10500.0,"timestamp":1737028306}""".getBytes("UTF-8"),
        "transactions", 0, 7L))
      .toDF("key", "value", "topic", "partition", "offset")
    val decoded = FraudPipeline.decodeWire(raw)
    assert(decoded.columns.toSeq === Seq("key", "value"))
    val row = decoded.as[(String, String)].collect().head
    assert(row._1 === "user")
    // the decoded value is exactly what parse() consumes
    val parsed = FraudPipeline.parse(decoded)
    assert(parsed.as[(String, Double, Int)].collect().head === (("user", 10500.0, 1737028306)))
  }

  test("kafkaSource plumbs format(\"kafka\") through to the provider lookup") {
    val e = intercept[Exception] {
      FraudPipeline.kafkaSource(spark, "b:9092", "transactions")
    }
    // no connector jar in the sandbox: the failure must be the kafka
    // provider lookup itself, proving the format string is wired correctly
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }

  test("kafkaSink plumbs format(\"kafka\") through to the provider lookup") {
    val stream = FraudPipeline.generator(spark, rowsPerSecond = 1)
    val e = intercept[Exception] {
      FraudPipeline.kafkaSink(stream, "b:9092", "fraud-alerts", "/tmp/ckpt_kafka").start()
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
}

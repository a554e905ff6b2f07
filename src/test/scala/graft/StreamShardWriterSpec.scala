package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StreamShardWriter

class StreamShardWriterSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("streamed shards match the batch q100 manifest shard-by-shard") {
    // the release-integrity round-trip (SourceSinksSpec's shard check)
    // re-run against STREAM-written files: the corpus arrives over
    // multiple micro-batches, lands in shard=K/batch_id=N leaves, and the
    // resulting directory must agree with the batch manifest on every
    // figure — one shard rule, whichever engine half applied it
    val inDir = Files.createTempDirectory("graft_stream_in").toString
    val outDir = Files.createTempDirectory("graft_stream_shards").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    docs.repartition(3).write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(inDir)
    val q = StreamShardWriter.start(stream, outDir, ckpt)
    try q.processAllAvailable() finally q.stop()

    val manifest = graft.ops.PipelineOps.shardManifest(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(manifest.nonEmpty)
    manifest.foreach { case (shard, nDocs, totTok, totChars, minId, maxId) =>
      val part = spark.read.parquet(s"$outDir/shard=$shard")
      val (n, tok, chars, lo, hi) = part
        .agg(count(lit(1)), sum("n_tokens"), sum("n_chars"),
          min("doc_id"), max("doc_id"))
        .as[(Long, Long, Long, Long, Long)].head()
      assert((n, tok, chars, lo, hi) === ((nDocs, totTok, totChars, minId, maxId)),
        s"streamed shard $shard disagrees with the batch manifest")
    }
    val onDisk = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(onDisk === manifest.map(m => s"shard=${m._1}").toSet)
    // the corpus arrived over >1 micro-batch (the multi-batch append path
    // was actually exercised, not one bulk write)
    val batchIds = spark.read.parquet(outDir)
      .select("batch_id").distinct().as[Long].collect()
    assert(batchIds.length > 1, s"expected multiple micro-batches, got $batchIds")
  }

  test("restart from checkpoint is idempotent: no duplicate shard rows") {
    val inDir = Files.createTempDirectory("graft_ssw_in2").toString
    val outDir = Files.createTempDirectory("graft_ssw_out2").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_ssw_ckpt2").toString

    def run(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(inDir)
      val q = StreamShardWriter.start(stream, outDir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    docs.filter(col("doc_id") < 100).write.mode("overwrite").parquet(inDir)
    run() // first incarnation
    val afterFirst = spark.read.parquet(outDir).count()
    run() // second incarnation, same checkpoint, no new input
    val afterSecond = spark.read.parquet(outDir).count()
    assert(afterFirst === afterSecond,
      "a restart with no new input must not duplicate rows")
    assert(afterFirst === docs.filter(col("doc_id") < 100).count())
  }

  test("route fails loudly on a null doc_id and rejects reserved columns") {
    val bad = Seq((java.lang.Long.valueOf(1L), "a b"), (null.asInstanceOf[java.lang.Long], "c"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      StreamShardWriter.route(bad).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("null doc_id")
      || e.getCause != null, s"unexpected failure shape: $e")
    val clash = intercept[IllegalArgumentException] {
      StreamShardWriter.route(Seq((1L, "a", 2L)).toDF("doc_id", "text", "shard"))
    }
    assert(clash.getMessage.contains("reserved"))
  }
}

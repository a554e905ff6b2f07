package graft

import org.apache.spark.sql.SparkSession

/** Single-node throughput of the reference's end-to-end topology (parse →
  * null-guard → fraud branch → serialize, `TransactionProcessor.java:25-54`)
  * over synthetic JSON wire records — the number to hold against
  * BASELINE.md's producer rate (1 msg/sec) and consumer path. The same
  * physical plan executes per micro-batch under Structured Streaming, so
  * batch transform throughput ≈ streaming steady-state throughput at
  * saturated batches.
  *
  * A second mode measures the documented INGEST chain
  * ([[streaming.IngestPipeline]]: PII scrub → contamination flag →
  * centroid route) over synthetic documents with embeddings — the same
  * per-micro-batch plan a streaming deployment executes, all reference
  * artifacts broadcast.
  *
  * Not part of the driver contract; run manually:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ThroughputBench 10000000"
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ThroughputBench 10000000 ingest"
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val mode = args.drop(1).headOption.getOrElse("fraud")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // synthetic wire records: ~1/2 fraud, a sprinkle of malformed ones so
    // the tolerant-parse path is exercised, all codegen'd (no driver loop)
    val wire = spark.range(n).selectExpr(
      """CASE WHEN id % 1000 = 999 THEN 'not json'
              ELSE concat('{"userId":"user_', CAST(id % 1000 AS STRING),
                          '","amount":', CAST(pmod(id * 37, 20000) AS STRING),
                          '.5,"timestamp":', CAST(1700000000 + id % 100000 AS STRING), '}')
         END AS value""")

    // ingest mode: synthetic (doc_id, text, embedding) arrivals — ~1/10
    // carry a PII pattern so the redact chain does real work; embeddings
    // are a codegen'd pure function of the row (no driver loop)
    val ingestWire = spark.range(n).selectExpr(
      "id AS doc_id",
      """concat('ingest doc ', CAST(id AS STRING),
                CASE WHEN id % 10 = 0 THEN ' mail u@ex.org now' ELSE ' clean body text' END) AS text""",
      "transform(sequence(0, 63), j -> CAST(sin(CAST(id % 97 AS DOUBLE) + j) AS FLOAT)) AS embedding")
    lazy val ingestRefs = {
      // the bounded reference artifacts a batch job refreshes: centroids
      // learned over a small sample of the same generator, a 100-doc eval set
      val sample = spark.range(256).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), j -> CAST(sin(CAST(id % 97 AS DOUBLE) + j) AS FLOAT)) AS embedding",
        "CAST(id % 8 AS INT) AS label")
      val evalDocs = spark.range(100).selectExpr(
        "id AS doc_id", "concat('eval item ', CAST(id AS STRING)) AS text")
      (evalDocs, ops.SimilarityOps.kmeansCentroids(sample))
    }

    // quality mode: synthetic (doc_id, text, lang) arrivals with enough
    // token variety to exercise every gate signal (length, stopwords,
    // repetition run-fold, lang vote) — all codegen'd, no driver loop
    val qualityWire = spark.range(n).selectExpr(
      "id AS doc_id",
      """concat('the quick item ', CAST(id AS STRING),
                ' is a fine record of the corpus and ',
                repeat(concat('tok', CAST(id % 7 AS STRING), ' '), CAST(id % 40 AS INT)),
                'tail words here') AS text""",
      "'en' AS lang")

    // modelscore mode: the learned q101 filter applied in-flight — the
    // bounded artifact is trained once on the real sf0.001 corpus (the
    // batch-refreshes-artifact contract), scoring is pure row-local plan
    lazy val modelWeights = ops.QualityModelOps.bucketWeightsMicro(
      Tables.documents(spark, "/root/testdata/sf0.001"))

    // budgetgate mode: modelscore plus the q123 one-row cut dial, both
    // batch artifacts derived once (never inside the measured pass)
    lazy val budgetCutDial = streaming.StreamBudgetGate.cutBinOf(
      ops.QualityModelOps.qualityBudgetCut(
        ops.QualityModelOps.qualityClassifier(
          Tables.documents(spark, "/root/testdata/sf0.001"))
          .select("doc_id", "score_micro"),
        Tables.documents(spark, "/root/testdata/sf0.001")))

    // cellsample mode: the full topic-aware admission chain — arriving
    // embeddings routed to their learned cell (StreamCentroidAssign) and
    // admitted/shed against the batch q107 dial (StreamCellSample), both
    // reference artifacts bounded and broadcast/inlined
    lazy val cellRefs = {
      val sample = spark.range(256).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), j -> CAST(sin(CAST(id % 97 AS DOUBLE) + j) AS FLOAT)) AS embedding",
        "CAST(id % 8 AS INT) AS label")
      val cents = ops.SimilarityOps.kmeansCentroids(sample)
      val cuts = ops.SimilarityOps.cellSampleCuts(
        ops.SimilarityOps.kmeans(sample).select("vec_id", "cell"))
      (cents, cuts)
    }

    // semguard mode: in-flight semantic decontamination — the bounded
    // one-row eval-vector artifact is extracted once from the real
    // sf0.001 embeddings (the batch-refreshes-artifact contract); each
    // arriving vector pays one graft_dot per eval entry, row-local
    lazy val semRefs = ops.SimilarityOps.evalVectorState(
      Tables.embeddings(spark, "/root/testdata/sf0.001")).localCheckpoint()

    // burststore / zonestats modes: the per-micro-batch DELTA collapse
    // each store maintainer pays in-flight (the write itself is the
    // bounded partition overwrite) — synthetic timestamped arrivals with
    // a sprinkle of null values so the NULL-bounds path is exercised
    val eventWire = spark.range(n).selectExpr(
      "timestamp_micros(1700000000000000 + id * 1000) AS ts",
      """CASE WHEN id % 50 = 0 THEN CAST(NULL AS DOUBLE)
              ELSE CAST(pmod(id * 37, 32753) AS DOUBLE) / 100.0 END AS value""")

    // robustcells / panelcells modes: the q187 / q190 maintainers' per-
    // micro-batch delta collapses (value counts / winner cells) — the
    // in-flight cost of the two newest stores; panel arrivals carry the
    // (user, event) identity the winner struct orders on
    val panelWire = spark.range(n).selectExpr(
      "timestamp_micros(1700000000000000 + id * 1000) AS ts",
      "pmod(id * 31, 1000) AS user_id", "id AS event_id",
      """CASE WHEN id % 50 = 0 THEN CAST(NULL AS DOUBLE)
              ELSE CAST(pmod(id * 37, 32753) AS DOUBLE) / 100.0 END AS value""")

    def once(): Double = {
      val t0 = System.nanoTime()
      val out = mode match {
        case "ingest" =>
          val (evalDocs, cents) = ingestRefs
          streaming.IngestPipeline.ingest(ingestWire, evalDocs, cents)
        case "quality" => streaming.StreamQualityGate.flag(qualityWire)
        case "modelscore" =>
          val (w, bias) = modelWeights
          streaming.StreamQualityScore.score(qualityWire, w.toSeq, bias)
        case "cellsample" =>
          val (cents, cuts) = cellRefs
          streaming.StreamCellSample.flag(
            streaming.StreamCentroidAssign.assign(
              ingestWire.selectExpr("doc_id AS vec_id", "embedding"), cents),
            cuts)
        case "semguard" =>
          streaming.StreamSemanticGuard.flag(
            ingestWire.selectExpr("doc_id AS vec_id", "embedding"), semRefs)
        case "shardroute" =>
          streaming.StreamShardWriter.route(
            ingestWire.selectExpr("doc_id", "text"))
        case "budgetgate" =>
          val (w, bias) = modelWeights
          streaming.StreamBudgetGate.flag(qualityWire, w.toSeq, bias, budgetCutDial)
        case "burststore" => ops.RelationalOps.hourlyCounts(eventWire)
        case "zonestats" => ops.ScaleOps.zoneStats(eventWire)
        case "robustcells" => ops.RelationalOps.robustValueCounts(eventWire)
        case "panelcells" => ops.RelationalOps.resampleCells(panelWire)
        case _ => streaming.FraudPipeline.fraudAlerts(wire)
      }
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (JIT + codegen)
    val sec = math.min(once(), once())
    val rps = n / sec
    val metric = mode match {
      case "ingest" => "ingest_rows_per_sec"
      case "quality" => "quality_gate_rows_per_sec"
      case "modelscore" => "model_score_rows_per_sec"
      case "cellsample" => "cell_sample_rows_per_sec"
      case "semguard" => "sem_guard_rows_per_sec"
      case "shardroute" => "shard_route_rows_per_sec"
      case "budgetgate" => "budget_gate_rows_per_sec"
      case "burststore" => "burst_store_rows_per_sec"
      case "zonestats" => "zone_stats_rows_per_sec"
      case "robustcells" => "robust_cells_rows_per_sec"
      case "panelcells" => "panel_cells_rows_per_sec"
      case _ => "pipeline_rows_per_sec"
    }
    println(f"""{"metric":"$metric%s","value":$rps%.0f,"rows":$n,"sec":$sec%.3f,"cpus":$cpus}""")
    spark.stop()
  }
}

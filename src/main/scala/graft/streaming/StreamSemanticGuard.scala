package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Ingest-time semantic decontamination — the streaming twin of q109
  * (`SimilarityOps.semanticContamination`): every arriving embedding is
  * scored by its max cosine against the BOUNDED eval-vector artifact
  * before it lands, so a training-corpus ingest can quarantine
  * paraphrased/translated eval leaks at the door instead of scrubbing
  * them after the fact (the q70/q109 batch checks stay the release-time
  * audit). Completes the batch-trains/stream-applies family: centroids
  * (StreamCentroidAssign), BPE merges, q101 weights (StreamQualityScore),
  * the q107 dial (StreamCellSample), and now the eval set.
  *
  * Scale contract: the eval state is the ONE-ROW
  * [[SimilarityOps.evalVectorState]] artifact a scheduled batch job
  * refreshes (eval sets are bounded by construction); it joins each
  * micro-batch as a broadcast one-row table and the max-cosine argmax is
  * a ROW-LOCAL `aggregate` fold over the eval array — the same
  * (cos, -eval_id) struct-max q109 computes as a grouped aggregate, so
  * batch and stream verdicts cannot drift and the stream shuffles
  * nothing. Stateless — no watermark, no streaming state store.
  */
object StreamSemanticGuard {

  /** Flag each arriving (vec_id, embedding) row with (max_cos,
    * nearest_eval_id, contaminated) — q109's exact output columns —
    * keeping any extra columns the stream carries. An EMPTY eval
    * artifact raises in-plan (a stale/truncated batch refresh must fail
    * the micro-batch, not silently admit everything). */
  def flag(stream: DataFrame, evalState: DataFrame,
           minCos: Double = SimilarityOps.SemContamMinCos): DataFrame = {
    require(stream.columns.contains("embedding"),
      s"StreamSemanticGuard: stream must carry an 'embedding' column; " +
        s"got [${stream.columns.mkString(", ")}]")
    val clash = Seq("v", "n2", "evals", "b", "max_cos", "nearest_eval_id",
      "contaminated").filter(stream.columns.contains)
    require(clash.isEmpty,
      s"StreamSemanticGuard: stream carries reserved column(s) " +
        s"[${clash.mkString(", ")}] — rename them before flag()")
    // the artifact contract is ONE row holding the eval array: zero rows
    // would make the crossJoin silently DROP every arrival (the opposite
    // of fail-the-micro-batch), extra rows would duplicate them — check
    // the bounded table once at wiring time, like StreamCellSample's
    // nonEmpty require on its dial
    val nState = evalState.count()
    require(nState == 1,
      s"StreamSemanticGuard: eval artifact must be exactly one row " +
        s"(evalVectorState's shape), got $nState — refresh the batch eval state")
    val carried = stream.columns.filterNot(_ == "embedding").toSeq
    graft.expressions.GraftFunctions.register(stream.sparkSession)
    stream
      .withColumn("v", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("n2", expr("graft_dot(v, v)"))
      .crossJoin(broadcast(evalState))
      .selectExpr(carried :+
        """CASE WHEN size(evals) = 0
                THEN named_struct('c', CAST(raise_error('StreamSemanticGuard: empty eval artifact — refresh the batch eval state') AS DOUBLE),
                                  'nt', CAST(0 AS BIGINT))
                WHEN v IS NULL OR size(v) != size(evals[0].tv) OR n2 = 0e0
                THEN named_struct('c', CAST(raise_error('StreamSemanticGuard: malformed arrival embedding (null, wrong dimension, or zero-norm) — a null/NaN cosine would silently admit the row as clean') AS DOUBLE),
                                  'nt', CAST(0 AS BIGINT))
                ELSE aggregate(evals,
                       named_struct('c', CAST('-Infinity' AS DOUBLE), 'nt', CAST(0 AS BIGINT)),
                       (acc, e) -> greatest(acc, named_struct(
                         'c', graft_dot(v, e.tv) / (sqrt(n2) * sqrt(e.tn2)),
                         'nt', -e.t_id)))
           END AS b""": _*)
      .selectExpr(carried ++ Seq("b.c AS max_cos", "-b.nt AS nearest_eval_id",
        s"b.c >= $minCos AS contaminated"): _*)
  }
}

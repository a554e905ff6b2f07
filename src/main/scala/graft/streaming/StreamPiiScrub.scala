package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Ingest-time PII redaction — the streaming twin of q86: arriving text
  * is masked BEFORE it lands anywhere (the compliance property a batch
  * scrub cannot give: raw PII never touches storage). Stateless and
  * row-local — the same three codegen'd regexp passes as the batch op
  * (shared pattern constants and replace chain, so batch and stream
  * cannot drift), no watermark, no state store, no shuffle. */
object StreamPiiScrub {

  /** Mask emails / phone numbers / IPv4 addresses in `textCol`, counting
    * what was masked per record (`n_pii` — the ingest-time alerting
    * signal; a PII spike from one source is a crawler bug). All other
    * columns pass through untouched. */
  def scrub(stream: DataFrame, textCol: String = "text"): DataFrame =
    stream
      .withColumn("n_pii", expr(
        s"""CAST(size(regexp_extract_all($textCol, '${TextOps.PiiEmailRe}', 0))
              + size(regexp_extract_all($textCol, '${TextOps.PiiPhoneRe}', 0))
              + size(regexp_extract_all($textCol, '${TextOps.PiiIpRe}', 0)) AS BIGINT)"""))
      .withColumn(textCol, expr(TextOps.piiRedact(textCol)))
}

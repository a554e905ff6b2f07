package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, lit}

import graft.ops.QualityModelOps

/** Ingest-time BUDGET ADMISSION — the streaming application of the q123
  * operating threshold, closing the quality chain's batch-trains /
  * stream-applies pair end-to-end: a batch job trains the q101 classifier
  * (persisted 256-weight artifact), picks the token-budget cut from the
  * q108 curve (the q123 one-row dial), and every arriving document is then
  * scored, binned with the SHARED q103 bin constant, and admitted iff its
  * bin clears the cut — all ROW-LOCALLY. No state store, no watermark, no
  * shuffle: [[StreamQualityScore]]'s plan plus one integer floor-divide
  * and one comparison per row, so the gate adds nothing measurable to the
  * scorer's 377 k rows/s.
  *
  * The verdict is IDENTICAL to batch q123 membership for the same
  * document (exact integers end-to-end: the score is integer-equal to
  * q101, the bin is the same floor division, the cut the same dial) —
  * `StreamBudgetGateSpec` proves the parity corpus-wide. */
object StreamBudgetGate {

  /** Extract the one-row cut dial from a (materialized) q123 output — the
    * bounded artifact a batch job persists next to the weight table. Fails
    * loudly on an empty snapshot (the q115 empty-artifact contract): q123
    * emits the cut on every kept row, and a non-empty corpus keeps at
    * least the top bin, so an empty frame is a stale/truncated artifact,
    * not a valid "admit nothing" dial. */
  def cutBinOf(budgetCut: DataFrame): Long = {
    val rows = budgetCut.select("cut_bin").distinct().limit(2).collect()
    require(rows.length == 1,
      s"StreamBudgetGate: expected exactly one cut_bin in the q123 artifact, " +
        s"got ${rows.length} — stale or truncated snapshot")
    rows.head.getLong(0)
  }

  /** Score + bin + admit each arriving row: emits every
    * [[StreamQualityScore.score]] column plus `bin` and `admit`. */
  def flag(stream: DataFrame, wMicro: Seq[Long], biasMicro: Long,
           cutBin: Long, textCol: String = "text",
           binMicro: Long = QualityModelOps.CalibrationBinMicro): DataFrame =
    StreamQualityScore.score(stream, wMicro, biasMicro, textCol)
      .withColumn("bin", expr(
        s"CAST(FLOOR(CAST(score_micro AS DOUBLE) / ${binMicro}e0) AS BIGINT)"))
      .withColumn("admit", col("bin") >= lit(cutBin))
}

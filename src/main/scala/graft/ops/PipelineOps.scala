package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline utilities over `documents`: text normalization /
  * redaction, deterministic dataset splits, and stratified sampling — the
  * reproducibility-critical stages of a corpus build.
  *
  * Everything here is ROW-LOCAL or one-shuffle, and every random-seeming
  * choice is a pure function of the data (md5 of a stable key) — never
  * `rand()`: a retried task must make the same choice, a re-run of the
  * pipeline must produce the same corpus, and the DuckDB oracle must agree
  * bit-for-bit. This is the same discipline `ScaleOps` applies to salting.
  */
object PipelineOps {

  /** First md5 byte of a stable key, as 0–255 — THE deterministic bucket
    * primitive, shared by [[splitAssign]] and the ML train/test fold
    * (`FraudScorer.trainAndEvaluate`) so the split recipe has exactly one
    * definition. */
  def md5Bucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("long")

  /** ~80/10/10 bucket cuts shared with the q57 oracle. */
  val TrainCut = 204
  val ValCut = 230

  /** q56 — normalization + redaction: lowercase, strip non-alphanumerics,
    * collapse whitespace; digits masked to a sentinel in a parallel
    * column. All row-local codegen'd regex/string expressions — at 100 TB
    * this is a pure map stage fused into the scan. */
  def normalizeDocs(docs: DataFrame): DataFrame =
    docs.selectExpr(
      "doc_id",
      "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' ')) AS norm_text",
      "regexp_replace(text, '[0-9]+', '<NUM>') AS redacted_text")
      .orderBy("doc_id")

  /** q57 — deterministic train/val/test split (~80/10/10): the bucket is
    * the first md5 byte of the doc id — stable across runs, engines, and
    * partitionings, and independent of row order (the property `rand()`
    * based splits lack: under speculative re-execution they re-deal the
    * corpus). Row-local; no shuffle at all. */
  /** The bucket → split-name rule, shared by [[splitAssign]] and the
    * contamination check (`SketchOps.contamination`) — one definition. */
  def splitOf(bucket: String): String =
    s"""CASE WHEN $bucket < $TrainCut THEN 'train'
             WHEN $bucket < $ValCut THEN 'val'
             ELSE 'test' END"""

  def splitAssign(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5Bucket(col("doc_id")).as("bucket"))
      .selectExpr("doc_id", "bucket", s"${splitOf("bucket")} AS split")
      .orderBy("doc_id")

  /** q58 — stratified sample: the same `frac` of every language stratum,
    * chosen by md5 rank (deterministic, engine-independent). One shuffle
    * on the stratum key; the per-stratum counts are a broadcast dim. At
    * 100 TB prefer [[splitAssign]]-style stateless bucketing when strata
    * are huge — the rank window is for exact-fraction guarantees. */
  def stratifiedSample(docs: DataFrame, frac: Double = 0.2): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    docs.select(col("doc_id"), col("lang"))
      .withColumn("r", row_number().over(w).cast("long"))
      .join(broadcast(counts), "lang")
      .filter(col("r") <= ceil(col("n").cast("double") * lit(frac)))
      .select("lang", "doc_id", "r")
      .orderBy("lang", "r")
  }

  /** DuckDB equivalents — same md5 constructions, same regexes (RE2 and
    * Java agree on these character-class patterns), 'g' flag because
    * DuckDB's regexp_replace is first-match by default. */
  def oracles: Map[String, String] = Map(
    "q56_normalize" ->
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                    ' +', ' ', 'g')) AS norm_text,
                regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS redacted_text
         FROM documents ORDER BY doc_id""",
    "q57_split" ->
      s"""SELECT doc_id, bucket,
                CASE WHEN bucket < $TrainCut THEN 'train'
                     WHEN bucket < $ValCut THEN 'val'
                     ELSE 'test' END AS split
         FROM (SELECT doc_id,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT AS bucket
               FROM documents)
         ORDER BY doc_id""",
    "q58_stratified_sample" ->
      """WITH r AS (SELECT lang, doc_id,
                           ROW_NUMBER() OVER (PARTITION BY lang
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
                    FROM documents),
          n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
         SELECT r.lang AS lang, r.doc_id AS doc_id, r.r AS r
         FROM r JOIN n ON r.lang = n.lang
         WHERE r.r <= CEIL(CAST(n.n AS DOUBLE) * 0.2)
         ORDER BY r.lang, r.r""",
  )
}

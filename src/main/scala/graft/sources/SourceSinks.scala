package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, regexp_replace}
import org.apache.spark.sql.types.{StringType, StructType}

/** Source/sink surface beyond the reference's Kafka-only I/O
  * (`TransactionProcessor.java:27`): columnar + text formats, partitioned
  * layout for pruning, and bucketed tables for shuffle-free joins.
  *
  * 100 TB notes baked into the API:
  *  - Partitioned parquet (`writePartitioned`) gives partition pruning: a
  *    date-filtered query reads only matching directories — the on-disk
  *    analog of the dashboard's time-range filter (C5/C7).
  *  - Bucketed tables (`writeBucketed`) pre-shuffle ONCE at write time;
  *    joins and aggregations on the bucket key then plan with zero
  *    exchanges (asserted in `SourceSinksSpec`). This is how the fact-table
  *    joins stay shuffle-free at cluster scale.
  *  - CSV/JSON readers take an explicit schema — schema inference is a
  *    full extra pass over the data and is never acceptable at scale.
  */
object SourceSinks {

  def writeParquetPartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV cannot natively distinguish null from "" — both serialize to an
    * empty field and Spark's defaults read both back as null. A sentinel
    * nullValue plus quoted emptyValue makes the round-trip lossless (a
    * string column's "" survives as "", null survives as null). */
  private val CsvNull = "\\N"

  /** The sentinel must not collide with DATA: a genuine string `\N` would
    * round-trip to null. So the whole `\…\N` family is shifted one
    * backslash on write (`\N` → `\\N`, `\\N` → `\\\N`, …) and shifted back
    * on read — the bare on-disk token `\N` then UNIQUELY means null, and
    * every string value (including literal `\N`) round-trips losslessly.
    * Both rewrites are anchored single-pass regexes over string columns
    * only — codegen'd, row-local, no measurable cost next to CSV parsing. */
  private def mapStringCols(df: DataFrame, f: Column => Column): DataFrame =
    df.schema.fields.filter(_.dataType == StringType).foldLeft(df) {
      // backtick-quote: a dotted column name must reference the column
      // literally, not parse as a struct-field path
      (d, fld) => d.withColumn(fld.name, f(col(s"`${fld.name}`")))
    }

  def writeCsv(df: DataFrame, path: String): Unit =
    mapStringCols(df, c => regexp_replace(c, "^(\\\\+N)$", "\\\\$1"))
      .write.mode("overwrite").option("header", "true")
      .option("nullValue", CsvNull).option("emptyValue", "\"\"")
      // the WRITER trims whitespace by default — silently lossy for padded
      // strings (" \N" would even collapse onto the null sentinel)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Explicit schema — no inference pass. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    mapStringCols(
      spark.read.option("header", "true").schema(schema)
        .option("nullValue", CsvNull).option("emptyValue", "")
        .csv(path),
      c => regexp_replace(c, "^\\\\(\\\\+N)$", "$1"))

  /** ORC: the other columnar format large estates standardize on. Same
    * pruning/pushdown properties as parquet (stripe-level statistics,
    * predicate pushdown, column projection — asserted in
    * `SourceSinksSpec`), so data living in ORC needs no parquet rewrite
    * before this engine can query it efficiently. */
  def writeOrcPartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSONL writer; `codec` = "gzip"/"zstd"/… for the compressed form web
    * corpora ship in ("none" = plain). NOTE gzip is not splittable — one
    * file becomes one task regardless of size, so compressed corpora must
    * arrive as MANY files (they do: shard-per-file is the convention) or
    * be re-sharded at ingest. */
  def writeJsonLines(df: DataFrame, path: String, codec: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", codec).json(path)

  /** Explicit schema: no inference pass over the (possibly compressed)
    * corpus, and malformed lines land as nulls (PERMISSIVE) instead of
    * failing the read — the same drop-on-parse-failure stance as the
    * streaming layer. Spark decompresses by extension transparently. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Schema-evolution read: union the schemas of every parquet file under
    * `path` (older files yield nulls for later-added columns). Footer
    * reads of ALL files at planning time — fine for a partitioned corpus
    * drop, wrong as a default at 100 TB; prefer an explicit schema once
    * the layout is known. */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Bucketed + sorted managed table: one shuffle at write time, zero at
    * every subsequent join/agg on `bucketCol`. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's read-only parquet testdata (TESTDATA.md).
  *
  * `events.ts` has been written two ways across driver generations, and the
  * loader adapts by SCHEMA, not by round: (a) parquet TIMESTAMP(NANOS),
  * which Spark's parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]) —
  * read with `spark.sql.legacy.parquet.nanosAsLong` and converted once at
  * the ingest boundary with integer division (`DIV 1000`, never `/1000`:
  * epoch-nanos ~1.7e18 exceeds a double's 53-bit mantissa, so float
  * division would corrupt microseconds; floor division matches DuckDB's own
  * ns→us truncation); (b) parquet TIMESTAMP(MICROS, isAdjustedToUTC=false),
  * which Spark reads natively as TIMESTAMP_NTZ — cast to the session
  * TimestampType every downstream consumer expects (the session zone is
  * UTC in every entrypoint, so the cast is value-preserving and the DuckDB
  * oracle, which reads the same file as naive micros, stays exact).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // SESSION-WIDE side effect, deliberate: the nanos flag must be live
    // whenever an events scan plans OR executes, so it cannot be scoped to
    // this call. Consequence for other code in the same session: a
    // TIMESTAMP(NANOS) parquet column elsewhere reads as LongType nanos
    // instead of erroring — convert it the way this loader does.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          // the cast is value-preserving ONLY under a UTC session zone —
          // enforce it instead of assuming (a non-UTC entrypoint would
          // silently shift every timestamp and break the oracle compare
          // far downstream)
          val tz = spark.conf.get("spark.sql.session.timeZone")
          require(tz == "UTC",
            s"Tables: events.ts is TIMESTAMP_NTZ; the cast to TimestampType " +
              s"is value-preserving only with spark.sql.session.timeZone=UTC, got '$tz'")
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _: org.apache.spark.sql.types.TimestampType => df
        case other =>
          // a FOURTH testdata generation: fail loudly at the ingest
          // boundary instead of letting an unconverted ts drift through
          throw new IllegalStateException(
            s"Tables: unrecognized events.ts type $other — extend the " +
              "schema dispatch (see the loader scaladoc for the known forms)")
      }
    else df
  }

  def events(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}

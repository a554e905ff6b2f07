package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's single record type (`Transaction.java:5-9`): a flat
  * financial transaction carried as JSON on the wire
  * (`@JsonProperty` keys at `Transaction.java:18-31`).
  *
  * `timestamp` is Unix epoch SECONDS truncated to a 32-bit int
  * (`TransactionProducer.java:49`) — kept as Int at the wire boundary and
  * converted once to TimestampType for event-time operations.
  */
case class Transaction(userId: String, amount: Double, timestamp: Int)

object Transaction {
  /** Wire schema for `from_json` (matches Jackson's view of the POJO). */
  val schema: StructType = StructType(Seq(
    StructField("userId", StringType),
    StructField("amount", DoubleType),
    StructField("timestamp", IntegerType)))

  /** Fraud threshold (`TransactionProcessor.java:15`), strict `>`
    * (`TransactionProcessor.java:39`) — `amount == 10000.0` is NOT fraud. */
  val FraudThreshold: Double = 10000.0

  /** JSON string → typed struct column. Spark's PERMISSIVE mode yields a
    * null struct on malformed input, matching the reference's
    * drop-and-continue parse (`TransactionProcessor.java:30-37`). */
  def parseJson(value: Column): Column = from_json(value, schema)

  /** Typed columns → JSON string (`TransactionProcessor.java:44-51`). */
  def toJsonCol(userId: Column, amount: Column, timestamp: Column): Column =
    to_json(struct(userId.as("userId"), amount.as("amount"), timestamp.as("timestamp")))
}

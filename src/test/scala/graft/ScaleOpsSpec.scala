package graft

import graft.ops.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  // skewed: user 7 owns 80% of rows
  private def skewed = (0 until 500).map { i =>
    (i.toLong, if (i % 5 == 0) (i % 13).toLong else 7L, i * 1.5)
  }.toDF("event_id", "user_id", "value")

  private def dim = (0L until 13L).map(u => (u, s"user_$u")).toDF("user_id", "name")

  test("salted aggregation equals naive groupBy exactly") {
    val naive = skewed.groupBy("user_id")
      .agg(sum("value").as("sum"), count(lit(1)).as("n"))
      .orderBy("user_id").collect()
    val salted = ScaleOps.saltedSumCount(skewed, "user_id", "event_id", col("value"))
      .orderBy("user_id").collect()
    assert(salted.map(_.toSeq).toSeq === naive.map(_.toSeq).toSeq)
  }

  test("salted join equals naive inner join exactly") {
    val naive = skewed.join(dim, "user_id")
      .select("event_id", "user_id", "value", "name")
      .orderBy("event_id").collect()
    val salted = ScaleOps.saltedJoin(skewed, dim, "user_id", "event_id")
      .select("event_id", "user_id", "value", "name")
      .orderBy("event_id").collect()
    assert(salted.map(_.toSeq).toSeq === naive.map(_.toSeq).toSeq)
  }

  test("salt actually spreads the hot key across reducers") {
    val saltCount = skewed
      .withColumn("__salt", pmod(hash(col("event_id")), lit(16)))
      .filter(col("user_id") === 7L)
      .select("__salt").distinct().count()
    assert(saltCount > 8, s"hot key only hit $saltCount salts")
  }

  test("salting measurably rebalances task-level row counts, not just salt values") {
    // the 100× skew story, MEASURED from actual post-exchange partition
    // ids rather than asserted: the unsalted shuffle funnels user 7's 400
    // rows through ONE task, the salted shuffle must cut the largest
    // task's load by at least 4× on the same data
    def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(spark_partition_id().as("pid")).count()
        .agg(max("count")).as[Long].head()
    val unsalted = maxPartitionRows(skewed.repartition(32, col("user_id")))
    val salted = maxPartitionRows(
      skewed.withColumn("__salt", pmod(hash(col("event_id")), lit(16)))
        .repartition(32, col("user_id"), col("__salt")))
    assert(unsalted >= 400L, s"fixture lost its skew (max task rows = $unsalted)")
    assert(salted <= unsalted / 4,
      s"salting did not rebalance: max task rows $unsalted -> $salted")
  }
}

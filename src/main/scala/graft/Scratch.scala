package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
    ev.printSchema()
    ev.orderBy("event_id").show(3, false)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    spark.stop()
  }
}

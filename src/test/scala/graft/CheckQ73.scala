package graft
import org.apache.spark.sql.SparkSession
object CheckQ73 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.ops.PipelineOps.sequencePacking(
      Tables.documents(spark, "/root/testdata/sf0.01"))
    df.write.format("noop").mode("overwrite").save()
    val fin = df.queryExecution.executedPlan.toString
    println("REUSED=" + "ReusedExchange".r.findAllIn(fin).length)
    println("RANGE_EXCH=" + "Exchange rangepartitioning\\(doc_id".r.findAllIn(fin).length)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Single-node throughput of the reference's end-to-end topology (parse →
  * null-guard → fraud branch → serialize, `TransactionProcessor.java:25-54`)
  * over synthetic JSON wire records — the number to hold against
  * BASELINE.md's producer rate (1 msg/sec) and consumer path. The same
  * physical plan executes per micro-batch under Structured Streaming, so
  * batch transform throughput ≈ streaming steady-state throughput at
  * saturated batches.
  *
  * Not part of the driver contract; run manually:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ThroughputBench 10000000"
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // synthetic wire records: ~1/2 fraud, a sprinkle of malformed ones so
    // the tolerant-parse path is exercised, all codegen'd (no driver loop)
    val wire = spark.range(n).selectExpr(
      """CASE WHEN id % 1000 = 999 THEN 'not json'
              ELSE concat('{"userId":"user_', CAST(id % 1000 AS STRING),
                          '","amount":', CAST(pmod(id * 37, 20000) AS STRING),
                          '.5,"timestamp":', CAST(1700000000 + id % 100000 AS STRING), '}')
         END AS value""")

    def once(): Double = {
      val t0 = System.nanoTime()
      streaming.FraudPipeline.fraudAlerts(wire)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (JIT + codegen)
    val sec = math.min(once(), once())
    val rps = n / sec
    println(f"""{"metric":"pipeline_rows_per_sec","value":$rps%.0f,"rows":$n,"sec":$sec%.3f,"cpus":$cpus}""")
    spark.stop()
  }
}

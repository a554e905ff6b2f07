package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic for the r15 quiet-gate question: are probes taken
  * IMMEDIATELY after a measured pass inflated by the engine's own
  * settling (GC / noop-sink teardown / shuffle cleanup) rather than
  * external steal? Compares back-to-back: load → probe-now vs load →
  * settle 1 s → probe. Run manually: sbt "Test/runMain graft.ProbeSettleProbe". */
object ProbeSettleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probeRows = 64L * 1000 * 1000
    val sf = "/root/testdata/sf0.1"
    // the QuietBench chunk-0 shape: the first 15 queries in sorted order
    val load = SparkEntry.queries.toSeq.sortBy(_._1).take(15).map(_._2)
    def pass(): Unit = load.foreach(fn =>
      fn(spark, sf).write.format("noop").mode("overwrite").save())
    pass(); Bench.probeOnce(spark, probeRows) // warm
    // idle floor
    val idle = (1 to 5).map { _ => Thread.sleep(500); Bench.probeOnce(spark, probeRows) }
    println(f"idle probes: ${idle.map(Bench.fmt).mkString(", ")}")
    for (r <- 1 to 4) {
      pass()
      val now = Bench.probeOnce(spark, probeRows)
      val now2 = Bench.probeOnce(spark, probeRows)
      pass()
      Thread.sleep(1000)
      val s1a = Bench.probeOnce(spark, probeRows)
      val s1b = Bench.probeOnce(spark, probeRows)
      val s1c = Bench.probeOnce(spark, probeRows)
      pass()
      Thread.sleep(3000)
      val s3a = Bench.probeOnce(spark, probeRows)
      val s3b = Bench.probeOnce(spark, probeRows)
      val s3c = Bench.probeOnce(spark, probeRows)
      println(f"round $r: imm=${Bench.fmt(now)},${Bench.fmt(now2)} s1=${Bench.fmt(s1a)},${Bench.fmt(s1b)},${Bench.fmt(s1c)} s3=${Bench.fmt(s3a)},${Bench.fmt(s3b)},${Bench.fmt(s3c)}")
    }
    spark.stop()
  }
}

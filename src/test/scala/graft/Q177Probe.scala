package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-branch cost probe for the q177 lever experiment (round 15).
  * Not a spec — run manually: sbt "Test/runMain graft.Q177Probe". */
object Q177Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val customer = Tables.customer(spark, "/root/testdata/sf0.1")
    // warmup whole query once
    def full(): Double = {
      val t0 = System.nanoTime()
      graft.ops.DedupOps.editLinkageD2Pairs(customer)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"full warm: ${full()}%.2f s")
    for (r <- 1 to 5) println(f"full run $r: ${full()}%.2f s")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** r15 scaling-exponent probe (verdict item 5): the heaviest queries timed
  * at sf0.001 / sf0.01 / sf0.1 in ONE session, min-of-3 per (query, sf),
  * for the SCALING.md log-log slopes. Heaviest-first order so the big
  * timings land in the quietest part of the window. Run manually:
  * sbt "Test/runMain graft.ScalingProbeR15 q177,q140,...". */
object ScalingProbeR15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probeRows = 64L * 1000 * 1000
    val prefixes = args(0).split(",").toSeq
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    // warm every (query, sf) once
    for (sf <- sfs; (_, fn) <- qs)
      try fn(spark, sf).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    Bench.probeOnce(spark, probeRows)
    println(f"cal: ${Bench.fmt(Bench.calibrateQuiet(spark, probeRows))}")
    for ((name, fn) <- qs) {
      val row = sfs.map { sf =>
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sf).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        Bench.fmt(t)
      }
      val p = Bench.probePoint(spark, probeRows)
      println(s"scaling $name ${row.mkString(" ")} probe=${Bench.fmt(p)}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query seconds.
  *
  * Methodology:
  *  - queries execute in sorted-name order (stable run-to-run);
  *  - one full warmup pass first (JIT + codegen + parquet footer caches —
  *    first-query-in-JVM overhead otherwise dominates and measures the JVM,
  *    not the plan);
  *  - results go to the `noop` sink: the whole plan executes (unlike
  *    `count()`, which lets Catalyst prune projections) with zero sink cost;
  *  - TWO measured passes, per-query MIN reported: the host shows noisy-
  *    neighbor CPU steal (observed 3 s → 19 s on an identical warm plan),
  *    and min-of-2 is the standard estimator for "the plan's cost" under
  *    external interference.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // warmup pass (not timed)
    queries.foreach { case (_, fn) =>
      try runOne(fn) catch { case _: Throwable => () }
    }
    def measuredPass(): Seq[(String, Double)] = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try runOne(fn) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (p1, p2) = (measuredPass(), measuredPass())
    val results = p1.zip(p2).map { case ((name, a), (_, b)) => name -> math.min(a, b) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

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

    // optional arg: comma-separated name prefixes (local iteration only;
    // the driver invokes with no args → full suite)
    val prefixes = if (args.nonEmpty) args(0).split(",").toSeq else Seq("")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // One-line JSON-safe error rendering: strip backslash, quote, and ALL
    // control chars (same rule as Verify's escaper — any raw control byte
    // would make the driver's json.load fail and zero the bench line).
    def errMsg(e: Throwable): String =
      (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
        .map(c => if (c == '"' || c == '\\' || c < ' ') ' ' else c).take(200)

    // warmup pass (not timed; failures surface in the measured passes)
    queries.foreach { case (_, fn) =>
      try runOne(fn) catch { case _: Throwable => () }
    }
    // A failing query is recorded as an error, never as a timing — a
    // regression must be visible in the bench JSON, not scored as ~0 s.
    def measuredPass(): Seq[(String, Either[String, Double])] = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { runOne(fn); name -> Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable => name -> Left(errMsg(e)) }
    }
    val (p1, p2) = (measuredPass(), measuredPass())
    // A pass failure is ALWAYS visible in `errors` — an intermittently
    // failing query keeps its surviving timing but is flagged as flaky,
    // never silently scored as healthy.
    val merged = p1.zip(p2).map {
      case ((name, Right(a)), (_, Right(b))) => (name, Some(math.min(a, b)), None)
      case ((name, Right(a)), (_, Left(e)))  => (name, Some(a), Some(s"flaky (pass 2): $e"))
      case ((name, Left(e)), (_, Right(b)))  => (name, Some(b), Some(s"flaky (pass 1): $e"))
      case ((name, Left(e)), (_, Left(_)))   => (name, None, Some(e))
    }
    val ok = merged.collect { case (k, Some(v), _) => k -> v }
    val errors = merged.collect { case (k, _, Some(e)) => k -> e }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, e) => "\"" + k + "\":\"" + e + "\"" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty) System.err.println(s"BENCH FAILURES: ${errors.map(_._1).mkString(", ")}")
    spark.stop()
  }
}

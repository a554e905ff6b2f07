package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints machine-readable JSON lines (see [[renderLines]] for the contract).
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
  *    external interference;
  *  - a fixed-cost CPU probe runs before and after each measured pass. Its
  *    plan never changes, so probe variance IS host interference — a reader
  *    can tell "noisy host" from "slow plan" without a re-run.
  */
object Bench {
  /** Per-query outcome of the two measured passes. */
  final case class QueryResult(name: String,
                               p1: Either[String, Double],
                               p2: Either[String, Double])

  /** Probe seconds: (before pass 1, after pass 1, before pass 2, after pass 2). */
  final case class Probes(p1Before: Double, p1After: Double, p2Before: Double, p2After: Double) {
    def all: Seq[Double] = Seq(p1Before, p1After, p2Before, p2After)
  }

  /** 3-decimal rendering, locale-independent (f"" uses the default locale). */
  def fmt(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))

  /** One-line JSON-safe error rendering: strip backslash, quote, and ALL
    * control chars (same rule as Verify's escaper — any raw control byte
    * would make a line-oriented json.loads fail).
    */
  def errMsg(e: Throwable): String =
    (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
      .map(c => if (c == '"' || c == '\\' || c < ' ') ' ' else c).take(200)

  /** Fixed-cost CPU probe: a pure-compute range aggregation with no IO and a
    * constant plan. Quiet-host cost is a small constant; anything above it is
    * external CPU steal.
    */
  def probeOnce(spark: SparkSession, rows: Long): Double = {
    val t0 = System.nanoTime()
    // xxhash64 is per-row CPU work; bit_xor cannot overflow under ANSI mode.
    spark.range(0L, rows, 1L, spark.sparkContext.defaultParallelism)
      .selectExpr("bit_xor(xxhash64(id)) AS s")
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Render the stdout contract. Returns the lines IN PRINT ORDER:
    *
    *  1. `{"metric":"bench_detail",...}` — per-pass per-query seconds plus the
    *     four probe timings; the full interference record. Printed first so a
    *     bounded stdout-tail capture sheds it before the lines below.
    *  2. `{"metric":"total","value":T,"unit":"sec","queries":{...},...}` — the
    *     per-query detail line (min of the two passes, 3 decimals).
    *  3. `{"metric":"total","value":T,"unit":"sec",...}` — a compact total-only
    *     line, ALWAYS LAST and well under 300 bytes, so any tail window that
    *     sees the end of stdout sees one complete parseable JSON line.
    *
    * A failing query is recorded under `errors`, never as a timing — a
    * regression must be visible in the bench JSON, not scored as ~0 s. A
    * query that fails one pass keeps its surviving timing but is flagged
    * flaky, never silently scored as healthy.
    */
  def renderLines(results: Seq[QueryResult], probes: Probes, sfDir: String): Seq[String] = {
    val merged = results.map {
      case QueryResult(name, Right(a), Right(b)) => (name, Some(math.min(a, b)), None)
      case QueryResult(name, Right(a), Left(e))  => (name, Some(a), Some(s"flaky (pass 2): $e"))
      case QueryResult(name, Left(e), Right(b))  => (name, Some(b), Some(s"flaky (pass 1): $e"))
      case QueryResult(name, Left(e), Left(_))   => (name, None, Some(e))
    }
    val ok = merged.collect { case (k, Some(v), _) => k -> v }
    val errors = merged.collect { case (k, _, Some(e)) => k -> e }
    def secObj(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, e) => "\"" + k + "\":\"" + e + "\"" }.mkString("{", ",", "}")

    val total = ok.map(_._2).sum
    val passTotal1 = results.collect { case QueryResult(_, Right(a), _) => a }.sum
    val passTotal2 = results.collect { case QueryResult(_, _, Right(b)) => b }.sum
    val passTotals = s"[${fmt(passTotal1)},${fmt(passTotal2)}]"
    val probeArr = probes.all.map(fmt).mkString("[", ",", "]")

    val detail = {
      val p1 = results.collect { case QueryResult(k, Right(v), _) => k -> v }
      val p2 = results.collect { case QueryResult(k, _, Right(v)) => k -> v }
      s"""{"metric":"bench_detail","pass1":${secObj(p1)},"pass2":${secObj(p2)},""" +
        s""""probe":{"pass1":[${fmt(probes.p1Before)},${fmt(probes.p1After)}],""" +
        s""""pass2":[${fmt(probes.p2Before)},${fmt(probes.p2After)}]},""" +
        s""""errors":$errJson,"sf":"$sfDir"}"""
    }
    val perQuery =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${secObj(ok)},""" +
        s""""errors":$errJson,"pass_totals":$passTotals,"sf":"$sfDir"}"""
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{},""" +
        s""""nqueries":${ok.size},"nerrors":${errors.size},""" +
        s""""pass_totals":$passTotals,"probe":$probeArr,"sf":"$sfDir"}"""
    Seq(detail, perQuery, compact)
  }

  /** Output lines in print order plus the names of queries that errored. */
  final case class RunResult(lines: Seq[String], failed: Seq[String])

  /** Warm up, measure two passes (with probes), and render the output lines.
    * Does NOT stop the session — callable from tests on a shared session.
    */
  def run(spark: SparkSession, sfDir: String, prefixes: Seq[String],
          probeRows: Long = 64L * 1000 * 1000): RunResult = {
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // warmup pass (not timed; failures surface in the measured passes)
    queries.foreach { case (_, fn) =>
      try runOne(fn) catch { case _: Throwable => () }
    }
    def measuredPass(): Seq[(String, Either[String, Double])] = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { runOne(fn); name -> Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable => name -> Left(errMsg(e)) }
    }
    probeOnce(spark, probeRows) // probe warmup (JIT for the probe plan itself)
    val p1b = probeOnce(spark, probeRows)
    val pass1 = measuredPass()
    val p1a = probeOnce(spark, probeRows)
    val p2b = p1a // pass 2 starts where pass 1 ended; one probe serves both
    val pass2 = measuredPass()
    val p2a = probeOnce(spark, probeRows)
    val results = pass1.zip(pass2).map { case ((name, a), (_, b)) => QueryResult(name, a, b) }
    val failed = results.collect { case QueryResult(name, p1r, p2r) if p1r.isLeft || p2r.isLeft => name }
    RunResult(renderLines(results, Probes(p1b, p1a, p2b, p2a), sfDir), failed)
  }

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
    val result = run(spark, sfDir, prefixes)
    result.lines.foreach(println)
    if (result.failed.nonEmpty)
      System.err.println(s"BENCH FAILURES: ${result.failed.mkString(", ")}")
    spark.stop()
  }
}

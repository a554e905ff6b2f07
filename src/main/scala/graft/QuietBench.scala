package graft

import org.apache.spark.sql.SparkSession
import graft.Bench.{fmt, jsonSafe, errMsg}

/** Quiet-window per-query regression baseline (the r14 verdict's method):
  * every `SparkEntry.queries` entry timed MIN-OF-[[Passes]] inside a small
  * per-chunk window, each chunk bracketed by CPU probes and judged against
  * the run's FOLDED idle-floor calibration ([[Bench.foldQuiet]]) — so the
  * committed artifact says, per chunk, whether its minima were measured
  * quiet. Chunks of [[ChunkSize]] queries keep each window short (~10–60 s)
  * so a steal burst dirties one chunk, not the whole run; a noise-bound
  * chunk is re-measured up to [[ChunkRetries]] times and keeps its best
  * passes.
  *
  * Output: ONE JSON line, `metric=quiet_bench`, with per-query min seconds,
  * per-chunk noise verdicts + probe floors, and the calibration pair
  * (`cal0` raw, `probe_quiet_cal` folded). Committed per round as
  * `BENCH_quiet_r{N}.json` — the standing per-query regression oracle on
  * the current host class (official `BENCH_r{N}.json` totals stay the
  * driver's cross-round metric).
  */
object QuietBench {
  val Passes = 5
  val ChunkSize = 15
  val ChunkRetries = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probeRows = 64L * 1000 * 1000

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args(0).split(",").exists(n.startsWith) }
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // full warmup pass (JIT + shuffle files + shared snapshots)
    queries.foreach { case (_, fn) =>
      try runOne(fn) catch { case _: Throwable => () }
    }
    Bench.probeOnce(spark, probeRows) // probe-plan JIT
    val cal0 = Bench.calibrateQuiet(spark, probeRows)
    var seen = Seq.empty[Double]
    def probe(): Double = {
      // min-of-pair probe points (Bench.probePoint): a single probe
      // right after a pass reads the engine's own settle, not steal
      val p = Bench.probePoint(spark, probeRows); seen = seen :+ p; p
    }
    def quiet: Double = Bench.foldQuiet(cal0, seen)

    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val chunkMeta = Seq.newBuilder[(Int, Boolean, Seq[Double])]

    queries.grouped(ChunkSize).zipWithIndex.foreach { case (chunk, ci) =>
      var best = Map.empty[String, Double]
      var attempt = 0
      var chunkProbes = Seq.empty[Double]
      var wasQuiet = false
      while (attempt <= ChunkRetries && !wasQuiet) {
        val probes = Seq.newBuilder[Double]
        probes += probe()
        for (_ <- 1 to Passes) {
          chunk.foreach { case (name, fn) =>
            val t0 = System.nanoTime()
            try {
              runOne(fn)
              val s = (System.nanoTime() - t0) / 1e9
              if (!best.get(name).exists(_ <= s)) best += name -> s
            } catch { case e: Throwable => errors(name) = errMsg(e) }
          }
          probes += probe()
        }
        chunkProbes = probes.result()
        wasQuiet = !Bench.noiseBound(chunkProbes, quiet)
        attempt += 1
        if (!wasQuiet && attempt <= ChunkRetries) Thread.sleep(5000)
      }
      chunk.foreach { case (name, _) =>
        best.get(name).foreach(mins(name) = _)
      }
      chunkMeta += ((ci, wasQuiet, chunkProbes))
      System.err.println(f"[quiet-bench] chunk $ci%3d quiet=$wasQuiet " +
        f"probes=${chunkProbes.map(fmt).mkString(",")}")
    }

    val total = mins.values.sum
    def obj(kv: Iterable[(String, String)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qJson = obj(mins.map { case (k, v) => k -> fmt(v) })
    val eJson = obj(errors.map { case (k, v) => k -> ("\"" + v + "\"") })
    val chunks = chunkMeta.result()
    val cJson = obj(chunks.map { case (ci, q, ps) =>
      ci.toString -> s"""{"quiet":$q,"probes":[${ps.map(fmt).mkString(",")}]}"""
    })
    val allQuiet = chunks.forall(_._2)
    println(
      s"""{"metric":"quiet_bench","value":${fmt(total)},"unit":"sec",""" +
        s""""nqueries":${mins.size},"passes":$Passes,"all_chunks_quiet":$allQuiet,""" +
        s""""cal0":${fmt(cal0)},"probe_quiet_cal":${fmt(quiet)},""" +
        s""""queries":$qJson,"errors":$eJson,"chunks":$cJson,""" +
        s""""sf":"${jsonSafe(sfDir)}"}""")
    spark.stop()
  }
}

package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Guards the Bench stdout contract the driver depends on (the same class of
  * guard PlanShapeSpec gives plans): the driver captures a BOUNDED stdout
  * tail, so the FINAL line must be a compact, self-contained JSON object with
  * `metric=total` — if the last line ever grows past the tail window or stops
  * parsing, the fleet's only machine-readable perf signal goes dark.
  * Jackson (Spark's own JSON library) plays the strict parser.
  */
class BenchOutputSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def parseObj(line: String): JsonNode = {
    val node = mapper.readTree(line) // throws JsonProcessingException on bad JSON
    assert(node.isObject, s"line is not a JSON object: $line")
    node
  }

  private def keys(n: JsonNode): Set[String] = n.fieldNames().asScala.toSet

  private val probes = Bench.Probes(Seq(0.1, 0.2), Seq(0.2, 0.1))

  test("renderLines: last line is compact total-only JSON with metric=total") {
    val results = Seq(
      Bench.QueryResult("q01_a", Right(0.1234567), Right(0.2)),
      Bench.QueryResult("q02_b", Right(1.5), Right(0.75)),
    )
    val lines = Bench.renderLines(results, probes, "/sf")
    assert(lines.size == 3)

    val last = parseObj(lines.last)
    assert(last.get("metric").asText == "total")
    assert(last.get("unit").asText == "sec")
    // sum of per-query minimums: min(0.123,0.2) + min(1.5,0.75) = 0.873
    assert(last.get("value").asDouble == 0.873)
    assert(last.get("nqueries").asInt == 2 && last.get("nerrors").asInt == 0)
    assert(last.get("pass_totals").get(0).asDouble == 1.623)
    assert(last.get("pass_totals").get(1).asDouble == 0.95)
    // distinct probes: pass1 fully, pass2 minus the shared boundary probe
    assert(last.get("probe").size == 3)
    // must fit any plausible stdout-tail window with room to spare
    assert(lines.last.length < 300, s"compact line too long: ${lines.last.length}B")

    // the detailed line (line 2) carries per-query minimums at 3 decimals
    val detail = parseObj(lines(1))
    assert(detail.get("metric").asText == "total_detail")
    assert(keys(detail.get("queries")) == Set("q01_a", "q02_b"))
    assert(detail.get("queries").get("q01_a").asDouble == 0.123)
    assert(detail.get("queries").get("q02_b").asDouble == 0.75)
    // per-pass record (line 1) keeps both passes for interference forensics
    val passes = parseObj(lines.head)
    assert(passes.get("metric").asText == "bench_detail")
    assert(passes.get("pass1").get("q02_b").asDouble == 1.5)
    assert(passes.get("pass2").get("q02_b").asDouble == 0.75)
    assert(passes.get("probe").get("pass1").size == 2)
    assert(passes.get("probe_every").asInt == Bench.ProbeEvery)
  }

  test("renderLines: metric=total appears ONLY on the final compact line") {
    val results = Seq(Bench.QueryResult("q01_a", Right(0.1), Right(0.1)))
    val lines = Bench.renderLines(results, probes, "/sf")
    val metrics = lines.map(l => parseObj(l).get("metric").asText)
    assert(metrics == Seq("bench_detail", "total_detail", "total"))
    assert(metrics.distinct.size == metrics.size,
      s"a tail-scanning consumer grepping one metric must match one line: $metrics")
  }

  test("renderLines: quote/backslash/control chars in sfDir stay parseable") {
    val results = Seq(Bench.QueryResult("q01_a", Right(0.1), Right(0.1)))
    val evil = "/tmp/\"quoted\\path\n/sf0.1"
    val lines = Bench.renderLines(results, probes, evil)
    lines.foreach { l =>
      val node = parseObj(l) // would throw if the interpolation corrupted JSON
      val sf = node.get("sf").asText
      assert(!sf.contains('"') && !sf.contains('\\') && !sf.contains('\n'))
    }
  }

  test("renderLines: failures land in errors, flaky queries keep surviving timing") {
    val results = Seq(
      Bench.QueryResult("q_dead", Left("Boom: x"), Left("Boom: x")),
      Bench.QueryResult("q_flaky", Left("Boom: y"), Right(0.5)),
    )
    val lines = Bench.renderLines(results, Bench.Probes(Seq(0, 0), Seq(0, 0)), "/sf")
    val detail = parseObj(lines(1))
    assert(keys(detail.get("queries")) == Set("q_flaky")) // dead query NOT scored as ~0s
    assert(detail.get("queries").get("q_flaky").asDouble == 0.5)
    assert(keys(detail.get("errors")) == Set("q_dead", "q_flaky"))
    assert(detail.get("errors").get("q_flaky").asText.startsWith("flaky (pass 1):"))
    val last = parseObj(lines.last)
    assert(last.get("nerrors").asInt == 2 && last.get("nqueries").asInt == 1)
  }

  test("noise gate: both bursty AND uniformly-slow passes flag; quiet doesn't") {
    assert(!Bench.noiseBound(Seq(0.13, 0.14, 0.15)), "quiet run flagged")
    // r12 failure mode: a UNIFORMLY slow pass (sustained steal — every probe
    // ~2.5x quiet, best probe near median) must flag; the old self-relative
    // clause judged it quiet and published inflated minima
    assert(Bench.noiseBound(Seq(0.30, 0.31, 0.32)), "uniformly-slow pass laundered")
    // r9-official-like burst: median probe >> quiet baseline
    assert(Bench.noiseBound(Seq(0.119, 0.2, 0.3, 0.4, 0.535)), "burst not flagged")
    // mildly-above-quiet median stays under the 1.5x absolute bar
    assert(!Bench.noiseBound(Seq(0.14, 0.18, 0.19)), "near-quiet run flagged")
    assert(!Bench.noiseBound(Seq.empty), "empty probes must not flag")
  }

  test("recalibrated gate: a slower host's own floor judges its passes; calibration is floored and published") {
    // r14 host class: idle probe floor ~1.3s. Against the stale 0.13
    // constant every pass flags forever; against the host's own calibrated
    // floor, a run sitting AT the floor is quiet and genuine steal above
    // it still flags.
    val floor = 1.3
    assert(!Bench.noiseBound(Seq(1.25, 1.3, 1.4), floor),
      "host running at its own idle floor flagged as noisy")
    assert(Bench.noiseBound(Seq(2.1, 2.2, 2.3), floor),
      "sustained steal above the calibrated floor laundered")
    // the committed constant stays the lower bound: calibration can only
    // RAISE the bar (a quieter-than-historical sample must not tighten the
    // gate below the known physical probe cost)
    assert(math.max(Bench.ProbeQuietSec, 0.09) === Bench.ProbeQuietSec)
    // the calibrated constant is published on the compact line
    val results = Seq(Bench.QueryResult("q01_a", Right(0.1), Right(0.1)))
    val line = parseObj(Bench.renderLines(results,
      Bench.Probes(Seq(1.25, 1.3), Seq(1.3, 1.25)), "/sf", 0.0, floor).last)
    assert(line.get("probe_quiet_cal").asDouble === 1.3)
    assert(!line.get("noise_bound").asBoolean,
      "at-floor probes must be quiet under the published calibration")
    // default-path render still judges against the historical constant
    val stale = parseObj(Bench.renderLines(results,
      Bench.Probes(Seq(1.25, 1.3), Seq(1.3, 1.25)), "/sf").last)
    assert(stale.get("noise_bound").asBoolean)
    assert(stale.get("probe_quiet_cal").asDouble === Bench.ProbeQuietSec)
  }

  test("folded calibration: a smaller run probe lowers the bar; cal_high flags a suspect calibration") {
    // the r12-via-calibration laundering: a steal burst spanning the whole
    // ~3.5s calibration window inflates the MIN of its samples, and a bar
    // judged against the inflated reference publishes noise_bound:false on
    // a stolen run. foldQuiet folds the smallest probe EVER seen back in,
    // so one genuinely idle mid-run probe collapses the bar toward honesty.
    assert(Bench.foldQuiet(0.9, Seq(0.85, 0.2, 0.88)) === 0.2,
      "mid-run idle probe must lower a steal-inflated calibration")
    // folding never RAISES: slow probes leave the calibration untouched
    assert(Bench.foldQuiet(0.2, Seq(0.85, 0.9)) === 0.2)
    // and never drops below the known physical probe cost
    assert(Bench.foldQuiet(0.9, Seq(0.05)) === Bench.ProbeQuietSec)
    assert(Bench.foldQuiet(0.09, Seq.empty) === Bench.ProbeQuietSec)
    // with the folded bar, the stolen-calibration run is correctly flagged
    val stolenCal = 0.9 // every calibration sample saw the burst
    val folded = Bench.foldQuiet(stolenCal, Seq(0.85, 0.2, 0.88))
    assert(Bench.noiseBound(Seq(0.85, 0.88, 0.9), folded),
      "sustained steal judged quiet against its own stolen calibration")
    // cal_high: a calibration above CalHighFactor x the historical floor is
    // visible on the compact line — slow host class or stolen window, the
    // reader must not trust the bar blindly
    val results = Seq(Bench.QueryResult("q01_a", Right(0.1), Right(0.1)))
    val probes = Bench.Probes(Seq(0.12, 0.13), Seq(0.13, 0.12))
    val high = parseObj(Bench.renderLines(results, probes, "/sf", 0.0, 0.2, 1.3).last)
    assert(high.get("cal_high").asBoolean)
    assert(high.get("cal0").asDouble === 1.3)
    assert(high.get("probe_quiet_cal").asDouble === 0.2)
    val low = parseObj(Bench.renderLines(results, probes, "/sf", 0.0, 0.2, 0.2).last)
    assert(!low.get("cal_high").asBoolean)
  }

  test("renderLines: compact line carries the noise_bound verdict") {
    val results = Seq(Bench.QueryResult("q01_a", Right(0.1), Right(0.1)))
    val quiet = parseObj(Bench.renderLines(results,
      Bench.Probes(Seq(0.12, 0.13), Seq(0.13, 0.12)), "/sf").last)
    assert(!quiet.get("noise_bound").asBoolean)
    val noisy = parseObj(Bench.renderLines(results,
      Bench.Probes(Seq(0.13, 0.5, 0.6), Seq(0.6, 0.13, 0.7)), "/sf").last)
    assert(noisy.get("noise_bound").asBoolean)
  }

  test("noise_bound is the per-pass conjunction: one quiet pass clears the flag") {
    val results = Seq(Bench.QueryResult("q01_a", Right(0.1), Right(0.1)))
    // pass 1 steal-bound, pass 2 quiet — the minima are upper-bounded by the
    // quiet pass, so the artifact must NOT stay flagged (the r11 failure mode)
    val mixed = Bench.Probes(Seq(0.13, 0.5, 0.6), Seq(0.6, 0.13, 0.12))
    assert(Bench.passNoise(mixed) === Seq(true, false))
    val line = parseObj(Bench.renderLines(results, mixed, "/sf").last)
    assert(!line.get("noise_bound").asBoolean)
    assert(line.get("pass_noise").get(0).asBoolean
      && !line.get("pass_noise").get(1).asBoolean)
    // gate telemetry is always present (0.0 when the gate is disabled)
    assert(line.get("gate_wait").asDouble === 0.0)
    val gated = parseObj(Bench.renderLines(results, mixed, "/sf", 12.345).last)
    assert(gated.get("gate_wait").asDouble === 12.345)
  }

  test("renderLines: a third (noise-remediation) pass renders min-of-3 and 3 pass totals") {
    val results = Seq(
      Bench.QueryResult("q01_a", Seq(Right(0.5), Right(0.4), Right(0.2))),
      Bench.QueryResult("q02_b", Seq(Right(1.0), Left("Boom: z"), Right(0.8))))
    val p3 = Bench.Probes(Seq(Seq(0.1, 0.5), Seq(0.5, 0.6), Seq(0.6, 0.12)))
    val lines = Bench.renderLines(results, p3, "/sf")
    val detail = parseObj(lines.head)
    assert(keys(detail.get("pass3")) == Set("q01_a", "q02_b"))
    assert(detail.get("probe").get("pass3") != null
      && detail.get("probe").get("pass3").isArray, "probe pass3 missing")
    val perQuery = parseObj(lines(1))
    assert(perQuery.get("queries").get("q01_a").asDouble == 0.2) // min of 3
    assert(perQuery.get("queries").get("q02_b").asDouble == 0.8)
    assert(perQuery.get("errors").get("q02_b").asText.startsWith("flaky (pass 2)"))
    assert(perQuery.get("pass_totals").size() == 3)
    val compact = parseObj(lines.last)
    assert(compact.get("pass_totals").size() == 3)
  }

  test("fmt is locale-independent 3-decimal") {
    assert(Bench.fmt(0.1234567) == "0.123")
    assert(Bench.fmt(79.7815) == "79.782")
    assert(Bench.fmt(12.0) == "12.000")
  }

  test("end-to-end: run() on a 2-query prefix produces the full contract") {
    val result = Bench.run(spark, "/root/testdata/sf0.001",
      Seq("q01", "q02"), probeRows = 100000L)
    assert(result.failed.isEmpty, s"bench queries failed: ${result.failed}")
    val last = parseObj(result.lines.last)
    assert(last.get("metric").asText == "total")
    assert(last.get("nqueries").asInt == 2)
    assert(last.get("value").asDouble > 0.0)
    assert(result.lines.last.length < 300)
    val detail = parseObj(result.lines(1))
    assert(detail.get("metric").asText == "total_detail")
    assert(keys(detail.get("queries")) == Set("q01_fraud_filter", "q02_top10_by_user"))
  }
}

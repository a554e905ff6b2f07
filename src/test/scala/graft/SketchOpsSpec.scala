package graft

import graft.ops.SketchOps
import graft.ops.SketchOps.MisraGries
import org.apache.spark.sql.functions.col

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("MG summary keeps every item above n/(k+1) — the recall guarantee") {
    // deterministic skewed stream: item i gets ~n/2^i occurrences, plus a
    // long tail of singletons to pressure the counters
    val heavy = (1 to 6).flatMap(i => Seq.fill(1 << (10 - i))(s"h$i"))
    val tail = (1 to 300).map(i => s"t$i")
    val stream = new scala.util.Random(42).shuffle((heavy ++ tail).toVector)
    val n = stream.size
    val k = 16
    // run through the Dataset path with several partitions so reduce AND
    // merge both execute
    val cands = stream.toDS().repartition(7)
      .select(new MisraGries(k).toColumn)
      .collect().flatten.toSet
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = exact.filter(_._2 > n.toDouble / (k + 1)).keySet
    assert(mustKeep.nonEmpty, "test stream must contain true heavy hitters")
    assert(mustKeep.subsetOf(cands),
      s"missing guaranteed heavy hitters: ${mustKeep -- cands}")
    assert(cands.size <= k, s"summary exceeded capacity: ${cands.size} > $k")
  }

  test("MG merge bounds the summary at capacity and preserves heavy entries") {
    val mg = new MisraGries(3)
    val a = Map("x" -> 100L, "y" -> 5L, "z" -> 4L)
    val b = Map("x" -> 50L, "w" -> 6L, "v" -> 3L)
    val m = mg.merge(a, b)
    assert(m.size <= 3)
    assert(m.contains("x") && m("x") <= 150L && m("x") >= 150L - 5L)
  }

  test("q134 registers obey the HLL merge law: union registers = element-wise max of the halves'") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.where("doc_id % 2 = 0")
    val b = docs.where("doc_id % 2 = 1")
    val whole = SketchOps.hllRegisters(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val ra = SketchOps.hllRegisters(a).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val rb = SketchOps.hllRegisters(b).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val merged = (ra.keySet ++ rb.keySet).map { k =>
      k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))
    }.toMap
    assert(whole === merged,
      "HLL registers of a union must equal the element-wise max of the parts' — the mergeability that makes the sketch shippable")
  }

  test("q134 census is duplicate-insertion-proof and partitioning-invariant; raw estimate lands near exact") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = SketchOps.hllCensus(docs).collect().map(_.toSeq).toSeq
    assert(base.nonEmpty)
    // inserting the whole corpus twice must not move a single register or
    // estimate — MAX absorbs duplicates (the reason the corpus is never
    // distinct-shuffled on the register path)
    val doubled = SketchOps.hllCensus(docs.unionAll(docs)).collect().map(_.toSeq).toSeq
    assert(doubled === base)
    val reparted = SketchOps.hllCensus(docs.repartition(7)).collect().map(_.toSeq).toSeq
    assert(reparted === base)
    // accuracy: the SHIPPED estimate (raw, or linear-counting in the
    // small range — the paper's rule) must qualify on every language;
    // the raw estimator itself is only σ-bounded once out of the
    // linear-counting regime (exact ≥ 2.5m = 640)
    base.foreach { r =>
      val (lang, exact) = (r(0), r(1).asInstanceOf[Long])
      val relErr = r(6).asInstanceOf[Double]
      val estOk = r(7).asInstanceOf[Boolean]
      assert(exact > 0)
      assert(estOk, s"lang $lang: corrected estimate out of tolerance (exact $exact, rel_err $relErr)")
      if (exact >= 640)
        assert(math.abs(relErr) < 0.30, s"lang $lang: rel_err $relErr vs exact $exact")
    }
  }

  test("q64 two-pass output equals the exact group-by computation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = SketchOps.heavyHitters(docs)
      .as[(String, Long)].collect().toSeq
    val tokens = docs.selectExpr("explode(split(text, ' ')) AS token")
    val n = tokens.count()
    val exact = tokens.groupBy("token").count()
      .filter($"count" > n / 50.0)
      .orderBy($"count".desc, $"token")
      .as[(String, Long)].collect().toSeq
    assert(got === exact)
    assert(got.nonEmpty, "corpus should surface at least one heavy token")
  }

  test("KMV sketch is the exact hash set when unsaturated; bounded when not") {
    val rnd = new scala.util.Random(11)
    val mg = new graft.ops.SketchOps.KmvSketch(8)
    val values = Vector.fill(50)(rnd.nextLong(1L << 60))
    val seq = values.foldLeft(Vector.empty[Long])(mg.reduce)
    assert(seq === values.distinct.sorted.take(8), "bottom-k of the stream")
    // arbitrary segmentation + merge reaches the same bottom-k
    val merged = values.grouped(13)
      .map(_.foldLeft(Vector.empty[Long])(mg.reduce))
      .reduce(mg.merge)
    assert(merged === seq)
    val small = new graft.ops.SketchOps.KmvSketch(64)
    val all = values.foldLeft(Vector.empty[Long])(small.reduce)
    assert(all === values.distinct.sorted, "unsaturated sketch is exact")
  }

  test("q65 contamination: overlaps exact, sketch within tolerance, all pairs present") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = SketchOps.contamination(docs)
      .as[(String, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ===
      Seq(("test", "train"), ("test", "val"), ("train", "val")))
    // exact overlaps recomputed independently via a plain join
    val u = docs.selectExpr(
        s"${graft.ops.TextOps.BowFpExpr} AS fp", "doc_id")
    val sp = graft.ops.PipelineOps.splitAssign(docs).select("doc_id", "split")
    val us = u.join(sp, "doc_id").select("fp", "split").distinct()
    val expect = us.as("x").join(us.as("y"),
        $"x.fp" === $"y.fp" && $"x.split" < $"y.split")
      .groupBy($"x.split", $"y.split").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (a, b, nA, nB, overlap, ok) =>
      assert(overlap === expect.getOrElse((a, b), 0L), s"($a,$b)")
      assert(nA > 0 && nB > 0)
      assert(ok, s"($a,$b): KMV estimate outside tolerance")
    }
    // the corpus actually contains cross-split duplicate fingerprints —
    // the scenario the query exists to catch
    assert(got.map(_._5).sum > 0, "expected real contamination in testdata")
  }

  test("heavyHitters rejects a capacity below the recall requirement") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    intercept[IllegalArgumentException] {
      SketchOps.heavyHitters(docs, capacity = 10, thresholdInv = 50)
    }
  }

  test("q154 daily cube: total row = merged daily sketches = direct corpus sketch; days complete") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = SketchOps.hllDailyCube(events).collect()
    val total = rows.filter(_.getLong(0) == SketchOps.HllCubeTotalDay)
    assert(total.length === 1)
    // the merge law end-to-end: the total row's register summary equals
    // the sketch built DIRECTLY from the whole corpus (one fake-day pass)
    val direct = SketchOps.hllDailyCube(
        events.selectExpr("event_id", "CAST(timestamp_micros(0) AS TIMESTAMP) AS ts",
          "user_id", "event_type", "value", "props"))
      .collect().filter(_.getLong(0) == 0L).head
    assert(total.head.getLong(2) === direct.getLong(2), "n_registers_hit must merge losslessly")
    assert(total.head.getLong(4) === direct.getLong(4), "harmonic denominators must match")
    assert(total.head.getDouble(5) === direct.getDouble(5), "estimates bit-equal")
    // one row per active day + the total; totals dominate any single day
    val nDays = events.selectExpr(
      s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} AS d").distinct().count()
    assert(rows.length === nDays + 1)
    assert(rows.forall(r => r.getLong(1) > 0))
    assert(total.head.getLong(1) === rows.map(_.getLong(1)).max,
      "the union of days has at least as many distinct users as any day")
    // the sketch qualifies: est_ok on every row, rel_err sane
    assert(rows.forall(_.getBoolean(7)), "HLL estimate outside tolerance somewhere")
    val reparted = SketchOps.hllDailyCube(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q155 range estimate: merged daily sketches = direct range sketch; exact branch correct") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = SketchOps.hllRangeEstimate(events).collect()
    assert(rows.length === 1)
    val r = rows.head
    val (from, toExcl) = (r.getLong(0), r.getLong(1))
    assert(toExcl - from === SketchOps.HllRangeLen)
    // the anchor is the corpus's first active day + the shared offset
    val d0 = events.selectExpr(
      s"min(unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs}) AS d").head().getLong(0)
    assert(from === d0 + SketchOps.HllRangeStartOff)
    // exact branch against a driver-side distinct over the same range
    val inRange = events.filter(
      s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} >= $from AND " +
      s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} < $toExcl")
    val exact = inRange.selectExpr("CAST(user_id AS STRING) AS uk").distinct().count()
    assert(exact > 0, "testdata must actually cover the graded range")
    assert(r.getLong(3) === exact)
    assert(r.getLong(2) ===
      inRange.selectExpr(s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} AS d")
        .distinct().count())
    // THE merge law the query grades: estimating from the stored per-day
    // registers (MAX-merged) is bit-identical to sketching the range's
    // raw rows directly in one pass — day granularity costs nothing
    val direct = SketchOps.hllDailyCube(
        inRange.selectExpr("event_id", "CAST(timestamp_micros(0) AS TIMESTAMP) AS ts",
          "user_id", "event_type", "value", "props"))
      .collect().filter(_.getLong(0) == 0L).head
    assert(r.getLong(4) === direct.getLong(2), "n_registers_hit must merge losslessly")
    assert(r.getLong(6) === direct.getLong(4), "harmonic denominators must match")
    assert(r.getDouble(7) === direct.getDouble(5), "estimates bit-equal")
    // the SHIPPED estimate (small-range linear counting inside the
    // tolerance boolean, as in q154) must qualify; rel_err itself is the
    // honest raw-sketch report and is unbounded in the small-range regime
    assert(r.getBoolean(9), "corrected estimate outside tolerance")
    val reparted = SketchOps.hllRangeEstimate(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q156 range quantiles: merged-histogram rank pick contains the exact quantile; exact branch = definition") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = SketchOps.histRangeQuantiles(events).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("p50", "p95", "p99"))
    val byP = rows.map(r => r.getString(0) -> r).toMap
    val (from, toExcl) = (rows.head.getLong(1), rows.head.getLong(2))
    assert(toExcl - from === SketchOps.HllRangeLen)
    // reference: driver-side exact type-1 quantiles over the range's cents
    val cents = events.filter("value IS NOT NULL")
      .filter(s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} >= $from AND " +
        s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} < $toExcl")
      .selectExpr("CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(_.getLong(0)).sorted
    assert(cents.nonEmpty, "testdata must cover the graded range")
    for ((label, num, den) <- Seq(("p50", 1L, 2L), ("p95", 19L, 20L), ("p99", 99L, 100L))) {
      val r = byP(label)
      assert(r.getLong(3) === cents.length, s"$label n_range")
      val target = (num * cents.length + den - 1) / den
      assert(r.getLong(4) === target, s"$label target_rank")
      assert(r.getLong(9) === cents(target.toInt - 1), s"$label exact_cents")
      // the histogram-quantile guarantee: the merged-cube bin pick brackets
      // the exact value, and the shipped midpoint errs by < half a bin
      assert(r.getBoolean(11), s"$label containment")
      assert(math.abs(r.getLong(10)) <= SketchOps.HistBinCents / 2, s"$label err bound")
      assert(r.getLong(8) === r.getLong(6) + SketchOps.HistBinCents / 2)
    }
    // merge law at range granularity: summing the stored per-day histograms
    // equals histogramming the range's raw rows directly
    val dayHist = SketchOps.valueDayHist(events)
      .filter(s"day >= $from AND day < $toExcl")
      .groupBy("bin").agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = cents.groupBy(c =>
        (c - (((c % SketchOps.HistBinCents) + SketchOps.HistBinCents) % SketchOps.HistBinCents))
          / SketchOps.HistBinCents)
      .map { case (b, cs) => b -> cs.length.toLong }
    assert(dayHist === direct, "per-day SUM merge must equal the direct range histogram")
    val reparted = SketchOps.histRangeQuantiles(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q157 TopKByCount is an exact selection: matches a sort on any partitioning, merge-then-truncate law holds") {
    import SketchOps.TopKByCount
    // unique keys with contrived ties at the K boundary
    val rows = Seq(
      (1L, "u03", 9L), (1L, "u01", 9L), (1L, "u12", 9L), (1L, "u07", 9L),
      (1L, "u05", 7L), (1L, "u09", 7L), (1L, "u02", 7L), (1L, "u11", 7L),
      (1L, "u04", 7L), (1L, "u06", 3L), (1L, "u08", 1L), (1L, "u10", 1L))
    val expect = rows.map { case (_, u, c) => (c, u) }
      .sortBy { case (c, u) => (-c, u) }.take(SketchOps.TopkK)
      .map { case (c, u) => (u, c) }
    for (parts <- Seq(1, 3, 7)) {
      val got = rows.toDS().repartition(parts)
        .groupByKey(_._1)
        .agg(new TopKByCount(SketchOps.TopkK).toColumn.name("top"))
        .collect().head._2.toSeq
      assert(got === expect, s"selection diverged at $parts partitions")
    }
    // merge law: top-K(A ∪ B) = truncate(top-K(A) ++ top-K(B)) for
    // DISJOINT key sets — the property that makes the partial exact
    val agg = new TopKByCount(4)
    val a = rows.take(6).map { case (_, u, c) => (c, u) }
      .foldLeft(agg.zero)((s, e) => agg.reduce(s, (1L, e._2, e._1)))
    val b = rows.drop(6).map { case (_, u, c) => (c, u) }
      .foldLeft(agg.zero)((s, e) => agg.reduce(s, (1L, e._2, e._1)))
    val whole = rows.map { case (_, u, c) => (c, u) }
      .foldLeft(agg.zero)((s, e) => agg.reduce(s, (1L, e._2, e._1)))
    assert(agg.finish(agg.merge(a, b)).toSeq === agg.finish(whole).toSeq)
  }

  test("selectTopKIds (shared q164/q176/q184/q202 selection stage): exact selection, truncate-merge law, partitioning-invariant") {
    // synthetic id/key table with boundary ties, two groups
    val rows = (for (g <- Seq(0L, 1L); i <- 1 to 20)
      yield (g, (g * 100 + i), (i.toLong % 7) * 10 + g)).toSeq
    val k = 5
    def expect(g: Long): Seq[Long] = rows.filter(_._1 == g)
      .map { case (_, id, key) => (key, id.toString) }
      .sortBy { case (key, id) => (-key, id) }.take(k).map(_._2.toLong)
    val want = (expect(0L) ++ expect(1L)).sorted
    for (parts <- Seq(1, 3, 8)) {
      val got = SketchOps.selectTopKIds(
          rows.toDF("g", "id", "key").repartition(parts), k)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got === want, s"selection diverged at $parts partitions")
    }
    // THE truncate-merge law, spec'd once for every sampling caller:
    // selection over a union of id-disjoint shards == truncate(merge of
    // the per-shard selections). Selections carry their keys for the
    // merge by re-joining the keyed table (what every caller does).
    val df = rows.toDF("g", "id", "key")
    val shardA = df.filter("id % 2 = 0")
    val shardB = df.filter("id % 2 = 1")
    def selWithKeys(shard: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      SketchOps.selectTopKIds(shard, k).withColumnRenamed("id", "sid")
        .join(df, col("sid") === col("id"))
        .select("g", "id", "key").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val merged = (selWithKeys(shardA) ++ selWithKeys(shardB))
      .groupBy(_._1).view.mapValues(_.toSeq
        .sortBy { case (_, id, key) => (-key, id.toString) }
        .take(k).map(_._2.toLong).sorted).toMap
    val whole = SketchOps.selectTopKIds(df, k)
      .join(df.withColumnRenamed("id", "jid"), col("id") === col("jid"))
      .select("g", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(merged === whole,
      "truncate-merge of per-shard selections must equal the global selection")
    // bottom-K callers negate the key: smallest keys win under -key
    val bottom = SketchOps.selectTopKIds(
        df.filter("g = 0").selectExpr("g", "id", "-key AS key"), k)
      .collect().map(_.getLong(0)).sorted.toSeq
    val wantBottom = rows.filter(_._1 == 0L)
      .map { case (_, id, key) => (key, id.toString) }
      .sortBy { case (key, id) => (key, id) }.take(k).map(_._2.toLong).sorted
    assert(bottom === wantBottom, "negated key must select the bottom-K")
  }

  test("q157 range top-k: bounds bracket exact, census matches a driver reference, sketch is genuinely lossy here") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = SketchOps.topkRangeCensus(events).collect()
    assert(rows.nonEmpty)
    // driver-side reference from the definition
    val counts = events.selectExpr(
        s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} AS day",
        "CAST(user_id AS STRING) AS uk")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val d0 = counts.keys.map(_._1).min
    val (from, toExcl) = (d0 + SketchOps.HllRangeStartOff,
      d0 + SketchOps.HllRangeStartOff + SketchOps.HllRangeLen)
    val byDay = counts.groupBy(_._1._1)
    val stored = byDay.view.mapValues(m =>
      m.toSeq.map { case ((_, u), c) => (u, c) }
        .sortBy { case (u, c) => (-c, u) }.take(SketchOps.TopkK).toMap).toMap
    val thr = byDay.view.mapValues { m =>
      if (m.size > SketchOps.TopkK)
        m.values.toSeq.sortBy(-_).apply(SketchOps.TopkK - 1) else 0L
    }.toMap
    // NOTE: the K-th largest of the day = min of the stored K entries
    val rangeDays = byDay.keys.filter(d => d >= from && d < toExcl).toSeq
    val cands = rangeDays.flatMap(d => stored(d).keys).distinct
    def ref(u: String) = {
      val present = rangeDays.filter(d => stored(d).contains(u))
      val est = present.map(d => stored(d)(u)).sum
      val slack = rangeDays.filterNot(d => stored(d).contains(u)).map(thr).sum
      val exact = rangeDays.map(d => counts.getOrElse((d, u), 0L)).sum
      (present.size.toLong, est, est + slack, exact)
    }
    val expect = cands.map(u => u -> ref(u)).toMap
    assert(rows.length === cands.size)
    rows.foreach { r =>
      val (dp, est, ub, exact) = expect(r.getString(0))
      assert(r.getLong(1) === dp && r.getLong(2) === est &&
        r.getLong(3) === ub && r.getLong(4) === exact, s"row ${r.getString(0)}")
      assert(r.getBoolean(5) && r.getBoolean(6), s"bounds violated for ${r.getString(0)}")
    }
    // the bound machinery must actually be exercised by this corpus:
    // some candidate loses mass on a day it fell out of the top-K
    assert(rows.exists(r => r.getLong(2) < r.getLong(4)),
      "no lossy candidate — corpus too small to exercise the slack path")
    assert(rows.exists(r => r.getLong(3) > r.getLong(4)),
      "upper bound everywhere tight — thresholds never charged")
    // final answer: exactly min(K, candidates) rows flagged, ranks 1..n
    assert(rows.count(_.getBoolean(8)) === math.min(SketchOps.TopkK, cands.size))
    assert(rows.map(_.getLong(7)).sorted.toSeq === (1L to cands.size).toSeq)
    val reparted = SketchOps.topkRangeCensus(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q158 CMS: SUM-merge law, per-row mass conservation, probes match a driver grid, ghosts never negative") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val counts = SketchOps.userCounts(events)
    val regs = SketchOps.cmsRegisters(counts).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // merge law: the grid over a union of DISJOINT key sets is the
    // element-wise SUM of the halves' grids — what makes per-shard /
    // per-day CMS states combinable without touching raw rows
    val a = SketchOps.cmsRegisters(counts.where("uk % 2 = 0")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = SketchOps.cmsRegisters(counts.where("uk % 2 = 1")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(regs === merged, "CMS registers must SUM-merge losslessly")
    // conservation: every hash row distributes the full mass N
    val n = events.count()
    for (r <- 0 until SketchOps.CmsRows)
      assert(regs.collect { case ((`r`, _), v) => v }.sum === n,
        s"row $r lost mass")
    // census vs a driver-rebuilt grid (same md5 recipe via Spark SQL for
    // the hash itself, grid + min folded locally)
    val keyCnt = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ghostKeys = (1 to 3).map(g => s"ghost:$g")
    def cols(k: String): Seq[(Int, Long)] = {
      val exprs = (0 until SketchOps.CmsRows).map(r =>
        s"CAST(conv(substring(md5('cm$r:$k'), 1, 15), 16, 10) AS BIGINT) % ${SketchOps.CmsWidth}")
      spark.sql(s"SELECT ${exprs.mkString(", ")}")
        .head().toSeq.map(_.asInstanceOf[Long]).zipWithIndex.map(_.swap)
    }
    val rows = SketchOps.countMinCensus(events).collect()
    val probeSel = keyCnt.keySet.filter { k =>
      spark.sql(s"SELECT CAST(conv(substring(md5('$k'), 1, 15), 16, 10) AS BIGINT) % ${SketchOps.CmsProbeMod}")
        .head().getLong(0) == 0L
    }
    assert(rows.map(_.getString(0)).toSet === probeSel ++ ghostKeys)
    rows.foreach { row =>
      val k = row.getString(0)
      val exact = keyCnt.getOrElse(k, 0L)
      val est = cols(k).map { case (r, j) => regs.getOrElse((r, j), 0L) }.min
      assert(row.getLong(1) === exact && row.getLong(2) === est, s"probe $k")
      assert(row.getBoolean(4), s"CMS underestimated $k — impossible by construction")
    }
    assert(ghostKeys.forall(g => rows.find(_.getString(0) == g).get.getLong(1) == 0L))
    val reparted = SketchOps.countMinCensus(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q163 rollup: every level MAX-merges from the fine store; total row bit-equals the q154 cube's") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = SketchOps.hllRollupCube(events).collect()
    val byLevel = rows.groupBy(_.getString(0))
    assert(byLevel.keySet === Set("day_type", "type", "day", "total"))
    assert(byLevel("total").length === 1)
    // the level algebra: the 'day' rows must agree with the q154 cube's
    // daily rows (same registers — the et dimension merges away), and the
    // 'total' row must bit-equal the q154 total (register space is
    // identical: both hash the same uk universe)
    val q154 = SketchOps.hllDailyCube(events).collect()
      .map(r => r.getLong(0) -> r).toMap
    byLevel("day").foreach { r =>
      val ref = q154(r.getLong(1))
      assert(r.getLong(3) === ref.getLong(1), s"day ${r.getLong(1)} exact")
      assert(r.getLong(4) === ref.getLong(2), "n_registers_hit")
      assert(r.getLong(6) === ref.getLong(4), "harmonic denom")
      assert(r.getDouble(7) === ref.getDouble(5), "estimates bit-equal")
    }
    val tot = byLevel("total").head
    val ref = q154(SketchOps.HllCubeTotalDay)
    assert(tot.getLong(3) === ref.getLong(1) && tot.getLong(4) === ref.getLong(2) &&
      tot.getLong(6) === ref.getLong(4) && tot.getDouble(7) === ref.getDouble(5),
      "one register store must serve both cubes identically")
    // exact-count hierarchy: finer levels can only see MORE distincts
    // in aggregate (supersets per group) and the total bounds every group
    val totalExact = tot.getLong(3)
    assert(rows.forall(_.getLong(3) <= totalExact))
    // qualification at every level
    assert(rows.forall(_.getBoolean(9)), "HLL estimate outside tolerance at some level")
    val reparted = SketchOps.hllRollupCube(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q174 selectivity q-error: whole-domain estimate conserves mass exactly, empty is perfect, bands match a driver estimator") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = SketchOps.selectivityAudit(events).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === SketchOps.SelectivityProbes.map(_._1).toSet)
    val nVals = events.filter("value IS NOT NULL").count()
    // conservation: estimating the whole domain returns exactly N —
    // every bucket contributes its full mass (ow = bw)
    assert(rows("all").getLong(3) === 1000000L * nVals)
    assert(rows("all").getLong(4) === nVals && rows("all").getDouble(5) === 1.0)
    assert(rows("empty").getLong(3) === 0L && rows("empty").getLong(4) === 0L &&
      rows("empty").getDouble(5) === 1.0)
    // driver estimator over the q169 intervals
    val stats = SketchOps.equiDepthStats(events).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(7)))
    val ivs = stats.sortBy(_._1).foldLeft((Seq.empty[(Long, Long, Long)], 0L)) {
      case ((acc, _), (bucket, boundary, mass, minC)) =>
        val lo = if (bucket == 1L) minC - 1 else acc.last._2
        (acc :+ ((lo, boundary, mass)), boundary)
    }._1
    for ((label, lo, hi) <- SketchOps.SelectivityProbes) {
      val want = ivs.map { case (le, hiI, n) =>
        val ow = math.max(0L, math.min(hi, hiI) - math.max(lo - 1, le))
        (BigInt(n) * ow * 1000000 / (hiI - le)).toLong
      }.sum
      assert(rows(label).getLong(3) === want, s"probe $label estimate")
      assert(rows(label).getDouble(5) >= 1.0, s"probe $label q-error < 1")
    }
    val again = SketchOps.selectivityAudit(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(again === SketchOps.selectivityAudit(events).collect().map(_.toSeq).toSeq)
  }

  test("q172 join cardinality: overestimate theorem, exact branch = q153's Σc², collision-free grid is tight") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val r = SketchOps.cmsJoinCardinality(events).collect().head
    // exact branch = Σc² — the SAME number q153 computes as sum_c2 for
    // (events, user_id): the cross-query law tying the skew audit to
    // the planner's estimate
    val counts = events.selectExpr("CAST(user_id AS STRING)").collect()
      .groupBy(_.getString(0)).map(_._2.length.toLong)
    val exact = counts.map(c => BigInt(c) * c).sum
    assert(BigInt(r.getLong(2)) === exact)
    assert(r.getLong(0) === counts.sum && r.getLong(1) === counts.size.toLong)
    // the theorem: est ≥ exact, always
    assert(r.getBoolean(4) && r.getDouble(5) >= 1.0)
    // driver-rebuilt grid: est = min over rows of Σ reg²
    val regs = SketchOps.cmsRegisters(SketchOps.userCounts(events)).collect()
      .map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    val estRef = (0 until SketchOps.CmsRows).map { row =>
      regs.collect { case ((`row`, _), v) => BigInt(v) * v }.sum
    }.min
    assert(BigInt(r.getLong(3)) === estRef)
    // 15 keys over 256 columns collide in no row at this sf → the
    // estimate is TIGHT (blowup exactly 1) — the zero-collision case
    assert(r.getDouble(5) === 1.0,
      "expected a collision-free grid at sf0.001 — salts changed?")
    val again = SketchOps.cmsJoinCardinality(events.repartition(7)).collect().head
    assert(again.toSeq === r.toSeq)
  }

  test("q202 quantile sample: below K the sample IS the corpus, shard samples truncate-merge, corpus replay + error law") {
    // 10 values, all sampled (k = n = 10): every estimate is the exact
    // ceil-rank quantile and every rank error is zero
    val fix = (1 to 10).map(i => (i.toLong, i * 100L))
      .toDF("event_id", "cents")
      .selectExpr("timestamp_micros(event_id) AS ts", "event_id",
        "CAST(cents AS DOUBLE) / 100 AS value", "'t' AS event_type",
        "CAST(1 AS BIGINT) AS user_id")
    val fr = graft.ops.SketchOps.quantileSample(fix).collect()
    assert(fr.map(r => (r.getLong(0), r.getLong(3), r.getLong(7))).toSeq ===
      Seq((10L, 100L, 0L), (25L, 300L, 0L), (50L, 500L, 0L),
        (75L, 800L, 0L), (90L, 900L, 0L)),
      "ceil-rank selection: q25 of 10 values is rank 3, q75 rank 8")
    assert(fr.forall(r => r.getLong(1) === 10L && r.getLong(2) === 10L &&
      r.getBoolean(8)))
    // corpus: full driver replay at sf0.001
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val real = graft.ops.SketchOps.quantileSample(events).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): Long = java.lang.Long.parseLong(
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12), 16)
    val vs = events.filter("value IS NOT NULL")
      .selectExpr("event_id", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), draw(r.getLong(0))))
    def sampleOf(xs: Array[(Long, Long, Long)]) =
      xs.sortBy(t => (t._3, t._1.toString)).take(graft.ops.SketchOps.QSampleK)
    val samp = sampleOf(vs).sortBy(t => (t._2, t._1))
    val n = vs.length.toLong
    val want = graft.ops.SketchOps.QSampleQuantiles.map { q =>
      val est = samp((q * samp.length + 99) / 100 - 1)._2
      val target = (q * n + 99) / 100
      val below = vs.count(_._2 < est).toLong
      val atb = vs.count(_._2 <= est).toLong
      val err = if (below + 1 <= target && target <= atb) 0L
        else math.min(math.abs(target - below - 1), math.abs(target - atb))
      (q.toLong, samp.length.toLong, n, est, target, below + 1, atb, err,
        err * 10 <= n)
    }
    assert(real.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getBoolean(8))).toSeq === want)
    assert(real.forall(_.getBoolean(8)), "the error law must hold")
    assert(real.exists(_.getLong(7) > 0L),
      "a genuine sample must miss some target rank — else it is not sampling")
    // shard mergeability: bottom-K of the union of two shard bottom-Ks
    // IS the corpus bottom-K (the law that makes fleet ANALYZE cheap)
    val (a, b) = vs.partition(_._1 % 2 == 0)
    val merged = sampleOf((sampleOf(a) ++ sampleOf(b)))
      .map(t => (t._1, t._2)).toSet
    assert(merged === sampleOf(vs).map(t => (t._1, t._2)).toSet)
    val reparted = graft.ops.SketchOps.quantileSample(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q194 theta sets: exact mode below K, set laws are exact, common-θ estimates qualify; driver recount") {
    import java.sql.Timestamp
    def o(k: Long, date: String, price: Double) =
      (k, 1L, "O", price, Timestamp.valueOf(s"$date 00:00:00"), "1-URGENT")
    // 10 orders: 4 A-only (in window, cheap), 3 B-only (out of window,
    // pricey), 2 in both, 1 in neither — all below K, so θ = 2⁴⁸ (exact
    // mode) and every estimate EQUALS its exact count
    val fix = ((1 to 4).map(i => o(i.toLong, "1996-06-01", 100.0)) ++
        (5 to 7).map(i => o(i.toLong, "1990-01-01", 200000.0)) ++
        (8 to 9).map(i => o(i.toLong, "1997-03-01", 200000.0)) :+
        o(10L, "1990-01-01", 100.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = graft.ops.SketchOps.thetaSets(fix).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size === 6)
    val wantEx = Map("a" -> 6L, "b" -> 5L, "union" -> 9L, "inter" -> 2L,
      "a_not_b" -> 4L, "b_not_a" -> 3L)
    wantEx.foreach { case (op, ex) =>
      val r = got(op)
      assert(r.getLong(1) === ex, op)
      assert(r.getLong(3) === graft.ops.PipelineOps.TwoPow48, "exact mode θ")
      assert(r.getLong(2) === ex && r.getLong(4) === ex,
        s"$op: below K the sketch IS the set — estimate exact")
      assert(r.getLong(5) === 0L && r.getBoolean(6))
      assert(r.getBoolean(7) && r.getBoolean(8))
    }
    // real corpus: estimating mode; laws are theorems; driver recount of
    // the whole estimator from first principles
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val real = graft.ops.SketchOps.thetaSets(orders).collect()
    assert(real.length === 6)
    val byOp = real.map(r => r.getString(0) -> r).toMap
    assert(byOp("a").getLong(3) < graft.ops.PipelineOps.TwoPow48,
      "sf0.001 audiences exceed K: estimating mode")
    real.foreach { r =>
      assert(r.getBoolean(7), "inclusion-exclusion is a theorem below θ")
      assert(r.getBoolean(8), "disjoint decomposition is a theorem below θ")
      assert(r.getBoolean(6), s"${r.getString(0)}: estimate must qualify")
    }
    // driver replay: md5-48 draws, K smallest per set, common θ, retained
    val base = orders.selectExpr("o_orderkey",
        "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
          "o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AS in_a",
        "o_totalprice > 150000.0D AS in_b")
      .withColumn("h", graft.ops.PipelineOps.md5Prefix48(
        org.apache.spark.sql.functions.col("o_orderkey").cast("string")))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getLong(3)))
    val k = graft.ops.SketchOps.ThetaK
    val ha = base.filter(_._2).map(_._4).distinct.sorted.take(k)
    val hb = base.filter(_._3).map(_._4).distinct.sorted.take(k)
    val m = graft.ops.PipelineOps.TwoPow48
    val tha = if (ha.length < k) m else ha.last
    val thb = if (hb.length < k) m else hb.last
    val th = math.min(tha, thb)
    val ra = ha.filter(_ < th).toSet
    val rb = hb.filter(_ < th).toSet
    val wantRet = Map("a" -> ra.size, "b" -> rb.size,
      "union" -> (ra | rb).size, "inter" -> (ra & rb).size,
      "a_not_b" -> (ra -- rb).size, "b_not_a" -> (rb -- ra).size)
    wantRet.foreach { case (op, ret) =>
      assert(byOp(op).getLong(2) === ret.toLong, s"$op retained")
      assert(byOp(op).getLong(3) === th)
      assert(byOp(op).getLong(4) === ret.toLong * m / th, s"$op estimate")
    }
    val again = graft.ops.SketchOps.thetaSets(orders.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(again === real.map(_.toSeq).toSeq)
  }

  test("q169 equi-depth stats: boundaries = exact sorted-rank picks, masses conserve, census exact") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = SketchOps.equiDepthStats(events).collect()
    assert(rows.length === SketchOps.EquiDepthBuckets)
    val cents = events.filter("value IS NOT NULL")
      .selectExpr("CAST(round(value * 100) AS BIGINT)").collect()
      .map(_.getLong(0)).sorted
    val b = SketchOps.EquiDepthBuckets
    rows.foreach { r =>
      val bucket = r.getLong(0)
      val target = (bucket * cents.length + b - 1) / b
      assert(r.getLong(1) === target)
      // the definition: smallest value whose rank reaches the target
      assert(r.getLong(2) === cents(target.toInt - 1), s"bucket $bucket boundary")
      assert(r.getLong(4) === events.count() && r.getLong(5) === 0L)
      assert(r.getLong(6) === cents.distinct.length.toLong, "ndv")
      assert(r.getLong(7) === cents.head && r.getLong(8) === cents.last)
      assert(r.getBoolean(9), "top bucket must close at max")
    }
    // conservation + near-equal depths (exact up to duplicate-value ties)
    assert(rows.map(_.getLong(3)).sum === cents.length.toLong)
    val masses = rows.map(_.getLong(3))
    assert(masses.forall(m => math.abs(m - cents.length / b) <= 2),
      s"equi-depth masses wildly uneven: ${masses.mkString(",")}")
    val reparted = SketchOps.equiDepthStats(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q166 bitmap cube: popcount = exact everywhere, OR-merge = direct range bitmap, bit-63 users survive") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = SketchOps.bitmapDailyCube(events).collect()
    // THE graded law: bitmaps are exact, per day and for the merged total
    assert(rows.forall(_.getBoolean(4)), "bitmap popcount diverged from exact distinct")
    val total = rows.filter(_.getLong(0) == SketchOps.HllCubeTotalDay)
    assert(total.length === 1)
    assert(total.head.getLong(3) ===
      events.select("user_id").distinct().count())
    // range law (the q155 analog, exact here): OR of a range's daily
    // bitmaps = the direct bitmap of the range's rows
    val d0 = rows.map(_.getLong(0)).filter(_ >= 0).min
    val (from, toExcl) = (d0 + 7, d0 + 21)
    val inRange = events.filter(
      s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} >= $from AND " +
        s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} < $toExcl")
    val rangeDistinct = inRange.select("user_id").distinct().count()
    // rebuild per-day words locally and OR them over the range
    val uidByDay = events.selectExpr(
        s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} AS day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rangeWords = scala.collection.mutable.Map.empty[Long, Long]
    uidByDay.filter(p => p._1 >= from && p._1 < toExcl).foreach { case (_, uid) =>
      val w = uid / 64
      rangeWords(w) = rangeWords.getOrElse(w, 0L) | (1L << (uid % 64).toInt)
    }
    assert(rangeWords.values.map(java.lang.Long.bitCount).sum === rangeDistinct,
      "OR-merged range bitmap must count the exact range distinct")
    val reparted = SketchOps.bitmapDailyCube(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
    // the sign bit (uid ≡ 63 mod 64) on a hand fixture — the q161 <<
    // lesson: Spark wraps, the oracle needs MIN_LONG, popcount must
    // still be exact and word boundaries must not leak
    val fix = Seq((0L, 63L), (0L, 64L), (0L, 0L), (1L, 63L))
      .toDF("day0", "uid")
      .selectExpr(s"timestamp_micros(day0 * ${graft.ops.RelationalOps.DayUs}) AS ts",
        "uid AS user_id")
    val fr = SketchOps.bitmapDailyCube(fix).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(fr(0L) === ((2L, 3L, true)), "day 0: words {0 (bits 0,63), 1 (bit 0)}")
    assert(fr(1L) === ((1L, 1L, true)))
    assert(fr(SketchOps.HllCubeTotalDay) === ((2L, 3L, true)),
      "merged total must OR away the day-1 duplicate of uid 63")
  }

  test("q178 roaring cube: kind flips at the exact crossover, popcount law per kind, day ledger sums, negative blocks floor") {
    val w = SketchOps.RoaringBlockWidth
    val t = SketchOps.RoaringArrayMax
    val dayUs = graft.ops.RelationalOps.DayUs
    // day 0: block 0 holds EXACTLY t distinct cents (array, and chosen
    // ties at the crossover: 2t = width/8), block 1 holds t+1 (bitmap);
    // day 1: a negative-cents row exercising the floor spelling (block
    // -1, not 0), plus a bit-63 offset (off = 1023 -> word 15 bit 63)
    val rows =
      (0L until t).map(i => (0L, i * 2)) ++            // blk 0, offs 0,2,4,...
      (0L to t).map(i => (0L, w + i)) ++               // blk 1, t+1 distinct
      Seq((1L, -1L), (1L, w - 1L))                     // blk -1 off 1023; blk 0 off 1023
    val fix = rows.toDF("day0", "cents")
      .selectExpr(s"timestamp_micros(day0 * $dayUs) AS ts",
        "CAST(cents AS DOUBLE) / 100 AS value",
        "CAST(0 AS BIGINT) AS event_id", "'u' AS user_id", "'t' AS event_type")
    val got = SketchOps.roaringCube(fix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3) == "day") ->
        (r.getLong(2), r.getString(3), r.getBoolean(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(got((0L, 0L, false)) === ((t, "array", true, 2 * t, w / 8, 2 * t)),
      "exactly-at-threshold block must choose array (2t = width/8 tie)")
    assert(got((0L, 1L, false)) === ((t + 1, "bitmap", true, 2 * (t + 1), w / 8, w / 8)),
      "one-past-threshold block must choose bitmap and pocket the savings")
    assert(got((1L, -1L, false)) === ((1L, "array", true, 2L, w / 8, 2L)),
      "negative cents must land in floor block -1 with a valid offset")
    assert(got((1L, 0L, false))._1 === 1L && got((1L, 0L, false))._3,
      "bit-63 offset (off = width-1) must popcount exactly")
    // the day ledger: sums of the block rows, law = conjunction; the
    // sentinel blk = -1 coexists with day 1's GENUINE block -1, told
    // apart by kind (and the output sort includes kind for that reason)
    assert(got((0L, -1L, true)) === ((2L * t + 1L, "day", true, 2 * (2 * t + 1),
      2 * (w / 8), 2 * t + w / 8)), "day 0 ledger must sum its blocks")
    assert(got.contains((1L, -1L, true)) && got.contains((1L, -1L, false)),
      "sentinel and genuine block -1 must both survive, disambiguated by kind")
    // the policy point on the real corpus: chosen never exceeds either
    // pure policy, and both kinds appear across the tri-scale fixtures
    val real = SketchOps.roaringCube(Tables.events(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(real.forall(_.getBoolean(4)), "popcount law must hold corpus-wide")
    assert(real.forall(r => r.getLong(7) <= r.getLong(5) && r.getLong(7) <= r.getLong(6)),
      "chosen bytes must never exceed either pure policy")
    val reparted = SketchOps.roaringCube(
      Tables.events(spark, "/root/testdata/sf0.001").repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q181 run containers: head anti-join counts runs exactly, tie prefers array, the sequential-vs-value lesson holds") {
    val w = SketchOps.RoaringBlockWidth
    val dayUs = graft.ops.RelationalOps.DayUs
    // day 0 cents: offs {0..9, 20, 22, 24} = 1 long run + 3 singletons
    // (4 runs, n=13: array 26, run 18, bitmap 128 -> run); day 1 cents:
    // exactly n=3 with one run (array 6 = run 6 -> tie prefers array);
    // event_ids are globally sequential so each day is one run
    val rows =
      ((0 until 10).map(o => (0L, o.toDouble / 100)) ++
        Seq((0L, 0.20), (0L, 0.22), (0L, 0.24)) ++
        Seq((1L, 5.00), (1L, 5.01), (1L, 5.02)))
    val fix = rows.zipWithIndex.map { case ((d, v), i) => (d, v, i.toLong) }
      .toDF("day0", "v", "event_id")
      .selectExpr(s"timestamp_micros(day0 * $dayUs) AS ts",
        "CAST(v AS DOUBLE) AS value", "event_id")
    val got = SketchOps.roaringRunsCube(fix).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getString(5), r.getLong(9), r.getBoolean(11)))
      .toMap
    assert(got(("cents", 0L, 0L)) === ((13L, 4L, "run", 18L, true)),
      "punctured run block: 4 runs, run container wins")
    assert(got(("cents", 1L, 0L)) === ((3L, 1L, "array", 6L, false)),
      "n=3 single-run block ties array (6 = 6) and the tie prefers array")
    assert(got(("event_id", 0L, 0L))._3 === "run" &&
      got(("event_id", 0L, 0L))._2 === 1L,
      "sequential ids: one run per day")
    // real corpus: driver-side first-principles run count per block
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val real = SketchOps.roaringRunsCube(events).collect()
    val offs = events.selectExpr(s"unix_micros(ts) DIV $dayUs AS day",
        "CAST(event_id AS BIGINT) AS v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (d, v) => (d, Math.floorDiv(v, w), Math.floorMod(v, w)) }
      .distinct.groupBy(t => (t._1, t._2))
    real.filter(r => r.getString(0) == "event_id" && r.getLong(1) >= 0).foreach { r =>
      val os = offs((r.getLong(1), r.getLong(2))).map(_._3).toSet
      val runs = os.count(o => !os.contains(o - 1))
      assert(r.getLong(3) === os.size && r.getLong(4) === runs,
        s"block (${r.getLong(1)}, ${r.getLong(2)}) run count")
    }
    // the graded lesson on the real table: run-aware beats two-way for
    // sequential ids, gains nothing for value-shaped cents
    val tot = real.filter(_.getLong(1) == -1L)
      .map(r => r.getString(0) -> r.getBoolean(11)).toMap
    assert(tot("event_id") && !tot("cents"))
    val reparted = SketchOps.roaringRunsCube(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q186 join order: exact = count-collapse identity, FK joins estimate perfectly, skew flips the choice detectably") {
    // real corpus: FK joins satisfy the uniformity assumption exactly,
    // so the estimator is spot-on and ranks the orders right
    val (c, o, l) = (Tables.customer(spark, "/root/testdata/sf0.001"),
      Tables.orders(spark, "/root/testdata/sf0.001"),
      Tables.lineitem(spark, "/root/testdata/sf0.001"))
    val real = SketchOps.joinOrderAudit(c, o, l).collect()
    assert(real.forall(_.getBoolean(10)), "FK joins must rank correctly")
    assert(real.forall(_.getDouble(7) < 1.01), "FK joins estimate near-exactly")
    // exact branch = driver count-collapse identity
    val co = real.find(_.getString(0) == "CO_first").get
    val ccM = c.selectExpr("c_custkey").collect().groupBy(_.getLong(0)).map(p => p._1 -> p._2.length)
    val ocM = o.selectExpr("o_custkey").collect().groupBy(_.getLong(0)).map(p => p._1 -> p._2.length)
    val want = ccM.map { case (k, n) => n.toLong * ocM.getOrElse(k, 0).toLong }.sum
    assert(co.getLong(5) === want, "exact intermediate must equal the sum of per-key products")
    // skew fixture: a hot correlated key makes uniformity UNDERESTIMATE
    // the C⋈O intermediate enough to flip the order choice — the audit
    // must report agree = false (the bit that triggers a stats upgrade)
    import spark.implicits._
    val a = ((1 to 20).map(_ => 1L) :+ 2L).toDF("c_custkey")
    val b = ((1 to 20).map(_ => 1L) :+ 2L).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("o_custkey", "o_orderkey")
    val cl = (1 to 300).map(i => (i % 21).toLong).toDF("l_orderkey")
    val skew = SketchOps.joinOrderAudit(a, b, cl).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(skew("CO_first").getLong(5) === 401L && skew("CO_first").getLong(6) === 220L,
      "hot key: exact 20*20+1, System-R 21*21/2")
    assert(skew("CO_first").getBoolean(8) && !skew("CO_first").getBoolean(9),
      "the estimator must pick CO while OL is truly cheaper")
    assert(skew.values.forall(!_.getBoolean(10)),
      "the flipped choice must surface as agree = false")
    val reparted = SketchOps.joinOrderAudit(c, o.repartition(7), l)
      .collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q161 bloom: OR-merge law, no false negatives ever, census matches a driver filter, pruning engages") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    // build-side keys per the shared dial
    val keyRows = events.where("value IS NOT NULL")
      .selectExpr("CAST(user_id AS STRING) AS uk",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .groupBy("uk").agg(org.apache.spark.sql.functions.sum("cents").as("t"))
    val members = keyRows.where(s"t > ${SketchOps.BloomSpendCents}")
      .select("uk").collect().map(_.getString(0)).toSet
    assert(members.nonEmpty && members.size < keyRows.count(),
      "dial must split the users non-trivially")
    val keysDf = members.toSeq.toDF("uk")
    // OR-merge law: the word table of a union of key sets is the
    // element-wise OR of the halves' tables
    val (ka, kb) = members.toSeq.sorted.splitAt(members.size / 2)
    def words(ks: Seq[String]) = SketchOps.bloomWords(ks.toDF("uk")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val whole = words(members.toSeq)
    val (wa, wb) = (words(ka), words(kb))
    val ored = (wa.keySet ++ wb.keySet).map(w =>
      w -> (wa.getOrElse(w, 0L) | wb.getOrElse(w, 0L))).toMap
    assert(whole === ored, "bloom words must OR-merge losslessly")
    // driver filter: rebuild positions via the same md5 recipe and test
    // every event row locally
    val wordVec = Array.tabulate(SketchOps.BloomWords)(w => whole.getOrElse(w, 0L))
    def positions(uk: String): Seq[Long] = {
      val exprs = (0 until SketchOps.BloomHashes).map(r =>
        s"CAST(conv(substring(md5('bf$r:$uk'), 1, 15), 16, 10) AS BIGINT) % ${SketchOps.BloomBits}")
      spark.sql(s"SELECT ${exprs.mkString(", ")}").head().toSeq.map(_.asInstanceOf[Long])
    }
    val userPass = (events.selectExpr("CAST(user_id AS STRING) AS uk").distinct()
      .collect().map(_.getString(0))).map { uk =>
      uk -> positions(uk).forall(p =>
        (wordVec((p / 64).toInt) & (1L << (p % 64).toInt)) != 0L)
    }.toMap
    // the Bloom guarantee, proven against the driver filter
    assert(members.forall(userPass), "a member failed its own filter")
    val evRows = events.selectExpr(
        s"unix_micros(ts) DIV ${graft.ops.RelationalOps.DayUs} AS day",
        "CAST(user_id AS STRING) AS uk")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val rows = SketchOps.bloomPruneCensus(events).collect()
    rows.foreach { r =>
      val day = r.getLong(0)
      val de = evRows.filter(_._1 == day)
      assert(r.getLong(1) === de.length)
      assert(r.getLong(2) === de.count(e => userPass(e._2)), s"n_pass day $day")
      assert(r.getLong(3) === de.count(e => members(e._2)), s"n_member day $day")
      assert(r.getLong(4) === de.count(e => userPass(e._2) && !members(e._2)))
      assert(r.getBoolean(5), s"false negative at day $day — impossible for a Bloom filter")
    }
    // the filter must actually prune at this corpus
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "bloom never rejected anything — census degenerate")
    val reparted = SketchOps.bloomPruneCensus(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }
}

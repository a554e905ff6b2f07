package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(values: Seq[Double]) =
    values.zipWithIndex.map { case (v, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000), i.toLong % 7,
        "purchase", v, s"""{"k": $i}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("fraud filter is strict >: boundary value excluded") {
    val df = mkEvents(Seq(99.99, 100.0, 100.0000001, 150.0))
    val fraud = EventOps.fraudFilter(df).select("value").as[Double].collect()
    assert(fraud.toSeq === Seq(100.0000001, 150.0))
  }

  test("property: branch legs are disjoint and complete for random values") {
    val gen = Gen.listOfN(40, Gen.choose(0.0, 200.0))
    (0 until 5).foreach { i =>
      val vs = gen(Gen.Parameters.default, Seed(42L + i)).get
      val df = mkEvents(vs)
      val fraud = EventOps.fraudFilter(df).count()
      val other = EventOps.branchOther(df).count()
      assert(fraud + other === vs.length.toLong, s"sample $i")
    }
  }

  test("parseProps yields null for malformed JSON instead of failing") {
    val df = Seq(
      (0L, new java.sql.Timestamp(0L), 0L, "x", 1.0, """{"k": 42}"""),
      (1L, new java.sql.Timestamp(0L), 0L, "x", 1.0, """not json"""),
      (2L, new java.sql.Timestamp(0L), 0L, "x", 1.0, null.asInstanceOf[String])
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ks = EventOps.parseProps(df).select("k").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(ks.toSeq === Seq(Some(42), None, None))
  }

  test("top10 ranks by exact total with user_id tie-break") {
    // users 0..5 get 3×150, user 6 gets 2×150 → 450-ties ordered by user_id
    val df = mkEvents(Seq.fill(20)(150.0))
    val rows = EventOps.top10ByUser(df).select("user_id").as[Long].collect()
    assert(rows.toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("q203 hopping mean: each observation lands in exactly 4 overlapping windows; corpus fan-out replays") {
    val h = 3600000000L
    // one user: 100c @0h (hop cell 0) and 300c @7h (cell 1) — five
    // windows total, the middle three hold both observations
    val fix = Seq((0L, 0L, 100L), (1L, 7L * h, 300L))
      .toDF("event_id", "usv", "cents")
      .selectExpr("timestamp_micros(usv) AS ts", "event_id",
        "CAST(1 AS BIGINT) AS user_id",
        "CAST(cents AS DOUBLE) / 100 AS value", "'t' AS event_type")
    val got = graft.ops.EventOps.hoppingMean(fix).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    val hopUs = graft.ops.EventOps.HopUs
    assert(got.toSeq === Seq(
      (-3 * hopUs, 1L, 100L, 100000000L),
      (-2 * hopUs, 2L, 400L, 200000000L),
      (-hopUs, 2L, 400L, 200000000L),
      (0L, 2L, 400L, 200000000L),
      (hopUs, 1L, 300L, 300000000L)),
      "overlap: the 7h-apart pair shares exactly the three middle windows")
    val ends = graft.ops.EventOps.hoppingMean(fix).collect()
      .map(r => r.getLong(2) - r.getLong(1)).distinct
    assert(ends.toSeq === Seq(4 * hopUs), "every window spans 24h")
    // corpus: fan-out replay at sf0.001 + the conservation law
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val real = graft.ops.EventOps.hoppingMean(events).collect()
    val obs = events.filter("value IS NOT NULL")
      .selectExpr("user_id", "unix_micros(ts)", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = obs.flatMap { case (u, us, c) =>
      (0L until graft.ops.EventOps.HopWindows).map(i =>
        ((u, (us / hopUs - i) * hopUs), c))
    }.groupBy(_._1).toSeq.map { case ((u, w), xs) =>
      val n = xs.length.toLong; val s = xs.map(_._2).sum
      (u, w, n, s, 1000000L * s / n)
    }.sortBy(t => (t._1, t._2))
    assert(real.map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
      r.getLong(4), r.getLong(5))).toSeq === want)
    assert(real.map(_.getLong(3)).sum ===
      graft.ops.EventOps.HopWindows * obs.length,
      "conservation: every observation counts into exactly 4 windows")
    val reparted = graft.ops.EventOps.hoppingMean(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q146 benford: digits from exact cents, all 9 rows present, χ² matches a local fold") {
    // amounts chosen so digit comes from CENTS (1.23 → 123 → digit 1),
    // zero amounts excluded, and some digits are absent
    val df = mkEvents(Seq(1.23, 1.99, 25.0, 0.0, 2.50, 9.99, 0.005))
    val rows = EventOps.benfordAudit(df).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 9), "always the full 9-digit census")
    val byDigit = rows.map(r => r.getInt(0) -> r).toMap
    // 1.23→1, 1.99→1, 25.0→2, 2.50→2, 9.99→9; 0.0 and 0.005 (→ cents 1?
    // ROUND(0.5)=1, digit 1) — 0.005·100 = 0.5 rounds HALF UP to 1 cent
    assert(byDigit(1).getLong(1) === 3L)
    assert(byDigit(2).getLong(1) === 2L)
    assert(byDigit(9).getLong(1) === 1L)
    assert(byDigit(3).getLong(1) === 0L, "absent digits report zero, not a missing row")
    assert(rows.forall(_.getLong(2) === 6L))
    // χ² equals the driver-side fold over the same micro-rounded terms
    val nTotal = 6.0
    val want = rows.map { r =>
      val e = r.getDouble(4) * nTotal
      math.round((r.getLong(1) - e) * (r.getLong(1) - e) / e * 1e6)
    }.sum / 1e6
    assert(rows.forall(_.getDouble(6) === want))
    // benford column sums to ~1 (it is a distribution)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-12)
  }

  test("q146 benford on the corpus: counts conserve, deviations sum to ~0, partitioning invariance") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = EventOps.benfordAudit(events).collect()
    assert(rows.map(_.getLong(1)).sum === rows.head.getLong(2))
    assert(math.abs(rows.map(_.getDouble(5)).sum) < 1e-9,
      "Σ(p_observed − p_benford) = Σp_obs − Σp_benford ≈ 0")
    assert(rows.head.getDouble(6) >= 0.0)
    val reparted = EventOps.benfordAudit(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q147 round affinity: hand fixture — exact share, z sign, and the min-tx floor") {
    // user 0: 20 tx, 10 round (heavy); user 1: 20 tx, 0 round;
    // user 2: only 5 tx — below the floor, excluded from the report
    val ev = (
      (0 until 20).map(i => (i.toLong, 0L, if (i < 10) 5.0 else 5.17)) ++
      (0 until 20).map(i => (100L + i, 1L, 3.33)) ++
      (0 until 5).map(i => (200L + i, 2L, 7.0))
    ).map { case (eid, uid, v) =>
      (eid, new java.sql.Timestamp(1700000000000L + eid * 1000), uid,
        "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = EventOps.roundNumberAffinity(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(0L, 1L), "user 2 sits below the min-tx floor")
    assert(rows(0L).getLong(2) === 10L && rows(0L).getDouble(3) === 0.5)
    assert(rows(1L).getLong(2) === 0L)
    // base rate = 15/45; the heavy user scores positive, the clean negative
    assert(rows(0L).getDouble(4) === 15.0 / 45.0)
    assert(rows(0L).getDouble(5) > 0 && rows(1L).getDouble(5) < 0)
    assert(rows(0L).getBoolean(6) === (math.abs(rows(0L).getDouble(5)) > 3.0))
  }

  test("q147 round affinity on the corpus: counts conserve, z centered, partitioning invariance") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = EventOps.roundNumberAffinity(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= EventOps.RoundMinTx)
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0,
        "the corpus must carry a non-degenerate whole-dollar base rate")
    }
    // z is standardized against the corpus's own rate — its weighted sum
    // over ALL users would be 0; over the floored subset it stays small
    val meanZ = rows.map(_.getDouble(5)).sum / rows.length
    assert(math.abs(meanZ) < 1.0, s"mean z $meanZ")
    val reparted = EventOps.roundNumberAffinity(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }
}

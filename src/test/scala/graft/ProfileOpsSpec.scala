package graft

import graft.ops.ProfileOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Orders-shaped hand fixture: 5 rows — o_orderkey unique, o_custkey has
    * a NULL and a dup, o_orderstatus constant, o_totalprice two distinct. */
  private def handOrders = Seq(
    (1L, Option(10L), "O", 1.5, 1000L, "1-URGENT"),
    (2L, Option(10L), "O", 1.5, 2000L, "1-URGENT"),
    (3L, Option(20L), "O", 2.5, 3000L, "1-URGENT"),
    (4L, None: Option[Long], "O", 2.5, 4000L, "1-URGENT"),
    (5L, Option(30L), "O", 2.5, 5000L, "1-URGENT"))
    .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "us", "o_orderpriority")
    .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "timestamp_micros(us) AS o_orderdate", "o_orderpriority")

  test("q188 column profile: hand nulls/dups, ONE Expand pass, corpus recount") {
    val prof = ProfileOps.columnProfile(handOrders)
    // one pass, no join anywhere; multi-distinct plans via Expand
    val plan = prof.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "multi-column distinct must plan as Expand")
    assert(!plan.contains("Join"), "the profile is a single-pass aggregate")
    val rows = prof.collect().map(r => r.getString(0) -> r).toMap
    val ck = rows("o_custkey")
    assert(ck.getLong(1) === 5L && ck.getLong(2) === 4L && ck.getLong(3) === 3L)
    assert(ck.getLong(4) === 800000L, "completeness = 4/5")
    assert(ck.getLong(5) === 750000L, "distinctness = 3/4 of non-null")
    assert(!ck.getBoolean(6))
    assert(rows("o_orderkey").getBoolean(6), "the key column is unique")
    assert(rows("o_orderstatus").getLong(3) === 1L)
    assert(rows("o_totalprice").getLong(3) === 2L)
    assert(rows.keySet === ProfileOps.ProfileColumns.toSet)
    // corpus: exact driver recount per column
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val got = ProfileOps.columnProfile(orders).collect()
    val data = orders.collect()
    got.foreach { r =>
      val c = r.getString(0)
      val idx = orders.columns.indexOf(c)
      val vals = data.map(_.get(idx))
      assert(r.getLong(1) === data.length.toLong, c)
      assert(r.getLong(2) === vals.count(_ != null).toLong, c)
      assert(r.getLong(3) === vals.filter(_ != null).distinct.length.toLong, c)
      assert(r.getBoolean(6) ===
        (r.getLong(3) == r.getLong(2) && r.getLong(2) == r.getLong(1)), c)
    }
    val reparted = ProfileOps.columnProfile(orders.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === got.map(_.toSeq).toSeq)
  }

  /** Lineitem-shaped hand fixture covering every rule verdict: a duplicate
    * (orderkey, linenumber) pair, an orderkey with two returnflags, a
    * partkey sold by two suppliers, one quantity-range breach; discounts
    * all legal. */
  private def handLineitem = Seq(
    // ok, pk, sk, ln, qty, disc, rf
    (1L, 100L, 7L, 1, 5.0, 0.05, "N"),
    (1L, 101L, 8L, 1, 5.0, 0.05, "R"), // dup PK (1,1); ok=1 has rf N and R
    (1L, 100L, 9L, 2, 0.0, 0.10, "N"), // pk=100 sold by supp 7 AND 9; qty=0 breach
    (2L, 102L, 7L, 1, 50.0, 0.00, "A"))
    .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_discount", "l_returnflag")

  test("q189 constraint audit: every rule verdict on a hand table, corpus recount") {
    val got = ProfileOps.constraintAudit(handLineitem).collect()
      .map(r => r.getString(0) -> r).toMap
    val key = got("key:l_orderkey,l_linenumber")
    assert(key.getLong(1) === 3L, "3 distinct (ok, ln) groups")
    assert(key.getLong(2) === 1L && key.getLong(3) === 2L && !key.getBoolean(6))
    val fdRf = got("fd:l_orderkey->l_returnflag")
    assert(fdRf.getLong(1) === 2L && fdRf.getLong(2) === 1L &&
      fdRf.getLong(3) === 3L && !fdRf.getBoolean(6))
    val fdSk = got("fd:l_partkey->l_suppkey")
    assert(fdSk.getLong(2) === 1L && fdSk.getLong(3) === 2L)
    val dcQty = got("dc:l_quantity_in_1_50")
    assert(dcQty.isNullAt(1) && dcQty.getLong(3) === 1L &&
      dcQty.getLong(4) === 4L && !dcQty.getBoolean(6))
    assert(dcQty.getLong(5) === 250000L, "violation_micro = 1/4")
    val dcDisc = got("dc:l_discount_in_0_0.1")
    assert(dcDisc.getLong(3) === 0L && dcDisc.getBoolean(6))
    // corpus: brute-force recount of every rule over collected rows
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val real = ProfileOps.constraintAudit(li).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = li.selectExpr("l_orderkey", "l_linenumber", "l_returnflag",
      "l_partkey", "l_suppkey", "l_quantity", "l_discount").collect()
    def fdCheck(name: String, lhs: Row => Any, rhs: Row => Any): Unit = {
      val groups = rows.groupBy(lhs)
      val violated = groups.filter(_._2.map(rhs).distinct.length > 1)
      val r = real(name)
      assert(r.getLong(1) === groups.size.toLong, name)
      assert(r.getLong(2) === violated.size.toLong, name)
      assert(r.getLong(3) === violated.values.map(_.length.toLong).sum, name)
      assert(r.getLong(4) === rows.length.toLong, name)
    }
    fdCheck("fd:l_orderkey->l_returnflag", r => r.getLong(0), r => r.getString(2))
    fdCheck("fd:l_partkey->l_suppkey", r => r.getLong(3), r => r.getLong(4))
    val pkGroups = rows.groupBy(r => (r.getLong(0), r.getInt(1)))
    val pkViol = pkGroups.filter(_._2.length > 1)
    val k = real("key:l_orderkey,l_linenumber")
    assert(k.getLong(1) === pkGroups.size.toLong)
    assert(k.getLong(2) === pkViol.size.toLong)
    assert(k.getLong(3) === pkViol.values.map(_.length.toLong).sum)
    assert(real("dc:l_quantity_in_1_50").getLong(3) ===
      rows.count(r => r.getDouble(5) < 1 || r.getDouble(5) > 50).toLong)
    assert(real("dc:l_discount_in_0_0.1").getLong(3) ===
      rows.count(r => r.getDouble(6) < 0 || r.getDouble(6) > 0.1).toLong)
    // the graded report must carry BOTH verdicts on the real corpus
    assert(real.values.exists(_.getBoolean(6)) &&
      real.values.exists(!_.getBoolean(6)),
      "rule book must show holds AND fails on the corpus")
    val reparted = ProfileOps.constraintAudit(li.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === ProfileOps.constraintAudit(li).collect().map(_.toSeq).toSeq)
  }

  test("q206 drift census: a forced type shift drifts at exactly TVD 1, stationary features stay put; corpus is in-control") {
    val dayUs = 86400000000L
    // days 0,1 (period A): 4 clicks; days 2,3 (period B): 4 errors — the
    // event_type distributions are disjoint (TVD exactly 1.0); value and
    // hour identical across periods (TVD 0); one NULL value lands in the
    // '-1' cents bin on both sides
    val fix = (0 until 8).map { i =>
      (i.toLong, i.toLong / 2 * dayUs, if (i < 4) "click" else "error",
        if (i % 4 == 3) None else Some(50.0))
    }.toDF("event_id", "usv", "event_type", "value")
      .selectExpr("timestamp_micros(usv) AS ts", "event_id", "event_type",
        "value", "CAST(1 AS BIGINT) AS user_id")
    val fr = ProfileOps.driftCensus(fix).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(fr.size === 3)
    val et = fr("event_type")
    assert(et.getLong(4) === 1000000L && et.getBoolean(7) &&
      et.getString(5) === "error",
      "disjoint type distributions: TVD exactly 1, worst-bin tie broken to the larger key")
    assert(fr("cents_bin").getLong(4) === 0L && !fr("cents_bin").getBoolean(7),
      "identical value distributions (NULL bin included): zero distance")
    assert(fr("hour_of_day").getLong(4) === 0L)
    assert(fr("cents_bin").getLong(3) === 2L, "the NULL bin counts as a bin")
    // corpus: in-control at sf0.001 (the null-effect fact) + full replay
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val real = ProfileOps.driftCensus(events).collect()
    assert(real.length === 3 && real.forall(!_.getBoolean(7)),
      "a stationary corpus must not page the monitor")
    val w = graft.ops.SketchOps.HistBinCents
    val rows = events.selectExpr("unix_micros(ts)", "event_type",
        "CASE WHEN value IS NULL THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(round(value * 100) AS BIGINT) END")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val days = rows.map(_._1 / dayUs)
    val cut = days.min + (days.max - days.min + 1) / 2
    def fl(c: Long) = (c - (((c % w) + w) % w)) / w
    val feats = rows.flatMap { case (us, et2, cents) =>
      val inA = us / dayUs < cut
      Seq((inA, "event_type", Option(et2).getOrElse("<null>")),
        (inA, "cents_bin", cents.map(fl).getOrElse(-1L).toString),
        (inA, "hour_of_day", ((us / 3600000000L) % 24).toString))
    }
    val want = feats.groupBy(_._2).toSeq.sortBy(_._1).map { case (f, xs) =>
      val bins = xs.groupBy(_._3).map { case (v, ys) =>
        v -> (ys.count(_._1).toLong, ys.count(!_._1).toLong) }
      val nA = bins.valuesIterator.map(_._1).sum
      val nB = bins.valuesIterator.map(_._2).sum
      val devs = bins.toSeq.map { case (v, (na, nb)) =>
        (math.abs(na * nB - nb * nA), v) }
      val devSum = devs.map(_._1).sum
      val worst = devs.max
      (f, nA, nB, bins.size.toLong, 1000000L * devSum / (2 * nA * nB),
        worst._2, 1000000L * worst._1 / (2 * nA * nB))
    }
    assert(real.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getString(5), r.getLong(6))).toSeq === want)
    val reparted = ProfileOps.driftCensus(events.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q188/q189 on an EMPTY drop: profile reports emptiness, rules hold vacuously, no ANSI division throws") {
    val noOrders = handOrders.filter(lit(false))
    val prof = ProfileOps.columnProfile(noOrders).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size === ProfileOps.ProfileColumns.size)
    prof.values.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getLong(3) === 0L)
      assert(r.isNullAt(4) && r.isNullAt(5), "ratios of nothing are NULL, not DIV 0")
      assert(r.getBoolean(6), "0 = 0 = 0: vacuously unique")
    }
    val audit = ProfileOps.constraintAudit(handLineitem.filter(lit(false)))
      .collect()
    assert(audit.length === 5)
    audit.foreach { r =>
      assert(r.getLong(3) === 0L && r.getLong(4) === 0L, r.getString(0))
      assert(r.isNullAt(5) && r.getBoolean(6),
        s"${r.getString(0)}: vacuously held with a NULL price")
    }
  }

  test("q189 composition laws: per-shard audits MISS spanning violations; (lhs,rhs,cnt) partials compose exactly") {
    // two shards, each internally clean for fd:l_orderkey->l_returnflag,
    // but order 1 carries rf N in shard A and rf R in shard B — the
    // violation exists only in the union
    val shardA = Seq((1L, 100L, 7L, 1, 5.0, 0.05, "N"),
                     (2L, 101L, 8L, 1, 5.0, 0.05, "A"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_discount", "l_returnflag")
    val shardB = Seq((1L, 102L, 9L, 2, 5.0, 0.05, "R"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_discount", "l_returnflag")
    def fdRow(df: org.apache.spark.sql.DataFrame) =
      ProfileOps.constraintAudit(df).collect()
        .find(_.getString(0) == "fd:l_orderkey->l_returnflag").get
    assert(fdRow(shardA).getBoolean(6) && fdRow(shardB).getBoolean(6),
      "each shard alone must report the FD as holding")
    assert(!fdRow(shardA.unionByName(shardB)).getBoolean(6),
      "the union must surface the spanning violation — audits do not compose")
    // what DOES compose: the (lhs, rhs, cnt) partials. SUM per-shard
    // partials, re-collapse, and the whole-corpus audit falls out exactly
    // — the state a streamed audit maintainer would keep. Verified on the
    // real table across a 3-way split.
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("shard", expr("l_orderkey % 3"))
    val partials = (0 to 2).map(sh =>
      li.filter(col("shard") === sh)
        .groupBy("l_orderkey", "l_returnflag").agg(count(lit(1)).as("cnt")))
    val summed = partials.reduce(_ unionByName _)
      .groupBy("l_orderkey", "l_returnflag").agg(sum("cnt").as("cnt"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_rhs"), sum("cnt").as("rws"))
    val fromPartials = summed.agg(
      count(lit(1)).as("lhs_groups"),
      sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("violated_groups"),
      sum(when(col("n_rhs") > 1, col("rws")).otherwise(0L)).as("violating_rows"),
      sum("rws").as("total_rows")).collect().head
    val whole = fdRow(li.drop("shard"))
    assert(Seq(fromPartials.getLong(0), fromPartials.getLong(1),
      fromPartials.getLong(2), fromPartials.getLong(3)) ===
      Seq(whole.getLong(1), whole.getLong(2), whole.getLong(3), whole.getLong(4)),
      "SUM-recollapsed shard partials must equal the whole-corpus audit")
  }

  test("q212 table diff: category counts match the drift rule, drilldown matches fingerprints, conservation graded") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val rows = ProfileOps.tableDiff(orders).collect()
    val byCat = rows.map(r => r.getString(0) -> r).toMap
    assert(byCat.keySet === Set("changed", "equal", "only_in_a", "only_in_b"),
      "the drift rule must surface all four diff categories on the corpus")
    assert(rows.forall(_.getBoolean(9)), "conservation laws must grade true")
    // driver recount of the derivation rule, bucket by bucket
    val bCounts = orders.selectExpr(
        """CAST(conv(substring(md5(concat('rc:', CAST(o_orderkey AS STRING))),
           1, 2), 16, 10) AS BIGINT) % 16 AS rb""")
      .groupBy("rb").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val total = orders.count()
    def n(cat: String) = byCat(cat).getLong(1)
    assert(n("only_in_a") === bCounts(0L), "dropped rows = bucket 0")
    assert(n("only_in_b") === bCounts(3L), "inserted rows = bucket 3")
    assert(n("changed") === bCounts(1L) + bCounts(2L),
      "changed rows = price-shift + status-corrupt buckets")
    assert(n("equal") === total - bCounts(0L) - bCounts(1L) - bCounts(2L))
    // the per-column drilldown must agree with the fingerprint verdict:
    // bucket 1 changes exactly the price, bucket 2 exactly the status
    val ch = byCat("changed")
    assert(ch.getLong(4) === bCounts(1L), "price mismatches = bucket 1")
    assert(ch.getLong(3) === bCounts(2L), "status mismatches = bucket 2")
    assert(ch.getLong(2) === 0L && ch.getLong(5) === 0L && ch.getLong(6) === 0L,
      "untouched columns must show zero mismatches")
    // equal/only_in rows carry no column mismatches at all
    for (cat <- Seq("equal", "only_in_a", "only_in_b"); i <- 2 to 6)
      assert(byCat(cat).getLong(i) === 0L, s"$cat drilldown col $i nonzero")
    // partitioning invariance of the whole census
    val reparted = ProfileOps.tableDiff(orders.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q212 fingerprint: EVERY column is null-sentineled — rows differing only in WHICH numeric column is null must not collide") {
    import spark.implicits._
    // same key, same everything except: row A has a null price, row B a
    // null date (with the other column carrying the same rendered text).
    // concat_ws silently SKIPS nulls, so without the numeric sentinels
    // both rows would render 'c|s|42|p' and collide into one fingerprint
    // — the exact collision the diffCanon sentinels exist to prevent.
    val canon = Seq(
      (1L, "c", "s", Option.empty[Long], Option(42L), "p"),
      (1L, "c", "s", Option(42L), Option.empty[Long], "p"))
      .toDF("k", "c_cust", "c_status", "c_price", "c_date", "c_prio")
    val fps = ProfileOps.withFp(canon).select("fp").collect().map(_.getString(0))
    assert(fps(0) !== fps(1),
      "null-price and null-date rows collided into one fingerprint")
    // and the sentinel is stable: a genuinely identical row pair agrees
    val same = Seq(
      (1L, "c", "s", Option.empty[Long], Option(42L), "p"),
      (2L, "c", "s", Option.empty[Long], Option(42L), "p"))
      .toDF("k", "c_cust", "c_status", "c_price", "c_date", "c_prio")
    val sf = ProfileOps.withFp(same).select("fp").collect().map(_.getString(0))
    assert(sf(0) === sf(1), "identical canonical rows must share a fingerprint")
  }
}

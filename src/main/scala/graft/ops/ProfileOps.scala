package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the constraint-suggestion surface a curation
  * pipeline runs BEFORE trusting a new drop of data (the Deequ /
  * Great-Expectations operator class). The reference hard-codes its one
  * data-quality rule (the null-guard on parsed transactions,
  * TransactionProcessor.java:33 — drop what fails to parse); a production
  * engine first has to DISCOVER which rules a table supports, which is
  * exactly what these two reports feed: per-column completeness /
  * distinctness / uniqueness (q188) and candidate key + functional-
  * dependency + denial-constraint audits with exact violation counts
  * (q189).
  *
  * Both are built to the repo's exactness discipline: every shipped
  * number is an exact BIGINT count or a micro-scaled integer ratio
  * (`1e6·x DIV y` — no IEEE division can drift the hash), and every
  * corpus-scale pass is map-combinable.
  */
object ProfileOps {

  /** q212's dials: the synthetic-insert key offset (far above any real
    * orderkey) and the 16-way drift bucket rule. The "migrated copy" is
    * DERIVED inside the query by one md5 rule both engines share —
    * bucket 0 rows are dropped (only_in_a), bucket 1 rows shift price by
    * one exact cent, bucket 2 rows corrupt the status, bucket 3 rows
    * additionally appear under an offset key (only_in_b); everything
    * else migrates clean. Perturbations happen in the CANONICAL integer/
    * string domain (cents + 1, not price + 0.01 — IEEE addition would
    * not replicate across engines). */
  val DiffKeyOffset = 1000000000000L
  private val DiffBucket =
    "CAST(conv(substring(md5(concat('rc:', CAST(k AS STRING))), 1, 2), 16, 10) AS BIGINT) % 16"

  /** The canonical row image both diff sides hash: every column rendered
    * to an exact integer or string (cents, epoch micros) so the
    * fingerprint is engine-stable. NULLs sentineled BEFORE concat_ws
    * (which silently skips nulls — two rows differing only in which
    * column is null would otherwise collide). */
  private def diffCanon(orders: DataFrame): DataFrame =
    orders.selectExpr("o_orderkey AS k",
      "COALESCE(CAST(o_custkey AS STRING), '<null>') AS c_cust",
      "COALESCE(o_orderstatus, '<null>') AS c_status",
      "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c_price",
      // o_orderdate is parquet TIMESTAMP(MICROS, ntz) → Spark NTZ; the
      // cast to session-TZ timestamp is value-preserving under the UTC
      // session every entrypoint enforces (the Tables.events discipline)
      "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS c_date",
      "COALESCE(o_orderpriority, '<null>') AS c_prio")

  // EVERY column is sentineled, the numeric ones via COALESCE(CAST(...))
  // — concat_ws silently SKIPS nulls, so a bare cast that becomes NULL
  // would make two rows differing only in WHICH of price/date is null
  // collide into one fingerprint (the very collision diffCanon's string
  // sentinels exist to prevent). NOT NULL on TPC-H, latent for any other
  // table wired through tableDiff.
  private[graft] def withFp(side: DataFrame): DataFrame =
    side.selectExpr("k", "c_cust", "c_status", "c_price", "c_date", "c_prio",
      """md5(concat_ws('|', c_cust, c_status,
                       COALESCE(CAST(c_price AS STRING), '<null>'),
                       COALESCE(CAST(c_date AS STRING), '<null>'),
                       c_prio)) AS fp""",
      "1 AS present")

  /** q212 — TABLE RECONCILIATION (migration validation): the row-level
    * diff census a team runs after any copy/migration/backfill — which
    * keys exist only in the source, only in the target, changed, or
    * survived intact, with per-column mismatch counts and the
    * conservation laws that prove the census itself is complete
    * (only_in_a + changed + equal = |A|, and the B twin).
    *
    * Scale shape — the part that matters at 100 TB: each side collapses
    * to (key, row-fingerprint) ROW-LOCALLY (the canonical rendering and
    * md5 fuse into the scan), so the diff is ONE co-keyed full-outer
    * equi-join on the natural key — sort-merge on co-partitioned
    * bucketed tables, never a column-by-column join and never a
    * driver-side compare; the per-column drilldown touches only the
    * matched rows' already-joined canonical columns, and the census is
    * one map-combinable aggregate over a 4-value category domain.
    * Equality via the 128-bit fingerprint is one comparison per key
    * pair regardless of schema width. */
  def tableDiff(orders: DataFrame): DataFrame = {
    val (a, b) = tableDiffSides(orders)
    tableDiffFromSides(a, b)
  }

  /** q212's categorized diff join pre-aggregation — the corpus-scale
    * stage, exposed for the `PlanShapeSpec` guard (the shipped query
    * checkpoints the 4-row census, which truncates the visible plan). */
  private[graft] def tableDiffJoined(a: DataFrame, b: DataFrame): DataFrame =
    a.as("a").join(b.as("b"), col("a.k") === col("b.k"), "full_outer")
      .selectExpr(
        """CASE WHEN b.present IS NULL THEN 'only_in_a'
                WHEN a.present IS NULL THEN 'only_in_b'
                WHEN a.fp = b.fp THEN 'equal'
                ELSE 'changed' END AS category""",
        "CASE WHEN a.c_cust   <> b.c_cust   THEN 1L ELSE 0L END AS m_cust",
        "CASE WHEN a.c_status <> b.c_status THEN 1L ELSE 0L END AS m_status",
        "CASE WHEN a.c_price  <> b.c_price  THEN 1L ELSE 0L END AS m_price",
        "CASE WHEN a.c_date   <> b.c_date   THEN 1L ELSE 0L END AS m_date",
        "CASE WHEN a.c_prio   <> b.c_prio   THEN 1L ELSE 0L END AS m_prio")

  /** q212's diff-side entry for the plan guard: (a, b) fingerprinted
    * canonical sides for ANY orders frame. */
  private[graft] def tableDiffSides(orders: DataFrame): (DataFrame, DataFrame) = {
    val a = withFp(diffCanon(orders))
    val b0 = diffCanon(orders).withColumn("rb", expr(DiffBucket))
    val bKept = b0.filter("rb <> 0").selectExpr("k", "c_cust",
      "CASE WHEN rb = 2 THEN 'X' ELSE c_status END AS c_status",
      "c_price + CASE WHEN rb = 1 THEN 1 ELSE 0 END AS c_price",
      "c_date", "c_prio")
    val bIns = b0.filter("rb = 3").selectExpr(s"k + $DiffKeyOffset AS k",
      "c_cust", "c_status", "c_price", "c_date", "c_prio")
    (a, withFp(bKept.unionByName(bIns)))
  }

  /** Shared census tail for q212 (live sides) and q224 (bucketed-table
    * sides): the caller picks the storage layout, the algebra is one
    * definition — so the bucketed path can't drift from the graded live
    * one. */
  private[graft] def tableDiffFromSides(a: DataFrame, b: DataFrame): DataFrame = {
    val j = tableDiffJoined(a, b)
    val perCat = j.groupBy("category").agg(
        count(lit(1)).as("n_keys"),
        coalesce(sum("m_cust"), lit(0L)).as("mism_cust"),
        coalesce(sum("m_status"), lit(0L)).as("mism_status"),
        coalesce(sum("m_price"), lit(0L)).as("mism_price"),
        coalesce(sum("m_date"), lit(0L)).as("mism_date"),
        coalesce(sum("m_prio"), lit(0L)).as("mism_prio"))
      // ≤ 4 rows, but consumed twice (the shipped rows AND the
      // conservation laws) — without this the corpus-scale full-outer
      // join executes twice (plan-guarded in PlanShapeSpec)
      .localCheckpoint()
    val recon = perCat.agg(
      sum(when(col("category") =!= "only_in_b", col("n_keys")).otherwise(0L))
        .as("na_rec"),
      sum(when(col("category") =!= "only_in_a", col("n_keys")).otherwise(0L))
        .as("nb_rec"))
    val laws = recon
      .crossJoin(broadcast(a.agg(count(lit(1)).as("n_a"))))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
      .selectExpr("n_a", "n_b",
        "na_rec = n_a AND nb_rec = n_b AS conservation_ok")
    perCat.crossJoin(broadcast(laws)).orderBy("category")
  }

  /** q188's subject columns (orders). ONE definition drives the Spark
    * aggregate, the stack unpivot, and the DuckDB oracle — a drift here
    * would silently desync the sides. */
  val ProfileColumns: Seq[String] = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** q188 — COLUMN PROFILE: for every column of `orders`, row count,
    * non-null count, exact distinct count, micro-scaled completeness
    * (non-null/rows) and distinctness (distinct/non-null), and the
    * uniqueness verdict (`n_distinct = n_nonnull = n_rows`) — the row a
    * profiler turns into "suggest NOT NULL / suggest UNIQUE".
    *
    * Scale shape: ONE pass over the table. The multi-column exact
    * distinct plans as Spark's Expand strategy (rows fan out ×(k+1) for
    * k distinct-columns, then collapse map-combinably BEFORE the single
    * exchange to one row) — the same shape a hand-built per-column
    * (value, count) collapse would reach, without k separate jobs. The
    * unpivot to one row per column is driver-free (`stack` over the
    * 1-row aggregate). */
  def columnProfile(orders: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      ProfileColumns.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")))
    val stacked = ProfileColumns
      .map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    orders.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${ProfileColumns.size}, $stacked) AS (column_name, n_nonnull, n_distinct)")
      .selectExpr("column_name", "n_rows", "n_nonnull", "n_distinct",
        // an empty drop must PROFILE as empty, not throw: ANSI division
        // guards on both engines (the q174 zero-width-interval class)
        """CASE WHEN n_rows = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(1000000 AS BIGINT) * n_nonnull DIV n_rows
           END AS completeness_micro""",
        """CASE WHEN n_nonnull = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(1000000 AS BIGINT) * n_distinct DIV n_nonnull
           END AS distinctness_micro""",
        "n_distinct = n_nonnull AND n_nonnull = n_rows AS is_unique")
      .orderBy("column_name")
  }

  /** q189's rule book over `lineitem`: a candidate key, two candidate
    * functional dependencies, and two denial (row-local range)
    * constraints — chosen so the graded report carries BOTH verdicts on
    * the real corpus (the key and FDs fail, the ranges hold; a profile
    * that can only say "pass" proves nothing). */
  val KeyRule: (String, Seq[String]) =
    ("key:l_orderkey,l_linenumber" -> Seq("l_orderkey", "l_linenumber"))
  val FdRules: Seq[(String, Seq[String], String)] = Seq(
    ("fd:l_orderkey->l_returnflag", Seq("l_orderkey"), "l_returnflag"),
    ("fd:l_partkey->l_suppkey", Seq("l_partkey"), "l_suppkey"))
  val DcRules: Seq[(String, String)] = Seq(
    ("dc:l_quantity_in_1_50", "l_quantity >= 1 AND l_quantity <= 50"),
    ("dc:l_discount_in_0_0.1", "l_discount >= 0 AND l_discount <= 0.1"))

  /** q189 — CONSTRAINT AUDIT: one row per candidate rule with exact
    * violation counts. A key rule counts duplicate-key groups and the
    * rows inside them; an FD `X → Y` counts LHS groups holding more than
    * one distinct RHS and the rows they cover; a denial constraint
    * counts rows failing a row-local predicate. `holds` is the verdict a
    * schema-inference layer consumes; `violation_micro` prices how far
    * from holding the rule is.
    *
    * Scale shape: each key/FD rule is the two-level skew-proof collapse —
    * `groupBy(lhs, rhs)` first (map-combinable; no LHS group ever gathers
    * raw rows), then the bounded per-LHS table folds to ONE summary row.
    * NULL is audited as a value (groupBy keeps it on both engines).
    * Denial rules are a single map-side conditional count. The union of
    * five one-row frames is driver-free and constant-sized. */
  def constraintAudit(lineitem: DataFrame): DataFrame = {
    def summarize(perLhs: DataFrame, name: String): DataFrame =
      perLhs.agg(
        count(lit(1)).as("lhs_groups"),
        // coalesce: SUM over zero groups is NULL, but an empty table has
        // exactly zero violations and zero rows — report that, loudly typed
        coalesce(sum(when(col("n_rhs") > 1, 1L).otherwise(0L)), lit(0L))
          .as("violated_groups"),
        coalesce(sum(when(col("n_rhs") > 1, col("rws")).otherwise(0L)), lit(0L))
          .as("violating_rows"),
        coalesce(sum("rws"), lit(0L)).as("total_rows"))
        .selectExpr(s"'$name' AS rule", "lhs_groups", "violated_groups",
          "violating_rows", "total_rows")
    val key = {
      val (name, ks) = KeyRule
      summarize(
        lineitem.groupBy(ks.map(col): _*).agg(count(lit(1)).as("rws"))
          .withColumn("n_rhs", col("rws")), // a key group violates iff it holds >1 row
        name)
    }
    val fds = FdRules.map { case (name, lhs, rhs) =>
      summarize(
        lineitem.groupBy((lhs :+ rhs).map(col): _*).agg(count(lit(1)).as("cnt"))
          .groupBy(lhs.map(col): _*)
          .agg(count(lit(1)).as("n_rhs"), sum("cnt").as("rws")),
        name)
    }
    val dcs = DcRules.map { case (name, pred) =>
      lineitem.agg(
        coalesce(sum(when(expr(s"NOT ($pred)"), 1L).otherwise(0L)), lit(0L))
          .as("violating_rows"),
        count(lit(1)).as("total_rows"))
        .selectExpr(s"'$name' AS rule", "CAST(NULL AS BIGINT) AS lhs_groups",
          "CAST(NULL AS BIGINT) AS violated_groups", "violating_rows", "total_rows")
    }
    (Seq(key) ++ fds ++ dcs).reduce(_ unionByName _)
      .selectExpr("rule", "lhs_groups", "violated_groups", "violating_rows",
        "total_rows",
        // empty-table guard: zero rows means nothing to violate — every
        // rule reports vacuously held with a NULL price, never DIV 0
        """CASE WHEN total_rows = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(1000000 AS BIGINT) * violating_rows DIV total_rows
           END AS violation_micro""",
        "violating_rows = 0 AS holds")
      .orderBy("rule")
  }

  /** q206's drift dial: a feature drifts when the two periods'
    * distributions sit more than 0.15 total-variation apart (floor'd
    * micro) — the alarm a table-monitoring service pages on, sized
    * above the fine-binned features' sampling noise at the smallest
    * graded corpus (hour-of-day reaches 0.107 TVD at n = 1000 with 24
    * bins — noise, not drift) so the in-control verdict is a stable
    * fact at every scale. */
  val DriftTvdMicro = 150000L

  /** q206 — TABULAR DRIFT CENSUS: the table monitor an ML-ops service
    * runs between data drops — "has this feature's distribution moved?"
    * — q127 asks it of the embedding space; this asks it of the tabular
    * features a model consumes. The corpus splits at the midpoint day
    * into periods A and B (the drop-over-drop comparison), and each
    * monitored feature (event type; cents in the shared q156 bins;
    * hour-of-day) ships its exact total-variation distance between the
    * periods, cross-multiplied integers as q205 — `Σ_v |na·N_B − nb·N_A|
    * DIV (2·N_A·N_B)` over the union of observed values, so values
    * present in only one period contribute their full one-sided mass —
    * the worst bin (deterministic struct-max tiebreak), and the drift
    * verdict. On this stationary corpus the monitor correctly reports
    * no drift at every scale — the null-effect fact, graded like
    * q168's; the spec forces a real shift through a hand fixture and
    * watches the verdict flip. At 10¹²-row drops the cross-multiplies
    * outgrow int64 — production lifts them to DECIMAL(38,0); at graded
    * scales ANSI overflows loudly if that headroom ever goes.
    *
    * Scale shape: ONE corpus pass fans each row to its 3 (feature,
    * value) pairs row-locally (the q203 bounded explode), one
    * map-combinable collapse to the bounded (feature, value, na, nb)
    * table, and per-feature aggregates over that bounded table. */
  /** The row-local (in_a?, feature, value_key) fan-out shared by batch
    * q206 and [[graft.streaming.StreamDrift]]'s per-batch collapse. When
    * `cutExpr` is None every row is "live" (in_a = false) — the
    * streamed side has no midpoint; its reference is an artifact. */
  private[graft] def driftPairs(events: DataFrame,
                                cutExpr: Option[String]): DataFrame = {
    val w = SketchOps.HistBinCents
    val dayUs = 86400000000L
    val base = cutExpr match {
      case Some(cut) =>
        val anchor = events.agg(
          min(expr(s"unix_micros(ts) DIV $dayUs")).as("d0"),
          max(expr(s"unix_micros(ts) DIV $dayUs")).as("d1"))
        events.crossJoin(broadcast(anchor)).selectExpr(s"$cut AS in_a",
          "event_type", "value", "ts")
      case None => events.selectExpr("false AS in_a", "event_type", "value", "ts")
    }
    base.selectExpr("in_a",
        "event_type",
        "CASE WHEN value IS NULL THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST(round(value * 100) AS BIGINT) END AS cents",
        s"(unix_micros(ts) DIV 3600000000) % 24 AS hod")
      .selectExpr("in_a",
        """stack(3,
             'event_type', coalesce(event_type, '<null>'),
             'cents_bin',  CAST(coalesce((cents - (((cents % """ + w +
          s""") + $w) % $w)) DIV $w, -1) AS STRING),
             'hour_of_day', CAST(hod AS STRING)) AS (feature, value_key)""")
  }

  /** The drift ledger off a collapsed (feature, value_key, na, nb) bin
    * table — shared verbatim by batch q206 and the streamed posture, so
    * the two cannot drift (pun intended). */
  private[graft] def driftRender(binned0: DataFrame): DataFrame = {
    val binned = binned0.localCheckpoint() // bounded; read by totals + devs
    val tot = binned.groupBy("feature")
      .agg(sum("na").as("n_a"), sum("nb").as("n_b"),
        count(lit(1)).as("n_bins"))
    val dev = binned.join(broadcast(tot), "feature")
      .groupBy("feature")
      .agg(sum(abs(col("na") * col("n_b") - col("nb") * col("n_a")))
          .as("dev_sum"),
        max(struct(abs(col("na") * col("n_b") - col("nb") * col("n_a"))
          .as("dev"), col("value_key").as("value_key"))).as("worst"))
    tot.join(broadcast(dev), "feature")
      .selectExpr("feature", "n_a", "n_b", "n_bins",
        // empty-period guard (the q188 drop class): a single-day corpus
        // has no drop to compare — NULL distance, never DIV 0
        """CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS BIGINT)
                ELSE 1000000 * dev_sum DIV (2 * n_a * n_b) END AS tvd_micro""",
        "worst.value_key AS worst_bin",
        """CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS BIGINT)
                ELSE 1000000 * worst.dev DIV (2 * n_a * n_b)
           END AS worst_bin_micro""")
      .selectExpr("feature", "n_a", "n_b", "n_bins", "tvd_micro",
        "worst_bin", "worst_bin_micro",
        s"coalesce(tvd_micro > $DriftTvdMicro, false) AS drifted")
      .orderBy("feature")
  }

  def driftCensus(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    driftRender(
      driftPairs(events,
        Some(s"unix_micros(ts) DIV $dayUs < d0 + (d1 - d0 + 1) DIV 2"))
        .groupBy("feature", "value_key")
        .agg(count(when(col("in_a"), 1)).as("na"),
          count(when(!col("in_a"), 1)).as("nb")))
  }

  def oracles: Map[String, String] = {
    val profSelects = ProfileColumns.map { c =>
      s"""SELECT '$c' AS column_name, n_rows,
                 nn_$c AS n_nonnull, nd_$c AS n_distinct FROM s"""
    }.mkString(" UNION ALL ")
    val profAggs = ProfileColumns.map { c =>
      s"""CAST(COUNT($c) AS BIGINT) AS nn_$c,
          CAST(COUNT(DISTINCT $c) AS BIGINT) AS nd_$c"""
    }.mkString(", ")
    val keySql = {
      val (name, ks) = KeyRule
      s"""SELECT '$name' AS rule,
                 CAST(COUNT(*) AS BIGINT) AS lhs_groups,
                 CAST(COALESCE(SUM(CASE WHEN rws > 1 THEN 1 END), 0) AS BIGINT)
                   AS violated_groups,
                 CAST(COALESCE(SUM(CASE WHEN rws > 1 THEN rws END), 0) AS BIGINT)
                   AS violating_rows,
                 CAST(COALESCE(SUM(rws), 0) AS BIGINT) AS total_rows
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS rws FROM lineitem
                GROUP BY ${ks.mkString(", ")})"""
    }
    val fdSqls = FdRules.map { case (name, lhs, rhs) =>
      s"""SELECT '$name' AS rule,
                 CAST(COUNT(*) AS BIGINT) AS lhs_groups,
                 CAST(COALESCE(SUM(CASE WHEN n_rhs > 1 THEN 1 END), 0) AS BIGINT)
                   AS violated_groups,
                 CAST(COALESCE(SUM(CASE WHEN n_rhs > 1 THEN rws END), 0) AS BIGINT)
                   AS violating_rows,
                 CAST(COALESCE(SUM(rws), 0) AS BIGINT) AS total_rows
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_rhs,
                       CAST(SUM(cnt) AS BIGINT) AS rws
                FROM (SELECT ${(lhs :+ rhs).mkString(", ")},
                             CAST(COUNT(*) AS BIGINT) AS cnt
                      FROM lineitem GROUP BY ${(lhs :+ rhs).mkString(", ")})
                GROUP BY ${lhs.mkString(", ")})"""
    }
    val dcSqls = DcRules.map { case (name, pred) =>
      s"""SELECT '$name' AS rule,
                 CAST(NULL AS BIGINT) AS lhs_groups,
                 CAST(NULL AS BIGINT) AS violated_groups,
                 CAST(COALESCE(SUM(CASE WHEN NOT ($pred) THEN 1 END), 0) AS BIGINT)
                   AS violating_rows,
                 CAST(COUNT(*) AS BIGINT) AS total_rows
          FROM lineitem"""
    }
    Map(
      // q212: identical canonical rendering (cents/micros/sentinels),
      // the same md5 drift rule ('0x'-prefix cast ≡ Spark's conv), the
      // same fingerprint concat, one full-outer diff, and the same
      // conservation laws; every SUM cast (DuckDB sums to HUGEINT)
      "q212_table_diff" ->
        s"""WITH a0 AS (SELECT o_orderkey AS k,
                               COALESCE(CAST(o_custkey AS VARCHAR), '<null>') AS c_cust,
                               COALESCE(o_orderstatus, '<null>') AS c_status,
                               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c_price,
                               epoch_us(o_orderdate) AS c_date,
                               COALESCE(o_orderpriority, '<null>') AS c_prio
                        FROM orders),
              b0 AS (SELECT *, ('0x' || substr(md5('rc:' || CAST(k AS VARCHAR)),
                                               1, 2))::BIGINT % 16 AS rb
                     FROM a0),
              b1 AS (SELECT k, c_cust,
                            CASE WHEN rb = 2 THEN 'X' ELSE c_status END AS c_status,
                            c_price + CASE WHEN rb = 1 THEN 1 ELSE 0 END AS c_price,
                            c_date, c_prio
                     FROM b0 WHERE rb <> 0
                     UNION ALL
                     SELECT k + $DiffKeyOffset, c_cust, c_status, c_price,
                            c_date, c_prio
                     FROM b0 WHERE rb = 3),
              af AS (SELECT *, md5(concat_ws('|', c_cust, c_status,
                               COALESCE(CAST(c_price AS VARCHAR), '<null>'),
                               COALESCE(CAST(c_date AS VARCHAR), '<null>'),
                               c_prio)) AS fp, 1 AS present FROM a0),
              bf AS (SELECT *, md5(concat_ws('|', c_cust, c_status,
                               COALESCE(CAST(c_price AS VARCHAR), '<null>'),
                               COALESCE(CAST(c_date AS VARCHAR), '<null>'),
                               c_prio)) AS fp, 1 AS present FROM b1),
              j AS (SELECT CASE WHEN bf.present IS NULL THEN 'only_in_a'
                                WHEN af.present IS NULL THEN 'only_in_b'
                                WHEN af.fp = bf.fp THEN 'equal'
                                ELSE 'changed' END AS category,
                           CASE WHEN af.c_cust   <> bf.c_cust   THEN 1 ELSE 0 END AS m_cust,
                           CASE WHEN af.c_status <> bf.c_status THEN 1 ELSE 0 END AS m_status,
                           CASE WHEN af.c_price  <> bf.c_price  THEN 1 ELSE 0 END AS m_price,
                           CASE WHEN af.c_date   <> bf.c_date   THEN 1 ELSE 0 END AS m_date,
                           CASE WHEN af.c_prio   <> bf.c_prio   THEN 1 ELSE 0 END AS m_prio
                    FROM af FULL OUTER JOIN bf ON af.k = bf.k),
              pc AS (SELECT category, CAST(COUNT(*) AS BIGINT) AS n_keys,
                            CAST(COALESCE(SUM(m_cust), 0) AS BIGINT) AS mism_cust,
                            CAST(COALESCE(SUM(m_status), 0) AS BIGINT) AS mism_status,
                            CAST(COALESCE(SUM(m_price), 0) AS BIGINT) AS mism_price,
                            CAST(COALESCE(SUM(m_date), 0) AS BIGINT) AS mism_date,
                            CAST(COALESCE(SUM(m_prio), 0) AS BIGINT) AS mism_prio
                     FROM j GROUP BY category),
              laws AS (SELECT
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM a0) AS n_a,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM b1) AS n_b,
                         CAST(SUM(CASE WHEN category <> 'only_in_b'
                                       THEN n_keys ELSE 0 END) AS BIGINT) AS na_rec,
                         CAST(SUM(CASE WHEN category <> 'only_in_a'
                                       THEN n_keys ELSE 0 END) AS BIGINT) AS nb_rec
                       FROM pc)
         SELECT category, n_keys, mism_cust, mism_status, mism_price,
                mism_date, mism_prio, n_a, n_b,
                na_rec = n_a AND nb_rec = n_b AS conservation_ok
         FROM pc CROSS JOIN laws ORDER BY category""",
      // q206: identical midpoint cut, the same 3-feature stack (UNION
      // ALL), the same cross-multiplied TVD with the struct-max worst
      // bin and the empty-period guard
      "q206_drift_census" -> {
        val w = SketchOps.HistBinCents
        s"""WITH a AS (SELECT MIN(epoch_us(ts) // 86400000000) AS d0,
                              MAX(epoch_us(ts) // 86400000000) AS d1
                       FROM events),
              base AS (SELECT epoch_us(ts) // 86400000000
                                < d0 + (d1 - d0 + 1) // 2 AS in_a,
                              event_type,
                              CASE WHEN value IS NULL THEN CAST(NULL AS BIGINT)
                                   ELSE CAST(ROUND(value * 100) AS BIGINT) END AS cents,
                              (epoch_us(ts) // 3600000000) % 24 AS hod
                       FROM events CROSS JOIN a),
              pr AS (SELECT in_a, 'event_type' AS feature,
                            COALESCE(event_type, '<null>') AS value_key FROM base
                     UNION ALL
                     SELECT in_a, 'cents_bin',
                            CAST(COALESCE((cents - (((cents % $w) + $w) % $w)) // $w,
                                          -1) AS VARCHAR) FROM base
                     UNION ALL
                     SELECT in_a, 'hour_of_day', CAST(hod AS VARCHAR) FROM base),
              binned AS (SELECT feature, value_key,
                                CAST(COUNT(CASE WHEN in_a THEN 1 END) AS BIGINT) AS na,
                                CAST(COUNT(CASE WHEN NOT in_a THEN 1 END) AS BIGINT) AS nb
                         FROM pr GROUP BY 1, 2),
              tot AS (SELECT feature, CAST(SUM(na) AS BIGINT) AS n_a,
                             CAST(SUM(nb) AS BIGINT) AS n_b,
                             CAST(COUNT(*) AS BIGINT) AS n_bins
                      FROM binned GROUP BY 1),
              dv AS (SELECT b.feature AS feature,
                            CAST(SUM(abs(na * n_b - nb * n_a)) AS BIGINT) AS dev_sum,
                            MAX({'dev': abs(na * n_b - nb * n_a),
                                 'value_key': value_key}) AS worst
                     FROM binned b JOIN tot t ON b.feature = t.feature
                     GROUP BY 1)
         SELECT t.feature AS feature, n_a, n_b, n_bins,
                CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS BIGINT)
                     ELSE CAST(1000000 * dev_sum // (2 * n_a * n_b) AS BIGINT)
                END AS tvd_micro,
                worst.value_key AS worst_bin,
                CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS BIGINT)
                     ELSE CAST(1000000 * worst.dev // (2 * n_a * n_b) AS BIGINT)
                END AS worst_bin_micro,
                COALESCE(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                              ELSE 1000000 * dev_sum // (2 * n_a * n_b)
                                     > $DriftTvdMicro END, false) AS drifted
         FROM tot t JOIN dv ON t.feature = dv.feature
         ORDER BY t.feature"""
      },
      "q188_data_profile" ->
        s"""WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, $profAggs
                       FROM orders)
            SELECT column_name, n_rows, n_nonnull, n_distinct,
                   CASE WHEN n_rows = 0 THEN CAST(NULL AS BIGINT)
                        ELSE CAST(1000000 AS BIGINT) * n_nonnull // n_rows
                   END AS completeness_micro,
                   CASE WHEN n_nonnull = 0 THEN CAST(NULL AS BIGINT)
                        ELSE CAST(1000000 AS BIGINT) * n_distinct // n_nonnull
                   END AS distinctness_micro,
                   n_distinct = n_nonnull AND n_nonnull = n_rows AS is_unique
            FROM ($profSelects) ORDER BY column_name""",
      "q189_constraint_audit" ->
        s"""SELECT rule, lhs_groups, violated_groups, violating_rows, total_rows,
                   CASE WHEN total_rows = 0 THEN CAST(NULL AS BIGINT)
                        ELSE CAST(1000000 AS BIGINT) * violating_rows // total_rows
                   END AS violation_micro,
                   violating_rows = 0 AS holds
            FROM ($keySql UNION ALL ${(fdSqls ++ dcSqls).mkString(" UNION ALL ")})
            ORDER BY rule""")
  }

  /** q224 shares q212's oracle SQL VERBATIM: the bucketed layout is a
    * storage decision, not a semantics one, so grading it against the
    * identical relational definition IS the claim — the zero-Exchange
    * physical plan (guarded in SourceSinksSpec) returns exactly the rows
    * the shuffled plan does. */
  def oraclesWithBucketed: Map[String, String] = {
    val m = oracles
    m + ("q224_bucketed_diff" -> m("q212_table_diff"))
  }
}

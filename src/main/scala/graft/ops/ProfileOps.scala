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
}

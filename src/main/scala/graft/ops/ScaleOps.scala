package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling idioms for 100 TB runs, packaged as reusable transforms.
  *
  * At test scale these produce byte-identical results to their naive
  * counterparts (asserted in `ScaleOpsSpec`); at cluster scale they are the
  * difference between a straggler-free job and one task pinning an executor
  * for hours on a hot key (the events table's analog: one user producing a
  * large fraction of all transactions).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles many of
  * these cases automatically at runtime; these explicit forms are for the
  * planned-ahead cases AQE can't see (aggregation skew, and joins whose
  * skew is known from data profiling).
  */
object ScaleOps {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt) to
    * spread one hot key over `salts` reducers, then final-aggregate on key.
    * The salt is derived from a unique column (deterministic, testable —
    * never `rand()`, which breaks retry idempotency: a re-run task would
    * re-salt rows differently and double-count under speculative execution).
    *
    * Determinism contract: results are byte-identical to the naive
    * single-phase aggregate only when `sumCol` is an EXACT type (long /
    * integer cents per [[Exact]]) — double addition is non-associative, so
    * for raw doubles the two-phase sum may differ in the last ulp. Pass
    * `Exact.units(col, 2)` (or any integral column), divide at the end. */
  def saltedSumCount(df: DataFrame, key: String, uniqueCol: String,
                     sumCol: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(uniqueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(sumCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as("sum"), sum("__pcnt").as("n"))

  /** Skew-safe equi-join: salt the (big, skewed) probe side, replicate the
    * small build side across all `salts` copies, join on (key, salt). The
    * big side's hot key now lands on `salts` different reducers. Result is
    * row-identical to `big.join(small, key)` (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, uniqueCol: String,
                 salts: Int = 16): DataFrame = {
    // salt from a per-row unique column — hash(key) would map a hot key to
    // ONE salt (no spreading), and rand() breaks retry idempotency
    val saltedBig = big.withColumn("__salt", pmod(hash(col(uniqueCol)), lit(salts)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(key) === replicatedSmall(key) && saltedBig("__salt") === replicatedSmall("__salt"))
      .drop(replicatedSmall(key)).drop("__salt")
  }

  /** Pre-partition two tables identically so a later join is shuffle-free
    * on reuse (the dynamic analog of bucketed tables). */
  def coPartition(a: DataFrame, b: DataFrame, key: String,
                  partitions: Int): (DataFrame, DataFrame) =
    (a.repartition(partitions, col(key)), b.repartition(partitions, col(key)))

  /** q153 — JOIN-KEY SKEW AUDIT: for each (table, key) a join or
    * aggregation will hash on, the distribution evidence that decides
    * the physical plan — row/key counts, the hottest key's share, the
    * share of rows held by the top 1% of keys, and the coefficient of
    * variation of per-key counts. A max_share near 1 says one reducer
    * gets the table (salt it — [[saltedSumCount]]/[[saltedJoin]] are
    * the remedies this report triggers); a CV near 0 says hash
    * partitioning balances for free. This is the artifact a 100 TB
    * engine reads BEFORE picking shuffle keys, made a first-class
    * graded query.
    *
    * Scale shape: per audited key the corpus collapses ONCE
    * (map-combinable count per key), then AGAIN to the count-of-counts
    * table — bounded by the number of DISTINCT FREQUENCIES (≤ √(2·rows)
    * by the partition-number bound, and tiny in practice) — and every
    * metric is exact integer arithmetic on that bounded table: the
    * top-1% coverage walks the descending cumulative with exact partial
    * inclusion of the boundary class, never a per-key rank. Σc² runs in
    * DECIMAL(38,0)/HUGEINT (a 10⁹-row hot key squares past int64). CV
    * and shares are fixed-shape IEEE expressions of exact integers. */
  def keySkewAudit(tables: Seq[(String, String, DataFrame)]): DataFrame = {
    val per = tables.map { case (tbl, key, df) =>
      val counts = df.select(col(key).cast("string").as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
      val coc = counts.groupBy("c").agg(count(lit(1)).as("m"))
        .localCheckpoint() // bounded; consumed by totals + cumulative
      val totals = coc.agg(
        sum(expr("c * m")).as("n_rows"), sum("m").as("n_keys"),
        max("c").as("max_count"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c * m")).as("sum_c2"))
      // descending cumulative over frequency classes (bounded self-join,
      // the q108 idiom): rows covered by the top-k keys where
      // k = ceil(n_keys / 100), boundary class partially included
      val cum = coc.as("x")
        .join(broadcast(coc.as("y")), col("y.c") > col("x.c"), "left_outer")
        .groupBy(col("x.c").as("c"), col("x.m").as("m"))
        .agg(coalesce(sum(col("y.m")), lit(0L)).as("keys_above"),
          coalesce(sum(expr("y.c * y.m")), lit(0L)).as("rows_above"))
      val top = cum.crossJoin(broadcast(totals.select("n_keys")))
        .selectExpr("c", "m", "keys_above", "rows_above",
          "(n_keys + 99) DIV 100 AS target")
        .filter(col("keys_above") < col("target"))
        .selectExpr(
          """rows_above + least(m, target - keys_above) * c AS covered""",
          "least(m, target - keys_above) + keys_above AS used")
        .agg(max("covered").as("top1pct_rows"))
      totals.crossJoin(broadcast(top))
        .selectExpr(s"'$tbl' AS tbl", s"'$key' AS key",
          "n_rows", "n_keys", "max_count",
          "CAST(max_count AS DOUBLE) / CAST(n_rows AS DOUBLE) AS max_share",
          "top1pct_rows",
          "CAST(top1pct_rows AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top1pct_share",
          // CV = √(n_keys·Σc² − (Σc)²) / Σc  (population, exact operands)
          """CASE WHEN n_keys <= 1 THEN CAST(NULL AS DOUBLE)
                  ELSE sqrt(CAST(n_keys AS DECIMAL(38,0)) * sum_c2
                            - CAST(n_rows AS DECIMAL(38,0)) * n_rows + 0e0)
                       / CAST(n_rows AS DOUBLE)
             END AS cv""")
    }
    per.reduce(_ unionByName _).orderBy("tbl", "key")
  }
}

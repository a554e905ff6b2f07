package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequency-sketch operators: heavy hitters (frequent items) without
  * shuffling the full key universe.
  *
  * The reference's dashboards top-k by user (README.md:342-356 panel
  * queries) via a full group-by — fine when the key universe fits a
  * shuffle. At 100 TB the token/user universe can be billions of keys,
  * and the classic answer is a two-pass scheme:
  *
  *  1. a MERGEABLE Misra-Gries summary (Agarwal et al., "Mergeable
  *     Summaries", PODS 2012) reduces every partition to a fixed k-entry
  *     map, tree-merged by Spark's partial aggregation — the corpus is
  *     never shuffled, only k-entry summaries move;
  *  2. the ≤ k surviving candidates are exactly re-counted in one
  *     filtered scan (a ≤ k-key shuffle), so the OUTPUT is exact and
  *     deterministic even though the sketch's internal state is
  *     arrival-order-dependent.
  *
  * MG guarantee: with capacity k, any item with true count > n/(k+1)
  * survives pass 1 — so a threshold of n/t needs only k+1 > t, and false
  * positives are eliminated by the exact re-count. That makes q64
  * oracle-gradable with a PLAIN exact oracle (`HAVING count > n/t`), not
  * just a tolerance boolean: sketch recall is proven by the hash match.
  */
object SketchOps {

  /** Mergeable Misra-Gries summary with capacity `k`.
    *
    * reduce: hit → +1; miss with room → insert 1; miss when full →
    * decrement ALL by 1, drop zeros (the classic counter trade).
    * merge: sum the union, then if over capacity subtract the (k+1)-th
    * largest count from every entry and drop ≤ 0 — the mergeable-summaries
    * offset trick that preserves the n/(k+1) undercount bound. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Array[String]] {
    require(k > 0, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], token: String): Map[String, Long] =
      b.get(token) match {
        case Some(c) => b.updated(token, c + 1L)
        case None if b.size < k => b.updated(token, 1L)
        case None =>
          b.iterator.map { case (t, c) => (t, c - 1L) }
            .filter(_._2 > 0L).toMap
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val offset = sum.valuesIterator.toArray.sortBy(-_).apply(k)
        sum.iterator.map { case (t, c) => (t, c - offset) }
          .filter(_._2 > 0L).toMap
      }
    }

    // candidate set only — counts are sketch lower bounds, the exact
    // re-count pass supplies the real ones
    override def finish(b: Map[String, Long]): Array[String] = b.keys.toArray.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[String]] = ExpressionEncoder()
  }

  /** q64 — tokens carrying more than 1/`thresholdInv` of the corpus's
    * token mass, sketch-then-verify. Tokenization matches q52 (single-space
    * split). Requires `capacity + 1 > thresholdInv` or the MG recall
    * guarantee would not cover the threshold. */
  def heavyHitters(docs: DataFrame, capacity: Int = 64,
      thresholdInv: Int = 50): DataFrame = {
    require(capacity + 1 > thresholdInv,
      s"capacity $capacity cannot guarantee recall at threshold n/$thresholdInv")
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens = docs.select(explode(split(col("text"), " ")).as("token"))
    // pass 1: fixed-size summaries, tree-merged — no token shuffle
    // (typed select: a TypedColumn cannot ride the untyped API)
    val candidates = tokens.as[String]
      .select(new MisraGries(capacity).toColumn)
      .toDF("cands")
      .select(explode(col("cands")).as("token"))
    // pass 2: exact re-count of ≤ capacity candidates (tiny shuffle),
    // threshold against the exact total token count (1-row side joined on
    // a constant key — a broadcast hash join, not a cartesian)
    val total = tokens.agg(count(lit(1)).as("n_total")).withColumn("j", lit(1))
    tokens.join(broadcast(candidates), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("j", lit(1))
      .join(broadcast(total), "j")
      .filter(col("cnt").cast("double") > col("n_total").cast("double") / lit(thresholdInv.toDouble))
      .select("token", "cnt")
      .orderBy(desc("cnt"), col("token"))
  }

  /** Exact oracle — legitimate because the two-pass output is exact; the
    * sketch only proposes candidates and its recall guarantee is what the
    * hash match proves. */
  def oracles: Map[String, String] = Map(
    "q64_heavy_hitters" ->
      """WITH t AS (SELECT unnest(str_split(text, ' ')) AS token FROM documents),
              n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM t)
         SELECT token, COUNT(*) AS cnt
         FROM t, n
         GROUP BY token, n.n_total
         HAVING CAST(COUNT(*) AS DOUBLE) > n_total / 50.0
         ORDER BY cnt DESC, token""")
}

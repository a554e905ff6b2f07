package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Brute-force cosine top-k is the correctness baseline; random-hyperplane
  * LSH bucketing is the scale path (at 100 TB the all-pairs join is
  * infeasible — LSH turns it into a shuffle on a small bucket key, exactly
  * like MinHash-LSH does for text in [[DedupOps]]).
  *
  * Determinism: a dot product is generated as an explicit left-associated
  * 64-term chain `(0.0 + v[0]*w[0] + v[1]*w[1] + ...)` in BOTH engines —
  * each step is one IEEE-exact double op, so Spark and DuckDB produce
  * bit-identical cosines, and ranking on them cannot diverge. Hyperplanes
  * come from a shared integer formula, not RNG.
  */
object SimilarityOps {
  val Dim = 64            // embedding dimensionality (TESTDATA/FIXTURES.md)
  val NumQueries = 5      // vec_id < 5 are the query vectors
  val TopK = 3
  val NumPlanes = 8       // hyperplane-LSH bits → 256 buckets

  /** Deterministic integer hyperplanes: w(p)(d) in [-9, 9]. */
  def plane(p: Int, d: Int): Int = ((1009 * p + 31 * d + 7) % 19) - 9

  /** Left-assoc dot-product chain (oracle side). */
  private def dotChain(terms: Seq[String]): String =
    terms.mkString("(0.0 + ", " + ", ")")

  /** Spark side uses the native codegen'd [[graft.expressions.DotProduct]]
    * (tight Java loop in WSCG). Same left-to-right fold from 0.0 as the
    * oracle's explicit chain, so results are bit-identical. (A generated
    * 64-term expression is not an option: Catalyst's project-collapse
    * inlines the array cast into every term and the optimizer goes
    * quadratic on the ~10k-node tree — observed minutes of planning.) */
  private def sparkDot(a: String, b: String): String =
    s"graft_dot($a, $b)"

  private def sparkPlaneDot(v: String, p: Int): String = {
    val w = (0 until Dim).map(d => s"${plane(p, d)}D").mkString("array(", ", ", ")")
    s"aggregate(zip_with($v, $w, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
  }

  private def sparkBucket(v: String): String =
    (0 until NumPlanes)
      .map(p => s"(CASE WHEN ${sparkPlaneDot(v, p)} > 0.0 THEN ${1L << p}L ELSE 0L END)")
      .mkString("(", " + ", ")")

  /** vec_id, v (double array), n2 (squared norm) — shared prep. Registers
    * the native function idempotently so the ops work on any session. */
  private def vecs(emb: DataFrame): DataFrame = {
    graft.expressions.GraftFunctions.register(emb.sparkSession)
    emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .selectExpr("vec_id", "v", s"${sparkDot("v", "v")} AS n2")
  }

  /** q42 — brute-force cosine top-k: broadcast the query set against the
    * full corpus (the fact side is never shuffled), rank per query. */
  def knnBruteForce(emb: DataFrame): DataFrame = {
    val all = vecs(emb)
    val q = all.filter(col("vec_id") < NumQueries)
      .selectExpr("vec_id AS q_id", "v AS qv", "n2 AS qn2")
    broadcast(q).join(all, col("q_id") =!= col("vec_id"))
      .selectExpr("q_id", "vec_id AS n_id",
        s"${sparkDot("qv", "v")} / (sqrt(qn2) * sqrt(n2)) AS cos")
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(desc("cos"), col("n_id"))).cast("long"))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  /** q43 — LSH-bucketed ANN: assign every vector an 8-bit hyperplane-sign
    * bucket (row-local), then search only the query's bucket. At scale this
    * is a broadcast-able per-bucket join instead of an all-pairs product. */
  def annLsh(emb: DataFrame): DataFrame = {
    val all = vecs(emb).selectExpr("vec_id", "v", "n2", s"${sparkBucket("v")} AS bucket")
    val q = all.filter(col("vec_id") < NumQueries)
      .selectExpr("vec_id AS q_id", "v AS qv", "n2 AS qn2", "bucket")
    broadcast(q).join(all, Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .selectExpr("q_id", "vec_id AS n_id", "bucket",
        s"${sparkDot("qv", "v")} / (sqrt(qn2) * sqrt(n2)) AS cos")
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(desc("cos"), col("n_id"))).cast("long"))
      .filter(col("rank") <= TopK)
      .orderBy("q_id", "rank")
  }

  /** q45 — embedding-cosine near-duplicate pairs: all pairs within an LSH
    * bucket whose cosine clears a high threshold — the vector-space member
    * of the dedup family (exact/minhash/simhash/ngram live in [[DedupOps]]).
    * At scale: shuffle on the 8-bit bucket key, never an all-pairs join. */
  def embeddingDups(emb: DataFrame, minCos: Double = 0.4): DataFrame = {
    val all = vecs(emb).selectExpr("vec_id", "v", "n2", s"${sparkBucket("v")} AS bucket")
    all.as("x").join(all.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .selectExpr("x.vec_id AS a_id", "y.vec_id AS b_id",
        s"${sparkDot("x.v", "y.v")} / (sqrt(x.n2) * sqrt(y.n2)) AS cos")
      .filter(col("cos") >= minCos)
      .orderBy("a_id", "b_id")
  }

  /** q44 — per-label centroids in long format (label, dim, centroid, n).
    * Element values are quantized to exact 1e-6 integers before the sum, so
    * the aggregate is order-independent (same trick as [[Exact]]). */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label").cast("long").as("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").cast("long").as("dim"),
        expr("CAST(ROUND(CAST(col AS DOUBLE) * 1000000) AS BIGINT)").as("q"))
      .groupBy("label", "dim")
      .agg((sum("q") / (lit(1000000.0) * count(lit(1)))).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy("label", "dim")

  // ---- DuckDB oracles (1-based array indexing) ----
  private def duckDot(a: String, b: String): String =
    dotChain((1 to Dim).map(d => s"$a[$d] * $b[$d]"))

  private def duckBucket(v: String): String =
    (0 until NumPlanes).map { p =>
      val dot = dotChain((1 to Dim).map(d => s"$v[$d] * ${plane(p, d - 1)}.0"))
      s"(CASE WHEN $dot > 0.0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)"
    }.mkString("(", " + ", ")")

  def oracles: Map[String, String] = Map(
    "q42_knn_brute" ->
      s"""WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          n AS (SELECT vec_id, v, ${duckDot("v", "v")} AS n2 FROM vecs),
          pairs AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                           ${duckDot("q.v", "c.v")} / (sqrt(q.n2) * sqrt(c.n2)) AS cos
                    FROM n q JOIN n c ON q.vec_id < $NumQueries AND q.vec_id != c.vec_id)
          SELECT q_id, n_id, cos, rank FROM (
            SELECT q_id, n_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
            FROM pairs)
          WHERE rank <= $TopK ORDER BY q_id, rank""",
    "q43_ann_lsh" ->
      s"""WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          n AS (SELECT vec_id, v, ${duckDot("v", "v")} AS n2,
                       ${duckBucket("v")} AS bucket FROM vecs),
          pairs AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id, q.bucket,
                           ${duckDot("q.v", "c.v")} / (sqrt(q.n2) * sqrt(c.n2)) AS cos
                    FROM n q JOIN n c
                    ON q.bucket = c.bucket AND q.vec_id < $NumQueries
                       AND q.vec_id != c.vec_id)
          SELECT q_id, n_id, bucket, cos, rank FROM (
            SELECT q_id, n_id, bucket, cos,
                   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
            FROM pairs)
          WHERE rank <= $TopK ORDER BY q_id, rank""",
    "q45_embedding_dups" ->
      s"""WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          n AS (SELECT vec_id, v, ${duckDot("v", "v")} AS n2,
                       ${duckBucket("v")} AS bucket FROM vecs)
          SELECT x.vec_id AS a_id, y.vec_id AS b_id,
                 ${duckDot("x.v", "y.v")} / (sqrt(x.n2) * sqrt(y.n2)) AS cos
          FROM n x JOIN n y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
          WHERE ${duckDot("x.v", "y.v")} / (sqrt(x.n2) * sqrt(y.n2)) >= 0.4
          ORDER BY a_id, b_id""",
    "q44_label_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, i - 1 AS dim,
                SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))
                  / (1000000.0 * COUNT(*)) AS centroid,
                COUNT(*) AS n
         FROM embeddings, range(1, 65) t(i)
         GROUP BY 1, 2 ORDER BY label, dim""",
  )
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over the near-dup pair graph — the stage that turns
  * pairwise dedup verdicts (q37/q38/q40/q45/q62) into per-document KEEP/DROP
  * decisions: group transitively-linked near-dups into clusters and keep one
  * canonical survivor per cluster. A pair list alone over-deletes (A~B, B~C
  * kills both B and C only if clustering is transitive) — every production
  * corpus dedup ends with this step.
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
  * Beyond", SoCC 2014). Each round is two aggregate+join passes over the
  * edge set expressed entirely in DataFrame ops (per-node min — map-side
  * combined — joined back to edges), and the edge set converges to a forest
  * of stars rooted at each component's minimum node in O(log²) rounds —
  * at near-dup cluster diameters, 2-4 rounds in practice.
  *
  * 100 TB notes:
  *  - no `collect_list` neighborhoods: hub nodes (a boilerplate doc near-dup
  *    to millions) would blow a grouped-list formulation; the per-node MIN
  *    aggregate is O(1) state per key and immune to that skew.
  *  - each round's result is materialized via `localCheckpoint` — the
  *    iteration references its input twice, so an unmaterialized loop
  *    doubles the plan per round (exponential analysis cost). On a real
  *    cluster swap in `spark.sparkContext.setCheckpointDir` + `.checkpoint()`
  *    for a lineage cut that survives executor loss.
  *  - convergence is an exact fixed-point check (count + anti) on the
  *    canonical edge set, one cheap job per round on a set that SHRINKS
  *    toward one edge per non-root node.
  *
  * Reference scope note: the reference has no graph or dedup surface at all
  * (SURVEY.md §2.D); this is §7.1 `graft.ext`, the scale path the LSH pair
  * ops feed.
  */
object GraphOps {

  /** Components of the undirected graph given by `pairs` (cols `a_id`,
    * `b_id`) → one row per non-isolated node: (node, cluster_id) where
    * cluster_id is the component's minimum node id. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 32): DataFrame = {
    var edges = pairs
      .selectExpr("least(a_id, b_id) AS a", "greatest(a_id, b_id) AS b")
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // set equality of two distinct canonical sets = empty symmetric
      // difference — ONE job per round (both excepts evaluate inside the
      // union's isEmpty), on checkpointed inputs
      converged = next.exceptAll(edges)
        .union(edges.exceptAll(next))
        .isEmpty
      edges = next
      it += 1
    }
    require(converged, s"connectedComponents: no fixed point in $maxIter rounds")
    // the fixed point is a union of stars (root, leaf) with root = component
    // minimum; roots label themselves
    edges.select(col("b").as("node"), col("a").as("cluster_id"))
      .union(edges.select(col("a").as("node"), col("a").as("cluster_id")))
      .distinct()
  }

  /** Large-star: every node connects its STRICTLY LARGER neighbors to the
    * minimum of its closed neighborhood. Emitted edges (m, v) satisfy
    * m ≤ u < v, so they are already canonical. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = symmetric(edges)
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .selectExpr("u", "least(mn, u) AS m")
    sym.filter(col("v") > col("u")).join(mins, "u")
      .select(col("m").as("a"), col("v").as("b"))
      .distinct()
  }

  /** Small-star: every node connects its strictly smaller neighbors (and
    * itself) to the minimum among them. All emitted edges again have a < b. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val sym = symmetric(edges)
    val small = sym.filter(col("v") < col("u"))
    val mins = small.groupBy("u").agg(min("v").as("m"))
    val leafEdges = small.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("m").as("a"), col("v").as("b")) // m = min(Ns) < v
    val selfEdges = mins.select(col("m").as("a"), col("u").as("b")) // m < u
    leafEdges.union(selfEdges).distinct()
  }

  private def symmetric(edges: DataFrame): DataFrame =
    edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))

  /** q66 — dedup clustering: LSH-verified near-dup pairs → transitive
    * clusters → per-doc decision. Every document appears exactly once;
    * singletons (no near-dup) are their own cluster; `keep` marks the
    * cluster's minimum doc_id, the canonical survivor. The component table
    * is |near-dup docs| rows — a small fraction of the corpus — so the
    * enrichment join back to `documents` is cheap next to the pair stage. */
  def dedupClusters(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.select("doc_id")
      .join(connectedComponents(pairs).withColumnRenamed("node", "doc_id"),
        Seq("doc_id"), "left_outer")
      .selectExpr("doc_id", "COALESCE(cluster_id, doc_id) AS cluster_id")
      .selectExpr("doc_id", "cluster_id", "doc_id = cluster_id AS keep")
      .orderBy("doc_id")

  /** q97 — SOFT-DEDUP WEIGHTS (the SlimPajama / "soft dedup" alternative to
    * hard dropping): instead of deleting near-dup cluster members, keep
    * every document and downweight it by its cluster's multiplicity —
    * weight = 1/|cluster| — so each distinct content unit contributes one
    * unit of sampling mass to the training mix. Consumes the MATERIALIZED
    * q66 cluster table (a pipeline stage over persisted dedup output, the
    * q59/q91 pattern). Σ weight within a cluster is exactly 1 by
    * construction; Σ over the corpus = the effective deduplicated size.
    *
    * Scale shape: one map-combinable count per cluster_id, joined back on
    * the same cluster_id partitioning (no second exchange of the big side
    * beyond the groupBy's own); the weight is a single IEEE division of
    * exact integers, bit-identical cross-engine. A crawl-scale mega-cluster
    * hot key is bounded by the same AQE skew handling the groupBy needs
    * anyway — no all-pairs structure exists here. */
  def softDedupWeights(clusters: DataFrame): DataFrame = {
    val sizes = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    clusters.select("doc_id", "cluster_id")
      .join(sizes, "cluster_id")
      .selectExpr("doc_id", "cluster_id", "cluster_size",
        "CAST(1.0 AS DOUBLE) / CAST(cluster_size AS DOUBLE) AS weight")
      .orderBy("doc_id")
  }

  /** q106 — QUALITY-AWARE CANONICAL SELECTION: the "keep the BEST copy"
    * upgrade of q66's keep-the-lowest-id rule. Near-dup clusters routinely
    * contain one clean original and several mangled scrapes of it
    * (truncated, boilerplate-wrapped, OCR-damaged); dropping all but the
    * minimum doc_id keeps an arbitrary member, while production dedup
    * (e.g. the Lee et al. 2022 dedup pipeline's survivor policy) keeps the
    * member the quality model ranks highest. Consumes two MATERIALIZED
    * stage outputs (the q59/q91 reads-vs-measures division): the q66
    * cluster table and the q101 score table. Per cluster the canon is the
    * member with the maximum `score_micro`, ties broken by minimum doc_id
    * — both exact integers, so the choice is engine-independent.
    *
    * Scale shape: one corpus-sized equi-join on doc_id (both sides
    * pre-partitioned stage outputs), then two map-combinable aggregates on
    * cluster_id (MAX, then MIN over the best-score members) and one join
    * back on the same cluster_id key — no window over non-aggregated
    * input, no collect, O(1) state per key. A crawl-scale mega-cluster is
    * a hot groupBy key handled by AQE like q97's size count — no
    * all-pairs structure exists here. */
  def clusterCanon(clusters: DataFrame, scores: DataFrame): DataFrame = {
    val j = clusters.select("doc_id", "cluster_id")
      .join(scores.select("doc_id", "score_micro"), "doc_id")
    val best = j.groupBy("cluster_id").agg(max("score_micro").as("best_micro"))
    val canon = j.join(best, "cluster_id")
      .filter(col("score_micro") === col("best_micro"))
      .groupBy("cluster_id").agg(min("doc_id").as("canon_id"))
    j.join(canon, "cluster_id")
      .selectExpr("doc_id", "cluster_id", "score_micro", "canon_id",
        "doc_id = canon_id AS canon")
      .orderBy("doc_id")
  }

  /** q114 — CROSS-SOURCE DUPLICATION MATRIX: which sources copy from
    * which — per unordered source pair, the number of true near-dup
    * clusters (≥ 2 members) containing BOTH sources; the diagonal counts
    * clusters duplicated WITHIN a source. The artifact a curation team
    * reads to pick dedup priorities and trace provenance (a crawl source
    * whose row overlaps a licensed source's is mirror-heavy; a hot
    * diagonal means the source's own crawler revisits). Consumes the
    * MATERIALIZED q66 cluster table.
    *
    * Scale shape: a map-combinable size filter on cluster_id, one
    * corpus-sized equi-join to attach `source`, a distinct to collapse
    * each cluster to its ≤ |sources| member-source rows (all co-keyed on
    * cluster_id — one shuffle shape), then a self-join on cluster_id
    * whose per-key fan-out is bounded by |sources|² (sources are an
    * enumerable handful even at 100 TB), and a bounded ≤ |sources|²-row
    * aggregate. The corpus never self-joins — only the collapsed
    * (cluster, source) rows do. */
  /** The NULL-source stand-in [[crossSourceDups]] buckets unlabeled docs
    * under: \\u0001-prefixed so it sorts before, and can never collide
    * with, a real source name (DuckDB mirror: `chr(1) || 'null'`). */
  val NullSourceSentinel = "\u0001null"

  def crossSourceDups(clusters: DataFrame, docs: DataFrame): DataFrame = {
    val dupIds = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("sz")).filter(col("sz") >= 2)
      .select("cluster_id")
    // NULL source coalesces to a sentinel BEFORE the self-join: under
    // three-valued logic a null source fails both the `<` and `=`
    // predicates below, so null-source cluster members would silently
    // vanish from the matrix on both engines. The sentinel (a \\u0001
    // prefix no real source name carries) keeps them visible as their
    // own provenance bucket; the oracle applies the same COALESCE.
    val cs = clusters.select("doc_id", "cluster_id")
      .join(dupIds, "cluster_id")
      .join(docs.select(col("doc_id"),
        coalesce(col("source"), lit(NullSourceSentinel)).as("source")), "doc_id")
      .groupBy("cluster_id", "source").agg(count(lit(1)).as("cnt"))
    // a diagonal (s, s) cell must mean the cluster holds ≥ 2 members OF
    // s — a cluster merely touching s pairs its single row with itself
    // in the self-join, which would read as self-duplication that never
    // happened; off-diagonal needs only presence of both sides
    cs.toDF("cluster_id", "source_a", "cnt_a")
      .join(cs.toDF("cluster_id", "source_b", "cnt_b"), "cluster_id")
      .filter(col("source_a") < col("source_b") ||
        (col("source_a") === col("source_b") && col("cnt_a") >= 2))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy("source_a", "source_b")
  }

  /** Fixed PageRank round budget — shared with the unrolled oracle CTE
    * chain so the engines walk the identical number of power iterations. */
  val PageRankRounds: Int = 5
  /** Initial per-node mass in micro-units (rank 1.0). */
  val PageRankInitMicro: Long = 1000000L

  /** q140 — PAGERANK over the symmetrized customer–supplier purchase
    * graph (an edge wherever a customer's order contains a supplier's
    * line item): the canonical iterative-message-passing workload — the
    * entity-importance score every link-analysis / seed-selection
    * pipeline runs — exercised as [[PageRankRounds]] exact power
    * iterations with the per-node convention r' = 0.15 + 0.85·Σ r/deg.
    *
    * Determinism: mass lives in micro-unit BIGINTs; each round does ONE
    * floor division per edge (r DIV deg) and one per node (85·m DIV 100)
    * — both engines floor identically on non-negative integers, and the
    * dropped remainders are the deterministic "leaked mass" of the
    * integer formulation (≤ deg µ-units per node per round). No doubles
    * anywhere until the final rank projection. Headroom: a node's mass
    * is bounded by the conserved total N·10⁶, so the 85× step stays
    * inside BIGINT up to ~10¹¹ nodes — beyond the 100 TB design point.
    *
    * Scale shape: the edge list comes from the orders⋈lineitem equi-join
    * (co-keyed on orderkey) collapsed to DISTINCT (cust, supp) — the only
    * corpus-scale shuffle, paid once and checkpointed WITH each node's
    * degree attached AND pre-partitioned on src (localCheckpoint
    * preserves the hash partitioning), so every round plans exactly ONE
    * exchange: the dst-keyed map-combinable message SUM — the src-side
    * join reuses the stored layout, and the new ranks come out
    * partitioned on node for the next round. Symmetrization means every
    * node has in-edges, so the rank update reads straight off the
    * contribution aggregate — no join-back for mass-less nodes (none
    * exist) and no dangling nodes. Ranks are checkpointed per round (the
    * q87/q66 idiom) — plan depth is round-invariant. Node ids live in one
    * space (2·custkey / 2·suppkey+1) so the bipartite key spaces cannot
    * collide. */
  def pageRank(orders: DataFrame, lineitem: DataFrame,
               rounds: Int = PageRankRounds): DataFrame = {
    val eb = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .selectExpr("o_custkey * 2 AS src", "l_suppkey * 2 + 1 AS dst")
      .distinct()
    val edges = eb.unionByName(eb.selectExpr("dst AS src", "src AS dst"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgeDeg = edges.join(deg, "src")
      .repartition(col("src")).localCheckpoint()
    var ranks = edgeDeg
      .select(col("src").as("node"), lit(PageRankInitMicro).as("r"))
      .distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      ranks = edgeDeg.join(ranks, edgeDeg("src") === ranks("node"))
        .selectExpr("dst", "r DIV deg AS c")
        .groupBy("dst").agg(sum("c").as("m"))
        .selectExpr("dst AS node", "150000 + (85 * m) DIV 100 AS r")
        .localCheckpoint()
    }
    ranks.selectExpr(
        "CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type",
        "node DIV 2 AS key", "r AS rank_micro",
        "CAST(r AS DOUBLE) / 1e6 AS pr")
      .orderBy(desc("rank_micro"), col("node_type"), col("key"))
  }

  /** The q140 oracle unrolled to `rounds` power iterations — identical
    * integer mass arithmetic (DuckDB `//` and Spark `DIV` agree on
    * non-negative BIGINTs), LEFT JOIN + COALESCE for the (structurally
    * impossible, kept for shape parity) no-inbound-mass case. */
  private[graft] def pageRankSql(rounds: Int = PageRankRounds): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""r$i AS (SELECT d.src AS node,
                 CAST(150000 + (85 * COALESCE(m.m, 0)) // 100 AS BIGINT) AS r
          FROM deg d LEFT JOIN (
            SELECT e.dst AS dst, CAST(SUM(p.r // d2.deg) AS BIGINT) AS m
            FROM r${i - 1} p JOIN deg d2 ON p.node = d2.src
                 JOIN e ON e.src = p.node
            GROUP BY e.dst) m ON d.src = m.dst)"""
    }.mkString(",\n          ")
    s"""WITH eb AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        e AS (SELECT src, dst FROM eb UNION ALL SELECT dst, src FROM eb),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
        r0 AS (SELECT src AS node, CAST($PageRankInitMicro AS BIGINT) AS r FROM deg),
        $roundCtes
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
               node // 2 AS key, r AS rank_micro,
               CAST(r AS DOUBLE) / 1e6 AS pr
        FROM r$rounds
        ORDER BY rank_micro DESC, node_type, key"""
  }

  /** q142 — TRIANGLE / CLUSTERING-COEFFICIENT CENSUS of the near-dup
    * graph: triangle count, wedge (2-path) count, and the global
    * clustering coefficient C = 3·T/W — the transitivity evidence behind
    * q66's whole premise. Connected-components dedup assumes near-dup
    * similarity is (approximately) transitive: a high C says clusters
    * are clique-like and one-survivor-per-component is safe; a low C
    * says the pair graph is chains of borderline matches and q66 is
    * over-merging — the metric a dedup rollout reads FIRST.
    *
    * Algorithm: degree-ordered triangle counting (the MapReduce-standard
    * scale shape): orient every edge from its (deg, id)-smaller endpoint
    * — out-degrees are then bounded by O(√m), so the wedge self-join's
    * per-key fan-out cannot blow up on hub nodes the way a naive
    * neighborhood join would — and each triangle materializes exactly
    * once as a wedge at its smallest vertex closed by one oriented edge.
    * Wedge totals come from Σ deg·(deg−1)/2 (exact — the product is
    * even, so DIV is lossless). Everything is counts; the one double is
    * a single IEEE division, NULL on a wedge-less graph. */
  def triangleCensus(pairs: DataFrame): DataFrame = {
    val e = pairs.selectExpr("least(a_id, b_id) AS a", "greatest(a_id, b_id) AS b")
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // consumed by deg, the orient join, and the edge count
    val deg = e.selectExpr("a AS n").unionByName(e.selectExpr("b AS n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val oriented = e
      .join(deg.selectExpr("n AS a", "deg AS dega"), "a")
      .join(deg.selectExpr("n AS b", "deg AS degb"), "b")
      .selectExpr(
        "CASE WHEN dega < degb OR (dega = degb AND a < b) THEN a ELSE b END AS src",
        "CASE WHEN dega < degb OR (dega = degb AND a < b) THEN b ELSE a END AS dst",
        "CASE WHEN dega < degb OR (dega = degb AND a < b) THEN degb ELSE dega END AS degdst")
      .localCheckpoint() // consumed by both wedge sides and the closing join
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.degdst") < col("e2.degdst") ||
            (col("e1.degdst") === col("e2.degdst") &&
              col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("v"), col("e2.dst").as("w"))
    val tri = wedges.join(oriented.as("e3"),
        col("v") === col("e3.src") && col("w") === col("e3.dst"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("deg * (deg - 1) DIV 2")), lit(0L)).as("n_wedges"))
    val en = e.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(broadcast(en)).crossJoin(broadcast(tri))
      .selectExpr("n_nodes", "n_edges", "n_wedges", "n_triangles",
        """CASE WHEN n_wedges = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
           END AS global_clustering""")
  }

  /** q150's hot-key cap: customers buying from more than this many
    * suppliers are excluded from the projection (the q38 df-cap idiom —
    * a mega-customer's k² pair fan-out is the one thing that can blow
    * this join up at scale, and such rows carry no similarity signal). */
  val CoPurchaseCapSupp = 200L

  /** q150 — CO-PURCHASE NEAREST NEIGHBOR (item-item collaborative
    * filtering): for every supplier, the other supplier most similar by
    * shared customers — cosine over binary purchase vectors,
    * co / √(n_a·n_b) — the "customers who bought from X also bought
    * from Y" artifact, computed as the bipartite projection of the q140
    * purchase graph.
    *
    * Scale shape: the (cust, supp) edge list is built once (co-keyed
    * orders⋈lineitem, distinct) and checkpointed; the projection is ONE
    * customer-keyed self-join whose fan-out is bounded by the
    * [[CoPurchaseCapSupp]] cap, collapsing map-combinably to the
    * ≤ |supp|² co-occurrence table; everything after (degrees, argmax,
    * join-back) is bounded. The per-supplier best partner uses the
    * MAX-then-equality-join-then-MIN-tie-break form on both engines —
    * cosines are bit-identical (one IEEE √ and ÷ over exact integers),
    * so the equality join cannot drift. No window anywhere. */
  def coPurchaseNeighbors(orders: DataFrame, lineitem: DataFrame,
                          cap: Long = CoPurchaseCapSupp): DataFrame = {
    val e0 = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .selectExpr("o_custkey AS c", "l_suppkey AS s")
      .distinct()
    val fanout = e0.groupBy("c").agg(count(lit(1)).as("k"))
    val e = e0.join(fanout.filter(col("k") <= cap).select("c"), "c")
      .localCheckpoint() // consumed by degrees and both pair sides
    val deg = e.groupBy("s").agg(count(lit(1)).as("n_cust"))
      .localCheckpoint() // bounded; consumed three times
    // each unordered pair is generated and aggregated ONCE (s < t halves
    // the corpus-scale shuffle); both directions come from mirroring the
    // already-collapsed bounded pair table
    val copairs = e.as("a").join(e.as("b"),
        col("a.c") === col("b.c") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("s"), col("b.s").as("t"))
      .agg(count(lit(1)).as("co"))
    val sim = copairs.unionByName(copairs.selectExpr("t AS s", "s AS t", "co"))
      .join(broadcast(deg.selectExpr("s", "n_cust AS n_s")), "s")
      .join(broadcast(deg.selectExpr("s AS t", "n_cust AS n_t")), "t")
      .selectExpr("s", "t", "co", "n_s", "n_t",
        """CAST(co AS DOUBLE)
           / sqrt(CAST(n_s AS DOUBLE) * CAST(n_t AS DOUBLE)) AS cos""")
    // argmax as ONE lexicographic struct MAX (the q109 idiom): max cos,
    // ties to the smallest partner id via the negated key — same pick as
    // the oracle's MAX/equality/MIN form because cosines are bit-exact
    sim.groupBy("s", "n_s")
      .agg(max(struct(col("cos").as("cos"), (-col("t")).as("negt"),
        col("co").as("co"), col("n_t").as("n_t"))).as("b"))
      .selectExpr("s AS supplier", "n_s AS n_cust", "-b.negt AS partner",
        "b.co AS co", "b.n_t AS partner_n_cust", "b.cos AS cosine")
      .orderBy("supplier")
  }

  /** q66's oracle composes the verified q37 pair oracle verbatim (the edges
    * cannot drift from the individually-hash-checked query) with a
    * recursive-CTE min-label reachability — DuckDB's walk accumulates every
    * label reachable from each node; MIN per node is the component minimum,
    * independently of the star-contraction algorithm under test.
    * q97 composes the q66 oracle verbatim (the q71 pattern), so the weight
    * table's cluster inputs cannot drift from the verified clustering. */
  /** q197's dials: the hop budget (one past the small-lot graph's
    * observed eccentricity from the seed set, so every reachable node
    * carries its TRUE BFS distance and NULL genuinely means outside the
    * component), the at-risk seed rule, and the small-lot edge cap
    * (dense TPC-H-ish bipartite graphs have diameter ~2; capping
    * quantity keeps only the thin trading relationships, which layers
    * the frontier and leaves genuinely unreached nodes at every graded
    * scale — both output branches populated). */
  val BfsRounds = 4
  val BfsSeedBal = 1000.0
  val BfsQtyCap = 3.0

  /** q197 — MULTI-SOURCE BFS / SHORTEST HOP DISTANCE: the blast-radius
    * question a supply-chain risk desk asks of the trading graph — from
    * every at-risk supplier (acctbal < $[[BfsSeedBal]]), how many hops
    * of small-lot trading relationships (customer–supplier edges carried
    * by lineitems with quantity ≤ [[BfsQtyCap]]) until each party is
    * touched? Ships one row per customer AND supplier: hop distance
    * from the NEAREST seed, NULL when the node is outside the radius
    * within [[BfsRounds]] hops (here: outside the component — the dial
    * exceeds the graph's eccentricity, spec-checked against an
    * unbounded driver BFS).
    *
    * Scale shape: the iterative FRONTIER expansion (the scalable BFS —
    * per round one equi-join of the current frontier against the
    * src-partitioned edge list and one anti-join against the labeled
    * set; rounds are bounded by the dial, like q140's pageRank loop),
    * never a transitive-closure join. The oracle spells the same
    * distances as [[BfsRounds]] unrolled min-relaxations — frontier BFS
    * and bounded relaxation agree on unit-weight graphs by induction on
    * hop count. */
  /** The q197/q208 small-lot trading graph: distinct customer–supplier
    * pairs carried by quantity-capped lineitems, both directions,
    * src-partitioned and materialized (every iterative consumer probes
    * it once per round). */
  private[graft] def smallLotEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val eb = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.filter(col("l_quantity") <= BfsQtyCap)
          .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .selectExpr("o_custkey * 2 AS src", "l_suppkey * 2 + 1 AS dst")
      .distinct()
    eb.unionByName(eb.selectExpr("dst AS src", "src AS dst"))
      .repartition(col("src")).localCheckpoint()
  }

  def bfsBlastRadius(customer: DataFrame, supplier: DataFrame,
                     orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val edges = smallLotEdges(orders, lineitem)
    var dist = supplier.filter(col("s_acctbal") < BfsSeedBal)
      .selectExpr("s_suppkey * 2 + 1 AS node", "CAST(0 AS BIGINT) AS d")
      .localCheckpoint()
    for (r <- 1 to BfsRounds) {
      val next = dist.filter(col("d") === (r - 1).toLong)
        .join(edges, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("d", lit(r.toLong))
      dist = dist.unionByName(next).localCheckpoint()
    }
    val nodes = customer.selectExpr("c_custkey * 2 AS node")
      .unionByName(supplier.selectExpr("s_suppkey * 2 + 1 AS node"))
    nodes.join(dist, Seq("node"), "left")
      .selectExpr(
        "CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type",
        "node DIV 2 AS key", "d AS dist")
      .orderBy("node_type", "key")
  }

  /** q208's dials: the core threshold and the peel unroll. The observed
    * peel depths are 6 / 3 / 7 at the three graded scales; unrolling
    * PAST the fixpoint is safe (a converged round recomputes the same
    * alive set — the q121 argument), so 12 covers every scale with
    * margin and the spec drives one extra peel to prove stability. */
  val KCoreK = 5L
  val KCoreRounds = 12

  /** q208 — K-CORE DECOMPOSITION: the "robust trading core" question —
    * iteratively remove every party with fewer than [[KCoreK]] small-lot
    * trading partners until the survivors all have ≥ K partners AMONG
    * THEMSELVES (Seidman's k-core; degree alone overcounts — a hub
    * whose counterparties are all peripheral dies in the SECOND round,
    * which is why the peel CASCADES and a one-shot degree filter is
    * wrong). Ships one row per customer and supplier: the in-core
    * verdict, the within-core degree (NULL outside), and the round the
    * peel removed the node (NULL for survivors — the coreness layer, a
    * centrality measure in its own right). At the smallest scale the
    * 5-core is legitimately EMPTY (every node peels within 6 rounds);
    * at sf0.01+ both branches populate.
    *
    * Scale shape: per round two co-keyed equi-joins restrict the edge
    * list to the shrinking alive set and one map-combinable degree
    * aggregate — the q140/q197 bounded-round iterative class; rounds
    * are a dial, never data-dependent driver logic. The oracle unrolls
    * the same peel as CTE pairs. */
  def kCore(customer: DataFrame, supplier: DataFrame,
            orders: DataFrame, lineitem: DataFrame,
            k: Long = KCoreK, rounds: Int = KCoreRounds): DataFrame = {
    val spark = customer.sparkSession
    import spark.implicits._
    val edges = smallLotEdges(orders, lineitem)
    val nodes = customer.selectExpr("c_custkey * 2 AS node")
      .unionByName(supplier.selectExpr("s_suppkey * 2 + 1 AS node"))
      .localCheckpoint()
    var alive = nodes
    var removed = Seq.empty[(Long, Long)].toDF("node", "removed_round")
    var lastDeg: DataFrame = null
    for (r <- 1 to rounds) {
      val e2 = edges
        .join(alive.selectExpr("node AS src"), "src")
        .join(alive.selectExpr("node AS dst"), "dst")
      val deg = e2.groupBy("src").agg(count(lit(1)).as("deg"))
      val aliveDeg = alive
        .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .selectExpr("node", "coalesce(deg, CAST(0 AS BIGINT)) AS deg")
        .localCheckpoint()
      removed = removed.unionByName(
        aliveDeg.filter(col("deg") < k)
          .selectExpr("node", s"CAST($r AS BIGINT) AS removed_round"))
      alive = aliveDeg.filter(col("deg") >= k).select("node")
      lastDeg = aliveDeg
    }
    // within-core degree: at the fixpoint the last round's degree over
    // the surviving set IS the core degree
    val coreDeg = lastDeg.filter(col("deg") >= k)
      .selectExpr("node", "deg AS core_degree")
    nodes
      .join(coreDeg, Seq("node"), "left")
      .join(removed.localCheckpoint(), Seq("node"), "left")
      .selectExpr(
        "CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type",
        "node DIV 2 AS key", "core_degree IS NOT NULL AS in_core",
        "core_degree", "removed_round")
      .orderBy("node_type", "key")
  }

  private[graft] def kCoreSql(k: Long = KCoreK, rounds: Int = KCoreRounds): String = {
    // every CTE is MATERIALIZED: each round references the previous one
    // TWICE (both join sides), so default inlining would expand the
    // 12-round peel into ~2^12 scans and exhaust the oracle's file
    // descriptors before it exhausts the planner
    val roundCtes = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (
                  SELECT a.node AS node, CAST(COUNT(b.node) AS BIGINT) AS deg
                  FROM a${r - 1} a
                  LEFT JOIN e ON e.src = a.node
                  LEFT JOIN a${r - 1} b ON e.dst = b.node
                  GROUP BY a.node),
          a$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $k),
          rm$r AS (SELECT node, CAST($r AS BIGINT) AS removed_round
                   FROM d$r WHERE deg < $k)"""
    }.mkString(",\n          ")
    val rmUnion = (1 to rounds).map(r => s"SELECT * FROM rm$r")
      .mkString(" UNION ALL ")
    s"""WITH eb AS MATERIALIZED (
                SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                WHERE l_quantity <= $BfsQtyCap),
        e AS MATERIALIZED (SELECT src, dst FROM eb
                           UNION ALL SELECT dst, src FROM eb),
        a0 AS MATERIALIZED (SELECT c_custkey * 2 AS node FROM customer
               UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier),
        $roundCtes,
        rm AS ($rmUnion),
        core AS (SELECT d$rounds.node AS node, d$rounds.deg AS core_degree
                 FROM d$rounds JOIN a$rounds ON d$rounds.node = a$rounds.node)
        SELECT CASE WHEN a0.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               a0.node // 2 AS key, core.node IS NOT NULL AS in_core,
               core.core_degree AS core_degree, rm.removed_round AS removed_round
        FROM a0 LEFT JOIN core ON core.node = a0.node
                LEFT JOIN rm ON rm.node = a0.node
        ORDER BY node_type, key"""
  }

  private[graft] def bfsSql(rounds: Int = BfsRounds): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""d$i AS (SELECT node, MIN(d) AS d FROM (
            SELECT node, d FROM d${i - 1}
            UNION ALL
            SELECT e.dst AS node, p.d + 1 AS d
            FROM d${i - 1} p JOIN e ON e.src = p.node) GROUP BY node)"""
    }.mkString(",\n          ")
    s"""WITH eb AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                WHERE l_quantity <= $BfsQtyCap),
        e AS (SELECT src, dst FROM eb UNION ALL SELECT dst, src FROM eb),
        d0 AS (SELECT s_suppkey * 2 + 1 AS node, CAST(0 AS BIGINT) AS d
               FROM supplier WHERE s_acctbal < $BfsSeedBal),
        $roundCtes,
        nodes AS (SELECT c_custkey * 2 AS node FROM customer
                  UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier)
        SELECT CASE WHEN nodes.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               nodes.node // 2 AS key, CAST(d$rounds.d AS BIGINT) AS dist
        FROM nodes LEFT JOIN d$rounds ON d$rounds.node = nodes.node
        ORDER BY node_type, key"""
  }

  def oracles: Map[String, String] = Map(
    "q208_kcore" -> kCoreSql(),
    "q197_bfs_radius" -> bfsSql(),
    "q140_pagerank" -> pageRankSql(),
    // q150: identical cap, projection, cosine expression, and the same
    // MAX/equality/MIN-tie-break argmax (no window either side)
    "q150_copurchase_nn" ->
      s"""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          f AS (SELECT c FROM e0 GROUP BY c HAVING COUNT(*) <= $CoPurchaseCapSupp),
          e AS (SELECT e0.c AS c, e0.s AS s FROM e0 JOIN f ON e0.c = f.c),
          deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_cust FROM e GROUP BY s),
          co AS (SELECT a.s AS s, b.s AS t, CAST(COUNT(*) AS BIGINT) AS co
                 FROM e a JOIN e b ON a.c = b.c AND a.s <> b.s GROUP BY 1, 2),
          sim AS (SELECT co.s AS s, co.t AS t, co.co AS co,
                         da.n_cust AS n_s, db.n_cust AS n_t,
                         CAST(co.co AS DOUBLE)
                         / sqrt(CAST(da.n_cust AS DOUBLE) * CAST(db.n_cust AS DOUBLE)) AS cos
                  FROM co JOIN deg da ON co.s = da.s JOIN deg db ON co.t = db.s),
          best AS (SELECT s, MAX(cos) AS bc FROM sim GROUP BY s),
          pick AS (SELECT sim.s AS s, MIN(t) AS partner
                   FROM sim JOIN best ON sim.s = best.s AND sim.cos = best.bc
                   GROUP BY sim.s)
          SELECT pick.s AS supplier, sim.n_s AS n_cust, pick.partner AS partner,
                 sim.co AS co, sim.n_t AS partner_n_cust, sim.cos AS cosine
          FROM pick JOIN sim ON pick.s = sim.s AND pick.partner = sim.t
          ORDER BY supplier""",
    // q142 composes the verified q37 pair oracle verbatim; identical
    // (deg, id) orientation, wedge join, and exact wedge formula
    "q142_triangle_census" -> {
      val pairsSql = DedupOps.oracles("q37_lsh_pairs")
      s"""WITH p AS ($pairsSql),
          e AS (SELECT DISTINCT least(a_id, b_id) AS a, greatest(a_id, b_id) AS b
                FROM p WHERE a_id <> b_id),
          deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
                  FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
                  GROUP BY n),
          o AS (SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                             THEN a ELSE b END AS src,
                       CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                             THEN b ELSE a END AS dst,
                       CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
                             THEN db.deg ELSE da.deg END AS degdst
                FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
          w AS (SELECT e1.dst AS v, e2.dst AS ww
                FROM o e1 JOIN o e2 ON e1.src = e2.src
                 AND (e1.degdst < e2.degdst
                      OR (e1.degdst = e2.degdst AND e1.dst < e2.dst))),
          t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
                FROM w JOIN o e3 ON w.v = e3.src AND w.ww = e3.dst),
          s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                       CAST(COALESCE(SUM(deg * (deg - 1) // 2), 0) AS BIGINT) AS n_wedges
                FROM deg),
          en AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
          SELECT n_nodes, n_edges, n_wedges, n_triangles,
                 CASE WHEN n_wedges = 0 THEN CAST(NULL AS DOUBLE)
                      ELSE CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
                 END AS global_clustering
          FROM s CROSS JOIN en CROSS JOIN t"""
    },
    "q97_softdedup_weights" ->
      s"""WITH c AS (${q66Sql}),
          z AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM c GROUP BY cluster_id)
          SELECT c.doc_id AS doc_id, c.cluster_id AS cluster_id,
                 z.cluster_size AS cluster_size,
                 CAST(1.0 AS DOUBLE) / CAST(z.cluster_size AS DOUBLE) AS weight
          FROM c JOIN z ON c.cluster_id = z.cluster_id
          ORDER BY doc_id""",
    "q66_dedup_clusters" -> q66Sql)

  private lazy val q66Sql: String = {
      val pairsSql = DedupOps.oracles("q37_lsh_pairs")
      s"""WITH RECURSIVE pairs AS ($pairsSql),
          edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                    UNION ALL SELECT b_id AS u, a_id AS v FROM pairs),
          walk(node, label) AS (
            SELECT u AS node, u AS label FROM edges
            UNION
            SELECT e.v AS node, w.label AS label
            FROM walk w JOIN edges e ON e.u = w.node),
          cc AS (SELECT node, MIN(label) AS cluster_id FROM walk GROUP BY node)
          SELECT d.doc_id AS doc_id,
                 COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
                 d.doc_id = COALESCE(cc.cluster_id, d.doc_id) AS keep
          FROM documents d LEFT OUTER JOIN cc ON d.doc_id = cc.node
          ORDER BY doc_id"""
    }
}

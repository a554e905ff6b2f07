package graft

import graft.ops.GraphOps
import org.apache.spark.sql.functions.col
import org.scalatest.prop.TableDrivenPropertyChecks
import scala.util.Random

/** Connected components checked against a reference union-find: the
  * star-contraction algorithm must agree with naive transitive closure on
  * every topology (chains stress round count, cliques stress edge volume,
  * random graphs stress everything else). */
class GraphOpsSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def pairsDf(es: Seq[(Long, Long)]) =
    es.toDF("a_id", "b_id")

  /** Reference: union-find with path compression. */
  private def unionFind(nodes: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = component MIN, independent of union order
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }
  }

  private def ccMap(es: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(pairsDf(es)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components match union-find on random graphs") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val nodes = (0L until n.toLong).toSeq
      val es = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong; (a, b)
      }.filter { case (a, b) => a != b }
      val expected = unionFind(nodes, es)
      val got = ccMap(es)
      // the algorithm only labels non-isolated nodes; restrict to those
      val linked = es.flatMap { case (a, b) => Seq(a, b) }.toSet
      assert(got === expected.filter { case (k, _) => linked(k) },
        s"trial $trial mismatch")
    }
  }

  test("a 64-node chain contracts to one min-rooted star within the round cap") {
    val es = (0L until 63L).map(i => (i, i + 1))
    val got = ccMap(es)
    assert(got.size === 64 && got.values.forall(_ == 0L))
  }

  test("a 256-node chain (worst-case diameter) still converges under the cap") {
    // a path graph is the adversarial topology for label propagation
    // (diameter = n); star contraction must close it in O(log^2 n) rounds
    val es = (0L until 255L).map(i => (i, i + 1))
    val got = ccMap(es)
    assert(got.size === 256 && got.values.forall(_ == 0L))
  }

  test("a dense 300-node random graph matches union-find") {
    val rnd = new Random(42)
    val n = 300
    val nodes = (0L until n.toLong).toSeq
    val es = Seq.fill(4 * n) {
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.filter { case (a, b) => a != b }
    val expected = unionFind(nodes, es)
    val linked = es.flatMap { case (a, b) => Seq(a, b) }.toSet
    assert(ccMap(es) === expected.filter { case (k, _) => linked(k) })
  }

  test("a clique, a chain, and a singleton pair stay separate components") {
    val clique = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = (10L until 14L).map(i => (i, i + 1))
    val pair = Seq((20L, 21L))
    val got = ccMap(clique ++ chain ++ pair)
    assert((0L to 4L).forall(got(_) == 0L))
    assert((10L to 14L).forall(got(_) == 10L))
    assert(got(20L) === 20L && got(21L) === 20L)
  }

  test("dedupClusters covers every doc once; keep marks exactly the cluster minima") {
    val docs = (0L until 10L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text")
    val pairs = pairsDf(Seq((1L, 3L), (3L, 5L), (7L, 8L))) // {1,3,5}, {7,8}
    val rows = GraphOps.dedupClusters(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(_._1).toSeq === (0L until 10L).toSeq) // total, ordered
    val cluster = rows.map(r => r._1 -> r._2).toMap
    assert(cluster(3L) === 1L && cluster(5L) === 1L && cluster(8L) === 7L)
    assert(cluster(0L) === 0L && cluster(9L) === 9L) // singletons self-labeled
    val kept = rows.filter(_._3).map(_._1).toSet
    assert(kept === Set(0L, 1L, 2L, 4L, 6L, 7L, 9L)) // drop 3,5 (→1) and 8 (→7)
  }

  test("an empty pair table makes every doc its own kept singleton") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val empty = pairsDf(Seq.empty)
    val rows = GraphOps.dedupClusters(docs, empty).collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1) && r.getBoolean(2)))
  }

  test("soft-dedup weights: each member carries exactly 1/|cluster|") {
    // clusters {1,2,3}→1, {4}→4, {5,6}→5 (the q66 output shape)
    val clusters = Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false))
      .toDF("doc_id", "cluster_id", "keep")
    val got = GraphOps.softDedupWeights(clusters)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 3L, 1.0 / 3), (2L, 1L, 3L, 1.0 / 3), (3L, 1L, 3L, 1.0 / 3),
      (4L, 4L, 1L, 1.0), (5L, 5L, 2L, 0.5), (6L, 5L, 2L, 0.5)))
    // corpus sampling mass = one unit per distinct content cluster
    assert(math.abs(got.map(_._4).sum - 3.0) < 1e-12)
  }

  test("cluster canon keeps the max-score member, min-id on ties") {
    // cluster 1 = {1,2,3}: doc 2 scores highest; cluster 5 = {5,6}: tied
    // scores, so the canon falls back to the smaller doc_id; {4} trivial
    val clusters = Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false))
      .toDF("doc_id", "cluster_id", "keep")
    val scores = Seq((1L, 10L), (2L, 40L), (3L, 30L),
      (4L, -5L), (5L, 7L), (6L, 7L)).toDF("doc_id", "score_micro")
    val got = GraphOps.clusterCanon(clusters, scores)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 10L, 2L, false), (2L, 1L, 40L, 2L, true),
      (3L, 1L, 30L, 2L, false), (4L, 4L, -5L, 4L, true),
      (5L, 5L, 7L, 5L, true), (6L, 5L, 7L, 5L, false)))
  }

  test("cluster canon invariants on the real corpus: one canon per cluster, never outscored") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.ops.DedupOps.lshPairs(docs)
    val clusters = GraphOps.dedupClusters(docs, pairs)
    val scores = graft.ops.QualityModelOps.qualityClassifier(docs)
      .select("doc_id", "score_micro")
    val got = GraphOps.clusterCanon(clusters, scores)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1).distinct.length === got.length) // total, one row per doc
    got.groupBy(_._2).foreach { case (cid, members) =>
      val canons = members.filter(_._5)
      assert(canons.length === 1, s"cluster $cid has ${canons.length} canons")
      val canon = canons.head
      assert(canon._1 === canon._4)
      val best = members.map(_._3).max
      assert(canon._3 === best, s"cluster $cid canon outscored")
      // min-id among the best-scoring members
      assert(canon._1 === members.filter(_._3 == best).map(_._1).min)
      assert(members.forall(_._4 == canon._1))
    }
  }

  test("cross-source dup matrix: hand clusters count pairs exactly, singletons excluded") {
    // cluster 1 = {a, b, b}, cluster 4 = {a, a}, doc 7 = singleton (dropped)
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (7L, 7L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "a"), (5L, "a"), (7L, "c"))
      .toDF("doc_id", "source")
    val got = GraphOps.crossSourceDups(clusters, docs)
      .as[(String, String, Long)].collect().toSeq
    // cluster 1 holds ONE a — it must NOT read as a self-duplicating;
    // its two b members light (b,b), and a+b present lights (a,b);
    // cluster 4's two a members light (a,a); source c never appears
    assert(got === Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "b", 1L)))
  }

  test("cross-source dup matrix on the real corpus: symmetric-upper, bounded, consistent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.ops.DedupOps.lshPairs(docs)
    val clusters = GraphOps.dedupClusters(docs, pairs)
    val got = GraphOps.crossSourceDups(clusters, docs)
      .as[(String, String, Long)].collect().toSeq
    val nSources = docs.select("source").distinct().count()
    assert(got.nonEmpty && got.size <= nSources * (nSources + 1) / 2)
    assert(got.forall { case (a, b, n) => a <= b && n > 0 })
    // every pair count is bounded by the number of true dup clusters
    val nDup = clusters.groupBy("cluster_id").count()
      .filter(col("count") >= 2).count()
    assert(got.forall(_._3 <= nDup))
  }
  test("cross-source dup matrix buckets NULL sources under the sentinel, never drops them") {
    // cluster 1 = {null, a}, cluster 3 = {null, null}: under three-valued
    // logic a null source fails both self-join predicates and the members
    // would silently vanish; the sentinel keeps them visible
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq((1L, null), (2L, "a"), (3L, null), (4L, null))
      .asInstanceOf[Seq[(Long, String)]].toDF("doc_id", "source")
    val got = GraphOps.crossSourceDups(clusters, docs)
      .as[(String, String, Long)].collect().toSeq
    val s0 = GraphOps.NullSourceSentinel
    assert(got === Seq((s0, s0, 1L), (s0, "a", 1L)))
  }

  /** Reference: brute-force triangle count — for every edge, intersect
    * the endpoints' neighbor sets; each triangle counted 3× then divided. */
  private def triRef(es: Seq[(Long, Long)]): (Long, Long) = {
    val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val nbr = (canon ++ canon.map(_.swap)).groupBy(_._1)
      .map { case (n, xs) => n -> xs.map(_._2).toSet }
    val t3 = canon.map { case (a, b) => (nbr(a) intersect nbr(b)).size.toLong }.sum
    val wedges = nbr.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    (t3 / 3, wedges)
  }

  test("q142 triangles: K3, K4, path, and star match the brute-force reference") {
    val cases = Seq(
      ("K3", Seq((1L, 2L), (2L, 3L), (1L, 3L)), 1L, 1.0),
      ("K4", Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)), 4L, 1.0),
      ("path", Seq((1L, 2L), (2L, 3L), (3L, 4L)), 0L, 0.0),
      ("star", Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)), 0L, 0.0))
    cases.foreach { case (name, es, wantTri, wantC) =>
      val row = GraphOps.triangleCensus(pairsDf(es)).collect().head
      val (refT, refW) = triRef(es)
      assert(row.getLong(3) === wantTri, s"$name triangles")
      assert(row.getLong(3) === refT && row.getLong(2) === refW, s"$name vs reference")
      assert(row.getDouble(4) === wantC, s"$name clustering coefficient")
    }
    // duplicate + reversed + self-loop edges collapse before counting
    val messy = GraphOps.triangleCensus(pairsDf(
      Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (2L, 2L)))).collect().head
    assert(messy.getLong(1) === 3L && messy.getLong(3) === 1L)
  }

  test("q142 triangles on the corpus pair graph: matches brute force; partitioning invariance") {
    val pairs = graft.ops.DedupOps.lshPairs(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val es = pairs.select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    val row = GraphOps.triangleCensus(pairs).collect().head
    val (refT, refW) = triRef(es)
    assert(row.getLong(3) === refT && row.getLong(2) === refW)
    assert(refT > 0L,
      "the near-dup corpus must contain at least one triangle for C to mean anything")
    val reparted = GraphOps.triangleCensus(pairs.repartition(7)).collect().head
    assert(reparted.toSeq === row.toSeq)
  }

  test("q150 co-purchase NN: hand graph — cosine argmax, min-id ties, hot-customer cap") {
    // c1 buys from s1+s2 (order 10); c2 from s1 (20) and s2 (21); c3 from
    // s1+s3 (order 30) → cos(s1,s2)=2/√6 beats cos(s1,s3)=1/√3
    val orders = Seq((10L, 1L), (20L, 2L), (21L, 2L), (30L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 1L), (10L, 2L), (20L, 1L), (21L, 2L), (30L, 1L), (30L, 3L))
      .toDF("l_orderkey", "l_suppkey")
    val got = GraphOps.coPurchaseNeighbors(orders, li).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    assert(got(1L) === ((2L, 2L, 2.0 / math.sqrt(3.0 * 2.0))), s"got ${got(1L)}")
    assert(got(2L)._1 === 1L && got(3L)._1 === 1L)
    // equal cosines tie-break to the smaller partner id
    val o2 = Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
    val l2 = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L)).toDF("l_orderkey", "l_suppkey")
    val tie = GraphOps.coPurchaseNeighbors(o2, l2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tie(1L) === 2L, "cos(s1,s2) == cos(s1,s3) must pick s2")
    // a customer over the cap contributes NO pairs
    val capped = GraphOps.coPurchaseNeighbors(o2, l2, cap = 1L).collect()
    assert(capped.isEmpty, "both customers exceed cap=1 — no projection survives")
  }

  test("q150 co-purchase NN on the corpus: matches a brute-force reference; partitioning invariance") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val rows = GraphOps.coPurchaseNeighbors(orders, li).collect()
    assert(rows.nonEmpty)
    // brute force over the collected capped edge list
    val es = orders.select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
      .map { case (ok, c) => ok -> c }.toMap
    val pairs = li.select("l_orderkey", "l_suppkey").as[(Long, Long)].collect()
      .flatMap { case (ok, s) => es.get(ok).map(c => (c, s)) }.distinct
    val byCust = pairs.groupBy(_._1).filter(_._2.length <= GraphOps.CoPurchaseCapSupp)
    val kept = byCust.values.flatten.toSeq
    val deg = kept.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    val co = byCust.values.toSeq.flatMap { cs =>
      val ss = cs.map(_._2).toSeq
      for (a <- ss; b <- ss if a != b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val want = co.keys.map(_._1).toSeq.distinct.sorted.map { s =>
      val cands = co.collect { case ((`s`, t), n) =>
        (t, n, n.toDouble / math.sqrt(deg(s).toDouble * deg(t).toDouble)) }
      val bc = cands.map(_._3).max
      val (t, n, c) = cands.filter(_._3 == bc).minBy(_._1)
      s -> (t, n, c)
    }.toMap
    val got = rows.map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    assert(got === want, s"${got.size} vs ${want.size} suppliers")
    val reparted = GraphOps.coPurchaseNeighbors(orders.repartition(7), li.repartition(5))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  /** Reference: the exact integer PageRank recursion on the driver —
    * the same per-edge r/deg floor division and per-node 85·m/100 floor,
    * so the DataFrame loop must match bit-for-bit. */
  private def pageRankLocal(edges: Seq[(Long, Long)],
                            rounds: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(_.swap)).distinct
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var r = deg.keys.map(_ -> GraphOps.PageRankInitMicro).toMap
    for (_ <- 1 to rounds) {
      val m = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      sym.foreach { case (src, dst) => m(dst) += r(src) / deg(src) }
      r = r.keys.map(n => n -> (150000L + 85L * m(n) / 100L)).toMap
    }
    r
  }

  test("q197 BFS radius: path graph layers exactly, hop budget cuts, capped edges drop; corpus matches an unbounded driver BFS") {
    // path s1(0)-c1(1)-s2(2)-c2(3)-s3(4)-c4(5: beyond the 4-hop budget ->
    // NULL though connected); c5 trades with s1 only in a BIG lot (qty 10
    // -> edge excluded -> NULL: outside the small-lot graph entirely)
    val supplier = Seq((1L, 500.0), (2L, 5000.0), (3L, 5000.0))
      .toDF("s_suppkey", "s_acctbal")
    val customer = Seq(1L, 2L, 4L, 5L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (20L, 2L), (30L, 4L), (40L, 5L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1L, 1.0), (10L, 2L, 2.0), (20L, 2L, 1.0),
      (20L, 3L, 3.0), (30L, 3L, 1.0), (40L, 1L, 10.0))
      .toDF("l_orderkey", "l_suppkey", "l_quantity")
    val got = GraphOps.bfsBlastRadius(customer, supplier, orders, lineitem)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got === Map(
      ("supplier", 1L) -> Some(0L), ("customer", 1L) -> Some(1L),
      ("supplier", 2L) -> Some(2L), ("customer", 2L) -> Some(3L),
      ("supplier", 3L) -> Some(4L), ("customer", 4L) -> None,
      ("customer", 5L) -> None))
    // corpus: unbounded driver BFS — also proves the hop budget exceeds
    // the graph's eccentricity (every reachable node's distance <= 4)
    val dir = "/root/testdata/sf0.001"
    val (c, s, o, l) = (Tables.customer(spark, dir), Tables.supplier(spark, dir),
      Tables.orders(spark, dir), Tables.lineitem(spark, dir))
    val real = GraphOps.bfsBlastRadius(c, s, o, l).collect()
    val eb = o.join(l.filter(col("l_quantity") <= GraphOps.BfsQtyCap),
        o("o_orderkey") === l("l_orderkey"))
      .selectExpr("o_custkey * 2", "l_suppkey * 2 + 1").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Array[Long]] = (eb ++ eb.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val seeds = s.filter(col("s_acctbal") < GraphOps.BfsSeedBal)
      .selectExpr("s_suppkey * 2 + 1").collect().map(_.getLong(0))
    val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    val queue = scala.collection.mutable.Queue(seeds: _*)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      adj.getOrElse(u, Array.empty[Long]).foreach { v =>
        if (!dist.contains(v)) { dist(v) = dist(u) + 1; queue += v }
      }
    }
    assert(dist.values.max <= GraphOps.BfsRounds,
      "the hop budget must exceed the corpus graph's eccentricity")
    real.foreach { r =>
      val node = if (r.getString(0) == "customer") r.getLong(1) * 2
                 else r.getLong(1) * 2 + 1
      assert((if (r.isNullAt(2)) None else Some(r.getLong(2))) === dist.get(node),
        s"${r.getString(0)} ${r.getLong(1)}")
    }
    assert(real.exists(_.isNullAt(2)) && real.exists(!_.isNullAt(2)),
      "the corpus must populate both the reached and unreached branches")
    val reparted = GraphOps.bfsBlastRadius(c.repartition(7), s, o,
      l.repartition(5)).collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q208 k-core: the peel cascades (a node dies only after its neighbor does), core degrees exact; corpus replay + fixpoint") {
    // k=2 hand graph: 4-cycle c1-s1-c2-s2 survives; c3 (one partner)
    // peels round 1; s3 (one partner) peels round 1, which drops c4 to
    // one partner — it peels round 2: the CASCADE a one-shot degree
    // filter cannot express
    val customer = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val supplier = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0))
      .toDF("s_suppkey", "s_acctbal")
    val orders = Seq((10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L),
      (30L, 1L), (40L, 3L), (40L, 2L))
      .map { case (o, s) => (o, s, 1.0) }
      .toDF("l_orderkey", "l_suppkey", "l_quantity")
    val got = GraphOps.kCore(customer, supplier, orders, lineitem,
        k = 2L, rounds = 5).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    def row(t: String, k: Long) = got((t, k))
    Seq(("customer", 1L), ("customer", 2L), ("supplier", 1L), ("supplier", 2L))
      .foreach { case (t, k) =>
        val r = row(t, k)
        assert(r.getBoolean(2) && r.getLong(3) === 2L && r.isNullAt(4), s"$t $k")
      }
    assert(!row("customer", 3L).getBoolean(2) &&
      row("customer", 3L).getLong(4) === 1L)
    assert(row("supplier", 3L).getLong(4) === 1L)
    assert(row("customer", 4L).getLong(4) === 2L,
      "c4 must die in round TWO — only after s3's removal starves it")
    // corpus at sf0.001: exact driver peel replay + fixpoint stability
    val dir = "/root/testdata/sf0.001"
    val (c, s, o, l) = (Tables.customer(spark, dir), Tables.supplier(spark, dir),
      Tables.orders(spark, dir), Tables.lineitem(spark, dir))
    val real = GraphOps.kCore(c, s, o, l).collect()
    val eb = o.join(l.filter(col("l_quantity") <= GraphOps.BfsQtyCap),
        o("o_orderkey") === l("l_orderkey"))
      .selectExpr("o_custkey * 2", "l_suppkey * 2 + 1").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Set[Long]] = (eb ++ eb.map(_.swap)).groupBy(_._1)
      .map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val nodes = (c.selectExpr("c_custkey * 2").collect().map(_.getLong(0)) ++
      s.selectExpr("s_suppkey * 2 + 1").collect().map(_.getLong(0))).toSet
    var alive = nodes
    val removedAt = scala.collection.mutable.Map.empty[Long, Long]
    var r = 0
    var changed = true
    while (changed && r < GraphOps.KCoreRounds) {
      r += 1
      val deg = alive.map(n => n -> adj.getOrElse(n, Set.empty).count(alive)).toMap
      val drop = alive.filter(n => deg(n) < GraphOps.KCoreK)
      changed = drop.nonEmpty
      drop.foreach(n => removedAt(n) = r.toLong)
      alive = alive -- drop
    }
    assert(alive.forall(n =>
      adj.getOrElse(n, Set.empty).count(alive) >= GraphOps.KCoreK),
      "fixpoint: one more peel must remove nothing")
    real.foreach { rr =>
      val node = if (rr.getString(0) == "customer") rr.getLong(1) * 2
                 else rr.getLong(1) * 2 + 1
      assert(rr.getBoolean(2) === alive.contains(node))
      if (alive.contains(node)) {
        assert(rr.getLong(3) === adj(node).count(alive).toLong && rr.isNullAt(4))
      } else {
        assert(rr.isNullAt(3) && rr.getLong(4) === removedAt(node))
      }
    }
    val reparted = GraphOps.kCore(c.repartition(7), s, o, l.repartition(5))
      .collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q140 pagerank: hand graph matches the exact integer reference; hub outranks leaves") {
    // star: customer 1 buys from suppliers 1,2,3; customer 2 from supplier 1
    // orders (o_orderkey, o_custkey); lineitem (l_orderkey, l_suppkey)
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1L), (10L, 2L), (11L, 3L), (12L, 1L))
      .toDF("l_orderkey", "l_suppkey")
    // node ids: cust c → 2c, supp s → 2s+1
    val edges = Seq((2L, 3L), (2L, 5L), (2L, 7L), (4L, 3L))
    val want = pageRankLocal(edges, GraphOps.PageRankRounds)
    val got = GraphOps.pageRank(orders, lineitem).collect()
      .map { r =>
        val node = if (r.getString(0) == "customer") r.getLong(1) * 2
                   else r.getLong(1) * 2 + 1
        node -> r.getLong(2)
      }.toMap
    assert(got === want, s"got $got want $want")
    // supplier 1 (node 3) has two in-edges — it must outrank the
    // single-customer suppliers 2 and 3
    assert(got(3L) > got(5L) && got(3L) > got(7L))
    // customer 1 (node 2, three purchases) outranks customer 2 (one)
    assert(got(2L) > got(4L))
  }

  test("q140 pagerank on the corpus: mass bounded, every node ranked, partitioning invariance") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val rows = GraphOps.pageRank(orders, lineitem).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val n = rows.length.toLong
    // floor division only ever LEAKS mass: the total never exceeds the
    // initial N·10⁶, and damping keeps every node at least the 0.15 base
    assert(total <= n * GraphOps.PageRankInitMicro)
    assert(rows.forall(_.getLong(2) >= 150000L))
    // both node types present, keys unique within type
    val byType = rows.groupBy(_.getString(0))
    assert(byType.keySet === Set("customer", "supplier"))
    byType.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).distinct.length === rs.length)
    }
    val reparted = GraphOps.pageRank(orders.repartition(7), lineitem.repartition(5))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

}

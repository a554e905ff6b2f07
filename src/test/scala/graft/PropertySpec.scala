package graft

import org.apache.spark.sql.functions._

import graft.ops.Exact

/** Seeded randomized properties for the determinism-critical primitives —
  * the invariants the oracle machinery rests on, checked over hundreds of
  * adversarial inputs rather than a handful of fixtures. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("graft_shingles equals the naive sliding window on 300 random token arrays") {
    graft.expressions.GraftFunctions.register(spark)
    val cases = (1 to 300).map { i =>
      val n = rnd.nextInt(8)
      // tokens may be empty strings — split() produces those too
      val tokens = Seq.fill(n)(rnd.alphanumeric.take(rnd.nextInt(4)).mkString)
      (i.toLong, tokens.mkString(" "))
    }
    val got = cases.toDF("id", "text")
      .selectExpr("id", "graft_shingles(split(text, ' '), 3) AS sh")
      .as[(Long, Seq[String])].collect().toMap
    cases.foreach { case (id, text) =>
      val tokens = text.split(" ", -1).toSeq // -1: keep trailing empties, like Spark
      val naive =
        if (tokens.length < 3) Seq.empty
        else tokens.sliding(3).map(_.mkString(" ")).toSeq
      assert(got(id) === naive, s"case $id: '$text'")
    }
  }

  test("exact-cents sums are invariant under repartitioning (500 random amounts)") {
    val amounts = Seq.fill(500)((rnd.nextInt(2000000) - 1000000) / 100.0).toDF("v")
    def total(partitions: Int): Double =
      amounts.repartition(partitions)
        .agg(Exact.sumD(col("v"), 2).as("s")).as[Double].collect().head
    val expected = total(1)
    Seq(3, 7, 32).foreach { p =>
      assert(java.lang.Double.doubleToRawLongBits(total(p))
        === java.lang.Double.doubleToRawLongBits(expected), s"partitions $p")
    }
  }

  test("graft_dot is bit-identical to the HOF fold on 200 random vector pairs") {
    graft.expressions.GraftFunctions.register(spark)
    val pairs = (1 to 200).map { i =>
      val d = 1 + rnd.nextInt(64)
      (i.toLong,
        Seq.fill(d)(rnd.nextDouble() * 20 - 10),
        Seq.fill(d)(rnd.nextDouble() * 20 - 10))
    }
    val rows = pairs.toDF("id", "a", "b").selectExpr(
      "id",
      "graft_dot(a, b) AS native",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS hof")
      .as[(Long, Double, Double)].collect()
    rows.foreach { case (id, native, hof) =>
      assert(java.lang.Double.doubleToRawLongBits(native)
        === java.lang.Double.doubleToRawLongBits(hof), s"case $id")
    }
    // and both equal the local left fold
    val local = pairs.map { case (id, a, b) =>
      id -> a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    }.toMap
    rows.foreach { case (id, native, _) =>
      assert(java.lang.Double.doubleToRawLongBits(native)
        === java.lang.Double.doubleToRawLongBits(local(id)), s"local $id")
    }
  }

  test("KMV intersection estimator lands within 3σ on 60 random set pairs") {
    // the q65 gate, exercised in the SATURATED regime the test corpus only
    // reaches at sf0.1: random set pairs with planted overlaps, hashed the
    // same way (md5 prefix → 60-bit), estimated from k-mins exactly as the
    // SQL estimator computes it. Seeded → deterministic: green once is
    // green forever, and ~0.3% per-check 3σ violations would have surfaced
    // across the 60 cases if the estimator or bound were wrong.
    val kmvRnd = new scala.util.Random(13)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    var checked = 0
    (1 to 60).foreach { i =>
      val k = 256
      val nA = 500 + kmvRnd.nextInt(4000)
      val nB = 500 + kmvRnd.nextInt(4000)
      val nCommon = kmvRnd.nextInt(math.min(nA, nB) / 2)
      val common = (1 to nCommon).map(j => s"c$i-$j")
      val a = (common ++ (1 to (nA - nCommon)).map(j => s"a$i-$j")).map(h60)
      val b = (common ++ (1 to (nB - nCommon)).map(j => s"b$i-$j")).map(h60)
      val sk = new graft.ops.SketchOps.KmvSketch(k)
      val skA = a.foldLeft(Vector.empty[Long])(sk.reduce)
      val skB = b.foldLeft(Vector.empty[Long])(sk.reduce)
      // the SQL estimator, replicated: Uk, θ-scaled union, Jaccard × union
      val uk = (skA ++ skB).distinct.sorted.take(k)
      val unionEst =
        if (uk.length < k) uk.length.toDouble
        else (k - 1).toDouble / (uk.last.toDouble / (1L << 60).toDouble)
      val commonInUk = uk.count(v => skA.contains(v) && skB.contains(v))
      val interEst =
        if (uk.isEmpty) 0.0 else commonInUk.toDouble / uk.length * unionEst
      val sigma = 3.0 * math.sqrt(
        math.max(math.max(interEst, nCommon.toDouble), 1.0) * unionEst / k)
      assert(math.abs(interEst - nCommon) <= math.max(2.0, sigma),
        s"case $i: est $interEst vs exact $nCommon (bound ${math.max(2.0, sigma)})")
      checked += 1
    }
    assert(checked === 60)
  }

  test("Misra-Gries bounds hold on 200 random streams, sequential AND merged") {
    // the invariants q64 and StreamHeavyHitters rest on: capacity never
    // exceeded, counts are undercounts by at most n/(k+1), and every item
    // above that bound survives — for the sequential fold and for any
    // segmentation folded separately then merged (the partial-agg path)
    val mgRnd = new scala.util.Random(7)
    (1 to 200).foreach { i =>
      val k = 2 + mgRnd.nextInt(12)
      val universe = 1 + mgRnd.nextInt(40)
      val n = 20 + mgRnd.nextInt(300)
      // power-skewed draw so some items are genuinely heavy
      val stream = Vector.fill(n)(
        s"x${(math.pow(mgRnd.nextDouble(), 2.5) * universe).toInt}")
      val mg = new graft.ops.SketchOps.MisraGries(k)
      val sequential = stream.foldLeft(Map.empty[String, Long])(mg.reduce)
      val segments = {
        val cuts = Vector.fill(1 + mgRnd.nextInt(4))(mgRnd.nextInt(n + 1)).sorted
        (0L +: cuts.map(_.toLong) :+ n.toLong).distinct.sliding(2).map {
          case Seq(a, b) => stream.slice(a.toInt, b.toInt)
        }.toVector
      }
      val merged = segments
        .map(_.foldLeft(Map.empty[String, Long])(mg.reduce))
        .reduce(mg.merge)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = n.toDouble / (k + 1)
      for ((label, summary) <- Seq("sequential" -> sequential, "merged" -> merged)) {
        assert(summary.size <= k, s"case $i $label: size ${summary.size} > $k")
        exact.foreach { case (t, c) =>
          if (c > bound)
            assert(summary.contains(t), s"case $i $label: lost heavy $t ($c > $bound)")
        }
        summary.foreach { case (t, c) =>
          assert(c > 0L && c <= exact(t), s"case $i $label: count $c vs exact ${exact(t)}")
          assert(exact(t) - c <= bound,
            s"case $i $label: undercount ${exact(t) - c} > $bound for $t")
        }
      }
    }
  }
}

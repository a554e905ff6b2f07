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

  test("bm25 matches a Scala model on 50 random corpora (micro-exact)") {
    val words = Vector("spark", "query", "dup", "a", "b", "c", "d")
    for (trial <- 1 to 50) {
      val nDocs = 2 + rnd.nextInt(8)
      val corpus = (1 to nDocs).map { i =>
        val len = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" "),
          "en", "s", 0L)
      }
      val d = corpus.toDF("doc_id", "text", "lang", "source", "n_chars")
      // Scala model: same formula, same op order, Math.log for ln
      val toks = corpus.map { case (id, t, _, _, _) => id -> t.split(" ", -1).toSeq }.toMap
      val n = nDocs.toLong
      val total = toks.values.map(_.size.toLong).sum
      val terms = graft.ops.TextOps.Bm25Terms
      val df = terms.map(t => t -> toks.count(_._2.contains(t)).toLong)
        .filter(_._2 > 0).toMap
      val expected = toks.toSeq.flatMap { case (id, tk) =>
        val micros = terms.flatMap { t =>
          val tf = tk.count(_ == t).toLong
          if (tf == 0 || !df.contains(t)) None
          else {
            val dl = tk.size.toLong
            val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
            val c = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / (total.toDouble / n))))
            Some(math.round(c * 1e6))
          }
        }
        if (micros.isEmpty) None else Some(id -> ((micros.size.toLong, micros.sum)))
      }.toMap
      val got = graft.ops.TextOps.bm25(d, topN = nDocs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("vocab mask invariants on 50 random corpora") {
    val words = Vector("w1", "w2", "w3", "w4", "w5", "w6")
    for (trial <- 1 to 50) {
      val corpus = (1 to 2 + rnd.nextInt(6)).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" "),
          "en", "s", 0L)
      }
      val d = corpus.toDF("doc_id", "text", "lang", "source", "n_chars")
      val k = 1 + rnd.nextInt(4)
      val rows = graft.ops.TextOps.vocabMask(d, topK = k).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val texts = corpus.map(c => c._1 -> c._2).toMap
      rows.foreach { case (id, masked, nMasked) =>
        val orig = texts(id).split(" ", -1)
        val out = masked.split(" ", -1)
        assert(out.length === orig.length, s"trial $trial doc $id: token count")
        // every token is either preserved in place or exactly '<unk>'
        orig.zip(out).foreach { case (o, m) =>
          assert(m == o || m == "<unk>", s"trial $trial doc $id")
        }
        assert(nMasked === out.count(_ == "<unk>"), s"trial $trial doc $id: n_masked")
        // masking is consistent: a token form is either always kept or always masked
        val verdicts = orig.zip(out).groupBy(_._1).view
          .mapValues(_.map(p => p._2 == "<unk>").toSet)
        verdicts.foreach { case (tok, vs) =>
          assert(vs.size === 1, s"trial $trial doc $id: '$tok' masked inconsistently")
        }
      }
    }
  }

  test("incremental dedup equals the symmetric cross-cut on 10 random corpora") {
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 10) {
      def randDoc(id: Long) =
        (id, Seq.fill(4 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "),
          "en", "s", 0L)
      val corpus = (1L to 8L).map(randDoc)
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val incIds = Set(20L, 21L, 22L)
      val inc = incIds.toSeq.sorted.map(randDoc)
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = graft.ops.DedupOps.incrementalLshPairs(corpus, inc)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val full = graft.ops.DedupOps.lshPairs(corpus.unionByName(inc))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val expected = full.collect {
        case (a, b) if incIds(b) && !incIds(a) => (a, b)
        case (a, b) if incIds(a) && !incIds(b) => (b, a)
      }
      assert(got === expected, s"trial $trial")
    }
  }

  test("sequence packing matches a Scala prefix-sum model on 20 random corpora") {
    for (trial <- 1 to 20) {
      val budget = 5 + rnd.nextInt(20)
      val corpus = (1L to (3 + rnd.nextInt(10)).toLong).map { id =>
        (id, Seq.fill(1 + rnd.nextInt(12))("w").mkString(" "), "en", "s", 0L)
      }
      val d = corpus.toDF("doc_id", "text", "lang", "source", "n_chars")
      var cum = 0L
      val expected = corpus.map { case (id, text, _, _, _) =>
        val n = text.split(" ", -1).length.toLong
        val start = cum; cum += n
        (id, n, start, start / budget, (cum - 1) / budget)
      }
      val got = graft.ops.PipelineOps.sequencePacking(d, budget)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(got === expected, s"trial $trial budget $budget")
    }
  }

  test("mixture weights match a Scala model on 20 random strata") {
    for (trial <- 1 to 20) {
      val corpus = (1L to (5 + rnd.nextInt(30)).toLong).map { id =>
        (id, "t", s"l${rnd.nextInt(3)}", s"s${rnd.nextInt(3)}", 0L)
      }
      val d = corpus.toDF("doc_id", "text", "lang", "source", "n_chars")
      val counts = corpus.groupBy(c => (c._3, c._4)).view.mapValues(_.size.toLong).toMap
      val micros = counts.view.mapValues(n => math.round(math.sqrt(n.toDouble) * 1e6)).toMap
      val total = micros.values.sum
      val got = graft.ops.PipelineOps.mixtureWeights(d)
        .as[(String, String, Long, Long, Double)].collect()
      got.foreach { case (l, s, n, w, p) =>
        assert(n === counts((l, s)), s"trial $trial n")
        assert(w === micros((l, s)), s"trial $trial w")
        assert(p === w / total.toDouble, s"trial $trial p")
      }
      assert(got.length === counts.size)
    }
  }

  test("ingest-guard agreement equals the batch signature overlap (30 random pairs)") {
    graft.expressions.GraftFunctions.register(spark)
    val words = Vector("p", "q", "r", "s", "t", "u", "v", "w")
    val pairs = (1 to 30).map { i =>
      val base = Seq.fill(5 + rnd.nextInt(10))(words(rnd.nextInt(words.size)))
      // mutate a few tokens to vary similarity
      val mut = base.map(t => if (rnd.nextInt(4) == 0) words(rnd.nextInt(words.size)) else t)
      (i.toLong, base.mkString(" "), mut.mkString(" "))
    }
    // batch signatures via minhashSignature (mh columns)
    def sigs(col2: Int) = {
      val df = pairs.map(p => (p._1, if (col2 == 1) p._2 else p._3, "en", "s", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      graft.ops.DedupOps.minhashSignature(df).collect()
        .map(r => r.getLong(0) -> (1 to 8).map(r.getString).toSeq).toMap
    }
    val (sa, sb) = (sigs(1), sigs(2))
    // the guard's estimator over the same signature arrays, computed in SQL
    val est = pairs.filter(p => sa.contains(p._1) && sb.contains(p._1)).map { p =>
      val agree = sa(p._1).zip(sb(p._1)).count { case (x, y) => x == y } / 8.0
      p._1 -> agree
    }.toMap
    val sqlAgree = pairs.map(p => (p._1, sa.get(p._1).orNull, sb.get(p._1).orNull))
      .filter(p => p._2 != null && p._3 != null)
      .toDF("id", "sig", "corpus_sig")
      .selectExpr("id",
        "size(filter(zip_with(sig, corpus_sig, (a, b) -> a = b), x -> x)) / CAST(8 AS DOUBLE) AS agree")
      .as[(Long, Double)].collect().toMap
    assert(sqlAgree === est)
  }

  test("DSIR weights match a Scala bigram model on 15 random corpora (micro-exact)") {
    val words = Vector("a", "b", "c", "d", "e")
    def bucket(id: Long): Int = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))(0) & 0xff
    for (c <- 1 to 15) {
      val docs = (1 to 40).map { i =>
        val id = c * 1000L + i
        val toks = Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.size)))
        (id, toks.mkString(" "), "en", "s", 0L)
      }
      val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      // Scala model: identical formula, identical rounding
      def split(id: Long) =
        if (bucket(id) < 204) "train" else if (bucket(id) < 230) "val" else "test"
      def bigrams(t: String) = {
        val ts = t.split(" ", -1).toSeq
        if (ts.length < 2) Seq.empty else ts.sliding(2).map(_.mkString(" ")).toSeq
      }
      val bySplit = docs.map(d => (d._1, split(d._1), bigrams(d._2)))
        .filter(_._2 != "val")
      val tc = bySplit.filter(_._2 == "test").flatMap(_._3)
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val rc = bySplit.filter(_._2 == "train").flatMap(_._3)
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val v = (tc.keySet ++ rc.keySet).size.toLong
      val (tt, tr) = (tc.values.sum, rc.values.sum)
      def micro(bg: String): Long = math.round(
        (math.log(tc.getOrElse(bg, 0L) + 1.0) - math.log(tt + v.toDouble)
          - math.log(rc.getOrElse(bg, 0L) + 1.0) + math.log(tr + v.toDouble)) * 1e6)
      val exp = bySplit.filter(_._2 == "train").map { case (id, _, bgs) =>
        id -> (bgs.size.toLong, bgs.map(micro).sum)
      }.toMap
      val got = graft.ops.TextOps.dsirWeights(df)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === exp, s"corpus $c drifted")
    }
  }

  test("epoch order is a permutation with contiguous per-shard ranks on 20 random corpora") {
    (1 to 20).foreach { c =>
      val n = 1 + rnd.nextInt(200)
      val epoch = 1L + rnd.nextInt(5)
      // adversarial ids: sparse, unordered, arbitrary gaps
      val ids = scala.util.Random.shuffle(
        (1 to n).map(_ => rnd.nextLong() & 0xffffffffL).distinct.toList)
      val df = ids.map(id => (id, s"doc $id", "en", "s1", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = graft.ops.PipelineOps.epochOrder(df, epoch)
        .select("shard", "shard_seq", "doc_id", "pos")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got.map(_._3).sorted === ids.sorted, s"corpus $c: not a permutation")
      got.groupBy(_._1).foreach { case (shard, rows) =>
        assert(rows.map(_._4).sorted === (1L to rows.size).toSeq,
          s"corpus $c shard $shard: ranks not contiguous")
        assert(rows.map(_._2).distinct.size === 1,
          s"corpus $c shard $shard: inconsistent shard_seq")
      }
      // shard_seq ranks each shard among ALL 16 dial shards (populated or
      // not): distinct per shard, inside [1, 16]
      val seqs = got.map(r => r._1 -> r._2).distinct.map(_._2)
      assert(seqs.distinct.size === seqs.size && seqs.forall(s => s >= 1L && s <= 16L),
        s"corpus $c: bad visit order $seqs")
    }
  }

  test("leak-free split never tears a component on 15 random cluster tables") {
    (1 to 15).foreach { c =>
      val n = 2 + rnd.nextInt(100)
      val nClusters = 1 + rnd.nextInt(n)
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(nClusters).toLong))
      val clusters = rows.toDF("doc_id", "cluster_id")
      val got = graft.ops.PipelineOps.leakFreeSplit(clusters)
        .as[(Long, Long, String, String, Boolean)].collect().toSeq
      assert(got.size === n, s"table $c: not total")
      got.groupBy(_._2).foreach { case (cid, members) =>
        assert(members.map(_._3).distinct.size === 1, s"table $c cluster $cid torn")
        val torn = members.map(_._4).distinct.size > 1
        assert(members.forall(_._5 === torn), s"table $c cluster $cid flag wrong")
      }
    }
  }

  test("TopKByCount equals the sorted selection on 100 random count tables under any segmentation") {
    // the q157/q164 selection invariant: because each key reaches the
    // aggregate exactly once, ANY split of the rows folded separately
    // and merged must equal the sorted top-K of the whole — with ties at
    // the boundary broken by key, and undersized inputs kept whole
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { c =>
      val k = 1 + rnd.nextInt(10)
      val n = rnd.nextInt(40)
      // heavy tie pressure: counts drawn from a tiny range
      val rows = (0 until n).map(i =>
        (0L, f"k$i%03d", (1 + rnd.nextInt(4)).toLong))
      val agg = new graft.ops.SketchOps.TopKByCount(k)
      val expect = rows.map { case (_, key, cnt) => (cnt, key) }
        .sortBy { case (cnt, key) => (-cnt, key) }.take(k)
        .map { case (cnt, key) => (key, cnt) }
      val cuts = Vector.fill(1 + rnd.nextInt(4))(rnd.nextInt(n + 1)).sorted
      val segments = (0 +: cuts :+ n).distinct.sliding(2).collect {
        case Seq(a, b) => rows.slice(a, b)
      }.toVector
      val merged = segments
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged).toSeq === expect,
        s"table $c (k=$k, n=$n): segmented fold diverged from the sorted selection")
    }
  }

  test("theta sketches truncate-merge: bottom-K of shard bottom-Ks = corpus bottom-K, and the common-θ algebra survives merging (40 random splits)") {
    // the law q194/q202's scale story rests on, proven from first
    // principles: a sketch built from per-shard sketches is the corpus
    // sketch — so the set-operation estimates computed from merged
    // sketches are the single-pass estimates, bit for bit
    val k = 16
    val thRnd = new scala.util.Random(101)
    (1 to 40).foreach { trial =>
      val universe = (1 to 200).map(_ => thRnd.nextLong() & 0xFFFFFFFFFFFFL)
        .distinct
      val shards = universe.groupBy(_ => thRnd.nextInt(4)).values.toSeq
      def sketchOf(xs: Seq[Long]) = xs.distinct.sorted.take(k)
      val merged = sketchOf(shards.flatMap(sketchOf))
      assert(merged === sketchOf(universe), s"trial $trial: truncate-merge")
      // θ from the merged sketch equals the single-pass θ
      def thetaOf(sk: Seq[Long], n: Int) =
        if (n < k) Long.MaxValue else sk.last
      assert(thetaOf(merged, universe.size) ===
        thetaOf(sketchOf(universe), universe.size), s"trial $trial: θ")
    }
  }

  test("CUSUM closed form (prefix minus running min) equals the clamp fold on 100 random series") {
    val cuRnd = new scala.util.Random(103)
    (1 to 100).foreach { trial =>
      val xs = Seq.fill(cuRnd.nextInt(60) + 1)(cuRnd.nextLong() % 10000L)
      // fold: S_i = max(0, S_{i-1} + x_i)
      val fold = xs.scanLeft(0L)((s, x) => math.max(0L, s + x)).tail
      // closed form: P_i − min(0, min_{j≤i} P_j)
      val prefix = xs.scanLeft(0L)(_ + _).tail
      val runMin = prefix.scanLeft(Long.MaxValue)(math.min).tail
      val closed = prefix.zip(runMin).map { case (p, m) => p - math.min(0L, m) }
      assert(closed === fold, s"trial $trial: the q193 identity")
    }
  }

  test("k-core is peel-order independent: simultaneous rounds and one-at-a-time removal reach the same core (30 random bipartite graphs)") {
    val kcRnd = new scala.util.Random(107)
    (1 to 30).foreach { trial =>
      val left = (0 until kcRnd.nextInt(15) + 5).map(i => i * 2L)
      val right = (0 until kcRnd.nextInt(15) + 5).map(i => i * 2L + 1)
      val edges = (for (a <- left; b <- right if kcRnd.nextInt(100) < 25)
        yield (a, b)).toSet
      val adj = (edges.toSeq ++ edges.toSeq.map(_.swap)).groupBy(_._1)
        .map { case (n, v) => n -> v.map(_._2).toSet }
      val k = 3
      // simultaneous rounds (the engine's peel)
      var alive = (left ++ right).toSet
      var changed = true
      while (changed) {
        val drop = alive.filter(n => adj.getOrElse(n, Set.empty).count(alive) < k)
        changed = drop.nonEmpty
        alive = alive -- drop
      }
      // one-at-a-time removal in a scrambled order
      var alive2 = (left ++ right).toSet
      var again = true
      while (again) {
        kcRnd.shuffle(alive2.toSeq).find(n =>
          adj.getOrElse(n, Set.empty).count(alive2) < k) match {
          case Some(n) => alive2 -= n
          case None => again = false
        }
      }
      assert(alive === alive2,
        s"trial $trial: the k-core must not depend on removal order")
    }
  }

  test("A-Res replica keys: max-of-w draws ranks exactly like exact-rational u^(1/w) on 50 random weighted sets") {
    // the q176/q184 exactness claim from first principles: the replica
    // key max_{r<w} md5_48(id:r) is a legitimate A-Res key — its
    // selection must ALSO be reproducible from any segmentation (the
    // once-per-key merge law, weighted edition), and the bias must be
    // real: across many draws, doubling every weight of a FIXED set
    // never decreases any member's key (monotone coupling)
    val rnd = new scala.util.Random(7)
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long, r: Long): Long = java.lang.Long.parseLong(
      md.digest(s"wk:$id:$r".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12), 16)
    def key(id: Long, w: Long): Long = (0L until w).map(draw(id, _)).max
    (1 to 50).foreach { c =>
      val n = 1 + rnd.nextInt(30)
      val k = 1 + rnd.nextInt(8)
      val items = (0 until n).map(i => (i.toLong, 1L + rnd.nextInt(20)))
      val keyed = items.map { case (id, w) => (id, key(id, w)) }
      val expect = keyed.sortBy { case (id, kk) => (-kk, id.toString) }.take(k)
      // segmentation merge law
      val cut = rnd.nextInt(n + 1)
      val (a, b) = keyed.splitAt(cut)
      def topk(s: Seq[(Long, Long)]) =
        s.sortBy { case (id, kk) => (-kk, id.toString) }.take(k)
      val merged = topk(topk(a) ++ topk(b))
      assert(merged === expect, s"set $c: weighted segmented merge diverged")
      // monotone coupling: more weight can only raise a key
      items.foreach { case (id, w) =>
        assert(key(id, w * 2) >= key(id, w), s"set $c id $id: weight raise lowered the key")
      }
    }
  }

  test("sign-outside floor rendering (q215/q218): equals trunc-toward-zero rational, engine-order-free, on 2000 random rationals") {
    // THE law both engines must share for signed scaled division: floor
    // on the |numerator| with the sign applied OUTSIDE equals truncation
    // toward zero of the exact rational — Spark's DIV truncates but
    // DuckDB's // floors, so the raw spellings disagree on negatives and
    // only the sign-outside form is engine-agnostic. Verified against
    // BigDecimal truncation, plus the Spark-side expression itself.
    val rnd = new scala.util.Random(214)
    val cases = Seq.tabulate(2000) { _ =>
      (rnd.nextLong() % 1000000L, math.abs(rnd.nextLong() % 9999L) + 1L)
    } ++ Seq((0L, 7L), (-1L, 3L), (1L, 3L), (-999999L, 1L), (Long.MinValue / 2000000L, 13L))
    def signOutside(num: Long, den: Long): Long =
      if (num >= 0) 1000L * num / den else -((1000L * -num) / den)
    cases.foreach { case (num, den) =>
      val exact = (BigDecimal(1000L) * num / den)
        .setScale(0, scala.math.BigDecimal.RoundingMode.DOWN).toLongExact
      assert(signOutside(num, den) === exact,
        s"sign-outside floor diverged from trunc(${num} * 1000 / ${den})")
    }
    // and the SQL spelling the queries actually ship evaluates the same
    val df = cases.toDF("num", "den").selectExpr("num", "den",
      """CASE WHEN num >= 0 THEN 1000 * num DIV den
              ELSE -((1000 * -num) DIV den) END AS r""")
    df.collect().foreach { r =>
      assert(r.getLong(2) === signOutside(r.getLong(0), r.getLong(1)),
        s"SQL spelling diverged at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }
}

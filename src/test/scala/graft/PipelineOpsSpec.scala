package graft

import graft.ops.PipelineOps
import org.apache.spark.sql.functions.col

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("normalize lowercases, strips punctuation, collapses whitespace; redaction masks digits") {
    val d = Seq((1L, "Hello,  WORLD!! 42 times", "en", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = PipelineOps.normalizeDocs(d).collect().head
    assert(row.getString(1) === "hello world 42 times")
    assert(row.getString(2) === "Hello,  WORLD!! <NUM> times")
  }

  test("split is total, deterministic, and ~80/10/10") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = PipelineOps.splitAssign(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = PipelineOps.splitAssign(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a === b)                        // pure function of doc_id
    assert(a.size === docs.count())        // every doc assigned exactly once
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("val") > 0.03 && frac("test") > 0.03)
  }

  test("q129 mixture realization: achieved counts match the sample; identities hold; corpus lands in 3σ") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val kept = PipelineOps.mixtureSample(docs)
    val audit = PipelineOps.mixtureRealization(kept, docs)
      .as[(String, String, Long, Long, Long, Long, Double, Boolean)].collect()
    val keptCounts = kept.groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(audit.nonEmpty)
    audit.foreach { case (lang, source, n, keepN, nKept, dev, sigma, ok) =>
      assert(nKept === keptCounts.getOrElse((lang, source), 0L))
      assert(dev === nKept - keepN)
      assert(sigma >= 0.0 && keepN >= 1L && keepN <= n)
      // a rate-capped stratum (keep everything) must land EXACTLY
      if (keepN == n) assert(dev === 0L && sigma === 0.0 && ok)
      assert(ok === (math.abs(dev).toDouble <= 3.0 * sigma))
    }
    // the md5 draw is unbiased: the real corpus lands inside 3σ everywhere
    assert(audit.forall(_._8), s"3σ breach: ${audit.filterNot(_._8).toSeq}")
    // every stratum is audited exactly once
    assert(audit.map(a => (a._1, a._2)).distinct.length === audit.length)
    assert(audit.length === docs.select("lang", "source").distinct().count())
  }

  test("q131 token allocation: Hamilton apportionment — exact total, quota bounds, hand fixture") {
    val docsT = Tables.documents(spark, "/root/testdata/sf0.001")
    val budget = PipelineOps.AllocationBudgetTokens
    val rows = PipelineOps.tokenAllocation(docsT)
      .as[(String, Long, Long, Double, Long)].collect()
    // allocations sum EXACTLY to the budget — the property round() loses
    assert(rows.map(_._5).sum === budget)
    val totalTok = rows.map(_._3).sum
    rows.foreach { case (_, _, nTok, share, alloc) =>
      // within one unit of the exact quota (the Hamilton guarantee)
      val quota = BigDecimal(budget) * nTok / totalTok
      assert(BigDecimal(alloc) > quota - 1 && BigDecimal(alloc) < quota + 1)
      assert(math.abs(share - nTok.toDouble / totalTok) < 1e-12)
    }
    // more tokens never allocates fewer units (within one apportionment)
    rows.sortBy(_._3).sliding(2).foreach {
      case Array(lo, hi) => assert(lo._5 <= hi._5)
      case _ =>
    }
    // hand fixture: tokens 5/3/2 of budget 7 → quotas 3.5/2.1/1.4 →
    // bases 3/2/1, leftover 1 goes to the largest remainder (.5 → a)
    val hand = Seq((1L, "w " * 4 + "w", "en", "a", 0L), (2L, "w w w", "en", "b", 0L),
      (3L, "w w", "en", "c", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val h = PipelineOps.tokenAllocation(hand, budget = 7L)
      .as[(String, Long, Long, Double, Long)].collect().map(r => r._1 -> r._5).toMap
    assert(h === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
  }

  test("q125 padding waste: buckets partition the corpus, waste identity holds") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val w = PipelineOps.PadBucketTokens
    val rep = PipelineOps.paddingWaste(docs)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val lens = docs.selectExpr("CAST(size(split(text, ' ')) AS BIGINT)")
      .as[Long].collect()
    assert(rep.map(_._2).sum === lens.length.toLong)
    assert(rep.map(_._3).sum === lens.sum)
    rep.foreach { case (bucket, n, sum, max, waste, fill) =>
      assert(max / w === bucket, s"pad target outside its own bucket: $max vs $bucket")
      assert(waste === n * max - sum && waste >= 0)
      assert(fill > 0.0 && fill <= 1.0)
      // the bucket max really is the max of its members
      assert(lens.filter(_ / w == bucket).max === max)
    }
    // hand fixture: lens 1,31,33 under width 32 → buckets 0 (two docs,
    // pad target 31, waste 30) and 1 (one doc, zero waste)
    val hand = Seq((1L, "a"), (2L, ("b " * 30).trim + " c"), (3L, "d " * 32 + "e"))
      .toDF("doc_id", "text")
    val h = PipelineOps.paddingWaste(hand)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(h.map(r => (r._1, r._2, r._4, r._5)).toSeq
      === Seq((0L, 2L, 31L, 30L), (1L, 1L, 33L, 0L)))
  }

  test("q122 curation manifest equals the stagewise application of its graded stages") {
    // compose the INDIVIDUALLY GRADED stage outputs (q89 render, q106
    // canon, q123 budget cut, q113 split) with plain Scala collections and
    // the shared md5 shard rule — the composed query must agree exactly,
    // pinning stage order and survivor semantics end-to-end
    val d = "/root/testdata/sf0.001"
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the render stage at CORPUS scope (q89's graded render chain covers
    // only the train split because its verdict join is train-only, so the
    // full-corpus render is re-applied here from the same stage ops)
    val dirty = Tables.documents(spark, d)
      .selectExpr("doc_id", s"${graft.ops.TextOps.DirtyExpr} AS text")
    val rendered = graft.ops.DedupOps.spanScrubText(dirty)
      .selectExpr("doc_id",
        s"${graft.ops.TextOps.piiRedact("clean_text")} AS final_text")
      .selectExpr("doc_id",
        "CAST(size(split(final_text, ' ')) AS BIGINT) AS n_tokens",
        "md5(final_text) AS final_fp")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val canon = SparkEntry.queries("q106_cluster_canon")(spark, d)
      .filter(col("canon")).select("doc_id").as[Long].collect().toSet
    val kept = SparkEntry.queries("q123_quality_budget_cut")(spark, d)
      .select("doc_id").as[Long].collect().toSet
    val split = SparkEntry.queries("q113_leakfree_split")(spark, d)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val expected = (canon & kept).toSeq
      .map { id =>
        val (toks, fp) = rendered(id)
        (split(id), java.lang.Long.parseLong(md5hex(id.toString).take(2), 16) % 16,
          id, toks, java.lang.Long.parseLong(fp.take(12), 16))
      }
      .groupBy(r => (r._1, r._2))
      .map { case ((sp, sh), rows) =>
        (sp, sh, rows.size.toLong, rows.map(_._4).sum,
          rows.map(_._3).min, rows.map(_._3).max,
          rows.map(_._5).reduce(_ ^ _))
      }.toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q122_curation_manifest")(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.map(_._3).sum === (canon & kept).size.toLong)
  }

  test("q132 curation funnel agrees with the q122 manifest stage-by-stage") {
    val d = "/root/testdata/sf0.001"
    val f = SparkEntry.queries("q132_curation_funnel")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().head
    val (nDocs, nCanon, nKept, nSurv, nTrain, nVal, nTest, rate) = f
    // funnel shape: each stage only narrows, splits partition survivors
    assert(nCanon <= nDocs && nSurv <= nCanon && nSurv <= nKept)
    assert(nTrain + nVal + nTest === nSurv)
    assert(rate === nSurv.toDouble / nDocs)
    // the manifest q122 ships must carry exactly these survivors per split
    val manifest = SparkEntry.queries("q122_curation_manifest")(spark, d)
      .select("split", "n_docs").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(manifest.values.sum === nSurv)
    assert(manifest.getOrElse("train", 0L) === nTrain)
    assert(manifest.getOrElse("val", 0L) === nVal)
    assert(manifest.getOrElse("test", 0L) === nTest)
  }

  test("stratified sample: threshold form tracks the exact-rank twin per stratum") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // the exact-rank twin hits ceil(frac·n) on the nose
    val exact = PipelineOps.stratifiedSampleExact(docs, frac = 0.2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(exact.keySet === n.keySet)
    exact.foreach { case (lang, k) =>
      assert(k === math.ceil(n(lang) * 0.2).toLong, s"stratum $lang")
    }
    // the threshold form's kept counts are binomial around keep_n: bound
    // the deviation at 4σ (σ² = n·p·(1-p), p = keep_n/n) — the cross-check
    // that keeps the skew-proof form honest against the exact twin
    val kept = PipelineOps.stratifiedSample(docs, frac = 0.2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept.keySet === n.keySet)
    kept.foreach { case (lang, k) =>
      val keepN = math.ceil(n(lang) * 0.2).toLong
      val p = keepN.toDouble / n(lang)
      val sigma = math.sqrt(n(lang) * p * (1 - p))
      assert(math.abs(k - keepN) <= math.max(4 * sigma, 1.0),
        s"stratum $lang kept $k vs budget $keepN (4σ = ${4 * sigma})")
    }
    // row-local selection is a pure function of doc_id — deterministic
    val a = PipelineOps.stratifiedSample(docs, frac = 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = PipelineOps.stratifiedSample(docs, frac = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // frac = 1.0 caps every stratum: cut = 2^48 admits every 48-bit prefix
    assert(PipelineOps.stratifiedSample(docs, frac = 1.0).count() === docs.count())
    // monotone in frac: a bigger sample only ADDS docs (anytime dial)
    val half = PipelineOps.stratifiedSample(docs, frac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(half))
  }

  test("ngram contamination flags exactly the train docs sharing a gram with test") {
    // split membership is md5(doc_id) — discover one train and one test id,
    // then plant a shared 5-gram between them
    val ids = (0L until 50L).map(i => (i, "x", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val split = PipelineOps.splitAssign(ids).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val trainIds = split.collect { case (id, "train") => id }.toSeq.sorted
    val testId = split.collect { case (id, "test") => id }.head
    val (dirty, clean) = (trainIds.head, trainIds(1))
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (dirty, s"prefix words then $shared and a tail", "en", "s", 0L),
      (clean, "totally unrelated train content with many words here", "en", "s", 0L),
      (testId, s"eval question containing $shared verbatim", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = PipelineOps.ngramContamination(docs)
      .as[(Long, Long, Boolean)].collect().toSeq
    // output covers exactly the train docs, ordered
    assert(got.map(_._1) === Seq(dirty, clean).sorted)
    val byId = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(dirty)._1 === 1L && byId(dirty)._2 === true) // one shared 5-gram
    assert(byId(clean) === ((0L, false)))
  }

  test("mixture weights: p sums to 1 and follows sqrt(n) ratios") {
    val docs = (
      (1 to 9).map(i => (i.toLong, "t", "en", "s1", 0L)) ++   // n=9 → w=3e6
      (10 to 13).map(i => (i.toLong, "t", "en", "s2", 0L)) ++ // n=4 → w=2e6
      Seq((14L, "t", "de", "s1", 0L))                         // n=1 → w=1e6
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = PipelineOps.mixtureWeights(docs)
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq === Seq(
      ("de", "s1", 1L, 1000000L),
      ("en", "s1", 9L, 3000000L),
      ("en", "s2", 4L, 2000000L)))
    assert(rows.map(_._5).sum === 1.0)
    val p = rows.map(r => (r._1, r._2) -> r._5).toMap
    assert(p(("en", "s1")) === 0.5) // 3e6 / 6e6 exactly
  }

  test("sequence packing: offsets are the exact prefix sum; straddlers are visible") {
    // budget 10: doc1 (6 tok) fills [0,6); doc2 (6 tok) straddles the
    // 10-boundary [6,12); doc3 (4 tok) sits inside chunk 1 [12,16)
    val d = Seq(
      (1L, "a b c d e f", "en", "s", 0L),
      (2L, "g h i j k l", "en", "s", 0L),
      (3L, "m n o p", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = PipelineOps.sequencePacking(d, budget = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      (1L, 6L, 0L, 0L, 0L),
      (2L, 6L, 6L, 0L, 1L),  // straddles chunks 0 and 1
      (3L, 4L, 12L, 1L, 1L)))
  }

  test("mixture sample flattens a skewed corpus toward the temperature target") {
    // 90/10 skew: sqrt weights give the small stratum a boosted share
    val corpus = (1L to 90L).map(i => (i, "t", "en", "big", 0L)) ++
      (91L to 100L).map(i => (i, "t", "en", "small", 0L))
    val d = corpus.toDF("doc_id", "text", "lang", "source", "n_chars")
    // expected budget: w = sqrt(90), sqrt(10); p = w/Σw; keep = ceil(min(1, p*40/n)*n)
    val (mb, ms) = (math.round(math.sqrt(90.0) * 1e6), math.round(math.sqrt(10.0) * 1e6))
    val tot = (mb + ms).toDouble
    def keepN(m: Long, n: Long) =
      math.ceil(math.min(1.0, (m / tot) * 40 / n) * n).toLong
    assert((keepN(mb, 90), keepN(ms, 10)) === ((30L, 10L)))
    // hash-threshold form: keep_n carried exactly; kept counts binomial
    // around keep_n — for THIS fixed corpus the md5 draw keeps 28 of the
    // big stratum's 30 budget; a capped stratum (keep_n = n) keeps ALL
    // docs exactly (cut = 2^48 admits every 48-bit prefix)
    val rows = PipelineOps.mixtureSample(d, target = 40)
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.map(_._5).distinct.sorted === Seq(10L, 30L))
    val kept = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(kept === Map("big" -> 28L, "small" -> 10L))
    // the big stratum was cut much harder than the small one
    assert(kept("big").toDouble / 90 < kept("small").toDouble / 10)
    // row-local selection is a pure function of doc_id — deterministic
    val again = PipelineOps.mixtureSample(d, target = 40)
      .as[(String, String, Long, Long, Long)].collect()
    assert(again.toSeq === rows.toSeq)
    // the exact-rank twin hits every keep_n on the nose — the cross-check
    // bounding the threshold form's deviation (|28-30| ≤ 3σ ≈ 13)
    val exact = PipelineOps.mixtureSampleExact(d, target = 40)
      .as[(String, String, Long, Long, Long)].collect()
    val keptExact = exact.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(keptExact === Map("big" -> 30L, "small" -> 10L))
  }

  test("packing stats: fill and straddle rates match the hand-packed corpus") {
    // same corpus as the packing test: 16 tokens, budget 10 → 2 chunks,
    // doc2 straddles the 10-boundary; fill = 16/20, straddle = 1/3
    val d = Seq(
      (1L, "a b c d e f", "en", "s", 0L),
      (2L, "g h i j k l", "en", "s", 0L),
      (3L, "m n o p", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = PipelineOps.packingStats(d, budget = 10).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 16L, 2L, 1L)))
    assert(r.getDouble(4) === 16.0 / 20.0)
    assert(r.getDouble(5) === 1.0 / 3.0)
  }

  test("chunk composition is the exact inverse of packing: spans tile each chunk") {
    // same corpus as the packing test: 16 tokens, budget 10 → chunk 0 =
    // doc1[0..5] + doc2[0..3], chunk 1 = doc2[4..5] + doc3[0..3]
    val d = Seq(
      (1L, "a b c d e f", "en", "s", 0L),
      (2L, "g h i j k l", "en", "s", 0L),
      (3L, "m n o p", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = PipelineOps.chunkComposition(d, budget = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      (0L, 1L, 0L, 0L, 6L), (0L, 2L, 6L, 0L, 4L),
      (1L, 2L, 0L, 4L, 2L), (1L, 3L, 2L, 0L, 4L)))
    // invariants that must hold on ANY corpus: spans tile every chunk
    // contiguously from 0, and each doc's spans reassemble the whole doc
    val real = PipelineOps.chunkComposition(
      Tables.documents(spark, "/root/testdata/sf0.001"), budget = 1024)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    real.groupBy(_._1).foreach { case (_, spans) =>
      val s = spans.sortBy(_._3)
      assert(s.head._3 === 0L)
      s.sliding(2).foreach {
        case Seq((_, _, from1, _, n1), (_, _, from2, _, _)) =>
          assert(from2 === from1 + n1, "chunk spans must be contiguous")
        case _ =>
      }
    }
    val packed = PipelineOps.sequencePacking(
      Tables.documents(spark, "/root/testdata/sf0.001"), budget = 1024)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    real.groupBy(_._2).foreach { case (docId, spans) =>
      val s = spans.sortBy(_._4)
      assert(s.head._4 === 0L)
      assert(s.map(_._5).sum === packed(docId), "doc spans must reassemble the doc")
    }
  }

  test("url dedup: one canonical doc per URL; host stats are exact") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = PipelineOps.urlDedup(d)
      .as[(Long, String, String, Boolean, Long, Double)].collect().toSeq
    assert(rows.length === d.count())
    // exactly one canonical doc per distinct URL, and it is the min doc_id
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val canon = docs.filter(_._4)
      assert(canon.length === 1)
      assert(canon.head._1 === docs.map(_._1).min)
    }
    // host is the URL's authority; n_host_docs counts exactly its docs
    rows.groupBy(_._3).foreach { case (host, docs) =>
      assert(docs.forall(_._2.startsWith(s"https://$host/")))
      assert(docs.forall(_._5 === docs.length.toLong))
    }
    // the derived URL space genuinely collides (dedup is non-trivial)
    assert(rows.count(!_._4) > 0)
  }

  test("mixture sample is monotone in target: raising the budget only adds docs") {
    // keep_n = ceil(min(1, p·target/n)·n) is monotone in target, so the
    // per-stratum cut is monotone, so the kept set can only GROW — the
    // property that makes the hash-threshold form an anytime dial (a
    // budget bump never churns previously-kept docs, unlike re-ranking)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val keptAt = Seq(50L, 150L, 400L).map { t =>
      PipelineOps.mixtureSample(docs, target = t)
        .select("doc_id").as[Long].collect().toSet
    }
    assert(keptAt(0).subsetOf(keptAt(1)) && keptAt(1).subsetOf(keptAt(2)))
    assert(keptAt(0).nonEmpty && keptAt(2).size > keptAt(0).size)
  }

  test("mixture epoch plan: demand decomposes exactly; upsampled strata flagged") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = PipelineOps.mixtureEpochPlan(docs)
      .select("n", "needed_n", "epochs", "rem", "rem_cut", "over_repeated")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    // the decomposition is exact per stratum: epochs*n + rem = needed
    rows.foreach { case (n, need, ep, rem, cut, over) =>
      assert(ep * n + rem === need)
      assert(rem >= 0 && rem < n)
      assert(cut >= 0 && cut <= 281474976710656L)
      assert(over === (ep >= 4))
    }
    // total demand hits the target up to per-stratum floor slack
    val total = rows.map(_._2).sum
    assert(total <= PipelineOps.EpochPlanTarget
      && total > PipelineOps.EpochPlanTarget - rows.length,
      s"total demand $total vs target ${PipelineOps.EpochPlanTarget}")
    // the target exceeds the corpus, so genuinely upsampled strata exist
    assert(rows.exists(_._3 >= 1))
  }

  test("corpus decision covers exactly the train split; keep is the conjunction") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val trainIds = PipelineOps.splitAssign(docs)
      .filter(col("split") === "train").select("doc_id").as[Long].collect().toSet
    val rows = SparkEntry.queries("q71_corpus_decision")(spark, dir)
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(rows.map(_._1).toSet === trainIds)
    rows.foreach { case (id, q, d, c, keep) =>
      assert(keep === (q && d && !c), s"doc $id")
    }
  }

  test("shard manifest partitions the corpus; volumes sum to corpus totals") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = PipelineOps.shardManifest(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) === rows.map(_._1).sorted)
    assert(rows.forall(r => r._1 >= 0 && r._1 < 16))
    assert(rows.map(_._2).sum === docs.count())          // every doc in exactly one shard
    assert(rows.map(_._4).sum ===
      docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
        .collect().head.getLong(0))                      // char volume conserved
    // md5 buckets are uniform: no shard more than 3x the mean on 500 docs
    val mean = rows.map(_._2).sum.toDouble / rows.size
    assert(rows.forall(_._2 <= mean * 3), s"skewed shard: $rows")
  }

  test("referential audit counts both orphan directions; aligned only when both are zero") {
    val docs = Seq((1L, "a", "en", "s1", 1L), (2L, "b", "en", "s1", 1L),
      (3L, "c", "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emb = Seq((2L, Seq(1.0f)), (3L, Seq(1.0f)), (9L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val got = PipelineOps.referentialAudit(docs, emb)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(got === ((3L, 3L, 1L, 1L, false)))  // doc 1 unembedded, vec 9 orphan
    val clean = PipelineOps.referentialAudit(docs, emb.filter("vec_id != 9")
      .unionByName(Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")))
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(clean === ((3L, 3L, 0L, 0L, true)))
  }

  test("epoch order: a permutation per epoch, contiguous per-shard positions, replay-stable") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val e1 = PipelineOps.epochOrder(docs, epoch = 1L)
      .select("shard", "doc_id", "pos").as[(Long, Long, Long)].collect().toSeq
    // every doc appears exactly once — the order is a permutation
    val ids = docs.select("doc_id").as[Long].collect().toSeq.sorted
    assert(e1.map(_._2).sorted === ids)
    // per shard, positions are exactly 1..n (a dataloader can seek by pos)
    e1.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.size).toSeq, s"shard $shard")
    }
    // replay-stable: a second run deals identically (pure function of keys)
    val e1b = PipelineOps.epochOrder(docs, epoch = 1L)
      .select("shard", "doc_id", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(e1.sorted === e1b.sorted)
    // a new epoch keeps shard membership (files on disk are fixed) but
    // reshuffles BOTH levels: the order within shards and the shard
    // visit order itself (a fixed visit order would pin every doc to its
    // shard's window of every epoch)
    val e2 = PipelineOps.epochOrder(docs, epoch = 2L)
      .select("shard", "doc_id", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(e1.map(r => r._2 -> r._1).toMap === e2.map(r => r._2 -> r._1).toMap)
    val moved = (e1.map(r => r._2 -> r._3).toSet --
      e2.map(r => r._2 -> r._3).toSet).size
    assert(moved > docs.count() / 2, s"epoch 2 barely reshuffled: $moved moved")
    def visit(epoch: Long) = PipelineOps.epochOrder(docs, epoch)
      .select("shard", "shard_seq").distinct()
      .as[(Long, Long)].collect().toMap
    val (v1, v2) = (visit(1L), visit(2L))
    // each epoch's visit order is a permutation of the shards...
    assert(v1.values.toSeq.sorted === (1L to v1.size).toSeq)
    assert(v1.keySet === v2.keySet)
    // ...and epoch 2 visits them in a different sequence
    assert(v1 !== v2, "epoch 2 kept epoch 1's shard visit order")
  }

  test("leak-free split: clusters are atomic, singletons match q57, flag audits the naive deal") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.ops.DedupOps.lshPairs(docs)
    val clusters = graft.ops.GraphOps.dedupClusters(docs, pairs)
    val split = PipelineOps.leakFreeSplit(clusters)
      .as[(Long, Long, String, String, Boolean)].collect().toSeq
    assert(split.size === docs.count())
    // cluster-atomic: one split per cluster
    split.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.size === 1, s"cluster $c torn: $rows")
    }
    // singleton clusters (cluster_id == doc_id) deal exactly as q57 does
    val naive = PipelineOps.splitAssign(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    split.filter(r => r._1 === r._2).foreach { case (d, _, s, ns, _) =>
      assert(s === naive(d) && ns === naive(d), s"singleton $d diverged from q57")
    }
    // the flag is exactly "the naive deal disagreed within the cluster"
    split.groupBy(_._2).foreach { case (c, rows) =>
      val torn = rows.map(_._4).distinct.size > 1
      assert(rows.forall(_._5 === torn), s"cluster $c flag wrong")
    }
    // the fixture exercises both flag values (real near-dup clusters exist)
    assert(split.exists(_._5) && split.exists(!_._5))
  }

  test("q164 bottom-k sample: selection = sorted draws, mergeable across halves, census exact, invariant") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = PipelineOps.bottomkSample(docs).collect()
    assert(rows.length === PipelineOps.BottomK)
    // reference: the K smallest draws by (h, doc_id-as-string)
    val all = docs.select(
        org.apache.spark.sql.functions.col("doc_id"),
        PipelineOps.md5Prefix48(org.apache.spark.sql.functions.col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = all.sortBy { case (id, h) => (h, id.toString) }
      .take(PipelineOps.BottomK)
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSeq === want.toSeq,
      "selection must be exactly the K smallest draws")
    assert(rows.map(_.getLong(0)).toSeq === (1L to PipelineOps.BottomK).toSeq)
    // mergeability: bottom-K(whole) = truncated merge of halves' bottom-Ks
    val aIds = PipelineOps.bottomkSample(docs.where("doc_id % 2 = 0"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val bIds = PipelineOps.bottomkSample(docs.where("doc_id % 2 = 1"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val merged = (aIds ++ bIds).sortBy { case (id, h) => (h, id.toString) }
      .take(PipelineOps.BottomK)
    assert(merged.toSeq === want.toSeq,
      "per-shard samples must merge to the corpus sample")
    // census: exact means, qualification holds on this corpus
    val nTok = docs.selectExpr("CAST(size(split(text, ' ')) AS BIGINT)")
      .collect().map(_.getLong(0))
    val exactMean = BigInt(1000000) * nTok.sum / nTok.length
    assert(rows.head.getLong(7) === exactMean.toLong)
    assert(rows.forall(_.getBoolean(9)), "sample estimator failed qualification")
    val reparted = PipelineOps.bottomkSample(docs.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q180 k-anonymity: ladder laws are theorems, driver recount matches, negative balances floor-bin") {
    import org.apache.spark.sql.functions.col
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")
    val rows = PipelineOps.kAnonymityAudit(customer).collect()
    assert(rows.length === 4 && rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(rows.forall(_.getBoolean(7)), "monotone laws must hold — they are theorems")
    // k non-decreasing, at-risk non-increasing, re-checked directly
    assert(rows.map(_.getLong(3)).toSeq === rows.map(_.getLong(3)).sorted)
    assert(rows.map(_.getLong(5)).toSeq === rows.map(_.getLong(5)).sorted.reverse)
    // driver recount of level 0 and level 3 from first principles
    val cs = customer.selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment",
        "CAST(round(c_acctbal * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def fl(c: Long, w: Long) = (c - (((c % w) + w) % w)) / w
    val l0 = cs.groupBy(t => (t._1, t._2, fl(t._3, PipelineOps.AnonBalFine)))
      .map(_._2.length.toLong)
    assert(rows(0).getLong(2) === l0.size && rows(0).getLong(3) === l0.min)
    assert(rows(0).getLong(5) === l0.filter(_ < PipelineOps.AnonK).sum)
    val l3 = cs.groupBy(_._2).map(_._2.length.toLong)
    assert(rows(3).getLong(2) === l3.size && rows(3).getLong(3) === l3.min)
    // negative balances must bin by floor, not truncation: -1 cent in a
    // $1 bucket is bucket -1, separate from +1 cent's bucket 0
    val fix = Seq((1L, "S", -0.01), (2L, "S", 0.01), (3L, "S", -0.01),
      (4L, "S", -0.01), (5L, "S", -0.01), (6L, "S", -0.01))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
      .withColumn("c_nationkey", col("c_custkey") * 0)
    val fr = PipelineOps.kAnonymityAudit(fix).collect()
    assert(fr(0).getLong(2) === 2L, "floor binning must split -1ç from +1ç")
    assert(fr(0).getLong(3) === 1L && fr(0).getLong(5) === 1L,
      "the singleton +1ç row is the only at-risk row at level 0 (the -1ç class has 5)")
    val reparted = PipelineOps.kAnonymityAudit(customer.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q195 l-diversity: exposed and skewed classes graded, ladder merging diversifies, driver recount") {
    import org.apache.spark.sql.functions.col
    // nat 0: 4 AUTO + 1 BUILDING (dl 2 — undiverse at L=3; modal 4 > 3×1
    // — recursive FAIL without being exposed); nat 1: 5 AUTO (dl 1 —
    // outright disclosure, all 5 rows exposed). Region merges them:
    // dl 2, exposure clears, modal 9 > 3×1 still skew-fails.
    val fixNation = Seq((0L, "N0", 0L), (1L, "N1", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val fixCust = ((1 to 4).map(i => (i.toLong, 0L, "AUTO")) ++
        Seq((5L, 0L, "BUILDING")) ++ (6 to 10).map(i => (i.toLong, 1L, "AUTO")))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .withColumn("c_acctbal", col("c_custkey") * 0.0)
    val fr = PipelineOps.lDiversityAudit(fixCust, fixNation).collect()
    assert(fr.length === 4)
    val f0 = fr(0)
    assert(f0.getLong(2) === 2L && f0.getLong(3) === 1L &&
      f0.getLong(4) === 2L && f0.getLong(5) === 5L && f0.getLong(7) === 2L,
      "L0: two classes, min-l 1, both undiverse, 5 exposed rows, both skew-fail")
    assert(f0.getLong(6) === 500000L, "exposure = 5/10 floor'd micro")
    val f2 = fr(2)
    assert(f2.getLong(2) === 1L && f2.getLong(3) === 2L && f2.getLong(5) === 0L
      && f2.getLong(7) === 1L && !f2.getBoolean(8),
      "region merge: diversity rises to 2, exposure clears, skew persists")
    assert(fr.forall(_.getBoolean(9)), "monotone law on the hand ladder")
    // real corpus: laws are theorems, driver recount of L0 and L3
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    val rows = PipelineOps.lDiversityAudit(customer, nation).collect()
    assert(rows.length === 4 && rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(rows.forall(_.getBoolean(9)), "monotone laws must hold — they are theorems")
    assert(rows.map(_.getLong(3)).toSeq === rows.map(_.getLong(3)).sorted)
    assert(rows.map(_.getLong(5)).toSeq === rows.map(_.getLong(5)).sorted.reverse)
    assert(rows.exists(_.getBoolean(8)) && rows.exists(!_.getBoolean(8)),
      "the corpus must populate both recursive-diversity verdicts")
    val regOf = nation.selectExpr("CAST(n_nationkey AS BIGINT)",
        "CAST(n_regionkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cs = customer.selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment",
        "CAST(round(c_acctbal * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def fl(c: Long, w: Long) = (c - (((c % w) + w) % w)) / w
    def audit(classes: Iterable[Map[String, Long]]): (Long, Long, Long, Long) = {
      val dls = classes.map(_.size.toLong)
      val exposed = classes.filter(_.size == 1).map(_.values.sum).sum
      val rf = classes.count { m =>
        val mx = m.values.max; mx > PipelineOps.LDivC * (m.values.sum - mx) }
      (dls.min, dls.count(_ < PipelineOps.LDivL).toLong, exposed, rf.toLong)
    }
    val l0 = audit(cs.groupBy(t => (t._1, fl(t._3, PipelineOps.AnonBalCoarse)))
      .values.map(_.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }))
    assert((rows(0).getLong(3), rows(0).getLong(4), rows(0).getLong(5),
      rows(0).getLong(7)) === l0)
    val l3 = audit(Seq(cs.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }))
    assert((rows(3).getLong(3), rows(3).getLong(4), rows(3).getLong(5),
      rows(3).getLong(7)) === l3)
    val reparted = PipelineOps.lDiversityAudit(customer.repartition(7), nation)
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q205 t-closeness: exact TVD with absent mass, boundary non-violation, ladder converges to zero; driver recount") {
    import org.apache.spark.sql.functions.col
    // global: 4 AUTO + 6 BUILDING over 10 rows. nat 0 (4 AUTO + 1 B):
    // TVD = (|4·10−4·5| + |1·10−6·5|) / (2·5·10) = 40/100 = 0.4 — wait,
    // recompute in the assertion; nat 1 (5 B): pure class with absent
    // AUTO mass. The whole-table level is ALWAYS distance zero.
    val fixNation = Seq((0L, "N0", 0L), (1L, "N1", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val fixCust = ((1 to 4).map(i => (i.toLong, 0L, "AUTO")) ++
        Seq((5L, 0L, "BUILDING")) ++ (6 to 10).map(i => (i.toLong, 1L, "BUILDING")))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .withColumn("c_acctbal", col("c_custkey") * 0.0)
    val fr = PipelineOps.tClosenessAudit(fixCust, fixNation).collect()
    assert(fr.length === 4)
    // exact: nat0 present sum |4·10−4·5|+|1·10−6·5| = 20+20 = 40, absent 0
    //        → 1e6·40/(2·5·10) = 400000 (> 300000: violation, 5 at risk)
    //        nat1 present |5·10−6·5| = 20, absent AUTO 4·5 = 20 → 400000
    val f0 = fr(0)
    assert(f0.getLong(1) === 2L && f0.getLong(2) === 400000L &&
      f0.getLong(3) === 2L && f0.getLong(4) === 10L,
      "both skewed classes violate at exactly 0.4 TVD")
    assert(fr(2).getLong(2) === 0L && fr(3).getLong(2) === 0L,
      "region/table levels merge to the global distribution — distance zero")
    assert(fr.forall(_.getBoolean(5)), "monotone law on the hand ladder")
    assert(!f0.getBoolean(6) && fr(3).getBoolean(6))
    // real corpus: replay every column at sf0.001
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    val rows = PipelineOps.tClosenessAudit(customer, nation).collect()
    assert(rows.length === 4 && rows.forall(_.getBoolean(5)),
      "max-TVD monotonicity is a theorem (convexity of TVD under mixing)")
    assert(rows.exists(!_.getBoolean(6)) && rows.exists(_.getBoolean(6)),
      "the corpus must populate both t-closeness verdicts")
    val regOf = nation.selectExpr("CAST(n_nationkey AS BIGINT)",
        "CAST(n_regionkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cs = customer.selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment",
        "CAST(round(c_acctbal * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def fl(c: Long, w: Long) = (c - (((c % w) + w) % w)) / w
    val nn = cs.length.toLong
    val gdist = cs.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    def auditLevel(key: ((Long, String, Long)) => Any): (Long, Long, Long, Long) = {
      val classes = cs.groupBy(key).values.map { xs =>
        val csz = xs.length.toLong
        val dist = xs.groupBy(_._2).map { case (s, ys) => s -> ys.length.toLong }
        val present = dist.map { case (s, cn) =>
          math.abs(cn * nn - gdist(s) * csz) }.sum
        // keys is a Set — map through a Seq or equal products dedup away
        val massPresent = dist.keys.toSeq.map(s => gdist(s) * csz).sum
        (csz, 1000000L * (present + (nn * csz - massPresent)) / (2 * csz * nn))
      }.toSeq
      (classes.size.toLong, classes.map(_._2).max,
        classes.count(_._2 > PipelineOps.TCloseMicro).toLong,
        classes.filter(_._2 > PipelineOps.TCloseMicro).map(_._1).sum)
    }
    val want = Seq(
      auditLevel(t => (t._1, fl(t._3, PipelineOps.AnonBalCoarse))),
      auditLevel(t => t._1), auditLevel(t => regOf(t._1)), auditLevel(_ => 0))
    rows.zip(want).foreach { case (r, (nc, mx, nv, risk)) =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        === ((nc, mx, nv, risk)), s"level ${r.getLong(0)}")
    }
    val reparted = PipelineOps.tClosenessAudit(customer.repartition(7), nation)
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q184 weighted stratified: per-stratum brute rank matches, tiny stratum takes all, shard-mergeable per stratum") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = PipelineOps.weightedStratifiedSample(docs).collect()
    assert(rows.forall(_.getBoolean(8)), "size law: exactly min(K, n) per stratum")
    assert(rows.forall(_.getBoolean(11)), "heavy-bias law per stratum on this corpus")
    // driver brute: per-lang top-K by the replica key
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long, r: Long): Long = java.lang.Long.parseLong(
      md.digest(s"wk:$id:$r".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12), 16)
    val all = docs.selectExpr("doc_id", "lang", "CAST(size(split(text, ' ')) AS BIGINT)")
      .where("lang IS NOT NULL").collect()
      .map { r =>
        val (id, w) = (r.getLong(0), math.min(r.getLong(2), PipelineOps.WeightCap))
        (r.getString(1), id, (0L until w).map(draw(id, _)).max)
      }
    val want = all.groupBy(_._1).toSeq.flatMap { case (lang, ds) =>
      ds.sortBy { case (_, id, k) => (-k, id.toString) }
        .take(PipelineOps.WStratK).zipWithIndex
        .map { case ((_, id, k), i) => (lang, i + 1L, id, k) }
    }.sortBy(t => (t._1, t._2))
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      === want, "per-stratum selection must be the brute per-lang top-K")
    // per-stratum mergeability across doc_id halves
    val aS = PipelineOps.weightedStratifiedSample(docs.where("doc_id % 2 = 0"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val bS = PipelineOps.weightedStratifiedSample(docs.where("doc_id % 2 = 1"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val merged = (aS ++ bS).groupBy(_._1).toSeq.flatMap { case (lang, ds) =>
      ds.sortBy { case (_, id, k) => (-k, id.toString) }.take(PipelineOps.WStratK)
        .map { case (_, id, k) => (lang, id, k) }
    }.sortBy(t => (t._1, t._2))
    assert(merged === want.map(t => (t._1, t._3, t._4)).sortBy(t => (t._1, t._2)),
      "per-shard stratified samples must truncate-merge per stratum")
    // a stratum smaller than K yields ALL its docs, size_ok still true
    val tiny = docs.limit(0).unionByName(
      Seq((1L, "a b c", "xx", "s", 5L), (2L, "d e", "xx", "s", 3L),
        (3L, "f", "xx", "s", 1L), (4L, "g h i j", "yy", "s", 7L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val tr = PipelineOps.weightedStratifiedSample(tiny).collect()
    assert(tr.count(_.getString(0) == "xx") === 3 && tr.count(_.getString(0) == "yy") === 1)
    assert(tr.forall(_.getBoolean(8)))
    val reparted = PipelineOps.weightedStratifiedSample(docs.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q176 weighted bottom-k: A-Res selection law, replica-key identity, mergeable, heavy-biased, invariant") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = PipelineOps.weightedBottomkSample(docs).collect()
    assert(rows.length === PipelineOps.WBottomK)
    // reference: per-doc key recomputed from the definition (max of w
    // md5 draws) on the driver, then the K LARGEST keys win
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long, r: Long): Long = {
      val hex = md.digest(s"wk:$id:$r".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val all = docs.selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .collect().map { r =>
        val (id, w) = (r.getLong(0), math.min(r.getLong(1), PipelineOps.WeightCap))
        (id, (0L until w).map(draw(id, _)).max)
      }
    val want = all.sortBy { case (id, k) => (-k, id.toString) }
      .take(PipelineOps.WBottomK)
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSeq === want.toSeq,
      "selection must be exactly the K largest A-Res replica keys")
    assert(rows.map(_.getLong(0)).toSeq === (1L to PipelineOps.WBottomK).toSeq)
    // mergeability: top-K(whole) = truncated merge of the halves' top-Ks
    // (each doc lives in exactly one half — the once-per-key precondition)
    val aIds = PipelineOps.weightedBottomkSample(docs.where("doc_id % 2 = 0"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val bIds = PipelineOps.weightedBottomkSample(docs.where("doc_id % 2 = 1"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val merged = (aIds ++ bIds).sortBy { case (id, k) => (-k, id.toString) }
      .take(PipelineOps.WBottomK)
    assert(merged.toSeq === want.toSeq,
      "per-shard weighted samples must merge to the corpus sample")
    // the reason the weighting exists: heavy docs oversampled (graded fact)
    assert(rows.forall(_.getBoolean(9)), "sample mean weight must dominate corpus mean")
    assert(rows.head.getLong(7) > rows.head.getLong(8),
      "strict dominance expected on this corpus (not just >=)")
    // partitioning invariance (replay safety)
    val reparted = PipelineOps.weightedBottomkSample(docs.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }
}

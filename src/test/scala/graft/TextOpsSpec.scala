package graft

import graft.ops.{DedupOps, TextOps}

/** Edge-case behavior of the text operators — the testdata never exercises
  * null/empty/single-token documents, but library users will. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text, "en", "s1", 0L)
  private def docs(rows: (Long, String, String, String, Long)*) =
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q130 span corruption: exact span accounting, replay-stable, local md5 reference agrees") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val (bT, sL) = (TextOps.CorruptBlockTokens, TextOps.CorruptSpanLen)
    // 40 tokens → 2 full blocks → 2 spans, 6 masked; 2 tokens → nothing
    val long = (0 until 40).map(i => s"t$i").mkString(" ")
    val d = docs(doc(1L, long), doc(2L, "a b"))
    val got = TextOps.spanCorruption(d)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 === 40L && got(0)._3 === 2L && got(0)._4 === 6L)
    assert(got(1)._2 === 2L && got(1)._3 === 0L && got(1)._4 === 0L)
    // the untouched doc's corrupted text IS the original
    assert(got(1)._5 === md5hex("a b"))
    // rebuild doc 1's corrupted text locally from the same draw rule
    val toks = long.split(" ")
    val masked = toks.zipWithIndex.map { case (t, i) =>
      val b = i / bT
      val bs = math.min(bT, toks.length - b * bT)
      val off = (java.lang.Long.parseLong(md5hex(s"1:$b").take(12), 16) % (bs - sL + 1)).toInt
      if (bs >= sL && i - b * bT >= off && i - b * bT <= off + sL - 1) "<mask>" else t
    }
    assert(got(0)._5 === md5hex(masked.mkString(" ")))
    assert(masked.count(_ == "<mask>") === 6)
    // replay-stable: a second run masks the identical tokens
    val again = TextOps.spanCorruption(d)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(again.toSeq === got.toSeq)
  }

  test("repetition score: template-stamped text scores 1.0, varied text low") {
    val d = docs(
      doc(1, "spam spam spam spam spam spam"),       // every 3-gram identical
      doc(2, "all tokens here are quite different"), // 4 distinct 3-grams
      doc(3, "too few"))                             // < 3 tokens: no row
    val got = TextOps.repetitionScore(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) === 1.0)
    assert(got(2L) === 0.25)
    assert(!got.contains(3L))
  }

  test("training filter keeps plausible prose, drops unshingleable docs") {
    val prose = "the cat is a fine friend and the dog is a good pal of ours to keep in mind for sure okay"
    val d = docs(doc(1, "a b"), doc(2, prose))
    val keep = TextOps.trainingFilter(d).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(keep(1L) === false) // too short to shingle → null rep_ratio → drop
    assert(keep(2L) === true)
  }

  test("token stats: empty text yields one empty token (split semantics), null text yields nulls") {
    val d = docs(doc(1, "two words"), doc(2, ""), (3L, null, "en", "s1", 0L))
    val rows = TextOps.tokenStats(d).collect()
    assert(rows(0).getLong(1) === 2)      // "two words"
    assert(rows(1).getLong(1) === 1)      // "" splits to [""] — documented quirk
    assert(rows(2).isNullAt(1))           // null text propagates null, no crash
  }

  test("shingling: docs with < 3 tokens produce no shingles and are absent from signatures") {
    val d = docs(doc(1, "only two"), doc(2, "a b c d"))
    val sig = DedupOps.minhashSignature(d).select("doc_id").as[Long].collect()
    assert(sig.toSeq === Seq(2L))
  }

  test("language id is total: every non-null doc gets a prediction") {
    val d = docs(doc(1, "the cat"), doc(2, "der hund und das"), doc(3, "xyzzy"))
    val preds = TextOps.langId(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) === "en")
    assert(preds(2L) === "de")
    assert(preds(3L) === "en") // zero hits everywhere → first language by priority
  }

  test("quality score ratios stay in [0, 1]") {
    val d = docs(doc(1, "the the the"), doc(2, "zebra quark"))
    val rows = TextOps.qualityScore(d).collect()
    assert(rows(0).getDouble(3) === 1.0)
    assert(rows(1).getDouble(3) === 0.0)
  }

  test("fingerprint is order-insensitive over the bag of words") {
    val d = docs(doc(1, "b a c"), doc(2, "c b a"), doc(3, "c b x"))
    val fps = TextOps.fingerprint(d).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("bm25 micro scores match an independent Scala computation") {
    val d = docs(
      doc(1, "spark spark query a b"), // tf(spark)=2, tf(query)=1, dl=5
      doc(2, "spark c d e"),           // tf(spark)=1, dl=4
      doc(3, "x y z"),                 // no query terms, dl=3
      doc(4, "dup dup dup dup"))       // tf(dup)=4, dl=4
    val (n, total) = (4L, 16L)
    val avg = total.toDouble / n.toDouble
    def micro(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val c = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avg)))
      math.round(c * 1e6)
    }
    val expected = Map(
      1L -> (2L, micro(2, 2, 5) + micro(1, 1, 5)), // spark df=2, query df=1
      2L -> (1L, micro(1, 2, 4)),
      4L -> (1L, micro(4, 1, 4)))                  // dup df=1
    val rows = TextOps.bm25(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows === expected) // doc 3 unscored; micros exact
  }

  test("bm25 ranks by descending micro score with doc_id tie-break and honors topN") {
    val d = docs(doc(1, "dup a"), doc(2, "dup a"), doc(3, "spark a"), doc(4, "b c"))
    // spark (df=1) out-scores dup (df=2); docs 1,2 tie exactly → doc_id order
    val ids = TextOps.bm25(d, topN = 3).collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(3L, 1L, 2L))
    assert(TextOps.bm25(d, topN = 2).collect().map(_.getLong(0)).toSeq === Seq(3L, 1L))
  }

  test("vocab mask rewrites exactly the out-of-vocabulary tokens, in place") {
    val d = docs(
      doc(1, "a a a b c"),  // a:4 b:3 c:2 overall with doc 2
      doc(2, "a b b c z"))
    val rows = TextOps.vocabMask(d, topK = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    // top-2 vocab = {a, b}; c and z mask; token order and count preserved
    assert(rows === List(
      (1L, "a a a b <unk>", 1L),
      (2L, "a b b <unk> <unk>", 2L)))
  }

  test("vocab mask breaks count ties at the K boundary by token order") {
    val d = docs(doc(1, "b a"), doc(2, "b a"))  // a and b both count 2
    val rows = TextOps.vocabMask(d, topK = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "<unk> a") // 'a' < 'b' wins the single slot
  }

  test("q117 lang confusion: cells partition the corpus and rates sum to 1 per declared lang") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val cells = TextOps.langConfusion(d)
      .as[(String, String, Long, Long, Double)].collect().toList
    assert(cells.map(_._3).sum === d.count(), "cells must partition the corpus")
    cells.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum === rows.head._4, s"$lang total inconsistent")
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9, s"$lang rates don't sum to 1")
    }
    // the matrix agrees with q35's per-doc verdict: diagonal mass = agrees
    val agrees = TextOps.langId(d).filter("agrees").count()
    assert(cells.filter(c => c._1 == c._2).map(_._3).sum === agrees)
  }

  test("q117 lang confusion keeps NULL-declared-lang rows — the rows the audit exists for") {
    val d = Seq(
      (1L, "the of and in to here", Some("en"), "s1", 0L),
      (2L, "the of and in to there", Option.empty[String], "s1", 0L),
      (3L, "le la et les des aussi", Option.empty[String], "s1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val cells = TextOps.langConfusion(d)
      .as[(Option[String], String, Long, Long, Double)].collect().toList
    // a plain equi-join would drop the null-lang group entirely
    assert(cells.map(_._3).sum === 3L, s"null-lang cells dropped: $cells")
    val nulls = cells.filter(_._1.isEmpty)
    assert(nulls.map(_._3).sum === 2L && nulls.forall(_._4 === 2L))
  }

  test("q119 document audit flags dup/null ids, null/empty text, stale/null n_chars, null metadata") {
    val d = Seq(
      (Some(1L), Some("healthy doc"), Some("en"), Some("s1"), Some(11L)),
      (Some(1L), Some("dup id"), Some("en"), Some("s1"), Some(6L)),          // duplicate doc_id
      (Some(2L), Option.empty[String], Some("en"), Some("s1"), Some(0L)),    // null text
      (Some(3L), Some(""), Some("en"), Some("s1"), Some(0L)),                // empty text
      (Some(4L), Some("four chars? no"), Some("en"), Some("s1"), Some(99L)), // stale n_chars
      (Some(5L), Some("x"), Option.empty[String], Option.empty[String], Some(1L)),
      (Option.empty[Long], Some("no id"), Some("en"), Some("s1"), Some(5L)), // NULL key ≠ dup
      (Some(6L), Some("no chars"), Some("en"), Some("s1"), Option.empty[Long]) // NULL n_chars
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.documentAudit(d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(got === ((8L, 6L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 0L, 99L, 122L)))
  }

  test("q119 document audit on the real corpus: a provably clean census") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextOps.documentAudit(d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(got._1 === d.count() && got._2 === got._1)
    assert(got._3 === 0L && got._4 === 0L && got._5 === 0L && got._6 === 0L)
    assert(got._7 === 0L && got._8 === 0L && got._9 === 0L && got._10 === 0L)
    assert(got._11 > 0L && got._12 >= got._11)
  }

  test("q111 vocab coverage: exact rungs on a hand corpus, bottom rung covers all") {
    val d = docs(doc(1, "a a a a b b c"))  // a:4 → bucket 2, b:2 → bucket 1, c:1 → bucket 0
    val rows = TextOps.vocabCoverage(d)
      .select("b", "min_freq", "vocab_size", "covered_tokens", "token_coverage")
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(rows === List(
      (2L, 4L, 1L, 4L, 4.0 / 7.0),   // terms with freq ≥ 4: {a}
      (1L, 2L, 2L, 6L, 6.0 / 7.0),   // freq ≥ 2: {a, b}
      (0L, 1L, 3L, 7L, 1.0)))        // freq ≥ 1: everything
  }

  test("q111 vocab coverage: cumulative counts are monotone down the rungs") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = TextOps.vocabCoverage(d)
      .select("b", "vocab_size", "covered_tokens", "token_coverage")
      .as[(Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(rows.nonEmpty)
    // descending threshold admits more terms: all three cumulatives grow
    rows.sliding(2).foreach {
      case List((_, v1, c1, t1), (_, v2, c2, t2)) =>
        assert(v1 > v2 && c1 > c2 && t1 > t2, s"not monotone: $rows")
      case _ => ()
    }
    assert(rows.head._4 === 1.0, "the freq ≥ 1 rung must cover every token")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("gopher repetition: top-2-gram share and positional dup-5-gram coverage") {
    val d = docs(
      // "a b" stamped 4x: top 2-gram ("a b" or "b a") count 4; the whole
      // doc is covered by a duplicated 5-gram run
      doc(1, "a b a b a b a b"),
      // all-distinct tokens: no repeated 2-gram beyond count 1, no dup 5-gram
      doc(2, "t1 t2 t3 t4 t5 t6 t7 t8"),
      // one 5-gram repeated with distinct filler between: coverage counts
      // POSITIONS (10 tokens in the two runs), not occurrence products
      doc(3, "p q r s t f1 f2 f3 p q r s t"),
      // too short for any 5-gram; single 2-gram
      doc(4, "x y"))
    val got = TextOps.gopherRepetition(d)
      .as[(Long, Long, Long, Double, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 8L, 4L, 1.0, 8L, 1.0),          // "a b" x4; dup 5-grams cover all 8
      (2L, 8L, 1L, 0.25, 0L, 0.0),         // every 2-gram unique
      (3L, 13L, 2L, 4.0 / 13, 10L, 10.0 / 13), // "p q" x2; runs cover 10 of 13
      (4L, 2L, 1L, 1.0, 0L, 0.0)))         // one 2-gram, no 5-gram possible
  }

  test("bigram surprisal matches an independent micro-unit computation") {
    // corpus: a:3 b:3 c:1 x:1 (V=4); bigrams: "a b":3, "b a":1, "b c":1
    val d = docs(doc(1, "a b a b"), doc(2, "a b c"), doc(3, "x"))
    def micro(c1: Long, c2: Long): Long =
      math.round((math.log(c1 + 4.0) - math.log(c2 + 1.0)) * 1e6)
    val mAb = micro(3, 3); val mBa = micro(3, 1); val mBc = micro(3, 1)
    val got = TextOps.bigramSurprisal(d)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 2 * mAb + mBa, (2 * mAb + mBa).toDouble / (3 * 1e6)),
      (2L, 2L, mAb + mBc, (mAb + mBc).toDouble / (2 * 1e6))))
    // doc 3 has no bigram — correctly absent; the stamped doc 1 is more
    // predictable (lower avg) than the one-off continuation in doc 2
    assert(got(0)._4 < got(1)._4)
  }

  test("source quality rolls up exactly the per-doc q61 verdicts") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextOps.sourceQuality(d).collect()
    assert(got.map(_.getLong(2)).sum === d.count())            // n_docs partitions the corpus
    assert(got.map(_.getLong(3)).sum ===
      TextOps.trainingFilter(d).filter("keep").count())        // n_kept sums to the q61 keeps
    got.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)   // kept_frac a proper rate
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)   // stop_ratio a proper rate
    }
    assert(got.length === d.select("lang", "source").distinct().count())
  }

  test("DSIR weights match an independent log-ratio computation; val excluded") {
    // pick real ids landing in each split (first md5 byte of the id string)
    def bucket(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d(0) & 0xff
    }
    val ids = 1L to 500L
    val trainIds = ids.filter(bucket(_) < 204)
    val testId = ids.find(bucket(_) >= 230).get
    val valId = ids.find(b => bucket(b) >= 204 && bucket(b) < 230).get
    val d = docs(
      doc(testId, "a b a b"),        // target model: ab:2, ba:1  (tt=3)
      doc(trainIds(0), "a b c"),     // raw model: ab:1, bc:1
      doc(trainIds(1), "z z"),       // raw model: zz:1          (tr=3)
      doc(trainIds(2), "solo"),      // no bigram → zero weight row
      doc(valId, "a b a b a b"))     // val: must touch NEITHER model
    // joint vocab {ab, ba, bc, zz} → v=4; smoothing denom = 7 both sides
    def micro(tc: Long, rc: Long): Long =
      math.round((math.log(tc + 1.0) - math.log(7.0)
                  - math.log(rc + 1.0) + math.log(7.0)) * 1e6)
    val got = TextOps.dsirWeights(d)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val exp = Seq(
      (trainIds(0), 2L, micro(2, 1) + micro(0, 1)),  // ab + bc (bc negative)
      (trainIds(1), 1L, micro(0, 1)),                // zz
      (trainIds(2), 0L, 0L)).sortBy(_._1)
      .map { case (i, n, m) => (i, n, m, m.toDouble / 1e6) }
    assert(got === exp)
    // target-like text outweighs raw-only text
    assert(got.find(_._1 == trainIds(0)).get._4 >
           got.find(_._1 == trainIds(1)).get._4)
  }

  test("PII scrub counts and masks exactly the injected email/phone/ip snippets") {
    val d = docs(
      doc(1, "w1 w2"),   // 1: no injection — text passes through untouched
      doc(3, "w1 w2"),   // %3: email
      doc(4, "w1 w2"),   // %4: phone
      doc(5, "w1 w2"),   // %5: ip (5 DIV 7 = 0)
      doc(60, "w1 w2"))  // %3+%4+%5: all three (60 DIV 7 = 8)
    val got = TextOps.piiScrub(d)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 0L, md5hex("w1 w2")),
      (3L, 1L, 0L, 0L, md5hex("w1 w2 <EMAIL>")),
      (4L, 0L, 1L, 0L, md5hex("w1 w2 <PHONE>")),
      (5L, 0L, 0L, 1L, md5hex("w1 w2 <IP>")),
      (60L, 1L, 1L, 1L, md5hex("w1 w2 <EMAIL> <PHONE> <IP>"))))
  }

  test("DSIR resample: expected-size sample tilted toward target-like docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = TextOps.dsirResample(docs)
      .select("doc_id", "logw_micro", "kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    // covers exactly the train split, like q95
    assert(rows.length === TextOps.dsirWeights(docs).count())
    // kept count is a sum of independent Bernoullis with E = target
    // (minus capping slack): bound loosely at target ± 50
    val kept = rows.count(_._3)
    assert(math.abs(kept - TextOps.DsirResampleTarget) <= 50,
      s"kept $kept vs target ${TextOps.DsirResampleTarget}")
    // the whole point: importance tilts the sample toward high-logw docs
    val keptMean = rows.filter(_._3).map(_._2.toDouble).sum / kept
    val dropMean = rows.filterNot(_._3).map(_._2.toDouble).sum / (rows.length - kept)
    assert(keptMean > dropMean,
      s"sample not importance-tilted: kept mean $keptMean vs dropped $dropMean")
    // replay-safe: the md5 draw makes the sample a pure function of the data
    val again = TextOps.dsirResample(docs)
      .select("doc_id", "logw_micro", "kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(again === rows)
    // a target >= corpus size caps every positive-weight rate at 1; docs
    // whose weight quantizes to zero micro-units (exp(logw) < 0.5e-6)
    // carry ~no importance mass and are never kept at any target
    val all = TextOps.dsirResample(docs, target = 1000000L)
      .select("w_micro", "kept").as[(Long, Boolean)].collect()
    assert(all.forall { case (w, k) => k === (w > 0L) })
    assert(all.count(_._2) > 0)
  }

  test("DSIR resample water-fill converges when positive-weight docs < target") {
    // the regression the monotone capped bit exists for: a stateless
    // (n, s) recomputation cycles forever here — zero-weight docs flip in
    // and out of the capped set whenever s hits 0 — and the convergence
    // require used to throw. 50 equal positive docs + 60 zero-weight docs
    // against target 100: every positive doc caps at rate 1, zero-weight
    // docs never keep.
    val w = (0L until 50L).map(i => (i, 0L)) ++ (100L until 160L).map(i => (i, -30000000L))
    val wdf = w.toDF("doc_id", "logw_micro")
    val rows = TextOps.dsirResample(wdf.select("doc_id").crossJoin(
        Seq(("x", "en", "s", 0L)).toDF("text", "lang", "source", "n_chars")),
        target = 100L, weights = Some(wdf))
      .select("doc_id", "w_micro", "kept").as[(Long, Long, Boolean)].collect()
    assert(rows.length === 110)
    assert(rows.filter(_._1 < 50L).forall(_._3), "positive-weight docs must all keep")
    assert(rows.filter(_._1 >= 100L).forall(!_._3), "zero-weight docs must all drop")
  }

  test("DSIR resample raises loudly on a micro-unit weight overflow") {
    val wdf = Seq((1L, 0L), (2L, 50000000L)).toDF("doc_id", "logw_micro")
    val docs = Seq((1L, "x", "en", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[Exception] {
      TextOps.dsirResample(docs, target = 1L, weights = Some(wdf)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("overflows micro-units"),
      s"wrong failure: ${e.getMessage}")
  }

  private def collocDocs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("q198 phrase search: adjacency not co-occurrence, overlaps count, trigram offsets; corpus recount") {
    // doc 1: "hash join" twice (pos 0 and 2); doc 2: both terms present
    // but NOT adjacent — a bag-of-terms index would false-match; doc 3:
    // both a bigram (@0) and the trigram (@2)
    val fix = docs(
      (1L, "hash join hash join", "en", "s", 19L),
      (2L, "hash table join scan", "en", "s", 20L),
      (3L, "table scan sort merge join", "en", "s", 26L))
    val got = TextOps.phraseSearch(fix).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      ("hash join", 1L) -> (2L, 0L),
      ("table scan", 3L) -> (1L, 0L),
      ("sort merge join", 3L) -> (1L, 2L)),
      "adjacency only — doc 2's non-adjacent terms must not match")
    // corpus recount from first principles at sf0.001
    val documents = Tables.documents(spark, "/root/testdata/sf0.001")
    val real = TextOps.phraseSearch(documents).collect()
    val texts = documents.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val want = TextOps.PhraseBook.flatMap { phrase =>
      val terms = phrase.split(" ")
      texts.flatMap { case (id, toks) =>
        val hits = toks.indices.filter(i => i + terms.length <= toks.length &&
          terms.indices.forall(j => toks(i + j) == terms(j)))
        if (hits.isEmpty) None
        else Some((phrase, id, hits.size.toLong, hits.min.toLong))
      }
    }.sortBy(t => (t._1, t._2))
    assert(real.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === want)
    assert(real.exists(_.getString(0) == "hash join"),
      "the present phrase must match on the corpus")
    assert(!real.exists(_.getString(0) == "sort merge join"),
      "the absent trigram's zero-match case must be exercised at sf0.001")
    val reparted = TextOps.phraseSearch(documents.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === real.map(_.toSeq).toSeq)
  }

  test("q143 collocations: support and lift cuts are exact; lift is the plain ratio") {
    // (a,b)×5 and (c,d)×5 pass both cuts; (e,f)×4 fails support alone
    // (its lift 4·14/(4·4) = 3.5 clears the bar)
    val docs = collocDocs(
      Seq.fill(5)("a b") ++ Seq.fill(5)("c d") ++ Seq.fill(4)("e f"))
    val got = TextOps.collocations(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet === Set(("a", "b"), ("c", "d")), s"got ${got.keySet}")
    assert(got(("a", "b")) === ((5L, 5L, 5L, 70.0 / 25.0)))
    // the ≥ boundary holds exactly: diluting a's marginal with "a f"
    // docs puts (a,b) and (a,f) at lift 5·15/(10·5) == 3/2 PRECISELY —
    // kept, because the cut is the exact cross-multiplied rational
    val boundary = TextOps.collocations(
      collocDocs(Seq.fill(5)("a b") ++ Seq.fill(5)("c d") ++ Seq.fill(5)("a f")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(boundary.keySet === Set(("a", "b"), ("a", "f"), ("c", "d")),
      s"got ${boundary.keySet}")
    assert(boundary(("a", "b")) === 1.5 && boundary(("a", "f")) === 1.5)
    // one more dilution drops below 3/2: (a,b) = 5·20/(15·5) = 4/3
    val diluted = TextOps.collocations(
      collocDocs(Seq.fill(5)("a b") ++ Seq.fill(5)("c d") ++
        Seq.fill(5)("a f") ++ Seq.fill(5)("a g")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(diluted === Set(("c", "d")), s"got $diluted")
  }

  test("q143 collocations on the corpus: matches the exact BigInt reference; partitioning invariance") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = TextOps.collocations(docs).collect()
    assert(rows.nonEmpty, "the corpus must contain collocations")
    // reference: bigram the collected texts, apply the same BigInt rule
    val bigrams = docs.select("text").as[String].collect()
      .flatMap(t => { val tk = t.split(" ", -1); tk.zip(tk.drop(1)) })
    val big = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val lx = big.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
    val ry = big.groupBy(_._1._2).map { case (y, m) => y -> m.values.sum }
    val n = BigInt(big.values.sum)
    val want = big.collect {
      case ((x, y), nxy) if nxy >= TextOps.CollocationMinSupport &&
        BigInt(TextOps.CollocationLiftDen) * nxy * n >=
          BigInt(TextOps.CollocationLiftNum) * lx(x) * ry(y) =>
        (x, y) -> (nxy, lx(x), ry(y),
          (BigInt(nxy) * n).toDouble / (BigInt(lx(x)) * ry(y)).toDouble)
    }.toMap
    val got = rows.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === want,
      s"${got.size} engine rows vs ${want.size} reference rows")
    val reparted = TextOps.collocations(docs.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(reparted === rows.map(_.toSeq).toSeq)
  }

  test("q219 class keyterms: a class-exclusive term posts exact max lift, shared filler sinks, min-tf gates hapax") {
    // two classes, 60 tokens each: "shared" everywhere (lift 1), "aaa"
    // exclusive to en, "bbb" exclusive to fr, "rare" seen 4× (below the
    // 5-count gate despite enormous would-be lift)
    val en = ("shared " * 50 + "aaa " * 6 + "rare " * 4).trim
    val fr = ("shared " * 54 + "bbb " * 6).trim
    val docs = Seq((1L, en, "en"), (2L, fr, "fr"))
      .toDF("doc_id", "text", "lang")
    val rows = TextOps.classKeyterms(docs).collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(2)) -> r).toMap
    // en-exclusive "aaa": lift = (6/60)/(6/120) = 2 exactly
    assert(byKey(("en", "aaa")).getLong(5) === 2000000L)
    assert(byKey(("en", "aaa")).getLong(1) === 1L, "exclusive term tops its class")
    assert(byKey(("fr", "bbb")).getLong(5) === 2000000L)
    // shared filler: lift = (50/60)/(104/120) = 961538 micro floor'd
    assert(byKey(("en", "shared")).getLong(5) === 1000000L * 50 * 120 / (104 * 60))
    // the hapax gate: "rare" (4 < 5) must not appear at all
    assert(!rows.exists(_.getString(2) == "rare"), "below-min-tf term surfaced")
    // corpus: per-class boards are full and total-ordered; replay invariant
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val cRows = TextOps.classKeyterms(corpus).collect()
    val perLang = cRows.groupBy(_.getString(0))
    perLang.foreach { case (l, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length).toSeq,
        s"ranks for $l must be 1..n")
      assert(rs.length <= TextOps.KeytermTopN)
    }
    val again = TextOps.classKeyterms(corpus.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(again === cRows.map(_.toSeq).toSeq)
  }
}

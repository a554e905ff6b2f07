package graft

import graft.ops.{PipelineOps, QualityModelOps, TextOps}
import org.apache.spark.sql.functions.col

class QualityModelOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("quality classifier generalizes: held-out AUC beats chance") {
    // weak labels come from the q61 heuristic; training sees only the q57
    // TRAIN split, so the val/test splits are genuinely held out. AUC is
    // the Mann-Whitney statistic over (score, label) — ties counted half.
    val scores = QualityModelOps.qualityClassifier(docs)
      .select("doc_id", "score_micro")
      .join(TextOps.trainingFilter(docs).select("doc_id", "keep"), "doc_id")
      .join(PipelineOps.splitAssign(docs).select("doc_id", "split"), "doc_id")
      .filter(col("split") =!= "train")
      .select("score_micro", "keep").as[(Long, Boolean)].collect()
    val pos = scores.filter(_._2).map(_._1)
    val neg = scores.filterNot(_._2).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty, s"degenerate held-out labels: ${scores.length} rows")
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toDouble * neg.length)
    assert(auc > 0.8, s"held-out AUC $auc not better than chance " +
      s"(${pos.length} pos / ${neg.length} neg)")
  }

  test("quality classifier is deterministic and total over the corpus") {
    val a = QualityModelOps.qualityClassifier(docs).collect().map(_.toSeq).toSeq
    val b = QualityModelOps.qualityClassifier(docs).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.length === docs.count())
  }

  test("score calibration: bins partition the corpus and the curve slopes upward") {
    val scores = QualityModelOps.qualityClassifier(docs)
    val labels = TextOps.trainingFilter(docs).select("doc_id", "keep")
    val bins = QualityModelOps.scoreCalibration(scores, labels)
      .select("bin", "n_docs", "n_keep")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // every doc lands in exactly one bin
    assert(bins.map(_._2).sum === docs.count())
    assert(bins.forall { case (_, n, k) => k >= 0 && k <= n })
    // the reliability property the query exists to show: docs above the
    // median bin keep at a (much) higher rate than docs below it
    val mid = bins(bins.length / 2)._1
    def rate(sel: ((Long, Long, Long)) => Boolean) = {
      val s = bins.filter(sel)
      s.map(_._3).sum.toDouble / s.map(_._2).sum
    }
    assert(rate(_._1 >= mid) > rate(_._1 < mid) + 0.2,
      s"calibration curve flat: ${bins.toSeq}")
  }

  test("quality token curve: bins partition the corpus, cumulative is a true suffix sum") {
    val scores = QualityModelOps.qualityClassifier(docs)
      .select("doc_id", "score_micro")
    val curve = QualityModelOps.qualityTokenCurve(scores, docs)
      .select("bin", "n_docs", "n_tokens", "cum_docs", "cum_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val totalDocs = docs.count()
    val totalToks = docs.selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    // per-bin counts partition the corpus exactly
    assert(curve.map(_._2).sum === totalDocs)
    assert(curve.map(_._3).sum === totalToks)
    // cum at the LOWEST bin covers everything; cum at the top bin is itself
    assert(curve.head._4 === totalDocs && curve.head._5 === totalToks)
    assert(curve.last._4 === curve.last._2 && curve.last._5 === curve.last._3)
    // suffix-sum identity bin-by-bin: cum(i) = n(i) + cum(i+1)
    curve.zip(curve.tail).foreach { case (lo, hi) =>
      assert(lo._4 === lo._2 + hi._4, s"cum_docs broken at bin ${lo._1}")
      assert(lo._5 === lo._3 + hi._5, s"cum_tokens broken at bin ${lo._1}")
    }
  }

  test("quality budget cut: minimal covering cut, exact boundary, full-keep fallback") {
    val scores = QualityModelOps.qualityClassifier(docs)
      .select("doc_id", "score_micro")
    val budget = QualityModelOps.CurationTokenBudget
    val kept = QualityModelOps.qualityBudgetCut(scores, docs)
      .select("doc_id", "bin", "n_tok", "cut_bin")
      .as[(String, Long, Long, Long)].collect()
    assert(kept.nonEmpty)
    val cut = kept.head._4
    assert(kept.forall(_._4 === cut), "cut_bin must be a single dial on every row")
    assert(kept.forall(_._2 >= cut), "kept rows must all score at or above the cut")
    // coverage: the kept set meets the budget...
    val keptToks = kept.map(_._3).sum
    assert(keptToks >= budget, s"kept $keptToks tokens < budget $budget")
    // ...and MINIMALLY so: dropping the cut bin itself falls below budget
    // (the cut is the HIGHEST covering bin), unless the fallback fired
    val aboveCut = kept.filter(_._2 > cut).map(_._3).sum
    val totalToks = docs.selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    if (totalToks >= budget)
      assert(aboveCut < budget,
        s"cut not minimal: bins above $cut already cover $aboveCut >= $budget")
    // fallback: an uncoverable budget keeps the WHOLE corpus (cut = lowest bin)
    val all = QualityModelOps.qualityBudgetCut(scores, docs, budget = totalToks + 1)
      .count()
    assert(all === docs.count(),
      s"budget > corpus must keep everything, kept $all of ${docs.count()}")
  }

  test("quality budget cut plan: bounded cumulative join, one-row dial broadcast, no window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val scores = QualityModelOps.qualityClassifier(docs)
      .select("doc_id", "score_micro")
    val q = QualityModelOps.qualityBudgetCut(scores, docs)
    assert(q.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "q123 must not window")
    val exec = q.queryExecution.executedPlan.toString
    assert(exec.contains("BroadcastNestedLoopJoin") || exec.contains("BroadcastHashJoin"),
      s"the one-row cut dial must broadcast:\n${exec.take(1500)}")
  }

  test("q128 lang score census: percentile bins are minimal covers; totals partition the corpus") {
    val scores = QualityModelOps.qualityClassifier(docs)
      .select("doc_id", "score_micro")
    val census = QualityModelOps.langScoreCensus(scores, docs)
      .as[(String, Long, Long, Long)].collect()
    assert(census.map(_._2).sum === docs.count())
    // recompute per-lang bins locally and check the minimal-cover rule
    val binsByLang = scores
      .join(docs.select("doc_id", "lang"), "doc_id")
      .selectExpr("lang",
        s"CAST(FLOOR(CAST(score_micro AS DOUBLE) / ${QualityModelOps.CalibrationBinMicro}e0) AS BIGINT) AS bin")
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    census.foreach { case (lang, n, p50, p95) =>
      val bins = binsByLang(lang).sorted
      assert(n === bins.length.toLong)
      def cumAt(b: Long) = bins.count(_ <= b).toLong
      assert(cumAt(p50) * 2 >= n, s"$lang p50 bin does not cover half")
      assert(cumAt(p50 - 1) * 2 < n, s"$lang p50 bin not minimal")
      assert(cumAt(p95) * 20 >= n * 19, s"$lang p95 bin does not cover 95%")
      assert(cumAt(p95 - 1) * 20 < n * 19, s"$lang p95 bin not minimal")
      assert(p95 >= p50)
    }
  }

  test("q128 plan: no window — percentiles come from the bounded bin table") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val q = QualityModelOps.langScoreCensus(
      QualityModelOps.qualityClassifier(docs).select("doc_id", "score_micro"), docs)
    assert(q.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "q128 must not window (per-language rank is the q58 scale-killer)")
  }

  test("quality classifier plan: bounded weight table broadcast, no window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val q = QualityModelOps.qualityClassifier(docs)
    // the hashed feature space is bounded (<= 256 buckets), so the weight
    // gather must be a broadcast join — an unbounded-vocab shuffle join
    // here would be the q92 hot-key shape the hashing trick exists to avoid
    val exec = q.queryExecution.executedPlan.toString
    assert(exec.contains("BroadcastHashJoin"),
      s"bucket weight gather must broadcast:\n${exec.take(1500)}")
    assert(q.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "q101 must not window")
  }

  private def rocFixture(rows: Seq[(Long, Long, Boolean)]) = {
    val scores = rows.map { case (id, s, _) => (id, s) }.toDF("doc_id", "score_micro")
    val labels = rows.map { case (id, _, k) => (id, k) }.toDF("doc_id", "keep")
    QualityModelOps.rocAuc(scores, labels)
  }

  test("q141 ROC/AUC: separated bins give AUC 1, reversed 0, one-bin ties 0.5, one-class NULL") {
    // two positives in bin 2, two negatives in bin 0 — perfect separation
    val sep = rocFixture(Seq((1L, 4000000L, true), (2L, 5000000L, true),
      (3L, 0L, false), (4L, 1000000L, false))).collect()
    assert(sep.map(_.getLong(0)).toSeq === Seq(2L, 0L), "descending bins")
    assert(sep.forall(_.getDouble(7) === 1.0), "AUC 1 on every row")
    assert(sep.forall(_.getDouble(8) === 1.0), "gini = 2·AUC − 1")
    val top = sep(0); val bot = sep(1)
    assert(top.getDouble(4) === 1.0 && top.getDouble(5) === 0.0,
      "cutting at the top bin keeps all positives, no negatives")
    assert(top.getDouble(6) === 1.0)
    assert(bot.getDouble(4) === 1.0 && bot.getDouble(5) === 1.0,
      "cutting at the bottom bin keeps everything")
    assert(bot.getDouble(6) === 0.5)
    // labels reversed: the classifier is perfectly anti-ordered
    val rev = rocFixture(Seq((1L, 4000000L, false), (2L, 5000000L, false),
      (3L, 0L, true), (4L, 1000000L, true))).collect()
    assert(rev.forall(_.getDouble(7) === 0.0))
    assert(rev.forall(_.getDouble(8) === -1.0))
    // one bin, one of each: pure tie — AUC ½
    val tie = rocFixture(Seq((1L, 100L, true), (2L, 200L, false))).collect()
    assert(tie.length === 1 && tie(0).getDouble(7) === 0.5)
    // a single class carries no ranking information — NULL, not a raise
    val onecls = rocFixture(Seq((1L, 100L, true), (2L, 4000000L, true))).collect()
    assert(onecls.forall(r => r.isNullAt(7) && r.isNullAt(8)))
    assert(onecls.forall(r => !r.isNullAt(4) && r.isNullAt(5)),
      "tpr still defined, fpr NULL with zero negatives")
  }

  test("q141 ROC/AUC on the corpus: matches the exact BigInt pair reference; curve monotone") {
    val scores = QualityModelOps.qualityClassifier(docs)
    val labels = TextOps.trainingFilter(docs).select("doc_id", "keep")
    val rows = QualityModelOps.rocAuc(scores, labels).collect()
    assert(rows.length >= 2, "the corpus must spread over several bins")
    // exact reference: bin the same way, count ordered pairs in BigInt,
    // divide once — must match the engine's double BIT-for-bit
    val binned = scores.select("doc_id", "score_micro")
      .join(labels, "doc_id")
      .selectExpr(
        s"CAST(FLOOR(CAST(score_micro AS DOUBLE) / ${QualityModelOps.CalibrationBinMicro}e0) AS BIGINT) AS bin",
        "keep")
      .as[(Long, Boolean)].collect()
    val byBin = binned.groupBy(_._1).map { case (b, xs) =>
      (b, xs.count(_._2).toLong, xs.count(!_._2).toLong) }.toSeq.sortBy(_._1)
    val p = BigInt(byBin.map(_._2).sum); val n = BigInt(byBin.map(_._3).sum)
    var negBelow = BigInt(0); var num2 = BigInt(0)
    byBin.foreach { case (_, pos, neg) =>
      num2 += BigInt(pos) * (2 * negBelow + neg); negBelow += neg }
    val wantAuc = num2.toDouble / (2 * p * n).toDouble
    assert(rows.forall(_.getDouble(7) === wantAuc),
      s"engine AUC ${rows.head.getDouble(7)} != reference $wantAuc")
    assert(wantAuc > 0.8, "the classifier must genuinely separate the heuristic labels")
    // descending the curve, tpr and fpr only grow; the last point is (1,1)
    val tprs = rows.map(_.getDouble(4)); val fprs = rows.map(_.getDouble(5))
    assert(tprs.zip(tprs.tail).forall { case (a, b) => a <= b })
    assert(fprs.zip(fprs.tail).forall { case (a, b) => a <= b })
    assert(tprs.last === 1.0 && fprs.last === 1.0)
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum === docs.count(),
      "bins partition the corpus")
  }

  test("q226 kappa: perfect 1, independent 0, inverted -1 (sign-outside), saturated NULL; corpus laws + replay") {
    import spark.implicits._
    def scores(ps: Seq[Boolean]) = ps.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("doc_id", "pred")
    def labels(ks: Seq[Boolean]) = ks.zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("doc_id", "keep")
    def kappa(ps: Seq[Boolean], ks: Seq[Boolean]) =
      QualityModelOps.labelAgreement(scores(ps), labels(ks)).collect().head
    // perfect agreement on a mixed table: po = 1, kappa = 1
    val perfect = kappa(Seq(true, true, false, false), Seq(true, true, false, false))
    assert(perfect.getLong(5) === 1000000L && perfect.getLong(7) === 1000000L)
    // chance-level: the 1/1/1/1 table has po = pe = 0.5, kappa exactly 0
    val indep = kappa(Seq(true, true, false, false), Seq(true, false, true, false))
    assert(indep.getLong(5) === 500000L && indep.getLong(6) === 500000L)
    assert(indep.getLong(7) === 0L)
    // inversion: kappa = -1 — the sign-outside floor law's negative leg
    val inv = kappa(Seq(true, true, false, false), Seq(false, false, true, true))
    assert(inv.getLong(7) === -1000000L)
    // saturated chance (both raters constant): kappa undefined, NOT 1
    val sat = kappa(Seq(true, true), Seq(true, true))
    assert(sat.getLong(5) === 1000000L && sat.isNullAt(7),
      "constant raters must yield NULL kappa, never a fake 1")
    // corpus: cells partition the join, po within [0, 1e6], replay
    val sc = SparkEntry.qualityScoresShared(spark, "/root/testdata/sf0.001")
    val lb = SparkEntry.qualityLabelsShared(spark, "/root/testdata/sf0.001")
    val row = QualityModelOps.labelAgreement(sc, lb).collect().head
    assert((0 to 3).map(row.getLong).sum === row.getLong(4))
    assert(row.getLong(5) >= 0L && row.getLong(5) <= 1000000L)
    val again = QualityModelOps.labelAgreement(
      sc.repartition(7), lb.repartition(5)).collect().head
    assert(again.toSeq === row.toSeq)
  }
}

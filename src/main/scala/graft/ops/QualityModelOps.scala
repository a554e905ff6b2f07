package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MODEL-BASED quality filtering — the GPT-3/LLaMA-style "looks like the
  * reference corpus" classifier (Brown et al. 2020 §A; CCNet, Wenzek et al.
  * 2020): a linear classifier over hashed token features, trained with WEAK
  * SUPERVISION (the q61 heuristic filter's verdict stands in for the
  * "reference corpus" positive class — the CCNet setup, where a cheap
  * heuristic labels the training set and the learned model generalizes the
  * decision), then applied to EVERY document as a score the curriculum
  * thresholds or importance-samples by.
  *
  * The model is deliberately multinomial-Naive-Bayes-shaped rather than
  * MLlib logistic regression (`ml/FraudScorer` proves that recipe on
  * events): NB's weights are CLOSED-FORM functions of integer counts —
  * w_b = ln(c⁺_b+1) − ln(T⁺+B) − ln(c⁻_b+1) + ln(T⁻+B), the add-one
  * log-odds of feature bucket b — so training is ONE aggregate, the
  * score is hash-gradable cross-engine via the q95 micro-unit-ln recipe
  * (ln of integers, per-occurrence micro rounding with a boundary guard,
  * exact int64 sums), and a distributed run is bit-reproducible; L-BFGS
  * coefficients are none of those (partition-order double sums — the
  * documented FraudScorer caveat). NB log-odds + threshold IS a linear
  * classifier over the same features fastText uses at corpus scale.
  *
  * Features (fastText's hashing trick — every feature string maps to
  * `bucket = first md5 byte`, the [[PipelineOps.md5Bucket]] primitive,
  * B = 256): per token, the token itself AND the `lang|token`
  * interaction (fastText's word + metadata-context features — the
  * interaction is what lets a linear model express "this stop word in
  * THIS language's document", the lang-consistency axis of quality);
  * plus two per-doc structural bins, `__len<bin>` (log-ish length bins)
  * and `__dr<bin>` (distinct-token-ratio sixteenths, a repetition
  * signal), both EXACT integer binning so the feature string is
  * engine-independent. Hashing makes the feature space BOUNDED by
  * construction: the weight table is ≤ B rows no matter the corpus, so it
  * broadcasts, and scoring is a row-local gather — no unbounded-vocab
  * join, no hot-key skew (contrast q92's n-gram table, which needs the
  * two-tier gather precisely because it is unbounded).
  * Held-out discrimination at sf0.001: AUC ≈ 0.99 (spec-asserted > 0.8);
  * token buckets alone cannot see the lang-agreement/repetition axes —
  * the interaction + structural features are what make the weak labels
  * learnable.
  *
  * Scale shape: label + split are row-local rules; training is one
  * map-side-combinable aggregate to ≤ B rows; the weight/total/bias
  * tables broadcast; scoring is explode → broadcast join → per-doc
  * aggregate. No window, no collect, nothing unbounded on the driver. */
object QualityModelOps {

  /** Feature-space size: [[PipelineOps.md5Bucket]]'s range. The smoothing
    * denominator uses it, so both engines must agree on the constant. */
  val NumBuckets = 256

  /** q101 — the corpus-wide quality score: per doc, the hashed-feature
    * count, the exact micro-unit NB log-odds score (bias + Σ per-token
    * bucket weights), and the thresholded verdict `pred = score > 0`.
    * Training docs are the q57 TRAIN split only; the q61 heuristic
    * supplies the weak labels; every doc (all splits) is scored — the
    * held-out splits are what the AUC spec grades generalization on. */
  /** `weakLabels`: an already-materialized (doc_id, keep) table (the
    * `SparkEntry` q61 snapshot — the q59/q91 reads-vs-measures division:
    * q61 stays the live measured plan, q101 trains on its STORED verdict
    * like a real pipeline stage). Defaults to deriving the labels live. */
  def qualityClassifier(docs: DataFrame,
                        weakLabels: Option[DataFrame] = None): DataFrame = {
    // the feature explode (~3× token volume of narrow (doc_id, fb) rows)
    // is consumed TWICE — the training aggregate and the scoring pass —
    // and broadcast vs shuffle exchanges can't share a subtree, so
    // without materialization the corpus explodes twice per query.
    // localCheckpoint it ONCE (the q108 `bins` idiom); at cluster scale
    // this is the standard materialize-the-feature-stage trade.
    val toks = featureRows(docs).localCheckpoint()
    // ONE bounded aggregate = the whole training pass: per-bucket
    // positive/negative occurrence counts over weak-labeled train docs
    val m = modelTables(docs, weakLabels, toks)
    // scoring: every token occurrence gathers its bucket's weight via a
    // BROADCAST join (the weight table is ≤ NumBuckets rows); buckets the
    // train split never produced fall back to zero counts (left_outer)
    val w = s"(ln(COALESCE(cpos, 0) + 1) - ln(tpos + $NumBuckets)" +
      s" - ln(COALESCE(cneg, 0) + 1) + ln(tneg + $NumBuckets)) * 1e6"
    val scored = toks
      .join(broadcast(m.counts), Seq("fb"), "left_outer")
      .crossJoin(broadcast(m.totals))
      .selectExpr("doc_id", s"${microGuard(w, "q101 weight")} AS micro")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("micro").as("fm"))
    docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left_outer")
      .crossJoin(broadcast(m.bias))
      .selectExpr("doc_id",
        "CAST(COALESCE(n_feats, 0) AS BIGINT) AS n_feats",
        "COALESCE(fm, 0) + bias_micro AS score_micro",
        "CAST(COALESCE(fm, 0) + bias_micro AS DOUBLE) / 1e6 AS score",
        "COALESCE(fm, 0) + bias_micro > 0 AS pred")
      .orderBy("doc_id")
  }

  /** The trained model as a BOUNDED ARTIFACT: the full 0..255 bucket →
    * guarded micro-unit weight array plus the bias — what a real pipeline
    * persists next to its corpus so ingest-time consumers
    * ([[graft.streaming.StreamQualityScore]]) can score arriving docs
    * without touching the corpus (the k-means-centroids / BPE-merges
    * pattern). The per-bucket weight is evaluated by the SAME guarded
    * expression [[qualityClassifier]] applies per occurrence — a pure
    * function of the bucket's counts, so pre-tabulating it is exactly
    * the per-occurrence rounding (parity spec-proven bit-equal). The
    * collect is ≤ [[NumBuckets]]+1 rows by construction. */
  def bucketWeightsMicro(docs: DataFrame,
                         weakLabels: Option[DataFrame] = None): (Array[Long], Long) = {
    val spark = docs.sparkSession
    // single consumer of the feature rows here — no checkpoint needed
    val m = modelTables(docs, weakLabels, featureRows(docs))
    val wExpr = s"(ln(COALESCE(cpos, 0) + 1) - ln(tpos + $NumBuckets)" +
      s" - ln(COALESCE(cneg, 0) + 1) + ln(tneg + $NumBuckets)) * 1e6"
    val w = spark.range(NumBuckets).toDF("fb")
      .join(m.counts, Seq("fb"), "left_outer")
      .crossJoin(broadcast(m.totals))
      .selectExpr("fb", s"${microGuard(wExpr, "q101 weight")} AS micro")
      .orderBy("fb")
      .collect().map(_.getLong(1))
    val bias = m.bias.collect().head.getLong(0)
    (w, bias)
  }

  /** The three bounded model tables (per-bucket counts, totals, bias),
    * shared by [[qualityClassifier]] and [[bucketWeightsMicro]] so the
    * corpus path and the persisted artifact cannot drift. */
  private final case class ModelTables(counts: DataFrame, totals: DataFrame,
                                       bias: DataFrame)
  private def modelTables(docs: DataFrame, weakLabels: Option[DataFrame],
                          feats: DataFrame): ModelTables = {
    val labels = weakLabels.getOrElse(
      TextOps.trainingFilter(docs).select(col("doc_id"), col("keep")))
    val trainIds = docs
      .select(col("doc_id"), PipelineOps.md5Bucket(col("doc_id")).as("bucket"))
      .selectExpr("doc_id", s"${PipelineOps.splitOf("bucket")} AS split")
      .filter(col("split") === "train").select("doc_id")
    val counts = feats.join(trainIds, "doc_id").join(labels, "doc_id")
      .groupBy("fb").agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("cpos"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("cneg"))
    // coalesce(0): sums over an EMPTY train side are null, and a null
    // would propagate a null score instead of the prior-free zero model
    val totals = counts.agg(
      coalesce(sum("cpos"), lit(0L)).as("tpos"),
      coalesce(sum("cneg"), lit(0L)).as("tneg"))
    val bias = trainIds.join(labels, "doc_id").agg(
        coalesce(sum(when(col("keep"), 1L).otherwise(0L)), lit(0L)).as("npos"),
        coalesce(sum(when(col("keep"), 0L).otherwise(1L)), lit(0L)).as("nneg"))
      .selectExpr(s"${microGuard("(ln(npos + 1) - ln(nneg + 1)) * 1e6", "q101 bias")} AS bias_micro")
    ModelTables(counts, totals, bias)
  }

  /** The hashed feature rows (doc_id, fb) — the three families via the
    * union of explodes (one simple codegen'd Generate per family; the
    * fused concat-array form measured slower). */
  private def featureRows(docs: DataFrame): DataFrame = {
    val base = docs.selectExpr("doc_id", "lang", "split(text, ' ') AS ts")
    val uni = base.selectExpr("doc_id", "explode(ts) AS f")
    val li = base.selectExpr("doc_id",
      "explode(transform(ts, t -> concat(lang, '|', t))) AS f")
    val strct = base
      .selectExpr("doc_id", "CAST(size(ts) AS BIGINT) AS n",
        "CAST(size(array_distinct(ts)) AS BIGINT) AS nd")
      .selectExpr("doc_id", s"$StructFeatureArray AS fs")
      .selectExpr("doc_id", "explode(fs) AS f")
    uni.unionByName(li).unionByName(strct)
      .select(col("doc_id"), PipelineOps.md5Bucket(col("f")).as("fb"))
  }

  /** The two structural feature strings over columns (n, nd) — shared by
    * the batch feature explode and the streaming row-local scorer. */
  private[graft] val StructFeatureArray: String =
    """array(
         concat('__len', CAST(CASE WHEN n < 20 THEN 0 WHEN n < 40 THEN 1
                                   WHEN n < 60 THEN 2 WHEN n < 80 THEN 3
                                   ELSE 4 END AS STRING)),
         concat('__dr', CAST(least(nd * 16 DIV n, 15) AS STRING)))"""

  /** The q67/q92/q95 rounding-boundary guard: micro values within 1e-6 of
    * a half boundary raise instead of risking a cross-engine rounding
    * flip (a 1-ulp ln divergence at micro scale is ~1e-9, so a value
    * clearing the guard rounds identically on both engines). */
  private def microGuard(raw: String, what: String): String =
    s"""CASE WHEN abs(($raw) - floor($raw) - 0.5e0) < 1e-6
             THEN CAST(raise_error('$what: micro value at a rounding boundary') AS BIGINT)
             ELSE CAST(round($raw) AS BIGINT) END"""

  /** q103's score-bin width in micro-units (2.0 log-odds per bin) — an
    * exact integer constant shared with the oracle, so the bin edge is
    * the same floor division on both engines. */
  val CalibrationBinMicro = 2000000L

  /** q103 — MODEL-vs-HEURISTIC CALIBRATION (the q99 pattern applied to
    * the classifier): bin every doc by its q101 score and report each
    * bin's q61 heuristic agreement — the reliability curve a curation
    * team reads before trusting a learned filter to replace (or
    * threshold differently from) the heuristic that supervised it. A
    * well-calibrated classifier shows keep-rate rising monotonically
    * with the score bin; a flat curve means the score carries no signal
    * at that operating range.
    *
    * Determinism: the bin is floor(score_micro / binMicro) — both
    * engines evaluate the identical double division and floor over the
    * same integer (exact at every representable quotient); counts are
    * exact integers, the rate one final IEEE division. Scale shape: two
    * row-local snapshot reads joined on doc_id, ONE bounded aggregate —
    * |bins| is bounded by the score range (∝ max doc length × max
    * |weight|, ~2 × 10² on the test corpora), never by corpus size. */
  def scoreCalibration(scores: DataFrame, labels: DataFrame,
                       binMicro: Long = CalibrationBinMicro): DataFrame =
    scores.select(col("doc_id"), col("score_micro"))
      .join(labels.select(col("doc_id"), col("keep")), "doc_id")
      .selectExpr(
        s"CAST(FLOOR(CAST(score_micro AS DOUBLE) / ${binMicro}e0) AS BIGINT) AS bin",
        "keep")
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .selectExpr("bin",
        s"CAST(bin AS DOUBLE) * ${binMicro}e0 / 1e6 AS bin_lo",
        "n_docs", "n_keep",
        "CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE) AS keep_rate")
      .orderBy("bin")

  /** q226 — LABEL AGREEMENT / COHEN'S KAPPA: the chance-corrected
    * agreement between the pipeline's two quality labelers — the learned
    * filter's thresholded verdict (q101 `pred`) and the heuristic that
    * weak-supervised it (q61 `keep`). Raw percent agreement flatters any
    * pair of raters that mostly says "keep" (agreeing by chance); kappa
    * subtracts the chance floor: κ = (p_o − p_e)/(1 − p_e) over the 2×2
    * confusion matrix (Cohen 1960) — the label-QA number a curation team
    * reads before trusting weak labels, beside q103's per-bin curve and
    * q141's AUC (calibration and ranking answer different questions than
    * chance-corrected agreement).
    *
    * Exactness: the four cells are exact counts; p_o, p_e, and κ ship as
    * floor'd micro integers with the sign OUTSIDE the floor (the
    * q215/q218 law — κ < 0, worse-than-chance, is a legal value), the
    * cross-multiplied rationals carried in DECIMAL(38,0)/HUGEINT (N²·10⁶
    * outruns int64 past ~3 M docs), shipped BIGINT. κ is NULL when the
    * chance term saturates (both raters constant — agreement is then
    * undefined, not 1), and all three ratios are NULL on an empty join.
    *
    * Scale shape: two row-local snapshot reads joined co-keyed on
    * doc_id, ONE map-combinable aggregate to four counters; every ratio
    * computed on the single 1-row frame. */
  def labelAgreement(scores: DataFrame, labels: DataFrame): DataFrame =
    scores.select(col("doc_id"), col("pred"))
      .join(labels.select(col("doc_id"), col("keep")), "doc_id")
      .agg(
        coalesce(sum(when(col("pred") && col("keep"), 1L)), lit(0L)).as("n11"),
        coalesce(sum(when(col("pred") && !col("keep"), 1L)), lit(0L)).as("n10"),
        coalesce(sum(when(!col("pred") && col("keep"), 1L)), lit(0L)).as("n01"),
        coalesce(sum(when(!col("pred") && !col("keep"), 1L)), lit(0L)).as("n00"))
      .selectExpr("n11", "n10", "n01", "n00",
        "n11 + n10 + n01 + n00 AS n_docs")
      .selectExpr("n11", "n10", "n01", "n00", "n_docs",
        "CAST(n11 + n00 AS DECIMAL(38,0)) AS agree",
        """CAST(n11 + n10 AS DECIMAL(38,0)) * CAST(n11 + n01 AS DECIMAL(38,0))
           + CAST(n01 + n00 AS DECIMAL(38,0)) * CAST(n10 + n00 AS DECIMAL(38,0))
           AS chance""",
        "CAST(n_docs AS DECIMAL(38,0)) AS nd")
      .selectExpr("n11", "n10", "n01", "n00", "n_docs",
        """CAST(CASE WHEN nd = 0 THEN CAST(NULL AS DECIMAL(38,0))
                ELSE CAST(1000000 AS DECIMAL(38,0)) * agree DIV nd
           END AS BIGINT) AS po_micro""",
        """CAST(CASE WHEN nd = 0 THEN CAST(NULL AS DECIMAL(38,0))
                ELSE CAST(1000000 AS DECIMAL(38,0)) * chance DIV (nd * nd)
           END AS BIGINT) AS pe_micro""",
        """CAST(CASE WHEN nd = 0 OR nd * nd - chance = 0
                     THEN CAST(NULL AS DECIMAL(38,0))
                WHEN nd * agree - chance >= 0
                THEN CAST(1000000 AS DECIMAL(38,0)) * (nd * agree - chance)
                     DIV (nd * nd - chance)
                ELSE -((CAST(1000000 AS DECIMAL(38,0)) * (chance - nd * agree))
                       DIV (nd * nd - chance))
           END AS BIGINT) AS kappa_micro""")

  /** q108 — the QUALITY→TOKEN-BUDGET CURVE: for each q101 score bin
    * (descending), how many documents and tokens survive a "keep
    * everything scoring at least this bin" threshold — the curve a
    * curation team reads to PICK the operating threshold: given a target
    * token budget for the training run, the highest bin whose cumulative
    * token count covers the budget is the cut (the data-constrained
    * scaling-law workflow). Reads the MATERIALIZED q101 score snapshot
    * (the q103 pattern; q101 stays the live measured plan).
    *
    * Determinism: the bin is the q103 floor division over the exact
    * integer score; doc/token counts are exact integer sums. The
    * cumulative column is computed by a self-join AGGREGATE over the
    * BOUNDED bin table (|bins| ∝ score range, never corpus size) rather
    * than a window — the bounded O(B²) join costs nothing and keeps the
    * no-window plan invariant checkable. Scale shape: one row-local
    * binning pass + one map-combinable aggregate to ≤ B rows; everything
    * after operates on the bounded bin table. */
  def qualityTokenCurve(scores: DataFrame, docs: DataFrame,
                        binMicro: Long = CalibrationBinMicro): DataFrame = {
    val toks = docs.selectExpr("doc_id",
      "CAST(size(split(text, ' ')) AS BIGINT) AS n_tok")
    // materialize the bounded bin table ONCE (the q111 vocabCoverage
    // idiom): it is referenced THREE times below — the probe side, the
    // broadcast side, and the join-back — and broadcast vs shuffle
    // exchanges can't share, so without this the corpus-scale
    // scores⋈tokens aggregation re-executes per reference
    val bins = scores.select(col("doc_id"), col("score_micro"))
      .join(toks, "doc_id")
      .selectExpr(
        s"CAST(FLOOR(CAST(score_micro AS DOUBLE) / ${binMicro}e0) AS BIGINT) AS bin",
        "n_tok")
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .localCheckpoint()
    // the ≥-join is non-equi, so the BOUNDED side must broadcast
    // explicitly (a bounded-aggregate BNLJ, the q104 anchor idiom) —
    // without the hint Spark falls back to a cartesian at scale
    val cum = bins.as("x")
      .join(broadcast(bins.as("y")), col("y.bin") >= col("x.bin"))
      .groupBy(col("x.bin").as("bin"))
      .agg(sum(col("y.n_docs")).as("cum_docs"),
        sum(col("y.n_tokens")).as("cum_tokens"))
    bins.join(cum, "bin")
      .selectExpr("bin",
        s"CAST(bin AS DOUBLE) * ${binMicro}e0 / 1e6 AS bin_lo",
        "n_docs", "n_tokens", "cum_docs", "cum_tokens")
      .orderBy("bin")
  }

  /** q123's fixed token budget — the training-run size the q108 curve
    * exists to serve, shared with the oracle (and with q122's composed
    * curation manifest). At the graded scales it lands mid-curve, so the
    * cut genuinely bisects the corpus. */
  val CurationTokenBudget = 10000L

  /** q123 — APPLY the q108 operating threshold: the highest score bin
    * whose cumulative token volume covers [[CurationTokenBudget]] becomes
    * the cut, and every doc scoring in or above that bin is KEPT — the
    * decision the q101 → q103 → q108 chain exists to drive, closing it
    * with the emitted kept-doc set (doc_id, score, bin, tokens, and the
    * cut on every row for auditability). When even the full curve cannot
    * cover the budget (budget > corpus), the cut falls back to the LOWEST
    * bin — keep everything, the only budget-respecting choice — rather
    * than raising: an under-budget corpus is a normal early-pipeline
    * state, unlike a malformed artifact.
    *
    * Scale shape: one corpus pass bins (score, tokens) rows — checkpointed
    * because the cut aggregate and the keep filter both consume it — then
    * the cut is ONE bounded aggregate over the ≤ |bins| cumulative table
    * (the q108 bounded self-join, no window), broadcast back as a one-row
    * dial for the row-local keep filter. Determinism: the bin is q103's
    * floor division over exact integers, cumulative sums exact int64, the
    * cut a MAX/MIN over exact integers — hash-identical cross-engine. */
  def qualityBudgetCut(scores: DataFrame, docs: DataFrame,
                       budget: Long = CurationTokenBudget,
                       binMicro: Long = CalibrationBinMicro): DataFrame = {
    val binned = scores.select(col("doc_id"), col("score_micro"))
      .join(docs.selectExpr("doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_tok"), "doc_id")
      .selectExpr("doc_id", "score_micro",
        s"CAST(FLOOR(CAST(score_micro AS DOUBLE) / ${binMicro}e0) AS BIGINT) AS bin",
        "n_tok")
      .localCheckpoint()
    val bins = binned.groupBy("bin").agg(sum("n_tok").as("n_tokens"))
    val cum = bins.as("x")
      .join(broadcast(bins.as("y")), col("y.bin") >= col("x.bin"))
      .groupBy(col("x.bin").as("bin"))
      .agg(sum(col("y.n_tokens")).as("cum_tokens"))
    val cut = cum.agg(
      coalesce(max(when(col("cum_tokens") >= budget, col("bin"))), min(col("bin")))
        .as("cut_bin"))
    binned.crossJoin(broadcast(cut))
      .filter(col("bin") >= col("cut_bin"))
      .select("doc_id", "score_micro", "bin", "n_tok", "cut_bin")
      .orderBy("doc_id")
  }

  /** q128 — PER-LANGUAGE SCORE CENSUS: how the q101 quality distribution
    * differs by language — per lang: doc count and the exact binned
    * median / 95th-percentile score bin (lowest bin whose ascending
    * cumulative covers 50% / 95%). The fairness artifact read before
    * applying ONE corpus-wide cut (q123) across languages: a language
    * whose whole distribution sits below the cut is about to be erased
    * from the corpus, and this census is where that shows first.
    * Percentiles are computed over the BOUNDED q103 bin table — exact
    * integer thresholds (cum·2 ≥ n, cum·20 ≥ 19·n), never a per-language
    * rank: real corpora are lang-skewed and a per-stratum sort funnels
    * the dominant language through one task (the q58 lesson — exact
    * per-row percentiles at 100 TB are what q53's sketches are for).
    *
    * Scale shape: one co-keyed doc_id join, one map-combinable
    * (lang, bin) aggregate, then everything is bounded (≤ |langs|·|bins|
    * rows): a broadcast cumulative self-join and one ≤ |langs|-row
    * aggregate. No window anywhere. */
  def langScoreCensus(scores: DataFrame, docs: DataFrame,
                      binMicro: Long = CalibrationBinMicro): DataFrame = {
    val cells = scores.select(col("doc_id"), col("score_micro"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .selectExpr("lang",
        s"CAST(FLOOR(CAST(score_micro AS DOUBLE) / ${binMicro}e0) AS BIGINT) AS bin")
      .groupBy("lang", "bin").agg(count(lit(1)).as("n"))
      .localCheckpoint() // consumed by the cumulative join AND the totals
    val tot = cells.groupBy("lang").agg(sum("n").as("n_docs"))
    val cum = cells.as("x")
      .join(broadcast(cells.as("y")),
        col("y.lang") === col("x.lang") && col("y.bin") <= col("x.bin"))
      .groupBy(col("x.lang").as("lang"), col("x.bin").as("bin"))
      .agg(sum(col("y.n")).as("cum_n"))
    cum.join(broadcast(tot), "lang")
      .groupBy("lang")
      .agg(max("n_docs").as("n_docs"),
        min(when(col("cum_n") * 2 >= col("n_docs"), col("bin"))).as("p50_bin"),
        min(when(col("cum_n") * 20 >= col("n_docs") * 19, col("bin"))).as("p95_bin"))
      .orderBy("lang")
  }

  /** q141 — EXACT BINNED ROC/AUC of the q101 classifier against the q61
    * heuristic that supervised it: per descending score bin, the ROC
    * point a "keep everything scoring in or above this bin" cut realizes
    * (TPR, FPR, precision), plus the exact area under that curve — the
    * ranking-quality verdict q103's reliability curve doesn't give (a
    * classifier can be calibrated and still not SEPARATE; AUC is the
    * probability a random kept doc outscores a random dropped one).
    *
    * AUC is the Mann-Whitney pair statistic computed EXACTLY from the
    * bounded bin histogram — never a corpus-wide rank (the q58 lesson):
    * num2 = Σ_b n_pos·(2·neg_below + n_neg) counts each correctly-ordered
    * pair twice and each same-bin tie once, so AUC = num2 / (2·P·N) with
    * both sides held in DECIMAL(38,0)/HUGEINT until the one final IEEE
    * division. Degenerate one-class corpora emit NULL (a missing class is
    * an upstream-label state, not a malformed artifact — the q123
    * fallback philosophy). Scale shape: one co-keyed snapshot join and
    * one map-combinable aggregate touch the corpus; everything after is
    * bounded self-joins over the ≤ |bins| table (broadcast, no window). */
  def rocAuc(scores: DataFrame, labels: DataFrame,
             binMicro: Long = CalibrationBinMicro): DataFrame = {
    val bins = scores.select(col("doc_id"), col("score_micro"))
      .join(labels.select(col("doc_id"), col("keep")), "doc_id")
      .selectExpr(
        s"CAST(FLOOR(CAST(score_micro AS DOUBLE) / ${binMicro}e0) AS BIGINT) AS bin",
        "keep")
      .groupBy("bin")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_neg"))
      .localCheckpoint() // consumed by two cumulative joins + the AUC fold
    val cum = bins.as("x")
      .join(broadcast(bins.as("y")), col("y.bin") >= col("x.bin"))
      .groupBy(col("x.bin").as("bin"))
      .agg(sum(col("y.n_pos")).as("cum_pos"), sum(col("y.n_neg")).as("cum_neg"))
    val below = bins.as("x")
      .join(broadcast(bins.as("y")), col("y.bin") < col("x.bin"), "left_outer")
      .groupBy(col("x.bin").as("bin"))
      .agg(coalesce(sum(col("y.n_neg")), lit(0L)).as("neg_below"))
    val auc = bins.join(broadcast(below), "bin")
      .agg(sum("n_pos").as("p"), sum("n_neg").as("n"),
        sum(expr("""CAST(n_pos AS DECIMAL(38,0)) *
                    (2 * CAST(neg_below AS DECIMAL(38,0)) + n_neg)"""))
          .as("num2"))
      .selectExpr("p", "n",
        """CASE WHEN p = 0 OR n = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(num2 AS DOUBLE) /
                     CAST(2 * CAST(p AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) AS DOUBLE)
           END AS auc""")
    bins.join(cum, "bin")
      .crossJoin(broadcast(auc))
      .selectExpr("bin",
        s"CAST(bin AS DOUBLE) * ${binMicro}e0 / 1e6 AS bin_lo",
        "n_pos", "n_neg",
        """CASE WHEN p = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(cum_pos AS DOUBLE) / CAST(p AS DOUBLE) END AS tpr""",
        """CASE WHEN n = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(cum_neg AS DOUBLE) / CAST(n AS DOUBLE) END AS fpr""",
        "CAST(cum_pos AS DOUBLE) / CAST(cum_pos + cum_neg AS DOUBLE) AS precision_at",
        "auc", "2e0 * auc - 1e0 AS gini")
      .orderBy(desc("bin"))
  }

  /** DuckDB oracle: composes the q61 oracle verbatim for the weak labels
    * (the q71/q89/q98 pattern — the classifier's supervision cannot drift
    * from the individually-hash-verified heuristic), the q57 split rule,
    * and the same md5-byte feature hash + 4-ln micro construction (the
    * boundary guard lives on the Spark side). */
  def oracles: Map[String, String] = Map(
    "q101_quality_classifier" -> QualityClassifierSql,
    // q226 composes the q101 and q61 oracles verbatim (the q103 pattern):
    // exact confusion cells, cross-multiplied chance term in HUGEINT,
    // sign-outside floor'd micro kappa, NULL on saturated chance
    "q226_label_agreement" ->
      s"""WITH q AS ($QualityClassifierSql),
          t AS (${graft.ops.TextOps.oracles("q61_training_filter")}),
          j AS (SELECT q.pred AS pred, t.keep AS keep
                FROM q JOIN t ON q.doc_id = t.doc_id),
          c AS (SELECT CAST(COALESCE(SUM(CASE WHEN pred AND keep THEN 1 END), 0)
                            AS BIGINT) AS n11,
                       CAST(COALESCE(SUM(CASE WHEN pred AND NOT keep THEN 1 END), 0)
                            AS BIGINT) AS n10,
                       CAST(COALESCE(SUM(CASE WHEN NOT pred AND keep THEN 1 END), 0)
                            AS BIGINT) AS n01,
                       CAST(COALESCE(SUM(CASE WHEN NOT pred AND NOT keep THEN 1 END), 0)
                            AS BIGINT) AS n00
                FROM j),
          d AS (SELECT *, n11 + n10 + n01 + n00 AS n_docs,
                       (n11 + n00)::HUGEINT AS agree,
                       (n11 + n10)::HUGEINT * (n11 + n01)::HUGEINT
                         + (n01 + n00)::HUGEINT * (n10 + n00)::HUGEINT AS chance,
                       (n11 + n10 + n01 + n00)::HUGEINT AS nd
                FROM c)
          SELECT n11, n10, n01, n00, CAST(n_docs AS BIGINT) AS n_docs,
                 CAST(CASE WHEN nd = 0 THEN NULL
                           ELSE 1000000 * agree // nd END AS BIGINT) AS po_micro,
                 CAST(CASE WHEN nd = 0 THEN NULL
                           ELSE 1000000 * chance // (nd * nd) END AS BIGINT) AS pe_micro,
                 CAST(CASE WHEN nd = 0 OR nd * nd - chance = 0 THEN NULL
                           WHEN nd * agree - chance >= 0
                           THEN 1000000 * (nd * agree - chance) // (nd * nd - chance)
                           ELSE -((1000000 * (chance - nd * agree))
                                  // (nd * nd - chance))
                      END AS BIGINT) AS kappa_micro
          FROM d""",
    // q103 composes the q101 and q61 oracles verbatim (the q99 pattern):
    // identical floor-division binning, exact counts, one IEEE rate
    // q108 composes the q101 oracle verbatim: identical binning, exact
    // counts, and the SAME bounded self-join cumulative (no window on
    // either engine — structurally identical arithmetic)
    "q108_quality_token_curve" ->
      s"""WITH q AS ($QualityClassifierSql),
          t AS (SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
                FROM documents),
          j AS (SELECT CAST(FLOOR(CAST(q.score_micro AS DOUBLE) / ${CalibrationBinMicro}e0)
                            AS BIGINT) AS bin,
                       t.n_tok AS n_tok
                FROM q JOIN t ON q.doc_id = t.doc_id),
          b AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
                FROM j GROUP BY bin),
          c AS (SELECT x.bin AS bin, CAST(SUM(y.n_docs) AS BIGINT) AS cum_docs,
                       CAST(SUM(y.n_tokens) AS BIGINT) AS cum_tokens
                FROM b x JOIN b y ON y.bin >= x.bin GROUP BY x.bin)
          SELECT b.bin AS bin,
                 CAST(b.bin AS DOUBLE) * ${CalibrationBinMicro}e0 / 1e6 AS bin_lo,
                 b.n_docs AS n_docs, b.n_tokens AS n_tokens,
                 c.cum_docs AS cum_docs, c.cum_tokens AS cum_tokens
          FROM b JOIN c ON b.bin = c.bin ORDER BY bin""",
    // q128 composes the q101 oracle verbatim: identical binning keyed by
    // lang, bounded cumulative self-join, exact integer percentile
    // thresholds — never a per-language rank
    "q128_lang_score_census" ->
      s"""WITH q AS ($QualityClassifierSql),
          j AS (SELECT d.lang AS lang,
                       CAST(FLOOR(CAST(q.score_micro AS DOUBLE) / ${CalibrationBinMicro}e0)
                            AS BIGINT) AS bin
                FROM q JOIN documents d ON q.doc_id = d.doc_id),
          c AS (SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n
                FROM j GROUP BY 1, 2),
          t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs FROM c GROUP BY lang),
          cc AS (SELECT x.lang AS lang, x.bin AS bin, CAST(SUM(y.n) AS BIGINT) AS cum_n
                 FROM c x JOIN c y ON y.lang = x.lang AND y.bin <= x.bin
                 GROUP BY 1, 2)
          SELECT cc.lang AS lang, MAX(t.n_docs) AS n_docs,
                 MIN(CASE WHEN cc.cum_n * 2 >= t.n_docs THEN cc.bin END) AS p50_bin,
                 MIN(CASE WHEN cc.cum_n * 20 >= t.n_docs * 19 THEN cc.bin END) AS p95_bin
          FROM cc JOIN t ON cc.lang = t.lang
          GROUP BY cc.lang ORDER BY lang""",
    // q123 composes the q101 oracle verbatim (the q108 pattern): identical
    // binning, the same bounded self-join cumulative, the same
    // MAX-covering-bin-else-MIN cut as one scalar subquery, then the
    // row-local keep filter
    "q123_quality_budget_cut" -> QualityBudgetCutSql,
    "q103_score_calibration" ->
      s"""WITH q AS ($QualityClassifierSql),
          l AS (${TextOps.oracles("q61_training_filter")}),
          j AS (SELECT CAST(FLOOR(CAST(q.score_micro AS DOUBLE) / ${CalibrationBinMicro}e0)
                            AS BIGINT) AS bin,
                       l.keep AS keep
                FROM q JOIN l ON q.doc_id = l.doc_id)
          SELECT bin,
                 CAST(bin AS DOUBLE) * ${CalibrationBinMicro}e0 / 1e6 AS bin_lo,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
                 CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS keep_rate
          FROM j GROUP BY bin ORDER BY bin""",
    // q141 composes the q101 + q61 oracles verbatim (the q103 pattern):
    // identical binning, the same bounded self-join cumulatives (no
    // window either side), HUGEINT pair arithmetic mirroring Spark's
    // DECIMAL(38,0), and the same single final IEEE divisions
    "q141_roc_auc" ->
      s"""WITH q AS ($QualityClassifierSql),
          l AS (${TextOps.oracles("q61_training_filter")}),
          j AS (SELECT CAST(FLOOR(CAST(q.score_micro AS DOUBLE) / ${CalibrationBinMicro}e0)
                            AS BIGINT) AS bin,
                       l.keep AS keep
                FROM q JOIN l ON q.doc_id = l.doc_id),
          b AS (SELECT bin,
                       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
                FROM j GROUP BY bin),
          c AS (SELECT x.bin AS bin, CAST(SUM(y.n_pos) AS BIGINT) AS cum_pos,
                       CAST(SUM(y.n_neg) AS BIGINT) AS cum_neg
                FROM b x JOIN b y ON y.bin >= x.bin GROUP BY x.bin),
          bl AS (SELECT x.bin AS bin,
                        CAST(COALESCE(SUM(y.n_neg), 0) AS BIGINT) AS neg_below
                 FROM b x LEFT JOIN b y ON y.bin < x.bin GROUP BY x.bin),
          a AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS p,
                       CAST(SUM(n_neg) AS BIGINT) AS n,
                       SUM(CAST(n_pos AS HUGEINT) *
                           (2 * CAST(neg_below AS HUGEINT) + n_neg)) AS num2
                FROM b JOIN bl USING (bin)),
          a2 AS (SELECT p, n,
                        CASE WHEN p = 0 OR n = 0 THEN CAST(NULL AS DOUBLE)
                             ELSE CAST(num2 AS DOUBLE) /
                                  CAST(2 * CAST(p AS HUGEINT) * CAST(n AS HUGEINT) AS DOUBLE)
                        END AS auc
                 FROM a)
          SELECT b.bin AS bin,
                 CAST(b.bin AS DOUBLE) * ${CalibrationBinMicro}e0 / 1e6 AS bin_lo,
                 b.n_pos AS n_pos, b.n_neg AS n_neg,
                 CASE WHEN p = 0 THEN CAST(NULL AS DOUBLE)
                      ELSE CAST(cum_pos AS DOUBLE) / CAST(p AS DOUBLE) END AS tpr,
                 CASE WHEN n = 0 THEN CAST(NULL AS DOUBLE)
                      ELSE CAST(cum_neg AS DOUBLE) / CAST(n AS DOUBLE) END AS fpr,
                 CAST(cum_pos AS DOUBLE) / CAST(cum_pos + cum_neg AS DOUBLE) AS precision_at,
                 auc, 2e0 * auc - 1e0 AS gini
          FROM b JOIN c USING (bin) CROSS JOIN a2
          ORDER BY bin DESC""")

  /** The q123 oracle SQL, a val so q122's composed curation manifest can
    * embed the same kept-set definition verbatim. */
  private[graft] lazy val QualityBudgetCutSql =
    s"""WITH q AS ($QualityClassifierSql),
        t AS (SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
        j AS (SELECT q.doc_id AS doc_id, q.score_micro AS score_micro,
                     CAST(FLOOR(CAST(q.score_micro AS DOUBLE) / ${CalibrationBinMicro}e0)
                          AS BIGINT) AS bin,
                     t.n_tok AS n_tok
              FROM q JOIN t ON q.doc_id = t.doc_id),
        b AS (SELECT bin, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
              FROM j GROUP BY bin),
        c AS (SELECT x.bin AS bin, CAST(SUM(y.n_tokens) AS BIGINT) AS cum_tokens
              FROM b x JOIN b y ON y.bin >= x.bin GROUP BY x.bin),
        s AS (SELECT COALESCE(MAX(CASE WHEN cum_tokens >= $CurationTokenBudget
                                       THEN bin END), MIN(bin)) AS cut_bin
              FROM c)
        SELECT j.doc_id AS doc_id, j.score_micro AS score_micro, j.bin AS bin,
               j.n_tok AS n_tok, s.cut_bin AS cut_bin
        FROM j CROSS JOIN s
        WHERE j.bin >= s.cut_bin
        ORDER BY doc_id"""

  /** The q101 oracle SQL, a val so q103 composes it verbatim. */
  private val QualityClassifierSql =
      s"""WITH lab AS (${TextOps.oracles("q61_training_filter")}),
          tr AS (SELECT doc_id FROM documents
                 WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
                       < ${PipelineOps.TrainCut}),
          tk AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 2))::BIGINT AS fb
                 FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS f
                       FROM documents
                       UNION ALL
                       SELECT doc_id, lang || '|' || tok AS f
                       FROM (SELECT doc_id, lang,
                                    unnest(str_split(text, ' ')) AS tok
                             FROM documents)
                       UNION ALL
                       SELECT doc_id,
                              '__len' || CAST(CASE WHEN n < 20 THEN 0
                                                   WHEN n < 40 THEN 1
                                                   WHEN n < 60 THEN 2
                                                   WHEN n < 80 THEN 3
                                                   ELSE 4 END AS VARCHAR) AS f
                       FROM (SELECT doc_id,
                                    CAST(len(str_split(text, ' ')) AS BIGINT) AS n
                             FROM documents)
                       UNION ALL
                       SELECT doc_id,
                              '__dr' || CAST(LEAST(nd * 16 // n, 15) AS VARCHAR) AS f
                       FROM (SELECT doc_id,
                                    CAST(len(str_split(text, ' ')) AS BIGINT) AS n,
                                    CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS nd
                             FROM documents))),
          c AS (SELECT fb,
                       CAST(SUM(CASE WHEN lab.keep THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
                       CAST(SUM(CASE WHEN lab.keep THEN 0 ELSE 1 END) AS BIGINT) AS cneg
                FROM tk JOIN tr USING (doc_id) JOIN lab ON tk.doc_id = lab.doc_id
                GROUP BY fb),
          t AS (SELECT CAST(SUM(cpos) AS BIGINT) AS tpos,
                       CAST(SUM(cneg) AS BIGINT) AS tneg FROM c),
          pr AS (SELECT CAST(SUM(CASE WHEN lab.keep THEN 1 ELSE 0 END) AS BIGINT) AS npos,
                        CAST(SUM(CASE WHEN lab.keep THEN 0 ELSE 1 END) AS BIGINT) AS nneg
                 FROM tr JOIN lab USING (doc_id)),
          b AS (SELECT CAST(round((ln(npos + 1) - ln(nneg + 1)) * 1e6) AS BIGINT)
                         AS bias_micro FROM pr),
          m AS (SELECT tk.doc_id,
                       CAST(round((ln(COALESCE(c.cpos, 0) + 1) - ln(t.tpos + $NumBuckets)
                                   - ln(COALESCE(c.cneg, 0) + 1) + ln(t.tneg + $NumBuckets))
                                  * 1e6) AS BIGINT) AS micro
                FROM tk LEFT JOIN c USING (fb) CROSS JOIN t),
          g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
                       CAST(SUM(micro) AS BIGINT) AS fm
                FROM m GROUP BY doc_id)
          SELECT d.doc_id AS doc_id,
                 CAST(COALESCE(g.n_feats, 0) AS BIGINT) AS n_feats,
                 COALESCE(g.fm, 0) + b.bias_micro AS score_micro,
                 CAST(COALESCE(g.fm, 0) + b.bias_micro AS DOUBLE) / 1e6 AS score,
                 COALESCE(g.fm, 0) + b.bias_micro > 0 AS pred
          FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id CROSS JOIN b
          ORDER BY doc_id"""
}

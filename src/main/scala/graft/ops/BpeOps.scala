package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q77 — BPE (byte-pair-encoding) VOCABULARY CONSTRUCTION over `documents`
  * (Sennrich/Haddow/Birch, "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016): starting from characters (+ an end-of-word
  * marker), repeatedly merge the corpus's most frequent adjacent symbol
  * pair — the merge list IS the tokenizer vocabulary a real pipeline ships
  * next to the corpus q68 masks and q73 packs.
  *
  * Distributed shape, per the standard formulation:
  *  - the corpus collapses ONCE to a (word, freq) table — one token
  *    shuffle, the same aggregate q52 grades; everything iterative runs on
  *    that table, which is bounded by the DISTINCT vocabulary (≪ corpus;
  *    cut lineage once via localCheckpoint, the [[GraphOps]] loop's trick);
  *  - each merge round is: adjacent-pair count (map-side-combined
  *    aggregate over symbol pairs), argmax → ONE row to the driver (the
  *    broadcast-best-merge step — the same bounded convergence action the
  *    q66 contraction loop performs), then a ROW-LOCAL re-tokenization.
  *
  * Determinism: counts are exact integer sums; the argmax tie-breaks
  * lexicographically on (left, right); re-tokenization is a literal,
  * non-overlapping, left-to-right string replace — identical semantics in
  * Spark and DuckDB (both scan from the end of the previous replacement,
  * which is exactly BPE's greedy left-to-right merge within a word).
  *
  * Representation trick that makes the merge a plain `replace`: a word's
  * symbol sequence is stored with every symbol PARENTHESIZED —
  * "low" → "(l)(o)(w)(</w>)" — so the pattern "(a)(b)" can only match a
  * whole adjacent symbol pair: a symbol never contains parens (the
  * alphabet is the q56-normalized [a-z0-9] plus the marker), so partial-
  * symbol matches like "(a)(bc…" fail on the ')' and prefix matches
  * cannot start mid-symbol. */
object BpeOps {
  val NumMerges = 10
  val EndMark = "</w>"

  /** The q56 normalization, collapsed to words — ONE definition with the
    * oracle (generated below from the same strings). */
  private val NormExpr =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' '))"

  /** Parenthesize each char and append the end-of-word marker. */
  private val WrapExpr =
    s"concat(regexp_replace(word, '(.)', '($$1)'), '($EndMark)')"

  /** Symbol list of a wrapped word: strip the outer parens, split on ")(". */
  private val SymsExpr = """split(substring(w, 2, length(w) - 2), '\\)\\(')"""

  /** (w = wrapped word, freq) — the bounded iteration table. */
  private def wordTable(docs: DataFrame): DataFrame =
    docs.selectExpr(s"explode(split($NormExpr, ' ')) AS word")
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .selectExpr(s"$WrapExpr AS w", "freq")

  /** Adjacent-pair frequencies over the current word table (occurrences
    * within a word count with multiplicity, weighted by word freq — the
    * textbook get_stats). */
  private def pairCounts(words: DataFrame): DataFrame =
    words.selectExpr("freq", s"$SymsExpr AS syms")
      .selectExpr("freq",
        "explode(transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i + 1] AS r))) AS pr")
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum("freq").as("cnt"))

  /** The learning loop: (rank, left, right, cnt) per round, on the driver
    * (bounded: `numMerges` rows). The broadcast-best-merge step IS this
    * list — q79 inlines it into a row-local tokenizer expression.
    * private[graft]: `SparkEntry` memoizes it per (session, corpus) so the
    * application query reads the learned artifact instead of re-learning
    * (the q37-measures/q59-reads division of labor). */
  private[graft] def learnMerges(docs: DataFrame,
                                 numMerges: Int): Seq[(Long, String, String, Long)] = {
    // bounded by the distinct vocabulary — cut lineage once so round r's
    // jobs never re-scan the corpus (the GraphOps loop's localCheckpoint)
    var words = wordTable(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (rank <- 1L to numMerges.toLong) {
      // ONE row to the driver per round (the broadcast-best-merge step)
      val top = pairCounts(words)
        .orderBy(desc("cnt"), col("l"), col("r")).limit(1).collect()
      top.headOption.foreach { row =>
        val (l, r, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((rank, l, r, cnt))
        // row-local re-tokenize: nested plan-only projections on the
        // bounded table — literal replace, no regex, no shuffle
        words = words.selectExpr(s"replace(w, '($l)($r)', '($l$r)') AS w", "freq")
      }
    }
    merges.toSeq
  }

  /** The learned merge table: (merge_rank, left_sym, right_sym, merged,
    * cnt), one row per round in learning order. */
  def bpeMerges(docs: DataFrame, numMerges: Int = NumMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, numMerges).toDF("merge_rank", "left_sym", "right_sym", "cnt")
      .selectExpr("merge_rank", "left_sym", "right_sym",
        "concat(left_sym, right_sym) AS merged", "cnt")
      .orderBy("merge_rank")
  }

  /** q79 — APPLY the learned merges: tokenize every document with the q77
    * vocabulary and report per-doc BPE token counts — the token counting a
    * packing budget (q73) actually needs (whitespace counts overestimate
    * subword corpora; a real pipeline packs by tokenizer tokens).
    *
    * Shape: learning runs once (bounded, q77's loop); application is ONE
    * row-local projection — each word is wrapped, the `numMerges` learned
    * replaces fold over it IN RANK ORDER inside a `transform` lambda
    * (never across word boundaries — a cross-word "(a)(b)" join of two
    * adjacent words must not merge), and the token count is the '('
    * count of the result. No shuffle, no UDF: nested codegen'd string
    * primitives, fused into the scan at any corpus size. */
  def bpeTokenCounts(docs: DataFrame, numMerges: Int = NumMerges): DataFrame =
    applyMerges(docs, learnMerges(docs, numMerges))

  /** The application half, against an already-learned merge list (the
    * pipeline artifact a corpus build persists next to the vocab). */
  def applyMerges(docs: DataFrame,
                  merges: Seq[(Long, String, String, Long)]): DataFrame = {
    val wrapWord = s"concat(regexp_replace(w, '(.)', '($$1)'), '($EndMark)')"
    val applied = merges.foldLeft(wrapWord) {
      case (e, (_, l, r, _)) => s"replace($e, '($l)($r)', '($l$r)')"
    }
    docs.selectExpr("doc_id", s"filter(split($NormExpr, ' '), w -> w != '') AS words")
      .selectExpr("doc_id",
        "CAST(size(words) AS BIGINT) AS n_words",
        s"""aggregate(transform(words, w -> $applied), CAST(0 AS BIGINT),
             (acc, x) -> acc + CAST(length(x) - length(replace(x, '(', '')) AS BIGINT)) AS n_bpe_tokens""")
      .orderBy("doc_id")
  }

  /** DuckDB oracles: the identical algorithm unrolled — round r's CTEs are
    * pair counts over w{r-1}, the (cnt DESC, l, r) argmax, and the literal
    * replace — generated from the same constants so the sides cannot
    * drift. q79 reuses the same learning CTEs and applies the b1..bR
    * merges (cross-joined 1-row tables) in rank order inside a
    * list_transform lambda, exactly mirroring the Spark fold. */
  private val DuckNorm =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** The w0 + R learning-round CTEs (shared by q77 and q79). */
  private def duckLearningCtes: String = {
    val base =
      s"""w0 AS (SELECT concat(regexp_replace(word, '(.)', '(\\1)', 'g'), '($EndMark)') AS w,
                        freq
                 FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
                       FROM (SELECT unnest(str_split($DuckNorm, ' ')) AS word FROM documents)
                       WHERE len(word) > 0 GROUP BY word))"""
    val rounds = (1 to NumMerges).map { k =>
      s"""p$k AS (SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt
                  FROM (SELECT unnest(syms[:len(syms) - 1]) AS l,
                               unnest(syms[2:]) AS r, freq
                        FROM (SELECT str_split(substr(w, 2, len(w) - 2), ')(') AS syms,
                                     freq
                              FROM w${k - 1}))
                  GROUP BY l, r),
          b$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
          w$k AS (SELECT replace(t.w, '(' || b.l || ')(' || b.r || ')',
                                 '(' || b.l || b.r || ')') AS w, t.freq
                  FROM w${k - 1} t CROSS JOIN b$k b)"""
    }.mkString(",\n")
    s"$base,\n$rounds"
  }

  def oracles: Map[String, String] = {
    val union = (1 to NumMerges).map { k =>
      s"SELECT CAST($k AS BIGINT) AS merge_rank, l AS left_sym, r AS right_sym, l || r AS merged, cnt FROM b$k"
    }.mkString(" UNION ALL ")
    val applied = (1 to NumMerges).foldLeft(
      s"concat(regexp_replace(w, '(.)', '(\\1)', 'g'), '($EndMark)')") {
      case (e, k) =>
        s"replace($e, '(' || m$k.l || ')(' || m$k.r || ')', '(' || m$k.l || m$k.r || ')')"
    }
    val crossMerges = (1 to NumMerges).map(k => s"b$k AS m$k").mkString(" CROSS JOIN ")
    Map(
      "q77_bpe_vocab" ->
        s"""WITH ${duckLearningCtes}
            SELECT merge_rank, left_sym, right_sym, merged, cnt
            FROM ($union) ORDER BY merge_rank""",
      "q79_bpe_token_counts" ->
        s"""WITH ${duckLearningCtes},
            dw AS (SELECT doc_id,
                          list_filter(str_split($DuckNorm, ' '), w -> w != '') AS words
                   FROM documents)
            SELECT doc_id,
                   CAST(len(words) AS BIGINT) AS n_words,
                   CAST(COALESCE(list_sum(list_transform(words,
                          w -> len($applied) - len(replace($applied, '(', '')))), 0) AS BIGINT)
                     AS n_bpe_tokens
            FROM dw CROSS JOIN $crossMerges
            ORDER BY doc_id""")
  }
}

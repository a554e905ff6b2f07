package graft

class CatalogSpec extends SparkSpec {

  test("whole engine is reachable through spark.sql, including graft_dot") {
    Catalog.registerTables(spark, "/root/testdata/sf0.001")
    val top = spark.sql(
      """SELECT user_id, SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total
        |FROM events WHERE value > 100.0
        |GROUP BY user_id ORDER BY total DESC, user_id LIMIT 3""".stripMargin)
    assert(top.count() === 3)
    val sim = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        |       graft_dot(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                 CAST(b.embedding AS ARRAY<DOUBLE>)) AS dot
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
    assert(sim.count() === 1)
    assert(!sim.collect().head.isNullAt(2))
  }

  test("extended operators are consumable as SQL views, composable with tables") {
    Catalog.registerTables(spark, "/root/testdata/sf0.001")
    Catalog.registerOpViews(spark)
    // corpus-build split view: totals match the base table
    val splits = spark.sql(
      "SELECT split, COUNT(*) AS n FROM doc_splits GROUP BY split")
    assert(splits.collect().map(_.getLong(1)).sum === 500L)
    // a view JOINS back to a raw table in plain SQL
    val joined = spark.sql(
      """SELECT s.split, SUM(d.n_chars) AS chars
        |FROM doc_splits s JOIN documents d ON s.doc_id = d.doc_id
        |GROUP BY s.split""".stripMargin)
    assert(joined.count() === 3)
    // every view EXECUTES through the SQL path (not just analyzes)
    assert(spark.sql("SELECT * FROM doc_exact_dedup").count() > 0)
    assert(spark.sql("SELECT * FROM user_sessions WHERE n_events > 1").count() > 0)
    assert(spark.sql("SELECT * FROM doc_neardup_pairs WHERE jac >= 0.5").count() > 0)
    assert(spark.sql(
      "SELECT q_id, COUNT(*) AS k FROM embedding_ann GROUP BY q_id").count() > 0)
    assert(spark.sql("SELECT * FROM token_heavy_hitters").count() > 0)
    assert(spark.sql("SELECT * FROM corpus_contamination WHERE kmv_ok").count() === 3)
    // dedup clusters: total cover of documents, and the view composes —
    // "how many docs would near-dup clustering drop?"
    val drop = spark.sql(
      """SELECT COUNT(*) AS total, COUNT(CASE WHEN NOT keep THEN 1 END) AS dropped
        |FROM doc_dedup_clusters""".stripMargin).collect().head
    assert(drop.getLong(0) === 500L && drop.getLong(1) >= 0L)
    assert(spark.sql("SELECT * FROM doc_bm25 WHERE n_hits > 0").count() > 0)
    assert(spark.sql("SELECT * FROM doc_increment_pairs").count() >= 0) // executes

    assert(spark.sql(
      "SELECT * FROM doc_vocab_masked WHERE masked LIKE '%<unk>%'").count() > 0)
    // the verdict view composes: keep is the conjunction, queryable in SQL
    val bad = spark.sql(
      """SELECT COUNT(*) FROM doc_corpus_decision
        |WHERE keep <> (quality_ok AND dedup_keep AND NOT contaminated)""".stripMargin)
    assert(bad.collect().head.getLong(0) === 0L)
    assert(spark.sql("SELECT * FROM doc_ngram_contamination").count() > 0)
    // round-8 surface: packing, mixture sampling, BPE — composable in SQL
    val waste = spark.sql(
      """SELECT s.n_chunks, COUNT(*) AS straddlers
        |FROM doc_packing p CROSS JOIN packing_stats s
        |WHERE p.chunk_first != p.chunk_last GROUP BY s.n_chunks""".stripMargin)
    assert(waste.count() === 1)
    assert(spark.sql("SELECT * FROM doc_mixture_sample WHERE u >= 0").count() > 0)
    val merges = spark.sql(
      "SELECT merge_rank, merged FROM bpe_merges ORDER BY merge_rank")
    assert(merges.count() === graft.ops.BpeOps.NumMerges)
    // round-10 surface: selection weights, soft dedup, tokenizer dashboard
    assert(spark.sql("SELECT * FROM doc_dsir_weights WHERE n_bigrams > 0").count() > 0)
    val mass = spark.sql(
      """SELECT cluster_id FROM doc_softdedup_weights
        |GROUP BY cluster_id HAVING abs(SUM(weight) - 1.0) > 1e-9""".stripMargin)
    assert(mass.count() === 0L) // each cluster carries exactly one unit
    val fert = spark.sql(
      "SELECT lang FROM tokenizer_fertility WHERE fertility < 1.0")
    assert(fert.count() === 0L) // a word is never fewer than one token
    // round-11 surface: canon selection, balanced sample, token curve
    val canons = spark.sql(
      """SELECT cluster_id FROM doc_cluster_canon
        |GROUP BY cluster_id HAVING SUM(CASE WHEN canon THEN 1 ELSE 0 END) <> 1""".stripMargin)
    assert(canons.count() === 0L) // exactly one canon per cluster
    assert(spark.sql("SELECT * FROM embedding_cell_sample WHERE keep_n <= n")
      .count() > 0)
    val curve = spark.sql(
      """SELECT COUNT(*) FROM quality_token_curve
        |WHERE cum_tokens < n_tokens""".stripMargin)
    assert(curve.collect().head.getLong(0) === 0L) // cum covers its own bin
    val contam = spark.sql(
      """SELECT COUNT(*) FROM embedding_contamination
        |WHERE contaminated <> (max_cos >= 0.25)""".stripMargin)
    assert(contam.collect().head.getLong(0) === 0L)
    // silhouette is bounded and every cell of the kmeans view is reported
    val sil = spark.sql(
      """SELECT COUNT(*) FROM embedding_cluster_quality
        |WHERE silhouette < -1.0 OR silhouette > 1.0""".stripMargin)
    assert(sil.collect().head.getLong(0) === 0L)
    val cellCover = spark.sql(
      """SELECT COUNT(*) FROM (SELECT DISTINCT cell FROM embedding_kmeans) k
        |LEFT ANTI JOIN embedding_cluster_quality q ON k.cell = q.cell""".stripMargin)
    assert(cellCover.collect().head.getLong(0) === 0L)
    // confusion-matrix mass equals the corpus; the audit census is clean
    val conf = spark.sql("SELECT SUM(n) FROM lang_confusion").collect().head
    assert(conf.getLong(0) === 500L)
    val audit = spark.sql(
      "SELECT n_null + n_bad_dim + n_zero_norm FROM embedding_audit").collect().head
    assert(audit.getLong(0) === 0L)
    val dAudit = spark.sql(
      """SELECT n_dup_ids + n_null_ids + n_null_text + n_empty_text
        |       + n_chars_mismatch + n_null_chars
        |FROM document_audit""".stripMargin).collect().head
    assert(dAudit.getLong(0) === 0L)
    assert(spark.sql("SELECT aligned FROM referential_audit")
      .collect().head.getBoolean(0))
    // admission verdicts are internally consistent
    val adm = spark.sql(
      """SELECT COUNT(*) FROM increment_report
        |WHERE (status = 'dup') <> (dup_of IS NOT NULL)""".stripMargin)
    assert(adm.collect().head.getLong(0) === 0L)
    // posting lists cover the corpus and balances sum to the true k
    val ivf = spark.sql(
      """SELECT SUM(n_vecs), abs(SUM(balance) - MAX(n_cells)) < 1e-9
        |FROM ivf_health""".stripMargin).collect().head
    assert(ivf.getLong(0) === spark.table("embeddings").count())
    assert(ivf.getBoolean(1))
    // the bottom populated rung admits every term → covers all tokens
    val cover = spark.sql(
      "SELECT token_coverage FROM vocab_coverage ORDER BY b ASC LIMIT 1")
    assert(cover.collect().head.getDouble(0) === 1.0)
    // dup matrix is upper-triangular with positive counts
    val xsrc = spark.sql(
      "SELECT COUNT(*) FROM cross_source_dups WHERE source_a > source_b OR n_clusters <= 0")
    assert(xsrc.collect().head.getLong(0) === 0L)
    // the leak-free deal never tears a cluster
    val torn = spark.sql(
      """SELECT COUNT(*) FROM (SELECT cluster_id FROM doc_leakfree_split
        |GROUP BY cluster_id HAVING COUNT(DISTINCT split) > 1)""".stripMargin)
    assert(torn.collect().head.getLong(0) === 0L)
    // the epoch order is a permutation: positions count the corpus
    val ord = spark.sql(
      "SELECT COUNT(*), COUNT(DISTINCT doc_id) FROM epoch_order").collect().head
    assert(ord.getLong(0) === 500L && ord.getLong(1) === 500L)
  }
}

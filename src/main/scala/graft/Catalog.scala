package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: register every testdata table as a temp view (plus the
  * native function library), so the entire engine is reachable through
  * `spark.sql(...)` — the query-language capability the reference lacks
  * outright (SURVEY.md §2.D "SQL parser / query language: absent").
  *
  * Catalyst treats a sql() plan and the equivalent DataFrame plan
  * identically, so everything verified through `SparkEntry.queries` holds
  * for the SQL path too (spot-checked in `CatalogSpec`). */
object Catalog {
  /** The dir each session's table views were registered from — so
    * [[registerOpViews]] can key into [[SparkEntry]]'s materialized
    * snapshots for the same corpus (views must never point at a different
    * dataset than the tables a SQL user joins them with). */
  private val registeredDirs = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    Tables.all.foreach { name =>
      Tables(spark, sfDir, name).createOrReplaceTempView(name)
    }
    graft.expressions.GraftFunctions.register(spark)
    registeredDirs.put(spark, sfDir)
    ()
  }

  /** The extended operators as SQL views: a pure-SQL user composes dedup /
    * similarity / corpus-build results with ordinary SELECTs. Views are
    * lazy plans, so Catalyst optimizes the consumer query TOGETHER with
    * the view's plan: for the row-local views (`doc_splits`) predicates
    * reach the scan; for the aggregate/window-shaped views the upstream
    * computation necessarily runs before a consumer filter applies (and
    * the views' trailing ORDER BY is dropped by EliminateSorts wherever a
    * consumer's aggregation or re-sort makes it irrelevant).
    *
    * Views are built FROM the session's `documents`/`embeddings`/`events`
    * views, so they can never silently point at a different dataset than
    * the tables a SQL user joins them with — call [[registerTables]] first
    * (or register equivalent views yourself: when this session has no
    * [[registerTables]] record, the pair/cluster views fall back to
    * building from `spark.table("documents")` directly instead of the
    * cross-query parquet snapshots). */
  def registerOpViews(spark: SparkSession): Unit = {
    val sfDirOpt = Option(registeredDirs.get(spark))
    if (sfDirOpt.isEmpty)
      // the fallback is a real semantics downgrade, not just a slow path:
      // no parquet snapshots (no executor-loss durability, no cross-query
      // reuse) and the EAGER dedupClusters contraction re-runs in full on
      // every registerOpViews call — say so instead of degrading silently
      System.err.println(
        "[graft.Catalog] WARNING: registerOpViews without registerTables — " +
          "pair/cluster views build from the session's own `documents` view " +
          "with NO parquet snapshots: lineage will not survive executor " +
          "loss, and the eager dedup-cluster contraction re-runs in full on " +
          "every registerOpViews call. Call Catalog.registerTables(spark, " +
          "sfDir) first for the snapshot-backed views.")
    val docs = spark.table("documents")
    val emb = spark.table("embeddings")
    ops.TextOps.exactDedup(docs).createOrReplaceTempView("doc_exact_dedup")
    // the q37 pair table and q66 cluster table are SparkEntry's parquet
    // snapshots, shared with q59/q66/q71: registration pays the LSH +
    // contraction cost at most once per (session, corpus), and the views'
    // lineage is parquet files — it survives executor loss, which a
    // localCheckpoint-rooted plan (non-reliable storage) would not
    val pairs = sfDirOpt.map(SparkEntry.lshPairsShared(spark, _))
      .getOrElse(ops.DedupOps.lshPairs(docs))
    pairs.createOrReplaceTempView("doc_neardup_pairs")
    ops.PipelineOps.splitAssign(docs).createOrReplaceTempView("doc_splits")
    ops.SimilarityOps.annLsh(emb).createOrReplaceTempView("embedding_ann")
    ops.SimilarityOps.semanticDedup(emb).createOrReplaceTempView("embedding_semantic_dedup")
    ops.SimilarityOps.kmeans(emb).createOrReplaceTempView("embedding_kmeans")
    ops.RelationalOps.sessionize(spark.table("events"))
      .createOrReplaceTempView("user_sessions")
    ops.SketchOps.heavyHitters(docs)
      .createOrReplaceTempView("token_heavy_hitters")
    ops.SketchOps.contamination(docs)
      .createOrReplaceTempView("corpus_contamination")
    // NOT lazy like the rest: the star-contraction loop inside
    // dedupClusters runs its convergence actions at FIRST materialization —
    // an iterative algorithm has no single-plan lazy form. The view reads
    // the shared parquet snapshot of the final result.
    val clusters = sfDirOpt.map(SparkEntry.clustersShared(spark, _))
      .getOrElse(ops.GraphOps.dedupClusters(docs, pairs))
    clusters.createOrReplaceTempView("doc_dedup_clusters")
    // round-10 surface: selection weights, soft dedup, tokenizer dashboard
    ops.TextOps.dsirWeights(docs).createOrReplaceTempView("doc_dsir_weights")
    // round-11: model-based quality scores (NB log-odds over hashed feats)
    val qualityScores = ops.QualityModelOps.qualityClassifier(docs)
    qualityScores.createOrReplaceTempView("doc_quality_scores")
    // round-11: the threshold-vs-token-budget curve over the same scores
    ops.QualityModelOps.qualityTokenCurve(
      qualityScores.select("doc_id", "score_micro"), docs)
      .createOrReplaceTempView("quality_token_curve")
    // round-11: quality-aware canonical selection — the cluster view's
    // members ranked by the model scores above (keep the best copy)
    ops.GraphOps.clusterCanon(clusters,
        qualityScores.select("doc_id", "score_micro"))
      .createOrReplaceTempView("doc_cluster_canon")
    // round-11: cluster-balanced (topic-balancing) sample over the
    // kmeans view's cells via the q58 hash-threshold rule
    ops.SimilarityOps.cellBalancedSample(
        spark.table("embedding_kmeans").select("vec_id", "cell"))
      .createOrReplaceTempView("embedding_cell_sample")
    // round-11: semantic eval decontamination (train vs test split cosine)
    ops.SimilarityOps.semanticContamination(emb)
      .createOrReplaceTempView("embedding_contamination")
    // round-11: per-cell cohesion/separation/silhouette report over the
    // kmeans view's final partition (was k right before trusting the cells?)
    ops.SimilarityOps.clusterQuality(
        spark.table("embedding_kmeans").select("vec_id", "cell"), emb)
      .createOrReplaceTempView("embedding_cluster_quality")
    // round-11: IVF posting-list balance report over the same partition
    ops.SimilarityOps.ivfHealth(
        spark.table("embedding_kmeans").select("vec_id", "cell"))
      .createOrReplaceTempView("ivf_health")
    // round-11: metadata-trust + column-integrity audits
    ops.TextOps.langConfusion(docs).createOrReplaceTempView("lang_confusion")
    ops.SimilarityOps.embeddingAudit(emb).createOrReplaceTempView("embedding_audit")
    ops.TextOps.documentAudit(docs).createOrReplaceTempView("document_audit")
    ops.PipelineOps.referentialAudit(docs, emb)
      .createOrReplaceTempView("referential_audit")
    // round-11: vocabulary coverage curve (tokenizer-vocab sizing artifact)
    ops.TextOps.vocabCoverage(docs).createOrReplaceTempView("vocab_coverage")
    // round-11: which sources copy from which — per source pair, the true
    // near-dup clusters containing both (dedup-priority matrix)
    ops.GraphOps.crossSourceDups(clusters, docs)
      .createOrReplaceTempView("cross_source_dups")
    // round-11: near-dup-atomic train/val/test deal + leak audit flag
    ops.PipelineOps.leakFreeSplit(clusters)
      .createOrReplaceTempView("doc_leakfree_split")
    // round-11: the reproducible epoch-1 training order ledger
    ops.PipelineOps.epochOrder(docs).createOrReplaceTempView("epoch_order")
    // round-11: DSIR importance resample verdicts (water-filled rates).
    // EAGER like the cluster/BPE views: the water-fill fixpoint runs
    // bounded aggregate jobs at registration
    ops.TextOps.dsirResample(docs).createOrReplaceTempView("doc_dsir_resample")
    ops.GraphOps.softDedupWeights(clusters)
      .createOrReplaceTempView("doc_softdedup_weights")
    ops.TextOps.bm25(docs).createOrReplaceTempView("doc_bm25")
    ops.TextOps.vocabMask(docs).createOrReplaceTempView("doc_vocab_masked")
    locally {
      val (corpus, inc) = ops.DedupOps.incrementSplit(docs)
      ops.DedupOps.incrementalLshPairs(corpus, inc)
        .createOrReplaceTempView("doc_increment_pairs")
    }
    // round-11: the per-arriving-doc admission verdict over those pairs
    ops.DedupOps.incrementReport(docs, spark.table("doc_increment_pairs"))
      .createOrReplaceTempView("increment_report")
    ops.PipelineOps.ngramContamination(docs)
      .createOrReplaceTempView("doc_ngram_contamination")
    ops.PipelineOps.sequencePacking(docs).createOrReplaceTempView("doc_packing")
    ops.PipelineOps.packingStats(docs).createOrReplaceTempView("packing_stats")
    ops.PipelineOps.chunkComposition(docs).createOrReplaceTempView("chunk_composition")
    ops.DedupOps.duplicateSpans(docs).createOrReplaceTempView("doc_dup_spans")
    ops.DedupOps.spanScrub(docs).createOrReplaceTempView("doc_span_scrub")
    ops.TextOps.piiScrub(docs).createOrReplaceTempView("doc_pii_scrub")
    ops.TextOps.gopherRepetition(docs).createOrReplaceTempView("doc_gopher_repetition")
    ops.TextOps.sourceQuality(docs).createOrReplaceTempView("source_quality")
    ops.DedupOps.dedupAudit(docs).createOrReplaceTempView("dedup_audit")
    ops.TextOps.bigramSurprisal(docs).createOrReplaceTempView("doc_bigram_surprisal")
    ops.PipelineOps.urlDedup(docs).createOrReplaceTempView("doc_url_dedup")
    ops.PipelineOps.mixtureSample(docs).createOrReplaceTempView("doc_mixture_sample")
    // eager like the cluster view: BPE merge learning is iterative (one
    // bounded argmax job per round); the view reads the learned merge table
    // (via SparkEntry's per-(session, corpus) cache when tables are
    // registered, so the learning cost is shared with q79/q96)
    val merges = sfDirOpt.map(SparkEntry.bpeMergesShared(spark, _))
      .getOrElse(ops.BpeOps.learnMerges(docs, ops.BpeOps.NumMerges))
    ops.BpeOps.bpeMergesOf(spark, merges).createOrReplaceTempView("bpe_merges")
    ops.BpeOps.tokenizerFertility(docs, merges)
      .createOrReplaceTempView("tokenizer_fertility")
    // the corpus-build verdict, composed LAZILY over the registered views
    // (the eager cluster table above is reused, not recomputed)
    spark.table("doc_ngram_contamination").select("doc_id", "contaminated")
      .join(ops.TextOps.trainingFilter(docs)
        .selectExpr("doc_id", "keep AS quality_ok"), "doc_id")
      .join(spark.table("doc_dedup_clusters")
        .selectExpr("doc_id", "keep AS dedup_keep"), "doc_id")
      .selectExpr("doc_id", "quality_ok", "dedup_keep", "contaminated",
        "quality_ok AND dedup_keep AND NOT contaminated AS keep")
      .createOrReplaceTempView("doc_corpus_decision")
    // the render view: the TEXT the decision keeps — dirty stand-in →
    // span scrub → PII redact, verdict attached (q89's shape)
    docs.selectExpr("doc_id", s"${ops.TextOps.DirtyExpr} AS text")
      .transform(ops.DedupOps.spanScrubText(_))
      .selectExpr("doc_id", s"${ops.TextOps.piiRedact("clean_text")} AS final_text")
      .join(spark.table("doc_corpus_decision").select("doc_id", "keep"), "doc_id")
      .createOrReplaceTempView("doc_corpus_render")
  }
}

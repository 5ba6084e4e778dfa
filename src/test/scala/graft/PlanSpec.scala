package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan discipline (SURVEY.md §4): the 100 TB posture is a
  * property of the PLAN, not the result, so it gets spec'd like one.
  * Catches regressions where a query still returns correct rows but
  * silently degrades to a nested loop, loses a broadcast, or stops
  * pushing filters into the scan.
  */
class PlanSpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** The AQE FINAL plan: run the query, then render the executed plan —
    * initial formatted plans show `isFinalPlan=false` without codegen
    * spans or runtime broadcast decisions.
    */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // drives THIS QueryExecution so AQE finalizes it
    df.queryExecution.executedPlan.toString
  }

  /** Queries whose plans legitimately contain a BroadcastNestedLoopJoin:
    * an intentionally unconditioned join against a broadcast side that
    * is O(1)-sized BY CONSTRUCTION at any scale factor —
    * q_sim_topk/q_sim_ann fan a ≤10-row query/probe set across the
    * corpus, q_retention_filter joins the 1-row GC cutoff aggregate,
    * q_doc_lm_score the 1-row corpus-total aggregate.
    */
  private val intendedNestedLoop =
    Set("q_sim_topk", "q_sim_ann", "q_retention_filter", "q_doc_lm_score",
      // lm_bigram: same 1-row corpus-total broadcast as q_doc_lm_score
      "q_doc_lm_bigram",
      // ccnet buckets: the same 1-row corpus-total broadcast (the LM
      // scoring sub-plan), plus the bounded score-grid window
      "q_ccnet_buckets",
      // theils_u: two cross joins of 1-row aggregate results (the
      // H(A)/H(B) entropy folds) onto the 1-row conditional-entropy
      // fold — bounded by construction, broadcast on purpose
      "q_agg_theils_u",
      // lttb: the 1-row series extent (min/max day) broadcast onto
      // the day grid for bucket assignment — bounded by construction
      "q_win_lttb",
      // bm25: the 1-row (N, avgdl) corpus-scalar broadcast onto the
      // query-term tf grid (the q_tfidf scalar pattern)
      "q_bm25",
      // ttl_rollup: the 1-row max(ts) cutoff broadcast onto the fact
      // rows (the q_retention_filter anchor pattern)
      "q_ttl_rollup",
      // dsir: the 1-row (n_r, n_t) corpus-total aggregate broadcast
      // onto the bounded 1024-bucket grid — model-scale on both sides
      "q_dsir_weights",
      // sparkbar: the 1-row day-extent aggregate broadcast onto the
      // bounded (type × day) grid — the q_win_lttb extent pattern
      "q_sparkbar",
      // pq: the bounded query-LUT rows (|queries| × M×K doubles —
      // model scale) broadcast onto the packed-code scan, then onto
      // the shortlist re-rank — the q_sim_topk query-side pattern
      "q_sim_pq",
      // hard negatives: the ≤10-row query-side broadcast fanned
      // across the corpus — exactly the q_sim_topk shape (the label
      // filter applies post-fan, pre-rank)
      "q_hard_negatives",
      // the SQL-text twin of q_sim_topk: the same ≤10-row query-side
      // broadcast, authored as a BROADCAST hint in SQL
      "q_sql_sim_topk",
      // tfidf: the 1-row corpus document-count aggregate broadcast
      // onto the (doc, word) tf grid — the q_doc_lm_score pattern
      "q_tfidf",
      // two-feature OLS: the 1-row means aggregate broadcast onto the
      // fact scan for centering (two model-scale 1-row exchanges)
      "q_linreg_multi",
      // ab_ztest: the 1-row derived median-purchases threshold
      // broadcast onto the per-user grid (the q_ttl_rollup anchor
      // pattern — r7 replaced the hard-coded fixture threshold)
      "q_ab_ztest",
      // categorical IV: the 1-row class totals broadcast onto the
      // (category × class) count grid — grid-scale on both sides
      "q_categorical_iv",
      // MMR: the ≤10-row query-side broadcast fanned across the
      // corpus for the shortlist pass — exactly the q_sim_topk shape
      "q_sim_mmr",
      // hybrid RRF: the ≤5-row dense query-side broadcast (q_sim_topk
      // shape) plus the 1-row corpus-count broadcast onto the token
      // grid (the q_tfidf scalar pattern)
      "q_hybrid_rrf",
      // triangles: the final assembly cross-joins THREE 1-row
      // aggregates (edge count, node/wedge totals, triangle count) —
      // 1-row × 1-row broadcasts by construction
      "q_graph_triangles",
      // profile: the hash-friendly distinct-only aggregate and the
      // grouping-free plain fold (r15 split — see profileWith) are each
      // ONE row; their crossJoin is a 1-row × 1-row broadcast by
      // construction (an equi-join on a literal key constant-folds
      // back to the same nested-loop plan)
      "q_profile_table",
      // source KL: the 1-row corpus grand-total aggregate broadcast
      // onto the (source × word) cell grid — the q_tfidf scalar
      // pattern (word totals ride an equi-join, not the NL join)
      "q_source_kl",
      // NDCG: the ≤10-row query-side broadcast fanned across the
      // corpus for the shortlist pass — exactly the q_sim_topk shape
      "q_rank_ndcg",
      // ANN recall: the ≤10-row query/probe sides fanned across the
      // corpus for BOTH rankings (the q_sim_topk / q_sim_ann shapes)
      "q_ann_recall",
      // DoReMi: the 1-row grand-total, baseline-entropy, and softmax
      // normalizer aggregates broadcast onto the (source × word) cell
      // grid and the source-scale weight rows — the q_tfidf scalar
      // pattern three times over
      "q_mix_doremi")

  test("no declared query plans a cartesian product") {
    SparkEntry.queries.keys.foreach { name =>
      assert(!formatted(name).contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("nested-loop joins appear only where a bounded side is broadcast on purpose") {
    SparkEntry.queries.keys.filterNot(intendedNestedLoop).foreach { name =>
      assert(!formatted(name).contains("BroadcastNestedLoopJoin"),
        s"$name plans an unintended nested-loop join")
    }
  }

  test("dim joins broadcast; fact joins hash or sort-merge") {
    assert(formatted("q_join_broadcast").contains("BroadcastHashJoin"))
    val multiway = formatted("q_join_multiway")
    assert(multiway.contains("Join"), "multiway plan lost its joins")
    assert(!multiway.contains("BroadcastNestedLoopJoin"))
  }

  test("filters reach the parquet scan as pushed filters") {
    val f = formatted("q_filter_pred")
    assert(f.contains("PushedFilters") && f.contains("StringStartsWith(event_type,purchase)"),
      "the DB-name prefix predicate must push into the parquet reader")
    val r = formatted("q_join_semi")
    assert(r.contains("PushedFilters") && r.contains("GreaterThan(o_totalprice"),
      "o_totalprice threshold must push into the orders scan")
    // both dims of the z-ordered scan's range predicate must reach the
    // reader — stats-level skipping over the Morton layout depends on it
    val z = formatted("q_zorder_scan")
    assert(z.contains("GreaterThanOrEqual(user_id,3)") &&
      z.contains("GreaterThanOrEqual(value,20.0)"),
      "both clustered-dim predicates must push into the z-ordered scan")
  }

  test("round-4 shapes: broadcasts, zero-shuffle scans, single-exchange collapses") {
    // string distance: the 25-row nation dim must broadcast (dictGet shape)
    assert(formatted("q_str_distance").contains("BroadcastHashJoin"),
      "nation dim must broadcast in q_str_distance")
    // correlated scalar subquery: Catalyst must decorrelate to an
    // aggregate + broadcast join, never a per-row subquery
    val sq = formatted("q_subquery_scalar")
    assert(sq.contains("BroadcastHashJoin") || sq.contains("SortMergeJoin"),
      "scalar subquery must decorrelate into a join")
    // embedding normalize/quantize is a pure scan: the ONLY exchange
    // is the deterministic-output ORDER BY (range partitioning); no
    // hash shuffle anywhere
    assert(!formatted("q_embed_normalize").contains("hashpartitioning("),
      "q_embed_normalize must stay a zero-hash-shuffle projection")
    // collapse: one hash-agg exchange (+ the output sort), nothing else
    val collapse = formatted("q_collapse_sign")
    assert("hashpartitioning\\(".r.findAllIn(collapse).size == 1,
      "q_collapse_sign must hash-shuffle exactly once (the per-key aggregate)")
    // theta set algebra: one conditional-aggregate pass to a single
    // row — one single-partition exchange, no hash shuffle
    val theta = formatted("q_agg_theta_sets")
    assert(!theta.contains("hashpartitioning(") &&
      "Exchange".r.findAllIn(theta).size <= 2,
      "q_agg_theta_sets must build all three sketches in one pass")
  }

  test("round-5 shapes: dict broadcasts, replacing aggregates in one exchange") {
    // dictGet IS a broadcast hash join — the fact side must not shuffle
    val dict = formatted("q_dict_get")
    assert(dict.contains("BroadcastHashJoin"),
      "the dictionary must broadcast in q_dict_get")
    assert(!dict.contains("hashpartitioning("),
      "the fact side of a dict lookup must never hash-shuffle")
    // ReplacingMergeTree FINAL: one per-key hash aggregate (+ output
    // sort) — map-side combine ships one candidate per key, no sort
    // of the version history
    val repl = formatted("q_replacing_final")
    assert("hashpartitioning\\(".r.findAllIn(repl).size == 1,
      "q_replacing_final must hash-shuffle exactly once (the keyed max_by)")
    // gopher filter battery: pure projection — no hash shuffle at all,
    // only the deterministic output sort
    assert(!formatted("q_gopher_filter").contains("hashpartitioning("),
      "q_gopher_filter must stay a zero-hash-shuffle projection")
    // vocab encoding: the dictionary side must broadcast onto the
    // exploded tokens (the dictGet shape), never shuffle the corpus
    // against the vocabulary
    assert(formatted("q_vocab_encode").contains("BroadcastHashJoin"),
      "the token dictionary must broadcast in q_vocab_encode")
    // system.parts introspection reads ZERO data footers: the plan
    // must contain no parquet scan (the manifest rows arrive as a
    // driver-local relation)
    assert(!formatted("q_snapshot_parts").contains("FileScan parquet"),
      "q_snapshot_parts must answer from the manifest, not data files")
  }

  test("scans prune columns to the projection") {
    val s = formatted("q_snapshot_scan")
    // 5 of customer's 7 columns are projected; the scan must not read
    // the remaining payload columns
    assert(s.contains("ReadSchema"))
    assert(!s.contains("c_phone") && !s.contains("c_comment"),
      "unprojected customer columns must not reach the scan")
  }

  test("indexed ANN scans only the probed cluster partitions") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    pipeline.Similarity.buildIvfIndex(spark, sf, indexDir)
    val nProbe = 2
    val df = pipeline.Similarity.annTopKIndexed(spark, sf, indexDir, nProbe, k = 5)
    df.collect()
    // descend through the AQE wrappers (AdaptiveSparkPlanExec + query
    // stages are opaque leaf nodes from the outside) to the real scans
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    val exec = allScans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("graft-ivf")))
    assert(exec.nonEmpty, "no FileSourceScanExec over the index found")
    // the scan of the index must carry a cluster_id partition filter
    assert(exec.head.toString.contains("PartitionFilters")
        && exec.head.metadata.get("PartitionFilters").exists(_.contains("cluster_id")),
      s"index scan must prune on cluster_id:\n${exec.head}")
    val scanned = exec.head.metrics("numPartitions").value
    assert(scanned > 0 && scanned <= nProbe * 10,
      s"scan read $scanned partitions; probing $nProbe cells for 10 queries must prune the rest")
    assert(scanned < pipeline.Similarity.AnnCells,
      s"scan read $scanned of ${pipeline.Similarity.AnnCells} partitions — nothing was pruned")
    // with every cell probed, the indexed path reproduces the exact
    // in-line ANN (same memoized quantizer model)
    val full = pipeline.Similarity.annTopKIndexed(
      spark, sf, indexDir, pipeline.Similarity.AnnCells, k = 5)
    val inline = pipeline.Similarity.annTopK(
      spark, sf, nProbe = pipeline.Similarity.AnnCells, k = 5)
    assert(full.exceptAll(inline).isEmpty && inline.exceptAll(full).isEmpty,
      "all-cells indexed search must equal the index-less form")
  }

  test("snapshot day joins prune partitions dynamically") {
    // the 100 TB access path for "restore/analyze a few days via a
    // dimension": the day-partitioned snapshot scan must receive a
    // DYNAMIC partition filter from the dim side's selective predicate
    // (Spark's DPP), so a 2-day join never reads the other N−2 day
    // directories
    import org.apache.spark.sql.functions.{col, round, sum}
    import spark.implicits._
    val dest = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dppdim").toString
    try {
      val e = operators.Relational.eventsSec(spark, sf)
      operators.Retention.writeSnapshot(e, col("ts_s"), dest)
      val snap = spark.read.parquet(dest)
      val days = snap.select("bucket_day").distinct().orderBy("bucket_day")
        .limit(3).as[String].collect().toSeq
      days.zipWithIndex.map { case (d, i) => (d, i.toLong) }
        .toDF("d_day", "d_rank").write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir)
      val q = snap.join(dim.filter(col("d_rank") < 2),
          col("bucket_day") === col("d_day"))
        .groupBy("bucket_day").agg(round(sum("value"), 4).as("v"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"snapshot day join must plan a dynamic partition filter:\n$plan")
      assert(q.count() == 2, "only the two selected days survive")
    } finally {
      Seq(dest, dimDir).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  /** Queries whose plans legitimately contain an empty-partitionBy
    * window: the window input is a BOUNDED GRID by construction (a
    * distinct-value domain, a bucket/cell grid, or a per-group summary
    * whose cardinality is the group domain), never the fact rows — the
    * documented "window over the grid, never the data" design. A
    * single task over O(grid) rows is fine at any scale factor.
    */
  private val intendedGlobalWindow = Set(
    // value-domain grids (distinct scores / prices after binning)
    "q_agg_mann_whitney", "q_agg_ks_test", "q_agg_auc", "q_agg_rank_corr",
    // value grid for the cumulative-weight median walk
    "q_agg_weighted_median", "q_win_distribution",
    // contingency cells / category domains
    "q_agg_contingency", "q_agg_cramers_v", "q_agg_theils_u",
    // language domain (dozens of rows)
    "q_mix_temperature",
    // bounded anchor/bucket grids (8-row extents, day buckets)
    "q_win_lttb", "q_sparkbar", "q_agg_max_intersections",
    // vocabulary-frequency grid capped by the declared vocab size
    "q_zipf_fit",
    // histogram bin grid
    "q_agg_histogram_adaptive",
    // DSIR's bounded 1024-bucket hash grid
    "q_dsir_weights",
    // per-source/length bucket grids
    "q_length_buckets", "q_ccnet_buckets",
    // global pass over LOCAL skyline survivors — O(frontier×partitions)
    "q_skyline",
    // rank stamp AFTER TakeOrderedAndProject bounds the input to 20 rows
    "q_bm25",
    // WITH FILL INTERPOLATE carry: the window input is the fill grid
    // (bounded by the statement's own FROM/TO span) full-outer-joined
    // to an already-aggregated bucket domain — never fact rows
    "q_ch_with_fill",
    // same carry, inferred-span form: grid = [min, max] of the
    // ALREADY-aggregated bucket domain
    "q_ch_with_fill_infer",
    // integer SAMPLE n: the rank-limit pushdown bounds the window's
    // input to n rows BEFORE it runs (TakeOrderedAndProject /
    // WindowGroupLimit — DialectSpec pins the shape); the window
    // stamps ranks on n rows, never the table
    "q_ch_sample_rows")

  test("no single-task global window runs over unbounded input") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.SparkPlan
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val plan: SparkPlan =
        SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan
      val global = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w }
      if (!intendedGlobalWindow(name))
        assert(global.isEmpty,
          s"$name plans ${global.size} empty-partitionBy window(s) — " +
            "single-task at scale; use DistRank or partition the window")
    }
  }

  test("Introspect red flags are clean across every declared query") {
    // The suite-wide gate routed through the USER-FACING plan API
    // (plans.Introspect.summary), not ad-hoc string matching: zero
    // cartesian products anywhere; zero nested-loop joins outside the
    // intendedNestedLoop allowlist (bounded-side broadcasts by
    // construction); zero global windows outside intendedGlobalWindow
    // (provably grid-bounded inputs). Runs on the static plan — the
    // same tree the red flags would execute.
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val row = plans.Introspect
        .summary(SparkEntry.queries(name)(spark, sf)).collect()(0)
      assert(row.getAs[Long]("n_cartesian") == 0L,
        s"$name: Introspect reports a cartesian product")
      if (!intendedNestedLoop(name))
        assert(row.getAs[Long]("n_nested_loop_joins") == 0L,
          s"$name: Introspect reports an unintended nested-loop join")
      if (!intendedGlobalWindow(name))
        assert(row.getAs[Long]("n_global_windows") == 0L,
          s"$name: Introspect reports an empty-partitionBy window")
    }
  }

  test("Introspect confirms filtering queries push predicates into their scans") {
    // has_pushed_filters through the same user-facing API: queries
    // whose semantics filter a base table must show the predicate
    // reaching the parquet reader (a residual Filter above a full
    // scan reads every row group at 100 TB).
    Seq("q_filter_pred", "q_join_semi", "q_zorder_scan", "q_skip_scan",
        "q_dedup_containment", "q_dedup_ngram_jaccard").foreach { name =>
      val row = plans.Introspect
        .summary(SparkEntry.queries(name)(spark, sf)).collect()(0)
      assert(row.getAs[Boolean]("has_pushed_filters"),
        s"$name: no pushed filters reached any scan")
    }
  }

  test("hot relational shapes stay inside whole-stage codegen") {
    Seq("q_agg_hash", "q_join_hash", "q_win_rank", "q_dedup_docs").foreach { name =>
      // codegen stages render as `*(n) Operator` in the final AQE plan
      assert(executedPlan(name).contains("*("),
        s"$name fell out of whole-stage codegen")
    }
  }
}

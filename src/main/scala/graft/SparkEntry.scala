package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Bearly
import graft.operators.{Dedup, EventOps, Multimodal, Similarity, TextAnalysis}
import graft.queries.{Relational, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is a deterministic DataFrame (total ORDER BY,
  * rounded derived doubles) so it hash-matches its `oracleSql` twin
  * run by DuckDB over the same parquet tables. Entries without an
  * oracle (approx / not SQL-expressible) get the driver's rows-only
  * check and are pinned by ScalaTest golden/property specs instead.
  */
object SparkEntry {

  private def t(name: String)(implicit spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, name)

  // Shared near-dup intermediates for the cluster/graph audit family —
  // the "materialize pairs once, fan out" contract (see
  // [[graft.Materialized]]): the pair graph and its CC closure are
  // built once per (session, dir) and every downstream audit reuses
  // the checkpointed frame instead of re-running the LSH join or the
  // iterative fixpoint. Deterministic builders, so oracle rows are
  // unchanged; the first consumer in a bench round pays the build.
  private def ngramPairsShared(s: SparkSession, d: String): DataFrame =
    Materialized.of(s, d, "pairs_ngram")(Dedup.ngramJaccardPairs(Tables.documents(s, d)))
  private def simhashPairsShared(s: SparkSession, d: String): DataFrame =
    Materialized.of(s, d, "pairs_simhash_md5")(Dedup.simhashMd5NearDups(Tables.documents(s, d)))
  private def simhashGroupsShared(s: SparkSession, d: String): DataFrame =
    Materialized.of(s, d, "groups_simhash_md5")(
      Dedup.connectedGroups(simhashPairsShared(s, d)))
  private def minhashPairsShared(s: SparkSession, d: String): DataFrame =
    Materialized.of(s, d, "pairs_minhash_md5")(Dedup.minhashNearDupsMd5(Tables.documents(s, d)))
  private def minhashGroupsShared(s: SparkSession, d: String): DataFrame =
    Materialized.of(s, d, "groups_minhash_md5")(
      Dedup.connectedGroups(minhashPairsShared(s, d)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    implicit val dir: String = "/root/testdata/sf0.001"
    Relational.revenueByRegionYear(t("region"), t("nation"), t("customer"), t("orders"), t("lineitem"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity (SURVEY §2.1) ---
    "bearly_sum_lineitem" -> ((s, d) => Bearly.sum(Tables.lineitem(s, d))),
    "bearly_produce_array" -> ((s, _) =>
      Bearly.produceArray(s).orderBy(org.apache.spark.sql.functions.col("awesome_numbers").asc_nulls_first)),
    "bearly_produce_stream" -> ((s, _) =>
      Bearly.produceStream(s).orderBy(org.apache.spark.sql.functions.col("column0").asc_nulls_first)),
    // --- relational pack (SURVEY §2.2 taxonomy) ---
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q3_top_revenue" -> ((s, d) =>
      Relational.topRevenueOrders(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_filter_pushdown" -> ((s, d) => Relational.highQtyReturns(Tables.lineitem(s, d))),
    "q_semi_join" -> ((s, d) =>
      Relational.customersWithOpenOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_anti_join" -> ((s, d) =>
      Relational.customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "q_window_topk" -> ((s, d) => Relational.topOrdersPerPriority(Tables.orders(s, d))),
    "q_distinct" -> ((s, d) => Relational.distinctFlagStatus(Tables.lineitem(s, d))),
    "q_except" -> ((s, d) => Relational.exceptCustkeys(Tables.orders(s, d))),
    "q_intersect" -> ((s, d) => Relational.intersectCustkeys(Tables.orders(s, d))),
    "q_rollup" -> ((s, d) => Relational.rollupQuantities(Tables.lineitem(s, d))),
    "q_cube" -> ((s, d) => Relational.cubeOrderCounts(Tables.orders(s, d))),
    "q_scalar_funcs" -> ((s, d) => Relational.partScalarFuncs(Tables.part(s, d))),
    "q_orders_by_month" -> ((s, d) => Relational.ordersByMonth(Tables.orders(s, d))),
    "q_star_join_region_year" -> ((s, d) =>
      Relational.revenueByRegionYear(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_union_all" -> ((s, d) => Relational.unionAllOrders(Tables.orders(s, d))),
    "q_range_join" -> ((s, d) =>
      Relational.shippedWithin90Days(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_grouping_sets" -> ((s, d) => Relational.orderGroupingSets(Tables.orders(s, d))),
    "q_percentiles" -> ((s, d) => Relational.pricePercentiles(Tables.orders(s, d))),
    "q_percentiles_approx" -> ((s, d) => Relational.pricePercentilesApprox(Tables.orders(s, d))),
    "q_scalar_subquery" -> ((s, d) => Relational.aboveAverageOrders(Tables.orders(s, d))),
    "q_in_pred_semi" -> ((s, d) =>
      Relational.lineitemsOfPriciestOrders(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_approx_distinct" -> ((s, d) => Relational.approxDistinctStats(Tables.lineitem(s, d))),
    "q_udaf_weighted_avg" -> ((s, d) => Relational.weightedAvgDiscount(Tables.lineitem(s, d))),
    "q_unpivot" -> ((s, d) => Relational.unpivotMeasures(Tables.lineitem(s, d))),
    "q5_local_supplier" -> ((s, d) =>
      Relational.localSupplierVolume(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.supplier(s, d))),
    "q6_sql_forecast" -> ((s, d) => Relational.revenueForecastSql(Tables.lineitem(s, d))),
    "q_range_window" -> ((s, d) => Relational.trailing90DayOrderTotals(Tables.orders(s, d))),
    "q_rank_profile" -> ((s, d) => Relational.priceQuartileProfile(Tables.orders(s, d))),
    "q_merge_upsert" -> ((s, d) => Relational.applyChangeSet(Tables.customer(s, d))),
    "q_merge_on_read" -> ((s, d) => Relational.mergeOnReadView(Tables.customer(s, d))),
    "q_snapshot_diff" -> ((s, d) => Relational.snapshotDiff(Tables.customer(s, d))),
    "q_copurchase_lift" -> ((s, d) => Relational.copurchaseLift(Tables.lineitem(s, d))),
    "q_histogram" -> ((s, d) => Relational.priceHistogram(Tables.orders(s, d))),
    "q_window_nav" -> ((s, d) => Relational.orderNavigation(Tables.orders(s, d))),
    "q_lateral_topn" -> ((s, d) =>
      Relational.lateralTopOrder(Tables.customer(s, d), Tables.orders(s, d))),
    "q_recursive_cte" -> ((s, d) =>
      Relational.recursiveHierarchyDepths(Tables.customer(s, d))),
    "q_except_all" -> ((s, d) => Relational.exceptAllPriorities(Tables.orders(s, d))),
    "q_intersect_all" -> ((s, d) => Relational.intersectAllPriorities(Tables.orders(s, d))),
    "q_null_safe_join" -> ((s, d) => Relational.nullSafeRegionPairs(Tables.nation(s, d))),
    "q_string_agg" -> ((s, d) => Relational.statusListByPriority(Tables.orders(s, d))),
    "ev_gap_fill" -> ((s, d) => EventOps.gapFilledHourlyCounts(Tables.events(s, d))),
    "ev_transitions" -> ((s, d) => EventOps.transitionMatrix(Tables.events(s, d))),
    "ev_anomaly_zscore" -> ((s, d) => EventOps.hourlyAnomalies(Tables.events(s, d))),
    "ev_heavy_hitters" -> ((s, d) => EventOps.heavyHitterUsers(Tables.events(s, d))),
    "ev_hll_rollup" -> ((s, d) => EventOps.distinctUsersSketchRollup(Tables.events(s, d))),
    "ev_distinct_rollup" -> ((s, d) => EventOps.distinctUsersExactRollup(Tables.events(s, d))),
    "dedup_passage_stats" -> ((s, d) => Dedup.passageStats(Tables.documents(s, d))),
    "dedup_passage_dedup" -> ((s, d) => Dedup.passageDedup(Tables.documents(s, d))),
    "dedup_passage_rate" -> ((s, d) => Dedup.passageDupRate(Tables.documents(s, d))),
    "sim_knn_graph" -> ((s, d) => Similarity.knnGraph(Tables.embeddings(s, d))),
    "sim_semantic_groups" -> ((s, d) => Similarity.semanticGroups(Tables.embeddings(s, d))),
    "q_zorder_cluster" -> ((s, d) =>
      graft.operators.Clustering.eventZValues(Tables.events(s, d))),
    "ev_scd2_intervals" -> ((s, d) => EventOps.scd2Intervals(Tables.events(s, d))),
    "q_outer_join_count" -> ((s, d) =>
      Relational.customerOrderCounts(Tables.customer(s, d), Tables.orders(s, d))),
    "q_full_outer_nation" -> ((s, d) =>
      Relational.nationCustomerSupplierBalance(Tables.customer(s, d), Tables.supplier(s, d))),
    "q21_exists_shape" -> ((s, d) =>
      Relational.onlyReturnedSupplier(Tables.supplier(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d))),
    "q17_corr_subquery_sql" -> ((s, d) =>
      Relational.belowHalfAvgQuantityRevenueSql(Tables.part(s, d), Tables.lineitem(s, d))),
    "q17_corr_subquery_df" -> ((s, d) =>
      Relational.belowHalfAvgQuantityRevenue(Tables.part(s, d), Tables.lineitem(s, d))),
    // --- TPC-H optimizer-breadth shapes ---
    "q2_min_cost_supp" -> ((s, d) =>
      TpchShapes.minCostSupplier(Tables.part(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.region(s, d), Tables.lineitem(s, d))),
    "q4_order_priority" -> ((s, d) =>
      TpchShapes.orderPriorityCheck(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q7_volume_shipping" -> ((s, d) =>
      TpchShapes.volumeShipping(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d))),
    "q8_market_share" -> ((s, d) =>
      TpchShapes.marketShare(Tables.lineitem(s, d), Tables.part(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d))),
    "q9_product_profit" -> ((s, d) =>
      TpchShapes.productProfit(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d), Tables.orders(s, d), Tables.nation(s, d))),
    "q10_returned_items" -> ((s, d) =>
      TpchShapes.returnedItemRevenue(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.nation(s, d))),
    "q11_balance_concentration" -> ((s, d) =>
      TpchShapes.balanceConcentration(Tables.supplier(s, d), Tables.nation(s, d))),
    "q13_cust_distribution" -> ((s, d) =>
      TpchShapes.custOrderDistribution(Tables.customer(s, d), Tables.orders(s, d))),
    "q14_promo_revenue" -> ((s, d) =>
      TpchShapes.promoRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    "q15_top_supplier" -> ((s, d) =>
      TpchShapes.topSupplier(Tables.supplier(s, d), Tables.lineitem(s, d))),
    "q16_supplier_cnt_sql" -> ((s, d) =>
      TpchShapes.supplierCountSql(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d))),
    "q18_large_orders" -> ((s, d) =>
      TpchShapes.largeVolumeOrders(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d))),
    "q19_disjunctive" -> ((s, d) =>
      TpchShapes.disjunctiveRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    "q20_nested_in" -> ((s, d) =>
      TpchShapes.qualifiedSuppliers(Tables.supplier(s, d), Tables.nation(s, d),
        Tables.lineitem(s, d), Tables.part(s, d))),
    "q22_dormant_customers" -> ((s, d) =>
      TpchShapes.dormantCustomers(Tables.customer(s, d), Tables.orders(s, d))),
    "q12_priority_by_flag" -> ((s, d) =>
      TpchShapes.priorityByFlag(Tables.lineitem(s, d), Tables.orders(s, d))),
    "q_column_profile" -> ((s, d) => Relational.columnProfile(Tables.lineitem(s, d))),
    // sketch-based → engine-specific estimates, no SQL oracle;
    // tolerance spec pins it against q_column_profile's exact counts
    "q_column_profile_approx" -> ((s, d) =>
      Relational.columnProfileApprox(Tables.lineitem(s, d))),
    "q_pareto_share" -> ((s, d) =>
      Relational.revenueParetoTop(Tables.customer(s, d), Tables.orders(s, d))),
    "ev_dau_wau" -> ((s, d) => EventOps.dauWauStickiness(Tables.events(s, d))),
    "ev_user_gaps" -> ((s, d) => EventOps.userGapStats(Tables.events(s, d))),
    "q_rollup_grouping_id" -> ((s, d) =>
      Relational.rollupWithGroupingId(Tables.orders(s, d))),
    // salted skew join, oracle-pinned: the salt must not change the
    // join RESULT, only the shuffle distribution — the oracle is the
    // plain unsalted join aggregated to a deterministic summary.
    "q_skew_salted" -> ((s, d) =>
      graft.operators.Skew.saltedSupplierSummary(
        Tables.lineitem(s, d), Tables.supplier(s, d))),
    // --- event ops ---
    "ev_props_stats" -> ((s, d) => EventOps.propsStats(Tables.events(s, d))),
    "ev_asof_last_view" -> ((s, d) => EventOps.lastViewBeforePurchase(Tables.events(s, d))),
    "ev_asof_native" -> ((s, d) => EventOps.lastViewBeforePurchaseNative(Tables.events(s, d))),
    "ev_asof_tolerance" -> ((s, d) => EventOps.lastViewWithinNative(Tables.events(s, d))),
    "ev_sessionize" -> ((s, d) => EventOps.sessionize(Tables.events(s, d))),
    "ev_hourly_counts" -> ((s, d) => EventOps.hourlyCounts(Tables.events(s, d))),
    "ev_by_segment" -> ((s, d) =>
      EventOps.eventsBySegment(Tables.events(s, d), Tables.customer(s, d))),
    "ev_hour_pivot" -> ((s, d) => EventOps.hourOfDayPivot(Tables.events(s, d))),
    "ev_funnel" -> ((s, d) => EventOps.viewToPurchaseFunnel(Tables.events(s, d))),
    "ev_attribution" -> ((s, d) => EventOps.lastTouchAttribution(Tables.events(s, d))),
    "ev_rfm" -> ((s, d) => EventOps.rfm(Tables.events(s, d))),
    "ev_decayed_score" -> ((s, d) => EventOps.decayedEngagement(Tables.events(s, d))),
    "ev_funnel_steps" -> ((s, d) => EventOps.funnelSteps(Tables.events(s, d))),
    "ev_cohort_matrix" -> ((s, d) => EventOps.cohortMatrix(Tables.events(s, d))),
    "ev_props_json" -> ((s, d) => EventOps.propsJson(Tables.events(s, d))),
    "ev_props_variant" -> ((s, d) => EventOps.propsVariant(Tables.events(s, d))),
    "q_sql_udf" -> ((s, d) => Relational.sqlUdfRevenue(Tables.lineitem(s, d))),
    "ev_daily_rolling" -> ((s, d) => EventOps.dailyRolling(Tables.events(s, d))),
    "ev_retention" -> ((s, d) => EventOps.dailyRetention(Tables.events(s, d))),
    "ev_interval_join" -> ((s, d) => EventOps.nearbyEventPairs(Tables.events(s, d))),
    // --- dedup ---
    "dedup_exact" -> ((s, d) => Dedup.exact(Tables.documents(s, d))),
    "dedup_normalized" -> ((s, d) => Dedup.exactNormalized(Tables.documents(s, d))),
    "dedup_exact_stats" -> ((s, d) => Dedup.exactStats(Tables.documents(s, d))),
    "dedup_exact_stats_approx" -> ((s, d) => Dedup.exactStatsApprox(Tables.documents(s, d))),
    "dedup_minhash_pairs" -> ((s, d) => Dedup.minhashNearDups(Tables.documents(s, d))),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(Tables.documents(s, d)).orderBy("doc_id")),
    "dedup_simhash_neardups" -> ((s, d) => Dedup.simhashNearDups(Tables.documents(s, d), maxDist = 3)),
    "dedup_levenshtein" -> ((s, d) => Dedup.levenshteinNearDups(Tables.documents(s, d))),
    "dedup_pipeline" -> ((s, d) => Dedup.pipelineKeepSet(Tables.documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) =>
      ngramPairsShared(s, d)
        .orderBy(org.apache.spark.sql.functions.col("doc_a"),
          org.apache.spark.sql.functions.col("doc_b"))),
    "dedup_ngram_containment" -> ((s, d) =>
      Dedup.ngramContainmentPairs(Tables.documents(s, d))),
    // md5-seeded oracle twins of the xxhash64 fast paths (hash-checkable end-to-end)
    "dedup_minhash_md5" -> ((s, d) =>
      minhashPairsShared(s, d)
        .orderBy(org.apache.spark.sql.functions.col("doc_a"),
          org.apache.spark.sql.functions.col("doc_b"))),
    "dedup_minhash_est_error" -> ((s, d) =>
      Dedup.minhashEstErrorMd5(Tables.documents(s, d), minhashPairsShared(s, d),
        shingleK = 5, numHashes = 16)),
    "dedup_cluster_stats" -> ((s, d) =>
      Dedup.clusterStats(Tables.documents(s, d), minhashGroupsShared(s, d))),
    "dedup_impact_by_source" -> ((s, d) => Dedup.impactBySource(Tables.documents(s, d))),
    "dedup_boundary_overlap" -> ((s, d) => Dedup.boundaryOverlapPairs(Tables.documents(s, d))),
    "dedup_pagerank" -> ((s, d) => operators.Graph.pageRank(ngramPairsShared(s, d))),
    "dedup_triangles" -> ((s, d) => operators.Graph.triangleStats(ngramPairsShared(s, d))),
    "dedup_degree_hist" -> ((s, d) => operators.Graph.degreeHistogram(ngramPairsShared(s, d))),
    "dedup_band_histogram" -> ((s, d) => Dedup.minhashBandHistogram(Tables.documents(s, d))),
    "dedup_source_matrix" -> ((s, d) =>
      Dedup.crossSourceNearDups(Tables.documents(s, d), minhashPairsShared(s, d))),
    "dedup_lsh_recall" -> ((s, d) =>
      Dedup.lshRecallAudit(Tables.documents(s, d), ngramPairsShared(s, d),
        shingleK = 5, numHashes = 16, bands = 4)),
    "text_ttr" -> ((s, d) => TextAnalysis.typeTokenRatio(Tables.documents(s, d))),
    "text_jsd_drift" -> ((s, d) => TextAnalysis.jsdSourceDrift(Tables.documents(s, d))),
    "text_length_hist" -> ((s, d) => TextAnalysis.docLengthHistogram(Tables.documents(s, d))),
    "sim_l2_topk" -> ((s, d) => Similarity.l2TopK(Tables.embeddings(s, d))),
    "ev_hour_of_week" -> ((s, d) => EventOps.hourOfWeekProfile(Tables.events(s, d))),
    "ev_power_users" -> ((s, d) => EventOps.powerUsers(Tables.events(s, d))),
    "ev_session_histogram" -> ((s, d) => EventOps.sessionHistogram(Tables.events(s, d))),
    "ev_time_to_convert" -> ((s, d) => EventOps.timeToConvert(Tables.events(s, d))),
    "ev_user_lifecycle" -> ((s, d) => EventOps.userLifecycle(Tables.events(s, d))),
    "ev_anomaly_mad" -> ((s, d) => EventOps.hourlyAnomaliesMad(Tables.events(s, d))),
    "sim_dim_stats" -> ((s, d) => Similarity.dimensionStats(Tables.embeddings(s, d))),
    "sim_top_component" -> ((s, d) => Similarity.topComponent(Tables.embeddings(s, d))),
    "sim_label_confusion" -> ((s, d) => Similarity.labelConfusion(Tables.embeddings(s, d))),
    "ev_session_duration" -> ((s, d) =>
      EventOps.sessionDurationPercentiles(Tables.events(s, d))),
    "ev_new_vs_returning" -> ((s, d) => EventOps.newVsReturning(Tables.events(s, d))),
    "text_heaps_fit" -> ((s, d) => TextAnalysis.heapsLawFit(Tables.documents(s, d))),
    "mm_frame_entropy" -> ((s, d) => Multimodal.frameEntropy(Tables.documents(s, d))),
    "text_vocab_overlap" -> ((s, d) => TextAnalysis.sourceVocabOverlap(Tables.documents(s, d))),
    "ev_burstiness" -> ((s, d) => EventOps.userBurstiness(Tables.events(s, d))),
    "q_mad_prices" -> ((s, d) => Relational.priceMadByPriority(Tables.orders(s, d))),
    "text_token_count" -> ((s, d) => TextAnalysis.tokenCount(Tables.documents(s, d))),
    "ev_session_funnel" -> ((s, d) => EventOps.sessionFunnel(Tables.events(s, d))),
    "ev_asof_forward" -> ((s, d) => EventOps.nextViewAfterPurchase(Tables.events(s, d))),
    "ev_type_entropy" -> ((s, d) => EventOps.userTypeEntropy(Tables.events(s, d))),
    "ev_peak_concurrency" -> ((s, d) => EventOps.peakConcurrency(Tables.events(s, d))),
    "q_revenue_deciles" -> ((s, d) => Relational.revenueDeciles(Tables.orders(s, d))),
    "text_lang_confusion" -> ((s, d) =>
      TextAnalysis.langConfusionMatrix(Tables.documents(s, d))),
    "text_code_detect" -> ((s, d) => TextAnalysis.codeDetect(Tables.documents(s, d))),
    "dedup_split_leakage" -> ((s, d) => Dedup.splitLeakageOfPairs(minhashPairsShared(s, d))),
    "ev_error_rate" -> ((s, d) => EventOps.errorRateHourly(Tables.events(s, d))),
    "ev_funnel_by_segment" -> ((s, d) =>
      EventOps.funnelBySegment(Tables.events(s, d), Tables.customer(s, d))),
    "sim_split_drift" -> ((s, d) => Similarity.splitDrift(Tables.embeddings(s, d))),
    "ev_ewma_daily" -> ((s, d) => EventOps.ewmaDaily(Tables.events(s, d))),
    "text_gopher_rules" -> ((s, d) => TextAnalysis.gopherRules(Tables.documents(s, d))),
    "dedup_band_plan" -> ((s, _) => Dedup.lshBandPlan(s)),
    "sim_trunc_recall" -> ((s, d) => Similarity.truncatedDimRecall(Tables.embeddings(s, d))),
    "sim_probe_sweep" -> ((s, d) => Similarity.ivfProbeSweep(Tables.embeddings(s, d))),
    "sim_label_margin" -> ((s, d) => Similarity.labelMargin(Tables.embeddings(s, d))),
    "text_lang_source_mix" -> ((s, d) => TextAnalysis.langSourceMix(Tables.documents(s, d))),
    "ev_session_paths" -> ((s, d) => EventOps.sessionPaths(Tables.events(s, d))),
    "ev_seasonal_anomaly" -> ((s, d) => EventOps.seasonalAnomalies(Tables.events(s, d))),
    "text_quality_vs_dup" -> ((s, d) => TextAnalysis.qualityVsDup(Tables.documents(s, d))),
    "dedup_kcore" -> ((s, d) => operators.Graph.kCorePeel(ngramPairsShared(s, d))),
    "ev_metric_corr" -> ((s, d) => EventOps.metricCorrelation(Tables.events(s, d))),
    "ev_dwell_time" -> ((s, d) => EventOps.dwellTime(Tables.events(s, d))),
    "text_word_burstiness" -> ((s, d) => TextAnalysis.wordBurstiness(Tables.documents(s, d))),
    "ev_user_overlap" -> ((s, d) => EventOps.userOverlapAcrossTypes(Tables.events(s, d))),
    "sim_cell_balance" -> ((s, d) => Similarity.ivfCellBalance(Tables.embeddings(s, d))),
    "text_mix_diversity" -> ((s, d) => TextAnalysis.mixDiversity(Tables.documents(s, d))),
    "dedup_lex_vs_sem" -> ((s, d) =>
      Dedup.lexicalVsSemantic(Tables.documents(s, d), Tables.embeddings(s, d),
        minhashPairsShared(s, d))),
    "mm_modality_mix" -> ((s, d) => Multimodal.modalityMix(Tables.documents(s, d))),
    "sim_effective_dims" -> ((s, d) => Similarity.effectiveDims(Tables.embeddings(s, d))),
    "ev_wow_growth" -> ((s, d) => EventOps.wowGrowth(Tables.events(s, d))),
    "dedup_ngram_novelty" -> ((s, d) => Dedup.ngramNovelty(Tables.documents(s, d))),
    "text_temperature_weights" -> ((s, d) =>
      TextAnalysis.temperatureWeights(Tables.documents(s, d))),
    "ev_path_conversion" -> ((s, d) => EventOps.pathConversion(Tables.events(s, d))),
    "ev_cohort_ltv" -> ((s, d) => EventOps.cohortLtv(Tables.events(s, d))),
    "sim_coverage" -> ((s, d) =>
      Similarity.embeddingCoverage(Tables.documents(s, d), Tables.embeddings(s, d))),
    "dedup_shingle_df_hist" -> ((s, d) => Dedup.shingleDfHistogram(Tables.documents(s, d))),
    "ev_activity_streaks" -> ((s, d) => EventOps.activityStreaks(Tables.events(s, d))),
    "ev_purchase_cadence" -> ((s, d) => EventOps.purchaseCadence(Tables.events(s, d))),
    "text_common_openings" -> ((s, d) => TextAnalysis.commonOpenings(Tables.documents(s, d))),
    "ev_user_features" -> ((s, d) => EventOps.userFeatures(Tables.events(s, d))),
    "ev_forecast_backtest" -> ((s, d) => EventOps.forecastBacktest(Tables.events(s, d))),
    "dedup_cluster_best" -> ((s, d) =>
      Dedup.clusterRepresentatives(Tables.documents(s, d), simhashGroupsShared(s, d))),
    "ev_conversion_sweep" -> ((s, d) => EventOps.conversionWindowSweep(Tables.events(s, d))),
    "ev_retention_curve" -> ((s, d) => EventOps.retentionCurve(Tables.events(s, d))),
    "q_ship_latency" -> ((s, d) =>
      Relational.orderToShipLatency(Tables.orders(s, d), Tables.lineitem(s, d))),
    "ev_mix_drift" -> ((s, d) => EventOps.weeklyMixDrift(Tables.events(s, d))),
    "mm_size_outliers" -> ((s, d) => Multimodal.payloadSizeOutliers(Tables.documents(s, d))),
    "sim_knn_homophily" -> ((s, d) => Similarity.knnLabelHomophily(Tables.embeddings(s, d))),
    "text_vocab_coverage" -> ((s, d) => TextAnalysis.vocabCoverage(Tables.documents(s, d))),
    "dedup_rate_by_length" -> ((s, d) => Dedup.dupRateByLength(Tables.documents(s, d))),
    "sim_radius_search" -> ((s, d) => Similarity.radiusSearch(Tables.embeddings(s, d))),
    "text_stopword_profile" -> ((s, d) => TextAnalysis.stopwordProfile(Tables.documents(s, d))),
    "dedup_simhash_md5" -> ((s, d) => Dedup.simhashMd5(Tables.documents(s, d))),
    "dedup_simhash_md5_neardups" -> ((s, d) =>
      simhashPairsShared(s, d)
        .orderBy(org.apache.spark.sql.functions.col("doc_a"),
          org.apache.spark.sql.functions.col("doc_b"))),
    "dedup_keep_best" -> ((s, d) => Dedup.keepBestByFingerprint(Tables.documents(s, d))),
    "dedup_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, pmod, lit}
      val docs = Tables.documents(s, d)
      Dedup.incrementalNovel(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),  // today's batch
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0))  // existing corpus
    }),
    "dedup_groups_md5" -> ((s, d) =>
      simhashGroupsShared(s, d).orderBy(org.apache.spark.sql.functions.col("doc_id"))),
    "text_decontaminate" -> ((s, d) => Dedup.decontaminate(Tables.documents(s, d))),
    "dedup_decon_neardup" -> ((s, d) => Dedup.decontaminateNearDup(Tables.documents(s, d))),
    // --- similarity search ---
    "sim_bruteforce_topk" -> ((s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d))),
    "sim_ivf_topk" -> ((s, d) => Similarity.ivfTopK(Tables.embeddings(s, d), iters = 3)),
    // iters=0 twin: seed centroids are the 16 lowest vec_ids, so index
    // build + probe + search are all DuckDB-expressible end-to-end —
    // the oracle-checkable face of the same IVF code path
    "sim_ivf_topk_seed" -> ((s, d) => Similarity.ivfTopK(Tables.embeddings(s, d), iters = 0)),
    "sim_ivf_recall" -> ((s, d) => Similarity.ivfRecallReport(Tables.embeddings(s, d))),
    "sim_cosine_neardup" -> ((s, d) =>
      Similarity.cosineNearDupPairs(Tables.embeddings(s, d), threshold = 0.2,
        nTables = 4, bitsPerTable = 8)),
    "sim_threshold_sweep" -> ((s, d) => Similarity.thresholdSweep(Tables.embeddings(s, d))),
    "sim_label_centroids" -> ((s, d) => Similarity.labelCentroids(Tables.embeddings(s, d))),
    "sim_outliers" -> ((s, d) => Similarity.labelOutliers(Tables.embeddings(s, d))),
    "sim_hard_negatives" -> ((s, d) => Similarity.hardNegatives(Tables.embeddings(s, d))),
    "sim_mips_topk" -> ((s, d) => Similarity.mipsTopK(Tables.embeddings(s, d))),
    // --- text analysis ---
    "text_stats" -> ((s, d) => TextAnalysis.textStats(Tables.documents(s, d))),
    "text_fingerprints" -> ((s, d) => TextAnalysis.fingerprints(Tables.documents(s, d))),
    "text_quality_by_source" -> ((s, d) => TextAnalysis.qualityBySource(Tables.documents(s, d))),
    "text_lang_id" -> ((s, d) => TextAnalysis.languageId(Tables.documents(s, d))),
    "text_lang_id_rel" -> ((s, d) => TextAnalysis.languageIdRelational(Tables.documents(s, d))),
    "text_top_words" -> ((s, d) => TextAnalysis.topWords(Tables.documents(s, d))),
    "text_bpe_merges" -> ((s, d) => TextAnalysis.bpeMergeCandidates(Tables.documents(s, d))),
    "text_heavy_tokens" -> ((s, d) => TextAnalysis.heavyHitterTokens(Tables.documents(s, d))),
    "text_pmi_bigrams" -> ((s, d) => TextAnalysis.pmiBigrams(Tables.documents(s, d))),
    "text_dsir_weights" -> ((s, d) => TextAnalysis.dsirWeights(Tables.documents(s, d))),
    "text_ppl_by_source" -> ((s, d) => TextAnalysis.pplBySource(Tables.documents(s, d))),
    "text_zipf_slope" -> ((s, d) => TextAnalysis.zipfSlope(Tables.documents(s, d))),
    "text_inverted_index" -> ((s, d) => TextAnalysis.invertedIndex(Tables.documents(s, d))),
    "text_pii_scrub" -> ((s, d) => TextAnalysis.piiScrub(Tables.documents(s, d))),
    "text_quality_filter" -> ((s, d) => TextAnalysis.qualityFilter(Tables.documents(s, d))),
    "text_dataset_split" -> ((s, d) => TextAnalysis.datasetSplit(Tables.documents(s, d))),
    "text_hash_sample" -> ((s, d) => TextAnalysis.hashSample(Tables.documents(s, d))),
    "text_topk_by_source" -> ((s, d) => TextAnalysis.topKBySource(Tables.documents(s, d))),
    "text_unigram_logprob" -> ((s, d) => TextAnalysis.unigramLogProb(Tables.documents(s, d))),
    "text_tfidf" -> ((s, d) => TextAnalysis.tfidfTopTerms(Tables.documents(s, d))),
    "text_bm25" -> ((s, d) => TextAnalysis.bm25Search(Tables.documents(s, d))),
    "text_pack_sequences" -> ((s, d) => TextAnalysis.packSequences(Tables.documents(s, d))),
    "text_oov_rate" -> ((s, d) => TextAnalysis.oovRate(Tables.documents(s, d))),
    "text_vocab_growth" -> ((s, d) => TextAnalysis.vocabGrowth(Tables.documents(s, d))),
    "text_group_sample" -> ((s, d) => TextAnalysis.groupSample(Tables.documents(s, d))),
    "text_mix_resample" -> ((s, d) => TextAnalysis.mixResample(Tables.documents(s, d))),
    "text_mix_weights" -> ((s, d) => TextAnalysis.mixWeights(Tables.documents(s, d))),
    "text_bigram_logprob" -> ((s, d) => TextAnalysis.bigramLogProb(Tables.documents(s, d))),
    "text_repetition" -> ((s, d) => TextAnalysis.repetitionSignals(Tables.documents(s, d))),
    "text_chunking" -> ((s, d) => TextAnalysis.chunkDocuments(Tables.documents(s, d))),
    "text_stratified_sample" -> ((s, d) =>
      TextAnalysis.stratifiedSample(Tables.documents(s, d))),
    "text_weighted_sample" -> ((s, d) => TextAnalysis.weightedSample(Tables.documents(s, d))),
    "text_char_entropy" -> ((s, d) => TextAnalysis.charEntropy(Tables.documents(s, d))),
    "text_ngram_diversity" -> ((s, d) => TextAnalysis.ngramDiversity(Tables.documents(s, d))),
    "sim_quantize_int8" -> ((s, d) =>
      Similarity.quantizeInt8Report(Tables.embeddings(s, d))),
    "sim_vector_stats" -> ((s, d) =>
      Similarity.vectorStats(Tables.embeddings(s, d))),
    "sim_random_projection" -> ((s, d) =>
      Similarity.randomProjection(Tables.embeddings(s, d))),
    // --- multimodal ---
    "mm_payload_stats" -> ((s, d) => Multimodal.payloadStats(Tables.documents(s, d))),
    "mm_payload_dedup" -> ((s, d) => Multimodal.payloadDedup(Tables.documents(s, d))),
    "mm_decode_features" -> ((s, d) =>
      Multimodal.decodeFeatures(Tables.documents(s, d)).toDF().orderBy("doc_id")),
    "mm_sample_frames" -> ((s, d) => Multimodal.sampleFrames(Tables.documents(s, d))),
    // --- round-7 second continuation ---
    "ev_markov_2step" -> ((s, d) => EventOps.markovTwoStep(Tables.events(s, d))),
    "ev_trigrams" -> ((s, d) => EventOps.topTrigrams(Tables.events(s, d))),
    "text_hapax_by_source" -> ((s, d) => TextAnalysis.hapaxBySource(Tables.documents(s, d))),
    "text_curriculum" -> ((s, d) => TextAnalysis.curriculumBuckets(Tables.documents(s, d))),
    "text_word_len_profile" -> ((s, d) => TextAnalysis.wordLenProfile(Tables.documents(s, d))),
    "sim_pair_hist" -> ((s, d) => Similarity.pairCosineHistogram(Tables.embeddings(s, d))),
    "mm_shard_manifest" -> ((s, d) => Multimodal.shardManifest(Tables.documents(s, d))),
    "q_drawdown" -> ((s, d) => Relational.revenueDrawdown(Tables.orders(s, d))),
    "ev_rolling_p95" -> ((s, d) => EventOps.rollingDailyP95(Tables.events(s, d))),
    "ev_autocorr" -> ((s, d) => EventOps.dailyAutocorr(Tables.events(s, d))),
    "sim_cell_cohesion" -> ((s, d) => Similarity.ivfCellCohesion(Tables.embeddings(s, d))),
    "text_source_keywords" -> ((s, d) => TextAnalysis.sourceKeywords(Tables.documents(s, d))),
    "ev_value_percentiles" -> ((s, d) => EventOps.valuePercentiles(Tables.events(s, d))),
    "dedup_est_jaccard_hist" -> ((s, d) => Dedup.estJaccardHistogram(Tables.documents(s, d))),
    "text_simhash_topk" -> ((s, d) => Dedup.simhashHammingTopK(Tables.documents(s, d))),
    "ev_session_gap_hist" -> ((s, d) => EventOps.sessionGapHistogram(Tables.events(s, d))),
    "dedup_prefix_pairs" -> ((s, d) => Dedup.prefixFilterPairs(Tables.documents(s, d))),
    "ev_changepoint" -> ((s, d) => EventOps.changepointCusum(Tables.events(s, d))),
    "dedup_cluster_size_hist" -> ((s, d) =>
      Dedup.clusterSizeHistogramOfGroups(simhashGroupsShared(s, d))),
    "text_bigram_entropy" -> ((s, d) => TextAnalysis.bigramEntropyRate(Tables.documents(s, d))),
    "ev_retention_fit" -> ((s, d) => EventOps.retentionFit(Tables.events(s, d))),
    "ev_strict_funnel" -> ((s, d) => EventOps.strictFunnel(Tables.events(s, d))),
    "text_skipgram_pmi" -> ((s, d) => TextAnalysis.skipgramPmi(Tables.documents(s, d))),
    "ev_behavior_sim" -> ((s, d) => EventOps.behaviorSimilarity(Tables.events(s, d))),
    "q_benford" -> ((s, d) => Relational.benfordFirstDigit(Tables.orders(s, d))),
    "dedup_assortativity" -> ((s, d) => operators.Graph.assortativity(ngramPairsShared(s, d))),
    "sim_mmr_rerank" -> ((s, d) => Similarity.mmrRerank(Tables.embeddings(s, d))),
    "ev_ab_test" -> ((s, d) => EventOps.abTest(Tables.events(s, d))),
    "ev_ab_ks" -> ((s, d) => EventOps.abKsStatistic(Tables.events(s, d))),
    "dedup_weighted_jaccard" -> ((s, d) => Dedup.weightedJaccardPairs(Tables.documents(s, d))),
    "dedup_winnow_pairs" -> ((s, d) => Dedup.winnowPairs(Tables.documents(s, d))),
    "text_mattr" -> ((s, d) => TextAnalysis.mattrBySource(Tables.documents(s, d))),
    "ev_dq_checks" -> ((s, d) => EventOps.dqChecks(Tables.events(s, d))),
    "ev_burst_detect" -> ((s, d) => EventOps.burstDetect(Tables.events(s, d))),
    "ev_attribution_models" -> ((s, d) => EventOps.attributionModels(Tables.events(s, d))),
    "ev_psi_drift" -> ((s, d) => EventOps.psiDrift(Tables.events(s, d))),
    "ev_ab_hte" -> ((s, d) => EventOps.abHeterogeneous(Tables.events(s, d))),
    "ev_diff_in_diff" -> ((s, d) => EventOps.diffInDiff(Tables.events(s, d))),
    "ev_cuped" -> ((s, d) => EventOps.cuped(Tables.events(s, d))),
    "ev_ab_conversion" -> ((s, d) => EventOps.abConversion(Tables.events(s, d))),
    "ev_power_analysis" -> ((s, d) => EventOps.powerAnalysis(Tables.events(s, d))),
    "sim_cell_purity" -> ((s, d) => Similarity.cellLabelPurity(Tables.embeddings(s, d))),
    "q_revenue_accounting" -> ((s, d) => Relational.revenueAccounting(Tables.orders(s, d))),
    "text_rake_keywords" -> ((s, d) => TextAnalysis.rakeKeywords(Tables.documents(s, d))),
    "sim_rrf_fusion" -> ((s, d) => Similarity.rrfFusion(Tables.embeddings(s, d))),
    "q_customer_acquisition" -> ((s, d) => Relational.customerAcquisition(Tables.orders(s, d))),
    "q_market_hhi" -> ((s, d) => Relational.marketHhi(Tables.orders(s, d),
      Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "q_single_source_risk" -> ((s, d) => Relational.singleSourceRisk(Tables.lineitem(s, d))),
    "q_price_ols_by_flag" -> ((s, d) => Relational.priceOlsByFlag(Tables.lineitem(s, d))),
    "mm_text_embedding_align" -> ((s, d) =>
      Multimodal.textEmbeddingAlign(Tables.documents(s, d), Tables.embeddings(s, d))),
    "q_gini" -> ((s, d) => Relational.giniCustomerSpend(Tables.orders(s, d))),
    "q_weighted_median" -> ((s, d) => Relational.weightedMedianPrice(Tables.lineitem(s, d))),
    "ev_kaplan_meier" -> ((s, d) => EventOps.kaplanMeier(Tables.events(s, d))),
    "text_readability" -> ((s, d) => TextAnalysis.readabilityBySource(Tables.documents(s, d))),
  )

  /** Shared CTE chain for the relational language-ID oracles —
    * mirrors [[graft.operators.TextAnalysis.languageIdRelational]]
    * (modulo-8 train/holdout split, 300-gram profiles, weighted-rank
    * scoring, argmax with the fast path's tiebreak). Ends with a
    * `pred(doc_id, true_lang, pred_lang, score)` CTE over the
    * holdout.
    */
  private val langIdRelChain: String =
    """lowered AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
      |tg AS (SELECT doc_id, lang,
      |              unnest(list_transform(range(1, length(t) - 1),
      |                     i -> substr(t, CAST(i AS INTEGER), 3))) AS gram
      |       FROM lowered),
      |train AS (SELECT lang, gram, count(*) AS cnt FROM tg
      |          WHERE doc_id % 8 = 0 GROUP BY 1, 2),
      |prof AS (SELECT lang AS plang, gram, 301 - rank AS wt FROM (
      |           SELECT lang, gram,
      |                  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS rank
      |           FROM train) r
      |         WHERE rank <= 300),
      |scores AS (SELECT tg.doc_id, plang, CAST(sum(wt) AS BIGINT) AS score
      |           FROM tg JOIN prof USING (gram)
      |           WHERE tg.doc_id % 8 = 1 GROUP BY 1, 2),
      |best AS (SELECT doc_id, plang, score FROM (
      |           SELECT doc_id, plang, score,
      |                  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn
      |           FROM scores WHERE score > 0) b
      |         WHERE rn = 1),
      |pred AS (SELECT d.doc_id, d.lang AS true_lang,
      |                coalesce(b.plang, 'und') AS pred_lang,
      |                CAST(coalesce(b.score, 0) AS BIGINT) AS score
      |         FROM documents d LEFT JOIN best b USING (doc_id)
      |         WHERE d.doc_id % 8 = 1)""".stripMargin

  /** Shared CTE: 32-bit md5 SimHash per doc — mirrors
    * [[graft.operators.Dedup.simhashMd5]] (lowercased whitespace
    * tokens, h = first 8 hex chars of md5, per-bit votes, Σ 2^bit).
    */
  private val simhashMd5Cte: String =
    """t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
      |hh AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok),1,8)) AS BIGINT) AS h FROM t),
      |v AS (SELECT doc_id, b, sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS votes
      |      FROM hh CROSS JOIN (SELECT unnest(range(0, 32)) AS b) bits GROUP BY 1, 2),
      |fp AS (SELECT doc_id,
      |              CAST(sum(CASE WHEN votes > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash32
      |       FROM v GROUP BY doc_id)""".stripMargin

  /** Minhash-md5 banded-LSH pair CTE chain over an arbitrary source
    * relation (must expose doc_id, text) — shared by the standalone
    * pair oracle and the end-to-end pipeline oracle. Ends with a
    * `pairs` CTE of (doc_a, doc_b, sa, sb).
    */
  private def minhashPairCtes(src: String): String = {
    val n = 16; val bands = 4; val rpb = n / bands
    val minCols = (0 until n).map(i =>
      s"min((h * ${Dedup.md5A(i)} + ${Dedup.md5B(i)}) % ${Dedup.Md5M}) AS s$i").mkString(",\n               ")
    val sigList = (0 until n).map(i => s"coalesce(s$i, ${Dedup.Md5M})").mkString("[", ", ", "]")
    val bandArms = (0 until bands).map { bnd =>
      val key = (bnd * rpb until (bnd + 1) * rpb).map(i => s"sig[${i + 1}]")
        .mkString("concat_ws(',', ", ", ", ")")
      s"SELECT doc_id, sig, $bnd AS band_idx, $key AS band_key FROM sig"
    }.mkString("\n       UNION ALL\n       ")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $src),
       |shl AS (SELECT doc_id,
       |               list_distinct(CASE WHEN len(ws) >= 5
       |                 THEN list_transform(range(0, len(ws)-4),
       |                        i -> array_to_string(ws[CAST(i+1 AS INTEGER):CAST(i+5 AS INTEGER)], ' '))
       |                 ELSE [] END) AS shs
       |        FROM w),
       |sh AS (SELECT doc_id, unnest(shs) AS sh FROM shl),
       |hh AS (SELECT doc_id, CAST(concat('0x', substr(md5(sh),1,7)) AS BIGINT) AS h FROM sh),
       |sig0 AS (SELECT doc_id, $minCols
       |         FROM hh GROUP BY doc_id),
       |sig AS (SELECT d.doc_id, $sigList AS sig
       |        FROM (SELECT doc_id FROM $src) d LEFT JOIN sig0 USING (doc_id)),
       |b AS ($bandArms),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b, a.sig AS sa, c.sig AS sb
       |          FROM b a JOIN b c USING (band_idx, band_key)
       |          WHERE a.doc_id < c.doc_id)""".stripMargin
  }

  /** Generated oracle for [[graft.operators.Dedup.minhashNearDupsMd5]]:
    * the affine coefficients are embedded as literals so both engines
    * evaluate the identical integer arithmetic.
    */
  private def minhashMd5Oracle: String = {
    val n = 16
    s"""WITH ${minhashPairCtes("documents")}
       |SELECT doc_a, doc_b, est_jaccard FROM (
       |  SELECT doc_a, doc_b,
       |         round(len(list_filter(range(1, ${n + 1}), i -> sa[i] = sb[i])) / $n.0, 6) AS est_jaccard
       |  FROM pairs) q
       |WHERE est_jaccard >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Estimator-audit oracle: the [[minhashMd5Oracle]] pair chain plus
    * exact distinct-shingle Jaccard from the `shl` lists
    * (`list_intersect`), with the same rounded-then-differenced
    * arithmetic the Spark op applies.
    */
  private def minhashEstErrorOracle: String = {
    val n = 16
    s"""WITH ${minhashPairCtes("documents")},
       |e2 AS (SELECT * FROM (
       |  SELECT doc_a, doc_b,
       |         round(len(list_filter(range(1, ${n + 1}), i -> sa[i] = sb[i])) / $n.0, 6) AS est_jaccard
       |  FROM pairs) q WHERE est_jaccard >= 0.5),
       |tj AS (SELECT e2.doc_a, e2.doc_b, e2.est_jaccard,
       |              len(list_intersect(a.shs, b.shs)) AS inter,
       |              len(a.shs) AS na, len(b.shs) AS nb
       |       FROM e2 JOIN shl a ON e2.doc_a = a.doc_id
       |                JOIN shl b ON e2.doc_b = b.doc_id),
       |tr AS (SELECT doc_a, doc_b, est_jaccard,
       |              CASE WHEN inter > 0
       |                   THEN round(CAST(inter AS DOUBLE) / (na + nb - inter), 6)
       |                   ELSE 0.0 END AS true_jaccard
       |       FROM tj)
       |SELECT doc_a, doc_b, est_jaccard, true_jaccard,
       |       round(abs(est_jaccard - true_jaccard), 6) AS abs_err
       |FROM tr ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Cluster-report oracle: minhash banded pairs → recursive-CTE
    * transitive closure (the [[dedupPipelineOracle]] machinery) →
    * per-group size/representative/byte-mass aggregate.
    */
  private def clusterStatsOracle: String = {
    val n = 16
    s"""WITH RECURSIVE
       |${minhashPairCtes("documents")},
       |nd AS (SELECT doc_a, doc_b FROM (
       |  SELECT doc_a, doc_b,
       |         round(len(list_filter(range(1, ${n + 1}), i -> sa[i] = sb[i])) / $n.0, 6) AS ej
       |  FROM pairs) q WHERE ej >= 0.5),
       |edges AS (SELECT doc_a AS a, doc_b AS nb FROM nd UNION SELECT doc_b, doc_a FROM nd),
       |reach(a, nb) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) seeds
       |  UNION
       |  SELECT r.a, e.nb FROM reach r JOIN edges e ON r.nb = e.a),
       |grp AS (SELECT a AS doc_id, min(nb) AS group_id FROM reach GROUP BY 1)
       |SELECT group_id, count(*) AS n_docs, min(doc_id) AS keep_id,
       |       CAST(coalesce(sum(d.n_chars), 0) AS BIGINT) AS total_chars
       |FROM grp JOIN documents d USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Shared CTE re-deriving [[graft.operators.Dedup.ngramJaccardPairs]]
    * (5-gram shingles, df ≤ 1000, jaccard ≥ 0.2) as the `pp` pair
    * table — the edge source for the graph-analytics oracles
    * (`dedup_pagerank`, `dedup_triangles`).
    */
  private def jaccardPairsCtes(p: String): String =
    s"""${p}w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |${p}sh AS (
      |  SELECT doc_id, CAST(len(shs) AS INTEGER) AS n_sh, unnest(shs) AS sh FROM (
      |    SELECT doc_id,
      |           list_distinct(CASE WHEN len(ws) >= 5
      |             THEN list_transform(range(0, len(ws)-5+1),
      |                    i -> array_to_string(ws[CAST(i+1 AS INTEGER):CAST(i+5 AS INTEGER)], ' '))
      |             ELSE [] END) AS shs
      |    FROM ${p}w) t),
      |${p}rare AS (SELECT sh FROM ${p}sh GROUP BY sh HAVING count(*) <= 1000),
      |${p}c AS (SELECT s.doc_id, s.n_sh, s.sh FROM ${p}sh s JOIN ${p}rare USING (sh)),
      |${p}p0 AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         a.n_sh AS na, b.n_sh AS nb, count(*) AS inter
      |  FROM ${p}c a JOIN ${p}c b USING (sh)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1,2,3,4),
      |${p}pp AS (SELECT doc_a, doc_b FROM (
      |  SELECT doc_a, doc_b, round(inter / (na + nb - inter), 6) AS jaccard
      |  FROM ${p}p0) q WHERE jaccard >= 0.2)""".stripMargin

  private val jaccardPairsCte: String = jaccardPairsCtes("")

  /** Oracle for [[graft.operators.Graph.triangleStats]] over the
    * jaccard near-dup pairs: oriented two-join triangle enumeration,
    * wedge count Σ C(deg, 2), cc = 3·triangles / wedges.
    */
  private def trianglesOracle: String =
    s"""WITH $jaccardPairsCte,
       |tri AS (SELECT count(*) AS n_triangles
       |        FROM pp ab JOIN pp bc ON ab.doc_b = bc.doc_a
       |        JOIN pp ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
       |deg AS (SELECT node, count(*) AS deg FROM (
       |          SELECT doc_a AS node FROM pp UNION ALL SELECT doc_b FROM pp) u GROUP BY 1),
       |wg AS (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges FROM deg),
       |ne AS (SELECT count(*) AS n_edges FROM pp)
       |SELECT n_edges, n_triangles, n_wedges,
       |       round(CAST(3.0 AS DOUBLE) * n_triangles / n_wedges, 6) AS global_cc
       |FROM ne, tri, wg""".stripMargin

  /** Oracle for [[graft.operators.Similarity.thresholdSweep]]: the
    * LSH candidate pairs vs a 15-cutoff grid; LEFT join keeps
    * zero-count cutoffs, mirroring the Spark zero-restore join.
    */
  private def thresholdSweepOracle: String =
    s"""WITH $cosineNearDupBaseCte,
       |nd AS (SELECT DISTINCT vec_a, vec_b, cos_sim FROM p WHERE cos_sim >= 0.2),
       |grid AS (SELECT CAST(t AS DOUBLE) AS threshold FROM
       |           unnest([0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.55,
       |                   0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9]) AS u(t)),
       |cnt AS (SELECT threshold, count(*) AS n_pairs
       |        FROM nd JOIN grid ON cos_sim >= threshold GROUP BY 1)
       |SELECT threshold, coalesce(n_pairs, 0) AS n_pairs
       |FROM grid LEFT JOIN cnt USING (threshold) ORDER BY threshold""".stripMargin

  /** PageRank oracle: the dedup_ngram_jaccard pair CTEs as the edge
    * list, then `iters` unrolled power-iteration steps — each the
    * same (1−d)/N + d·Σ pr/deg expression tree Spark evaluates, so
    * doubles round identically at 6 decimals.
    */
  private def pagerankOracle(iters: Int = 3): String = {
    def step(prev: String, out: String) =
      s"""$out AS (SELECT nd.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(s.in_sum, 0.0) AS pr
         |       FROM nodes nd CROSS JOIN nn
         |       LEFT JOIN (SELECT e.dst AS node, sum(p.pr / deg.deg) AS in_sum
         |                  FROM e JOIN $prev p ON e.src = p.node
         |                         JOIN deg ON e.src = deg.src
         |                  GROUP BY 1) s ON nd.node = s.node)""".stripMargin
    val steps = (1 to iters).map(i => step(if (i == 1) "pr0" else s"it${i - 1}", s"it$i"))
      .mkString(",\n")
    s"""WITH $jaccardPairsCte,
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM pp
       |      UNION SELECT doc_b, doc_a FROM pp),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |pr0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT node, round(pr, 6) AS pagerank FROM it$iters ORDER BY node""".stripMargin
  }

  /** Oracle for [[graft.operators.Graph.assortativity]]: endpoint
    * degrees over the directed jaccard-pair edges, Pearson r from the
    * five exact-BIGINT sums — identical expression tree to Spark's.
    */
  private def assortativityOracle: String =
    s"""WITH $jaccardPairsCte,
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM pp
       |      UNION SELECT doc_b, doc_a FROM pp),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       |d2 AS (SELECT da.deg AS x, db.deg AS y
       |       FROM e JOIN deg da ON e.src = da.src
       |              JOIN deg db ON e.dst = db.src),
       |s AS (SELECT count(*) AS m, CAST(sum(x) AS BIGINT) AS sx,
       |             CAST(sum(y) AS BIGINT) AS sy,
       |             CAST(sum(x * y) AS BIGINT) AS sxy,
       |             CAST(sum(x * x) AS BIGINT) AS sx2,
       |             CAST(sum(y * y) AS BIGINT) AS sy2 FROM d2),
       |nn AS (SELECT count(*) AS n_nodes FROM deg)
       |SELECT CAST(m // 2 AS BIGINT) AS n_edges, n_nodes,
       |       CASE WHEN m * sx2 - sx * sx > 0 AND m * sy2 - sy * sy > 0
       |            THEN round((m * sxy - sx * sy) /
       |                   sqrt(CAST(m * sx2 - sx * sx AS DOUBLE) *
       |                        CAST(m * sy2 - sy * sy AS DOUBLE)), 6)
       |       END AS assortativity
       |FROM s, nn""".stripMargin

  /** Oracle for [[graft.operators.Similarity.mmrRerank]]: k unrolled
    * greedy steps (the repo's fixed-iteration convention — pagerank,
    * k-core); every score is rounded to 6 before each argmax, λ=0.7
    * and μ=0.3 are independent literals exactly as in the Spark op.
    */
  private def mmrOracle(k: Int = 5): String = {
    def step(i: Int) =
      s"""s$i AS (SELECT aid AS cid, arel AS rel, $i AS step,
         |        round(0.7 * arel - 0.3 * max_sim, 6) AS mmr_score
         |  FROM (SELECT aid, arel, max(sim) AS max_sim FROM p
         |        WHERE bid IN (SELECT cid FROM u${i - 1})
         |          AND aid NOT IN (SELECT cid FROM u${i - 1})
         |        GROUP BY 1, 2) t
         |  ORDER BY mmr_score DESC, cid LIMIT 1),
         |u$i AS (SELECT cid FROM u${i - 1} UNION ALL SELECT cid FROM s$i)""".stripMargin
    val steps = (2 to k).map(step).mkString(",\n")
    val unions = (1 to k).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id = 0),
       |cand AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv,
       |                round(list_cosine_similarity(
       |                  CAST(embedding AS DOUBLE[]), qv), 6) AS rel
       |         FROM embeddings, q WHERE vec_id <> 0
       |         ORDER BY rel DESC, cid LIMIT 20),
       |p AS (SELECT a.cid AS aid, a.rel AS arel, b.cid AS bid,
       |             round(list_cosine_similarity(a.cv, b.cv), 6) AS sim
       |      FROM cand a JOIN cand b ON a.cid <> b.cid),
       |s1 AS (SELECT cid, rel, 1 AS step, rel AS mmr_score FROM cand
       |       ORDER BY rel DESC, cid LIMIT 1),
       |u1 AS (SELECT cid FROM s1),
       |$steps
       |SELECT step, cid AS vec_id, rel, mmr_score FROM ($unions) z
       |ORDER BY step""".stripMargin
  }

  /** Shared oracle for BOTH merge paths (q_merge_upsert writes the
    * next snapshot, q_merge_on_read composes it at read time — the
    * outputs are defined to be row-identical, so one SQL pins both).
    */
  private val mergeOracle: String =
      """WITH ch AS (
        |  SELECT c_custkey AS key,
        |         CASE WHEN c_custkey % 10 = 3 THEN 'U' ELSE 'D' END AS op,
        |         round(c_acctbal + 100, 2) AS new_bal
        |  FROM customer WHERE c_custkey % 10 IN (3, 7)
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'I', 0.0
        |  FROM customer WHERE c_custkey % 10 = 1),
        |snap AS (SELECT c_custkey AS key, c_acctbal AS bal FROM customer),
        |survivors AS (
        |  SELECT snap.key,
        |         CASE WHEN ch.op = 'U' THEN ch.new_bal ELSE snap.bal END AS bal
        |  FROM snap LEFT JOIN ch ON snap.key = ch.key
        |  WHERE ch.op IS NULL OR ch.op <> 'D'),
        |ins AS (
        |  SELECT ch.key, ch.new_bal AS bal FROM ch
        |  WHERE ch.op = 'I'
        |    AND NOT EXISTS (SELECT 1 FROM snap WHERE snap.key = ch.key))
        |SELECT * FROM survivors UNION ALL SELECT * FROM ins ORDER BY key""".stripMargin

  /** Near-dup decontamination oracle: same signature/band CTEs as
    * [[minhashMd5Oracle]]; keeps only train×eval band collisions,
    * then per train doc the (est_jaccard, eval_id)-max match —
    * the row_number tiebreak mirrors Spark's struct-max exactly.
    */
  private def deconNearDupOracle: String = {
    val n = 16
    s"""WITH ${minhashPairCtes("documents")},
       |te AS (
       |  SELECT CASE WHEN doc_a % 50 = 0 THEN doc_b ELSE doc_a END AS doc_id,
       |         CASE WHEN doc_a % 50 = 0 THEN doc_a ELSE doc_b END AS eval_id,
       |         round(len(list_filter(range(1, ${n + 1}), i -> sa[i] = sb[i])) / $n.0, 6) AS ej
       |  FROM pairs
       |  WHERE (doc_a % 50 = 0) <> (doc_b % 50 = 0)),
       |best AS (SELECT doc_id, eval_id, ej FROM (
       |  SELECT doc_id, eval_id, ej,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY ej DESC, eval_id DESC) AS rn
       |  FROM te) t WHERE rn = 1)
       |SELECT doc_id, eval_id, ej AS est_jaccard FROM best
       |WHERE ej >= 0.5 ORDER BY doc_id""".stripMargin
  }

  /** End-to-end dedup pipeline oracle: exact dedup survivors →
    * minhash banded pairs (≥ 0.5 est. Jaccard) → recursive-CTE
    * transitive closure → keep each group's min doc_id.
    */
  private def dedupPipelineOracle: String = {
    val n = 16
    s"""WITH RECURSIVE
       |ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |surv AS (SELECT d.doc_id, d.text FROM documents d JOIN ex USING (doc_id)),
       |${minhashPairCtes("surv")},
       |nd AS (SELECT doc_a, doc_b FROM (
       |  SELECT doc_a, doc_b,
       |         round(len(list_filter(range(1, ${n + 1}), i -> sa[i] = sb[i])) / $n.0, 6) AS ej
       |  FROM pairs) q WHERE ej >= 0.5),
       |edges AS (SELECT doc_a AS a, doc_b AS nb FROM nd UNION SELECT doc_b, doc_a FROM nd),
       |reach(a, nb) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) seeds
       |  UNION
       |  SELECT r.a, e.nb FROM reach r JOIN edges e ON r.nb = e.a
       |),
       |grp AS (SELECT a AS doc_id, min(nb) AS g FROM reach GROUP BY 1),
       |drops AS (SELECT doc_id FROM grp WHERE doc_id <> g)
       |SELECT s.doc_id FROM surv s
       |WHERE NOT EXISTS (SELECT 1 FROM drops x WHERE x.doc_id = s.doc_id)
       |ORDER BY s.doc_id""".stripMargin
  }

  /** Shared CTE chain for the hyperplane-LSH oracles: literal
    * splitmix64 plane matrix → banded buckets → capped buckets →
    * scored candidate pairs `p(vec_a, vec_b, cos_sim)`.
    */
  private def cosineNearDupBaseCte: String = {
    val nTables = 4; val bits = 8; val dim = 64
    val maxBucket = 256
    import graft.functions.HyperplaneSignature.comp
    val arms = (0 until nTables).map { t =>
      val bucket = (0 until bits).map { b =>
        val plane = t * bits + b
        val dot = (0 until dim)
          .map(j => s"v[${j + 1}]*(${comp(plane, j)})").mkString(" + ")
        s"(CASE WHEN $dot >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString("CAST(", "\n     + ", " AS BIGINT)")
      s"SELECT vec_id, v, $t AS table_idx,\n  $bucket AS bucket FROM e"
    }.mkString("\n UNION ALL\n ")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS ($arms),
       |capped AS (SELECT table_idx, bucket, vec_id, v FROM (
       |  SELECT table_idx, bucket, vec_id, v,
       |         row_number() OVER (PARTITION BY table_idx, bucket ORDER BY vec_id) AS rn
       |  FROM b) t WHERE rn <= $maxBucket),
       |p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       |             round(list_cosine_similarity(a.v, c.v), 6) AS cos_sim
       |      FROM capped a JOIN capped c USING (table_idx, bucket)
       |      WHERE a.vec_id < c.vec_id)""".stripMargin
  }

  /** Generated oracle for [[graft.operators.Similarity.topComponent]]:
    * `iters` unrolled power-iteration rounds, each one CTE pair —
    * d_r projects every row's xᵀv against the previous round's
    * (data-dependent) v columns with the same j-ascending
    * left-associated dot product `graft_dot` runs, s_r sums the 64
    * components, i_r normalizes by the left-folded √Σs² the Scala
    * driver computes. Engines differ only in row-sum order (~1e-13),
    * absorbed by round(6)/round(4).
    */
  private def topComponentOracle(iters: Int = 3): String = {
    val dims = 0 until 64
    val i0 = s"i0 AS (SELECT ${dims.map(j => s"${if (j == 0) "1.0" else "0.0"} AS v$j").mkString(", ")})"
    val rounds = (1 to iters).map { r =>
      val dot = dims.map(j => s"x.v[${j + 1}] * p.v$j").mkString(" + ")
      val d = s"d$r AS (SELECT x.v AS v, ($dot) AS xv FROM x CROSS JOIN i${r - 1} p)"
      val s = s"s$r AS (SELECT ${dims.map(j => s"sum(v[${j + 1}] * xv) AS s$j").mkString(", ")} FROM d$r)"
      val nrm = dims.map(j => s"s$j * s$j").mkString(" + ")
      val i = s"i$r AS (SELECT ${dims.map(j => s"s$j / nrm AS v$j").mkString(", ")}, nrm " +
        s"FROM (SELECT *, sqrt($nrm) AS nrm FROM s$r) t)"
      s"$d,\n$s,\n$i"
    }.mkString(",\n")
    s"""WITH x AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$i0,
       |$rounds
       |SELECT CAST(i - 1 AS INTEGER) AS dim,
       |       round(l[CAST(i AS INTEGER)], 6) AS loading,
       |       round(nrm, 4) AS eig_est
       |FROM (SELECT ${dims.map(j => s"v$j").mkString("list_value(", ", ", ")")} AS l, nrm FROM i$iters)
       |CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
       |ORDER BY dim""".stripMargin
  }

  /** Generated oracle for [[graft.operators.Similarity.cosineNearDupPairs]]:
    * the splitmix64 hyperplane matrix
    * ([[graft.functions.HyperplaneSignature.comp]]) is embedded as
    * double literals (shortest-round-trip `Double.toString`, so DuckDB
    * parses back the identical bits), and each plane's dot product is
    * written as the same left-associated j-ascending sum the Scala
    * loop computes — bit-identical doubles ⇒ identical bucket signs ⇒
    * identical candidate pairs. Scoring mirrors `graft_cosine` via
    * `list_cosine_similarity` rounded to 6 (the proven
    * `sim_bruteforce_topk` parity).
    */
  private def cosineNearDupOracle: String =
    s"""WITH $cosineNearDupBaseCte
       |SELECT DISTINCT vec_a, vec_b, cos_sim FROM p
       |WHERE cos_sim >= 0.2
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Oracle for [[graft.operators.Similarity.semanticGroups]]: the
    * LSH candidate pairs above, closed transitively by a recursive
    * CTE with group id = min reachable vec (the Hash-Min fixpoint).
    */
  private def semanticGroupsOracle: String =
    s"""WITH RECURSIVE $cosineNearDupBaseCte,
       |nd AS (SELECT DISTINCT vec_a, vec_b FROM p WHERE cos_sim >= 0.2),
       |edges AS (SELECT vec_a AS a, vec_b AS nb FROM nd
       |          UNION SELECT vec_b, vec_a FROM nd),
       |reach(a, nb) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
       |  UNION
       |  SELECT r.a, e.nb FROM reach r JOIN edges e ON r.nb = e.a
       |)
       |SELECT a AS vec_id, min(nb) AS group_id FROM reach GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracle for [[graft.operators.Similarity.randomProjection]] — the
    * same splitmix matrix (offset plane ids 1000+) as SQL literals;
    * term sums are left-associative in both engines, so the fold
    * order matches Spark's sequential `aggregate` exactly.
    */
  private def randomProjectionOracle: String = {
    val outDim = 8; val dim = 64
    import graft.functions.HyperplaneSignature.comp
    val cols = (0 until outDim).map { k =>
      val dot = (0 until dim).map(j => s"v[${j + 1}]*(${comp(1000 + k, j)})").mkString(" + ")
      s"round($dot, 6) AS p$k"
    }.mkString(",\n       ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT vec_id,
       |       $cols
       |FROM e ORDER BY vec_id""".stripMargin
  }

  /** Oracle for [[graft.operators.Dedup.connectedGroups]] over the md5
    * SimHash near-dup pairs: transitive closure via a recursive CTE,
    * group id = min reachable doc (exactly the Hash-Min fixpoint).
    */
  /** The simhash-band → reachability chain shared by the CC oracles:
    * ends with a `grp(doc_id, group_id)` CTE (must be opened with
    * WITH RECURSIVE).
    */
  private def groupsMd5Ctes: String =
    s"""$simhashMd5Cte,
       |bands AS (SELECT doc_id, simhash32, CAST(band_idx AS INTEGER) AS band_idx,
       |             (simhash32 >> CAST(band_idx * 8 AS INTEGER)) & 255 AS band_bits
       |      FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS band_idx) bi),
       |nd AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |       FROM bands x JOIN bands y USING (band_idx, band_bits)
       |       WHERE x.doc_id < y.doc_id AND bit_count(xor(x.simhash32, y.simhash32)) <= 3),
       |edges AS (SELECT doc_a AS a, doc_b AS nb FROM nd UNION SELECT doc_b, doc_a FROM nd),
       |reach(a, nb) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n
       |  UNION
       |  SELECT r.a, e.nb FROM reach r JOIN edges e ON r.nb = e.a
       |),
       |grp AS (SELECT a AS doc_id, min(nb) AS group_id FROM reach GROUP BY 1)""".stripMargin

  private def groupsMd5Oracle: String =
    s"""WITH RECURSIVE $groupsMd5Ctes
       |SELECT doc_id, group_id FROM grp ORDER BY doc_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approx / non-relational
    * ops) fall back to the driver's rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    // --- TPC-H optimizer-breadth shapes: oracles keep the CLASSIC
    // correlated/subquery formulations where the Spark side is
    // hand-decorrelated, so DuckDB's own planner cross-checks the
    // rewrite rather than replaying our plan ---
    "q2_min_cost_supp" ->
      """WITH cost AS (SELECT l_partkey, l_suppkey,
        |                     min(l_extendedprice / l_quantity) AS cost
        |              FROM lineitem GROUP BY 1, 2),
        |euro AS (SELECT s_suppkey, s_name, n_name FROM supplier
        |         JOIN nation ON s_nationkey = n_nationkey
        |         JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |cand AS (SELECT p_partkey, p_brand, s_name, n_name, cost FROM part
        |         JOIN cost ON p_partkey = l_partkey
        |         JOIN euro ON l_suppkey = s_suppkey
        |         WHERE p_type = 'SMALL' AND p_size <= 10)
        |SELECT p_partkey, p_brand, s_name, n_name,
        |       CAST(round(CAST(cost AS DECIMAL(20,10)), 4) AS DOUBLE) AS cost
        |FROM cand
        |WHERE cost = (SELECT min(cost) FROM cand c2 WHERE c2.p_partkey = cand.p_partkey)
        |ORDER BY p_partkey, s_name""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
        |         (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01') t
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT o_year,
        |       round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
        |             / sum(volume), 6) AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |             l_extendedprice * (1 - l_discount) AS volume,
        |             n2.n_name AS nation
        |      FROM lineitem JOIN part ON l_partkey = p_partkey
        |      JOIN orders ON l_orderkey = o_orderkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |      JOIN region ON n1.n_regionkey = r_regionkey
        |      JOIN supplier ON l_suppkey = s_suppkey
        |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |        AND o_orderdate >= TIMESTAMP '1996-01-01'
        |        AND o_orderdate < TIMESTAMP '1998-01-01') t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_product_profit" ->
      """SELECT nation, o_year,
        |       round(CAST(sum(CAST(amount AS DECIMAL(28,8))) AS DOUBLE), 2) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         l_extendedprice * (1 - l_discount)
        |           - p_retailprice * l_quantity * 0.1 AS amount
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%widget%') t
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       round(c_acctbal, 2) AS c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q11_balance_concentration" ->
      """SELECT n_name, round(sum(s_acctbal), 2) AS nation_balance
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1
        |HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) * 0.05 FROM supplier)
        |ORDER BY nation_balance DESC, n_name""".stripMargin,
    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |                              THEN l_extendedprice * (1 - l_discount)
        |                              ELSE 0 END)
        |             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |             FROM lineitem
        |             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |               AND l_shipdate < TIMESTAMP '1996-04-01'
        |             GROUP BY 1)
        |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_cnt_sql" ->
      """SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       round(o_totalprice, 2) AS o_totalprice, round(sum_qty, 2) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
        |      GROUP BY 1 HAVING sum(l_quantity) > 300) b
        |  ON o_orderkey = b.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_disjunctive" ->
      """SELECT round(coalesce(sum(l_extendedprice * (1 - l_discount)), 0), 2) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_nested_in" ->
      """SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey < 2
        |  AND s_suppkey IN (SELECT l_suppkey FROM lineitem
        |                    JOIN part ON l_partkey = p_partkey
        |                    WHERE p_name LIKE 'red%'
        |                    GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 90)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_dormant_customers" ->
      """SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal FROM (
        |  SELECT c_custkey % 7 AS cntrycode, c_acctbal FROM customer
        |  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_priority_by_flag" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
        |    AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "ev_user_gaps" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events),
        |g AS (SELECT user_id,
        |             ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |                                      ORDER BY ts_us, event_id) AS gap_us
        |      FROM t)
        |SELECT user_id, count(*) AS n_gaps, max(gap_us) AS max_gap_us,
        |       round(avg(CAST(gap_us AS DOUBLE)), 2) AS mean_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pareto_share" ->
      """WITH pc AS (SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY 1),
        |r AS (SELECT o_custkey, rev,
        |        CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS INTEGER) AS rnk,
        |        sum(rev) OVER (ORDER BY rev DESC, o_custkey
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |      FROM pc)
        |SELECT rnk, o_custkey, round(rev, 2) AS rev,
        |       round(cum_rev / (SELECT sum(rev) FROM pc), 6) AS cum_share
        |FROM r WHERE rnk <= 25 ORDER BY rnk""".stripMargin,
    "ev_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |            FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |wd AS (SELECT DISTINCT user_id, day + d AS day
        |       FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS d) ds),
        |wau AS (SELECT day, count(*) AS wau FROM wd GROUP BY 1)
        |SELECT day, dau, wau, round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    "q_column_profile" ->
      """WITH s AS (
        |  SELECT 'l_orderkey' AS col_name, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
        |  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
        |  UNION ALL SELECT 'l_shipdate', CAST(l_shipdate AS VARCHAR) FROM lineitem)
        |SELECT col_name, count(*) AS n_rows, count(v) AS n_nonnull,
        |       count(DISTINCT v) AS n_distinct, min(v) AS min_v, max(v) AS max_v
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_salted" ->
      """SELECT s_nationkey, count(*) AS n_lines,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_anomaly_zscore" ->
      """WITH h AS (
        |  SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, hour_us, n,
        |         avg(n) OVER (PARTITION BY event_type) AS mean_n,
        |         stddev_samp(n) OVER (PARTITION BY event_type) AS sd_n
        |  FROM h)
        |SELECT event_type, hour_us, n, round(mean_n, 4) AS mean_n,
        |       round((n - mean_n) / sd_n, 4) AS zscore
        |FROM s
        |WHERE sd_n > 0 AND abs(round((n - mean_n) / sd_n, 4)) >= 2.0
        |ORDER BY event_type, hour_us""".stripMargin,
    // Misra-Gries with capacity >= |distinct users| is exact, so the
    // plain exact-count SQL pins the whole summary/merge path.
    "ev_heavy_hitters" ->
      """SELECT user_id, count(*) AS est_n FROM events
        |GROUP BY user_id HAVING count(*) >= 80
        |ORDER BY est_n DESC, user_id""".stripMargin,
    "dedup_passage_stats" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c0 AS (SELECT doc_id, ws,
        |         unnest(range(0, CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS i
        |       FROM w),
        |c AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
        |        array_to_string(ws[CAST(i*8+1 AS INTEGER):CAST(i*8+8 AS INTEGER)], ' ') AS chunk
        |      FROM c0)
        |SELECT chunk, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
        |       min(doc_id) AS first_doc
        |FROM c GROUP BY chunk HAVING count(DISTINCT doc_id) > 1
        |ORDER BY chunk""".stripMargin,
    "dedup_passage_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c0 AS (SELECT doc_id, ws,
        |         unnest(range(0, CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS i
        |       FROM w),
        |c AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
        |        array_to_string(ws[CAST(i*8+1 AS INTEGER):CAST(i*8+8 AS INTEGER)], ' ') AS chunk
        |      FROM c0),
        |o AS (SELECT doc_id, i, chunk,
        |        row_number() OVER (PARTITION BY chunk ORDER BY doc_id, i) AS rn
        |      FROM c)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY i), '') AS text_clean,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  count(*) AS n_total
        |FROM o GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_passage_rate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c0 AS (SELECT doc_id, ws,
        |         unnest(range(0, CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS i
        |       FROM w),
        |c AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
        |        array_to_string(ws[CAST(i*8+1 AS INTEGER):CAST(i*8+8 AS INTEGER)], ' ') AS chunk
        |      FROM c0),
        |o AS (SELECT doc_id, count(*) OVER (PARTITION BY chunk) AS n_occ FROM c)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  round(CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
        |    AS dup_rate
        |FROM o GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "sim_knn_graph" ->
      """WITH s AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE CAST(CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100
        |        AS INTEGER) < 25),
        |p AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
        |             round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |      FROM s a CROSS JOIN s b WHERE a.vec_id <> b.vec_id),
        |r AS (SELECT qid, cid, cos_sim,
        |             CAST(row_number() OVER (PARTITION BY qid
        |                  ORDER BY cos_sim DESC, cid) AS INTEGER) AS rnk
        |      FROM p)
        |SELECT qid, rnk, cid, cos_sim FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    "sim_cosine_neardup" -> cosineNearDupOracle,
    "sim_threshold_sweep" -> thresholdSweepOracle,
    "sim_semantic_groups" -> semanticGroupsOracle,
    "sim_random_projection" -> randomProjectionOracle,
    // IVF with seed centroids (iters=0): index build (argmax cell per
    // vector), probe (top-4 cells per query) and in-cell search all
    // re-derived relationally; list_cosine_similarity ↔ graft_cosine
    // parity is the same contract sim_cosine_neardup already pins
    "sim_ivf_topk_seed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS centroid
        |          FROM e WHERE vec_id < 16),
        |assigned AS (
        |  SELECT vec_id, cell_id, v FROM (
        |    SELECT e.vec_id, c.cell_id, e.v,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell_id) AS rn
        |    FROM e CROSS JOIN cents c) t WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |probes AS (
        |  SELECT qid, qv, cell_id FROM (
        |    SELECT q.qid, q.qv, c.cell_id,
        |           row_number() OVER (PARTITION BY q.qid
        |             ORDER BY list_cosine_similarity(q.qv, c.centroid) DESC, c.cell_id) AS rn
        |    FROM q CROSS JOIN cents c) t WHERE rn <= 4),
        |scored AS (
        |  SELECT p.qid, a.vec_id AS cid,
        |         round(list_cosine_similarity(p.qv, a.v), 6) AS cos_sim
        |  FROM probes p JOIN assigned a USING (cell_id)
        |  WHERE p.qid <> a.vec_id)
        |SELECT qid, CAST(rnk AS INTEGER) AS rnk, cid, cos_sim FROM (
        |  SELECT qid, cid, cos_sim,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rnk
        |  FROM scored) t
        |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // the IVF-vs-exact recall composition, both legs re-derived
    // relationally and joined — hash-checks the eval loop end-to-end
    "sim_ivf_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS centroid
        |          FROM e WHERE vec_id < 16),
        |assigned AS (
        |  SELECT vec_id, cell_id, v FROM (
        |    SELECT e.vec_id, c.cell_id, e.v,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell_id) AS rn
        |    FROM e CROSS JOIN cents c) t WHERE rn = 1),
        |qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |probes AS (
        |  SELECT qid, qv, cell_id FROM (
        |    SELECT qs.qid, qs.qv, c.cell_id,
        |           row_number() OVER (PARTITION BY qs.qid
        |             ORDER BY list_cosine_similarity(qs.qv, c.centroid) DESC, c.cell_id) AS rn
        |    FROM qs CROSS JOIN cents c) t WHERE rn <= 4),
        |iscored AS (
        |  SELECT p.qid, a.vec_id AS cid,
        |         round(list_cosine_similarity(p.qv, a.v), 6) AS cos_sim
        |  FROM probes p JOIN assigned a USING (cell_id)
        |  WHERE p.qid <> a.vec_id),
        |ivf AS (SELECT qid, cid FROM (
        |          SELECT qid, cid,
        |                 row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rnk
        |          FROM iscored) t WHERE rnk <= 5),
        |bscored AS (
        |  SELECT qs.qid, c2.vec_id AS cid,
        |         round(list_cosine_similarity(qs.qv, c2.v), 6) AS cos_sim
        |  FROM qs CROSS JOIN e c2 WHERE qs.qid <> c2.vec_id),
        |bf AS (SELECT qid, cid FROM (
        |         SELECT qid, cid,
        |                row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rnk
        |         FROM bscored) t WHERE rnk <= 5),
        |hits AS (SELECT bf.qid, count(*) AS n_hits
        |         FROM bf JOIN ivf USING (qid, cid) GROUP BY 1)
        |SELECT q2.qid, coalesce(n_hits, 0) AS n_hits,
        |       round(CAST(coalesce(n_hits, 0) AS DOUBLE) / 5, 6) AS recall
        |FROM (SELECT DISTINCT qid FROM bf) q2 LEFT JOIN hits USING (qid)
        |ORDER BY qid""".stripMargin,
    // relational twin of the mapPartitions language-ID fast path:
    // same trigram profile (train on doc_id%8=0, top-300 per lang by
    // cnt desc/gram asc, weight 301-rank), same argmax tiebreaks
    "text_lang_id_rel" ->
      s"""WITH $langIdRelChain
        |SELECT doc_id, true_lang, pred_lang, score FROM pred
        |ORDER BY doc_id""".stripMargin,
    // the classifier chain's holdout predictions × the labeled lang
    "text_lang_confusion" ->
      s"""WITH $langIdRelChain
        |SELECT true_lang, pred_lang, count(*) AS n,
        |       CAST(max(CASE WHEN true_lang = pred_lang THEN 1 ELSE 0 END) AS BIGINT)
        |         AS correct
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_minhash_md5" -> minhashMd5Oracle,
    "dedup_minhash_est_error" -> minhashEstErrorOracle,
    "dedup_pagerank" -> pagerankOracle(),
    "dedup_triangles" -> trianglesOracle,
    "dedup_degree_hist" ->
      s"""WITH $jaccardPairsCte,
         |e AS (SELECT doc_a AS node FROM pp UNION ALL SELECT doc_b FROM pp),
         |d AS (SELECT node, count(*) AS deg FROM e GROUP BY 1)
         |SELECT deg, count(*) AS n_nodes FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // band-bucket histogram over the UNCAPPED banded table `b` of the
    // shared minhash CTE chain (the unused `pairs` CTE is inert)
    "dedup_band_histogram" ->
      s"""WITH ${minhashPairCtes("documents")},
         |bs AS (SELECT band_idx, band_key, count(*) AS bucket_size FROM b GROUP BY 1,2)
         |SELECT bucket_size, count(*) AS n_buckets,
         |       CAST(count(*) * bucket_size * (bucket_size - 1) // 2 AS BIGINT) AS cand_pairs
         |FROM bs GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_source_matrix" ->
      s"""WITH ${minhashPairCtes("documents")},
         |nd AS (SELECT doc_a, doc_b, ej FROM (
         |  SELECT doc_a, doc_b,
         |         round(len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0, 6) AS ej
         |  FROM pairs) q WHERE ej >= 0.5),
         |m AS (SELECT least(da.source, db.source) AS source_x,
         |             greatest(da.source, db.source) AS source_y, nd.ej
         |      FROM nd JOIN documents da ON da.doc_id = nd.doc_a
         |              JOIN documents db ON db.doc_id = nd.doc_b)
         |SELECT source_x, source_y, count(*) AS n_pairs,
         |       round(avg(ej), 6) AS avg_est_jaccard
         |FROM m GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // truth chain (prefix j) and LSH candidate chain coexist in one WITH
    "dedup_lsh_recall" ->
      s"""WITH ${minhashPairCtes("documents")},
         |${jaccardPairsCtes("j")},
         |cand AS (SELECT DISTINCT doc_a, doc_b FROM pairs),
         |tr AS (SELECT doc_a, doc_b FROM jpp),
         |hit AS (SELECT count(*) AS n_found FROM tr JOIN cand USING (doc_a, doc_b)),
         |nt AS (SELECT count(*) AS n_truth FROM tr),
         |nc AS (SELECT count(*) AS n_candidates FROM cand)
         |SELECT n_truth, n_found, n_candidates,
         |       round(CAST(n_found AS DOUBLE) / n_truth, 6) AS recall
         |FROM nt CROSS JOIN hit CROSS JOIN nc""".stripMargin,
    "text_vocab_overlap" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |     sw AS (SELECT DISTINCT source, w FROM t WHERE len(w) > 0),
        |     sz AS (SELECT source, count(*) AS n_types FROM sw GROUP BY 1),
        |     ov AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
        |            FROM sw a JOIN sw b USING (w)
        |            WHERE a.source < b.source GROUP BY 1, 2)
        |SELECT source_a, source_b, n_common,
        |       round(CAST(n_common AS DOUBLE) / (za.n_types + zb.n_types - n_common), 6)
        |         AS vocab_jaccard
        |FROM ov JOIN sz za ON za.source = ov.source_a
        |        JOIN sz zb ON zb.source = ov.source_b
        |ORDER BY 1, 2""".stripMargin,
    "ev_burstiness" ->
      """WITH g AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     gaps AS (
        |  SELECT user_id,
        |         CAST(ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS DOUBLE)
        |           AS gap_us
        |  FROM g),
        |     s AS (
        |  SELECT user_id, count(*) AS n_gaps, avg(gap_us) AS mean_gap,
        |         stddev_samp(gap_us) AS sd_gap
        |  FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_gaps, round(mean_gap, 2) AS mean_gap_us,
        |       round(sd_gap / mean_gap, 6) AS burstiness_cv
        |FROM s WHERE n_gaps >= 2 AND mean_gap > 0 ORDER BY user_id""".stripMargin,
    // per-doc symbol-density score ('g' flag: DuckDB replaces first
    // match by default, Spark replaces all)
    "text_code_detect" ->
      """WITH s AS (
        |  SELECT source,
        |         round(CAST(length(text) -
        |               length(regexp_replace(text, '[{}\[\]();=<>#|&*_]', '', 'g')) AS DOUBLE)
        |               / length(text), 6) AS code_score
        |  FROM documents WHERE length(text) > 0)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN code_score >= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_code_like,
        |       round(CAST(sum(CASE WHEN code_score >= 0.05 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS code_share,
        |       round(avg(code_score), 6) AS avg_code_score
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // RE2-safe pre-tokenizer: letter/digit/punct runs — disjoint
    // character classes, so Java and RE2 split identically
    "text_token_count" ->
      """WITH t AS (
        |  SELECT source,
        |         len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+')) AS n_tok,
        |         len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS n_words
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(n_words) AS BIGINT) AS n_words,
        |       round(CAST(sum(n_tok) AS DOUBLE) / sum(n_words), 6) AS tokens_per_word
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_error_rate" ->
      """WITH h AS (
        |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS hour_us,
        |         count(*) AS n_events,
        |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
        |  FROM events GROUP BY 1)
        |SELECT hour_us, n_events, CAST(n_errors AS BIGINT) AS n_errors,
        |       round(CAST(n_errors AS DOUBLE) / n_events, 6) AS error_rate
        |FROM h ORDER BY hour_us""".stripMargin,
    // the backward as-of chain + broadcast segment dim + per-segment rollup
    "ev_funnel_by_segment" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     lastv AS (
        |  SELECT p.event_id, p.user_id, p.ts_us, max(v.ts_us) AS last_view_us
        |  FROM e p LEFT JOIN e v
        |    ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |  WHERE p.event_type = 'purchase'
        |  GROUP BY 1, 2, 3)
        |SELECT c_mktsegment, count(*) AS n_purchases,
        |       CAST(coalesce(sum(CASE WHEN last_view_us IS NOT NULL
        |                               AND ts_us - last_view_us <= 3600000000
        |                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_converted,
        |       round(CAST(sum(CASE WHEN last_view_us IS NOT NULL
        |                            AND ts_us - last_view_us <= 3600000000
        |                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |         AS conversion
        |FROM lastv JOIN customer ON c_custkey = user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_split_drift" ->
      """WITH x AS (SELECT vec_id % 10 < 8 AS is_train,
        |                  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     d AS (SELECT is_train, CAST(i - 1 AS INTEGER) AS dim, v[CAST(i AS INTEGER)] AS x
        |           FROM x CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx)
        |SELECT dim,
        |       round(avg(CASE WHEN is_train THEN x END), 6) AS train_mean,
        |       round(avg(CASE WHEN NOT is_train THEN x END), 6) AS holdout_mean,
        |       round(abs(avg(CASE WHEN is_train THEN x END) -
        |                 avg(CASE WHEN NOT is_train THEN x END)), 6) AS mean_gap
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // truncated-horizon EWMA; weights are driver-computed literals
    // (exact dyadic rationals for decay=0.75) shared with the Spark
    // side via EventOps.ewmaWeights, so no pow() runs in either engine
    "ev_ewma_daily" -> {
      val weights = graft.operators.EventOps.ewmaWeights(14, 0.75)
        .map { case (o, w) => s"($o, CAST('$w' AS DOUBLE))" }.mkString(", ")
      s"""WITH daily AS (
         |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, count(*) AS n
         |  FROM events GROUP BY 1),
         |o AS (SELECT * FROM (VALUES $weights) v(o, w)),
         |m AS (SELECT min(day) AS min_day FROM daily),
         |g AS (
         |  SELECT d.day, o.o, o.w, coalesce(l.n, 0) AS n0
         |  FROM daily d CROSS JOIN o CROSS JOIN m
         |  LEFT JOIN daily l ON l.day = d.day - o.o
         |  WHERE d.day - o.o >= m.min_day)
         |SELECT day, CAST(sum(CASE WHEN o = 0 THEN n0 END) AS BIGINT) AS n,
         |       round(sum(w * n0) / sum(w), 6) AS ewma
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // same rule expressions as TextAnalysis.gopherRules; keep is
    // decided on the unrounded ratios in both engines
    "text_gopher_rules" -> {
      val stop = graft.operators.TextAnalysis.gopherStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH w AS (SELECT doc_id,
         |                  list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
         |           FROM documents),
         |s AS (SELECT doc_id,
         |             len(ws) AS n_words,
         |             CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS sum_len,
         |             len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         |             len(list_filter(ws, x -> list_contains([$stop], x))) AS n_stop
         |      FROM w)
         |SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
         |       CASE WHEN n_words > 0
         |            THEN round(CAST(sum_len AS DOUBLE) / n_words, 4) END AS mean_word_len,
         |       CASE WHEN n_words > 0
         |            THEN round(CAST(n_alpha AS DOUBLE) / n_words, 6) END AS frac_alpha,
         |       CAST(n_stop AS INTEGER) AS n_stop,
         |       (n_words >= 5 AND n_words <= 100000 AND
         |        CAST(sum_len AS DOUBLE) / n_words >= 3.0 AND
         |        CAST(sum_len AS DOUBLE) / n_words <= 10.0 AND
         |        CAST(n_alpha AS DOUBLE) / n_words >= 0.8 AND
         |        n_stop >= 2) AS keep
         |FROM s ORDER BY doc_id""".stripMargin
    },
    // divisors×levels s-curve grid; both engines compute the same
    // power() arithmetic over the same literal grid
    "dedup_band_plan" ->
      """WITH b AS (SELECT CAST(range AS INTEGER) AS b FROM range(1, 65)
        |           WHERE 64 % range = 0),
        |j AS (SELECT CAST(unnest([0.5, 0.7, 0.8, 0.9, 0.95]) AS DOUBLE) AS jaccard),
        |g AS (SELECT b, CAST(64 // b AS INTEGER) AS r, jaccard FROM b CROSS JOIN j)
        |SELECT b, r,
        |       round(power(1.0 / b, 1.0 / r), 6) AS threshold,
        |       jaccard,
        |       round(1.0 - power(1.0 - power(jaccard, r), b), 6) AS p_candidate
        |FROM g ORDER BY b, jaccard""".stripMargin,
    // full-dim truth top-5 vs first-32-dims top-5, overlap per query
    "sim_trunc_recall" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |sf AS (SELECT qid, cid, round(list_cosine_similarity(qv, cv), 6) AS cs
        |       FROM q CROSS JOIN c WHERE qid <> cid),
        |tf AS (SELECT qid, cid FROM (
        |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |                ORDER BY cs DESC, cid) AS rnk FROM sf) WHERE rnk <= 5),
        |st AS (SELECT qid, cid, round(list_cosine_similarity(qv[1:32], cv[1:32]), 6) AS cs
        |       FROM q CROSS JOIN c WHERE qid <> cid),
        |tt AS (SELECT qid, cid FROM (
        |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |                ORDER BY cs DESC, cid) AS rnk FROM st) WHERE rnk <= 5),
        |ov AS (SELECT qid, count(*) AS n_overlap FROM tf JOIN tt USING (qid, cid)
        |       GROUP BY 1)
        |SELECT qid, CAST(coalesce(n_overlap, 0) AS INTEGER) AS n_overlap,
        |       round(CAST(coalesce(n_overlap, 0) AS DOUBLE) / 5, 6) AS recall
        |FROM (SELECT DISTINCT qid FROM q) qq LEFT JOIN ov USING (qid)
        |ORDER BY qid""".stripMargin,
    // seed-centroid IVF probe sweep: candidates carry the probe rank
    // of their cell; levels grid replays the ranking per nProbe
    "sim_probe_sweep" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS centroid
        |          FROM e WHERE vec_id < 16),
        |assigned AS (
        |  SELECT vec_id, cell_id, v FROM (
        |    SELECT e.vec_id, c.cell_id, e.v,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell_id) AS rn
        |    FROM e CROSS JOIN cents c) t WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |pr AS (
        |  SELECT qid, qv, cell_id, rn AS probe_rn FROM (
        |    SELECT q.qid, q.qv, c.cell_id,
        |           row_number() OVER (PARTITION BY q.qid
        |             ORDER BY list_cosine_similarity(q.qv, c.centroid) DESC, c.cell_id) AS rn
        |    FROM q CROSS JOIN cents c) t WHERE rn <= 8),
        |scored AS (
        |  SELECT p.qid, a.vec_id AS cid, p.probe_rn,
        |         round(list_cosine_similarity(p.qv, a.v), 6) AS cos_sim
        |  FROM pr p JOIN assigned a USING (cell_id)
        |  WHERE p.qid <> a.vec_id),
        |lv AS (SELECT CAST(unnest([1, 2, 4, 8]) AS INTEGER) AS n_probe),
        |cand AS (SELECT lv.n_probe, s.qid, s.cid, s.cos_sim
        |         FROM scored s JOIN lv ON s.probe_rn <= lv.n_probe),
        |ivf AS (SELECT n_probe, qid, cid FROM (
        |          SELECT n_probe, qid, cid,
        |                 row_number() OVER (PARTITION BY n_probe, qid
        |                   ORDER BY cos_sim DESC, cid) AS rnk
        |          FROM cand) t WHERE rnk <= 5),
        |sf AS (SELECT q.qid, e.vec_id AS cid,
        |              round(list_cosine_similarity(q.qv, e.v), 6) AS cs
        |       FROM q CROSS JOIN e WHERE q.qid <> e.vec_id),
        |truth AS (SELECT qid, cid FROM (
        |            SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |                   ORDER BY cs DESC, cid) AS rnk FROM sf) t WHERE rnk <= 5),
        |hits AS (SELECT n_probe, qid, count(*) AS n_hit
        |         FROM ivf JOIN truth USING (qid, cid) GROUP BY 1, 2),
        |nc AS (SELECT n_probe, qid, count(*) AS n_candidates FROM cand GROUP BY 1, 2)
        |SELECT lv.n_probe, q.qid,
        |       CAST(coalesce(nc.n_candidates, 0) AS BIGINT) AS n_candidates,
        |       CAST(coalesce(h.n_hit, 0) AS INTEGER) AS n_hit,
        |       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5, 6) AS recall
        |FROM lv CROSS JOIN q
        |LEFT JOIN nc ON nc.n_probe = lv.n_probe AND nc.qid = q.qid
        |LEFT JOIN hits h ON h.n_probe = lv.n_probe AND h.qid = q.qid
        |ORDER BY lv.n_probe, q.qid""".stripMargin,
    // own-centroid vs best-other-centroid margin on the rounded
    // label-centroid table (same cent CTE as sim_outliers)
    "sim_label_margin" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (
        |  SELECT label, list(mean_v ORDER BY pos) AS centroid FROM (
        |    SELECT label, pos, round(avg(v), 6) AS mean_v FROM (
        |      SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
        |             generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings) u
        |    GROUP BY 1, 2) t
        |  GROUP BY label),
        |s AS (SELECT e.vec_id, e.label, c.label AS cl,
        |             list_cosine_similarity(e.v, c.centroid) AS sim
        |      FROM e CROSS JOIN cent c)
        |SELECT vec_id, label,
        |       round(max(CASE WHEN cl = label THEN sim END), 6) AS own_sim,
        |       round(max(CASE WHEN cl <> label THEN sim END), 6) AS best_other_sim,
        |       round(max(CASE WHEN cl = label THEN sim END) -
        |             max(CASE WHEN cl <> label THEN sim END), 6) AS margin
        |FROM s GROUP BY 1, 2 ORDER BY vec_id""".stripMargin,
    "text_lang_source_mix" ->
      """WITH cells AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY 1, 2),
        |totals AS (SELECT source, sum(n_docs) AS n_src FROM cells GROUP BY 1)
        |SELECT c.source, c.lang, c.n_docs, c.n_chars,
        |       round(CAST(c.n_docs AS DOUBLE) / t.n_src, 6) AS share
        |FROM cells c JOIN totals t USING (source)
        |ORDER BY c.source, c.lang""".stripMargin,
    // session chain (same CTEs as ev_sessionize) → first-3-steps path
    // string, (ts, type)-ordered so tied timestamps are deterministic
    "ev_session_paths" ->
      """WITH g AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, event_type, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, event_type, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked),
        |p AS (
        |  SELECT user_id, session_id,
        |         array_to_string(list(event_type ORDER BY ts_us, event_type)[1:3], '>') AS path
        |  FROM sess GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // per-hour-of-week median/MAD baseline (same conventions as
    // ev_anomaly_mad, grouped by the 168-slot weekly index)
    "ev_seasonal_anomaly" ->
      """WITH h AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_idx, count(*) AS n
        |  FROM events GROUP BY 1),
        |hh AS (SELECT hour_idx, n, hour_idx % 168 AS how FROM h),
        |med AS (SELECT how, quantile_cont(n, 0.5) AS med_n FROM hh GROUP BY 1),
        |mad AS (SELECT hh.how, quantile_cont(abs(n - med_n), 0.5) AS mad_n
        |        FROM hh JOIN med USING (how) GROUP BY 1)
        |SELECT hour_idx * 3600000000 AS hour_us, hh.how, n,
        |       round(med_n, 4) AS med_n,
        |       round(abs(n - med_n) / (1.4826 * mad_n), 4) AS robust_score
        |FROM hh JOIN med USING (how) JOIN mad USING (how)
        |WHERE mad_n > 0 AND abs(n - med_n) > 3.0 * 1.4826 * mad_n
        |ORDER BY hour_us""".stripMargin,
    // gopher keep flag × exact-digest dup membership, two-row rollup
    "text_quality_vs_dup" -> {
      val stop = graft.operators.TextAnalysis.gopherStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH w AS (SELECT doc_id,
         |                  list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
         |           FROM documents),
         |s AS (SELECT doc_id,
         |             len(ws) AS n_words,
         |             CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS sum_len,
         |             len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         |             len(list_filter(ws, x -> list_contains([$stop], x))) AS n_stop
         |      FROM w),
         |k AS (SELECT doc_id,
         |             (n_words >= 5 AND n_words <= 100000 AND
         |              CAST(sum_len AS DOUBLE) / n_words >= 3.0 AND
         |              CAST(sum_len AS DOUBLE) / n_words <= 10.0 AND
         |              CAST(n_alpha AS DOUBLE) / n_words >= 0.8 AND
         |              n_stop >= 2) AS keep
         |      FROM s),
         |dg AS (SELECT doc_id, md5(text) AS digest FROM documents),
         |cnt AS (SELECT digest, count(*) AS n_copies FROM dg GROUP BY 1),
         |fl AS (SELECT dg.doc_id, cnt.n_copies > 1 AS is_dup
         |       FROM dg JOIN cnt USING (digest))
         |SELECT k.keep, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN fl.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |       round(CAST(sum(CASE WHEN fl.is_dup THEN 1 ELSE 0 END) AS DOUBLE)
         |             / count(*), 6) AS dup_rate
         |FROM k JOIN fl USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // 3 unrolled peel rounds over the shared jaccard pair graph —
    // the fixed-iteration convention of the pagerank oracle
    "dedup_kcore" ->
      s"""WITH $jaccardPairsCte,
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM pp
         |      UNION ALL SELECT doc_b, doc_a FROM pp),
         |n0 AS (SELECT DISTINCT src AS node FROM e),
         |d1 AS (SELECT e.src AS node, count(*) AS deg
         |       FROM e JOIN n0 a ON e.src = a.node JOIN n0 b ON e.dst = b.node
         |       GROUP BY 1),
         |w1 AS (SELECT n0.node, coalesce(d1.deg, 0) AS deg FROM n0 LEFT JOIN d1 USING (node)),
         |n1 AS (SELECT node FROM w1 WHERE deg >= 2),
         |d2 AS (SELECT e.src AS node, count(*) AS deg
         |       FROM e JOIN n1 a ON e.src = a.node JOIN n1 b ON e.dst = b.node
         |       GROUP BY 1),
         |w2 AS (SELECT n1.node, coalesce(d2.deg, 0) AS deg FROM n1 LEFT JOIN d2 USING (node)),
         |n2 AS (SELECT node FROM w2 WHERE deg >= 2),
         |d3 AS (SELECT e.src AS node, count(*) AS deg
         |       FROM e JOIN n2 a ON e.src = a.node JOIN n2 b ON e.dst = b.node
         |       GROUP BY 1),
         |w3 AS (SELECT n2.node, coalesce(d3.deg, 0) AS deg FROM n2 LEFT JOIN d3 USING (node)),
         |n3 AS (SELECT node FROM w3 WHERE deg >= 2)
         |SELECT node, CAST(peeled_round AS INTEGER) AS peeled_round FROM (
         |  SELECT node, 1 AS peeled_round FROM w1 WHERE deg < 2
         |  UNION ALL SELECT node, 2 FROM w2 WHERE deg < 2
         |  UNION ALL SELECT node, 3 FROM w3 WHERE deg < 2
         |  UNION ALL SELECT node, 0 FROM n3) t
         |ORDER BY node""".stripMargin,
    // dense days×types grid; zero-variance series filtered on the
    // exact stddev=0 predicate BEFORE corr's NaN/NULL conventions
    "ev_metric_corr" ->
      """WITH daily AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM daily),
        |types AS (SELECT DISTINCT event_type FROM daily),
        |grid AS (SELECT d.day, t.event_type, CAST(coalesce(x.n, 0) AS DOUBLE) AS n
        |         FROM days d CROSS JOIN types t
        |         LEFT JOIN daily x ON x.day = d.day AND x.event_type = t.event_type),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |             count(*) AS n_days,
        |             stddev_samp(a.n) AS sa, stddev_samp(b.n) AS sb,
        |             corr(a.n, b.n) AS r
        |      FROM grid a JOIN grid b ON a.day = b.day AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, n_days, round(r, 6) AS corr FROM p
        |WHERE sa > 0 AND sb > 0 ORDER BY 1, 2""".stripMargin,
    // session chain + lead on the same (ts, type)-deterministic order
    "ev_dwell_time" ->
      """WITH g AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, event_type, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, event_type, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked),
        |l AS (SELECT event_type, ts_us,
        |             lead(ts_us) OVER (PARTITION BY user_id, session_id
        |                               ORDER BY ts_us, event_type) AS next_us
        |      FROM sess)
        |SELECT event_type, count(*) AS n,
        |       round(avg(next_us - ts_us), 4) AS avg_dwell_us,
        |       quantile_cont(next_us - ts_us, 0.5) AS p50_dwell_us
        |FROM l WHERE next_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_word_burstiness" ->
      """WITH wd AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |            FROM documents),
        |c AS (SELECT word, doc_id, count(*) AS c FROM wd
        |      WHERE length(word) > 0 GROUP BY 1, 2),
        |a AS (SELECT word, CAST(sum(c) AS BIGINT) AS cf, count(*) AS df FROM c GROUP BY 1)
        |SELECT word, cf, df, round(CAST(cf AS DOUBLE) / df, 6) AS burst
        |FROM a ORDER BY cf DESC, word LIMIT 30""".stripMargin,
    // distinct (type, user) sets → pairwise Jaccard; grid join
    // restores zero-intersection pairs
    "ev_user_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |sz AS (SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1),
        |inter AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_common
        |  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT a.event_type AS type_a, a.n_users AS n_a,
        |         b.event_type AS type_b, b.n_users AS n_b
        |  FROM sz a CROSS JOIN sz b WHERE a.event_type < b.event_type)
        |SELECT g.type_a, g.type_b, g.n_a, g.n_b,
        |       coalesce(i.n_common, 0) AS n_common,
        |       round(CAST(coalesce(i.n_common, 0) AS DOUBLE) /
        |             (g.n_a + g.n_b - coalesce(i.n_common, 0)), 6) AS jaccard
        |FROM grid g LEFT JOIN inter i
        |  ON i.type_a = g.type_a AND i.type_b = g.type_b
        |ORDER BY g.type_a, g.type_b""".stripMargin,
    // seed-centroid assignment (same CTE as sim_ivf_topk_seed) → cell
    // counts with share and load factor
    "sim_cell_balance" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS centroid
        |          FROM e WHERE vec_id < 16),
        |assigned AS (
        |  SELECT vec_id, cell_id FROM (
        |    SELECT e.vec_id, c.cell_id,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cell_id) AS rn
        |    FROM e CROSS JOIN cents c) t WHERE rn = 1),
        |counts AS (SELECT cell_id, count(*) AS n_vectors FROM assigned GROUP BY 1),
        |tot AS (SELECT sum(n_vectors) AS total FROM counts)
        |SELECT cell_id, n_vectors,
        |       round(CAST(n_vectors AS DOUBLE) / total, 6) AS share,
        |       round(CAST(n_vectors AS DOUBLE) * 16 / total, 6) AS load_factor
        |FROM counts, tot ORDER BY cell_id""".stripMargin,
    // single-aggregate entropy identity per grouping dimension
    "text_mix_diversity" ->
      """WITH l AS (SELECT lang AS k, count(*) AS n FROM documents GROUP BY 1),
        |s AS (SELECT source AS k, count(*) AS n FROM documents GROUP BY 1),
        |dl AS (SELECT 'lang' AS dimension, count(*) AS n_values,
        |              CAST(sum(n) AS BIGINT) AS total_docs,
        |              sum(CAST(n AS DOUBLE) * ln(n)) AS nlogn,
        |              sum(CAST(n AS DOUBLE) * n) AS nsq FROM l),
        |ds AS (SELECT 'source' AS dimension, count(*) AS n_values,
        |              CAST(sum(n) AS BIGINT) AS total_docs,
        |              sum(CAST(n AS DOUBLE) * ln(n)) AS nlogn,
        |              sum(CAST(n AS DOUBLE) * n) AS nsq FROM s),
        |u AS (SELECT * FROM dl UNION ALL SELECT * FROM ds)
        |SELECT dimension, n_values, total_docs,
        |       round(ln(total_docs) - nlogn / total_docs, 6) AS entropy,
        |       round(exp(ln(total_docs) - nlogn / total_docs), 4) AS effective_n,
        |       round(nsq / (CAST(total_docs AS DOUBLE) * total_docs), 6) AS herfindahl
        |FROM u ORDER BY dimension""".stripMargin,
    // the oracle-green minhash md5 pair chain + embedding cosine on
    // both pair ids (inner joins: pairs need vectors on both sides)
    "dedup_lex_vs_sem" ->
      s"""WITH ${minhashPairCtes("documents")},
         |p AS (SELECT doc_a, doc_b,
         |             round(len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0, 6) AS est_jaccard
         |      FROM pairs),
         |pf AS (SELECT * FROM p WHERE est_jaccard >= 0.5),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT pf.doc_a, pf.doc_b, pf.est_jaccard,
         |       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
         |FROM pf JOIN e a ON a.vec_id = pf.doc_a JOIN e b ON b.vec_id = pf.doc_b
         |ORDER BY pf.doc_a, pf.doc_b""".stripMargin,
    // deterministic fake-modality fan-out (doc_id % 3) — the
    // mm_payload_stats convention rolled to (source, media_type)
    "mm_modality_mix" ->
      """WITH m AS (SELECT source,
        |                  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |                       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |                  octet_length(encode(text)) AS n_bytes
        |           FROM documents),
        |cells AS (SELECT source, media_type, count(*) AS n_assets,
        |                 CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        |          FROM m GROUP BY 1, 2),
        |tot AS (SELECT source, sum(n_assets) AS n_src FROM cells GROUP BY 1)
        |SELECT c.source, c.media_type, c.n_assets, c.total_bytes,
        |       round(CAST(c.n_assets AS DOUBLE) / t.n_src, 6) AS share
        |FROM cells c JOIN tot t USING (source) ORDER BY 1, 2""".stripMargin,
    // per-dim variance shares + cumulative in descending-variance
    // order + participation ratio (Σλ)²/Σλ²
    "sim_effective_dims" ->
      """WITH x AS (SELECT CAST(i - 1 AS INTEGER) AS dim, v[CAST(i AS INTEGER)] AS x
        |           FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
        |           CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx),
        |vr AS (SELECT dim, var_pop(x) AS v FROM x GROUP BY 1),
        |tot AS (SELECT sum(v) AS tv, sum(v * v) AS tv2 FROM vr),
        |c AS (SELECT dim, v, sum(v) OVER (ORDER BY v DESC, dim
        |             ROWS UNBOUNDED PRECEDING) AS cum FROM vr)
        |SELECT dim, round(v, 9) AS variance,
        |       round(v / tv, 6) AS var_share,
        |       round(cum / tv, 6) AS cum_share,
        |       round(tv * tv / tv2, 4) AS participation_ratio
        |FROM c, tot ORDER BY variance DESC, dim""".stripMargin,
    // epoch-aligned weekly counts + lag against the previous OBSERVED week
    "ev_wow_growth" ->
      """WITH wk AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT week, event_type, n,
        |             lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        |      FROM wk)
        |SELECT week, event_type, n, prev_n,
        |       CASE WHEN prev_n IS NOT NULL
        |            THEN round(CAST(n - prev_n AS DOUBLE) / prev_n, 6) END AS growth
        |FROM l ORDER BY week, event_type""".stripMargin,
    // distinct (source, shingle) vocabulary → cross-source spread →
    // per-source unique-content share
    "dedup_ngram_novelty" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |shl AS (SELECT doc_id, source,
        |               list_distinct(CASE WHEN len(ws) >= 5
        |                 THEN list_transform(range(0, len(ws)-4),
        |                        i -> array_to_string(ws[CAST(i+1 AS INTEGER):CAST(i+5 AS INTEGER)], ' '))
        |                 ELSE [] END) AS shs
        |        FROM w),
        |ss AS (SELECT DISTINCT source, unnest(shs) AS sh FROM shl),
        |sp AS (SELECT sh, count(*) AS n_sources FROM ss GROUP BY 1)
        |SELECT source, count(*) AS n_shingles,
        |       CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |       round(CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS novelty
        |FROM ss JOIN sp USING (sh)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // τ=2 temperature scaling: q ∝ √p — sqrt is correctly-rounded
    // IEEE in both engines, so no pow() parity risk
    "text_temperature_weights" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS total FROM c),
        |p AS (SELECT source, n_docs,
        |             CAST(n_docs AS DOUBLE) / total AS p,
        |             sqrt(CAST(n_docs AS DOUBLE) / total) AS sp
        |      FROM c, t),
        |z AS (SELECT sum(sp) AS z FROM p)
        |SELECT source, n_docs, round(p, 6) AS p,
        |       round(sp / z, 6) AS q,
        |       round(sp / z / p, 4) AS upsample
        |FROM p, z ORDER BY source""".stripMargin,
    // session chain + per-session purchase flag folded into the same
    // grouping as ev_session_paths
    "ev_path_conversion" ->
      """WITH g AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, event_type, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, event_type, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked),
        |p AS (
        |  SELECT user_id, session_id,
        |         array_to_string(list(event_type ORDER BY ts_us, event_type)[1:3], '>') AS path,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
        |  FROM sess GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions,
        |       CAST(sum(has_purchase) AS BIGINT) AS n_converted,
        |       round(CAST(sum(has_purchase) AS DOUBLE) / count(*), 6) AS conversion
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // first-seen-week cohorts × week offsets; cumulative over the
    // ROUNDED weekly cells in deterministic offset order
    "ev_cohort_ltv" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_type, value FROM events),
        |w AS (SELECT user_id, ts_us - ts_us % 604800000000 AS week_us,
        |             event_type, value FROM e),
        |fs AS (SELECT user_id, min(week_us) AS cohort_us FROM w GROUP BY 1),
        |cells AS (
        |  SELECT cohort_us,
        |         CAST((week_us - cohort_us) // 604800000000 AS BIGINT) AS week_offset,
        |         count(*) AS n_purchases, round(sum(value), 4) AS week_value
        |  FROM w JOIN fs USING (user_id)
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT cohort_us, week_offset, n_purchases, week_value,
        |       round(sum(week_value) OVER (PARTITION BY cohort_us ORDER BY week_offset
        |             ROWS UNBOUNDED PRECEDING), 4) AS cum_value
        |FROM cells ORDER BY 1, 2""".stripMargin,
    "sim_coverage" ->
      """SELECT d.source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_with_vec,
        |       round(CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS coverage
        |FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // distinct (doc, shingle) → df per shingle → binary-digit buckets
    "dedup_shingle_df_hist" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |shl AS (SELECT doc_id,
        |               list_distinct(CASE WHEN len(ws) >= 5
        |                 THEN list_transform(range(0, len(ws)-4),
        |                        i -> array_to_string(ws[CAST(i+1 AS INTEGER):CAST(i+5 AS INTEGER)], ' '))
        |                 ELSE [] END) AS shs
        |        FROM w),
        |sh AS (SELECT DISTINCT doc_id, unnest(shs) AS sh FROM shl),
        |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
        |b AS (SELECT CAST(length(bin(df)) - 1 AS INTEGER) AS bucket FROM df),
        |tot AS (SELECT count(*) AS n_total FROM b)
        |SELECT bucket,
        |       CAST(1 AS BIGINT) << bucket AS lo_df,
        |       (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS hi_df,
        |       count(*) AS n_shingles,
        |       round(CAST(count(*) AS DOUBLE) / any_value(n_total), 6) AS share
        |FROM b, tot GROUP BY 1 ORDER BY 1""".stripMargin,
    // gaps-and-islands: island id = day − row_number, no self-join
    "ev_activity_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |g AS (SELECT user_id, day,
        |             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d),
        |runs AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, max(len) AS max_streak, count(*) AS n_streaks,
        |       CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin,
    // consecutive-purchase gaps per user → one-row cadence report
    "ev_purchase_cadence" ->
      """WITH p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |l AS (SELECT user_id, ts_us,
        |             lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_us
        |      FROM p),
        |gp AS (SELECT user_id, ts_us - prev_us AS gap_us FROM l WHERE prev_us IS NOT NULL)
        |SELECT count(*) AS n_gaps,
        |       count(DISTINCT user_id) AS n_repeat_buyers,
        |       quantile_cont(gap_us, 0.5) AS p50_gap_us,
        |       quantile_cont(gap_us, 0.9) AS p90_gap_us,
        |       min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
        |FROM gp""".stripMargin,
    // first-k-words prefix rollup with source spread, global top-20
    "text_common_openings" ->
      """WITH o AS (SELECT source,
        |                  array_to_string(string_split(text, ' ')[1:5], ' ') AS opening,
        |                  len(string_split(text, ' ')) AS n_words
        |           FROM documents)
        |SELECT opening, count(*) AS n_docs, count(DISTINCT source) AS n_sources
        |FROM o WHERE n_words >= 5
        |GROUP BY 1 ORDER BY n_docs DESC, opening LIMIT 20""".stripMargin,
    // one wide feature row per user: the proven lifecycle / entropy /
    // burstiness / streak CTE chains left-joined from the lifecycle
    // universe (sub-threshold users keep NULL cv, never drop)
    "ev_user_features" ->
      """WITH e AS (SELECT user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |life AS (
        |  SELECT user_id, count(*) AS n_events,
        |         count(DISTINCT ts_us // 86400000000) AS active_days,
        |         round(CAST(count(*) AS DOUBLE) /
        |               count(DISTINCT ts_us // 86400000000), 4) AS events_per_active_day
        |  FROM e GROUP BY 1),
        |tc AS (SELECT user_id, event_type, count(*) AS c FROM e GROUP BY 1, 2),
        |ent AS (SELECT user_id, count(*) AS n_types,
        |               round(ln(sum(c)) - sum(CAST(c AS DOUBLE) * ln(c)) / sum(c), 6)
        |                 AS type_entropy
        |        FROM tc GROUP BY 1),
        |gaps AS (
        |  SELECT user_id,
        |         CAST(ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS DOUBLE)
        |           AS gap_us
        |  FROM e),
        |bs AS (SELECT user_id, count(*) AS n_gaps, avg(gap_us) AS mean_gap,
        |              stddev_samp(gap_us) AS sd_gap
        |       FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1),
        |burst AS (SELECT user_id, round(sd_gap / mean_gap, 6) AS burstiness_cv
        |          FROM bs WHERE n_gaps >= 2 AND mean_gap > 0),
        |d AS (SELECT DISTINCT user_id, ts_us // 86400000000 AS day FROM e),
        |g AS (SELECT user_id,
        |             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d),
        |runs AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2),
        |st AS (SELECT user_id, max(len) AS max_streak FROM runs GROUP BY 1)
        |SELECT life.user_id, life.n_events, life.active_days, life.events_per_active_day,
        |       ent.n_types, ent.type_entropy, burst.burstiness_cv, st.max_streak
        |FROM life LEFT JOIN ent USING (user_id) LEFT JOIN burst USING (user_id)
        |LEFT JOIN st USING (user_id)
        |ORDER BY life.user_id""".stripMargin,
    // same-hour-last-week naive baseline, one-row MAE/MAPE report
    "ev_forecast_backtest" ->
      """WITH h AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_idx, count(*) AS n
        |  FROM events GROUP BY 1),
        |j AS (SELECT a.n, b.n AS n_pred FROM h a JOIN h b ON a.hour_idx = b.hour_idx + 168)
        |SELECT count(*) AS n_hours,
        |       round(avg(CAST(abs(n - n_pred) AS DOUBLE)), 4) AS mae,
        |       round(avg(CAST(abs(n - n_pred) AS DOUBLE) / n), 6) AS mape
        |FROM j""".stripMargin,
    // the CC reachability chain + longest-member argmax per group
    "dedup_cluster_best" ->
      s"""WITH RECURSIVE $groupsMd5Ctes,
         |j AS (SELECT g.group_id, g.doc_id, d.n_chars,
         |             row_number() OVER (PARTITION BY g.group_id
         |                ORDER BY d.n_chars DESC, g.doc_id) AS rn
         |      FROM grp g JOIN documents d USING (doc_id))
         |SELECT group_id, count(*) AS n_members,
         |       max(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc_id,
         |       max(CASE WHEN rn = 1 THEN n_chars END) AS rep_n_chars
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // one as-of pass × broadcast window grid
    "ev_conversion_sweep" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |lastv AS (
        |  SELECT p.event_id, p.ts_us, max(v.ts_us) AS last_view_us
        |  FROM e p LEFT JOIN e v
        |    ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |  WHERE p.event_type = 'purchase'
        |  GROUP BY 1, 2),
        |g AS (SELECT CAST(unnest([15, 30, 60, 120, 240]) AS INTEGER) AS window_minutes)
        |SELECT window_minutes, count(*) AS n_purchases,
        |       CAST(sum(CASE WHEN last_view_us IS NOT NULL
        |                      AND ts_us - last_view_us <=
        |                          window_minutes * CAST(60000000 AS BIGINT)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |       round(CAST(sum(CASE WHEN last_view_us IS NOT NULL
        |                            AND ts_us - last_view_us <=
        |                                window_minutes * CAST(60000000 AS BIGINT)
        |                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |         AS conversion
        |FROM lastv CROSS JOIN g GROUP BY 1 ORDER BY 1""".stripMargin,
    // cohort matrix normalized by its own day-0 column
    "ev_retention_curve" ->
      """WITH e AS (SELECT user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
        |m AS (SELECT cohort_day, day - cohort_day AS day_offset,
        |             count(DISTINCT user_id) AS n_active
        |      FROM e JOIN c USING (user_id) GROUP BY 1, 2),
        |b AS (SELECT cohort_day, n_active AS cohort_size FROM m WHERE day_offset = 0)
        |SELECT m.cohort_day, m.day_offset, m.n_active, b.cohort_size,
        |       round(CAST(m.n_active AS DOUBLE) / b.cohort_size, 6) AS retention
        |FROM m JOIN b USING (cohort_day)
        |ORDER BY 1, 2""".stripMargin,
    // integer-day order→ship gaps rolled up per priority
    "q_ship_latency" ->
      """WITH j AS (
        |  SELECT o_orderpriority,
        |         CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |                        CAST(l_shipdate AS DATE)) AS INTEGER) AS days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, count(*) AS n_items,
        |       round(avg(days), 4) AS avg_days,
        |       quantile_cont(days, 0.5) AS p50_days,
        |       quantile_cont(days, 0.9) AS p90_days,
        |       max(days) AS max_days
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // weekly type-mix JSD vs the overall mix (natural-log JSD, the
    // text_jsd_drift conventions on the weeks × types grid)
    "ev_mix_drift" ->
      """WITH wt AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week,
        |         event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |wk AS (SELECT week, sum(c) AS n_week FROM wt GROUP BY 1),
        |ty AS (SELECT event_type, sum(c) AS ct FROM wt GROUP BY 1),
        |tot AS (SELECT sum(ct) AS n_total FROM ty),
        |grid AS (
        |  SELECT wk.week, wk.n_week,
        |         CAST(coalesce(wt.c, 0) AS DOUBLE) AS c,
        |         CAST(ty.ct AS DOUBLE) AS ct, tot.n_total
        |  FROM ty CROSS JOIN tot CROSS JOIN wk
        |  LEFT JOIN wt ON wt.week = wk.week AND wt.event_type = ty.event_type),
        |pq AS (SELECT week, c / n_week AS p, ct / n_total AS q FROM grid)
        |SELECT week,
        |       round(sum(CASE WHEN p > 0
        |                      THEN 0.5 * p * ln(2.0 * p / (p + q)) ELSE 0.0 END +
        |                 0.5 * q * ln(2.0 * q / (p + q))), 6) AS jsd
        |FROM pq GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-modality median/MAD size outliers over the fake-media meta
    "mm_size_outliers" ->
      """WITH m AS (SELECT doc_id,
        |                  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |                       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |                  octet_length(encode(text)) AS n_bytes
        |           FROM documents),
        |med AS (SELECT media_type, quantile_cont(n_bytes, 0.5) AS med_b FROM m GROUP BY 1),
        |mad AS (SELECT m.media_type, quantile_cont(abs(n_bytes - med_b), 0.5) AS mad_b
        |        FROM m JOIN med USING (media_type) GROUP BY 1)
        |SELECT m.media_type, doc_id, CAST(n_bytes AS INTEGER) AS n_bytes,
        |       round(med_b, 4) AS med_bytes,
        |       round(abs(n_bytes - med_b) / (1.4826 * mad_b), 4) AS robust_score
        |FROM m JOIN med USING (media_type) JOIN mad USING (media_type)
        |WHERE mad_b > 0 AND abs(n_bytes - med_b) > 1.5 * 1.4826 * mad_b
        |ORDER BY media_type, doc_id""".stripMargin,
    // exact top-5 neighbors (the bruteforce CTE) × label agreement
    "sim_knn_homophily" ->
      """WITH q AS (SELECT vec_id AS qid, label AS q_label,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, label AS c_label,
        |             CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT qid, q_label, cid, c_label,
        |             round(list_cosine_similarity(qv, cv), 6) AS cs
        |      FROM q CROSS JOIN c WHERE qid <> cid),
        |t AS (SELECT qid, q_label, c_label FROM (
        |        SELECT qid, q_label, c_label,
        |               row_number() OVER (PARTITION BY qid
        |                 ORDER BY cs DESC, cid) AS rnk FROM s) x WHERE rnk <= 5)
        |SELECT qid, q_label,
        |       CAST(sum(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) AS INTEGER)
        |         AS n_same,
        |       round(CAST(sum(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) AS DOUBLE)
        |             / 5, 6) AS homophily
        |FROM t GROUP BY 1, 2 ORDER BY qid""".stripMargin,
    // frequency-ranked cumulative token mass at the k grid; ks beyond
    // the vocabulary coalesce to full coverage
    "text_vocab_coverage" ->
      """WITH cnt AS (SELECT w, count(*) AS c FROM (
        |               SELECT unnest(string_split(lower(text), ' ')) AS w
        |               FROM documents) t
        |             WHERE length(w) > 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types FROM cnt),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rnk,
        |             CAST(sum(c) OVER (ORDER BY c DESC, w
        |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM cnt),
        |g AS (SELECT CAST(unnest([10, 100, 1000, 10000]) AS INTEGER) AS k)
        |SELECT k, n_types, n_tokens,
        |       coalesce(r.cum, n_tokens) AS covered_tokens,
        |       round(CAST(coalesce(r.cum, n_tokens) AS DOUBLE) / n_tokens, 6) AS coverage
        |FROM g CROSS JOIN tot LEFT JOIN r ON r.rnk = g.k
        |ORDER BY k""".stripMargin,
    // exact-digest dup flags × log2 length buckets
    "dedup_rate_by_length" ->
      """WITH dg AS (SELECT doc_id, n_chars, md5(text) AS digest FROM documents),
        |cnt AS (SELECT digest, count(*) AS n_copies FROM dg GROUP BY 1),
        |b AS (SELECT CAST(length(bin(n_chars)) - 1 AS INTEGER) AS bucket,
        |             cnt.n_copies > 1 AS is_dup
        |      FROM dg JOIN cnt USING (digest) WHERE n_chars > 0)
        |SELECT bucket,
        |       CAST(1 AS BIGINT) << bucket AS lo_chars,
        |       (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS hi_chars,
        |       count(*) AS n_docs,
        |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |       round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS dup_rate
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // broadcast-query frame finished by a radius census
    "sim_radius_search" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT qid, cid, round(list_cosine_similarity(qv, cv), 6) AS cs
        |      FROM q CROSS JOIN c WHERE qid <> cid)
        |SELECT qid,
        |       CAST(sum(CASE WHEN cs >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
        |       round(max(cs), 6) AS best_sim
        |FROM s GROUP BY 1 ORDER BY qid""".stripMargin,
    "text_stopword_profile" -> {
      val stop = graft.operators.TextAnalysis.gopherStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH w AS (SELECT source,
         |                  list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
         |           FROM documents),
         |d AS (SELECT source, len(ws) AS n_words,
         |             len(list_filter(ws, x -> list_contains([$stop], x))) AS n_stop
         |      FROM w)
         |SELECT source, CAST(sum(n_words) AS BIGINT) AS n_words,
         |       CAST(sum(n_stop) AS BIGINT) AS n_stop,
         |       round(CAST(sum(n_stop) AS DOUBLE) / sum(n_words), 6) AS stop_rate
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "ev_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT p.event_id, p.user_id, p.ts_us,
        |       min(v.ts_us) AS next_view_us
        |FROM e p LEFT JOIN e v
        |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us >= p.ts_us
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // single-aggregate entropy identity: H = ln N − (Σ c·ln c)/N
    "ev_distinct_rollup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1
        |UNION ALL
        |SELECT '_all_' AS event_type, count(DISTINCT user_id) AS n_users FROM events
        |ORDER BY event_type""".stripMargin,
    "ev_type_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events, count(*) AS n_types,
        |       round(ln(sum(c)) - sum(CAST(c AS DOUBLE) * ln(c)) / sum(c), 6) AS type_entropy
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // day-partitioned sweep line + per-day carry-in over the session chain
    "ev_peak_concurrency" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked
        |), s AS (
        |  SELECT min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM sess GROUP BY user_id, session_id
        |), b AS (
        |  SELECT start_us AS ts, 1 AS d FROM s
        |  UNION ALL SELECT end_us + 1, -1 FROM s
        |), bd AS (
        |  SELECT ts, d, (ts // 86400000000) AS day FROM b
        |), days AS (SELECT DISTINCT day FROM bd),
        |carry AS (
        |  SELECT days.day, count(*) AS carry_in
        |  FROM s JOIN days ON s.start_us < days.day * 86400000000
        |                  AND s.end_us >= days.day * 86400000000
        |  GROUP BY 1
        |), runs AS (
        |  SELECT day, CAST(sum(d) OVER (PARTITION BY day ORDER BY ts, d DESC
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM bd
        |), mx AS (SELECT day, max(run) AS max_run FROM runs GROUP BY 1)
        |SELECT mx.day, CAST(coalesce(carry_in, 0) AS BIGINT) AS carry_in,
        |       CAST(coalesce(carry_in, 0) + greatest(max_run, 0) AS BIGINT)
        |         AS peak_concurrency
        |FROM mx LEFT JOIN carry ON mx.day = carry.day
        |ORDER BY mx.day""".stripMargin,
    // nine broadcast thresholds; bin = #thresholds strictly below
    "q_revenue_deciles" ->
      """WITH thr AS (
        |  SELECT quantile_cont(o_totalprice,
        |         [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS thr FROM orders)
        |SELECT CAST(len(list_filter(thr, t -> t < o_totalprice)) AS INTEGER) AS decile,
        |       count(*) AS n_orders,
        |       round(min(o_totalprice), 2) AS min_price,
        |       round(max(o_totalprice), 2) AS max_price,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders CROSS JOIN thr
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the sessionize chain carrying event_type → per-session first
    // view / last purchase → 1-row conversion rollup
    "ev_session_funnel" ->
      """WITH g AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us, event_type,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us, event_type,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked
        |), per AS (
        |  SELECT user_id, session_id,
        |         min(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view,
        |         max(CASE WHEN event_type = 'purchase' THEN ts_us END) AS last_purchase
        |  FROM sess GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        |       CAST(coalesce(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
        |         AS n_with_view,
        |       CAST(coalesce(sum(CASE WHEN first_view IS NOT NULL AND last_purchase >= first_view
        |                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_converted,
        |       round(CAST(sum(CASE WHEN first_view IS NOT NULL AND last_purchase >= first_view
        |                           THEN 1 ELSE 0 END) AS DOUBLE) /
        |             sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END), 6)
        |         AS session_conversion
        |FROM per""".stripMargin,
    "q_mad_prices" ->
      """WITH med AS (SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med_price
        |             FROM orders GROUP BY 1)
        |SELECT o_orderpriority, count(*) AS n,
        |       round(min(med_price), 4) AS med_price,
        |       round(quantile_cont(abs(o_totalprice - med_price), 0.5), 4) AS mad_price
        |FROM orders JOIN med USING (o_orderpriority)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_split_leakage" ->
      s"""WITH ${minhashPairCtes("documents")},
         |nd AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b,
         |         round(len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0, 6) AS ej
         |  FROM pairs) q WHERE ej >= 0.5),
         |sp AS (SELECT
         |  CASE WHEN doc_a % 10 < 8 THEN 'train'
         |       WHEN doc_a % 10 = 8 THEN 'val' ELSE 'test' END AS sa,
         |  CASE WHEN doc_b % 10 < 8 THEN 'train'
         |       WHEN doc_b % 10 = 8 THEN 'val' ELSE 'test' END AS sb
         |  FROM nd)
         |SELECT least(sa, sb) AS split_x, greatest(sa, sb) AS split_y,
         |       count(*) AS n_pairs,
         |       least(sa, sb) <> greatest(sa, sb) AS leaks
         |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_ttr" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |     tf AS (SELECT source, w FROM t WHERE len(w) > 0)
        |SELECT source, count(*) AS n_tokens, count(DISTINCT w) AS n_types,
        |       round(CAST(count(DISTINCT w) AS DOUBLE) / count(*), 6) AS ttr
        |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin,
    // JSD per source vs corpus over the full (source × corpus-word)
    // grid — absent words contribute only the q-side term
    "text_jsd_drift" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |     tf AS (SELECT source, w FROM t WHERE len(w) > 0),
        |     sw AS (SELECT source, w, count(*) AS c FROM tf GROUP BY 1, 2),
        |     st AS (SELECT source, sum(c) AS n_src FROM sw GROUP BY 1),
        |     cw AS (SELECT w, sum(c) AS cc FROM sw GROUP BY 1),
        |     ct AS (SELECT sum(cc) AS n_corpus FROM cw),
        |     grid AS (
        |       SELECT st.source, st.n_src, cw.w, cw.cc, ct.n_corpus,
        |              coalesce(sw.c, 0) AS c
        |       FROM st CROSS JOIN cw CROSS JOIN ct
        |       LEFT JOIN sw ON sw.source = st.source AND sw.w = cw.w),
        |     terms AS (
        |       SELECT source,
        |              CAST(c AS DOUBLE) / n_src AS p,
        |              CAST(cc AS DOUBLE) / n_corpus AS q,
        |              CASE WHEN c > 0 THEN 1 ELSE 0 END AS present
        |       FROM grid)
        |SELECT source,
        |       round(sum(CASE WHEN p > 0
        |                      THEN 0.5 * p * ln(2.0 * p / (p + q)) ELSE 0.0 END
        |                 + 0.5 * q * ln(2.0 * q / (p + q))), 6) AS jsd,
        |       CAST(sum(present) AS BIGINT) AS n_types
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,
    // bucket index = floor(log2(n_chars)) via binary digit count —
    // pure integer/string arithmetic, engine-identical at powers of 2
    "text_length_hist" ->
      """WITH b AS (SELECT source, CAST(length(bin(n_chars)) - 1 AS INTEGER) AS bucket
        |           FROM documents WHERE n_chars > 0),
        |     tot AS (SELECT source, count(*) AS n_src FROM b GROUP BY 1)
        |SELECT b.source, bucket,
        |       CAST(1 AS BIGINT) << bucket AS lo_chars,
        |       (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS hi_chars,
        |       count(*) AS n_docs,
        |       round(CAST(count(*) AS DOUBLE) / any_value(n_src), 6) AS share
        |FROM b JOIN tot USING (source) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // L2 from the norm identity on list_inner_product — the same
    // left-associated arithmetic the Spark op runs over graft_dot
    "sim_l2_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |     c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |     s AS (SELECT qid, cid,
        |                  round(sqrt(greatest(0.0, list_inner_product(qv, qv)
        |                        - 2.0 * list_inner_product(qv, cv)
        |                        + list_inner_product(cv, cv))), 6) AS dist
        |           FROM q CROSS JOIN c WHERE qid <> cid),
        |     r AS (SELECT qid, cid, dist,
        |                  CAST(row_number() OVER (PARTITION BY qid
        |                       ORDER BY dist ASC, cid) AS INTEGER) AS rnk
        |           FROM s)
        |SELECT qid, rnk, cid, dist FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // epoch-aligned hour-of-week: pure floor-div/mod arithmetic (no
    // locale calendar), non-negative even for pre-1970 fixtures
    "ev_hour_of_week" ->
      """WITH h AS (SELECT ((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 168 + 168) % 168 AS how
        |           FROM events),
        |     c AS (SELECT how, count(*) AS n FROM h GROUP BY 1),
        |     t AS (SELECT sum(n) AS n_total FROM c)
        |SELECT how, n, round(CAST(n AS DOUBLE) / n_total, 6) AS share
        |FROM c CROSS JOIN t ORDER BY how""".stripMargin,
    "ev_power_users" ->
      """WITH c AS (SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |           FROM events GROUP BY 1),
        |     t AS (SELECT quantile_cont(n_events, 0.9) AS p90,
        |                  sum(n_events) AS n_total FROM c)
        |SELECT user_id, n_events, sum_value,
        |       round(CAST(n_events AS DOUBLE) / n_total, 6) AS traffic_share
        |FROM c CROSS JOIN t WHERE n_events >= p90
        |ORDER BY n_events DESC, user_id""".stripMargin,
    // the ev_sessionize CTE chain + log2 (binary-digit-count) buckets
    "ev_session_histogram" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked
        |), sl AS (
        |  SELECT CAST(length(bin(count(*))) - 1 AS INTEGER) AS bucket
        |  FROM sess GROUP BY user_id, session_id
        |), c AS (SELECT bucket, count(*) AS n_sessions FROM sl GROUP BY 1),
        |   t AS (SELECT sum(n_sessions) AS n_total FROM c)
        |SELECT bucket,
        |       CAST(1 AS BIGINT) << bucket AS lo_events,
        |       (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS hi_events,
        |       n_sessions,
        |       round(CAST(n_sessions AS DOUBLE) / n_total, 6) AS share
        |FROM c CROSS JOIN t ORDER BY bucket""".stripMargin,
    // as-of (latest prior view per purchase) → conversion-latency percentiles
    "ev_time_to_convert" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     lat AS (
        |  SELECT p.ts_us - max(v.ts_us) AS latency_us
        |  FROM e p JOIN e v
        |    ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |  WHERE p.event_type = 'purchase'
        |  GROUP BY p.event_id, p.ts_us)
        |SELECT count(*) AS n_converted,
        |       round(quantile_cont(latency_us, 0.5), 4) AS p50_us,
        |       round(quantile_cont(latency_us, 0.9), 4) AS p90_us,
        |       max(latency_us) AS max_us
        |FROM lat""".stripMargin,
    "ev_user_lifecycle" ->
      """WITH g AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     u AS (
        |  SELECT user_id, count(*) AS n_events, min(ts_us) AS first_us,
        |         max(ts_us) AS last_us,
        |         count(DISTINCT ts_us // 86400000000) AS active_days
        |  FROM g GROUP BY 1)
        |SELECT user_id, n_events, first_us, last_us, active_days,
        |       round(CAST(n_events AS DOUBLE) / active_days, 4) AS events_per_active_day
        |FROM u ORDER BY user_id""".stripMargin,
    // median/MAD robust anomalies over epoch-aligned hourly counts
    "ev_anomaly_mad" ->
      """WITH h AS (
        |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS hour_us,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med_n FROM h GROUP BY 1),
        |mad AS (SELECT h.event_type, quantile_cont(abs(n - med_n), 0.5) AS mad_n
        |        FROM h JOIN med USING (event_type) GROUP BY 1)
        |SELECT hour_us, h.event_type, n, round(med_n, 4) AS med_n,
        |       round(abs(n - med_n) / (1.4826 * mad_n), 4) AS robust_score
        |FROM h JOIN med USING (event_type) JOIN mad USING (event_type)
        |WHERE mad_n > 0 AND abs(n - med_n) > 3.0 * 1.4826 * mad_n
        |ORDER BY hour_us, event_type""".stripMargin,
    "sim_top_component" -> topComponentOracle(),
    // rounded per-(label, dim) centroids → ordered lists → pairwise cosine
    "sim_label_confusion" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     d AS (SELECT label, i, round(avg(v[CAST(i AS INTEGER)]), 6) AS m
        |           FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
        |           GROUP BY 1, 2),
        |     c AS (SELECT label, list(m ORDER BY i) AS centroid FROM d GROUP BY 1)
        |SELECT a.label AS label_a, b.label AS label_b,
        |       round(list_cosine_similarity(a.centroid, b.centroid), 6) AS centroid_sim
        |FROM c a JOIN c b ON a.label < b.label
        |ORDER BY 1, 2""".stripMargin,
    "ev_session_duration" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked
        |), dur AS (
        |  SELECT max(ts_us) - min(ts_us) AS dur_us
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT count(*) AS n_sessions,
        |       round(quantile_cont(dur_us, 0.5), 4) AS p50_us,
        |       round(quantile_cont(dur_us, 0.9), 4) AS p90_us,
        |       max(dur_us) AS max_us
        |FROM dur""".stripMargin,
    "ev_new_vs_returning" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |                   epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |            FROM events),
        |     fd AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1),
        |     d AS (SELECT day, count(*) AS n_active,
        |                  sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS n_new
        |           FROM ud JOIN fd USING (user_id) GROUP BY 1)
        |SELECT day, n_active, CAST(n_new AS BIGINT) AS n_new,
        |       CAST(n_active - n_new AS BIGINT) AS n_returning,
        |       round(CAST(n_new AS DOUBLE) / n_active, 6) AS new_share
        |FROM d ORDER BY day""".stripMargin,
    // the vocab-growth chain + closed-form least squares on (ln N, ln V)
    "text_heaps_fit" ->
      """WITH wd AS (SELECT CAST(ceil(CAST(max(doc_id) + 1 AS DOUBLE) / 10) AS BIGINT) AS w
        |            FROM documents),
        |tok AS (SELECT t.doc_id // wd.w AS bucket, t.word
        |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |              FROM documents) t, wd
        |        WHERE length(t.word) > 0),
        |nw AS (SELECT bucket, count(*) AS n_new_words FROM (
        |         SELECT word, min(bucket) AS bucket FROM tok GROUP BY 1) f
        |       GROUP BY 1),
        |tk AS (SELECT bucket, count(*) AS n_tokens FROM tok GROUP BY 1),
        |gr AS (SELECT tk.bucket,
        |              CAST(sum(tk.n_tokens) OVER (ORDER BY tk.bucket) AS BIGINT) AS cum_tokens,
        |              CAST(sum(coalesce(nw.n_new_words, 0)) OVER (ORDER BY tk.bucket) AS BIGINT) AS vocab_size
        |       FROM tk LEFT JOIN nw USING (bucket)),
        |xy AS (SELECT ln(CAST(cum_tokens AS DOUBLE)) AS x, ln(CAST(vocab_size AS DOUBLE)) AS y
        |       FROM gr WHERE cum_tokens > 0 AND vocab_size > 0),
        |s AS (SELECT count(*) AS n_points, avg(x) AS xb, avg(y) AS yb,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy),
        |b AS (SELECT *, (sxy - n_points * xb * yb) / (sxx - n_points * xb * xb) AS beta_raw FROM s)
        |SELECT n_points, round(beta_raw, 6) AS beta,
        |       round(exp(yb - beta_raw * xb), 4) AS k
        |FROM b""".stripMargin,
    // every 16th byte of the video payload (ascii(substr) — text is
    // ASCII at generation) → per-doc byte-distribution entropy (nats)
    "mm_frame_entropy" ->
      """WITH fr AS (
        |  SELECT doc_id, CAST(len(frames) AS INTEGER) AS n_frames, unnest(frames) AS b
        |  FROM (
        |    SELECT doc_id,
        |           list_transform(range(1, length(text)+1, 16),
        |                          i -> ascii(substr(text, CAST(i AS INTEGER), 1))) AS frames
        |    FROM documents WHERE doc_id % 3 = 2)),
        |c AS (SELECT doc_id, n_frames, b, count(*) AS c FROM fr GROUP BY 1, 2, 3)
        |SELECT doc_id, n_frames,
        |       round(-sum((CAST(c AS DOUBLE) / n_frames) * ln(CAST(c AS DOUBLE) / n_frames)), 6)
        |         AS entropy
        |FROM c GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    "sim_dim_stats" ->
      """WITH x AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     d AS (SELECT CAST(i - 1 AS INTEGER) AS dim, v[CAST(i AS INTEGER)] AS x
        |           FROM x CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx)
        |SELECT dim, count(*) AS n, round(avg(x), 6) AS mean,
        |       round(stddev_samp(x), 6) AS sd,
        |       round(min(x), 6) AS min_x, round(max(x), 6) AS max_x,
        |       round(max(abs(x)), 6) AS max_abs
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_cluster_stats" -> clusterStatsOracle,
    "dedup_impact_by_source" ->
      """WITH k AS (SELECT md5(text) AS digest, min(doc_id) AS keep_id
        |           FROM documents GROUP BY 1),
        |d AS (SELECT doc_id, source, n_chars, md5(text) AS digest FROM documents)
        |SELECT source, count(*) AS n_docs,
        |       CAST(coalesce(sum(CASE WHEN d.doc_id <> k.keep_id THEN 1 ELSE 0 END), 0)
        |            AS BIGINT) AS n_dropped,
        |       CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS total_chars,
        |       CAST(coalesce(sum(CASE WHEN d.doc_id <> k.keep_id THEN n_chars ELSE 0 END), 0)
        |            AS BIGINT) AS chars_dropped
        |FROM d JOIN k USING (digest)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_boundary_overlap" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |h AS (SELECT doc_id AS doc_b, array_to_string(ws[1:4], ' ') AS boundary
        |      FROM w WHERE len(ws) >= 4),
        |t AS (SELECT doc_id AS doc_a, array_to_string(ws[-4:], ' ') AS boundary
        |      FROM w WHERE len(ws) >= 4)
        |SELECT doc_a, doc_b, boundary FROM t JOIN h USING (boundary)
        |WHERE doc_a <> doc_b ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_decon_neardup" -> deconNearDupOracle,
    "dedup_pipeline" -> dedupPipelineOracle,
    "dedup_groups_md5" -> groupsMd5Oracle,
    "dedup_simhash_md5" ->
      s"""WITH $simhashMd5Cte
         |SELECT doc_id, simhash32 FROM fp ORDER BY doc_id""".stripMargin,
    "dedup_simhash_md5_neardups" ->
      s"""WITH $simhashMd5Cte,
         |b AS (SELECT doc_id, simhash32, CAST(band_idx AS INTEGER) AS band_idx,
         |             (simhash32 >> CAST(band_idx * 8 AS INTEGER)) & 255 AS band_bits
         |      FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS band_idx) bands)
         |SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.simhash32, c.simhash32)) AS INTEGER) AS hamming
         |FROM b a JOIN b c USING (band_idx, band_bits)
         |WHERE a.doc_id < c.doc_id AND bit_count(xor(a.simhash32, c.simhash32)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "bearly_sum_lineitem" ->
      """SELECT CAST(coalesce(sum(l_orderkey),0) AS BIGINT) AS l_orderkey,
        |       CAST(coalesce(sum(l_partkey),0) AS BIGINT) AS l_partkey,
        |       CAST(coalesce(sum(l_suppkey),0) AS BIGINT) AS l_suppkey
        |FROM lineitem""".stripMargin,
    "bearly_produce_array" ->
      """SELECT CAST(c0 AS BIGINT) AS awesome_numbers
        |FROM (VALUES (42),(555),(NULL)) AS t(c0)
        |ORDER BY awesome_numbers NULLS FIRST""".stripMargin,
    "bearly_produce_stream" ->
      """SELECT CAST(c0 AS INTEGER) AS column0, CAST(c1 AS BIGINT) AS column1
        |FROM (VALUES (42,555),(84,1110),(NULL,NULL)) AS t(c0,c1)
        |ORDER BY column0 NULLS FIRST""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity),2) AS sum_qty,
        |       round(sum(l_extendedprice),2) AS sum_base_price,
        |       round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |       round(avg(l_quantity),4) AS avg_qty,
        |       round(avg(l_discount),4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "sim_outliers" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (
        |  SELECT label, list(mean_v ORDER BY pos) AS centroid FROM (
        |    SELECT label, pos, round(avg(v), 6) AS mean_v FROM (
        |      SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
        |             generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings) u
        |    GROUP BY 1, 2) t
        |  GROUP BY label)
        |SELECT e.label, e.vec_id,
        |       round(list_cosine_similarity(e.v, c.centroid), 6) AS centroid_sim
        |FROM e JOIN cent c USING (label)
        |WHERE round(list_cosine_similarity(e.v, c.centroid), 6) < 0.2
        |ORDER BY label, vec_id""".stripMargin,
    "text_heavy_tokens" ->
      """SELECT tok AS token, count(*) AS est_n FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents) t
        |WHERE length(tok) > 0
        |GROUP BY 1 HAVING count(*) >= 100
        |ORDER BY est_n DESC, token""".stripMargin,
    "text_bpe_merges" ->
      """WITH w AS (SELECT word, count(*) AS n FROM (
        |             SELECT unnest(string_split(lower(text), ' ')) AS word
        |             FROM documents) t
        |           WHERE length(word) >= 2 GROUP BY 1),
        |p AS (SELECT n,
        |             unnest(list_transform(range(1, length(word)),
        |                    i -> substr(word, CAST(i AS INTEGER), 2))) AS pair
        |      FROM w)
        |SELECT pair, CAST(sum(n) AS BIGINT) AS cnt
        |FROM p GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,
    "text_vocab_growth" ->
      """WITH wd AS (SELECT CAST(ceil(CAST(max(doc_id) + 1 AS DOUBLE) / 10) AS BIGINT) AS w
        |            FROM documents),
        |tok AS (SELECT t.doc_id // wd.w AS bucket, t.word
        |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |              FROM documents) t, wd
        |        WHERE length(t.word) > 0),
        |nw AS (SELECT bucket, count(*) AS n_new_words FROM (
        |         SELECT word, min(bucket) AS bucket FROM tok GROUP BY 1) f
        |       GROUP BY 1),
        |tk AS (SELECT bucket, count(*) AS n_tokens FROM tok GROUP BY 1)
        |SELECT tk.bucket, tk.n_tokens,
        |       CAST(coalesce(nw.n_new_words, 0) AS BIGINT) AS n_new_words,
        |       CAST(sum(tk.n_tokens) OVER (ORDER BY tk.bucket) AS BIGINT) AS cum_tokens,
        |       CAST(sum(coalesce(nw.n_new_words, 0)) OVER (ORDER BY tk.bucket) AS BIGINT)
        |         AS vocab_size
        |FROM tk LEFT JOIN nw USING (bucket) ORDER BY bucket""".stripMargin,
    "q3_top_revenue" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
        |       round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |     JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30'
        |  AND l_shipdate > TIMESTAMP '1998-06-30'
        |GROUP BY 1,2,3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_topk" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |              ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) sub
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1,2""",
    "q_except" ->
      """SELECT * FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O') sub
        |ORDER BY custkey""".stripMargin,
    "q_intersect" ->
      """SELECT * FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O') sub
        |ORDER BY custkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT p_partkey, upper(p_type) AS type_upper, substr(p_name,1,8) AS name_prefix,
        |       CAST(length(p_name) AS INTEGER) AS name_len,
        |       p_brand || '#' || p_type AS brand_type,
        |       round(p_retailprice*1.1,2) AS bumped_price,
        |       CAST(p_size % 7 AS INTEGER) AS size_mod
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_orders_by_month" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |       count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
        |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_star_join_region_year" ->
      """SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |     JOIN customer ON o_custkey = c_custkey
        |     JOIN nation ON c_nationkey = n_nationkey
        |     JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q_union_all" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_orderpriority AS bucket FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderpriority AS bucket FROM orders
        |  WHERE o_orderpriority = '2-HIGH') sub
        |ORDER BY o_orderkey, bucket""".stripMargin,
    "q_range_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |       round(avg((epoch_us(CAST(l_shipdate AS TIMESTAMP))
        |                  - epoch_us(CAST(o_orderdate AS TIMESTAMP)))
        |                 / (86400.0 * 1000000)), 4) AS avg_lag_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice),2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_percentiles" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |       count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_in_pred_semi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 5)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |       round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wavg_discount,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same correlated statement verbatim — DuckDB decorrelates it
    // with its own machinery; hash equality proves Catalyst's rewrite
    // (and the hand-decorrelated DataFrame twin) preserve semantics
    "q17_corr_subquery_sql" ->
      """SELECT p_brand, count(*) AS n_lines,
        |       round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q17_corr_subquery_df" ->
      """SELECT p_brand, count(*) AS n_lines,
        |       round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_range_window" ->
      """SELECT o_orderkey, o_custkey,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |         RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2) AS trailing_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_rank_profile" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |         ntile(4) OVER w AS quartile,
        |         percent_rank() OVER w AS pr,
        |         cume_dist() OVER w AS cd
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
        |SELECT o_orderpriority, CAST(quartile AS BIGINT) AS quartile,
        |       count(*) AS n_orders,
        |       round(avg(o_totalprice), 2) AS avg_price,
        |       round(max(pr), 6) AS max_pr, round(max(cd), 6) AS max_cd
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // merge-on-read produces the identical next-snapshot rows as the
    // write path, so it shares q_merge_upsert's oracle SQL verbatim
    "q_merge_on_read" -> mergeOracle,
    "q_merge_upsert" -> mergeOracle,
    // same changelog + apply CTEs as mergeOracle, then a FULL OUTER
    // diff of before vs after keeping only the non-unchanged rows.
    "q_snapshot_diff" ->
      """WITH ch AS (
        |  SELECT c_custkey AS key,
        |         CASE WHEN c_custkey % 10 = 3 THEN 'U' ELSE 'D' END AS op,
        |         round(c_acctbal + 100, 2) AS new_bal
        |  FROM customer WHERE c_custkey % 10 IN (3, 7)
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'I', 0.0
        |  FROM customer WHERE c_custkey % 10 = 1),
        |snap AS (SELECT c_custkey AS key, c_acctbal AS bal FROM customer),
        |survivors AS (
        |  SELECT snap.key,
        |         CASE WHEN ch.op = 'U' THEN ch.new_bal ELSE snap.bal END AS bal
        |  FROM snap LEFT JOIN ch ON snap.key = ch.key
        |  WHERE ch.op IS NULL OR ch.op <> 'D'),
        |ins AS (
        |  SELECT ch.key, ch.new_bal AS bal FROM ch
        |  WHERE ch.op = 'I'
        |    AND NOT EXISTS (SELECT 1 FROM snap WHERE snap.key = ch.key)),
        |aft AS (SELECT * FROM survivors UNION ALL SELECT * FROM ins),
        |d AS (SELECT coalesce(b.key, a.key) AS key,
        |             CASE WHEN b.key IS NULL THEN 'added'
        |                  WHEN a.key IS NULL THEN 'deleted'
        |                  WHEN b.bal <> a.bal THEN 'changed'
        |                  ELSE 'unchanged' END AS status,
        |             b.bal AS old_bal, a.bal AS new_bal
        |      FROM snap b FULL OUTER JOIN aft a ON b.key = a.key)
        |SELECT key, status, old_bal, new_bal FROM d
        |WHERE status <> 'unchanged' ORDER BY key""".stripMargin,
    "q_copurchase_lift" ->
      """WITH po AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
        |no AS (SELECT count(DISTINCT okey) AS n_orders FROM po),
        |pc AS (SELECT part, count(*) AS n_p FROM po GROUP BY 1),
        |pr AS (SELECT a.part AS part_a, b.part AS part_b, count(*) AS n_ab
        |       FROM po a JOIN po b USING (okey) WHERE a.part < b.part GROUP BY 1, 2)
        |SELECT part_a, part_b, n_ab,
        |       round((CAST(n_ab AS DOUBLE) / n_orders) /
        |             ((CAST(ca.n_p AS DOUBLE) / n_orders) *
        |              (CAST(cb.n_p AS DOUBLE) / n_orders)), 6) AS lift
        |FROM pr JOIN pc ca ON pr.part_a = ca.part
        |        JOIN pc cb ON pr.part_b = cb.part
        |CROSS JOIN no
        |WHERE n_ab >= 2
        |ORDER BY n_ab DESC, part_a, part_b LIMIT 200""".stripMargin,
    "q_histogram" ->
      """WITH b AS (
        |  SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 30000.0), 0.0),
        |                    19.0) AS BIGINT) AS bucket
        |  FROM orders)
        |SELECT bucket, round(0.0 + bucket * 30000.0, 2) AS bucket_lo,
        |       round(0.0 + (bucket + 1) * 30000.0, 2) AS bucket_hi,
        |       count(*) AS n_orders
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_window_nav" ->
      """SELECT o_orderkey, o_custkey,
        |       first_value(o_orderkey) OVER wf AS first_key,
        |       last_value(o_orderkey) OVER wf AS last_key,
        |       nth_value(o_orderkey, 2) OVER wf AS second_key,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       last_value(CASE WHEN o_totalprice > 200000.0 THEN o_orderkey END
        |                  IGNORE NULLS) OVER wr AS last_big_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |       wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
        |ORDER BY c.c_custkey""".stripMargin,
    "q_recursive_cte" ->
      """WITH RECURSIVE walk(key, anc, d) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT key, CAST(floor(anc / 2) AS BIGINT), d + 1 FROM walk WHERE anc > 1
        |)
        |SELECT CAST(d AS BIGINT) AS depth, count(*) AS n_customers FROM (
        |  SELECT key, max(d) AS d FROM walk GROUP BY key) t
        |GROUP BY d ORDER BY d""".stripMargin,
    "dedup_levenshtein" ->
      """WITH p AS (SELECT doc_id, substr(lower(text), 1, 16) AS block,
        |                  substr(text, 1, 200) AS head FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.head, b.head) AS INTEGER) AS dist
        |FROM p a JOIN p b ON a.block = b.block AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_except_all" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
        |  SELECT o_orderpriority FROM orders
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_intersect_all" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus <> 'P'
        |  INTERSECT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus <> 'O') t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_null_safe_join" ->
      """WITH a AS (SELECT n_nationkey AS a_key, nullif(n_regionkey, 2) AS a_rk FROM nation),
        |     b AS (SELECT n_nationkey AS b_key, nullif(n_regionkey, 2) AS b_rk FROM nation)
        |SELECT a_rk AS rk, count(*) AS n_pairs
        |FROM a JOIN b ON a_rk IS NOT DISTINCT FROM b_rk
        |GROUP BY 1 ORDER BY rk NULLS FIRST""".stripMargin,
    "q_string_agg" ->
      """SELECT o_orderpriority,
        |       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |       count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // z-value interleave re-derived bit-for-bit in SQL (generated
    // 2×16-term bitwise expression — same literal-embedding pattern as
    // the splitmix/minhash twins)
    "q_zorder_cluster" ->
      s"""SELECT event_id, x, y, ${graft.operators.Clustering.zValueSql("x", "y")} AS zval
         |FROM (SELECT event_id, user_id & 65535 AS x,
         |             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) & 65535 AS y
         |      FROM events) t
         |ORDER BY event_id""".stripMargin,
    "ev_transitions" ->
      """WITH g AS (SELECT user_id, event_id,
        |            epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
        |t AS (SELECT event_type AS next_type,
        |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |               AS prev_type
        |      FROM g),
        |m AS (SELECT prev_type, next_type, count(*) AS n FROM t
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |       round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
        |FROM m ORDER BY prev_type, next_type""".stripMargin,
    "ev_gap_fill" ->
      """WITH h AS (SELECT event_type,
        |            epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM h GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hour FROM r)
        |SELECT g.event_type, g.hour * 3600000000 AS hour_us, coalesce(n, 0) AS n
        |FROM g LEFT JOIN h ON g.event_type = h.event_type AND g.hour = h.hour
        |ORDER BY 1, 2""".stripMargin,
    "ev_scd2_intervals" ->
      """WITH g AS (SELECT user_id, event_id,
        |            epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
        |ch AS (SELECT *, lag(event_type) OVER w AS prev_type
        |       FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |c2 AS (SELECT user_id, event_id, ts_us, event_type FROM ch
        |       WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS state, ts_us AS valid_from_us,
        |       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us
        |FROM c2 ORDER BY user_id, valid_from_us""".stripMargin,
    "q_outer_join_count" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_full_outer_nation" ->
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_building_customers
        |           FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, count(*) AS n_debtor_suppliers
        |           FROM supplier WHERE s_acctbal < 0 GROUP BY 1)
        |SELECT coalesce(c.nk, s.nk) AS nationkey,
        |       coalesce(n_building_customers, 0) AS n_building_customers,
        |       coalesce(n_debtor_suppliers, 0) AS n_debtor_suppliers
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin,
    // same correlated EXISTS / NOT EXISTS statement verbatim — DuckDB
    // plans it with its own subquery machinery; hash equality proves
    // Catalyst's RewritePredicateSubquery (semi/anti joins) is
    // semantics-preserving
    "q21_exists_shape" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,
    "q6_sql_forecast" ->
      """SELECT round(coalesce(sum(l_extendedprice * l_discount), 0), 2) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_unpivot" ->
      """SELECT metric, count(*) AS n, round(sum(value), 2) AS total
        |FROM (
        |  SELECT 'discount' AS metric, l_discount AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'price', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'quantity', l_quantity FROM lineitem) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_by_segment" ->
      """SELECT c_mktsegment, event_type, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "sim_label_centroids" ->
      """SELECT label, CAST(pos - 1 AS INTEGER) AS pos,
        |       round(avg(v), 6) AS mean_v, count(*) AS n
        |FROM (SELECT label,
        |             CAST(unnest(embedding) AS DOUBLE) AS v,
        |             generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings) t
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_funnel" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |     lastv AS (
        |       SELECT p.event_id, p.ts_us, max(v.ts_us) AS last_view_us
        |       FROM e p LEFT JOIN e v
        |         ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |       WHERE p.event_type = 'purchase'
        |       GROUP BY 1,2)
        |SELECT count(*) AS n_purchases,
        |       CAST(coalesce(sum(CASE WHEN last_view_us IS NOT NULL
        |                  AND ts_us - last_view_us <= 3600000000 THEN 1 ELSE 0 END),0) AS BIGINT) AS n_converted,
        |       CAST(coalesce(sum(CASE WHEN last_view_us IS NULL THEN 1 ELSE 0 END),0) AS BIGINT) AS n_no_prior_view
        |FROM lastv""".stripMargin,
    "ev_funnel_steps" ->
      """WITH g AS (SELECT user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS ts_us FROM g
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT g.user_id, min(g.ts_us) AS ts_us
        |       FROM g JOIN s1 ON g.user_id = s1.user_id
        |       WHERE g.event_type = 'click' AND g.ts_us > s1.ts_us GROUP BY 1),
        |s3 AS (SELECT g.user_id, min(g.ts_us) AS ts_us
        |       FROM g JOIN s2 ON g.user_id = s2.user_id
        |       WHERE g.event_type = 'purchase' AND g.ts_us > s2.ts_us GROUP BY 1)
        |SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY step""".stripMargin,
    "ev_cohort_matrix" ->
      """WITH g AS (SELECT user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM g GROUP BY 1)
        |SELECT c.cohort_day, g.day - c.cohort_day AS day_offset,
        |       count(DISTINCT g.user_id) AS n_active
        |FROM g JOIN c ON g.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_rfm" ->
      """WITH g AS (SELECT user_id, event_type, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |nw AS (SELECT max(ts_us) AS now_us FROM g),
        |agg AS (SELECT user_id, max(ts_us) AS last_us, count(*) AS frequency,
        |               round(sum(value), 4) AS monetary
        |        FROM g WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT user_id, (nw.now_us - last_us) // 86400000000 AS recency_days,
        |       frequency, monetary
        |FROM agg CROSS JOIN nw ORDER BY user_id""".stripMargin,
    // decay term written as the identical expression tree Spark
    // evaluates: exp((-0.1 * CAST(diff AS DOUBLE)) / 86400000000.0).
    "ev_decayed_score" ->
      """WITH g AS (SELECT user_id, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |nw AS (SELECT max(ts_us) AS now_us FROM g)
        |SELECT user_id, count(*) AS n_events,
        |       round(sum(value * exp(CAST(-0.1 AS DOUBLE) * CAST(nw.now_us - ts_us AS DOUBLE)
        |                             / 86400000000.0)), 6) AS decayed_score
        |FROM g CROSS JOIN nw GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_attribution" ->
      """WITH g AS (SELECT event_id, user_id, event_type, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |p AS (SELECT user_id, event_type, value, ts_us,
        |             last_value(CASE WHEN event_type <> 'purchase' THEN ts_us END IGNORE NULLS)
        |               OVER w AS prev_us,
        |             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |               OVER w AS prev_type
        |      FROM g
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |conv AS (SELECT CASE WHEN prev_us IS NOT NULL AND ts_us - prev_us <= 1800000000
        |                     THEN prev_type ELSE 'direct' END AS channel, value
        |         FROM p WHERE event_type = 'purchase')
        |SELECT channel, count(*) AS n_conversions, round(sum(value), 4) AS total_value
        |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_interval_join" ->
      """WITH e AS (SELECT event_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |a AS (SELECT event_id AS a_id, ts_us AS a_us FROM e WHERE event_type = 'error'),
        |b AS (SELECT event_id AS b_id, ts_us AS b_us FROM e WHERE event_type = 'purchase')
        |SELECT a.a_id, count(b.b_id) AS n_nearby,
        |       min(abs(a.a_us - b.b_us)) AS min_delta_us
        |FROM a LEFT JOIN b ON abs(a.a_us - b.b_us) <= 300000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_props_variant" ->
      """SELECT CAST(k % 10 AS BIGINT) AS k_bucket, count(*) AS n,
        |       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k,
        |       round(avg(value), 6) AS avg_value
        |FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, value FROM events) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the UDF body inlined — the oracle checks the semantics the SQL
    // function registry must preserve
    "q_sql_udf" ->
      """SELECT l_returnflag, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "ev_props_json" ->
      """SELECT CAST(k % 10 AS BIGINT) AS k_bucket, count(*) AS n,
        |       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
        |       round(sum(value), 4) AS sum_value
        |FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, value FROM events) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_daily_rolling" ->
      """WITH daily AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT day, event_type, n,
        |       round(avg(n) OVER (PARTITION BY event_type ORDER BY day
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
        |FROM daily ORDER BY day, event_type""".stripMargin,
    "ev_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id
        |  FROM events),
        |ret AS (
        |  SELECT a.day, count(*) AS n_retained
        |  FROM ud a JOIN (SELECT day + 1 AS day, user_id FROM ud) b
        |    USING (day, user_id)
        |  GROUP BY 1)
        |SELECT d.day, d.n_active, coalesce(r.n_retained, 0) AS n_retained
        |FROM (SELECT day, count(*) AS n_active FROM ud GROUP BY 1) d
        |LEFT JOIN ret r USING (day)
        |ORDER BY day""".stripMargin,
    "ev_hour_pivot" ->
      """SELECT CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS INTEGER) AS hour_of_day,
        |       count(*) FILTER (WHERE event_type = 'click') AS click,
        |       count(*) FILTER (WHERE event_type = 'view') AS view,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_top_words" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE length(word) > 0
        |GROUP BY 1 ORDER BY cnt DESC, word LIMIT 20""".stripMargin,
    "ev_props_stats" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(coalesce(sum(k),0) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |             TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
        |      FROM events) sub
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_asof_native" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT p.event_id, p.user_id, p.ts_us, max(v.ts_us) AS last_view_us
        |FROM e p LEFT JOIN e v
        |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1,2,3 ORDER BY 1""".stripMargin,
    // tolerance twin: a view in [p.ts - 30min, p.ts] is the as-of
    // match iff one exists (any in-window view beats all older ones)
    "ev_asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT p.event_id, p.user_id, p.ts_us, max(v.ts_us) AS last_view_us
        |FROM e p LEFT JOIN e v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        |  AND v.ts_us <= p.ts_us AND v.ts_us >= p.ts_us - 1800000000
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1,2,3 ORDER BY 1""".stripMargin,
    "ev_asof_last_view" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT p.event_id, p.user_id, p.ts_us, max(v.ts_us) AS last_view_us
        |FROM e p LEFT JOIN e v
        |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts_us <= p.ts_us
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1,2,3 ORDER BY 1""".stripMargin,
    "ev_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
        |), marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), sess AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM sess GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_hourly_counts" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
        |       event_type, count(*) AS n, round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // bruteforce shape ranked by raw inner product (list_inner_product
    // sums left-to-right, matching the graft_dot codegen loop exactly)
    "sim_mips_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |     c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |     s AS (SELECT qid, cid, round(list_inner_product(qv, cv), 6) AS score
        |           FROM q CROSS JOIN c WHERE qid <> cid),
        |     r AS (SELECT qid, cid, score,
        |                  CAST(row_number() OVER (PARTITION BY qid
        |                       ORDER BY score DESC, cid) AS INTEGER) AS rnk
        |           FROM s)
        |SELECT qid, rnk, cid, score FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // bruteforce shape with a label-mismatch filter before ranking
    "sim_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, label AS ql, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |     c AS (SELECT vec_id AS cid, label AS cl, CAST(embedding AS DOUBLE[]) AS cv
        |           FROM embeddings),
        |     s AS (SELECT qid, cid, round(list_cosine_similarity(qv, cv), 6) AS cos_sim
        |           FROM q CROSS JOIN c WHERE ql <> cl),
        |     r AS (SELECT qid, cid, cos_sim,
        |                  CAST(row_number() OVER (PARTITION BY qid
        |                       ORDER BY cos_sim DESC, cid) AS INTEGER) AS rnk
        |           FROM s)
        |SELECT qid, rnk, cid, cos_sim FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "sim_bruteforce_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |     c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |     s AS (SELECT qid, cid, round(list_cosine_similarity(qv, cv), 6) AS cos_sim
        |           FROM q CROSS JOIN c WHERE qid <> cid),
        |     r AS (SELECT qid, cid, cos_sim,
        |                  CAST(row_number() OVER (PARTITION BY qid
        |                       ORDER BY cos_sim DESC, cid) AS INTEGER) AS rnk
        |           FROM s)
        |SELECT qid, rnk, cid, cos_sim FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // exact word-shingle Jaccard — mirrors Dedup.ngramJaccardPairs
    // (k=5 distinct shingles, df<=1000 cap, threshold on the rounded
    // value) with DuckDB list lambdas.
    "dedup_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id, CAST(len(shs) AS INTEGER) AS n_sh, unnest(shs) AS sh FROM (
        |    SELECT doc_id,
        |           list_distinct(CASE WHEN len(ws) >= 5
        |             THEN list_transform(range(0, len(ws)-5+1),
        |                    i -> array_to_string(ws[CAST(i+1 AS INTEGER):CAST(i+5 AS INTEGER)], ' '))
        |             ELSE [] END) AS shs
        |    FROM w) t),
        |rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 1000),
        |c AS (SELECT s.doc_id, s.n_sh, s.sh FROM sh s JOIN rare USING (sh)),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.n_sh AS na, b.n_sh AS nb, count(*) AS inter
        |  FROM c a JOIN c b USING (sh)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1,2,3,4)
        |SELECT doc_a, doc_b, inter, jaccard FROM (
        |  SELECT doc_a, doc_b, inter,
        |         round(inter / (na + nb - inter), 6) AS jaccard
        |  FROM p) q
        |WHERE jaccard >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // same df-capped shingle CTE as dedup_ngram_jaccard with Broder's
    // containment metric (inter / min side) instead of Jaccard
    "dedup_ngram_containment" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id, CAST(len(shs) AS INTEGER) AS n_sh, unnest(shs) AS sh FROM (
        |    SELECT doc_id,
        |           list_distinct(CASE WHEN len(ws) >= 5
        |             THEN list_transform(range(0, len(ws)-5+1),
        |                    i -> array_to_string(ws[CAST(i+1 AS INTEGER):CAST(i+5 AS INTEGER)], ' '))
        |             ELSE [] END) AS shs
        |    FROM w) t),
        |rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 1000),
        |c AS (SELECT s.doc_id, s.n_sh, s.sh FROM sh s JOIN rare USING (sh)),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.n_sh AS na, b.n_sh AS nb, count(*) AS inter
        |  FROM c a JOIN c b USING (sh)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1,2,3,4)
        |SELECT doc_a, doc_b, inter, containment FROM (
        |  SELECT doc_a, doc_b, inter,
        |         round(inter / least(na, nb), 6) AS containment
        |  FROM p) q
        |WHERE containment >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "dedup_normalized" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash,
        |       min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "dedup_exact_stats" ->
      """SELECT count(*) AS n_docs,
        |       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        |       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dupes
        |FROM documents""".stripMargin,
    "dedup_incremental" ->
      """SELECT a.doc_id, md5(a.text) AS text_hash
        |FROM documents a
        |WHERE a.doc_id % 10 = 0
        |  AND NOT EXISTS (SELECT 1 FROM documents b
        |                  WHERE b.doc_id % 10 <> 0 AND md5(b.text) = md5(a.text))
        |ORDER BY a.doc_id""".stripMargin,
    "dedup_keep_best" ->
      """SELECT md5(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS fp,
        |       arg_max(doc_id, CAST(n_chars AS BIGINT) * 4294967296 - doc_id) AS keep_id,
        |       count(*) AS n_copies,
        |       max(n_chars) AS best_chars
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    // eval set = doc_id % 50 = 0; k=8 word shingles; one row per train doc
    "text_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |shl AS (SELECT doc_id,
        |               list_distinct(CASE WHEN len(ws) >= 8
        |                 THEN list_transform(range(0, len(ws)-7),
        |                        i -> array_to_string(ws[CAST(i+1 AS INTEGER):CAST(i+8 AS INTEGER)], ' '))
        |                 ELSE [] END) AS shs
        |        FROM w),
        |es AS (SELECT DISTINCT unnest(shs) AS sh FROM shl WHERE doc_id % 50 = 0),
        |ts AS (SELECT doc_id, unnest(shs) AS sh FROM shl WHERE doc_id % 50 <> 0),
        |shared AS (SELECT doc_id, count(*) AS n_shared FROM ts JOIN es USING (sh) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_shared, 0) AS n_shared,
        |       coalesce(n_shared, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
        |LEFT JOIN shared USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_hash_sample" ->
      """SELECT doc_id, bucket FROM (
        |  SELECT doc_id,
        |         CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,4)) AS BIGINT) % 100
        |              AS INTEGER) AS bucket
        |  FROM documents) t
        |WHERE bucket < 10 ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH d AS (SELECT doc_id,
        |            list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
        |           FROM documents),
        |wc AS (SELECT doc_id, word, count(*) AS c
        |       FROM (SELECT doc_id, unnest(ws) AS word FROM d) GROUP BY 1, 2),
        |wstat AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
        |                 max(c) AS top_word FROM wc GROUP BY 1),
        |bg AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(ws)),
        |                              i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |       FROM d),
        |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |bstat AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram
        |          FROM bc GROUP BY 1)
        |SELECT wstat.doc_id, CAST(n_words AS BIGINT) AS n_words,
        |       round(CAST(n_words - n_distinct AS DOUBLE) / n_words, 6) AS frac_dup_words,
        |       round(CAST(top_word AS DOUBLE) / n_words, 6) AS top_word_frac,
        |       coalesce(round(CAST(top_bigram AS DOUBLE) / n_bigrams, 6), 0.0)
        |         AS top_bigram_frac
        |FROM wstat LEFT JOIN bstat ON wstat.doc_id = bstat.doc_id
        |ORDER BY wstat.doc_id""".stripMargin,
    "text_chunking" ->
      """WITH d AS (SELECT doc_id,
        |            list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
        |           FROM documents),
        |n AS (SELECT doc_id, ws,
        |             CAST(greatest(ceil((len(ws) - 10) / 40.0), 1) AS BIGINT) AS nc
        |      FROM d),
        |c AS (SELECT doc_id, ws, unnest(range(0, nc)) AS chunk_id FROM n)
        |SELECT doc_id, chunk_id,
        |       CAST(len(ws[(chunk_id*40+1):(chunk_id*40+50)]) AS BIGINT) AS n_chunk_words,
        |       array_to_string(ws[(chunk_id*40+1):(chunk_id*40+50)], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "text_stratified_sample" ->
      """SELECT doc_id, source, bucket, pct FROM (
        |  SELECT doc_id, source,
        |         CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,4)) AS BIGINT) % 100
        |              AS INTEGER) AS bucket,
        |         CASE WHEN COALESCE(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT), 1) % 2 = 0
        |              THEN 20 ELSE 5 END AS pct
        |  FROM documents) t
        |WHERE bucket < pct ORDER BY doc_id""".stripMargin,
    // Efraimidis–Spirakis key u^(1/w): u from the SAME md5-hex
    // arithmetic both engines use for hash sampling; ordering is on
    // the raw key (identical IEEE doubles), rounding only on output.
    "text_weighted_sample" ->
      """SELECT doc_id, weight, round(key_raw, 6) AS es_key FROM (
        |  SELECT doc_id, weight, pow(u, 1.0 / weight) AS key_raw FROM (
        |    SELECT doc_id,
        |           CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS DOUBLE)
        |             AS weight,
        |           CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT)
        |             AS DOUBLE) / 4294967296.0 AS u
        |    FROM documents) t
        |  WHERE weight > 0
        |  ORDER BY key_raw DESC, doc_id LIMIT 100) s""".stripMargin,
    "text_char_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
        |         substr(text, CAST(i AS INTEGER), 1) AS ch
        |  FROM (SELECT doc_id, text FROM documents WHERE length(text) > 0) d,
        |       unnest(range(1, length(text) + 1)) AS r(i)),
        |cc AS (SELECT doc_id, n_chars, ch, count(*) AS c FROM c GROUP BY 1, 2, 3)
        |SELECT doc_id, n_chars,
        |       round(-sum((CAST(c AS DOUBLE) / n_chars) * ln(CAST(c AS DOUBLE) / n_chars)), 6)
        |         AS entropy
        |FROM cc GROUP BY doc_id, n_chars ORDER BY doc_id""".stripMargin,
    "text_ngram_diversity" ->
      """WITH d AS (SELECT source, list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |           FROM documents),
        |g AS (SELECT source, n,
        |             array_to_string(ws[CAST(i + 1 AS INTEGER):CAST(i + n AS INTEGER)], ' ') AS gram
        |      FROM d, (SELECT unnest([1, 2, 3]) AS n) ns,
        |           unnest(range(0, len(ws) - CAST(n AS BIGINT) + 1)) AS r(i)
        |      WHERE len(ws) >= n)
        |SELECT source, n, count(*) AS n_total, count(DISTINCT gram) AS n_distinct,
        |       round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6) AS diversity
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sim_vector_stats" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT vec_id, CAST(len(v) AS BIGINT) AS dim,
        |       round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS l2_norm,
        |       CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
        |       round(list_max(list_transform(v, x -> abs(x))), 6) AS max_abs
        |FROM e ORDER BY vec_id""".stripMargin,
    // floor-quantization (no round-half tie convention) and errors ≫
    // summation noise at round(…,6) make this cross-engine exact
    "sim_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_min(v) AS mn,
        |             (list_max(v) - list_min(v)) / 255.0 AS sc FROM e),
        |err AS (SELECT vec_id, v, sc,
        |         CASE WHEN sc = 0 THEN list_transform(v, x -> 0.0)
        |              ELSE list_transform(v, x ->
        |                     abs(x - (mn + floor((x - mn) / sc) * sc))) END AS errs
        |        FROM m)
        |SELECT vec_id, CAST(len(v) AS INTEGER) AS dim, round(sc, 6) AS scale,
        |       round(list_max(errs), 6) AS max_err,
        |       round(list_sum(errs) / len(v), 6) AS mean_err
        |FROM err ORDER BY vec_id""".stripMargin,
    "text_unigram_logprob" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tt AS (SELECT doc_id, w FROM t WHERE length(w) > 0),
        |f AS (SELECT w, count(*) AS cnt FROM tt GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM tt)
        |SELECT doc_id, round(avg(ln(cnt / n_total)), 6) AS avg_logp, count(*) AS n_toks
        |FROM tt JOIN f USING (w) CROSS JOIN tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term FROM documents,
        |       unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
        |  WHERE length(t.term) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.n_docs / df.df), 6) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |            ORDER BY score DESC, term) AS rnk FROM scored)
        |SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rnk
        |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term FROM documents,
        |       unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
        |  WHERE length(t.term) > 0),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |       WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df,
        |              ln(1.0 + (n_docs - count(*) + 0.5) / (count(*) + 0.5)) AS idf
        |       FROM tf CROSS JOIN stats GROUP BY term, n_docs),
        |part AS (
        |  SELECT tf.doc_id,
        |         df.idf * (tf.tf * 2.2) /
        |           (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS part
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id, round(sum(part), 6) AS score
        |FROM part GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "text_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum FROM t)
        |SELECT source, CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
        |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_oov_rate" ->
      """WITH t AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |tt AS (SELECT * FROM t WHERE length(w) > 0),
        |v AS (SELECT w FROM (SELECT w, count(*) AS cnt FROM tt GROUP BY 1
        |                     ORDER BY cnt DESC, w LIMIT 20)),
        |d AS (SELECT doc_id, source,
        |        avg(CASE WHEN v.w IS NULL THEN 1.0 ELSE 0.0 END) AS oov
        |      FROM tt LEFT JOIN v ON tt.w = v.w GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs, round(avg(oov), 6) AS avg_oov_rate
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_group_sample" ->
      """SELECT doc_id, source, rnk FROM (
        |  SELECT doc_id, source,
        |         CAST(row_number() OVER (PARTITION BY source
        |              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk
        |  FROM documents) t
        |WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin,
    "text_mix_resample" ->
      """WITH m AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT lang, n_docs, sum(n_docs) OVER () AS n_total,
        |        CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2 WHEN 'es' THEN 0.15
        |                  WHEN 'fr' THEN 0.1 WHEN 'de' THEN 0.05 ELSE 0.0 END AS tgt
        |      FROM m),
        |w AS (SELECT lang,
        |        CAST(round(least(round(tgt / (CAST(n_docs AS DOUBLE) / n_total), 6) * 0.5,
        |                         1.0) * 10000) AS INTEGER) AS cut
        |      FROM t),
        |b AS (SELECT doc_id, lang,
        |        CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
        |             % 10000 AS INTEGER) AS bucket
        |      FROM documents)
        |SELECT doc_id, b.lang AS lang, bucket, cut
        |FROM b JOIN w ON b.lang = w.lang
        |WHERE bucket < cut ORDER BY doc_id""".stripMargin,
    "text_mix_weights" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT c.lang, c.n_docs,
        |             sum(n_docs) OVER () AS n_total,
        |             CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2
        |                            WHEN 'es' THEN 0.15 WHEN 'fr' THEN 0.1
        |                            WHEN 'de' THEN 0.05 ELSE 0.0 END AS DOUBLE) AS target_share
        |      FROM c)
        |SELECT lang, n_docs,
        |       round(n_docs / n_total, 6) AS actual_share,
        |       target_share,
        |       round(target_share / (n_docs / n_total), 6) AS weight
        |FROM t ORDER BY lang""".stripMargin,
    // DSIR hashed-unigram importance ratio — same 28-bit md5 bucket
    // trick as the minhash oracles; pt/pc assembled with the exact
    // division tree Spark evaluates.
    "text_dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang,
        |                     unnest(string_split(lower(text), ' ')) AS w
        |              FROM documents),
        |t2 AS (SELECT doc_id, lang,
        |              CAST(concat('0x', substr(md5(w), 1, 7)) AS BIGINT) % 1024 AS b
        |       FROM toks WHERE length(w) > 0),
        |cc AS (SELECT b, count(*) AS cc FROM t2 GROUP BY 1),
        |ct AS (SELECT b, count(*) AS ct FROM t2 WHERE lang = 'en' GROUP BY 1),
        |nc AS (SELECT CAST(sum(cc) AS BIGINT) AS n_c FROM cc),
        |nt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS n_t FROM ct),
        |dist AS (SELECT cc.b,
        |                CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) / (nt.n_t + 1024) AS pt,
        |                CAST(cc.cc AS DOUBLE) / nc.n_c AS pc
        |         FROM cc LEFT JOIN ct ON cc.b = ct.b CROSS JOIN nc CROSS JOIN nt)
        |SELECT doc_id, count(*) AS n_toks,
        |       round(avg(ln(pt / pc)), 6) AS avg_log_ratio
        |FROM t2 JOIN dist ON t2.b = dist.b
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-doc leg is the text_bigram_logprob oracle verbatim; rollup
    // joins doc → source and averages the ROUNDED per-doc scores
    // (matching the Spark composition exactly).
    "text_ppl_by_source" ->
      """WITH t AS (SELECT doc_id,
        |            list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |           FROM documents),
        |bi AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |       FROM t, unnest(range(1, len(ws))) AS r(i)
        |       WHERE len(ws) >= 2),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
        |cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM cb GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM cu),
        |perdoc AS (SELECT doc_id, round(avg(ln((cb + 1) / (cu + v))), 6) AS avg_logp
        |           FROM bi JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
        |           GROUP BY 1)
        |SELECT source, count(*) AS n_docs, round(avg(avg_logp), 6) AS mean_logp
        |FROM perdoc JOIN documents USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same tokenization + bigram CTEs as text_bigram_logprob; PMI
    // formula written as the identical double expression tree Spark
    // evaluates so ln/round match bit-for-bit.
    "text_pmi_bigrams" ->
      """WITH t AS (SELECT doc_id,
        |            list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |           FROM documents),
        |uni AS (SELECT unnest(ws) AS w FROM t),
        |cu AS (SELECT w, count(*) AS cw FROM uni GROUP BY 1),
        |bi AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
        |       FROM t, unnest(range(1, len(ws))) AS r(i)
        |       WHERE len(ws) >= 2),
        |cb AS (SELECT w1, w2, count(*) AS n_ab FROM bi GROUP BY 1, 2),
        |ntok AS (SELECT CAST(sum(cw) AS BIGINT) AS n_tok FROM cu),
        |nbi AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_bi FROM cb)
        |SELECT w1, w2, n_ab,
        |       round(ln((CAST(n_ab AS DOUBLE) / n_bi) /
        |             ((CAST(u1.cw AS DOUBLE) / n_tok) * (CAST(u2.cw AS DOUBLE) / n_tok))), 6)
        |         AS pmi
        |FROM cb
        |JOIN cu u1 ON cb.w1 = u1.w
        |JOIN cu u2 ON cb.w2 = u2.w
        |CROSS JOIN ntok CROSS JOIN nbi
        |WHERE n_ab >= 5
        |ORDER BY w1, w2""".stripMargin,
    "text_zipf_slope" ->
      """WITH head AS (
        |  SELECT w, cnt FROM (
        |    SELECT word AS w, count(*) AS cnt FROM (
        |      SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) t
        |    WHERE length(word) > 0 GROUP BY 1)
        |  ORDER BY cnt DESC, w LIMIT 1000),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank FROM head)
        |SELECT round(regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4)
        |         AS zipf_slope,
        |       round(regr_intercept(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4)
        |         AS zipf_intercept,
        |       count(*) AS n_terms
        |FROM r""".stripMargin,
    "text_inverted_index" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |           FROM documents),
        |tf AS (SELECT term, doc_id, count(*) AS tf FROM t
        |       WHERE length(term) > 0 GROUP BY 1, 2)
        |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
        |       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
        |FROM tf GROUP BY term HAVING count(*) >= 2 ORDER BY term""".stripMargin,
    "text_bigram_logprob" ->
      """WITH t AS (SELECT doc_id,
        |            list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |           FROM documents),
        |bi AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |       FROM t, unnest(range(1, len(ws))) AS r(i)
        |       WHERE len(ws) >= 2),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
        |cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM cb GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM cu)
        |SELECT doc_id,
        |       round(avg(ln((cb + 1) / (cu + v))), 6) AS avg_logp,
        |       count(*) AS n_bigrams
        |FROM bi JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_topk_by_source" ->
      """SELECT source, rnk, doc_id, n_words FROM (
        |  SELECT source, doc_id,
        |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        |         CAST(row_number() OVER (PARTITION BY source
        |              ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS INTEGER) AS rnk
        |  FROM documents) t
        |WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        |       CAST(length(text) AS INTEGER) AS n_chars_calc,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS n_tokens,
        |       CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS INTEGER) AS n_the,
        |       round((length(text) - length(replace(text, 'the', '')))
        |             / (3.0 * greatest(length(text), 1)), 6) AS the_density
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprints" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality_by_source" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(coalesce(sum(n_chars),0) AS BIGINT) AS total_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |       round(avg(len(string_split(text, ' '))), 4) AS avg_words
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_pii_scrub" ->
      """SELECT doc_id,
        |       regexp_replace(
        |         regexp_replace(text,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality_filter" ->
      """SELECT doc_id,
        |       (length(text) >= 50 AND length(text) <= 100000
        |        AND len(string_split(text, ' ')) >= 10) AS keep,
        |       CASE WHEN length(text) < 50 THEN 'too_short'
        |            WHEN length(text) > 100000 THEN 'too_long'
        |            WHEN len(string_split(text, ' ')) < 10 THEN 'too_few_words'
        |            ELSE 'ok' END AS reason
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_dataset_split" ->
      """SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
        |            WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_docs,
        |       CAST(coalesce(sum(n_chars),0) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm_payload_stats" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_payload_dedup" ->
      """SELECT media_type, md5(text) AS digest, min(doc_id) AS keep_id,
        |       count(*) AS n_copies FROM (
        |  SELECT doc_id, text,
        |         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type
        |  FROM documents) t
        |GROUP BY 1, 2 ORDER BY media_type, keep_id""".stripMargin,
    // decode stub: md5 the payload (UTF-8 text bytes ⇒ md5(text)),
    // carve width/height/frames out of 6-hex-char chunks — exactly
    // Multimodal.decodeStub.
    "mm_decode_features" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |       CAST(64 + CAST(concat('0x', substr(md5(text),1,6)) AS BIGINT) % 1024 AS INTEGER) AS width,
        |       CAST(64 + CAST(concat('0x', substr(md5(text),7,6)) AS BIGINT) % 1024 AS INTEGER) AS height,
        |       CAST(CASE WHEN doc_id % 3 = 2
        |            THEN 1 + CAST(concat('0x', substr(md5(text),13,6)) AS BIGINT) % 300
        |            ELSE 1 END AS INTEGER) AS n_frames,
        |       md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // frame sampling: every 16th byte of the UTF-8 payload; documents
    // text is ASCII (verified at generation), so byte i == char i and
    // ascii(substr(...)) reproduces the byte values.
    "mm_sample_frames" ->
      """SELECT doc_id, CAST(len(frames) AS INTEGER) AS n_frames,
        |       md5(array_to_string(frames, ',')) AS frames_md5
        |FROM (
        |  SELECT doc_id,
        |         list_transform(range(1, length(text)+1, 16),
        |                        i -> ascii(substr(text, CAST(i AS INTEGER), 1))) AS frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY doc_id""".stripMargin,
    // --- round-7 second continuation ---
    // matrix multiply as join on the shared middle state; p1 kept
    // unrounded (identical IEEE n/total in both engines), round(6)
    // absorbs the 5-term sum-order ulp
    "ev_markov_2step" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
        |                                   ORDER BY ts_us, event_id) AS prev_type,
        |             event_type AS next_type
        |      FROM e),
        |c AS (SELECT prev_type, next_type, count(*) AS n FROM t
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT prev_type, next_type,
        |             CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
        |      FROM c)
        |SELECT ab.prev_type AS from_type, bc.next_type AS to_type,
        |       round(sum(ab.p * bc.p), 6) AS p2
        |FROM p ab JOIN p bc ON ab.next_type = bc.prev_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_trigrams" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |g AS (SELECT event_type AS t1,
        |             lead(event_type, 1) OVER w AS t2,
        |             lead(event_type, 2) OVER w AS t3
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT t1 || '>' || t2 || '>' || t3 AS trigram, count(*) AS n
        |FROM g WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20""".stripMargin,
    "text_hapax_by_source" ->
      """WITH w AS (SELECT source, x AS w FROM documents,
        |                unnest(string_split(lower(text), ' ')) AS u(x)
        |           WHERE length(x) > 0),
        |c AS (SELECT source, w, count(*) AS c FROM w GROUP BY 1, 2)
        |SELECT source, count(*) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS hapax_rate
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_curriculum" -> {
      val stop = graft.operators.TextAnalysis.gopherStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH d AS (SELECT doc_id, source,
         |                  list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
         |           FROM documents),
         |s AS (SELECT doc_id, source, len(ws) AS n_words,
         |             CAST(len(list_filter(ws, x -> list_contains([$stop], x)))
         |                  AS DOUBLE) / len(ws) AS score
         |      FROM d WHERE len(ws) > 0),
         |b AS (SELECT source, n_words, score,
         |             ntile(10) OVER (PARTITION BY source
         |                             ORDER BY score DESC, doc_id) AS bucket
         |      FROM s)
         |SELECT source, bucket, count(*) AS n_docs,
         |       round(avg(score), 6) AS avg_score,
         |       round(avg(CAST(n_words AS DOUBLE)), 4) AS avg_words
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "text_word_len_profile" ->
      """WITH w AS (SELECT lang, CAST(least(length(x), 15) AS INTEGER) AS word_len
        |           FROM documents, unnest(string_split(text, ' ')) AS u(x)
        |           WHERE length(x) > 0),
        |c AS (SELECT lang, word_len, count(*) AS n_words FROM w GROUP BY 1, 2)
        |SELECT lang, word_len, n_words,
        |       round(CAST(n_words AS DOUBLE)
        |             / sum(n_words) OVER (PARTITION BY lang), 6) AS share
        |FROM c ORDER BY 1, 2""".stripMargin,
    // buckets computed on the ROUNDED cosine so both engines bin
    // identical values (see Similarity.pairCosineHistogram)
    "sim_pair_hist" ->
      """WITH a AS (SELECT vec_id AS ida, CAST(embedding AS DOUBLE[]) AS va
        |           FROM embeddings WHERE vec_id % 37 = 0),
        |b AS (SELECT vec_id AS idb, CAST(embedding AS DOUBLE[]) AS vb
        |      FROM embeddings WHERE vec_id % 41 = 0),
        |s AS (SELECT round(list_cosine_similarity(va, vb), 6) AS cs
        |      FROM a CROSS JOIN b WHERE ida <> idb),
        |h AS (SELECT CAST(least(floor(cs * 10), 9) AS INTEGER) AS bucket,
        |             count(*) AS n_pairs
        |      FROM s GROUP BY 1)
        |SELECT bucket, round(CAST(bucket AS DOUBLE) / 10, 6) AS lo,
        |       round(CAST(bucket + 1 AS DOUBLE) / 10, 6) AS hi, n_pairs,
        |       round(CAST(n_pairs AS DOUBLE) / sum(n_pairs) OVER (), 6) AS share
        |FROM h ORDER BY bucket""".stripMargin,
    // content-addressed shards: same md5-hex-prefix arithmetic as
    // text_hash_sample; text is ASCII so octet_length == payload bytes
    "mm_shard_manifest" ->
      """WITH m AS (SELECT CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 16
        |                    AS shard_id,
        |                  CASE CAST(doc_id % 3 AS INTEGER)
        |                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |                    ELSE 'video' END AS media_type,
        |                  octet_length(encode(text)) AS n_bytes
        |           FROM documents)
        |SELECT shard_id, count(*) AS n_assets,
        |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |       CAST(sum(CASE WHEN media_type = 'image' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_image,
        |       CAST(sum(CASE WHEN media_type = 'audio' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_audio,
        |       CAST(sum(CASE WHEN media_type = 'video' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_video
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_drawdown" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |                  round(sum(o_totalprice), 2) AS revenue
        |           FROM orders GROUP BY 1),
        |p AS (SELECT month, revenue,
        |             max(revenue) OVER (ORDER BY month
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |      FROM m)
        |SELECT month, revenue, peak,
        |       round((peak - revenue) / peak, 6) AS drawdown
        |FROM p ORDER BY month""".stripMargin,
    // daily totals rounded BEFORE the windowed quantile so both
    // engines interpolate over identical doubles
    "ev_rolling_p95" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |                  event_type, value FROM events),
        |d AS (SELECT day, event_type, round(sum(value), 2) AS daily_value
        |      FROM e GROUP BY 1, 2)
        |SELECT day, event_type, daily_value,
        |       round(quantile_cont(daily_value, 0.95) OVER (
        |         PARTITION BY event_type ORDER BY day
        |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS p95_7d
        |FROM d ORDER BY day, event_type""".stripMargin,
    "ev_autocorr" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |                  event_type FROM events),
        |d AS (SELECT day, event_type, count(*) AS n FROM e GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.n AS n_t, b.n AS n_t1
        |      FROM d a JOIN d b
        |        ON a.event_type = b.event_type AND b.day = a.day + 1)
        |SELECT event_type, count(*) AS n_pairs,
        |       round(corr(CAST(n_t AS DOUBLE), CAST(n_t1 AS DOUBLE)), 6)
        |         AS autocorr_lag1
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // same seed-centroid assignment chain as sim_cell_balance, with
    // the per-vector similarity carried into the cell rollup
    "sim_cell_cohesion" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS centroid
        |          FROM e WHERE vec_id < 16),
        |assigned AS (
        |  SELECT vec_id, cell_id, sim FROM (
        |    SELECT e.vec_id, c.cell_id,
        |           list_cosine_similarity(e.v, c.centroid) AS sim,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.v, c.centroid) DESC,
        |                      c.cell_id) AS rn
        |    FROM e CROSS JOIN cents c) t WHERE rn = 1)
        |SELECT cell_id, count(*) AS n_vectors,
        |       round(avg(sim), 6) AS mean_sim, round(min(sim), 6) AS min_sim
        |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin,
    // ranking runs on the ROUNDED score so both engines break the
    // same ties by term
    "text_source_keywords" ->
      """WITH t AS (SELECT source, x AS term FROM documents,
        |                unnest(string_split(lower(text), ' ')) AS u(x)
        |           WHERE length(x) > 0),
        |tf AS (SELECT source, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |ns AS (SELECT count(DISTINCT source) AS n_sources FROM documents),
        |s AS (SELECT tf.source, tf.term, tf.tf, df.df,
        |             round(tf.tf * ln(CAST(n_sources AS DOUBLE) / df.df), 6)
        |               AS score
        |      FROM tf JOIN df USING (term) CROSS JOIN ns),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |                  ORDER BY score DESC, term) AS rnk FROM s)
        |SELECT source, rnk, term, tf, df, score
        |FROM r WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin,
    "ev_value_percentiles" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(avg(value), 4) AS mean_value,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90,
        |       round(quantile_cont(value, 0.99), 4) AS p99,
        |       round(max(value), 4) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the shared banded-pair chain at threshold 0 → ≤17-level rollup
    "dedup_est_jaccard_hist" ->
      s"""WITH ${minhashPairCtes("documents")}
         |SELECT est_jaccard, count(*) AS n_pairs FROM (
         |  SELECT round(len(list_filter(range(1, 17), i -> sa[i] = sb[i])) / 16.0, 6)
         |           AS est_jaccard
         |  FROM pairs) q
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_simhash_topk" ->
      s"""WITH $simhashMd5Cte,
         |q AS (SELECT doc_id AS qid, simhash32 AS qfp FROM fp WHERE doc_id < 10),
         |s AS (SELECT qid, f.doc_id AS cid,
         |             CAST(bit_count(xor(qfp, f.simhash32)) AS BIGINT) AS hamming
         |      FROM q CROSS JOIN fp f WHERE f.doc_id <> qid),
         |r AS (SELECT qid, cid, hamming,
         |             row_number() OVER (PARTITION BY qid
         |               ORDER BY hamming, cid) AS rnk FROM s)
         |SELECT qid, rnk, cid, hamming FROM r WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    "ev_session_gap_hist" ->
      """WITH g AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events),
        |marked AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |sess AS (
        |  SELECT user_id, ts_us,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        |           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked),
        |starts AS (SELECT user_id, session_id, min(ts_us) AS start_us
        |           FROM sess GROUP BY 1, 2),
        |lagged AS (
        |  SELECT start_us - lag(start_us) OVER (PARTITION BY user_id
        |           ORDER BY start_us) AS gap_us
        |  FROM starts),
        |-- filter BEFORE least: least(NULL, cap) = cap in DuckDB, which
        |-- would admit each user's first session as a phantom cap-bucket gap
        |gaps AS (SELECT least(gap_us // 3600000000, 168) AS gap_hours
        |         FROM lagged WHERE gap_us IS NOT NULL),
        |c AS (SELECT gap_hours, count(*) AS n_gaps FROM gaps GROUP BY 1)
        |SELECT gap_hours, n_gaps,
        |       round(CAST(n_gaps AS DOUBLE) / sum(n_gaps) OVER (), 6) AS share
        |FROM c ORDER BY 1""".stripMargin,
    // prefix filtering (Bayardo 2007): rarity order is the identical
    // zero-padded (df, token) string key in both engines
    "dedup_prefix_pairs" ->
      """WITH t AS (SELECT DISTINCT doc_id, x AS tok
        |           FROM (SELECT * FROM documents WHERE doc_id % 5 = 0) d,
        |                unnest(string_split(lower(text), ' ')) AS u(x)
        |           WHERE length(x) > 0),
        |df AS (SELECT tok, count(*) AS df FROM t GROUP BY 1),
        |k AS (SELECT doc_id, lpad(CAST(df AS VARCHAR), 10, '0') || ':' || tok AS key
        |      FROM t JOIN df USING (tok)),
        |pd AS (SELECT doc_id, list_sort(list(key)) AS keys FROM k GROUP BY 1),
        |pl AS (SELECT doc_id, keys, len(keys) AS len,
        |              CAST(len(keys) AS INTEGER)
        |                - CAST(ceil(len(keys) * 0.6) AS INTEGER) + 1 AS p
        |       FROM pd),
        |pref AS (SELECT doc_id, len, unnest(keys[1:p]) AS ktok FROM pl),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM pref a JOIN pref b USING (ktok)
        |         WHERE a.doc_id < b.doc_id
        |           AND least(a.len, b.len) >= greatest(a.len, b.len) * 0.6 - 1e-9),
        |j AS (SELECT doc_a, doc_b,
        |             len(list_intersect(pa.keys, pb.keys)) AS inter,
        |             len(pa.keys) AS la, len(pb.keys) AS lb
        |      FROM cand JOIN pd pa ON cand.doc_a = pa.doc_id
        |                JOIN pd pb ON cand.doc_b = pb.doc_id)
        |SELECT doc_a, doc_b,
        |       round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) AS jaccard
        |FROM j WHERE round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin,
    // prefix sums run in the identical ordered frame in both engines,
    // so the unrounded argmax agrees bit-for-bit
    "dedup_cluster_size_hist" ->
      s"""WITH RECURSIVE $groupsMd5Ctes,
         |sizes AS (SELECT group_id, count(*) AS group_size FROM grp GROUP BY 1)
         |SELECT group_size, count(*) AS n_groups
         |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_bigram_entropy" ->
      """WITH d AS (SELECT source,
        |                  list_filter(string_split(lower(text), ' '),
        |                              x -> length(x) > 0) AS ws
        |           FROM documents),
        |p AS (SELECT source, ws[CAST(i AS INTEGER)] AS a,
        |             ws[CAST(i + 1 AS INTEGER)] AS b
        |      FROM d, unnest(range(1, len(ws))) AS u(i)
        |      WHERE len(ws) >= 2),
        |cab AS (SELECT source, a, b, count(*) AS c_ab FROM p GROUP BY 1, 2, 3),
        |ca AS (SELECT source, a, sum(c_ab) AS c_a FROM cab GROUP BY 1, 2)
        |SELECT source, CAST(sum(c_ab) AS BIGINT) AS n_bigrams,
        |       round(-sum(c_ab * ln(CAST(c_ab AS DOUBLE) / c_a)) / sum(c_ab), 6)
        |         AS entropy_rate
        |FROM cab JOIN ca USING (source, a) GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_retention_fit" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |            FROM events),
        |f AS (SELECT user_id, min(day) AS day0 FROM ud GROUP BY 1),
        |b AS (SELECT count(*) AS n_users FROM f),
        |cv AS (SELECT CAST(k AS DOUBLE) AS x,
        |              ln(CAST(n_active AS DOUBLE) / n_users) AS y
        |       FROM (SELECT ud.day - f.day0 AS k, count(*) AS n_active
        |             FROM ud JOIN f USING (user_id)
        |             WHERE ud.day - f.day0 >= 1 GROUP BY 1) t, b),
        |s AS (SELECT count(*) AS n_points, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx FROM cv)
        |SELECT n_points,
        |       round((sxy - sx * sy / n_points)
        |             / (sxx - sx * sx / n_points), 6) AS decay_per_day,
        |       round(sy / n_points - ((sxy - sx * sy / n_points)
        |             / (sxx - sx * sx / n_points)) * sx / n_points, 6) AS intercept,
        |       round(ln(2) / -((sxy - sx * sy / n_points)
        |             / (sxx - sx * sx / n_points)), 4) AS half_life_days
        |FROM s""".stripMargin,
    // marginals come from the PAIR table; ranking on the rounded pmi
    "text_skipgram_pmi" ->
      """WITH d AS (SELECT list_filter(string_split(lower(text), ' '),
        |                              x -> length(x) > 0) AS ws
        |           FROM documents),
        |p1 AS (SELECT ws[CAST(i AS INTEGER)] AS a, ws[CAST(i + 1 AS INTEGER)] AS b
        |       FROM d, unnest(range(1, len(ws))) AS u(i) WHERE len(ws) >= 2),
        |p2 AS (SELECT ws[CAST(i AS INTEGER)] AS a, ws[CAST(i + 2 AS INTEGER)] AS b
        |       FROM d, unnest(range(1, len(ws) - 1)) AS u(i) WHERE len(ws) >= 3),
        |p AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2),
        |cab AS (SELECT a, b, count(*) AS c_ab FROM p GROUP BY 1, 2),
        |ca AS (SELECT a, sum(c_ab) AS c_a FROM cab GROUP BY 1),
        |cb AS (SELECT b, sum(c_ab) AS c_b FROM cab GROUP BY 1),
        |n AS (SELECT sum(c_ab) AS n_pairs FROM cab),
        |s AS (SELECT cab.a, cab.b, c_ab,
        |             round(ln(CAST(n_pairs AS DOUBLE) * c_ab / (c_a * c_b)), 6)
        |               AS pmi
        |      FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN n
        |      WHERE c_ab >= 5)
        |SELECT a, b, c_ab, pmi FROM s ORDER BY pmi DESC, a, b LIMIT 20""".stripMargin,
    "ev_behavior_sim" ->
      """WITH v AS (SELECT user_id,
        |  [CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE),
        |   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE),
        |   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE),
        |   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS DOUBLE),
        |   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE)] AS v
        |           FROM events GROUP BY 1),
        |q AS (SELECT user_id AS qid, v AS qv FROM v WHERE user_id < 10),
        |s AS (SELECT qid, c.user_id AS cid,
        |             round(list_cosine_similarity(qv, c.v), 6) AS cos_sim
        |      FROM q CROSS JOIN v c WHERE c.user_id <> qid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |               ORDER BY cos_sim DESC, cid) AS rnk FROM s)
        |SELECT qid, rnk, cid, cos_sim FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    "dedup_assortativity" -> assortativityOracle,
    "sim_mmr_rerank" -> mmrOracle(),
    // per-user metric rounded before arm sums; Welch t from raw-sum identity
    "ev_ab_test" ->
      """WITH m AS (SELECT user_id,
        |             round(sum(CASE WHEN event_type = 'purchase' THEN value
        |                       ELSE 0.0 END), 6) AS m
        |           FROM events GROUP BY 1),
        |g AS (SELECT m,
        |             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |               AS BIGINT) % 2 AS grp FROM m),
        |w AS (SELECT
        |  count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |  count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |  sum(CASE WHEN grp = 0 THEN m ELSE 0.0 END) AS sx_a,
        |  sum(CASE WHEN grp = 1 THEN m ELSE 0.0 END) AS sx_b,
        |  sum(CASE WHEN grp = 0 THEN m * m ELSE 0.0 END) AS sx2_a,
        |  sum(CASE WHEN grp = 1 THEN m * m ELSE 0.0 END) AS sx2_b FROM g)
        |SELECT n_a, n_b,
        |       round(sx_a / n_a, 6) AS mean_a, round(sx_b / n_b, 6) AS mean_b,
        |       CASE WHEN n_a > 1 AND n_b > 1 THEN
        |         round((sx_a / n_a - sx_b / n_b) /
        |           sqrt(((sx2_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
        |              + ((sx2_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b), 4)
        |       END AS welch_t,
        |       round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)
        |         AS srm_chi2
        |FROM w""".stripMargin,
    // MDE = 2.801585·SE (α=0.05 two-sided, power 0.8), raw-sums SEs
    "ev_power_analysis" ->
      """WITH u AS (SELECT user_id,
        |             round(sum(CASE WHEN event_type = 'purchase' THEN value
        |                       ELSE 0.0 END), 6) AS m,
        |             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |               AS conv
        |           FROM events GROUP BY 1),
        |g AS (SELECT m, conv,
        |        CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |          AS BIGINT) % 2 AS grp FROM u),
        |s AS (SELECT count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |             count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |             sum(CASE WHEN grp = 0 THEN m ELSE 0.0 END) AS sx_a,
        |             sum(CASE WHEN grp = 1 THEN m ELSE 0.0 END) AS sx_b,
        |             sum(CASE WHEN grp = 0 THEN m * m ELSE 0.0 END) AS sx2_a,
        |             sum(CASE WHEN grp = 1 THEN m * m ELSE 0.0 END) AS sx2_b,
        |             CAST(sum(conv) AS BIGINT) AS c FROM g)
        |SELECT n_a, n_b,
        |  round((sx_a + sx_b) / (n_a + n_b), 6) AS baseline_value,
        |  round(CAST(c AS DOUBLE) / (n_a + n_b), 6) AS baseline_rate,
        |  CASE WHEN n_a > 1 AND n_b > 1 THEN
        |    round(2.801585 * sqrt(
        |      ((sx2_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
        |      + ((sx2_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b), 6)
        |  END AS mde_value,
        |  CASE WHEN CAST(c AS DOUBLE) / (n_a + n_b) > 0
        |        AND CAST(c AS DOUBLE) / (n_a + n_b) < 1 THEN
        |    round(2.801585 * sqrt(CAST(c AS DOUBLE) / (n_a + n_b)
        |      * (1.0 - CAST(c AS DOUBLE) / (n_a + n_b))
        |      * (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b)), 6)
        |  END AS mde_conversion
        |FROM s""".stripMargin,
    // pooled two-proportion z on exact integer counts
    "ev_ab_conversion" ->
      """WITH u AS (SELECT user_id,
        |             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |               AS conv
        |           FROM events GROUP BY 1),
        |g AS (SELECT conv,
        |        CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |          AS BIGINT) % 2 AS grp FROM u),
        |s AS (SELECT count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |             count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |             CAST(sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT)
        |               AS c_a,
        |             CAST(sum(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT)
        |               AS c_b FROM g)
        |SELECT n_a, n_b, c_a, c_b,
        |       round(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
        |       round(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
        |       CASE WHEN CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) > 0
        |             AND CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) < 1 THEN
        |         round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
        |           / sqrt(CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
        |             * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |             * (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b)), 4)
        |       END AS z
        |FROM s""".stripMargin,
    // seed-centroid assignment (iters=0) + majority label per cell
    "sim_cell_purity" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cents AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS centroid
        |          FROM e WHERE vec_id < 16),
        |assigned AS (
        |  SELECT vec_id, label, cell_id FROM (
        |    SELECT e.vec_id, e.label, c.cell_id,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.v, c.centroid) DESC,
        |               c.cell_id) AS rn
        |    FROM e CROSS JOIN cents c) t WHERE rn = 1),
        |cl AS (SELECT cell_id, label, count(*) AS n FROM assigned GROUP BY 1, 2),
        |w AS (SELECT cell_id, label, n,
        |             CAST(sum(n) OVER (PARTITION BY cell_id) AS BIGINT)
        |               AS n_vectors,
        |             row_number() OVER (PARTITION BY cell_id
        |               ORDER BY n DESC, label) AS rn FROM cl)
        |SELECT cell_id, n_vectors, label AS majority_label,
        |       round(CAST(n AS DOUBLE) / n_vectors, 6) AS purity
        |FROM w WHERE rn = 1 ORDER BY cell_id""".stripMargin,
    // θ = cov/var from one raw-sums pass; same splits as ab_test / did
    "ev_cuped" ->
      """WITH e AS (SELECT user_id, event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |u AS (SELECT user_id,
        |        round(sum(CASE WHEN event_type = 'purchase'
        |          AND day < (d0 + d1 + 1) // 2 THEN value ELSE 0.0 END), 6) AS x,
        |        round(sum(CASE WHEN event_type = 'purchase'
        |          AND day >= (d0 + d1 + 1) // 2 THEN value ELSE 0.0 END), 6) AS y
        |      FROM e, b GROUP BY 1),
        |g AS (SELECT x, y,
        |        CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |          AS BIGINT) % 2 AS grp FROM u),
        |s AS (SELECT count(*) AS n,
        |        count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |        count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |        sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |        sum(x * x) AS sx2, sum(y * y) AS sy2,
        |        sum(CASE WHEN grp = 0 THEN x ELSE 0.0 END) AS sx_a,
        |        sum(CASE WHEN grp = 1 THEN x ELSE 0.0 END) AS sx_b,
        |        sum(CASE WHEN grp = 0 THEN y ELSE 0.0 END) AS sy_a,
        |        sum(CASE WHEN grp = 1 THEN y ELSE 0.0 END) AS sy_b FROM g)
        |SELECT n_a, n_b,
        |  CASE WHEN n * sx2 - sx * sx > 0 THEN
        |    round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) END AS theta,
        |  round(sy_a / n_a - sy_b / n_b, 6) AS effect_raw,
        |  CASE WHEN n * sx2 - sx * sx > 0 THEN
        |    round(sy_a / n_a - sy_b / n_b
        |      - (n * sxy - sx * sy) / (n * sx2 - sx * sx)
        |        * (sx_a / n_a - sx_b / n_b), 6) END AS effect_cuped,
        |  CASE WHEN n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0 THEN
        |    round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |      / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6)
        |  END AS var_reduction
        |FROM s""".stripMargin,
    // an order is "new" iff it falls in its customer's first month
    "q_revenue_accounting" ->
      """WITH w AS (SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS month,
        |                  o_totalprice FROM orders),
        |f AS (SELECT o_custkey, min(month) AS first_month FROM w GROUP BY 1),
        |m AS (SELECT month,
        |        round(sum(CASE WHEN month = first_month THEN o_totalprice
        |                  ELSE 0.0 END), 2) AS revenue_new,
        |        round(sum(CASE WHEN month <> first_month THEN o_totalprice
        |                  ELSE 0.0 END), 2) AS revenue_repeat
        |      FROM w JOIN f USING (o_custkey) GROUP BY 1)
        |SELECT month, revenue_new, revenue_repeat,
        |       round(revenue_new / (revenue_new + revenue_repeat), 6) AS share_new
        |FROM m ORDER BY month""".stripMargin,
    // 2×2 arm × half-period cells over FIXED arm user counts
    "ev_diff_in_diff" ->
      """WITH e AS (SELECT user_id, event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |eb AS (SELECT user_id, event_type, value,
        |         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |           AS BIGINT) % 2 AS grp,
        |         day >= (d0 + d1 + 1) // 2 AS is_post
        |       FROM e, b),
        |c AS (SELECT
        |  sum(CASE WHEN grp = 0 AND NOT is_post THEN value ELSE 0.0 END) AS v_t_pre,
        |  sum(CASE WHEN grp = 0 AND is_post THEN value ELSE 0.0 END) AS v_t_post,
        |  sum(CASE WHEN grp = 1 AND NOT is_post THEN value ELSE 0.0 END) AS v_c_pre,
        |  sum(CASE WHEN grp = 1 AND is_post THEN value ELSE 0.0 END) AS v_c_post
        |  FROM eb WHERE event_type = 'purchase'),
        |u AS (SELECT count(CASE WHEN grp = 0 THEN 1 END) AS n_t,
        |             count(CASE WHEN grp = 1 THEN 1 END) AS n_c
        |      FROM (SELECT DISTINCT user_id, grp FROM eb) z)
        |SELECT n_t, n_c,
        |       round(v_t_pre / n_t, 6) AS treated_pre,
        |       round(v_t_post / n_t, 6) AS treated_post,
        |       round(v_c_pre / n_c, 6) AS control_pre,
        |       round(v_c_post / n_c, 6) AS control_post,
        |       round((v_t_post / n_t - v_t_pre / n_t)
        |             - (v_c_post / n_c - v_c_pre / n_c), 6) AS did_effect
        |FROM c, u""".stripMargin,
    // stopword/punctuation-delimited phrases; word score = degree/frequency
    "text_rake_keywords" ->
      """WITH ph0 AS (SELECT unnest(string_split(regexp_replace(lower(text),
        |    '\b(?:the|a|an|of|to|and|in|is|on|that|for|with)\b|[.!?,;:]',
        |    '|', 'g'), '|')) AS raw FROM documents),
        |p AS (SELECT list_filter(string_split(raw, ' '), x -> length(x) > 0) AS ws
        |      FROM ph0),
        |occ AS (SELECT array_to_string(ws, ' ') AS phrase, ws FROM p
        |        WHERE len(ws) BETWEEN 1 AND 4),
        |wstat AS (SELECT word,
        |            round(CAST(sum(len) AS DOUBLE) / count(*), 6) AS w_score
        |          FROM (SELECT len(ws) AS len, unnest(ws) AS word FROM occ) z
        |          GROUP BY 1),
        |phr AS (SELECT phrase, count(*) AS n_occ FROM occ GROUP BY 1),
        |pw AS (SELECT phrase, n_occ,
        |              unnest(list_filter(string_split(phrase, ' '),
        |                                 x -> length(x) > 0)) AS word
        |       FROM phr),
        |s AS (SELECT phrase, n_occ, round(sum(w_score), 4) AS score
        |      FROM pw JOIN wstat USING (word) GROUP BY 1, 2)
        |SELECT phrase, n_occ, score FROM s
        |ORDER BY score DESC, phrase LIMIT 20""".stripMargin,
    // ab_test sliced by pooled activity terciles; effect from unrounded means
    "ev_ab_hte" ->
      """WITH u AS (SELECT user_id, count(*) AS n_events,
        |             round(sum(CASE WHEN event_type = 'purchase' THEN value
        |                       ELSE 0.0 END), 6) AS m
        |           FROM events GROUP BY 1),
        |g AS (SELECT n_events, m,
        |             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |               AS BIGINT) % 2 AS grp FROM u),
        |thr AS (SELECT quantile_cont(CAST(n_events AS DOUBLE),
        |                 list_transform(range(1, 3), i -> i / 3.0)) AS thr FROM g),
        |seg AS (SELECT m, grp,
        |          CAST(len(list_filter(thr, t -> t < n_events)) AS INTEGER)
        |            AS segment
        |        FROM g, thr),
        |w AS (SELECT segment,
        |  count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |  count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |  sum(CASE WHEN grp = 0 THEN m ELSE 0.0 END) AS sx_a,
        |  sum(CASE WHEN grp = 1 THEN m ELSE 0.0 END) AS sx_b,
        |  sum(CASE WHEN grp = 0 THEN m * m ELSE 0.0 END) AS sx2_a,
        |  sum(CASE WHEN grp = 1 THEN m * m ELSE 0.0 END) AS sx2_b
        |  FROM seg GROUP BY 1)
        |SELECT segment, n_a, n_b,
        |       round(sx_a / n_a, 6) AS mean_a, round(sx_b / n_b, 6) AS mean_b,
        |       round(sx_a / n_a - sx_b / n_b, 6) AS effect,
        |       CASE WHEN n_a > 1 AND n_b > 1 THEN
        |         round((sx_a / n_a - sx_b / n_b) /
        |           sqrt(((sx2_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
        |              + ((sx2_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b), 4)
        |       END AS welch_t
        |FROM w ORDER BY segment""".stripMargin,
    // Σ 1/(60+rank) over the cosine and inner-product top-10 lists
    "sim_rrf_fusion" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings),
        |sc AS (SELECT qid, cid, round(list_cosine_similarity(qv, cv), 6) AS s
        |       FROM q CROSS JOIN c WHERE qid <> cid),
        |rc AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |         ORDER BY s DESC, cid) AS rc FROM sc),
        |sd AS (SELECT qid, cid, round(list_inner_product(qv, cv), 6) AS s
        |       FROM q CROSS JOIN c WHERE qid <> cid),
        |rd AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |         ORDER BY s DESC, cid) AS rd FROM sd),
        |f AS (SELECT coalesce(rc.qid, rd.qid) AS qid,
        |             coalesce(rc.cid, rd.cid) AS cid,
        |             round(coalesce(CAST(1.0 AS DOUBLE) / (60 + rc.rc), 0.0)
        |                 + coalesce(CAST(1.0 AS DOUBLE) / (60 + rd.rd), 0.0), 6)
        |               AS rrf
        |      FROM (SELECT * FROM rc WHERE rc <= 10) rc
        |      FULL OUTER JOIN (SELECT * FROM rd WHERE rd <= 10) rd
        |        ON rc.qid = rd.qid AND rc.cid = rd.cid),
        |r AS (SELECT qid, cid, rrf,
        |             CAST(row_number() OVER (PARTITION BY qid
        |               ORDER BY rrf DESC, cid) AS INTEGER) AS rnk FROM f)
        |SELECT qid, rnk, cid, rrf FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    // reference half defines the decile bins; shares clamped at 1e-6
    "ev_psi_drift" ->
      """WITH e AS (SELECT event_type, value,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |           FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |eb AS (SELECT event_type, value, day < (d0 + d1 + 1) // 2 AS is_ref
        |       FROM e, b),
        |thr AS (SELECT event_type,
        |               quantile_cont(value,
        |                 list_transform(range(1, 10), i -> i / 10.0)) AS thr
        |        FROM eb WHERE is_ref GROUP BY 1),
        |binned AS (SELECT eb.event_type, is_ref,
        |                  CAST(len(list_filter(thr, t -> t < value)) AS INTEGER)
        |                    AS bin
        |           FROM eb JOIN thr USING (event_type)),
        |c AS (SELECT event_type, bin,
        |             count(CASE WHEN is_ref THEN 1 END) AS nr,
        |             count(CASE WHEN NOT is_ref THEN 1 END) AS nc
        |      FROM binned GROUP BY 1, 2),
        |t AS (SELECT event_type, nr, nc,
        |        greatest(CAST(nr AS DOUBLE)
        |          / sum(nr) OVER (PARTITION BY event_type), 1e-6) AS p,
        |        greatest(CAST(nc AS DOUBLE)
        |          / sum(nc) OVER (PARTITION BY event_type), 1e-6) AS q
        |      FROM c)
        |SELECT event_type, CAST(sum(nr) AS BIGINT) AS n_ref,
        |       CAST(sum(nc) AS BIGINT) AS n_cur,
        |       round(sum((p - q) * ln(p / q)), 6) AS psi
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    // month of each customer's FIRST order; cumulative over the month table
    "q_customer_acquisition" ->
      """WITH f AS (SELECT o_custkey, min(strftime(o_orderdate, '%Y-%m')) AS month
        |           FROM orders GROUP BY 1),
        |m AS (SELECT month, count(*) AS n_new FROM f GROUP BY 1)
        |SELECT month, n_new,
        |       CAST(sum(n_new) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED
        |         PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_customers
        |FROM m ORDER BY month""".stripMargin,
    // top-supplier share per part, floored into 10 risk buckets
    "q_single_source_risk" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey, count(*) AS n_ps
        |            FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT l_partkey, CAST(sum(n_ps) AS BIGINT) AS n_p,
        |             CAST(max(n_ps) AS BIGINT) AS n_top FROM ps GROUP BY 1),
        |b AS (SELECT CAST(least(floor(CAST(n_top AS DOUBLE) / n_p * 10), 9)
        |               AS INTEGER) AS risk_bucket FROM p)
        |SELECT risk_bucket,
        |       round(CAST(risk_bucket AS DOUBLE) / 10.0, 1) AS share_lo,
        |       count(*) AS n_parts
        |FROM b GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // nation revenue rounded to cents BEFORE shares; HHI = Σ share²
    "q_market_hhi" ->
      """WITH rev AS (SELECT r_name AS region, n_name AS nation,
        |               round(sum(o_totalprice), 2) AS rev
        |             FROM orders
        |             JOIN customer ON o_custkey = c_custkey
        |             JOIN nation ON c_nationkey = n_nationkey
        |             JOIN region ON n_regionkey = r_regionkey
        |             GROUP BY 1, 2),
        |s AS (SELECT region,
        |             rev / sum(rev) OVER (PARTITION BY region) AS share
        |      FROM rev)
        |SELECT region, count(*) AS n_nations,
        |       round(sum(share * share), 6) AS hhi
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // first/last from one per-purchase sort; linear splits 1/n; no-touch → direct
    "ev_attribution_models" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |p AS (SELECT user_id, event_id AS pid, ts_us AS pts, value FROM e
        |      WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS tid, ts_us AS tts,
        |             event_type AS channel FROM e WHERE event_type <> 'purchase'),
        |j AS (SELECT pid, value, tid, tts, channel
        |      FROM p LEFT JOIN t ON p.user_id = t.user_id
        |        AND t.tts < p.pts AND p.pts - t.tts <= 1800000000),
        |j2 AS (SELECT *,
        |         row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS rn_f,
        |         row_number() OVER (PARTITION BY pid
        |           ORDER BY tts DESC, tid DESC) AS rn_l,
        |         count(tid) OVER (PARTITION BY pid) AS n,
        |         coalesce(channel, 'direct') AS ch
        |       FROM j),
        |fa AS (SELECT ch AS channel, count(*) AS n_first,
        |              round(sum(value), 4) AS val_first
        |       FROM j2 WHERE rn_f = 1 GROUP BY 1),
        |la AS (SELECT ch AS channel, count(*) AS n_last,
        |              round(sum(value), 4) AS val_last
        |       FROM j2 WHERE rn_l = 1 GROUP BY 1),
        |li AS (SELECT ch AS channel,
        |              round(sum(CASE WHEN n > 0 THEN CAST(1.0 AS DOUBLE) / n
        |                        ELSE CAST(1.0 AS DOUBLE) END), 4) AS credit_linear,
        |              round(sum(CASE WHEN n > 0 THEN value / n ELSE value END), 4)
        |                AS val_linear
        |       FROM j2 GROUP BY 1)
        |SELECT coalesce(fa.channel, la.channel, li.channel) AS channel,
        |       coalesce(n_first, 0) AS n_first,
        |       coalesce(val_first, 0.0) AS val_first,
        |       coalesce(n_last, 0) AS n_last,
        |       coalesce(val_last, 0.0) AS val_last,
        |       coalesce(credit_linear, 0.0) AS credit_linear,
        |       coalesce(val_linear, 0.0) AS val_linear
        |FROM fa FULL OUTER JOIN la ON fa.channel = la.channel
        |        FULL OUTER JOIN li ON coalesce(fa.channel, la.channel) = li.channel
        |ORDER BY channel""".stripMargin,
    // lead(k−1) over the per-user sort IS the pattern match
    "ev_burst_detect" ->
      """WITH e AS (SELECT user_id, event_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |w AS (SELECT user_id, ts_us,
        |             lead(ts_us, 2) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id) AS ts_k FROM e)
        |SELECT user_id, ts_us AS burst_start_us, ts_k AS burst_end_us
        |FROM w WHERE ts_k IS NOT NULL AND ts_k - ts_us <= 1800000000
        |ORDER BY user_id, burst_start_us""".stripMargin,
    // per-group closed-form OLS from five raw sums; x exact, y double
    "q_price_ols_by_flag" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
        |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |             sum(l_extendedprice) AS sy,
        |             sum(CAST(l_quantity AS BIGINT) * l_extendedprice) AS sxy,
        |             CAST(sum(CAST(l_quantity AS BIGINT) *
        |                      CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx2,
        |             sum(l_extendedprice * l_extendedprice) AS sy2
        |           FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN n * sx2 - sx * sx > 0 THEN
        |    round((n * sxy - sx * sy) / CAST(n * sx2 - sx * sx AS DOUBLE), 6)
        |  END AS slope_per_unit,
        |  CASE WHEN n * sx2 - sx * sx > 0 THEN
        |    round(sy / n - (n * sxy - sx * sy)
        |          / CAST(n * sx2 - sx * sx AS DOUBLE) * sx / n, 4)
        |  END AS intercept,
        |  CASE WHEN n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0 THEN
        |    round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |          / (CAST(n * sx2 - sx * sx AS DOUBLE) * (n * sy2 - sy * sy)), 6)
        |  END AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin,
    // one conditional-count pass; ts bounds are exact epoch-µs literals
    "ev_dq_checks" ->
      """WITH e AS (SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT count(*) AS n_rows,
        |       count(*) - count(DISTINCT event_id) AS n_dup_event_ids,
        |       count(CASE WHEN event_id IS NULL THEN 1 END) AS n_null_id,
        |       count(CASE WHEN ts IS NULL THEN 1 END) AS n_null_ts,
        |       count(CASE WHEN user_id IS NULL THEN 1 END) AS n_null_user,
        |       count(CASE WHEN event_type IS NULL THEN 1 END) AS n_null_type,
        |       count(CASE WHEN value IS NULL THEN 1 END) AS n_null_value,
        |       count(CASE WHEN ts_us < 1577836800000000
        |                  OR ts_us >= 2051222400000000 THEN 1 END)
        |         AS n_ts_out_of_range,
        |       count(CASE WHEN value < 0 THEN 1 END) AS n_negative_value,
        |       count(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
        |               ('click', 'error', 'purchase', 'signup', 'view') THEN 1 END)
        |         AS n_unknown_type
        |FROM e""".stripMargin,
    // full-outer coverage + Pearson r of (n_chars, l2 norm) via raw sums
    "mm_text_embedding_align" ->
      """WITH d AS (SELECT doc_id AS id, n_chars FROM documents),
        |e AS (SELECT vec_id AS id,
        |             round(sqrt(list_sum(list_transform(
        |               CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
        |      FROM embeddings),
        |j AS (SELECT coalesce(d.id, e.id) AS id, n_chars, l2_norm
        |      FROM d FULL OUTER JOIN e ON d.id = e.id),
        |mm AS (SELECT CAST(n_chars AS DOUBLE) AS x, l2_norm AS y FROM j
        |       WHERE n_chars IS NOT NULL AND l2_norm IS NOT NULL),
        |s AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sx2, sum(y * y) AS sy2,
        |             count(CASE WHEN y = 0.0 THEN 1 END) AS n_zero_norm FROM mm),
        |c AS (SELECT
        |  count(CASE WHEN n_chars IS NOT NULL AND l2_norm IS NOT NULL THEN 1 END)
        |    AS n_matched,
        |  count(CASE WHEN l2_norm IS NULL THEN 1 END) AS n_text_only,
        |  count(CASE WHEN n_chars IS NULL THEN 1 END) AS n_vector_only FROM j)
        |SELECT n_matched, n_text_only, n_vector_only, n_zero_norm,
        |       CASE WHEN m * sx2 - sx * sx > 0 AND m * sy2 - sy * sy > 0 THEN
        |         round((m * sxy - sx * sy) /
        |               sqrt((m * sx2 - sx * sx) * (m * sy2 - sy * sy)), 6)
        |       END AS len_norm_corr
        |FROM c, s""".stripMargin,
    // pooled-percentile-grid KS; same md5 split / per-user metric as ev_ab_test
    "ev_ab_ks" ->
      """WITH m AS (SELECT user_id,
        |             round(sum(CASE WHEN event_type = 'purchase' THEN value
        |                       ELSE 0.0 END), 6) AS m
        |           FROM events GROUP BY 1),
        |g AS (SELECT m,
        |             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
        |               AS BIGINT) % 2 AS grp FROM m),
        |grid AS (SELECT DISTINCT t FROM (
        |  SELECT unnest(quantile_cont(m,
        |           list_transform(range(1, 20), i -> i / 20.0))) AS t FROM g) z),
        |c AS (SELECT t,
        |        count(CASE WHEN grp = 0 AND m <= t THEN 1 END) AS ca,
        |        count(CASE WHEN grp = 1 AND m <= t THEN 1 END) AS cb
        |      FROM g CROSS JOIN grid GROUP BY 1),
        |tot AS (SELECT count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |               count(CASE WHEN grp = 1 THEN 1 END) AS n_b FROM g)
        |SELECT n_a, n_b,
        |       round(abs(CAST(ca AS DOUBLE) / n_a - CAST(cb AS DOUBLE) / n_b), 6)
        |         AS ks_d,
        |       t AS at_m
        |FROM c, tot ORDER BY ks_d DESC, at_m LIMIT 1""".stripMargin,
    // window-min fingerprint selection; md5-derived 28-bit hashes
    "dedup_winnow_pairs" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |                                      x -> length(x) > 0) AS ws
        |           FROM documents),
        |h AS (SELECT doc_id,
        |             list_transform(range(0, len(ws) - 4 + 1),
        |               i -> CAST(concat('0x', substr(md5(array_to_string(
        |                 ws[CAST(i + 1 AS INTEGER):CAST(i + 4 AS INTEGER)], ' ')),
        |                 1, 7)) AS BIGINT)) AS hs
        |      FROM w WHERE len(ws) >= 4),
        |f AS (SELECT DISTINCT doc_id, fp FROM (
        |        SELECT doc_id,
        |               unnest(list_transform(
        |                 range(0, greatest(len(hs) - 4, 0) + 1),
        |                 j -> list_min(hs[CAST(j + 1 AS INTEGER):
        |                                  CAST(j + 4 AS INTEGER)]))) AS fp
        |        FROM h) z),
        |rare AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 1000),
        |c AS (SELECT f.doc_id, f.fp FROM f JOIN rare USING (fp)),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |      FROM c a JOIN c b USING (fp) WHERE a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_shared FROM p WHERE n_shared >= 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // ln(N/df) weights rounded to 6 before any sum; df-capped vocabulary
    "dedup_weighted_jaccard" ->
      """WITH tok AS (SELECT DISTINCT doc_id, w FROM (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        |                                    x -> length(x) > 0)) AS w
        |  FROM documents) z),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |idf AS (SELECT w, round(ln(CAST(n_docs AS DOUBLE) / df), 6) AS wt FROM (
        |  SELECT w, count(*) AS df FROM tok GROUP BY 1) d, nd
        |  WHERE df * 10 <= n_docs AND df <= 1000),
        |wt AS (SELECT t.doc_id, t.w, i.wt FROM tok t JOIN idf i USING (w)),
        |dw AS (SELECT doc_id, sum(wt) AS w_total FROM wt GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.wt) AS w_inter
        |      FROM wt a JOIN wt b ON a.w = b.w AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |s AS (SELECT doc_a, doc_b,
        |             round(w_inter / (wa.w_total + wb.w_total - w_inter), 6)
        |               AS w_jaccard
        |      FROM p JOIN dw wa ON p.doc_a = wa.doc_id
        |             JOIN dw wb ON p.doc_b = wb.doc_id)
        |SELECT doc_a, doc_b, w_jaccard FROM s WHERE w_jaccard >= 0.3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Σ window-distinct counts / (k·window), short docs fall back to TTR
    "text_mattr" ->
      """WITH w AS (SELECT source,
        |             list_filter(string_split(lower(text), ' '),
        |                         x -> length(x) > 0) AS ws
        |           FROM documents),
        |t AS (SELECT source, CAST(len(ws) AS INTEGER) AS n, ws FROM w
        |      WHERE len(ws) > 0),
        |m AS (SELECT source,
        |  CASE WHEN n >= 25 THEN
        |    round(CAST(list_sum(list_transform(range(0, n - 25 + 1, 10),
        |            i -> len(list_distinct(
        |              ws[CAST(i + 1 AS INTEGER):CAST(i + 25 AS INTEGER)]))))
        |          AS DOUBLE)
        |      / (len(range(0, n - 25 + 1, 10)) * 25), 6)
        |  ELSE round(CAST(len(list_distinct(ws)) AS DOUBLE) / n, 6) END AS mattr
        |  FROM t)
        |SELECT source, count(*) AS n_docs, round(avg(mattr), 4) AS avg_mattr
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact-cents first digit via integer-to-string (no float formatting)
    "q_benford" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |           FROM orders),
        |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
        |               AS first_digit,
        |             count(*) AS n_orders FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_total FROM d)
        |SELECT first_digit, n_orders,
        |       round(CAST(n_orders AS DOUBLE) / n_total, 6) AS share,
        |       round(ln(1.0 + 1.0 / first_digit) / ln(10), 6) AS benford_expected,
        |       round(round(CAST(n_orders AS DOUBLE) / n_total, 6)
        |             - round(ln(1.0 + 1.0 / first_digit) / ln(10), 6), 6) AS excess
        |FROM d, t ORDER BY first_digit""".stripMargin,
    // exact integer rank formula; Σ i·xᵢ in BIGINT cents
    "q_gini" ->
      """WITH s AS (SELECT o_custkey,
        |             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |               AS BIGINT) AS spend_cents
        |           FROM orders GROUP BY 1),
        |r AS (SELECT spend_cents,
        |             row_number() OVER (ORDER BY spend_cents, o_custkey) AS rnk
        |      FROM s),
        |a AS (SELECT count(*) AS n, CAST(sum(spend_cents) AS BIGINT) AS t,
        |             CAST(sum(rnk * spend_cents) AS BIGINT) AS rx FROM r)
        |SELECT n AS n_customers, round(t / 100.0, 2) AS total_spend,
        |       round(2.0 * rx / (CAST(n AS DOUBLE) * t) - (n + 1.0) / n, 6) AS gini
        |FROM a""".stripMargin,
    // first price group where 2·cumweight ≥ total (integer crossing test)
    "q_weighted_median" ->
      """WITH wp AS (SELECT l_extendedprice AS price,
        |              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |            FROM lineitem GROUP BY 1),
        |c AS (SELECT price, w,
        |             CAST(sum(w) OVER (ORDER BY price ROWS BETWEEN UNBOUNDED
        |               PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |             CAST(sum(w) OVER () AS BIGINT) AS t FROM wp)
        |SELECT min(t) AS total_weight, min(price) AS weighted_median_price
        |FROM c WHERE 2 * cum >= t""".stripMargin,
    // survival product as exp(Σ ln) in one ordered frame; censor horizon 24h
    "ev_kaplan_meier" ->
      """WITH e AS (SELECT user_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr
        |           FROM events),
        |s AS (SELECT user_id, min(hr) AS hr0, max(hr) AS hr1 FROM e GROUP BY 1),
        |h AS (SELECT max(hr1) AS max_hr FROM s),
        |l AS (SELECT hr1 - hr0 AS t,
        |             CASE WHEN hr1 < max_hr - 24 THEN 1 ELSE 0 END AS event
        |      FROM s, h),
        |g AS (SELECT t, count(*) AS n_at_t, CAST(sum(event) AS BIGINT) AS d
        |      FROM l GROUP BY 1),
        |k AS (SELECT t, d,
        |             CAST(sum(n_at_t) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
        |               PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
        |      FROM g),
        |v AS (SELECT t, n_risk, d,
        |             round(exp(sum(ln(greatest(1.0 - CAST(d AS DOUBLE) / n_risk,
        |                               1e-300)))
        |               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
        |                 CURRENT ROW)), 6) AS survival
        |      FROM k)
        |SELECT t AS t_hours, n_risk, d AS n_events, survival FROM v
        |WHERE d > 0 ORDER BY t_hours""".stripMargin,
    // per-doc score rounded BEFORE the per-source mean
    "text_readability" ->
      """WITH d AS (SELECT source,
        |  CAST(len(list_filter(string_split(lower(text), ' '),
        |                       x -> length(x) > 0)) AS DOUBLE) AS n_words,
        |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS DOUBLE)
        |    AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
        |    AS n_syllables
        |  FROM documents),
        |f AS (SELECT source, n_words, n_sentences, n_syllables,
        |             round(206.835 - 1.015 * (n_words / n_sentences)
        |                   - 84.6 * (n_syllables / n_words), 6) AS flesch
        |      FROM d WHERE n_words > 0)
        |SELECT source, count(*) AS n_docs, round(avg(flesch), 4) AS avg_flesch,
        |       round(avg(n_words / n_sentences), 4) AS avg_words_per_sentence,
        |       round(avg(n_syllables / n_words), 4) AS avg_syllables_per_word
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_strict_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS v_us FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS c_us FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > v_us
        |        AND ts_us - v_us <= 3600000000 GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts_us) AS p_us FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > c_us
        |        AND ts_us - c_us <= 3600000000 GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click_deadline,
        |       (SELECT count(*) FROM p) AS n_purchase_deadline,
        |       round(CAST((SELECT count(*) FROM p) AS DOUBLE)
        |             / (SELECT count(*) FROM v), 6) AS strict_conversion""".stripMargin,
    "ev_changepoint" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |                  event_type FROM events),
        |d AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
        |m AS (SELECT event_type, day, n,
        |             avg(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type) AS mean_n
        |      FROM d),
        |s AS (SELECT event_type, day, mean_n,
        |             sum(n - mean_n) OVER (PARTITION BY event_type ORDER BY day
        |               ROWS UNBOUNDED PRECEDING) AS s
        |      FROM m),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |               ORDER BY abs(s) DESC, day) AS rn FROM s)
        |SELECT event_type, day AS change_day, round(s, 4) AS cusum_peak,
        |       round(mean_n, 4) AS mean_daily
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
  )

  /** Evidence chain for every query key that has NO DuckDB oracle
    * (engine-specific hashes, sketches, trained models): each maps to
    * (oracle-green twin key if one exists, the ScalaTest spec that
    * pins it). `OracleCoverageSpec` asserts this table stays exactly
    * in sync with `queries`/`oracleSql` — a future oracle-free key
    * cannot land twinless, and a stale entry fails the build.
    */
  def noOracleEvidence: Map[String, (Option[String], String)] = Map(
    // xxhash64 fast paths ↔ md5 twins computing the same pipeline on
    // SQL-expressible hashes
    "dedup_minhash_pairs"    -> (Some("dedup_minhash_md5"), "DedupSpec"),
    "dedup_simhash"          -> (Some("dedup_simhash_md5"), "DedupSpec"),
    "dedup_simhash_neardups" -> (Some("dedup_simhash_md5_neardups"), "DedupSpec"),
    // sketches ↔ exact twins (tolerance specs bound the estimate)
    "q_approx_distinct"        -> (Some("q_distinct"), "RelationalSpec"),
    "q_percentiles_approx"     -> (Some("q_percentiles"), "RelationalSpec"),
    "q_column_profile_approx"  -> (Some("q_column_profile"), "RelationalSpec"),
    "dedup_exact_stats_approx" -> (Some("dedup_exact_stats"), "DedupSpec"),
    "ev_hll_rollup"            -> (Some("ev_distinct_rollup"), "EventOpsSpec"),
    // IVF ANN: deterministic-seed twin + recall report are both green
    "sim_ivf_topk" -> (Some("sim_ivf_topk_seed"), "SimilaritySpec"),
    // language ID: relational modulo-sampled twin + differential spec
    "text_lang_id" -> (Some("text_lang_id_rel"), "TextAnalysisSpec"),
  )
}

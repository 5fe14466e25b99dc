package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries => A, ExtendedQueries => E, PipelineQueries => L, ProfileQueries => P, ScaleQueries => S}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY.md
  * §2 (or the LLM-pipeline extension surface); entries with an equivalent
  * ANSI-SQL formulation also appear in [[oracleSql]] for the DuckDB
  * correctness gate. Column aliases and ORDER BYs match pairwise by
  * construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    A.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (A.pricingSummary _),
    "q02_profile_numeric" -> (P.profileNumeric _),
    "q03_profile_orders" -> (P.profileOrders _),
    "q04_complete_records" -> (P.completeRecords _),
    "q05_length_stats" -> (P.lengthStats _),
    "q06_type_census" -> (P.typeCensus _),
    "q07_topk_values" -> (P.topValues _),
    "q08_topk_patterns" -> (P.topPatterns _),
    "q09_dedup_exact" -> (L.dedupExact _),
    "q10_dedup_minhash" -> (L.dedupMinhash _),
    "q11_dedup_simhash" -> (L.dedupSimhash _),
    "q12_ngram_jaccard" -> (L.ngramJaccard _),
    "q13_knn_cosine" -> (L.knnCosine _),
    "q14_text_quality" -> (L.textQuality _),
    "q15_langid" -> (L.langId _),
    "q16_fingerprints" -> (L.fingerprints _),
    "q17_window_top_orders" -> (A.topOrdersPerCustomer _),
    "q18_join_revenue_nation" -> (A.revenuePerNation _),
    "q19_events_hourly" -> (A.eventsHourly _),
    "q20_quartiles_outliers" -> (A.quartilesOutliers _),
    "q21_distinct_counts" -> (A.distinctCounts _),
    "q22_approx_distinct" -> (A.approxDistinct _),
    "q23_histogram" -> (A.histogram _),
    "q24_embedding_neardup" -> (L.embeddingNearDup _),
    "q25_ann_ivf" -> (L.annIvf _),
    "q26_multimodal" -> (L.multimodal _),
    "q27_correlation" -> (E.correlationMatrix _),
    "q28_rollup" -> (E.revenueRollup _),
    "q29_semi_anti_join" -> (E.semiAntiJoin _),
    "q30_events_stream" -> (L.eventsStream _),
    "q31_stream_moments" -> (E.streamMoments _),
    "q32_set_ops" -> (E.setOps _),
    "q33_scott_histogram" -> (E.scottHistogram _),
    "q34_stream_topk" -> (L.streamTopK _),
    "q35_quartiles_approx" -> (A.quartilesOutliersApprox _),
    "q36_stream_dedup" -> (L.streamDedup _),
    "q37_sessionization" -> (A.sessionization _),
    "q38_asof_join" -> (A.asofJoin _),
    "q39_bucketed_join" -> (A.bucketedRevenue _),
    "q40_neardup_econ" -> (L.neardupEcon _),
    "q41_stream_dedup_wm" -> (L.streamDedupWatermark _),
    "q42_range_join" -> (S.rangeJoinActivity _),
    "q43_stratified_sample" -> (S.stratifiedSample _),
    "q44_tfidf_terms" -> (S.tfidfTerms _),
    "q45_salted_distinct" -> (S.saltedDistinct _),
    "q46_stream_range_join" -> (S.streamRangeJoin _),
    "q47_partition_prune" -> (S.partitionPrune _),
    "q48_hll_cube" -> (S.hllCube _),
    "q49_stream_enrich" -> (S.streamEnrich _),
    "q50_group_quantiles" -> (S.groupQuantiles _),
    "q51_skew_join" -> (S.skewJoinRollup _),
    "q52_per_key_cap" -> (S.perKeyCap _),
    "q53_stream_sessions" -> (S.streamSessions _),
    "q54_label_centroids" -> (S.labelCentroids _),
    "q55_media_decode" -> (S.mediaDecode _),
    "q56_dedup_clusters" -> (S.dedupClusters _),
    "q57_decontaminate" -> (S.decontaminate _),
    "q58_training_mix" -> (S.trainingMix _),
    "q59_stream_window_distinct" -> (S.streamWindowDistinct _),
    "q60_resample_fill" -> (S.resampleFill _),
    "q61_forward_asof" -> (S.forwardAsof _),
    "q62_event_pivot" -> (S.eventPivot _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> A.pricingSummarySql,
    "q02_profile_numeric" -> P.profileNumericSql,
    "q03_profile_orders" -> P.profileOrdersSql,
    "q04_complete_records" -> P.completeRecordsSql,
    "q05_length_stats" -> P.lengthStatsSql,
    "q06_type_census" -> P.typeCensusSql,
    "q07_topk_values" -> P.topValuesSql,
    "q08_topk_patterns" -> P.topPatternsSql,
    "q09_dedup_exact" -> L.dedupExactSql,
    "q10_dedup_minhash" -> L.dedupMinhashSql,
    "q11_dedup_simhash" -> L.dedupSimhashSql,
    "q12_ngram_jaccard" -> L.ngramJaccardSql,
    "q13_knn_cosine" -> L.knnCosineSql,
    "q14_text_quality" -> L.textQualitySql,
    "q15_langid" -> L.langIdSql,
    "q16_fingerprints" -> L.fingerprintsSql,
    "q17_window_top_orders" -> A.topOrdersPerCustomerSql,
    "q18_join_revenue_nation" -> A.revenuePerNationSql,
    "q19_events_hourly" -> A.eventsHourlySql,
    "q20_quartiles_outliers" -> A.quartilesOutliersSql,
    "q21_distinct_counts" -> A.distinctCountsSql,
    "q23_histogram" -> A.histogramSql,
    "q24_embedding_neardup" -> L.embeddingNearDupSql,
    "q26_multimodal" -> L.multimodalSql,
    "q27_correlation" -> E.correlationMatrixSql,
    "q28_rollup" -> E.revenueRollupSql,
    "q29_semi_anti_join" -> E.semiAntiJoinSql,
    "q30_events_stream" -> L.eventsStreamSql,
    "q31_stream_moments" -> E.streamMomentsSql,
    "q32_set_ops" -> E.setOpsSql,
    "q33_scott_histogram" -> E.scottHistogramSql,
    "q36_stream_dedup" -> L.streamDedupSql,
    "q37_sessionization" -> A.sessionizationSql,
    "q38_asof_join" -> A.asofJoinSql,
    "q39_bucketed_join" -> A.bucketedRevenueSql,
    "q40_neardup_econ" -> L.neardupEconSql,
    "q41_stream_dedup_wm" -> L.streamDedupWatermarkSql,
    "q42_range_join" -> S.rangeJoinActivitySql,
    "q43_stratified_sample" -> S.stratifiedSampleSql,
    "q44_tfidf_terms" -> S.tfidfTermsSql,
    "q45_salted_distinct" -> S.saltedDistinctSql,
    "q46_stream_range_join" -> S.streamRangeJoinSql,
    "q47_partition_prune" -> S.partitionPruneSql,
    "q49_stream_enrich" -> S.streamEnrichSql,
    "q50_group_quantiles" -> S.groupQuantilesSql,
    "q51_skew_join" -> S.skewJoinRollupSql,
    "q52_per_key_cap" -> S.perKeyCapSql,
    "q53_stream_sessions" -> S.streamSessionsSql,
    "q54_label_centroids" -> S.labelCentroidsSql,
    "q55_media_decode" -> S.mediaDecodeSql,
    "q56_dedup_clusters" -> S.dedupClustersSql,
    "q57_decontaminate" -> S.decontaminateSql,
    "q58_training_mix" -> S.trainingMixSql,
    "q60_resample_fill" -> S.resampleFillSql,
    "q61_forward_asof" -> S.forwardAsofSql,
    "q62_event_pivot" -> S.eventPivotSql)
}

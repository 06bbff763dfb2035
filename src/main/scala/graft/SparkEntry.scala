package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live under graft.ops; oracle SQL under
  * graft.oracle.OracleSql. Every queries entry is a pure
  * (SparkSession, sfDir) => DataFrame reading only `$sfDir/<table>.parquet`.
  *
  * Entries WITHOUT an OracleSql row (see [[oracleSql]]) are the
  * deliberately-non-SQL-portable ops (HLL sketch, Murmur3 LSH, map-typed
  * output) — the driver records a rows-only check for those and the unit
  * tests in `src/test/scala/graft` pin their semantics.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggregates.aggHashQ1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A — scans / sinks
    "scan_project" -> (ops.Scans.scanProject _),
    "scan_prune_filter" -> (ops.Scans.scanPruneFilter _),
    "sink_roundtrip_csv" -> (ops.Scans.sinkRoundtripCsv _),
    "sink_roundtrip_orc" -> (ops.Scans.sinkRoundtripOrc _),
    "sink_roundtrip_parquet_zstd" -> (ops.Scans.sinkRoundtripParquetZstd _),
    "sink_roundtrip_json" -> (ops.Scans.sinkRoundtripJson _),
    "sink_roundtrip_xml" -> (ops.Scans.sinkRoundtripXml _),
    "sink_dsv2_audit" -> (ops.Scans.sinkDsv2Audit _),
    "sink_append_audit_log" -> (ops.Scans.sinkAppendAuditLog _),
    "scan_census_dsv2" -> (ops.Scans.scanCensusDsv2 _),
    "warehouse_merge_upsert" -> (ops.Scans.warehouseMergeUpsert _),
    "warehouse_merge_scd2" -> (ops.Scans.warehouseMergeScd2 _),
    "sink_partitioned_prune" -> (ops.Scans.sinkPartitionedPrune _),
    "join_bucketed_colocated" -> (ops.Scans.joinBucketedColocated _),
    "scan_schema_evolution" -> (ops.Scans.scanSchemaEvolution _),
    "scan_corrupt_tolerant" -> (ops.Scans.scanCorruptTolerant _),
    // B — filters / projections
    "filter_compound" -> (ops.Filters.filterCompound _),
    "filter_null_like" -> (ops.Filters.filterNullLike _),
    "project_compute" -> (ops.Filters.projectCompute _),
    "project_rename_norm" -> (ops.Filters.projectRenameNorm _),
    "filter_subquery" -> (ops.Filters.filterSubquery _),
    // C — joins
    "join_broadcast_inner" -> (ops.Joins.joinBroadcastInner _),
    "join_shuffle_inner" -> (ops.Joins.joinShuffleInner _),
    "join_left_outer" -> (ops.Joins.joinLeftOuter _),
    "join_full_outer" -> (ops.Joins.joinFullOuter _),
    "join_semi" -> (ops.Joins.joinSemi _),
    "join_anti" -> (ops.Joins.joinAnti _),
    "join_cross" -> (ops.Joins.joinCross _),
    "join_theta" -> (ops.Joins.joinTheta _),
    "join_range_interval" -> (ops.Joins.joinRangeInterval _),
    "join_range_native" -> (ops.Joins.joinRangeNative _),
    "join_asof" -> (ops.Joins.joinAsof _),
    "join_asof_native" -> (ops.Joins.joinAsofNative _),
    "join_asof_tolerance" -> (ops.Joins.joinAsofTolerance _),
    "join_asof_forward" -> (ops.Joins.joinAsofForward _),
    "join_skew_salted" -> (ops.Joins.joinSkewSalted _),
    "sql_tpch_q3" -> (ops.Joins.sqlTpchQ3 _),
    // D — aggregations
    "agg_hash_q1" -> (ops.Aggregates.aggHashQ1 _),
    "agg_distinct" -> (ops.Aggregates.aggDistinct _),
    "agg_rollup" -> (ops.Aggregates.aggRollup _),
    "agg_cube" -> (ops.Aggregates.aggCube _),
    "agg_grouping_sets" -> (ops.Aggregates.aggGroupingSets _),
    "agg_having" -> (ops.Aggregates.aggHaving _),
    "agg_collect_sorted" -> (ops.Aggregates.aggCollectSorted _),
    "agg_udaf_second_max" -> (ops.Aggregates.aggUdafSecondMax _),
    "agg_approx_distinct" -> (ops.Aggregates.aggApproxDistinct _),
    "agg_sketch_union" -> (ops.Aggregates.aggSketchUnion _),
    "agg_sketch_theta" -> (ops.Aggregates.aggSketchTheta _),
    "agg_corr_moments" -> (ops.Aggregates.aggCorrMoments _),
    "agg_approx_percentile" -> (ops.Aggregates.aggApproxPercentile _),
    "agg_skew_salted" -> (ops.Aggregates.aggSkewSalted _),
    "agg_pivot" -> (ops.Aggregates.aggPivot _),
    "agg_unpivot" -> (ops.Aggregates.aggUnpivot _),
    "agg_percentile" -> (ops.Aggregates.aggPercentile _),
    "agg_minmax_by" -> (ops.Aggregates.aggMinmaxBy _),
    "agg_outlier_zscore" -> (ops.Aggregates.aggOutlierZscore _),
    "agg_histogram" -> (ops.Aggregates.aggHistogram _),
    "agg_mode" -> (ops.Aggregates.aggMode _),
    "agg_heavy_hitters" -> (ops.Aggregates.aggHeavyHitters _),
    // E — windows
    "win_rank" -> (ops.Windows.winRank _),
    "win_running_sum" -> (ops.Windows.winRunningSum _),
    "win_sliding_avg" -> (ops.Windows.winSlidingAvg _),
    "win_range_frame" -> (ops.Windows.winRangeFrame _),
    "win_lead_lag" -> (ops.Windows.winLeadLag _),
    "win_ntile_pct" -> (ops.Windows.winNtilePct _),
    "win_first_last" -> (ops.Windows.winFirstLast _),
    // F — sorts / limits / census
    "sort_multi_nulls" -> (ops.SortsCensus.sortMultiNulls _),
    "limit_topk" -> (ops.SortsCensus.limitTopk _),
    "topk_per_group" -> (ops.SortsCensus.topkPerGroup _),
    "census_states" -> (ops.SortsCensus.censusStates _),
    "census_union_byname" -> (ops.SortsCensus.censusUnionByname _),
    "census_clean_cast" -> (ops.SortsCensus.censusCleanCast _),
    "census_sentinel_filter" -> (ops.SortsCensus.censusSentinelFilter _),
    "layout_zorder" -> (ops.Layout.layoutZorder _),
    "layout_compaction" -> ((s, d) => ops.Layout.layoutCompaction(s, d)),
    // G — set ops
    "set_union_distinct" -> (ops.SetOps.setUnionDistinct _),
    "set_intersect" -> (ops.SetOps.setIntersect _),
    "set_except" -> (ops.SetOps.setExcept _),
    // H — scalar functions
    "fn_string" -> (ops.Fns.fnString _),
    "fn_regex" -> (ops.Fns.fnRegex _),
    "fn_date" -> (ops.Fns.fnDate _),
    "fn_math" -> (ops.Fns.fnMath _),
    "fn_cond_null" -> (ops.Fns.fnCondNull _),
    "fn_json" -> (ops.Fns.fnJson _),
    "fn_array" -> (ops.Fns.fnArray _),
    "fn_map" -> (ops.Fns.fnMap _),
    "fn_bitwise" -> (ops.Fns.fnBitwise _),
    "fn_date2" -> (ops.Fns.fnDate2 _),
    "fn_url" -> (ops.Fns.fnUrl _),
    // I — generators / UDFs
    "gen_explode_pos" -> (ops.Fns.genExplodePos _),
    "udf_scalar_fips" -> (ops.Fns.udfScalarFips _),
    "udtf_generator" -> (ops.Fns.udtfGenerator _),
    // J — event-time windowing (batch-checked; true-stream variants in tests)
    "stream_tumbling" -> (ops.StreamingOps.streamTumbling _),
    "stream_sliding" -> (ops.StreamingOps.streamSliding _),
    "stream_session" -> (ops.StreamingOps.streamSession _),
    "funnel_conversion" -> (ops.Events.funnelConversion _),
    "retention_cohorts" -> (ops.Events.retentionCohorts _),
    "path_transitions" -> (ops.Events.pathTransitions _),
    "sessionize_batch" -> (ops.Events.sessionizeBatch _),
    "events_resample_ffill" -> (ops.Events.eventsResampleFfill _),
    "events_interpolate" -> (ops.Events.eventsInterpolate _),
    "events_anomaly" -> (ops.Events.eventsAnomaly _),
    // L — graph analytics
    "graph_triangles" -> (ops.Graphs.graphTriangles _),
    "graph_pagerank" -> (ops.Graphs.graphPagerank _),
    "graph_similar" -> (ops.Graphs.graphSimilar _),
    "graph_health" -> (ops.Graphs.graphSimilarHealth _),
    "graph_components" -> (ops.Graphs.graphComponents _),
    // K — LLM-training-data ops
    "dedup_exact" -> (ops.LlmData.dedupExact _),
    "dedup_substring" -> ((s, d) => ops.LlmData.dedupSubstring(s, d)),
    "dedup_fuzzy" -> (ops.LlmData.dedupFuzzy _),
    "corpus_shard" -> (ops.LlmData.corpusShard _),
    "dedup_minhash" -> (ops.LlmData.dedupMinhash _),
    "dedup_ngram_jaccard" -> (ops.LlmData.dedupNgramJaccard _),
    "dedup_clusters" -> (ops.LlmData.dedupClusters _),
    "dedup_keep_best" -> (ops.LlmData.dedupKeepBest _),
    "dedup_source_overlap" -> (ops.LlmData.dedupSourceOverlap _),
    "dedup_simhash" -> (ops.LlmData.dedupSimhash _),
    "dedup_embedding" -> (ops.LlmData.dedupEmbedding _),
    "dedup_semantic" -> (ops.LlmData.dedupSemantic _),
    "dedup_incremental" -> (ops.LlmData.dedupIncremental _),
    "dedup_end_to_end" -> (ops.LlmData.dedupEndToEnd _),
    "dedup_health" -> (ops.LlmData.dedupHealth _),
    "contamination_ngram" -> ((s, d) => ops.LlmData.contaminationNgram(s, d)),
    "decontaminate" -> ((s, d) => ops.LlmData.decontaminate(s, d)),
    "sample_stratified" -> ((s, d) => ops.LlmData.sampleStratified(s, d)),
    "pack_token_budget" -> ((s, d) => ops.LlmData.packTokenBudget(s, d)),
    "corpus_curation" -> (ops.LlmData.corpusCuration _),
    "sim_topk" -> (ops.LlmData.simTopk _),
    "embedding_stats" -> (ops.LlmData.embeddingStats _),
    "sample_quality_weighted" -> (ops.LlmData.sampleQualityWeighted _),
    "text_surprisal_bigram" -> (ops.LlmData.textSurprisalBigram _),
    "sim_ann_topk" -> (ops.LlmData.simAnnTopk _),
    "sim_ivf_topk" -> (ops.LlmData.simIvfTopk _),
    "sim_pq_topk" -> (ops.LlmData.simPqTopk _),
    "sim_ivfpq_topk" -> (ops.LlmData.simIvfPqTopk _),
    "sample_temperature" -> (ops.LlmData.sampleTemperature _),
    "corpus_drift" -> (ops.LlmData.corpusDrift _),
    "text_langid" -> (ops.LlmData.textLangid _),
    "text_stats" -> (ops.LlmData.textStats _),
    "text_tokens_topk" -> (ops.LlmData.textTokensTopk _),
    "text_tokens_bpe" -> (ops.LlmData.textTokensBpe _),
    "text_tfidf" -> (ops.LlmData.textTfidf _),
    "text_normalize" -> (ops.LlmData.textNormalize _),
    "text_surprisal" -> (ops.LlmData.textSurprisal _),
    "text_bigrams" -> (ops.LlmData.textBigrams _),
    "text_fingerprint" -> (ops.LlmData.textFingerprint _),
    "text_rolling_hash" -> (ops.LlmData.textRollingHash _),
    "text_quality" -> (ops.LlmData.textQuality _),
    "text_repetition" -> (ops.LlmData.textRepetition _),
    "text_pii_scrub" -> (ops.LlmData.textPiiScrub _),
    "text_charset" -> (ops.LlmData.textCharset _),
    "text_readability" -> (ops.LlmData.textReadability _),
    "text_entropy" -> (ops.LlmData.textEntropy _),
    "chunk_tokens" -> ((s, d) => ops.LlmData.chunkTokens(s, d)),
    "pack_sequences" -> ((s, d) => ops.LlmData.packSequences(s, d)),
    "sample_hash_bernoulli" -> (ops.LlmData.sampleHashBernoulli _),
    "sample_reservoir" -> (ops.LlmData.sampleReservoir _),
    "split_holdout" -> (ops.LlmData.splitHoldout _),
    "corpus_mix" -> (ops.LlmData.corpusMix _),
    "dedup_containment" -> (ops.LlmData.dedupContainment _),
    "multimodal_binary_meta" -> (ops.LlmData.multimodalBinaryMeta _),
    "multimodal_decode" -> (ops.LlmData.multimodalDecode _),
    "multimodal_features" -> (ops.LlmData.multimodalFeatures _),
    "multimodal_frame_sample" -> (ops.LlmData.multimodalFrameSample _),
    "multimodal_resize" -> (ops.LlmData.multimodalResize _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracle.OracleSql.all
}

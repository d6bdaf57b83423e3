package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsofJoin, Core, GraphSim, PageRank, RangeJoin, SkewOps, TpchPack, Triangles}
import graft.telemetry.{Rollups, Telemetry}
import graft.llm.{AudioOps, CrossModal, Dedup, ImageOps, Multimodal, SimOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Core.q1PricingSummary _),
    "q6_filter_agg"      -> (Core.q6FilterAgg _),
    "q3_join_agg"        -> (Core.q3JoinAgg _),
    "q5_multi_join"      -> (Core.q5MultiJoin _),
    "q_topk"             -> (Core.qTopK _),
    "q_window_rank"      -> (Core.qWindowRank _),
    "q_semi_join"        -> (Core.qSemiJoin _),
    "q_anti_join"        -> (Core.qAntiJoin _),
    "q_distinct_agg"     -> (Core.qDistinctAgg _),
    "q_rollup"           -> (Core.qRollup _),
    "q_conditional_agg"  -> (Core.qConditionalAgg _),
    "q_scalar_subquery"  -> (Core.qScalarSubquery _),
    "q_asof_join"        -> (AsofJoin.qAsofJoin _),
    "q_asof_nearest"     -> (AsofJoin.qAsofNearest _),
    "q_asof_forward"     -> (AsofJoin.qAsofForward _),
    "q_asof_forward_native" -> (AsofJoin.qAsofForwardNative _),
    "q_asof_tolerance"   -> (AsofJoin.qAsofTolerance _),
    "q_salted_agg"       -> (SkewOps.qSaltedAgg _),
    "q_salted_join"      -> (SkewOps.qSaltedJoin _),
    "q_range_join"       -> ((s, d) => RangeJoin.qRangeJoin(s, d)),
    "q_pivot"            -> (Core.qPivot _),
    "q_cube"             -> (Core.qCube _),
    "text_ngram_freq"    -> (TextOps.ngramFreq _),
    "q_set_ops"          -> (Core.qSetOps _),
    "tel_cumulative_delta" -> (Telemetry.cumulativeDelta _),
    "tel_partition_cols" -> (Telemetry.partitionCols _),
    "tel_value_percentiles" -> (Telemetry.valuePercentiles _),
    "tel_json_props"     -> (Telemetry.jsonProps _),
    "tel_dedup_latest"   -> (Telemetry.dedupLatest _),
    "tel_sessionize"     -> (Telemetry.sessionize _),
    "tel_tumbling_window" -> (Telemetry.tumblingWindow _),
    "tel_error_rate"     -> (Telemetry.errorRate _),
    "tel_value_stats"    -> (Telemetry.valueStats _),
    "tel_histogram"      -> (Telemetry.histogram _),
    "tel_hist_quantile"  -> ((s, d) => Telemetry.histQuantile(s, d)),
    "dedup_exact"        -> (TextOps.dedupExact _),
    "text_fingerprint"   -> (TextOps.fingerprint _),
    "text_tokens"        -> (TextOps.tokenStats _),
    "text_quality"       -> (TextOps.quality _),
    "text_langid"        -> (TextOps.langId _),
    "dedup_minhash_lsh"  -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash"      -> (Dedup.simhash _),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_containment"  -> ((s, d) => Dedup.containment(s, d)),
    "dedup_cluster_stats" -> ((s, d) => Dedup.clusterStats(s, d)),
    "text_shard_overlap" -> ((s, d) => Dedup.shardOverlap(s, d)),
    "dedup_incremental"  -> ((s, d) => Dedup.incrementalDedup(s, d)),
    "tel_pattern_match"  -> ((s, d) => Telemetry.patternMatch(s, d)),
    "text_curation_funnel" -> ((s, d) => TextOps.curationFunnel(s, d)),
    "sim_centroid_outliers" -> ((s, d) => SimOps.centroidOutliers(s, d)),
    "dedup_lsh_recall"   -> ((s, d) => Dedup.lshRecall(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    "sim_topk_bruteforce" -> ((s, d) => SimOps.simTopkBruteforce(s, d)),
    "sim_lsh_ann"        -> ((s, d) => SimOps.lshAnn(s, d)),
    "mm_binary_meta"     -> (Multimodal.binaryMeta _),
    "mm_frame_sample"    -> ((s, d) => Multimodal.frameSample(s, d).toDF()),
    "mm_resize_meta"     -> ((s, d) => Multimodal.resizeMeta(s, d).toDF()),
    "text_winnow"        -> ((s, d) => TextOps.winnowFingerprints(s, d)),
    "tel_approx_distinct" -> (Telemetry.approxDistinct _),
    "tel_approx_percentiles" -> (Telemetry.approxPercentiles _),
    "tel_sample_users"   -> (Telemetry.sampleUsers _),
    "q_full_outer"       -> (Core.qFullOuter _),
    "q_grouping_sets"    -> (Core.qGroupingSets _),
    "q_incremental_merge" -> (Core.qIncrementalMerge _),
    "q_topk_per_group"   -> (Core.qTopKPerGroup _),
    "q_window_topk_rewrite" -> (Core.qWindowTopkRewrite _),
    "tel_moving_avg"     -> (Telemetry.movingAvg _),
    "tel_counter_rate"   -> (Telemetry.counterRate _),
    "text_contamination" -> ((s, d) => TextOps.contamination(s, d)),
    "text_decontam_apply" -> ((s, d) => TextOps.decontamApply(s, d)),
    "mm_frame_meta"      -> ((s, d) => Multimodal.frameSample(s, d).toDF()
                               .select("doc_id", "frame_idx", "frame_len")),
    "tel_gap_fill"       -> (Telemetry.gapFill _),
    "dedup_clusters"     -> ((s, d) => Dedup.dedupClusters(s, d)),
    "sim_ivf_ann"        -> ((s, d) => SimOps.ivfAnn(s, d)),
    "text_balanced_sample" -> ((s, d) => TextOps.balancedSample(s, d)),
    "tel_exp_histogram"  -> (Telemetry.expHistogram _),
    "tel_session_window" -> (Telemetry.sessionWindowAgg _),
    "text_gopher_quality" -> (TextOps.gopherQuality _),
    "text_mix_weights"   -> (TextOps.mixWeights _),
    "sim_int8_topk"      -> ((s, d) => SimOps.int8Topk(s, d)),
    "sim_binary_quant"   -> ((s, d) => SimOps.binaryQuantAnn(s, d)),
    "sim_mmr_diversify"  -> ((s, d) => SimOps.mmrDiversify(s, d)),
    "sim_ivf_pq"         -> ((s, d) => SimOps.ivfPqAnn(s, d)),
    "q_bloom_join"       -> (Core.qBloomJoin _),
    "tel_grid_percentiles" -> (Telemetry.gridPercentiles _),
    "q_lateral_topn"     -> (Core.qLateralTopN _),
    "tel_exp_hist_pctl"  -> (Telemetry.expHistPercentiles _),
    "tel_range_frame"    -> (Telemetry.rangeFrame _),
    "q_unpivot"          -> (Core.qUnpivot _),
    "text_pii_scrub"     -> (TextOps.piiScrubStats _),
    "sim_ivf_nprobe2"    -> ((s, d) => SimOps.ivfAnn(s, d, nprobe = 2)),
    "q_recursive_cte"    -> (Core.qRecursiveCte _),
    "q_set_ops_all"      -> (Core.qSetOpsAll _),
    "q_ntile"            -> (Core.qNtile _),
    "q_nullsafe_join"    -> (Core.qNullsafeJoin _),
    "tel_heavy_hitters"  -> ((s, d) => Telemetry.heavyHitters(s, d)),
    "text_repetition"    -> (TextOps.repetition _),
    "mm_audio_windows"   -> ((s, d) => Multimodal.audioWindows(s, d).toDF()),
    "sim_pq_ann"         -> ((s, d) => SimOps.pqAnn(s, d)),
    "q_window_dist"      -> (Core.qWindowDist _),
    "q_median"           -> (Core.qMedian _),
    "q_winsorize"        -> (Core.qWinsorize _),
    "text_train_split"   -> (TextOps.trainSplit _),
    "q_listagg"          -> (Core.qListagg _),
    "tel_hopping_window" -> (Telemetry.hoppingWindow _),
    "tel_ewma"           -> ((s, d) => Telemetry.ewma(s, d)),
    "tel_anomaly"        -> ((s, d) => Telemetry.anomaly(s, d)),
    "tel_cms_counts"     -> ((s, d) => Telemetry.cmsCounts(s, d)),
    "text_chunking"      -> ((s, d) => TextOps.chunking(s, d)),
    "text_doc_freq"      -> ((s, d) => TextOps.docFreq(s, d)),
    "text_unigram_surprisal" -> ((s, d) => TextOps.unigramSurprisal(s, d)),
    "text_surprisal_buckets" -> ((s, d) => TextOps.surprisalBuckets(s, d)),
    "sim_range_search"   -> ((s, d) => SimOps.rangeSearch(s, d)),
    "sim_kmeans_centroids" -> ((s, d) => SimOps.kmeansCentroids(s, d)),
    "sim_ivf_kmeans"     -> ((s, d) => SimOps.ivfKmeansAnn(s, d)),
    "sim_ivf_persisted"  -> ((s, d) => SimOps.ivfPersisted(s, d)),
    "sim_ivf_append"     -> ((s, d) => SimOps.ivfAppend(s, d)),
    "sim_ivf_append_drift" -> ((s, d) => SimOps.ivfAppendDrift(s, d)),
    "sim_ivf_stats"      -> ((s, d) => SimOps.ivfStats(s, d)),
    "tel_funnel"         -> (Telemetry.funnel _),
    "tel_retention"      -> (Telemetry.retention _),
    "q_corr_regr"        -> (Core.qCorrRegr _),
    "tel_concurrency"    -> ((s, d) => Telemetry.concurrency(s, d)),
    "tel_apdex"          -> ((s, d) => Telemetry.apdex(s, d)),
    "tel_holt"           -> ((s, d) => Telemetry.holt(s, d)),
    "tel_holt_winters"   -> ((s, d) => Telemetry.holtWinters(s, d)),
    "sim_opq_ann"        -> ((s, d) => SimOps.opqAnn(s, d)),
    "q_exists_late"      -> (Core.qExistsLate _),
    "tel_burn_rate"      -> ((s, d) => Telemetry.burnRate(s, d)),
    "tel_slo_multiwindow" -> ((s, d) => Telemetry.sloMultiwindow(s, d)),
    "tel_heatmap"        -> (Telemetry.heatmap _),
    "tel_active_users"   -> (Telemetry.activeUsers _),
    "dedup_ngram_prefix" -> ((s, d) => Dedup.ngramJaccardPrefix(s, d, threshold = 0.5)),
    "tel_transitions"    -> (Telemetry.transitions _),
    "tel_top_movers"     -> (Telemetry.weekOverWeek _),
    "text_weighted_sample" -> ((s, d) => TextOps.weightedSample(s, d)),
    "q_table_profile"    -> (Core.qTableProfile _),
    "dedup_edit_distance" -> ((s, d) => Dedup.editDistance(s, d)),
    "tel_interpolate"    -> (Telemetry.interpolate _),
    "tel_mad"            -> ((s, d) => Telemetry.madOutliers(s, d)),
    "tel_sketch_rollup"  -> (Telemetry.sketchRollup _),
    "sim_opq_trained"    -> ((s, d) => SimOps.opqTrainedAnn(s, d)),
    "q_mode"             -> (Core.qMode _),
    "q_gaps_islands"     -> (Core.qGapsIslands _),
    "q_skyline"          -> (Core.qSkyline _),
    "tel_attribution"    -> ((s, d) => Telemetry.attribution(s, d)),
    "tel_changepoint"    -> (Telemetry.changepoint _),
    "tel_new_vs_returning" -> (Telemetry.newVsReturning _),
    "q_interval_overlap" -> ((s, d) => RangeJoin.intervalOverlap(s, d)),
    "q_interval_overlap_rewrite" ->
      ((s, d) => RangeJoin.intervalOverlapNaive(s, d)),
    "q9_profit"          -> ((s, d) => Core.q9Profit(s, d)),
    "q_dq_suite"         -> ((s, d) => Core.dqSuite(s, d)),
    "tel_ddsketch"       -> ((s, d) => Telemetry.ddsketch(s, d)),
    "tel_ddsketch_native" -> ((s, d) => Telemetry.ddsketchNative(s, d)),
    "tel_psi_drift"      -> ((s, d) => Telemetry.psiDrift(s, d)),
    "tel_ab_test"        -> ((s, d) => Telemetry.abTest(s, d)),
    "tel_kmv_overlap"    -> ((s, d) => Telemetry.kmvOverlap(s, d)),
    "tel_dp_counts"      -> ((s, d) => Telemetry.dpCounts(s, d)),
    "tel_k_anon"         -> ((s, d) => Telemetry.kAnon(s, d)),
    "tel_top_paths"      -> ((s, d) => Telemetry.topPaths(s, d)),
    "tel_seasonal_backtest" -> ((s, d) => Telemetry.seasonalBacktest(s, d)),
    "tel_seasonal"       -> ((s, d) => Telemetry.seasonal(s, d)),
    "tel_rollup_hourly"  -> (Rollups.hourlyProof _),
    "tel_rollup_rewrite" -> (Rollups.rewriteProof _),
    "sink_iceberg_sql"   -> (graft.catalog.IcebergSqlDemo.query _),
    "sink_iceberg_timetravel" ->
      (graft.catalog.IcebergSqlDemo.timeTravelQuery _),
    "sink_iceberg_point" ->
      (graft.catalog.IcebergSqlDemo.pointQuery _),
    "sink_iceberg_ndv" ->
      (graft.catalog.IcebergSqlDemo.ndvQuery _),
    "tel_trace_lookup" ->
      (graft.catalog.IcebergSqlDemo.traceLookupQuery _),
    // the over-threshold (co-partitioned, no-rank-broadcast) arm under
    // the same oracle as q_pagerank: both arms must compute the
    // identical integer-micro fixpoint at any gate setting
    "q_pagerank_copart"  -> ((s, d) =>
      PageRank.bipartiteExact(s, d, broadcastVertexLimit = 0L)),
    "text_bpe_pairs"     -> ((s, d) => TextOps.bpePairs(s, d)),
    // rows-only by design (greedy batched admission is sequential
    // logic no SQL replica expresses); exactness — batch=1 ≡
    // sequential bit-for-bit + per-round savings identity at 64
    // merges — is asserted in Round12OpsSpec
    "text_bpe_train_batched" -> ((s, d) =>
      TextOps.bpeTrainBatched(s, d)),
    "mm_frame_dedup"     -> (Multimodal.frameDedup _),
    "mm_ahash_pairs"     -> ((s, d) => Multimodal.ahashPairs(s, d)),
    "mm_ahash_clusters"  -> ((s, d) => Multimodal.ahashClusters(s, d)),
    "mm_img_meta"        -> (ImageOps.imgMeta _),
    "mm_img_ahash_pairs" -> ((s, d) => ImageOps.imgAhashPairs(s, d)),
    "mm_jpeg_meta"       -> (graft.llm.JpegOps.jpegMeta _),
    "mm_jpeg_ahash_pairs" -> ((s, d) => graft.llm.JpegOps.jpegAhashPairs(s, d)),
    "mm_jpeg_dhash_pairs" -> ((s, d) => graft.llm.JpegOps.jpegDhashPairs(s, d)),
    "mm_img_dhash_pairs" -> ((s, d) => ImageOps.imgDhashPairs(s, d)),
    "mm_img_entropy"     -> ((s, d) => ImageOps.imgEntropy(s, d)),
    "mm_wav_meta"        -> ((s, d) => AudioOps.wavMeta(s, d)),
    "mm_wav_ulaw"        -> ((s, d) => AudioOps.ulawMeta(s, d)),
    "mm_video_scenecut"  -> ((s, d) => ImageOps.videoSceneCuts(s, d)),
    "mm_avi_scenecut"    -> ((s, d) => graft.llm.AviOps.aviSceneCuts(s, d)),
    "mm_wav_windows"     -> ((s, d) => AudioOps.wavWindows(s, d)),
    "mm_img_ahash_clusters" -> ((s, d) => ImageOps.imgAhashClusters(s, d)),
    "mm_img_downsample"  -> (ImageOps.imgDownsample _),
    "mm_txt_joint_embed" -> ((s, d) => CrossModal.jointEmbed(s, d)),
    "mm_txt_joint_pairs" -> ((s, d) => CrossModal.jointPairs(s, d)),
    "mm_txt_curation"    -> ((s, d) => CrossModal.curationMatrix(s, d)),
    "mm_txt_retrieval"   -> ((s, d) => CrossModal.txtRetrieval(s, d)),
    "sim_mrl_rerank"     -> ((s, d) => SimOps.mrlRerank(s, d)),
    "sim_hnsw_ann"       -> ((s, d) => SimOps.hnswAnn(s, d)),
    "dedup_substring"    -> ((s, d) => Dedup.substringPairs(s, d)),
    "dedup_semantic"     -> ((s, d) => Dedup.semantic(s, d)),
    "dedup_semantic_apply" -> ((s, d) => Dedup.semanticApply(s, d)),
    "q_asof_native"      -> (AsofJoin.qAsofNative _),
    "tel_twap"           -> (Telemetry.twap _),
    "text_tfidf"         -> ((s, d) => TextOps.tfidf(s, d)),
    "text_line_dedup"    -> ((s, d) => TextOps.lineDedup(s, d)),
    "tel_m4_downsample"  -> (Telemetry.m4Downsample _),
    "mm_scene_cuts"      -> (Multimodal.sceneCuts _),
    "q_percentile_disc"  -> (Core.qPercentileDisc _),
    "sim_knn_graph"      -> ((s, d) => SimOps.knnGraph(s, d)),
    "sim_nsw_ann"        -> ((s, d) => SimOps.nswAnn(s, d)),
    "sim_nsw_persisted"  -> ((s, d) => SimOps.nswPersisted(s, d)),
    "sim_nsw_recall"     -> ((s, d) => SimOps.nswRecall(s, d)),
    "sim_hnsw_recall"    -> ((s, d) => SimOps.hnswRecall(s, d)),
    "sim_hnsw_ef_sweep"  -> ((s, d) => SimOps.hnswEfSweep(s, d)),
    "tel_lttb"           -> ((s, d) => Telemetry.lttb(s, d)),
    "tel_capacity_forecast" -> ((s, d) => Telemetry.capacityForecast(s, d)),
    "tel_downtime"       -> ((s, d) => Telemetry.downtime(s, d)),
    "text_langid_eval"   -> (TextOps.langIdEval _),
    "q_width_bucket"     -> ((s, d) => Core.qWidthBucket(s, d)),
    "dedup_apply"        -> ((s, d) => Dedup.dedupApply(s, d)),
    "sim_recall_at_k"    -> ((s, d) => SimOps.recallAtK(s, d)),
    "sim_ndcg_eval"      -> ((s, d) => SimOps.ndcgEval(s, d)),
    "sim_ivf_delete"     -> ((s, d) => SimOps.ivfDelete(s, d)),
    "sim_ivf_compact"    -> ((s, d) => SimOps.ivfCompact(s, d)),
    "dedup_source_impact" -> ((s, d) => Dedup.sourceImpact(s, d)),
    "text_token_budget"  -> ((s, d) => TextOps.tokenBudget(s, d)),
    "text_cluster_split" -> ((s, d) => Dedup.clusterSplit(s, d)),
    "mm_wav_clipping"    -> ((s, d) => AudioOps.wavClipping(s, d)),
    "sim_nprobe_sweep"   -> ((s, d) => SimOps.nprobeSweep(s, d)),
    "text_ngram_novelty" -> (TextOps.ngramNovelty _),
    "dedup_threshold_sweep" -> (Dedup.thresholdSweep _),
    "tel_hourly_percentiles" -> (Telemetry.hourlyPercentiles _),
    "tel_cardinality_guard" -> (Telemetry.cardinalityGuard _),
    "q_skew_diagnose"    -> ((s, d) => Core.qSkewDiagnose(s, d)),
    "q_share_of_parent"  -> (Core.qShareOfParent _),
    "tel_freshness"      -> (Telemetry.freshness _),
    "tel_error_budget"   -> ((s, d) => Telemetry.errorBudget(s, d)),
    "text_vocab_growth"  -> ((s, d) => TextOps.vocabGrowth(s, d)),
    "text_char_entropy"  -> ((s, d) => TextOps.charEntropy(s, d)),
    "text_bm25"          -> ((s, d) => TextOps.bm25(s, d)),
    "text_pack_sequences" -> ((s, d) => TextOps.packSequences(s, d)),
    "text_fasttext_quality" -> ((s, d) => TextOps.fasttextQuality(s, d)),
    "text_bpe_train"     -> ((s, d) => TextOps.bpeTrain(s, d)),
    "text_bpe_curve"     -> ((s, d) => TextOps.bpeCurve(s, d)),
    "text_bpe_tokenize"  -> ((s, d) => TextOps.bpeTokenize(s, d)),
    "text_bpe_byte_train" ->
      ((s, d) => TextOps.bpeTrain(s, d, byteLevel = true)),
    "text_bpe_byte_tokenize" ->
      ((s, d) => TextOps.bpeTokenize(s, d, byteLevel = true)),
    "text_unigram_train"    -> ((s, d) => TextOps.unigramTrain(s, d)),
    "text_unigram_tokenize" -> ((s, d) => TextOps.unigramTokenize(s, d)),
    "text_unigram_curve"    -> ((s, d) => TextOps.unigramCurve(s, d)),
    "dedup_tfidf_cosine" -> ((s, d) => Dedup.tfidfCosine(s, d)),
    "sim_embed_stats"    -> ((s, d) => SimOps.embedStats(s, d)),
    "dedup_span_coverage" -> ((s, d) => Dedup.spanCoverage(s, d)),
    "sim_hybrid_rrf"     -> ((s, d) => SimOps.hybridRrf(s, d)),
    "q_pagerank"         -> ((s, d) => PageRank.bipartiteExact(s, d)),
    "text_dsir_weights"  -> ((s, d) => TextOps.dsirWeights(s, d)),
    "text_bigram_surprisal" -> ((s, d) => TextOps.bigramSurprisal(s, d)),
    "dedup_span_apply"   -> ((s, d) => Dedup.spanApply(s, d)),
    "q_triangle_support" -> ((s, d) => Triangles.triangleSupport(s, d)),
    "q_jaccard_neighbors" -> ((s, d) => GraphSim.jaccardNeighbors(s, d)),
    "text_kn_perplexity" -> ((s, d) => TextOps.knPerplexity(s, d)),
    "dedup_canonical"    -> ((s, d) => Dedup.dedupCanonical(s, d)),
    // r10: TPC-H completion pack (operators/TpchPack.scala)
    "q2_min_cost_supp"   -> (TpchPack.q2MinCostSupp _),
    "q7_volume_shipping" -> (TpchPack.q7VolumeShipping _),
    "q8_market_share"    -> (TpchPack.q8MarketShare _),
    "q10_returned_items" -> (TpchPack.q10ReturnedItems _),
    "q11_important_stock" -> (TpchPack.q11ImportantStock _),
    "q12_ship_delay"     -> (TpchPack.q12ShipDelay _),
    "q13_order_count_dist" -> (TpchPack.q13OrderCountDist _),
    "q14_promo_share"    -> (TpchPack.q14PromoShare _),
    "q15_top_supplier"   -> (TpchPack.q15TopSupplier _),
    "q16_supp_part_cnt"  -> (TpchPack.q16SuppPartCnt _),
    "q17_small_qty"      -> (TpchPack.q17SmallQty _),
    "q18_large_orders"   -> (TpchPack.q18LargeOrders _),
    "q19_disjunct"       -> (TpchPack.q19Disjunct _),
    "q20_part_promo_supp" -> (TpchPack.q20PartPromoSupp _),
    "q21_waiting_supp"   -> (TpchPack.q21WaitingSupp _),
    "q22_dormant_custs"  -> (TpchPack.q22DormantCusts _),
    // r18: corpus-health text trio
    "text_ttr"           -> (TextOps.ttr _),
    "text_hapax"         -> (TextOps.hapax _),
    "text_zipf_fit"      -> ((s, d) => TextOps.zipfFit(s, d)),
    // r18: attribute-filtered vector search
    "sim_filtered_ann"   -> ((s, d) => SimOps.filteredAnn(s, d)),
    "sim_filtered_recall" -> ((s, d) => SimOps.filteredRecall(s, d)),
    // r18: Z-order layout lever
    "q_zorder_locality"  -> (graft.operators.ZOrder.qZorderLocality _),
    "q_zorder_pruning"   -> (graft.operators.ZOrder.qZorderPruning _),
    "q_hilbert_locality" -> (graft.operators.ZOrder.qHilbertLocality _),
    // r18: equality-delete + upsert MOR chain
    "sink_iceberg_eqdel" -> (graft.catalog.IcebergSqlDemo.eqdelQuery _),
    // r18: acoustic fingerprint near-dup + clip families
    "mm_audio_fingerprint" -> ((s, d) => AudioOps.audioFingerprint(s, d)),
    "mm_audio_clusters"  -> ((s, d) => AudioOps.audioClusters(s, d)),
    // r18: the PQ family's measurement loop (exact-L2 ground truth)
    "sim_pq_recall"      -> ((s, d) => SimOps.pqRecall(s, d)),
    // r18: Gopher A1 char-weighted repetition filters
    "text_dup_ngram_chars" -> ((s, d) => TextOps.dupNgramChars(s, d)),
    // r18: pairwise cross-source redundancy matrix
    "dedup_source_matrix" -> ((s, d) => Dedup.sourceMatrix(s, d)),
  )

  /** Session confs a query needs ACTIVE AT ACTION TIME. Verify/Bench set
    * these around both plan construction and the action (write/count):
    * each action builds a fresh QueryExecution, so a conf set-and-restored
    * inside the query builder would silently not apply to the re-optimized
    * plan (round-2 ADVICE: the topk rewrite was never exercised). */
  def queryConfs: Map[String, Map[String, String]] = Map(
    "q_window_topk_rewrite" ->
      Map(graft.plans.TopKWindowRewrite.ENABLED_KEY -> "true"),
    // naive inequality join + the automated bucketing rule — same
    // oracle as the hand-bucketed q_interval_overlap
    "q_interval_overlap_rewrite" ->
      Map(graft.plans.RangeJoinRewrite.BIN_KEY -> "7"),
    // raw-events aggregate answered from the hourly rollup — the MV
    // rewrite must be a bit-exact drop-in against the raw-table oracle
    "tel_rollup_rewrite" ->
      Map(graft.plans.RollupRewrite.SPEC_KEY -> Rollups.EventsSpecJson),
    // force the shuffled-join shape (no broadcast) and let the runtime
    // bloom filter inject at local test sizes
    "q_bloom_join" -> Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB"),
  )

  /** Set `confs`, run `body`, restore previous values. */
  def withConfs[T](spark: SparkSession, confs: Map[String, String])(body: => T): T = {
    if (confs.isEmpty) body
    else {
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Morton interleave of 8-bit x/y as unrolled SQL bit terms —
    * mirrors [[graft.operators.ZOrder.zvalue]] term for term. */
  private val ZInterleaveSql: String = (0 until 8).map(i =>
    s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
    .mkString(" + ")

  /** Acoustic-fingerprint CTE chain (analytic samples → perturbation →
    * window energies → delta bits → distinct-fp groups → banded
    * candidates) — shared by mm_audio_fingerprint and the
    * mm_audio_clusters closure. No WITH prefix: the clusters oracle
    * needs WITH RECURSIVE. */
  private val AudioFpCtes: String =
    """v AS (
      | SELECT d.doc_id, i.i,
      |  ('0x' || substr(md5('af:' || CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
      |     CAST(i.i AS VARCHAR)), 1, 4))::BIGINT AS r
      | FROM (SELECT doc_id FROM documents) d
      | CROSS JOIN (SELECT unnest(generate_series(0, 511)) AS i) i),
      |s AS (
      | SELECT doc_id, i,
      |  CASE WHEN i < (doc_id % 3) * 16
      |   THEN (r + 1000) % 65536 ELSE r END AS u
      | FROM v),
      |sx AS (
      | SELECT doc_id, i // 32 AS win,
      |  u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS s
      | FROM s),
      |e AS (SELECT doc_id, win, CAST(sum(abs(s)) AS BIGINT) AS e
      |      FROM sx GROUP BY 1, 2),
      |eb AS (SELECT doc_id, win, e,
      |  lag(e) OVER (PARTITION BY doc_id ORDER BY win) AS pe FROM e),
      |f AS (SELECT doc_id,
      |  CAST(sum(CASE WHEN pe IS NOT NULL AND e > pe
      |    THEN 1 << (win - 1) ELSE 0 END) AS BIGINT) AS fp
      | FROM eb GROUP BY 1),
      |g AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_clips,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc FROM f GROUP BY 1),
      |bands AS (
      | SELECT fp, n_clips, min_doc, b.band,
      |  (fp >> (b.band * 8)) & 255 AS bv
      | FROM g, (SELECT unnest([0, 1]) AS band) b),
      |cand AS (
      | SELECT DISTINCT a.fp AS fa, b.fp AS fb,
      |  a.n_clips AS n_a, b.n_clips AS n_b,
      |  a.min_doc AS doc_a, b.min_doc AS doc_b
      | FROM bands a JOIN bands b
      |  ON a.band = b.band AND a.bv = b.bv AND a.fp < b.fp)""".stripMargin

  /** The 21-level Hilbert quadrant walk as chained CTE iterations —
    * mirrors [[graft.sink.Hilbert.index]] level for level (same fixed
    * n = 2²¹ reflections), carrying the original cell (gx, gy) and its
    * row count through the walk. */
  private val HilbertWalkSql: String = {
    val nMinus1 = (1L << 21) - 1
    (0 until 21).map { lvl =>
      val s = 1L << (20 - lvl)
      val s2 = s * s
      s"""h${lvl + 1} AS (
         | SELECT gx, gy, c,
         |  CASE WHEN (y & $s) = 0
         |   THEN CASE WHEN (x & $s) > 0 THEN $nMinus1 - y ELSE y END
         |   ELSE x END AS x,
         |  CASE WHEN (y & $s) = 0
         |   THEN CASE WHEN (x & $s) > 0 THEN $nMinus1 - x ELSE x END
         |   ELSE y END AS y,
         |  d + $s2 * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
         |                CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
         | FROM h$lvl)""".stripMargin
    }.mkString(",\n")
  }

  /** MinHash-LSH oracle (64 SQL-replicated perms, banded buckets,
    * exact verify) — shared by dedup_minhash_lsh and the
    * dedup_lsh_recall S-curve composition. */
  private val MinhashLshOracle: String =
    """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |hv AS (
        | SELECT doc_id,
        |  list_distinct([('0x'||substr(md5(g),1,15))::BIGINT for g in s]) AS hs
        | FROM sh),
        |mh AS (
        | SELECT doc_id, i,
        |  min(((h % 2147483647) * (2*i+1) + i*2654435761) % 2147483647) AS v
        | FROM (SELECT doc_id, unnest(hs) AS h FROM hv),
        |      (SELECT unnest(generate_series(0,63)) AS i) g
        | GROUP BY doc_id, i),
        |bk AS (
        | SELECT doc_id, i//4 AS band_idx,
        |  md5(string_agg(v::VARCHAR, '-' ORDER BY i)) AS band_key
        | FROM mh GROUP BY doc_id, i//4),
        |cand AS (
        | SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM bk a JOIN bk b ON a.band_idx = b.band_idx
        |  AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |jc AS (
        | SELECT c.doc_a, c.doc_b,
        |  CAST(round(CAST(CAST(len(list_intersect(x.hs, y.hs))*1.0
        |    / len(list_distinct(x.hs || y.hs)) AS VARCHAR)
        |    AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        | FROM cand c JOIN hv x ON c.doc_a = x.doc_id
        |             JOIN hv y ON c.doc_b = y.doc_id)
        |SELECT doc_a, doc_b, jaccard FROM jc WHERE jaccard >= 0.2""".stripMargin

  /** Unrolled quantized-PageRank oracle: aggregation is not allowed in a
    * recursive CTE term, so the 6 damped iterations are generated as 6
    * chained CTEs — each the same integer micro-unit update the Spark
    * side computes (`round(0.85 * rm * w / out_w)` per edge, summed). */
  private def pagerankOracleSql(iters: Int = 6, topK: Int = 25): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         | SELECT v.vertex,
         |  CAST(round(0.15 * 1e6 / nn.n) AS BIGINT) + coalesce(c.s, 0) AS rm
         | FROM v CROSS JOIN nn
         | LEFT JOIN (
         |   SELECT e.dst AS vertex,
         |    CAST(sum(CAST(round(0.85 * r.rm * e.w / o.out_w) AS BIGINT))
         |      AS BIGINT) AS s
         |   FROM e JOIN o USING (src) JOIN r${i - 1} r ON r.vertex = e.src
         |   GROUP BY 1) c USING (vertex))""".stripMargin
    }.mkString(",\n")
    s"""WITH le AS (
       | SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst,
       |  count(*) AS w
       | FROM lineitem GROUP BY 1, 2),
       |e AS (SELECT src, dst, w FROM le
       |      UNION ALL SELECT dst, src, w FROM le),
       |o AS (SELECT src, sum(w) AS out_w FROM e GROUP BY 1),
       |v AS (SELECT DISTINCT src AS vertex FROM e),
       |nn AS (SELECT count(*) AS n FROM v),
       |r0 AS (SELECT vertex, CAST(round(1e6 / nn.n) AS BIGINT) AS rm
       |       FROM v CROSS JOIN nn),
       |$steps
       |SELECT vertex, rm AS rank_micro,
       | CAST(row_number() OVER (ORDER BY rm DESC, vertex) AS BIGINT) AS rnk
       |FROM r$iters QUALIFY rnk <= $topK""".stripMargin
  }

  /** Shared by dedup_span_coverage and its apply/filter step. */
  private val spanCoverageOracle: String =
      """WITH d AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
        |    AS n_tokens
        | FROM documents),
        |sp AS (
        | SELECT doc_id, i AS pos,
        |  md5(array_to_string(toks[i + 1 : i + 10], ' ')) AS span_md5
        | FROM (SELECT doc_id, toks,
        |        unnest(generate_series(0, n_tokens - 10)) AS i
        |       FROM d WHERE n_tokens >= 10) t),
        |dup AS (
        | SELECT span_md5 FROM sp GROUP BY 1
        | HAVING count(DISTINCT doc_id) > 1),
        |j AS (SELECT doc_id, pos, pos + 9 AS span_end
        |      FROM sp JOIN dup USING (span_md5)),
        |w AS (
        | SELECT doc_id, pos, span_end,
        |  max(span_end) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
        | FROM j),
        |isl AS (
        | SELECT doc_id, pos, span_end,
        |  sum(CASE WHEN prev_max_end IS NULL OR pos > prev_max_end + 1
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS island
        | FROM w),
        |per_isl AS (
        | SELECT doc_id, island, max(span_end) - min(pos) + 1 AS island_len,
        |  count(*) AS n_spans
        | FROM isl GROUP BY 1, 2),
        |cov AS (
        | SELECT doc_id, sum(island_len) AS covered_tokens,
        |  sum(n_spans) AS n_dup_spans
        | FROM per_isl GROUP BY 1)
        |SELECT d.doc_id, d.n_tokens,
        | CAST(coalesce(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
        | CAST(coalesce(covered_tokens, 0) AS BIGINT) AS covered_tokens,
        | CAST(coalesce(covered_tokens, 0) AS DOUBLE) / d.n_tokens AS dup_frac
        |FROM d LEFT JOIN cov USING (doc_id)""".stripMargin

  /** Unrolled BPE training oracle: `steps` CTE levels, each = (pair
    * count over the previous symbol table → 1-row argmax → merge
    * application via plain `replace`) — the identical loop
    * `TextOps.bpeTrain` runs with DataFrame jobs. */
  private def bpeOracleSql(steps: Int = 8,
                           byteLevel: Boolean = false): String =
    bpeOracleCtes(steps, byteLevel) ++ (1 to steps).map(k =>
      s"\nSELECT CAST($k AS BIGINT) AS step, pair, merged, n FROM b$k")
      .mkString("", "\nUNION ALL", "")

  /** Same unrolled chain, read out as the compression learning curve
    * (`text_bpe_curve`): per-level corpus-weighted token totals. */
  private def bpeCurveOracleSql(steps: Int = 8): String =
    bpeOracleCtes(steps) ++ "\nSELECT step, total_tokens, total_words," +
      "\n CAST(total_tokens AS DOUBLE)/total_words AS tokens_per_word FROM (" +
      (0 to steps).map(k =>
        s"\nSELECT CAST($k AS BIGINT) AS step," +
        s" CAST(sum(freq*len(string_split(trim(sym), ' '))) AS BIGINT)" +
        s" AS total_tokens, CAST(sum(freq) AS BIGINT) AS total_words FROM w$k")
        .mkString("", "\nUNION ALL", ") t")

  /** Every CTE level is AS MATERIALIZED: w_k is referenced by p_{k+1},
    * w_{k+1} and the final read-out, so DuckDB's default inlining would
    * re-evaluate the chain EXPONENTIALLY (3^steps scans of w0 — the
    * un-materialized curve oracle ran >12 min before being killed);
    * materialization makes the oracle linear like the Spark loop. */
  /** Same chain read out as per-document tokenization under the final
    * vocabulary (`text_bpe_tokenize`): doc words left-join the trained
    * word→token-count table; sub-filter words count as 1 token. */
  private def bpeTokenizeOracleSql(steps: Int = 8,
                                   byteLevel: Boolean = false): String = {
    // byte level: sub-filter words fall back to their BYTE count (every
    // raw byte is a base-alphabet token — the no-OOV guarantee) and the
    // baseline column counts bytes
    val fallback = if (byteLevel) "strlen(dw.w)" else "1"
    val baseline = if (byteLevel) "strlen(dw.w)" else "length(dw.w)"
    bpeOracleCtes(steps, byteLevel) ++
      s""",
        |vocab AS (
        | SELECT w, CAST(len(string_split(trim(sym), ' ')) AS BIGINT)
        |   AS w_tok
        | FROM w$steps),
        |dw AS (
        | SELECT doc_id,
        |  unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        | FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        | CAST(sum(coalesce(v.w_tok, $fallback)) AS BIGINT) AS bpe_tokens,
        | CAST(sum($baseline) AS BIGINT) AS char_tokens,
        | CAST(sum(coalesce(v.w_tok, $fallback)) AS BIGINT)
        |   / CAST(count(*) AS DOUBLE) AS tokens_per_word
        |FROM dw LEFT JOIN vocab v USING (w)
        |GROUP BY 1""".stripMargin
  }

  private def bpeOracleCtes(steps: Int,
                            byteLevel: Boolean = false): String = {
    // byte level: one symbol per UTF-8 byte, rendered as its hex pair
    // (DuckDB's hex(varchar) and Spark's hex(encode(w)) agree) — the
    // GPT-2 byte-BPE alphabet; char level: one symbol per character
    val symInit =
      if (byteLevel) """' ' || regexp_replace(hex(w), '(..)', '\1 ', 'g')"""
      else """' ' || regexp_replace(w, '(.)', '\1 ', 'g')"""
    val sb = new StringBuilder
    sb ++= s"""WITH w0 AS MATERIALIZED (
      | SELECT w, CAST(count(*) AS BIGINT) AS freq,
      |  $symInit AS sym
      | FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      |       FROM documents) t
      | WHERE length(w) >= 2 GROUP BY w)""".stripMargin
    for (k <- 1 to steps) {
      sb ++= s""",
        |p$k AS MATERIALIZED (
        | SELECT t[i] || ' ' || t[i+1] AS pair, CAST(sum(freq) AS BIGINT) AS n
        | FROM (SELECT freq, t, unnest(generate_series(1, len(t)-1)) AS i
        |       FROM (SELECT freq, string_split(trim(sym), ' ') AS t
        |             FROM w${k - 1})) x
        | GROUP BY 1),
        |b$k AS MATERIALIZED (SELECT pair, replace(pair, ' ', '') AS merged, n
        |        FROM p$k ORDER BY n DESC, pair LIMIT 1),
        |w$k AS MATERIALIZED (
        | SELECT w, freq, replace(sym,
        |   ' ' || (SELECT pair FROM b$k) || ' ',
        |   ' ' || (SELECT merged FROM b$k) || ' ') AS sym FROM w${k - 1})"""
        .stripMargin
    }
    sb.toString
  }

  /** Unrolled unigram-LM (SentencePiece) oracle CTEs — the identical
    * seed → Viterbi-EM chain `TextOps.unigramTrain` runs: substring
    * seeds, per-round integer-micro costs, a 12-level forward DP whose
    * composite `(cost*16 + (4-k))` argmin encodes the (min cost, tie →
    * longest piece) rule, a 12-level backtrace collecting the chosen
    * pieces, and the per-round character-preserving prune. Every level
    * is AS MATERIALIZED (the bpeOracleCtes lesson — default CTE
    * inlining re-evaluates the chain exponentially). Produces `v$r`
    * for r = 0..rounds and the cost table `c$r` for each round r
    * (costed FROM v${r-1}); `cF` is the FINAL vocabulary's cost table
    * (what tokenize applies). */
  private def unigramOracleCtes(rounds: Int = 2, seedMulti: Int = 96,
                                vocabMulti: Int = 64): String = {
    val maxPiece = 4
    val maxLen = 12
    val sb = new StringBuilder
    sb ++= s"""WITH uw AS MATERIALIZED (
      | SELECT w, CAST(count(*) AS BIGINT) AS freq
      | FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      |       FROM documents) t
      | WHERE length(w) >= 1 GROUP BY w),
      |useed AS MATERIALIZED (
      | SELECT substr(w, CAST(i AS INT), CAST(k AS INT)) AS piece,
      |  CAST(sum(freq) AS BIGINT) AS cnt
      | FROM (SELECT w, freq, k,
      |        unnest(generate_series(1, length(w) - k + 1)) AS i
      |       FROM (SELECT w, freq,
      |              unnest(generate_series(1, least(length(w), $maxPiece))) AS k
      |             FROM uw))
      | GROUP BY 1),
      |uchars AS MATERIALIZED (SELECT piece FROM useed WHERE length(piece) = 1),
      |udw AS MATERIALIZED (SELECT w, freq FROM uw WHERE length(w) <= $maxLen),
      |v0 AS MATERIALIZED (
      | SELECT piece, cnt FROM useed WHERE length(piece) = 1
      | UNION ALL
      | SELECT piece, cnt FROM (
      |  SELECT piece, cnt,
      |   row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rnk
      |  FROM useed WHERE length(piece) > 1) WHERE rnk <= $seedMulti)"""
      .stripMargin
    def costCte(name: String, from: String): String =
      s""",
        |$name AS MATERIALIZED (
        | SELECT piece, CAST(0 - round(1e6 * round(ln((cnt + 1.0) /
        |   (CAST((SELECT sum(cnt) FROM $from) AS DOUBLE) +
        |    CAST((SELECT count(*) FROM $from) AS DOUBLE))), 4)) AS BIGINT)
        |  AS c
        | FROM $from)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= costCte(s"c$r", s"v${r - 1}")
      // forward-DP + backtrace chain (unigramApplyChain) + piece counts
      sb ++= unigramApplyChain(s"e$r", s"c$r")
      sb ++= s""",
        |e${r}_n AS MATERIALIZED (
        | SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |  ${(1 to maxLen).map(j => s"SELECT piece, freq FROM e${r}_bt$j")
             .mkString("\n  UNION ALL\n  ")}
        | ) GROUP BY 1)""".stripMargin
      sb ++= s""",
        |v$r AS MATERIALIZED (
        | SELECT ch.piece, CAST(coalesce(n.cnt, 0) AS BIGINT) AS cnt
        | FROM uchars ch LEFT JOIN e${r}_n n USING (piece)
        | UNION ALL
        | SELECT piece, cnt FROM (
        |  SELECT piece, cnt,
        |   row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rnk
        |  FROM e${r}_n WHERE length(piece) > 1) WHERE rnk <= $vocabMulti)"""
        .stripMargin
    }
    sb ++= costCte("cF", s"v$rounds")
    sb.toString
  }

  /** `text_unigram_train`: the final vocabulary with usage count,
    * integer-micro cost, and deterministic rank. */
  private def unigramTrainOracleSql(rounds: Int = 2): String =
    unigramOracleCtes(rounds) ++ s"""
      |SELECT v.piece, v.cnt, c.c AS cost_micro,
      | CAST(row_number() OVER (ORDER BY v.cnt DESC, v.piece ASC) AS BIGINT)
      |  AS rnk
      |FROM v$rounds v JOIN cF c USING (piece)""".stripMargin

  /** `text_unigram_curve`: per-EM-round convergence readout from the
    * same unrolled chain — pieces used / total pieces / pieces per DP
    * word per round. */
  private def unigramCurveOracleSql(rounds: Int = 3): String =
    unigramOracleCtes(rounds) ++ s""",
      |wt AS (SELECT CAST(sum(freq) AS BIGINT) AS total_words FROM udw)
      |SELECT round, vocab_used, total_pieces, total_words,
      | CAST(total_pieces AS DOUBLE) / total_words AS pieces_per_word
      |FROM (
      | ${(1 to rounds).map(r =>
           s"SELECT CAST($r AS BIGINT) AS round," +
           s" CAST(count(*) AS BIGINT) AS vocab_used," +
           s" CAST(sum(cnt) AS BIGINT) AS total_pieces FROM e${r}_n")
           .mkString("\n UNION ALL\n ")}
      |) t, wt""".stripMargin

  /** `text_unigram_tokenize`: one more DP chain under the FINAL cost
    * table, read out per document (distinct words segment once, the
    * doc join fans the result out — the Spark plan's exact shape).
    * Words past the DP cap fall back to character pieces. */
  private def unigramTokenizeOracleSql(rounds: Int = 2): String =
    unigramOracleCtes(rounds) ++ {
      val sb = new StringBuilder
      // reuse dpChain's shape under cF via a private inline copy: the
      // apply-time chain is generated by the same code path (prefix tF)
      sb ++= unigramApplyChain("tF", "cF")
      sb ++= s""",
        |dcnt AS MATERIALIZED (
        | SELECT w, CAST(count(*) AS BIGINT) AS n_pieces FROM (
        |  ${(1 to 12).map(j => s"SELECT w, piece FROM tF_bt$j")
             .mkString("\n  UNION ALL\n  ")}
        | ) GROUP BY w),
        |dcost AS MATERIALIZED (
        | SELECT w, cost FROM tF_s WHERE pos = length(w)),
        |lseg AS MATERIALIZED (
        | SELECT w, CAST(length(w) AS BIGINT) AS n_pieces,
        |  CAST(sum(c.c) AS BIGINT) AS cost
        | FROM (SELECT w, substr(w, CAST(i AS INT), 1) AS piece
        |       FROM (SELECT w, unnest(generate_series(1, length(w))) AS i
        |             FROM uw WHERE length(w) > 12)) x
        | JOIN cF c USING (piece) GROUP BY w),
        |wseg AS MATERIALIZED (
        | SELECT d.w, d.n_pieces, dc.cost FROM dcnt d JOIN dcost dc USING (w)
        | UNION ALL
        | SELECT w, n_pieces, cost FROM lseg),
        |dw AS (
        | SELECT doc_id,
        |  unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        | FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        | CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
        | CAST(sum(cost) AS BIGINT) AS cost_micro,
        | CAST(sum(n_pieces) AS BIGINT) / CAST(count(*) AS DOUBLE)
        |  AS pieces_per_word
        |FROM dw JOIN wseg USING (w)
        |GROUP BY 1""".stripMargin
      sb.toString
    }

  /** The apply-time DP chain (forward + backtrace) under cost table
    * `c`, prefix `p` — same generator the training rounds use. */
  private def unigramApplyChain(p: String, c: String): String = {
    val maxPiece = 4
    val maxLen = 12
    val sb2 = new StringBuilder
    sb2 ++= s""",
      |${p}_f0 AS MATERIALIZED (
      | SELECT w, freq, CAST(0 AS BIGINT) AS cost FROM udw)""".stripMargin
    for (i <- 1 to maxLen) {
      val arms = (1 to math.min(i, maxPiece)).map { k =>
        s"""SELECT f.w, f.freq,
           |   (f.cost + c.c) * 16 + (${maxPiece} - $k) AS comp
           |  FROM ${p}_f${i - k} f JOIN $c c
           |   ON c.piece = substr(f.w, ${i - k + 1}, $k)
           |  WHERE length(f.w) >= $i""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      sb2 ++= s""",
        |${p}_f$i AS MATERIALIZED (
        | SELECT w, freq, CAST(min(comp) // 16 AS BIGINT) AS cost,
        |  CAST($maxPiece - (min(comp) % 16) AS BIGINT) AS k
        | FROM (
        |  $arms
        | ) GROUP BY w, freq)""".stripMargin
    }
    sb2 ++= s""",
      |${p}_s AS MATERIALIZED (
      | ${(1 to maxLen).map(i =>
           s"SELECT w, CAST($i AS BIGINT) AS pos, k, cost FROM ${p}_f$i")
           .mkString("\n UNION ALL\n ")})""".stripMargin
    sb2 ++= s""",
      |${p}_bt0 AS MATERIALIZED (
      | SELECT w, freq, CAST(length(w) AS BIGINT) AS pos FROM udw)"""
      .stripMargin
    for (j <- 1 to maxLen) {
      sb2 ++= s""",
        |${p}_bt$j AS MATERIALIZED (
        | SELECT b.w, b.freq, b.pos - s.k AS pos,
        |  substr(b.w, CAST(b.pos - s.k + 1 AS INT), CAST(s.k AS INT))
        |   AS piece
        | FROM ${p}_bt${j - 1} b JOIN ${p}_s s
        |  ON s.w = b.w AND s.pos = b.pos
        | WHERE b.pos > 0)""".stripMargin
    }
    sb2.toString
  }

  /** Shared by `q_interval_overlap` (hand-bucketed plan) and
    * `q_interval_overlap_rewrite` (naive join + RangeJoinRewrite rule) —
    * one oracle proving the optimizer rewrite is a bit-exact drop-in. */
  private val intervalOverlapOracleSql: String =
    """WITH iv AS (
      | SELECT l_suppkey AS s, l_orderkey AS ok,
      |  CAST(l_linenumber AS BIGINT) AS ln,
      |  CAST(l_quantity AS BIGINT) AS q,
      |  epoch_us(l_shipdate)//86400000000 AS lo,
      |  epoch_us(l_shipdate)//86400000000 + 1
      |    + CAST(l_quantity AS BIGINT) % 14 AS hi
      | FROM lineitem),
      |p AS (
      | SELECT a.s, least(a.hi, b.hi) - greatest(a.lo, b.lo) + 1 AS od
      | FROM iv a JOIN iv b ON a.s = b.s
      |  AND (a.ok, a.ln, a.lo, a.q) < (b.ok, b.ln, b.lo, b.q)
      |  AND a.lo <= b.hi AND b.lo <= a.hi),
      |pc AS (
      | SELECT s, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(od) AS BIGINT) AS sd, CAST(max(od) AS BIGINT) AS mx
      | FROM p GROUP BY 1),
      |c AS (SELECT s, CAST(count(*) AS BIGINT) AS n_intervals
      |      FROM iv GROUP BY 1)
      |SELECT c.s AS suppkey, c.n_intervals,
      | coalesce(pc.n, 0) AS n_overlap_pairs,
      | coalesce(pc.sd, 0) AS sum_overlap_days,
      | coalesce(pc.mx, 0) AS max_overlap_days
      |FROM c LEFT JOIN pc USING (s)""".stripMargin

  /** Shared by `tel_ddsketch` (relational pipeline) and
    * `tel_ddsketch_native` (custom Catalyst aggregate) — one oracle
    * proving two physical strategies compute the identical sketch. */
  private val ddsketchOracleSql: String =
    """WITH b AS (
      | SELECT event_type,
      |  CASE WHEN v100 = 1 THEN 0
      |       ELSE length(bin(v100*v100 - 1)) END AS idx,
      |  count(*) AS c
      | FROM (SELECT event_type,
      |        greatest(CAST(round(value*100) AS BIGINT), 1) AS v100
      |       FROM events WHERE value > 0)
      | GROUP BY 1, 2),
      |r AS (
      | SELECT *, row_number() OVER (PARTITION BY event_type
      |   ORDER BY idx DESC) AS rk FROM b),
      |cut AS (
      | SELECT event_type, min(CASE WHEN rk <= 12 THEN idx END) AS cutoff,
      |  CAST(count(*) AS BIGINT) AS n_buckets_raw,
      |  CAST(sum(CASE WHEN rk > 12 THEN c ELSE 0 END) AS BIGINT)
      |    AS collapsed_n
      | FROM r GROUP BY 1),
      |k AS (
      | SELECT r.event_type, greatest(idx, cutoff) AS kidx,
      |  CAST(sum(c) AS BIGINT) AS c
      | FROM r JOIN cut USING (event_type) GROUP BY 1, 2),
      |cum AS (
      | SELECT *, CAST(sum(c) OVER (PARTITION BY event_type
      |    ORDER BY kidx ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |  CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      | FROM k)
      |SELECT e.event_type, e.n, cut.n_buckets_raw, e.n_buckets_kept,
      | cut.collapsed_n, e.p50_est, e.p95_est, e.p99_est, e.max_idx
      |FROM (
      | SELECT event_type, max(n) AS n,
      |  CAST(count(*) AS BIGINT) AS n_buckets_kept,
      |  min(CASE WHEN cum >= ceil(0.50*n) AND cum - c < ceil(0.50*n)
      |      THEN round(2*sqrt(pow(2.0, kidx))/(1+sqrt(2.0))/100, 4) END)
      |    AS p50_est,
      |  min(CASE WHEN cum >= ceil(0.95*n) AND cum - c < ceil(0.95*n)
      |      THEN round(2*sqrt(pow(2.0, kidx))/(1+sqrt(2.0))/100, 4) END)
      |    AS p95_est,
      |  min(CASE WHEN cum >= ceil(0.99*n) AND cum - c < ceil(0.99*n)
      |      THEN round(2*sqrt(pow(2.0, kidx))/(1+sqrt(2.0))/100, 4) END)
      |    AS p99_est,
      |  max(kidx) AS max_idx
      | FROM cum GROUP BY 1) e
      |JOIN cut USING (event_type)""".stripMargin

  def oracleSql: Map[String, String] = FunnelRetentionCorrOracles ++ Map(
    "q_pagerank" -> pagerankOracleSql(),
    "q_pagerank_copart" -> pagerankOracleSql(),
    "q_jaccard_neighbors" ->
      """WITH sp AS (
        | SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
        |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM sp GROUP BY 1),
        |pairs AS (
        | SELECT a.s AS supp_a, b.s AS supp_b, CAST(count(*) AS BIGINT) AS common
        | FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
        | GROUP BY 1,2),
        |j AS (
        | SELECT supp_a, supp_b, da.deg AS deg_a, db.deg AS deg_b, common,
        |  round(common*1.0/(da.deg + db.deg - common), 6) AS jaccard
        | FROM pairs JOIN deg da ON da.s = supp_a JOIN deg db ON db.s = supp_b)
        |SELECT supp_a, supp_b, deg_a, deg_b, common, jaccard FROM j
        |ORDER BY jaccard DESC, supp_a, supp_b LIMIT 20""".stripMargin,
    // degree-ordered triangle counting: nodes relabeled by (degree, id)
    // rank, edges oriented low→high, support(s,t) = |N_out(s)∩N_out(t)|
    // — each triangle counted once at its lowest-rank edge. The oracle
    // runs the same algorithm relationally (wedge join); integer-exact.
    "q_triangle_support" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |                AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT node, count(*) AS d FROM (
        |   SELECT u AS node FROM e UNION ALL SELECT v FROM e) t GROUP BY 1),
        |rk AS (SELECT node,
        |        CAST(row_number() OVER (ORDER BY d, node) AS BIGINT) AS r
        |       FROM deg),
        |eo AS (SELECT least(ru.r, rv.r) AS s, greatest(ru.r, rv.r) AS t
        |       FROM e JOIN rk ru ON ru.node = e.u
        |              JOIN rk rv ON rv.node = e.v),
        |sup AS (
        | SELECT b.s, b.t, CAST(count(y.t) AS BIGINT) AS support
        | FROM eo b
        | LEFT JOIN eo x ON x.s = b.s
        | LEFT JOIN eo y ON y.s = b.t AND y.t = x.t
        | GROUP BY 1, 2)
        |SELECT rku.node AS part_u, rkv.node AS part_v, support,
        | (SELECT CAST(sum(support) AS BIGINT) FROM sup) AS total_triangles,
        | CAST(row_number() OVER (
        |   ORDER BY support DESC, rku.node, rkv.node) AS BIGINT) AS rnk
        |FROM sup JOIN rk rku ON rku.r = sup.s
        |         JOIN rk rkv ON rkv.r = sup.t
        |QUALIFY rnk <= 20""".stripMargin,
    // interpolated bigram LM: per-bigram-type surprisal ln-rounded to 4
    // decimals then micro-quantized; λ literals written as the same float
    // expressions Scala evaluates
    "text_bigram_surprisal" ->
      """WITH d AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        | FROM documents),
        |uni AS (
        | SELECT w, count(*) AS cw
        | FROM (SELECT unnest(toks) AS w FROM d) t GROUP BY 1),
        |tot AS (SELECT sum(cw) AS total FROM uni),
        |bi AS (
        | SELECT doc_id, toks[i - 1] AS w1, toks[i] AS w2
        | FROM (SELECT doc_id, toks,
        |        unnest(generate_series(2, len(toks))) AS i
        |       FROM d) t),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
        |st AS (
        | SELECT cb.w1, cb.w2,
        |  CAST(round(1e6 * round(-ln(
        |    0.75 * cb.cb / u1.cw +
        |    0.25 * u2.cw / tot.total) / ln(2.0), 4)) AS BIGINT) AS s_micro
        | FROM cb
        | JOIN uni u1 ON u1.w = cb.w1
        | JOIN uni u2 ON u2.w = cb.w2
        | CROSS JOIN tot)
        |SELECT bi.doc_id,
        | CAST(count(*) AS BIGINT) AS n_bigrams,
        | CAST(sum(st.s_micro) AS BIGINT) AS sum_s_micro,
        | round(CAST(sum(st.s_micro) AS DOUBLE)
        |   / (1e6 * count(*)), 4) AS mean_bits
        |FROM bi JOIN st USING (w1, w2)
        |GROUP BY 1""".stripMargin,
    // DSIR: hashed-unigram (60-bit md5 prefix % 512) Laplace-smoothed
    // log-likelihood ratio, ln rounded to 4 decimals then micro-quantized
    "text_dsir_weights" ->
      """WITH db AS (
        | SELECT doc_id, source,
        |  CAST(('0x' || substr(md5(term), 1, 15))::BIGINT % 512 AS BIGINT)
        |    AS bucket,
        |  count(*) AS cnt
        | FROM (
        |  SELECT doc_id, source,
        |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents) t
        | GROUP BY 1, 2, 3),
        |raw AS (SELECT bucket, sum(cnt) AS cr FROM db GROUP BY 1),
        |tgt AS (SELECT bucket, sum(cnt) AS ct FROM db
        |        WHERE source IN ('src7', 'src18') GROUP BY 1),
        |rt AS (SELECT sum(cr) AS raw_total FROM raw),
        |tt AS (SELECT sum(ct) AS tgt_total FROM tgt),
        |llr AS (
        | SELECT bucket,
        |  CAST(round(1e6 * round(ln(
        |   ((coalesce(ct, 0) + 1.0) / (tt.tgt_total + 512.0)) /
        |   ((cr + 1.0) / (rt.raw_total + 512.0))), 4)) AS BIGINT)
        |    AS llr_micro
        | FROM raw LEFT JOIN tgt USING (bucket)
        |      CROSS JOIN rt CROSS JOIN tt),
        |lens AS (
        | SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
        |    AS n_tokens
        | FROM documents),
        |wts AS (
        | SELECT db.doc_id,
        |  CAST(sum(db.cnt * llr.llr_micro) AS BIGINT) AS weight_micro
        | FROM db JOIN llr USING (bucket) GROUP BY 1)
        |SELECT w.doc_id, l.n_tokens, w.weight_micro,
        | CAST(round(1000.0 * w.weight_micro / l.n_tokens) AS BIGINT)
        |   AS wpk_milli,
        | CAST(row_number() OVER (
        |   ORDER BY round(1000.0 * w.weight_micro / l.n_tokens) DESC, w.doc_id)
        |   AS BIGINT) AS rnk
        |FROM wts w JOIN lens l USING (doc_id)
        |QUALIFY rnk <= 100""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
        | sum_disc_price, sum_disc, count_order,
        | CAST(round(CAST(CAST(sum_qty/count_order AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS avg_qty,
        | CAST(round(CAST(CAST(sum_disc/count_order AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS avg_disc
        |FROM (SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),4) AS sum_qty,
        |  round(sum(l_extendedprice),4) AS sum_base_price,
        |  round(sum(l_extendedprice*(1.0-l_discount)),4) AS sum_disc_price,
        |  round(sum(l_discount),4) AS sum_disc,
        |  count(*) AS count_order
        | FROM lineitem
        | WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        | GROUP BY l_returnflag, l_linestatus) t""".stripMargin,
    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice*l_discount),4) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        | AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "q3_join_agg" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |WHERE c_mktsegment='BUILDING'
        |GROUP BY o_orderpriority""".stripMargin,
    "q5_multi_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        |JOIN nation ON s_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA'
        |GROUP BY n_name""".stripMargin,
    "q_topk" ->
      """SELECT o_custkey, round(sum(o_totalprice),4) AS total_spent,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,4) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | round(sum(o_totalprice),4) AS total_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey=o_orderkey AND l_returnflag='R')
        |GROUP BY o_orderstatus""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        | round(sum(c_acctbal),4) AS sum_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        | round(sum(c_acctbal),4) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q_conditional_agg" ->
      """SELECT o_orderpriority,
        | round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0.0 END),4) AS total_f,
        | round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice ELSE 0.0 END),4) AS total_o,
        | round(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice ELSE 0.0 END),4) AS total_p,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT s_suppkey, s_name, round(s_acctbal,4) AS acctbal
        |FROM supplier
        |WHERE s_acctbal > (SELECT avg(s_acctbal) FROM supplier)""".stripMargin,
    "q_asof_nearest" ->
      // nearest = the closer of DuckDB's two directional ASOF joins;
      // equidistant ties (incl. exact-timestamp matches) go BACKWARD,
      // matching pandas merge_asof(direction='nearest')
      """WITH r AS (
        | SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS o_ts,
        |  max(o_orderkey) AS o_orderkey,
        |  arg_max(o_totalprice, o_orderkey) AS o_totalprice
        | FROM orders GROUP BY 1,2),
        |b AS (
        | SELECT e.event_id, e.user_id, e.ts, r.o_ts AS bts,
        |  r.o_orderkey AS bkey, r.o_totalprice AS bprice
        | FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_ts),
        |f AS (
        | SELECT e.event_id, r.o_ts AS fts,
        |  r.o_orderkey AS fkey, r.o_totalprice AS fprice
        | FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts <= r.o_ts),
        |j AS (
        | SELECT b.event_id, b.user_id, b.ts, b.bts, b.bkey, b.bprice,
        |  f.fts, f.fkey, f.fprice,
        |  CASE
        |   WHEN b.bkey IS NULL AND f.fkey IS NULL THEN 'none'
        |   WHEN f.fkey IS NULL THEN 'back'
        |   WHEN b.bkey IS NULL THEN 'fwd'
        |   WHEN epoch_us(b.ts) - epoch_us(b.bts)
        |     <= epoch_us(f.fts) - epoch_us(b.ts) THEN 'back'
        |   ELSE 'fwd' END AS direction
        | FROM b JOIN f USING (event_id))
        |SELECT event_id, user_id,
        | CASE WHEN direction = 'back' THEN bkey
        |      WHEN direction = 'fwd' THEN fkey END AS nearest_order_key,
        | round(CASE WHEN direction = 'back' THEN bprice
        |            WHEN direction = 'fwd' THEN fprice END, 4)
        |   AS nearest_order_price,
        | direction
        |FROM j""".stripMargin,
    "q_asof_join" ->
      """WITH r AS (
        | SELECT o_custkey, o_orderdate,
        |  max(o_orderkey) AS o_orderkey,
        |  arg_max(o_totalprice, o_orderkey) AS o_totalprice
        | FROM orders GROUP BY 1,2)
        |SELECT e.event_id, e.user_id, r.o_orderkey AS last_order_key,
        | round(r.o_totalprice, 4) AS last_order_price
        |FROM events e ASOF LEFT JOIN r
        | ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate""".stripMargin,
    "q_asof_forward" ->
      """WITH r AS (
        | SELECT o_custkey, o_orderdate,
        |  max(o_orderkey) AS o_orderkey,
        |  arg_max(o_totalprice, o_orderkey) AS o_totalprice
        | FROM orders GROUP BY 1,2)
        |SELECT e.event_id, e.user_id, r.o_orderkey AS next_order_key,
        | round(r.o_totalprice, 4) AS next_order_price
        |FROM events e ASOF LEFT JOIN r
        | ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate""".stripMargin,
    // native forward merge answers the same question as q_asof_forward
    "q_asof_forward_native" ->
      """WITH r AS (
        | SELECT o_custkey, o_orderdate,
        |  max(o_orderkey) AS o_orderkey,
        |  arg_max(o_totalprice, o_orderkey) AS o_totalprice
        | FROM orders GROUP BY 1,2)
        |SELECT e.event_id, e.user_id, r.o_orderkey AS next_order_key,
        | round(r.o_totalprice, 4) AS next_order_price
        |FROM events e ASOF LEFT JOIN r
        | ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate""".stripMargin,
    "q_asof_tolerance" ->
      """WITH r AS (
        | SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS o_ts,
        |  max(o_orderkey) AS o_orderkey,
        |  arg_max(o_totalprice, o_orderkey) AS o_totalprice
        | FROM orders GROUP BY 1,2)
        |SELECT e.event_id, e.user_id,
        | CASE WHEN epoch_us(e.ts) - epoch_us(r.o_ts) <= 2592000000000
        |   THEN r.o_orderkey END AS recent_order_key,
        | CASE WHEN epoch_us(e.ts) - epoch_us(r.o_ts) <= 2592000000000
        |   THEN round(r.o_totalprice, 4) END AS recent_order_price
        |FROM events e ASOF LEFT JOIN r
        | ON e.user_id = r.o_custkey AND e.ts >= r.o_ts""".stripMargin,
    // the native-exec twin answers the SAME question — one oracle text,
    // two physical strategies under test
    "q_asof_native" ->
      """WITH r AS (
        | SELECT o_custkey, o_orderdate,
        |  max(o_orderkey) AS o_orderkey,
        |  arg_max(o_totalprice, o_orderkey) AS o_totalprice
        | FROM orders GROUP BY 1,2)
        |SELECT e.event_id, e.user_id, r.o_orderkey AS last_order_key,
        | round(r.o_totalprice, 4) AS last_order_price
        |FROM events e ASOF LEFT JOIN r
        | ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        | round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice END),4) AS "F",
        | round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice END),4) AS "O",
        | round(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice END),4) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_cube" ->
      """SELECT r_name, c_mktsegment, count(*) AS n_customers,
        | round(sum(c_acctbal),4) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |GROUP BY CUBE(r_name, c_mktsegment)""".stripMargin,
    "text_ngram_freq" ->
      """SELECT ngram, count(*) AS n FROM (
        | SELECT unnest([t[i] || ' ' || t[i+1]
        |   for i in generate_series(1, len(t)-1)]) AS ngram
        | FROM (SELECT string_split_regex(trim(lower(text)),'\s+') AS t
        |       FROM documents) s
        | WHERE len(t) >= 2) g
        |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""".stripMargin,
    "q_set_ops" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type='purchase'
        |INTERSECT
        |SELECT DISTINCT user_id FROM events WHERE event_type='error'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 0""".stripMargin,
    "tel_cumulative_delta" ->
      """SELECT event_id, user_id, round(value - prev, 4) AS delta FROM (
        | SELECT event_id, user_id, value,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events) t WHERE prev IS NOT NULL""".stripMargin,
    "q_range_join" ->
      """SELECT e.event_id, e.user_id, count(r.event_id) AS n_prior
        |FROM (SELECT * FROM events WHERE event_type='error') e
        |LEFT JOIN events r ON r.user_id = e.user_id
        | AND epoch_us(r.ts) >= epoch_us(e.ts) - 300000000
        | AND epoch_us(r.ts) < epoch_us(e.ts)
        |GROUP BY e.event_id, e.user_id""".stripMargin,
    "q_salted_agg" ->
      """SELECT user_id, count(*) AS n_events,
        | round(sum(value),4) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        | round(sum(value),4) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "tel_value_percentiles" ->
      """SELECT event_type, count(*) AS n,
        | CAST(round(CAST(CAST(quantile_cont(value, 0.5) AS VARCHAR) AS DECIMAL(38,18)),6) AS DOUBLE) AS p50,
        | CAST(round(CAST(CAST(quantile_cont(value, 0.95) AS VARCHAR) AS DECIMAL(38,18)),6) AS DOUBLE) AS p95,
        | CAST(round(CAST(CAST(quantile_cont(value, 0.99) AS VARCHAR) AS DECIMAL(38,18)),6) AS DOUBLE) AS p99
        |FROM events GROUP BY event_type""".stripMargin,
    "tel_partition_cols" ->
      """SELECT strftime(ts,'%Y') AS year, strftime(ts,'%m') AS month,
        | strftime(ts,'%d') AS day, strftime(ts,'%H') AS hour,
        | count(*) AS n_events, round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1,2,3,4""".stripMargin,
    "tel_json_props" ->
      """SELECT event_type, n, sum_k, min_k, max_k,
        | CAST(round(CAST(CAST(sum_k*1.0/n AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS avg_k
        |FROM (SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
        | FROM events GROUP BY event_type) t""".stripMargin,
    "tel_dedup_latest" ->
      """SELECT user_id, event_type, event_id, value FROM (
        | SELECT user_id, event_type, event_id, value,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) t WHERE rn = 1""".stripMargin,
    "tel_sessionize" ->
      """WITH w AS (
        | SELECT user_id, ts, event_id, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |s AS (
        | SELECT *, CASE WHEN prev_ts IS NULL
        |   OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
        | FROM w),
        |s2 AS (
        | SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        | FROM s)
        |SELECT user_id, session_idx, count(*) AS n_events,
        | min(event_id) AS first_event_id, round(sum(value),4) AS sum_value
        |FROM s2 GROUP BY user_id, session_idx""".stripMargin,
    "tel_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
        |   '%Y-%m-%d %H:%M:%S') AS hour_start,
        | event_type, count(*) AS n_events, round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1,2""".stripMargin,
    "tel_error_rate" ->
      """SELECT hour_start, n_errors, n_total,
        | CAST(round(CAST(CAST(n_errors*1.0/n_total AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS error_rate FROM (
        | SELECT strftime(date_trunc('hour',ts),'%Y-%m-%d %H:%M:%S') AS hour_start,
        |  CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        |  count(*) AS n_total
        | FROM events GROUP BY 1) t""".stripMargin,
    "tel_value_stats" ->
      """SELECT event_type, day, n, min_value, max_value, sum_value,
        | CAST(round(CAST(CAST(sum_value/n AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS avg_value
        |FROM (SELECT event_type, strftime(ts,'%Y-%m-%d') AS day, count(*) AS n,
        |  min(value) AS min_value, max(value) AS max_value,
        |  round(sum(value),4) AS sum_value
        | FROM events GROUP BY 1,2) t""".stripMargin,
    "tel_hist_quantile" ->
      """WITH g AS (
        | SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  CAST(count(*) AS BIGINT) AS total,
        |  CAST(sum(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |  CAST(sum(CASE WHEN value < 100 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |  CAST(sum(CASE WHEN value < 200 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |  CAST(sum(CASE WHEN value < 500 THEN 1 ELSE 0 END) AS BIGINT) AS c4
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT *, 0.9 * total AS rnk FROM g)
        |SELECT event_type, day, total, round(
        | CASE
        |  WHEN rnk <= c1 THEN 50.0 * (rnk / c1)
        |  WHEN rnk <= c2 THEN 50.0 + 50.0 * ((rnk - c1) / (c2 - c1))
        |  WHEN rnk <= c3 THEN 100.0 + 100.0 * ((rnk - c2) / (c3 - c2))
        |  WHEN rnk <= c4 THEN 200.0 + 300.0 * ((rnk - c3) / (c4 - c3))
        |  ELSE 500.0 END, 6) AS p90
        |FROM r""".stripMargin,
    "tel_histogram" ->
      """SELECT event_type,
        | CASE WHEN value<50 THEN '0_lt50' WHEN value<100 THEN '1_lt100'
        |      WHEN value<200 THEN '2_lt200' WHEN value<500 THEN '3_lt500'
        |      ELSE '4_ge500' END AS bucket,
        | count(*) AS bucket_count
        |FROM events GROUP BY 1,2""".stripMargin,
    "tel_sample_users" ->
      """SELECT event_type, array_to_string(list_sort(l[1:3]), ',') AS sampled FROM (
        | SELECT event_type,
        |  list(user_id ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS l
        | FROM (SELECT DISTINCT event_type, user_id FROM events) t
        | GROUP BY event_type) s""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "text_fingerprint" ->
      """SELECT lang, count(*) AS n_docs,
        | count(DISTINCT md5(lower(trim(regexp_replace(text,'\s+',' ','g'))))) AS n_distinct_fp
        |FROM documents GROUP BY lang""".stripMargin,
    "text_tokens" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(len(string_split_regex(trim(text),'\s+'))) AS BIGINT) AS sum_tokens,
        | CAST(sum(CAST(ceil(length(text)/4.0) AS BIGINT)) AS BIGINT) AS sum_tokens_bpe,
        | max(len(string_split_regex(trim(text),'\s+'))) AS max_tokens
        |FROM documents GROUP BY source""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, n_chars_txt, n_tokens, n_stopwords,
        | CAST(round(CAST(CAST(n_stopwords*1.0/n_tokens AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS stop_ratio,
        | CAST(round(CAST(CAST(n_nospace*1.0/n_tokens AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS mean_token_len
        |FROM (SELECT doc_id,
        |  length(text) AS n_chars_txt,
        |  len(string_split_regex(trim(text),'\s+')) AS n_tokens,
        |  len(list_filter(string_split_regex(trim(text),'\s+'),
        |      x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS n_stopwords,
        |  length(regexp_replace(trim(text),'\s+','','g')) AS n_nospace
        | FROM documents) t""".stripMargin,
    "text_langid" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |scores AS (
        | SELECT doc_id, 'de' AS lang_code, len(list_filter(t,
        |   x -> x IN ('der','die','und','das','ist','nicht','ein','mit'))) AS score FROM toks
        | UNION ALL SELECT doc_id, 'en', len(list_filter(t,
        |   x -> x IN ('the','and','of','to','is','in','that','for'))) FROM toks
        | UNION ALL SELECT doc_id, 'es', len(list_filter(t,
        |   x -> x IN ('el','la','de','que','y','en','los','una'))) FROM toks
        | UNION ALL SELECT doc_id, 'fr', len(list_filter(t,
        |   x -> x IN ('le','la','de','et','les','des','un','une'))) FROM toks),
        |r AS (
        | SELECT doc_id, lang_code, score, row_number() OVER (
        |   PARTITION BY doc_id ORDER BY score DESC, lang_code DESC) AS rn
        | FROM scores)
        |SELECT doc_id, lang_code AS pred_lang, score FROM r WHERE rn = 1""".stripMargin,
    "dedup_ngram_jaccard" -> ngramJaccardOracle("0.2"),
    "dedup_substring" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |pos0 AS (
        | SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
        | FROM toks WHERE len(t) >= 5),
        |sp AS (
        | SELECT doc_id, i - 1 AS pos,
        |  md5(array_to_string(t[i:i+4], ' ')) AS h
        | FROM pos0),
        |an AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  a.pos AS pa, a.pos - b.pos AS diag
        | FROM sp a JOIN sp b ON a.h = b.h AND a.doc_id < b.doc_id),
        |isl AS (
        | SELECT doc_a, doc_b, diag, pa,
        |  pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
        |    ORDER BY pa) AS grp
        | FROM an),
        |runs AS (
        | SELECT doc_a, doc_b,
        |  CAST(max(pa) - min(pa) + 5 AS BIGINT) AS run_len,
        |  CAST(min(pa) AS BIGINT) AS start_a
        | FROM isl GROUP BY doc_a, doc_b, diag, grp)
        |SELECT doc_a, doc_b, max(run_len) AS longest,
        | CAST(count(*) AS BIGINT) AS n_runs,
        | CAST(sum(run_len) AS BIGINT) AS run_tokens,
        | min(start_a) AS first_start_a
        |FROM runs WHERE run_len >= 8 GROUP BY 1, 2""".stripMargin,
    "dedup_containment" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        |pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
        |  CAST(count(*) AS BIGINT) AS inter
        | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1,2,3,4)
        |SELECT doc_a, doc_b, inter, na, nb, containment FROM (
        | SELECT doc_a, doc_b, inter, na, nb,
        |  CAST(round(CAST(CAST(inter*1.0/least(na, nb) AS VARCHAR)
        |    AS DECIMAL(38,18)),4) AS DOUBLE) AS containment
        | FROM pairs) p
        |WHERE containment >= 0.6""".stripMargin,
    "dedup_embedding_cosine" ->
      """WITH n AS (
        | SELECT vec_id, label, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings)
        |SELECT vec_a, vec_b, label, cosine FROM (
        | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        |  round(list_dot_product(a.vec, b.vec)/(a.nrm*b.nrm), 6) AS cosine
        | FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id) p
        |WHERE cosine >= 0.35""".stripMargin,
    "sim_topk_bruteforce" ->
      """WITH n AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        | FROM embeddings),
        |q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
        |      FROM n WHERE vec_id < 8),
        |p AS (
        | SELECT query_id, n.vec_id AS neighbor_id,
        |  round(list_dot_product(n.vec, q.qvec)/(n.norm*q.qnorm), 6) AS cosine
        | FROM n, q WHERE n.vec_id != q.query_id),
        |r AS (
        | SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rnk
        | FROM p)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        | lower(hex(encode(substr(text,1,4)))) AS magic_hex,
        | 64 + ascii(substr(text,1,1)) % 192 AS fake_width,
        | 64 + ascii(substr(text,2,1)) % 192 AS fake_height,
        | 1 + octet_length(encode(text)) % 4 AS fake_channels
        |FROM documents""".stripMargin,
    "q_full_outer" ->
      """SELECT coalesce(o.o_custkey, e.user_id) AS key_id,
        | o.n_orders, o.order_total, e.n_events
        |FROM (SELECT o_custkey, count(*) AS n_orders,
        |       round(sum(o_totalprice),4) AS order_total
        |      FROM orders GROUP BY 1) o
        |FULL OUTER JOIN (SELECT user_id, count(*) AS n_events
        |      FROM events GROUP BY 1) e
        | ON o.o_custkey = e.user_id""".stripMargin,
    "q_lateral_topn" ->
      """SELECT c_custkey, o.o_orderkey, o.price
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, round(o_totalprice, 4) AS price
        |  FROM orders WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o""".stripMargin,
    "q_set_ops_all" ->
      """SELECT user_id, count(*) AS multiplicity FROM (
        | SELECT user_id FROM events WHERE event_type='purchase'
        | INTERSECT ALL
        | SELECT user_id FROM events WHERE event_type='error'
        | EXCEPT ALL
        | SELECT user_id FROM events WHERE event_type='signup') t
        |GROUP BY user_id""".stripMargin,
    "q_window_dist" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice,4) AS price,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q_ntile" ->
      """SELECT o_orderpriority, decile, count(*) AS n_orders,
        | round(min(o_totalprice),4) AS lo, round(max(o_totalprice),4) AS hi
        |FROM (SELECT o_orderpriority, o_totalprice,
        |  CAST(ntile(10) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
        | FROM orders) t
        |GROUP BY o_orderpriority, decile""".stripMargin,
    "q_nullsafe_join" ->
      """SELECT coalesce(b.nk, -1) AS nation_key, count(*) AS n_rows,
        | round(sum(a.c_acctbal),4) AS bal
        |FROM (SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL
        |        ELSE c_nationkey END AS nk, c_acctbal FROM customer) a
        |JOIN (SELECT CASE WHEN n_nationkey = 0 THEN NULL
        |        ELSE n_nationkey END AS nk, n_name FROM nation) b
        | ON a.nk IS NOT DISTINCT FROM b.nk
        |GROUP BY coalesce(b.nk, -1)""".stripMargin,
    "q_recursive_cte" ->
      """WITH RECURSIVE spine(d) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL SELECT d + INTERVAL 1 DAY FROM spine WHERE d < DATE '1995-03-01'
        |)
        |SELECT strftime(s.d, '%Y-%m-%d') AS day,
        |       count(o.o_orderkey) AS n_orders,
        |       round(coalesce(sum(o.o_totalprice), 0.0), 4) AS day_total
        |FROM spine s LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = CAST(s.d AS DATE)
        |GROUP BY s.d""".stripMargin,
    "q_unpivot" ->
      """SELECT o_orderpriority, status, total FROM (
        | SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0.0 END),4) AS total_f,
        |  round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice ELSE 0.0 END),4) AS total_o,
        |  round(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice ELSE 0.0 END),4) AS total_p
        | FROM orders GROUP BY o_orderpriority) p
        |UNPIVOT (total FOR status IN (total_f, total_o, total_p))""".stripMargin,
    "tel_range_frame" ->
      """SELECT event_id, user_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_1h,
        | round(sum(value) OVER w, 4) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | round(sum(l_extendedprice),4) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY o_orderpriority""".stripMargin,
    "q_grouping_sets" ->
      """SELECT r_name, c_mktsegment,
        | CAST(GROUPING(r_name, c_mktsegment) AS BIGINT) AS gid,
        | count(*) AS n_customers, round(sum(c_acctbal),4) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())""".stripMargin,
    "q_incremental_merge" ->
      """WITH merged AS (
        | SELECT o_orderkey,
        |  arg_max(o_totalprice, version) AS price,
        |  arg_max(o_orderpriority, version) AS prio,
        |  max(version) AS version
        | FROM (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice, 1 AS version FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_orderpriority, o_totalprice*1.05, 2
        |  FROM orders WHERE o_orderkey % 5 = 0) u
        | GROUP BY o_orderkey)
        |SELECT prio AS o_orderpriority, count(*) AS n_orders,
        | CAST(sum(CASE WHEN version=2 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
        | round(sum(price),4) AS merged_total
        |FROM merged GROUP BY 1""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,4) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "q_window_topk_rewrite" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,4) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "tel_moving_avg" ->
      """SELECT event_id, user_id, mov_sum, n_win,
        | CAST(round(CAST(CAST(mov_sum/n_win AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS mov_avg
        |FROM (SELECT event_id, user_id,
        |  round(sum(value) OVER w, 4) AS mov_sum,
        |  count(*) OVER w AS n_win
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) t""".stripMargin,
    "tel_counter_rate" ->
      """SELECT user_id, count(*) AS n_samples,
        | CAST(sum(CASE WHEN value < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
        | round(sum(CASE WHEN value >= prev THEN value - prev ELSE value END),4)
        |   AS total_increase
        |FROM (SELECT user_id, value,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events) t
        |WHERE prev IS NOT NULL GROUP BY user_id""".stripMargin,
    "text_contamination" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 50 = 0),
        |train AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 50 != 0),
        |hits AS (SELECT t.doc_id, count(*) AS n_hit
        |         FROM train t JOIN bench b ON t.shingle = b.shingle GROUP BY 1)
        |SELECT s.doc_id, len(s.s) AS n_shingles,
        | coalesce(h.n_hit, 0) AS n_contaminated,
        | CAST(round(CAST(CAST(coalesce(h.n_hit,0)*1.0/len(s.s) AS VARCHAR)
        |   AS DECIMAL(38,18)),4) AS DOUBLE) AS contamination
        |FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
        |WHERE s.doc_id % 50 != 0""".stripMargin,
    "text_decontam_apply" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 50 = 0),
        |train AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 50 != 0),
        |hits AS (SELECT t.doc_id, count(*) AS n_hit
        |         FROM train t JOIN bench b ON t.shingle = b.shingle GROUP BY 1),
        |rep AS (
        | SELECT s.doc_id, len(s.s) AS n_shingles,
        |  coalesce(h.n_hit, 0) AS n_contaminated,
        |  CAST(round(CAST(CAST(coalesce(h.n_hit,0)*1.0/len(s.s) AS VARCHAR)
        |    AS DECIMAL(38,18)),4) AS DOUBLE) AS contamination
        | FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
        | WHERE s.doc_id % 50 != 0)
        |SELECT doc_id, n_shingles, n_contaminated, contamination,
        | contamination <= 0.05 AS keep
        |FROM rep""".stripMargin,
    "sim_ivf_ann" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |c AS (SELECT vec_id AS cid, vec AS cvec, nrm AS cnrm FROM v WHERE vec_id < 4),
        |scored AS (
        | SELECT v.vec_id, c.cid,
        |  row_number() OVER (PARTITION BY v.vec_id
        |    ORDER BY round(list_dot_product(v.vec, c.cvec)/(v.nrm*c.cnrm), 6) DESC,
        |             c.cid) AS rn
        | FROM v, c WHERE v.vec_id >= 4),
        |assign AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
        |idx AS (SELECT a.vec_id, a.cid, v.vec, v.nrm
        |        FROM assign a JOIN v USING (vec_id)),
        |q AS (SELECT vec_id AS query_id, cid, vec AS qvec, nrm AS qnrm
        |      FROM idx WHERE vec_id < 12),
        |p AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM idx i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rnk FROM p)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "sim_lsh_ann" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |bk AS (
        | SELECT vec_id, e,
        |  sqrt(list_dot_product(e, e)) AS nrm,
        |  CAST(list_sum([CASE WHEN
        |     list_reduce([e[d] * ((((j*64 + d)*2654435761) % 97 - 48)/48.0)
        |                  for d in generate_series(1, len(e))], (a,b) -> a+b) > 0
        |     THEN 1 << j ELSE 0 END for j in generate_series(0,15)]) AS BIGINT) AS bucket
        | FROM v),
        |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qnrm, bucket
        |      FROM bk WHERE vec_id < 8),
        |p AS (
        | SELECT q.query_id, bk.vec_id AS neighbor_id,
        |  round(list_dot_product(bk.e, q.qe)/(bk.nrm*q.qnrm), 6) AS cosine
        | FROM bk JOIN q ON bk.bucket = q.bucket AND bk.vec_id != q.query_id),
        |r AS (
        | SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rnk
        | FROM p)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "sim_pq_ann" ->
      (s"""WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |""".stripMargin + PqOracleTail),
    "sim_opq_ann" ->
      // Householder reflection R = I − 2uuᵀ applied to every vector
      // (same deterministic u as SimOps.householderUnit), then the
      // identical PQ/ADC pipeline over the rotated space
      (s"""WITH raw AS (
        | SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |hu AS (
        | SELECT [ CAST(((i*2654435761) % 97) - 48 AS DOUBLE)/48.0
        |          for i in generate_series(1,64) ] AS ur),
        |hn AS (
        | SELECT ur, sqrt(list_reduce([0.0] || [c*c for c in ur],
        |                 (a,b) -> a+b)) AS nrm FROM hu),
        |hv AS (SELECT [c / nrm for c in ur] AS vu FROM hn),
        |v AS (
        | SELECT vec_id, [ x[j] - sc * vu[j]
        |                  for j in generate_series(1,64) ] AS e
        | FROM (
        |  SELECT vec_id, x, vu,
        |   2.0 * list_reduce([0.0] || [vu[t]*x[t]
        |          for t in generate_series(1,64)], (a,b) -> a+b) AS sc
        |  FROM raw, hv) t),
        |""".stripMargin + PqOracleTail),
    "sim_opq_trained" ->
      // LEARNED rotation: one Jacobi sweep of non-overlapping dim
      // pairs — closed-form 2×2 eigen-rotations θ=½·atan2(2c, a−b)
      // over round-6-quantized covariance entries, rotated coordinates
      // re-quantized (the two float determinization points the Spark
      // side shares) — then the identical PQ/ADC pipeline
      (s"""WITH raw AS (
        | SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |cv AS MATERIALIZED (
        | SELECT s,
        |  round(covar_pop(x[2*s+1], x[2*s+1]), 6) AS a,
        |  round(covar_pop(x[2*s+2], x[2*s+2]), 6) AS b,
        |  round(covar_pop(x[2*s+1], x[2*s+2]), 6) AS c
        | FROM raw, (SELECT unnest(generate_series(0,31)) AS s) sp
        | GROUP BY s),
        |ro AS MATERIALIZED (
        | SELECT s, cos(0.5*atan2(2.0*c, a-b)) AS cs,
        |  sin(0.5*atan2(2.0*c, a-b)) AS sn FROM cv),
        |rx AS MATERIALIZED (
        | SELECT vec_id, s,
        |  round( cs*x[2*s+1] + sn*x[2*s+2], 6) AS e0,
        |  round(-sn*x[2*s+1] + cs*x[2*s+2], 6) AS e1
        | FROM raw, ro),
        |v AS MATERIALIZED (
        | SELECT vec_id, list(val ORDER BY dim) AS e FROM (
        |  SELECT vec_id, 2*s AS dim, e0 AS val FROM rx
        |  UNION ALL
        |  SELECT vec_id, 2*s+1 AS dim, e1 AS val FROM rx
        | ) GROUP BY vec_id),
        |""".stripMargin + PqOracleTail),
    "sim_ivf_pq" ->
      // FAISS-IVFPQ shape: trained coarse quantizer (shared Lloyd CTEs)
      // -> RESIDUAL space (x − centroid, exact IEEE subtraction of
      // integer micro-units) -> PQ codes/LUTs/ADC within the query's
      // own inverted list (nprobe=1: query and candidate residuals
      // share a centroid frame)
      s"""$KmeansCtes,
        |res AS (
        | SELECT v.vec_id, af.cid,
        |  [CAST(vq[i] AS DOUBLE) - c2.c[i]
        |   for i in generate_series(1,64)] AS e
        | FROM v JOIN af USING (vec_id) JOIN c2 USING (cid)),
        |tr AS (SELECT vec_id AS ccode, e AS ce FROM res WHERE vec_id < 8),
        |sc AS (
        | SELECT r.vec_id, tr.ccode, sp.s,
        |  list_reduce([0.0] || [ (r.e[i]-tr.ce[i])*(r.e[i]-tr.ce[i])
        |    for i in generate_series(sp.s*16+1, sp.s*16+16) ],
        |    (x,y) -> x+y) AS dist
        | FROM res r, tr, (SELECT unnest(generate_series(0,3)) AS s) sp
        | WHERE r.vec_id >= 8),
        |codes AS (
        | SELECT vec_id, s, ccode AS code FROM (
        |  SELECT vec_id, s, ccode,
        |   row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, ccode) AS rn
        |  FROM sc) t WHERE rn = 1),
        |lut AS (SELECT vec_id AS query_id, s, ccode AS code, dist AS qdist
        |        FROM sc WHERE vec_id < 16),
        |cand AS (
        | SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id
        | FROM res q JOIN res r ON r.cid = q.cid AND r.vec_id != q.vec_id
        | WHERE q.vec_id >= 8 AND q.vec_id < 16 AND r.vec_id >= 8),
        |adc AS (
        | SELECT cd.query_id, cd.neighbor_id,
        |  sum(CASE WHEN c.s=0 THEN l.qdist ELSE 0.0 END) AS d0,
        |  sum(CASE WHEN c.s=1 THEN l.qdist ELSE 0.0 END) AS d1,
        |  sum(CASE WHEN c.s=2 THEN l.qdist ELSE 0.0 END) AS d2,
        |  sum(CASE WHEN c.s=3 THEN l.qdist ELSE 0.0 END) AS d3
        | FROM cand cd
        | JOIN codes c ON c.vec_id = cd.neighbor_id
        | JOIN lut l ON l.query_id = cd.query_id AND l.s = c.s
        |            AND l.code = c.code
        | GROUP BY 1,2),
        |r AS (
        | SELECT query_id, neighbor_id,
        |  CAST(round(CAST(CAST((d0+d1+d2+d3)/1000000000000.0 AS VARCHAR)
        |    AS DECIMAL(38,18)),6) AS DOUBLE) AS adist,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY d0+d1+d2+d3, neighbor_id) AS rnk
        | FROM adc)
        |SELECT query_id, neighbor_id, adist, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "sim_mmr_diversify" ->
      // 4 unrolled greedy MMR selection steps; each step ranks the
      // unselected shortlist by the integer score 7·rel − 3·max-sim-to-
      // selected and takes the argmax (id tie-break) — the same integer
      // trajectory as the mapGroups kernel
      """WITH e AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |qv AS (SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm
        |       FROM e WHERE vec_id < 8),
        |sc AS (
        | SELECT qv.query_id, e.vec_id AS cand_id,
        |  round(list_dot_product(e.vec, qv.qvec)/(e.nrm*qv.qnrm), 6) AS cos6
        | FROM e, qv WHERE e.vec_id != qv.query_id),
        |short AS (
        | SELECT query_id, cand_id, CAST(round(cos6*1000000, 0) AS BIGINT) AS rel
        | FROM (SELECT query_id, cand_id, cos6, row_number() OVER (
        |   PARTITION BY query_id ORDER BY cos6 DESC, cand_id) AS rn FROM sc) s
        | WHERE rn <= 8),
        |sims AS (
        | SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
        |  CAST(round(round(list_dot_product(x.vec, y.vec)/(x.nrm*y.nrm), 6)
        |    *1000000, 0) AS BIGINT) AS simm
        | FROM short a JOIN short b ON a.query_id = b.query_id
        |                          AND a.cand_id < b.cand_id
        | JOIN e x ON x.vec_id = a.cand_id JOIN e y ON y.vec_id = b.cand_id),
        |p1 AS (
        | SELECT query_id, cand_id, rel, CAST(7*rel AS BIGINT) AS score10
        | FROM (SELECT query_id, cand_id, rel, row_number() OVER (
        |   PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn FROM short) s
        | WHERE rn = 1),
        |p2 AS (
        | SELECT query_id, cand_id, rel, score10 FROM (
        |  SELECT g.*, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score10 DESC, cand_id) AS rn
        |  FROM (
        |   SELECT s.query_id, s.cand_id, s.rel,
        |    CAST(7*s.rel - 3*max(m.simm) AS BIGINT) AS score10
        |   FROM short s
        |   JOIN p1 t ON t.query_id = s.query_id AND t.cand_id != s.cand_id
        |   JOIN sims m ON m.query_id = s.query_id
        |     AND m.ca = least(s.cand_id, t.cand_id)
        |     AND m.cb = greatest(s.cand_id, t.cand_id)
        |   WHERE NOT EXISTS (SELECT 1 FROM p1 z
        |     WHERE z.query_id = s.query_id AND z.cand_id = s.cand_id)
        |   GROUP BY s.query_id, s.cand_id, s.rel) g) gg
        | WHERE rn = 1),
        |sel2 AS (SELECT query_id, cand_id FROM p1
        |         UNION ALL SELECT query_id, cand_id FROM p2),
        |p3 AS (
        | SELECT query_id, cand_id, rel, score10 FROM (
        |  SELECT g.*, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score10 DESC, cand_id) AS rn
        |  FROM (
        |   SELECT s.query_id, s.cand_id, s.rel,
        |    CAST(7*s.rel - 3*max(m.simm) AS BIGINT) AS score10
        |   FROM short s
        |   JOIN sel2 t ON t.query_id = s.query_id AND t.cand_id != s.cand_id
        |   JOIN sims m ON m.query_id = s.query_id
        |     AND m.ca = least(s.cand_id, t.cand_id)
        |     AND m.cb = greatest(s.cand_id, t.cand_id)
        |   WHERE NOT EXISTS (SELECT 1 FROM sel2 z
        |     WHERE z.query_id = s.query_id AND z.cand_id = s.cand_id)
        |   GROUP BY s.query_id, s.cand_id, s.rel) g) gg
        | WHERE rn = 1),
        |sel3 AS (SELECT query_id, cand_id FROM sel2
        |         UNION ALL SELECT query_id, cand_id FROM p3),
        |p4 AS (
        | SELECT query_id, cand_id, rel, score10 FROM (
        |  SELECT g.*, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score10 DESC, cand_id) AS rn
        |  FROM (
        |   SELECT s.query_id, s.cand_id, s.rel,
        |    CAST(7*s.rel - 3*max(m.simm) AS BIGINT) AS score10
        |   FROM short s
        |   JOIN sel3 t ON t.query_id = s.query_id AND t.cand_id != s.cand_id
        |   JOIN sims m ON m.query_id = s.query_id
        |     AND m.ca = least(s.cand_id, t.cand_id)
        |     AND m.cb = greatest(s.cand_id, t.cand_id)
        |   WHERE NOT EXISTS (SELECT 1 FROM sel3 z
        |     WHERE z.query_id = s.query_id AND z.cand_id = s.cand_id)
        |   GROUP BY s.query_id, s.cand_id, s.rel) g) gg
        | WHERE rn = 1)
        |SELECT query_id, CAST(1 AS BIGINT) AS pick, cand_id AS neighbor_id,
        |       rel AS rel_micro, score10 FROM p1
        |UNION ALL SELECT query_id, 2, cand_id, rel, score10 FROM p2
        |UNION ALL SELECT query_id, 3, cand_id, rel, score10 FROM p3
        |UNION ALL SELECT query_id, 4, cand_id, rel, score10 FROM p4""".stripMargin,
    "sim_binary_quant" ->
      """WITH v AS (
        | SELECT vec_id,
        |  [CAST(round(x*1000000, 0) AS BIGINT) for x in embedding::DOUBLE[]] AS vq
        | FROM embeddings),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |dsum AS (
        | SELECT d, CAST(sum(vq[d]) AS BIGINT) AS sd
        | FROM v, generate_series(1,64) t(d) GROUP BY d),
        |w AS (
        | SELECT vec_id,
        |  CAST(sum(CASE WHEN d <= 32 AND vq[d]*n > sd
        |    THEN 1::BIGINT << (d-1) ELSE 0 END) AS BIGINT) AS w0,
        |  CAST(sum(CASE WHEN d > 32 AND vq[d]*n > sd
        |    THEN 1::BIGINT << (d-33) ELSE 0 END) AS BIGINT) AS w1
        | FROM v, c, dsum GROUP BY vec_id),
        |qs AS (SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1
        |       FROM w WHERE vec_id < 8),
        |h AS (
        | SELECT qs.query_id, w.vec_id AS neighbor_id,
        |  CAST(bit_count(xor(w.w0, qs.qw0)) +
        |       bit_count(xor(w.w1, qs.qw1)) AS BIGINT) AS hamming
        | FROM w, qs WHERE w.vec_id != qs.query_id),
        |short AS (
        | SELECT query_id, neighbor_id, hamming FROM (
        |  SELECT query_id, neighbor_id, hamming, row_number() OVER (
        |    PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rn FROM h) s
        | WHERE rn <= 20),
        |e AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |p AS (
        | SELECT s.query_id, s.neighbor_id, s.hamming,
        |  round(list_dot_product(a.vec, b.vec)/(a.nrm*b.nrm), 6) AS cosine
        | FROM short s JOIN e a ON a.vec_id = s.neighbor_id
        |              JOIN e b ON b.vec_id = s.query_id),
        |r AS (
        | SELECT query_id, neighbor_id, hamming, cosine, row_number() OVER (
        |   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM p)
        |SELECT query_id, neighbor_id, hamming, cosine, rnk FROM r
        |WHERE rnk <= 5""".stripMargin,
    "sim_int8_topk" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |mx AS (
        | SELECT vec_id, e, list_max([abs(x) for x in e]) AS m FROM v),
        |q8 AS (
        | SELECT vec_id,
        |  [CAST(CAST(round(x*127/m, 0) AS BIGINT) AS DOUBLE) for x in e] AS q
        | FROM mx WHERE m > 0),
        |n AS (
        | SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS nrm FROM q8),
        |qs AS (SELECT vec_id AS query_id, q AS qq, nrm AS qnrm
        |       FROM n WHERE vec_id < 8),
        |p AS (
        | SELECT qs.query_id, n.vec_id AS neighbor_id,
        |  round(list_dot_product(n.q, qs.qq)/(n.nrm*qs.qnrm), 6) AS cosine
        | FROM n, qs WHERE n.vec_id != qs.query_id),
        |r AS (
        | SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rnk
        | FROM p)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "sim_ivf_nprobe2" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |c AS (SELECT vec_id AS cid, vec AS cvec, nrm AS cnrm FROM v WHERE vec_id < 4),
        |scored AS (
        | SELECT v.vec_id, c.cid,
        |  row_number() OVER (PARTITION BY v.vec_id
        |    ORDER BY round(list_dot_product(v.vec, c.cvec)/(v.nrm*c.cnrm), 6) DESC,
        |             c.cid) AS rn
        | FROM v, c WHERE v.vec_id >= 4),
        |assign AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
        |idx AS (SELECT a.vec_id, a.cid, v.vec, v.nrm
        |        FROM assign a JOIN v USING (vec_id)),
        |qp AS (SELECT vec_id AS query_id, cid FROM scored
        |       WHERE vec_id < 12 AND rn <= 2),
        |q AS (SELECT qp.query_id, qp.cid, v.vec AS qvec, v.nrm AS qnrm
        |      FROM qp JOIN v ON v.vec_id = qp.query_id),
        |p AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM idx i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rnk FROM p)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "text_balanced_sample" ->
      """SELECT doc_id, lang, rk FROM (
        | SELECT doc_id, lang, row_number() OVER (
        |   PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        | FROM documents) t
        |WHERE rk <= 50""".stripMargin,
    "mm_frame_meta" ->
      """SELECT doc_id, i AS frame_idx,
        | least(64, blen - i*64) AS frame_len
        |FROM (SELECT doc_id, blen,
        |  unnest(generate_series(0, CAST(ceil(blen/64.0) AS BIGINT)-1, 4)) AS i
        | FROM (SELECT doc_id, octet_length(encode(text)) AS blen
        |       FROM documents) b) t""".stripMargin,
    "tel_gap_fill" ->
      """WITH hourly AS (
        | SELECT user_id, date_trunc('hour', ts) AS h,
        |  count(*) AS n, round(sum(value),4) AS sv
        | FROM events GROUP BY 1,2),
        |grid AS (
        | SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        | FROM (SELECT user_id, min(h) AS h0, max(h) AS h1
        |       FROM hourly GROUP BY 1) s)
        |SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
        | coalesce(hourly.n, 0) AS n_events,
        | last_value(hourly.sv IGNORE NULLS) OVER (
        |   PARTITION BY g.user_id ORDER BY g.h
        |   ROWS UNBOUNDED PRECEDING) AS filled_sum
        |FROM grid g LEFT JOIN hourly
        |  ON g.user_id = hourly.user_id AND g.h = hourly.h""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        |cand AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
        |  count(*) AS inter
        | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1,2,3,4),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   CAST(round(CAST(CAST(inter*1.0/(na+nb-inter) AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        |  FROM cand) p
        | WHERE jaccard >= 0.2),
        |edges AS (
        | SELECT doc_a AS src, doc_b AS dst FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS doc_id, least(src, min(dst)) AS label
        | FROM reach GROUP BY src)
        |SELECT label AS cluster_id, count(*) AS n_docs, max(doc_id) AS max_doc_id
        |FROM lab GROUP BY 1""".stripMargin,
    // pairwise cross-source redundancy: the dedup_clusters closure +
    // distinct (cluster, source) membership self-joined per cluster
    "dedup_source_matrix" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        |cand AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
        |  count(*) AS inter
        | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1,2,3,4),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   CAST(round(CAST(CAST(inter*1.0/(na+nb-inter) AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        |  FROM cand) p
        | WHERE jaccard >= 0.2),
        |edges AS (
        | SELECT doc_a AS src, doc_b AS dst FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS doc_id, least(src, min(dst)) AS label
        | FROM reach GROUP BY src),
        |m AS (SELECT DISTINCT lab.label, d.source
        |      FROM lab JOIN documents d USING (doc_id))
        |SELECT a.source AS source_a, b.source AS source_b,
        | CAST(count(*) AS BIGINT) AS n_shared_clusters
        |FROM m a JOIN m b ON a.label = b.label AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    // leakage-safe split: the dedup_clusters closure + rep-hashed
    // train/val/test assignment (near-dups can never straddle splits)
    "text_cluster_split" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        |cand AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
        |  count(*) AS inter
        | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1,2,3,4),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   CAST(round(CAST(CAST(inter*1.0/(na+nb-inter) AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        |  FROM cand) p
        | WHERE jaccard >= 0.2),
        |edges AS (
        | SELECT doc_a AS src, doc_b AS dst FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS doc_id, least(src, min(dst)) AS label
        | FROM reach GROUP BY src),
        |rep AS (
        | SELECT d.doc_id, d.source,
        |  CAST(len(string_split_regex(trim(d.text),'\s+')) AS BIGINT) AS n_tok,
        |  l.label, coalesce(l.label, d.doc_id) AS rep
        | FROM documents d LEFT JOIN lab l USING (doc_id))
        |SELECT source,
        | CASE WHEN substr(md5(CAST(rep AS VARCHAR)),1,2) < 'cd' THEN 'train'
        |      WHEN substr(md5(CAST(rep AS VARCHAR)),1,2) < 'e6' THEN 'val'
        |      ELSE 'test' END AS split,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN label IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_dup_docs,
        | CAST(sum(n_tok) AS BIGINT) AS sum_tokens
        |FROM rep GROUP BY 1, 2""".stripMargin,
    // per-source dedup impact: the dedup_clusters closure + apply
    // verdicts + canonical-source attribution
    "dedup_source_impact" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        |cand AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
        |  count(*) AS inter
        | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1,2,3,4),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   CAST(round(CAST(CAST(inter*1.0/(na+nb-inter) AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        |  FROM cand) p
        | WHERE jaccard >= 0.2),
        |edges AS (
        | SELECT doc_a AS src, doc_b AS dst FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS doc_id, least(src, min(dst)) AS label
        | FROM reach GROUP BY src),
        |appl AS (
        | SELECT d.doc_id, d.source, coalesce(l.label, d.doc_id) AS cluster_id,
        |  (l.label IS NULL OR l.label = d.doc_id) AS keep
        | FROM documents d LEFT JOIN lab l USING (doc_id)),
        |canon AS (SELECT cluster_id, source AS canon_source
        |          FROM appl WHERE keep)
        |SELECT a.source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN NOT a.keep THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_dropped,
        | CAST(sum(CASE WHEN NOT a.keep AND c.canon_source != a.source
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_source,
        | CAST(sum(CASE WHEN NOT a.keep THEN 1 ELSE 0 END) * 10000 // count(*)
        |   AS BIGINT) AS dropped_bp
        |FROM appl a JOIN canon c USING (cluster_id) GROUP BY 1""".stripMargin,
    // canonical selection: the dedup_clusters closure + keep-longest
    // (tie -> min doc_id) and reclaimed-token accounting
    "dedup_canonical" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        |cand AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
        |  count(*) AS inter
        | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1,2,3,4),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   CAST(round(CAST(CAST(inter*1.0/(na+nb-inter) AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        |  FROM cand) p
        | WHERE jaccard >= 0.2),
        |edges AS (
        | SELECT doc_a AS src, doc_b AS dst FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS doc_id, least(src, min(dst)) AS label
        | FROM reach GROUP BY src),
        |sz AS (
        | SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)),'\s+')) AS BIGINT)
        |   AS n_toks
        | FROM documents),
        |ranked AS (
        | SELECT lab.label, lab.doc_id, sz.n_toks,
        |  row_number() OVER (PARTITION BY lab.label
        |                     ORDER BY sz.n_toks DESC, lab.doc_id ASC) AS rn
        | FROM lab JOIN sz ON sz.doc_id = lab.doc_id)
        |SELECT label AS cluster_id, count(*) AS n_docs,
        | CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS kept_doc,
        | CAST(max(CASE WHEN rn = 1 THEN n_toks END) AS BIGINT) AS kept_tokens,
        | CAST(sum(CASE WHEN rn > 1 THEN n_toks ELSE 0 END) AS BIGINT)
        |   AS dropped_tokens
        |FROM ranked GROUP BY 1""".stripMargin,
    "text_curation_funnel" ->
      // four proven stage oracles (exact min-id, recursive-CTE near-dup
      // closure, gopher rules, langid argmax) joined into per-doc
      // verdicts; sequential attrition counts unpivoted to the funnel
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        |cand AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
        |  count(*) AS inter
        | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1,2,3,4),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   CAST(round(CAST(CAST(inter*1.0/(na+nb-inter) AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        |  FROM cand) p
        | WHERE jaccard >= 0.2),
        |edges AS (
        | SELECT doc_a AS src, doc_b AS dst FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS doc_id, least(src, min(dst)) AS label
        | FROM reach GROUP BY src),
        |ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |gt AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS tk,
        |  length(regexp_replace(trim(text),'\s+','','g')) AS n_nospace
        | FROM documents),
        |gc AS (
        | SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(tk, x -> regexp_matches(x,'[a-z]'))) AS BIGINT)
        |    AS n_alpha_words,
        |  CAST(len(list_intersect(list_distinct(tk),
        |    ['the','a','of','and','to','in','is','on','for','with'])) AS BIGINT)
        |    AS n_stop_distinct,
        |  n_nospace FROM gt),
        |gr AS (
        | SELECT doc_id, n_words, n_alpha_words, n_stop_distinct,
        |  CAST(round(CAST(CAST(n_nospace*1.0/n_words AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS mean_word_len,
        |  CAST(round(CAST(CAST(n_alpha_words*1.0/n_words AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS alpha_frac
        | FROM gc),
        |gq AS (
        | SELECT doc_id, (n_words >= 5 AND n_words <= 100000
        |   AND mean_word_len >= 3 AND mean_word_len <= 10
        |   AND alpha_frac >= 0.8 AND n_stop_distinct >= 2) AS keep FROM gr),
        |scores AS (
        | SELECT doc_id, 'de' AS lang_code, len(list_filter(t,
        |   x -> x IN ('der','die','und','das','ist','nicht','ein','mit'))) AS score FROM toks
        | UNION ALL SELECT doc_id, 'en', len(list_filter(t,
        |   x -> x IN ('the','and','of','to','is','in','that','for'))) FROM toks
        | UNION ALL SELECT doc_id, 'es', len(list_filter(t,
        |   x -> x IN ('el','la','de','que','y','en','los','una'))) FROM toks
        | UNION ALL SELECT doc_id, 'fr', len(list_filter(t,
        |   x -> x IN ('le','la','de','et','les','des','un','une'))) FROM toks),
        |li AS (
        | SELECT doc_id, lang_code AS pred_lang FROM (
        |  SELECT doc_id, lang_code, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, lang_code DESC) AS rn
        |  FROM scores) r
        | WHERE rn = 1),
        |v AS (
        | SELECT d.doc_id,
        |  d.doc_id IN (SELECT doc_id FROM ex) AS s1,
        |  (l.label IS NULL OR l.label = d.doc_id) AS s2,
        |  g.keep AS s3,
        |  li.pred_lang = d.lang AS s4
        | FROM documents d
        | LEFT JOIN lab l ON l.doc_id = d.doc_id
        | JOIN gq g ON g.doc_id = d.doc_id
        | JOIN li ON li.doc_id = d.doc_id),
        |a AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN NOT s1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |  CAST(sum(CASE WHEN s1 AND NOT s2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        |  CAST(sum(CASE WHEN s1 AND s2 AND NOT s3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        |  CAST(sum(CASE WHEN s1 AND s2 AND s3 AND NOT s4 THEN 1 ELSE 0 END) AS BIGINT) AS d4
        | FROM v)
        |SELECT '1_exact_dedup' AS stage, n AS docs_in, d1 AS dropped,
        |       n - d1 AS docs_out FROM a
        |UNION ALL SELECT '2_near_dedup', n - d1, d2, n - d1 - d2 FROM a
        |UNION ALL SELECT '3_gopher_quality', n - d1 - d2, d3,
        |       n - d1 - d2 - d3 FROM a
        |UNION ALL SELECT '4_langid_match', n - d1 - d2 - d3, d4,
        |       n - d1 - d2 - d3 - d4 FROM a""".stripMargin,
    "tel_pattern_match" ->
      """WITH s AS (
        | SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  string_agg(substr(event_type,1,1), '' ORDER BY ts, event_id) AS seq
        | FROM events GROUP BY 1)
        |SELECT user_id, n_events, seq, CAST(length(seq) AS BIGINT) AS seq_len,
        | CAST(len(regexp_extract_all(seq,'vcp')) AS BIGINT) AS n_vcp,
        | CAST(len(regexp_extract_all(seq,'v[^p]*p')) AS BIGINT)
        |   AS n_view_to_purchase,
        | CAST(len(regexp_extract_all(seq,'ee')) AS BIGINT) AS n_double_error
        |FROM s""".stripMargin,
    "dedup_incremental" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |shl AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |hv AS (
        | SELECT doc_id,
        |  list_distinct([('0x'||substr(md5(g),1,15))::BIGINT for g in s]) AS hs
        | FROM shl),
        |mh AS (
        | SELECT doc_id, i,
        |  min(((h % 2147483647) * (2*i+1) + i*2654435761) % 2147483647) AS v
        | FROM (SELECT doc_id, unnest(hs) AS h FROM hv),
        |      (SELECT unnest(generate_series(0,63)) AS i) g
        | GROUP BY doc_id, i),
        |bk AS (
        | SELECT doc_id, i//4 AS band_idx,
        |  md5(string_agg(v::VARCHAR, '-' ORDER BY i)) AS band_key
        | FROM mh GROUP BY doc_id, i//4),
        |src AS (SELECT doc_id, source,
        |        source IN ('src18','src19') AS probe FROM documents),
        |cand AS (
        | SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        | FROM bk n JOIN src sn ON sn.doc_id = n.doc_id AND sn.probe
        | JOIN bk o ON o.band_idx = n.band_idx AND o.band_key = n.band_key
        | JOIN src so ON so.doc_id = o.doc_id AND NOT so.probe),
        |ver AS (
        | SELECT c.new_id, c.old_id,
        |  CAST(round(CAST(CAST(len(list_intersect(x.hs, y.hs))*1.0
        |    / len(list_distinct(x.hs || y.hs)) AS VARCHAR)
        |    AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        | FROM cand c JOIN hv x ON c.new_id = x.doc_id
        |             JOIN hv y ON c.old_id = y.doc_id),
        |agg AS (
        | SELECT new_id, CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN jaccard >= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dups,
        |  min(CASE WHEN jaccard >= 0.2 THEN old_id END) AS dup_of
        | FROM ver GROUP BY 1)
        |SELECT s.doc_id, s.source,
        | coalesce(a.n_candidates, 0) AS n_candidates,
        | coalesce(a.n_dups, 0) > 0 AS is_dup, a.dup_of
        |FROM src s LEFT JOIN agg a ON a.new_id = s.doc_id
        |WHERE s.probe""".stripMargin,
    "text_shard_overlap" ->
      """WITH toks AS (
        | SELECT source, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT source, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |ssh AS (
        | SELECT DISTINCT source, ('0x'||substr(md5(g),1,15))::BIGINT AS h
        | FROM (SELECT source, unnest(s) AS g FROM sh)),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |          FROM ssh GROUP BY 1),
        |pairs AS (
        | SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(count(*) AS BIGINT) AS inter
        | FROM ssh a JOIN ssh b ON a.h = b.h AND a.source < b.source
        | GROUP BY 1,2),
        |pv AS (
        | SELECT source, i,
        |  min(((h % 2147483647) * (2*i+1) + i*2654435761) % 2147483647) AS mn
        | FROM ssh, (SELECT unnest(generate_series(0,63)) AS i) g GROUP BY 1,2),
        |agree AS (
        | SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(sum(CASE WHEN a.mn = b.mn THEN 1 ELSE 0 END) AS BIGINT) AS ag
        | FROM pv a JOIN pv b ON a.i = b.i AND a.source < b.source
        | GROUP BY 1,2)
        |SELECT p.source_a, p.source_b, sa.n AS n_a, sb.n AS n_b, p.inter,
        | round(p.inter*1.0/(sa.n + sb.n - p.inter), 6) AS exact_jaccard,
        | round(coalesce(ag.ag, 0)/64.0, 6) AS est_jaccard
        |FROM pairs p
        |JOIN sizes sa ON sa.source = p.source_a
        |JOIN sizes sb ON sb.source = p.source_b
        |LEFT JOIN agree ag ON ag.source_a = p.source_a
        |                  AND ag.source_b = p.source_b""".stripMargin,
    "dedup_cluster_stats" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        |cand AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
        |  count(*) AS inter
        | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1,2,3,4),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   CAST(round(CAST(CAST(inter*1.0/(na+nb-inter) AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        |  FROM cand) p
        | WHERE jaccard >= 0.2),
        |edges AS (
        | SELECT doc_a AS src, doc_b AS dst FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS doc_id, least(src, min(dst)) AS label
        | FROM reach GROUP BY src),
        |cl AS (SELECT label, count(*) AS n_docs FROM lab GROUP BY 1),
        |hist AS (
        | SELECT n_docs AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(sum(n_docs) AS BIGINT) AS docs,
        |  CAST(sum(n_docs - 1) AS BIGINT) AS drop_docs
        | FROM cl GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS corpus_n FROM documents)
        |SELECT cluster_size, n_clusters, docs, drop_docs,
        | round(docs*1.0/corpus_n, 6) AS frac_corpus
        |FROM hist, tot""".stripMargin,
    "sim_centroid_outliers" ->
      s"""$KmeansCtes,
        |d AS (
        | SELECT v.vec_id, af.cid,
        |  list_reduce(list_transform(range(1,65),
        |    i -> (vq[i]-c[i])*(vq[i]-c[i])), (a,b) -> a+b) AS dist_raw
        | FROM v JOIN af USING (vec_id) JOIN c2 USING (cid))
        |SELECT vec_id, cid,
        | CAST(round(CAST(CAST(dist_raw/1000000000000.0 AS VARCHAR)
        |   AS DECIMAL(38,18)),6) AS DOUBLE) AS dist
        |FROM d ORDER BY dist_raw DESC, vec_id LIMIT 20""".stripMargin,
    "dedup_apply" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
        |cand AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
        |  count(*) AS inter
        | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1,2,3,4),
        |pairs AS (
        | SELECT doc_a, doc_b FROM (
        |  SELECT doc_a, doc_b,
        |   CAST(round(CAST(CAST(inter*1.0/(na+nb-inter) AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
        |  FROM cand) p
        | WHERE jaccard >= 0.2),
        |edges AS (
        | SELECT doc_a AS src, doc_b AS dst FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS doc_id, least(src, min(dst)) AS label
        | FROM reach GROUP BY src)
        |SELECT d.doc_id,
        | CAST(coalesce(l.label, d.doc_id) AS BIGINT) AS cluster_id,
        | (l.label IS NULL OR l.label = d.doc_id) AS keep,
        | CAST(d.n_chars AS BIGINT) AS n_chars
        |FROM documents d LEFT JOIN lab l USING (doc_id)""".stripMargin,
    "tel_heavy_hitters" ->
      """SELECT item, cnt FROM (
        | SELECT CAST(floor(value) AS BIGINT) AS item, count(*) AS cnt
        | FROM events GROUP BY 1) t
        |WHERE cnt > (SELECT count(*) FROM events) * 0.01""".stripMargin,
    "tel_grid_percentiles" ->
      """WITH g AS (
        | SELECT event_type, CAST(round(value*100) AS BIGINT) AS v100,
        |  count(*) AS c
        | FROM events GROUP BY 1,2),
        |w AS (
        | SELECT event_type, v100, c,
        |  sum(c) OVER (PARTITION BY event_type) AS n,
        |  sum(c) OVER (PARTITION BY event_type ORDER BY v100
        |    ROWS UNBOUNDED PRECEDING) AS cum
        | FROM g)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        | min(CASE WHEN cum >= ceil(0.5*n) THEN v100 END)/100.0 AS p50,
        | min(CASE WHEN cum >= ceil(0.95*n) THEN v100 END)/100.0 AS p95,
        | min(CASE WHEN cum >= ceil(0.99*n) THEN v100 END)/100.0 AS p99
        |FROM w GROUP BY event_type""".stripMargin,
    "tel_exp_hist_pctl" ->
      """WITH b AS (
        | SELECT event_type,
        |  CAST(length(bin(greatest(CAST(round(value*100) AS BIGINT), 1)))-1 AS BIGINT) AS idx,
        |  count(*) AS c
        | FROM events WHERE value > 0 GROUP BY 1,2),
        |w AS (
        | SELECT event_type, idx, c,
        |  sum(c) OVER (PARTITION BY event_type) AS n,
        |  sum(c) OVER (PARTITION BY event_type ORDER BY idx
        |    ROWS UNBOUNDED PRECEDING) AS cum
        | FROM b),
        |w2 AS (
        | SELECT *, cum - c AS cumb,
        |  CAST(ceil(0.5*n) AS BIGINT) AS r50,
        |  CAST(ceil(0.95*n) AS BIGINT) AS r95
        | FROM w)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        | min(CASE WHEN cum >= r50 AND cumb < r50 THEN
        |   pow(2,idx)/100 + (pow(2,idx+1)/100 - pow(2,idx)/100)
        |     * (CAST(r50 - cumb AS DOUBLE)/c) END) AS p50_est,
        | min(CASE WHEN cum >= r95 AND cumb < r95 THEN
        |   pow(2,idx)/100 + (pow(2,idx+1)/100 - pow(2,idx)/100)
        |     * (CAST(r95 - cumb AS DOUBLE)/c) END) AS p95_est
        |FROM w2 GROUP BY event_type""".stripMargin,
    "tel_exp_histogram" ->
      """SELECT event_type, bucket_idx, bucket_count, min_value, max_value,
        | pow(2, bucket_idx)/100 AS bucket_lo,
        | pow(2, bucket_idx+1)/100 AS bucket_hi
        |FROM (
        | SELECT event_type,
        |  CAST(length(bin(greatest(CAST(round(value*100) AS BIGINT), 1)))-1 AS BIGINT) AS bucket_idx,
        |  count(*) AS bucket_count,
        |  round(min(value),4) AS min_value, round(max(value),4) AS max_value
        | FROM events WHERE value > 0 GROUP BY 1,2) t""".stripMargin,
    "tel_session_window" ->
      """WITH w AS (
        | SELECT user_id, ts, event_id, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |s AS (
        | SELECT *, CASE WHEN prev_ts IS NULL
        |   OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
        | FROM w),
        |s2 AS (
        | SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        | FROM s)
        |SELECT user_id,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        | strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        | count(*) AS n_events, min(event_id) AS first_event_id,
        | round(sum(value),4) AS sum_value
        |FROM s2 GROUP BY user_id, sid""".stripMargin,
    "text_gopher_quality" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS tk,
        |  length(regexp_replace(trim(text),'\s+','','g')) AS n_nospace
        | FROM documents),
        |c AS (
        | SELECT doc_id,
        |  CAST(len(tk) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(tk, x -> regexp_matches(x,'[a-z]'))) AS BIGINT) AS n_alpha_words,
        |  CAST(len(list_intersect(list_distinct(tk),
        |    ['the','a','of','and','to','in','is','on','for','with'])) AS BIGINT) AS n_stop_distinct,
        |  n_nospace
        | FROM t),
        |r AS (
        | SELECT doc_id, n_words, n_alpha_words, n_stop_distinct,
        |  CAST(round(CAST(CAST(n_nospace*1.0/n_words AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS mean_word_len,
        |  CAST(round(CAST(CAST(n_alpha_words*1.0/n_words AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS alpha_frac
        | FROM c)
        |SELECT doc_id, n_words, n_alpha_words, n_stop_distinct,
        | mean_word_len, alpha_frac,
        | CAST(CASE WHEN n_words >= 5 AND n_words <= 100000
        |   AND mean_word_len >= 3 AND mean_word_len <= 10
        |   AND alpha_frac >= 0.8 AND n_stop_distinct >= 2
        |  THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM r""".stripMargin,
    "text_mix_weights" ->
      """WITH pl AS (
        | SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text),'\s+'))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY lang),
        |tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM pl)
        |SELECT lang, n_docs, n_tokens,
        | CAST(round(CAST(CAST(n_tokens/CAST(total AS DOUBLE) AS VARCHAR) AS DECIMAL(38,18)),6) AS DOUBLE) AS token_share,
        | CAST(round(CAST(CAST(sqrt(CAST(n_tokens AS DOUBLE))/sqrt(CAST(total AS DOUBLE)) AS VARCHAR) AS DECIMAL(38,18)),6) AS DOUBLE) AS weight
        |FROM pl, tt""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS tk
        | FROM documents),
        |g AS (
        | SELECT doc_id, CASE WHEN len(tk) >= 2
        |   THEN [tk[i] || ' ' || tk[i+1] for i in generate_series(1, len(tk)-1)]
        |   ELSE [] END AS grams
        | FROM t)
        |SELECT doc_id,
        | CAST(len(grams) AS BIGINT) AS n_2grams,
        | CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
        | CASE WHEN len(grams) = 0 THEN 0.0 ELSE
        |  CAST(round(CAST(CAST((len(grams)-len(list_distinct(grams)))*1.0/len(grams)
        |    AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) END AS rep_frac
        |FROM g""".stripMargin,
    "text_pii_scrub" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text,
        |   '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        | CAST(len(regexp_extract_all(text,
        |   '\+?[0-9][0-9 ()-]{7,}[0-9]')) AS BIGINT) AS n_phones,
        | md5(regexp_replace(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |   '\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g')) AS clean_hash
        |FROM documents""".stripMargin,
    "text_winnow" ->
      """WITH hl AS (
        | SELECT doc_id, trim(lower(text)) AS s,
        |  length(trim(lower(text))) AS ln FROM documents),
        |hs AS (
        | SELECT doc_id,
        |  [list_reduce([unicode(s[p+j])::BIGINT for j in generate_series(0,7)],
        |     (h, c) -> (h*1000003 + c) % 2147483647)
        |   for p in generate_series(1, ln-7)] AS hh
        | FROM hl),
        |fp AS (
        | SELECT doc_id,
        |  list_distinct([list_min(hh[w:w+3])
        |    for w in generate_series(1, len(hh)-3)]) AS fps
        | FROM hs)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
        | CAST(coalesce(list_min(fps), 0) AS BIGINT) AS min_fp,
        | CAST(coalesce(list_max(fps), 0) AS BIGINT) AS max_fp
        |FROM fp""".stripMargin,
    "mm_audio_windows" ->
      """SELECT doc_id, o AS win_off,
        | least(64, blen - o) AS win_len,
        | md5(substr(text, CAST(o+1 AS BIGINT), 64)) AS win_md5
        |FROM (SELECT doc_id, text, blen,
        |  unnest(generate_series(0, blen-1, 32)) AS o
        | FROM (SELECT doc_id, text, octet_length(encode(text)) AS blen
        |       FROM documents) b) t""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, i AS frame_idx,
        | least(64, blen - i*64) AS frame_len,
        | md5(substr(text, CAST(i*64+1 AS BIGINT), 64)) AS frame_md5
        |FROM (SELECT doc_id, text, blen,
        |  unnest(generate_series(0, CAST(ceil(blen/64.0) AS BIGINT)-1, 4)) AS i
        | FROM (SELECT doc_id, text, octet_length(encode(text)) AS blen
        |       FROM documents) b) t""".stripMargin,
    "dedup_simhash" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)),'\s+')) AS t
        | FROM documents),
        |hl AS (
        | SELECT doc_id,
        |  ('0x'||substr(md5(t),1,8))::BIGINT AS hi,
        |  ('0x'||substr(md5(t),9,8))::BIGINT AS lo
        | FROM toks),
        |votes AS (
        | SELECT doc_id, j,
        |  CASE WHEN sum(CASE WHEN
        |    (CASE WHEN j < 32 THEN (lo >> j) ELSE (hi >> (j-32)) END) & 1 = 1
        |    THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS sb
        | FROM hl, (SELECT unnest(generate_series(0,63)) AS j) js
        | GROUP BY doc_id, j),
        |sim AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN s >= 9223372036854775808
        |    THEN s - 18446744073709551616 ELSE s END AS BIGINT) AS simhash64,
        |  CAST(b16 AS BIGINT) AS band16
        | FROM (SELECT doc_id,
        |   sum(CAST(sb AS HUGEINT) * (CAST(1 AS HUGEINT) << j)) AS s,
        |   sum(CASE WHEN j >= 48 THEN CAST(sb AS BIGINT) << (j-48) ELSE 0 END) AS b16
        |  FROM votes GROUP BY doc_id) q)
        |SELECT doc_id, simhash64, band16 FROM sim""".stripMargin,
    "dedup_simhash_pairs" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)),'\s+')) AS t
        | FROM documents),
        |hl AS (
        | SELECT doc_id,
        |  ('0x'||substr(md5(t),1,8))::BIGINT AS hi,
        |  ('0x'||substr(md5(t),9,8))::BIGINT AS lo
        | FROM toks),
        |votes AS (
        | SELECT doc_id, j,
        |  CASE WHEN sum(CASE WHEN
        |    (CASE WHEN j < 32 THEN (lo >> j) ELSE (hi >> (j-32)) END) & 1 = 1
        |    THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS sb
        | FROM hl, (SELECT unnest(generate_series(0,63)) AS j) js
        | GROUP BY doc_id, j),
        |sim AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN s >= 9223372036854775808
        |    THEN s - 18446744073709551616 ELSE s END AS BIGINT) AS simhash64,
        |  CAST(b16 AS BIGINT) AS band16
        | FROM (SELECT doc_id,
        |   sum(CAST(sb AS HUGEINT) * (CAST(1 AS HUGEINT) << j)) AS s,
        |   sum(CASE WHEN j >= 48 THEN CAST(sb AS BIGINT) << (j-48) ELSE 0 END) AS b16
        |  FROM votes GROUP BY doc_id) q)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | CAST(bit_count(xor(a.simhash64, b.simhash64)) AS BIGINT) AS hamming
        |FROM sim a JOIN sim b ON a.band16 = b.band16 AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 6""".stripMargin,
    "dedup_minhash_lsh" -> MinhashLshOracle,
    // empirical LSH S-curve: exact pairs bucketed by true similarity,
    // fraction captured by the banded MinHash index per bucket
    "dedup_lsh_recall" ->
      s"""WITH exact AS (SELECT * FROM (${ngramJaccardOracle("0.2")}) e0),
        |lshp AS (SELECT doc_a, doc_b FROM ($MinhashLshOracle) l0)
        |SELECT CAST(floor(e.jaccard*10) AS BIGINT) AS bucket10,
        | CAST(count(*) AS BIGINT) AS n_exact,
        | CAST(sum(CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_captured,
        | CAST(CAST(sum(CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS DOUBLE) / count(*) AS recall
        |FROM exact e LEFT JOIN lshp l
        | ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b
        |GROUP BY 1""".stripMargin,
    "mm_resize_meta" ->
      """SELECT doc_id, w AS src_width, h AS src_height,
        | greatest(1, CAST(round(w*scale) AS BIGINT)) AS out_width,
        | greatest(1, CAST(round(h*scale) AS BIGINT)) AS out_height,
        | greatest(1, CAST(round(w*scale) AS BIGINT))
        |   * greatest(1, CAST(round(h*scale) AS BIGINT)) * c AS out_bytes
        |FROM (SELECT doc_id, w, h, c,
        |  least(1.0, least(128.0/w, 128.0/h)) AS scale
        | FROM (SELECT doc_id,
        |   64 + ascii(substr(text,1,1)) % 192 AS w,
        |   64 + ascii(substr(text,2,1)) % 192 AS h,
        |   1 + octet_length(encode(text)) % 4 AS c
        |  FROM documents) d) s""".stripMargin,
    "q_winsorize" ->
      """WITH b AS (
        | SELECT l_returnflag AS rf,
        |  quantile_cont(l_extendedprice, 0.05) AS lo,
        |  quantile_cont(l_extendedprice, 0.95) AS hi
        | FROM lineitem GROUP BY 1),
        |a AS (
        | SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(CASE WHEN l.l_extendedprice < b.lo
        |                  OR l.l_extendedprice > b.hi
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
        |  round(CAST(max(b.lo) AS DOUBLE), 4) AS p05,
        |  round(CAST(max(b.hi) AS DOUBLE), 4) AS p95,
        |  round(sum(l.l_extendedprice), 4) AS raw_sum,
        |  round(sum(least(greatest(l.l_extendedprice, b.lo), b.hi)), 4)
        |    AS winsor_sum
        | FROM lineitem l JOIN b ON l.l_returnflag = b.rf
        | GROUP BY 1)
        |SELECT l_returnflag, n, n_clamped, p05, p95, raw_sum, winsor_sum,
        | CAST(round(CAST(CAST(raw_sum/n AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS raw_mean,
        | CAST(round(CAST(CAST(winsor_sum/n AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS winsor_mean
        |FROM a""".stripMargin,
    "text_train_split" ->
      """SELECT source, split, n_docs, sum_tokens,
        | CAST((n_docs * 10000) //
        |   CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
        |   AS BIGINT) AS share_bp
        |FROM (
        | SELECT source, split, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text),'\s+'))) AS BIGINT)
        |    AS sum_tokens
        | FROM (
        |  SELECT source, text,
        |   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'cd' THEN 'train'
        |        WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'e6' THEN 'val'
        |        ELSE 'test' END AS split
        |  FROM documents) d
        | GROUP BY 1, 2) a""".stripMargin,
    "text_token_budget" ->
      """WITH t AS (
        | SELECT source, doc_id,
        |  CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS n_tok,
        |  md5(CAST(doc_id AS VARCHAR)) AS h
        | FROM documents),
        |c AS (
        | SELECT source, n_tok,
        |  CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
        | FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS tokens_total,
        | CAST(sum(CASE WHEN cum_end - n_tok < 800 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_kept,
        | CAST(sum(CASE WHEN cum_end - n_tok < 800 THEN n_tok ELSE 0 END)
        |   AS BIGINT) AS tokens_kept,
        | CAST(CAST(sum(CASE WHEN cum_end - n_tok < 800 THEN n_tok ELSE 0 END)
        |     AS BIGINT) * 10000
        |   // CAST(sum(n_tok) AS BIGINT) AS BIGINT) AS kept_bp
        |FROM c GROUP BY 1""".stripMargin,
    "q_median" ->
      """SELECT l_returnflag, count(*) AS n,
        | quantile_cont(l_quantity, 0.25) AS q1_qty,
        | quantile_cont(l_quantity, 0.5) AS med_qty,
        | quantile_cont(l_quantity, 0.75) AS q3_qty,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_listagg" ->
      """SELECT r_name, count(*) AS n_nations,
        | string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,
    "tel_hopping_window" ->
      """SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        | event_type, count(*) AS n_events, round(sum(value),4) AS sum_value
        |FROM (SELECT time_bucket(INTERVAL '15 minutes', ts)
        |        - to_minutes(k*15) AS win_start,
        |       event_type, value
        |      FROM events, (SELECT unnest(range(4)) AS k) ks) h
        |GROUP BY 1,2""".stripMargin,
    // CMS with md5-row-salted bucket hashes (w=⌈e/1e-4⌉=27183, d=5):
    // counters are deterministic integers, so the sketch replays
    // exactly — est = min over rows of the (i, bucket) counter
    "tel_cms_counts" ->
      """WITH ev AS (SELECT user_id FROM events),
        |rows_ AS (SELECT unnest(generate_series(0, 4)) AS i),
        |h AS (
        | SELECT user_id, i,
        |  ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
        |     CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 27183 AS bucket
        | FROM ev CROSS JOIN rows_),
        |counters AS (
        | SELECT i, bucket, CAST(count(*) AS BIGINT) AS c
        | FROM h GROUP BY 1, 2),
        |exact AS (
        | SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        | FROM ev GROUP BY 1),
        |probes AS (
        | SELECT e.user_id, e.exact_cnt, r.i,
        |  ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' ||
        |     CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT % 27183 AS bucket
        | FROM exact e CROSS JOIN rows_ r)
        |SELECT p.user_id, p.exact_cnt,
        | CAST(min(c.c) AS BIGINT) AS est_cnt,
        | (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_total
        |FROM probes p JOIN counters c USING (i, bucket)
        |GROUP BY 1, 2""".stripMargin,
    "tel_anomaly" ->
      """WITH v AS (
        | SELECT event_id, event_type, value,
        |  CAST(round(value*100) AS BIGINT) AS v100
        | FROM events),
        |a AS (
        | SELECT event_type, count(*) AS n, sum(v100) AS s,
        |  sum(v100*v100) AS ss
        | FROM v GROUP BY 1)
        |SELECT event_id, event_type, value,
        | (CAST(v100 AS DOUBLE) - CAST(s AS DOUBLE)/n) /
        |  sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)
        |       /(n-1)) AS z
        |FROM v JOIN a USING (event_type)
        |WHERE abs((CAST(v100 AS DOUBLE) - CAST(s AS DOUBLE)/n) /
        |  sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)
        |       /(n-1))) >= 3""".stripMargin,
    "tel_ewma" ->
      """SELECT event_type, count(*) AS n,
        | list_reduce(list(value ORDER BY ts, event_id),
        |             (acc,x) -> acc*0.75 + x*0.25) AS ewma
        |FROM events GROUP BY 1""".stripMargin,
    "text_chunking" ->
      """SELECT doc_id, (start//80)::BIGINT AS chunk_idx,
        | start::BIGINT AS chunk_start,
        | length(substr(text, (start+1)::INT, 120))::BIGINT AS chunk_len,
        | substr(text, (start+1)::INT, 120) AS chunk_text
        |FROM (SELECT doc_id, text, unnest(range(0, length(text), 80)) AS start
        |      FROM documents WHERE length(text) > 0) t""".stripMargin,
    // exact-integer surprisal (bits(total) - bits(count)) — no libm, no
    // rounding tolerance; the single final division is IEEE-exact
    "text_unigram_surprisal" ->
      """WITH t AS (
        | SELECT doc_id,
        |  unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        | FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS total FROM t)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        | CAST(sum(length(bin(n.total)) - length(bin(c.cnt))) AS BIGINT)
        |   AS sum_surprisal,
        | CAST(CAST(sum(length(bin(n.total)) - length(bin(c.cnt))) AS BIGINT)
        |   AS DOUBLE) / count(*) AS mean_surprisal
        |FROM t JOIN c USING (term), n
        |GROUP BY t.doc_id""".stripMargin,
    // head/middle/tail terciles per language over the exact surprisal
    // ordering; bucket stats from integer sums, one exact division
    "text_surprisal_buckets" ->
      """WITH t AS (
        | SELECT doc_id,
        |  unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        | FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS total FROM t),
        |s AS (
        | SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(bin(n.total)) - length(bin(c.cnt))) AS BIGINT)
        |    AS sum_surprisal
        | FROM t JOIN c USING (term), n GROUP BY t.doc_id),
        |r AS (
        | SELECT d.lang, s.n_tokens, s.sum_surprisal,
        |  ntile(3) OVER (PARTITION BY d.lang
        |    ORDER BY CAST(s.sum_surprisal AS DOUBLE)/s.n_tokens, s.doc_id)
        |    AS tercile
        | FROM s JOIN documents d USING (doc_id))
        |SELECT lang,
        | CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |  ELSE 'tail' END AS bucket,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        | CAST(sum(sum_surprisal) AS BIGINT) AS sum_surprisal,
        | CAST(CAST(sum(sum_surprisal) AS BIGINT) AS DOUBLE) /
        |   CAST(sum(n_tokens) AS BIGINT) AS pooled_mean_surprisal
        |FROM r GROUP BY lang, bucket""".stripMargin,
    "text_doc_freq" ->
      """WITH t AS (
        | SELECT doc_id,
        |  unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS term
        | FROM documents),
        |d AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT term, df, n_docs, CAST(df AS DOUBLE)/n_docs AS df_frac
        |FROM d, n ORDER BY df DESC, term LIMIT 30""".stripMargin,
    "sim_range_search" ->
      """WITH n AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        | FROM embeddings),
        |q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
        |      FROM n WHERE vec_id < 8)
        |SELECT query_id, n.vec_id AS neighbor_id,
        | round(list_dot_product(n.vec, q.qvec)/(n.norm*q.qnorm), 6) AS cosine
        |FROM n, q WHERE n.vec_id != q.query_id
        | AND round(list_dot_product(n.vec, q.qvec)/(n.norm*q.qnorm), 6) >= 0.3""".stripMargin,
    "sim_kmeans_centroids" ->
      s"""$KmeansCtes,
        |stf AS (
        | SELECT af.cid, r.i AS pos,
        |  CAST(sum(vq[r.i]) AS BIGINT) AS s,
        |  CAST(sum(vq[r.i]*vq[r.i]) AS BIGINT) AS qs,
        |  count(*) AS n
        | FROM af JOIN v USING (vec_id) CROSS JOIN range(1,65) r(i)
        | GROUP BY 1, 2),
        |agg AS (
        | SELECT cid, any_value(n) AS cluster_n,
        |  list_reduce(
        |   list(CAST(qs AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n ORDER BY pos),
        |   (a, b) -> a + b) AS cost
        | FROM stf GROUP BY cid)
        |SELECT agg.cid, cluster_n, cost, c2.c[1] AS c_d1, c2.c[2] AS c_d2
        |FROM agg JOIN c2 USING (cid)""".stripMargin,
    // IVF health report over the trained assignments; every ratio is a
    // single IEEE op on exact integer aggregates (bit-exact)
    "sim_ivf_stats" ->
      s"""$KmeansCtes,
        |g AS (SELECT cid, CAST(count(*) AS BIGINT) AS cluster_n
        |      FROM af GROUP BY cid),
        |t AS (SELECT CAST(sum(cluster_n) AS BIGINT) AS total,
        |             CAST(count(*) AS BIGINT) AS k,
        |             CAST(max(cluster_n) AS BIGINT) AS max_n,
        |             CAST(sum(cluster_n*cluster_n) AS BIGINT) AS sum_sq
        |      FROM g)
        |SELECT g.cid, g.cluster_n,
        | CAST(g.cluster_n AS DOUBLE)/t.total AS frac,
        | CAST(t.max_n AS DOUBLE)*t.k/t.total AS peak_imbalance,
        | CAST(t.sum_sq AS DOUBLE)*t.k/(CAST(t.total AS DOUBLE)*t.total)
        |   AS scan_imbalance
        |FROM g, t""".stripMargin,
    // persisted-index probe is bit-identical to the train-inline IVF
    // (same autoK + Lloyd trajectory), so it shares the same replica
    "sim_ivf_persisted" ->
      s"""$KmeansCtes,
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm FROM af JOIN w USING (vec_id)),
        |q AS (SELECT vec_id AS query_id, cid, vec AS qvec, nrm AS qnrm
        |      FROM idx WHERE vec_id < 8),
        |p AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM idx i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        | row_number() OVER (PARTITION BY query_id
        |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM p)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "sim_ivf_append" ->
      s"""$KmeansBaseCtes,
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm FROM af JOIN w USING (vec_id)),
        |q AS (SELECT vec_id AS query_id, cid, vec AS qvec, nrm AS qnrm
        |      FROM idx WHERE vec_id < 8),
        |p AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM idx i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        | row_number() OVER (PARTITION BY query_id
        |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM p)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "sim_ivf_compact" ->
      // post-merge probe of the compacted index: frozen base-trained
      // centroids (KmeansBaseCtes) assign everyone, the tombstone set
      // (vec_id % 7 = 0) folds OUT at merge time — queries and
      // neighbors both come from the merged live set
      s"""$KmeansBaseCtes,
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |live AS (
        | SELECT af.vec_id, af.cid, w.vec, w.nrm FROM af JOIN w USING (vec_id)
        | WHERE af.vec_id % 7 != 0),
        |q AS (SELECT vec_id AS query_id, cid, vec AS qvec, nrm AS qnrm
        |      FROM live WHERE vec_id < 8),
        |p AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM live i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        | row_number() OVER (PARTITION BY query_id
        |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM p)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "sim_ivf_append_drift" ->
      s"""$KmeansBaseCtes,
        |coh AS (
        | SELECT af.vec_id, af.cid,
        |  CASE WHEN af.vec_id < sp.at THEN 0 ELSE 1 END AS cohort
        | FROM af, sp),
        |tx AS (
        | SELECT coh.cid, coh.cohort, r.i - 1 AS pos, count(*) AS n,
        |  CAST(sum(vq[r.i]) AS BIGINT) AS s,
        |  sum(CAST(vq[r.i] AS DOUBLE)*CAST(vq[r.i] AS DOUBLE)) AS q
        | FROM coh JOIN v USING (vec_id) CROSS JOIN range(1,65) r(i)
        | GROUP BY 1, 2, 3),
        |tm AS (
        | SELECT tx.cid, tx.cohort, tx.pos, tx.n,
        |  q - 2*c2.c[tx.pos+1]*CAST(s AS DOUBLE) + n*c2.c[tx.pos+1]*c2.c[tx.pos+1]
        |    AS term
        | FROM tx JOIN c2 ON c2.cid = tx.cid),
        |cost AS (
        | SELECT cid, cohort, CAST(max(n) AS BIGINT) AS n,
        |  list_reduce(list(term ORDER BY pos), (a,b) -> a+b) AS cost
        | FROM tm GROUP BY 1, 2),
        |piv AS (
        | SELECT cid,
        |  CAST(sum(CASE WHEN cohort = 0 THEN n ELSE 0 END) AS BIGINT) AS n_base,
        |  CAST(sum(CASE WHEN cohort = 1 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_appended,
        |  max(CASE WHEN cohort = 0 THEN cost END) AS cost_base,
        |  max(CASE WHEN cohort = 1 THEN cost END) AS cost_appended
        | FROM cost GROUP BY 1),
        |f AS (
        | SELECT cid, n_base, n_appended,
        |  CASE WHEN n_base > 0 THEN cost_base/n_base END AS mean_base,
        |  CASE WHEN n_appended > 0 THEN cost_appended/n_appended END
        |    AS mean_appended
        | FROM piv),
        |g AS (
        | SELECT *,
        |  CASE WHEN mean_base > 0 AND mean_appended IS NOT NULL
        |       THEN round(mean_appended/mean_base, 6) END AS drift_ratio
        | FROM f)
        |SELECT cid, n_base, n_appended, mean_base, mean_appended, drift_ratio,
        | coalesce(drift_ratio > 1.5, false) AS stale
        |FROM g""".stripMargin,
    "sim_ivf_kmeans" ->
      s"""$KmeansCtes,
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm FROM af JOIN w USING (vec_id)),
        |q AS (SELECT vec_id AS query_id, cid, vec AS qvec, nrm AS qnrm
        |      FROM idx WHERE vec_id < 8),
        |p AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM idx i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        | row_number() OVER (PARTITION BY query_id
        |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM p)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5""".stripMargin,
    "sim_nprobe_sweep" ->
      s"""$KmeansCtes,
        |qc AS (
        | SELECT v.vec_id AS query_id, c2.cid,
        |  list_reduce(list_transform(range(1,65),
        |    i -> (vq[i]-c[i])*(vq[i]-c[i])), (a,b) -> a+b) AS dist
        | FROM v, c2 WHERE v.vec_id < 8),
        |qr AS (
        | SELECT query_id, cid,
        |  row_number() OVER (PARTITION BY query_id ORDER BY dist, cid) AS crnk
        | FROM qc),
        |np AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS nprobe),
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |cand AS (
        | SELECT np.nprobe, qr.query_id, af.vec_id AS neighbor_id
        | FROM np, qr JOIN af ON af.cid = qr.cid
        | WHERE qr.crnk <= np.nprobe AND af.vec_id != qr.query_id),
        |scored AS (
        | SELECT c.nprobe, c.query_id, c.neighbor_id,
        |  round(list_dot_product(nw.vec, qw.vec)/(nw.nrm*qw.nrm), 6) AS cos6
        | FROM cand c
        | JOIN w nw ON nw.vec_id = c.neighbor_id
        | JOIN w qw ON qw.vec_id = c.query_id),
        |topk AS (
        | SELECT nprobe, query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY nprobe, query_id
        |    ORDER BY cos6 DESC, neighbor_id) AS rnk
        | FROM scored QUALIFY rnk <= 5),
        |bs AS (
        | SELECT qw.vec_id AS query_id, nw.vec_id AS neighbor_id,
        |  round(list_dot_product(nw.vec, qw.vec)/(nw.nrm*qw.nrm), 6) AS cos6
        | FROM w qw, w nw
        | WHERE qw.vec_id < 8 AND nw.vec_id != qw.vec_id),
        |brute AS (
        | SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos6 DESC, neighbor_id) AS rnk
        | FROM bs QUALIFY rnk <= 5)
        |SELECT t.nprobe, t.query_id,
        | CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        | CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/5.0 AS recall
        |FROM topk t LEFT JOIN brute b
        |  ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
        |GROUP BY t.nprobe, t.query_id""".stripMargin,
    "sim_recall_at_k" ->
      s"""$KmeansCtes,
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm FROM af JOIN w USING (vec_id)),
        |q AS (SELECT vec_id AS query_id, cid, vec AS qvec, nrm AS qnrm
        |      FROM idx WHERE vec_id < 8),
        |ip AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM idx i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |ivf AS (SELECT query_id, neighbor_id FROM (
        | SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM ip) t WHERE rnk <= 5),
        |bp AS (
        | SELECT wq.vec_id AS query_id, w.vec_id AS neighbor_id,
        |  round(list_dot_product(w.vec, wq.vec)/(w.nrm*wq.nrm), 6) AS cosine
        | FROM w, (SELECT * FROM w WHERE vec_id < 8) wq
        | WHERE w.vec_id != wq.vec_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        | SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM bp) t WHERE rnk <= 5)
        |SELECT b.query_id, CAST(count(*) AS BIGINT) AS k,
        | CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS hits,
        | CAST(CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
        |FROM brute b LEFT JOIN ivf i USING (query_id, neighbor_id)
        |GROUP BY b.query_id""".stripMargin,
    "sim_ndcg_eval" ->
      s"""$KmeansCtes,
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm FROM af JOIN w USING (vec_id)),
        |q AS (SELECT vec_id AS query_id, cid, vec AS qvec, nrm AS qnrm
        |      FROM idx WHERE vec_id < 8),
        |ip AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM idx i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |ivf AS (SELECT query_id, neighbor_id, rnk FROM (
        | SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM ip) t WHERE rnk <= 5),
        |bp AS (
        | SELECT wq.vec_id AS query_id, w.vec_id AS neighbor_id,
        |  round(list_dot_product(w.vec, wq.vec)/(w.nrm*wq.nrm), 6) AS cosine
        | FROM w, (SELECT * FROM w WHERE vec_id < 8) wq
        | WHERE w.vec_id != wq.vec_id),
        |brute AS (SELECT query_id, neighbor_id FROM (
        | SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM bp) t WHERE rnk <= 5),
        |gains AS (SELECT * FROM (VALUES (1, 1000000), (2, 630929),
        |  (3, 500000), (4, 430676), (5, 386852)) g(rnk, gain)),
        |pa AS (
        | SELECT i.query_id,
        |  CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN g.gain ELSE 0 END)
        |    AS BIGINT) AS dcg_micro,
        |  CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS hits,
        |  min(CASE WHEN b.neighbor_id IS NOT NULL THEN i.rnk END) AS first_hit
        | FROM ivf i LEFT JOIN brute b USING (query_id, neighbor_id)
        |  JOIN gains g ON g.rnk = i.rnk
        | GROUP BY 1),
        |pb AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
        |       FROM brute GROUP BY 1)
        |SELECT pb.query_id, pb.n_rel AS k,
        | CAST(coalesce(pa.hits, 0) AS BIGINT) AS hits,
        | CAST(coalesce(pa.dcg_micro, 0) AS BIGINT) AS dcg_micro,
        | CAST(CASE least(pb.n_rel, 5)
        |   WHEN 1 THEN 1000000 WHEN 2 THEN 1630929 WHEN 3 THEN 2130929
        |   WHEN 4 THEN 2561605 ELSE 2948457 END AS BIGINT) AS idcg_micro,
        | CAST(coalesce(pa.dcg_micro, 0) * 10000 // (CASE least(pb.n_rel, 5)
        |   WHEN 1 THEN 1000000 WHEN 2 THEN 1630929 WHEN 3 THEN 2130929
        |   WHEN 4 THEN 2561605 ELSE 2948457 END) AS BIGINT) AS ndcg_bp,
        | CAST(coalesce(1000000 // pa.first_hit, 0) AS BIGINT) AS mrr_micro
        |FROM pb LEFT JOIN pa USING (query_id)""".stripMargin,
    "sim_ivf_delete" ->
      s"""$KmeansCtes,
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm FROM af JOIN w USING (vec_id)),
        |live AS (SELECT * FROM idx WHERE vec_id % 7 != 0),
        |q AS (SELECT vec_id AS query_id, cid, vec AS qvec, nrm AS qnrm
        |      FROM live WHERE vec_id < 8),
        |ip AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM live i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id)
        |SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
        |FROM (
        | SELECT query_id, neighbor_id, cosine, row_number() OVER (
        |   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        | FROM ip) t WHERE rnk <= 5""".stripMargin,
    "tel_hourly_percentiles" ->
      """WITH g AS (
        | SELECT event_type, date_trunc('hour', ts) AS h,
        |  CAST(round(value*100) AS BIGINT) AS v100, count(*) AS c
        | FROM events GROUP BY 1, 2, 3),
        |w AS (
        | SELECT event_type, h, v100, c,
        |  sum(c) OVER (PARTITION BY event_type, h) AS n,
        |  sum(c) OVER (PARTITION BY event_type, h ORDER BY v100
        |    ROWS UNBOUNDED PRECEDING) AS cum
        | FROM g)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
        | CAST(max(n) AS BIGINT) AS n,
        | min(CASE WHEN cum >= ceil(0.5*n) THEN v100 END)/100.0 AS p50,
        | min(CASE WHEN cum >= ceil(0.95*n) THEN v100 END)/100.0 AS p95
        |FROM w GROUP BY event_type, h""".stripMargin,
    "tel_cardinality_guard" ->
      """WITH d AS (
        | SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_distinct
        | FROM (SELECT DISTINCT event_type, CAST(ts AS DATE) AS ts, props
        |       FROM events) t
        | GROUP BY 1, 2)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        | CAST(n_distinct AS BIGINT) AS n_distinct,
        | CAST(lag(n_distinct) OVER (PARTITION BY event_type ORDER BY day)
        |   AS BIGINT) AS prev,
        | CASE WHEN lag(n_distinct) OVER (PARTITION BY event_type ORDER BY day)
        |        IS NOT NULL
        |  THEN CAST(n_distinct AS DOUBLE)
        |   / CAST(lag(n_distinct) OVER (PARTITION BY event_type ORDER BY day)
        |       AS DOUBLE) END AS growth
        |FROM d""".stripMargin,
    "q_skew_diagnose" ->
      """WITH f AS (
        | SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1),
        |s AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(n) AS BIGINT) AS n_rows, CAST(max(n) AS BIGINT) AS max_n
        | FROM f),
        |t AS (
        | SELECT row_number() OVER (ORDER BY n DESC, l_orderkey) AS rnk,
        |  l_orderkey AS key, n
        | FROM f)
        |SELECT CAST(t.rnk AS BIGINT) AS rnk, t.key, CAST(t.n AS BIGINT) AS n,
        | CAST(t.n AS DOUBLE) / CAST(s.n_rows AS DOUBLE) AS share,
        | CAST(s.max_n AS DOUBLE) * CAST(s.n_keys AS DOUBLE)
        |   / CAST(s.n_rows AS DOUBLE) AS skew_factor
        |FROM t, s WHERE t.rnk <= 10""".stripMargin,
    "q_share_of_parent" ->
      """WITH g AS (
        | SELECT r_name, n_name, round(sum(c_acctbal), 4) AS bal
        | FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY 1, 2),
        |w AS (
        | SELECT r_name, n_name, bal,
        |  round(sum(bal) OVER (PARTITION BY r_name), 4) AS region_bal
        | FROM g)
        |SELECT r_name, n_name, bal, region_bal,
        | round(bal / region_bal, 6) AS share
        |FROM w""".stripMargin,
    "tel_freshness" ->
      """WITH s AS (
        | SELECT event_type, max(epoch_us(ts)) AS last_us,
        |  count(*) AS n_events
        | FROM events GROUP BY 1)
        |SELECT event_type,
        | strftime(to_timestamp(last_us // 1000000), '%Y-%m-%d %H:%M:%S')
        |   AS last_seen,
        | CAST(max(last_us) OVER () - last_us AS BIGINT) AS lag_us,
        | CAST(n_events AS BIGINT) AS n_events
        |FROM s""".stripMargin,
    "tel_error_budget" ->
      """WITH hourly AS (
        | SELECT date_trunc('month', ts) AS month, date_trunc('hour', ts) AS h,
        |  count(*) AS n,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
        | FROM events GROUP BY 1, 2),
        |m AS (
        | SELECT month, CAST(count(*) AS BIGINT) AS total_hours,
        |  CAST(sum(CASE WHEN errs * 4 > n * 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS bad_hours
        | FROM hourly GROUP BY 1)
        |SELECT strftime(month, '%Y-%m') AS month, total_hours, bad_hours,
        | CAST(total_hours * 1 AS DOUBLE) / 100.0 AS budget_hours,
        | CAST(bad_hours * 100 AS DOUBLE)
        |   / CAST(total_hours * 1 AS DOUBLE) AS budget_used_frac
        |FROM m""".stripMargin,
    "text_char_entropy" ->
      """WITH d AS (
        | SELECT lang, CAST(length(text) AS BIGINT) AS n,
        |  CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS c_lower,
        |  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS c_upper,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS c_digit,
        |  CAST(length(text) - length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS c_space
        | FROM documents WHERE length(text) > 0),
        |e AS (
        | SELECT lang, CAST(round(10000.0 * (
        |   CASE WHEN c_lower > 0 THEN -(c_lower/CAST(n AS DOUBLE))*log2(c_lower/CAST(n AS DOUBLE)) ELSE 0 END +
        |   CASE WHEN c_upper > 0 THEN -(c_upper/CAST(n AS DOUBLE))*log2(c_upper/CAST(n AS DOUBLE)) ELSE 0 END +
        |   CASE WHEN c_digit > 0 THEN -(c_digit/CAST(n AS DOUBLE))*log2(c_digit/CAST(n AS DOUBLE)) ELSE 0 END +
        |   CASE WHEN c_space > 0 THEN -(c_space/CAST(n AS DOUBLE))*log2(c_space/CAST(n AS DOUBLE)) ELSE 0 END +
        |   CASE WHEN c_other > 0 THEN -(c_other/CAST(n AS DOUBLE))*log2(c_other/CAST(n AS DOUBLE)) ELSE 0 END)) AS BIGINT) AS e4
        | FROM (SELECT lang, n, c_lower, c_upper, c_digit, c_space,
        |        n - c_lower - c_upper - c_digit - c_space AS c_other FROM d) x)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(min(e4) AS DOUBLE)/10000.0 AS min_entropy,
        | CAST(max(e4) AS DOUBLE)/10000.0 AS max_entropy,
        | CAST(sum(CASE WHEN e4 < 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_entropy,
        | round(CAST(sum(e4) AS DOUBLE) / (10000.0 * count(*)), 4) AS avg_entropy
        |FROM e GROUP BY lang""".stripMargin,
    // BM25: ln rounded to 4 decimals pre-product; per-term contribution
    // quantized to integer micro-units so the per-doc sum is exact.
    // Literals are written as the SAME float expressions Scala computes
    // ((1.2 + 1.0), not 2.2) so both engines evaluate identical doubles.
    "text_bm25" ->
      """WITH lens AS (
        | SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS dl
        | FROM documents),
        |hits AS (
        | SELECT doc_id, term FROM (
        |  SELECT doc_id,
        |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents) t
        | WHERE term IN ('dup', 'vector', 'scan')),
        |tf AS (SELECT doc_id, term, count(*) AS cnt FROM hits GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM lens),
        |sc AS (
        | SELECT tf.doc_id,
        |  CAST(round(1e6
        |   * round(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)), 4)
        |   * (tf.cnt * (1.2 + 1.0))
        |   / (tf.cnt + 1.2 * (0.25 + 0.75 * l.dl
        |       / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))) AS BIGINT) AS contrib
        | FROM tf JOIN lens l USING (doc_id) JOIN df USING (term), stats s),
        |agg AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
        |  CAST(sum(contrib) AS BIGINT) AS score_micro
        | FROM sc GROUP BY 1)
        |SELECT doc_id, n_hit_terms, score_micro,
        | CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
        |   AS BIGINT) AS rnk
        |FROM agg QUALIFY rnk <= 20""".stripMargin,
    "text_bpe_train" -> bpeOracleSql(),
    "text_bpe_curve" -> bpeCurveOracleSql(),
    "text_bpe_tokenize" -> bpeTokenizeOracleSql(),
    // byte-level twins: the same unrolled-CTE chains over the UTF-8
    // hex-pair alphabet (GPT-2's byte-BPE, zero OOV by construction)
    "text_bpe_byte_train" -> bpeOracleSql(byteLevel = true),
    "text_bpe_byte_tokenize" -> bpeTokenizeOracleSql(byteLevel = true),
    // unigram-LM (SentencePiece) twins: seed → Viterbi-EM → prune as
    // unrolled materialized CTE chains (the bpeOracleCtes discipline)
    "text_unigram_train" -> unigramTrainOracleSql(),
    "text_unigram_tokenize" -> unigramTokenizeOracleSql(),
    "text_unigram_curve" -> unigramCurveOracleSql(),
    "dedup_tfidf_cosine" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        | FROM documents),
        |terms AS (
        | SELECT doc_id, array_to_string(t[i:i+2], ' ') AS term
        | FROM (SELECT doc_id, t,
        |        unnest(generate_series(1, len(t) - 2)) AS i
        |       FROM toks WHERE len(t) >= 3) x),
        |tf AS (
        | SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        | FROM terms GROUP BY 1, 2),
        |dfv AS (
        | SELECT term, CAST(count(*) AS BIGINT) AS df
        | FROM tf GROUP BY 1 HAVING count(*) <= 20),
        |w AS (
        | SELECT tf.doc_id, tf.term,
        |  tf.tf * CAST(round(round(ln(
        |    CAST((SELECT count(*) FROM documents) AS DOUBLE) / dfv.df), 4)
        |    * 1e4) AS BIGINT) AS w_e4
        | FROM tf JOIN dfv USING (term)),
        |norms AS (
        | SELECT doc_id, CAST(sum(w_e4 * w_e4) AS BIGINT) AS norm_e8
        | FROM w GROUP BY 1),
        |pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(sum(a.w_e4 * b.w_e4) AS BIGINT) AS dot_e8,
        |  CAST(count(*) AS BIGINT) AS n_shared_terms
        | FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b, p.n_shared_terms, p.dot_e8,
        | CAST(p.dot_e8 AS DOUBLE) /
        |   (sqrt(CAST(na.norm_e8 AS DOUBLE)) *
        |    sqrt(CAST(nb.norm_e8 AS DOUBLE))) AS cos
        |FROM pairs p
        | JOIN norms na ON na.doc_id = p.doc_a
        | JOIN norms nb ON nb.doc_id = p.doc_b
        |WHERE CAST(p.dot_e8 AS DOUBLE) /
        |   (sqrt(CAST(na.norm_e8 AS DOUBLE)) *
        |    sqrt(CAST(nb.norm_e8 AS DOUBLE))) >= 0.5""".stripMargin,
    "sim_embed_stats" ->
      """WITH x AS (
        | SELECT i - 1 AS dim,
        |  CAST(round(CAST(embedding[i] AS DOUBLE)*1e6) AS BIGINT) AS m
        | FROM (SELECT embedding,
        |        unnest(generate_series(1, len(embedding))) AS i
        |       FROM embeddings)),
        |agg AS (
        | SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(m) AS BIGINT) AS s,
        |  sum(CAST(m AS DOUBLE)*CAST(m AS DOUBLE)) AS q
        | FROM x GROUP BY 1),
        |v AS (
        | SELECT *,
        |  CAST(s AS DOUBLE)/n/1e6 AS mean,
        |  (q - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)/(n - 1)/1e12
        |    AS variance,
        |  CAST(round((q - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)/(n - 1)
        |    /1e12*1e6) AS BIGINT) AS var_micro
        | FROM agg)
        |SELECT dim, n, mean, variance, var_micro,
        | CAST(var_micro AS DOUBLE) /
        |   CAST(sum(var_micro) OVER () AS BIGINT) AS var_share
        |FROM v""".stripMargin,
    "text_fasttext_quality" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        | FROM documents),
        |f AS (
        | SELECT doc_id, unnest(t) AS feat FROM toks
        | UNION ALL
        | SELECT doc_id, t[i] || '_' || t[i+1] AS feat
        | FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
        |       FROM toks)),
        |w AS (
        | SELECT doc_id,
        |  ('0x' || substr(md5('w:' || bucket), 1, 15))::BIGINT
        |    % 2000001 - 1000000 AS w_micro
        | FROM (SELECT doc_id,
        |        ('0x' || substr(md5(feat), 1, 15))::BIGINT % 4096 AS bucket
        |       FROM f)),
        |agg AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |  CAST(round(CAST(sum(w_micro) AS DOUBLE)/count(*)) AS BIGINT)
        |    AS score_micro
        | FROM w GROUP BY 1)
        |SELECT doc_id, n_feats, score_micro,
        | CAST(score_micro AS DOUBLE)/1e6 AS score,
        | score_micro > 0 AS keep
        |FROM agg""".stripMargin,
    "text_pack_sequences" ->
      """WITH d AS (
        | SELECT source, doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
        |    AS n_tok
        | FROM documents),
        |c AS (
        | SELECT source, doc_id, n_tok,
        |  sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum_end
        | FROM d),
        |e AS (
        | SELECT source, cum_end, cum_end - n_tok AS cum_start,
        |  unnest(generate_series(CAST((cum_end - n_tok) // 256 AS BIGINT),
        |                         CAST((cum_end - 1) // 256 AS BIGINT))) AS seq_id
        | FROM c)
        |SELECT source, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN cum_start < seq_id * 256 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_continuations,
        | CAST(sum(least(cum_end, (seq_id + 1) * 256)
        |   - greatest(cum_start, seq_id * 256)) AS BIGINT) AS n_tokens
        |FROM e GROUP BY 1, 2""".stripMargin,
    "dedup_span_coverage" -> spanCoverageOracle,
    // the dedup ACTION on the span signal: keep iff coverage <= 0.2
    "dedup_span_apply" ->
      s"""SELECT doc_id, n_tokens, dup_frac, dup_frac <= 0.2 AS keep
         |FROM ($spanCoverageOracle) cov_q""".stripMargin,
    // hybrid RRF: same BM25 pipeline as text_bm25 plus the dense cosine
    // ranking; per-list reciprocal contributions quantized to integer
    // micro-units before the (two-element) sum
    "sim_hybrid_rrf" ->
      """WITH n AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |    AS norm
        | FROM embeddings),
        |q AS (SELECT vec AS qvec, norm AS qnorm FROM n WHERE vec_id = 0),
        |vr AS (
        | SELECT vec_id AS item_id,
        |  CAST(row_number() OVER (ORDER BY cos6 DESC, vec_id) AS BIGINT)
        |    AS rank_vec
        | FROM (
        |  SELECT n.vec_id,
        |   round(list_dot_product(n.vec, q.qvec) / (n.norm * q.qnorm), 6)
        |     AS cos6
        |  FROM n, q WHERE n.vec_id != 0) s
        | QUALIFY rank_vec <= 30),
        |lens AS (
        | SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS dl
        | FROM documents),
        |hits AS (
        | SELECT doc_id, term FROM (
        |  SELECT doc_id,
        |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents) t
        | WHERE term IN ('dup', 'vector', 'scan')),
        |tf AS (SELECT doc_id, term, count(*) AS cnt FROM hits GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM lens),
        |sc AS (
        | SELECT tf.doc_id,
        |  CAST(round(1e6
        |   * round(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)), 4)
        |   * (tf.cnt * (1.2 + 1.0))
        |   / (tf.cnt + 1.2 * (0.25 + 0.75 * l.dl
        |       / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))) AS BIGINT) AS contrib
        | FROM tf JOIN lens l USING (doc_id) JOIN df USING (term), stats s),
        |agg AS (
        | SELECT doc_id, sum(contrib) AS score_micro FROM sc GROUP BY 1),
        |lr AS (
        | SELECT doc_id AS item_id,
        |  CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
        |    AS BIGINT) AS rank_lex
        | FROM agg QUALIFY rank_lex <= 30),
        |f AS (
        | SELECT coalesce(vr.item_id, lr.item_id) AS item_id,
        |  rank_vec, rank_lex,
        |  coalesce(CAST(round(1e6 / (60 + rank_vec)) AS BIGINT), 0)
        |   + coalesce(CAST(round(1e6 / (60 + rank_lex)) AS BIGINT), 0)
        |    AS rrf_micro
        | FROM vr FULL OUTER JOIN lr ON vr.item_id = lr.item_id)
        |SELECT item_id, rank_vec, rank_lex, rrf_micro,
        | CAST(row_number() OVER (ORDER BY rrf_micro DESC, item_id)
        |   AS BIGINT) AS rnk
        |FROM f QUALIFY rnk <= 10""".stripMargin,
    "text_vocab_growth" ->
      """WITH t AS (
        | SELECT doc_id,
        |  unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        | FROM documents),
        |toks AS (SELECT doc_id, count(*) AS toks FROM t GROUP BY 1),
        |fh AS (
        | SELECT doc_id, count(*) AS new_terms FROM (
        |  SELECT term, min(doc_id) AS doc_id FROM (
        |   SELECT DISTINCT doc_id, term FROM t) d GROUP BY 1) f
        | GROUP BY 1)
        |SELECT doc_id,
        | CAST(sum(toks) OVER (ORDER BY doc_id
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        | CAST(sum(coalesce(new_terms, 0)) OVER (ORDER BY doc_id
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
        |FROM toks LEFT JOIN fh USING (doc_id)
        |QUALIFY (doc_id + 1) % 50 = 0""".stripMargin,
    "text_ttr" ->
      """WITH t AS (
        | SELECT source,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
        |  len(list_distinct(string_split_regex(trim(lower(text)), '\s+')))
        |    AS n_types
        | FROM documents),
        |d AS (SELECT source, n_tokens, n_types,
        |  CAST(round(n_types * 1e6 / n_tokens) AS BIGINT) AS ttr_micro FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        | CAST(sum(n_types) AS BIGINT) AS sum_types,
        | min(ttr_micro) AS min_ttr_micro, max(ttr_micro) AS max_ttr_micro,
        | CAST(round(avg(ttr_micro)) AS BIGINT) AS avg_ttr_micro
        |FROM d GROUP BY source""".stripMargin,
    "text_hapax" ->
      """WITH tc AS (
        | SELECT source,
        |  unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        | FROM documents),
        |c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
        |      FROM tc GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        | CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        | CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
        | CAST(sum(c) AS BIGINT) AS n_tokens,
        | CAST(round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1e6 / count(*))
        |   AS BIGINT) AS hapax_micro
        |FROM c GROUP BY source""".stripMargin,
    "text_zipf_fit" ->
      """WITH tc AS (
        | SELECT source,
        |  unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        | FROM documents),
        |c AS (SELECT source, term, count(*) AS c FROM tc GROUP BY 1, 2),
        |r AS (
        | SELECT source, ln(CAST(c AS DOUBLE)) AS lf,
        |  ln(CAST(row_number() OVER (PARTITION BY source
        |     ORDER BY c DESC, term) AS DOUBLE)) AS lr,
        |  row_number() OVER (PARTITION BY source
        |     ORDER BY c DESC, term) AS rnk
        | FROM c QUALIFY rnk <= 100)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
        | round(regr_slope(lf, lr), 6) AS slope,
        | round(regr_intercept(lf, lr), 6) AS intercept,
        | round(regr_r2(lf, lr), 6) AS r2
        |FROM r GROUP BY source""".stripMargin,
    "sim_filtered_ann" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec, label,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |c AS (SELECT vec_id AS cid, vec AS cvec, nrm AS cnrm FROM v WHERE vec_id < 4),
        |scored AS (
        | SELECT v.vec_id, c.cid,
        |  row_number() OVER (PARTITION BY v.vec_id
        |    ORDER BY round(list_dot_product(v.vec, c.cvec)/(v.nrm*c.cnrm), 6) DESC,
        |             c.cid) AS rn
        | FROM v, c WHERE v.vec_id >= 4),
        |assign AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
        |idx AS (SELECT a.vec_id, a.cid, v.vec, v.nrm, v.label
        |        FROM assign a JOIN v USING (vec_id)
        |        WHERE v.label % 3 = 0),
        |qp AS (SELECT vec_id AS query_id, cid FROM scored
        |       WHERE vec_id < 12 AND rn <= 2),
        |q AS (SELECT qp.query_id, qp.cid, v.vec AS qvec, v.nrm AS qnrm
        |      FROM qp JOIN v ON v.vec_id = qp.query_id),
        |p AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id, i.label,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM idx i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |r AS (SELECT query_id, neighbor_id, label, cosine,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rnk FROM p)
        |SELECT query_id, neighbor_id, CAST(label AS BIGINT) AS label,
        | cosine, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 5""".stripMargin,
    "sim_filtered_recall" ->
      """WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec, label,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |c AS (SELECT vec_id AS cid, vec AS cvec, nrm AS cnrm FROM v WHERE vec_id < 4),
        |scored AS (
        | SELECT v.vec_id, c.cid,
        |  row_number() OVER (PARTITION BY v.vec_id
        |    ORDER BY round(list_dot_product(v.vec, c.cvec)/(v.nrm*c.cnrm), 6) DESC,
        |             c.cid) AS rn
        | FROM v, c WHERE v.vec_id >= 4),
        |assign AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
        |idx AS (SELECT a.vec_id, a.cid, v.vec, v.nrm
        |        FROM assign a JOIN v USING (vec_id)
        |        WHERE v.label % 3 = 0),
        |qp AS (SELECT vec_id AS query_id, cid FROM scored
        |       WHERE vec_id < 12 AND rn <= 2),
        |q AS (SELECT qp.query_id, qp.cid, v.vec AS qvec, v.nrm AS qnrm
        |      FROM qp JOIN v ON v.vec_id = qp.query_id),
        |p AS (
        | SELECT q.query_id, i.vec_id AS neighbor_id,
        |  round(list_dot_product(i.vec, q.qvec)/(i.nrm*q.qnrm), 6) AS cosine
        | FROM idx i JOIN q ON i.cid = q.cid AND i.vec_id != q.query_id),
        |ann AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY cosine DESC, neighbor_id) AS rnk FROM p) t
        | WHERE rnk <= 5),
        |q2 AS (SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm
        |       FROM v WHERE vec_id >= 4 AND vec_id < 12),
        |bp AS (
        | SELECT q2.query_id, v.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q2.query_id
        |    ORDER BY round(list_dot_product(v.vec, q2.qvec)/(v.nrm*q2.qnrm), 6)
        |      DESC, v.vec_id) AS rnk
        | FROM v, q2 WHERE v.label % 3 = 0 AND v.vec_id != q2.query_id),
        |b AS (SELECT query_id, neighbor_id FROM bp WHERE rnk <= 5)
        |SELECT b.query_id, CAST(count(*) AS BIGINT) AS k,
        | CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS hits,
        | CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |   AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
        |FROM b LEFT JOIN ann a
        | ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
        |GROUP BY b.query_id""".stripMargin,
    "q_zorder_locality" ->
      (s"""WITH b AS (
        | SELECT l_partkey % 256 AS x, l_orderkey % 256 AS y FROM lineitem),
        |z AS (SELECT x, y, $ZInterleaveSql AS z FROM b)
        |SELECT z >> 8 AS zbucket, CAST(count(*) AS BIGINT) AS n_rows,
        | min(x) AS min_x, max(x) AS max_x,
        | min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY 1""".stripMargin),
    "q_hilbert_locality" ->
      (s"""WITH b AS (
        | SELECT l_partkey % 256 AS gx, l_orderkey % 256 AS gy,
        |  count(*) AS c
        | FROM lineitem GROUP BY 1, 2),
        |h0 AS (SELECT gx, gy, c, gx AS x, gy AS y,
        |       CAST(0 AS BIGINT) AS d FROM b),
        |$HilbertWalkSql
        |SELECT d >> 8 AS hbucket, CAST(sum(c) AS BIGINT) AS n_rows,
        | min(gx) AS min_x, max(gx) AS max_x,
        | min(gy) AS min_y, max(gy) AS max_y
        |FROM h21 GROUP BY 1""".stripMargin),
    "q_zorder_pruning" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | round(sum(l_extendedprice), 4) AS sum_price,
        | min(l_partkey % 256) AS min_x, max(l_orderkey % 256) AS max_y
        |FROM lineitem
        |WHERE l_partkey % 256 BETWEEN 32 AND 47
        |  AND l_orderkey % 256 BETWEEN 96 AND 127
        |GROUP BY l_returnflag""".stripMargin,
    "text_dup_ngram_chars" ->
      """WITH d AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
        |    AS n_tokens
        | FROM documents),
        |tk AS (
        | SELECT doc_id, CAST(i - 1 AS BIGINT) AS p,
        |  CAST(length(toks[i]) + 1 AS BIGINT) AS wl
        | FROM (SELECT doc_id, toks,
        |        unnest(generate_series(1, CAST(n_tokens AS INTEGER))) AS i
        |       FROM d) t),
        |tot AS (SELECT doc_id, CAST(sum(wl) AS BIGINT) AS total_chars
        |        FROM tk GROUP BY 1),
        |g2 AS (
        | SELECT doc_id, array_to_string(toks[i + 1 : i + 2], ' ') AS g
        | FROM (SELECT doc_id, toks,
        |        unnest(generate_series(0, CAST(n_tokens - 2 AS INTEGER))) AS i
        |       FROM d WHERE n_tokens >= 2) t),
        |top2 AS (
        | SELECT doc_id, CAST(c * (length(g) + 1) AS BIGINT) AS top2_chars
        | FROM (SELECT doc_id, g, count(*) AS c,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY count(*) DESC, g) AS rn
        |       FROM g2 GROUP BY doc_id, g) t
        | WHERE rn = 1),
        |g5 AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS p,
        |  md5(array_to_string(toks[i + 1 : i + 5], ' ')) AS h
        | FROM (SELECT doc_id, toks,
        |        unnest(generate_series(0, CAST(n_tokens - 5 AS INTEGER))) AS i
        |       FROM d WHERE n_tokens >= 5) t),
        |dupk AS (SELECT doc_id, h FROM g5 GROUP BY 1, 2 HAVING count(*) > 1),
        |cpos AS (
        | SELECT DISTINCT doc_id, p2 AS p FROM (
        |  SELECT g5.doc_id, unnest(generate_series(g5.p, g5.p + 4)) AS p2
        |  FROM g5 JOIN dupk USING (doc_id, h)) q),
        |cov AS (
        | SELECT tk.doc_id, CAST(sum(tk.wl) AS BIGINT) AS dup5_chars
        | FROM cpos JOIN tk ON tk.doc_id = cpos.doc_id AND tk.p = cpos.p
        | GROUP BY 1)
        |SELECT d.doc_id, d.n_tokens, tot.total_chars,
        | coalesce(top2.top2_chars, 0) AS top2_chars,
        | coalesce(cov.dup5_chars, 0) AS dup5_chars,
        | CAST(round(coalesce(top2.top2_chars, 0) * 1e6 / tot.total_chars)
        |   AS BIGINT) AS top2_micro,
        | CAST(round(coalesce(cov.dup5_chars, 0) * 1e6 / tot.total_chars)
        |   AS BIGINT) AS dup5_micro,
        | (CAST(round(coalesce(top2.top2_chars, 0) * 1e6 / tot.total_chars)
        |    AS BIGINT) <= 200000
        |  AND CAST(round(coalesce(cov.dup5_chars, 0) * 1e6 / tot.total_chars)
        |    AS BIGINT) <= 150000) AS keep
        |FROM d JOIN tot USING (doc_id)
        |LEFT JOIN top2 USING (doc_id)
        |LEFT JOIN cov USING (doc_id)""".stripMargin,
    "sim_pq_recall" ->
      (s"""WITH v AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |$PqCtes,
        |ann AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= 5),
        |bq AS (SELECT vec_id AS query_id, e AS qe FROM v
        |       WHERE vec_id >= 8 AND vec_id < 16),
        |bl AS (
        | SELECT bq.query_id, v.vec_id AS neighbor_id,
        |  list_reduce([0.0] || [ (v.e[i]-bq.qe[i])*(v.e[i]-bq.qe[i])
        |    for i in generate_series(1, 64) ], (x,y) -> x+y) AS l2
        | FROM v, bq WHERE v.vec_id >= 8 AND v.vec_id != bq.query_id),
        |b AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY l2, neighbor_id) AS rnk FROM bl) t
        | WHERE rnk <= 5)
        |SELECT b.query_id, CAST(count(*) AS BIGINT) AS k,
        | CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS hits,
        | CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |   AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
        |FROM b LEFT JOIN ann a
        | ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
        |GROUP BY b.query_id""".stripMargin),
    "sink_iceberg_eqdel" ->
      """WITH keys AS (
        | SELECT event_id FROM events ORDER BY event_id LIMIT 5),
        |live AS (
        | SELECT event_type, user_id, value FROM events
        | WHERE event_type != 'error'
        |   AND event_id NOT IN (SELECT event_id FROM keys)
        | UNION ALL
        | SELECT event_type, user_id, -1.0 AS value FROM events
        | WHERE event_id IN (SELECT event_id FROM keys))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(user_id) AS BIGINT) AS sum_uid,
        | round(sum(value), 4) AS sum_value
        |FROM live GROUP BY event_type""".stripMargin,
    "mm_audio_fingerprint" ->
      ("WITH " + AudioFpCtes +
        """
        |SELECT fa, fb, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming,
        | n_a, n_b, n_a * n_b AS clip_pairs, doc_a, doc_b
        |FROM cand WHERE bit_count(xor(fa, fb)) <= 1""".stripMargin),
    "mm_audio_clusters" ->
      ("WITH RECURSIVE " + AudioFpCtes +
        """,
        |pairs AS (SELECT fa, fb FROM cand
        |          WHERE bit_count(xor(fa, fb)) <= 1),
        |edges AS (
        | SELECT fa AS src, fb AS dst FROM pairs
        | UNION SELECT fb, fa FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS fp, least(src, min(dst)) AS label
        | FROM reach GROUP BY src)
        |SELECT label AS cluster_id, CAST(count(*) AS BIGINT) AS n_fps,
        | CAST(sum(g.n_clips) AS BIGINT) AS n_clips, max(lab.fp) AS max_fp
        |FROM lab JOIN g USING (fp)
        |GROUP BY label""".stripMargin),
  )

  private lazy val FunnelRetentionCorrOracles: Map[String, String] = Map(
    "tel_funnel" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |v AS (SELECT user_id, min(tus) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(tus) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND tus > t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(tus) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND tus > t2 GROUP BY 1),
        |n AS (SELECT (SELECT count(*) FROM v) AS nv,
        |             (SELECT count(*) FROM c) AS nc,
        |             (SELECT count(*) FROM p) AS np)
        |SELECT '1_view' AS stage, nv AS users, CAST(nv AS DOUBLE)/nv AS conv FROM n
        |UNION ALL
        |SELECT '2_click', nc, CAST(nc AS DOUBLE)/nv FROM n
        |UNION ALL
        |SELECT '3_purchase', np, CAST(np AS DOUBLE)/nv FROM n""".stripMargin,
    "tel_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cd FROM act GROUP BY 1),
        |sz AS (SELECT cd, count(*) AS cohort_n FROM f GROUP BY 1),
        |r AS (
        | SELECT cd, CAST(act.d - f.cd AS BIGINT) AS day_offset,
        |  count(*) AS n_active
        | FROM act JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT strftime(cd, '%Y-%m-%d') AS cohort_day, day_offset,
        | n_active, cohort_n, CAST(n_active AS DOUBLE)/cohort_n AS retention
        |FROM r JOIN sz USING (cd)""".stripMargin,
    "tel_concurrency" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
        |l AS (
        | SELECT user_id, tus, event_id,
        |  lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
        | FROM e),
        |s AS (
        | SELECT user_id, tus, event_id, CASE WHEN prev IS NULL
        |   OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS ns
        | FROM l),
        |s2 AS (
        | SELECT user_id, tus, sum(ns) OVER (PARTITION BY user_id
        |   ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sid
        | FROM s),
        |sess AS (
        | SELECT user_id, sid, min(tus) AS st, max(tus) AS en
        | FROM s2 GROUP BY 1, 2),
        |pts AS (
        | SELECT st AS tus, 1 AS delta FROM sess
        | UNION ALL SELECT en, -1 FROM sess),
        |run AS (
        | SELECT tus, sum(delta) OVER (ORDER BY tus, delta DESC
        |   ROWS UNBOUNDED PRECEDING) AS conc
        | FROM pts)
        |SELECT strftime(make_timestamp(tus), '%Y-%m-%d') AS day,
        | CAST(max(conc) AS BIGINT) AS max_concurrent,
        | count(*) AS n_boundaries
        |FROM run GROUP BY 1""".stripMargin,
    "tel_apdex" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        | CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_satisfied,
        | CAST(sum(CASE WHEN value > 50 AND value <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_tolerating,
        | count(*) AS n,
        | (CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS DOUBLE)
        |  + CAST(sum(CASE WHEN value > 50 AND value <= 200 THEN 1 ELSE 0 END) AS DOUBLE)/2)
        |  / count(*) AS apdex
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_exists_late" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders WHERE EXISTS (
        | SELECT 1 FROM lineitem
        | WHERE l_orderkey = o_orderkey
        |   AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,
    "tel_slo_multiwindow" ->
      """WITH h AS (
        | SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS hus,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
        |  count(*) AS n_tot
        | FROM events GROUP BY 1),
        |w AS (
        | SELECT hus,
        |  round((CAST(n_err AS DOUBLE) / n_tot) / 0.01, 4) AS burn_1h,
        |  round((CAST(sum(n_err) OVER r6 AS DOUBLE)
        |   / sum(n_tot) OVER r6) / 0.01, 4) AS burn_6h,
        |  round((CAST(sum(n_err) OVER r24 AS DOUBLE)
        |   / sum(n_tot) OVER r24) / 0.01, 4) AS burn_24h,
        |  (CAST(n_err AS DOUBLE) / n_tot) / 0.01 AS rb1,
        |  (CAST(sum(n_err) OVER r6 AS DOUBLE) / sum(n_tot) OVER r6) / 0.01 AS rb6,
        |  (CAST(sum(n_err) OVER r24 AS DOUBLE) / sum(n_tot) OVER r24) / 0.01 AS rb24
        | FROM h
        | WINDOW r6 AS (ORDER BY hus RANGE BETWEEN 18000000000 PRECEDING AND CURRENT ROW),
        |        r24 AS (ORDER BY hus RANGE BETWEEN 82800000000 PRECEDING AND CURRENT ROW))
        |SELECT strftime(make_timestamp(hus), '%Y-%m-%d %H:%M:%S') AS hour_start,
        | burn_1h, burn_6h, burn_24h,
        | rb1 >= 14.4 AND rb6 >= 14.4 AS fast_page,
        | rb6 >= 6.0 AND rb24 >= 6.0 AS slow_ticket,
        | CASE WHEN rb1 >= 14.4 AND rb6 >= 14.4 THEN 'page'
        |      WHEN rb6 >= 6.0 AND rb24 >= 6.0 THEN 'ticket'
        |      ELSE 'ok' END AS severity
        |FROM w""".stripMargin,
    "tel_burn_rate" ->
      """WITH h AS (
        | SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS hus,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
        |  count(*) AS n_tot
        | FROM events GROUP BY 1),
        |w AS (
        | SELECT hus, n_err, n_tot,
        |  (CAST(n_err AS DOUBLE) / n_tot) / 0.01 AS burn_1h,
        |  (CAST(sum(n_err) OVER r AS DOUBLE)
        |   / sum(n_tot) OVER r) / 0.01 AS burn_6h
        | FROM h
        | WINDOW r AS (ORDER BY hus RANGE BETWEEN 18000000000 PRECEDING AND CURRENT ROW))
        |SELECT strftime(make_timestamp(hus), '%Y-%m-%d %H:%M:%S') AS hour_start,
        | n_err, n_tot, burn_1h, burn_6h,
        | burn_1h > 1.0 AND burn_6h > 1.0 AS alert
        |FROM w""".stripMargin,
    "dedup_ngram_prefix" ->
      // prefix filtering's natural operating point is HIGH thresholds
      // (prefix length n−⌈t·n⌉+1 shrinks as t grows); the inverted-index
      // strategy keeps the low-threshold mining regime
      ngramJaccardOracle("0.5"),
    "tel_active_users" ->
      """WITH act AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
        |spine AS (SELECT DISTINCT d AS day FROM act)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        | count(DISTINCT CASE WHEN d = day THEN user_id END) AS dau,
        | count(DISTINCT CASE WHEN d >= day - 6 THEN user_id END) AS wau,
        | count(DISTINCT user_id) AS mau
        |FROM act JOIN spine ON d <= day AND d >= day - 27
        |GROUP BY spine.day""".stripMargin,
    "tel_heatmap" ->
      // Spark dayofweek is 1=Sunday..7; DuckDB dow is 0=Sunday..6
      """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        | CAST(hour(ts) AS BIGINT) AS hod,
        | count(*) AS n_events, round(sum(value), 4) AS sum_value,
        | round(round(sum(value), 4) / count(*), 4) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "tel_holt_winters" ->
      // additive Holt-Winters over the hourly-count series: state is a
      // 26-element DOUBLE list [l, b, s1..s24] with the current season
      // rotated to slot 3 each step (list construction evaluates
      // against the pre-step accumulator — same caveat as tel_holt)
      """WITH e AS (
        | SELECT event_type, epoch_us(ts)//3600000000 AS h FROM events),
        |bnd AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
        |cnts AS (SELECT event_type, h, count(*) AS c FROM e GROUP BY 1,2),
        |grid AS (
        | SELECT et.event_type, b.h0 + u.i AS h
        | FROM (SELECT DISTINCT event_type FROM e) et, bnd b,
        |      (SELECT unnest(generate_series(0,
        |         (SELECT h1 - h0 FROM bnd))) AS i) u),
        |series AS (
        | SELECT g.event_type,
        |  list(CAST(coalesce(c.c, 0) AS DOUBLE) ORDER BY g.h) AS vs,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM grid g LEFT JOIN cnts c ON c.event_type = g.event_type
        |                             AND c.h = g.h
        | GROUP BY 1),
        |ini AS (
        | SELECT event_type, n, vs,
        |  list_reduce([0.0] || vs[1:24], (a,x) -> a + x) / 24 AS l0,
        |  (list_reduce([0.0] || vs[25:48], (a,x) -> a + x) / 24
        |   - list_reduce([0.0] || vs[1:24], (a,x) -> a + x) / 24) / 24 AS b0
        | FROM series),
        |st AS (
        | SELECT event_type, n,
        |  list_reduce(
        |   list_prepend([l0, b0] || [v - l0 for v in vs[1:24]],
        |                list_transform(vs[25:], x -> [x])),
        |   (acc, e) ->
        |    [(e[1] - acc[3])*0.3 + (acc[1] + acc[2])*(1.0 - 0.3),
        |     (((e[1] - acc[3])*0.3 + (acc[1] + acc[2])*(1.0 - 0.3))
        |       - acc[1])*0.1 + acc[2]*(1.0 - 0.1)]
        |    || acc[4:]
        |    || [(e[1] - ((e[1] - acc[3])*0.3
        |          + (acc[1] + acc[2])*(1.0 - 0.3)))*0.2
        |        + acc[3]*(1.0 - 0.2)]) AS s
        | FROM ini)
        |SELECT event_type, n, round(s[1], 6) AS level, round(s[2], 6) AS trend,
        | round(s[3], 6) AS s_next, round(s[1] + s[2] + s[3], 6) AS forecast
        |FROM st""".stripMargin,
    "tel_holt" ->
      // state rides in a 2-element DOUBLE list [l, b], NOT a struct:
      // DuckDB 1.0 list_reduce mutates the accumulator field-by-field,
      // so a struct's second field would see the first field already
      // overwritten (l_prev lost); list construction evaluates all
      // elements against the pre-step accumulator
      """WITH g AS (
        | SELECT event_type, list(value ORDER BY ts, event_id) AS vs,
        |  count(*) AS n
        | FROM events GROUP BY 1),
        |f AS (
        | SELECT event_type, n,
        |  list_reduce(
        |   list_prepend([vs[1], vs[2] - vs[1]],
        |                list_transform(vs[3:], x -> [x, 0.0])),
        |   (acc, e) -> [e[1]*0.3 + (acc[1] + acc[2])*(1.0 - 0.3),
        |                ((e[1]*0.3 + (acc[1] + acc[2])*(1.0 - 0.3)) - acc[1])*0.1
        |                + acc[2]*(1.0 - 0.1)]) AS st
        | FROM g)
        |SELECT event_type, n, st[1] AS level, st[2] AS trend,
        | st[1] + st[2] AS forecast
        |FROM f""".stripMargin,
    "q_corr_regr" ->
      """WITH e AS (
        | SELECT event_type, value,
        |  (epoch_us(ts) - 1704067200000000) / 86400000000.0 AS days
        | FROM events)
        |SELECT event_type, count(*) AS n,
        | round(corr(value, days), 6) AS corr_vt,
        | round(regr_slope(value, days), 6) AS slope,
        | round(regr_intercept(value, days), 6) AS intercept,
        | round(regr_r2(value, days), 6) AS r2
        |FROM e GROUP BY 1""".stripMargin,
    "tel_transitions" ->
      """WITH seq AS (
        | SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |   AS to_type
        | FROM events),
        |c AS (
        | SELECT from_type, to_type, count(*) AS n
        | FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        | CAST(n AS DOUBLE)
        |  / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM c""".stripMargin,
    "tel_top_movers" ->
      """WITH weekly AS (
        | SELECT event_type, date_trunc('week', ts) AS wk, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |m AS (
        | SELECT event_type, wk, n,
        |  lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n
        | FROM weekly),
        |d AS (
        | SELECT event_type, wk, n, prev_n, n - prev_n AS delta,
        |  CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE) AS pct
        | FROM m WHERE prev_n IS NOT NULL)
        |SELECT strftime(wk, '%Y-%m-%d') AS week_start, event_type,
        | CAST(n AS BIGINT) AS n, CAST(prev_n AS BIGINT) AS prev_n,
        | CAST(delta AS BIGINT) AS delta, pct, CAST(rnk AS BIGINT) AS rnk
        |FROM (
        | SELECT *, row_number() OVER (
        |   PARTITION BY wk ORDER BY abs(pct) DESC, event_type) AS rnk
        | FROM d) t
        |WHERE rnk <= 3""".stripMargin,
    "text_weighted_sample" ->
      """WITH d AS (
        | SELECT doc_id, lang, n_chars,
        |  sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  greatest(1, sum(n_chars) OVER (PARTITION BY lang) // 50) AS stride
        | FROM documents)
        |SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        | CAST(cum AS BIGINT) AS cum
        |FROM d
        |WHERE cum // stride > (cum - n_chars) // stride""".stripMargin,
    "q_table_profile" ->
      """WITH s AS (
        | SELECT count(*) AS n,
        |  count(event_id) AS nn_eid, count(DISTINCT event_id) AS nd_eid,
        |  CAST(min(event_id) AS DOUBLE) AS mn_eid,
        |  CAST(max(event_id) AS DOUBLE) AS mx_eid,
        |  count(user_id) AS nn_uid, count(DISTINCT user_id) AS nd_uid,
        |  CAST(min(user_id) AS DOUBLE) AS mn_uid,
        |  CAST(max(user_id) AS DOUBLE) AS mx_uid,
        |  count(event_type) AS nn_et, count(DISTINCT event_type) AS nd_et,
        |  count(value) AS nn_val, count(DISTINCT value) AS nd_val,
        |  min(value) AS mn_val, max(value) AS mx_val,
        |  count(props) AS nn_props, count(DISTINCT props) AS nd_props
        | FROM events)
        |SELECT 'event_id' AS col_name, nn_eid AS non_null,
        | n - nn_eid AS n_null, nd_eid AS n_distinct,
        | mn_eid AS min_val, mx_eid AS max_val FROM s
        |UNION ALL SELECT 'user_id', nn_uid, n - nn_uid, nd_uid,
        | mn_uid, mx_uid FROM s
        |UNION ALL SELECT 'event_type', nn_et, n - nn_et, nd_et,
        | CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM s
        |UNION ALL SELECT 'value', nn_val, n - nn_val, nd_val,
        | mn_val, mx_val FROM s
        |UNION ALL SELECT 'props', nn_props, n - nn_props, nd_props,
        | CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM s""".stripMargin,
    "dedup_edit_distance" ->
      // quadratic-within-language formulation; the length predicate is
      // implied by ed ≤ 8 (each edit changes length by at most 1) but
      // keeps the oracle from running 250k full O(len²) distances
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
        | CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
        |FROM documents a JOIN documents b
        | ON a.doc_id < b.doc_id
        | AND abs(length(a.text) - length(b.text)) <= 8
        |WHERE levenshtein(a.text, b.text) <= 8""".stripMargin,
    "tel_interpolate" ->
      """WITH hourly AS (
        | SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hus,
        |  round(sum(value), 4) AS v
        | FROM events GROUP BY 1, 2),
        |grid AS (
        | SELECT event_type,
        |  unnest(generate_series(min(hus), max(hus), 3600000000)) AS hus
        | FROM hourly GROUP BY event_type),
        |j AS (
        | SELECT g.event_type, g.hus, h.v FROM grid g
        | LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hus = h.hus),
        |w AS (
        | SELECT event_type, hus, v,
        |  last_value(v IGNORE NULLS) OVER p AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN hus END IGNORE NULLS)
        |    OVER p AS pt,
        |  first_value(v IGNORE NULLS) OVER f AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN hus END IGNORE NULLS)
        |    OVER f AS nt
        | FROM j
        | WINDOW p AS (PARTITION BY event_type ORDER BY hus
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  f AS (PARTITION BY event_type ORDER BY hus
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type,
        | strftime(make_timestamp(hus), '%Y-%m-%d %H:%M:%S') AS hour_start,
        | v IS NULL AS was_missing,
        | CASE WHEN v IS NOT NULL THEN v
        |      WHEN pv IS NULL THEN nv
        |      WHEN nv IS NULL THEN pv
        |      ELSE pv + (nv - pv)
        |       * (CAST(hus - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
        | END AS filled
        |FROM w""".stripMargin,
    "tel_mad" ->
      """WITH scaled AS (
        | SELECT event_id, event_type,
        |  CAST(round(value * 100, 0) AS BIGINT) AS v100
        | FROM events),
        |med AS (
        | SELECT event_type, quantile_cont(v100, 0.5) AS med
        | FROM scaled GROUP BY 1),
        |mad AS (
        | SELECT s.event_type, any_value(m.med) AS med,
        |  quantile_cont(abs(s.v100 - m.med), 0.5) AS mad
        | FROM scaled s JOIN med m USING (event_type) GROUP BY s.event_type)
        |SELECT s.event_type, s.event_id,
        | CAST(s.v100 AS DOUBLE) / 100 AS value, d.med, d.mad,
        | (s.v100 - d.med) / (1.4826 * d.mad) AS score
        |FROM scaled s JOIN mad d USING (event_type)
        |WHERE abs((s.v100 - d.med) / (1.4826 * d.mad)) > 3.0""".stripMargin,
    "q_mode" ->
      """WITH c AS (
        | SELECT user_id, event_type, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |r AS (
        | SELECT user_id, event_type, n,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY n DESC, event_type) AS rk,
        |  sum(n) OVER (PARTITION BY user_id) AS n_events
        | FROM c)
        |SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n_mode,
        | CAST(n_events AS BIGINT) AS n_events
        |FROM r WHERE rk = 1""".stripMargin,
    "q_gaps_islands" ->
      """WITH d AS (
        | SELECT DISTINCT user_id,
        |  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        | FROM events),
        |r AS (
        | SELECT user_id, d,
        |  d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS anchor
        | FROM d),
        |s AS (
        | SELECT user_id, anchor, count(*) AS len, min(d) AS start
        | FROM r GROUP BY 1, 2),
        |b AS (
        | SELECT user_id, len, start,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY len DESC, start) AS rk,
        |  count(*) OVER (PARTITION BY user_id) AS n_streaks,
        |  sum(len) OVER (PARTITION BY user_id) AS active_days
        | FROM s)
        |SELECT user_id, CAST(n_streaks AS BIGINT) AS n_streaks,
        | CAST(active_days AS BIGINT) AS active_days,
        | CAST(len AS BIGINT) AS max_streak,
        | strftime(DATE '1970-01-01' + start * INTERVAL 1 DAY, '%Y-%m-%d')
        |   AS max_streak_start
        |FROM b WHERE rk = 1""".stripMargin,
    "q_skyline" ->
      """WITH p AS (
        | SELECT CAST(l_quantity AS BIGINT) AS qty,
        |  min(l_extendedprice) AS price, count(*) AS n_at_qty
        | FROM lineitem GROUP BY 1),
        |w AS (
        | SELECT qty, price, n_at_qty,
        |  min(price) OVER (ORDER BY qty DESC
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_higher
        | FROM p)
        |SELECT qty, price, CAST(n_at_qty AS BIGINT) AS n_at_qty
        |FROM w WHERE best_higher IS NULL OR price < best_higher""".stripMargin,
    "tel_attribution" ->
      """WITH e AS (
        | SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
        | FROM events),
        |w AS (
        | SELECT *,
        |  last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts,
        |  last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id
        | FROM e)
        |SELECT event_id, user_id, ts_us, click_id, click_ts,
        | ts_us - click_ts AS latency_us,
        | coalesce(ts_us - click_ts <= 604800000000, false) AS attributed
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    "tel_changepoint" ->
      """WITH h AS (
        | SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
        | FROM events GROUP BY 1, 2),
        |s AS (
        | SELECT event_type, h, n,
        |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
        |  sum(n) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(n) OVER (PARTITION BY event_type) AS total,
        |  count(*) OVER (PARTITION BY event_type) AS cnt
        | FROM h),
        |sc AS (
        | SELECT event_type, h,
        |  CAST(cum AS DOUBLE) / CAST(i AS DOUBLE) AS left_mean,
        |  CAST(total - cum AS DOUBLE) / CAST(cnt - i AS DOUBLE) AS right_mean,
        |  abs(CAST(cum AS DOUBLE) / CAST(i AS DOUBLE)
        |      - CAST(total - cum AS DOUBLE) / CAST(cnt - i AS DOUBLE)) AS score
        | FROM s WHERE i < cnt)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS split_after,
        | left_mean, right_mean, score
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY score DESC, h) AS rk FROM sc) t
        |WHERE rk = 1""".stripMargin,
    "tel_new_vs_returning" ->
      """WITH a AS (
        | SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM a GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        | CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
        |   AS new_users,
        | CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT)
        |   AS returning_users,
        | CAST(count(*) AS BIGINT) AS active_users
        |FROM a JOIN f USING (user_id) GROUP BY day""".stripMargin,
    "tel_ddsketch" -> ddsketchOracleSql,
    // the native ddsketch_agg aggregate must reproduce the relational
    // pipeline bit-for-bit — same oracle checks both paths
    "tel_ddsketch_native" -> ddsketchOracleSql,
    "q9_profit" ->
      """WITH part_f AS (
        | SELECT p_partkey, CAST(round(p_retailprice*100) AS BIGINT) AS r100
        | FROM part WHERE p_name LIKE '%bolt%'),
        |li AS (
        | SELECT l_orderkey, l_partkey, l_suppkey,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS e100,
        |  CAST(round(l_discount*100) AS BIGINT) AS d100,
        |  CAST(l_quantity AS BIGINT) AS q
        | FROM lineitem)
        |SELECT n.n_name AS nation,
        | CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        | CAST(sum(li.e100*(100 - li.d100) - 80*part_f.r100*li.q) AS DOUBLE)
        |   / 1e4 AS profit,
        | CAST(count(*) AS BIGINT) AS n_lines
        |FROM li
        | JOIN part_f ON li.l_partkey = part_f.p_partkey
        | JOIN supplier s ON li.l_suppkey = s.s_suppkey
        | JOIN orders o ON li.l_orderkey = o.o_orderkey
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    "q_dq_suite" ->
      """SELECT 'fk_lineitem_orderkey' AS check_name,
        | 'lineitem' AS table_name,
        | CAST((SELECT count(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o
        |     WHERE l.l_orderkey = o.o_orderkey)) AS BIGINT) AS violations,
        | CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS total,
        | (SELECT count(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o
        |     WHERE l.l_orderkey = o.o_orderkey)) = 0 AS pass
        |UNION ALL
        |SELECT 'fk_orders_custkey', 'orders',
        | CAST((SELECT count(*) FROM orders x
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |     WHERE x.o_custkey = c.c_custkey)) AS BIGINT),
        | CAST((SELECT count(*) FROM orders) AS BIGINT),
        | (SELECT count(*) FROM orders x
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |     WHERE x.o_custkey = c.c_custkey)) = 0
        |UNION ALL
        |SELECT 'pk_orders_unique', 'orders',
        | CAST((SELECT coalesce(sum(c - 1), 0) FROM (
        |   SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
        |   WHERE c > 1) AS BIGINT),
        | CAST((SELECT count(*) FROM orders) AS BIGINT),
        | (SELECT coalesce(sum(c - 1), 0) FROM (
        |   SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
        |   WHERE c > 1) = 0
        |UNION ALL
        |SELECT 'not_null_orderdate', 'orders',
        | CAST((SELECT count(*) FROM orders
        |   WHERE o_orderdate IS NULL) AS BIGINT),
        | CAST((SELECT count(*) FROM orders) AS BIGINT),
        | (SELECT count(*) FROM orders WHERE o_orderdate IS NULL) = 0
        |UNION ALL
        |SELECT 'range_discount_0_1', 'lineitem',
        | CAST((SELECT count(*) FROM lineitem
        |   WHERE l_discount < 0 OR l_discount > 1) AS BIGINT),
        | CAST((SELECT count(*) FROM lineitem) AS BIGINT),
        | (SELECT count(*) FROM lineitem
        |   WHERE l_discount < 0 OR l_discount > 1) = 0
        |UNION ALL
        |SELECT 'range_quantity_pos', 'lineitem',
        | CAST((SELECT count(*) FROM lineitem
        |   WHERE l_quantity <= 0) AS BIGINT),
        | CAST((SELECT count(*) FROM lineitem) AS BIGINT),
        | (SELECT count(*) FROM lineitem WHERE l_quantity <= 0) = 0""".stripMargin,
    "q_interval_overlap" -> intervalOverlapOracleSql,
    "q_interval_overlap_rewrite" -> intervalOverlapOracleSql,
    "tel_psi_drift" ->
      """WITH ev AS (
        | SELECT event_type, epoch_us(ts) AS us,
        |  greatest(CAST(round(value*100) AS BIGINT), 1) AS v100
        | FROM events WHERE value > 0),
        |bounds AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
        |binned AS (
        | SELECT event_type,
        |  CASE WHEN v100 = 1 THEN 0
        |       ELSE length(bin(v100*v100 - 1)) END AS idx,
        |  CAST(sum(CASE WHEN us < lo + (hi - lo)//2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c_ref,
        |  CAST(sum(CASE WHEN us >= lo + (hi - lo)//2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c_cur
        | FROM ev CROSS JOIN bounds GROUP BY 1, 2),
        |t AS (
        | SELECT *,
        |  CAST(sum(c_ref) OVER (PARTITION BY event_type) AS BIGINT) AS n_ref,
        |  CAST(sum(c_cur) OVER (PARTITION BY event_type) AS BIGINT) AS n_cur,
        |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nb
        | FROM binned),
        |terms AS (
        | SELECT *,
        |  CAST(round(1e6 *
        |    (CAST(c_ref+1 AS DOUBLE)/CAST(n_ref+nb AS DOUBLE)
        |     - CAST(c_cur+1 AS DOUBLE)/CAST(n_cur+nb AS DOUBLE)) *
        |    round(ln(CAST((c_ref+1)*(n_cur+nb) AS DOUBLE)
        |           / CAST((c_cur+1)*(n_ref+nb) AS DOUBLE)), 4)) AS BIGINT)
        |    AS term_micro
        | FROM t)
        |SELECT event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
        | CAST(count(*) AS BIGINT) AS n_bins,
        | CAST(sum(term_micro) AS DOUBLE)/1e6 AS psi,
        | CAST(sum(term_micro) AS DOUBLE)/1e6 >= 0.2 AS drifted
        |FROM terms GROUP BY 1""".stripMargin,
    "tel_k_anon" ->
      """WITH g AS (
        | -- DuckDB dayofweek is 0=Sun..6; Spark is 1=Sun..7 — align
        | SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS weekday,
        |  CAST(floor(value/10)*10 AS BIGINT) AS value_bucket,
        |  CAST(count(*) AS BIGINT) AS c
        | FROM events GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_groups,
        | CAST(sum(CASE WHEN c < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_small_groups,
        | CAST(sum(CASE WHEN c < 10 THEN c ELSE 0 END) AS BIGINT)
        |   AS rows_at_risk,
        | CAST(sum(c) AS BIGINT) AS n_rows,
        | CAST(10 AS BIGINT) AS k,
        | sum(CASE WHEN c < 10 THEN 1 ELSE 0 END) = 0 AS anonymous
        |FROM g GROUP BY 1""".stripMargin,
    "tel_seasonal_backtest" ->
      """WITH hourly AS (
        | SELECT event_type, date_trunc('hour', ts) AS h,
        |  CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |grid AS (
        | SELECT event_type, epoch_us(h0) AS us0,
        |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        | FROM (SELECT event_type, min(h) AS h0, max(h) AS h1
        |       FROM hourly GROUP BY 1) s),
        |dense AS (
        | SELECT g.event_type, g.h, coalesce(hourly.y, 0) AS y,
        |  (epoch_us(g.h) - g.us0) // 3600000000 AS hr_idx
        | FROM grid g LEFT JOIN hourly
        |   ON g.event_type = hourly.event_type AND g.h = hourly.h),
        |sp AS (
        | SELECT *, hour(h) AS hod,
        |  hr_idx < (CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |    // 2) AS is_train
        | FROM dense),
        |profile AS (
        | SELECT event_type, hod,
        |  CAST(round(1e6 * sum(y) / count(*)) AS BIGINT) AS pred_micro
        | FROM sp WHERE is_train GROUP BY 1, 2),
        |test AS (
        | SELECT sp.event_type,
        |  abs(sp.y * 1000000 - p.pred_micro) AS err_micro,
        |  abs(sp.y * 1000000 - p.pred_micro) // 1000 AS err_milli,
        |  sp.y
        | FROM sp JOIN profile p
        |   ON sp.event_type = p.event_type AND sp.hod = p.hod
        | WHERE NOT sp.is_train)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_test_hours,
        | CAST(sum(err_micro) AS DOUBLE) / count(*) / 1e6 AS mae,
        | sqrt(CAST(sum(err_milli * err_milli) AS DOUBLE) / count(*)) / 1e3
        |   AS rmse,
        | CAST(sum(y) AS DOUBLE) / count(*) AS mean_actual
        |FROM test GROUP BY 1""".stripMargin,
    "tel_top_paths" ->
      """WITH e AS (
        | SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS rn
        | FROM events),
        |p AS (
        | SELECT user_id,
        |  string_agg(event_type, '>' ORDER BY rn) AS path
        | FROM e WHERE rn <= 5 GROUP BY 1),
        |c AS (
        | SELECT path, CAST(count(*) AS BIGINT) AS n_users
        | FROM p GROUP BY 1)
        |SELECT path, n_users,
        | CAST(row_number() OVER (ORDER BY n_users DESC, path) AS BIGINT)
        |   AS rnk
        |FROM c QUALIFY rnk <= 20""".stripMargin,
    "tel_dp_counts" ->
      """WITH c AS (
        | SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |hh AS (
        | SELECT *, greatest(('0x' || substr(md5('dp:' || event_type || ':'
        |   || day), 1, 15))::BIGINT, 1) AS h
        | FROM c),
        |nz AS (
        | SELECT *, CASE WHEN h < 576460752303423488
        |  THEN round(ln(CAST(h AS DOUBLE) / 576460752303423488.0), 4)
        |  ELSE -round(ln(CAST(1152921504606846976 - h AS DOUBLE)
        |    / 576460752303423488.0), 4) END AS noise
        | FROM hh)
        |SELECT event_type, day, n, noise, n + noise AS released,
        | CAST(1.0 AS DOUBLE) AS epsilon
        |FROM nz""".stripMargin,
    "tel_kmv_overlap" ->
      """WITH tu AS (
        | SELECT DISTINCT event_type, user_id FROM events),
        |th AS (
        | SELECT event_type, user_id,
        |  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        | FROM tu),
        |sk AS (
        | SELECT event_type, h FROM (
        |  SELECT event_type, h, row_number() OVER (PARTITION BY event_type
        |    ORDER BY h, user_id) AS rk FROM th)
        | WHERE rk <= 64),
        |types AS (SELECT DISTINCT event_type FROM tu),
        |pairs AS (
        | SELECT a.event_type AS ta, b.event_type AS tb
        | FROM types a JOIN types b ON a.event_type < b.event_type),
        |tagged AS (
        | SELECT ta, tb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        |  SELECT p.ta, p.tb, s.h, 1 AS in_a, 0 AS in_b
        |  FROM pairs p JOIN sk s ON s.event_type = p.ta
        |  UNION ALL
        |  SELECT p.ta, p.tb, s.h, 0, 1
        |  FROM pairs p JOIN sk s ON s.event_type = p.tb)
        | GROUP BY 1, 2, 3),
        |un AS (
        | SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        |  FROM tagged) WHERE rn <= 64),
        |un2 AS (
        | SELECT *,
        |  CAST(count(*) OVER (PARTITION BY ta, tb) AS BIGINT) AS n_union,
        |  max(h) OVER (PARTITION BY ta, tb) AS kth
        | FROM un),
        |est AS (
        | SELECT ta, tb, max(n_union) AS n_union, max(kth) AS kth,
        |  CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
        |    AND (n_union < 64 OR h < kth) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS bb
        | FROM un2 GROUP BY 1, 2),
        |ex AS (
        | SELECT a.event_type AS ta, b.event_type AS tb,
        |  CAST(count(*) AS BIGINT) AS exact_overlap
        | FROM tu a JOIN tu b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        | GROUP BY 1, 2),
        |sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |       FROM tu GROUP BY 1)
        |SELECT e.ta AS type_a, e.tb AS type_b, sa.n AS n_a, sb.n AS n_b,
        | ex.exact_overlap,
        | CASE WHEN e.n_union < 64 THEN CAST(bb AS DOUBLE)
        |  ELSE CAST(bb AS DOUBLE) /
        |   (CAST(kth AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE)) END
        |   AS kmv_est
        |FROM est e
        | JOIN ex ON e.ta = ex.ta AND e.tb = ex.tb
        | JOIN sz sa ON sa.event_type = e.ta
        | JOIN sz sb ON sb.event_type = e.tb""".stripMargin,
    "tel_ab_test" ->
      """WITH g AS (
        | SELECT event_type,
        |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN arm = 0 THEN v100 ELSE 0 END) AS BIGINT) AS s_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN v100 ELSE 0 END) AS BIGINT) AS s_b,
        |  sum(CASE WHEN arm = 0
        |    THEN CAST(v100 AS DOUBLE)*CAST(v100 AS DOUBLE)
        |    ELSE CAST(0 AS DOUBLE) END) AS q_a,
        |  sum(CASE WHEN arm = 1
        |    THEN CAST(v100 AS DOUBLE)*CAST(v100 AS DOUBLE)
        |    ELSE CAST(0 AS DOUBLE) END) AS q_b
        | FROM (SELECT event_type,
        |   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
        |     AS arm,
        |   greatest(CAST(round(value*100) AS BIGINT), 1) AS v100
        |  FROM events)
        | GROUP BY 1),
        |s AS (
        | SELECT *,
        |  (q_a - CAST(s_a AS DOUBLE)*CAST(s_a AS DOUBLE)/n_a) / (n_a - 1)
        |    AS va,
        |  (q_b - CAST(s_b AS DOUBLE)*CAST(s_b AS DOUBLE)/n_b) / (n_b - 1)
        |    AS vb,
        |  CAST(s_a AS DOUBLE)/n_a/100 AS mean_a,
        |  CAST(s_b AS DOUBLE)/n_b/100 AS mean_b
        | FROM g),
        |t AS (
        | SELECT *, va/n_a + vb/n_b AS var_term FROM s)
        |SELECT event_type, n_a, n_b, mean_a, mean_b,
        | mean_a - mean_b AS mean_diff,
        | (CAST(s_a AS DOUBLE)/n_a - CAST(s_b AS DOUBLE)/n_b)/sqrt(var_term)
        |   AS t_stat,
        | var_term*var_term /
        |  ((va/n_a)*(va/n_a)/(n_a - 1) + (vb/n_b)*(vb/n_b)/(n_b - 1))
        |   AS df_welch,
        | abs((CAST(s_a AS DOUBLE)/n_a - CAST(s_b AS DOUBLE)/n_b)
        |   /sqrt(var_term)) > 1.96 AS significant
        |FROM t""".stripMargin,
    // the chain holds the testdata's own events files minus one
    // merge-on-read-deleted row (min event_id) — the oracle replicates
    // the subtraction over raw events
    "sink_iceberg_sql" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(user_id) AS BIGINT) AS sum_uid,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events
        |WHERE event_id != (SELECT min(event_id) FROM events)
        |GROUP BY event_type""".stripMargin,
    // needle lookup through the bloom-sidecar-pruned chain: the oracle
    // filters raw events for the same deterministic key (max event_id;
    // the chain's deleted min-id row proves pruning composes with MOR)
    "sink_iceberg_point" ->
      """SELECT event_id, event_type, CAST(user_id AS BIGINT) AS user_id,
        | value
        |FROM events
        |WHERE event_id = (SELECT max(event_id) FROM events)""".stripMargin,
    // the flagship telemetry needle: fetch ONE trace by its 32-hex
    // STRING id through the xxhash64-keyed bloom sidecar — the oracle
    // re-derives the md5 trace ids over raw events and filters for the
    // deterministic needle (max event_id's trace)
    "tel_trace_lookup" ->
      """SELECT md5(CAST(event_id AS VARCHAR)) AS trace_id, event_id,
        | event_type, CAST(user_id AS BIGINT) AS user_id, value
        |FROM events
        |WHERE md5(CAST(event_id AS VARCHAR)) =
        |  md5(CAST((SELECT max(event_id) FROM events) AS VARCHAR))""".stripMargin,
    // the sidecar NDV sketch in its exact mode (event_type cardinality
    // far below k: the blob IS the distinct set) — metadata-only read
    // must equal the independent engine's count(DISTINCT)
    "sink_iceberg_ndv" ->
      """SELECT 'event_type' AS "column",
        | CAST(count(DISTINCT event_type) AS BIGINT) AS ndv,
        | TRUE AS exact
        |FROM events""".stripMargin,
    // the pre-delete snapshot sees EVERY raw row — snapshot isolation
    // proven against the independent engine
    "sink_iceberg_timetravel" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(user_id) AS BIGINT) AS sum_uid,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events
        |GROUP BY event_type""".stripMargin,
    "tel_rollup_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, event_type,
        | CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(CAST(trunc(value) AS BIGINT)) AS BIGINT) AS sum_value_trunc,
        | min(value) AS min_value, max(value) AS max_value,
        | CAST(sum(user_id) AS BIGINT) AS sum_user_id
        |FROM events GROUP BY 1, 2""".stripMargin,
    "tel_rollup_rewrite" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(trunc(value) AS BIGINT)) AS BIGINT) AS sum_trunc,
        | min(value) AS min_value, max(value) AS max_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "tel_seasonal" ->
      """WITH hourly AS (
        | SELECT event_type, date_trunc('hour', ts) AS h,
        |  CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |grid AS (
        | SELECT event_type,
        |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        | FROM (SELECT event_type, min(h) AS h0, max(h) AS h1
        |       FROM hourly GROUP BY 1) s),
        |dense AS (
        | SELECT g.event_type, g.h, coalesce(hourly.y, 0) AS y
        | FROM grid g LEFT JOIN hourly
        |   ON g.event_type = hourly.event_type AND g.h = hourly.h),
        |t AS (
        | SELECT *, CAST(sum(y) OVER w AS BIGINT) AS sum25,
        |  CAST(count(*) OVER w AS BIGINT) AS cnt25
        | FROM dense
        | WINDOW w AS (PARTITION BY event_type ORDER BY h
        |   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |tr AS (
        | SELECT *, 40000 * (25*y - sum25) AS detr_micro
        | FROM t WHERE cnt25 = 25),
        |s AS (
        | SELECT event_type, hour(h) AS hod,
        |  CAST(round(CAST(sum(detr_micro) AS DOUBLE)/count(*)) AS BIGINT)
        |    AS s_micro
        | FROM tr GROUP BY 1, 2)
        |SELECT tr.event_type,
        | strftime(tr.h, '%Y-%m-%d %H:%M:%S') AS hour_start, tr.y,
        | CAST(sum25 AS DOUBLE)/25 AS trend,
        | CAST(s_micro AS DOUBLE)/1e6 AS seasonal,
        | CAST(detr_micro - s_micro AS DOUBLE)/1e6 AS residual
        |FROM tr JOIN s
        |  ON tr.event_type = s.event_type AND hour(tr.h) = s.hod""".stripMargin,
    "text_bpe_pairs" ->
      """WITH w AS (
        | SELECT word, count(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |  FROM documents) t
        | WHERE length(word) >= 2 GROUP BY 1),
        |p AS (
        | SELECT substr(word, CAST(i AS INT), 2) AS pair, sum(freq) AS n
        | FROM (SELECT word, freq, unnest(range(1, length(word))) AS i FROM w) x
        | GROUP BY 1)
        |SELECT pair, CAST(n AS BIGINT) AS n,
        | CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rnk
        |FROM p QUALIFY rnk <= 25""".stripMargin,
    "mm_ahash_clusters" ->
      """WITH RECURSIVE fr AS (
        | SELECT doc_id, substr(text, CAST(i*64+1 AS BIGINT), 64) AS frame
        | FROM (SELECT doc_id, text,
        |   unnest(generate_series(0,
        |     CAST(ceil(length(text)/64.0) AS BIGINT)-1, 4)) AS i
        |  FROM documents WHERE length(text) > 0) t
        | WHERE length(substr(text, CAST(i*64+1 AS BIGINT), 64)) = 64),
        |hx AS (
        | SELECT doc_id,
        |  list_reduce(list_transform(range(0, 63), j -> CASE
        |    WHEN ascii(substr(frame, CAST(j+1 AS BIGINT), 1)) * 63 >
        |      list_reduce(list_transform(range(1, 64),
        |        k -> ascii(substr(frame, CAST(k AS BIGINT), 1))), (a,b) -> a+b)
        |    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END), (a,b) -> a+b) AS ahash
        | FROM fr),
        |grp AS (
        | SELECT ahash, CAST(count(*) AS BIGINT) AS n_frames FROM hx GROUP BY 1),
        |banded AS (
        | SELECT ahash, b.band, (ahash >> (b.band*16)) & 65535 AS band_val
        | FROM grp CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
        |pairs AS (
        | SELECT DISTINCT a.ahash AS ha, b.ahash AS hb
        | FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.ahash < b.ahash
        | WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
        |edges AS (
        | SELECT ha AS src, hb AS dst FROM pairs
        | UNION SELECT hb, ha FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS ahash, least(src, min(dst)) AS label
        | FROM reach GROUP BY src)
        |SELECT label AS cluster_id, CAST(count(*) AS BIGINT) AS n_hashes,
        | CAST(sum(g.n_frames) AS BIGINT) AS n_frames,
        | max(lab.ahash) AS max_hash
        |FROM lab JOIN grp g USING (ahash)
        |GROUP BY label""".stripMargin,
    "mm_ahash_pairs" ->
      """WITH fr AS (
        | SELECT doc_id, CAST(i*64 AS BIGINT) AS off,
        |  substr(text, CAST(i*64+1 AS BIGINT), 64) AS frame
        | FROM (SELECT doc_id, text,
        |   unnest(generate_series(0,
        |     CAST(ceil(length(text)/64.0) AS BIGINT)-1, 4)) AS i
        |  FROM documents WHERE length(text) > 0) t
        | WHERE length(substr(text, CAST(i*64+1 AS BIGINT), 64)) = 64),
        |hx AS (
        | SELECT doc_id, off,
        |  list_reduce(list_transform(range(0, 63), j -> CASE
        |    WHEN ascii(substr(frame, CAST(j+1 AS BIGINT), 1)) * 63 >
        |      list_reduce(list_transform(range(1, 64),
        |        k -> ascii(substr(frame, CAST(k AS BIGINT), 1))), (a,b) -> a+b)
        |    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END), (a,b) -> a+b) AS ahash
        | FROM fr),
        |grp AS (
        | SELECT ahash, CAST(count(*) AS BIGINT) AS n_frames,
        |  min(doc_id) AS min_doc
        | FROM hx GROUP BY 1),
        |banded AS (
        | SELECT ahash, n_frames, min_doc, b.band,
        |  (ahash >> (b.band*16)) & 65535 AS band_val
        | FROM grp CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
        |cand AS (
        | SELECT DISTINCT a.ahash AS ha, b.ahash AS hb,
        |  a.n_frames AS n_a, b.n_frames AS n_b,
        |  a.min_doc AS doc_a, b.min_doc AS doc_b
        | FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.ahash < b.ahash)
        |SELECT ha, hb, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming,
        | n_a, n_b, n_a * n_b AS frame_pairs, doc_a, doc_b
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin,
    // REAL ImageIO decode family: images are generated from the
    // analytic md5 pixel function px(g,i), encoded to real PNG, and
    // every query computes from ImageIO-DECODED samples; the oracle
    // reproduces the integers from the pixel function alone — equality
    // proves decode∘encode = id on real codec bytes
    "mm_img_meta" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i)
        |SELECT doc_id, '89504e47' AS magic_hex,
        | CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        | CAST(sum(v) AS BIGINT) AS sum_luma
        |FROM px GROUP BY 1""".stripMargin,
    // the JPEG twin of mm_img_meta: 64×64 of constant 8×8 blocks whose
    // values are the SAME analytic plane — decoded sum is 64× it; the
    // magic pins SOI+APP0 (a hash match proves the stock decoder read
    // our hand-rolled baseline JFIF exactly)
    "mm_jpeg_meta" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i)
        |SELECT doc_id, 'ffd8ffe0' AS magic_hex,
        | CAST(64 AS BIGINT) AS width, CAST(64 AS BIGINT) AS height,
        | CAST(64 * sum(v) AS BIGINT) AS sum_luma
        |FROM px GROUP BY 1""".stripMargin,
    // identical oracle to mm_video_scenecut BY DESIGN: the MJPEG
    // frames decode losslessly (constant-block JPEG) and block-mean
    // downsample to the same analytic scene planes, so SADs match
    "mm_avi_scenecut" ->
      """WITH fr AS (
        | SELECT d.doc_id, f.f, i.i,
        |  CASE WHEN i.i < 2
        |   THEN (('0x' || substr(md5('v:' || CAST(d.doc_id AS VARCHAR) ||
        |      ':' || CAST(f.f // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + f.f % 3) % 256
        |   ELSE ('0x' || substr(md5('v:' || CAST(d.doc_id AS VARCHAR) ||
        |      ':' || CAST(f.f // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS f) f
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        |sad AS (
        | SELECT a.doc_id, a.f AS frame_idx,
        |  CAST(sum(abs(a.v - b.v)) AS BIGINT) AS sad_x64
        | FROM fr a JOIN fr b
        |  ON a.doc_id = b.doc_id AND a.i = b.i AND b.f = a.f - 1
        | WHERE a.f >= 1 GROUP BY 1, 2)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, sad_x64,
        | sad_x64 > 2560 AS is_cut
        |FROM sad""".stripMargin,
    "mm_video_scenecut" ->
      """WITH fr AS (
        | SELECT d.doc_id, f.f, i.i,
        |  CASE WHEN i.i < 2
        |   THEN (('0x' || substr(md5('v:' || CAST(d.doc_id AS VARCHAR) ||
        |      ':' || CAST(f.f // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + f.f % 3) % 256
        |   ELSE ('0x' || substr(md5('v:' || CAST(d.doc_id AS VARCHAR) ||
        |      ':' || CAST(f.f // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS f) f
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        |sad AS (
        | SELECT a.doc_id, a.f AS frame_idx,
        |  CAST(sum(abs(a.v - b.v)) AS BIGINT) AS sad_x64
        | FROM fr a JOIN fr b
        |  ON a.doc_id = b.doc_id AND a.i = b.i AND b.f = a.f - 1
        | WHERE a.f >= 1 GROUP BY 1, 2)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, sad_x64,
        | sad_x64 > 2560 AS is_cut
        |FROM sad""".stripMargin,
    // the G.711 expansion re-derived integer-only from the public
    // spec: u = 255-code, mag = ((m*8+132)<<e)-132, sign from bit 7 —
    // hash match proves the stock telephony decode path bit-for-bit
    "mm_wav_ulaw" ->
      """WITH c AS (
        | SELECT d.doc_id, i.i,
        |  255 - ('0x' || substr(md5('u:' || CAST(d.doc_id AS VARCHAR) ||
        |    ':' || CAST(i.i AS VARCHAR)), 1, 2))::BIGINT AS u
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 511)) AS i) i),
        |p AS (
        | SELECT doc_id,
        |  CASE WHEN u >= 128 THEN -(((u % 16) * 8 + 132)
        |        * (1 << ((u // 16) % 8)) - 132)
        |       ELSE ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132
        |  END AS pcm
        | FROM c)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(sum(pcm) AS BIGINT) AS sum_pcm,
        | CAST(sum(abs(pcm)) AS BIGINT) AS sum_abs,
        | CAST(max(abs(pcm)) AS BIGINT) AS peak_abs
        |FROM p GROUP BY 1""".stripMargin,
    "mm_wav_meta" ->
      """WITH v AS (
        | SELECT d.doc_id, i.i,
        |  ('0x' || substr(md5('a:' || CAST(d.doc_id AS VARCHAR) || ':' ||
        |     CAST(i.i AS VARCHAR)), 1, 4))::BIGINT AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 511)) AS i) i),
        |x AS (
        | SELECT doc_id,
        |  v - CASE WHEN v >= 32768 THEN 65536 ELSE 0 END AS s
        | FROM v)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        | CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(count(*) * 125 AS BIGINT) AS duration_us,
        | CAST(max(abs(s)) AS BIGINT) AS peak_abs,
        | CAST(sum(abs(s)) AS BIGINT) AS sum_abs
        |FROM x GROUP BY 1""".stripMargin,
    "mm_wav_clipping" ->
      """WITH v AS (
        | SELECT d.doc_id, i.i,
        |  ('0x' || substr(md5('a:' || CAST(d.doc_id AS VARCHAR) || ':' ||
        |     CAST(i.i AS VARCHAR)), 1, 4))::BIGINT AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 511)) AS i) i),
        |x AS (
        | SELECT doc_id,
        |  abs(v - CASE WHEN v >= 32768 THEN 65536 ELSE 0 END) AS a
        | FROM v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(sum(CASE WHEN a >= 32440 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_clipped,
        | CAST(sum(CASE WHEN a <= 327 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_silent,
        | CAST(sum(CASE WHEN a >= 32440 THEN 1 ELSE 0 END) * 10000 // count(*)
        |   AS BIGINT) AS clipped_bp,
        | CAST(sum(CASE WHEN a <= 327 THEN 1 ELSE 0 END) * 10000 // count(*)
        |   AS BIGINT) AS silent_bp,
        | CAST(max(a) AS BIGINT) AS peak_abs
        |FROM x GROUP BY 1""".stripMargin,
    "mm_wav_windows" ->
      """WITH v AS (
        | SELECT d.doc_id, i.i,
        |  ('0x' || substr(md5('a:' || CAST(d.doc_id AS VARCHAR) || ':' ||
        |     CAST(i.i AS VARCHAR)), 1, 4))::BIGINT AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 511)) AS i) i),
        |x AS (
        | SELECT doc_id, i, i // 128 AS win,
        |  v - CASE WHEN v >= 32768 THEN 65536 ELSE 0 END AS s
        | FROM v),
        |x2 AS (
        | SELECT *, lag(s) OVER (PARTITION BY doc_id, win ORDER BY i) AS prev
        | FROM x)
        |SELECT doc_id, CAST(win AS BIGINT) AS win,
        | CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(sum(s*s) AS BIGINT) AS energy_q,
        | sqrt(CAST(CAST(sum(s*s) AS BIGINT) AS DOUBLE) / 128) AS rms,
        | CAST(sum(CASE WHEN prev IS NOT NULL
        |   AND (s >= 0) <> (prev >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS zcr
        |FROM x2 GROUP BY 1, 2""".stripMargin,
    "mm_img_entropy" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        |c AS (
        | SELECT doc_id, v, CAST(count(*) AS BIGINT) AS c
        | FROM px GROUP BY 1, 2),
        |h AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_lumas,
        |  CAST(sum(c * CAST(round(1e4*(6 - ln(CAST(c AS DOUBLE))/ln(2.0)))
        |    AS BIGINT)) AS BIGINT) AS h_micro
        | FROM c GROUP BY 1)
        |SELECT doc_id, n_distinct_lumas, h_micro,
        | CAST(h_micro AS DOUBLE)/64/1e4 AS entropy_bits,
        | n_distinct_lumas < 8 AS flat
        |FROM h""".stripMargin,
    // identical oracle to mm_img_dhash_pairs BY DESIGN (the JPEG
    // block-mean plane equals the PNG pixel plane exactly)
    "mm_jpeg_dhash_pairs" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        |hx AS (
        | SELECT p1.doc_id,
        |  CAST(sum(CASE WHEN p2.v > p1.v
        |    THEN (CAST(1 AS BIGINT) << (p1.i - p1.i // 8))
        |    ELSE 0 END) AS BIGINT) AS dhash
        | FROM px p1 JOIN px p2 ON p1.doc_id = p2.doc_id AND p2.i = p1.i + 1
        | WHERE p1.i % 8 <> 7
        | GROUP BY 1),
        |grp AS (
        | SELECT dhash, CAST(count(*) AS BIGINT) AS n_imgs,
        |  min(doc_id) AS min_doc
        | FROM hx GROUP BY 1),
        |banded AS (
        | SELECT dhash, n_imgs, min_doc, b.band,
        |  (dhash >> (b.band*14)) & 16383 AS band_val
        | FROM grp CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
        |cand AS (
        | SELECT DISTINCT a.dhash AS ha, b.dhash AS hb,
        |  a.n_imgs AS n_a, b.n_imgs AS n_b,
        |  a.min_doc AS doc_a, b.min_doc AS doc_b
        | FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.dhash < b.dhash)
        |SELECT ha, hb, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming,
        | n_a, n_b, doc_a, doc_b
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin,
    "mm_img_dhash_pairs" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        |hx AS (
        | SELECT p1.doc_id,
        |  CAST(sum(CASE WHEN p2.v > p1.v
        |    THEN (CAST(1 AS BIGINT) << (p1.i - p1.i // 8))
        |    ELSE 0 END) AS BIGINT) AS dhash
        | FROM px p1 JOIN px p2 ON p1.doc_id = p2.doc_id AND p2.i = p1.i + 1
        | WHERE p1.i % 8 <> 7
        | GROUP BY 1),
        |grp AS (
        | SELECT dhash, CAST(count(*) AS BIGINT) AS n_imgs,
        |  min(doc_id) AS min_doc
        | FROM hx GROUP BY 1),
        |banded AS (
        | SELECT dhash, n_imgs, min_doc, b.band,
        |  (dhash >> (b.band*14)) & 16383 AS band_val
        | FROM grp CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
        |cand AS (
        | SELECT DISTINCT a.dhash AS ha, b.dhash AS hb,
        |  a.n_imgs AS n_a, b.n_imgs AS n_b,
        |  a.min_doc AS doc_a, b.min_doc AS doc_b
        | FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.dhash < b.dhash)
        |SELECT ha, hb, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming,
        | n_a, n_b, doc_a, doc_b
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin,
    // identical oracle to mm_img_ahash_pairs BY DESIGN: the JPEG
    // decode + 8x8 block-mean downsample lands exactly on the PNG
    // fixture's analytic plane, so the hashes (and pairs) are equal
    "mm_jpeg_ahash_pairs" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS i) i),
        |s AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS s
        |      FROM px GROUP BY 1),
        |hx AS (
        | SELECT px.doc_id,
        |  CAST(sum(CASE WHEN px.v * 63 > s.s
        |    THEN (CAST(1 AS BIGINT) << px.i) ELSE 0 END) AS BIGINT) AS ahash
        | FROM px JOIN s USING (doc_id) GROUP BY 1),
        |grp AS (
        | SELECT ahash, CAST(count(*) AS BIGINT) AS n_imgs,
        |  min(doc_id) AS min_doc
        | FROM hx GROUP BY 1),
        |banded AS (
        | SELECT ahash, n_imgs, min_doc, b.band,
        |  (ahash >> (b.band*16)) & 65535 AS band_val
        | FROM grp CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
        |cand AS (
        | SELECT DISTINCT a.ahash AS ha, b.ahash AS hb,
        |  a.n_imgs AS n_a, b.n_imgs AS n_b,
        |  a.min_doc AS doc_a, b.min_doc AS doc_b
        | FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.ahash < b.ahash)
        |SELECT ha, hb, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming,
        | n_a, n_b, doc_a, doc_b
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin,
    "mm_img_ahash_pairs" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS i) i),
        |s AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS s
        |      FROM px GROUP BY 1),
        |hx AS (
        | SELECT px.doc_id,
        |  CAST(sum(CASE WHEN px.v * 63 > s.s
        |    THEN (CAST(1 AS BIGINT) << px.i) ELSE 0 END) AS BIGINT) AS ahash
        | FROM px JOIN s USING (doc_id) GROUP BY 1),
        |grp AS (
        | SELECT ahash, CAST(count(*) AS BIGINT) AS n_imgs,
        |  min(doc_id) AS min_doc
        | FROM hx GROUP BY 1),
        |banded AS (
        | SELECT ahash, n_imgs, min_doc, b.band,
        |  (ahash >> (b.band*16)) & 65535 AS band_val
        | FROM grp CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
        |cand AS (
        | SELECT DISTINCT a.ahash AS ha, b.ahash AS hb,
        |  a.n_imgs AS n_a, b.n_imgs AS n_b,
        |  a.min_doc AS doc_a, b.min_doc AS doc_b
        | FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.ahash < b.ahash)
        |SELECT ha, hb, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming,
        | n_a, n_b, doc_a, doc_b
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin,
    "mm_txt_joint_embed" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        |q AS (
        | SELECT doc_id,
        |  CAST(sum(CASE WHEN ((i//8)//4)*2 + (i%8)//4 = 0 THEN v ELSE 0 END) AS BIGINT) AS q0,
        |  CAST(sum(CASE WHEN ((i//8)//4)*2 + (i%8)//4 = 1 THEN v ELSE 0 END) AS BIGINT) AS q1,
        |  CAST(sum(CASE WHEN ((i//8)//4)*2 + (i%8)//4 = 2 THEN v ELSE 0 END) AS BIGINT) AS q2,
        |  CAST(sum(CASE WHEN ((i//8)//4)*2 + (i%8)//4 = 3 THEN v ELSE 0 END) AS BIGINT) AS q3
        | FROM px GROUP BY 1),
        |t AS (
        | SELECT doc_id,
        |  ('0x'||substr(md5(text),1,2))::BIGINT AS t0,
        |  ('0x'||substr(md5(text),3,2))::BIGINT AS t1,
        |  ('0x'||substr(md5(text),5,2))::BIGINT AS t2,
        |  ('0x'||substr(md5(text),7,2))::BIGINT AS t3
        | FROM documents)
        |SELECT q.doc_id, q0, q1, q2, q3, t0, t1, t2, t3,
        | CAST(abs(q0-t0*16)+abs(q1-t1*16)+abs(q2-t2*16)+abs(q3-t3*16)
        |   AS BIGINT) AS l1,
        | abs(q0-t0*16)+abs(q1-t1*16)+abs(q2-t2*16)+abs(q3-t3*16) <= 6000
        |   AS aligned
        |FROM q JOIN t USING (doc_id)""".stripMargin,
    "mm_txt_retrieval" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        |q AS (
        | SELECT doc_id,
        |  CAST(sum(CASE WHEN ((i//8)//4)*2 + (i%8)//4 = 0 THEN v ELSE 0 END) AS BIGINT) AS q0,
        |  CAST(sum(CASE WHEN ((i//8)//4)*2 + (i%8)//4 = 1 THEN v ELSE 0 END) AS BIGINT) AS q1,
        |  CAST(sum(CASE WHEN ((i//8)//4)*2 + (i%8)//4 = 2 THEN v ELSE 0 END) AS BIGINT) AS q2,
        |  CAST(sum(CASE WHEN ((i//8)//4)*2 + (i%8)//4 = 3 THEN v ELSE 0 END) AS BIGINT) AS q3
        | FROM px GROUP BY 1),
        |t AS (
        | SELECT doc_id AS query_id,
        |  ('0x'||substr(md5(text),1,2))::BIGINT AS t0,
        |  ('0x'||substr(md5(text),3,2))::BIGINT AS t1,
        |  ('0x'||substr(md5(text),5,2))::BIGINT AS t2,
        |  ('0x'||substr(md5(text),7,2))::BIGINT AS t3
        | FROM documents WHERE doc_id < 8),
        |sc AS (
        | SELECT t.query_id, q.doc_id AS img_id,
        |  CAST(abs(q0-t0*16)+abs(q1-t1*16)+abs(q2-t2*16)+abs(q3-t3*16)
        |    AS BIGINT) AS l1
        | FROM q CROSS JOIN t),
        |f AS (SELECT query_id, l1 AS self_l1 FROM sc WHERE img_id = query_id)
        |SELECT s.query_id, CAST(count(*) AS BIGINT) AS n_images,
        | CAST(max(f.self_l1) AS BIGINT) AS self_l1,
        | CAST(1 + sum(CASE WHEN s.img_id != s.query_id AND
        |   (s.l1 < f.self_l1 OR (s.l1 = f.self_l1 AND s.img_id < s.query_id))
        |   THEN 1 ELSE 0 END) AS BIGINT) AS self_rank,
        | CAST(1 + sum(CASE WHEN s.img_id != s.query_id AND
        |   (s.l1 < f.self_l1 OR (s.l1 = f.self_l1 AND s.img_id < s.query_id))
        |   THEN 1 ELSE 0 END) AS BIGINT) <= 10 AS hit_at_k
        |FROM sc s JOIN f USING (query_id) GROUP BY 1""".stripMargin,
    "mm_txt_joint_pairs" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS i) i),
        |s AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS s
        |      FROM px GROUP BY 1),
        |hx AS (
        | SELECT px.doc_id,
        |  CAST(sum(CASE WHEN px.v * 63 > s.s
        |    THEN (CAST(1 AS BIGINT) << px.i) ELSE 0 END) AS BIGINT) AS ahash
        | FROM px JOIN s USING (doc_id) GROUP BY 1),
        |grp AS (
        | SELECT ahash, min(doc_id) AS min_doc FROM hx GROUP BY 1),
        |banded AS (
        | SELECT ahash, min_doc, b.band,
        |  (ahash >> (b.band*16)) & 65535 AS band_val
        | FROM grp CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
        |pr AS (
        | SELECT DISTINCT a.min_doc AS doc_a, b.min_doc AS doc_b,
        |  CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        | FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.ahash < b.ahash
        | WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
        |toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |shg AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, unnest(s) AS g FROM shg),
        |n AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM shg),
        |iv AS (
        | SELECT pr.doc_a, pr.doc_b, CAST(count(*) AS BIGINT) AS inter
        | FROM pr JOIN post a ON a.doc_id = pr.doc_a
        |         JOIN post b ON b.doc_id = pr.doc_b AND b.g = a.g
        | GROUP BY 1, 2)
        |SELECT pr.doc_a, pr.doc_b, pr.hamming,
        | coalesce(iv.inter, 0) AS inter,
        | (1000000 * coalesce(iv.inter, 0))
        |   // (na.n + nb.n - coalesce(iv.inter, 0)) AS jacc_micro,
        | pr.hamming <= 1 AND (1000000 * coalesce(iv.inter, 0))
        |   // (na.n + nb.n - coalesce(iv.inter, 0)) >= 200000 AS joint_dup
        |FROM pr
        |LEFT JOIN iv ON iv.doc_a = pr.doc_a AND iv.doc_b = pr.doc_b
        |JOIN n na ON na.doc_id = pr.doc_a
        |JOIN n nb ON nb.doc_id = pr.doc_b""".stripMargin,
    "mm_txt_curation" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        |lum AS (
        | SELECT doc_id, CAST(sum(v) AS BIGINT) AS sum_luma
        | FROM px GROUP BY 1)
        |SELECT l.sum_luma * 2 < 255 * 64 AS img_dark,
        | d.n_chars < 200 AS txt_short,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
        | CAST(sum(l.sum_luma) AS BIGINT) AS sum_luma,
        | min(d.doc_id) AS min_doc
        |FROM lum l JOIN documents d USING (doc_id)
        |GROUP BY 1, 2""".stripMargin,
    "mm_img_ahash_clusters" ->
      """WITH RECURSIVE px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS i) i),
        |s AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS s
        |      FROM px GROUP BY 1),
        |hx AS (
        | SELECT px.doc_id,
        |  CAST(sum(CASE WHEN px.v * 63 > s.s
        |    THEN (CAST(1 AS BIGINT) << px.i) ELSE 0 END) AS BIGINT) AS ahash
        | FROM px JOIN s USING (doc_id) GROUP BY 1),
        |grp AS (
        | SELECT ahash, CAST(count(*) AS BIGINT) AS n_imgs FROM hx GROUP BY 1),
        |banded AS (
        | SELECT ahash, b.band, (ahash >> (b.band*16)) & 65535 AS band_val
        | FROM grp CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
        |pairs AS (
        | SELECT DISTINCT a.ahash AS ha, b.ahash AS hb
        | FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.band_val = b.band_val AND a.ahash < b.ahash
        | WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
        |edges AS (
        | SELECT ha AS src, hb AS dst FROM pairs
        | UNION SELECT hb, ha FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS ahash, least(src, min(dst)) AS label
        | FROM reach GROUP BY src)
        |SELECT label AS cluster_id, CAST(count(*) AS BIGINT) AS n_hashes,
        | CAST(sum(g.n_imgs) AS BIGINT) AS n_imgs,
        | max(lab.ahash) AS max_hash
        |FROM lab JOIN grp g USING (ahash)
        |GROUP BY label""".stripMargin,
    "mm_img_downsample" ->
      """WITH px AS (
        | SELECT d.doc_id, i.i,
        |  CASE WHEN i.i < d.doc_id % 3
        |   THEN (('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT + 128) % 256
        |   ELSE ('0x' || substr(md5(CAST(d.doc_id // 3 AS VARCHAR) || ':' ||
        |      CAST(i.i AS VARCHAR)), 1, 2))::BIGINT
        |  END AS v
        | FROM (SELECT doc_id FROM documents) d
        | CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
        |o AS (SELECT a.x, b.y
        |      FROM (SELECT unnest(generate_series(0, 3)) AS x) a
        |      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS y) b),
        |m AS (
        | SELECT p1.doc_id, o.x, o.y,
        |  (p1.v + p2.v + p3.v + p4.v) // 4 AS m
        | FROM o
        | JOIN px p1 ON p1.i = (2*o.y)*8 + 2*o.x
        | JOIN px p2 ON p2.doc_id = p1.doc_id AND p2.i = (2*o.y)*8 + 2*o.x + 1
        | JOIN px p3 ON p3.doc_id = p1.doc_id AND p3.i = (2*o.y+1)*8 + 2*o.x
        | JOIN px p4 ON p4.doc_id = p1.doc_id AND p4.i = (2*o.y+1)*8 + 2*o.x + 1)
        |SELECT doc_id, CAST(4 AS BIGINT) AS out_width,
        | CAST(4 AS BIGINT) AS out_height,
        | CAST(sum((y*4 + x + 1) * m) AS BIGINT) AS checksum
        |FROM m GROUP BY 1""".stripMargin,
    "mm_frame_dedup" ->
      """WITH fr AS (
        | SELECT doc_id, md5(substr(text, CAST(i*64+1 AS BIGINT), 64)) AS frame_md5
        | FROM (SELECT doc_id, text,
        |   unnest(generate_series(0,
        |     CAST(ceil(octet_length(encode(text))/64.0) AS BIGINT)-1, 4)) AS i
        |  FROM documents) t)
        |SELECT frame_md5, CAST(count(*) AS BIGINT) AS n_frames,
        | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_videos,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM fr GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "sim_mrl_rerank" ->
      """WITH n AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  (embedding[1:8])::DOUBLE[] AS pvec
        | FROM embeddings),
        |q AS (SELECT vec_id AS query_id, vec AS qvec, pvec AS qpvec
        |      FROM n WHERE vec_id < 8),
        |c AS (
        | SELECT query_id, n.vec_id,
        |  round(list_dot_product(n.pvec, q.qpvec)
        |    / (sqrt(list_dot_product(n.pvec, n.pvec))
        |       * sqrt(list_dot_product(q.qpvec, q.qpvec))), 6) AS coarse6,
        |  round(list_dot_product(n.vec, q.qvec)
        |    / (sqrt(list_dot_product(n.vec, n.vec))
        |       * sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS cos6
        | FROM n, q WHERE n.vec_id != q.query_id),
        |s AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY coarse6 DESC, vec_id) AS crnk FROM c)
        |SELECT query_id, vec_id AS neighbor_id, coarse6, cos6,
        | CAST(row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos6 DESC, vec_id) AS BIGINT) AS rnk
        |FROM s WHERE crnk <= 20 QUALIFY rnk <= 5""".stripMargin,
    // SemDeDup keep-list: same pair predicate as dedup_semantic, then a
    // recursive-CTE transitive closure (dedup_clusters' pattern) and a
    // min-label per component joined back to the corpus
    "dedup_semantic_apply" ->
      s"""${KmeansCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm
        |        FROM af JOIN w USING (vec_id)),
        |pairs AS (
        | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        | FROM idx a JOIN idx b ON a.cid = b.cid AND a.vec_id < b.vec_id
        | WHERE round(list_dot_product(a.vec, b.vec)/(a.nrm*b.nrm), 6) >= 0.35),
        |edges AS (
        | SELECT vec_a AS src, vec_b AS dst FROM pairs
        | UNION SELECT vec_b, vec_a FROM pairs),
        |reach AS (
        | SELECT src, dst FROM edges
        | UNION
        | SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (
        | SELECT src AS vec_id, least(src, min(dst)) AS label
        | FROM reach GROUP BY src)
        |SELECT e.vec_id,
        | coalesce(l.label, e.vec_id) AS cluster_id,
        | (l.label IS NULL OR l.label = e.vec_id) AS keep
        |FROM embeddings e LEFT JOIN lab l USING (vec_id)""".stripMargin,
    "dedup_semantic" ->
      s"""$KmeansCtes,
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm
        |        FROM af JOIN w USING (vec_id))
        |SELECT vec_a, vec_b, cid, cosine FROM (
        | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cid,
        |  round(list_dot_product(a.vec, b.vec)/(a.nrm*b.nrm), 6) AS cosine
        | FROM idx a JOIN idx b ON a.cid = b.cid AND a.vec_id < b.vec_id) p
        |WHERE cosine >= 0.35""".stripMargin,
    "tel_twap" ->
      """WITH e AS (
        | SELECT event_type, CAST(ts AS DATE) AS day, epoch_us(ts) AS us,
        |  CAST(round(value * 100) AS BIGINT) AS v100, event_id
        | FROM events),
        |l AS (
        | SELECT event_type, day, us, v100,
        |  lead(us) OVER (PARTITION BY event_type, day
        |    ORDER BY us, event_id) AS next_us
        | FROM e)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        | CAST(CAST(sum(v100 * (next_us - us)) AS BIGINT) AS DOUBLE)
        |   / CAST(CAST(sum(next_us - us) AS BIGINT) * 100 AS DOUBLE) AS twap,
        | CAST(sum(next_us - us) AS BIGINT) AS held_us,
        | CAST(count(*) AS BIGINT) AS n_intervals
        |FROM l WHERE next_us IS NOT NULL
        |GROUP BY event_type, day""".stripMargin,
    "text_tfidf" ->
      """WITH t AS (
        | SELECT doc_id,
        |  unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        | FROM documents),
        |tf AS (
        | SELECT doc_id, term, count(*) AS cnt,
        |  sum(count(*)) OVER (PARTITION BY doc_id) AS doc_len
        | FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        | SELECT tf.doc_id, tf.term, tf.cnt, df.df,
        |  round((CAST(tf.cnt AS DOUBLE) / CAST(tf.doc_len AS DOUBLE))
        |   * round(ln(CAST(n.n_docs AS DOUBLE) / df.df), 4), 6) AS score
        | FROM tf JOIN df USING (term), n
        | WHERE tf.doc_id < 20)
        |SELECT doc_id, term, CAST(cnt AS BIGINT) AS cnt,
        | CAST(df AS BIGINT) AS df, score,
        | CAST(row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score DESC, term) AS BIGINT) AS rnk
        |FROM s QUALIFY rnk <= 5""".stripMargin,
    "text_line_dedup" ->
      """WITH c AS (
        | SELECT doc_id, md5(substr(text, CAST(i*80+1 AS BIGINT), 80)) AS chunk_md5
        | FROM (SELECT doc_id, text,
        |   unnest(range(0, ((length(text)-1)//80)+1)) AS i
        |  FROM documents WHERE length(text) > 0) t),
        |d AS (
        | SELECT chunk_md5 FROM c GROUP BY 1
        | HAVING count(DISTINCT doc_id) > 1)
        |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        | CAST(sum(CASE WHEN d.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_dup_chunks,
        | CAST(sum(CASE WHEN d.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END)
        |   AS DOUBLE) / count(*) AS dup_frac
        |FROM c LEFT JOIN d USING (chunk_md5)
        |GROUP BY c.doc_id""".stripMargin,
    // exact LTTB replica: the selection is sequential per (series, day),
    // so the oracle folds over the 8 middle buckets with a recursive CTE
    // carrying (previous pick, selected list); all-integer areas and
    // first-position argmax reproduce the Scala kernel bit-for-bit
    "tel_lttb" ->
      """WITH RECURSIVE pts AS (
        | SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  (epoch_us(ts) // 1000000) % 86400 AS xs,
        |  CAST(round(value * 100) AS BIGINT) AS v100, event_id
        | FROM events),
        |grp AS (
        | SELECT event_type, day,
        |  list(struct_pack(x := xs, v := v100) ORDER BY xs, event_id) AS p,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM pts GROUP BY 1, 2),
        |iter AS (
        | SELECT event_type, day, p, n, 0 AS b, [p[1]] AS sel
        | FROM grp WHERE n > 10
        | UNION ALL
        | SELECT event_type, day, p, n, b + 1 AS b,
        |  CASE WHEN lo0 >= hi0 THEN sel
        |   ELSE list_append(sel,
        |     cand[list_position(areas, list_max(areas))]) END AS sel
        | FROM (
        |  SELECT event_type, day, p, n, b, sel, lo0, hi0, cand,
        |   list_transform(cand, q -> abs(
        |     (prev.x * m - sx) * (q.v - prev.v)
        |       - (prev.x - q.x) * (sy - m * prev.v))) AS areas
        |  FROM (
        |   SELECT *,
        |    sel[len(sel)] AS prev,
        |    list_slice(p, lo0 + 1, hi0) AS cand,
        |    CAST(nhi0 - nlo0 AS BIGINT) AS m,
        |    CAST(coalesce(list_sum(list_transform(
        |      list_slice(p, nlo0 + 1, nhi0), q -> q.x)), 0) AS BIGINT) AS sx,
        |    CAST(coalesce(list_sum(list_transform(
        |      list_slice(p, nlo0 + 1, nhi0), q -> q.v)), 0) AS BIGINT) AS sy
        |   FROM (
        |    SELECT *,
        |     1 + ((n - 2) * b) // 8 AS lo0,
        |     least(1 + ((n - 2) * (b + 1)) // 8, n - 1) AS hi0,
        |     CASE WHEN b + 1 < 8 THEN 1 + ((n - 2) * (b + 1)) // 8
        |      ELSE n - 1 END AS nlo0,
        |     CASE WHEN b + 1 < 8 THEN least(1 + ((n - 2) * (b + 2)) // 8, n - 1)
        |      ELSE n END AS nhi0
        |    FROM iter WHERE b < 8))) ),
        |final AS (
        | SELECT event_type, day, list_append(sel, p[n]) AS sel
        | FROM iter WHERE b = 8
        | UNION ALL
        | SELECT event_type, day, p AS sel FROM grp WHERE n <= 10)
        |SELECT event_type, day, u.x AS x_sec, u.v AS v100
        |FROM (SELECT event_type, day, unnest(sel) AS u FROM final)""".stripMargin,
    "tel_m4_downsample" ->
      """WITH e AS (
        | SELECT event_type, date_trunc('hour', ts) AS bucket,
        |  epoch_us(ts) AS us,
        |  CAST(round(value * 100) AS BIGINT) AS v100, event_id
        | FROM events),
        |r AS (
        | SELECT event_type, bucket, us, v100,
        |  row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY us, event_id) AS rf,
        |  row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY us DESC, event_id) AS rl,
        |  row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY v100, us, event_id) AS rmin,
        |  row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY v100 DESC, us, event_id) AS rmax,
        |  count(*) OVER (PARTITION BY event_type, bucket) AS n
        | FROM e)
        |SELECT event_type, strftime(bucket, '%Y-%m-%d %H:00') AS bucket,
        | CAST(max(n) AS BIGINT) AS n_samples,
        | max(CASE WHEN rf = 1 THEN v100 END) AS first_v,
        | max(CASE WHEN rl = 1 THEN v100 END) AS last_v,
        | max(CASE WHEN rmin = 1 THEN v100 END) AS min_v,
        | max(CASE WHEN rmax = 1 THEN v100 END) AS max_v,
        | max(CASE WHEN rmin = 1 THEN us END) AS min_ts_us,
        | max(CASE WHEN rmax = 1 THEN us END) AS max_ts_us
        |FROM r GROUP BY event_type, bucket""".stripMargin,
    "mm_scene_cuts" ->
      """WITH fr AS (
        | SELECT doc_id, i AS frame_idx,
        |  md5(substr(text, CAST(i*64+1 AS BIGINT), 64)) AS frame_md5
        | FROM (SELECT doc_id, text,
        |   unnest(generate_series(0,
        |     CAST(ceil(octet_length(encode(text))/64.0) AS BIGINT)-1, 4)) AS i
        |  FROM documents) t),
        |l AS (
        | SELECT doc_id, frame_idx,
        |  lag(frame_md5) OVER (PARTITION BY doc_id ORDER BY frame_idx)
        |    AS prev_md5,
        |  frame_md5
        | FROM fr)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        | CAST(sum(CASE WHEN prev_md5 IS NOT NULL AND prev_md5 <> frame_md5
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
        | min(CASE WHEN prev_md5 IS NOT NULL AND prev_md5 <> frame_md5
        |   THEN frame_idx END) AS first_cut_idx
        |FROM l GROUP BY doc_id""".stripMargin,
    "q_percentile_disc" ->
      """WITH r AS (
        | SELECT o_orderpriority AS pri, o_totalprice AS price,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) AS n
        | FROM orders)
        |SELECT pri, CAST(max(n) AS BIGINT) AS n,
        | max(CASE WHEN rn = CAST(ceil(0.25*n) AS BIGINT) THEN price END)
        |   AS p25_disc,
        | max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT) THEN price END)
        |   AS p50_disc,
        | max(CASE WHEN rn = CAST(ceil(0.75*n) AS BIGINT) THEN price END)
        |   AS p75_disc
        |FROM r GROUP BY pri""".stripMargin,
    "sim_nsw_ann" -> NswAnnOracle,
    // the persisted-index probe returns the identical deterministic
    // result — the stored parquet index IS the inline build's output
    "sim_nsw_persisted" -> NswAnnOracle,
    "sim_hnsw_ann" -> HnswAnnOracle,
    "sim_nsw_recall" -> NswRecallOracle,
    "sim_hnsw_recall" -> HnswRecallOracle,
    "sim_hnsw_ef_sweep" -> HnswEfSweepOracle,
    "sim_knn_graph" ->
      s"""$KmeansCtes,
        |w AS (
        | SELECT vec_id, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm
        |        FROM af JOIN w USING (vec_id)),
        |p AS (
        | SELECT a.vec_id, b.vec_id AS neighbor_id,
        |  round(list_dot_product(a.vec, b.vec)/(a.nrm*b.nrm), 6) AS cosine
        | FROM idx a JOIN idx b ON a.cid = b.cid AND a.vec_id != b.vec_id)
        |SELECT vec_id, neighbor_id, cosine, rnk FROM (
        | SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
        |   ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
        | FROM p) t WHERE rnk <= 3""".stripMargin,
    "tel_capacity_forecast" ->
      """WITH daily AS (
        | SELECT event_type,
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
        |  count(*) AS y
        | FROM events GROUP BY 1, 2),
        |m AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy,
        |  CAST(max(x) AS BIGINT) AS xmax
        | FROM daily GROUP BY 1),
        |s AS (
        | SELECT *, CAST(n_days*sxy - sx*sy AS DOUBLE)
        |   / nullif(CAST(n_days*sxx - sx*sx AS DOUBLE), 0.0) AS slope
        | FROM m),
        |i AS (
        | SELECT *, (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |   / CAST(n_days AS DOUBLE) AS intercept
        | FROM s)
        |SELECT event_type, n_days, slope, intercept, xmax,
        | intercept + slope * CAST(xmax + 30 AS DOUBLE) AS projected
        |FROM i""".stripMargin,
    "tel_downtime" ->
      """WITH hourly AS (
        | SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
        |  count(*) AS n,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
        | FROM events GROUP BY 1),
        |bad AS (SELECT * FROM hourly WHERE errs * 4 > n * 1),
        |r AS (
        | SELECT h, errs, h - row_number() OVER (ORDER BY h) AS anchor
        | FROM bad)
        |SELECT strftime(to_timestamp(min(h) * 3600), '%Y-%m-%d %H:00')
        |   AS episode_start,
        | CAST(count(*) AS BIGINT) AS bad_hours,
        | CAST(sum(errs) AS BIGINT) AS n_errors
        |FROM r GROUP BY anchor""".stripMargin,
    "text_langid_eval" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |scores AS (
        | SELECT doc_id, 'de' AS lang_code, len(list_filter(t,
        |   x -> x IN ('der','die','und','das','ist','nicht','ein','mit'))) AS score FROM toks
        | UNION ALL SELECT doc_id, 'en', len(list_filter(t,
        |   x -> x IN ('the','and','of','to','is','in','that','for'))) FROM toks
        | UNION ALL SELECT doc_id, 'es', len(list_filter(t,
        |   x -> x IN ('el','la','de','que','y','en','los','una'))) FROM toks
        | UNION ALL SELECT doc_id, 'fr', len(list_filter(t,
        |   x -> x IN ('le','la','de','et','les','des','un','une'))) FROM toks),
        |r AS (
        | SELECT doc_id, lang_code, score, row_number() OVER (
        |   PARTITION BY doc_id ORDER BY score DESC, lang_code DESC) AS rn
        | FROM scores),
        |p AS (SELECT doc_id, lang_code AS pred_lang FROM r WHERE rn = 1),
        |c AS (
        | SELECT d.lang AS true_lang, p.pred_lang, count(*) AS n
        | FROM p JOIN documents d USING (doc_id) GROUP BY 1, 2)
        |SELECT true_lang, pred_lang, CAST(n AS BIGINT) AS n,
        | CAST(sum(n) OVER (PARTITION BY true_lang) AS BIGINT) AS row_total,
        | CAST(n AS DOUBLE)
        |  / CAST(CAST(sum(n) OVER (PARTITION BY true_lang) AS BIGINT) AS DOUBLE)
        |  AS frac
        |FROM c""".stripMargin,
    "q_width_bucket" ->
      """WITH bnd AS (
        | SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        | FROM lineitem)
        |SELECT CAST(coalesce(least(floor((l_extendedprice - lo)
        |     / nullif((hi - lo) / 10, 0.0)), 9), 0) AS BIGINT) AS b,
        | CAST(count(*) AS BIGINT) AS n,
        | min(l_extendedprice) AS bucket_min,
        | max(l_extendedprice) AS bucket_max
        |FROM lineitem, bnd GROUP BY 1""".stripMargin,
    "text_ngram_novelty" ->
      """WITH toks AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
        | FROM documents),
        |sh AS (
        | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
        |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
        |   ELSE [array_to_string(t,' ')] END) AS s
        | FROM toks),
        |post AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |f AS (SELECT shingle, min(doc_id) AS first_doc FROM post GROUP BY 1)
        |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        | CAST(sum(CASE WHEN p.doc_id = f.first_doc THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_novel,
        | CAST(CAST(sum(CASE WHEN p.doc_id = f.first_doc THEN 1 ELSE 0 END)
        |   AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
        |FROM post p JOIN f USING (shingle) GROUP BY 1""".stripMargin,
    "dedup_threshold_sweep" ->
      """WITH n AS (
        | SELECT vec_id, label, embedding::DOUBLE[] AS vec,
        |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |p AS (
        | SELECT round(list_dot_product(a.vec, b.vec)/(a.nrm*b.nrm), 6) AS cos6
        | FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id),
        |bins AS (
        | SELECT greatest(least(CAST(floor(cos6 * 10) AS BIGINT), 10), -10)
        |   AS bin, count(*) AS n_pairs
        | FROM p GROUP BY 1)
        |SELECT CAST(bin AS DOUBLE) / 10.0 AS tau,
        | CAST(n_pairs AS BIGINT) AS n_pairs,
        | CAST(sum(n_pairs) OVER (ORDER BY bin DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS pairs_at_or_above
        |FROM bins""".stripMargin,
    // Kneser-Ney: absolute discounting + continuation probabilities,
    // every model stat an integer count off the bigram TYPE table;
    // identical ln/round/micro-quantize op order on both engines
    "text_kn_perplexity" ->
      """WITH d AS (
        | SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        | FROM documents),
        |bi AS (
        | SELECT doc_id, toks[i - 1] AS w1, toks[i] AS w2
        | FROM (SELECT doc_id, toks,
        |        unnest(generate_series(2, len(toks))) AS i
        |       FROM d) t),
        |cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
        |hist AS (
        | SELECT w1, CAST(sum(cb) AS BIGINT) AS c1, count(*) AS n1f
        | FROM cb GROUP BY 1),
        |cont AS (SELECT w2, count(*) AS n1b FROM cb GROUP BY 1),
        |types AS (SELECT count(*) AS t_types FROM cb),
        |st AS (
        | SELECT cb.w1, cb.w2,
        |  CAST(round(1e6 * round(-ln(
        |    greatest(cb.cb - 0.75, 0.0) / hist.c1 +
        |    (0.75 * hist.n1f / hist.c1) * (cont.n1b / types.t_types))
        |   / ln(2.0), 4)) AS BIGINT) AS s_micro
        | FROM cb
        |  JOIN hist ON hist.w1 = cb.w1
        |  JOIN cont ON cont.w2 = cb.w2
        |  CROSS JOIN types)
        |SELECT bi.doc_id,
        | CAST(count(*) AS BIGINT) AS n_bigrams,
        | CAST(sum(st.s_micro) AS BIGINT) AS sum_s_micro,
        | CAST(CAST(sum(st.s_micro) AS BIGINT) // count(*) AS DOUBLE)
        |   / 1e6 AS mean_bits
        |FROM bi JOIN st USING (w1, w2)
        |GROUP BY 1""".stripMargin,
    // ---- r10 TPC-H completion pack ----
    "q2_min_cost_supp" ->
      """WITH ps AS (
        | SELECT l_partkey, l_suppkey,
        |  min(l_extendedprice / l_quantity) AS supplycost
        | FROM lineitem GROUP BY 1, 2),
        |cand AS (
        | SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
        |  ps.supplycost, s.s_acctbal,
        |  min(ps.supplycost) OVER (PARTITION BY p.p_partkey) AS min_cost
        | FROM ps
        |  JOIN part p ON ps.l_partkey = p.p_partkey
        |  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        | WHERE p.p_type = 'LARGE' AND p.p_size <= 5 AND r.r_name = 'EUROPE')
        |SELECT p_partkey, p_name, s_name, n_name,
        | round(supplycost, 4) AS supplycost, round(s_acctbal, 4) AS s_acctbal
        |FROM cand WHERE supplycost = min_cost""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        | round(CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 1e4,
        |   4) AS volume,
        | count(*) AS n_lines
        |FROM lineitem l
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        | round(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
        |    THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l.l_discount*100) AS BIGINT))
        |    ELSE 0 END) AS DOUBLE)
        |  / sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l.l_discount*100) AS BIGINT))), 4)
        |   AS mkt_share,
        | round(CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 1e4,
        |   4) AS total_volume
        |FROM lineitem l
        | JOIN part p ON l.l_partkey = p.p_partkey
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |WHERE p.p_type = 'PROMO'
        |  AND EXISTS (
        |   SELECT 1 FROM customer c
        |    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |    JOIN region r ON cn.n_regionkey = r.r_regionkey
        |   WHERE c.c_custkey = o.o_custkey AND r.r_name = 'ASIA')
        |GROUP BY 1""".stripMargin,
    "q10_returned_items" ->
      """WITH agg AS (
        | SELECT o.o_custkey,
        |  sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS rev_u,
        |  count(*) AS n_lines
        | FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        | WHERE l.l_returnflag = 'R'
        |   AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |   AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        | GROUP BY 1)
        |SELECT c.c_custkey, c.c_name, n.n_name,
        | round(CAST(rev_u AS DOUBLE) / 1e4, 4) AS revenue,
        | round(c.c_acctbal, 4) AS c_acctbal, n_lines
        |FROM agg
        | JOIN customer c ON agg.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY rev_u DESC, c.c_custkey ASC LIMIT 20""".stripMargin,
    "q11_important_stock" ->
      """WITH per_part AS (
        | SELECT l.l_partkey,
        |  sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS value_c
        | FROM lineitem l
        | WHERE EXISTS (
        |  SELECT 1 FROM supplier s
        |   JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE s.s_suppkey = l.l_suppkey AND n.n_name = 'NATION_7')
        | GROUP BY 1),
        |tot AS (SELECT sum(value_c) AS total_c FROM per_part)
        |SELECT l_partkey,
        | round(CAST(value_c AS DOUBLE) / 100, 4) AS value,
        | round(CAST(value_c AS DOUBLE) / total_c, 6) AS share
        |FROM per_part, tot
        |WHERE value_c * 1000 > total_c""".stripMargin,
    "q12_ship_delay" ->
      """SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
        |   THEN '0-30d'
        |  WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90
        |   THEN '31-90d'
        |  ELSE '90d+' END AS bucket,
        | CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
        | count(*) AS n_lines
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
    "q13_order_count_dist" ->
      """WITH per_cust AS (
        | SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        | FROM customer c
        |  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
        |             WHERE o_orderpriority <> '1-URGENT') o
        |   ON c.c_custkey = o.o_custkey
        | GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM per_cust GROUP BY 1""".stripMargin,
    "q14_promo_share" ->
      """SELECT strftime(l.l_shipdate, '%Y-%m') AS month,
        | round(sum(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l.l_discount*100) AS BIGINT))
        |    ELSE 0 END) * 100.0
        |  / sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l.l_discount*100) AS BIGINT))), 4)
        |   AS promo_share,
        | round(CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 1e4,
        |   4) AS total_revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q15_top_supplier" ->
      """WITH per_supp AS (
        | SELECT l_suppkey,
        |  sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev_u
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate <  TIMESTAMP '1996-04-01'
        | GROUP BY 1),
        |best AS (SELECT max(rev_u) AS max_u FROM per_supp)
        |SELECT s.s_suppkey, s.s_name,
        | round(CAST(rev_u AS DOUBLE) / 1e4, 4) AS total_revenue
        |FROM per_supp
        | JOIN supplier s ON per_supp.l_suppkey = s.s_suppkey
        | CROSS JOIN best
        |WHERE rev_u = max_u""".stripMargin,
    "q16_supp_part_cnt" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        | count(DISTINCT ps.l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        | JOIN part p ON ps.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND ps.l_suppkey NOT IN (
        |   SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q17_small_qty" ->
      """WITH li AS (
        | SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        | FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        | WHERE p.p_brand = 'Brand#3'),
        |avgq AS (
        | SELECT l_partkey,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty
        | FROM li GROUP BY 1)
        |SELECT round(CAST(sum(CAST(round(li.l_extendedprice*100) AS BIGINT))
        |   AS DOUBLE) / 100 / 7.0, 4) AS avg_yearly,
        | count(*) AS n_lines
        |FROM li JOIN avgq ON li.l_partkey = avgq.l_partkey
        |WHERE li.l_quantity < avgq.avg_qty * 0.2""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        | SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        | FROM lineitem GROUP BY 1
        | HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        | strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | round(o.o_totalprice, 4) AS o_totalprice, big.sum_qty
        |FROM orders o
        | JOIN big ON o.o_orderkey = big.l_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 100""".stripMargin,
    "q19_disjunct" ->
      """SELECT round(CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
        |   * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 1e4,
        |   4) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_part_promo_supp" ->
      """WITH ps AS (
        | SELECT l.l_partkey, l.l_suppkey,
        |  sum(CAST(l.l_quantity AS BIGINT)) AS q_ps
        | FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        | WHERE p.p_name LIKE 'small%'
        |   AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        | GROUP BY 1, 2),
        |marked AS (
        | SELECT l_suppkey, q_ps,
        |  sum(q_ps) OVER (PARTITION BY l_partkey) AS q_total,
        |  count(*) OVER (PARTITION BY l_partkey) AS n_supp
        | FROM ps)
        |SELECT s.s_name, n.n_name, round(s.s_acctbal, 4) AS s_acctbal
        |FROM supplier s
        | JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE s.s_suppkey IN (
        | SELECT l_suppkey FROM marked WHERE q_ps * 2 * n_supp > q_total)""".stripMargin,
    "q21_waiting_supp" ->
      """WITH onf AS (
        | SELECT l.l_orderkey, l.l_suppkey,
        |  l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
        | FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        | WHERE o.o_orderstatus = 'F'),
        |pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM onf),
        |late_pairs AS (
        | SELECT DISTINCT l_orderkey, l_suppkey FROM onf WHERE late)
        |SELECT s.s_name, count(*) AS numwait
        |FROM late_pairs lp
        | JOIN supplier s ON lp.l_suppkey = s.s_suppkey
        |WHERE EXISTS (
        |  SELECT 1 FROM pairs p
        |  WHERE p.l_orderkey = lp.l_orderkey AND p.l_suppkey <> lp.l_suppkey)
        | AND NOT EXISTS (
        |  SELECT 1 FROM late_pairs lp2
        |  WHERE lp2.l_orderkey = lp.l_orderkey
        |    AND lp2.l_suppkey <> lp.l_suppkey)
        |GROUP BY 1
        |ORDER BY numwait DESC, s.s_name ASC LIMIT 20""".stripMargin,
    "q22_dormant_custs" ->
      """WITH avg_pos AS (
        | SELECT sum(CAST(round(c_acctbal*100) AS BIGINT)) AS total_c,
        |  count(*) AS n_pos
        | FROM customer WHERE c_acctbal > 0)
        |SELECT n.n_name, count(*) AS numcust,
        | round(CAST(sum(CAST(round(c.c_acctbal*100) AS BIGINT)) AS DOUBLE)
        |   / 100, 4) AS totacctbal
        |FROM customer c
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | CROSS JOIN avg_pos
        |WHERE c.c_nationkey IN (1, 5, 9, 13, 17, 21)
        |  AND CAST(round(c.c_acctbal*100) AS BIGINT) * n_pos > total_c
        |  AND NOT EXISTS (
        |   SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY 1""".stripMargin,
  )

  /** One logical op, two physical strategies (inverted-index join at
    * t=0.2 mining, prefix-filtered ssjoin at t=0.5 dup detection) —
    * each hash-matches this oracle at its own threshold. */
  private def ngramJaccardOracle(t: String): String =
    """WITH toks AS (
      | SELECT doc_id, string_split_regex(trim(lower(text)),'\s+') AS t
      | FROM documents),
      |sh AS (
      | SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
      |   THEN [array_to_string(t[i:i+2],' ') for i in generate_series(1,len(t)-2)]
      |   ELSE [array_to_string(t,' ')] END) AS s
      | FROM toks),
      |post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
      |pairs AS (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
      |  count(*) AS inter
      | FROM post a JOIN post b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      | GROUP BY 1,2,3,4)
      |SELECT doc_a, doc_b, inter, jaccard FROM (
      | SELECT doc_a, doc_b, inter,
      |  CAST(round(CAST(CAST(inter*1.0/(na+nb-inter) AS VARCHAR) AS DECIMAL(38,18)),4) AS DOUBLE) AS jaccard
      | FROM pairs) p
      |WHERE jaccard >= TTT""".stripMargin.replace("TTT", t)

  /** The shared PQ/ADC oracle pipeline (tr → sc → codes → lut → adc →
    * top-5), parameterized only by the `v(vec_id, e)` CTE that feeds it
    * — identical for raw ([[oracleSql]] sim_pq_ann) and Householder-
    * rotated (sim_opq_ann) inputs. */
  /** The PQ/ADC CTE chain through ranked results `r` — shared by the
    * ANN oracles (via [[PqOracleTail]]) and the sim_pq_recall
    * composition. */
  private lazy val PqCtes: String =
    """tr AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
      |sc AS (
      | SELECT v.vec_id, tr.cid, sp.s,
      |  list_reduce([0.0] || [ (v.e[i]-tr.ce[i])*(v.e[i]-tr.ce[i])
      |    for i in generate_series(sp.s*16+1, sp.s*16+16) ],
      |    (x,y) -> x+y) AS dist
      | FROM v, tr, (SELECT unnest(generate_series(0,3)) AS s) sp
      | WHERE v.vec_id >= 8),
      |codes AS (
      | SELECT vec_id, s, cid AS code FROM (
      |  SELECT vec_id, s, cid,
      |   row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rn
      |  FROM sc) t WHERE rn = 1),
      |lut AS (SELECT vec_id AS query_id, s, cid AS code, dist AS qdist
      |        FROM sc WHERE vec_id < 16),
      |adc AS (
      | SELECT l.query_id, c.vec_id,
      |  sum(CASE WHEN c.s=0 THEN l.qdist ELSE 0.0 END) AS d0,
      |  sum(CASE WHEN c.s=1 THEN l.qdist ELSE 0.0 END) AS d1,
      |  sum(CASE WHEN c.s=2 THEN l.qdist ELSE 0.0 END) AS d2,
      |  sum(CASE WHEN c.s=3 THEN l.qdist ELSE 0.0 END) AS d3
      | FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
      |  AND c.vec_id != l.query_id
      | GROUP BY 1,2),
      |r AS (
      | SELECT query_id, vec_id AS neighbor_id,
      |  CAST(round(CAST(CAST(d0+d1+d2+d3 AS VARCHAR) AS DECIMAL(38,18)),6) AS DOUBLE) AS adist,
      |  row_number() OVER (PARTITION BY query_id
      |    ORDER BY d0+d1+d2+d3, vec_id) AS rnk
      | FROM adc)""".stripMargin

  private lazy val PqOracleTail: String = PqCtes +
    "\nSELECT query_id, neighbor_id, adist, rnk FROM r WHERE rnk <= 5"

  /** Two unrolled Lloyd iterations over integer-quantized embeddings —
    * the SQL mirror of [[graft.llm.SimOps.trainCentroids]] (iters=2,
    * dim=64, K auto-derived as max(4, ceil(N/64)) exactly like
    * [[graft.llm.SimOps.autoK]]). Exact BIGINT cluster sums, exact IEEE
    * mean division, fixed-dim-order list_reduce distance folds: every
    * value matches the Spark side bit-for-bit. `af` = final
    * assignment. */
  /** [[KmeansCtes]] with TRAINING restricted to the base cohort
    * (vec_id < ⌊7N/8⌋) while `af` assigns the WHOLE corpus to the
    * frozen c2 centroids — the incremental-append replica: the index
    * was trained before the last ⅛ of the corpus arrived. */
  private lazy val KmeansBaseCtes: String =
    """WITH v AS (
      | SELECT vec_id,
      |  list_transform(embedding::DOUBLE[],
      |                 x -> CAST(round(x*1000000) AS BIGINT)) AS vq
      | FROM embeddings),
      |sp AS (SELECT CAST((7*count(*))//8 AS BIGINT) AS at FROM v),
      |b AS (SELECT v.* FROM v, sp WHERE vec_id < sp.at),
      |kk AS (
      | SELECT greatest(4, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS k FROM b),
      |c0 AS (
      | SELECT vec_id AS cid, list_transform(vq, x -> CAST(x AS DOUBLE)) AS c
      | FROM b, kk WHERE vec_id < kk.k),
      |a1 AS (
      | SELECT vec_id, cid FROM (
      |  SELECT b.vec_id, c0.cid,
      |   row_number() OVER (PARTITION BY b.vec_id ORDER BY
      |    list_reduce(list_transform(range(1,65),
      |      i -> (vq[i]-c[i])*(vq[i]-c[i])), (a,b) -> a+b), c0.cid) AS rn
      |  FROM b, c0) WHERE rn = 1),
      |s1 AS (
      | SELECT a1.cid, r.i AS pos, CAST(sum(vq[r.i]) AS BIGINT) AS s, count(*) AS n
      | FROM a1 JOIN b USING (vec_id) CROSS JOIN range(1,65) r(i)
      | GROUP BY 1, 2),
      |c1 AS (
      | SELECT cid, list(CAST(s AS DOUBLE)/n ORDER BY pos) AS c FROM s1 GROUP BY cid),
      |a2 AS (
      | SELECT vec_id, cid FROM (
      |  SELECT b.vec_id, c1.cid,
      |   row_number() OVER (PARTITION BY b.vec_id ORDER BY
      |    list_reduce(list_transform(range(1,65),
      |      i -> (vq[i]-c[i])*(vq[i]-c[i])), (a,b) -> a+b), c1.cid) AS rn
      |  FROM b, c1) WHERE rn = 1),
      |s2 AS (
      | SELECT a2.cid, r.i AS pos, CAST(sum(vq[r.i]) AS BIGINT) AS s, count(*) AS n
      | FROM a2 JOIN b USING (vec_id) CROSS JOIN range(1,65) r(i)
      | GROUP BY 1, 2),
      |c2 AS (
      | SELECT cid, list(CAST(s AS DOUBLE)/n ORDER BY pos) AS c FROM s2 GROUP BY cid),
      |af AS (
      | SELECT vec_id, cid FROM (
      |  SELECT v.vec_id, c2.cid,
      |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |    list_reduce(list_transform(range(1,65),
      |      i -> (vq[i]-c[i])*(vq[i]-c[i])), (a,b) -> a+b), c2.cid) AS rn
      |  FROM v, c2) WHERE rn = 1)""".stripMargin

  /** sim_nsw_ann oracle: the knn-graph CTEs ([[KmeansCtes]] + the
    * sim_knn_graph edge ranking) followed by the UNROLLED beam search —
    * entries = the k-means seed rows, then `hops` rounds of
    * expand-along-edges → score → top-beam, exactly the Spark plan's
    * join chain. */
  private val NswHops = 4

  private lazy val NswAnnOracle: String =
    s"""$NswAnnCtes
       |SELECT query_id, cand AS neighbor_id, cos6 AS cosine,
       | CAST(rn AS BIGINT) AS rnk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY cos6 DESC, cand) AS rn FROM bm$NswHops) t
       |WHERE rn <= 5""".stripMargin

  /** sim_nsw_recall oracle: the beam-search CTEs + brute-force top-5 —
    * the sim_recall_at_k measurement shape for the graph family. */
  private lazy val NswRecallOracle: String =
    s"""$NswAnnCtes,
       |nsw AS (SELECT query_id, cand AS neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos6 DESC, cand) AS rn FROM bm$NswHops) t WHERE rn <= 5),
       |bp AS (
       | SELECT qq.query_id, w.vec_id AS neighbor_id,
       |  round(list_dot_product(w.vec, qq.qv)/(w.nrm*qq.qn), 6) AS cosine
       | FROM w, qq WHERE w.vec_id != qq.query_id),
       |brute AS (SELECT query_id, neighbor_id FROM (
       | SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM bp) t WHERE rnk <= 5)
       |SELECT b.query_id, CAST(count(*) AS BIGINT) AS k,
       | CAST(sum(CASE WHEN n.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT) AS hits,
       | CAST(CAST(sum(CASE WHEN n.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
       |FROM brute b LEFT JOIN nsw n USING (query_id, neighbor_id)
       |GROUP BY b.query_id""".stripMargin

  /** One score-then-keep round of the beam search, shared by the flat
    * and hierarchical oracles: scores candidate CTE `src` against the
    * queries and keeps the top `keep` per query. `pfx` disambiguates
    * the CTE names between the upper (`u`) and base (empty) legs. */
  /** Every beam CTE is AS MATERIALIZED: bm_i is referenced twice by
    * hop i+1 (edge expansion ∪ carry) and the sweep oracle fans THREE
    * chains off one shared upper beam — DuckDB's default inlining
    * re-evaluates the whole prefix per reference (exponential in
    * hops; the sweep ran >25 min), materialization makes it linear
    * like the Spark loop (the bpeOracleCtes lesson). */
  private def nswScoreRank(i: Int, src: String, keep: Int,
                           pfx: String = "", edges: String = "ee"): String =
    s"""${pfx}sc$i AS MATERIALIZED (
       | SELECT c.query_id, c.cand,
       |  round(list_dot_product(w.vec, qq.qv)/(w.nrm*qq.qn), 6) AS cos6
       | FROM $src c JOIN w ON w.vec_id = c.cand
       |   JOIN qq ON qq.query_id = c.query_id),
       |${pfx}bm$i AS MATERIALIZED (
       | SELECT query_id, cand, cos6 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos6 DESC, cand) AS rn FROM ${pfx}sc$i) t WHERE rn <= $keep)""".stripMargin

  private def nswHopCtes(hops: Int, keep: Int, pfx: String = "",
                         edges: String = "ee"): String =
    (1 to hops).map { i =>
      s"""${pfx}nb$i AS MATERIALIZED (
         | SELECT DISTINCT query_id, cand FROM (
         |  SELECT b.query_id, e.dst AS cand
         |  FROM ${pfx}bm${i - 1} b JOIN $edges e ON b.cand = e.src
         |  UNION ALL SELECT query_id, cand FROM ${pfx}bm${i - 1}) u
         | WHERE cand != query_id),
         |${nswScoreRank(i, s"${pfx}nb$i", keep, pfx, edges)}""".stripMargin
    }.mkString(",\n")

  /** The shared corpus/graph/query CTEs: kmeans assignment `af`,
    * vectors `w`, layer-0 edges `ee`, queries `qq`, per-cell entry
    * reps `en`. */
  private lazy val NswBaseCtes: String =
    s"""$KmeansCtes,
       |w AS MATERIALIZED (
       | SELECT vec_id, embedding::DOUBLE[] AS vec,
       |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       | FROM embeddings),
       |idx AS (SELECT af.vec_id, af.cid, w.vec, w.nrm
       |        FROM af JOIN w USING (vec_id)),
       |p AS (
       | SELECT a.vec_id, b.vec_id AS neighbor_id,
       |  round(list_dot_product(a.vec, b.vec)/(a.nrm*b.nrm), 6) AS cosine
       | FROM idx a JOIN idx b ON a.cid = b.cid AND a.vec_id != b.vec_id),
       |eed AS (
       | SELECT vec_id AS src, neighbor_id AS dst FROM (
       |  SELECT vec_id, neighbor_id, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cosine DESC, neighbor_id) AS rnk FROM p) t WHERE rnk <= 8),
       |ee AS MATERIALIZED (SELECT src, dst FROM eed
       |       UNION SELECT dst, src FROM eed),
       |qq AS MATERIALIZED (SELECT vec_id AS query_id, vec AS qv, nrm AS qn
       |       FROM w WHERE vec_id < 8),
       |en AS (
       | SELECT vec_id AS cand FROM (
       |  SELECT vec_id, row_number() OVER (PARTITION BY cid
       |    ORDER BY vec_id) AS rn FROM af WHERE vec_id >= 8) t
       | WHERE rn = 1)""".stripMargin

  private lazy val NswAnnCtes: String =
    s"""$NswBaseCtes,
       |nb0 AS (
       | SELECT query_id, cand FROM qq, en
       | WHERE cand != query_id),
       |${nswScoreRank(0, "nb0", 12)},
       |${nswHopCtes(NswHops, 12)}""".stripMargin

  /** sim_hnsw_ann oracle: the flat chain's corpus/graph CTEs + the
    * UPPER layer — cell-rep kNN graph (`ue`), single global entry
    * (`ge`), 2 unrolled upper hops keeping 8 — whose surviving beam
    * seeds the layer-0 chain in place of the full entry set. */
  /** The upper navigation layer alone (through `ubm2`, the surviving
    * per-query upper beam) — shared by [[HnswAnnCtes]] and the per-ef
    * arms of [[HnswEfSweepOracle]] (the upper leg is independent of
    * the base search width). */
  private lazy val HnswUpperCtes: String =
    s"""$NswBaseCtes,
       |rr AS (SELECT en.cand, w.vec, w.nrm FROM en JOIN w ON w.vec_id = en.cand),
       |up AS (
       | SELECT a.cand AS src, b.cand AS dst,
       |  round(list_dot_product(a.vec, b.vec)/(a.nrm*b.nrm), 6) AS cos6
       | FROM rr a JOIN rr b ON a.cand != b.cand),
       |ued AS (
       | SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src
       |    ORDER BY cos6 DESC, dst) AS rnk FROM up) t WHERE rnk <= 4),
       |ue AS (SELECT src, dst FROM ued UNION SELECT dst, src FROM ued),
       |ge AS (SELECT min(cand) AS cand FROM rr),
       |unb0 AS (
       | SELECT qq.query_id, ge.cand FROM qq, ge
       | WHERE ge.cand != qq.query_id),
       |${nswScoreRank(0, "unb0", 8, "u", "ue")},
       |${nswHopCtes(2, 8, "u", "ue")}""".stripMargin

  private lazy val HnswAnnCtes: String =
    s"""$HnswUpperCtes,
       |nb0 AS (SELECT query_id, cand FROM ubm2),
       |${nswScoreRank(0, "nb0", 12)},
       |${nswHopCtes(NswHops, 12)}""".stripMargin

  /** sim_hnsw_ef_sweep oracle: one unrolled layer-0 chain PER ef (the
    * upper leg `ubm2` shared), each arm's top-5 recall'd against the
    * same brute-force truth — the engine-side sweep is exactly these
    * arms over the persisted index. */
  private lazy val HnswEfSweepOracle: String = {
    val efs = Seq(4, 8, 16)
    val chains = efs.map { ef =>
      val pfx = s"e${ef}_"
      s"""${pfx}nb0 AS (SELECT query_id, cand FROM ubm2),
         |${nswScoreRank(0, s"${pfx}nb0", ef, pfx)},
         |${nswHopCtes(NswHops, ef, pfx)}""".stripMargin
    }.mkString(",\n")
    val arms = efs.map { ef =>
      val pfx = s"e${ef}_"
      s"""SELECT $ef AS ef, query_id, cand AS neighbor_id FROM (
         | SELECT *, row_number() OVER (PARTITION BY query_id
         |   ORDER BY cos6 DESC, cand) AS rn FROM ${pfx}bm$NswHops) t
         | WHERE rn <= 5""".stripMargin
    }.mkString("\n UNION ALL ")
    s"""$HnswUpperCtes,
       |$chains,
       |hns AS ($arms),
       |bp AS (
       | SELECT qq.query_id, w.vec_id AS neighbor_id,
       |  round(list_dot_product(w.vec, qq.qv)/(w.nrm*qq.qn), 6) AS cosine
       | FROM w, qq WHERE w.vec_id != qq.query_id),
       |brute AS (SELECT query_id, neighbor_id FROM (
       | SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM bp) t WHERE rnk <= 5)
       |SELECT CAST(h.ef AS BIGINT) AS ef, h.query_id,
       | CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT) AS hits,
       | CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS DOUBLE) / 5.0 AS recall
       |FROM hns h LEFT JOIN brute b USING (query_id, neighbor_id)
       |GROUP BY h.ef, h.query_id""".stripMargin
  }

  private lazy val HnswAnnOracle: String =
    s"""$HnswAnnCtes
       |SELECT query_id, cand AS neighbor_id, cos6 AS cosine,
       | CAST(rn AS BIGINT) AS rnk
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY cos6 DESC, cand) AS rn FROM bm$NswHops) t
       |WHERE rn <= 5""".stripMargin

  /** sim_hnsw_recall oracle: the hierarchical search CTEs + brute-force
    * top-5 — [[NswRecallOracle]]'s measurement shape over the
    * [[HnswAnnCtes]] chain. */
  private lazy val HnswRecallOracle: String =
    s"""$HnswAnnCtes,
       |hnsw AS (SELECT query_id, cand AS neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos6 DESC, cand) AS rn FROM bm$NswHops) t WHERE rn <= 5),
       |bp AS (
       | SELECT qq.query_id, w.vec_id AS neighbor_id,
       |  round(list_dot_product(w.vec, qq.qv)/(w.nrm*qq.qn), 6) AS cosine
       | FROM w, qq WHERE w.vec_id != qq.query_id),
       |brute AS (SELECT query_id, neighbor_id FROM (
       | SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |   ORDER BY cosine DESC, neighbor_id) AS rnk FROM bp) t WHERE rnk <= 5)
       |SELECT b.query_id, CAST(count(*) AS BIGINT) AS k,
       | CAST(sum(CASE WHEN n.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT) AS hits,
       | CAST(CAST(sum(CASE WHEN n.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |   AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
       |FROM brute b LEFT JOIN hnsw n USING (query_id, neighbor_id)
       |GROUP BY b.query_id""".stripMargin

  private lazy val KmeansCtes: String =
    """WITH v AS (
      | SELECT vec_id,
      |  list_transform(embedding::DOUBLE[],
      |                 x -> CAST(round(x*1000000) AS BIGINT)) AS vq
      | FROM embeddings),
      |kk AS (
      | SELECT greatest(4, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS k FROM v),
      |c0 AS (
      | SELECT vec_id AS cid, list_transform(vq, x -> CAST(x AS DOUBLE)) AS c
      | FROM v, kk WHERE vec_id < kk.k),
      |a1 AS (
      | SELECT vec_id, cid FROM (
      |  SELECT v.vec_id, c0.cid,
      |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |    list_reduce(list_transform(range(1,65),
      |      i -> (vq[i]-c[i])*(vq[i]-c[i])), (a,b) -> a+b), c0.cid) AS rn
      |  FROM v, c0) WHERE rn = 1),
      |s1 AS (
      | SELECT a1.cid, r.i AS pos, CAST(sum(vq[r.i]) AS BIGINT) AS s, count(*) AS n
      | FROM a1 JOIN v USING (vec_id) CROSS JOIN range(1,65) r(i)
      | GROUP BY 1, 2),
      |c1 AS (
      | SELECT cid, list(CAST(s AS DOUBLE)/n ORDER BY pos) AS c FROM s1 GROUP BY cid),
      |a2 AS (
      | SELECT vec_id, cid FROM (
      |  SELECT v.vec_id, c1.cid,
      |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |    list_reduce(list_transform(range(1,65),
      |      i -> (vq[i]-c[i])*(vq[i]-c[i])), (a,b) -> a+b), c1.cid) AS rn
      |  FROM v, c1) WHERE rn = 1),
      |s2 AS (
      | SELECT a2.cid, r.i AS pos, CAST(sum(vq[r.i]) AS BIGINT) AS s, count(*) AS n
      | FROM a2 JOIN v USING (vec_id) CROSS JOIN range(1,65) r(i)
      | GROUP BY 1, 2),
      |c2 AS (
      | SELECT cid, list(CAST(s AS DOUBLE)/n ORDER BY pos) AS c FROM s2 GROUP BY cid),
      |af AS (
      | SELECT vec_id, cid FROM (
      |  SELECT v.vec_id, c2.cid,
      |   row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |    list_reduce(list_transform(range(1,65),
      |      i -> (vq[i]-c[i])*(vq[i]-c[i])), (a,b) -> a+b), c2.cid) AS rn
      |  FROM v, c2) WHERE rn = 1)""".stripMargin
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, AsofJoin, Corpus, Dedup, DocValidation, Events, FuzzyJoin, IncrementalAgg, Multimodal, PageRank, RangeJoin, Sampling, SimHashOracle, Similarity, Skew, StorageLayout, TextAnalysis, TimeSeries, Tpch, TpchAdapted, TpchTail}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family exposes `(SparkSession, sfDir) => DataFrame`
  * entries here, each paired (where SQL-expressible) with DuckDB oracle SQL
  * over the same parquet tables. Column names and row ordering are aligned
  * between the Spark query and its oracle — the driver's compare sorts
  * columns by name and hashes values, so both must agree exactly.
  */
object SparkEntry {

  /** Flagship: TPC-H Q5-shaped 6-table star join — broadcast dims, one
    * fact-fact shuffle, partial aggregation. Representative of the plan
    * shape this engine is optimized for.
    */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q5LocalSupplier(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * LLM-pipeline extension suite (dedup / similarity / text analysis /
    * event-time windows).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference operator family (O2–O15) over the documents table ---
    "filter_incomplete"      -> (DocValidation.filterIncomplete _),
    "validate_flags"         -> (DocValidation.validateFlags _),
    "reason_histogram"       -> (DocValidation.reasonHistogram _),
    "top1_reason"            -> (DocValidation.top1Reason _),
    "completeness"           -> (DocValidation.completeness _),
    "date_range"             -> (DocValidation.dateRange _),
    "dedup_exact_keep_first" -> (DocValidation.dedupKeepFirst _),
    "clean_text"             -> (DocValidation.cleanText _),
    "parse_dates"            -> (DocValidation.parseDates _),
    "article_funnel"         -> (DocValidation.articleFunnel _),
    // --- relational/star-schema suite (joins, aggregates, top-k) ---
    "tpch_q1"        -> (Tpch.q1PricingSummary _),
    "tpch_q3"        -> (Tpch.q3ShippingPriority _),
    "tpch_q4"        -> (Tpch.q4OrderPriority _),
    "tpch_q5"        -> (Tpch.q5LocalSupplier _),
    "tpch_q6"        -> (Tpch.q6ForecastRevenue _),
    "tpch_q10"       -> (Tpch.q10ReturnedItems _),
    "tpch_q14"       -> (Tpch.q14PromoRevenue _),
    "customers_without_urgent" -> (Tpch.customersWithoutUrgent _),
    "parts_in_both_years" -> (Tpch.partsInBothYears _),
    "setop_all_shipments" -> (Tpch.setopAllShipments _),
    "suppliers_no_returns" -> (Tpch.suppliersNoReturns _),
    "fuzzy_part_pairs"   -> ((s, d) => FuzzyJoin.fuzzyPartPairs(s, d)),
    "sorted_neighborhood_pairs" -> ((s, d) => FuzzyJoin.sortedNeighborhoodPairs(s, d)),
    "fuzzy_entity_clusters" -> ((s, d) => FuzzyJoin.fuzzyEntityClusters(s, d)),
    "incremental_customer_revenue" -> (IncrementalAgg.incrementalCustomerRevenue _),
    "doc_pagerank"     -> (PageRank.docPageRank _),
    "doc_triangles"    -> (PageRank.docTriangles _),
    "doc_components"   -> (PageRank.docComponents _),
    "top_customers"  -> (Tpch.topCustomers _),
    "also_bought"    -> ((s, d) => Tpch.alsoBought(s, d)),
    "distinct_parts" -> (Tpch.distinctParts _),
    // --- decision-support tail (subquery / outer-join shapes) ---
    "tpch_q7"  -> (TpchTail.q7VolumeShipping _),
    "tpch_q8"  -> (TpchTail.q8MarketShare _),
    "tpch_q13" -> (TpchTail.q13OrderDistribution _),
    "tpch_q15" -> (TpchTail.q15TopSupplier _),
    "tpch_q17" -> (TpchTail.q17SmallQuantity _),
    "tpch_q18" -> (TpchTail.q18LargeVolume _),
    "tpch_q19" -> (TpchTail.q19DiscountedRevenue _),
    "tpch_q22" -> (TpchTail.q22SalesOpportunity _),
    // --- the partsupp/shipmode-dependent remainder, schema-adapted ---
    "tpch_q2"  -> (TpchAdapted.q2MinCostSupplier _),
    "tpch_q9"  -> (TpchAdapted.q9ProductProfit _),
    "tpch_q11" -> (TpchAdapted.q11ImportantParts _),
    "tpch_q12" -> (TpchAdapted.q12LateShipments _),
    "tpch_q16" -> (TpchAdapted.q16SupplierCounts _),
    "tpch_q20" -> (TpchAdapted.q20ShareOfPart _),
    "tpch_q21" -> (TpchAdapted.q21WaitingSupplier _),
    // --- analytic windows (running total, top-n per group, lag, ntile) ---
    "running_revenue"         -> (Analytics.runningRevenue _),
    "top_orders_per_customer" -> (Analytics.topOrdersPerCustomer _),
    "user_event_gaps"         -> (Analytics.userEventGaps _),
    "value_quartiles"         -> (Analytics.valueQuartiles _),
    "rank_family"             -> (Analytics.rankFamily _),
    "scd2_value_tiers"        -> (Analytics.scd2ValueTiers _),
    "scd2_temporal_join"      -> (Analytics.scd2TemporalJoin _),
    "rolling_revenue_7d"      -> (Analytics.rollingRevenue7d _),
    "revenue_pareto"          -> (Analytics.revenuePareto _),
    "value_quartiles_approx"  -> ((s, d) => Analytics.valueQuartilesApprox(s, d)),
    // --- event-time windowing (streaming-ready shapes) ---
    "events_tumbling" -> (Events.tumbling _),
    "events_sliding"  -> (Events.sliding _),
    "events_sessions" -> (Events.sessions _),
    "events_sessions_sw" -> (Events.sessionsViaSessionWindow _),
    "conversion_funnel" -> (Events.conversionFunnel _),
    "ordered_funnel" -> (Events.orderedFunnel _),
    "event_transitions" -> (Events.eventTransitions _),
    "conversion_latency" -> (Events.conversionLatency _),
    "view_purchase_recon" -> (Events.viewPurchaseRecon _),
    "props_json_stats" -> (Events.propsJsonStats _),
    "value_mad_outliers" -> (Events.valueMadOutliers _),
    "daily_gap_filled" -> (TimeSeries.dailyGapFilled _),
    "rolling_dau_7d" -> (TimeSeries.rollingDau7d _),
    "rolling_dau_7d_hll" -> (TimeSeries.rollingDau7dHll _),
    "daily_count_anomalies" -> (TimeSeries.dailyCountAnomalies _),
    "ewma_daily" -> (TimeSeries.ewmaDaily _),
    "rolling_dau_7d_bitmap" -> (TimeSeries.rollingDau7dBitmap _),
    "geo_near_pairs" -> ((s, d) => graft.ops.GeoJoin.geoNearPairs(s, d)),
    "contrastive_batch_negatives" -> ((s, d) => graft.ops.Contrastive.batchNegatives(s, d)),
    "hard_negatives_lsh" -> ((s, d) => graft.ops.Contrastive.hardNegativesLsh(s, d)),
    "winsorized_stats" -> (Events.winsorizedStats _),
    "cohort_retention" -> (Events.cohortRetention _),
    "sequence_match_conversions" -> (Events.sequenceMatchConversions _),
    "bootstrap_mean_ci" -> (Events.bootstrapMeanCi _),
    "cc_scrub" -> (Corpus.ccScrub _),
    "hour_value_regression" -> (Events.hourValueRegression _),
    "data_quality_checks" -> ((s, d) => graft.ops.TableChecks.dataQualityChecks(s, d)),
    "snapshot_diff" -> ((s, d) => graft.ops.TableChecks.snapshotDiff(s, d)),
    "k_anonymity_audit" -> ((s, d) => graft.ops.TableChecks.kAnonymityAudit(s, d)),
    "l_diversity_audit" -> ((s, d) => graft.ops.TableChecks.lDiversityAudit(s, d)),
    "pseudonymized_revenue" -> ((s, d) => graft.ops.TableChecks.pseudonymizedRevenue(s, d)),
    "merge_upsert" -> ((s, d) => graft.ops.TableChecks.mergeUpsert(s, d)),
    "profile_columns" -> ((s, d) => graft.ops.TableChecks.profileColumns(s, d)),
    "profile_columns_approx" -> ((s, d) => graft.ops.TableChecks.profileColumnsApprox(s, d)),
    "value_percentiles" -> (Events.valuePercentiles _),
    "value_percentiles_approx" -> ((s, d) => Events.valuePercentilesApprox(s, d)),
    "asof_last_click" -> (AsofJoin.asofLastClick _),
    "events_in_windows" -> (RangeJoin.eventsInWindows _),
    "salted_user_age" -> (Skew.saltedUserAge _),
    "skewed_host_age" -> (Skew.skewedHostAge _),
    "distinct_parts_approx" -> ((s, d) => Skew.distinctPartsApprox(s, d)),
    // --- text analysis ---
    "token_stats"   -> (TextAnalysis.tokenStats _),
    "bpe_token_stats" -> (TextAnalysis.bpeTokenStats _),
    "bpe_merges"    -> ((s, d) => graft.ops.BpeTrain.bpeMerges(s, d)),
    "bpe_segment_stats" -> ((s, d) => graft.ops.BpeTrain.bpeSegmentStats(s, d)),
    "quality_score" -> (TextAnalysis.qualityScore _),
    "quality_lr_score" -> (graft.ops.QualityModel.qualityLrScore _),
    "lr_eval_metrics" -> (graft.ops.QualityModel.lrEvalMetrics _),
    "quality_weighted_sample" -> ((s, d) => graft.ops.QualityModel.qualityWeightedSample(s, d)),
    "quality_prune" -> ((s, d) => TextAnalysis.qualityPrune(s, d)),
    "quality_prune_approx" -> ((s, d) => TextAnalysis.qualityPruneApprox(s, d)),
    "lang_id"       -> (TextAnalysis.langId _),
    "fingerprint"   -> (TextAnalysis.fingerprint _),
    "winnow_fingerprints" -> (TextAnalysis.winnowFingerprints _),
    "vocab_top_terms" -> ((s, d) => TextAnalysis.vocabTopTerms(s, d)),
    "vocab_heavy_hitters_cms" -> ((s, d) => TextAnalysis.vocabHeavyHittersCms(s, d)),
    "length_histogram" -> ((s, d) => TextAnalysis.lengthHistogram(s, d)),
    "distinctive_terms" -> ((s, d) => TextAnalysis.distinctiveTerms(s, d)),
    "distinctive_terms_agg" -> ((s, d) => TextAnalysis.distinctiveTermsAgg(s, d)),
    "bm25_topk" -> ((s, d) => TextAnalysis.bm25TopK(s, d)),
    "phrase_search" -> ((s, d) => TextAnalysis.phraseSearch(s, d)),
    "pmi_pairs" -> ((s, d) => TextAnalysis.pmiPairs(s, d)),
    "vocab_divergence" -> ((s, d) => TextAnalysis.vocabDivergence(s, d)),
    "doc_top_tokens" -> (TextAnalysis.docTopTokens _),
    // --- deduplication suite ---
    "ngram_jaccard_pairs" -> (Dedup.ngramJaccardPairs _),
    "prefix_jaccard_pairs" -> (graft.ops.SetSimJoin.prefixJaccardPairs _),
    "minhash_lsh_pairs"   -> (Dedup.minhashLshPairs _),
    "incremental_near_dup" -> (Dedup.incrementalNearDup _),
    "repeated_ngram_spans" -> ((s, d) => Dedup.repeatedNgramSpans(s, d)),
    "cross_doc_spans"     -> ((s, d) => Dedup.crossDocSpans(s, d)),
    "cut_spans"           -> ((s, d) => Dedup.cutSpans(s, d)),
    "near_dup_clusters"   -> ((s, d) => Dedup.nearDupClusters(s, d)),
    "corpus_dedup_report" -> (Dedup.corpusDedupReport _),
    "winnow_near_dup"     -> ((s, d) => Dedup.winnowNearDupPairs(s, d)),
    "simhash"             -> (Dedup.simhash _),
    "simhash_near_dup"    -> ((s, d) => Dedup.simhashNearDup(s, d)),
    "embedding_near_dup"  -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "embedding_near_dup_lsh" -> ((s, d) => Dedup.embeddingNearDupLsh(s, d)),
    "events_rollup" -> (Events.rollupByTypeDay _),
    "events_cube"   -> (Events.cubeByTypeDay _),
    "events_grouping_sets" -> (Events.groupingSetsByTypeDay _),
    "events_pivot"  -> (Events.eventsPivot _),
    // --- similarity search ---
    "ann_topk_brute" -> ((s, d) => Similarity.annTopKBrute(s, d)),
    "hybrid_rrf_topk" -> ((s, d) => Similarity.hybridRrfTopK(s, d)),
    "hybrid_rrf_lsh_topk" -> ((s, d) => Similarity.hybridRrfLshTopK(s, d)),
    "ann_lsh_topk"   -> ((s, d) => Similarity.annLshTopK(s, d)),
    "ann_ivf_topk"   -> ((s, d) => Similarity.annIvfTopK(s, d)),
    "semdedup_clusters" -> (Similarity.semDedup _),
    "pq_adc_topk"    -> ((s, d) => Similarity.pqAdcTopK(s, d)),
    "pq_rerank_topk" -> ((s, d) => Similarity.pqRerankTopK(s, d)),
    "sq8_topk"       -> ((s, d) => Similarity.sq8TopK(s, d)),
    "containment_pairs" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "ivf_pq_topk"    -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "ivf_pq_residual_topk" -> ((s, d) => Similarity.ivfPqResidualTopK(s, d)),
    "opq_topk"       -> ((s, d) => Similarity.opqTopK(s, d)),
    "ivf_pq_residual_rerank_topk" -> ((s, d) => Similarity.ivfPqResidualRerankTopK(s, d)),
    "opq_ivf_pq_topk" -> ((s, d) => Similarity.opqIvfPqTopK(s, d)),
    "knn_graph_topk" -> ((s, d) => graft.ops.GraphAnn.knnGraphTopK(s, d)),
    // --- multimodal binary-column plumbing ---
    "media_stats"      -> (Multimodal.mediaStats _),
    "media_phash"      -> (Multimodal.mediaPhash _),
    "media_near_dup"   -> ((s, d) => Multimodal.mediaNearDup(s, d)),
    "frame_sample"     -> ((s, d) => Multimodal.frameSample(s, d)),
    "frame_sample_digest" -> ((s, d) => Multimodal.frameSampleDigest(s, d)),
    "frame_near_dup"   -> ((s, d) => Multimodal.frameNearDup(s, d)),
    "extract_features" -> ((s, d) => Multimodal.extractFeaturesScalars(s, d)),
    // --- storage layout (bucketed co-located join, partition-pruned scan) ---
    "bucketed_join_revenue" -> ((s, d) => StorageLayout.bucketedJoinRevenue(s, d)),
    "partition_pruned_events" -> ((s, d) => StorageLayout.prunedEventsDaily(s, d)),
    "zorder_chunks" -> ((s, d) => StorageLayout.zorderChunks(s, d)),
    "hilbert_chunks" -> ((s, d) => StorageLayout.hilbertChunks(s, d)),
    "zorder_pruned_scan" -> ((s, d) => StorageLayout.zorderPrunedScan(s, d)),
    "dpp_pruned_join" -> ((s, d) => StorageLayout.dppPrunedJoin(s, d)),
    // --- corpus sampling / splitting ---
    "split_counts"      -> (Sampling.splitCounts _),
    "stratified_sample" -> ((s, d) => Sampling.stratifiedSampleHash(s, d)),
    "mixture_sample"    -> ((s, d) => Sampling.mixtureSample(s, d)),
    "shuffle_shards"    -> ((s, d) => Sampling.shuffleShards(s, d)),
    "url_host_caps"     -> ((s, d) => Sampling.urlHostCaps(s, d)),
    "url_canonical_dedup" -> ((s, d) => Sampling.urlCanonicalDedup(s, d)),
    "temperature_sample" -> ((s, d) => Sampling.temperatureSample(s, d)),
    "host_lang_entropy" -> (Sampling.hostLangEntropy _),
    "size_balanced_shards" -> ((s, d) => Sampling.sizeBalancedShards(s, d)),
    // --- corpus preparation (repetition filter, PII, decontamination, packing) ---
    "quality_filter"   -> (Corpus.qualityFilter _),
    "repetition_stats" -> ((s, d) => Corpus.repetitionStats(s, d)),
    "pii_scrub"        -> (Corpus.piiScrub _),
    "boilerplate_scrub" -> ((s, d) => Corpus.boilerplateScrub(s, d)),
    "decontaminate"    -> ((s, d) => Corpus.decontaminate(s, d)),
    "decontaminate_bloom" -> ((s, d) => Corpus.decontaminateBloom(s, d)),
    "pack_sequences"   -> ((s, d) => Corpus.packSequences(s, d)),
    "length_batching"  -> ((s, d) => Corpus.lengthBatching(s, d)),
    "chunk_documents"  -> ((s, d) => Corpus.chunkDocuments(s, d)),
    "chunk_documents_gen" -> ((s, d) => Corpus.chunkDocumentsGen(s, d)),
    "unigram_logprob"  -> (Corpus.unigramLogProbScore _),
    "bigram_logprob"   -> ((s, d) => Corpus.bigramLogProbScore(s, d)),
    "kneser_ney_logprob" -> (Corpus.kneserNeyLogProbScore _)
  )

  /** DuckDB oracle SQL for each query above.
    *
    * `ann_ivf_topk` / `semdedup_clusters` are GENERATED oracles like the
    * LSH family's, but from DATA-fitted centroids rather than seeded
    * hyperplanes — they appear only once [[graft.ops.Similarity.setOracleContext]]
    * has bound the sweep's (session, dir); `Verify` does that before
    * dumping. Omitted (rows-only check), each for a stated reason:
    *  - `distinct_parts_approx`, `value_percentiles_approx`,
    *    `value_quartiles_approx`, `quality_prune_approx`,
    *    `profile_columns_approx`: HLL/GK/KLL sketch internals are
    *    engine-specific (error envelopes spec-pinned vs the exact twins);
    *  - `decontaminate_bloom`: the Bloom bit pattern depends on the
    *    engine's sketch hashes (no-false-negative superset of the exact
    *    `decontaminate` + fpp bound spec-pinned instead);
    *  - `rolling_dau_7d_hll`: DataSketches HLL binary layout is
    *    engine-specific (error envelope vs the exact `rolling_dau_7d`
    *    twin spec-pinned instead);
    *  - `vocab_heavy_hitters_cms`: count-min hash layout is engine-specific
    *    (one-sided error envelope + top-k agreement vs the exact
    *    `vocab_top_terms` spec-pinned instead);
    *  - `frame_sample`: raw binary cells defeat the driver's value hash —
    *    its slicing logic is oracled via `frame_sample_digest`.
    * `minhash_lsh_pairs` is checked against the BRUTE-FORCE Jaccard oracle:
    * at sf0.01 every qualifying pair has j ≥ 0.9, where the 16-band/4-row
    * LSH miss probability is ≈ 4e-8, so the candidate sets coincide.
    */
  def oracleSql: Map[String, String] = Map(
    "filter_incomplete"      -> DocValidation.filterIncompleteSql,
    "validate_flags"         -> DocValidation.validateFlagsSql,
    "reason_histogram"       -> DocValidation.reasonHistogramSql,
    "top1_reason"            -> DocValidation.top1ReasonSql,
    "completeness"           -> DocValidation.completenessSql,
    "date_range"             -> DocValidation.dateRangeSql,
    "dedup_exact_keep_first" -> Dedup.exactDedupSql,
    "clean_text"             -> DocValidation.cleanTextSql,
    "parse_dates"            -> DocValidation.parseDatesSql,
    "article_funnel"         -> DocValidation.articleFunnelSql,
    "tpch_q1"        -> Tpch.q1Sql,
    "tpch_q3"        -> Tpch.q3Sql,
    "tpch_q4"        -> Tpch.q4Sql,
    "tpch_q5"        -> Tpch.q5Sql,
    "tpch_q6"        -> Tpch.q6Sql,
    "tpch_q10"       -> Tpch.q10Sql,
    "tpch_q14"       -> Tpch.q14Sql,
    "customers_without_urgent" -> Tpch.customersWithoutUrgentSql,
    "parts_in_both_years" -> Tpch.partsInBothYearsSql,
    "setop_all_shipments" -> Tpch.setopAllShipmentsSql,
    "suppliers_no_returns" -> Tpch.suppliersNoReturnsSql,
    "fuzzy_part_pairs"   -> FuzzyJoin.fuzzyPartPairsSql,
    "sorted_neighborhood_pairs" -> FuzzyJoin.sortedNeighborhoodPairsSql,
    "fuzzy_entity_clusters" -> FuzzyJoin.fuzzyEntityClustersSql,
    "incremental_customer_revenue" -> IncrementalAgg.incrementalCustomerRevenueSql,
    "doc_pagerank"     -> PageRank.docPageRankSql,
    "doc_triangles"    -> PageRank.docTrianglesSql,
    "doc_components"   -> PageRank.docComponentsSql,
    "top_customers"  -> Tpch.topCustomersSql,
    "also_bought"    -> Tpch.alsoBoughtSql,
    "distinct_parts" -> Tpch.distinctPartsSql,
    "tpch_q7"  -> TpchTail.q7Sql,
    "tpch_q8"  -> TpchTail.q8Sql,
    "tpch_q13" -> TpchTail.q13Sql,
    "tpch_q15" -> TpchTail.q15Sql,
    "tpch_q17" -> TpchTail.q17Sql,
    "tpch_q18" -> TpchTail.q18Sql,
    "tpch_q19" -> TpchTail.q19Sql,
    "tpch_q22" -> TpchTail.q22Sql,
    "tpch_q2"  -> TpchAdapted.q2Sql,
    "tpch_q9"  -> TpchAdapted.q9Sql,
    "tpch_q11" -> TpchAdapted.q11Sql,
    "tpch_q12" -> TpchAdapted.q12Sql,
    "tpch_q16" -> TpchAdapted.q16Sql,
    "tpch_q20" -> TpchAdapted.q20Sql,
    "tpch_q21" -> TpchAdapted.q21Sql,
    "running_revenue"         -> Analytics.runningRevenueSql,
    "top_orders_per_customer" -> Analytics.topOrdersPerCustomerSql,
    "user_event_gaps"         -> Analytics.userEventGapsSql,
    "value_quartiles"         -> Analytics.valueQuartilesSql,
    "rank_family"             -> Analytics.rankFamilySql,
    "scd2_value_tiers"        -> Analytics.scd2ValueTiersSql,
    "scd2_temporal_join"      -> Analytics.scd2TemporalJoinSql,
    "rolling_revenue_7d"      -> Analytics.rollingRevenue7dSql,
    "revenue_pareto"          -> Analytics.revenueParetoSql,
    "events_tumbling" -> Events.tumblingSql,
    "events_sliding"  -> Events.slidingSql,
    "events_sessions" -> Events.sessionsSql,
    "events_sessions_sw" -> Events.sessionsWindowSql,
    "conversion_funnel" -> Events.conversionFunnelSql,
    "ordered_funnel" -> Events.orderedFunnelSql,
    "event_transitions" -> Events.eventTransitionsSql,
    "conversion_latency" -> Events.conversionLatencySql,
    "view_purchase_recon" -> Events.viewPurchaseReconSql,
    "props_json_stats" -> Events.propsJsonStatsSql,
    "value_mad_outliers" -> Events.valueMadOutliersSql,
    "daily_gap_filled" -> TimeSeries.dailyGapFilledSql,
    "rolling_dau_7d" -> TimeSeries.rollingDau7dSql,
    "daily_count_anomalies" -> TimeSeries.dailyCountAnomaliesSql,
    "ewma_daily" -> TimeSeries.ewmaDailySql,
    // bitmap rolling distinct: the textbook range-join oracle verbatim —
    // bit-exact equality to an independent formulation IS the claim
    "rolling_dau_7d_bitmap" -> TimeSeries.rollingDau7dSql,
    "geo_near_pairs" -> graft.ops.GeoJoin.geoNearPairsSql,
    "contrastive_batch_negatives" -> graft.ops.Contrastive.batchNegativesSql,
    "hard_negatives_lsh" -> graft.ops.Contrastive.hardNegativesLshSql,
    "winsorized_stats" -> Events.winsorizedStatsSql,
    "cohort_retention" -> Events.cohortRetentionSql,
    "sequence_match_conversions" -> Events.sequenceMatchConversionsSql,
    "bootstrap_mean_ci" -> Events.bootstrapMeanCiSql,
    "cc_scrub" -> Corpus.ccScrubSql,
    "hour_value_regression" -> Events.hourValueRegressionSql,
    "data_quality_checks" -> graft.ops.TableChecks.dataQualityChecksSql,
    "snapshot_diff" -> graft.ops.TableChecks.snapshotDiffSql,
    "k_anonymity_audit" -> graft.ops.TableChecks.kAnonymityAuditSql,
    "l_diversity_audit" -> graft.ops.TableChecks.lDiversityAuditSql,
    "pseudonymized_revenue" -> graft.ops.TableChecks.pseudonymizedRevenueSql,
    "merge_upsert" -> graft.ops.TableChecks.mergeUpsertSql,
    "profile_columns" -> graft.ops.TableChecks.profileColumnsSql,
    "value_percentiles" -> Events.valuePercentilesSql,
    "asof_last_click" -> AsofJoin.asofLastClickSql,
    "events_in_windows" -> RangeJoin.eventsInWindowsSql,
    "salted_user_age" -> Skew.saltedUserAgeSql,
    "skewed_host_age" -> Skew.skewedHostAgeSql,
    "events_rollup"   -> Events.rollupSql,
    "events_cube"     -> Events.cubeSql,
    "events_grouping_sets" -> Events.groupingSetsSql,
    "events_pivot"    -> Events.eventsPivotSql,
    "token_stats"   -> TextAnalysis.tokenStatsSql,
    "bpe_token_stats" -> TextAnalysis.bpeTokenStatsSql,
    "bpe_merges"    -> graft.ops.BpeTrain.bpeMergesSql,
    "bpe_segment_stats" -> graft.ops.BpeTrain.bpeSegmentStatsSql,
    "quality_score" -> TextAnalysis.qualityScoreSql,
    "lang_id"       -> TextAnalysis.langIdSql,
    "fingerprint"   -> TextAnalysis.fingerprintSql,
    "winnow_fingerprints" -> TextAnalysis.winnowFingerprintsSql,
    "vocab_top_terms" -> TextAnalysis.vocabTopTermsSql,
    "length_histogram" -> TextAnalysis.lengthHistogramSql,
    "distinctive_terms" -> TextAnalysis.distinctiveTermsSql,
    // the aggregate variant has the IDENTICAL output contract — one oracle
    "distinctive_terms_agg" -> TextAnalysis.distinctiveTermsSql,
    "quality_prune" -> TextAnalysis.qualityPruneSql,
    "bm25_topk" -> TextAnalysis.bm25TopKSql,
    "phrase_search" -> TextAnalysis.phraseSearchSql,
    "pmi_pairs" -> TextAnalysis.pmiPairsSql,
    "vocab_divergence" -> TextAnalysis.vocabDivergenceSql,
    "doc_top_tokens" -> TextAnalysis.docTopTokensSql,
    "ngram_jaccard_pairs" -> Dedup.ngramJaccardSql,
    "prefix_jaccard_pairs" -> graft.ops.SetSimJoin.prefixJaccardPairsSql,
    "minhash_lsh_pairs"   -> Dedup.ngramJaccardSql,
    "incremental_near_dup" -> Dedup.incrementalNearDupSql,
    "repeated_ngram_spans" -> Dedup.repeatedNgramSpansSql,
    "cross_doc_spans"     -> Dedup.crossDocSpansSql,
    "cut_spans"           -> Dedup.cutSpansSql,
    "simhash"             -> SimHashOracle.simhashSql,
    "simhash_near_dup"    -> SimHashOracle.simhashNearDupSql,
    "near_dup_clusters"   -> Dedup.nearDupClustersSql,
    "corpus_dedup_report" -> Dedup.corpusDedupReportSql,
    "winnow_near_dup"     -> Dedup.winnowNearDupSql,
    "embedding_near_dup"  -> Dedup.embeddingNearDupSql,
    "embedding_near_dup_lsh" -> Dedup.embeddingNearDupLshSql,
    "ann_topk_brute" -> Similarity.annTopKSql,
    "sq8_topk"       -> Similarity.sq8TopKSql,
    "containment_pairs" -> Dedup.containmentSql,
    "hybrid_rrf_topk" -> Similarity.hybridRrfTopKSql,
    "hybrid_rrf_lsh_topk" -> Similarity.hybridRrfLshTopKSql,
    "ann_lsh_topk"   -> Similarity.annLshTopKSql,
    "media_stats"    -> Multimodal.mediaStatsSql,
    "media_phash"    -> Multimodal.mediaPhashSql,
    "media_near_dup" -> Multimodal.mediaNearDupSql,
    "frame_sample_digest" -> Multimodal.frameSampleDigestSql,
    "frame_near_dup" -> Multimodal.frameNearDupSql,
    "bucketed_join_revenue" -> StorageLayout.bucketedJoinRevenueSql,
    "partition_pruned_events" -> StorageLayout.prunedEventsDailySql,
    "zorder_chunks" -> StorageLayout.zorderChunksSql,
    "hilbert_chunks" -> StorageLayout.hilbertChunksSql,
    "zorder_pruned_scan" -> StorageLayout.zorderPrunedScanSql,
    "dpp_pruned_join" -> StorageLayout.dppPrunedJoinSql,
    "split_counts"   -> Sampling.splitCountsSql,
    "stratified_sample" -> Sampling.stratifiedSampleHashSql,
    "mixture_sample"    -> Sampling.mixtureSampleSql,
    "shuffle_shards"    -> Sampling.shuffleShardsSql,
    "url_host_caps"     -> Sampling.urlHostCapsSql,
    "url_canonical_dedup" -> Sampling.urlCanonicalDedupSql,
    "temperature_sample" -> Sampling.temperatureSampleSql,
    "host_lang_entropy" -> Sampling.hostLangEntropySql,
    "size_balanced_shards" -> Sampling.sizeBalancedShardsSql,
    "quality_filter"   -> Corpus.qualityFilterSql,
    "repetition_stats" -> Corpus.repetitionStatsSql,
    "pii_scrub"        -> Corpus.piiScrubSql,
    "boilerplate_scrub" -> Corpus.boilerplateScrubSql,
    "decontaminate"    -> Corpus.decontaminateSql,
    "pack_sequences"   -> Corpus.packSequencesSql,
    "length_batching"  -> Corpus.lengthBatchingSql,
    "chunk_documents"  -> Corpus.chunkDocumentsSql,
    // the generator variant has the IDENTICAL output contract — one oracle
    "chunk_documents_gen" -> Corpus.chunkDocumentsSql,
    "unigram_logprob"  -> Corpus.unigramLogProbScoreSql,
    "bigram_logprob"   -> Corpus.bigramLogProbScoreSql,
    "kneser_ney_logprob" -> Corpus.kneserNeyLogProbScoreSql
  ) ++ Similarity.quantizerOracles ++ Multimodal.codecOracles ++
    graft.ops.QualityModel.modelOracles

  /** Headline bench set: every query that is scale-shaped. The two O(n²)
    * brute-force correctness anchors (`ngram_jaccard_pairs`,
    * `embedding_near_dup`) are deliberately excluded — their scale paths
    * (`minhash_lsh_pairs`, `ann_lsh_topk`) are what gets timed. So is
    * `corpus_dedup_report`: a once-per-corpus audit composite that
    * re-executes the already-benched minhash-LSH and cut_spans pipelines —
    * benching it would double-count their cost in the sweep total.
    *
    * Ordered heavy-first: the JVM degrades measurably over a long sweep
    * (GC/code-cache state), and the multi-stage LSH queries are the most
    * sensitive to it — running them first times the plans, not the sweep
    * position.
    */
  val benchQueries: Seq[String] = Seq(
    "minhash_lsh_pairs", "near_dup_clusters", "embedding_near_dup_lsh", "ann_lsh_topk",
    "ann_ivf_topk", "semdedup_clusters", "pq_adc_topk", "ivf_pq_topk",
    "ivf_pq_residual_topk", "opq_topk", "ivf_pq_residual_rerank_topk",
    "opq_ivf_pq_topk", "knn_graph_topk",
    "pq_rerank_topk", "sq8_topk", "containment_pairs",
    "simhash_near_dup", "simhash",
    "ann_topk_brute",
    "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q10",
    "tpch_q14", "customers_without_urgent", "parts_in_both_years",
    "setop_all_shipments", "suppliers_no_returns", "also_bought",
    "fuzzy_part_pairs", "sorted_neighborhood_pairs",
    "fuzzy_entity_clusters",
    "incremental_customer_revenue", "doc_pagerank", "doc_triangles",
    "doc_components",
    "tpch_q7", "tpch_q8", "tpch_q13", "tpch_q15", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q22",
    "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q12", "tpch_q16", "tpch_q20",
    "tpch_q21",
    // exact `value_quartiles` (per-type ntile sort) is the correctness
    // anchor; the benched form is the approx-histogram bucket assignment
    "running_revenue", "top_orders_per_customer", "user_event_gaps",
    "value_quartiles_approx", "rank_family", "scd2_value_tiers",
    "scd2_temporal_join",
    "rolling_revenue_7d",
    "top_customers", "distinct_parts",
    "events_tumbling", "events_sliding", "events_sessions",
    "events_sessions_sw",
    "conversion_funnel", "ordered_funnel", "event_transitions",
    "conversion_latency",
    "view_purchase_recon",
    // exact `profile_columns` (6-way multi-distinct Expand + sort-agg) is
    // the unbenched correctness anchor; the benched profile is the sketch
    // form — the value_quartiles convention
    "data_quality_checks", "snapshot_diff", "k_anonymity_audit",
    "l_diversity_audit", "pseudonymized_revenue", "merge_upsert",
    "profile_columns_approx",
    "props_json_stats", "winsorized_stats", "cohort_retention",
    "hour_value_regression", "value_mad_outliers", "revenue_pareto",
    "daily_gap_filled", "rolling_dau_7d", "rolling_dau_7d_hll",
    "rolling_dau_7d_bitmap", "daily_count_anomalies", "ewma_daily",
    "geo_near_pairs", "contrastive_batch_negatives", "hard_negatives_lsh",
    "sequence_match_conversions", "cc_scrub", "bootstrap_mean_ci",
    "value_percentiles", "value_percentiles_approx",
    "winnow_near_dup", "incremental_near_dup", "prefix_jaccard_pairs",
    "repeated_ngram_spans",
    "cross_doc_spans", "cut_spans",
    "asof_last_click", "events_in_windows", "salted_user_age",
    "skewed_host_age",
    "distinct_parts_approx",
    "events_rollup", "events_cube", "events_grouping_sets", "events_pivot",
    "filter_incomplete", "validate_flags", "reason_histogram", "top1_reason",
    "completeness", "date_range", "dedup_exact_keep_first", "clean_text",
    "parse_dates", "article_funnel",
    // `bpe_segment_stats` re-trains the merges before applying them —
    // benching it would double-count bpe_merges (the corpus_dedup_report
    // convention); the training is what gets timed
    "token_stats", "bpe_token_stats", "bpe_merges",
    "quality_score", "quality_lr_score", "lr_eval_metrics",
    "quality_weighted_sample",
    "lang_id", "fingerprint",
    "winnow_fingerprints", "vocab_top_terms", "length_histogram",
    // `hybrid_rrf_topk` (brute dense leg) is the unbenched exactness
    // anchor; the benched hybrid is the LSH-leg composite. Likewise exact
    // `quality_prune` (per-language rank sort — single-task on a dominant
    // language) is the unbenched anchor; the benched form is the
    // approx-quantile threshold scan
    "distinctive_terms", "distinctive_terms_agg", "bm25_topk", "phrase_search",
    "pmi_pairs", "vocab_divergence", "doc_top_tokens",
    "quality_prune_approx", "hybrid_rrf_lsh_topk",
    "vocab_heavy_hitters_cms",
    "media_stats", "media_phash", "media_near_dup",
    "frame_sample", "frame_sample_digest", "frame_near_dup",
    "extract_features",
    "bucketed_join_revenue", "partition_pruned_events", "zorder_chunks",
    "hilbert_chunks", "zorder_pruned_scan", "dpp_pruned_join",
    "split_counts", "stratified_sample", "mixture_sample", "temperature_sample",
    "shuffle_shards",
    "url_host_caps", "url_canonical_dedup", "host_lang_entropy",
    "size_balanced_shards",
    "quality_filter",
    "repetition_stats", "pii_scrub", "boilerplate_scrub",
    "decontaminate", "decontaminate_bloom",
    "pack_sequences", "length_batching",
    "chunk_documents", "chunk_documents_gen", "unigram_logprob", "bigram_logprob",
    "kneser_ney_logprob"
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — registry of every oracle-checked query.
  *
  * Each entry exercises one operator family from SURVEY.md §2; the matching
  * DuckDB SQL (when expressible) lives in [[oracleSql]] under the same key
  * with identical output column names (driver compares sorted-by-name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q2_join_agg" -> (Relational.q2JoinAgg _),
    "q3_topk" -> (Relational.q3TopK _),
    "q4_semi_join" -> (Relational.q4SemiJoin _),
    "q5_anti_join" -> (Relational.q5AntiJoin _),
    "q6_filter_agg" -> (Relational.q6FilterAgg _),
    "q7_window" -> (Relational.q7Window _),
    "q8_setops" -> (Relational.q8SetOps _),
    "q10_merge_upsert" -> (MergeQueries.qMergeUpsert _),
    "q11_merge_guarded" -> (MergeQueries.qMergeGuarded _),
    "q12_merge_insertonly" -> (MergeQueries.qMergeInsertOnly _),
    "q13_group_replace" -> (MergeQueries.qGroupReplace _),
    "q14_delete_ids" -> (MergeQueries.qDeleteIds _),
    "q15_dedup_lastwins" -> (MergeQueries.qDedupLastWins _),
    "q20_text_stats" -> (TextQueries.qTextStats _),
    "q21_term_freq" -> (TextQueries.qTermFreq _),
    "q22_exact_dedup" -> (TextQueries.qExactDedup _),
    "q23_doc_quality" -> (TextQueries.qDocQuality _),
    "q24_minhash_sig" -> (TextQueries.qMinHashSig _),
    "q25_minhash_pairs" -> (TextQueries.qMinHashPairs _),
    "q26_simhash_pairs" -> (TextQueries.qSimHashPairs _),
    "q27_ngram_jaccard" -> (TextQueries.qNgramJaccard _),
    "q28_fingerprint" -> (TextQueries.qFingerprint _),
    "q29_winnow_fp" -> (TextQueries.qWinnowFp _),
    "q35_simhash_md5" -> (TextQueries.qSimHashMd5 _),
    "q36_band_pairs" -> (TextQueries.qBandPairs _),
    "q37_dedup_groups" -> (TextQueries.qDedupGroups _),
    "q38_dedup_corpus" -> (TextQueries.qDedupCorpus _),
    "q45_char_quality" -> (TextQueries.qCharQuality _),
    "q47_repetition" -> (TextQueries.qRepetition _),
    "q48_tfidf" -> (TextQueries.qTfidf _),
    "q54_contamination" -> (TextQueries.qContamination _),
    "q56_corpus_prepare" -> (TextQueries.qCorpusPrepare _),
    "q57_source_mix" -> (TextQueries.qSourceMix _),
    "q58_seq_pack" -> (TextQueries.qSeqPack _),
    "q59_chunking" -> (TextQueries.qChunking _),
    "q30_cosine_topk" -> (SimilarityQueries.qCosineTopK _),
    "q49_kmeans_assign" -> (SimilarityQueries.qKmeansAssign _),
    "q31_ann_topk" -> (SimilarityQueries.qAnnTopK _),
    "q39_ivf_topk" -> (SimilarityQueries.qIvfTopK _),
    "q46_quantize_i8" -> (SimilarityQueries.qQuantizeI8 _),
    "q34_embed_neardup" -> (SimilarityQueries.qEmbedNearDup _),
    "q32_label_centroids" -> (SimilarityQueries.qLabelCentroids _),
    "q40_deid_scalars" -> (DeidQueries.qDeidScalars _),
    "q41_checksum" -> (DeidQueries.qChecksum _),
    "q42_check_system" -> (DeidQueries.qCheckSystem _),
    "q43_partial_dates" -> (DeidQueries.qPartialDates _),
    "q44_anon_ids" -> (DeidQueries.qAnonIds _),
    "q9_shipping_priority" -> (Relational.q9ShippingPriority _),
    "q16_outer_join" -> (Relational2.q16OuterJoin _),
    "q17_small_qty" -> (Relational2.q17SmallQty _),
    "q18_having" -> (Relational2.q18Having _),
    "q19_subqueries" -> (Relational2.q19Subqueries _),
    "q64_salted_join" -> (Relational2.q64SaltedJoin _),
    "q33_media_pipeline" -> (NoteQueries.qMediaPipeline _),
    "q60_note_select" -> (NoteQueries.qNoteSelect _),
    "q61_group_notes" -> (NoteQueries.qGroupNotes _),
    "q62_sample_notes" -> (NoteQueries.qSampleNotes _),
    "q63_hash_sample" -> (NoteQueries.qHashSample _),
    "q50_window_agg" -> (StreamQueries.qWindowAgg _),
    "q51_sessions" -> (StreamQueries.qSessions _),
    "q52_event_deltas" -> (StreamQueries.qEventDeltas _),
    "q53_stream_enrich" -> (StreamQueries.qStreamEnrich _),
    "q65_asof_join" -> (TemporalQueries.qAsofJoin _),
    "q66_range_count" -> (TemporalQueries.qRangeCount _),
    "q67_percentiles" -> (Relational2.q67Percentiles _),
    "q68_substr_dedup" -> (CorpusQueries.qSubstrDedup _),
    "q69_stratified" -> (CorpusQueries.qStratifiedSample _),
    "q70_lang_trigrams" -> (CorpusQueries.qLangTrigrams _),
    "q71_attribution" -> (TemporalQueries.qAttribution _),
    "q72_sketch_distinct" -> (CorpusQueries.qSketchDistinct _),
    "q73_pq_topk" -> (SimilarityQueries.qPqTopK _),
    "q74_compress_ratio" -> (CorpusQueries.qCompressRatio _),
    "q75_region_revenue" -> (Relational2.q75RegionRevenue _),
    "q76_user_outliers" -> (Relational2.q76UserOutliers _),
    "q77_profile" -> (Relational2.q77Profile _),
    "q78_attr_pairs" -> (TemporalQueries.qAttrPairs _),
    "q79_ivfpq_topk" -> (SimilarityQueries.qIvfPqTopK _),
    "q80_stateful_neardup" -> (StreamQueries.qStatefulNearDup _)
  )

  /** DuckDB-runnable equivalents, same keys + same output column names. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q2_join_agg" -> Relational.q2JoinAggSql,
    "q3_topk" -> Relational.q3TopKSql,
    "q4_semi_join" -> Relational.q4SemiJoinSql,
    "q5_anti_join" -> Relational.q5AntiJoinSql,
    "q6_filter_agg" -> Relational.q6FilterAggSql,
    "q7_window" -> Relational.q7WindowSql,
    "q8_setops" -> Relational.q8SetOpsSql,
    "q10_merge_upsert" -> MergeQueries.qMergeUpsertSql,
    "q11_merge_guarded" -> MergeQueries.qMergeGuardedSql,
    "q12_merge_insertonly" -> MergeQueries.qMergeInsertOnlySql,
    "q13_group_replace" -> MergeQueries.qGroupReplaceSql,
    "q14_delete_ids" -> MergeQueries.qDeleteIdsSql,
    "q15_dedup_lastwins" -> MergeQueries.qDedupLastWinsSql,
    "q20_text_stats" -> TextQueries.qTextStatsSql,
    "q21_term_freq" -> TextQueries.qTermFreqSql,
    "q22_exact_dedup" -> TextQueries.qExactDedupSql,
    "q23_doc_quality" -> TextQueries.qDocQualitySql,
    "q24_minhash_sig" -> TextQueries.qMinHashSigSql,
    "q27_ngram_jaccard" -> TextQueries.qNgramJaccardSql,
    "q29_winnow_fp" -> TextQueries.qWinnowFpSql,
    "q35_simhash_md5" -> TextQueries.qSimHashMd5Sql,
    "q36_band_pairs" -> TextQueries.qBandPairsSql,
    "q37_dedup_groups" -> TextQueries.qDedupGroupsSql,
    "q38_dedup_corpus" -> TextQueries.qDedupCorpusSql,
    "q45_char_quality" -> TextQueries.qCharQualitySql,
    "q47_repetition" -> TextQueries.qRepetitionSql,
    "q48_tfidf" -> TextQueries.qTfidfSql,
    "q54_contamination" -> TextQueries.qContaminationSql,
    "q56_corpus_prepare" -> TextQueries.qCorpusPrepareSql,
    "q57_source_mix" -> TextQueries.qSourceMixSql,
    "q58_seq_pack" -> TextQueries.qSeqPackSql,
    "q59_chunking" -> TextQueries.qChunkingSql,
    "q46_quantize_i8" -> SimilarityQueries.qQuantizeI8Sql,
    "q30_cosine_topk" -> SimilarityQueries.qCosineTopKSql,
    "q49_kmeans_assign" -> SimilarityQueries.qKmeansAssignSql,
    "q32_label_centroids" -> SimilarityQueries.qLabelCentroidsSql,
    "q33_media_pipeline" -> NoteQueries.qMediaPipelineSql,
    "q34_embed_neardup" -> SimilarityQueries.qEmbedNearDupSql,
    "q40_deid_scalars" -> DeidQueries.qDeidScalarsSql,
    "q41_checksum" -> DeidQueries.qChecksumSql,
    "q42_check_system" -> DeidQueries.qCheckSystemSql,
    "q43_partial_dates" -> DeidQueries.qPartialDatesSql,
    "q9_shipping_priority" -> Relational.q9ShippingPrioritySql,
    "q16_outer_join" -> Relational2.q16OuterJoinSql,
    "q17_small_qty" -> Relational2.q17SmallQtySql,
    "q18_having" -> Relational2.q18HavingSql,
    "q19_subqueries" -> Relational2.q19SubqueriesSql,
    "q64_salted_join" -> Relational2.q64SaltedJoinSql,
    "q60_note_select" -> NoteQueries.qNoteSelectSql,
    "q63_hash_sample" -> NoteQueries.qHashSampleSql,
    "q61_group_notes" -> NoteQueries.qGroupNotesSql,
    "q50_window_agg" -> StreamQueries.qWindowAggSql,
    "q51_sessions" -> StreamQueries.qSessionsSql,
    "q52_event_deltas" -> StreamQueries.qEventDeltasSql,
    "q53_stream_enrich" -> StreamQueries.qStreamEnrichSql,
    "q65_asof_join" -> TemporalQueries.qAsofJoinSql,
    "q66_range_count" -> TemporalQueries.qRangeCountSql,
    "q67_percentiles" -> Relational2.q67PercentilesSql,
    "q68_substr_dedup" -> CorpusQueries.qSubstrDedupSql,
    "q69_stratified" -> CorpusQueries.qStratifiedSampleSql,
    "q70_lang_trigrams" -> CorpusQueries.qLangTrigramsSql,
    "q71_attribution" -> TemporalQueries.qAttributionSql,
    "q75_region_revenue" -> Relational2.q75RegionRevenueSql,
    "q76_user_outliers" -> Relational2.q76UserOutliersSql,
    "q77_profile" -> Relational2.q77ProfileSql,
    "q78_attr_pairs" -> TemporalQueries.qAttrPairsSql
    // No oracle (rows-only gate), each with a spec-pinned invariant:
    //   q72_sketch_distinct — HLL sketch values are engine-specific
    //   q73_pq_topk — trained PQ codebooks are engine-internal
    //   q74_compress_ratio — deflate output is codec-internal
    //   q79_ivfpq_topk — trained coarse lists + residual codebooks
    //   q80_stateful_neardup — FNV signature family (like q25);
    //     stream==batch parity proven in StreamingSpec
  )
}

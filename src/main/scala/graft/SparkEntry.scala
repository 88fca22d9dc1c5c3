package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.HashingEmbedder
import graft.functions.GraftUdfs
import graft.operators.{Analyze, Ann, Bpe, Cluster, Dedup, Graph, Matcher, Multimodal, Scrub, Sketch, TextAnalysis, UrlOps}
import graft.streaming.StreamOps

/** Driver contract — see SURVEY.md §7 and the harness docs.
  *
  * Every SQL-expressible operator of the engine is registered in
  * [[queries]] with a DuckDB oracle in [[oracleSql]]. Cross-engine
  * hash-parity rules used throughout:
  *
  *  - money/measure aggregates are per-row integer quantisations
  *    (`round(x*100) :: bigint`) summed exactly — never raw double
  *    sums, whose accumulation order differs between engines;
  *  - DuckDB `sum(BIGINT)` widens to int128, so every oracle sum is
  *    wrapped in `CAST(... AS BIGINT)` to match Spark's int64;
  *  - every query ends in a total ORDER BY;
  *  - ratio columns are derived from integer counts with the exact
  *    same IEEE expression tree in both engines (bit-identical);
  *  - hashes are md5 (lowercase hex in both engines).
  */
object SparkEntry
    extends EntryBase
    with EntryRelationalQueries
    with EntryTextQueries
    with EntrySimilarityQueries
    with EntryStreamingQueries
    with EntryCurationQueries
    with EntryOracleBuilders
    with EntryOracleSql {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qFlagship(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_pushdown" -> (q02 _),
    "q03_join_agg" -> (q03 _),
    "q04_dim_broadcast_join" -> (q04 _),
    "q05_semi_join" -> (q05 _),
    "q06_anti_join" -> (q06 _),
    "q07_window_topk" -> (q07 _),
    "q08_pivot" -> (q08 _),
    "q09_setops" -> (q09 _),
    "q10_unpivot" -> (q10 _),
    "q11_impute_sentinels" -> (q11 _),
    "q12_string_funcs" -> (q12 _),
    "q13_json_extract" -> (q13 _),
    "q14_hourly_rollup" -> (q14 _),
    "q15_dedup_exact" -> (q15 _),
    "q16_fingerprint" -> (q16 _),
    "q17_quality_metrics" -> (q17 _),
    "q18_language_id" -> (q18 _),
    "q19_token_stats" -> (q19 _),
    "q20_minhash_signatures" -> (q20 _),
    "q21_simhash" -> (q21 _),
    "q22_ngram_jaccard" -> (q22 _),
    "q23_nlp_clean" -> (qNlp _),
    "q24_label_match_report" -> (qFlagship _),
    "q25_knn_bruteforce" -> (q25 _),
    "q26_lsh_buckets" -> (q26 _),
    "q27_lsh_neardup" -> (q27 _),
    "q28_minhash_lsh_pairs" -> (q28 _),
    "q29_stream_rollup" -> (q29 _),
    "q30_sessionize" -> (q30 _),
    "q31_binary_meta" -> (q31 _),
    "q32_ivf_topk" -> (q32 _),
    "q33_sliding_window" -> (q33 _),
    "q34_venn_counts" -> (q34 _),
    "q35_pca_projection" -> (q35 _),
    "q36_sql_native_funcs" -> (q36 _),
    "q37_wrangle_sheet" -> (q37 _),
    "q38_simhash_neardup" -> (q38 _),
    "q39_stream_upsert" -> (q39 _),
    "q40_label_match_frozen" -> (q40 _),
    "q41_expand_contractions" -> (q41 _),
    "q42_lemmatize" -> (q42 _),
    "q43_number_words" -> (q43 _),
    "q44_label_match_w2v" -> (q44 _),
    "q45_minhash_capped" -> (q45 _),
    "q46_signature_clusters" -> (q46 _),
    "q47_stream_dedup" -> (q47 _),
    "q48_dataset_split" -> (q48 _),
    "q49_curation_pipeline" -> (q49 _),
    "q50_embedding_quantize" -> (q50 _),
    "q51_simhash_capped" -> (q51 _),
    "q52_sequence_packing" -> (q52 _),
    "q53_duplicate_clusters" -> (q53 _),
    "q54_repetition_filter" -> (q54 _),
    "q55_per_source_cap" -> (q55 _),
    "q56_heavy_hitters" -> (q56 _),
    "q57_asof_join" -> (q57 _),
    "q58_decontaminate" -> (q58 _),
    "q59_stream_join" -> (q59 _),
    "q60_bm25" -> (q60 _),
    "q61_mixture_resample" -> (q61 _),
    "q62_funnel" -> (q62 _),
    "q63_sketch_stats" -> (q63 _),
    "q64_range_join" -> (q64 _),
    "q65_rollup" -> (q65 _),
    "q66_rolling_window" -> (q66 _),
    "q67_json_quarantine" -> (q67 _),
    "q68_boilerplate_removal" -> (q68 _),
    "q69_fuzzy_join" -> (q69 _),
    "q70_session_window" -> (q70 _),
    "q71_star_join" -> (q71 _),
    "q72_stream_outer_join" -> (q72 _),
    "q73_corpus_pipeline" -> (q73 _),
    "q74_random_projection" -> (q74 _),
    "q75_importance_sample" -> (q75 _),
    "q76_stream_quota" -> (q76 _),
    "q77_rolling_fingerprint" -> (q77 _),
    "q78_winnow_neardup" -> (q78 _),
    "q79_group_heavy_hitters" -> (q79 _),
    "q80_scd2_intervals" -> (q80 _),
    "q81_stream_funnel" -> (q81 _),
    "q82_pca_certify" -> (q82 _),
    "q83_png_roundtrip" -> (q83 _),
    "q146_png_resize" -> (q146 _),
    "q84_pii_scrub" -> (q84 _),
    "q85_url_rollup" -> (q85 _),
    "q86_unigram_logprob" -> (q86 _),
    "q87_shard_order" -> (q87 _),
    "q88_chunking" -> (q88 _),
    "q89_stream_static_join" -> (q89 _),
    "q90_registrable_domain" -> (q90 _),
    "q91_zorder_key" -> (q91 _),
    "q92_global_ordinals" -> (q92 _),
    "q93_stream_scd2" -> (q93 _),
    "q94_char_entropy" -> (q94 _),
    "q95_stream_late_data" -> (q95 _),
    "q96_asof_bucketed" -> (q96 _),
    "q97_incremental_dedup" -> (q97 _),
    "q98_curation_pipeline_v2" -> (q98 _),
    "q99_hard_negatives" -> (q99 _),
    "q100_stream_ingest" -> (q100 _),
    "q101_stream_ewma" -> (q101 _),
    "q102_countmin" -> (q102 _),
    "q103_bloom_decontaminate" -> (q103 _),
    "q104_bigram_logprob" -> (q104 _),
    "q105_tfidf_keywords" -> (q105 _),
    "q106_minhash_estimate" -> (q106 _),
    "q107_pagerank" -> (q107 _),
    "q108_hll_distinct" -> (q108 _),
    "q109_sample_quantiles" -> (q109 _),
    "q110_kmeans" -> (q110 _),
    "q111_prefix_jaccard_join" -> (q111 _),
    "q140_prefix_jaccard_collapsed" -> (q140 _),
    "q112_stream_hll" -> (q112 _),
    "q113_embedding_outliers" -> (q113 _),
    "q114_mixture_quota" -> (q114 _),
    "q115_cdc_chunks" -> (q115 _),
    "q116_skew_report" -> (q116 _),
    "q117_group_ols" -> (q117 _),
    "q118_corpus_drift" -> (q118 _),
    "q119_rank_fusion" -> (q119 _),
    "q120_shard_manifest" -> (q120 _),
    "q121_semantic_neardup" -> (q121 _),
    "q122_duplicate_spans" -> (q122 _),
    "q123_bpe_train" -> (q123 _),
    "q124_unicode_nfc" -> (q124 _),
    "q125_snapshot_diff" -> (q125 _),
    "q126_containment" -> (q126 _),
    "q127_cluster_canonical" -> (q127 _),
    "q128_matryoshka_recall" -> (q128 _),
    "q147_retrieval_cascade" -> (q147 _),
    "q148_label_match_cooc" -> (q148 _),
    "q149_ivf_cascade" -> (q149 _),
    "q150_stream_retrieval" -> (q150 _),
    "q151_minhash_collapsed" -> (q151 _),
    "q129_stream_countmin" -> (q129 _),
    "q130_shard_diversity" -> (q130 _),
    "q131_grouped_split" -> (q131 _),
    "q132_pmi_collocations" -> (q132 _),
    "q133_lsh_recall" -> (q133 _),
    "q139_lsh_recall_16x2" -> (q139 _),
    "q141_lsh_recall_independent" -> (q141 _),
    "q134_frontier_interleave" -> (q134 _),
    "q135_compression_quality" -> (q135 _),
    "q136_curation_pipeline_v3" -> (q136 _),
    "q137_salted_agg" -> (q137 _),
    "q138_table_stats" -> (q138 _),
    "q142_stream_decontaminate" -> (q142 _),
    "q143_stream_bloom_dedup" -> (q143 _),
    "q145_semantic_decontaminate" -> (q145 _),
    "q152_bpe_encode" -> (q152 _),
    "q153_wav_features" -> (q153 _),
    "q154_quality_train" -> (q154 _),
    "q155_quality_scores" -> (q155 _),
    "q156_orc_roundtrip" -> (q156 _),
    "q157_stream_quality_gate" -> (q157 _),
    "q158_video_frames" -> (q158 _),
    "q159_curation_trained_gate" -> (q159 _),
    "q160_quality_train_grouped" -> (q160 _),
    "q161_quality_calibration" -> (q161 _),
    "q162_quality_auc" -> (q162 _),
    "q163_quality_warm_start" -> (q163 _),
    "q164_stream_drift_monitor" -> (q164 _),
    "q165_triangle_count" -> (q165 _),
    "q166_stream_holt" -> (q166 _),
    "q167_mmr_selection" -> (q167 _),
    "q168_schema_evolution" -> (q168 _),
    "q169_ams_f2" -> (q169 _),
    "q170_sorted_neighbor_dedup" -> (q170 _),
    "q171_weighted_sample" -> (q171 _),
    "q172_kcore" -> (q172 _),
    "q173_stream_weighted_sample" -> (q173 _),
    "q174_hits" -> (q174 _),
    "q175_chunk_scrub" -> (q175 _),
    "q176_transition_matrix" -> (q176 _),
    "q177_random_walks" -> (q177 _),
    "q178_ams_join_size" -> (q178 _),
    "q179_winsorized_stats" -> (q179 _),
    "q180_skew_join" -> (q180 _),
    "q181_inverted_index" -> (q181 _),
    "q182_pareto_frontier" -> (q182 _),
    "q183_stream_holt_winters" -> (q183 _),
    "q184_cube" -> (q184 _),
    "q185_dataset_digest" -> (q185 _),
    "q186_association_rules" -> (q186 _),
    "q187_expectations" -> (q187 _),
    "q188_quality_cv" -> (q188 _),
    "q189_attribution" -> (q189 _),
    "q190_bfs_distances" -> (q190 _))

  // --- oracle SQL (DuckDB dialect) ---------------------------------------
}

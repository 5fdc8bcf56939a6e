package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, MultimodalQueries, PreferenceQueries, TextQueries, TypedQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a §7
  * extension) expressed over the driver testdata; `oracleSql` carries the
  * equivalent DuckDB SQL. Column names and output types are aligned
  * between the two on purpose — see [[graft.queries.CoreQueries]] for
  * the determinism rules (integer-cents money sums, exact double rules,
  * calendar-function dialect mapping).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q12StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (CoreQueries.q1PricingSummary _),
    "q2_filter_project" -> (CoreQueries.q2FilterProject _),
    "q3_users_latest" -> (CoreQueries.q3UsersLatest _),
    "q4_time_dims" -> (CoreQueries.q4TimeDims _),
    "q5_distinct" -> (CoreQueries.q5Distinct _),
    "q6_join_full_using" -> (CoreQueries.q6JoinFullUsing _),
    "q7_join_left_multi" -> (CoreQueries.q7JoinLeftMulti _),
    "q8_join_left_using" -> (CoreQueries.q8JoinLeftUsing _),
    "q9_topk" -> (CoreQueries.q9TopK _),
    "q10_window_rank" -> (CoreQueries.q10WindowRank _),
    "q11_sessionize" -> (CoreQueries.q11Sessionize _),
    "q12_star_join" -> (CoreQueries.q12StarJoin _),
    "q13_setops" -> (CoreQueries.q13SetOps _),
    "q14_rollup" -> (CoreQueries.q14Rollup _),
    "q15_json_extract" -> (CoreQueries.q15JsonExtract _),
    "q16_agg_stats" -> (CoreQueries.q16AggStats _),
    "q17_dedup_exact" -> (TextQueries.q17DedupExact _),
    "q18_text_stats" -> (TextQueries.q18TextStats _),
    "q19_lang_id" -> (TextQueries.q19LangId _),
    "q20_fingerprint" -> (TextQueries.q20Fingerprint _),
    "q21_ngram_jaccard" -> (TextQueries.q21NgramJaccard _),
    "q22_minhash_lsh" -> (TextQueries.q22MinHashLsh _),
    "q23_simhash" -> (TextQueries.q23SimHash _),
    "q24_knn_brute" -> (VectorQueries.q24KnnBrute _),
    "q25_near_dup_cosine" -> (VectorQueries.q25NearDupCosine _),
    "q26_ivf_ann" -> (VectorQueries.q26IvfAnn _),
    "q27_multimodal_decode" -> (MultimodalQueries.q27MultimodalDecode _),
    "q28_multimodal_features" -> (MultimodalQueries.q28MultimodalFeatures _),
    "q29_asof_join" -> (CoreQueries.q29AsofJoin _),
    "q32_dedup_apply" -> (TextQueries.q32DedupApply _),
    "q33_cube" -> (CoreQueries.q33Cube _),
    "q35_rh_lsh_ann" -> (VectorQueries.q35RhLshAnn _),
    "q36_dedup_components" -> (TextQueries.q36DedupComponents _),
    "q37_running_total" -> (CoreQueries.q37RunningTotal _),
    "q38_lead_lag" -> (CoreQueries.q38LeadLag _),
    "q39_pivot" -> (CoreQueries.q39Pivot _),
    "q34_top_terms" -> (TextQueries.q34TopTerms _),
    "q30_approx_distinct" -> (CoreQueries.q30ApproxDistinct _),
    "q31_label_centroids" -> (VectorQueries.q31LabelCentroids _),
    "q40_range_join" -> (CoreQueries.q40RangeJoin _),
    "q41_tfidf" -> (TextQueries.q41Tfidf _),
    "q42_stratified_sample" -> (TextQueries.q42StratifiedSample _),
    "q43_quantize" -> (VectorQueries.q43Quantize _),
    "q44_profile" -> (CoreQueries.q44Profile _),
    "q45_histogram" -> (CoreQueries.q45Histogram _),
    "q46_exact_median" -> (CoreQueries.q46ExactMedian _),
    "q47_sliding_window" -> (CoreQueries.q47SlidingWindow _),
    "q48_pack" -> (TextQueries.q48Pack _),
    "q49_redact" -> (TextQueries.q49Redact _),
    "q50_repetition" -> (TextQueries.q50Repetition _),
    "q51_approx_quantile" -> (CoreQueries.q51ApproxQuantile _),
    "q52_vocab_map" -> (TextQueries.q52VocabMap _),
    "q53_sql_surface" -> (CoreQueries.q53SqlSurface _),
    "q54_decontaminate" -> (TextQueries.q54Decontaminate _),
    "q55_chunk" -> (TextQueries.q55Chunk _),
    "q56_heavy_hitters" -> (TextQueries.q56HeavyHitters _),
    "q57_zorder" -> (CoreQueries.q57Zorder _),
    "q58_kmeans" -> (VectorQueries.q58KMeans _),
    "q59_window_suite" -> (CoreQueries.q59WindowSuite _),
    "q60_semi_anti" -> (CoreQueries.q60SemiAnti _),
    "q61_gap_fill" -> (CoreQueries.q61GapFill _),
    "q62_grouping_sets" -> (CoreQueries.q62GroupingSets _),
    "q63_session_window" -> (CoreQueries.q63SessionWindow _),
    "q64_dq_checks" -> (CoreQueries.q64DqChecks _),
    "q65_outliers" -> (CoreQueries.q65Outliers _),
    "q66_weighted_sample" -> (TextQueries.q66WeightedSample _),
    "q67_multimodal_patches" -> (MultimodalQueries.q67MultimodalPatches _),
    "q68_typed_agg" -> (TypedQueries.q68TypedAgg _),
    "q69_rank_dense" -> (CoreQueries.q69RankDense _),
    "q70_collect" -> (CoreQueries.q70Collect _),
    "q71_funnel" -> (CoreQueries.q71Funnel _),
    "q72_retention" -> (CoreQueries.q72Retention _),
    "q73_percentiles" -> (CoreQueries.q73Percentiles _),
    "q74_bigram_lm" -> (TextQueries.q74BigramLm _),
    "q75_dedup_report" -> (TextQueries.q75DedupReport _),
    "q76_pq_codes" -> (VectorQueries.q76PqCodes _),
    "q77_mix_rebalance" -> (TextQueries.q77MixRebalance _),
    "q78_gopher_quality" -> (TextQueries.q78GopherQuality _),
    "q79_semantic_dedup" -> (VectorQueries.q79SemanticDedup _),
    "q80_dup_ngram_frac" -> (TextQueries.q80DupNgramFrac _),
    "q81_fixed_sample" -> (TextQueries.q81FixedSample _),
    "q82_bm25" -> (TextQueries.q82Bm25 _),
    "q83_winnowing" -> (TextQueries.q83Winnowing _),
    "q84_pagerank" -> (TextQueries.q84PageRank _),
    "q85_ann_recall" -> (VectorQueries.q85AnnRecall _),
    "q86_curation" -> (TextQueries.q86Curation _),
    "q87_dup_span_cross" -> (TextQueries.q87DupSpanCross _),
    "q88_sketch_quantiles" -> (CoreQueries.q88SketchQuantiles _),
    "q89_incremental_distinct" -> (TextQueries.q89IncrementalDistinct _),
    "q90_multimodal_curation" -> (MultimodalQueries.q90MultimodalCuration _),
    "q91_mad_outliers" -> (CoreQueries.q91MadOutliers _),
    "q92_collocations" -> (TextQueries.q92Collocations _),
    "q93_containment" -> (TextQueries.q93Containment _),
    "q94_quantile_bins" -> (CoreQueries.q94QuantileBins _),
    "q95_semantic_dedup_capped" -> (VectorQueries.q95SemanticDedupCapped _),
    "q96_ivf_index_probe" -> (VectorQueries.q96IvfIndexProbe _),
    "q97_semantic_dedup_ingest" -> (VectorQueries.q97SemanticDedupIngest _),
    "q98_semi_hard_negatives" -> (VectorQueries.q98SemiHardNegatives _),
    "q99_hybrid_rrf" -> (VectorQueries.q99HybridRrf _),
    "q100_label_noise" -> (VectorQueries.q100LabelNoise _),
    "q101_dup_extents" -> (TextQueries.q101DupExtents _),
    "q102_source_reputation" -> (TextQueries.q102SourceReputation _),
    "q103_shuffle_manifest" -> (TextQueries.q103ShuffleManifest _),
    "q104_span_clean" -> (TextQueries.q104SpanClean _),
    "q105_incremental_spans" -> (TextQueries.q105IncrementalSpans _),
    "q106_lm_surprisal" -> (TextQueries.q106LmSurprisal _),
    "q107_frozen_lm_gate" -> (TextQueries.q107FrozenLmGate _),
    "q108_curate_steady" -> (TextQueries.q108CurateSteadyState _),
    "q109_schema_drift" -> (CoreQueries.q109SchemaDrift _),
    "q110_sequence_packing" -> (TextQueries.q110SequencePacking _),
    "q111_pack_slices" -> (TextQueries.q111PackSlices _),
    "q112_pack_ingest" -> (TextQueries.q112PackIngest _),
    "q113_mixture_packing" -> (TextQueries.q113MixturePacking _),
    "q114_stratified_slices" -> (TextQueries.q114StratifiedPackSlices _),
    "q115_bpe_merges" -> (TextQueries.q115BpeMerges _),
    "q116_bpe_segments" -> (TextQueries.q116BpeSegments _),
    "q117_bpe_packing" -> (TextQueries.q117BpeWeightedPacking _),
    "q118_token_budget_mix" -> (TextQueries.q118TokenBudgetMix _),
    "q119_stratified_pack_ingest" -> (TextQueries.q119StratifiedPackIngest _),
    "q120_bpe_pack_slices" -> (TextQueries.q120BpePackSlices _),
    "q121_epoch_order" -> (TextQueries.q121EpochOrder _),
    "q122_pack_boundaries" -> (TextQueries.q122PackBoundaries _),
    "q123_fertility_drift" -> (TextQueries.q123FertilityDrift _),
    "q124_curriculum_packing" -> (TextQueries.q124CurriculumPacking _),
    "q125_vocab_ids" -> (TextQueries.q125VocabIds _),
    "q126_packed_ids" -> (TextQueries.q126PackedIds _),
    "q127_bpe_packed_ids" -> (TextQueries.q127BpePackedIds _),
    "q128_pack_arrays" -> (TextQueries.q128PackArrays _),
    "q129_decontam_purge" -> (TextQueries.q129DecontamPurge _),
    "q130_oov_drift" -> (TextQueries.q130OovDrift _),
    "q131_pack_contam_audit" -> (TextQueries.q131PackContamAudit _),
    "q132_retire_packs" -> (TextQueries.q132RetirePacks _),
    "q133_fuzzy_decontam" -> (TextQueries.q133FuzzyDecontam _),
    "q134_mask_intervals" -> (TextQueries.q134MaskIntervals _),
    "q135_semantic_decontam" -> (VectorQueries.q135SemanticDecontam _),
    "q136_resume_slice" -> (TextQueries.q136ResumeSlice _),
    "q137_temperature_mix" -> (TextQueries.q137TemperatureMix _),
    "q138_pack_efficiency" -> (TextQueries.q138PackEfficiency _),
    "q139_apportion_budget" -> (TextQueries.q139ApportionBudget _),
    "q140_pack_provenance" -> (TextQueries.q140PackProvenance _),
    "q141_leakage_split" -> (TextQueries.q141LeakageSplit _),
    "q142_nested_sample" -> (TextQueries.q142NestedSample _),
    "q143_snapshot_diff" -> (TextQueries.q143SnapshotDiff _),
    "q144_efficiency_sweep" -> (TextQueries.q144EfficiencySweep _),
    "q145_cluster_best" -> (TextQueries.q145ClusterBest _),
    "q146_phase_quotas" -> (TextQueries.q146PhaseQuotas _),
    "q147_preference_pairs" -> (PreferenceQueries.q147PreferencePairs _),
    "q148_best_of_n" -> (PreferenceQueries.q148BestOfN _),
    "q149_length_debias" -> (PreferenceQueries.q149LengthDebias _),
    "q150_turn_flatten" -> (PreferenceQueries.q150TurnFlatten _),
    "q151_rater_agreement" -> (PreferenceQueries.q151RaterAgreement _),
    "q152_pair_decontam" -> (PreferenceQueries.q152PairDecontam _),
    "q153_sft_mask" -> (PreferenceQueries.q153SftMask _),
    "q154_sft_pack_masks" -> (PreferenceQueries.q154SftPackMasks _),
    "q155_pref_ingest" -> (PreferenceQueries.q155PrefIngest _),
    "q158_sft_bpe_mask" -> (PreferenceQueries.q158SftBpeMask _),
    "q159_response_dedup" -> (PreferenceQueries.q159ResponseDedup _),
    "q160_win_matrix" -> (PreferenceQueries.q160WinMatrix _),
    "q156_kto_labels" -> (PreferenceQueries.q156KtoLabels _),
    "q157_grpo_advantage" -> (PreferenceQueries.q157GroupAdvantage _),
    "q161_win_ingest" -> (PreferenceQueries.q161WinIngest _),
    "q162_decode_packs" -> (TextQueries.q162DecodePacks _),
    "q163_bt_ratings" -> (PreferenceQueries.q163BtRatings _),
    "q164_dsir_select" -> (TextQueries.q164DsirSelect _),
    "q165_budget_exhaustion" -> (TextQueries.q165BudgetExhaustion _),
    "q166_bt_calibration" -> (PreferenceQueries.q166BtCalibration _),
    "q167_vocab_coverage" -> (TextQueries.q167VocabCoverage _),
    "q168_semantic_packing" -> (TextQueries.q168SemanticPacking _),
    "q169_length_bias_slope" -> (PreferenceQueries.q169LengthBiasSlope _),
    "q170_dup_profile" -> (TextQueries.q170DupProfile _),
    "q171_sliding_chunks" -> (TextQueries.q171SlidingChunks _),
    "q172_tree_paths" -> (PreferenceQueries.q172TreePaths _),
    "q173_fewshot_prompts" -> (TextQueries.q173FewshotPrompts _),
    "q174_tree_render" -> (PreferenceQueries.q174TreeRender _),
    "q175_bpe_chunks" -> (TextQueries.q175BpeChunks _),
    "q176_fewshot_distinct" -> (TextQueries.q176FewshotDistinct _),
    "q177_branch_pairs" -> (PreferenceQueries.q177BranchPairs _),
    "q178_branch_pairs_rendered" -> (PreferenceQueries.q178BranchPairsRendered _),
    "q179_tree_state" -> (PreferenceQueries.q179TreeState _),
    "q180_dpo_token_coords" -> (PreferenceQueries.q180DpoTokenCoords _),
    "q181_dpo_length_bias" -> (PreferenceQueries.q181DpoLengthBias _),
    "q182_dpo_eval_decontam" -> (PreferenceQueries.q182DpoEvalDecontam _),
    "q183_dpo_length_batches" -> (PreferenceQueries.q183DpoLengthBatches _),
    "q184_dpo_batch_padding" -> (PreferenceQueries.q184DpoBatchPadding _),
    "q185_state_served_pairs" -> (PreferenceQueries.q185StateServedPairs _),
    "q186_state_served_render" -> (PreferenceQueries.q186StateServedRender _)
  )

  /** Declared queries whose bench number times a DURABLE-STATE
    * COMPOSITION or an in-query model training by design — scratch
    * state dirs, multi-batch ingest folds, or a full BPE training run
    * inside the query (the oracle replays the whole composition, so
    * the query must carry it). Their timings track scratch-fs
    * throughput and composition cost, not single-operator latency;
    * Bench publishes the plain/composition split so the perf gate can
    * be read without re-deriving this taxonomy from COVERAGE.md's NB
    * notes. Mechanical membership rule: the query's implementation
    * materializes scratch durable state (`createTempDirectory`),
    * invokes `Bpe.learn`/`learnMerges` (directly or via its q11x
    * helper), OR re-executes a full multi-operator fixture CHAIN per
    * rep as its input (chain-recomputation rows: q182 re-runs the
    * whole q178 walk+render chain before its own purge — it trains
    * nothing and persists nothing, but its bench row prices the chain,
    * not a plain operator, so counting it "plain" would overstate
    * plain-operator cost).
    */
  val compositionQueries: Set[String] = Set(
    "q89_incremental_distinct",
    "q96_ivf_index_probe",
    "q97_semantic_dedup_ingest",
    "q105_incremental_spans",
    "q107_frozen_lm_gate",
    "q108_curate_steady",
    "q109_schema_drift",
    "q112_pack_ingest",
    "q115_bpe_merges",
    "q116_bpe_segments",
    "q117_bpe_packing",
    "q119_stratified_pack_ingest",
    "q120_bpe_pack_slices",
    "q123_fertility_drift",
    "q127_bpe_packed_ids",
    "q155_pref_ingest",
    "q158_sft_bpe_mask",
    "q161_win_ingest",
    "q175_bpe_chunks",
    "q179_tree_state",
    "q180_dpo_token_coords",
    "q181_dpo_length_bias",
    "q182_dpo_eval_decontam",
    "q183_dpo_length_batches",
    "q184_dpo_batch_padding",
    "q185_state_served_pairs",
    "q186_state_served_render"
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = oracleSqlBase ++ {
    // Serving from state ≡ serving from scratch: the state-served
    // rows' oracles ARE the from-scratch walks over the full store —
    // q185 must hash-equal q178's triples and q186 must hash-equal
    // q174's render, with the Spark side reading a 3-fold TreeState
    // instead of re-walking.
    Map(
      "q185_state_served_pairs" -> "q178_branch_pairs_rendered",
      "q186_state_served_render" -> "q174_tree_render"
    ).map { case (k, src) => k -> oracleSqlBase(src) }
  }

  private def oracleSqlBase: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      "SELECT event_id, user_id, value, props FROM events WHERE event_type = 'click'",
    "q3_users_latest" ->
      """SELECT user_id, ts AS last_ts, event_type AS last_event_type, value AS last_value
        |FROM (SELECT *, max(ts) OVER (PARTITION BY user_id) AS max_ts FROM events)
        |WHERE ts = max_ts AND user_id IS NOT NULL""".stripMargin,
    "q4_time_dims" ->
      """SELECT start_time,
        |  CAST(hour(start_time) AS INTEGER) AS hour,
        |  CAST(day(start_time) AS INTEGER) AS day,
        |  CAST(weekofyear(start_time) AS INTEGER) AS week,
        |  CAST(month(start_time) AS INTEGER) AS month,
        |  CAST(year(start_time) AS INTEGER) AS year,
        |  CAST(dayofweek(start_time) + 1 AS INTEGER) AS weekday
        |FROM (SELECT DISTINCT date_trunc('second', ts) AS start_time FROM events)""".stripMargin,
    "q5_distinct" ->
      "SELECT DISTINCT c_mktsegment AS mktsegment, c_nationkey AS nationkey FROM customer",
    "q6_join_full_using" ->
      """SELECT custkey, o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM (SELECT o_custkey AS custkey, o_orderkey, o_totalprice FROM orders) o
        |FULL JOIN (SELECT c_custkey AS custkey, c_name, c_mktsegment FROM customer) c
        |USING (custkey)""".stripMargin,
    "q7_join_left_multi" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_quantity, d.max_qty
        |FROM lineitem l
        |LEFT JOIN (SELECT l_partkey AS pk, max(l_quantity) AS max_qty FROM lineitem GROUP BY 1) d
        |ON l.l_partkey = d.pk AND l.l_quantity = d.max_qty""".stripMargin,
    "q8_join_left_using" ->
      """SELECT orderkey, l_linenumber, l_extendedprice, o_orderdate, o_orderpriority
        |FROM (SELECT l_orderkey AS orderkey, l_linenumber, l_extendedprice FROM lineitem) l
        |LEFT JOIN (SELECT o_orderkey AS orderkey, o_orderdate, o_orderpriority FROM orders) o
        |USING (orderkey)""".stripMargin,
    "q9_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin,
    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q11_sessionize" ->
      """SELECT event_id, user_id, CAST(session_seq AS BIGINT) AS session_seq FROM (
        |  SELECT event_id, user_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |      CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |             OR es - lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
        |           THEN 1 ELSE 0 END AS new_sess
        |    FROM (SELECT event_id, user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)))""".stripMargin,
    "q12_star_join" ->
      """SELECT n_name AS nation,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q13_setops" ->
      """SELECT nationkey, 'both' AS side FROM
        |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |   INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'cust_only' AS side FROM
        |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |   EXCEPT SELECT DISTINCT s_nationkey FROM supplier)""".stripMargin,
    "q14_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q15_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q16_agg_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY event_type""".stripMargin,
    "q17_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q18_text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(t) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS avg_token_len,
        |  CAST(len(list_filter(t, x -> x IN ('the','a','and','of'))) AS DOUBLE) / len(t) AS stopword_ratio,
        |  CAST(CASE WHEN len(t) >= 10 AND CAST(len(list_filter(t, x -> x IN ('the','a','and','of'))) AS DOUBLE) / len(t) > 0.0
        |       THEN 1.0 ELSE 0.5 END AS DOUBLE) AS quality_score
        |FROM (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS t FROM documents)""".stripMargin,
    "q19_lang_id" ->
      """SELECT doc_id, declared_lang,
        |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
        |       WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END AS predicted_lang,
        |  CAST(s_en AS INTEGER) AS score_en
        |FROM (SELECT doc_id, lang AS declared_lang,
        |    len(list_filter(t, x -> x IN ('the','a','and','of'))) AS s_en,
        |    len(list_filter(t, x -> x IN ('el','la','los','de'))) AS s_es,
        |    len(list_filter(t, x -> x IN ('le','la','les','de'))) AS s_fr,
        |    len(list_filter(t, x -> x IN ('der','die','das','und'))) AS s_de
        |  FROM (SELECT doc_id, lang, regexp_split_to_array(text, '\s+') AS t FROM documents))""".stripMargin,
    "q20_fingerprint" ->
      """SELECT doc_id, md5(norm) AS md5_fingerprint,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_split_to_array(norm, '\s+'),
        |                     s -> CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 2147483647) AS rolling_fingerprint
        |FROM (SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm FROM documents)""".stripMargin,
    "q21_ngram_jaccard" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared,
        |  CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) AS jaccard
        |FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5""".stripMargin,
    "q22_minhash_lsh" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id, sh_ints FROM (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk) WHERE len(sh_ints) > 0),
        |sig AS (SELECT doc_id,
        |    list_transform(range(0, 16), i -> list_min(list_transform(sh_ints, x -> ((i*2+3)*x + i*97 + 11) % 2147483647))) AS sig
        |  FROM sh),
        |bands AS (SELECT doc_id, bb.band AS band,
        |    array_to_string(list_transform(sig[bb.band*4+1 : bb.band*4+4], x -> CAST(x AS VARCHAR)), '_') AS band_key
        |  FROM sig, (SELECT unnest(range(0, 4)) AS band) bb),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(sa.sh_ints, sb.sh_ints)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh_ints, sb.sh_ints))) AS jaccard
        |FROM cand JOIN sh sa ON sa.doc_id = cand.doc_a JOIN sh sb ON sb.doc_id = cand.doc_b
        |WHERE CAST(len(list_intersect(sa.sh_ints, sb.sh_ints)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh_ints, sb.sh_ints))) >= 0.3""".stripMargin,
    "q23_simhash" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 28), b ->
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(th, h ->
        |           CASE WHEN CAST(floor(h / power(2, b)) AS BIGINT) % 2 = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
        |         (acc, v) -> acc + v) > 0
        |    THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
        |  (acc, v) -> acc + v) AS simhash
        |FROM (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |        s -> CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT)) AS th FROM documents)""".stripMargin,
    "q24_knn_brute" ->
      """WITH n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM n WHERE vec_id < 5),
        |scored AS (SELECT query_id, vec_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q_emb, emb), p -> p[1]*p[2])), (a,v) -> a+v) / (q_nrm * nrm) AS cosine
        |  FROM q, n WHERE vec_id >= 5)
        |SELECT query_id, vec_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank FROM scored)
        |WHERE rank <= 10""".stripMargin,
    "q25_near_dup_cosine" ->
      """WITH n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings)
        |SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) AS cosine
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) >= 0.30""".stripMargin,
    "q26_ivf_ann" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS cent_id, emb AS cent_emb, nrm AS cent_nrm FROM n WHERE vec_id % 100 = 0),
        |assigned AS (SELECT vec_id, emb, nrm, cluster FROM (
        |  SELECT n.vec_id, n.emb, n.nrm, c.cent_id AS cluster,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(n.emb, c.cent_emb), p -> p[1]*p[2])), (a,v) -> a+v) / (n.nrm * c.cent_nrm) DESC,
        |        c.cent_id ASC) AS arn
        |  FROM n, cent c) WHERE arn = 1),
        |q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, cluster FROM assigned WHERE vec_id < 5)
        |SELECT query_id, cluster, vec_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
        |  SELECT q.query_id, q.cluster, a.vec_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q.q_emb, a.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (q.q_nrm * a.nrm) AS cosine,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q.q_emb, a.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (q.q_nrm * a.nrm) DESC,
        |      a.vec_id ASC) AS rank
        |  FROM q JOIN assigned a ON q.cluster = a.cluster WHERE a.vec_id >= 5)
        |WHERE rank <= 5""".stripMargin,
    "q27_multimodal_decode" ->
      """WITH a AS (SELECT doc_id AS asset_id, text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    md5(text) AS h FROM documents),
        |dec AS (SELECT asset_id, media_type,
        |    CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
        |    h AS content_md5,
        |    CAST(16 + CAST(concat('0x', substr(md5(concat(h, 'w')), 1, 7)) AS BIGINT) % 1024 AS INTEGER) AS width,
        |    CAST(16 + CAST(concat('0x', substr(md5(concat(h, 'h')), 1, 7)) AS BIGINT) % 1024 AS INTEGER) AS height,
        |    CAST(1 + CAST(concat('0x', substr(md5(concat(h, 'f')), 1, 7)) AS BIGINT) % 240 AS INTEGER) AS n_frames
        |  FROM a)
        |SELECT asset_id, media_type, byte_len, content_md5, width, height, n_frames,
        |  CAST(CASE WHEN media_type = 'video' THEN (n_frames - 1) // 10 + 1 ELSE 0 END AS BIGINT) AS n_sampled
        |FROM dec""".stripMargin,
    "q28_multimodal_features" ->
      """WITH a AS (SELECT doc_id AS asset_id, md5(text) AS h FROM documents),
        |dec AS (SELECT asset_id, h AS content_md5,
        |    CAST(16 + CAST(concat('0x', substr(md5(concat(h, 'w')), 1, 7)) AS BIGINT) % 1024 AS INTEGER) AS width,
        |    CAST(16 + CAST(concat('0x', substr(md5(concat(h, 'h')), 1, 7)) AS BIGINT) % 1024 AS INTEGER) AS height
        |  FROM a)
        |SELECT asset_id,
        |  CAST(greatest(CAST(floor(width / 2) AS INTEGER), 1) AS INTEGER) AS width,
        |  CAST(greatest(CAST(floor(height / 2) AS INTEGER), 1) AS INTEGER) AS height,
        |  CAST(CAST(concat('0x', substr(md5(concat(content_md5, '0')), 1, 7)) AS BIGINT) AS DOUBLE) / CAST(268435456 AS DOUBLE) AS f0,
        |  CAST(CAST(concat('0x', substr(md5(concat(content_md5, '1')), 1, 7)) AS BIGINT) AS DOUBLE) / CAST(268435456 AS DOUBLE) AS f1,
        |  CAST(CAST(concat('0x', substr(md5(concat(content_md5, '2')), 1, 7)) AS BIGINT) AS DOUBLE) / CAST(268435456 AS DOUBLE) AS f2,
        |  CAST(CAST(concat('0x', substr(md5(concat(content_md5, '3')), 1, 7)) AS BIGINT) AS DOUBLE) / CAST(268435456 AS DOUBLE) AS f3
        |FROM dec""".stripMargin,
    "q37_running_total" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM orders""".stripMargin,
    "q38_lead_lag" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(date_diff('day', prev_date, o_orderdate) AS INTEGER) AS days_since_prev,
        |  CAST(date_diff('day', o_orderdate, next_date) AS INTEGER) AS days_until_next
        |FROM (SELECT o_orderkey, o_custkey, o_orderdate,
        |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date,
        |    lead(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_date
        |  FROM orders)""".stripMargin,
    "q39_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin,
    "q36_dedup_components" ->
      """WITH RECURSIVE tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
        |SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id""".stripMargin,
    "q35_rh_lsh_ann" ->
      """WITH planes AS (SELECT list_transform(range(0, 6), j -> list_transform(range(0, 64), d ->
        |    CASE WHEN CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', CAST(d AS VARCHAR))), 1, 7)) AS BIGINT) % 2 = 1
        |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)) AS pl),
        |n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |b AS (SELECT vec_id, emb, nrm,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 6), j ->
        |      CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(emb, pl[j+1]), p -> p[1]*p[2])), (a,v) -> a+v) > 0
        |           THEN CAST(power(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)), (a,v) -> a+v) AS BIGINT) AS bucket
        |  FROM n, planes),
        |q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, bucket FROM b WHERE vec_id < 5)
        |SELECT query_id, bucket, vec_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
        |  SELECT q.query_id, q.bucket, c.vec_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q.q_emb, c.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (q.q_nrm * c.nrm) AS cosine,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q.q_emb, c.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (q.q_nrm * c.nrm) DESC,
        |      c.vec_id ASC) AS rank
        |  FROM q JOIN b c ON q.bucket = c.bucket WHERE c.vec_id >= 5)
        |WHERE rank <= 5""".stripMargin,
    "q33_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q34_top_terms" ->
      """SELECT lang, token, df, rk FROM (
        |  SELECT lang, token, df,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY df DESC, token ASC) AS INTEGER) AS rk
        |  FROM (SELECT lang, token, count(*) AS df FROM (
        |      SELECT doc_id, lang, unnest(list_distinct(regexp_split_to_array(text, '\s+'))) AS token
        |      FROM documents) GROUP BY lang, token))
        |WHERE rk <= 5""".stripMargin,
    "q29_asof_join" ->
      """SELECT e.event_id, e.user_id, r.o_orderdate AS asof_o_orderdate, r.last_order_price
        |FROM events e ASOF LEFT JOIN
        |  (SELECT o_custkey AS user_id, o_orderdate, max(o_totalprice) AS last_order_price
        |   FROM orders GROUP BY 1, 2) r
        |ON e.user_id = r.user_id AND e.ts >= r.o_orderdate""".stripMargin,
    // q30: exact counts hash-compare directly; the HLL++ estimates are
    // folded into the same hash as relative-error flags the oracle
    // asserts as literal TRUE (sketch VALUES are engine-specific, the
    // 5%-of-exact bound is not).
    "q30_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(*) AS n,
        |  TRUE AS parts_within_5pct,
        |  TRUE AS orders_within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q32_dedup_apply" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |keep_exact AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        |SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (SELECT doc_id FROM keep_exact)
        |  AND doc_id NOT IN (SELECT doc_b FROM pairs)""".stripMargin,
    "q40_range_join" ->
      """WITH p AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ces FROM events
        |      WHERE event_type = 'click')
        |SELECT p.event_id, count(*) AS n_clicks, min(p.es - c.ces) AS min_gap_s
        |FROM p JOIN c ON c.ces BETWEEN p.es - 600 AND p.es
        |GROUP BY p.event_id""".stripMargin,
    "q41_tfidf" ->
      """WITH tf AS (SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents)
        |  GROUP BY doc_id, token),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, token, tf, df, score, rk FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |    tf.tf * (CAST(n.n_docs + 1 AS DOUBLE) / (dfreq.df + 1)) AS score,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * (CAST(n.n_docs + 1 AS DOUBLE) / (dfreq.df + 1)) DESC, tf.token ASC)
        |      AS INTEGER) AS rk
        |  FROM tf JOIN dfreq USING (token), n)
        |WHERE rk <= 3""".stripMargin,
    "q42_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(concat('0x', substr(md5(concat(lang, '_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 100
        |      < CASE WHEN lang = 'en' THEN 50 WHEN lang = 'es' THEN 25 ELSE 10 END""".stripMargin,
    "q43_quantize" ->
      """SELECT vec_id,
        |  list_min(emb) AS q_min,
        |  list_max(emb) AS q_max,
        |  CASE WHEN list_max(emb) = list_min(emb) THEN CAST(0 AS BIGINT)
        |       ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(emb,
        |              v -> least(CAST(floor(((v - list_min(emb)) * 255) / (list_max(emb) - list_min(emb))) AS BIGINT), 255))),
        |            (a, b) -> a + b) END AS q_checksum,
        |  CASE WHEN list_max(emb) = list_min(emb) THEN CAST(0.0 AS DOUBLE)
        |       ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(emb,
        |              v -> abs(v - (list_min(emb) +
        |                (CAST(least(CAST(floor(((v - list_min(emb)) * 255) / (list_max(emb) - list_min(emb))) AS BIGINT), 255) AS DOUBLE)
        |                 * (list_max(emb) - list_min(emb))) / 255)))),
        |            (a, b) -> a + b) / 64 END AS mean_abs_err
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)""".stripMargin,
    "q44_profile" ->
      """SELECT 'o_orderstatus' AS column_name, count(*) AS n,
        |  CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*),
        |  CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*),
        |  CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders""".stripMargin,
    "q45_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1""".stripMargin,
    "q46_exact_median" ->
      """SELECT l_returnflag, cnt AS n, l_quantity AS median_qty FROM (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem)
        |WHERE rn = (cnt + 1) // 2""".stripMargin,
    "q47_sliding_window" ->
      """SELECT ws AS window_start, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
        |             value
        |      FROM events)
        |GROUP BY ws""".stripMargin,
    "q48_pack" ->
      """SELECT doc_id, lang, n_tok, CAST((cum - n_tok) // 2048 AS BIGINT) AS bin FROM (
        |  SELECT doc_id, lang, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok,
        |    sum(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT))
        |      OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents)""".stripMargin,
    "q49_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(customer|supplier|part)\b')) AS INTEGER) AS n_matches,
        |  CAST(length(regexp_replace(text, '\b(customer|supplier|part)\b', '<ENT>', 'g')) AS INTEGER) AS redacted_len,
        |  md5(regexp_replace(text, '\b(customer|supplier|part)\b', '<ENT>', 'g')) AS redacted_md5
        |FROM documents""".stripMargin,
    "q50_repetition" ->
      """WITH th AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(th)),
        |    i -> (th[i] * 8191 + th[i+1]) % 2147483647)) AS bigram
        |  FROM th WHERE len(th) >= 2),
        |cnt AS (SELECT doc_id, bigram, count(*) AS cnt FROM bi GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams, max(cnt) AS max_rep,
        |  CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT) AS rep_ratio
        |FROM cnt GROUP BY doc_id""".stripMargin,
    "q51_approx_quantile" ->
      """SELECT l_returnflag, cnt AS n, l_quantity AS median_qty, TRUE AS median_within_1 FROM (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem)
        |WHERE rn = (cnt + 1) // 2""".stripMargin,
    "q52_vocab_map" ->
      """WITH inst AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents),
        |vocab AS (SELECT token, TRUE AS in_vocab FROM (
        |    SELECT token, count(DISTINCT doc_id) AS df FROM inst GROUP BY token)
        |  ORDER BY df DESC, token ASC LIMIT 30)
        |SELECT i.doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_rate
        |FROM inst i LEFT JOIN vocab v ON i.token = v.token
        |GROUP BY i.doc_id""".stripMargin,
    "q53_sql_surface" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-06-30 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue_cents DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q54_decontaminate" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle,
        |  CAST(concat('0x', substr(md5(concat('ev_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 10 = 0 AS is_eval
        |  FROM sh)
        |SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc, count(*) AS n_shared,
        |  CAST(count(*) AS DOUBLE) / t.n_sh AS containment
        |FROM (SELECT * FROM inv WHERE NOT is_eval) t
        |JOIN (SELECT * FROM inv WHERE is_eval) e ON t.shingle = e.shingle
        |GROUP BY t.doc_id, e.doc_id, t.n_sh
        |HAVING CAST(count(*) AS DOUBLE) / t.n_sh >= 0.5""".stripMargin,
    "q55_chunk" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |c AS (SELECT doc_id, t, len(t) AS n, unnest(range(0, (len(t) - 1) // 48 + 1)) AS i FROM tk)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |  CAST(least(64, n - i * 48) AS INTEGER) AS n_chunk_tokens,
        |  md5(array_to_string(t[i * 48 + 1 : i * 48 + 64], ' ')) AS chunk_md5
        |FROM c""".stripMargin,
    "q57_zorder" ->
      """WITH mm AS (SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx,
        |    min(l_suppkey) AS smn, max(l_suppkey) AS smx FROM lineitem),
        |q AS (SELECT l_orderkey, l_linenumber,
        |    ((l_partkey - pmn) * 255) // greatest(1, pmx - pmn) AS qx,
        |    ((l_suppkey - smn) * 255) // greatest(1, smx - smn) AS qy
        |  FROM lineitem, mm)
        |SELECT l_orderkey, l_linenumber, CAST(list_sum(list_transform(range(0, 8),
        |    b -> ((qx >> b) & 1) * (CAST(1 AS BIGINT) << (2*b)) + ((qy >> b) & 1) * (CAST(2 AS BIGINT) << (2*b)))) AS BIGINT) AS zval
        |FROM q""".stripMargin,
    "q59_window_suite" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q60_semi_anti" ->
      """SELECT c_custkey, c_name, 'has_orders' AS side FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, c_name, 'no_orders' AS side FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)""".stripMargin,
    "q61_gap_fill" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h, value FROM events WHERE user_id IS NOT NULL),
        |hourly AS (SELECT user_id, h, count(*) AS n_ev,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM e GROUP BY user_id, h),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span)
        |SELECT g.user_id, g.h, coalesce(n_ev, 0) AS n_ev,
        |  last_value(cents IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_ff
        |FROM grid g LEFT JOIN hourly USING (user_id, h)""".stripMargin,
    "q62_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())""".stripMargin,
    "q63_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, epoch_us(CAST(ts AS TIMESTAMP)) AS es
        |  FROM events WHERE user_id IS NOT NULL),
        |s AS (SELECT user_id, ts, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (SELECT user_id, ts, es,
        |      CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |             OR es - lag(es) OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
        |           THEN 1 ELSE 0 END AS new_sess
        |    FROM e))
        |SELECT user_id, min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_ev
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q64_dq_checks" ->
      """SELECT 'orders_orphan_custkey' AS check_name,
        |  (SELECT count(*) FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) AS n_violations
        |UNION ALL SELECT 'lineitem_orphan_orderkey',
        |  (SELECT count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        |UNION ALL SELECT 'customer_dup_custkey',
        |  (SELECT count(*) FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1))
        |UNION ALL SELECT 'events_null_user',
        |  (SELECT count(*) FROM events WHERE user_id IS NULL)
        |UNION ALL SELECT 'events_negative_value',
        |  (SELECT count(*) FROM events WHERE value < 0)""".stripMargin,
    "q66_weighted_sample" ->
      """SELECT doc_id, n_chars, lang FROM documents
        |WHERE CAST(concat('0x', substr(md5(concat('ws_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 10000
        |      < least(10000, n_chars * 5)""".stripMargin,
    "q74_bigram_lm" ->
      """WITH tk AS (SELECT regexp_split_to_array(text, '\s+') AS t FROM documents),
        |bg AS (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2 FROM tk WHERE len(t) >= 2),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |uni AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)
        |SELECT b.w1, b.w2, b.c12, u.c1, CAST(b.c12 AS DOUBLE) / u.c1 AS p_cond
        |FROM big b JOIN uni u ON b.w1 = u.w1 WHERE b.c12 >= 3""".stripMargin,
    "q75_dedup_report" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |d AS (SELECT doc_id, lang FROM documents),
        |per_lang AS (SELECT lang, count(*) AS n_docs FROM d GROUP BY 1),
        |np AS (SELECT d.lang, count(*) AS n_pairs FROM pairs p JOIN d ON p.doc_a = d.doc_id GROUP BY 1),
        |dd AS (SELECT d.lang, count(*) AS n_dup_docs FROM
        |  (SELECT DISTINCT doc_id FROM (SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs))
        |  u JOIN d ON u.doc_id = d.doc_id GROUP BY 1)
        |SELECT pl.lang, pl.n_docs, coalesce(np.n_pairs, 0) AS n_pairs,
        |  coalesce(dd.n_dup_docs, 0) AS n_dup_docs,
        |  CAST(coalesce(dd.n_dup_docs, 0) AS DOUBLE) / pl.n_docs AS dup_rate
        |FROM per_lang pl LEFT JOIN np ON pl.lang = np.lang LEFT JOIN dd ON pl.lang = dd.lang""".stripMargin,
    "q76_pq_codes" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 4),
        |d AS (SELECT e.vec_id, c.cent_id, unnest([0, 1, 2, 3]) AS s,
        |    unnest(list_transform([0, 1, 2, 3], sx ->
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(list_zip(e.v[sx*16+1 : sx*16+16], c.cv[sx*16+1 : sx*16+16]),
        |          p -> (p[1]-p[2])*(p[1]-p[2]))), (a,x) -> a+x))) AS dist
        |  FROM e, c),
        |r AS (SELECT vec_id, s, cent_id,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cent_id) AS rn FROM d)
        |SELECT vec_id,
        |  min(CASE WHEN s = 0 THEN cent_id END) AS code0,
        |  min(CASE WHEN s = 1 THEN cent_id END) AS code1,
        |  min(CASE WHEN s = 2 THEN cent_id END) AS code2,
        |  min(CASE WHEN s = 3 THEN cent_id END) AS code3
        |FROM r WHERE rn = 1 GROUP BY vec_id""".stripMargin,
    "q77_mix_rebalance" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
        |rates AS (SELECT lang,
        |    least(1000000, CAST(floor(
        |      CASE WHEN lang = 'en' THEN CAST(0.4 AS DOUBLE)
        |           WHEN lang = 'es' THEN CAST(0.3 AS DOUBLE)
        |           WHEN lang = 'fr' THEN CAST(0.2 AS DOUBLE)
        |           ELSE CAST(0.1 AS DOUBLE) END
        |      * (SELECT count(*) FROM d) * 1000000.0 / count(*)) AS BIGINT)) AS keep_ppm
        |  FROM d GROUP BY lang)
        |SELECT d.doc_id, d.lang, r.keep_ppm
        |FROM d JOIN rates r ON d.lang = r.lang
        |WHERE CAST(concat('0x', substr(md5(concat(d.lang, '_', CAST(d.doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000000
        |      < r.keep_ppm""".stripMargin,
    "q86_curation" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(t) AS INTEGER) AS n,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(t, w -> CAST(length(w) AS BIGINT))), (a, x) -> a + x) AS sum_len,
        |    CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]'))) AS INTEGER) AS n_alpha,
        |    CAST(len(list_filter(t, w -> w IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS n_stop
        |  FROM tk),
        |qk AS (SELECT doc_id FROM m WHERE n >= 50 AND n <= 100000
        |  AND sum_len >= CAST(n AS BIGINT) * 3 AND sum_len <= CAST(n AS BIGINT) * 10
        |  AND n_alpha * 10 >= n * 8 AND n_stop >= 2),
        |kept1 AS (SELECT d.* FROM documents d JOIN qk ON d.doc_id = qk.doc_id),
        |keepmin AS (SELECT min(doc_id) AS doc_id FROM kept1 GROUP BY md5(text)),
        |kept2 AS (SELECT k.* FROM kept1 k JOIN keepmin km ON k.doc_id = km.doc_id),
        |th AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM th),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |kept3 AS (SELECT doc_id, lang, n_chars FROM kept2
        |  WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
        |rates AS (SELECT lang,
        |    least(1000000, CAST(floor(
        |      CASE WHEN lang = 'en' THEN CAST(0.4 AS DOUBLE)
        |           WHEN lang = 'es' THEN CAST(0.3 AS DOUBLE)
        |           WHEN lang = 'fr' THEN CAST(0.2 AS DOUBLE)
        |           ELSE CAST(0.1 AS DOUBLE) END
        |      * (SELECT count(*) FROM kept3) * 1000000.0 / count(*)) AS BIGINT)) AS keep_ppm
        |  FROM kept3 GROUP BY lang)
        |SELECT k.doc_id, k.lang, k.n_chars
        |FROM kept3 k JOIN rates r ON k.lang = r.lang
        |WHERE CAST(concat('0x', substr(md5(concat('mx_', k.lang, '_', CAST(k.doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000000
        |      < r.keep_ppm""".stripMargin,
    "q85_ann_recall" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM n WHERE vec_id < 5),
        |brute AS (SELECT query_id, vec_id FROM (
        |  SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q_emb, emb), p -> p[1]*p[2])), (a,v) -> a+v) / (q_nrm * nrm) DESC,
        |    vec_id ASC) AS rank
        |  FROM q, n WHERE vec_id >= 5) WHERE rank <= 10),
        |cent AS (SELECT vec_id AS cent_id, emb AS cent_emb, nrm AS cent_nrm FROM n WHERE vec_id % 100 = 0),
        |assigned AS (SELECT vec_id, emb, nrm, cluster FROM (
        |  SELECT n.vec_id, n.emb, n.nrm, c.cent_id AS cluster,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(n.emb, c.cent_emb), p -> p[1]*p[2])), (a,v) -> a+v) / (n.nrm * c.cent_nrm) DESC,
        |        c.cent_id ASC) AS arn
        |  FROM n, cent c) WHERE arn = 1),
        |qa AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, cluster FROM assigned WHERE vec_id < 5),
        |approx AS (SELECT query_id, vec_id FROM (
        |  SELECT qa.query_id, a.vec_id,
        |    row_number() OVER (PARTITION BY qa.query_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(qa.q_emb, a.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (qa.q_nrm * a.nrm) DESC,
        |      a.vec_id ASC) AS rank
        |  FROM qa JOIN assigned a ON qa.cluster = a.cluster WHERE a.vec_id >= 5) WHERE rank <= 10)
        |SELECT b.query_id, CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / 10 AS recall_at_10
        |FROM brute b LEFT JOIN approx ap ON b.query_id = ap.query_id AND b.vec_id = ap.vec_id
        |GROUP BY b.query_id""".stripMargin,
    "q84_pagerank" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
        |r1 AS (SELECT e.dst AS src,
        |    CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) *
        |      (CAST(CAST(sum(CAST(floor(CAST(1.0 AS DOUBLE) / d.deg * 1073741824.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1073741824.0) AS r
        |  FROM edges e JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS src,
        |    CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) *
        |      (CAST(CAST(sum(CAST(floor(r1.r / d.deg * 1073741824.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1073741824.0) AS r
        |  FROM edges e JOIN deg d ON e.src = d.src JOIN r1 ON e.src = r1.src GROUP BY e.dst)
        |SELECT r1.src AS doc_id, r1.r AS rank_iter1, r2.r AS rank_iter2
        |FROM r1 JOIN r2 ON r1.src = r2.src""".stripMargin,
    "q83_winnowing" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sq AS (SELECT doc_id, list_transform(range(1, len(th) - 1),
        |    i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647) AS sh_seq
        |  FROM tk WHERE len(th) >= 6),
        |fp AS (SELECT doc_id, list_distinct(list_transform(range(1, len(sh_seq) - 2),
        |    i -> list_aggregate(sh_seq[i:i+3], 'min'))) AS fps FROM sq)
        |SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fps,
        |  CAST(list_aggregate(fps, 'min') AS BIGINT) AS fp_min,
        |  CAST(list_aggregate(fps, 'max') AS BIGINT) AS fp_max,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), fps), (a, x) -> a + x) AS fp_sum
        |FROM fp""".stripMargin,
    "q81_fixed_sample" ->
      """SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST(concat('0x', substr(md5(concat('fs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) ASC,
        |      doc_id ASC) AS rk
        |  FROM documents) WHERE rk <= 30""".stripMargin,
    "q82_bm25" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |dl AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS dl FROM tk),
        |inst AS (SELECT doc_id, unnest(t) AS token FROM tk),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM inst
        |  WHERE token IN ('spark', 'table') GROUP BY 1, 2),
        |wide AS (SELECT doc_id,
        |    max(CASE WHEN token = 'spark' THEN tf END) AS tf_a,
        |    max(CASE WHEN token = 'table' THEN tf END) AS tf_b
        |  FROM tf GROUP BY 1),
        |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT (SELECT count(*) FROM dl) AS n_docs,
        |    (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl,
        |    (SELECT df FROM dfq WHERE token = 'spark') AS df_a,
        |    (SELECT df FROM dfq WHERE token = 'table') AS df_b)
        |SELECT w.doc_id,
        |  coalesce(w.tf_a, 0) AS tf_a,
        |  coalesce(w.tf_b, 0) AS tf_b,
        |  (CASE WHEN w.tf_a IS NOT NULL THEN
        |     ((CAST(s.n_docs AS DOUBLE) - s.df_a + CAST(0.5 AS DOUBLE)) / (s.df_a + CAST(0.5 AS DOUBLE)))
        |     * (w.tf_a * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        |     / (w.tf_a + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |         + CAST(0.75 AS DOUBLE) * (CAST(d.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
        |   ELSE CAST(0.0 AS DOUBLE) END
        |  + CASE WHEN w.tf_b IS NOT NULL THEN
        |     ((CAST(s.n_docs AS DOUBLE) - s.df_b + CAST(0.5 AS DOUBLE)) / (s.df_b + CAST(0.5 AS DOUBLE)))
        |     * (w.tf_b * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        |     / (w.tf_b + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |         + CAST(0.75 AS DOUBLE) * (CAST(d.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
        |   ELSE CAST(0.0 AS DOUBLE) END) AS bm25
        |FROM wide w JOIN dl d ON w.doc_id = d.doc_id, stats s""".stripMargin,
    "q80_dup_ngram_frac" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |m AS (SELECT doc_id, CAST(len(th) - 2 AS INTEGER) AS n_3grams,
        |    CAST(len(list_distinct(list_transform(range(1, len(th) - 1),
        |      i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))) AS INTEGER) AS n_distinct
        |  FROM tk WHERE len(th) >= 3)
        |SELECT doc_id, n_3grams, n_distinct,
        |  CAST(1.0 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / n_3grams AS dup_frac,
        |  (n_distinct * 10 >= n_3grams * 7) AS pass_dup_ngram
        |FROM m""".stripMargin,
    "q87_dup_span_cross" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |pos AS (SELECT doc_id, unnest(CASE WHEN len(th) >= 3
        |      THEN list_transform(range(1, len(th) - 1),
        |        i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647)
        |      ELSE [] END) AS h FROM tk),
        |spans AS (SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM pos GROUP BY h),
        |cnt AS (SELECT p.doc_id,
        |    CAST(sum(CASE WHEN s.mn <> s.mx THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
        |  FROM pos p JOIN spans s USING (h) GROUP BY p.doc_id),
        |base AS (SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) - 2 AS INTEGER) AS n_3grams
        |  FROM documents)
        |SELECT b.doc_id, b.n_3grams,
        |  coalesce(c.n_cross, CAST(0 AS BIGINT)) AS n_cross,
        |  CASE WHEN b.n_3grams > 0
        |       THEN CAST(coalesce(c.n_cross, CAST(0 AS BIGINT)) AS DOUBLE) / b.n_3grams
        |       ELSE CAST(0 AS DOUBLE) END AS cross_frac,
        |  (coalesce(c.n_cross, CAST(0 AS BIGINT)) * 5 <= b.n_3grams) AS pass_cross_dup
        |FROM base b LEFT JOIN cnt c ON b.doc_id = c.doc_id""".stripMargin,
    "q94_quantile_bins" ->
      """WITH e AS (SELECT event_id, event_type, CAST(floor(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |hist AS (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2),
        |s AS (SELECT event_type, c,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM hist),
        |b AS (SELECT event_type, c, CAST((cum - 1) * 10 // n + 1 AS BIGINT) AS bin FROM s)
        |SELECT e.event_id, e.event_type, e.c, b.bin
        |FROM e JOIN b USING (event_type, c)""".stripMargin,
    "q93_containment" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh
        |  WHERE len(sh_ints) >= 5)
        |SELECT a.doc_id AS contained, b.doc_id AS container,
        |  CAST(a.n_sh AS INTEGER) AS n_sh_contained, CAST(count(*) AS BIGINT) AS n_shared,
        |  CAST(count(*) AS DOUBLE) / a.n_sh AS containment
        |FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        |GROUP BY a.doc_id, b.doc_id, a.n_sh
        |HAVING CAST(count(*) AS DOUBLE) / a.n_sh >= 0.6""".stripMargin,
    "q92_collocations" ->
      """WITH tk AS (SELECT regexp_split_to_array(text, '\s+') AS t FROM documents),
        |bg AS (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2 FROM tk WHERE len(t) >= 2),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |u1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM big GROUP BY 1),
        |u2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM big GROUP BY 1),
        |tot AS (SELECT CAST(sum(c12) AS BIGINT) AS nn FROM big)
        |SELECT b.w1, b.w2, b.c12, u1.c1, u2.c2,
        |  CAST(b.c12 AS DOUBLE) * t.nn / (CAST(u1.c1 AS DOUBLE) * u2.c2) AS lift
        |FROM big b JOIN u1 USING (w1) JOIN u2 USING (w2), tot t
        |WHERE b.c12 >= 5
        |ORDER BY lift DESC, w1, w2 LIMIT 25""".stripMargin,
    "q91_mad_outliers" ->
      """WITH e AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |m1 AS (SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt FROM e),
        |med AS (SELECT event_type, min(CASE WHEN rn = (cnt + 1) // 2 THEN c END) AS med
        |  FROM m1 GROUP BY event_type),
        |d AS (SELECT e.event_type, e.c, med.med, abs(e.c - med.med) AS dev
        |  FROM e JOIN med USING (event_type)),
        |m2 AS (SELECT event_type, dev,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt FROM d),
        |mad AS (SELECT event_type, min(CASE WHEN rn = (cnt + 1) // 2 THEN dev END) AS mad
        |  FROM m2 GROUP BY event_type)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  max(d.med) AS med_cents, max(mad.mad) AS mad_cents,
        |  CAST(sum(CASE WHEN d.dev > mad.mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN mad USING (event_type)
        |GROUP BY d.event_type""".stripMargin,
    "q90_multimodal_curation" ->
      """WITH a AS (SELECT doc_id AS asset_id, text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    md5(text) AS h FROM documents),
        |dec AS (SELECT asset_id, media_type,
        |    CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
        |    CAST(16 + CAST(concat('0x', substr(md5(concat(h, 'w')), 1, 7)) AS BIGINT) % 1024 AS INTEGER) AS width,
        |    CAST(16 + CAST(concat('0x', substr(md5(concat(h, 'h')), 1, 7)) AS BIGINT) % 1024 AS INTEGER) AS height,
        |    md5(substring(text, 1, 64)) AS patch0
        |  FROM a),
        |surv AS (SELECT * FROM dec WHERE width >= 32 AND height >= 32 AND byte_len >= 200),
        |keep AS (SELECT patch0, min_by(media_type, asset_id) AS ktype, min_by(byte_len, asset_id) AS kbytes
        |  FROM surv GROUP BY patch0),
        |tot AS (SELECT media_type, count(*) AS n_total FROM dec GROUP BY 1),
        |q AS (SELECT media_type, count(*) AS n_quality FROM surv GROUP BY 1),
        |k AS (SELECT ktype AS media_type, count(*) AS n_kept, CAST(sum(kbytes) AS BIGINT) AS kept_bytes
        |  FROM keep GROUP BY 1)
        |SELECT t.media_type, t.n_total,
        |  coalesce(q.n_quality, CAST(0 AS BIGINT)) AS n_quality,
        |  coalesce(k.n_kept, CAST(0 AS BIGINT)) AS n_kept,
        |  coalesce(k.kept_bytes, CAST(0 AS BIGINT)) AS kept_bytes,
        |  (SELECT bool_and(octet_length(CAST(text AS BLOB)) = length(text)) FROM documents) AS ascii_ok
        |FROM tot t LEFT JOIN q ON t.media_type = q.media_type
        |LEFT JOIN k ON t.media_type = k.media_type""".stripMargin,
    "q89_incremental_distinct" ->
      """WITH inst AS (SELECT doc_id, lang, unnest(regexp_split_to_array(text, '\s+')) AS token
        |  FROM documents)
        |SELECT lang,
        |  CAST(count(DISTINCT token) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_instances,
        |  true AS within_bound
        |FROM inst GROUP BY lang""".stripMargin,
    "q88_sketch_quantiles" ->
      """WITH hist AS (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (SELECT l_returnflag, v, cnt,
        |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
        |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM hist)
        |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  min(CASE WHEN cum - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum THEN v END) AS p50,
        |  min(CASE WHEN cum - cnt < (19 * n + 19) // 20 AND (19 * n + 19) // 20 <= cum THEN v END) AS p95,
        |  min(CASE WHEN cum - cnt < (99 * n + 99) // 100 AND (99 * n + 99) // 100 <= cum THEN v END) AS p99,
        |  true AS ok_p50, true AS ok_p95, true AS ok_p99
        |FROM s GROUP BY l_returnflag""".stripMargin,
    "q79_semantic_dedup" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS cent_id, emb AS cent_emb, nrm AS cent_nrm FROM n WHERE vec_id % 100 = 0),
        |assigned AS (SELECT vec_id, emb, nrm, cluster FROM (
        |  SELECT n.vec_id, n.emb, n.nrm, c.cent_id AS cluster,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(n.emb, c.cent_emb), p -> p[1]*p[2])), (a,v) -> a+v) / (n.nrm * c.cent_nrm) DESC,
        |        c.cent_id ASC) AS arn
        |  FROM n, cent c) WHERE arn = 1),
        |drops AS (SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
        |  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) >= 0.995)
        |SELECT s.vec_id, s.cluster FROM assigned s LEFT JOIN drops d ON s.vec_id = d.vec_id
        |WHERE d.vec_id IS NULL""".stripMargin,
    "q78_gopher_quality" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(t) AS INTEGER) AS n,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(t, w -> CAST(length(w) AS BIGINT))), (a, x) -> a + x) AS sum_len,
        |    CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]'))) AS INTEGER) AS n_alpha,
        |    CAST(len(list_filter(t, w -> w IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS n_stop
        |  FROM tk)
        |SELECT doc_id, n AS n_words,
        |  CAST(sum_len AS DOUBLE) / n AS mean_word_len,
        |  CAST(n_alpha AS DOUBLE) / n AS alpha_frac,
        |  n_stop,
        |  (n >= 50 AND n <= 100000) AS pass_word_count,
        |  (sum_len >= CAST(n AS BIGINT) * 3 AND sum_len <= CAST(n AS BIGINT) * 10) AS pass_word_len,
        |  (n_alpha * 10 >= n * 8) AS pass_alpha,
        |  (n_stop >= 2) AS pass_stop,
        |  (n >= 50 AND n <= 100000
        |    AND sum_len >= CAST(n AS BIGINT) * 3 AND sum_len <= CAST(n AS BIGINT) * 10
        |    AND n_alpha * 10 >= n * 8 AND n_stop >= 2) AS keep
        |FROM m""".stripMargin,
    "q73_percentiles" ->
      """WITH s AS (SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem)
        |SELECT l_returnflag, max(cnt) AS n,
        |  min(CASE WHEN rn = (cnt + 3) // 4 THEN l_quantity END) AS p25,
        |  min(CASE WHEN rn = (cnt + 1) // 2 THEN l_quantity END) AS p50,
        |  min(CASE WHEN rn = (19 * cnt + 19) // 20 THEN l_quantity END) AS p95
        |FROM s GROUP BY l_returnflag""".stripMargin,
    "q72_retention" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week
        |  FROM events WHERE user_id IS NOT NULL),
        |signup AS (SELECT user_id, min(week) AS cohort_week FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |activity AS (SELECT DISTINCT user_id, week FROM e)
        |SELECT cohort_week, week - cohort_week AS weeks_since, count(DISTINCT user_id) AS n_users
        |FROM activity JOIN signup USING (user_id)
        |WHERE week >= cohort_week
        |GROUP BY cohort_week, weeks_since""".stripMargin,
    "q71_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |    printf('%020d_%012d', epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS k
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL),
        |v AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN k END) AS vk FROM e GROUP BY user_id),
        |c AS (SELECT e.user_id, min(CASE WHEN event_type = 'click' AND k > vk
        |        AND CAST(substr(k, 1, 20) AS BIGINT) <= CAST(substr(vk, 1, 20) AS BIGINT) + 3600000000 THEN k END) AS ck
        |  FROM e JOIN v USING (user_id) GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(CASE WHEN event_type = 'purchase' AND k > ck
        |        AND CAST(substr(k, 1, 20) AS BIGINT) <= CAST(substr(ck, 1, 20) AS BIGINT) + 3600000000 THEN k END) AS pk
        |  FROM e JOIN c USING (user_id) GROUP BY e.user_id),
        |s AS (SELECT CASE WHEN pk IS NOT NULL THEN 3 WHEN ck IS NOT NULL THEN 2
        |             WHEN vk IS NOT NULL THEN 1 ELSE 0 END AS stage
        |  FROM v JOIN c USING (user_id) JOIN p USING (user_id))
        |SELECT CAST(stage AS INTEGER) AS stage, count(*) AS n_users FROM s GROUP BY stage""".stripMargin,
    "q69_rank_dense" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(rank() OVER w AS INTEGER) AS rk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drk,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)""".stripMargin,
    "q70_collect" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        |  list_sort(list(o_orderkey))[1] AS first_key,
        |  list_sort(list(o_orderkey))[-1] AS last_key,
        |  CAST(count(*) AS INTEGER) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q68_typed_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |    / (sum(CAST(l_quantity AS BIGINT)) * 100) AS avg_price_per_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q67_multimodal_patches" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |  md5(substring(text, 1, 64)) AS patch0_md5,
        |  md5(substring(text, 65, 64)) AS patch1_md5,
        |  md5(substring(text, 129, 64)) AS patch2_md5,
        |  octet_length(encode(text)) = length(text) AS ascii_ok
        |FROM documents""".stripMargin,
    "q65_outliers" ->
      """WITH e AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c FROM events),
        |st AS (SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM e GROUP BY event_type),
        |f AS (SELECT e.event_type,
        |    CASE WHEN (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n) * (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
        |           > (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) * 4
        |         THEN 1 ELSE 0 END AS fl
        |  FROM e JOIN st USING (event_type))
        |SELECT event_type, count(*) AS n, CAST(sum(fl) AS BIGINT) AS n_outliers
        |FROM f GROUP BY event_type""".stripMargin,
    "q58_kmeans" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
        |d1 AS (SELECT vec_id, cid, v,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(v, cv), p -> (p[1]-p[2])*(p[1]-p[2]))), (a,x) -> a+x) AS dist
        |  FROM e, c0),
        |a1 AS (SELECT vec_id, cid AS cluster, v FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d1) WHERE rk = 1),
        |x1 AS (SELECT cluster, unnest(range(1, len(v)+1)) AS pos, unnest(v) AS x FROM a1),
        |m1 AS (SELECT cluster, pos, CAST(sum(CAST(floor(x * 1048576) AS BIGINT)) AS DOUBLE) / (count(*) * 1048576.0) AS cv
        |  FROM x1 GROUP BY cluster, pos),
        |c1 AS (SELECT cluster AS cid, list(cv ORDER BY pos) AS cv FROM m1 GROUP BY cluster),
        |d2 AS (SELECT a1.vec_id, a1.cluster AS cluster_iter1, c1.cid,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a1.v, c1.cv), p -> (p[1]-p[2])*(p[1]-p[2]))), (a,x) -> a+x) AS dist
        |  FROM a1, c1)
        |SELECT vec_id, cluster_iter1, cid AS cluster_iter2 FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d2) WHERE rk = 1""".stripMargin,
    "q56_heavy_hitters" ->
      """WITH e AS (SELECT token, count(*) AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents)
        |  GROUP BY token)
        |SELECT token, cnt, CAST(rk AS INTEGER) AS rank, TRUE AS est_within_1pct
        |FROM (SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rk FROM e)
        |WHERE rk <= 10""".stripMargin,
    "q31_label_centroids" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |x AS (SELECT label, CAST(t.pos AS INTEGER) AS pos, emb[t.pos + 1] AS v
        |      FROM e, (SELECT unnest(range(0, 64)) AS pos) t)
        |SELECT label, pos,
        |  CAST(sum(CAST(floor(v * 1073741824) AS BIGINT)) AS DOUBLE) / (count(*) * CAST(1073741824 AS DOUBLE)) AS centroid,
        |  count(*) AS n
        |FROM x GROUP BY label, pos""".stripMargin,
    "q95_semantic_dedup_capped" ->
      """WITH n0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |rep AS (SELECT emb, min(vec_id) AS rep_id FROM n0 GROUP BY emb),
        |n AS (SELECT n0.vec_id, n0.emb, n0.nrm FROM n0 JOIN rep r ON n0.emb = r.emb WHERE n0.vec_id = r.rep_id),
        |cent AS (SELECT vec_id AS cent_id, emb AS cent_emb, nrm AS cent_nrm FROM n WHERE vec_id % 100 = 0),
        |assigned AS (SELECT vec_id, emb, nrm, cluster FROM (
        |  SELECT n.vec_id, n.emb, n.nrm, c.cent_id AS cluster,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(n.emb, c.cent_emb), p -> p[1]*p[2])), (a,v) -> a+v) / (n.nrm * c.cent_nrm) DESC,
        |        c.cent_id ASC) AS arn
        |  FROM n, cent c) WHERE arn = 1),
        |sizes AS (SELECT cluster, count(*) AS cn, (count(*) + 39) // 40 AS n_sub,
        |    greatest(count(*) // ((count(*) + 39) // 40) // 4, 1) AS cand_stride
        |  FROM assigned GROUP BY cluster),
        |ws AS (SELECT a.vec_id, a.emb, a.nrm, a.cluster, s.cn, s.n_sub, s.cand_stride FROM assigned a JOIN sizes s USING (cluster)),
        |cand AS (SELECT *, CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 7)) AS BIGINT) AS h FROM ws
        |  WHERE cn > 40),
        |seeds AS (SELECT cluster, vec_id AS seed_id, emb AS seed_emb, nrm AS seed_nrm FROM (
        |  SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY h, vec_id) AS srk FROM cand
        |  WHERE h % cand_stride = 0 OR vec_id = cluster) WHERE srk <= n_sub),
        |subbed AS (SELECT vec_id, cluster, coalesce(sub0, CAST(-2 AS BIGINT)) AS sub, emb, nrm FROM (
        |  SELECT w.vec_id, w.cluster, w.emb, w.nrm, s.seed_id AS sub0,
        |    row_number() OVER (PARTITION BY w.vec_id
        |      ORDER BY list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(w.emb, s.seed_emb), p -> p[1]*p[2])), (a,v) -> a+v) / (w.nrm * s.seed_nrm) DESC,
        |        s.seed_id ASC) AS srn
        |  FROM ws w LEFT JOIN seeds s ON w.cluster = s.cluster WHERE w.cn > 40) WHERE srn = 1),
        |blocked AS (SELECT vec_id, cluster, sub, emb, nrm FROM subbed
        |  UNION ALL SELECT vec_id, cluster, CAST(-1 AS BIGINT) AS sub, emb, nrm FROM ws WHERE cn <= 40),
        |drops AS (SELECT DISTINCT b.vec_id FROM blocked a JOIN blocked b
        |  ON a.cluster = b.cluster AND a.sub = b.sub AND a.vec_id < b.vec_id
        |  WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) >= 0.995)
        |SELECT s.vec_id, s.cluster, s.sub FROM blocked s LEFT JOIN drops d ON s.vec_id = d.vec_id
        |WHERE d.vec_id IS NULL""".stripMargin,
    "q96_ivf_index_probe" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS cent_id, emb AS cent_emb, nrm AS cent_nrm FROM n WHERE vec_id % 100 = 0),
        |assigned AS (SELECT vec_id, emb, nrm, cluster FROM (
        |  SELECT n.vec_id, n.emb, n.nrm, c.cent_id AS cluster,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(n.emb, c.cent_emb), p -> p[1]*p[2])), (a,v) -> a+v) / (n.nrm * c.cent_nrm) DESC,
        |        c.cent_id ASC) AS arn
        |  FROM n, cent c) WHERE arn = 1),
        |q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm, cluster FROM assigned WHERE vec_id < 5)
        |SELECT query_id, cluster, vec_id, CAST(rank AS INTEGER) AS rank, cosine FROM (
        |  SELECT q.query_id, q.cluster, a.vec_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q.q_emb, a.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (q.q_nrm * a.nrm) AS cosine,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q.q_emb, a.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (q.q_nrm * a.nrm) DESC,
        |      a.vec_id ASC) AS rank
        |  FROM q JOIN assigned a ON q.cluster = a.cluster WHERE a.vec_id <> q.query_id)
        |WHERE rank <= 10""".stripMargin,
    "q97_semantic_dedup_ingest" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS cent_id, emb AS cent_emb, nrm AS cent_nrm FROM n WHERE vec_id % 100 = 0),
        |assigned AS (SELECT vec_id, emb, nrm, cluster FROM (
        |  SELECT n.vec_id, n.emb, n.nrm, c.cent_id AS cluster,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(n.emb, c.cent_emb), p -> p[1]*p[2])), (a,v) -> a+v) / (n.nrm * c.cent_nrm) DESC,
        |        c.cent_id ASC) AS arn
        |  FROM n, cent c) WHERE arn = 1),
        |idx0 AS (SELECT * FROM assigned WHERE vec_id % 5 <= 2),
        |b0 AS (SELECT * FROM assigned WHERE vec_id % 5 = 3),
        |id0 AS (SELECT vec_id, dup_of, cosine FROM (
        |  SELECT b.vec_id, i.vec_id AS dup_of,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(b.emb, i.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (b.nrm * i.nrm) AS cosine,
        |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(b.emb, i.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (b.nrm * i.nrm) DESC,
        |      i.vec_id ASC) AS rn
        |  FROM b0 b JOIN idx0 i ON b.cluster = i.cluster
        |  WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(b.emb, i.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (b.nrm * i.nrm) >= 0.35) WHERE rn = 1),
        |f0 AS (SELECT * FROM b0 WHERE vec_id NOT IN (SELECT vec_id FROM id0)),
        |bd0 AS (SELECT vec_id, dup_of, cosine FROM (
        |  SELECT b.vec_id, a.vec_id AS dup_of,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) AS cosine,
        |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) DESC,
        |      a.vec_id ASC) AS rn
        |  FROM f0 b JOIN f0 a ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) >= 0.35) WHERE rn = 1),
        |idx1 AS (SELECT * FROM idx0 UNION ALL
        |  SELECT * FROM f0 WHERE vec_id NOT IN (SELECT vec_id FROM bd0)),
        |b1 AS (SELECT * FROM assigned WHERE vec_id % 5 = 4),
        |id1 AS (SELECT vec_id, dup_of, cosine FROM (
        |  SELECT b.vec_id, i.vec_id AS dup_of,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(b.emb, i.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (b.nrm * i.nrm) AS cosine,
        |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(b.emb, i.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (b.nrm * i.nrm) DESC,
        |      i.vec_id ASC) AS rn
        |  FROM b1 b JOIN idx1 i ON b.cluster = i.cluster
        |  WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(b.emb, i.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (b.nrm * i.nrm) >= 0.35) WHERE rn = 1),
        |f1 AS (SELECT * FROM b1 WHERE vec_id NOT IN (SELECT vec_id FROM id1)),
        |bd1 AS (SELECT vec_id, dup_of, cosine FROM (
        |  SELECT b.vec_id, a.vec_id AS dup_of,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) AS cosine,
        |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) DESC,
        |      a.vec_id ASC) AS rn
        |  FROM f1 b JOIN f1 a ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (a.nrm * b.nrm) >= 0.35) WHERE rn = 1)
        |SELECT CAST(0 AS BIGINT) AS ingest_batch, vec_id, dup_of, cosine FROM id0
        |UNION ALL SELECT CAST(0 AS BIGINT) AS ingest_batch, vec_id, dup_of, cosine FROM bd0
        |UNION ALL SELECT CAST(1 AS BIGINT) AS ingest_batch, vec_id, dup_of, cosine FROM id1
        |UNION ALL SELECT CAST(1 AS BIGINT) AS ingest_batch, vec_id, dup_of, cosine FROM bd1""".stripMargin,
    "q98_semi_hard_negatives" ->
      """WITH n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS q_label, emb AS q_emb, nrm AS q_nrm FROM n WHERE vec_id < 5),
        |scored AS (SELECT q.query_id, q.q_label, c.vec_id, c.label,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q.q_emb, c.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (q.q_nrm * c.nrm) AS cosine
        |  FROM q, n c WHERE c.vec_id >= 5),
        |pos AS (SELECT query_id, pos_id, pos_cos FROM (
        |  SELECT query_id, vec_id AS pos_id, cosine AS pos_cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine ASC, vec_id ASC) AS rn
        |  FROM scored WHERE label = q_label) WHERE rn = 1)
        |SELECT query_id, pos_id, pos_cos, neg_id, neg_label, CAST(rank AS INTEGER) AS rank, neg_cos FROM (
        |  SELECT s.query_id, p.pos_id, p.pos_cos, s.vec_id AS neg_id, s.label AS neg_label, s.cosine AS neg_cos,
        |    row_number() OVER (PARTITION BY s.query_id ORDER BY s.cosine DESC, s.vec_id ASC) AS rank
        |  FROM scored s JOIN pos p ON s.query_id = p.query_id
        |  WHERE s.label <> s.q_label AND s.cosine < p.pos_cos AND s.cosine >= p.pos_cos - CAST(0.1 AS DOUBLE))
        |WHERE rank <= 5""".stripMargin,
    "q99_hybrid_rrf" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |dl AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS dl FROM tk),
        |inst AS (SELECT doc_id, unnest(t) AS token FROM tk),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM inst
        |  WHERE token IN ('spark', 'table') GROUP BY 1, 2),
        |wide AS (SELECT doc_id,
        |    max(CASE WHEN token = 'spark' THEN tf END) AS tf_a,
        |    max(CASE WHEN token = 'table' THEN tf END) AS tf_b
        |  FROM tf GROUP BY 1),
        |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT (SELECT count(*) FROM dl) AS n_docs,
        |    (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl,
        |    (SELECT df FROM dfq WHERE token = 'spark') AS df_a,
        |    (SELECT df FROM dfq WHERE token = 'table') AS df_b),
        |bm AS (SELECT w.doc_id,
        |  (CASE WHEN w.tf_a IS NOT NULL THEN
        |     ((CAST(s.n_docs AS DOUBLE) - s.df_a + CAST(0.5 AS DOUBLE)) / (s.df_a + CAST(0.5 AS DOUBLE)))
        |     * (w.tf_a * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        |     / (w.tf_a + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |         + CAST(0.75 AS DOUBLE) * (CAST(d.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
        |   ELSE CAST(0.0 AS DOUBLE) END
        |  + CASE WHEN w.tf_b IS NOT NULL THEN
        |     ((CAST(s.n_docs AS DOUBLE) - s.df_b + CAST(0.5 AS DOUBLE)) / (s.df_b + CAST(0.5 AS DOUBLE)))
        |     * (w.tf_b * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        |     / (w.tf_b + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |         + CAST(0.75 AS DOUBLE) * (CAST(d.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
        |   ELSE CAST(0.0 AS DOUBLE) END) AS bm25
        |FROM wide w JOIN dl d ON w.doc_id = d.doc_id, stats s),
        |ttop AS (SELECT doc_id, CAST(rn AS INTEGER) AS t_rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rn FROM bm) WHERE rn <= 20),
        |vn AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |qv AS (SELECT emb AS q_emb, nrm AS q_nrm FROM vn WHERE vec_id = 0),
        |vtop AS (SELECT doc_id, CAST(rn AS INTEGER) AS v_rank FROM (
        |  SELECT c.vec_id AS doc_id, row_number() OVER (ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(q.q_emb, c.emb), p -> p[1]*p[2])), (x,y) -> x+y) / (q.q_nrm * c.nrm) DESC,
        |      c.vec_id ASC) AS rn
        |  FROM vn c, qv q WHERE c.vec_id <> 0) WHERE rn <= 20)
        |SELECT doc_id, t_rank, v_rank, rrf, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT doc_id, t_rank, v_rank, rrf, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank FROM (
        |    SELECT coalesce(t.doc_id, v.doc_id) AS doc_id, t.t_rank, v.v_rank,
        |      (CASE WHEN t.t_rank IS NOT NULL THEN CAST(1.0 AS DOUBLE) / (60 + t.t_rank) ELSE CAST(0.0 AS DOUBLE) END
        |       + CASE WHEN v.v_rank IS NOT NULL THEN CAST(1.0 AS DOUBLE) / (60 + v.v_rank) ELSE CAST(0.0 AS DOUBLE) END) AS rrf
        |    FROM ttop t FULL JOIN vtop v ON t.doc_id = v.doc_id))
        |WHERE rank <= 10""".stripMargin,
    "q100_label_noise" ->
      """WITH n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |x AS (SELECT label, CAST(t.pos AS INTEGER) AS pos, emb[t.pos + 1] AS v
        |  FROM n, (SELECT unnest(range(0, 64)) AS pos) t),
        |cm AS (SELECT label, pos,
        |    CAST(sum(CAST(floor(v * 1073741824) AS BIGINT)) AS DOUBLE) / (count(*) * CAST(1073741824 AS DOUBLE)) AS cv
        |  FROM x GROUP BY label, pos),
        |cent AS (SELECT label AS c_label, list(cv ORDER BY pos ASC) AS cent FROM cm GROUP BY label),
        |centn AS (SELECT c_label, cent,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(cent, cent), p -> p[1]*p[2])), (a,v) -> a+v)) AS c_nrm
        |  FROM cent),
        |scored AS (SELECT e.vec_id, e.label, c.c_label,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(e.emb, c.cent), p -> p[1]*p[2])), (x,y) -> x+y) / (e.nrm * c.c_nrm) AS c_cos
        |  FROM n e, centn c),
        |self AS (SELECT vec_id, label, c_cos AS cos_self FROM scored WHERE label = c_label),
        |alt AS (SELECT vec_id, alt_label, cos_alt FROM (
        |  SELECT vec_id, c_label AS alt_label, c_cos AS cos_alt,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_label ASC) AS rn
        |  FROM scored WHERE label <> c_label) WHERE rn = 1)
        |SELECT label, vec_id, CAST(rank AS INTEGER) AS rank, cos_self, alt_label, cos_alt FROM (
        |  SELECT s.label, s.vec_id, s.cos_self, a.alt_label, a.cos_alt,
        |    row_number() OVER (PARTITION BY s.label ORDER BY s.cos_self ASC, s.vec_id ASC) AS rank
        |  FROM self s JOIN alt a ON s.vec_id = a.vec_id) WHERE rank <= 5""".stripMargin,
    "q101_dup_extents" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |px AS (SELECT doc_id, unnest(CASE WHEN len(th) >= 3
        |    THEN list_transform(range(1, len(th) - 1),
        |      i -> {'pos': CAST(i - 1 AS INTEGER),
        |            'h': (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647})
        |    ELSE [] END) AS u FROM tk),
        |pos AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM px),
        |spans AS (SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM pos GROUP BY h),
        |dup AS (SELECT p.doc_id, p.pos FROM pos p JOIN spans s USING (h) WHERE s.mn <> s.mx),
        |isl AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dup),
        |ext AS (SELECT doc_id, min(pos) AS sp, max(pos) AS ep FROM isl GROUP BY doc_id, grp)
        |SELECT doc_id, CAST(sp AS INTEGER) AS start_pos, CAST(ep + 2 AS INTEGER) AS end_pos,
        |  CAST(ep + 3 - sp AS BIGINT) AS n_tokens
        |FROM ext WHERE ep + 3 - sp >= 5""".stripMargin,
    "q102_source_reputation" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |px AS (SELECT doc_id, unnest(CASE WHEN len(th) >= 3
        |    THEN list_transform(range(1, len(th) - 1),
        |      i -> {'pos': CAST(i - 1 AS INTEGER),
        |            'h': (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647})
        |    ELSE [] END) AS u FROM tk),
        |pos AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM px),
        |spans AS (SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM pos GROUP BY h),
        |dup AS (SELECT p.doc_id, p.pos FROM pos p JOIN spans s USING (h) WHERE s.mn <> s.mx),
        |isl AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dup),
        |ext AS (SELECT doc_id, min(pos) AS sp, max(pos) AS ep FROM isl GROUP BY doc_id, grp),
        |perdoc AS (SELECT doc_id, CAST(sum(ep + 3 - sp) AS BIGINT) AS dup_toks
        |  FROM ext WHERE ep + 3 - sp >= 5 GROUP BY doc_id),
        |d AS (SELECT doc_id, source, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    n_chars < 200 AS is_short FROM documents)
        |SELECT d.source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN p.dup_toks IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_dup,
        |  CAST(sum(coalesce(p.dup_toks, 0)) AS BIGINT) AS dup_tokens,
        |  CAST(sum(d.n_toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN d.is_short THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        |  CAST(sum(coalesce(p.dup_toks, 0)) AS DOUBLE) / sum(d.n_toks) AS dup_burden,
        |  (sum(coalesce(p.dup_toks, 0)) * 20 <= sum(d.n_toks) * 13
        |   AND sum(CASE WHEN d.is_short THEN 1 ELSE 0 END) * 2 <= count(*)) AS keep_source
        |FROM d LEFT JOIN perdoc p USING (doc_id) GROUP BY d.source""".stripMargin,
    "q103_shuffle_manifest" ->
      """SELECT doc_id, shard, CAST(rk AS INTEGER) AS rk, CAST(cum_chars AS BIGINT) AS cum_chars FROM (
        |  SELECT doc_id,
        |    CAST(h % 8 AS INTEGER) AS shard,
        |    row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS rk,
        |    sum(n_chars) OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS cum_chars
        |  FROM (SELECT doc_id, n_chars,
        |      CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |    FROM documents))""".stripMargin,
    "q104_span_clean" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts FROM documents),
        |th AS (SELECT doc_id, list_transform(ts, t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM tk),
        |px AS (SELECT doc_id, unnest(CASE WHEN len(th) >= 3
        |    THEN list_transform(range(1, len(th) - 1),
        |      i -> {'pos': CAST(i - 1 AS INTEGER),
        |            'h': (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647})
        |    ELSE [] END) AS u FROM th),
        |pos AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM px),
        |spans AS (SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM pos GROUP BY h),
        |dup AS (SELECT p.doc_id, p.pos FROM pos p JOIN spans s USING (h) WHERE s.mn <> s.mx),
        |isl AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dup),
        |ext AS (SELECT doc_id, min(pos) AS sp, max(pos) AS ep FROM isl GROUP BY doc_id, grp),
        |extf AS (SELECT doc_id, sp, ep + 2 AS ee FROM ext WHERE ep + 3 - sp >= 5),
        |toks AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |      i -> {'pos': CAST(i - 1 AS INTEGER), 'tok': ts[i]})) AS u FROM tk)),
        |cov AS (SELECT t.doc_id, t.pos, t.tok,
        |    EXISTS (SELECT 1 FROM extf e
        |            WHERE e.doc_id = t.doc_id AND t.pos >= e.sp AND t.pos <= e.ee) AS covered
        |  FROM toks t)
        |SELECT doc_id,
        |  CAST(count(*) FILTER (covered) AS BIGINT) AS n_removed_tokens,
        |  coalesce(array_to_string(list(tok ORDER BY pos ASC) FILTER (WHERE NOT covered), ' '), '') AS clean_text
        |FROM cov GROUP BY doc_id""".stripMargin,
    "q105_incremental_spans" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |px AS (SELECT doc_id, unnest(CASE WHEN len(th) >= 3
        |    THEN list_transform(range(1, len(th) - 1),
        |      i -> {'pos': CAST(i - 1 AS INTEGER),
        |            'h': (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647})
        |    ELSE [] END) AS u FROM tk),
        |pos AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM px),
        |s0 AS (SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM pos WHERE doc_id % 2 = 0 GROUP BY h),
        |d0 AS (SELECT p.doc_id, p.pos FROM pos p JOIN s0 USING (h)
        |  WHERE p.doc_id % 2 = 0 AND s0.mn <> s0.mx),
        |su AS (SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM pos GROUP BY h),
        |d1 AS (SELECT p.doc_id, p.pos FROM pos p JOIN su USING (h)
        |  WHERE p.doc_id % 2 = 1 AND su.mn <> su.mx),
        |i0 AS (SELECT doc_id, pos, pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM d0),
        |x0 AS (SELECT doc_id, min(pos) AS sp, max(pos) AS ep FROM i0 GROUP BY doc_id, grp),
        |i1 AS (SELECT doc_id, pos, pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM d1),
        |x1 AS (SELECT doc_id, min(pos) AS sp, max(pos) AS ep FROM i1 GROUP BY doc_id, grp)
        |SELECT CAST(0 AS BIGINT) AS ingest_batch, doc_id, CAST(sp AS INTEGER) AS start_pos,
        |  CAST(ep + 2 AS INTEGER) AS end_pos, CAST(ep + 3 - sp AS BIGINT) AS n_tokens
        |FROM x0 WHERE ep + 3 - sp >= 5
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), doc_id, CAST(sp AS INTEGER), CAST(ep + 2 AS INTEGER),
        |  CAST(ep + 3 - sp AS BIGINT)
        |FROM x1 WHERE ep + 3 - sp >= 5""".stripMargin,
    "q106_lm_surprisal" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM tk WHERE len(t) >= 2),
        |wc AS (SELECT doc_id,
        |    count(*) OVER (PARTITION BY w1, w2) AS c12,
        |    count(*) OVER (PARTITION BY w1) AS c1
        |  FROM bg),
        |db AS (SELECT doc_id,
        |    CAST(sum(length(bin(c1 // c12)) - 1) AS BIGINT) AS surprisal_bits,
        |    CAST(count(*) AS BIGINT) AS n_bigrams
        |  FROM wc GROUP BY doc_id)
        |SELECT doc_id, surprisal_bits, n_bigrams,
        |  CAST(surprisal_bits AS DOUBLE) / n_bigrams AS avg_bits,
        |  surprisal_bits * 5 <= n_bigrams * 22 AS keep_doc
        |FROM db""".stripMargin,
    "q107_frozen_lm_gate" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM tk WHERE len(t) >= 2),
        |pair AS (SELECT w1, w2, count(*) AS c12 FROM bg WHERE doc_id % 2 = 0 GROUP BY w1, w2),
        |uni AS (SELECT w1, sum(c12) AS c1 FROM pair GROUP BY w1),
        |sc AS (SELECT n.doc_id,
        |    CASE WHEN p.c12 IS NULL THEN 22 ELSE length(bin(u.c1 // p.c12)) - 1 END AS bits
        |  FROM bg n
        |  LEFT JOIN pair p ON n.w1 = p.w1 AND n.w2 = p.w2
        |  LEFT JOIN uni u ON n.w1 = u.w1
        |  WHERE n.doc_id % 2 = 1),
        |db AS (SELECT doc_id,
        |    CAST(sum(bits) AS BIGINT) AS surprisal_bits,
        |    CAST(count(*) AS BIGINT) AS n_bigrams
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, surprisal_bits, n_bigrams,
        |  CAST(surprisal_bits AS DOUBLE) / n_bigrams AS avg_bits,
        |  surprisal_bits * 5 <= n_bigrams * 22 AS keep_doc
        |FROM db""".stripMargin,
    // q108: the full incremental-curation steady state, replayed with
    // batch-scoped statistics: evens = batch 0 (freeze model, populate
    // states), odds = batch 1 (frozen gate w/ OOV, span clean vs the
    // union rule, floor, cross-batch dedup on CLEANED text). Output =
    // batch 1's accepted (doc_id, text).
    "q108_curate_steady" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts FROM documents),
        |th AS (SELECT doc_id, list_transform(ts, t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM tk),
        |px AS (SELECT doc_id, unnest(CASE WHEN len(th) >= 3
        |    THEN list_transform(range(1, len(th) - 1),
        |      i -> {'pos': CAST(i - 1 AS INTEGER),
        |            'h': (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647})
        |    ELSE [] END) AS u FROM th),
        |pos AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM px),
        |s0 AS (SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM pos WHERE doc_id % 2 = 0 GROUP BY h),
        |d0 AS (SELECT p.doc_id, p.pos FROM pos p JOIN s0 USING (h)
        |  WHERE p.doc_id % 2 = 0 AND s0.mn <> s0.mx),
        |su AS (SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM pos GROUP BY h),
        |d1 AS (SELECT p.doc_id, p.pos FROM pos p JOIN su USING (h)
        |  WHERE p.doc_id % 2 = 1 AND su.mn <> su.mx),
        |dd AS (SELECT * FROM d0 UNION ALL SELECT * FROM d1),
        |isl AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dd),
        |ext AS (SELECT doc_id, min(pos) AS sp, max(pos) AS ep FROM isl GROUP BY doc_id, grp),
        |extf AS (SELECT doc_id, sp, ep + 2 AS ee FROM ext WHERE ep + 3 - sp >= 5),
        |bg AS (SELECT doc_id, unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2
        |  FROM tk WHERE len(ts) >= 2),
        |pair AS (SELECT w1, w2, count(*) AS c12 FROM bg WHERE doc_id % 2 = 0 GROUP BY w1, w2),
        |uni AS (SELECT w1, sum(c12) AS c1 FROM pair GROUP BY w1),
        |sc AS (SELECT n.doc_id,
        |    CASE WHEN p.c12 IS NULL THEN 22 ELSE length(bin(u.c1 // p.c12)) - 1 END AS bits
        |  FROM bg n
        |  LEFT JOIN pair p ON n.w1 = p.w1 AND n.w2 = p.w2
        |  LEFT JOIN uni u ON n.w1 = u.w1),
        |keep AS (SELECT doc_id FROM sc GROUP BY doc_id HAVING sum(bits) * 5 <= count(*) * 22),
        |toks AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |      i -> {'pos': CAST(i - 1 AS INTEGER), 'tok': ts[i]})) AS u
        |  FROM tk JOIN keep USING (doc_id))),
        |cov AS (SELECT t.doc_id, t.pos, t.tok,
        |    EXISTS (SELECT 1 FROM extf e
        |            WHERE e.doc_id = t.doc_id AND t.pos >= e.sp AND t.pos <= e.ee) AS covered
        |  FROM toks t),
        |cln AS (SELECT doc_id,
        |    coalesce(array_to_string(list(tok ORDER BY pos ASC) FILTER (WHERE NOT covered), ' '), '') AS clean_text
        |  FROM cov GROUP BY doc_id),
        |flo AS (SELECT doc_id, clean_text FROM cln WHERE trim(clean_text) <> ''),
        |h0 AS (SELECT DISTINCT md5(clean_text) AS hh FROM flo WHERE doc_id % 2 = 0)
        |SELECT f.doc_id, f.clean_text AS text
        |FROM flo f
        |WHERE f.doc_id % 2 = 1
        |  AND md5(f.clean_text) NOT IN (SELECT hh FROM h0)
        |  AND f.doc_id = (SELECT min(g.doc_id) FROM flo g
        |                  WHERE g.doc_id % 2 = 1 AND md5(g.clean_text) = md5(f.clean_text))""".stripMargin,
    // q109: schema-drift replay — the three generator versions' column
    // visibility rules applied directly over documents (v1 = %3==0
    // predates source and quality; v2 = %3==1 predates quality; v3 =
    // %3==2 has both). Integer-cents quality sum per the money pattern.
    "q109_schema_drift" ->
      """WITH ev AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS source,
        |    CAST(n_chars AS BIGINT) AS n_chars,
        |    CASE WHEN doc_id % 3 = 2 THEN n_chars / 100.0 ELSE NULL END AS quality
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(floor(quality * 100)) AS BIGINT) AS q_cents,
        |  count(source) AS with_source,
        |  min(doc_id) AS id_lo, max(doc_id) AS id_hi
        |FROM ev GROUP BY lang""".stripMargin,
    // q110: concat-then-chunk sequence packing over the q103 shuffle
    // order. The oracle may use one global cumsum window (DuckDB runs
    // at test sf); the ENGINE never does — two-pass prefix, plan-locked.
    "q110_sequence_packing" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b)
        |SELECT doc_id, shard, cum - n_toks AS start_tok, n_toks,
        |  (cum - n_toks) // 2048 AS first_pack,
        |  (cum - 1) // 2048 AS last_pack,
        |  (cum - 1) // 2048 - (cum - n_toks) // 2048 + 1 AS n_packs
        |FROM g""".stripMargin,
    // q111: the first 3 packs materialized with per-position doc
    // provenance; replay = global cumsum + per-doc token unnest.
    "q111_pack_slices" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts FROM documents),
        |b AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM tk),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |sel AS (SELECT doc_id, cum - n_toks AS start_tok FROM g WHERE cum - n_toks < 6144),
        |ux AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |      i -> {'pos': CAST(i - 1 AS BIGINT), 'tok': ts[i]})) AS u
        |  FROM tk),
        |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM ux)
        |SELECT (start_tok + pos) // 2048 AS pack_id,
        |  (start_tok + pos) % 2048 AS pos_in_pack,
        |  doc_id, tok AS token
        |FROM tok JOIN sel USING (doc_id) WHERE start_tok + pos < 6144""".stripMargin,
    // q112: incremental packing steady state — batch 1 (odds) laid out
    // after batch 0 (evens): the odds' within-batch cumsum shifted by
    // the evens' grand total.
    "q112_pack_ingest" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |t0 AS (SELECT CAST(coalesce(sum(n_toks), 0) AS BIGINT) AS tot FROM b WHERE doc_id % 2 = 0),
        |g AS (SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      + (SELECT tot FROM t0) AS cum
        |  FROM b WHERE doc_id % 2 = 1)
        |SELECT doc_id, shard, cum - n_toks AS start_tok, n_toks,
        |  (cum - n_toks) // 2048 AS first_pack,
        |  (cum - 1) // 2048 AS last_pack,
        |  (cum - 1) // 2048 - (cum - n_toks) // 2048 + 1 AS n_packs
        |FROM g""".stripMargin,
    // q113: per-source stratified packing — one cumsum window per
    // source partition replays the engine's per-(source,shard) prefix.
    "q113_mixture_packing" ->
      """WITH b AS (SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, source, CAST(h % 8 AS INTEGER) AS shard, n_toks,
        |    CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b)
        |SELECT doc_id, source, shard, cum - n_toks AS start_tok, n_toks,
        |  (cum - n_toks) // 2048 AS first_pack,
        |  (cum - 1) // 2048 AS last_pack,
        |  (cum - 1) // 2048 - (cum - n_toks) // 2048 + 1 AS n_packs
        |FROM g""".stripMargin,
    // q114: the q111 loader replay scoped to ONE source of the q113
    // mixture layout (domain-pure pack space: per-source offsets start
    // at 0, so filtering the corpus to the source first is exact).
    "q114_stratified_slices" ->
      """WITH s AS (SELECT min(source) AS src FROM documents),
        |tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts
        |  FROM documents WHERE source = (SELECT src FROM s)),
        |b AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM tk),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |sel AS (SELECT doc_id, cum - n_toks AS start_tok FROM g WHERE cum - n_toks < 6144),
        |ux AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |      i -> {'pos': CAST(i - 1 AS BIGINT), 'tok': ts[i]})) AS u
        |  FROM tk),
        |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM ux)
        |SELECT (start_tok + pos) // 2048 AS pack_id,
        |  (start_tok + pos) % 2048 AS pos_in_pack,
        |  doc_id, tok AS token
        |FROM tok JOIN sel USING (doc_id) WHERE start_tok + pos < 6144""".stripMargin,
    // q115/q116: BPE training is deterministic end to end (exact pair
    // counts, (cnt DESC, lhs, rhs) argmax, leftmost-non-overlapping
    // merges = SQL `replace` on the boundary-delimited symbol string),
    // so the oracle replays all 8 rounds by unrolling
    // pair-count → argmax → replace per level.
    "q115_bpe_merges" -> bpeOracle(8, "merges"),
    "q116_bpe_segments" -> bpeOracle(8, "segments"),
    "q158_sft_bpe_mask" -> bpeOracle(8, "sft_mask"),
    // q117: the full composition — 8 BPE rounds → per-doc counts →
    // the q110 packing replay (global cumsum in the shuffle order,
    // integer pack ranges) with those counts as the weights.
    "q117_bpe_packing" -> bpeOracle(8, "manifest"),
    // q120: the loader side of q117 — the first 3 packs materialized
    // as model tokens (per-doc word prefix × in-word symbol position).
    "q120_bpe_pack_slices" -> bpeOracle(8, "slices"),
    // q127: q120's slices mapped through the merge table's symbol id
    // space — the text→tokenizer→packing→ids chain end to end.
    "q127_bpe_packed_ids" -> bpeOracle(8, "packed_ids"),
    "q175_bpe_chunks" -> bpeOracle(8, "chunks"),
    "q176_fewshot_distinct" -> fewshotDistinctOracle(5),
    // q118: per-source token budgets met exactly by the greedy prefix
    // of each source's (h, doc_id)-ordered token stream (layoutBy's
    // per-domain offsets); straddling doc truncated via tok_take.
    "q118_token_budget_mix" ->
      """WITH b AS (SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, source, n_toks,
        |    CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |q AS (SELECT source,
        |    256 * (CAST(concat('0x', substr(md5(source), 1, 7)) AS BIGINT) % 4 + 1) AS budget
        |  FROM (SELECT DISTINCT source FROM documents))
        |SELECT doc_id, source, cum - n_toks AS start_tok, n_toks,
        |  least(n_toks, budget - (cum - n_toks)) AS tok_take
        |FROM g JOIN q USING (source) WHERE cum - n_toks < budget""".stripMargin,
    // q119: incremental stratified packing steady state — each
    // source's odds laid out after that source's evens total
    // (domain-pure append-only pack spaces).
    "q119_stratified_pack_ingest" ->
      """WITH b AS (SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |ev AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS tot FROM b WHERE doc_id % 2 = 0 GROUP BY source),
        |od AS (SELECT doc_id, source, n_toks, CAST(h % 8 AS INTEGER) AS shard,
        |    CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b WHERE doc_id % 2 = 1),
        |g AS (SELECT od.doc_id, od.source, od.shard, od.n_toks,
        |    COALESCE(ev.tot, 0) + od.cum - od.n_toks AS start_tok,
        |    COALESCE(ev.tot, 0) + od.cum AS end_tok
        |  FROM od LEFT JOIN ev USING (source))
        |SELECT doc_id, source, shard, start_tok, n_toks,
        |  start_tok // 2048 AS first_pack,
        |  (end_tok - 1) // 2048 AS last_pack,
        |  (end_tok - 1) // 2048 - start_tok // 2048 + 1 AS n_packs
        |FROM g""".stripMargin,
    // q121: seeded multi-epoch pack permutation — rank of
    // md5(seed:epoch:pack_id) over the q110 pack space. n_packs =
    // ceil(total_tokens / budget) (the stream is contiguous from 0).
    // The oracle may use one global row_number; the ENGINE ranks per
    // md5-byte bucket + driver prefix (hex order = numeric order).
    "q121_epoch_order" ->
      """WITH b AS (SELECT CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |np AS (SELECT (CAST(sum(n_toks) AS BIGINT) + 2047) // 2048 AS n FROM b),
        |packs AS (SELECT unnest(range((SELECT n FROM np))) AS pack_id),
        |k AS (SELECT e.epoch, p.pack_id,
        |    md5('ord1:' || CAST(e.epoch AS VARCHAR) || ':' || CAST(p.pack_id AS VARCHAR)) AS key
        |  FROM (SELECT unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS epoch) e, packs p)
        |SELECT epoch,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY key, pack_id) - 1 AS BIGINT) AS ord,
        |  pack_id
        |FROM k""".stripMargin,
    // q122: per-pack segment boundaries from the q110 manifest — pure
    // integer arithmetic per (doc, pack) overlap, no text.
    "q122_pack_boundaries" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |m AS (SELECT doc_id, cum - n_toks AS start_tok, n_toks,
        |    (cum - n_toks) // 2048 AS first_pack, (cum - 1) // 2048 AS last_pack
        |  FROM g),
        |ux AS (SELECT doc_id, start_tok, n_toks,
        |    unnest(range(first_pack, last_pack + 1)) AS pack_id
        |  FROM m)
        |SELECT pack_id,
        |  CAST(greatest(start_tok, pack_id * 2048) - pack_id * 2048 AS BIGINT) AS pos,
        |  CAST(least(start_tok + n_toks, (pack_id + 1) * 2048)
        |    - greatest(start_tok, pack_id * 2048) AS BIGINT) AS seg_len,
        |  doc_id,
        |  CAST(start_tok >= pack_id * 2048 AS INTEGER) AS doc_start
        |FROM ux""".stripMargin,
    // q123: fertility drift — q115's merge unroll trained on the EVEN
    // docs only, applied to the odd docs' distinct words, aggregated
    // per source (frozen-tokenizer monitoring posture).
    "q123_fertility_drift" -> bpeOracle(8, "drift", " WHERE doc_id % 2 = 0"),
    // q124: quality-curriculum packing — q78's integer quality gates
    // derive the bin, each bin is its own q113-style pack space, and
    // the curriculum position renumbers packs highest bin first.
    "q124_curriculum_packing" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(t) AS INTEGER) AS n,
        |    CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]'))) AS INTEGER) AS n_alpha,
        |    CAST(len(list_filter(t, w -> w IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS n_stop
        |  FROM tk),
        |b AS (SELECT doc_id,
        |    CAST(CASE WHEN n_stop >= 2 AND n_alpha * 10 >= n * 8 THEN 2
        |         WHEN n_alpha * 10 >= n * 8 THEN 1 ELSE 0 END AS INTEGER) AS qbin,
        |    CAST(n AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM m),
        |g AS (SELECT doc_id, qbin, n_toks,
        |    CAST(sum(n_toks) OVER (PARTITION BY qbin ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |t AS (SELECT qbin, (max(cum) + 2047) // 2048 AS np FROM g GROUP BY qbin),
        |base AS (SELECT qbin,
        |    CAST(COALESCE(sum(np) OVER (ORDER BY qbin DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pack_base
        |  FROM t)
        |SELECT doc_id, qbin, cum - n_toks AS start_tok, n_toks,
        |  (cum - n_toks) // 2048 AS first_pack,
        |  (cum - 1) // 2048 AS last_pack,
        |  pack_base + (cum - n_toks) // 2048 AS cur_first,
        |  pack_base + (cum - 1) // 2048 AS cur_last
        |FROM g JOIN base USING (qbin)""".stripMargin,
    // q125: dense lexicographic token ids. The oracle may use one
    // global row_number; the ENGINE range-partitions + prefix-sums
    // partition counts (plan-locked).
    "q125_vocab_ids" ->
      """WITH h AS (SELECT word AS token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)
        |SELECT token, cnt,
        |  CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
        |FROM h""".stripMargin,
    // q126: the q111 slices integer-encoded through the q125 ids —
    // the trainer-ready (pack, pos, doc, token_id) sequence.
    "q126_packed_ids" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts FROM documents),
        |b AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM tk),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |sel AS (SELECT doc_id, cum - n_toks AS start_tok FROM g WHERE cum - n_toks < 6144),
        |ux AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |      i -> {'pos': CAST(i - 1 AS BIGINT), 'tok': ts[i]})) AS u
        |  FROM tk),
        |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM ux),
        |vh AS (SELECT word AS token
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |v AS (SELECT token,
        |    CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
        |  FROM vh)
        |SELECT (start_tok + pos) // 2048 AS pack_id,
        |  (start_tok + pos) % 2048 AS pos_in_pack,
        |  doc_id, token_id
        |FROM tok JOIN sel USING (doc_id) JOIN v ON tok.tok = v.token
        |WHERE start_tok + pos < 6144""".stripMargin,
    // q128: the q126 rows rolled into one position-sorted id array per
    // pack — the memory-map shape.
    "q128_pack_arrays" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts FROM documents),
        |b AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM tk),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |sel AS (SELECT doc_id, cum - n_toks AS start_tok FROM g WHERE cum - n_toks < 6144),
        |ux AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |      i -> {'pos': CAST(i - 1 AS BIGINT), 'tok': ts[i]})) AS u
        |  FROM tk),
        |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM ux),
        |vh AS (SELECT word AS token
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |v AS (SELECT token,
        |    CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
        |  FROM vh),
        |q AS (SELECT (start_tok + pos) // 2048 AS pack_id,
        |    (start_tok + pos) % 2048 AS pos_in_pack, token_id
        |  FROM tok JOIN sel USING (doc_id) JOIN v ON tok.tok = v.token
        |  WHERE start_tok + pos < 6144)
        |SELECT pack_id,
        |  array_to_string(list(pos_in_pack ORDER BY pos_in_pack), ' ') AS positions,
        |  array_to_string(list(token_id ORDER BY pos_in_pack), ' ') AS token_ids
        |FROM q GROUP BY pack_id""".stripMargin,
    // q129: set-membership decontamination purge — eval = doc_id % 10
    // == 0; per-TRAIN-doc distinct-shingle overlap vs the eval SET
    // (q54 is the pair-attributed view; this is the purge decision).
    "q129_decontam_purge" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |ev AS (SELECT DISTINCT unnest(sh_ints) AS shingle FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle
        |  FROM sh WHERE doc_id % 10 <> 0)
        |SELECT tr.doc_id, CAST(tr.n_sh AS INTEGER) AS n_sh,
        |  CAST(count(*) AS BIGINT) AS n_overlap,
        |  CAST(count(*) AS DOUBLE) / tr.n_sh AS overlap_frac,
        |  CAST(count(*) AS DOUBLE) / tr.n_sh >= 0.5 AS contaminated
        |FROM tr JOIN ev USING (shingle)
        |GROUP BY tr.doc_id, tr.n_sh""".stripMargin,
    // q130: frozen-dictionary OOV drift — vocab frozen on evens, odds
    // scored per source over the (source, token) histogram.
    "q130_oov_drift" ->
      """WITH ev AS (SELECT word AS token
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
        |        FROM documents WHERE doc_id % 2 = 0)
        |  WHERE word <> '' GROUP BY word),
        |od AS (SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS token
        |  FROM documents WHERE doc_id % 2 = 1),
        |hist AS (SELECT source, token, count(*) AS cnt FROM od
        |  WHERE token <> '' GROUP BY source, token)
        |SELECT hist.source,
        |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN ev.token IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN ev.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov_types,
        |  CAST(sum(CASE WHEN ev.token IS NULL THEN cnt ELSE 0 END) AS DOUBLE) / sum(cnt) AS oov_frac
        |FROM hist LEFT JOIN ev USING (token)
        |GROUP BY hist.source""".stripMargin,
    // q131: pack contamination audit — q129's contaminated ids mapped
    // through the q110 manifest; per pack, overlapping contaminated
    // docs and the positions they occupy. Pure manifest arithmetic.
    "q131_pack_contam_audit" ->
      ("""WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |ev AS (SELECT DISTINCT unnest(sh_ints) AS shingle FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle
        |  FROM sh WHERE doc_id % 10 <> 0),
        |c AS (SELECT tr.doc_id FROM tr JOIN ev USING (shingle)
        |  GROUP BY tr.doc_id, tr.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / tr.n_sh >= 0.5),
        |b AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |m AS (SELECT doc_id, cum - n_toks AS start_tok, n_toks,
        |    (cum - n_toks) // 2048 AS first_pack, (cum - 1) // 2048 AS last_pack
        |  FROM g),
        |x AS (SELECT m.doc_id, m.start_tok, m.n_toks,
        |    unnest(range(m.first_pack, m.last_pack + 1)) AS pack_id
        |  FROM m JOIN c USING (doc_id))
        |SELECT pack_id,
        |  CAST(count(*) AS BIGINT) AS n_contam_docs,
        |  CAST(sum(least(start_tok + n_toks, (pack_id + 1) * 2048)
        |           - greatest(start_tok, pack_id * 2048)) AS BIGINT) AS n_contam_tokens
        |FROM x GROUP BY pack_id""").stripMargin,
    // q132: q131's audit + the retirement decision (contam_frac over
    // the 2048 budget; retired at the 0 threshold — any contaminated
    // token retires the pack).
    "q132_retire_packs" ->
      ("""WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |ev AS (SELECT DISTINCT unnest(sh_ints) AS shingle FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle
        |  FROM sh WHERE doc_id % 10 <> 0),
        |c AS (SELECT tr.doc_id FROM tr JOIN ev USING (shingle)
        |  GROUP BY tr.doc_id, tr.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / tr.n_sh >= 0.5),
        |b AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |m AS (SELECT doc_id, cum - n_toks AS start_tok, n_toks,
        |    (cum - n_toks) // 2048 AS first_pack, (cum - 1) // 2048 AS last_pack
        |  FROM g),
        |x AS (SELECT m.doc_id, m.start_tok, m.n_toks,
        |    unnest(range(m.first_pack, m.last_pack + 1)) AS pack_id
        |  FROM m JOIN c USING (doc_id)),
        |a AS (SELECT pack_id,
        |    CAST(count(*) AS BIGINT) AS n_contam_docs,
        |    CAST(sum(least(start_tok + n_toks, (pack_id + 1) * 2048)
        |             - greatest(start_tok, pack_id * 2048)) AS BIGINT) AS n_contam_tokens
        |  FROM x GROUP BY pack_id)
        |SELECT pack_id, n_contam_docs, n_contam_tokens,
        |  CAST(n_contam_tokens AS DOUBLE) / 2048 AS contam_frac,
        |  CAST(n_contam_tokens AS DOUBLE) / 2048 > 0.0 AS retired
        |FROM a""").stripMargin,
    // q133: fuzzy (MinHash-LSH) decontamination — q22's signature/band
    // replay with candidacy restricted to train (doc_id % 10 <> 0) ×
    // eval (doc_id % 10 = 0), verified whole-set Jaccard, per-train-doc
    // verdict at 0.5.
    "q133_fuzzy_decontam" ->
      """WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id, sh_ints FROM (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk) WHERE len(sh_ints) > 0),
        |sig AS (SELECT doc_id,
        |    list_transform(range(0, 16), i -> list_min(list_transform(sh_ints, x -> ((i*2+3)*x + i*97 + 11) % 2147483647))) AS sig
        |  FROM sh),
        |bands AS (SELECT doc_id, bb.band AS band,
        |    array_to_string(list_transform(sig[bb.band*4+1 : bb.band*4+4], x -> CAST(x AS VARCHAR)), '_') AS band_key
        |  FROM sig, (SELECT unnest(range(0, 4)) AS band) bb),
        |cand AS (SELECT DISTINCT a.doc_id AS tid, b.doc_id AS eid
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0),
        |ver AS (SELECT tid, eid,
        |  CAST(len(list_intersect(sa.sh_ints, sb.sh_ints)) AS DOUBLE) / len(list_distinct(list_concat(sa.sh_ints, sb.sh_ints))) AS jaccard
        |  FROM cand JOIN sh sa ON sa.doc_id = tid JOIN sh sb ON sb.doc_id = eid)
        |SELECT tid AS doc_id, CAST(count(*) AS BIGINT) AS n_cand,
        |  CAST(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  max(jaccard) AS max_jaccard, max(jaccard) >= 0.5 AS contaminated
        |FROM ver GROUP BY tid""".stripMargin,
    // q134: q131's interval arithmetic WITHOUT the per-pack roll-up —
    // per (contaminated doc, overlapped pack), the pack-local half-open
    // loss-mask interval.
    "q134_mask_intervals" ->
      ("""WITH tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |ev AS (SELECT DISTINCT unnest(sh_ints) AS shingle FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle
        |  FROM sh WHERE doc_id % 10 <> 0),
        |c AS (SELECT tr.doc_id FROM tr JOIN ev USING (shingle)
        |  GROUP BY tr.doc_id, tr.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / tr.n_sh >= 0.5),
        |b AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |m AS (SELECT doc_id, cum - n_toks AS start_tok, n_toks,
        |    (cum - n_toks) // 2048 AS first_pack, (cum - 1) // 2048 AS last_pack
        |  FROM g),
        |x AS (SELECT m.doc_id, m.start_tok, m.n_toks,
        |    unnest(range(m.first_pack, m.last_pack + 1)) AS pack_id
        |  FROM m JOIN c USING (doc_id))
        |SELECT pack_id, doc_id,
        |  CAST(greatest(start_tok, pack_id * 2048) - pack_id * 2048 AS BIGINT) AS mask_start,
        |  CAST(least(start_tok + n_toks, (pack_id + 1) * 2048) - pack_id * 2048 AS BIGINT) AS mask_end,
        |  CAST(least(start_tok + n_toks, (pack_id + 1) * 2048)
        |       - greatest(start_tok, pack_id * 2048) AS BIGINT) AS n_mask_tokens
        |FROM x""").stripMargin,
    // q135: semantic decontamination — per train vector, the best-cosine
    // eval match (ties to the smaller eval id, the q26 argmax rule) and
    // the verdict at 0.4.
    "q135_semantic_decontam" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), p -> p[1]*p[2])), (a,v) -> a+v)) AS nrm
        |  FROM embeddings),
        |ev AS (SELECT vec_id AS eval_id, emb AS ev_emb, nrm AS ev_nrm FROM n WHERE vec_id % 10 = 0),
        |tr AS (SELECT * FROM n WHERE vec_id % 10 <> 0)
        |SELECT vec_id, eval_id AS best_eval_id, cosine AS best_cosine, cosine >= 0.4 AS contaminated
        |FROM (
        |  SELECT tr.vec_id, ev.eval_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(tr.emb, ev.ev_emb), p -> p[1]*p[2])), (x,y) -> x+y) / (tr.nrm * ev.ev_nrm) AS cosine,
        |    row_number() OVER (PARTITION BY tr.vec_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(tr.emb, ev.ev_emb), p -> p[1]*p[2])), (x,y) -> x+y) / (tr.nrm * ev.ev_nrm) DESC,
        |      ev.eval_id ASC) AS rk
        |  FROM tr, ev)
        |WHERE rk = 1""".stripMargin,
    // q136: loader resume — the q121 schedule flattened epoch-major
    // (global_ord = epoch·ppe + ord) and filtered to the not-yet-
    // consumed tail; consumed = (ppe // 8) · 4 (steps of 4 packs,
    // interrupted halfway through epoch 0 — derived from the pack
    // space so the cut is mid-epoch at every SF).
    "q136_resume_slice" ->
      """WITH b AS (SELECT CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |np AS (SELECT (CAST(sum(n_toks) AS BIGINT) + 2047) // 2048 AS n FROM b),
        |packs AS (SELECT unnest(range((SELECT n FROM np))) AS pack_id),
        |k AS (SELECT e.epoch, p.pack_id,
        |    md5('ord1:' || CAST(e.epoch AS VARCHAR) || ':' || CAST(p.pack_id AS VARCHAR)) AS key
        |  FROM (SELECT unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS epoch) e, packs p),
        |s AS (SELECT epoch,
        |    CAST(row_number() OVER (PARTITION BY epoch ORDER BY key, pack_id) - 1 AS BIGINT) AS ord,
        |    pack_id
        |  FROM k),
        |g AS (SELECT epoch, ord, pack_id, epoch * (SELECT n FROM np) + ord AS global_ord FROM s)
        |SELECT epoch, ord, pack_id, global_ord FROM g
        |WHERE global_ord >= ((SELECT n FROM np) // 8) * 4""".stripMargin,
    // q137: temperature mixture (alpha = 0.5) — per-source token totals
    // and the p^alpha weight / repeat factor vs the largest source as
    // micro-ints; sqrt and division are IEEE-exact-rounded, so the
    // floor(1e6·…) values are bit-identical across engines.
    "q137_temperature_mix" ->
      """WITH t AS (SELECT source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(n) AS BIGINT) AS tok_total
        |  FROM t GROUP BY source),
        |m AS (SELECT max(tok_total) AS mx FROM g)
        |SELECT source, n_items, tok_total,
        |  CAST(floor(1000000.0 * (sqrt(CAST(tok_total AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE)))) AS BIGINT) AS w_micro,
        |  CAST(floor(1000000.0 * (sqrt(CAST(mx AS DOUBLE)) / sqrt(CAST(tok_total AS DOUBLE)))) AS BIGINT) AS repeat_micro
        |FROM g, m""".stripMargin,
    // q138: pack-space efficiency — per source, the q113 stratified
    // stream's tail-pack waste and the integer-exact wasted-compute
    // fraction (interior packs are full by construction, so waste =
    // n_packs·budget − total, all in the tail).
    "q138_pack_efficiency" ->
      """WITH t AS (SELECT source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS total_toks
        |  FROM t GROUP BY source),
        |p AS (SELECT source, n_docs, total_toks,
        |    (total_toks + 2047) // 2048 AS n_packs
        |  FROM g)
        |SELECT source, n_docs, total_toks, n_packs,
        |  n_packs * 2048 - total_toks AS tail_waste,
        |  (1000000 * (n_packs * 2048 - total_toks)) // (n_packs * 2048) AS waste_micro
        |FROM p""".stripMargin,
    // q139: Hamilton largest-remainder apportionment of a 1M-token
    // budget over the q137 weights — floor shares via HUGEINT div/mod
    // (exact at any magnitude), the leftover +1s to the largest
    // remainders, ties to the smaller source key.
    "q139_apportion_budget" ->
      """WITH t AS (SELECT source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |g AS (SELECT source, CAST(sum(n) AS BIGINT) AS tok_total FROM t GROUP BY source),
        |m AS (SELECT max(tok_total) AS mx FROM g),
        |w AS (SELECT source,
        |    CAST(floor(1000000.0 * (sqrt(CAST(tok_total AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE)))) AS BIGINT) AS w_micro
        |  FROM g, m),
        |s AS (SELECT CAST(sum(w_micro) AS HUGEINT) AS tw FROM w),
        |b AS (SELECT source, w_micro,
        |    CAST((CAST(1000000 AS HUGEINT) * w_micro) // tw AS BIGINT) AS base,
        |    (CAST(1000000 AS HUGEINT) * w_micro) % tw AS rem
        |  FROM w, s),
        |r AS (SELECT source, w_micro, base,
        |    row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
        |  FROM b),
        |d AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS leftover FROM b)
        |SELECT source, w_micro, base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS quota
        |FROM r, d""".stripMargin,
    // q140: pack provenance — the q122 layout replay joined to the
    // doc→source map, interval overlap per (doc, pack), rolled up per
    // (pack, source). Σ n_toks over a pack's rows == its fill.
    "q140_pack_provenance" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |m AS (SELECT doc_id, cum - n_toks AS start_tok, n_toks,
        |    (cum - n_toks) // 2048 AS first_pack, (cum - 1) // 2048 AS last_pack
        |  FROM g),
        |ux AS (SELECT doc_id, start_tok, n_toks,
        |    unnest(range(first_pack, last_pack + 1)) AS pack_id
        |  FROM m)
        |SELECT pack_id, d.source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(least(start_tok + ux.n_toks, (pack_id + 1) * 2048)
        |    - greatest(start_tok, pack_id * 2048)) AS BIGINT) AS n_toks
        |FROM ux JOIN documents d USING (doc_id)
        |GROUP BY pack_id, d.source""".stripMargin,
    // q141: leakage-free split — the q36 recursive component closure,
    // singletons coalesced to their own id, split by the md5-prefix
    // hash of the COMPONENT at 100 per mille heldout.
    "q141_leakage_split" ->
      """WITH RECURSIVE tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id)
        |SELECT d.doc_id,
        |  COALESCE(c.component, d.doc_id) AS component,
        |  CASE WHEN CAST(concat('0x', substr(md5(concat('split_',
        |         CAST(COALESCE(c.component, d.doc_id) AS VARCHAR))), 1, 7)) AS BIGINT) % 1000 < 100
        |       THEN 'heldout' ELSE 'train' END AS split
        |FROM documents d LEFT JOIN comp c USING (doc_id)""".stripMargin,
    // q142: nested subsample grid — deepest 1/10^k tier by the
    // divisibility chain over the md5-prefix hash (10^k | h implies
    // 10^(k-1) | h, so tier >= k samples strictly nest).
    "q142_nested_sample" ->
      """WITH h AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(concat('grid_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS hv
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN hv % 1000 = 0 THEN 3
        |       WHEN hv % 100 = 0 THEN 2
        |       WHEN hv % 10 = 0 THEN 1 ELSE 0 END AS INTEGER) AS sample_tier
        |FROM h""".stripMargin,
    // q143: release diff — old drops ids ≡3 (mod 10), new drops ids
    // ≡7 (mod 10) and revises text of ids ≡5 (mod 13); status from
    // the md5-fingerprint full-outer join.
    "q143_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 <> 3),
        |n AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 5 THEN text || ' rev2' ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 10 <> 7)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp = n.fp THEN 'unchanged' ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    // q144: the q138 tail-waste arithmetic swept over four budgets —
    // one group agg cross-joined with the budget VALUES.
    "q144_efficiency_sweep" ->
      """WITH t AS (SELECT source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS total_toks
        |  FROM t GROUP BY source),
        |p AS (SELECT source, n_docs, total_toks, CAST(b.budget AS BIGINT) AS budget,
        |    (total_toks + b.budget - 1) // b.budget AS n_packs
        |  FROM g CROSS JOIN (VALUES (512), (1024), (2048), (4096)) AS b(budget))
        |SELECT source, n_docs, total_toks, budget, n_packs,
        |  n_packs * budget - total_toks AS tail_waste,
        |  (1000000 * (n_packs * budget - total_toks)) // (n_packs * budget) AS waste_micro
        |FROM p""".stripMargin,
    // q145: quality-aware dedup survivor — the q36 recursive closure,
    // then per-component argmax token count (ties to the smaller id)
    // via a row_number window.
    "q145_cluster_best" ->
      """WITH RECURSIVE tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
        |lab AS (SELECT d.doc_id,
        |    COALESCE(c.component, d.doc_id) AS component,
        |    CAST(len(regexp_split_to_array(d.text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents d LEFT JOIN comp c USING (doc_id))
        |SELECT doc_id, component, n_toks,
        |  (row_number() OVER (PARTITION BY component ORDER BY n_toks DESC, doc_id ASC)) = 1 AS keep
        |FROM lab""".stripMargin,
    // q146: per-phase Hamilton apportionment — warm phase weights by
    // raw corpus share over 2M tokens, anneal phase by the q137 α=0.5
    // temperature micro-weights over 1M; HUGEINT floor shares, the
    // leftover +1s to the largest remainders per phase, ties to the
    // smaller source.
    "q146_phase_quotas" ->
      """WITH t AS (SELECT source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |g AS (SELECT source, CAST(sum(n) AS BIGINT) AS tok_total FROM t GROUP BY source),
        |m AS (SELECT max(tok_total) AS mx FROM g),
        |wa AS (
        |  SELECT 'warm' AS phase, source, tok_total AS w, 2000000 AS pb FROM g
        |  UNION ALL
        |  SELECT 'anneal', source,
        |    CAST(floor(1000000.0 * (sqrt(CAST(tok_total AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE)))) AS BIGINT),
        |    1000000
        |  FROM g, m),
        |s AS (SELECT phase, CAST(sum(w) AS HUGEINT) AS tw FROM wa GROUP BY phase),
        |b AS (SELECT wa.phase, source, w, pb,
        |    CAST((CAST(pb AS HUGEINT) * w) // tw AS BIGINT) AS base,
        |    (CAST(pb AS HUGEINT) * w) % tw AS rem
        |  FROM wa JOIN s ON wa.phase = s.phase),
        |r AS (SELECT phase, source, w, base,
        |    row_number() OVER (PARTITION BY phase ORDER BY rem DESC, source ASC) AS rk
        |  FROM b),
        |d AS (SELECT phase, CAST(max(pb) - sum(base) AS BIGINT) AS leftover
        |  FROM b GROUP BY phase)
        |SELECT r.phase, source, w, base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS quota
        |FROM r JOIN d ON r.phase = d.phase""".stripMargin,
    // q147: DPO preference pairs — per prompt the argmax/argmin-reward
    // responses (ties to the smaller id) with strict positive margin;
    // the pseudo reward is the portable md5-prefix hash % 1000 plus a
    // capped token-count length bias.
    "q147_preference_pairs" ->
      """WITH r AS (SELECT doc_id % 50 AS prompt_id, doc_id,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward
        |  FROM documents),
        |c AS (SELECT prompt_id, doc_id, reward,
        |    row_number() OVER (PARTITION BY prompt_id ORDER BY reward DESC, doc_id ASC) AS rc,
        |    row_number() OVER (PARTITION BY prompt_id ORDER BY reward ASC, doc_id ASC) AS rr
        |  FROM r)
        |SELECT ch.prompt_id, ch.doc_id AS chosen_id, rj.doc_id AS rejected_id,
        |  ch.reward AS chosen_score, rj.reward AS rejected_score,
        |  ch.reward - rj.reward AS margin
        |FROM (SELECT * FROM c WHERE rc = 1) ch
        |JOIN (SELECT * FROM c WHERE rr = 1) rj USING (prompt_id)
        |WHERE ch.reward > rj.reward""".stripMargin,
    // q148: best-of-n — top-3 responses per prompt by (reward DESC,
    // id ASC) with 1-based INTEGER ranks.
    "q148_best_of_n" ->
      """WITH r AS (SELECT doc_id % 50 AS prompt_id, doc_id,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward
        |  FROM documents),
        |k AS (SELECT prompt_id, doc_id, reward,
        |    CAST(row_number() OVER (PARTITION BY prompt_id ORDER BY reward DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM r)
        |SELECT prompt_id, doc_id, reward, rank FROM k WHERE rank <= 3""".stripMargin,
    // q149: length-debiased reward — reward centered against the
    // 50-token length cohort in exact integer micro-units (BIGINT
    // floor division on both engines).
    "q149_length_debias" ->
      """WITH r AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |b AS (SELECT doc_id, reward, n_toks // 50 AS bucket FROM r),
        |m AS (SELECT bucket,
        |    CAST((1000000 * sum(reward)) // count(*) AS BIGINT) AS mean_micro
        |  FROM b GROUP BY bucket)
        |SELECT doc_id, b.bucket, reward,
        |  CAST(1000000 * reward - mean_micro AS BIGINT) AS adj_micro
        |FROM b JOIN m USING (bucket)""".stripMargin,
    // q150: conversation-turn flattening — one conversation per user,
    // turns ordered by (ts, event_id), roles alternating from 'user'.
    "q150_turn_flatten" ->
      """SELECT user_id AS conv_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS turn_idx,
        |  CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) % 2 = 1
        |       THEN 'user' ELSE 'assistant' END AS role,
        |  event_type AS content
        |FROM events""".stripMargin,
    // q151: multi-rater reconciliation — 3 pseudo-raters per response
    // (portable hash of (rater, id) mod 100), integer-micro mean,
    // range, disputed at range >= 40.
    "q151_rater_agreement" ->
      """WITH rt AS (SELECT doc_id, unnest([0, 1, 2]) AS rater FROM documents),
        |sc AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(concat('rate_', CAST(rater AS VARCHAR), '_',
        |      CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 100 AS score
        |  FROM rt)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_raters,
        |  CAST((1000000 * sum(score)) // count(*) AS BIGINT) AS mean_micro,
        |  CAST(max(score) - min(score) AS BIGINT) AS score_range,
        |  (max(score) - min(score)) >= 40 AS disputed
        |FROM sc GROUP BY doc_id""".stripMargin,
    // q152: pair-level decontamination — the q147 pairs minus every
    // pair touching a contaminated response (ids ≡ 0 mod 17) on
    // EITHER side.
    "q152_pair_decontam" ->
      """WITH r AS (SELECT doc_id % 50 AS prompt_id, doc_id,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward
        |  FROM documents),
        |c AS (SELECT prompt_id, doc_id, reward,
        |    row_number() OVER (PARTITION BY prompt_id ORDER BY reward DESC, doc_id ASC) AS rc,
        |    row_number() OVER (PARTITION BY prompt_id ORDER BY reward ASC, doc_id ASC) AS rr
        |  FROM r)
        |SELECT ch.prompt_id, ch.doc_id AS chosen_id, rj.doc_id AS rejected_id,
        |  ch.reward AS chosen_score, rj.reward AS rejected_score,
        |  ch.reward - rj.reward AS margin
        |FROM (SELECT * FROM c WHERE rc = 1) ch
        |JOIN (SELECT * FROM c WHERE rr = 1) rj USING (prompt_id)
        |WHERE ch.reward > rj.reward
        |  AND ch.doc_id % 17 <> 0 AND rj.doc_id % 17 <> 0""".stripMargin,
    // q153: SFT role-mask intervals — assistant turns' token intervals
    // in the rendered conversation's token space; user turns still
    // advance the offsets (the loss masks them, the render keeps them).
    "q153_sft_mask" ->
      """WITH t AS (SELECT doc_id % 20 AS conv_id, doc_id AS turn_key,
        |    CASE WHEN (doc_id // 20) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |c AS (SELECT conv_id, turn_key, role, n_toks,
        |    CAST(COALESCE(sum(n_toks) OVER (PARTITION BY conv_id ORDER BY turn_key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |  FROM t)
        |SELECT conv_id, turn_key, tok_start, tok_start + n_toks AS tok_end
        |FROM c WHERE role = 'assistant'""".stripMargin,
    // q154: SFT pack masks — the q153 assistant intervals projected
    // through a conversation-atomic layoutWeighted layout (budget 512)
    // into pack-local coordinates, split at pack boundaries.
    "q154_sft_pack_masks" ->
      """WITH t AS (SELECT doc_id % 20 AS conv_id, doc_id AS turn_key,
        |    CASE WHEN (doc_id // 20) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |iv AS (SELECT conv_id, turn_key, role, n_toks,
        |    CAST(COALESCE(sum(n_toks) OVER (PARTITION BY conv_id ORDER BY turn_key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |  FROM t),
        |asst AS (SELECT conv_id, turn_key, tok_start, tok_start + n_toks AS tok_end
        |  FROM iv WHERE role = 'assistant'),
        |ct AS (SELECT conv_id, CAST(sum(n_toks) AS BIGINT) AS c_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(conv_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM t GROUP BY conv_id),
        |lay AS (SELECT conv_id,
        |    CAST(sum(c_toks) OVER (ORDER BY h % 8, h, conv_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c_toks AS BIGINT) AS start_tok
        |  FROM ct),
        |gi AS (SELECT a.conv_id, a.turn_key,
        |    l.start_tok + a.tok_start AS gs, l.start_tok + a.tok_end AS ge
        |  FROM asst a JOIN lay l USING (conv_id)),
        |ux AS (SELECT conv_id, turn_key, gs, ge,
        |    unnest(range(gs // 512, (ge - 1) // 512 + 1)) AS pack_id FROM gi)
        |SELECT CAST(pack_id AS BIGINT) AS pack_id, conv_id, turn_key,
        |  CAST(greatest(gs, pack_id * 512) - pack_id * 512 AS BIGINT) AS mask_start,
        |  CAST(least(ge, (pack_id + 1) * 512) - pack_id * 512 AS BIGINT) AS mask_end,
        |  CAST(least(ge, (pack_id + 1) * 512) - greatest(gs, pack_id * 512) AS BIGINT) AS n_mask_tokens
        |FROM ux""".stripMargin,
    // q155: incremental preference pairs — a parity-split two-batch
    // ingest (with an exactly-once replay) whose state read-back must
    // equal the ONE-SHOT q147 over the full corpus; the oracle is
    // therefore exactly q147's SQL.
    "q155_pref_ingest" ->
      """WITH r AS (SELECT doc_id % 50 AS prompt_id, doc_id,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward
        |  FROM documents),
        |c AS (SELECT prompt_id, doc_id, reward,
        |    row_number() OVER (PARTITION BY prompt_id ORDER BY reward DESC, doc_id ASC) AS rc,
        |    row_number() OVER (PARTITION BY prompt_id ORDER BY reward ASC, doc_id ASC) AS rr
        |  FROM r)
        |SELECT ch.prompt_id, ch.doc_id AS chosen_id, rj.doc_id AS rejected_id,
        |  ch.reward AS chosen_score, rj.reward AS rejected_score,
        |  ch.reward - rj.reward AS margin
        |FROM (SELECT * FROM c WHERE rc = 1) ch
        |JOIN (SELECT * FROM c WHERE rr = 1) rj USING (prompt_id)
        |WHERE ch.reward > rj.reward""".stripMargin,
    // q156: KTO unroll — the q147 pairs flattened to pointwise
    // (prompt, response, score, ±1) rows.
    "q156_kto_labels" ->
      """WITH r AS (SELECT doc_id % 50 AS prompt_id, doc_id,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward
        |  FROM documents),
        |c AS (SELECT prompt_id, doc_id, reward,
        |    row_number() OVER (PARTITION BY prompt_id ORDER BY reward DESC, doc_id ASC) AS rc,
        |    row_number() OVER (PARTITION BY prompt_id ORDER BY reward ASC, doc_id ASC) AS rr
        |  FROM r),
        |p AS (SELECT ch.prompt_id, ch.doc_id AS chosen_id, rj.doc_id AS rejected_id,
        |    ch.reward AS chosen_score, rj.reward AS rejected_score
        |  FROM (SELECT * FROM c WHERE rc = 1) ch
        |  JOIN (SELECT * FROM c WHERE rr = 1) rj USING (prompt_id)
        |  WHERE ch.reward > rj.reward)
        |SELECT prompt_id, chosen_id AS doc_id, chosen_score AS score, CAST(1 AS INTEGER) AS label FROM p
        |UNION ALL
        |SELECT prompt_id, rejected_id, rejected_score, CAST(-1 AS INTEGER) FROM p""".stripMargin,
    // q157: group-relative advantage — reward centered against the
    // prompt mean under BIGINT floor division (the GRPO baseline).
    "q157_grpo_advantage" ->
      """WITH r AS (SELECT doc_id % 50 AS prompt_id, doc_id,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward
        |  FROM documents),
        |m AS (SELECT prompt_id,
        |    CAST((1000000 * sum(reward)) // count(*) AS BIGINT) AS mean_micro
        |  FROM r GROUP BY prompt_id)
        |SELECT prompt_id, doc_id, reward,
        |  CAST(1000000 * reward - mean_micro AS BIGINT) AS adv_micro
        |FROM r JOIN m USING (prompt_id)""".stripMargin,
    // q159: within-prompt response dedup — even/odd id pairs share the
    // even id's text, prompts are blocks of 10, the keep is the
    // group's argmax-reward copy (ties to the smaller id).
    "q159_response_dedup" ->
      """WITH r AS (SELECT doc_id // 10 AS prompt_id, doc_id,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000 AS reward,
        |    doc_id // 2 * 2 AS src_id
        |  FROM documents),
        |c AS (SELECT r.prompt_id, r.doc_id, r.reward, md5(d.text) AS content_hash
        |  FROM r JOIN documents d ON d.doc_id = r.src_id),
        |k AS (SELECT prompt_id, doc_id, reward, content_hash,
        |    (row_number() OVER (PARTITION BY prompt_id, content_hash
        |      ORDER BY reward DESC, doc_id ASC)) = 1 AS keep
        |  FROM c)
        |SELECT prompt_id, doc_id, reward, content_hash, keep FROM k""".stripMargin,
    // q160: policy win matrix — per unordered policy pair, prompts
    // where each policy's best reward beats the other's (ties
    // separate); wins_a + wins_b + ties == n_prompts.
    "q160_win_matrix" ->
      """WITH r AS (SELECT doc_id % 50 AS prompt_id,
        |    concat('p', CAST(doc_id % 3 AS VARCHAR)) AS policy,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward
        |  FROM documents),
        |b AS (SELECT prompt_id, policy, max(reward) AS best FROM r GROUP BY 1, 2)
        |SELECT a.policy AS policy_a, c.policy AS policy_b,
        |  CAST(sum(CASE WHEN a.best > c.best THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
        |  CAST(sum(CASE WHEN c.best > a.best THEN 1 ELSE 0 END) AS BIGINT) AS wins_b,
        |  CAST(sum(CASE WHEN a.best = c.best THEN 1 ELSE 0 END) AS BIGINT) AS ties,
        |  CAST(count(*) AS BIGINT) AS n_prompts
        |FROM b a JOIN b c ON a.prompt_id = c.prompt_id AND a.policy < c.policy
        |GROUP BY 1, 2""".stripMargin,
    // q161: incremental win matrix — the parity-split two-batch fold
    // plus a replayed batch reads back to exactly the one-shot q160
    // (max is a semilattice; the replay no-ops), so the oracle IS the
    // q160 replay over the full corpus.
    "q161_win_ingest" ->
      """WITH r AS (SELECT doc_id % 50 AS prompt_id,
        |    concat('p', CAST(doc_id % 3 AS VARCHAR)) AS policy,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward
        |  FROM documents),
        |b AS (SELECT prompt_id, policy, max(reward) AS best FROM r GROUP BY 1, 2)
        |SELECT a.policy AS policy_a, c.policy AS policy_b,
        |  CAST(sum(CASE WHEN a.best > c.best THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
        |  CAST(sum(CASE WHEN c.best > a.best THEN 1 ELSE 0 END) AS BIGINT) AS wins_b,
        |  CAST(sum(CASE WHEN a.best = c.best THEN 1 ELSE 0 END) AS BIGINT) AS ties,
        |  CAST(count(*) AS BIGINT) AS n_prompts
        |FROM b a JOIN b c ON a.prompt_id = c.prompt_id AND a.policy < c.policy
        |GROUP BY 1, 2""".stripMargin,
    // q162: pack decode — decode(encode(x)) == x, so the replay never
    // touches ids: the q111 slice tokens string-aggregated per pack in
    // position order.
    "q162_decode_packs" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts FROM documents),
        |b AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM tk),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |sel AS (SELECT doc_id, cum - n_toks AS start_tok FROM g WHERE cum - n_toks < 6144),
        |ux AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |      i -> {'pos': CAST(i - 1 AS BIGINT), 'tok': ts[i]})) AS u
        |  FROM tk),
        |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM ux)
        |SELECT (start_tok + pos) // 2048 AS pack_id,
        |  string_agg(tok, ' ' ORDER BY start_tok + pos) AS text,
        |  CAST(count(*) AS BIGINT) AS n_tokens
        |FROM tok JOIN sel USING (doc_id)
        |WHERE start_tok + pos < 6144 AND tok <> ''
        |GROUP BY 1""".stripMargin,
    // q163: Bradley-Terry arena ratings — the q160 matrix fit by 10
    // unrolled MM iterations in exact HUGEINT micro-unit arithmetic
    // (ties as half-wins; see btOracle's scaladoc for the contract).
    "q163_bt_ratings" -> btOracle(10),
    // q164: DSIR importance selection — hashed-bigram bucket
    // histogram with add-one smoothed target/raw micro-ratios
    // (doc_id % 10 == 0 is the target seed), per-doc occurrence sums,
    // deterministic top-500 by length-normalized score.
    "q164_dsir_select" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS gram
        |  FROM t),
        |h AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(gram), 1, 7)) AS BIGINT) % 1024 AS bucket,
        |    doc_id % 10 = 0 AS is_t
        |  FROM g),
        |wt AS (SELECT bucket,
        |    ((CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) + 1) * 1000000)
        |      // (CAST(count(*) AS BIGINT) + 1) AS w_micro
        |  FROM h GROUP BY 1),
        |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(w_micro) AS BIGINT) AS score_micro
        |  FROM h JOIN wt USING (bucket) GROUP BY 1)
        |SELECT doc_id, n_bigrams, score_micro,
        |  CAST(score_micro // n_bigrams AS BIGINT) AS avg_micro
        |FROM s ORDER BY avg_micro DESC, doc_id ASC LIMIT 500""".stripMargin,
    // q165: epochs-to-exhaustion — the q139 Hamilton apportionment at
    // a 10M-token budget, each source's quota floor-divided by its
    // available tokens into milli-epochs, over-cap at 4000 (4 epochs).
    "q165_budget_exhaustion" ->
      """WITH t AS (SELECT source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |g AS (SELECT source, CAST(sum(n) AS BIGINT) AS tok_total FROM t GROUP BY source),
        |m AS (SELECT max(tok_total) AS mx FROM g),
        |w AS (SELECT source,
        |    CAST(floor(1000000.0 * (sqrt(CAST(tok_total AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE)))) AS BIGINT) AS w_micro
        |  FROM g, m),
        |s AS (SELECT CAST(sum(w_micro) AS HUGEINT) AS tw FROM w),
        |b AS (SELECT source, w_micro,
        |    CAST((CAST(10000000 AS HUGEINT) * w_micro) // tw AS BIGINT) AS base,
        |    (CAST(10000000 AS HUGEINT) * w_micro) % tw AS rem
        |  FROM w, s),
        |r AS (SELECT source, w_micro, base,
        |    row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
        |  FROM b),
        |d AS (SELECT CAST(10000000 - sum(base) AS BIGINT) AS leftover FROM b),
        |q AS (SELECT source, w_micro,
        |    base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END) AS quota
        |  FROM r, d)
        |SELECT q.source, q.w_micro, g.tok_total AS avail_toks,
        |  CAST(q.quota AS BIGINT) AS quota,
        |  CAST((1000 * q.quota) // g.tok_total AS BIGINT) AS epochs_milli,
        |  (1000 * q.quota) // g.tok_total > 4000 AS over_cap
        |FROM q JOIN g USING (source)""".stripMargin,
    // q166: BT calibration — predicted-vs-observed win rate per pair
    // from the same unrolled 10-iteration fit (see btOracle).
    "q166_bt_calibration" -> btOracle(10, tail = "calibration"),
    // q167: vocabulary coverage curve — min number of token types
    // (most-frequent-first, lexicographic ties) covering each target
    // share of the token stream; the test is multiplication-only.
    "q167_vocab_coverage" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents),
        |h AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok WHERE token <> '' GROUP BY 1),
        |r AS (SELECT cnt,
        |    row_number() OVER (ORDER BY cnt DESC, token ASC) AS rnk,
        |    sum(cnt) OVER (ORDER BY cnt DESC, token ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS ntypes FROM h),
        |g AS (SELECT CAST(unnest([500, 900, 950, 990]) AS BIGINT) AS coverage_milli)
        |SELECT g.coverage_milli, CAST(min(r.rnk) AS BIGINT) AS n_types,
        |  t.ntypes AS total_types, t.tot AS total_tokens
        |FROM g, t, r
        |WHERE r.cum * 1000 >= g.coverage_milli * t.tot
        |GROUP BY 1, 3, 4""".stripMargin,
    // q168: semantic (in-context) packing — the q58 two-iteration
    // k-means assignment becomes the stratification key of the q113
    // per-group layout; docs without an embedding are excluded by the
    // inner join on both sides.
    "q168_semantic_packing" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
        |d1 AS (SELECT vec_id, cid, v,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(v, cv), p -> (p[1]-p[2])*(p[1]-p[2]))), (a,x) -> a+x) AS dist
        |  FROM e, c0),
        |a1 AS (SELECT vec_id, cid AS cluster, v FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d1) WHERE rk = 1),
        |x1 AS (SELECT cluster, unnest(range(1, len(v)+1)) AS pos, unnest(v) AS x FROM a1),
        |m1 AS (SELECT cluster, pos, CAST(sum(CAST(floor(x * 1048576) AS BIGINT)) AS DOUBLE) / (count(*) * 1048576.0) AS cv
        |  FROM x1 GROUP BY cluster, pos),
        |c1 AS (SELECT cluster AS cid, list(cv ORDER BY pos) AS cv FROM m1 GROUP BY cluster),
        |d2 AS (SELECT a1.vec_id, c1.cid,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(a1.v, c1.cv), p -> (p[1]-p[2])*(p[1]-p[2]))), (a,x) -> a+x) AS dist
        |  FROM a1, c1),
        |cl AS (SELECT vec_id AS doc_id, cid AS cluster FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d2) WHERE rk = 1),
        |b AS (SELECT d.doc_id, cl.cluster,
        |    CAST(len(regexp_split_to_array(d.text, '\s+')) AS BIGINT) AS n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(d.doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM documents d JOIN cl USING (doc_id)),
        |g AS (SELECT doc_id, cluster, CAST(h % 8 AS INTEGER) AS shard, n_toks,
        |    CAST(sum(n_toks) OVER (PARTITION BY cluster ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b)
        |SELECT doc_id, cluster, shard, cum - n_toks AS start_tok, n_toks,
        |  (cum - n_toks) // 2048 AS first_pack,
        |  (cum - 1) // 2048 AS last_pack,
        |  (cum - 1) // 2048 - (cum - n_toks) // 2048 + 1 AS n_packs
        |FROM g""".stripMargin,
    // q169: reward-on-length least-squares slope per policy — exact
    // HUGEINT sums, closed form, both divisions FLOOR (numerators can
    // go negative on shorter-is-better biases).
    "q169_length_bias_slope" ->
      """WITH r AS (SELECT concat('p', CAST(doc_id % 3 AS VARCHAR)) AS policy,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |a AS (SELECT policy, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(n_toks) AS HUGEINT) AS sx, CAST(sum(reward) AS HUGEINT) AS sy,
        |    CAST(sum(n_toks * reward) AS HUGEINT) AS sxy,
        |    CAST(sum(n_toks * n_toks) AS HUGEINT) AS sxx
        |  FROM r GROUP BY 1),
        |c AS (SELECT policy, n, sy, sx, 1000000 * (n * sxy - sx * sy) AS num, n * sxx - sx * sx AS vxx
        |  FROM a WHERE n * sxx - sx * sx > 0),
        |s AS (SELECT policy, n, sy, sx,
        |    (num - (((num % vxx) + vxx) % vxx)) // vxx AS slope FROM c),
        |i AS (SELECT policy, n, slope, 1000000 * sy - slope * sx AS inum FROM s)
        |SELECT policy, CAST(n AS BIGINT) AS n, CAST(slope AS BIGINT) AS slope_micro,
        |  CAST((inum - (((inum % n) + n) % n)) // n AS BIGINT) AS intercept_micro
        |FROM i""".stripMargin,
    // q170: duplication profile — cluster-size histogram over the q141
    // recursive near-dup closure, singletons as size-1 clusters; the
    // rows partition the corpus (sum(n_docs) == |documents|).
    "q170_dup_profile" ->
      """WITH RECURSIVE tk AS (SELECT doc_id, list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(th) >= 3
        |       THEN list_distinct(list_transform(range(1, len(th) - 1),
        |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
        |       ELSE [] END AS sh_ints FROM tk),
        |inv AS (SELECT doc_id, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
        |  HAVING CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
        |allc AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
        |  FROM documents d LEFT JOIN comp c USING (doc_id)),
        |sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size FROM allc GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
        |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_components,
        |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
        |  CAST((1000000 * cluster_size * count(*)) // t.total AS BIGINT) AS share_micro
        |FROM sizes, tot t GROUP BY cluster_size, t.total""".stripMargin,
    // q171: sliding-window chunking — 32-token windows at stride 24,
    // a chunk emitted only when it ADDS tokens (chunk 0 always; a
    // later one only if its predecessor did not already reach the
    // document's end); empty docs emit nothing.
    "q171_sliding_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |nn AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM t WHERE len(w) > 0),
        |s AS (SELECT doc_id, w, n, unnest(range(0, n, 24)) AS start_tok FROM nn)
        |SELECT doc_id, start_tok // 24 AS chunk_idx, start_tok,
        |  least(CAST(32 AS BIGINT), n - start_tok) AS n_chunk_toks,
        |  array_to_string(w[start_tok + 1 : start_tok + least(CAST(32 AS BIGINT), n - start_tok)], ' ') AS chunk
        |FROM s WHERE start_tok = 0 OR start_tok - 24 + 32 < n""".stripMargin,
    // q172: branched-conversation training paths — 20-turn blocks,
    // every 5th turn regenerating from three turns back; recursive
    // ancestor walk from the leaves, first-visit train flag at the
    // smallest leaf.
    "q172_tree_paths" ->
      """WITH RECURSIVE turns AS (SELECT doc_id // 20 AS conv, doc_id AS turn,
        |    CASE WHEN doc_id % 20 = 0 THEN NULL
        |         WHEN doc_id % 5 = 4 THEN doc_id - 3
        |         ELSE doc_id - 1 END AS parent
        |  FROM documents),
        |leaves AS (SELECT t.turn AS leaf FROM turns t
        |  WHERE NOT EXISTS (SELECT 1 FROM turns c WHERE c.parent = t.turn)),
        |walk(leaf, turn, d) AS (
        |  SELECT leaf, leaf, 0 FROM leaves
        |  UNION ALL
        |  SELECT w.leaf, t.parent, w.d + 1
        |  FROM walk w JOIN turns t ON t.turn = w.turn
        |  WHERE t.parent IS NOT NULL),
        |plen AS (SELECT leaf, max(d) AS len FROM walk GROUP BY 1),
        |fv AS (SELECT turn, min(leaf) AS first_leaf FROM walk GROUP BY 1)
        |SELECT t.conv AS conv_id, w.leaf AS path_id,
        |  CAST(p.len - w.d AS BIGINT) AS pos, w.turn AS turn_id,
        |  (w.leaf = f.first_leaf) AS train
        |FROM walk w JOIN plen p USING (leaf) JOIN fv f ON f.turn = w.turn
        |JOIN turns t ON t.turn = w.turn""".stripMargin,
    // q174: tree-rendered path memberships — the q172 walk joined to
    // roles (turn parity) and content, with the effective role:
    // 'assistant' exactly on first-visit assistant memberships,
    // 'context' everywhere else.
    "q174_tree_render" ->
      """WITH RECURSIVE turns AS (SELECT doc_id // 20 AS conv, doc_id AS turn,
        |    CASE WHEN doc_id % 20 = 0 THEN NULL
        |         WHEN doc_id % 5 = 4 THEN doc_id - 3
        |         ELSE doc_id - 1 END AS parent,
        |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        |    text AS content
        |  FROM documents),
        |leaves AS (SELECT t.turn AS leaf FROM turns t
        |  WHERE NOT EXISTS (SELECT 1 FROM turns c WHERE c.parent = t.turn)),
        |walk(leaf, turn, d) AS (
        |  SELECT leaf, leaf, 0 FROM leaves
        |  UNION ALL
        |  SELECT w.leaf, t.parent, w.d + 1
        |  FROM walk w JOIN turns t ON t.turn = w.turn
        |  WHERE t.parent IS NOT NULL),
        |plen AS (SELECT leaf, max(d) AS len FROM walk GROUP BY 1),
        |fv AS (SELECT turn, min(leaf) AS first_leaf FROM walk GROUP BY 1)
        |SELECT t.conv AS conv_id, w.leaf AS path_id,
        |  CAST(p.len - w.d AS BIGINT) AS pos, w.turn AS turn_id,
        |  t.role, t.content, (w.leaf = f.first_leaf) AS train,
        |  CASE WHEN (w.leaf = f.first_leaf) AND t.role = 'assistant'
        |       THEN 'assistant' ELSE 'context' END AS eff_role
        |FROM walk w JOIN plen p USING (leaf) JOIN fv f ON f.turn = w.turn
        |JOIN turns t ON t.turn = w.turn""".stripMargin,
    // q177: branch preference pairs — sibling assistant turns under
    // the same parent (regenerations) paired chosen/rejected by the
    // rw_ hash reward; preferencePairs' tie + zero-margin contract.
    "q177_branch_pairs" ->
      """WITH turns AS (SELECT doc_id // 20 AS conv, doc_id AS turn,
        |    CASE WHEN doc_id % 20 = 0 THEN NULL
        |         WHEN doc_id % 5 = 4 THEN doc_id - 3
        |         ELSE doc_id - 1 END AS parent,
        |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        |    CAST(concat('0x', substr(md5(concat('rw_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000 AS score
        |  FROM documents),
        |g AS (SELECT conv AS conv_id, parent AS parent_id,
        |    (array_agg(turn ORDER BY score DESC, turn ASC))[1] AS chosen_id,
        |    (array_agg(turn ORDER BY score ASC, turn ASC))[1] AS rejected_id,
        |    max(score) AS chosen_score, min(score) AS rejected_score,
        |    count(*) AS n
        |  FROM turns WHERE role = 'assistant' AND parent IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT conv_id, parent_id, chosen_id, rejected_id,
        |  chosen_score, rejected_score,
        |  chosen_score - rejected_score AS margin
        |FROM g WHERE n >= 2 AND chosen_score > rejected_score""".stripMargin,
    // q178: rendered branch pairs — the q177 pairs as DPO triples,
    // the prompt a recursive ancestor walk from each pair's parent
    // string_agg'd root-first.
    "q178_branch_pairs_rendered" ->
      """WITH RECURSIVE turns AS (SELECT doc_id // 20 AS conv, doc_id AS turn,
        |    CASE WHEN doc_id % 20 = 0 THEN NULL
        |         WHEN doc_id % 5 = 4 THEN doc_id - 3
        |         ELSE doc_id - 1 END AS parent,
        |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        |    text AS content,
        |    CAST(concat('0x', substr(md5(concat('rw_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000 AS score
        |  FROM documents),
        |g AS (SELECT conv AS conv_id, parent AS parent_id,
        |    (array_agg(turn ORDER BY score DESC, turn ASC))[1] AS chosen_id,
        |    (array_agg(turn ORDER BY score ASC, turn ASC))[1] AS rejected_id,
        |    max(score) AS chosen_score, min(score) AS rejected_score,
        |    count(*) AS n
        |  FROM turns WHERE role = 'assistant' AND parent IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT conv_id, parent_id, chosen_id, rejected_id,
        |    chosen_score, rejected_score,
        |    chosen_score - rejected_score AS margin
        |  FROM g WHERE n >= 2 AND chosen_score > rejected_score),
        |anc(parent_id, node, d) AS (
        |  SELECT DISTINCT parent_id, parent_id, 0 FROM p
        |  UNION ALL
        |  SELECT a.parent_id, t.parent, a.d + 1
        |  FROM anc a JOIN turns t ON t.turn = a.node WHERE t.parent IS NOT NULL),
        |pr AS (SELECT a.parent_id, string_agg(t.content, ' ' ORDER BY a.d DESC) AS prompt
        |  FROM anc a JOIN turns t ON t.turn = a.node GROUP BY a.parent_id)
        |SELECT p.conv_id, p.parent_id, pr.prompt, p.chosen_id, p.rejected_id,
        |  tc.content AS chosen, tj.content AS rejected,
        |  p.chosen_score, p.rejected_score, p.margin
        |FROM p JOIN pr USING (parent_id)
        |JOIN turns tc ON tc.turn = p.chosen_id
        |JOIN turns tj ON tj.turn = p.rejected_id""".stripMargin,
    // q179: durable tree-membership state — three incremental folds
    // must equal the from-scratch walk over the full store, so the
    // oracle IS q172's recursive CTE (the state's whole contract).
    "q179_tree_state" ->
      """WITH RECURSIVE turns AS (SELECT doc_id // 20 AS conv, doc_id AS turn,
        |    CASE WHEN doc_id % 20 = 0 THEN NULL
        |         WHEN doc_id % 5 = 4 THEN doc_id - 3
        |         ELSE doc_id - 1 END AS parent
        |  FROM documents),
        |leaves AS (SELECT t.turn AS leaf FROM turns t
        |  WHERE NOT EXISTS (SELECT 1 FROM turns c WHERE c.parent = t.turn)),
        |walk(leaf, turn, d) AS (
        |  SELECT leaf, leaf, 0 FROM leaves
        |  UNION ALL
        |  SELECT w.leaf, t.parent, w.d + 1
        |  FROM walk w JOIN turns t ON t.turn = w.turn
        |  WHERE t.parent IS NOT NULL),
        |plen AS (SELECT leaf, max(d) AS len FROM walk GROUP BY 1),
        |fv AS (SELECT turn, min(leaf) AS first_leaf FROM walk GROUP BY 1)
        |SELECT t.conv AS conv_id, w.leaf AS path_id,
        |  CAST(p.len - w.d AS BIGINT) AS pos, w.turn AS turn_id,
        |  (w.leaf = f.first_leaf) AS train
        |FROM walk w JOIN plen p USING (leaf) JOIN fv f ON f.turn = w.turn
        |JOIN turns t ON t.turn = w.turn""".stripMargin,
    // q180: the q178 triples + model-token counts — the q178 walk +
    // the q115 merge chain + a distinct-word vocab under it + one
    // word-unnest count sum per triple member.
    "q180_dpo_token_coords" ->
      (s"WITH RECURSIVE $dpoTriplesCtes,\n${bpeWordChain(8)}${dpoCntsCtes(8)}\n" +
        """SELECT t.conv_id, t.parent_id, t.prompt, t.chosen_id, t.rejected_id,
          |  t.chosen, t.rejected, t.chosen_score, t.rejected_score, t.margin,
          |  CAST(coalesce(cp.toks, 0) AS BIGINT) AS prompt_toks,
          |  CAST(coalesce(cc.toks, 0) AS BIGINT) AS chosen_toks,
          |  CAST(coalesce(cr.toks, 0) AS BIGINT) AS rejected_toks
          |FROM tri t
          |LEFT JOIN cnts cp ON cp.conv_id = t.conv_id AND cp.parent_id = t.parent_id AND cp.member = 'prompt'
          |LEFT JOIN cnts cc ON cc.conv_id = t.conv_id AND cc.parent_id = t.parent_id AND cc.member = 'chosen'
          |LEFT JOIN cnts cr ON cr.conv_id = t.conv_id AND cr.parent_id = t.parent_id AND cr.member = 'rejected'""".stripMargin),
    // q181: q169's exact micro-unit regression over the q180
    // coordinates, keyed by triple side — HUGEINT sums, floor
    // divisions, zero-variance groups dropped.
    "q181_dpo_length_bias" ->
      (s"WITH RECURSIVE $dpoTriplesCtes,\n${bpeWordChain(8)}${dpoCntsCtes(8)},\n" +
        """pw AS (
          |  SELECT 'chosen' AS side, CAST(coalesce(c1.toks, 0) AS BIGINT) AS toks, t.chosen_score AS score
          |  FROM tri t LEFT JOIN cnts c1 ON c1.conv_id = t.conv_id AND c1.parent_id = t.parent_id AND c1.member = 'chosen'
          |  UNION ALL
          |  SELECT 'rejected', CAST(coalesce(c2.toks, 0) AS BIGINT), t.rejected_score
          |  FROM tri t LEFT JOIN cnts c2 ON c2.conv_id = t.conv_id AND c2.parent_id = t.parent_id AND c2.member = 'rejected'),
          |a AS (SELECT side AS policy, CAST(count(*) AS HUGEINT) AS n,
          |    CAST(sum(toks) AS HUGEINT) AS sx, CAST(sum(score) AS HUGEINT) AS sy,
          |    CAST(sum(toks * score) AS HUGEINT) AS sxy, CAST(sum(toks * toks) AS HUGEINT) AS sxx
          |  FROM pw GROUP BY 1),
          |c AS (SELECT policy, n, sy, sx, 1000000 * (n * sxy - sx * sy) AS num, n * sxx - sx * sx AS vxx
          |  FROM a WHERE n * sxx - sx * sx > 0),
          |s AS (SELECT policy, n, sy, sx,
          |    (num - (((num % vxx) + vxx) % vxx)) // vxx AS slope FROM c),
          |i AS (SELECT policy, n, slope, 1000000 * sy - slope * sx AS inum FROM s)
          |SELECT policy, CAST(n AS BIGINT) AS n, CAST(slope AS BIGINT) AS slope_micro,
          |  CAST((inum - (((inum % n) + n) % n)) // n AS BIGINT) AS intercept_micro
          |FROM i""".stripMargin),
    // q183: the q180 totals -> one global ascending-length rank ->
    // fixed 8-pair atomic batches (the padding-minimizing layout).
    "q183_dpo_length_batches" ->
      (s"WITH RECURSIVE $dpoTriplesCtes,\n${bpeWordChain(8)}${dpoCntsCtes(8)},\n" +
        """tot AS (SELECT t.conv_id, t.parent_id,
          |    CAST(coalesce(cp.toks, 0) + coalesce(cc.toks, 0) + coalesce(cr.toks, 0) AS BIGINT) AS total_toks
          |  FROM tri t
          |  LEFT JOIN cnts cp ON cp.conv_id = t.conv_id AND cp.parent_id = t.parent_id AND cp.member = 'prompt'
          |  LEFT JOIN cnts cc ON cc.conv_id = t.conv_id AND cc.parent_id = t.parent_id AND cc.member = 'chosen'
          |  LEFT JOIN cnts cr ON cr.conv_id = t.conv_id AND cr.parent_id = t.parent_id AND cr.member = 'rejected'),
          |rk AS (SELECT conv_id, parent_id, total_toks,
          |    row_number() OVER (ORDER BY total_toks, conv_id, parent_id) - 1 AS r FROM tot)
          |SELECT conv_id, parent_id, total_toks,
          |  r // 8 AS batch_id, r % 8 AS pos_in_batch FROM rk""".stripMargin),
    // q184: per-batch padding audit over the q183 layout — member
    // count, padded length, token sum, waste, and waste per-mille.
    "q184_dpo_batch_padding" ->
      (s"WITH RECURSIVE $dpoTriplesCtes,\n${bpeWordChain(8)}${dpoCntsCtes(8)},\n" +
        """tot AS (SELECT t.conv_id, t.parent_id,
          |    CAST(coalesce(cp.toks, 0) + coalesce(cc.toks, 0) + coalesce(cr.toks, 0) AS BIGINT) AS total_toks
          |  FROM tri t
          |  LEFT JOIN cnts cp ON cp.conv_id = t.conv_id AND cp.parent_id = t.parent_id AND cp.member = 'prompt'
          |  LEFT JOIN cnts cc ON cc.conv_id = t.conv_id AND cc.parent_id = t.parent_id AND cc.member = 'chosen'
          |  LEFT JOIN cnts cr ON cr.conv_id = t.conv_id AND cr.parent_id = t.parent_id AND cr.member = 'rejected'),
          |rk AS (SELECT total_toks,
          |    row_number() OVER (ORDER BY total_toks, conv_id, parent_id) - 1 AS r FROM tot),
          |bt AS (SELECT r // 8 AS batch_id, CAST(count(*) AS BIGINT) AS n_pairs,
          |    CAST(max(total_toks) AS BIGINT) AS max_toks, CAST(sum(total_toks) AS BIGINT) AS sum_toks
          |  FROM rk GROUP BY 1)
          |SELECT batch_id, n_pairs, max_toks, sum_toks,
          |  max_toks * n_pairs - sum_toks AS pad_waste,
          |  CASE WHEN max_toks * n_pairs = 0 THEN 0
          |       ELSE (1000 * (max_toks * n_pairs - sum_toks)) // (max_toks * n_pairs) END AS pad_millis
          |FROM bt""".stripMargin),
    // q182: the q178 triples anti-joined against the q54 shingle
    // chain over each rendered member — any-member containment >= 0.5
    // vs the doc_id % 10 = 0 eval split purges the pair.
    "q182_dpo_eval_decontam" ->
      (s"WITH RECURSIVE $dpoTriplesCtes,\n" +
        """mem AS (SELECT conv_id, parent_id, 'prompt' AS member, prompt AS txt FROM tri
          |  UNION ALL SELECT conv_id, parent_id, 'chosen', chosen FROM tri
          |  UNION ALL SELECT conv_id, parent_id, 'rejected', rejected FROM tri),
          |mtk AS (SELECT conv_id, parent_id, member, list_transform(regexp_split_to_array(txt, '\s+'),
          |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th FROM mem),
          |msh AS (SELECT conv_id, parent_id, member,
          |  CASE WHEN len(th) >= 3
          |       THEN list_distinct(list_transform(range(1, len(th) - 1),
          |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
          |       ELSE [] END AS sh_ints FROM mtk),
          |etk AS (SELECT list_transform(regexp_split_to_array(text, '\s+'),
          |    t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT)) AS th
          |  FROM documents WHERE doc_id % 10 = 0),
          |ev AS (SELECT DISTINCT unnest(sh_ints) AS shingle FROM (
          |  SELECT CASE WHEN len(th) >= 3
          |       THEN list_distinct(list_transform(range(1, len(th) - 1),
          |              i -> (((th[i] * 8191 + th[i+1]) % 2147483647) * 8191 + th[i+2]) % 2147483647))
          |       ELSE [] END AS sh_ints FROM etk)),
          |inv AS (SELECT conv_id, parent_id, member, len(sh_ints) AS n_sh, unnest(sh_ints) AS shingle FROM msh),
          |bad AS (SELECT DISTINCT conv_id, parent_id FROM (
          |  SELECT i.conv_id, i.parent_id FROM inv i JOIN ev USING (shingle)
          |  GROUP BY i.conv_id, i.parent_id, i.member, i.n_sh
          |  HAVING CAST(count(*) AS DOUBLE) / i.n_sh >= 0.5))
          |SELECT t.conv_id, t.parent_id, t.prompt, t.chosen_id, t.rejected_id,
          |  t.chosen, t.rejected, t.chosen_score, t.rejected_score, t.margin
          |FROM tri t WHERE NOT EXISTS (
          |  SELECT 1 FROM bad b WHERE b.conv_id = t.conv_id AND b.parent_id = t.parent_id)""".stripMargin),
    // q173: few-shot prompt assembly — 3 seeded-hash shots per eval
    // item from the train pool's dense doc-id rank, rendered
    // shot1 shot2 shot3 query; shot ids as a joined string.
    "q173_fewshot_prompts" ->
      """WITH tr AS (SELECT doc_id, text,
        |    row_number() OVER (ORDER BY doc_id) - 1 AS rnk
        |  FROM documents WHERE doc_id % 10 <> 0),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tr),
        |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |sl AS (SELECT e.doc_id, e.text AS q, s.slot,
        |    CAST(concat('0x', substr(md5(concat('fs_', CAST(e.doc_id AS VARCHAR), '_',
        |      CAST(s.slot AS VARCHAR))), 1, 7)) AS BIGINT) % n.nt AS rnk
        |  FROM ev e, (SELECT unnest(range(0, 3)) AS slot) s, n),
        |j AS (SELECT sl.doc_id, sl.q, sl.slot, tr.doc_id AS shot_id, tr.text AS stext
        |  FROM sl JOIN tr USING (rnk))
        |SELECT doc_id,
        |  string_agg(CAST(shot_id AS VARCHAR), ',' ORDER BY slot) AS shot_ids,
        |  string_agg(stext, ' ' ORDER BY slot) || ' ' || min(q) AS prompt
        |FROM j GROUP BY doc_id""".stripMargin
  )

  /** Unrolled DuckDB replay of the without-replacement few-shot draw
    * (q176, `FewShot.assembleDistinct`): slot i's chosen rank is the
    * FIRST candidate on its forward probe walk `(base_i + p) mod n`,
    * p = 0..k−1, not taken by an earlier slot — unrolled as chained
    * CTEs c0..c{k−1} (slot 0 never collides; slot i filters its
    * candidate list against the i earlier chosen columns), exactly
    * the engine's per-row array fold.
    */
  private def fewshotDistinctOracle(k: Int): String = {
    val bases = (0 until k)
      .map(i =>
        s"CAST(concat('0x', substr(md5(concat('fsd_', CAST(e.doc_id AS VARCHAR), " +
          s"'_', '$i')), 1, 7)) AS BIGINT) % n.nt AS b$i")
      .mkString(",\n    ")
    val sb = new StringBuilder
    sb.append(
      s"""WITH tr AS (SELECT doc_id, text,
         |    row_number() OVER (ORDER BY doc_id) - 1 AS rnk
         |  FROM documents WHERE doc_id % 97 = 0),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tr),
         |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
         |c0 AS (SELECT e.doc_id, e.text AS q, n.nt,
         |    $bases
         |  FROM ev e, n)""".stripMargin)
    sb.append(",\nd0 AS (SELECT *, b0 AS ch0 FROM c0)")
    for (i <- 1 until k) {
      val nots = (0 until i).map(j => s"c <> ch$j").mkString(" AND ")
      sb.append(s""",
        |d$i AS (SELECT *, list_filter(list_transform(range(0, $k),
        |    p -> (b$i + p) % nt), c -> $nots)[1] AS ch$i FROM d${i - 1})""".stripMargin)
    }
    val chList = (0 until k).map(i => s"ch$i").mkString(", ")
    sb.append(s""",
      |sl AS (SELECT doc_id, q, u.slot, [$chList][u.slot + 1] AS rnk
      |  FROM d${k - 1}, (SELECT unnest(range(0, $k)) AS slot) u),
      |j AS (SELECT sl.doc_id, sl.q, sl.slot, tr.doc_id AS shot_id, tr.text AS stext
      |  FROM sl JOIN tr USING (rnk))
      |SELECT doc_id,
      |  string_agg(CAST(shot_id AS VARCHAR), ',' ORDER BY slot) AS shot_ids,
      |  string_agg(stext, ' ' ORDER BY slot) || ' ' || min(q) AS prompt
      |FROM j GROUP BY doc_id""".stripMargin)
    sb.toString
  }

  /** Unrolled DuckDB replay of `n` Bradley-Terry MM iterations over
    * the q160 win matrix (see `operators/Preference.btRatings` for
    * the arithmetic contract): each iteration is one chained CTE
    * computing `denom_i = Σ_j (2·n_ij·10¹²) // (π_i + π_j)` and
    * `π_i' = clamp((w2_i·10¹²) // denom_i, 1, 10¹⁵)` in HUGEINTs —
    * exact integer floors on positive operands, so the unrolled SQL
    * reproduces the engine's BigInt fit bit-for-bit at every
    * iteration, converged or not. Every chained CTE is
    * `AS MATERIALIZED`: each `f_{k+1}` references `f_k` three times
    * (the rating row plus both sides of the pairwise denominator),
    * so DuckDB's default CTE INLINING would re-expand the chain
    * 3^n times — at n=10 that is ~59k scans of the base table (it
    * exhausts the fd limit before it exhausts patience); one
    * materialization per iteration keeps the replay linear.
    */
  private def btOracle(n: Int, tail: String = "ratings"): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH r AS (SELECT doc_id % 50 AS prompt_id,
        |    concat('p', CAST(doc_id % 3 AS VARCHAR)) AS policy,
        |    CAST(concat('0x', substr(md5(concat('rm_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000
        |      + least(CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT), 200) AS reward
        |  FROM documents),
        |b AS MATERIALIZED (SELECT prompt_id, policy, max(reward) AS best FROM r GROUP BY 1, 2),
        |m AS MATERIALIZED (SELECT a.policy AS pa, c.policy AS pb,
        |    sum(CASE WHEN a.best > c.best THEN 1 ELSE 0 END) AS wa,
        |    sum(CASE WHEN c.best > a.best THEN 1 ELSE 0 END) AS wb,
        |    sum(CASE WHEN a.best = c.best THEN 1 ELSE 0 END) AS tt
        |  FROM b a JOIN b c ON a.prompt_id = c.prompt_id AND a.policy < c.policy
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT pa AS i, pb AS j, CAST(2 * (wa + wb + tt) AS HUGEINT) AS n2,
        |    CAST(2 * wa + tt AS HUGEINT) AS w2c FROM m
        |  UNION ALL
        |  SELECT pb, pa, CAST(2 * (wa + wb + tt) AS HUGEINT), CAST(2 * wb + tt AS HUGEINT) FROM m),
        |tot AS MATERIALIZED (SELECT i AS policy, CAST(sum(w2c) AS HUGEINT) AS w2,
        |    CAST(sum(n2) AS HUGEINT) // 2 AS games FROM e GROUP BY 1),
        |f0 AS MATERIALIZED (SELECT policy, CAST(1000000 AS HUGEINT) AS pi FROM tot)""".stripMargin)
    for (i <- 0 until n) {
      sb.append(s""",
        |f${i + 1} AS MATERIALIZED (SELECT t.policy,
        |    CASE WHEN coalesce(d.denom, 0) = 0 THEN p.pi
        |         ELSE greatest(CAST(1 AS HUGEINT), least(CAST(1000000000000000 AS HUGEINT),
        |              (t.w2 * CAST(1000000000000 AS HUGEINT)) // d.denom)) END AS pi
        |  FROM tot t
        |  JOIN f$i p USING (policy)
        |  LEFT JOIN (SELECT e.i AS policy,
        |        CAST(sum((e.n2 * CAST(1000000000000 AS HUGEINT)) // (pi_i.pi + pi_j.pi)) AS HUGEINT) AS denom
        |      FROM e JOIN f$i pi_i ON pi_i.policy = e.i JOIN f$i pi_j ON pi_j.policy = e.j
        |      GROUP BY 1) d USING (policy))""".stripMargin)
    }
    if (tail == "ratings") {
      sb.append(s"""
        |SELECT t.policy, CAST(f.pi AS BIGINT) AS rating_micro,
        |  CAST(t.w2 AS BIGINT) AS w2, CAST(t.games AS BIGINT) AS games
        |FROM f$n f JOIN tot t USING (policy)""".stripMargin)
    } else {
      // calibration: predicted P(a beats b) from the fitted ratings vs
      // the observed decided-game win rate, per pair with >= 1 decided.
      sb.append(s"""
        |SELECT m.pa AS policy_a, m.pb AS policy_b,
        |  CAST(m.wa AS BIGINT) AS wins_a, CAST(m.wb AS BIGINT) AS wins_b,
        |  CAST(m.tt AS BIGINT) AS ties,
        |  CAST((fa.pi * 1000000) // (fa.pi + fb.pi) AS BIGINT) AS pred_micro,
        |  CAST((CAST(m.wa AS HUGEINT) * 1000000) // (m.wa + m.wb) AS BIGINT) AS obs_micro,
        |  CAST((fa.pi * 1000000) // (fa.pi + fb.pi) AS BIGINT)
        |    - CAST((CAST(m.wa AS HUGEINT) * 1000000) // (m.wa + m.wb) AS BIGINT) AS gap_micro
        |FROM m JOIN f$n fa ON fa.policy = m.pa JOIN f$n fb ON fb.policy = m.pb
        |WHERE m.wa + m.wb > 0""".stripMargin)
    }
    sb.toString
  }

  /** Unrolled DuckDB replay of `n` BPE merge rounds (see
    * `operators/Bpe.scala` for the representation contract). `tail`
    * selects the surface: "merges" = the merge table (q115);
    * "segments" = per-document whitespace vs BPE token counts under
    * the final vocabulary (q116); "manifest" = the q110-shape packing
    * manifest weighted by those per-doc BPE counts (q117).
    */
  /** Shared DuckDB CTE body for the q178-derived DPO-triple oracles
    * (q180/q181/q182): the q178 fixture walk verbatim — branched turn
    * store, sibling pair agg, ancestor-walk prompt render — ending in
    * `tri`, the rendered-triple table those oracles post-process.
    * Callers prepend `WITH RECURSIVE` (the `anc` walk needs it).
    */
  private val dpoTriplesCtes: String =
    """turns AS (SELECT doc_id // 20 AS conv, doc_id AS turn,
      |    CASE WHEN doc_id % 20 = 0 THEN NULL
      |         WHEN doc_id % 5 = 4 THEN doc_id - 3
      |         ELSE doc_id - 1 END AS parent,
      |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |    text AS content,
      |    CAST(concat('0x', substr(md5(concat('rw_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) % 1000 AS score
      |  FROM documents),
      |g AS (SELECT conv AS conv_id, parent AS parent_id,
      |    (array_agg(turn ORDER BY score DESC, turn ASC))[1] AS chosen_id,
      |    (array_agg(turn ORDER BY score ASC, turn ASC))[1] AS rejected_id,
      |    max(score) AS chosen_score, min(score) AS rejected_score,
      |    count(*) AS n
      |  FROM turns WHERE role = 'assistant' AND parent IS NOT NULL
      |  GROUP BY 1, 2),
      |p AS (SELECT conv_id, parent_id, chosen_id, rejected_id,
      |    chosen_score, rejected_score,
      |    chosen_score - rejected_score AS margin
      |  FROM g WHERE n >= 2 AND chosen_score > rejected_score),
      |anc(parent_id, node, d) AS (
      |  SELECT DISTINCT parent_id, parent_id, 0 FROM p
      |  UNION ALL
      |  SELECT a.parent_id, t.parent, a.d + 1
      |  FROM anc a JOIN turns t ON t.turn = a.node WHERE t.parent IS NOT NULL),
      |pr AS (SELECT a.parent_id, string_agg(t.content, ' ' ORDER BY a.d DESC) AS prompt
      |  FROM anc a JOIN turns t ON t.turn = a.node GROUP BY a.parent_id),
      |tri AS (SELECT p.conv_id, p.parent_id, pr.prompt, p.chosen_id, p.rejected_id,
      |  tc.content AS chosen, tj.content AS rejected,
      |  p.chosen_score, p.rejected_score, p.margin
      |  FROM p JOIN pr USING (parent_id)
      |  JOIN turns tc ON tc.turn = p.chosen_id
      |  JOIN turns tj ON tj.turn = p.rejected_id)""".stripMargin

  /** The q115 merge-learning chain with the word column KEPT —
    * `w0 … w{n}` after n replayed merge rounds, so `w{n}` is the
    * distinct-word vocabulary under the learned table. Emitted
    * WITHOUT a leading `WITH` (callers splice it into a larger CTE
    * list). Same round semantics as [[bpeOracle]]'s chain.
    */
  private def bpeWordChain(n: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """w0 AS (
        |  SELECT word, substr(regexp_replace(word, '(.)', '||\1', 'g'), 2) || '|' AS sym,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin)
    for (i <- 0 until n) {
      sb.append(s""",
        |bp$i AS (
        |  SELECT split_part(pair, chr(9), 1) AS lhs, split_part(pair, chr(9), 2) AS rhs,
        |    CAST(sum(cnt) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(list_transform(range(1, len(syms)), j -> syms[j] || chr(9) || syms[j+1])) AS pair, cnt
        |        FROM (SELECT string_split(substr(sym, 2, length(sym) - 2), '||') AS syms, cnt FROM w$i))
        |  GROUP BY 1, 2),
        |m$i AS (SELECT lhs, rhs, cnt FROM bp$i ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
        |w${i + 1} AS (SELECT word, replace(w.sym, '|' || m.lhs || '||' || m.rhs || '|', '|' || m.lhs || m.rhs || '|') AS sym, w.cnt
        |  FROM w$i w, m$i m)""".stripMargin)
    }
    sb.toString
  }

  /** Per-member model-token counts over [[dpoTriplesCtes]]' `tri`
    * under [[bpeWordChain]]'s final vocabulary `w{n}`: `cnts` maps
    * each (conv, parent, member ∈ {prompt, chosen, rejected}) to the
    * summed per-word symbol count of its rendered text — exactly
    * `Bpe.modelTokenCount`, replayed through the distinct-word vocab
    * (legal because whitespace-joined renders preserve the word
    * multiset). Emitted with a leading comma.
    */
  private def dpoCntsCtes(n: Int): String =
    (""",
      |vocab AS (SELECT word, CAST(len(string_split(substr(sym, 2, length(sym) - 2), '||')) AS BIGINT) AS n_sym FROM WFINAL),
      |mem AS (SELECT conv_id, parent_id, 'prompt' AS member, prompt AS txt FROM tri
      |  UNION ALL SELECT conv_id, parent_id, 'chosen', chosen FROM tri
      |  UNION ALL SELECT conv_id, parent_id, 'rejected', rejected FROM tri),
      |cnts AS (SELECT conv_id, parent_id, member, CAST(sum(n_sym) AS BIGINT) AS toks
      |  FROM (SELECT conv_id, parent_id, member, unnest(regexp_split_to_array(txt, '\s+')) AS word FROM mem) u
      |  JOIN vocab USING (word)
      |  WHERE word <> '' GROUP BY 1, 2, 3)""".stripMargin)
      .replace("WFINAL", s"w$n")

  private def bpeOracle(n: Int, tail: String, trainWhere: String = ""): String = {
    val segments = tail != "merges"
    val word = if (segments) "word, " else ""
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS (
        |  SELECT WORDCOL substr(regexp_replace(word, '(.)', '||\1', 'g'), 2) || '|' AS sym,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documentsTRAINW)
        |  WHERE word <> '' GROUP BY word)""".stripMargin
        .replace("WORDCOL ", word)
        .replace("TRAINW", trainWhere))
    for (i <- 0 until n) {
      sb.append(s""",
        |p$i AS (
        |  SELECT split_part(pair, chr(9), 1) AS lhs, split_part(pair, chr(9), 2) AS rhs,
        |    CAST(sum(cnt) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(list_transform(range(1, len(syms)), j -> syms[j] || chr(9) || syms[j+1])) AS pair, cnt
        |        FROM (SELECT string_split(substr(sym, 2, length(sym) - 2), '||') AS syms, cnt FROM w$i))
        |  GROUP BY 1, 2),
        |m$i AS (SELECT lhs, rhs, cnt FROM p$i ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
        |w${i + 1} AS (SELECT ${word}replace(w.sym, '|' || m.lhs || '||' || m.rhs || '|', '|' || m.lhs || m.rhs || '|') AS sym, w.cnt
        |  FROM w$i w, m$i m)""".stripMargin)
    }
    if (!segments) {
      sb.append("\n")
      sb.append(
        (0 until n)
          .map(i => s"SELECT ${i + 1} AS merge_rank, lhs, rhs, cnt FROM m$i")
          .mkString(" UNION ALL "))
    } else if (tail == "drift") {
      // Fertility drift: the merge table (m0..m{n-1}, learned on the
      // TRAINW-filtered corpus) applied in learned order to the ODD
      // docs' distinct words, then per-source whitespace vs model
      // token totals. The apply-vocab comes from the APPLY batch (a
      // word the training set never saw still segments), exactly as
      // Bpe.segmentCounts builds it.
      sb.append("""
        |,inst AS (SELECT doc_id, source, word
        |  FROM (SELECT doc_id, source, unnest(regexp_split_to_array(text, '\s+')) AS word
        |        FROM documents WHERE doc_id % 2 = 1)
        |  WHERE word <> ''),
        |v0 AS (SELECT word, substr(regexp_replace(word, '(.)', '||\1', 'g'), 2) || '|' AS sym
        |  FROM (SELECT DISTINCT word FROM inst))""".stripMargin)
      for (i <- 0 until n) {
        sb.append(s""",
        |v${i + 1} AS (SELECT word, replace(v.sym, '|' || m.lhs || '||' || m.rhs || '|', '|' || m.lhs || m.rhs || '|') AS sym
        |  FROM v$i v, m$i m)""".stripMargin)
      }
      sb.append(s""",
        |vocab AS (SELECT word,
        |    CAST(len(string_split(substr(sym, 2, length(sym) - 2), '||')) AS BIGINT) AS n_sym FROM v$n)
        |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS sum_ws,
        |  CAST(sum(n_sym) AS BIGINT) AS sum_bpe,
        |  (1000 * CAST(sum(n_sym) AS BIGINT)) // CAST(count(*) AS BIGINT) AS fert_milli
        |FROM inst JOIN vocab USING (word) GROUP BY source""".stripMargin)
    } else if (tail == "chunks") {
      // MODEL-token sliding chunks: the per-doc model-token stream
      // (distinct-word apply + word-prefix × in-word-position grid,
      // as "slices") collected per doc in order, then the q171 window
      // arithmetic over MODEL tokens (window 32, stride 24).
      sb.append(s""",
        |vocab AS (SELECT word, string_split(substr(sym, 2, length(sym) - 2), '||') AS syms,
        |    CAST(len(string_split(substr(sym, 2, length(sym) - 2), '||')) AS BIGINT) AS n_sym FROM w$n),
        |inst AS (SELECT doc_id, u.wpos AS wpos, u.word AS word
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
        |      i -> {'wpos': CAST(i - 1 AS BIGINT), 'word': ws[i]})) AS u
        |    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws FROM documents))
        |  WHERE u.word <> ''),
        |wp AS (SELECT i.doc_id, i.wpos, v.syms, v.n_sym,
        |    CAST(sum(v.n_sym) OVER (PARTITION BY i.doc_id ORDER BY i.wpos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v.n_sym AS BIGINT) AS wprefix
        |  FROM inst i JOIN vocab v USING (word)),
        |tok AS (SELECT doc_id, wprefix + u.spos AS pos, u.sym AS token
        |  FROM (SELECT doc_id, wprefix, unnest(list_transform(range(1, len(syms) + 1),
        |      i -> {'spos': CAST(i - 1 AS BIGINT), 'sym': syms[i]})) AS u
        |    FROM wp)),
        |nn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |    list(token ORDER BY pos) AS toks FROM tok GROUP BY doc_id),
        |s AS (SELECT doc_id, toks, n, unnest(range(0, n, 24)) AS start_tok FROM nn)
        |SELECT doc_id, start_tok // 24 AS chunk_idx, start_tok,
        |  least(CAST(32 AS BIGINT), n - start_tok) AS n_chunk_toks,
        |  array_to_string(toks[start_tok + 1 : start_tok + least(CAST(32 AS BIGINT), n - start_tok)], ' ') AS chunk
        |FROM s WHERE start_tok = 0 OR start_tok - 24 + 32 < n""".stripMargin)
    } else if (tail == "slices" || tail == "packed_ids") {
      // the BPE-metered loader: weighted layout selects the window,
      // then per-doc word prefix × in-word symbol position grids the
      // model-token stream into packs. "packed_ids" additionally maps
      // each model token through the merge table's symbol id space
      // (distinct symbols, lexicographic dense rank).
      sb.append(s""",
        |vocab AS (SELECT word, string_split(substr(sym, 2, length(sym) - 2), '||') AS syms,
        |    CAST(len(string_split(substr(sym, 2, length(sym) - 2), '||')) AS BIGINT) AS n_sym FROM w$n),
        |inst AS (SELECT doc_id, u.wpos AS wpos, u.word AS word
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
        |      i -> {'wpos': CAST(i - 1 AS BIGINT), 'word': ws[i]})) AS u
        |    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws FROM documents))
        |  WHERE u.word <> ''),
        |seg AS (SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS n_toks
        |  FROM inst JOIN vocab USING (word) GROUP BY doc_id),
        |b AS (SELECT doc_id, n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM seg),
        |g AS (SELECT doc_id, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |sel AS (SELECT doc_id, cum - n_toks AS start_tok FROM g WHERE cum - n_toks < 6144),
        |wp AS (SELECT i.doc_id, i.wpos, v.syms, v.n_sym,
        |    CAST(sum(v.n_sym) OVER (PARTITION BY i.doc_id ORDER BY i.wpos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v.n_sym AS BIGINT) AS wprefix
        |  FROM inst i JOIN vocab v USING (word) JOIN sel s ON i.doc_id = s.doc_id),
        |tok AS (SELECT doc_id, wprefix + u.spos AS pos, u.sym AS token
        |  FROM (SELECT doc_id, wprefix, unnest(list_transform(range(1, len(syms) + 1),
        |      i -> {'spos': CAST(i - 1 AS BIGINT), 'sym': syms[i]})) AS u
        |    FROM wp))""".stripMargin)
      if (tail == "slices")
        sb.append("""
          |SELECT (start_tok + pos) // 2048 AS pack_id,
          |  (start_tok + pos) % 2048 AS pos_in_pack,
          |  doc_id, token
          |FROM tok JOIN sel USING (doc_id) WHERE start_tok + pos < 6144""".stripMargin)
      else
        sb.append("""
          |,sl AS (SELECT (start_tok + pos) // 2048 AS pack_id,
          |    (start_tok + pos) % 2048 AS pos_in_pack,
          |    doc_id, token
          |  FROM tok JOIN sel USING (doc_id) WHERE start_tok + pos < 6144),
          |symv AS (SELECT DISTINCT unnest(syms) AS token FROM vocab),
          |sv AS (SELECT token,
          |    CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
          |  FROM symv)
          |SELECT pack_id, pos_in_pack, doc_id, token_id
          |FROM sl JOIN sv USING (token)""".stripMargin)
    } else {
      sb.append(s""",
        |inst AS (SELECT doc_id, word
        |  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents)
        |  WHERE word <> ''),
        |vocab AS (SELECT word,
        |    len(string_split(substr(sym, 2, length(sym) - 2), '||')) AS n_sym FROM w$n)""".stripMargin)
      if (tail == "segments") {
        sb.append(s"""
        |SELECT doc_id, count(*) AS n_tokens, CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
        |  CAST(sum(n_sym) AS DOUBLE) / count(*) AS bpe_ratio
        |FROM inst JOIN vocab USING (word) GROUP BY doc_id""".stripMargin)
      } else if (tail == "sft_mask") {
        // per-doc BPE counts feed the q153 conversation window: the
        // assistant turns' intervals in LEARNED-BPE token space.
        sb.append(s""",
        |seg AS (SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS n_toks
        |  FROM inst JOIN vocab USING (word) GROUP BY doc_id),
        |t AS (SELECT doc_id % 20 AS conv_id, doc_id AS turn_key,
        |    CASE WHEN (doc_id // 20) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role, n_toks
        |  FROM seg),
        |c AS (SELECT conv_id, turn_key, role, n_toks,
        |    CAST(COALESCE(sum(n_toks) OVER (PARTITION BY conv_id ORDER BY turn_key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |  FROM t)
        |SELECT conv_id, turn_key, tok_start, tok_start + n_toks AS tok_end
        |FROM c WHERE role = 'assistant'""".stripMargin)
      } else {
        sb.append(s""",
        |seg AS (SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS n_toks
        |  FROM inst JOIN vocab USING (word) GROUP BY doc_id),
        |b AS (SELECT doc_id, n_toks,
        |    CAST(concat('0x', substr(md5(concat('gs_', CAST(doc_id AS VARCHAR))), 1, 7)) AS BIGINT) AS h
        |  FROM seg),
        |g AS (SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard, n_toks,
        |    CAST(sum(n_toks) OVER (ORDER BY h % 8, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b)
        |SELECT doc_id, shard, cum - n_toks AS start_tok, n_toks,
        |  (cum - n_toks) // 2048 AS first_pack,
        |  (cum - 1) // 2048 AS last_pack,
        |  (cum - 1) // 2048 - (cum - n_toks) // 2048 + 1 AS n_packs
        |FROM g""".stripMargin)
      }
    }
    sb.toString
  }
}

"""Driver-window ordering invariants (round-6).

The external driver checks the FIRST 50 registry entries each round; these
tests pin that the round-6 window contains exactly what the r5 verdict
ordered: the 6 stage-bisection diagnostics for the 4-round-red composites
at the head, the two red cells themselves (integer-only survival path this
round), one deliberate re-confirmation (td_curation_funnel, whose embedded
pair SQL's threshold selection changed to the integer test), and ALL 41
never-driver-checked oracled queries. After this window runs, zero oracled
queries lack a driver row — and the window is FROZEN: queries added after
the pin go to _QUEUED_FOR_R7, never into the window (the r5 process
failure — 41 never-checked queries accumulating behind a pinned window —
is closed by construction).
"""

from __future__ import annotations

from multiagent_document_etl_system_spark.plans.registry import (
    _DRIVER_WINDOW_R6,
    _QUEUED_FOR_R6,
    _QUEUED_FOR_R7,
    QUERIES,
)

#: queries with a driver row in CORRECTNESS_r01..r05 (frozen snapshot —
#: the historical record cannot change)
_EVER_DRIVER_CHECKED = {
    "dedup_clusters", "dedup_containment", "dedup_edit_distance",
    "dedup_embedding_cosine", "dedup_exact_groups", "dedup_exact_keep",
    "dedup_exact_stats", "dedup_fingerprint_groups", "dedup_minhash_lsh",
    "dedup_neighbor_jaccard", "dedup_semantic_clusters", "dedup_simhash",
    "k_json_kernels", "k_text_kernels", "l1_classify", "l2_extract",
    "l3_validate", "l4_embed", "mm_decode_features", "pipeline_flagship",
    "pipeline_stats", "q1_pricing_summary", "q3_top_revenue_orders",
    "q5_region_nation_revenue", "q_anti_join", "q_approx_distinct",
    "q_array_functions", "q_asof_join", "q_band_join",
    "q_cube_status_priority", "q_distinct_agg", "q_event_dedup",
    "q_global_topk", "q_grouping_sets", "q_min_per_group", "q_percentiles",
    "q_rollup_region_nation", "q_semi_join", "q_set_ops", "q_sql_api",
    "q_window_firstlast", "q_window_lag", "q_window_range_frame",
    "q_window_rank", "q_window_running", "s1_parse_dispatch",
    "st_tumbling_stream", "ta_bigrams", "ta_chunk_segments", "ta_fingerprint",
    "ta_gopher_rules", "ta_lang_id", "ta_pii_redact", "ta_quality_score",
    "ta_repetition", "ta_term_frequency", "ta_token_stats",
    "td_curation_funnel", "td_decontaminate", "td_domain_mix",
    "td_prepare_corpus", "td_prepare_corpus_v2", "td_profile",
    "td_snapshot_diff", "td_stratified_sample", "v10_ann_recall",
    "v11_ann_multiprobe", "v12_topk_auto", "v13_topk_matmul",
    "v14_ann_lsh_matmul", "v15_int8_quantize", "v16_matryoshka_topk",
    "v17_pq_codes", "v18_pq_adc_topk", "v19_ivfpq_topk", "v2_cosine_topk",
    "v3_filtered_topk", "v4_top1_argmax", "v5_fallback_cascade",
    "v6_ann_lsh_topk", "v6_namespace_scoped", "v7_schema_id",
    "v8_ivf_topk", "v9_label_centroids",
    # added by the r4 window (CORRECTNESS_r04 keys not already above)
    "q2_min_cost_supplier", "q4_priority_order_check", "q6_revenue_forecast",
    "q7_nation_trade", "q8_market_share", "q9_product_type_profit",
    "q10_returned_revenue", "q11_important_share",
    "q12_late_shipment_priority", "q13_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_variety",
    "q17_small_quantity_revenue", "q18_large_orders",
    "q19_disjunctive_filter", "q20_heavy_suppliers", "q21_sole_supplier",
    "q22_dormant_balances", "q_scalar_subquery", "q_correlated_subquery",
    "q_exists_subquery", "q_lateral_topk", "q_recursive_cte",
    "q_window_ntile", "q_rolling_time_window", "q_pivot_status_priority",
    "q_unpivot", "q_date_functions", "q_string_functions",
    "q_math_functions", "q_map_functions", "q_bitwise_functions",
    "q_interval_functions", "q_regex_functions", "q_null_functions",
    "st_sliding_stream", "st_session_stream", "st_interval_join_stream",
    "st_dedup_stream", "st_stateful_totals", "st_enrich_stream",
    "st_dedup_vs_corpus", "q_json_events", "q_sessionize",
    # added by the r5 window (CORRECTNESS_r05 keys not already above)
    "td_importance_resample", "td_quality_calibration", "ta_readability",
    "ta_tfidf", "ta_bigram_logprob", "ta_heavy_hitters", "q_stats_moments",
    "q_incremental_agg_merge", "q_funnel_conversion", "st_curation_stream",
    "ta_dup_ngram_coverage", "td_token_budget_pack", "ta_inverted_index",
    "q_asof_forward", "q_asof_nearest", "td_zorder_layout", "q_argmax_agg",
    "q_nullsafe_join", "q_collect_agg", "q_set_ops_all", "q_limit_offset",
    "q_array_hof", "q_histogram", "q_resample_gapfill", "q_tumbling_window",
    "q_sliding_window", "q_date_arithmetic", "q_interval_join_binned",
    "q_scd2_intervals", "q_retention_cohorts", "q_skew_salted_agg",
    "q_rollup_grouping_id", "td_split", "td_shuffle_order",
    "td_tokenize_ids", "v20_binary_hamming_topk", "q_full_outer_join",
    "q_window_percent_rank", "td_span_dedup", "td_semantic_decontaminate",
    "st_span_gate", "td_quality_classifier", "td_temperature_mix",
    "v21_recall_matrix", "dedup_cross_source_matrix",
}

#: driver hash-red in r2..r5, re-shown this round with a 100%-integer
#: survival path — must be in the window together with their diagnostics
_MUST_RESHOW = {"td_prepare_corpus", "td_prepare_corpus_v2"}

#: the round-6 stage-bisection diagnostics (new oracled queries, lead the
#: window so a red names the diverging composite stage)
_DIAGNOSTICS = {
    "diag_prep_gate", "diag_prep_exact", "diag_prep_pairs",
    "diag_prep_clusters", "diag_prep_survivors", "diag_prep_tokens",
}

#: deliberately re-shown green: td_curation_funnel embeds
#: _minhash_pairs_sql, whose threshold selection moved to the pure-integer
#: test this round (contract-changed green ⇒ re-confirm)
_RECONFIRM = {"td_curation_funnel"}


def test_window_is_exactly_the_head():
    assert list(QUERIES)[: len(_DRIVER_WINDOW_R6)] == _DRIVER_WINDOW_R6


def test_window_is_50_slots():
    assert len(_DRIVER_WINDOW_R6) == 50
    assert len(set(_DRIVER_WINDOW_R6)) == 50


def test_diagnostics_lead_then_reds():
    assert set(_DRIVER_WINDOW_R6[:6]) == _DIAGNOSTICS
    assert set(_DRIVER_WINDOW_R6[6:8]) == _MUST_RESHOW


def test_window_slots_all_produce_new_evidence():
    """Every slot is a fixed-red re-show, a bisection diagnostic, a
    never-driver-checked query, or the one contract-changed
    re-confirmation."""
    wasted = [n for n in _DRIVER_WINDOW_R6
              if n in _EVER_DRIVER_CHECKED
              and n not in _MUST_RESHOW | _RECONFIRM]
    assert not wasted, wasted


def test_window_covers_every_never_checked_oracled_query():
    """The rotation's whole point: after r6, no oracled query is without a
    driver row. rows-only queries are excluded by construction (their only
    possible driver outcome is `no_oracle`); queries added after the pin
    queue for r7."""
    never = [n for n, (_, oracle) in QUERIES.items()
             if oracle and n not in _EVER_DRIVER_CHECKED]
    missing = [n for n in never
               if n not in _DRIVER_WINDOW_R6 and n not in _QUEUED_FOR_R7]
    assert not missing, missing


def test_window_absorbs_the_whole_r6_queue():
    """All 41 r5-session additions got their slot — none waited two
    rotations."""
    missing = [n for n in _QUEUED_FOR_R6 if n not in _DRIVER_WINDOW_R6]
    assert not missing, missing


def test_window_is_frozen_against_new_additions():
    """Queries added after the r6 pin must NOT displace window slots: they
    are oracled, exist, and sit in _QUEUED_FOR_R7 outside the window."""
    for n in _QUEUED_FOR_R7:
        assert n in QUERIES and QUERIES[n][1], n
        assert n not in _DRIVER_WINDOW_R6, n
        assert n not in _EVER_DRIVER_CHECKED, n


def test_no_rows_only_query_wastes_a_slot():
    rows_only = [n for n in _DRIVER_WINDOW_R6 if not QUERIES[n][1]]
    assert not rows_only, rows_only


def test_every_window_name_exists():
    missing = [n for n in _DRIVER_WINDOW_R6 if n not in QUERIES]
    assert not missing, missing

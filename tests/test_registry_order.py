"""Driver-window ordering invariants (round-11).

The external driver checks the FIRST 50 registry entries each round; these
tests pin that the round-11 window contains exactly what the r10 verdict
and NOTES.md ordered: the 2 oracled queries that queued behind the frozen
r10 window at the head (first driver evidence), the 2 sanctioned rows-only
first-evidence slots for the Spark 4 Python-DataSource landing reads, 2
re-confirm slots (ta_dup_ngram_coverage, pinned for the planned
verdict-#8 auto-route — the corrected measurement then said don't wire
it, so the slot serves as an r07-stale refresh for the query whose
docstring contract was corrected; and k1_jdbc_roundtrip, whose
mtime-keyed stale-Derby purge became pidfile-keyed), the entire r05-stale
oracled block (31 refresh pads), and 13 pads from the r06 block (the
remaining 14 are reserved for R12). The window is FROZEN: queries added
after the pin go to _QUEUED_FOR_R12, never into the window.
"""

from __future__ import annotations

from multiagent_document_etl_system_spark.plans.registry import (
    _DRIVER_WINDOW_R6,
    _DRIVER_WINDOW_R7,
    _DRIVER_WINDOW_R8,
    _DRIVER_WINDOW_R9,
    _DRIVER_WINDOW_R10,
    _DRIVER_WINDOW_R11,
    _QUEUED_FOR_R11,
    _QUEUED_FOR_R12,
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
# added by the r6, r7 and r8 windows (CORRECTNESS_r06/r07/r08 == exactly
# those windows, all 50/50 green — verified against the committed JSONs
# before this pin)
_EVER_DRIVER_CHECKED |= set(_DRIVER_WINDOW_R6)
_EVER_DRIVER_CHECKED |= set(_DRIVER_WINDOW_R7)
_EVER_DRIVER_CHECKED |= set(_DRIVER_WINDOW_R8)
# the r9 window ran 50/50 green (CORRECTNESS_r09: 45 hash-pass + the 5
# sanctioned no_oracle rows-only slots, each spark_rows > 0)
_EVER_DRIVER_CHECKED |= set(_DRIVER_WINDOW_R9)
# the r10 window ran 50/50 green (CORRECTNESS_r10: 40 hash-pass + the 10
# second-rotation no_oracle rows-only slots, each spark_rows > 0)
_EVER_DRIVER_CHECKED |= set(_DRIVER_WINDOW_R10)

#: the 2 oracled queries that queued behind the frozen r10 window — they
#: MUST head the r11 window (NOTES.md recipe; both hash-PASS in the r10
#: judge's own vanilla run).
_QUEUED_2 = ["ta_dup_ngram_coverage_strip", "dedup_cross_source_links"]

#: the 2 sanctioned rows-only first-evidence slots (NOTES.md R11 plan —
#: the r9 pattern for first `no_oracle` evidence): the Spark 4 Python
#: DataSource landing reads, both added post-r10-pin, both rows-only BY
#: CONSTRUCTION (reasons in NO_ORACLE_REASONS).
_SANCTIONED_ROWS_ONLY = ["s8_landing_datasource", "s9_landing_stream"]

#: re-confirm slots: ta_dup_ngram_coverage was pinned for the planned
#: verdict-#8 auto-route, which the corrected strip measurement then
#: rejected (SCALE.md r11) — its plan is unchanged and the slot doubles
#: as an r07-stale refresh; k1_jdbc_roundtrip's mtime-keyed stale-Derby
#: purge became pidfile-keyed (ADVICE r10). Both r10/r07-green; each
#: slot buys a fresh driver row.
_RECONFIRMS = ["ta_dup_ngram_coverage", "k1_jdbc_roundtrip"]


def test_window_is_exactly_the_head():
    assert list(QUERIES)[: len(_DRIVER_WINDOW_R11)] == _DRIVER_WINDOW_R11


def test_window_is_50_slots():
    assert len(_DRIVER_WINDOW_R11) == 50
    assert len(set(_DRIVER_WINDOW_R11)) == 50


def test_queued_2_lead_the_window():
    assert _DRIVER_WINDOW_R11[:2] == _QUEUED_2
    assert set(_QUEUED_2) == set(_QUEUED_FOR_R11)


def test_sanctioned_rows_only_follow_the_queued_head():
    assert _DRIVER_WINDOW_R11[2:4] == _SANCTIONED_ROWS_ONLY


def test_reconfirms_follow_the_rows_only_slots():
    assert _DRIVER_WINDOW_R11[4:6] == _RECONFIRMS


def test_window_slots_all_produce_evidence():
    """Every slot is first evidence (queued / sanctioned rows-only) or a
    deliberate refresh of a previously-recorded query — no accidental
    slots."""
    for n in _DRIVER_WINDOW_R11:
        if n in _QUEUED_2 or n in _SANCTIONED_ROWS_ONLY:
            assert n not in _EVER_DRIVER_CHECKED, n
        else:
            assert n in _EVER_DRIVER_CHECKED, n


def test_stale_pads_have_at_least_44_slots():
    """Verdict r10 #1: the whole r05-stale oracled block (31) + 13 r06
    pads — everything after the 6-slot head refreshes old evidence."""
    pads = _DRIVER_WINDOW_R11[6:]
    assert len(pads) >= 44


def test_window_covers_every_never_checked_oracled_query():
    """After r11's window runs, zero oracled queries lack a driver row —
    except those added after the pin, which queue for r12."""
    from multiagent_document_etl_system_spark.plans.registry.windows import (
        _QUEUED_FOR_R13,
    )

    never = [n for n, (_, oracle) in QUERIES.items()
             if oracle and n not in _EVER_DRIVER_CHECKED]
    missing = [n for n in never
               if n not in _DRIVER_WINDOW_R11 and n not in _QUEUED_FOR_R12
               and n not in _QUEUED_FOR_R13]
    assert not missing, missing


def test_window_is_frozen_against_new_additions():
    """Queries added after the r11 pin must NOT displace window slots:
    they are oracled, exist, and sit in _QUEUED_FOR_R12 outside the
    window."""
    for n in _QUEUED_FOR_R12:
        assert n in QUERIES and QUERIES[n][1], n
        assert n not in _DRIVER_WINDOW_R11, n
        assert n not in _EVER_DRIVER_CHECKED, n


def test_rows_only_slots_are_exactly_the_sanctioned_two():
    """Rows-only slots are normally waste; r11 sanctions exactly the 2
    first-evidence DataSource slots (NOTES.md R11 plan), no others."""
    rows_only = [n for n in _DRIVER_WINDOW_R11 if not QUERIES[n][1]]
    assert sorted(rows_only) == sorted(_SANCTIONED_ROWS_ONLY), rows_only


def test_every_window_name_exists():
    missing = [n for n in _DRIVER_WINDOW_R11 if n not in QUERIES]
    assert not missing, missing


def test_stale_refresh_pads_are_actually_stale():
    """The pad slots exist to refresh the OLDEST driver evidence; none
    may come from the r9/r10 windows (freshest evidence)."""
    pads = _DRIVER_WINDOW_R11[6:]
    overlap = [n for n in pads
               if n in set(_DRIVER_WINDOW_R9) | set(_DRIVER_WINDOW_R10)]
    assert not overlap, overlap

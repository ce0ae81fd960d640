"""Float-output pin: the registry-wide guard that institutionalizes the
round-5 lesson.

Three rounds of external-driver hash-reds traced to ONE hazard class:
computed float output columns (engine round() half-up vs floor-grid,
float blends, libm ulps, float canonicalization). Round 5 swept every
computed float to a scaled BIGINT or an oracle-matched floor-grid value;
what remains below is the FROZEN allowlist of queries still emitting
double columns — each one either a raw parquet passthrough (identical
bits on both engines by construction), an exact-integer-sum-derived grid
value (the stable_* contract, driver-green precedent q1/q6/q14 r1-r4),
or a driver-green-proven deterministic score.

A query appearing here that is NOT in the allowlist means someone added
a new float output — the test fails and forces the author to either
convert it to the integer grid or consciously extend the allowlist with
the same justification.
"""

from __future__ import annotations

import os

from multiagent_document_etl_system_spark.plans.registry import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: frozen {query: sorted float/double output columns}; every entry is one
#: of: raw-passthrough (parquet doubles, bit-identical both engines),
#: stable_* grid value (exact int sums → identical double), deterministic
#: grid-rounded score (driver-green r1-r4), or engine-math sweep outputs
#: proven green in r4 (q_math_functions class).
FLOAT_ALLOWLIST: dict[str, list[str]] = {
    "dedup_containment": ["cont_ab", "cont_ba"],
    "dedup_edit_distance": ["rel_dist"],
    "dedup_embedding_cosine": ["score"],
    "dedup_minhash_lsh": ["jaccard"],
    "dedup_neighbor_jaccard": ["jaccard"],
    "l2_extract": ["amount"],
    "l4_embed": ["e0"],
    "l4_embed_dedup": ["e0"],
    "mm_decode_features": ["f0"],
    "pipeline_flagship": ["amount"],
    "q10_returned_revenue": ["revenue"],
    "q11_important_share": ["inv_value", "share_pct"],
    "q14_promo_revenue": ["promo_pct"],
    "q15_top_supplier": ["total_revenue"],
    "q17_small_quantity_revenue": ["avg_yearly"],
    "q18_large_orders": ["o_totalprice", "total_qty"],
    "q19_disjunctive_filter": ["revenue"],
    "q1_pricing_summary": ["avg_disc", "avg_price", "avg_qty",
                           "sum_base_price", "sum_charge",
                           "sum_disc_price", "sum_qty"],
    "q20_heavy_suppliers": ["brand_qty"],
    "q22_dormant_balances": ["total_bal"],
    "q2_min_cost_supplier": ["best_price"],
    "q3_top_revenue_orders": ["revenue"],
    "q5_region_nation_revenue": ["revenue"],
    "q6_revenue_forecast": ["revenue_delta"],
    "q7_nation_trade": ["revenue"],
    "q8_market_share": ["share_pct"],
    "q9_product_type_profit": ["profit"],
    "q_anti_join": ["acctbal"],
    "q_approx_percentile": ["p50", "p90", "p99"],
    "q_argmax_agg": ["max_price", "min_price"],
    "q_array_functions": ["first_component", "head8_sum",
                          "sorted_head_min", "vmax", "vmin"],
    "q_array_hof": ["l1_head4"],
    "q_asof_forward": ["next_view_value", "purchase_value"],
    "q_asof_join": ["asof_view_value", "purchase_value"],
    "q_asof_nearest": ["nearest_view_value", "purchase_value"],
    "q_band_join": ["sum_price"],
    "q_correlated_subquery": ["avg_yearly"],
    "q_cube_status_priority": ["total_price"],
    "q_date_functions": ["total"],
    "q_global_topk": ["totalprice"],
    "q_grouping_sets": ["avg_bal"],
    "q_incremental_agg_merge": ["avg_price", "total_price"],
    "q_json_events": ["avg_value", "total_value"],
    "q_lateral_topk": ["bal"],
    "q_limit_offset": ["price"],
    "q_map_functions": ["base_val", "big_vals_sum", "qty_doubled"],
    "q_math_functions": ["m_abs", "m_ln", "m_pow", "m_sqrt"],
    "q_min_per_group": ["price"],
    "q_null_functions": ["first_present"],
    "q_percentiles": ["med", "p90", "p99"],
    "q_pivot_status_priority": ["rev_f", "rev_o", "rev_p"],
    "q_resample_gapfill": ["v", "v_ffill"],
    "q_rolling_time_window": ["roll_10m"],
    "q_rollup_region_nation": ["total_acctbal"],
    "q_scalar_subquery": ["price"],
    "q_skew_salted_agg": ["total", "vmax", "vmin"],
    "q_sliding_window": ["total"],
    "q_sql_api": ["avg_bal"],
    "q_tumbling_window": ["total"],
    "q_unpivot": ["revenue"],
    "q_window_firstlast": ["first_price", "last_price", "second_price"],
    "q_window_lag": ["diff_next_price"],
    "q_window_ntile": ["cume", "pct_rank"],
    "q_window_range_frame": ["rev_30d"],
    "q_window_rank": ["totalprice"],
    "q_window_running": ["moving_avg3", "running_total"],
    "ta_repetition": ["rep_ratio"],
    "td_domain_mix": ["share", "target_share", "weight"],
    "v10_ann_recall": ["recall_at_5"],
    "v11_ann_multiprobe": ["score"],
    "v12_topk_auto": ["score"],
    "v13_topk_matmul": ["score"],
    "v14_ann_lsh_matmul": ["score"],
    "v16_matryoshka_topk": ["score"],
    "v18_pq_adc_topk": ["score"],
    "v19_ivfpq_topk": ["score"],
    "v20_binary_hamming_topk": ["score"],
    "v2_cosine_topk": ["score"],
    "v3_filtered_topk": ["score"],
    "v4_top1_argmax": ["score"],
    "v6_ann_lsh_topk": ["score"],
    # persisted-index twin of the driver-green LSH rungs: same planes,
    # same round(cosine, 4) grid score, same tie-break (st_ann_stream
    # shares the grid but is exempt below like every streaming query)
    "v22_ann_index_topk": ["score"],
    "v8_ivf_topk": ["score"],
    # late-r12 residual IVFPQ: same round(cosine, 4) rerank grid as the
    # other ANN rungs (hash-oracled, so the grid is cross-engine-proven)
    "v27_ivfpq_residual": ["score"],
}


def test_no_new_float_output_columns(spark):
    """No registry query may grow a float/double output column beyond the
    frozen allowlist — convert computed values to the scaled-int grid
    (numeric.stable_avg_q / idiv_round / floor-grid) instead. Streaming
    queries are exempted from the scan (building one executes a real
    run); their outputs are integer-or-proven-grid by contract
    (st_ann_stream's score rides the round(·,4) grid the batch ANN
    rungs proved) and hash-pinned by the r4/r5 driver rows."""
    got: dict[str, list[str]] = {}
    for name, (fn, _) in QUERIES.items():
        if name.startswith("st_"):
            continue
        df = fn(spark, SF_DIR)
        cols = sorted(c for c, t in df.dtypes if t in ("double", "float"))
        if cols:
            got[name] = cols
    new = {n: c for n, c in got.items()
           if n not in FLOAT_ALLOWLIST or c != FLOAT_ALLOWLIST[n]}
    gone = {n: c for n, c in FLOAT_ALLOWLIST.items() if n not in got}
    assert not new, f"new/changed float outputs (convert to int grid): {new}"
    # converted-to-integer queries should be REMOVED from the allowlist
    assert not gone, f"allowlist entries no longer emitting floats: {gone}"

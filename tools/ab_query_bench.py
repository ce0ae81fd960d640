"""Interleaved A/B query timer — settles "environment drift vs plan
regression" the way NOTES.md's sharp-edge rule demands: the two code
trees run ALTERNATING reps in one session on one host, so host-load
drift hits both sides equally and any residual delta is attributable to
the code.

One invocation = one fresh JVM over ONE tree, timing the given queries
with bench.py's exact methodology (noop-write action, one untimed
warm-up pass, best-of-3 steady-state reps, rebuild-per-rep for
eager-checkpointing operators). The caller interleaves invocations:

    for i in 1 2 3; do
      python tools/ab_query_bench.py /root/repo/.ab_r8  q1,q2,q3
      python tools/ab_query_bench.py /root/repo         q1,q2,q3
    done

and compares per-query minima per tree. Used for the r10 A/B ordered by
the r9 verdict (#2): ta_ngram_novelty / td_split_leakage /
v24_graph_pagerank moved +20-30% r8→r9 with untouched code.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    root, names = sys.argv[1], sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    sys.path.insert(0, root)
    from multiagent_document_etl_system_spark import get_spark
    from multiagent_document_etl_system_spark.plans.registry import QUERIES

    spark = get_spark(app_name="ab-query-bench")
    QUERIES["q_global_topk"][0](spark, sf_dir).collect()  # JVM warm-up

    # bench.py's rebuild set, imported FROM THE TREE UNDER MEASUREMENT so
    # the two can never drift (ADVICE r10: a hand-mirrored copy omitted
    # ta_dup_ngram_coverage_strip, letting its eager probe escape the
    # timed rep). Older worktrees keep the set inside main(); fall back
    # to the last hand-mirrored snapshot for those.
    try:
        from bench import REBUILD_PER_REP as rebuild
    except ImportError:
        # the FULL set from the last pre-r11 bench.main() (r10 tree) —
        # an incomplete fallback re-creates the drift for exactly the
        # eager queries where it matters most (review r11)
        rebuild = {"td_prepare_corpus_v2", "td_prepare_corpus_v3",
                   "td_curation_funnel", "dedup_minhash_lsh",
                   "dedup_threshold_sweep", "dedup_keep_best",
                   "ta_minhash_est_vs_exact", "dedup_cross_source_links",
                   "td_dedup_provenance",
                   "dedup_cluster_size_histogram",
                   "td_dedup_policy_ablation",
                   "v24_graph_pagerank", "td_bpe_train",
                   "st_tumbling_stream", "st_variant_stream",
                   "st_diversity_gate", "st_incremental_ingest"}
    out: dict[str, float] = {}
    for name in names:
        fn, _ = QUERIES[name]
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # untimed warm
        reps = []
        for _ in range(3):
            t0 = time.time()
            (fn(spark, sf_dir) if name in rebuild else df) \
                .write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
        out[name] = round(min(reps), 3)
    print(json.dumps({"tree": root, "sf_dir": sf_dir, "times": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

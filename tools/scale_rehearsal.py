"""100×-shape rehearsal (VERDICT r7 #9): run the heaviest composites
against a GENERATED large documents table — real wall-time + real
shuffle bytes, the evidence static plan reading can't give.

Fabrics:

- ORGANIC (default): copy k of sf0.1's documents suffixes every token
  with the copy index, so EVERY 3-gram shingle differs across copies —
  copies share no near-dup structure and the workload shape matches
  organic corpus growth. doc_ids offset by 100M per copy.
- DUP BOMB (--dup): copy k rotates each document's word sequence left
  by k%39+1. Rotation preserves all but ~4 boundary shingles, so every
  doc gains factor-1 near-identical copies (Jaccard ≈ 0.99) — the
  adversarial duplication-heavy regime. This fabric is what exposed the
  r8 verify-join finding: candidate pairs grow O(copies²), the pair
  broadcast falls back to SMJ, and (pre-fix) the corpus's shingle-set
  arrays shuffled twice (9.4 GB at 100x) — now bounded by the
  candidate-id prune in dedup.minhash_lsh_pairs.
- SKEW (--skew): scales the EVENTS table instead — copy k offsets
  event_id by 100M and remaps ~30% of every copy's rows (pmod(event_id,
  10) < 3) onto ONE hot user_id while the rest get fresh per-copy user
  ids. Key-skew grows absolutely AND relatively with the factor: the
  fabric for salted aggregation (designed for this) and for per-key
  WINDOW functions (sessionization), whose hot partition CANNOT be
  salted or AQE-split — the measurement this fabric exists to take.
- BOILERPLATE (--boiler, r10 verdict #4): documents ×factor where ~30%
  of EVERY copy's docs (pmod(doc_id,10) < 3) append the SAME fixed
  14-token boilerplate sentence (after the per-copy organic token
  suffixing, so the boilerplate shingles are the ONLY cross-copy
  overlap). Every boilerplate 3-gram lands in 30% of the whole corpus —
  the planted mega-shingle that serializes one WindowExec partition in
  ta_dup_ngram_coverage's window-over-sh_h plan (its documented
  pathological regime) and floods the shingle side of the minhash
  verify; max_bucket's drop behavior is measured on the same fabric.

Other tables symlink to sf0.1 — the composites under test only scan
the scaled table(s).

Usage: python tools/scale_rehearsal.py [--dup | --skew | --boiler] [factor ...]
(default factors: 10 100). Prints a table and the SCALE.md-ready rows;
shuffle bytes come from the Spark REST status API (UI enabled for this
session only).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
NAMES = ["td_curation_funnel", "td_prepare_corpus_v3",
         "td_incremental_ingest"]
#: composites whose iterative rounds run eagerly at DataFrame-build time
#: (duplicate_clusters' per-round localCheckpoints) — timing a pre-built
#: frame would skip them. Unioned with bench.py's REBUILD_PER_REP so the
#: two sets can never drift again (ADVICE r10: a hand-mirrored copy
#: omitted ta_dup_ngram_coverage_strip, letting its eager hot-shingle
#: probe escape the timed reps — the r10 100x strip-vs-plain rows were
#: re-measured under this corrected methodology, SCALE.md r11).
REBUILD = {"td_curation_funnel", "td_prepare_corpus_v3", "dedup_clusters",
           "v24_graph_pagerank",
           # minhash_lsh_pairs eager-checkpoints at build time (r9)
           "dedup_minhash_lsh", "dedup_threshold_sweep", "dedup_keep_best",
           "td_prepare_corpus", "td_prepare_corpus_v2",
           "ta_minhash_est_vs_exact", "td_dedup_provenance",
           "dedup_cluster_size_histogram", "td_dedup_policy_ablation"}
try:
    from bench import REBUILD_PER_REP
    REBUILD |= REBUILD_PER_REP
except ImportError:  # pre-r11 trees keep the set inside bench.main()
    pass
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]


#: the planted boilerplate (14 tokens => 12 shared 3-gram shingles).
#: Fixed across copies BY DESIGN: its shingles' document frequency is
#: 0.3 x factor x |documents| — the "mega-boilerplate shingle" regime
#: ta_dup_ngram_coverage's docstring names as its straggler case.
BOILER = ("standard legal disclaimer all rights reserved terms of "
          "service apply contact support for assistance today")


def build_scaled_dir(spark, factor: int, dup_bomb: bool = False,
                     skew: bool = False, boiler: bool = False) -> str:
    from pyspark.sql import functions as F

    kind = ("blr" if boiler else "skw" if skew
            else "dup" if dup_bomb else "org")
    out = tempfile.mkdtemp(prefix=f"sfx{factor}{kind}_")
    if skew:
        return _build_skew_dir(spark, factor, out)
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    copies = []
    for k in range(factor):
        w = F.split("text", " ")
        if k == 0:
            txt = F.col("text")
        elif dup_bomb:
            # k % 39 + 1 (r8 ADVICE): a plain k % 40 rotation makes every
            # copy with k ≡ 0 (mod 40) BYTE-IDENTICAL to copy 0 — exact
            # dups the md5 path catches, not near-dups exercising the LSH
            # verify. Nonzero rotation alone still repeats mod 39 at
            # factors > 39 (r9 review), so every copy ALSO gets one
            # unique trailing token: byte-unique at ANY factor, still
            # Jaccard ≈ 0.99 vs every sibling (one extra shingle).
            rot = k % 39 + 1
            txt = F.concat_ws(" ", F.concat(
                F.slice(w, rot + 1, 1 << 20), F.slice(w, 1, rot),
                F.array(F.lit(f"zq{k}"))))
        else:
            txt = F.concat_ws(" ", F.transform(
                w, lambda t: F.concat(t, F.lit(str(k)))))
        if boiler:
            # appended AFTER the per-copy suffixing: the boilerplate
            # shingles stay byte-identical across every copy — the only
            # cross-copy shingle overlap on this fabric
            hot = F.pmod(F.col("doc_id"), F.lit(10)) < 3
            txt = F.when(hot, F.concat(txt, F.lit(" " + BOILER))) \
                .otherwise(txt)
        copies.append(d.select(
            (F.col("doc_id") + k * 100_000_000).alias("doc_id"),
            txt.alias("text"), "lang", "source",
            F.length(txt).cast("bigint").alias("n_chars")))
    full = copies[0]
    for c in copies[1:]:
        full = full.unionByName(c)
    full.repartition(32).write.parquet(f"{out}/documents.parquet")

    # embeddings scale too (the ANN/graph ops read THIS table, not
    # documents — without it their rehearsal rows are artifacts): copy k
    # ROTATES each vector left by k positions — norms preserved, neighbor
    # structure decorrelated across copies, so density grows like an
    # organically larger collection rather than k-fold duplicate points.
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    ecopies = []
    for k in range(factor):
        dim = 64  # testdata embedding width; rotation is mod dim
        r = k % dim
        vec = (F.col("embedding") if r == 0 else
               F.concat(F.slice("embedding", r + 1, dim - r),
                        F.slice("embedding", 1, r)))
        ecopies.append(e.select(
            (F.col("vec_id") + k * 100_000_000).alias("vec_id"),
            vec.alias("embedding"), "label"))
    efull = ecopies[0]
    for c in ecopies[1:]:
        efull = efull.unionByName(c)
    efull.repartition(32).write.parquet(f"{out}/embeddings.parquet")

    for t in TABLES:
        if t != "embeddings":
            os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def _build_skew_dir(spark, factor: int, out: str) -> str:
    """Events ×factor with a planted hot key: 30% of every copy's rows
    remap to user_id 0; the rest get per-copy fresh user ids (distinct
    users grow with the stream, like a real service). ts/event_type/
    value ride unchanged so session and aggregate semantics stay
    realistic; event_id offsets keep the key unique."""
    from pyspark.sql import functions as F

    from multiagent_document_etl_system_spark.io import load_table

    e = load_table(spark, BASE, "events")  # handles TIMESTAMP(NANOS)
    copies = []
    for k in range(factor):
        hot = F.pmod(F.col("event_id"), F.lit(10)) < 3
        copies.append(e.select(
            (F.col("event_id") + k * 100_000_000).alias("event_id"),
            F.when(hot, F.lit(0).cast("long"))
            .otherwise(F.col("user_id") + k * 1_000_000).alias("user_id"),
            "event_type", "ts", "value"))
    full = copies[0]
    for c in copies[1:]:
        full = full.unionByName(c)
    full.repartition(32).write.parquet(f"{out}/events.parquet")
    for t in TABLES + ["documents"]:
        if t != "events":
            os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def shuffle_totals(spark) -> tuple[int, int]:
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
                f"{url}/api/v1/applications/{app}/stages", timeout=5) as r:
            stages = json.load(r)
        return (sum(s.get("shuffleReadBytes", 0) for s in stages),
                sum(s.get("shuffleWriteBytes", 0) for s in stages))
    except Exception:  # noqa: BLE001 — metrics are best-effort
        return (0, 0)


def main() -> int:
    from pyspark.sql import SparkSession

    from multiagent_document_etl_system_spark.plans.registry import QUERIES

    args = sys.argv[1:]
    dup_bomb = "--dup" in args
    skew = "--skew" in args
    boiler = "--boiler" in args
    names = NAMES
    if "--names" in args:
        i = args.index("--names")
        if i + 1 >= len(args):
            print("--names requires a comma-separated query list",
                  file=sys.stderr)
            return 2
        names = args[i + 1].split(",")
        del args[i:i + 2]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:  # fail BEFORE the expensive fabric build
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    factors = [int(a) for a in args
               if a not in ("--dup", "--skew", "--boiler")] or [10, 100]
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale-rehearsal")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
             .config("spark.ui.enabled", "true")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    dirs = {1: BASE}
    for f in factors:
        t0 = time.time()
        dirs[f] = build_scaled_dir(spark, f, dup_bomb, skew, boiler)
        kind = ('boilerplate' if boiler else 'skew' if skew else
                'dup-bomb' if dup_bomb else 'organic')
        print(f"# built {f}x {kind} "
              f"fabric in {time.time() - t0:.1f}s -> {dirs[f]}",
              file=sys.stderr)

    results: dict[str, dict[int, tuple[float, int, int]]] = {}
    for name in names:
        fn, _ = QUERIES[name]
        results[name] = {}
        for f in [1, *factors]:
            sfd = dirs[f]
            df = fn(spark, sfd)
            df.write.format("noop").mode("overwrite").save()  # warm
            best, best_sh = None, (0, 0)
            for _ in range(2):
                r0, w0 = shuffle_totals(spark)
                t0 = time.time()
                (fn(spark, sfd) if name in REBUILD else df) \
                    .write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                r1, w1 = shuffle_totals(spark)
                if best is None or dt < best:
                    best, best_sh = dt, (r1 - r0, w1 - w0)
            results[name][f] = (best, *best_sh)
            print(f"# {name} @ {f}x: {best:.2f}s "
                  f"shuffle r/w {best_sh[0] / 1e6:.1f}/{best_sh[1] / 1e6:.1f} MB",
                  file=sys.stderr)

    hi = max(factors)
    print(f"{'query':24s} {'1x':>8s} " +
          " ".join(f"{f}x".rjust(8) for f in factors) +
          f" {'exp(1->' + str(hi) + 'x)':>14s} {'shWr@' + str(hi) + 'x':>10s}")
    for name in names:
        row = results[name]
        exp = math.log(row[hi][0] / row[1][0], hi)
        cells = " ".join(f"{row[f][0]:8.2f}" for f in factors)
        print(f"{name:24s} {row[1][0]:8.2f} {cells} {exp:14.2f} "
              f"{row[hi][2] / 1e6:9.1f}M")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

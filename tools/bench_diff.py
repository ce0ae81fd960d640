"""Cross-round bench comparison: diff two per-query timing maps and flag
real movements, with the co-tenancy caveat built in (a >1.5x swing under
different load_factors is noise until re-measured idle — NOTES r5's
hard-won rule).

    python tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Accepts either a BENCH_DETAIL.json-style file ({"queries": {...},
"load_factor": ...}) or a driver BENCH_r{N}.json whose "parsed" field
carries the same map.
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    d = json.loads(open(path).read())
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no per-query map found")
    return d


def main() -> int:
    p = argparse.ArgumentParser(
        description="diff two per-query bench timing maps")
    p.add_argument("old_json")
    p.add_argument("new_json")
    p.add_argument("--threshold", type=float, default=1.5,
                   help="flag ratios beyond this factor (default 1.5)")
    p.add_argument("--ab-threshold", type=float, default=1.25,
                   help="same-methodology movers beyond this factor get "
                        "a ready-to-run interleaved A/B command "
                        "(default 1.25)")
    ns = p.parse_args()
    thr = ns.threshold
    old, new = load(ns.old_json), load(ns.new_json)
    oq, nq = old["queries"], new["queries"]
    print(f"old: {len(oq)} queries, total {old.get('value')}s, "
          f"load {old.get('load_factor')}")
    print(f"new: {len(nq)} queries, total {new.get('value')}s, "
          f"load {new.get('load_factor')}")
    # methodology-aware split (r9 verdict stretch #8): a query whose
    # rebuild-per-rep membership changed between the two runs moved for
    # a KNOWN reason — its build-time checkpoint entered/left the timed
    # rep — and must not read as an organic regression. Files written
    # before the methodology field exist compare as before (one pooled
    # list, marked "methodology unknown").
    om = old.get("methodology") or {}
    nm = new.get("methodology") or {}
    have_meth = bool(om) and bool(nm)
    o_rb = set(om.get("rebuild_per_rep", []))
    n_rb = set(nm.get("rebuild_per_rep", []))
    meth_changed = (o_rb ^ n_rb) if have_meth else set()

    print(f"{'query':32s} {'old':>7s} {'new':>7s} {'ratio':>6s}")
    moved, ab_movers = [], []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0:
            continue
        r = b / a
        if r >= thr or r <= 1 / thr:
            moved.append((r, name, a, b))
        if ((r >= ns.ab_threshold or r <= 1 / ns.ab_threshold)
                and name not in meth_changed):
            ab_movers.append(name)
    organic = [m for m in moved if m[1] not in meth_changed]
    known = [m for m in moved if m[1] in meth_changed]
    for r, name, a, b in sorted(organic, reverse=True):
        print(f"{name:32s} {a:7.2f} {b:7.2f} {r:6.2f}")
    if not organic:
        print(f"(no same-methodology movement beyond {thr}x)")
    if known:
        print("-- methodology changed (rebuild-per-rep membership "
              "flipped; the move is expected, not organic) --")
        for r, name, a, b in sorted(known, reverse=True):
            flag = "entered" if name in n_rb else "left"
            print(f"{name:32s} {a:7.2f} {b:7.2f} {r:6.2f}  "
                  f"[{flag} rebuild set]")
    if not have_meth:
        print("(methodology unknown for one side — pre-r10 file; "
              "movement list is pooled)")
    added = sorted(set(nq) - set(oq))
    gone = sorted(set(oq) - set(nq))
    if added:
        print("added:", ", ".join(added))
    if gone:
        print("removed:", ", ".join(gone))
    # One-step attribution (r10 verdict #7): any same-methodology mover
    # beyond --ab-threshold gets the EXACT interleaved-A/B invocation
    # that settles "environment drift vs plan regression" (NOTES'
    # sharp-edge rule; the method that closed the r8→r9 scare). The old
    # tree rev is resolved from git when the old file is committed —
    # the commit that added BENCH_r{N}.json carries round N's closing
    # tree — else a placeholder is emitted.
    if ab_movers:
        rev = _added_rev(ns.old_json) or "<old-tree-rev>"
        qlist = ",".join(sorted(ab_movers))
        print(f"\n-- {len(ab_movers)} same-methodology mover(s) beyond "
              f"{ns.ab_threshold}x: attribute before believing --")
        print("  git worktree add /root/repo/.ab_old " + rev)
        print("  for i in 1 2 3; do")
        print(f"    python tools/ab_query_bench.py /root/repo/.ab_old "
              f"{qlist} /root/testdata/sf0.1")
        print(f"    python tools/ab_query_bench.py /root/repo "
              f"{qlist} /root/testdata/sf0.1")
        print("  done  # compare per-query minima per tree; "
              "ratios inside rep spread = environment drift")
    return 0


def _added_rev(path: str) -> str | None:
    """Hash of the commit that ADDED `path` (best-effort; None when git
    or the file's history is unavailable)."""
    import os
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(path)) or ".",
             "log", "--diff-filter=A", "-n1", "--format=%h", "--",
             os.path.basename(path)],
            capture_output=True, text=True, timeout=10)
        rev = out.stdout.strip()
        return rev or None
    except (OSError, subprocess.SubprocessError):
        return None


if __name__ == "__main__":
    raise SystemExit(main())

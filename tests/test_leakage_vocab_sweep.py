"""Planted-corpus tests for the round-5 continuation ops: cross-split
leakage audit, dedup threshold sweep, per-source vocabulary stats."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.io import load_table
from multiagent_document_etl_system_spark.operators import (
    curation,
    dedup,
    textstats,
)

SF = "/root/testdata/sf0.001"

_LONG_A = " ".join(f"w{i}" for i in range(40))        # 38 distinct 3-grams
_LONG_B = " ".join(f"x{i}" for i in range(40))


def _planted_docs(spark):
    """doc 1 (train) == doc 2 (test) verbatim; doc 3 (test) unique;
    doc 4 (val) shares nothing with train either."""
    return spark.createDataFrame(
        [
            (1, _LONG_A, "train"),
            (2, _LONG_A, "test"),
            (3, _LONG_B, "test"),
            (4, "one tiny val doc", "val"),
        ],
        "doc_id long, text string, split string",
    )


def test_split_leakage_detects_planted_duplicate(spark):
    out = curation.split_cross_leakage(
        _planted_docs(spark), F.col("split"), n=3, min_shared=5)
    rows = {r.doc_id: r for r in out.collect()}
    # only held-out docs are audited; the train doc never appears
    assert set(rows) == {2, 3, 4}
    assert rows[2].leaked and rows[2].n_shared == 38
    assert not rows[3].leaked and rows[3].n_shared == 0
    assert not rows[4].leaked and rows[4].n_shared == 0
    assert rows[2].split == "test" and rows[4].split == "val"


def test_split_leakage_counts_distinct_shared_shingles(spark):
    """A held-out doc matching TWO train docs on the same shingles must
    not double-count (train side is distinct by construction)."""
    docs = spark.createDataFrame(
        [
            (1, _LONG_A, "train"),
            (2, _LONG_A, "train"),     # duplicate inside train
            (3, _LONG_A, "test"),
        ],
        "doc_id long, text string, split string",
    )
    out = curation.split_cross_leakage(docs, F.col("split")).collect()
    assert len(out) == 1 and out[0].n_shared == 38


def test_split_leakage_empty_corpus(spark):
    d0 = load_table(spark, SF, "documents").limit(0)
    out = curation.split_cross_leakage(
        d0, F.when(F.col("doc_id") % 2 == 0, "train").otherwise("test"))
    assert out.count() == 0
    assert out.columns == ["doc_id", "split", "n_shared", "leaked"]


def test_threshold_sweep_monotone_and_anchored(spark):
    """On a planted corpus with one exact pair (J=1.0) and one partial-
    overlap pair, counts are non-increasing in the threshold and the
    exact duplicate survives every rung."""
    half = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, _LONG_A), (2, _LONG_A),                     # J = 1.0
            (3, half + " " + _LONG_B), (4, half + " y0 y1"),  # partial
        ],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.0)
    out = dedup.threshold_sweep(pairs).collect()
    assert [r.threshold_q1e4 for r in out] == list(dedup.SWEEP_THRESHOLDS)
    n_pairs = [r.n_pairs for r in out]
    n_docs = [r.n_dup_docs for r in out]
    assert n_pairs == sorted(n_pairs, reverse=True)
    assert n_docs == sorted(n_docs, reverse=True)
    # the verbatim duplicate (J=1.0 ⇒ jq=10000) survives the 0.9 rung
    assert n_pairs[-1] >= 1 and n_docs[-1] >= 1


def test_threshold_sweep_empty_pairs_renders_zero_report(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long, jaccard double")
    out = dedup.threshold_sweep(pairs).collect()
    assert len(out) == len(dedup.SWEEP_THRESHOLDS)
    assert all(r.n_pairs == 0 and r.n_dup_docs == 0 for r in out)


def test_vocab_stats_planted_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "a A b", "X"),       # lowercased: a a b
            (2, "c", "Y"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in textstats.vocab_stats(docs).collect()}
    x, y = rows["X"], rows["Y"]
    assert (x.n_tokens, x.n_types, x.n_hapax) == (3, 2, 1)
    assert x.ttr_q1e4 == 6667          # round(2e4/3)
    assert (y.n_tokens, y.n_types, y.n_hapax, y.ttr_q1e4) == (1, 1, 1, 10000)


def test_source_divergence_planted_exact(spark):
    """Hand-computed TV: X = {a:2/3, b:1/3}, Y = {a:1/2, c:1/2} ⇒
    TV = (|2/3−1/2| + 1/3 + 1/2)/2 = 1/2 exactly, and the 1e-6 grid
    quantization reproduces it as 5000 on the q1e4 grid."""
    docs = spark.createDataFrame(
        [(1, "a a b", "X"), (2, "a c", "Y")],
        "doc_id long, text string, source string",
    )
    out = textstats.source_divergence(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b, r.n_shared_tokens) == ("X", "Y", 1)
    assert r.tv_q1e4 == 5000


def test_source_divergence_disjoint_and_identical(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "X"), (2, "a b", "Y"), (3, "z z z", "Z")],
        "doc_id long, text string, source string",
    )
    rows = {(r.source_a, r.source_b): r
            for r in textstats.source_divergence(docs).collect()}
    assert rows[("X", "Y")].tv_q1e4 == 0          # identical distributions
    assert rows[("X", "Z")].tv_q1e4 == 10000      # disjoint supports
    assert rows[("X", "Z")].n_shared_tokens == 0
    assert len(rows) == 3


def test_source_divergence_empty_corpus(spark):
    d0 = load_table(spark, SF, "documents").limit(0)
    out = textstats.source_divergence(d0)
    assert out.count() == 0
    assert out.columns == ["source_a", "source_b", "n_shared_tokens",
                           "tv_q1e4"]


def test_vocab_stats_empty_corpus(spark):
    d0 = load_table(spark, SF, "documents").limit(0)
    out = textstats.vocab_stats(d0)
    assert out.count() == 0
    assert out.columns == ["source", "n_tokens", "n_types", "n_hapax",
                           "ttr_q1e4"]


# ------------------------------------------- hypothesis reference models

def _idiv_round(a: int, b: int) -> int:
    return (2 * a + b) // (2 * b)


def _toks(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s.strip(" ")) if t]


_SRC_DOCS = st.lists(
    st.tuples(st.sampled_from(["s1", "s2", "s3"]),
              st.text(alphabet="ab ", max_size=30)),
    min_size=1, max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(_SRC_DOCS)
def test_source_divergence_matches_python_reference(spark, docs):
    """tv_q1e4 must equal a pure-Python model of the grid-quantized TV
    (idiv_round probabilities, shared/only mass identity) on arbitrary
    tiny corpora — including empty-token docs and vanished sources."""
    from collections import Counter

    counts: dict[str, Counter] = {}
    for src, text in docs:
        ts = _toks(text)
        if ts:
            counts.setdefault(src, Counter()).update(ts)
    p = {s: {t: _idiv_round(c * 1_000_000, sum(cnt.values()))
             for t, c in cnt.items()}
         for s, cnt in counts.items()}
    want = {}
    srcs = sorted(p)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            sh = set(p[a]) & set(p[b])
            s1 = sum(abs(p[a][t] - p[b][t]) for t in sh)
            only = (sum(p[a].values()) - sum(p[a][t] for t in sh)) + \
                   (sum(p[b].values()) - sum(p[b][t] for t in sh))
            want[(a, b)] = (len(sh),
                            _idiv_round((s1 + only) * 10_000, 2_000_000))

    sdf = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(docs)],
        "doc_id long, text string, source string")
    got = {(r.source_a, r.source_b): (r.n_shared_tokens, r.tv_q1e4)
           for r in textstats.source_divergence(sdf).collect()}
    assert got == want


_SPLIT_DOCS = st.lists(
    st.tuples(st.sampled_from(["train", "val", "test"]),
              st.text(alphabet="ab ", max_size=30)),
    min_size=1, max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(_SPLIT_DOCS)
def test_split_leakage_matches_python_reference(spark, docs):
    """n_shared must equal |doc_shingles ∩ train_shingle_union| computed
    by a brute-force model mirroring dedup.shingles (whole-doc shingle
    for short docs, distinct sets)."""
    n = 3

    def sh_set(s: str) -> set[str]:
        ts = re.split(r"\s+", s.strip(" "))   # [''] for empty, like trim+split
        if len(ts) <= n:
            return {" ".join(ts[:n])}
        return {" ".join(ts[i:i + n]) for i in range(len(ts) - n + 1)}

    train = set()
    for split, text in docs:
        if split == "train":
            train |= sh_set(text)
    want = {}
    for i, (split, text) in enumerate(docs):
        if split != "train":
            shared = len(sh_set(text) & train)
            want[i] = (split, shared, shared >= 2)

    sdf = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(docs)],
        "doc_id long, text string, split string")
    got = {r.doc_id: (r.split, r.n_shared, r.leaked)
           for r in curation.split_cross_leakage(
               sdf, F.col("split"), n=n, min_shared=2).collect()}
    assert got == want

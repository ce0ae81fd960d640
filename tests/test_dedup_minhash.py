"""Focused pin for the r13 minhash_signature rewrite.

The signature moved from 16 ``array_min(transform(...))`` passes to ONE
``aggregate`` fold with a 16-slot running-minimum accumulator. These
tests assert the fold form equals the per-slot form — the exact
expression shape it replaced — on real corpus rows AND on the three edge
shapes where a naive fold diverges: empty base array (array_min([]) is
NULL per slot), NULL base array (aggregate alone would return NULL, the
old form returned 16 NULLs), and a single-element array (fold seed must
not leak: least(NULL, x) = x).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.operators import dedup


def _per_slot_signature(base_col, n_hashes: int = 16):
    """The pre-r13 expression, verbatim: one array_min(transform(...))
    per hash function."""
    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % dedup.MINHASH_P

    return F.array(*[
        F.array_min(F.transform(base_col, perm(a, b)))
        for a, b in dedup.MINHASH_COEFFS[:n_hashes]
    ])


def test_fold_equals_per_slot_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.select(
        F.col("doc_id").alias("_id"),
        dedup.shingle_base_hashes(
            dedup.shingles(F.col("text"), 3)).alias("_base"))
    both = base.select(
        "_id",
        dedup.minhash_signature(F.col("_base")).alias("new"),
        _per_slot_signature(F.col("_base")).alias("old"))
    assert both.filter(F.col("new") != F.col("old")).count() == 0
    # and no NULL signatures snuck in
    assert both.filter(F.col("new").isNull()).count() == 0


def test_fold_edge_shapes(spark):
    rows = spark.createDataFrame(
        [(1, [5, 17, 4000000]), (2, []), (3, None), (4, [7])],
        "id bigint, base array<bigint>")
    out = rows.select(
        "id",
        dedup.minhash_signature(F.col("base")).alias("new"),
        _per_slot_signature(F.col("base")).alias("old")).collect()
    for r in out:
        assert r["new"] == r["old"], f"id={r['id']}: {r['new']} != {r['old']}"
    by_id = {r["id"]: r for r in out}
    # empty and NULL base both yield the 16-NULL vector, not NULL
    assert by_id[2]["new"] == [None] * 16
    assert by_id[3]["new"] == [None] * 16
    # single element: every slot is that element's permutation
    assert all(v is not None for v in by_id[4]["new"])


def test_ensure_parallelism_memo(spark):
    """r13: the fan-out decision memoizes on the logical plan's
    semanticHash — same plan must reuse the cached decision (no repeated
    rdd probe), and the fan-out itself must still fire for a
    single-partition scan."""
    from multiagent_document_etl_system_spark import io as eio

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    target = spark.sparkContext.defaultParallelism
    eio._PARALLELISM_MEMO.clear()
    out1 = eio.ensure_parallelism(docs)
    assert len(eio._PARALLELISM_MEMO) == 1
    (key, need), = eio._PARALLELISM_MEMO.items()
    assert need is True  # single-row-group parquet < session parallelism
    assert out1.rdd.getNumPartitions() == target
    # a second call with an equal plan hits the memo (same single entry)
    docs2 = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    eio.ensure_parallelism(docs2)
    assert len(eio._PARALLELISM_MEMO) == 1
    # a different plan gets its own entry
    eio.ensure_parallelism(docs.select("doc_id"))
    assert len(eio._PARALLELISM_MEMO) == 2
    # rows unchanged by the wrap
    assert out1.count() == docs.count()

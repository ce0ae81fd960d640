"""Spark 4 Python UDTF + IDENTIFIER-clause coverage (API breadth; the
registry hot path stays JVM-side — see functions/udtfs.py header)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_split_sentences_udtf_lateral(spark):
    from multiagent_document_etl_system_spark.functions.udtfs import (
        register_udtfs,
    )

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "One. Two! Three?"), (2, "Single"), (3, None), (4, "  ")],
        "doc_id long, text string")
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql("""
        SELECT d.doc_id, s.idx, s.sentence
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.idx
    """).collect()
    got = [(r.doc_id, r.idx, r.sentence) for r in out]
    assert got == [(1, 0, "One."), (1, 1, "Two!"), (1, 2, "Three?"),
                   (2, 0, "Single")]


def test_identifier_clause_parameterized_sql(spark):
    """IDENTIFIER(:param) — injection-safe dynamic relation names; the
    engine-native alternative to f-string SQL assembly."""
    spark.range(5).createOrReplaceTempView("id_clause_t")
    n = spark.sql("SELECT count(*) AS n FROM IDENTIFIER(:t)",
                  args={"t": "id_clause_t"}).first().n
    assert n == 5
    # positional VALUE parameters compose with it
    r = spark.sql("SELECT count(*) AS n FROM IDENTIFIER(:t) WHERE id < :k",
                  args={"t": "id_clause_t", "k": 3}).first().n
    assert r == 3

"""Unit tests for scalar kernels — goldens hand-derived from the reference's
semantics (SURVEY.md §5 item 3; FIXTURES.md §3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.functions import jsonx, text
from multiagent_document_etl_system_spark.functions.hashing import schema_id


def _one(spark, expr, value: str):
    return spark.range(1).select(expr(F.lit(value)).alias("v")).first()["v"]


class TestCleanText:
    """P1 goldens (/root/reference/src/utils.py:162-178)."""

    def test_whitespace_collapse(self, spark):
        assert _one(spark, text.clean_text, "a   b\t\nc") == "a b c"

    def test_forbidden_chars_dropped(self, spark):
        assert _one(spark, text.clean_text, "a@#$%b (c), d-e: f.") == \
            "ab (c), d-e: f."

    def test_trim(self, spark):
        assert _one(spark, text.clean_text, "  hi  ") == "hi"

    def test_empty(self, spark):
        assert _one(spark, text.clean_text, "") == ""


class TestLabelNormalize:
    """P3 goldens (/root/reference/src/agents.py:93-94)."""

    def test_multiline_mixed_case(self, spark):
        assert _one(spark, text.normalize_label,
                    "  Invoice \nbecause it has...") == "invoice"

    def test_single_line(self, spark):
        assert _one(spark, text.normalize_label, "RESUME") == "resume"


class TestSafeFilename:
    """P4 goldens (/root/reference/src/app.py:29-34)."""

    def test_path_traversal(self, spark):
        assert _one(spark, text.safe_filename, "../../etc/passwd") == \
            "....etcpasswd"

    def test_spaces_kept(self, spark):
        assert _one(spark, text.safe_filename, "my report (v2).pdf") == \
            "my report v2.pdf"


class TestOccurrenceCount:
    def test_counts(self, spark):
        v = _one(spark, lambda c: text.occurrence_count(c, "ab"), "ab xab ab")
        assert v == 3.0

    def test_zero(self, spark):
        assert _one(spark, lambda c: text.occurrence_count(c, "zz"), "ab") == 0.0


class TestJsonKernels:
    """J1/J2 goldens (/root/reference/src/utils.py:147-198)."""

    def test_clean_json(self, spark):
        v = _one(spark, lambda c: jsonx.lenient_get(c, "$.a"), '{"a": 1}')
        assert v == "1"

    def test_markdown_fenced(self, spark):
        v = _one(spark, lambda c: jsonx.lenient_get(c, "$.k"),
                 '```json\n{"k": "x"}\n```')
        assert v == "x"

    def test_prose_wrapped(self, spark):
        v = _one(spark, lambda c: jsonx.lenient_get(c, "$.k"),
                 'Here is the JSON you asked for: {"k": 42} hope it helps!')
        assert v == "42"

    def test_unparseable_is_null(self, spark):
        v = _one(spark, lambda c: jsonx.lenient_get(c, "$.k"), "no braces here")
        assert v is None

    def test_validity_gate(self, spark):
        assert _one(spark, jsonx.is_valid_json, '{"a": 1}') is True
        assert _one(spark, jsonx.is_valid_json, "{oops") in (False, None)


class TestSchemaId:
    """V7 — stable across sessions (unlike the reference's salted hash())."""

    def test_deterministic(self, spark):
        df = spark.range(2).select(
            schema_id(F.lit("invoice"), F.lit('{"fields":{}}')).alias("sid"))
        a, b = [r["sid"] for r in df.collect()]
        assert a == b
        assert a.startswith("invoice_schema_")
        assert len(a.split("_")[-1]) == 8


def test_heavy_hitters_exact_vs_bruteforce(spark):
    """The Misra-Gries candidate pass must never lose a true heavy
    hitter: on a skewed synthetic vocabulary large enough to force
    counter pruning (distinct tokens >> 2/ε), heavy_hitters' output must
    EQUAL the brute-force groupBy answer — same tokens, same exact
    counts."""
    import random

    from pyspark.sql import functions as F

    from multiagent_document_etl_system_spark.operators.textstats import (
        heavy_hitters,
    )

    rng = random.Random(7)
    toks = []
    for i, n in (("hot_a", 400), ("hot_b", 250), ("hot_c", 120)):
        toks += [i] * n
    toks += [f"rare_{i}" for i in range(2000)]          # 2000 singletons
    toks += [f"warm_{i % 50}" for i in range(500)]      # 50 tokens × 10
    rng.shuffle(toks)
    docs = [(i, " ".join(toks[i::40])) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(8)

    inv_eps = 20  # ε = 5% of ~3770 tokens ⇒ threshold ≈ 189
    got = {(r.token, r.freq) for r in
           heavy_hitters(df, inv_epsilon=inv_eps).collect()}

    terms = df.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    ).filter(F.length("token") > 0)
    n_total = terms.count()
    want = {
        (r.token, r.freq)
        for r in terms.groupBy("token").agg(F.count("*").alias("freq"))
        .filter(F.col("freq") * inv_eps >= F.lit(n_total)).collect()
    }
    assert want, "fixture must produce at least one heavy hitter"
    assert got == want

"""Property-based cross-checks: the Spark column kernels vs plain-Python
reference implementations over hypothesis-generated inputs.

One Spark job per property (all examples in one DataFrame) — validates the
documented Java-regex/DuckDB-RE2 semantic claims on adversarial strings,
not just the fixtures.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.functions.text import (
    clean_text,
    occurrence_count,
    safe_filename,
)

# printable-ish text incl. unicode, newlines, regex metacharacters
TEXTS = st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80),
    min_size=1, max_size=40,
)


def py_clean(s: str) -> str:
    # re.ASCII on BOTH subs: the engine's documented divergence from the
    # reference is ASCII regex classes (Java/RE2), where Python's unicode
    # \s also matches \x1c-\x1f and unicode spaces
    return re.sub(r"[^\w\s.,\-():]", "",
                  re.sub(r"\s+", " ", s, flags=re.ASCII),
                  flags=re.ASCII).strip()


def py_safe(s: str) -> str:
    return re.sub(r"[^\w\s\-.]", "", s, flags=re.ASCII)


@settings(max_examples=15, deadline=None)
@given(TEXTS)
def test_clean_text_matches_python_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r["i"]: r["c"] for r in
           df.select("i", clean_text(F.col("t")).alias("c")).collect()}
    for i, t in enumerate(texts):
        # \w is ASCII in Spark's Java regex (documented divergence from
        # Python's unicode \w) — compare against re.ASCII semantics
        assert got[i] == py_clean(t), repr(t)


@settings(max_examples=15, deadline=None)
@given(TEXTS)
def test_safe_filename_matches_python_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r["i"]: r["c"] for r in
           df.select("i", safe_filename(F.col("t")).alias("c")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_safe(t), repr(t)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abc ", max_size=60), min_size=1,
                max_size=30),
       st.sampled_from(["a", "ab", "abc", "bc"]))
def test_occurrence_count_matches_python(spark, texts, word):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r["i"]: r["n"] for r in df.select(
        "i", occurrence_count(F.col("t"), word).alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == t.count(word), repr((t, word))

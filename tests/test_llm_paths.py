"""Contract tests for the LLM-backed classify/extract paths (round-4).

The reference's Groq-backed kernels (/root/reference/src/groq_client.py:19-41)
were NotImplementedError stubs through r3; now they are real Arrow-batched
Pandas-UDF paths behind a pluggable ``client(prompt) -> str``. The default
mock client is a deterministic local "server" replicating the deterministic
twins' semantics — so twin-equivalence is directly assertable — while its
chat-style replies (capitalized labels, fenced JSON, surrounding prose)
exercise the response-normalization/fence-repair parse paths.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.io import load_table
from multiagent_document_etl_system_spark.operators import classify, extract

SF_DIR = "/root/testdata/sf0.001"


def test_classify_llm_matches_deterministic_twin(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    twin = {r["doc_id"]: r["doc_type"]
            for r in classify.classify(docs).select("doc_id", "doc_type").collect()}
    llm = {r["doc_id"]: r["doc_type"]
           for r in classify.classify_llm(docs).select("doc_id", "doc_type").collect()}
    assert twin == llm


def test_classify_llm_normalizes_messy_replies(spark):
    """Replies with casing, surrounding prose, or out-of-set labels
    normalize per the reference rule (first line -> strip -> lower;
    unknown -> other)."""
    replies = iter(["  Invoice  \nbecause...", "REPORT\n\n", "I think it's a memo"])

    def scripted_client(prompt: str) -> str:  # noqa: ARG001
        return next(replies)

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    ).coalesce(1)  # one partition => one batch => scripted order holds
    got = [r["doc_type"] for r in
           classify.classify_llm(df, client=scripted_client)
           .orderBy("doc_id").collect()]
    assert got == ["invoice", "report", "other"]


def test_extract_llm_matches_deterministic_twin(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    twin = {r["doc_id"]: (r["email"], r["date_str"], r["amount"])
            for r in extract.extract_fields(docs).collect()}
    out = extract.extract_llm(docs).select("doc_id", "extracted").collect()
    assert len(out) == len(twin)
    for r in out:
        d = json.loads(r["extracted"])
        em, dt, am = twin[r["doc_id"]]
        assert d["email"] == em
        assert d["date"] == dt
        if am is None:
            assert d["amount"] is None
        else:
            assert abs(d["amount"] - am) < 1e-9


def test_extract_llm_survives_broken_json(spark):
    """A reply with no parseable JSON yields {} — never a crashed row."""
    def broken_client(prompt: str) -> str:  # noqa: ARG001
        return "Sorry, I cannot help with that."

    df = spark.createDataFrame([(1, "x 12.50")], "doc_id long, text string")
    r = extract.extract_llm(df, client=broken_client).collect()[0]
    assert json.loads(r["extracted"]) == {}


def test_extract_llm_threads_schema_column(spark):
    """schema_col lands in the prompt (the /upload-schema flow).

    The client runs in the executor's Python WORKER process, so a
    driver-side spy dict never sees the call — instead the client echoes
    its prompt back through the JSON reply and the assertion reads the
    collected output column (the only channel that crosses the worker
    boundary)."""

    def echo_client(prompt: str) -> str:
        return json.dumps({"echo": prompt})

    df = spark.createDataFrame(
        [(1, "text", '{"email": "string"}')],
        "doc_id long, text string, schema_json string")
    r = extract.extract_llm(df, schema_col="schema_json",
                            client=echo_client).collect()[0]
    echoed = json.loads(r["extracted"])["echo"]
    assert '{"email": "string"}' in echoed, echoed


def test_classify_llm_is_arrow_batched_not_row_udf(spark):
    """The path must be ArrowEvalPython (pandas_udf), never BatchEvalPython
    (row-at-a-time)."""
    df = load_table(spark, SF_DIR, "documents").select("text")
    plan = classify.classify_llm(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_try_cast_double_mirror_matches_spark(spark):
    """_spark_try_cast_double (the retry loop's amount rule) must agree
    acceptance-for-acceptance with Spark's try_cast(s AS DOUBLE) — the
    rule the validate operator applies — on every adversarial shape the
    r8 ADVICE raised and the Java-only forms around it."""
    vals = ["1_000", "1_0.5", "inf", "+inf", "-inf", "Infinity",
            "-Infinity", "INFINITY", "nan", "NaN", "-nan", "-NaN", "+NaN", "-nAn", "1d", "1f",
            "1D", "1F", "2.5d", "0x1p3", "0X1P3", "-0x1.8p1", "0x1p3d",
            "1p3", " 1.5 ", "1e3", "1e", "+2", "-", ".5", "5.", "",
            "1,000", "1.2.3", "½", "abc", "12abc", "1e309", "-1e-320",
            "  +0.5e-2  ", "infd", "nanf", "Infinityd", "NaNd", "1e309d",
            # r9 review: hex without the binary exponent, Unicode
            # digits, and non-Java whitespace must all REJECT
            "0x1A", "0x1.8", "\u0661\u0662\u0663", "1.5\xa0",
            "\xa01.5", "1\u06f2", "0x1.8p1f", "0xp3", "0x.p3",
            "  1d  ", "+.5e\u06621"]
    df = spark.createDataFrame([(v,) for v in vals], "s string") \
        .select("s", F.col("s").try_cast("double").alias("d"))
    spark_ok = {r["s"]: r["d"] is not None for r in df.collect()}
    for v in vals:
        mine = extract._spark_try_cast_double(v)
        assert (mine is not None) == spark_ok[v], \
            f"{v!r}: mirror={mine!r} spark_accepts={spark_ok[v]}"


def test_validate_py_rejects_underscored_amounts():
    """The r8 ADVICE repro: these passed _validate_py while the validate
    operator flags them."""
    assert extract._validate_py({"amount": "1_000"}) == [
        "non-numeric amount"]
    # Spark try_cast ACCEPTS the inf/nan special literals — so must the
    # mirror (the ADVICE's suggested rejection would diverge the other way)
    assert extract._validate_py({"amount": "inf"}) == []
    assert extract._validate_py({"amount": "NaN"}) == []
    assert extract._validate_py({"amount": "1d"}) == []

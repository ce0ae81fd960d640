"""L2 — structured extraction (SURVEY.md §2.4).

The reference LLM-extracts a flat field→value JSON dict per document using a
schema-driven prompt with normalization directives — dates → YYYY-MM-DD,
amounts → numeric, phones keep '+' (/root/reference/src/utils.py:36-89;
/root/reference/src/agents.py:159-206).

Deterministic twin: regexp field pullers + normalization casts, one codegen'd
projection. Fields:

- ``email``     first email-shaped token (validation target, cf.
                /root/reference/src/utils.py:114-118)
- ``date_str``  first ISO-looking date, normalized via to_date
- ``amount``    first decimal amount, cast double
- ``first_token`` / ``n_tokens`` corpus-meaningful structure fields
- ``extracted`` the J4-style JSON serialization of the above (string column —
                the engine's ``structured_data`` jsonb analogue)

Regex subset chosen to behave identically in Java regex (Spark) and RE2
(DuckDB): char classes, bounded reps, no backrefs/lookaround.

Scale: stateless narrow map; nothing shuffles. Extraction retry (the
reference's bounded loop) is composed in plans/pipeline.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DATE_RE = r"\d{4}-\d{2}-\d{2}"
AMOUNT_RE = r"\d+\.\d{2}"


def extract_fields(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    return (
        df.withColumn("email", F.regexp_extract(t, EMAIL_RE, 0))
        .withColumn("date_str", F.regexp_extract(t, DATE_RE, 0))
        .withColumn("amount_str", F.regexp_extract(t, AMOUNT_RE, 0))
        .withColumn("amount", F.col("amount_str").try_cast("double"))
        .withColumn("first_token", toks.getItem(0))
        .withColumn("n_tokens", F.size(toks).cast("bigint"))
    )


def extract_sql_columns(text_col: str = "text") -> dict[str, str]:
    """DuckDB twins, keyed by output column name."""
    toks = f"string_split_regex(trim({text_col}), '\\s+')"
    return {
        "email": f"regexp_extract({text_col}, '{EMAIL_RE}', 0)",
        "date_str": f"regexp_extract({text_col}, '\\d{{4}}-\\d{{2}}-\\d{{2}}', 0)",
        "amount_str": f"regexp_extract({text_col}, '\\d+\\.\\d{{2}}', 0)",
        "amount": f"TRY_CAST(regexp_extract({text_col}, '\\d+\\.\\d{{2}}', 0) AS DOUBLE)",
        "first_token": f"{toks}[1]",
        "n_tokens": f"CAST(len({toks}) AS BIGINT)",
    }


# --- LLM-backed variant (executor-side, pluggable client) -----------------

_DOC_MARKER = "Document:\n"


def build_extract_prompt(text: str, schema_json: str | None = None,
                         head_chars: int = 1000,
                         feedback: str | None = None) -> str:
    """The reference's schema-driven extraction prompt shape
    (/root/reference/src/utils.py:36-89, agents.py:159-206): field list +
    normalization directives (dates YYYY-MM-DD, amounts numeric) +
    truncated document; on retry the validation agent's ``feedback``
    rides along so the model can correct the rejected fields."""
    fields = schema_json or '{"email": "string", "date": "date", "amount": "number"}'
    fb = f"Previous attempt was rejected: {feedback}\n" if feedback else ""
    return (
        "Extract the following fields as flat JSON "
        f"(dates YYYY-MM-DD, amounts numeric): {fields}\n{fb}"
        f"{_DOC_MARKER}{text[:head_chars]}"
    )


def mock_llm_extract_client(prompt: str) -> str:
    """Deterministic canned-response LLM for extraction (the mock server).

    Pulls the document out of the prompt, extracts the same fields as the
    deterministic twin (:func:`extract_fields`, identical regexes under
    re.ASCII), and replies the way chat models actually do — a fenced
    ```json block with prose around it — so the fence-repair parse path is
    genuinely exercised.
    """
    import json
    import re

    doc = prompt.split(_DOC_MARKER, 1)[1] if _DOC_MARKER in prompt else prompt
    em = re.search(EMAIL_RE, doc, flags=re.ASCII)
    dt = re.search(DATE_RE, doc, flags=re.ASCII)
    am = re.search(AMOUNT_RE, doc, flags=re.ASCII)
    payload = {
        "email": em.group(0) if em else "",
        "date": dt.group(0) if dt else "",
        "amount": float(am.group(0)) if am else None,
    }
    return ("Here is the extracted data:\n```json\n"
            + json.dumps(payload) + "\n```\nLet me know if you need more.")


def parse_json_response(resp: str) -> dict:
    """Lenient LLM-JSON parse (the J2 fence-repair semantics, Python-side):
    strip chat prose/code fences, take the outermost {...} slice, fall back
    to {} — an LLM reply must never crash the pipeline row."""
    import json

    t = (resp or "").strip()
    lo, hi = t.find("{"), t.rfind("}")
    if lo < 0 or hi <= lo:
        return {}
    try:
        out = json.loads(t[lo:hi + 1])
        return out if isinstance(out, dict) else {}
    except (ValueError, TypeError):
        return {}


def extract_llm(df: DataFrame, schema_col: str | None = None,
                text_col: str = "text", out_col: str = "extracted",
                client=None) -> DataFrame:
    """LLM-backed extraction — appends ``out_col`` (canonical flat-JSON
    string, the engine's ``structured_data`` analogue) via a real
    Arrow-batched Pandas UDF.

    ``client``: ``Callable[[str], str]``; defaults to
    :func:`mock_llm_extract_client`. ``schema_col`` optionally names a
    per-row schema-JSON column threaded into the prompt (the reference's
    /upload-schema flow). Never in the oracle path — the deterministic
    twin :func:`extract_fields` defines the checked semantics; the two are
    contract-checked against each other in tests/test_llm_paths.py.

    Client failures (timeout, HTTP error, malformed response body) degrade
    PER ROW to a NULL ``out_col`` — never failing the Spark task (the
    reference's per-document try/except, src/agents.py:196-206). A reply
    that arrives but parses to junk stays the lenient-parse ``{}``.
    """
    import json  # noqa: PLC0415

    the_client = client or mock_llm_extract_client

    def _one(t, sc) -> str | None:
        try:
            resp = the_client(build_extract_prompt(
                t if isinstance(t, str) else "",
                sc if isinstance(sc, str) else None))
        except Exception:  # noqa: BLE001 — row-level degrade by contract
            return None
        return json.dumps(parse_json_response(resp), sort_keys=True)

    @F.pandas_udf(T.StringType())
    def _extract_batch(texts: pd.Series, schemas: pd.Series) -> pd.Series:
        return pd.Series([_one(t, sc) for t, sc in zip(texts, schemas)])

    schema_arg = F.col(schema_col) if schema_col else F.lit(None).cast("string")
    return df.withColumn(out_col, _extract_batch(F.col(text_col), schema_arg))


def _validate_py(d: dict) -> list[str]:
    """Python replica of operators/validate._checks for the LLM retry loop
    (same three rule families, same feedback strings — the reference's
    validation agent, src/agents.py:209-263). Empty/absent fields pass
    (not checked), exactly like the SQL twin. The email regex is IMPORTED
    from the twin (one source of truth), and the date rule requires the
    zero-padded yyyy-MM-dd shape before parsing — strptime alone accepts
    '2024-3-5', which try_to_timestamp(…, 'yyyy-MM-dd') rejects, and the
    retry loop must never pass a row the validation operator will fail."""
    import datetime
    import re

    from multiagent_document_etl_system_spark.operators.validate import (
        EMAIL_FULL_RE,
    )

    fb: list[str] = []
    email = d.get("email") or ""
    # EMAIL_FULL_RE carries ^...$ anchors — harmless under fullmatch
    if email and not re.fullmatch(EMAIL_FULL_RE, str(email)):
        fb.append("malformed email")
    date = d.get("date") or ""
    if date:
        sdate = str(date)
        ok = bool(re.fullmatch(r"\d{4}-\d{2}-\d{2}", sdate))
        if ok:
            try:
                parsed = datetime.datetime.strptime(sdate, "%Y-%m-%d")
                ok = (datetime.datetime(1900, 1, 1) <= parsed
                      <= datetime.datetime(2100, 1, 1))
            except ValueError:
                ok = False
        if not ok:
            fb.append("impossible date")
    amount = d.get("amount")
    if (amount is not None and str(amount) != ""
            and not isinstance(amount, (int, float))
            and _spark_try_cast_double(str(amount)) is None):
        fb.append("non-numeric amount")
    return fb




def _spark_try_cast_double(t: str):
    """Python mirror of Spark ``try_cast(s AS DOUBLE)`` — the rule the
    validate operator applies — so the retry loop never passes a row the
    validation operator will fail (r8 ADVICE: Python ``float()`` accepts
    underscore-grouped '1_000', which Spark rejects). The reverse gaps are
    closed too: Spark accepts Java ``Double.parseDouble`` forms Python
    rejects — trailing d/f suffixes ('1d') and hex-significand floats
    ('0x1p3') — plus the case-insensitive inf/infinity/nan special
    literals (which Python's float() also takes). Pinned value-for-value
    against a live Spark session in tests/test_llm_paths.py."""
    import re

    # Java String.trim strips only chars <= U+0020 — Python str.strip
    # would also eat \xa0 and the Unicode space family, which
    # parseDouble then rejects (r9 review finding)
    t = t.strip("\x00\x01\x02\x03\x04\x05\x06\x07\x08\t\n\x0b\x0c\r"
                "\x0e\x0f\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a"
                "\x1b\x1c\x1d\x1e\x1f ")
    if not t:
        return None
    low = t.lower()
    # Spark Cast's special floating-point literals: signed inf/infinity
    # any case; nan UNSIGNED any case. The Java path additionally takes
    # exact-case [+-]?NaN / [+-]?Infinity (subsumed for infinity, and
    # the signed-NaN case-exact form is allowed below).
    if low in ("inf", "+inf", "-inf", "infinity", "+infinity",
               "-infinity"):
        return float(low)
    if low == "nan" and t[0] not in "+-":
        return float("nan")
    if t[1:] == "NaN" and t[0] in "+-":  # Java Signopt NaN, exact case
        return float("nan")
    # Everything else is the Java FloatingPointLiteral grammar, matched
    # with ASCII-only regexes: Python float() would also take Unicode
    # digits ('١٢٣') and underscore grouping, both of which parseDouble
    # rejects (r8 ADVICE + r9 review findings)
    m = re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?[fFdD]?", t,
                     flags=re.ASCII)
    if m:
        return float(t[:-1] if t[-1] in "fFdD" else t)
    # hex form: Java REQUIRES the binary exponent ('0x1A' is rejected;
    # float.fromhex would accept it, so gate with the full grammar)
    m = re.fullmatch(
        r"[+-]?0[xX]([0-9a-fA-F]+\.?[0-9a-fA-F]*|\.[0-9a-fA-F]+)"
        r"[pP][+-]?\d+[fFdD]?", t, flags=re.ASCII)
    if m:
        return float.fromhex(t[:-1] if t[-1] in "fFdD" else t)
    return None


def extract_llm_retry(df: DataFrame, schema_col: str | None = None,
                      text_col: str = "text", client=None,
                      max_retries: int = 1) -> DataFrame:
    """The reference's extract → validate → retry-with-feedback agent loop
    (src/agents.py:250-263: a rejected extraction re-prompts with the
    validation feedback, bounded by MAX_RETRIES), run per document inside
    ONE Arrow-batched Pandas UDF.

    Appends a struct column ``extraction`` with fields: ``extracted``
    (canonical flat JSON, NULL when the client failed), ``retry_count``,
    ``is_valid``, ``feedback`` ('|'-joined rule violations of the FINAL
    attempt — the same strings operators/validate emits).

    Scale: stateless narrow map, no shuffle; the loop is per-row and
    bounded (≤ 1 + max_retries client calls), so worst-case cost is a
    constant factor on the inference budget — the same bound the
    reference's MAX_RETRIES=1 enforces. Client failures degrade per row,
    never per task."""
    import json  # noqa: PLC0415

    the_client = client or mock_llm_extract_client

    out_type = T.StructType([
        T.StructField("extracted", T.StringType()),
        T.StructField("retry_count", T.IntegerType()),
        T.StructField("is_valid", T.BooleanType()),
        T.StructField("feedback", T.StringType()),
    ])

    def _one(t, sc) -> dict:
        text = t if isinstance(t, str) else ""
        schema = sc if isinstance(sc, str) else None
        feedback: list[str] = []
        d: dict = {}
        retries = 0
        for attempt in range(1 + max_retries):
            try:
                resp = the_client(build_extract_prompt(
                    text, schema,
                    feedback="|".join(feedback) if feedback else None))
            except Exception:  # noqa: BLE001 — row-level degrade
                return {"extracted": None, "retry_count": retries,
                        "is_valid": False, "feedback": "client error"}
            d = parse_json_response(resp)
            feedback = _validate_py(d)
            if not feedback:
                break
            if attempt < max_retries:
                retries += 1
        return {"extracted": json.dumps(d, sort_keys=True),
                "retry_count": retries,
                "is_valid": not feedback,
                "feedback": "|".join(feedback)}

    @F.pandas_udf(out_type)
    def _retry_batch(texts: pd.Series, schemas: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([_one(t, sc)
                             for t, sc in zip(texts, schemas)])

    schema_arg = F.col(schema_col) if schema_col else F.lit(None).cast("string")
    return df.withColumn(
        "extraction", _retry_batch(F.col(text_col), schema_arg))

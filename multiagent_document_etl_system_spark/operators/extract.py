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
    """
    import json  # noqa: PLC0415

    the_client = client or mock_llm_extract_client

    @F.pandas_udf(T.StringType())
    def _extract_batch(texts: pd.Series, schemas: pd.Series) -> pd.Series:
        out = []
        for t, sc in zip(texts, schemas):
            resp = the_client(build_extract_prompt(
                t if isinstance(t, str) else "",
                sc if isinstance(sc, str) else None))
            out.append(json.dumps(parse_json_response(resp), sort_keys=True))
        return pd.Series(out)

    schema_arg = F.col(schema_col) if schema_col else F.lit(None).cast("string")
    return df.withColumn(out_col, _extract_batch(F.col(text_col), schema_arg))

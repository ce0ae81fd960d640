"""L3 — rule validation (SURVEY.md §2.4).

The reference LLM-validates extracted JSON, checking malformed emails,
impossible dates, non-numeric amounts, returning
``{is_valid: bool, feedback: [str]}`` (/root/reference/src/utils.py:91-143;
/root/reference/src/agents.py:209-263).

Deterministic twin: the same three rule families as SQL predicates:

- email: RLIKE anchored email shape (empty ⇒ not checked, passes)
- date:  to_date parse must succeed and land in a sane range
- amount: must cast to double and be >= 0

``feedback`` is emitted as a '|'-joined string (array columns hash
differently across engines; a flat string is oracle-stable), ``is_valid`` as
boolean. Bounded retry composition lives in plans/pipeline.py (the
reference's MAX_RETRIES=1 loop, /root/reference/src/agents.py:33).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_FULL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def _checks(email: Column, date_str: Column, amount_str: Column
            ) -> list[tuple[Column, str]]:
    """(violation_condition, feedback message) per rule family — mirrors the
    reference's check list (/root/reference/src/utils.py:114-118)."""
    return [
        ((F.length(email) > 0) & ~email.rlike(EMAIL_FULL_RE), "malformed email"),
        (
            (F.length(date_str) > 0)
            & (
                F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd")).isNull()
                | (date_str < F.lit("1900-01-01"))
                | (date_str > F.lit("2100-01-01"))
            ),
            "impossible date",
        ),
        (
            (F.length(amount_str) > 0) & amount_str.try_cast("double").isNull(),
            "non-numeric amount",
        ),
    ]


def validate(df: DataFrame, email_col: str = "email",
             date_col: str = "date_str", amount_col: str = "amount_str"
             ) -> DataFrame:
    """Append ``is_valid`` boolean + ``feedback`` '|'-joined string."""
    checks = _checks(F.col(email_col), F.col(date_col), F.col(amount_col))
    feedback = F.concat_ws(
        "|", *[F.when(cond, F.lit(msg)) for cond, msg in checks]
    )
    is_valid = F.lit(True)
    for cond, _ in checks:
        is_valid = is_valid & ~F.coalesce(cond, F.lit(False))
    return df.withColumn("is_valid", is_valid).withColumn("feedback", feedback)


def validate_sql_columns(email_col: str = "email", date_col: str = "date_str",
                         amount_col: str = "amount_str") -> dict[str, str]:
    """DuckDB twins. TRY_CAST(x AS DATE) stands in for try_to_timestamp."""
    email_bad = (
        f"(length({email_col}) > 0 AND NOT "
        f"regexp_matches({email_col}, '{EMAIL_FULL_RE}'))"
    )
    date_bad = (
        f"(length({date_col}) > 0 AND (TRY_CAST({date_col} AS DATE) IS NULL"
        f" OR {date_col} < '1900-01-01' OR {date_col} > '2100-01-01'))"
    )
    amount_bad = (
        f"(length({amount_col}) > 0 AND TRY_CAST({amount_col} AS DOUBLE) IS NULL)"
    )
    feedback = (
        "concat_ws('|', "
        f"CASE WHEN {email_bad} THEN 'malformed email' END, "
        f"CASE WHEN {date_bad} THEN 'impossible date' END, "
        f"CASE WHEN {amount_bad} THEN 'non-numeric amount' END)"
    )
    is_valid = (
        f"(NOT coalesce({email_bad}, false) AND NOT coalesce({date_bad}, false)"
        f" AND NOT coalesce({amount_bad}, false))"
    )
    return {"is_valid": is_valid, "feedback": feedback}

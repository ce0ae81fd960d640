"""Order-insensitive numeric aggregates for cross-engine hash stability.

``sum``/``avg`` over doubles is summation-order dependent: Spark's partial
aggregation merges partitions in whatever order the shuffle delivers them,
so two runs of the same query can differ in the last few ulps — and when a
result lands exactly on a ``round(x, N)`` boundary, the Nth decimal flips
between runs (this is what made ``td_prepare_corpus`` hash-mismatch against
the DuckDB oracle in round 2 while passing locally).

Fix: make the aggregate itself exact. Each addend is rounded to a fixed
decimal scale (a deterministic per-row double op that both engines compute
identically) and cast to ``DECIMAL(27,6)``; decimal sums are exact integers
under the hood, hence order-insensitive and bit-equal across engines. The
final divide/round happens once, on identical inputs, in both engines.

Numeric headroom: addends here are ≤ ~1e6 with ≤ 1e8 rows at test scale;
DECIMAL(27,6) holds ±1e21, and Spark widens sums to DECIMAL(37,6) /
DuckDB to DECIMAL(38,6) — no overflow short of 1e15 rows of 1e6 values.
At 100 TB the decimal sum is still a single-word (128-bit) add per row —
marginally more expensive than a double add, irrelevant next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale 6: two digits finer than any output rounding we use (2 or 4), so
# pre-rounding never changes the value that round(..., out_scale) would see.
_PRE_SCALE = 6
_DEC = f"decimal(27,{_PRE_SCALE})"


def dec(col: Column) -> Column:
    """A double column as an exactly-summable decimal addend."""
    return F.round(col.cast("double"), _PRE_SCALE).cast(_DEC)


def dec_sql(expr: str) -> str:
    """DuckDB twin of :func:`dec`."""
    return f"CAST(round({expr}, {_PRE_SCALE}) AS DECIMAL(27,{_PRE_SCALE}))"


def stable_sum(col: Column, scale: int = 2) -> Column:
    """Order-insensitive ``round(sum(col), scale)`` (double output)."""
    return F.round(F.sum(dec(col)).cast("double"), scale)


def stable_sum_sql(expr: str, scale: int = 2) -> str:
    return f"round(CAST(sum({dec_sql(expr)}) AS DOUBLE), {scale})"


def stable_avg(col: Column, scale: int = 4) -> Column:
    """Order-insensitive ``round(avg(col), scale)`` (double output).

    avg semantics: nulls excluded from both sum and count.
    """
    return F.round(F.sum(dec(col)).cast("double") / F.count(col), scale)


def stable_avg_sql(expr: str, scale: int = 4) -> str:
    return (
        f"round(CAST(sum({dec_sql(expr)}) AS DOUBLE)"
        f" / count({expr}), {scale})"
    )


def stable_ratio(num: Column, den: Column, scale: int = 4,
                 factor: float = 1.0) -> Column:
    """Order-insensitive ``round(factor * sum(num)/sum(den), scale)``."""
    return F.round(
        F.lit(factor) * F.sum(dec(num)).cast("double")
        / F.sum(dec(den)).cast("double"),
        scale,
    )


def stable_ratio_sql(num: str, den: str, scale: int = 4,
                     factor: str = "1.0") -> str:
    return (
        f"round({factor} * CAST(sum({dec_sql(num)}) AS DOUBLE)"
        f" / CAST(sum({dec_sql(den)}) AS DOUBLE), {scale})"
    )

"""Order-insensitive numeric aggregates for cross-engine hash stability.

``sum``/``avg`` over doubles is summation-order dependent: Spark's partial
aggregation merges partitions in whatever order the shuffle delivers them,
so two runs of the same query can differ in the last few ulps — and when a
result lands exactly on a ``round(x, N)`` boundary, the Nth decimal flips
between runs (this is what made ``td_prepare_corpus`` hash-mismatch against
the DuckDB oracle in round 2 while passing locally).

Fix: make the aggregate itself exact. Each addend is quantized to a fixed
1e-6 grid — ``floor(x * 1e6 + 0.5)`` as a BIGINT (a deterministic per-row
op both engines compute identically on identical doubles) — and summed
EXACTLY: Spark sums it as DECIMAL(38,0) (128-bit, no overflow, no silent
int64 wrap), DuckDB sums BIGINT as HUGEINT (int128) natively. Exact integer
sums are order-insensitive, so the final unscale/divide/round happens once,
on identical inputs, in both engines.

Why not simpler alternatives (measured at sf0.1, 600k-row 4-sum agg):
- naive ``sum(cast(x as decimal))``: exact but ~4x the double-sum cost
  (per-row double→BigDecimal conversion);
- per-row ``round(x, 6)``: ~2x cost by itself (BigDecimal churn inside
  Spark's ROUND on doubles) — ``floor(x*1e6 + 0.5)`` is pure FP math and
  near-free;
- scaled ``sum(bigint)``: fastest, but int64 silently wraps around ~1e8
  high-value rows per group — a 100 TB correctness hazard. The
  DECIMAL(38,0) accumulator costs ~2x a double sum total, the price of
  exactness.

Numeric domain: |x| must stay below ~9e9 for ``x*1e6`` to remain inside
the double exact-integer range (2^53); money/metric values here are ≤ 1e7.
Quantizing at 1e-6 is two digits finer than any output rounding we use
(2 or 4), so it never changes the value that ``round(..., out_scale)``
sees. Half-up at the grid boundary rounds toward +inf for negatives —
a semantic we define identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: addend quantization grid = 1e-6
_SCALE = 1_000_000


def dec(col: Column) -> Column:
    """A double column as an exactly-summable scaled-integer addend
    (DECIMAL(38,0) so Spark's sum is 128-bit exact, never an int64 wrap)."""
    return F.floor(col.cast("double") * _SCALE + F.lit(0.5)) \
        .cast("bigint").cast("decimal(38,0)")


def dec_sql(expr: str) -> str:
    """DuckDB twin of :func:`dec` — BIGINT addend; DuckDB sums BIGINT as
    HUGEINT (int128), which is the same exact integer Spark's decimal sum
    produces."""
    return f"CAST(floor(({expr}) * {_SCALE} + 0.5) AS BIGINT)"


def _unscale(sum_col: Column) -> Column:
    return sum_col.cast("double") / F.lit(float(_SCALE))


def _unscale_sql(sum_expr: str) -> str:
    return f"CAST({sum_expr} AS DOUBLE) / {_SCALE}.0"


def stable_sum(col: Column, scale: int = 2) -> Column:
    """Order-insensitive ``round(sum(col), scale)`` (double output)."""
    return F.round(_unscale(F.sum(dec(col))), scale)


def stable_sum_sql(expr: str, scale: int = 2) -> str:
    return f"round({_unscale_sql(f'sum({dec_sql(expr)})')}, {scale})"


def stable_avg(col: Column, scale: int = 4) -> Column:
    """Order-insensitive ``round(avg(col), scale)`` (double output).

    avg semantics: nulls excluded from both sum and count.
    """
    return F.round(_unscale(F.sum(dec(col))) / F.count(col), scale)


def stable_avg_sql(expr: str, scale: int = 4) -> str:
    return (
        f"round({_unscale_sql(f'sum({dec_sql(expr)})')}"
        f" / count({expr}), {scale})"
    )


def stable_ratio(num: Column, den: Column, scale: int = 4,
                 factor: float = 1.0) -> Column:
    """Order-insensitive ``round(factor * sum(num)/sum(den), scale)``.

    Both sums are exact scaled integers; the shared 1e6 scale cancels in
    the division (computed on identical doubles in both engines).
    """
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

"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key — the standard
market-data/attribution join (DuckDB/kdb ``ASOF JOIN`` semantics).

Spark-first implementation as a COMPOSITION of built-ins (SURVEY.md's
custom-operator ladder rung (a) — no UDF, no mapPartitions):

    union(tagged right, tagged left)
      → window last_value(right payload, ignoreNulls)
          over (PARTITION BY key ORDER BY ts, side) rows unbounded→current
      → keep left rows

One shuffle on the key (both inputs co-partitioned by the same exchange),
then a linear in-partition sort-scan — the same cost profile as a
sort-merge join. At 100 TB: partition both sides by key date-bucket so the
window state stays in-memory per partition; skewed keys split via AQE.

Right rows sort BEFORE left rows at equal ts (side=0 < 1), so a right row
at exactly left.ts is visible — matching ASOF's ``<=``. Among multiple
right rows at the same (key, ts) the LAST by the extra deterministic
``right_order`` columns wins; pre-aggregate the right side if that tie
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload: list[str] | None = None) -> DataFrame:
    """Left as-of join: every left row + latest right ``payload`` columns
    with right_ts <= left_ts (null when no prior right row exists).

    ``payload`` defaults to every right column except the key and ts.
    Output columns: all left columns + ``asof_<payload>`` columns.
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (key, right_ts)]

    # payload travels as ONE struct so the matched right row is picked
    # atomically — per-column last(ignoreNulls) would stitch together
    # different right rows when payload values are naturally NULL
    p_struct = F.struct(*[F.col(c) for c in payload])
    p_type = right.select(p_struct.alias("_p")).schema["_p"].dataType

    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        p_struct.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(p_type).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).select(
        "_side",
        *[F.col(f"_l_{c}") for c in left.columns],
        F.last("_p", ignorenulls=True).over(w).alias("_pp"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_pp.{c}").alias(f"asof_{c}") for c in payload],
    )

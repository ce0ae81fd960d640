"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the matching right row within the same key:

- ``backward`` (default): most recent right with ``right.ts <= left.ts``
  (DuckDB/kdb ``ASOF JOIN`` semantics — market data, attribution);
- ``forward``: earliest right with ``right.ts >= left.ts`` (next-event
  lookup: next price tick, next maintenance window);
- ``nearest``: whichever of the two is closer in time (ties → backward).

Spark-first implementation as a COMPOSITION of built-ins (SURVEY.md's
custom-operator ladder rung (a) — no UDF, no mapPartitions):

    union(tagged right, tagged left)
      → window last_value(right payload, ignoreNulls)
          over (PARTITION BY key ORDER BY ts, side) rows unbounded→current
      → keep left rows

One shuffle on the key (both inputs co-partitioned by the same exchange),
then a linear in-partition sort-scan — the same cost profile as a
sort-merge join. ``forward`` is the identical scan ordered descending;
``nearest`` evaluates both windows over the SAME exchange (two
in-partition sorts, one shuffle). At 100 TB: partition both sides by key
date-bucket so the window state stays in-memory per partition; skewed
keys split via AQE.

Right rows sort BEFORE left rows at equal ts (side=0 < 1) in either scan
direction, so a right row at exactly left.ts is visible — matching
ASOF's inclusive comparison. Among multiple right rows at the same
(key, ts) the LAST by the extra deterministic ``right_order`` columns
wins; pre-aggregate the right side if that tie matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts_scalar(col: Column, dtype: T.DataType) -> Column:
    """Timestamp distance axis as a number: µs for timestamps, BIGINT for
    integral columns (an int64 tick axis compared through double would
    lose exactness above 2^53 — ADVICE r6), the column's own exact type
    for decimals, double only for genuinely fractional axes."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                          T.LongType)):
        return col.cast("bigint")
    if isinstance(dtype, T.DecimalType):
        return col
    return col.cast("double")


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload: list[str] | None = None,
              direction: str = "backward",
              tolerance: int | float | None = None) -> DataFrame:
    """As-of join: every left row + the matched right ``payload`` columns
    per ``direction`` (null when no matching right row exists).

    ``payload`` defaults to every right column except the key and ts.
    Output columns: all left columns + ``asof_<payload>`` columns.

    ``tolerance``: maximum |left.ts − matched.ts| for the match to count
    (pandas ``merge_asof(tolerance=...)`` semantics — attribution windows,
    staleness bounds on market data); a match farther away NULLs the
    payload exactly like no-match. Units = the distance axis: MICROSECONDS
    for timestamp columns (``_ts_scalar``), the column's own units for
    numerics. Applied as a per-row predicate AFTER the window scan, so
    the plan cost is identical to the unbounded join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    lts_type = left.schema[left_ts].dataType
    rts_type = right.schema[right_ts].dataType
    if lts_type != rts_type:
        # the distance axis is derived from ONE dtype and applied to both
        # sides' ts values (nearest tie-break + tolerance) — mismatched
        # dtypes would compute distance on the wrong axis (ADVICE r6)
        raise TypeError(
            f"asof_join ts dtypes must match: left {left_ts}: "
            f"{lts_type.simpleString()} vs right {right_ts}: "
            f"{rts_type.simpleString()}")
    if payload is None:
        payload = [c for c in right.columns if c not in (key, right_ts)]

    # payload travels as ONE struct so the matched right row is picked
    # atomically — per-column last(ignoreNulls) would stitch together
    # different right rows when payload values are naturally NULL. The
    # matched right ts rides along as ``_mt`` for the nearest tie-break.
    p_struct = F.struct(*[F.col(c) for c in payload],
                        F.col(right_ts).alias("_mt"))
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
    unioned = r.unionByName(l)

    def scan(descending: bool) -> Column:
        order = F.desc("_t") if descending else F.asc("_t")
        w = (
            Window.partitionBy("_k")
            .orderBy(order, F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_p", ignorenulls=True).over(w)

    if direction == "backward":
        picked = scan(descending=False)
    elif direction == "forward":
        picked = scan(descending=True)
    else:  # nearest: both scans over the same keyed exchange
        bwd, fwd = scan(descending=False), scan(descending=True)
        here = _ts_scalar(F.col("_t"), rts_type)
        b_delta = here - _ts_scalar(bwd["_mt"], rts_type)
        f_delta = _ts_scalar(fwd["_mt"], rts_type) - here
        picked = (
            F.when(fwd.isNull(), bwd)
            .when(bwd.isNull(), fwd)
            .when(f_delta < b_delta, fwd)
            .otherwise(bwd)  # ties → backward
        )

    if tolerance is not None:
        here = _ts_scalar(F.col("_t"), rts_type)
        dist = F.abs(here - _ts_scalar(picked["_mt"], rts_type))
        picked = F.when(dist <= F.lit(tolerance), picked)

    filled = unioned.select(
        "_side",
        *[F.col(f"_l_{c}") for c in left.columns],
        picked.alias("_pp"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_pp.{c}").alias(f"asof_{c}") for c in payload],
    )

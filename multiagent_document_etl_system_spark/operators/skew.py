"""Skew mitigation: salting (SURVEY.md §4; SCALE.md).

AQE's skew-join handles most runtime skew by splitting oversized partitions
of sort-merge joins. Salting is the manual lever for the cases AQE cannot
fix: an aggregation whose single hot key overwhelms one reducer, or a
shuffle join where one side cannot be split because the hot key's rows must
meet ALL matching rows of the other side.

- **salted_join**: replicate the SMALL side n_salts×, salt the big side by
  a row-level column — each hot-key reducer now handles 1/n of the rows.
  Correctness: every big row still meets every matching small row exactly
  once (its salt replica).
- **salted_agg**: classic two-phase aggregation — partial agg on
  (key, salt), final agg on key. Works for algebraic aggregates
  (sum/count/min/max; avg = sum+count composed by the caller).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str, n_salts: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): hash of a row-varying column
    (an id, a timestamp — anything not constant within the hot key)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(from_col)), F.lit(n_salts)))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_from: str, n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Skew-resilient equi-join on ``key``.

    ``big`` is salted from ``salt_from`` (a row-varying big-side column);
    ``small`` is replicated once per salt. The shuffle key becomes
    (key, salt) — a hot key spreads over n_salts reducers. Small side grows
    n_salts× (keep it broadcast-small ÷ n_salts).
    """
    b = with_salt(big, salt_from, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_agg(df: DataFrame, key: str, aggs: dict[str, tuple[str, str]],
               salt_from: str, n_salts: int = 8) -> DataFrame:
    """Two-phase skew-resilient aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 aggregates on (key, salt) — the hot
    key's rows split across n_salts reducers; phase 2 merges the ≤ n_salts
    partials per key (count merges by sum).
    """
    mergers = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    bad = {fn for _, fn in aggs.values()} - set(mergers)
    if bad:
        raise ValueError(f"non-algebraic aggregate(s): {bad}")

    partial = (
        with_salt(df, salt_from, n_salts)
        .groupBy(key, "_salt")
        .agg(*[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ])
    )
    return partial.groupBy(key).agg(*[
        getattr(F, mergers[fn])(out).alias(out)
        for out, (_, fn) in aggs.items()
    ])

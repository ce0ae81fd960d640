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


def sessionize_chunked_counts(events: DataFrame, gap_s: int = 1800,
                              chunk_s: int = 86400,
                              user_col: str = "user_id",
                              ts_col: str = "ts",
                              order_col: str = "event_id") -> DataFrame:
    """Skew-resilient sessionization counts: (user, n_sessions, n_events)
    — identical semantics to the plain lag+cumsum gaps-and-islands
    (plans/analytics.q_sessionize), restructured so NO window partition
    ever holds a whole hot user.

    The plain form partitions the event-level window by user alone; a
    hot key (one user with 30% of a 100×-scaled stream — the --skew
    rehearsal fabric) serializes in a single WindowExec partition:
    measured exp ≈ 1.0 in the 10×→100× decade, 11 s at 100×. Salting
    cannot fix a window the way it fixes an aggregate — the cumulative
    sum is order-dependent — but sessionization has chunk-local
    structure the window can exploit:

    1. bucket events into ``chunk_s`` time chunks; run the SAME
       lag+cumsum flags inside (user, chunk) partitions — the hot key
       now splits across its active chunks, and within-chunk flags are
       identical to the global ones except the chunk's FIRST event
       (lag sees NULL locally);
    2. per (user, chunk): local session count + first/last event time —
       a hash aggregate (map-side partials, salt-proof);
    3. the only cross-chunk coupling is whether a chunk's first event
       CONTINUES the previous non-empty chunk's last session:
       ``first_ts(c) - last_ts(prev) <= gap_s``. With ``chunk_s >
       gap_s`` this can only ever hold for the adjacent chunk (an empty
       chunk in between forces a gap >= chunk_s), so one lag over the
       per-(user, chunk) relation — AT MOST time-range/chunk_s rows per
       user, bucket-level not event-level — decides every merge;
    4. n_sessions(user) = Σ local_sessions − Σ merges.

    ``gap_s`` comparisons ride unix_timestamp seconds, mirroring the
    plain form exactly (ties ordered by ``order_col``). Requires
    ``chunk_s > gap_s`` (asserted) — the property step 3's adjacency
    argument needs."""
    from pyspark.sql import Window

    if chunk_s <= gap_s:
        raise ValueError(
            f"chunk_s ({chunk_s}) must exceed gap_s ({gap_s}): the "
            "adjacent-chunk merge argument requires an empty chunk to "
            "imply a session break")
    ut = F.unix_timestamp(ts_col)
    ev = events.withColumn("_ut", ut) \
        .withColumn("_chunk", F.floor(F.col("_ut") / chunk_s))
    wloc = (Window.partitionBy(user_col, "_chunk")
            .orderBy(ts_col, order_col))
    gap = F.col("_ut") - F.lag("_ut").over(wloc)
    flagged = ev.withColumn(
        "_new",
        F.when(F.lag(ts_col).over(wloc).isNull() | (gap > gap_s), 1)
        .otherwise(0))
    per_chunk = flagged.groupBy(user_col, "_chunk").agg(
        F.sum("_new").alias("_n_local"),
        F.count("*").alias("_n_events"),
        F.min("_ut").alias("_first_ut"),
        F.max("_ut").alias("_last_ut"))
    wchunk = Window.partitionBy(user_col).orderBy("_chunk")
    merged = per_chunk.withColumn(
        "_joins_prev",
        F.when(
            (F.col("_first_ut") - F.lag("_last_ut").over(wchunk)) <= gap_s,
            1).otherwise(0))
    return merged.groupBy(user_col).agg(
        (F.sum("_n_local") - F.sum("_joins_prev")).cast("bigint")
        .alias("n_sessions"),
        F.sum("_n_events").cast("bigint").alias("n_events"))

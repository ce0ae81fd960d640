"""As-of join composition (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic_and_edges(spark):
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100.0),
         (1, _ts("2024-01-01T12:00:00"), 200.0),
         (2, _ts("2024-01-01T11:00:00"), 999.0)],
        "k long, ts timestamp, price double")
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), "before-any"),
         (1, _ts("2024-01-01T10:00:00"), "exact-tie"),
         (1, _ts("2024-01-01T11:30:00"), "between"),
         (1, _ts("2024-01-01T13:00:00"), "after-all"),
         (3, _ts("2024-01-01T10:00:00"), "no-right-key")],
        "k long, ts timestamp, tag string")
    got = {r["tag"]: r["asof_price"]
           for r in asof_join(left, right, key="k").collect()}
    assert got == {
        "before-any": None,       # no right row yet
        "exact-tie": 100.0,       # right at equal ts IS visible (<=)
        "between": 100.0,
        "after-all": 200.0,
        "no-right-key": None,     # key absent from right
    }


def test_asof_payload_is_atomic(spark):
    """A right row with a NULL payload column must not inherit that column
    from an older right row — the matched row is picked as one struct."""
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 1.0, "old"),
         (1, _ts("2024-01-01T11:00:00"), None, "new")],
        "k long, ts timestamp, a double, b string")
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"),)], "k long, ts timestamp")
    row = asof_join(left, right, key="k").first()
    assert row["asof_b"] == "new"
    assert row["asof_a"] is None  # from the SAME (latest) right row


def test_asof_forward_and_nearest(spark):
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100.0),
         (1, _ts("2024-01-01T12:00:00"), 200.0)],
        "k long, ts timestamp, price double")
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), "before-any"),
         (1, _ts("2024-01-01T10:00:00"), "exact-tie"),
         (1, _ts("2024-01-01T10:30:00"), "nearer-back"),
         (1, _ts("2024-01-01T11:00:00"), "equidistant"),
         (1, _ts("2024-01-01T11:45:00"), "nearer-fwd"),
         (1, _ts("2024-01-01T13:00:00"), "after-all")],
        "k long, ts timestamp, tag string")
    fwd = {r["tag"]: r["asof_price"]
           for r in asof_join(left, right, key="k",
                              direction="forward").collect()}
    assert fwd == {
        "before-any": 100.0,    # earliest right at/after
        "exact-tie": 100.0,     # right at equal ts IS visible (>=)
        "nearer-back": 200.0,
        "equidistant": 200.0,
        "nearer-fwd": 200.0,
        "after-all": None,      # nothing ahead
    }
    near = {r["tag"]: r["asof_price"]
            for r in asof_join(left, right, key="k",
                               direction="nearest").collect()}
    assert near == {
        "before-any": 100.0,    # only forward exists
        "exact-tie": 100.0,
        "nearer-back": 100.0,   # 30min back vs 90min fwd
        "equidistant": 100.0,   # tie -> backward
        "nearer-fwd": 200.0,    # 15min fwd vs 105min back
        "after-all": 200.0,     # only backward exists
    }


def test_asof_tolerance_bounds_the_match(spark):
    """merge_asof(tolerance=...) semantics: a backward match farther than
    the bound NULLs the payload exactly like no-match; matches at and
    inside the bound survive; the nearest direction applies the bound on
    |delta| symmetrically."""
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100.0)],
        "k long, ts timestamp, price double")
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:05:00"), "inside"),
         (1, _ts("2024-01-01T10:10:00"), "at-bound"),
         (1, _ts("2024-01-01T10:30:00"), "stale"),
         (1, _ts("2024-01-01T09:30:00"), "no-match")],
        "k long, ts timestamp, tag string")
    tol = 10 * 60 * 1_000_000  # 10 min on the microsecond axis
    got = {r["tag"]: r["asof_price"]
           for r in asof_join(left, right, key="k",
                              tolerance=tol).collect()}
    assert got == {"inside": 100.0, "at-bound": 100.0,
                   "stale": None, "no-match": None}
    near = {r["tag"]: r["asof_price"]
            for r in asof_join(left, right, key="k", direction="nearest",
                               tolerance=tol).collect()}
    # nearest finds the 30-min-early right for "no-match"... but it is
    # outside the bound in THAT direction too
    assert near == {"inside": 100.0, "at-bound": 100.0,
                    "stale": None, "no-match": None}


def test_asof_mismatched_ts_dtypes_rejected(spark):
    """The distance axis is derived from one dtype and applied to both
    sides — mismatched ts dtypes must fail loudly at entry (ADVICE r6),
    not compute distance on the wrong axis."""
    import pytest

    right = spark.createDataFrame([(1, 10, 100.0)],
                                  "k long, ts int, price double")
    left = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"))],
                                 "k long, ts timestamp")
    with pytest.raises(TypeError, match="ts dtypes must match"):
        asof_join(left, right, key="k")


def test_asof_int64_tick_axis_is_exact_above_2_53(spark):
    """int64 tick axes ride the BIGINT distance path: 2^53 + 1 vs 2^53
    differ by exactly 1 tick — indistinguishable through a double cast
    (both round to 2^53), exact through bigint (ADVICE r6)."""
    base = 1 << 53
    right = spark.createDataFrame(
        [(1, base, 100.0), (1, base + 2, 200.0)],
        "k long, ts long, price double")
    left = spark.createDataFrame(
        [(1, base + 1, "one-tick"), (1, base + 4, "two-ticks")],
        "k long, ts long, tag string")
    # tolerance of 1 tick: "one-tick" (delta 1) matches the base row;
    # "two-ticks" sits 2 ticks past the nearer right row -> NULL. Through
    # a double axis every delta here would collapse to 0 or 2.
    got = {r["tag"]: r["asof_price"]
           for r in asof_join(left, right, key="k",
                              tolerance=1).collect()}
    assert got == {"one-tick": 100.0, "two-ticks": None}
    near = {r["tag"]: r["asof_price"]
            for r in asof_join(left, right, key="k", direction="nearest",
                               tolerance=1).collect()}
    assert near == {"one-tick": 100.0, "two-ticks": None}

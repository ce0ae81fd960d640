"""functions/numeric.py — the order-insensitive aggregate contract.

The module's whole reason to exist: identical results regardless of
partitioning/merge order (plain double sums do NOT have this property),
bit-equal agreement with the DuckDB twin, and value correctness against an
exact Python reference.
"""

from __future__ import annotations

import math
import random
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.functions.numeric import (
    stable_avg,
    stable_avg_sql,
    stable_sum,
    stable_sum_sql,
)

# adversarial values: rounding-boundary magnets (x.xx5 shapes), mixed
# magnitudes (catastrophic-cancellation fodder), negatives, and noise
random.seed(7)
VALUES = (
    [i + 0.005 for i in range(50)]
    + [1e6 + i * 0.115 for i in range(50)]
    + [-(i * 0.335) for i in range(30)]
    + [random.uniform(-1e4, 1e4) for _ in range(200)]
)


def _df(spark, vals, parts):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, x double"
    ).repartition(parts)


def test_stable_sum_is_partition_order_invariant(spark):
    outs = set()
    for parts in (1, 7, 32):
        df = _df(spark, VALUES, parts)
        outs.add(df.agg(stable_sum(F.col("x")).alias("s")).first()["s"])
    assert len(outs) == 1, f"stable_sum varied with partitioning: {outs}"


def test_stable_sum_matches_exact_reference(spark):
    # exact reference: quantize each addend half-up at 1e-6, sum as Decimal
    def q(v: float) -> Decimal:
        return Decimal(math.floor(v * 1_000_000 + 0.5))

    exact = sum((q(v) for v in VALUES), Decimal(0)) / Decimal(1_000_000)
    got = _df(spark, VALUES, 13).agg(
        stable_sum(F.col("x"), scale=4).alias("s")).first()["s"]
    assert got == pytest.approx(float(round(exact, 4)), abs=1e-9)


def test_stable_sum_and_avg_match_duckdb_twin(spark, tmp_path):
    pq = str(tmp_path / "vals.parquet")
    _df(spark, VALUES, 9).write.parquet(pq)
    srow = spark.read.parquet(pq).agg(
        stable_sum(F.col("x")).alias("s"),
        stable_avg(F.col("x")).alias("a")).first()
    con = duckdb.connect()
    orow = con.sql(
        f"SELECT {stable_sum_sql('x')} AS s, {stable_avg_sql('x')} AS a "
        f"FROM read_parquet('{pq}/*.parquet')").fetchall()[0]
    assert srow["s"] == orow[0]
    assert srow["a"] == orow[1]


def test_stable_avg_excludes_nulls(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 4.0)], "id long, x double")
    row = df.agg(stable_avg(F.col("x")).alias("a")).first()
    assert row["a"] == 3.0  # (2+4)/2, not /3


def test_stable_avg_q_matches_duckdb_and_reference(spark, tmp_path):
    """stable_avg_q (integer-only scaled average, the td_prepare_corpus
    driver-red fix) must (a) equal the exact Python rational reference
    round(S*10^4 / (1e6*n)) half-up, (b) bit-match the DuckDB HUGEINT
    twin, (c) be partition-order invariant — on boundary-adversarial
    non-negative inputs (quality-score domain [0,1], incl. exact grid
    half-points like 0.00005 whose scaled average lands on .5)."""
    rng = random.Random(13)
    vals = (
        [k / 10_000.0 for k in range(0, 50)]          # exact 1e-4 grid
        + [k / 100_000.0 for k in range(0, 50)]       # half-grid magnets
        + [rng.uniform(0.0, 1.0) for _ in range(300)]
        + [0.0, 1.0, 0.5, 0.99995, 0.00005]
    )

    def q6(v: float) -> int:
        return math.floor(v * 1_000_000 + 0.5)

    S, n = sum(q6(v) for v in vals), len(vals)
    want = (2 * S * 10_000 + 1_000_000 * n) // (2 * 1_000_000 * n)

    from multiagent_document_etl_system_spark.functions.numeric import (
        stable_avg_q,
        stable_avg_q_sql,
    )

    pq = str(tmp_path / "q.parquet")
    _df(spark, vals, 9).write.parquet(pq)
    outs = set()
    for parts in (1, 7, 32):
        row = spark.read.parquet(pq).repartition(parts).agg(
            stable_avg_q(F.col("x")).alias("a")).first()
        outs.add(row["a"])
    assert outs == {want}, (outs, want)
    con = duckdb.connect()
    orow = con.sql(
        f"SELECT {stable_avg_q_sql('x')} AS a "
        f"FROM read_parquet('{pq}/*.parquet')").fetchall()[0]
    assert orow[0] == want
    # null semantics: nulls excluded from sum AND count, both engines
    ndf = spark.createDataFrame(
        [(1, 2.0 / 3.0), (2, None), (3, 1.0 / 3.0)], "id long, x double")
    assert ndf.agg(stable_avg_q(F.col("x")).alias("a")).first()["a"] == 5000
    # all-null group -> NULL, not an error (both engines)
    adf = spark.createDataFrame([(1, None)], "id long, x double")
    assert adf.agg(stable_avg_q(F.col("x")).alias("a")).first()["a"] is None
    assert con.sql(
        f"SELECT {stable_avg_q_sql('x')} FROM "
        "(SELECT CAST(NULL AS DOUBLE) AS x)").fetchall()[0][0] is None


def test_int_avg_round_equals_stable_avg_q_and_duckdb(spark, tmp_path):
    """int_avg_round over a 1e-4-grid integer column must (a) equal
    stable_avg_q over the same values divided by 1e4 (the round-6
    composite-corpus rewrite claims value-identity with the old chain),
    (b) bit-match the DuckDB HUGEINT `//` twin, (c) be partition-order
    invariant, (d) share the null semantics (nulls excluded, all-null ⇒
    NULL). Adversarial inputs: exact .5 quotients (half-up boundary)."""
    from multiagent_document_etl_system_spark.functions.numeric import (
        int_avg_round,
        int_avg_round_sql,
        stable_avg_q,
    )

    rng = random.Random(31)
    qs = ([rng.randrange(0, 10_001) for _ in range(300)]
          + [0, 1, 9999, 10000, 5000, 4999])
    # force an exact .5 average: pad so sum(qs) ≡ n/2 (mod n) is hit by
    # appending the value that lands the quotient on k + 1/2 for even n
    if len(qs) % 2 == 1:
        qs.append(7)
    S, n = sum(qs), len(qs)
    want = (2 * S + n) // (2 * n)

    df = spark.createDataFrame([(i, q) for i, q in enumerate(qs)],
                               "id long, q long")
    pq = str(tmp_path / "iq.parquet")
    df.write.parquet(pq)
    outs = set()
    for parts in (1, 7, 32):
        row = spark.read.parquet(pq).repartition(parts).agg(
            int_avg_round(F.col("q")).alias("a")).first()
        outs.add(row["a"])
    assert outs == {want}, (outs, want)
    # value-identity with the old stable_avg_q(q/1e4) chain
    old = df.agg(
        stable_avg_q(F.col("q").cast("double") / 10_000.0).alias("a")
    ).first()["a"]
    assert old == want
    con = duckdb.connect()
    orow = con.sql(
        f"SELECT {int_avg_round_sql('q')} AS a "
        f"FROM read_parquet('{pq}/*.parquet')").fetchall()[0]
    assert orow[0] == want
    # exact half-up boundary: avg({1, 2}) = 1.5 -> 2
    hdf = spark.createDataFrame([(1, 1), (2, 2)], "id long, q long")
    assert hdf.agg(int_avg_round(F.col("q")).alias("a")).first()["a"] == 2
    assert con.sql(
        f"SELECT {int_avg_round_sql('q')} FROM "
        "(SELECT unnest([1, 2]) AS q)").fetchall()[0][0] == 2
    # null semantics
    ndf = spark.createDataFrame(
        [(1, 4000), (2, None), (3, 6001)], "id long, q long")
    assert ndf.agg(int_avg_round(F.col("q")).alias("a")).first()["a"] == 5001
    adf = spark.createDataFrame([(1, None)], "id long, q long")
    assert adf.agg(int_avg_round(F.col("q")).alias("a")).first()["a"] is None
    assert con.sql(
        f"SELECT {int_avg_round_sql('q')} FROM "
        "(SELECT CAST(NULL AS BIGINT) AS q)").fetchall()[0][0] is None


def test_exact_sum_equals_decimal_sum_path(spark):
    """The split-radix long-path exact_sum must produce the identical
    exact integer as the 128-bit decimal sum for positive/negative/mixed
    and null-bearing inputs (including values near the 2^53 addend
    domain edge)."""
    import random

    from pyspark.sql import functions as F

    from multiagent_document_etl_system_spark.functions.numeric import (
        dec,
        exact_sum,
    )

    rng = random.Random(7)
    rows = [(i % 3, rng.uniform(-9e9, 9e9)) for i in range(3000)]
    rows += [(0, None), (1, 0.0), (2, -0.0000005), (0, 8.9e9), (1, -8.9e9)]
    df = spark.createDataFrame(rows, "g int, x double").repartition(7)
    got = df.groupBy("g").agg(
        exact_sum(F.col("x")).alias("fast"),
        F.sum(dec(F.col("x"))).alias("ref"),
    ).collect()
    assert got
    for r in got:
        assert int(r["fast"]) == int(r["ref"]), r


def test_grid_round_matches_duckdb_at_half_boundaries(spark):
    """Differential property: grid_round must agree with the oracle's
    grid_round_sql on adversarial inputs — exact half-boundaries, values
    1 ulp either side of them, negatives, and random floats. This is the
    cross-engine divergence class that kept td_prepare_corpus driver-red
    for two rounds (engine round() differs by 1 ulp at half boundaries;
    the shared floor-grid cannot)."""
    import math
    import random

    import duckdb
    from pyspark.sql import functions as F

    from multiagent_document_etl_system_spark.functions.numeric import (
        grid_round,
        grid_round_sql,
    )

    rng = random.Random(11)
    vals = []
    for k in range(-400, 400):
        half = k / 100.0 + 0.005  # exact-ish half boundary at scale 2
        vals += [half, math.nextafter(half, -math.inf),
                 math.nextafter(half, math.inf)]
    vals += [rng.uniform(-1e6, 1e6) for _ in range(500)]
    vals += [0.0, -0.0, 1e-9, -1e-9]

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in df.select(grid_round(F.col("x"), 2)).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = [r[0] for r in
            con.execute(f"SELECT {grid_round_sql('x', 2)} FROM t").fetchall()]
    assert len(got) == len(want)
    for g, w, v in zip(got, want, vals):
        assert g == w and math.copysign(1, g) == math.copysign(1, w), \
            (v, g, w)

"""Z-order layout key: bit-exactness vs a Python reference, and the
locality property that justifies it (narrow per-file min/max on BOTH
dimensions ⇒ multi-column pruning from a single sort key)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.operators.curation import (
    zorder_key,
    zorder_key_sql,
)
from tests.conftest import SF_DIR


def _interleave_py(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_bit_exact(spark):
    pts = [(x, y) for x in (0, 1, 5, 1023, 4095) for y in (0, 2, 7, 1439)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y",
                           zorder_key(F.col("x"), F.col("y"), 12).alias("z"))
        .collect()
    }
    for (x, y), z in got.items():
        assert z == _interleave_py(x, y, 12), (x, y)


def test_zorder_sql_twin_matches_spark(spark, duck):
    pts = [(x, y) for x in (0, 3, 100, 4095) for y in (0, 9, 1439)]
    df = spark.createDataFrame(pts, "x long, y long")
    spark_z = sorted(
        r.z for r in
        df.select(zorder_key(F.col("x"), F.col("y"), 12).alias("z")).collect()
    )
    vals = ", ".join(f"({x}, {y})" for x, y in pts)
    duck_z = sorted(
        r[0] for r in duck.sql(
            f"SELECT {zorder_key_sql('x', 'y', 12)} AS z "
            f"FROM (VALUES {vals}) AS t(x, y)"
        ).fetchall()
    )
    assert spark_z == duck_z


def test_zorder_layout_beats_single_column_sort(spark):
    """Chunk the events table into 16 equal files two ways — sorted by ts
    (the naive ingest order) vs sorted by the range-normalized z-key —
    and compare mean per-chunk spans on both dimensions, each normalized
    by its full range. The z layout must be materially bounded on BOTH
    user_id and minute-of-day; the ts sort leaves both near-full (the
    data spans many days, so minute-of-day wraps every file). Narrow
    per-file spans are exactly the parquet min/max pruning win."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id",
        (F.hour("ts") * 60 + F.minute("ts")).cast("bigint").alias("moday"),
        F.col("ts"),
    )
    u0, u1, m0, m1 = ev.agg(
        F.min("user_id"), F.max("user_id"),
        F.min("moday"), F.max("moday")).collect()[0]

    def zn(col, lo, hi):
        return F.floor((F.col(col) - F.lit(lo)) * F.lit(4095.0)
                       / F.lit(max(hi - lo, 1))).cast("bigint")

    ev = ev.withColumn(
        "zval", zorder_key(zn("user_id", u0, u1), zn("moday", m0, m1), 12))

    def mean_spans(order_col: str) -> tuple[float, float]:
        chunked = ev.withColumn(
            "chunk", F.ntile(16).over(Window.orderBy(order_col)))
        r = (
            chunked.groupBy("chunk")
            .agg((F.max("user_id") - F.min("user_id")).alias("su"),
                 (F.max("moday") - F.min("moday")).alias("sm"))
            .agg(F.avg("su"), F.avg("sm"))
            .collect()[0]
        )
        return float(r[0]) / max(u1 - u0, 1), float(r[1]) / max(m1 - m0, 1)

    z_user, z_min = mean_spans("zval")
    ts_user, ts_min = mean_spans("ts")
    # z layout: bounded on BOTH dimensions; ts layout: near-full on both
    assert z_user < 0.5 and z_min < 0.5, (z_user, z_min)
    assert z_user < 0.6 * ts_user, (z_user, ts_user)
    assert z_min < 0.6 * ts_min, (z_min, ts_min)


def test_zorder_write_produces_narrow_parquet_footer_stats(spark, tmp_path):
    """End-to-end layout evidence: actually WRITE the events table
    z-clustered (repartitionByRange(zval) + sortWithinPartitions — the
    production write path) and read every parquet footer back with
    pyarrow. Each file's column-chunk min/max on BOTH user_id and
    minute-of-day must be materially narrower than the full range —
    those footer stats are precisely what lets a predicate on either
    column skip whole files/row-groups at scan time."""
    import pyarrow.parquet as pq

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id",
        (F.hour("ts") * 60 + F.minute("ts")).cast("bigint").alias("moday"),
    )
    u0, u1, m0, m1 = ev.agg(
        F.min("user_id"), F.max("user_id"),
        F.min("moday"), F.max("moday")).collect()[0]

    def zn(col, lo, hi):
        return F.floor((F.col(col) - F.lit(lo)) * F.lit(4095.0)
                       / F.lit(max(hi - lo, 1))).cast("bigint")

    out = str(tmp_path / "zordered")
    (ev.withColumn("zval",
                   zorder_key(zn("user_id", u0, u1), zn("moday", m0, m1), 12))
     .repartitionByRange(16, "zval")
     .sortWithinPartitions("zval")
     .write.mode("overwrite").parquet(out))

    import pathlib
    spans_u, spans_m = [], []
    for f in pathlib.Path(out).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        for rg in range(md.num_row_groups):
            cols = {md.row_group(rg).column(i).path_in_schema:
                    md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)}
            su = cols["user_id"]
            sm = cols["moday"]
            spans_u.append((su.max - su.min) / max(u1 - u0, 1))
            spans_m.append((sm.max - sm.min) / max(m1 - m0, 1))
    assert len(spans_u) >= 16
    # every z-clustered file is bounded on BOTH dimensions
    assert sum(spans_u) / len(spans_u) < 0.4, spans_u
    assert sum(spans_m) / len(spans_m) < 0.4, spans_m

"""Salting correctness: salted results must equal unsalted results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of one hot key + a long tail
    hot = spark.range(10000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("rid"),
        (F.col("id") % 7).cast("double").alias("v"))
    tail = spark.range(500).select(
        F.concat(F.lit("t"), F.col("id")).alias("k"),
        (F.col("id") + 20000).alias("rid"),
        F.lit(1.0).alias("v"))
    return hot.unionByName(tail)


def test_salted_agg_equals_plain(spark, skewed):
    plain = {r["k"]: (r["total"], r["n"], r["mx"]) for r in
             skewed.groupBy("k").agg(
                 F.sum("v").alias("total"), F.count("v").alias("n"),
                 F.max("v").alias("mx")).collect()}
    salted = {r["k"]: (r["total"], r["n"], r["mx"]) for r in
              skew.salted_agg(
                  skewed, "k",
                  {"total": ("v", "sum"), "n": ("v", "count"),
                   "mx": ("v", "max")},
                  salt_from="rid", n_salts=8).collect()}
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        skew.salted_agg(skewed, "k", {"a": ("v", "avg")}, salt_from="rid")


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim"), ("t1", "tail-dim")], "k string, label string")
    plain = skewed.join(dim, "k").groupBy("k", "label") \
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    salted = skew.salted_join(skewed, dim, "k", salt_from="rid", n_salts=8) \
        .groupBy("k", "label") \
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(spark, skewed):
    """Left join: unmatched big-side rows survive exactly once."""
    dim = spark.createDataFrame([("HOT", "hot-dim")], "k string, label string")
    out = skew.salted_join(skewed, dim, "k", salt_from="rid",
                           n_salts=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("label").isNull()).count() == 500


def test_aqe_splits_skewed_smj_at_runtime(spark):
    """AQE's skew-join split — the runtime half of the skew story next to
    the manual salting above — must actually fire: a 90%-hot key under a
    forced sort-merge join ends up as SortMergeJoin(skew=true) in the
    EXECUTED plan (the pre-execution plan never shows it; and a groupBy
    on the join key directly above the join suppresses the split, since
    splitting would break co-partitioning and AQE won't insert an extra
    shuffle unless forceOptimizeSkewedJoin is set)."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        pad = F.sha2(F.col("id").cast("string"), 256)
        left = spark.range(0, 300000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id") % 100).alias("k"),
            pad.alias("pad"))
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("r").alias("rv"))
        j = left.join(right, "k").select("k", "pad")
        assert len(j.collect()) == 300000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

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

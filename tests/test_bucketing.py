"""Bucketing: pre-shuffled table layout ⇒ co-located joins with NO exchange.

The 100 TB lever for repeated fact⋈fact joins (SCALE.md): pay the shuffle
once at write time, never again at read time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.io import load_table


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").format("parquet").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").format("parquet").saveAsTable("b_lineitem"))

    # force a shuffle-capable join strategy: no broadcast, no AQE rewrite
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        # bucket layout satisfies the join's distribution requirement:
        # a plain (unbucketed) SMJ would need two hash exchanges
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        n = j.count()
        expect = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert n == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")

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


def test_sessionize_chunked_equals_plain_on_planted_boundaries(spark):
    """The chunked form must agree with the plain lag+cumsum form on the
    exact hazards its restructuring introduces: sessions straddling a
    chunk boundary (merge), gaps of exactly gap_s (same session — the
    rule is strictly >), breaks of gap_s+1 across a boundary, sessions
    spanning 3+ chunks, an empty chunk between events (break by the
    adjacency argument), and timestamp ties ordered by event_id."""
    import datetime as dt

    from pyspark.sql import Window

    from multiagent_document_etl_system_spark.operators.skew import (
        sessionize_chunked_counts,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)

    def at(sec):
        return base + dt.timedelta(seconds=sec)

    day = 86400
    rows = [
        # user 1: one session straddling midnight (chunk boundary):
        # events at 23:50 and 00:10 next day, 1200s apart -> ONE session
        (101, 1, "a", at(day - 600), 1.0),
        (102, 1, "a", at(day + 600), 1.0),
        # user 1 later: exactly gap_s apart -> same session (rule is >)
        (103, 1, "a", at(day + 600 + 1800), 1.0),
        # then gap_s+1 -> new session
        (104, 1, "a", at(day + 600 + 1800 + 1801), 1.0),
        # user 2: a session spanning THREE chunks (events every 20 min
        # around two midnights)
        (201, 2, "b", at(2 * day - 1200), 1.0),
        (202, 2, "b", at(2 * day - 100), 1.0),
        (203, 2, "b", at(2 * day + 900), 1.0),
        (204, 2, "b", at(3 * day - 900), 1.0),  # big gap same day -> new
        (205, 2, "b", at(3 * day + 100), 1.0),  # straddles next midnight
        # user 3: empty chunk between two events -> must break
        (301, 3, "c", at(100), 1.0),
        (302, 3, "c", at(2 * day + 100), 1.0),
        # user 4: timestamp ties (same ts, distinct event_ids)
        (401, 4, "d", at(5000), 1.0),
        (402, 4, "d", at(5000), 1.0),
        (403, 4, "d", at(5000 + 1801), 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")

    got = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in sessionize_chunked_counts(ev).collect()}

    # the plain q_sessionize shape, inlined on the same frame
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts") \
        .rowsBetween(Window.unboundedPreceding, 0)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (ev.withColumn(
        "new_sess",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("sess_id", F.sum("new_sess").over(wrun)))
    want = {r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in sess.groupBy("user_id").agg(
                F.countDistinct("sess_id").cast("bigint")
                .alias("n_sessions"),
                F.count("*").alias("n_events")).collect()}
    assert got == want
    # and the planted expectations themselves
    assert got[1] == (2, 4)
    assert got[2] == (2, 5)
    assert got[3] == (2, 2)
    assert got[4] == (2, 3)


def test_sessionize_chunked_rejects_chunk_not_exceeding_gap():
    import pytest

    from multiagent_document_etl_system_spark.operators.skew import (
        sessionize_chunked_counts,
    )

    with pytest.raises(ValueError, match="must exceed"):
        sessionize_chunked_counts(None, gap_s=3600, chunk_s=3600)


def test_dup_ngram_coverage_stripped_equals_plain_with_boilerplate(spark):
    """r10 (--boiler rehearsal): dup_ngram_coverage_stripped must emit
    EXACTLY the plain window plan's rows on a corpus carrying a planted
    mega-boilerplate shingle — the hot shingles are flagged via the
    Misra-Gries pre-strip (freq >= 2 on the distinct-shingle basis IS
    duplication) while the window runs over the cold remainder only."""
    from multiagent_document_etl_system_spark.operators.textstats import (
        dup_ngram_coverage_stripped,
    )
    from multiagent_document_etl_system_spark.plans.registry import QUERIES

    boiler = "all rights reserved terms of service apply"
    rows = []
    for i in range(40):
        body = f"unique{i} prose{i} tokens{i} about{i} topic{i} number{i}"
        # 30 of 40 docs carry the boilerplate (hot shingles, df=30);
        # every doc keeps a unique body (cold shingles, df=1)
        text = f"{body} {boiler}" if i < 30 else body
        rows.append((i, text, "en", "web", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    # tiny inv_epsilon + full-rate probe so the planted shingles
    # deterministically clear the hot threshold on a 40-doc corpus
    # (threshold = max(2, sampled_N/inv_epsilon)); the probe sees df=30
    # boilerplate shingles vs threshold ~18 => the hot path IS exercised
    got = {r["doc_id"]: (r["n_shingles"], r["n_dup"], r["cov_q1e4"])
           for r in dup_ngram_coverage_stripped(
               docs, inv_epsilon=20, sample_frac=1.0).collect()}

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        plain_fn, _ = QUERIES["ta_dup_ngram_coverage"]
        want = {r["doc_id"]: (r["n_shingles"], r["n_dup"], r["cov_q1e4"])
                for r in plain_fn(spark, td).collect()}
    assert got == want
    # the boilerplate docs must show duplicated coverage, clean docs none
    assert all(got[i][1] > 0 for i in range(30))
    assert all(got[i][1] == 0 for i in range(30, 40))


def test_dup_ngram_coverage_stripped_no_hot_shingles(spark):
    """Degenerate path: corpus with NO shingle clearing the heavy-hitter
    threshold — the hot set is empty (isin([]) guard) and the stripped
    plan must still equal the plain semantics (everything cold)."""
    from multiagent_document_etl_system_spark.operators.textstats import (
        dup_ngram_coverage_stripped,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "web", 22),
         (2, "epsilon zeta eta theta", "en", "web", 22),
         (3, "alpha beta gamma delta", "en", "web", 22)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    # inv_epsilon=1 => threshold = ALL sampled occurrences: no shingle
    # can qualify, so the hot set is empty and the isin([]) guard
    # engages (full-rate probe keeps the emptiness deterministic)
    got = {r["doc_id"]: (r["n_shingles"], r["n_dup"])
           for r in dup_ngram_coverage_stripped(
               docs, inv_epsilon=1, sample_frac=1.0).collect()}
    # docs 1 and 3 are exact copies: every shingle duplicated; doc 2 clean
    assert got[1] == got[3] and got[1][1] == got[1][0]
    assert got[2][1] == 0

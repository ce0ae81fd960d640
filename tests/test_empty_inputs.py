"""Zero-row robustness: every operator family must return an EMPTY result
with the contract schema on empty input — never raise. At 100 TB a
partition-pruned read, a dry landing directory, or an all-filtered
upstream stage routinely hands an operator zero rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.io import load_table

SF = "/root/testdata/sf0.001"


def _docs0(spark):
    return load_table(spark, SF, "documents").limit(0)


def _q(df, n=None):
    e = df.limit(0) if n is None else df.limit(n)
    return e.select(F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("q_vec"))


def _c(df, n=None):
    e = df.limit(0) if n is not None and n == 0 else df
    return e.select(F.col("vec_id").alias("c_id"),
                    F.col("embedding").alias("c_vec"))


def test_pipeline_and_curation_on_empty_corpus(spark):
    from multiagent_document_etl_system_spark.operators import (
        curation,
        dedup,
        textstats,
    )
    from multiagent_document_etl_system_spark.plans.pipeline import run_pipeline

    d0 = _docs0(spark)
    assert run_pipeline(spark, d0).count() == 0
    assert dedup.minhash_lsh_pairs(d0, threshold=0.5).count() == 0
    assert dedup.duplicate_clusters(
        spark.createDataFrame([], "id_a long, id_b long")).count() == 0
    assert textstats.term_frequencies(d0).count() == 0
    assert curation.gopher_rules(d0).count() == 0
    assert curation.snapshot_diff(d0, d0).count() == 0
    assert curation.decontaminate(d0, d0).count() == 0


def test_similarity_kernels_on_empty_sides(spark):
    from multiagent_document_etl_system_spark.operators import similarity

    emb = load_table(spark, SF, "embeddings")
    q0, q3 = _q(emb), _q(emb, 3)
    c = _c(emb)
    c0 = c.limit(0)

    assert similarity.topk_join(q0, c).count() == 0
    assert similarity.topk_join(q3, c0).count() == 0
    out = similarity.topk_join_matmul(q0, c)
    assert out.count() == 0
    assert set(out.columns) == {"q_id", "c_id", "score", "rank"}
    assert similarity.topk_join_matmul(q3, c0).count() == 0
    assert similarity.ann_lsh_topk(q0, c, dim=64).count() == 0
    assert similarity.ann_lsh_topk_matmul(q0, c, dim=64).count() == 0
    # degenerate IVF corpora: 0 or 1 candidates fall back to brute force
    assert similarity.ivf_topk(q3, c0).count() == 0
    one = similarity.ivf_topk(q3, c.limit(1))
    assert one.count() <= 3 and set(one.columns) >= {"q_id", "c_id", "score"}
    auto_out, strategy = similarity.topk_auto(q0, c, dim=64)
    assert strategy == "broadcast_exact" and auto_out.count() == 0


def test_round5_curation_ops_on_empty_corpus(spark):
    from multiagent_document_etl_system_spark.operators import curation

    d0 = _docs0(spark)
    assert curation.quality_classifier(d0).count() == 0
    assert curation.temperature_mix(d0).count() == 0

"""q_kmv_distinct — the hash-oracled KMV (k-minimum-values) distinct
sketch (late r12): the exactly-restatable twin of q_approx_distinct's
engine-internal HLL. Pins the driver-compare parity, the
WindowGroupLimit scale shape (partial per-partition top-k BEFORE the
exchange), the small-group exact fallback, and the estimator's accuracy
on a corpus large enough to actually engage the sketch."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: N812


def test_registry_oracle_parity(spark, duck):
    """Hash-match vs DuckDB at fixture scale. lineitem at sf0.001 has
    < 256 distinct partkeys per group, so this exercises the exact
    fallback branch (n_kept < k ⇒ est = n_kept, err_bp = 0); the
    sketch branch is driver-checked at sf0.01 and pinned below."""
    from tests.conftest import driver_compare

    driver_compare(spark, duck, "q_kmv_distinct")


def test_fixture_scale_hits_the_exact_branch(spark):
    from multiagent_document_etl_system_spark.plans.registry import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q_kmv_distinct"][0](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["kmv_kept"] < 256
        assert r["kmv_est"] == r["exact_parts"] == r["kmv_kept"]
        assert r["err_bp"] == 0


def test_window_group_limit_in_plan(spark):
    """The rn <= k filter must compile to a WindowGroupLimit (Spark's
    rank-limit pushdown): each input partition keeps only its k
    smallest hashes BEFORE the per-group exchange — the property that
    makes the sketch O(k·partitions) per group at 100 TB, not
    O(distinct)."""
    from multiagent_document_etl_system_spark.plans.registry import QUERIES
    from tests.conftest import SF_DIR

    df = QUERIES["q_kmv_distinct"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_setops_registry_oracle_parity(spark, duck):
    """q_kmv_setops (sketch union + intersection estimation, Beyer et
    al. 2007) hash-matches its DuckDB oracle; at fixture scale the F/O
    orderkey sets are ~1.3k each so the k=256 sketch branch is
    ENGAGED (unlike q_kmv_distinct's fixture exact branch)."""
    from tests.conftest import driver_compare

    driver_compare(spark, duck, "q_kmv_setops")


def test_setops_estimates_are_sane(spark):
    """The pinned hash values are trustworthy only if the estimators
    actually estimate: union and intersection estimates within ±25% of
    truth at fixture scale (k=256 ⇒ ~6.3% sigma on union; the
    intersection inherits ρ's binomial noise on top)."""
    from multiagent_document_etl_system_spark.plans.registry import QUERIES
    from tests.conftest import SF_DIR

    r = QUERIES["q_kmv_setops"][0](spark, SF_DIR).collect()[0]
    assert r["kept"] == 256
    assert abs(r["est_union"] - r["exact_union"]) / r["exact_union"] < 0.25
    assert abs(r["est_inter"] - r["exact_inter"]) / r["exact_inter"] < 0.25


def test_sampled_percentile_oracle_parity(spark, duck):
    """q_sampled_percentile (deterministic hash-sample + explicit
    ceil-rank selection, no engine percentile builtin) hash-matches its
    DuckDB oracle."""
    from tests.conftest import driver_compare

    driver_compare(spark, duck, "q_sampled_percentile")


def test_sampled_percentile_shape_and_error(spark):
    """9 rows (3 groups × p50/90/99); the exact side IS the truth so
    err_bp must be small at fixture scale where the 1,024-row sample
    covers most of each ~2k-row group — and exactly 0 wherever the
    sample is the whole group."""
    from multiagent_document_etl_system_spark.plans.registry import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q_sampled_percentile"][0](spark, SF_DIR).collect()
    assert len(rows) == 9
    assert {r["p"] for r in rows} == {50, 90, 99}
    for r in rows:
        assert r["err_bp"] < 1000, r  # within 10% with a dense sample


def test_sampled_percentile_window_group_limit(spark):
    """The sample selection must compile to WindowGroupLimit — the
    per-partition partial top-k that makes the sampled path scale."""
    from multiagent_document_etl_system_spark.plans.registry import QUERIES
    from tests.conftest import SF_DIR

    df = QUERIES["q_sampled_percentile"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_sketch_branch_accuracy(spark):
    """On 3,000 distinct values (sketch engaged: 3000 > k=256) the
    KMV estimate must land within ±20% of the truth — k=256 gives a
    ~6.3% standard error, so 20% is > 3 sigma. The estimator is a
    deterministic function of md5, so this is a fixed number, not a
    flaky draw."""
    from multiagent_document_etl_system_spark.operators.dedup import hash64

    k = 256
    h = (spark.range(3000)
         .select(hash64(F.col("id").cast("string")).alias("h"))
         .distinct())
    kth = (h.orderBy("h").limit(k)
           .agg(F.max("h").alias("kth")).collect()[0]["kth"])
    est = int((2 ** 60) * (k - 1) / kth + 0.5)
    assert abs(est - 3000) / 3000 < 0.20, est

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in
``multiagent_document_etl_system_spark/plans/registry.py`` — one named query
per implemented operator from SURVEY.md §2 (+ north-star extensions), each
paired with its DuckDB oracle SQL (None ⇒ rows-only check for
non-SQL-expressible ops).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from multiagent_document_etl_system_spark.plans.registry import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the whole document-ETL pipeline as one DataFrame plan over
    /root/testdata/sf0.001 (SURVEY.md §7.2). Driver checks rows > 0."""
    from multiagent_document_etl_system_spark.io import load_table
    from multiagent_document_etl_system_spark.plans.pipeline import run_pipeline

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return run_pipeline(spark, docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted ⇒ rows-only check."""
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}


def no_oracle_reasons() -> dict[str, str]:
    """Why each rows-only query has no oracle BY CONSTRUCTION (KMeans
    fits, sketches, model inference, binary parsing, GEMM summation
    order, streaming state) and where its pytest-level check lives. A
    driver `no_oracle` row for these names is the expected outcome, not
    a missing oracle."""
    from multiagent_document_etl_system_spark.plans.registry import (
        NO_ORACLE_REASONS,
    )
    return dict(NO_ORACLE_REASONS)


def env_gated_reasons() -> dict[str, str]:
    """Queries that REGISTER CONDITIONALLY on environment capability and
    did NOT register in this interpreter, with the machine-readable
    reason (the no_oracle_reasons() pattern for absent-by-environment
    rather than oracle-less-by-construction). Currently:
    ``st_user_profile_tws`` (transformWithStateInPandas — its state
    protocol needs protobuf importable by Spark's Python workers); a
    protobuf-equipped driver sees it in queries()/oracle_sql() with a
    full hash oracle and this dict empty."""
    from multiagent_document_etl_system_spark.plans.registry import (
        ENV_GATED_REASONS,
    )
    return dict(ENV_GATED_REASONS)

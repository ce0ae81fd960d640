"""Pin the registry-wide plan lint green (tools/plan_lint.py): no batch
query may introduce a cartesian product, an unsanctioned broadcast
nested-loop join, or Python evaluation in its plan. The per-pattern
sanction lists live in the tool and each carries its justification."""

from __future__ import annotations


def test_registry_plan_lint_clean(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import plan_lint

    offenders = plan_lint.lint(spark, "/root/testdata/sf0.001")
    assert not offenders, offenders


def test_lint_sanction_lists_name_real_queries(spark):
    """A sanction for a renamed/deleted query is stale — prune it."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import plan_lint

    from multiagent_document_etl_system_spark.plans.registry import QUERIES

    stale = (plan_lint.PYTHON_OK | plan_lint.BNLJ_OK) - set(QUERIES)
    assert not stale, stale

"""Hygiene of the plan-lint sanction lists (the lint walk itself runs in
tests/test_plans.py::test_no_python_eval_in_any_registry_query — one walk
for the whole suite)."""

from __future__ import annotations


def test_lint_sanction_lists_name_real_queries(spark):
    """A sanction for a renamed/deleted query is stale — prune it."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import plan_lint

    from multiagent_document_etl_system_spark.plans.registry import QUERIES

    stale = (plan_lint.PYTHON_OK | plan_lint.BNLJ_OK
         | plan_lint.CARTESIAN_OK) - set(QUERIES)
    assert not stale, stale

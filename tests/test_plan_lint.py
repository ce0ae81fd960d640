"""Plan-lint correctness: the two r8-implemented checks (global Sort
with no limit above, Exchange SinglePartition into a non-aggregate)
detect synthetic offenders and accept the sanctioned-by-structure
shapes; sanction-list hygiene. The full registry walk itself runs in
tests/test_plans.py::test_no_python_eval_in_any_registry_query — one
walk for the whole suite, now enforcing ALL five patterns.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import plan_lint  # noqa: E402


def _fmt(tree: str, details: str) -> str:
    """Assemble an explain('formatted')-shaped plan string."""
    return f"{tree.strip()}\n\n{details.strip()}\n"


# -- check_global_sort -------------------------------------------------

_RAW_SORT = _fmt("""
* Sort (3)
+- Exchange (2)
   +- Scan parquet  (1)
""", """
(3) Sort
Input [2]: [a#1, b#2]
Arguments: [a#1 ASC NULLS FIRST], true, 0
""")

_LOCAL_SORT = _fmt("""
* Window (3)
+- Sort (2)
   +- Scan parquet  (1)
""", """
(2) Sort
Input [2]: [a#1, b#2]
Arguments: [a#1 ASC NULLS FIRST], false, 0
""")

_SORT_OVER_AGG = _fmt("""
* Sort (4)
+- HashAggregate (3)
   +- Exchange (2)
      +- Scan parquet  (1)
""", """
(4) Sort
Input [2]: [a#1, n#2]
Arguments: [a#1 ASC NULLS FIRST], true, 0
""")

_TOPK_SORT = _fmt("""
GlobalLimit (4)
+- Sort (3)
   +- Exchange (2)
      +- Scan parquet  (1)
""", """
(3) Sort
Input [2]: [a#1, b#2]
Arguments: [a#1 ASC NULLS FIRST], true, 0
""")


def test_global_sort_detects_raw_full_data_sort():
    assert plan_lint.check_global_sort(_RAW_SORT) == [
        "GlobalSortNoLimit(3)"]


def test_global_sort_ignores_local_window_sorts():
    """Per-partition sorts under Window nodes (global=false) are the
    NORMAL windowing shape — never an offender."""
    assert plan_lint.check_global_sort(_LOCAL_SORT) == []


def test_global_sort_accepts_group_count_sized_input():
    """A final orderBy over an aggregate sorts a group-count-sized
    relation — accepted structurally."""
    assert plan_lint.check_global_sort(_SORT_OVER_AGG) == []


def test_global_sort_accepts_topk():
    """Sort under a Limit is top-k (TakeOrderedAndProject territory) —
    accepted."""
    assert plan_lint.check_global_sort(_TOPK_SORT) == []


_SORT_OVER_JOIN_WITH_BRANCH_AGG = _fmt("""
* Sort (8)
+- SortMergeJoin Inner (7)
   :- Exchange (3)
   :  +- Filter (2)
   :     +- Scan parquet  (1)
   +- HashAggregate (6)
      +- Exchange (5)
         +- Scan parquet  (4)
""", """
(8) Sort
Input [3]: [a#1, b#2, n#3]
Arguments: [b#2 ASC NULLS FIRST], true, 0
""")


def test_global_sort_not_sanctioned_by_branch_aggregate():
    """The r8 review's false negative: an aggregate on ONE branch of a
    join does not reduce the join's output — only reducers on the Sort's
    unary input spine may sanction it. A global sort over a corpus-scale
    join whose dimension side happens to aggregate must still flag."""
    assert plan_lint.check_global_sort(
        _SORT_OVER_JOIN_WITH_BRANCH_AGG) == ["GlobalSortNoLimit(8)"]


# -- check_single_partition --------------------------------------------

_SP_INTO_WINDOW = _fmt("""
* Window (3)
+- Exchange (2)
   +- Scan parquet  (1)
""", """
(2) Exchange
Input [2]: [a#1, b#2]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
""")

_SP_INTO_AGG = _fmt("""
* HashAggregate (3)
+- Exchange (2)
   +- HashAggregate (1)
""", """
(2) Exchange
Input [1]: [sum#1]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
""")

_HASH_EXCHANGE = _fmt("""
* Window (3)
+- Exchange (2)
   +- Scan parquet  (1)
""", """
(2) Exchange
Input [2]: [a#1, b#2]
Arguments: hashpartitioning(a#1, 32), ENSURE_REQUIREMENTS, [plan_id=1]
""")


def test_single_partition_detects_window_bottleneck():
    hits = plan_lint.check_single_partition(_SP_INTO_WINDOW)
    assert hits == ["SinglePartitionInto(* Window (3))"]


def test_single_partition_accepts_scalar_agg_final_step():
    """Partial rows (one per partition) into a single-partition final
    aggregate is the ubiquitous scalar-agg shape — accepted."""
    assert plan_lint.check_single_partition(_SP_INTO_AGG) == []


def test_single_partition_ignores_hash_exchanges():
    assert plan_lint.check_single_partition(_HASH_EXCHANGE) == []


# -- sanction-list hygiene ---------------------------------------------

def test_lint_sanction_lists_name_real_queries(spark):
    """A sanction for a renamed/deleted query is stale — prune it."""
    from multiagent_document_etl_system_spark.plans.registry import QUERIES

    stale = (plan_lint.PYTHON_OK | plan_lint.BNLJ_OK
             | plan_lint.CARTESIAN_OK | plan_lint.GLOBAL_SORT_OK
             | plan_lint.SINGLE_PARTITION_OK) - set(QUERIES)
    assert not stale, stale


def test_single_partition_sanctions_are_the_audited_set():
    """The r7 verdict ordered the sanction list to NAME q_skew_profile's
    keys-sized rank window; the other entries are the audited bounded
    relations (#partitions-row offsets, #sources-row mixing windows,
    post-limit vocab ids). q_null_functions must NOT need a sanction —
    its unpartitioned window was FIXED this round, which this pin
    enforces forever."""
    assert "q_skew_profile" in plan_lint.SINGLE_PARTITION_OK
    assert "q_null_functions" not in plan_lint.SINGLE_PARTITION_OK
    assert "q_null_functions" not in plan_lint.GLOBAL_SORT_OK
    assert plan_lint.SINGLE_PARTITION_OK == {
        "q_skew_profile", "q_global_row_ids", "td_temperature_mix",
        "td_epoch_plan", "td_mix_post_dedup", "td_prepare_corpus_v3",
        "ta_collocations",
    }


def test_null_functions_window_is_partitioned(spark):
    """The fixed q_null_functions plan: its lag window sorts WITHIN
    hash partitions (global=false sort, hashpartitioning exchange) —
    no SinglePartition exchange, no WindowExec-all-data-one-task."""
    import contextlib
    import io

    from multiagent_document_etl_system_spark.plans.registry import QUERIES

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["q_null_functions"][0](
            spark, "/root/testdata/sf0.001").explain("formatted")
    p = buf.getvalue()
    assert "SinglePartition" not in p
    assert "hashpartitioning(user_id" in p
    assert plan_lint.check_single_partition(p) == []
    assert plan_lint.check_global_sort(p) == []


_SORT_WITH_PAREN_INPUT = _fmt("""
* Sort (3)
+- Exchange (2)
   +- Scan parquet  (1)
""", """
(3) Sort
Input [2]: [a#1, count(1)#5L]
Arguments: [count(1)#5L ASC NULLS FIRST], true, 0
""")


def test_global_sort_sees_through_parenthesized_input_lists(spark=None):
    """r8 ADVICE: a Sort whose detail-block Input list carries a
    parenthesized expression (count(1)#5L from a preceding project) must
    still be classified as global — the old [^(]*? span regex silently
    skipped it."""
    assert plan_lint.check_global_sort(_SORT_WITH_PAREN_INPUT) == [
        "GlobalSortNoLimit(3)"]


_SP_WITH_PAREN_INPUT = _fmt("""
* Window (3)
+- Exchange (2)
   +- Scan parquet  (1)
""", """
(2) Exchange
Input [2]: [a#1, avg(b#2)#7]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=42]
""")


def test_single_partition_sees_through_parenthesized_input_lists():
    """Same detail-block parsing hazard for the SinglePartition check."""
    hits = plan_lint.check_single_partition(_SP_WITH_PAREN_INPUT)
    assert hits and "Window" in hits[0]

"""Plan-shape contracts for the operators VERDICT r1 flagged as
scale-killers: the fix is pinned at the physical-plan level so a
regression (global single-partition window, unbounded pairwise block)
fails CI, not a 100-TB run.

- KMV k-min set: distributed TakeOrderedAndProject, never a global
  ROW_NUMBER window over all distinct hashes.
- n-gram Jaccard & embedding near-dup: pairwise work bounded by LSH
  candidates — equi-joins only, no CartesianProduct / BroadcastNestedLoop.
"""

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_available():
    import os
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    return SF_DIR


def test_kmv_uses_take_ordered_not_global_window(spark, sf_available):
    from pdf_inspector_spark.operators import load_views
    from pdf_inspector_spark.operators.sketches import _KMV_SPARK
    load_views(spark, sf_available)
    plan = _plan(spark.sql(_KMV_SPARK))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_jaccard_plan_has_no_cartesian_or_nested_loop(spark, sf_available):
    from pdf_inspector_spark.operators.dedup import _jaccard_spark
    plan = _plan(_jaccard_spark(spark, sf_available))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # verification joins candidates back to the materialized shingle table
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_neardup_plan_blocks_on_bucket_equijoin(spark, sf_available):
    from pdf_inspector_spark.operators.similarity import _neardup_spark
    plan = _plan(_neardup_spark(spark, sf_available))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "bucket" in plan, plan


def test_exact_dedup_aggregates_with_partial_merge(spark, sf_available):
    """Exact dedup = two-phase hash aggregate on the content hash
    (map-side combine), not a sort or window."""
    from pdf_inspector_spark.operators import load_views
    from pdf_inspector_spark.operators.dedup import _EXACT_SPARK
    load_views(spark, sf_available)
    plan = _plan(spark.sql(_EXACT_SPARK))
    assert "partial_count" in plan or "HashAggregate" in plan, plan
    assert "Window" not in plan, plan

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


def test_star_contraction_converges_in_log_rounds(spark):
    """Star contraction's value proposition: a 64-node PATH (diameter 63)
    converges in O(log n) rounds where min-label propagation would need
    ~63. All nodes must label to the path minimum."""
    import pyspark.sql.functions as F

    from pdf_inspector_spark.operators.dedup import star_components
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "u long, v long").localCheckpoint()
    nodes = spark.range(64).select(F.col("id").alias("doc_id"))
    labels, rounds = star_components(edges, nodes)
    rows = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert rows == {i: 0 for i in range(64)}
    assert rounds <= 10, f"expected O(log n) convergence, took {rounds}"


def test_star_contraction_matches_propagation_on_random_graph(spark):
    """Property check: star contraction and a NetworkX-free exact union-
    find agree on a deterministic pseudo-random graph."""
    import hashlib

    import pyspark.sql.functions as F

    from pdf_inspector_spark.operators.dedup import star_components
    n, m = 200, 150
    pairs = []
    for i in range(m):
        h = int.from_bytes(hashlib.md5(f"e{i}".encode()).digest()[:8], "big")
        a, b = h % n, (h >> 20) % n
        if a != b:
            pairs.append((min(a, b), max(a, b)))
    # exact union-find ground truth
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for x in set(a for p in pairs for a in p):
        truth[x] = find(x)
    # min-root canonicalization: find() with min-merge yields the min id
    edges = spark.createDataFrame(sorted(set(pairs)),
                                  "u long, v long").localCheckpoint()
    nodes = spark.createDataFrame([(x,) for x in sorted(truth)],
                                  "doc_id long")
    labels, _ = star_components(edges, nodes)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == truth

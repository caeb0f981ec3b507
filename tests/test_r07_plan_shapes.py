"""Round-7 optimization pins: the restructured operators' load-bearing
plan properties and the bit-identity of the vectorized dot product.

Each pin guards a specific r7 change (OPTIMIZATION_r07.md):
- the LSH candidate path is join-free (in-bucket pair explosion, no
  band-table self-join) and window-free (bucket cap via aggregate);
- the minhash runs as grouped MIN aggregates, not an interpreted
  aggregate/zip_with fold;
- sim_cosine_topk broadcasts the 10-row QUERY side and streams the
  fanout-repartitioned corpus;
- dedup_exact_groups computes its scan+sha256+partial-aggregate once
  (ReusedExchange in the final AQE plan);
- the neardup pandas dot reproduces the SQL fold bit-for-bit.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_available():
    import os
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    return SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_candidate_path_is_join_free(spark, sf_available):
    from pdf_inspector_spark.operators.dedup import (
        _DOCS, N_BANDS, ROWS_PER_BAND, candidate_pairs_df)
    plan = _plan(candidate_pairs_df(spark, sf_available, _DOCS,
                                    N_BANDS, ROWS_PER_BAND))
    assert "Join" not in plan, plan          # no band self-join of any kind
    # exactly ONE window: the spillable bucket-cap count (a degenerate
    # mega-bucket must be droppable without an unspillable collect
    # buffer); the member collect then groups the already-capped rows
    assert plan.count("Window") == 1, plan
    # the minhash is grouped MIN aggregates, not an interpreted fold
    # (the r3-r6 fold showed up as aggregate(..., least(...)) lambdas;
    # the shingle zip_with chain legitimately remains)
    assert "partial_min" in plan, plan
    assert "least(" not in plan, plan
    # the CPU-dense stage still has its AQE-exempt fanout exchange
    assert "REPARTITION_BY_NUM" in plan, plan


def test_simhash_runs_as_grouped_sums(spark, sf_available):
    from pdf_inspector_spark.operators import all_operators
    plan = _plan(all_operators()["dedup_simhash"].spark(spark, sf_available))
    assert "partial_sum" in plan, plan       # 16 codegen'd SUM aggregates
    assert "zip_with" not in plan, plan      # the r2-r6 interpreted fold
    assert "REPARTITION_BY_NUM" in plan, plan


def test_cosine_topk_broadcasts_query_side(spark, sf_available):
    from pdf_inspector_spark.operators import all_operators
    plan = _plan(all_operators()["sim_cosine_topk"].spark(spark,
                                                          sf_available))
    assert "BroadcastNestedLoopJoin" in plan, plan
    # the BUILD (broadcast) side is the vec_id < 10 query side: the
    # build subtree is printed after the BroadcastExchange node, so the
    # pushed < 10 filter must appear after it (when the corpus side is
    # broadcast instead — the pre-r7 plan — the filter sits before)
    idx = plan.index("BroadcastExchange")
    assert "< 10" in plan[idx:], plan
    # the streamed corpus side carries the fanout exchange
    assert "REPARTITION_BY_NUM" in plan[:idx], plan


def test_exact_groups_final_plan_reuses_exchange(spark, sf_available):
    from pdf_inspector_spark.operators import all_operators
    df = all_operators()["dedup_exact_groups"].spark(spark, sf_available)
    df.collect()  # AQE finalizes; reuse is visible only in the final plan
    assert "ReusedExchange" in _plan(df), _plan(df)


def test_neardup_dot_matches_sql_fold_bitwise(spark, sf_available):
    """nd_dot64's index-ordered vectorized accumulation must equal the
    SQL aggregate() left fold bit-for-bit on the driver corpus — the
    property the oracle hash comparison rides on."""
    import pyspark.sql.functions as F

    from pdf_inspector_spark.operators import load_views
    from pdf_inspector_spark.operators.similarity import (
        _EDOT_SPARK, _NEARDUP_CORPUS_SPARK, _make_dot64)
    load_views(spark, sf_available)
    spark.udf.register("nd_dot64_test", _make_dot64())
    rows = (spark.sql(_NEARDUP_CORPUS_SPARK)
            .withColumn("sql_dot", F.expr(_EDOT_SPARK.format(a="e", b="e")))
            .withColumn("py_dot", F.expr("nd_dot64_test(e, e)"))
            .select("vec_id", "sql_dot", "py_dot")
            .collect())
    assert len(rows) > 0
    import struct
    for r in rows:
        a = struct.pack("<d", r["sql_dot"])
        b = struct.pack("<d", r["py_dot"])
        assert a == b, (r["vec_id"], r["sql_dot"], r["py_dot"])

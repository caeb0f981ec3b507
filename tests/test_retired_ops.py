"""Operators retired from the driver registry in r3 (to fit the 50-query
gate window) stay correctness-checked here, against the same DuckDB
oracles the gate used, at driver strength (exact values, no Decimal /
float normalization).

Retired-but-kept:
- rel_asof_last_event   (as-of join via running window) — driver-green r02
- dedup_cluster_components (min-label propagation CC)   — driver-green r02
- conv_turn_gaps standalone (now folded into conv_assemble_docs; the
  standalone query is exercised here to keep the window formulation
  pinned)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _compare(sdf, con, duck_sql):
    srows = sorted(str(tuple(_norm(v) for v in r)) for r in sdf.collect())
    res = con.execute(duck_sql)
    dcols = [d[0] for d in res.description]
    drows = sorted(str(tuple(_norm(v) for v in r)) for r in res.fetchall())
    assert sdf.columns == dcols
    assert len(srows) == len(drows)
    assert srows == drows
    return len(srows)


def test_asof_last_event(spark, duck):
    from pdf_inspector_spark.operators.relational import ASOF_SQL, asof_spark
    n = _compare(asof_spark(spark, SF_DIR), duck, ASOF_SQL)
    assert n > 0


def test_label_propagation_components(spark, duck):
    from pdf_inspector_spark.operators.dedup import (
        _cluster_duck_sql, label_propagation_components)
    n = _compare(label_propagation_components(spark, SF_DIR), duck,
                 _cluster_duck_sql())
    assert n > 0  # sf0.001 documents must produce at least one LSH edge


def test_turn_gaps_standalone(spark, duck):
    from pdf_inspector_spark.operators.transcript_stats import (
        GAPS_DUCK_SQL, turn_gaps_spark)
    n = _compare(turn_gaps_spark(spark, SF_DIR), duck, GAPS_DUCK_SQL)
    assert n > 0


def test_plane_literal_derivation_matches_oracle_hash(duck):
    """The Spark side inlines hyperplane/centroid per-mille values as
    literals computed by _h1000; the DuckDB oracle still derives them
    with md5 SQL. The two derivations must agree key-for-key or every
    sign/bucket decision silently diverges."""
    from pdf_inspector_spark.operators.similarity import _h1000
    keys = [f"{p}_{i}" for p in (0, 7, 35) for i in (1, 32, 64)]
    keys += [f"c{c}_{i}" for c in (0, 7) for i in (1, 64)]
    for k in keys:
        duck_val = duck.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT % 1000", [k]
        ).fetchone()[0]
        assert _h1000(k) == duck_val, k


def test_ivf_single_probe_topk(spark, duck):
    """Retired in r4: subsumed by sim_ivf_multiprobe (whose first probe
    IS this query's probe set). The standalone top-3 formulation stays
    pinned against its oracle here."""
    from pdf_inspector_spark.operators.similarity import (_IVF_DUCK,
                                                          _IVF_SPARK, _sql)
    n = _compare(_sql(_IVF_SPARK)(spark, SF_DIR), duck, _IVF_DUCK)
    assert n > 0

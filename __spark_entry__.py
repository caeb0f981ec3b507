"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Operator inventory lives in ``pdf_inspector_spark.operators`` (one
registration per SURVEY.md §2 capability + the training-data operators).
Extraction-stage queries run the real pipeline over the deterministic
transcripts table and compare against the kernel-oracle fixture parquet
(the per-turn byte-equality contract); their oracle SQL reads that
fixture via read_parquet().
"""

from __future__ import annotations

import os
import sys
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

_SHIPPED: dict[int, SparkSession] = {}


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to executor-python workers (the local-mode
    equivalent of ``spark-submit --py-files``). Without this, a driver
    session created from a different cwd cannot unpickle the UDFs on
    executors. Memo is identity-checked: a bare id() hit could match a
    NEW session that reused a collected session's id and skip the
    addPyFile (the stored strong ref also pins the id)."""
    key = id(spark)
    if _SHIPPED.get(key) is spark:
        return
    pkg_dir = os.path.join(REPO_ROOT, "pdf_inspector_spark")
    zip_path = os.path.join(REPO_ROOT, "data", "pdf_inspector_spark.zip")
    os.makedirs(os.path.dirname(zip_path), exist_ok=True)
    srcs = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                srcs.append(os.path.join(root, f))
    newest = max(os.path.getmtime(s) for s in srcs)
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest:
        with zipfile.ZipFile(zip_path + ".tmp", "w") as zf:
            for s in sorted(srcs):
                zf.write(s, os.path.relpath(s, REPO_ROOT))
        os.replace(zip_path + ".tmp", zip_path)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:  # noqa: BLE001 — already added in this context
        pass
    _SHIPPED[key] = spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full inspect→classify→extract pipeline over the
    deterministic transcripts table, window-ordered per-turn output."""
    from pdf_inspector_spark.operators.extraction import ensure_fixture_tables
    from pdf_inspector_spark.pipeline import run_pipeline, with_turn_order

    _ensure_shipped(spark)
    tpath, _ = ensure_fixture_tables()
    df = spark.read.parquet(tpath)
    return (with_turn_order(run_pipeline(df, with_markdown=True,
                                         salt_buckets=8))
            .orderBy("conv_id", "turn_idx"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdf_inspector_spark.operators import all_operators

    def shipped(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)
        return run

    return {name: shipped(op.spark)
            for name, op in sorted(all_operators().items())}


def _materialize_oracle_inputs() -> None:
    """The oracle SQL reads fixture/media parquet via absolute paths —
    make sure they exist before DuckDB runs."""
    from pdf_inspector_spark.media import write_media
    from pdf_inspector_spark.operators.extraction import (
        EXPECTED_PATH_TBENCH, _write_expected, ensure_fixture_tables)
    ensure_fixture_tables()
    _write_expected("t-bench", EXPECTED_PATH_TBENCH)
    write_media()


def oracle_sql() -> dict[str, str]:
    from pdf_inspector_spark.operators import all_operators
    _materialize_oracle_inputs()
    return {name: op.oracle for name, op in sorted(all_operators().items())
            if op.oracle is not None}

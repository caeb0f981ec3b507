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
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full inspect→classify→extract pipeline over the
    deterministic transcripts table, window-ordered per-turn output."""
    from pdf_inspector_spark.operators.extraction import ensure_fixture_tables
    from pdf_inspector_spark.pipeline import run_pipeline, with_turn_order

    tpath, _ = ensure_fixture_tables()
    df = spark.read.parquet(tpath)
    return (with_turn_order(run_pipeline(df, with_markdown=True,
                                         salt_buckets=8))
            .orderBy("conv_id", "turn_idx"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdf_inspector_spark.operators import all_operators
    return {name: op.spark for name, op in sorted(all_operators().items())}


def oracle_sql() -> dict[str, str]:
    from pdf_inspector_spark.operators import all_operators
    return {name: op.oracle for name, op in sorted(all_operators().items())
            if op.oracle is not None}

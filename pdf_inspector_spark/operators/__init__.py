"""Operator registry: every engine capability exposed through the driver
contract (__spark_entry__.queries / oracle_sql).

Each operator registers a (spark_builder, duckdb_oracle_sql) pair with
IDENTICAL output column names and deterministic values, so the driver's
row-count + schema + value-hash comparison is meaningful. Operators whose
semantics aren't SQL-expressible register oracle=None (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Operator:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Operator] = {}


def register(name: str, spark: Callable[[SparkSession, str], DataFrame],
             oracle: str | None, doc: str = "") -> None:
    REGISTRY[name] = Operator(name, spark, oracle, doc)


_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings")


# session id -> sf_dir the views CURRENTLY point at (not a set: switching
# A -> B -> A must re-register, or A's queries would read B's views)
_LOADED_VIEWS: dict[int, str] = {}


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver tables as temp views (idempotent, memoized:
    re-registering ten parquet views costs a listing+schema round trip
    per table and every operator calls this).

    Also pins the session timezone to UTC: parquet timestamps load as
    NTZ wall-clock, and every operator that converts one to epoch
    seconds (unix_seconds / window boundaries) would otherwise inherit
    whatever zone the CALLER's session runs in — the DuckDB oracle
    always treats naive timestamps as UTC, so the contract is UTC."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # identity-checked memo: id() alone could hit on a NEW session that
    # reused a garbage-collected session's id and silently skip view
    # registration (the stored strong ref also pins the id)
    hit = _LOADED_VIEWS.get(id(spark))
    if hit is not None and hit[0] is spark and hit[1] == sf_dir:
        return
    for t in _TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    _LOADED_VIEWS[id(spark)] = (spark, sf_dir)


def cpu_fanout(spark: SparkSession) -> int:
    """Partition count for CPU-dense derived-work stages: 2×cores —
    even waves without per-task-overhead inflation (measured sweep in
    BENCH.md r4; rationale in dedup.bands_chain_spark). Lives here so
    every operator module can use it without import cycles."""
    return max(2 * spark.sparkContext.defaultParallelism, 16)


def materialize(df: DataFrame, label: str = "intermediate") -> DataFrame:
    """Persisted intermediate for subtrees that feed multiple joins
    (LSH signature/shingle tables, IVF assignment rounds): without it
    Catalyst inlines the whole producing subtree into EVERY consumer.

    Default mode is ``localCheckpoint`` — right for local[N], but its
    blocks live in executor memory and die with the executors. Set
    ``PDF_INSPECTOR_PERSIST=parquet`` for the cluster-faithful path: the
    intermediate is WRITTEN and re-read, so it survives executor loss,
    is sized/co-located by the storage layer, and re-attaches to AQE as
    a fresh scan (on a real deployment this is a parquet/Iceberg table,
    not local disk). tests/test_plan_shape.py certifies both modes
    produce identical results on the guarded LSH pipeline."""
    import os
    import uuid
    if os.environ.get("PDF_INSPECTOR_PERSIST", "local") == "parquet":
        path = os.path.join(_materialize_root(),
                            f"pi_mat_{label}_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint()


_MAT_ROOT: list[str] = []


def _materialize_root() -> str:
    """One per-process parent dir for parquet-mode intermediates, removed
    at interpreter exit. Iterative callers (star contraction, IVF rounds,
    label propagation) write one dir per round per run; without cleanup
    repeated runs accumulate unbounded /tmp usage (ADVICE r3)."""
    import atexit
    import os
    import shutil
    import tempfile
    if not _MAT_ROOT:
        root = tempfile.mkdtemp(prefix="pi_mat_session_")
        _MAT_ROOT.append(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return _MAT_ROOT[0]


def all_operators() -> dict[str, Operator]:
    # Import side-effect registration on first use.
    from . import (conversation, dedup, extraction,  # noqa: F401
                   multimodal, relational, similarity, sketches,
                   streaming_ops, textstats, transcript_stats)
    return REGISTRY

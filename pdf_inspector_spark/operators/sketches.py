"""Deterministic sketches.

KMV (k-minimum-values) distinct-count sketch: hash every value with the
shared cross-engine 60-bit hash, keep the k smallest hashes; the
estimator is (k-1) * HASH_SPACE / kth_min. Unlike HLL implementations
(engine-specific registers), KMV over a SHARED deterministic hash gives
bit-identical sketches and estimates in Spark and DuckDB — so an
approximate operator can still sit under the exact-match oracle gate.

Mergeability (the property that matters at 10^12 rows): the k smallest
of a union is computable from per-partition k-smallest sets, which is
exactly what a TopK/sort-limit aggregation does — no full shuffle of
distinct values.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import load_views, register
from .textstats import DUCK_H64, SPARK_H64

K = 64
HASH_SPACE = 1 << 60  # md5 15-hex-digit prefix


def _sql(query: str):
    def run(spark: SparkSession, sf_dir: str):
        load_views(spark, sf_dir)
        return spark.sql(query)
    return run


# The k-min set is taken with ORDER BY h LIMIT k — Spark plans this as
# TakeOrderedAndProject (per-partition top-k, merged on the driver), NOT a
# single-partition global window. At 10^12 rows every partition emits at
# most k hashes; the old ROW_NUMBER() OVER (ORDER BY h) formulation forced
# all distinct hashes through one partition.
_KMV_SPARK = f"""
WITH hashed AS (
  SELECT DISTINCT {SPARK_H64.format(x='cast(o_custkey AS STRING)')} AS h
  FROM orders
),
kmin AS (
  SELECT h FROM hashed ORDER BY h LIMIT {K}
)
SELECT {K} AS k,
       MAX(h) AS kth_min_hash,
       CAST(FLOOR(({K} - 1) * CAST({HASH_SPACE} AS DOUBLE) / MAX(h)) AS BIGINT)
         AS estimated_distinct,
       (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS exact_distinct
FROM kmin
"""

_KMV_DUCK = f"""
WITH hashed AS (
  SELECT DISTINCT {DUCK_H64.format(x='o_custkey::VARCHAR')} AS h
  FROM orders
),
kmin AS (
  SELECT h FROM hashed ORDER BY h LIMIT {K}
)
SELECT {K} AS k,
       MAX(h) AS kth_min_hash,
       CAST(FLOOR(({K} - 1) * {HASH_SPACE}::DOUBLE / MAX(h)) AS BIGINT)
         AS estimated_distinct,
       (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS exact_distinct
FROM kmin
"""

register("sketch_kmv_distinct", _sql(_KMV_SPARK), _KMV_DUCK,
         "KMV distinct-count sketch over a shared deterministic hash — "
         "approximate yet bit-identical across engines (mergeable k-min sets)")

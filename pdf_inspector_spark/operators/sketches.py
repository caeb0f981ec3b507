"""Deterministic sketches.

Public-literature lineage: KMV distinct-count sketches (Bar-Yossef et
al. 2002, "Counting distinct elements in a data stream"); mergeable
summaries (Agarwal et al. 2012, PODS).

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


# -- mergeable histogram-quantile sketch -------------------------------------
# Fixed-width-bin histogram over order value: the classic mergeable
# quantile sketch (bin counts simply add across partitions/partial
# sketches — the map-side combine IS the merge). The only window runs
# over the AGGREGATED histogram (#bins bounded by the value domain /
# width, not by row count), so the plan stays scale-safe at 10^12 rows.
# Integer bin ids via FLOOR (double→bigint CAST rounds in DuckDB but
# truncates in Spark — FLOOR first makes both exact), integer cumulative
# comparisons (cc*100 >= total*P) so no float crosses the engine
# boundary.

_BIN_WIDTH = 100  # dollars per bin

# One gated query carries BOTH the sketch and its mergeability proof
# (folded from the r2 sketch_histogram_quantiles + sketch_histogram_merge
# pair so the registry fits the driver's 50-query gate window): build the
# histogram sketch independently on two disjoint halves of orders
# (o_orderkey parity — in production, two partitions/days/shards), merge
# by adding bin counts, and emit the merged quantiles NEXT TO the direct
# whole-table quantiles. The oracle (and the driver hash gate) then
# certifies merged == direct — the property that matters at 10^12 rows.

_HISTQ_MERGE = f"""
WITH h0 AS (
  SELECT CAST(FLOOR(o_totalprice / {_BIN_WIDTH}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
),
h1 AS (
  SELECT CAST(FLOOR(o_totalprice / {_BIN_WIDTH}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
),
merged AS (
  SELECT bin, CAST(SUM(c) AS BIGINT) AS c
  FROM (SELECT bin, c FROM h0 UNION ALL SELECT bin, c FROM h1) u
  GROUP BY bin
),
direct AS (
  SELECT CAST(FLOOR(o_totalprice / {_BIN_WIDTH}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM orders GROUP BY 1
),
q AS (
  SELECT 'merged' AS src, bin, c,
         CAST(SUM(c) OVER (PARTITION BY 'm' ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc,
         CAST(SUM(c) OVER (PARTITION BY 'm') AS BIGINT) AS total
  FROM merged
  UNION ALL
  SELECT 'direct' AS src, bin, c,
         CAST(SUM(c) OVER (PARTITION BY 'd' ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc,
         CAST(SUM(c) OVER (PARTITION BY 'd') AS BIGINT) AS total
  FROM direct
)
SELECT src,
       CAST(MAX(total) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       MIN(CASE WHEN cc * 100 >= total * 50 THEN bin END) * {_BIN_WIDTH}
         AS p50_lo,
       MIN(CASE WHEN cc * 100 >= total * 90 THEN bin END) * {_BIN_WIDTH}
         AS p90_lo,
       MIN(CASE WHEN cc * 100 >= total * 99 THEN bin END) * {_BIN_WIDTH}
         AS p99_lo
FROM q
GROUP BY src
ORDER BY src
"""

register("sketch_histogram_quantiles", _sql(_HISTQ_MERGE), _HISTQ_MERGE,
         "mergeable fixed-bin histogram sketch → p50/p90/p99 lower bounds "
         "(window only over the aggregated histogram, never raw rows) + "
         "mergeability proof: per-shard sketches merged by bin-count "
         "addition must equal the direct whole-table sketch (both rows "
         "under the hash gate)")

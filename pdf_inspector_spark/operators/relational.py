"""Classic relational operators (SURVEY.md §2.8 checklist): partial+final
hash aggregation, broadcast joins, window functions, session-window
clustering (the reference's gap-based line/row clustering idiom lifted to
SQL), top-k, and the checkpoint-style anti-join.

Money aggregates are summed as DECIMAL(18,2) — exact and associative, so
Spark's parallel partial aggregation and DuckDB's serial sum agree bit-
for-bit — then cast to double for a stable output schema.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from . import load_views, register


def _sql(query: str):
    def run(spark: SparkSession, sf_dir: str):
        load_views(spark, sf_dir)
        return spark.sql(query)
    return run


# -- pricing summary (hash agg with exact decimal sums) ---------------------

_Q1 = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

register("rel_pricing_summary", _sql(_Q1), _Q1,
         "TPC-H Q1-style partial+final hash aggregation over lineitem")


# -- broadcast dimension join (revenue per nation) --------------------------

_REVENUE_SQL = """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation
"""


def _revenue_spark(spark: SparkSession, sf_dir: str):
    load_views(spark, sf_dir)
    orders = spark.table("orders")
    customer = spark.table("customer")
    nation = spark.table("nation")
    # dims are small → broadcast: no shuffle of the fact table for the join
    joined = (orders
              .join(F.broadcast(customer),
                    orders.o_custkey == customer.c_custkey)
              .join(F.broadcast(nation),
                    customer.c_nationkey == nation.n_nationkey))
    return (joined.groupBy(F.col("n_name").alias("nation"))
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("revenue"),
                 F.count("*").alias("n_orders"))
            .orderBy("nation"))


register("rel_broadcast_join_revenue", _revenue_spark, _REVENUE_SQL,
         "orders⋈customer⋈nation with explicit broadcast of the dims")


# -- window top-k per group -------------------------------------------------

_TOPK = """
SELECT c_custkey, o_orderkey, rnk
FROM (
  SELECT c.c_custkey, o.o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
) t
WHERE rnk <= 3
ORDER BY c_custkey, rnk
"""

register("rel_window_topk_orders", _sql(_TOPK), _TOPK,
         "top-3 orders per customer via ROW_NUMBER window")


# -- session windows over events (gap-based clustering idiom) ---------------

_SESSIONS = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id,
       COUNT(DISTINCT session_id) AS n_sessions,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id
ORDER BY user_id
"""

_SESSIONS_DUCK = _SESSIONS.replace("INTERVAL 30 MINUTE", "INTERVAL 30 MINUTES")

register("rel_sessionize_events", _sql(_SESSIONS), _SESSIONS_DUCK,
         "session-window clustering: sum(when(gap>tol,1)) over window — the "
         "reference's line-clustering idiom (src/extractor.rs:2386-2431) in SQL")


# -- event-type rates per hour (time bucketing + pivot-style agg) -----------

# The hour bucket crosses the Spark↔DuckDB boundary as epoch seconds
# (BIGINT) — Spark TIMESTAMP is LTZ while DuckDB's is naive, so the raw
# timestamp representations hash differently even at identical instants.
# Conditional SUMs are cast to BIGINT (DuckDB SUM(int) → HUGEINT). The
# money sum accumulates in DECIMAL(18,2) — exact in both engines — but the
# FINAL column is CAST ... AS DOUBLE: DuckDB's pandas bridge renders a
# DECIMAL column as float64 (919.6) while Spark yields Decimal('919.60'),
# so a DECIMAL-typed final column can never hash-match under the driver
# gate (the r01/r02 failure). DECIMAL is fine as an internal accumulator,
# never as an output type — enforced repo-wide by tools/crosscheck.py.
_RATES = """
SELECT CAST(unix_seconds(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
ORDER BY hour_epoch
"""

_RATES_DUCK = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
ORDER BY hour_epoch
"""

register("rel_event_rates_hourly", _sql(_RATES), _RATES_DUCK,
         "time-bucketed aggregation with conditional counts")


# -- anti-join (checkpoint-resume idiom) ------------------------------------

_ANTI = """
SELECT c.c_custkey
FROM customer c
LEFT ANTI JOIN orders o ON o.o_custkey = c.c_custkey
ORDER BY c_custkey
"""

_ANTI_DUCK = """
SELECT c.c_custkey
FROM customer c
ANTI JOIN orders o ON o.o_custkey = c.c_custkey
ORDER BY c_custkey
"""

register("rel_anti_join_unmatched", _sql(_ANTI), _ANTI_DUCK,
         "anti-join — the lineage resume primitive (customers with no orders)")


# -- distinct + set op ------------------------------------------------------

_SETOP = """
SELECT p_brand, COUNT(DISTINCT p_type) AS n_types,
       MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""

register("rel_distinct_agg_part", _sql(_SETOP), _SETOP,
         "distinct aggregation over part")


# -- rollup (multi-level aggregation) ---------------------------------------

_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""

register("rel_rollup_lineitem", _sql(_ROLLUP), _ROLLUP,
         "ROLLUP multi-level aggregation (engine capability beyond the "
         "reference's per-document folds)")


# -- cube (all grouping combinations) ---------------------------------------

_CUBE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY orderstatus, orderpriority
"""

register("rel_cube_orders", _sql(_CUBE), _CUBE,
         "CUBE aggregation over orders (all grouping-set combinations)")


# -- as-of join idiom -------------------------------------------------------
# For every event, the timestamp of the user's most recent prior 'click'
# event — the as-of join expressed as a running window (no join at all;
# at scale this beats a range join because it's one sort per user).
# NOT registered with the driver gate (retired in r3 to fit the 50-query
# window — driver-green in r02); tests/test_retired_ops.py still
# crosschecks it against DuckDB every CI run.

ASOF_SQL = """
SELECT event_id, user_id, ts,
       MAX(CASE WHEN event_type = 'click' THEN ts END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         AS last_click_ts
FROM events
ORDER BY user_id, ts, event_id
"""

asof_spark = _sql(ASOF_SQL)


# -- exact median via window ranks (identical arithmetic both engines) ------

_MEDIAN = """
WITH ranked AS (
  SELECT o_custkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
  FROM orders
)
SELECT o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / COUNT(*) AS DOUBLE)
         AS median_price,
       MAX(cnt) AS n_orders
FROM ranked
WHERE rn IN (CAST(FLOOR((cnt + 1) / 2) AS BIGINT),
             CAST(FLOOR((cnt + 2) / 2) AS BIGINT))
GROUP BY o_custkey
ORDER BY o_custkey
"""

register("rel_median_order_value", _sql(_MEDIAN), _MEDIAN,
         "exact per-customer median via window ranks (engine-identical "
         "integer rank arithmetic, decimal averaging)")


# -- binned range join ------------------------------------------------------
# "errors within 10 minutes after a click, same user". A naive range join
# is O(n·m); binning both sides to 10-minute buckets turns it into an
# equi-join on (user, bin) ∪ (user, bin+1) + residual filter — the
# standard scale technique (bin width = range width ⇒ exactly 2 probes).

_RANGE_JOIN = """
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts,
         CAST(FLOOR(CAST(ts AS BIGINT) / 600) AS BIGINT) AS bin
  FROM events WHERE event_type = 'click'
),
errors AS (
  SELECT user_id, event_id AS error_id, ts AS error_ts,
         CAST(FLOOR(CAST(ts AS BIGINT) / 600) AS BIGINT) AS bin
  FROM events WHERE event_type = 'error'
),
probes AS (
  SELECT user_id, click_id, click_ts, bin FROM clicks
  UNION ALL
  SELECT user_id, click_id, click_ts, bin + 1 AS bin FROM clicks
)
SELECT p.user_id AS user_id, p.click_id, e.error_id,
       CAST(CAST(e.error_ts AS BIGINT) - CAST(p.click_ts AS BIGINT) AS BIGINT)
         AS lag_seconds
FROM probes p JOIN errors e
  ON e.user_id = p.user_id AND e.bin = p.bin
WHERE e.error_ts > p.click_ts
  AND CAST(e.error_ts AS BIGINT) - CAST(p.click_ts AS BIGINT) <= 600
ORDER BY user_id, click_id, error_id
"""

_RANGE_JOIN_DUCK = _RANGE_JOIN.replace("CAST(ts AS BIGINT)", "CAST(FLOOR(epoch(ts)) AS BIGINT)") \
    .replace("CAST(e.error_ts AS BIGINT)", "CAST(FLOOR(epoch(e.error_ts)) AS BIGINT)") \
    .replace("CAST(p.click_ts AS BIGINT)", "CAST(FLOOR(epoch(p.click_ts)) AS BIGINT)")

_RANGE_JOIN_SPARK = _RANGE_JOIN \
    .replace("CAST(ts AS BIGINT)", "CAST(CAST(ts AS TIMESTAMP) AS BIGINT)") \
    .replace("CAST(e.error_ts AS BIGINT)",
             "CAST(CAST(e.error_ts AS TIMESTAMP) AS BIGINT)") \
    .replace("CAST(p.click_ts AS BIGINT)",
             "CAST(CAST(p.click_ts AS TIMESTAMP) AS BIGINT)")

register("rel_range_join_binned", _sql(_RANGE_JOIN_SPARK), _RANGE_JOIN_DUCK,
         "range join via time binning: equi-join on (user, bin)+(user, bin+1) "
         "with residual filter — 2 probes instead of O(n·m)")

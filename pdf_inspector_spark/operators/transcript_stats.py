"""Analytics over the transcripts table itself (the north rule's input:
conv_id, turn_idx, role, text, tool, ts) — role/tool mix and per-
conversation temporal shape. Both engines read the SAME parquet
directory; timestamps cross the boundary as epoch seconds under the
UTC session pin (see operators.load_views rationale).

At 10^12 turns: role stats are a two-phase hash aggregate; gap stats are
a per-conversation window (partition-parallel — mega conversations bound
the partition, not the plan).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from . import register
from ..transcripts import DATA_DIR

_TPATH = os.path.join(DATA_DIR, "transcripts_t-small.parquet")


def _view(spark: SparkSession):
    from ..transcripts import write_transcripts
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = write_transcripts("t-small")
    spark.read.parquet(path).createOrReplaceTempView("transcripts")


_ROLE_SPARK = """
SELECT role,
       COUNT(*) AS n_turns,
       COUNT(DISTINCT conv_id) AS n_convs,
       COUNT(DISTINCT tool) AS n_tools,
       CAST(SUM(length(text)) AS BIGINT) AS total_payload_chars
FROM transcripts
GROUP BY role
ORDER BY role
"""


def _role_stats(spark: SparkSession, sf_dir: str):
    _view(spark)
    return spark.sql(_ROLE_SPARK)


_ROLE_DUCK = f"""
SELECT role,
       COUNT(*) AS n_turns,
       COUNT(DISTINCT conv_id) AS n_convs,
       COUNT(DISTINCT tool) AS n_tools,
       CAST(SUM(length(text)) AS BIGINT) AS total_payload_chars
FROM read_parquet('{_TPATH}/*.parquet')
GROUP BY role
ORDER BY role
"""

register("conv_role_stats", _role_stats, _ROLE_DUCK,
         "role/tool mix over the transcripts table (two-phase hash agg)")


# Per-conversation temporal shape (span + inter-turn gaps, epoch BIGINT,
# partition-parallel window). NOT separately registered since r3: the gap
# columns ride on conv_assemble_docs (same per-conversation grain, one
# gated query — keeps the registry inside the driver's 50-query window).
# conversation.py embeds GAPS_DUCK_BODY (the un-ordered body below) as a
# subquery and runs GAPS_SPARK_SQL on the Spark side.

_GAPS_SPARK = """
WITH g AS (
  SELECT conv_id, turn_idx,
         unix_seconds(CAST(ts AS TIMESTAMP)) AS es,
         LAG(unix_seconds(CAST(ts AS TIMESTAMP)))
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_es
  FROM transcripts
)
SELECT conv_id,
       COUNT(*) AS n_turns,
       CAST(MAX(es) - MIN(es) AS BIGINT) AS span_sec,
       CAST(MAX(es - prev_es) AS BIGINT) AS max_gap_sec,
       CAST(MIN(es - prev_es) AS BIGINT) AS min_gap_sec
FROM g
GROUP BY conv_id
ORDER BY conv_id
"""


def _turn_gaps(spark: SparkSession, sf_dir: str):
    _view(spark)
    return spark.sql(_GAPS_SPARK)


# Body (no trailing ORDER BY) exported separately so callers embedding
# it as a subquery (conversation.py) never have to rewrite SQL text —
# the r3 call site did .replace("ORDER BY conv_id", ""), which silently
# corrupts any future window spec containing that string (ADVICE r3).
_GAPS_DUCK_BODY = f"""
WITH g AS (
  SELECT conv_id, turn_idx,
         CAST(epoch(ts) AS BIGINT) AS es,
         LAG(CAST(epoch(ts) AS BIGINT))
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_es
  FROM read_parquet('{_TPATH}/*.parquet')
)
SELECT conv_id,
       COUNT(*) AS n_turns,
       CAST(MAX(es) - MIN(es) AS BIGINT) AS span_sec,
       CAST(MAX(es - prev_es) AS BIGINT) AS max_gap_sec,
       CAST(MIN(es - prev_es) AS BIGINT) AS min_gap_sec
FROM g
GROUP BY conv_id
"""

_GAPS_DUCK = _GAPS_DUCK_BODY + "ORDER BY conv_id\n"

GAPS_SPARK_SQL = _GAPS_SPARK
GAPS_DUCK_SQL = _GAPS_DUCK
GAPS_DUCK_BODY = _GAPS_DUCK_BODY
turn_gaps_spark = _turn_gaps
ensure_transcripts_view = _view

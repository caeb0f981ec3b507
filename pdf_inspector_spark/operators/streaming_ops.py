"""Structured-Streaming operators under the driver's oracle gate.

Round 1 exercised streaming only through e2e tests; these entries run
REAL streaming queries (file source → aggregation → memory sink,
Trigger.AvailableNow) whose final state is deterministic and therefore
hash-comparable against a batch DuckDB oracle. AvailableNow processes
the source to completion in bounded micro-batches and stops — the same
code path an always-on ingest uses, minus the waiting.

At 10^12-turn scale the same topology runs continuously: file/Iceberg
stream source, watermarked windows bounding state, sink swapped for a
table; see streaming.py for the watermark/state/foreachBatch surfaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from . import register

_SEQ = [0]


def _run_available_now(stream_df, name_prefix: str, spark: SparkSession):
    """Run a streaming aggregation to completion into a memory sink and
    return the final table. Unique sink name per invocation (memory-sink
    query names are session-global).

    r7: the stateful aggregation is run with a state-cardinality-sized
    shuffle-partition count instead of the session's batch default.
    Every state store instance costs per-micro-batch setup, and these
    aggregations have intrinsically SMALL state (distinct sources;
    time-bounded hourly windows — ~8.8k rows/year even at 10^12
    events), so 64 batch-sized partitions were pure state-store
    overhead: measured 1.62 s → 0.76 s at sf0.1 with 8. Overridable for
    deployments with genuinely wide state via
    PDF_INSPECTOR_STREAM_STATE_PARTITIONS. The session conf is restored
    after the bounded run, so batch queries are unaffected."""
    import os
    _SEQ[0] += 1
    name = f"{name_prefix}_{_SEQ[0]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    state_parts = os.environ.get("PDF_INSPECTOR_STREAM_STATE_PARTITIONS", "8")
    spark.conf.set("spark.sql.shuffle.partitions", state_parts)
    try:
        q = (stream_df.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def _stream_source_counts(spark: SparkSession, sf_dir: str):
    """File-source stream over the documents table → per-source counts."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The file source requires a DIRECTORY: stream the sf dir with a
    # glob filter selecting just this table's file.
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    sdf = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "documents.parquet").parquet(sf_dir))
    agg = sdf.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (_run_available_now(agg, "stream_source_counts", spark)
            .orderBy("source"))


_SOURCE_COUNTS_DUCK = """
SELECT source, COUNT(*) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
"""

register("stream_source_counts", _stream_source_counts, _SOURCE_COUNTS_DUCK,
         "Structured Streaming file source → grouped count → memory sink "
         "(Trigger.AvailableNow); final state vs batch oracle")


def _stream_event_windows(spark: SparkSession, sf_dir: str):
    """Watermarked 1-hour tumbling-window event counts as a stream; the
    bounded run emits every window, so the final complete-mode state
    equals the batch truth. Window boundary crosses the engine boundary
    as epoch seconds (BIGINT)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # oracle contract
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    sdf = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    # parquet ts is TIMESTAMP_NTZ; watermarks need LTZ (session tz = UTC)
    sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (sdf.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count("*").alias("n_events"),
                F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
                .cast("long").alias("n_errors")))
    out = _run_available_now(agg, "stream_event_windows", spark)
    return (out.select(F.unix_timestamp(F.col("w.start")).cast("long")
                       .alias("hour_epoch"),
                       "n_events", "n_errors")
            .orderBy("hour_epoch"))


_EVENT_WINDOWS_DUCK = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors
FROM events
GROUP BY 1
ORDER BY hour_epoch
"""

register("stream_event_windows", _stream_event_windows, _EVENT_WINDOWS_DUCK,
         "Structured Streaming watermarked 1-hour tumbling windows "
         "(AvailableNow) — final state vs batch time-bucket oracle")

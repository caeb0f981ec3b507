"""Structured Streaming variant of the pipeline.

The reference is a batch library (no streaming semantics); this module is
the engine's forward-looking ingestion path: the SAME fused UDF stage runs
under ``readStream`` → ``writeStream``, so batch and streaming share one
code path (SURVEY.md §2.8 notes streaming as engine-level capability).

- ``stream_pipeline``: file-source stream over a transcripts directory →
  extraction → parquet sink with checkpointing (exactly-once per file via
  the source's file tracking; ``Trigger.AvailableNow`` drains the backlog
  and stops — the batch-parity mode used by tests).
- ``stream_type_rates``: watermarked sliding-window aggregation of
  classification outcomes by event time (`ts`) — late turns beyond the
  watermark are dropped, demonstrating late-data semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def read_transcripts_stream(spark: SparkSession, input_dir: str,
                            max_files_per_trigger: int = 16) -> DataFrame:
    return (spark.readStream
            .schema(TRANSCRIPTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def stream_pipeline(spark: SparkSession, input_dir: str, output_dir: str,
                    checkpoint_dir: str, *, with_markdown: bool = False,
                    await_termination: bool = True):
    """Continuous extraction: stream in, classify+extract, parquet out."""
    from .pipeline import run_pipeline
    stream = read_transcripts_stream(spark, input_dir)
    result = run_pipeline(stream, with_markdown=with_markdown)
    query = (result.writeStream
             .format("parquet")
             .option("path", output_dir)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .outputMode("append")
             .start())
    if await_termination:
        query.awaitTermination()
    return query


def stream_type_rates(spark: SparkSession, input_dir: str, output_dir: str,
                      checkpoint_dir: str, *,
                      window: str = "1 hour", watermark: str = "2 hours",
                      await_termination: bool = True):
    """Watermarked windowed aggregation: classification counts per
    event-time window. Uses the classification stage only (cheap)."""
    from .pipeline import with_classification
    stream = read_transcripts_stream(spark, input_dir)
    classified = with_classification(stream)
    agg = (classified
           .withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"),
                    F.col("cls.pdf_type").alias("pdf_type"))
           .agg(F.count("*").alias("n_turns"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "pdf_type", "n_turns"))
    query = (agg.writeStream
             .format("parquet")
             .option("path", output_dir)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .outputMode("append")
             .start())
    if await_termination:
        query.awaitTermination()
    return query

"""Checkpoint / lineage / idempotent resume (north-rule requirement).

Design (SURVEY.md §1.3): the input keyspace is split into ``num_buckets``
deterministic buckets via ``pmod(xxhash64(conv_id, turn_idx), K)``; buckets
are processed in *waves* (a few buckets per Spark job). After each wave's
output lands, one lineage row per bucket is appended:

    lineage(run_id, bucket, rows_in, rows_out, rows_quarantined,
            turns_per_sec, completed_at)

Resume = anti-join the input against completed (run_id, bucket) pairs: a
killed run re-executes only unfinished waves, and the bucket-partitioned
parquet output (dynamic partition overwrite) makes re-execution
idempotent — rerunning a half-written wave replaces its partitions.

The reference has no equivalent (single-process library); this layer is
what makes the pipeline restartable at 10^12-turn scale.

Scale note: locally each wave re-scans the input and filters on the
computed bucket column (no pushdown for a derived hash). On a real
deployment the input table should be PARTITIONED OR BUCKETED on the same
``pmod(xxhash64(conv_id, turn_idx), K)`` expression (Iceberg bucket
transform / Spark bucketBy), which turns the wave filter into partition
pruning and removes the re-scan amplification.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

from .pipeline import run_pipeline, salt_column

LINEAGE_SCHEMA = ("run_id string, bucket int, rows_in long, rows_out long, "
                  "rows_quarantined long, turns_per_sec double, completed_at timestamp")


def lineage_path(output_dir: str) -> str:
    return os.path.join(output_dir, "_lineage")


def read_completed_buckets(spark: SparkSession, output_dir: str,
                           run_id: str) -> set[int]:
    path = lineage_path(output_dir)
    try:
        lineage = spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — first run: no lineage yet
        return set()
    rows = (lineage.where(F.col("run_id") == run_id)
            .select("bucket").distinct().collect())
    return {r["bucket"] for r in rows}


def run_with_checkpoint(spark: SparkSession, input_path: str, output_dir: str,
                        run_id: str, *, num_buckets: int = 16,
                        buckets_per_wave: int = 4,
                        with_markdown: bool = True,
                        salt_buckets: int | None = None,
                        fail_after_waves: int | None = None) -> dict:
    """Run the pipeline bucket-wave by bucket-wave with lineage commits.

    ``fail_after_waves`` injects a crash after N waves (for resume tests).
    Returns run metrics. Safe to call again with the same run_id after a
    crash: completed buckets are skipped via the lineage anti-join.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df = spark.read.parquet(input_path)
    df = df.withColumn("bucket", salt_column(num_buckets).cast("int"))

    completed = read_completed_buckets(spark, output_dir, run_id)
    todo = [b for b in range(num_buckets) if b not in completed]
    out_path = os.path.join(output_dir, "turns")

    waves = [todo[i:i + buckets_per_wave]
             for i in range(0, len(todo), buckets_per_wave)]
    total_rows = 0
    for wave_idx, wave in enumerate(waves):
        if fail_after_waves is not None and wave_idx >= fail_after_waves:
            raise RuntimeError(f"injected failure before wave {wave_idx}")
        t0 = time.monotonic()
        # Input-side per-bucket counts ride the write pass as observed
        # metrics (one conditional count per bucket in the wave — the
        # wave list is small and known here), keeping their semantics
        # (rows ENTERING the pipeline, so row loss inside the kernel
        # stage remains detectable against the landed counts) while
        # dropping the separate input re-scan per wave. Safe because
        # run_pipeline is a fused single-branch plan: the observed
        # node executes exactly once per row.
        obs = Observation()
        wave_df = df.where(F.col("bucket").isin(wave)).observe(
            obs, *[F.sum((F.col("bucket") == b).cast("long"))
                   .alias(f"b{b}") for b in wave])
        result = run_pipeline(wave_df, with_markdown=with_markdown,
                              salt_buckets=salt_buckets)
        # ONE compute pass lands both sinks: quarantine routing is a
        # partition column, so good/quarantine are directory subtrees of
        # a single write (no second pipeline execution).
        (result.withColumn("quarantined", F.col("error_kind").isNotNull())
         .write.mode("overwrite").partitionBy("quarantined", "bucket")
         .parquet(out_path))
        elapsed = time.monotonic() - t0
        observed = obs.get
        in_counts = {b: int(observed[f"b{b}"] or 0) for b in wave}

        # lineage rows: per-bucket counts from the landed output
        landed = (spark.read.parquet(out_path)
                  .where(F.col("bucket").isin(wave)))
        # partition columns come back as strings → normalize to bool
        counts = {(r["bucket"], str(r["quarantined"]).lower() == "true"): r["n"]
                  for r in landed.groupBy("bucket", "quarantined")
                  .agg(F.count("*").alias("n")).collect()}
        out_counts = {b: counts.get((b, False), 0) for b in wave}
        q_counts = {b: counts.get((b, True), 0) for b in wave}
        # Trust-but-verify: when salt_buckets routes the plan through a
        # repartition, the metrics node sits in a shuffle-map stage and
        # a resubmitted map task can double-apply its accumulator
        # updates (result-stage exactly-once does not cover map stages).
        # The landed counts come from committed files (exact), so any
        # per-bucket imbalance — inflation OR real row loss — triggers
        # one exact input recount, keeping the recorded rows_in exact
        # and the row-loss detector meaningful. Common path: no extra
        # job.
        if any(in_counts.get(b, 0) != out_counts[b] + q_counts[b]
               for b in wave):
            in_counts = {r["bucket"]: r["n"] for r in
                         wave_df.groupBy("bucket")
                         .agg(F.count("*").alias("n")).collect()}
        wave_rows = sum(in_counts.values())
        total_rows += wave_rows
        tps = wave_rows / elapsed if elapsed > 0 else 0.0
        lineage_rows = [(run_id, b, in_counts.get(b, 0), out_counts.get(b, 0),
                         q_counts.get(b, 0), tps) for b in wave]
        (spark.createDataFrame(lineage_rows,
                               "run_id string, bucket int, rows_in long, "
                               "rows_out long, rows_quarantined long, "
                               "turns_per_sec double")
         .withColumn("completed_at", F.current_timestamp())
         .write.mode("append").parquet(lineage_path(output_dir)))

    return {"run_id": run_id, "buckets_total": num_buckets,
            "buckets_skipped": len(completed), "rows_processed": total_rows}


def read_turns(spark: SparkSession, output_dir: str) -> DataFrame:
    """The good-rows sink (quarantined=false partition subtree; the
    partition column round-trips as string)."""
    return (spark.read.parquet(os.path.join(output_dir, "turns"))
            .where(F.col("quarantined").cast("string") == "false"))


def read_quarantine(spark: SparkSession, output_dir: str) -> DataFrame:
    return (spark.read.parquet(os.path.join(output_dir, "turns"))
            .where(F.col("quarantined").cast("string") == "true"))

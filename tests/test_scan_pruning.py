"""Scan-efficiency contracts: predicate pushdown, column pruning and
partition pruning must reach the parquet scan (SURVEY.md §4 — these are
free via Catalyst ONLY if the plan stays declarative; these tests pin
that the pipeline's plan shape preserves them)."""

import os

import pyspark.sql.functions as F

from pdf_inspector_spark.kernels.pipeline import process_pdf_mem
from pdf_inspector_spark.transcripts import write_transcripts


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_metrics(df) -> dict:
    """Execute the frame and return the parquet scan's SQL metrics
    (numFiles, numPartitions, numOutputRows, …) — the physical proof
    that partition pruning happened, not just that the plan printed a
    PartitionFilters clause."""
    df.collect()

    found: dict = {}

    def walk(node):
        cls = node.getClass().getName()
        if "FileSourceScan" in cls and not found:
            m = node.metrics()
            it = m.keys().iterator()
            while it.hasNext():
                k = it.next()
                found[k] = m.apply(k).value()
            return
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if "AdaptiveSparkPlan" in cls:
            walk(node.executedPlan())

    walk(df._jdf.queryExecution().executedPlan())
    assert found, "no parquet scan node in the executed plan"
    return found


def test_predicate_pushdown_reaches_scan(spark, tsmall_path):
    df = spark.read.parquet(tsmall_path)
    plan = _plan(df.where(F.col("conv_id") == "conv-000003"))
    assert "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id,conv-000003)]" in plan


def test_column_pruning_excludes_payload(spark, tsmall_path):
    """Metadata-only queries must not read the payload column — the
    engine analog of the reference's metadata-only load
    (src/detector.rs:76)."""
    df = spark.read.parquet(tsmall_path)
    plan = _plan(df.groupBy("role").count())
    assert "ReadSchema: struct<role:string>" in plan, plan


def test_partition_pruning_on_date_layout(spark, tsmall_path, tmp_path):
    """Writing the sink partitioned by event time gives manifest-style
    partition pruning on time-range queries (the Iceberg-layout analog
    on plain parquet)."""
    out = str(tmp_path / "by_hour")
    df = spark.read.parquet(tsmall_path)
    (df.withColumn("hour", F.hour("ts"))
       .write.partitionBy("hour").parquet(out))
    read = spark.read.parquet(out)
    hours = [r["hour"] for r in read.select("hour").distinct().collect()]
    assert len(hours) > 1, "need several hour partitions for the test"
    pruned = read.where(F.col("hour") == sorted(hours)[0])
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    n_dirs = len([d for d in os.listdir(out) if d.startswith("hour=")])
    assert pruned.count() < df.count()
    assert n_dirs == len(hours)


def test_partition_pruning_on_conv_bucket_layout(spark):
    """The Iceberg bucket-transform analog (SURVEY.md §4 scan row): the
    transcripts table written hive-partitioned by the derived conv_bucket
    key must prune a conversation-keyed read to ONE partition at
    planning time — asserted on the scan's numFiles/numPartitions
    metrics, not just the PartitionFilters string."""
    from pdf_inspector_spark.transcripts import (conv_bucket,
                                                 write_transcripts_partitioned)
    buckets = 8
    path = write_transcripts_partitioned("t-small", buckets=buckets)
    read = spark.read.parquet(path)
    target_conv = "conv-000003"
    b = conv_bucket(target_conv, buckets)
    pruned = read.where(F.col("conv_bucket") == b)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "conv_bucket" in plan

    full_m = _scan_metrics(read)
    pruned_m = _scan_metrics(pruned)
    assert full_m["numPartitions"] == buckets
    assert pruned_m["numPartitions"] == 1          # one bucket touched
    assert 0 < pruned_m["numFiles"] < full_m["numFiles"]
    assert pruned_m["filesSize"] < full_m["filesSize"]  # less I/O, planned

    # the keyed query is complete and correct within its bucket
    keyed = pruned.where(F.col("conv_id") == target_conv)
    flat = spark.read.parquet(write_transcripts("t-small"))
    assert (keyed.count()
            == flat.where(F.col("conv_id") == target_conv).count() > 0)
    # every conversation's rows live in exactly the derived bucket
    placed = (read.select("conv_id", "conv_bucket").distinct().collect())
    assert all(r["conv_bucket"] == conv_bucket(r["conv_id"], buckets)
               for r in placed)


def test_encrypted_pdf_routes_to_quarantine():
    """Encrypted documents produce an error row (the reference's
    PdfError::Encrypted, src/lib.rs:141) — never a raise."""
    from pdf_inspector_spark.corpus import (_HELV_FONT, _catalog_and_pages,
                                            _stream_obj, build_pdf)
    objs = _catalog_and_pages([3])
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
               b"/Resources << /Font << /F1 5 0 R >> >> >>")
    objs[4] = _stream_obj(b"<< >>", b"BT /F1 12 Tf 72 700 Td (secret) Tj ET")
    objs[5] = _HELV_FONT
    objs[6] = b"<< /Filter /Standard /V 2 /R 3 /O (x) /U (y) /P -44 >>"
    pdf = build_pdf(objs).replace(b"/Root 1 0 R",
                                  b"/Root 1 0 R /Encrypt 6 0 R")
    r = process_pdf_mem(pdf)
    assert r["error_kind"] == "ValueError"
    assert "encrypted" in r["error_msg"]
    assert r["pdf_type"] is None

"""Structured Streaming parity tests: the streaming pipeline over a file
source must produce the same per-turn results as the batch pipeline, and
resume incrementally when new files arrive."""

import os
import shutil

import pyspark.sql.functions as F

from pdf_inspector_spark.streaming import stream_pipeline
from pdf_inspector_spark.transcripts import expected_turns


def test_stream_matches_batch_and_resumes(spark, tsmall_path, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(tsmall_path) if f.endswith(".parquet"))
    assert parts, "t-small table should have part files"

    # Batch 1: first file arrives
    shutil.copy(os.path.join(tsmall_path, parts[0]), src)
    stream_pipeline(spark, src, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # Batch 2: rerun with no new files → no duplicates (file tracking)
    stream_pipeline(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # Batch 3: remaining files arrive → incremental processing
    for p in parts[1:]:
        shutil.copy(os.path.join(tsmall_path, p), src)
    stream_pipeline(spark, src, out, ckpt)

    result = spark.read.parquet(out)
    expected = expected_turns("t-small")
    assert result.count() == len(expected)
    assert result.select("conv_id", "turn_idx").distinct().count() == len(expected)

    # Per-turn text equality — same contract as the batch path
    rows = {(r["conv_id"], r["turn_idx"]): r["text_out"]
            for r in result.collect()}
    for e in expected:
        assert rows[(e["conv_id"], e["turn_idx"])] == e["text"], \
            f"stream/batch divergence at {e['conv_id']}:{e['turn_idx']}"


def test_stream_windowed_rates(spark, tsmall_path, tmp_path):
    """Append-mode windowed agg emits a window only once the watermark
    passes it; a heartbeat row with a far-future event time advances the
    watermark and flushes the tail windows."""
    import shutil

    from pdf_inspector_spark.streaming import stream_type_rates
    src = str(tmp_path / "rates_src")
    out = str(tmp_path / "rates")
    ckpt = str(tmp_path / "rates_ckpt")
    shutil.copytree(tsmall_path, src)
    stream_type_rates(spark, src, out, ckpt)

    # heartbeat: one row far past every open window → watermark advances
    hb = spark.createDataFrame(
        [("hb", 0, "user", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string"
    ).select("*", F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"))
    hb.write.mode("append").parquet(src)
    stream_type_rates(spark, src, out, ckpt)

    rates = spark.read.parquet(out)
    total = (rates.where(F.col("window_start") < "2029-01-01")
             .agg(F.sum("n_turns")).collect()[0][0])
    assert total == len(expected_turns("t-small"))
    assert rates.where(F.col("pdf_type") == "scanned").count() > 0


def test_stream_stateful_conversation_progress(spark, tsmall_path):
    """applyInPandasWithState: the final per-conversation ledger must
    equal batch ground truth (state accumulated across input files)."""
    from pdf_inspector_spark.streaming import stream_conversation_progress
    stream_conversation_progress(spark, tsmall_path, query_name="cp_test")
    rows = spark.sql("select * from cp_test").collect()
    # update-mode memory sink may emit a row per trigger; keep the last
    # (max turns_seen) per conversation
    final = {}
    for r in rows:
        cur = final.get(r["conv_id"])
        if cur is None or r["turns_seen"] > cur["turns_seen"]:
            final[r["conv_id"]] = r
    expected = {}
    for e in expected_turns("t-small"):
        s = expected.setdefault(e["conv_id"],
                                {"seen": 0, "ext": 0, "chars": 0, "max": -1})
        s["seen"] += 1
        if e["text"] is not None:
            s["ext"] += 1
            s["chars"] += len(e["text"])
        s["max"] = max(s["max"], e["turn_idx"])
    assert set(final) == set(expected)
    for conv_id, s in expected.items():
        f = final[conv_id]
        assert f["turns_seen"] == s["seen"], conv_id
        assert f["turns_extracted"] == s["ext"], conv_id
        assert f["chars_extracted"] == s["chars"], conv_id
        assert f["max_turn_idx"] == s["max"], conv_id


def test_stream_pipeline_with_lineage(spark, tsmall_path, tmp_path):
    """foreachBatch sink: idempotent batch landing + lineage rows with
    counts; rerun with no new data adds nothing."""
    import os
    import shutil

    from pdf_inspector_spark.streaming import stream_pipeline_with_lineage
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(tsmall_path) if f.endswith(".parquet"))
    shutil.copy(os.path.join(tsmall_path, parts[0]), src)
    stream_pipeline_with_lineage(spark, src, out, ckpt, run_id="s1")
    turns = spark.read.parquet(os.path.join(out, "turns"))
    n1 = turns.count()
    assert n1 > 0

    # no new data → no growth, no new lineage rows
    stream_pipeline_with_lineage(spark, src, out, ckpt, run_id="s1")
    assert spark.read.parquet(os.path.join(out, "turns")).count() == n1
    lineage1 = spark.read.parquet(os.path.join(out, "_lineage"))
    assert lineage1.count() >= 1

    # remaining files → full coverage, lineage counts add up
    for p in parts[1:]:
        shutil.copy(os.path.join(tsmall_path, p), src)
    stream_pipeline_with_lineage(spark, src, out, ckpt, run_id="s1")
    expected = expected_turns("t-small")
    turns = spark.read.parquet(os.path.join(out, "turns"))
    assert turns.count() == len(expected)
    assert turns.select("conv_id", "turn_idx").distinct().count() == len(expected)
    lineage = spark.read.parquet(os.path.join(out, "_lineage"))
    total = lineage.agg(F.sum("rows_in")).collect()[0][0]
    assert total == len(expected)
    n_bad = sum(1 for e in expected if e["error_kind"] is not None)
    assert lineage.agg(F.sum("rows_quarantined")).collect()[0][0] == n_bad

"""t-med correctness sweep (FIXTURES.md §1: 500 convs / ~10k turns):
full-pipeline per-turn byte equality at a scale where every corpus
payload appears hundreds of times and the salted plan actually spreads
mega conversations."""

import pyspark.sql.functions as F

from pdf_inspector_spark.pipeline import run_pipeline
from pdf_inspector_spark.transcripts import expected_turns, write_transcripts


def test_tmed_per_turn_text_equality(spark):
    path = write_transcripts("t-med")
    df = spark.read.parquet(path)
    result = run_pipeline(df, with_markdown=False, salt_buckets=16)
    rows = {(r["conv_id"], r["turn_idx"]): (r["text_out"], r["pdf_type"])
            for r in result.select("conv_id", "turn_idx", "text_out",
                                   "pdf_type").collect()}
    expected = expected_turns("t-med")
    assert len(rows) == len(expected)
    mismatch = 0
    for e in expected:
        text, pdf_type = rows[(e["conv_id"], e["turn_idx"])]
        if text != e["text"] or pdf_type != e["pdf_type"]:
            mismatch += 1
    assert mismatch == 0, f"{mismatch}/{len(expected)} turns diverge"

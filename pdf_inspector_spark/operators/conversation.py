"""Conversation-level assembly: grouped-map (applyInPandas) over
conv_id — the per-conversation reduction the reference cannot express
(single-document library; SURVEY.md §2.8 grouped-map note).

Assembles each conversation's extracted turn texts, in turn order, into
one document string plus summary stats. The shuffle moves only derived
columns (payloads were dropped by the pipeline stage); the group key is
conv_id, so the mega-conversation skew is bounded by derived-column
sizes, not payload sizes.

Oracle: DuckDB string_agg over the kernel-fixture parquet.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import SparkSession

from . import register

# NOTE: `.extraction` is imported lazily inside the functions below.
# `_assemble_group` is pickled to executors by applyInPandas; a module-
# level import would run extraction's fixture registration ON EXECUTORS
# (inside the shipped zip, where the data dir doesn't exist).

ASSEMBLY_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns", T.IntegerType()),
    T.StructField("n_extracted", T.IntegerType()),
    T.StructField("doc_chars", T.IntegerType()),
    T.StructField("doc", T.StringType()),
])


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    texts = [t for t in pdf["text_out"] if t is not None and t != ""]
    doc = "\n\n".join(texts)
    return pd.DataFrame([{
        "conv_id": pdf["conv_id"].iloc[0],
        "n_turns": len(pdf),
        "n_extracted": len(texts),
        "doc_chars": len(doc),
        "doc": doc,
    }])


def _assemble(spark: SparkSession, sf_dir: str):
    # Assembly (grouped-map) + per-conversation temporal shape (window)
    # in one gated query — both are per-conv grain, so the gap columns
    # from transcript_stats join on conv_id without an extra capability
    # losing its hard-signal row (r3 registry consolidation).
    from .extraction import _pipeline_result
    from .transcript_stats import GAPS_SPARK_SQL, ensure_transcripts_view
    result = _pipeline_result(spark)
    assembled = (result.select("conv_id", "turn_idx", "text_out")
                 .groupBy("conv_id")
                 .applyInPandas(_assemble_group, ASSEMBLY_SCHEMA))
    ensure_transcripts_view(spark)
    gaps = (spark.sql(GAPS_SPARK_SQL)
            .select("conv_id", "span_sec", "max_gap_sec", "min_gap_sec"))
    return assembled.join(gaps, "conv_id").orderBy("conv_id")


def _register() -> None:
    # Pure registration (no filesystem writes) — runs on executor import.
    from .extraction import EXPECTED_PATH
    from .transcript_stats import GAPS_DUCK_BODY
    gaps_body = GAPS_DUCK_BODY
    register("conv_assemble_docs", _assemble, f"""
        WITH asm AS (
          SELECT conv_id,
                 COUNT(*)::INT AS n_turns,
                 COUNT(CASE WHEN text IS NOT NULL AND text <> '' THEN 1 END)::INT
                   AS n_extracted,
                 length(COALESCE(string_agg(text, chr(10) || chr(10) ORDER BY turn_idx)
                   FILTER (WHERE text IS NOT NULL AND text <> ''), ''))::INT AS doc_chars,
                 COALESCE(string_agg(text, chr(10) || chr(10) ORDER BY turn_idx)
                   FILTER (WHERE text IS NOT NULL AND text <> ''), '') AS doc
          FROM read_parquet('{EXPECTED_PATH}')
          GROUP BY conv_id
        ),
        gaps AS ({gaps_body})
        SELECT asm.conv_id, asm.n_turns, asm.n_extracted, asm.doc_chars,
               asm.doc, gaps.span_sec, gaps.max_gap_sec, gaps.min_gap_sec
        FROM asm JOIN gaps ON gaps.conv_id = asm.conv_id
        ORDER BY asm.conv_id
    """, "grouped-map conversation assembly (applyInPandas) + per-conv "
         "temporal shape (span/gap window) in stable turn order")


_register()

"""Skew experiment: why the pipeline salts on (conv_id, turn_idx).

Compares two physically different plans for the same extraction work on
the skewed t-bench table (1% mega conversations own ~29% of turns):

A. conversation-grouped: groupBy(conv_id).applyInPandas extracting every
   payload of a conversation in one task — the "natural" formulation,
   which makes each mega conversation a straggler task;
   (both plans run cache-bypassed so the comparison stays kernel-bound)
B. salted turn-level (the engine's plan): repartition on
   pmod(xxhash64(conv_id, turn_idx), K) then the fused per-row UDF.

Usage: python tools/skew_bench.py [cpus] [scale]
Prints one JSON line with both wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
import pyspark.sql.types as T  # noqa: E402


GROUP_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text_out", T.StringType()),
])


def _extract_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from pdf_inspector_spark.kernels.pipeline import process_pdf_mem
    rows = []
    for r in pdf.itertuples(index=False):
        res = process_pdf_mem(r.text.encode("latin-1"), with_markdown=True,
                              use_cache=False)
        rows.append({"conv_id": r.conv_id, "turn_idx": r.turn_idx,
                     "text_out": res["text"]})
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text_out"])


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    scale = sys.argv[2] if len(sys.argv) > 2 else "t-bench"

    from pdf_inspector_spark.pipeline import run_pipeline
    from pdf_inspector_spark.session import get_spark
    from pdf_inspector_spark.transcripts import write_transcripts

    tpath = write_transcripts(scale)
    spark = get_spark("skew-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(tpath)
    n = df.count()

    # A: conversation-grouped (mega conversations become stragglers; the
    # payload column also rides through the groupBy shuffle)
    t0 = time.monotonic()
    (df.select("conv_id", "turn_idx", "text")
       .groupBy("conv_id")
       .applyInPandas(_extract_group, GROUP_SCHEMA)
       .where("text_out IS NOT NULL").count())
    grouped_sec = time.monotonic() - t0

    # B: salted turn-level (the engine's plan)
    t0 = time.monotonic()
    out = run_pipeline(df, with_markdown=True, salt_buckets=cpus * 4,
                       payload_cache=False)
    out.where(out.text_out.isNotNull()).count()
    salted_sec = time.monotonic() - t0

    print(json.dumps({
        "scale": scale, "turns": n, "cpus": cpus,
        "grouped_by_conv_sec": round(grouped_sec, 2),
        "salted_turn_level_sec": round(salted_sec, 2),
        "speedup": round(grouped_sec / salted_sec, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-turn byte-equality verification at t-large (1.63 M turns — 8x the
largest driver-gated scale, the same table the graded scaling pair runs).

Builds the expected-output table from the kernel-oracle fixtures (cheap:
each turn maps to its doc's fixture output), runs the production
dedup-aware pipeline at local[N], and joins the two DISTRIBUTED on
(conv_id, turn_idx), counting any row where extracted text, markdown,
pdf_type or error_kind differs. Nothing wide is collected: the driver
sees only mismatch counts.

Usage: python tools/verify_tlarge.py [scale] [cpus]
Prints one JSON line; exit 1 on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    scale = sys.argv[1] if len(sys.argv) > 1 else "t-large"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import pyspark.sql.functions as F

    from pdf_inspector_spark.operators.extraction import _write_expected
    from pdf_inspector_spark.pipeline import run_pipeline_dedup
    from pdf_inspector_spark.session import get_spark
    from pdf_inspector_spark.transcripts import DATA_DIR, write_transcripts

    tpath = write_transcripts(scale)
    epath = os.path.join(DATA_DIR, f"expected_{scale}_v8.parquet")
    # streams in 100k-row batches (shared writer in operators.extraction)
    _write_expected(scale, epath)

    spark = get_spark(f"verify-{scale}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out = run_pipeline_dedup(spark.read.parquet(tpath), with_markdown=True)
    exp = spark.read.parquet(epath)

    j = (out.select("conv_id", "turn_idx",
                    F.col("text_out").alias("a_text"),
                    F.col("markdown").alias("a_md"),
                    F.col("pdf_type").alias("a_type"),
                    F.col("error_kind").alias("a_err"))
         .join(exp.select("conv_id", "turn_idx",
                          F.col("text").alias("e_text"),
                          F.col("markdown").alias("e_md"),
                          F.col("pdf_type").alias("e_type"),
                          F.col("error_kind").alias("e_err")),
               ["conv_id", "turn_idx"], "full_outer"))

    neq = (lambda a, e: ~(F.col(a).eqNullSafe(F.col(e))))
    agg = j.agg(
        F.count("*").alias("rows"),
        F.sum(neq("a_text", "e_text").cast("long")).alias("text_mismatch"),
        F.sum(neq("a_md", "e_md").cast("long")).alias("md_mismatch"),
        F.sum(neq("a_type", "e_type").cast("long")).alias("type_mismatch"),
        F.sum(neq("a_err", "e_err").cast("long")).alias("err_mismatch"),
    ).collect()[0]

    result = {"scale": scale, "cpus": cpus, "rows": agg["rows"],
              "text_mismatch": agg["text_mismatch"],
              "md_mismatch": agg["md_mismatch"],
              "type_mismatch": agg["type_mismatch"],
              "err_mismatch": agg["err_mismatch"]}
    print(json.dumps(result))
    spark.stop()
    return 1 if any(result[k] for k in
                    ("text_mismatch", "md_mismatch", "type_mismatch",
                     "err_mismatch")) else 0


if __name__ == "__main__":
    sys.exit(main())

"""r07 probe: decompose the bench extract_pipeline wall time at t-med
(the driver's sf1.0 extraction row). Mirrors bench.extraction_worker's
session config; times each component with best-of-N .count()/noop."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from pdf_inspector_spark.pipeline import run_pipeline  # noqa: E402
from pdf_inspector_spark.session import get_spark  # noqa: E402
from pdf_inspector_spark.transcripts import write_transcripts  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = os.environ.get("SCALE", "t-med")

jvm_opts = os.environ.get(
    "SPARK_GRAFT_JVM_OPTS",
    "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=2 -XX:CICompilerCount=2")
spark = get_spark(f"probe-extract-{CPUS}", cpus=CPUS, arrow_batch_rows=1024,
                  extra_conf={"spark.driver.extraJavaOptions": jvm_opts})
spark.sparkContext.setLogLevel("ERROR")
tpath = write_transcripts(SCALE)
df = spark.read.parquet(tpath)
print("partitions:", df.rdd.getNumPartitions(), "rows:", df.count())


def t(label, thunk, n=3):
    thunk()
    best = 1e9
    for _ in range(n):
        t0 = time.monotonic()
        thunk()
        best = min(best, time.monotonic() - t0)
    print(f"{label}: {best:.3f}")


def noop(d):
    d.write.format("noop").mode("overwrite").save()


from typing import Iterator  # noqa: E402


@F.pandas_udf("long")
def _lenudf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in it:
        yield batch.str.len()


t("scan noop", lambda: noop(df))
t("scan count", lambda: df.count())
t("trivial pandas udf over text", lambda: noop(
    df.select(_lenudf(F.col("text")).alias("n"))))
t("full run count(filtered)", lambda: run_pipeline(
    df, with_markdown=True, payload_cache=False)
  .where(F.col("pdf_type").isNotNull()).count())
t("full run noop", lambda: noop(run_pipeline(
    df, with_markdown=True, payload_cache=False)))
rp = df.repartition(4 * CPUS)
t("repart(4c) run count", lambda: run_pipeline(
    rp, with_markdown=True, payload_cache=False)
  .where(F.col("pdf_type").isNotNull()).count())
t("text-only (no markdown) count", lambda: run_pipeline(
    df, with_markdown=False, payload_cache=False)
  .where(F.col("pdf_type").isNotNull()).count())
out = run_pipeline(df, with_markdown=True, payload_cache=False)
t("drop spans/markdown/text before count", lambda: out
  .select("pdf_type").where(F.col("pdf_type").isNotNull()).count())
spark.stop()

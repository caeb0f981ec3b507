"""Benchmark harness (driver contract).

Runs the headline extraction pipeline + representative analytics queries
at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "throughput": {"turns_per_sec_n": ..., "turns_per_sec_4n": ...,
                    "scaling_efficiency": ...}}

The north-rule scaling evidence (N vs 4N executors) is proxied by running
the SAME extraction job at local[CPUS/4] and local[CPUS] in separate
subprocesses (one JVM can't switch masters) over the SAME input;
efficiency = (tput_4N / tput_N) / 4.

Pass ``--worker <cpus> <scale>`` (internal) to run one extraction
measurement and print its JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# sf dir → transcripts scale for the extraction benchmark
_SCALE_FOR_SF = {"0.001": "t-small", "0.01": "t-med", "0.1": "t-bench"}

ANALYTIC_QUERIES = [
    "rel_pricing_summary",
    "rel_broadcast_join_revenue",
    "rel_sessionize_events",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_fingerprint",
    "text_quality_score",
]


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def extraction_worker(cpus: int, scale: str) -> dict:
    """One extraction throughput measurement at local[cpus]."""
    from pdf_inspector_spark.pipeline import run_pipeline
    from pdf_inspector_spark.session import get_spark
    from pdf_inspector_spark.transcripts import write_transcripts

    tpath = write_transcripts(scale)
    spark = get_spark(f"bench-extract-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(tpath)
    n_turns = df.count()
    # The table is a many-file directory → file-level scan parallelism;
    # the pipeline runs on scan partitions with no payload shuffle.
    t0 = time.monotonic()
    out = run_pipeline(df, with_markdown=True)
    processed = out.where(out.pdf_type.isNotNull()).count()
    elapsed = time.monotonic() - t0
    spark.stop()
    return {"cpus": cpus, "scale": scale, "turns": n_turns,
            "processed": processed, "sec": round(elapsed, 3),
            "turns_per_sec": round(n_turns / elapsed, 1)}


def run_analytics(sf_dir: str, cpus: int) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    from pdf_inspector_spark.session import get_spark

    spark = get_spark("bench-analytics", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    times: dict[str, float] = {}
    for name in ANALYTIC_QUERIES:
        fn = qs[name]
        t0 = time.monotonic()
        # count() forces full execution without collecting wide rows
        fn(spark, sf_dir).count()
        times[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    return times


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        cpus, scale = int(sys.argv[2]), sys.argv[3]
        print(json.dumps(extraction_worker(cpus, scale)))
        return

    sf = _sf_of(SF_DIR)
    scale = _SCALE_FOR_SF.get(sf, "t-med")

    # Pre-generate the transcripts table so workers measure compute, not I/O
    from pdf_inspector_spark.transcripts import write_transcripts
    write_transcripts(scale)

    # Parallelism ladder: N, 4N (and N/4 when CPUS ≥ 32, giving two N→4N
    # pairs: the lower pair is free of the box's shared-memory-bandwidth
    # ceiling; the upper pair documents it).
    n_low = max(CPUS // 4, 1)
    levels = ([max(CPUS // 16, 1), n_low, CPUS]
              if CPUS >= 16 else [n_low, CPUS])
    results = {}
    for cpus in levels:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cpus), scale],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
        try:
            results[cpus] = json.loads(line)
        except json.JSONDecodeError:
            sys.stderr.write(proc.stdout + proc.stderr)
            raise

    throughput = {"turns": results[CPUS]["turns"], "scale": scale}
    for cpus in levels:
        throughput[f"turns_per_sec_n{cpus}"] = results[cpus]["turns_per_sec"]
    for lo, hi in zip(levels, levels[1:]):
        eff = results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"] / (hi / lo)
        throughput[f"scaling_efficiency_{lo}_to_{hi}"] = round(eff, 3)

    queries = {"extract_pipeline": results[CPUS]["sec"]}
    queries.update(run_analytics(SF_DIR, CPUS))

    out = {
        "metric": "extraction_pipeline_runtime",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "throughput": throughput,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Round-7 optimization measurement harness (bench.py stays frozen).

Times each analytics query exactly the way the frozen bench does
(warm-up pass, then best-of-2 timed ``.count()``), at the sf dir given
by $SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's round-6
measurement scale), and optionally dumps ``explain("formatted")`` for
each query to plans/r07/.

Usage:
    python bench_extra.py                 # time all bench queries
    python bench_extra.py q1 q2 ...       # time a subset
    python bench_extra.py --plans SUFFIX  # dump plans/r07/<q>_SUFFIX.txt
    python bench_extra.py --reps N ...    # more timed reps (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "rel_pricing_summary",
    "rel_broadcast_join_revenue",
    "rel_sessionize_events",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_minhash_prod",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_bpe_tokens",
    "text_quality_score",
]


def main() -> None:
    args = sys.argv[1:]
    plans_suffix = None
    reps = 2
    if "--plans" in args:
        i = args.index("--plans")
        plans_suffix = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    names = args or BENCH_QUERIES

    import __spark_entry__ as entry_mod
    from pdf_inspector_spark.session import get_spark

    spark = get_spark("bench-extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    times: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        t0 = time.monotonic()
        fn(spark, SF_DIR).count()
        warm = time.monotonic() - t0
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"timed:{name}:{r}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            samples.append(round(time.monotonic() - t0, 3))
        times[name] = min(samples)
        all_samples[name] = [round(warm, 3)] + samples
        print(f"  {name}: best={times[name]} samples={all_samples[name]}",
              file=sys.stderr)
    if plans_suffix:
        os.makedirs("plans/r07", exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(f"plans/r07/{name}_{plans_suffix}.txt", "w") as f:
                f.write(p)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS,
                      "best": times, "samples": all_samples,
                      "total": round(sum(times.values()), 3)}))


if __name__ == "__main__":
    main()

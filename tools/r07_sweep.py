"""r07 sweep: time EVERY registry query (warm + best-of-2 .count()) at a
given sf dir — evidence for the per-operator optimization checklist.

Usage: python tools/r07_sweep.py [sf_dir] [only...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = sys.argv[2:]


def main() -> None:
    import __spark_entry__ as entry_mod
    from pdf_inspector_spark.session import get_spark

    spark = get_spark("r07-sweep", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out = {}
    for name in sorted(qs):
        if ONLY and name not in ONLY:
            continue
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            warm = round(time.monotonic() - t0, 3)
            samples = []
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, SF_DIR).count()
                samples.append(round(time.monotonic() - t0, 3))
            out[name] = {"warm": warm, "best": min(samples)}
            print(f"{name}: warm={warm} best={min(samples)}",
                  file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}
            print(f"{name}: ERROR {exc}", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "results": out}))


if __name__ == "__main__":
    main()

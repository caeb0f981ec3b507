"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same tables,
compare row count + column names + order-insensitive values.

Usage: python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm(v):
    """Driver-strength normalization: exact values, NO float rounding and
    NO timezone stripping — representation differences (HUGEINT→float64,
    TIMESTAMP_LTZ vs naive) must FAIL here exactly as they fail in the
    driver's hash gate. Only decimal.Decimal is canonicalized (both
    engines produce exact decimals; trailing-zero scale is type-level)."""
    import decimal
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize()) if v != 0 else "0"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def run(sf_dir: str, only: list[str]) -> int:
    import __spark_entry__ as entry_mod
    from pdf_inspector_spark.session import get_spark

    spark = get_spark("crosscheck", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(norm(v) for v in row) for row in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = [tuple(norm(v) for v in row) for row in res.fetchall()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(exc)[:200]}")
            failures += 1
            continue
        problems = []
        if scols != dcols:
            problems.append(f"cols {scols} != {dcols}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        elif sorted(map(str, srows)) != sorted(map(str, drows)):
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = [a for a in args if not os.path.isdir(a)]
    sys.exit(1 if run(sf_dir, only) else 0)

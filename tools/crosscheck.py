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
    """Driver-strength normalization: exact values, NO float rounding, NO
    timezone stripping, NO Decimal canonicalization — representation
    differences (HUGEINT→float64, TIMESTAMP_LTZ vs naive, Decimal scale)
    must FAIL here exactly as they fail in the driver's hash gate.
    (r02 lesson: normalizing Decimals masked the rel_event_rates_hourly
    driver fail for two rounds.)"""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def decimal_cols(sdf) -> list[str]:
    """DECIMAL final columns are banned repo-wide: DuckDB's pandas bridge
    (the driver's path) renders DECIMAL as float64 while Spark collects
    exact Decimal — such a column can never hash-match. DuckDB's native
    fetchall() returns exact Decimals, so a value comparison here would
    NOT reproduce the driver divergence; only a schema ban does."""
    return [f.name for f in sdf.schema.fields
            if "decimal" in f.dataType.simpleString()]


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
            bad = decimal_cols(sdf)
            if bad:
                print(f"FAIL {name}: DECIMAL final column(s) {bad} — cast "
                      "to DOUBLE/BIGINT (driver pandas bridge diverges)")
                failures += 1
                continue
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

"""Local differential harness: run every registry query on Spark AND its
DuckDB oracle, compare row count, column names, and exact values
(order-insensitive). Stricter than the driver's hash compare — if this
passes, the hash compare passes.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from jira_scraper_etl_spark import plans  # noqa: E402
from jira_scraper_etl_spark.catalog import TABLES  # noqa: E402
from jira_scraper_etl_spark.session import get_spark  # noqa: E402


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm(r[i]) for i in order) for r in rows), key=repr
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures, checked, rows_only = [], 0, 0
    for name, q in plans.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = q.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error: {str(ex)[:500]}")
            continue
        if q.oracle is None:
            rows_only += 1
            print(f"rows  {name}: {len(s_rows)} rows, schema {s_cols} "
                  f"({time.perf_counter()-t0:.1f}s)")
            continue
        try:
            res = con.execute(q.oracle)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL  {name}: duckdb error: {str(ex)[:500]}")
            continue
        checked += 1
        msgs = []
        if sorted(s_cols) != sorted(o_cols):
            msgs.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        elif len(s_rows) != len(o_rows):
            msgs.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
        else:
            a, b = normalize(s_rows, s_cols), normalize(o_rows, o_cols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if msgs:
            failures.append((name, "; ".join(msgs)))
            print(f"FAIL  {name}: {'; '.join(msgs)[:800]}")
        else:
            print(f"ok    {name}: {len(s_rows)} rows ({time.perf_counter()-t0:.1f}s)")

    print(f"\n{checked} oracle-checked, {rows_only} rows-only, {len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

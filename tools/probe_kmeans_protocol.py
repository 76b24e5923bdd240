"""Pin the k-means decade protocol (round-11 verdict #4): the sf100/
sf30 ratio for embedding_kmeans_exact read 4.9x for 3.33x rows, but
the sf30 figure was a warm in-suite median while sf100 was a cold
probe. This runner measures BOTH dirs under ONE protocol — fresh
SparkSession per dir, codegen warm at sf0.001, SPARK_GRAFT_PROBE_RUNS
runs (default 1 = the cold decade mode) — so the ratio is
apples-to-apples.

Usage: python tools/probe_kmeans_protocol.py <dir1> <dir2> [...]
e.g.  python tools/probe_kmeans_protocol.py .scratch/sf30w .scratch/sf100
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

import bench  # noqa: E402
from jira_scraper_etl_spark import plans  # noqa: E402
from jira_scraper_etl_spark.session import get_spark  # noqa: E402

QUERY = "embedding_kmeans_exact"


def main() -> int:
    dirs = sys.argv[1:] or [".scratch/sf30w", ".scratch/sf100"]
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "1"))
    out = {}
    for d in dirs:
        # fresh session per dir: identical cache state (cold) for every
        # measurement — the protocol gap the round-11 row suffered
        spark = get_spark(f"kmproto-{os.path.basename(d)}")
        spark.sparkContext.setLogLevel("ERROR")
        plans.QUERIES[QUERY].fn(spark, "/root/testdata/sf0.001").count()
        timings, _ = bench.run_suite(spark, d, [QUERY], runs=runs)
        out[d] = timings.get(QUERY)
        spark.stop()
    print(json.dumps({"metric": "kmeans_decade_protocol", "runs": runs,
                      "timings": out, "unit": "sec"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

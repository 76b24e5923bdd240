"""Relational/TPC-H decade probe (round-11 verdict #1): the corpus
family has two decades of scaling evidence but the warehouse family
had none past sf10 — yet TPC-H is the surface a 100 TB warehouse user
hits first. Probes the widest-join-tree / heaviest-shuffle classes at
a warehouse-scaled dir (generate with
``python tools/make_sf.py 300 .scratch/sf30w region,nation,customer,\
supplier,part,orders,lineitem,events,embeddings``).

Bench protocol = probe_sf30's: codegen warm at sf0.001, median of
SPARK_GRAFT_PROBE_RUNS runs (default 3; 1 = single-run decade mode).
Prints one JSON line.

Usage: python tools/probe_warehouse.py [sf_dir]  (default .scratch/sf30w)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

# 1 GiB/task mirrors a real cluster's per-core memory (see
# probe_sf30.py's rationale) — lineitem at sf30 is 180M rows.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
# Size shuffle partitions for ~128 MB each at the probed decade — the
# deployment dial a production job sets per input volume (session.py
# docstring): the per-core default spills the q21/q18 sorts at sf30.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "512")

import bench  # noqa: E402
from jira_scraper_etl_spark import plans  # noqa: E402
from jira_scraper_etl_spark.session import get_spark  # noqa: E402

PROBE = [
    # the all-lineitem single-pass aggregate — the pure-scan floor
    "q1_pricing_summary",
    # widest join tree in the suite (8 relations incl. lineitem twice
    # removed: part->lineitem->orders->customer->nation x2->region)
    "q8_national_market_share",
    # the profit rollup: lineitem x part x supplier x partsupp-free
    # variant + nation — heaviest multi-big-table shuffle chain
    "q9_product_type_profit",
    # large-volume customers: the groupBy-HAVING over lineitem feeding
    # a semi join back through orders
    "q18_large_volume_customers",
    # double-correlated EXISTS/NOT EXISTS decorrelation
    "q21_suppliers_kept_waiting",
    # the AQE-skew-join flagship (hot event type isolated per peer)
    "join_skewed_peers_1h",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf30w"
    spark = get_spark("whprobe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in PROBE:  # codegen warm at toy SF (bench protocol)
        plans.QUERIES[n].fn(spark, "/root/testdata/sf0.001").count()
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    timings, refused = bench.run_suite(spark, sf_dir, PROBE, runs=runs)
    print(json.dumps({"metric": "warehouse_decade_probe",
                      "sf_dir": sf_dir, "queries": timings,
                      "refused": refused, "unit": "sec"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""sf30 probe of the two linear heavies (round-8 verdict #8): measure
text_winnow_fingerprints and embedding_kmeans_exact one decade past the
128 GiB comfort zone to confirm the linear extrapolation recorded in
BASELINE.md. Bench protocol (codegen warm at sf0.001, median-of-3 via
bench.run_suite). Prints one JSON line.

Usage: python tools/probe_sf30.py [sf_dir]   (default .scratch/sf30 —
generate it with `python tools/make_sf.py 300 .scratch/sf30
documents,embeddings`; only the corpus tables fit the box at sf30).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from jira_scraper_etl_spark import plans  # noqa: E402
from jira_scraper_etl_spark.session import get_spark  # noqa: E402

PROBE = ["text_winnow_fingerprints", "embedding_kmeans_exact"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf30"
    spark = get_spark("sf30probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in PROBE:  # codegen warm at toy SF (bench protocol)
        plans.QUERIES[n].fn(spark, "/root/testdata/sf0.001").count()
    timings, refused = bench.run_suite(spark, sf_dir, PROBE)
    print(json.dumps({"metric": "sf30_linear_heavies_probe",
                      "queries": timings, "refused": refused,
                      "unit": "sec"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Measure MinHash candidate volume across decades under the derived
(bands, rows) ladder (round-11 verdict #2 "Done" criterion): distinct
candidate pairs per document should stay ~flat from sf10 to sf100 with
the dial, where fixed 4x4 banding measured ~n^1.4 growth. Also
measures the FIXED-4x4 counterfactual at each dir so the suppression
is a recorded delta, not an inference.

Usage: python tools/probe_minhash_dial.py [dir ...]
       (default: .scratch/sf10 .scratch/sf30w .scratch/sf100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from jira_scraper_etl_spark import seams  # noqa: E402
from jira_scraper_etl_spark.catalog import load_table  # noqa: E402
from jira_scraper_etl_spark.operators import dedup as OD  # noqa: E402
from jira_scraper_etl_spark.session import get_spark  # noqa: E402


def measure(spark, sf_dir: str, bands: int, rows: int) -> dict:
    d = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    docs = seams.persist_seam(OD.shingled_docs(d))
    sig = OD.minhash_signatures(docs, k=bands * rows)
    banded = OD.band_keys_df(sig, bands=bands, rows=rows)
    n_cand = OD.candidate_pairs(banded).count()
    dt = time.perf_counter() - t0
    n = d.count()
    seams.release_seams()
    return {"docs": n, "bands": bands, "rows": rows,
            "candidates": n_cand,
            "cand_per_doc": round(n_cand / n, 4),
            "sec": round(dt, 1)}


def main() -> int:
    dirs = sys.argv[1:] or [".scratch/sf10", ".scratch/sf30w",
                            ".scratch/sf100"]
    out = {}
    spark = get_spark("mhdial")
    spark.sparkContext.setLogLevel("ERROR")
    for dd in dirs:
        n = load_table(spark, dd, "documents").count()
        bands, rows = OD.derive_minhash_br(n)
        out[dd] = {"derived": measure(spark, dd, bands, rows)}
        if (bands, rows) != (4, 4):
            out[dd]["fixed_4x4"] = measure(spark, dd, 4, 4)
    print(json.dumps({"metric": "minhash_dial_candidates", "dirs": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

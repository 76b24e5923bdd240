"""The driver runs bench.py as a subprocess and parses its single JSON
stdout line — pin that contract so a refactor can't break the round
recording."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_single_json_line_on_stdout():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        cwd="/root/repo", env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, lines
    payload = json.loads(lines[0])
    assert payload["metric"] == "headline_suite_wall_clock"
    assert payload["unit"] == "sec" and payload["value"] > 0
    assert payload["sf"] == 0.001
    assert set(payload["queries"]) >= {
        "q1_pricing_summary", "dedup_minhash_lsh", "dedup_cluster_canonical",
        "text_vocab_topk", "jira_source_scan"}
    assert all(v >= 0 for v in payload["queries"].values())


def test_run_suite_records_refusals_without_losing_the_rest(spark):
    """An operator refusing a regime (the jaccard candidate-volume
    guard at the soak decades) must land in the refused dict while
    every other headline query still measures — the contract that kept
    the sf10 bench row recordable."""
    import bench

    timings, refused = bench.run_suite(
        spark, "/root/testdata/sf0.001",
        ["q1_pricing_summary", "dedup_jaccard_prefix"])
    assert "q1_pricing_summary" in timings and not refused

    from jira_scraper_etl_spark import plans
    q = plans.QUERIES["dedup_jaccard_prefix"]
    orig = q.fn
    try:
        # fallback=False is the only remaining refusal path (the
        # default now degrades to the MinHash rung and measures)
        q.fn = lambda s, d: orig(s, d, max_candidates=1, fallback=False)
        timings, refused = bench.run_suite(
            spark, "/root/testdata/sf0.001",
            ["q1_pricing_summary", "dedup_jaccard_prefix"])
    finally:
        q.fn = orig
    assert "q1_pricing_summary" in timings
    assert "dedup_jaccard_prefix" in refused
    assert "candidate volume" in refused["dedup_jaccard_prefix"]


def test_run_suite_crashes_on_genuine_valueerror(spark):
    """A bare ValueError is a bug, not a routing refusal — run_suite
    must NOT swallow it into the refused dict (ADVICE r8: a genuine
    bug silently dropped from the wall-clock total keeps the bench
    green)."""
    import pytest

    import bench
    from jira_scraper_etl_spark import plans

    q = plans.QUERIES["dedup_jaccard_prefix"]
    orig = q.fn

    def boom(s, d):
        raise ValueError("genuine bug, not a refusal")

    try:
        q.fn = boom
        with pytest.raises(ValueError, match="genuine bug"):
            bench.run_suite(spark, "/root/testdata/sf0.001",
                            ["dedup_jaccard_prefix"])
    finally:
        q.fn = orig


def test_every_registry_output_survives_driver_canonicalization(spark, sf_dir):
    """The external correctness harness canonicalizes each query's
    output by pandas-sorting over ALL columns before hashing typed
    values — a bare array/struct/map column materializes as numpy
    arrays/dicts there and dies with 'unhashable type' (the round-3
    embedding_quantize_int8 driver err). Run every registered entry's
    output through those exact steps at sf0.001 so a shape regression
    is caught before any external harness sees it."""
    import pandas as pd

    from jira_scraper_etl_spark import plans

    failures = []
    for name, q in plans.QUERIES.items():
        try:
            pdf = q.fn(spark, sf_dir).toPandas()
            pdf = pdf.sort_values(by=list(pdf.columns))
            if q.oracle is not None:
                # hash compare only runs for oracle-backed entries
                pd.util.hash_pandas_object(pdf, index=False)
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, failures


def test_force_full_entries_justify_their_noop_path(spark, sf_dir):
    """Every FORCE_FULL_MATERIALIZE entry must (a) be in the headline
    and (b) actually exhibit the count()-elimination that justifies
    timing it through the noop sink: its count plan optimizes to a
    bare scan (no join, no hash pipeline). If a future change makes
    count() stop eliminating, the set is stale and this flags it."""
    import bench
    from jira_scraper_etl_spark import plans

    assert bench.FORCE_FULL_MATERIALIZE <= set(bench.HEADLINE)
    for name in bench.FORCE_FULL_MATERIALIZE:
        df = plans.QUERIES[name].fn(spark, sf_dir)
        p = (df.groupBy().count()._jdf.queryExecution()
             .optimizedPlan().toString())
        assert "Join" not in p, (name, p[:300])

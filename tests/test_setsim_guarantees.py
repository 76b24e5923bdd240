"""Pinning text_winnow_fingerprints_fast without a DuckDB oracle
(round-9 verdict #7): the xxhash64 twin has no cross-engine hash to
replay, so correctness rests on (a) the paper's coverage guarantee over
the real corpus, (b) exact sampled replay — the engine's own gram
hashes re-winnowed by an independent Python selection — and (c) the
substring-match guarantee on engineered pairs. Same verification shape
as events_winsorize_approx (the approx-twin precedent)."""

from __future__ import annotations

import pyspark.sql.functions as F

from jira_scraper_etl_spark import plans
from jira_scraper_etl_spark.plans.setsim_ops import (
    WINNOW_K, WINNOW_W, winnow_fast_frame)


def test_fast_winnow_coverage_guarantee(spark, sf_dir):
    """Winnowing selects ≥1 fingerprint per window of W consecutive
    grams, so per doc: first selected pos ≤ W, adjacent gaps ≤ W,
    last selected pos ≥ n_grams − W + 1."""
    out = plans.QUERIES["text_winnow_fingerprints_fast"].fn(spark, sf_dir)
    per_doc = (out.groupBy("doc_id")
               .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
               .collect())
    docs = {r.doc_id: r.n for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id",
                    (F.length("text") - WINNOW_K + 1).alias("n"))
            .collect()}
    assert per_doc
    for r in per_doc:
        ps, n = r.ps, docs[r.doc_id]
        assert ps[0] <= WINNOW_W, (r.doc_id, ps[0])
        assert ps[-1] >= n - WINNOW_W + 1, (r.doc_id, ps[-1], n)
        gaps = [b - a for a, b in zip(ps, ps[1:])]
        assert all(g <= WINNOW_W for g in gaps), (r.doc_id, max(gaps))


def test_fast_winnow_sampled_python_replay(spark, sf_dir):
    """Exact replay on a 30-doc sample: take the engine's own xxhash64
    gram stream (hash primitive shared — Python has no stdlib xxhash),
    winnow it with an independent Python implementation of the
    selection rule (min hash per window, rightmost on ties, distinct),
    and require (pos, fp) set equality per document."""
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .where(F.col("doc_id") < 30).select("doc_id", "text"))
    grams = {r.doc_id: list(r.hs) for r in d.select(
        "doc_id",
        F.expr(f"transform(sequence(1, greatest(length(text) - {WINNOW_K}"
               f" + 1, 0)), i -> xxhash64(substring(text, i, {WINNOW_K})))")
        .alias("hs")).collect()}

    def replay(hs):
        sel = set()
        for j in range(len(hs) - WINNOW_W + 1):
            win = hs[j:j + WINNOW_W]
            m = min(win)
            pos = j + 1 + max(i for i, h in enumerate(win) if h == m)
            sel.add((pos, m))
        return sel

    want = {doc: replay(hs) for doc, hs in grams.items()
            if len(hs) >= WINNOW_W}
    got: dict[int, set] = {}
    for r in winnow_fast_frame(d).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    assert got == {k: v for k, v in want.items() if v}


def test_fast_winnow_shared_substring_guarantee(spark):
    """Any substring match of length ≥ W + K − 1 between two documents
    shares at least one selected fingerprint — the MOSS detection
    contract, on engineered pairs where only that substring is
    common."""
    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "zzzz qqqq " + shared + " wwww ooo"),
        (2, "aaaa bbbb cccc dddd " + shared),
        (3, "totally unrelated text with no common run at all here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fps: dict[int, set] = {}
    for r in winnow_fast_frame(d).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared substring produced no shared fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])

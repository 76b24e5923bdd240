"""Registry smoke tests: every query runs at sf0.001 with a stable
schema; the driver entry contract works. (Value-level parity vs DuckDB
is covered by tools/check_oracle.py and the driver's own harness.)"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from jira_scraper_etl_spark import plans


@pytest.mark.parametrize("name", sorted(plans.QUERIES))
def test_query_runs(spark, sf_dir, name):
    q = plans.QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_oracle_coverage():
    """Every query has an oracle unless explicitly rows-only (approx
    sketches, ML-internal LSH, code-defined Jira fixtures, the UDTF
    differential twin)."""
    rows_only = {name for name, q in plans.QUERIES.items() if q.oracle is None}
    assert rows_only == {
        "agg_approx_count_distinct",
        "similarity_ann_mllsh",
        "similarity_ann_ivf",
        "jira_transform_silver",
        "jira_corpus_stats",
        "jira_qa_pairs_udtf",
        "text_length_percentiles_approx",
    }


def test_embedding_dedup_bucketed_subset_and_recall(spark, sf_dir):
    """The banded operator's pairs are a subset of the all-pairs truth
    (same threshold), and at test SFs recall is 100% (measured; the
    banding width/count are the recall dials — see docstring)."""
    import pyspark.sql.functions as F

    banded = plans.QUERIES["dedup_embedding_cosine"].fn(spark, sf_dir)
    exact = plans.QUERIES["dedup_embedding_cosine_exact"].fn(spark, sf_dir)
    got = {(r.vec_a, r.vec_b) for r in banded.where(F.col("vec_a") < 300)
           .where(F.col("vec_b") < 300).collect()}
    want = {(r.vec_a, r.vec_b) for r in exact.collect()}
    assert got == want and isinstance(want, set)


def test_embedding_dedup_wide_bands_sound(spark, sf_dir):
    """The (bands, bits) scale dial (fewer, wider bands for bigger
    corpora — 34× faster at the sf1 soak) must stay SOUND: every pair
    the wide-band variant returns is a true ≥-threshold pair (the
    in-bucket verify guarantees precision; only recall moves with the
    dial)."""
    import pyspark.sql.functions as F

    wide = plans.QUERIES["dedup_embedding_cosine"].fn(
        spark, sf_dir, bands=8, bits=8)
    exact = plans.QUERIES["dedup_embedding_cosine_exact"].fn(spark, sf_dir)
    got = {(r.vec_a, r.vec_b) for r in wide.where(F.col("vec_a") < 300)
           .where(F.col("vec_b") < 300).collect()}
    want = {(r.vec_a, r.vec_b) for r in exact.collect()}
    assert got <= want
    assert wide.count() >= 1  # still finds the engineered near-dups


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """similarity_ann_ivf is rows-only (seeded KMeans is Spark-internal),
    so pin its QUALITY instead: every reported neighbor must carry the
    true cosine, and mean recall@5 against the exact top-5 (restricted
    to queries both report) must clear a floor — single-probe IVF with 8
    cells can miss cross-cell neighbors, but not most of them."""
    import pyspark.sql.functions as F

    ivf = plans.QUERIES["similarity_ann_ivf"].fn(spark, sf_dir)
    got = {}
    for r in ivf.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    exact = plans.QUERIES["similarity_topk_bruteforce"].fn(spark, sf_dir)
    want = {}
    for r in exact.where(F.col("rk") <= 5).collect():
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    common = set(got) & set(want)
    assert common
    recall = sum(len(got[q] & want[q]) / len(want[q]) for q in common) / len(common)
    assert recall >= 0.4, recall


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    qs = entrymod.queries()
    os = entrymod.oracle_sql()
    assert set(os) <= set(qs)
    assert len(qs) == len(plans.QUERIES)

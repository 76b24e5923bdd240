"""Hot-bucket handling in the LSH candidate join: a degenerate corpus
(hundreds of near-identical docs sharing every band key) must not
produce a quadratic bucket, while non-degenerate corpora produce
exactly the pairs of the plain bucket self-join."""

from __future__ import annotations

import pyspark.sql.functions as F

from jira_scraper_etl_spark.operators import dedup as D


def banded_for(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    docs = D.shingled_docs(df)
    sig = D.minhash_signatures(docs)
    return D.band_keys_df(sig)


def test_degenerate_bucket_is_chained_not_quadratic(spark):
    n = 500
    text = "the quick brown fox jumps over the lazy dog again and again"
    banded = banded_for(spark, [(i, text) for i in range(n)])
    pairs = D.candidate_pairs(banded, max_bucket_size=64, chain_width=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # O(n·W), not O(n²): chain pairs only
    assert len(got) <= n * 2
    assert len(got) < 1000  # C(500,2) would be 124750
    # connectivity preserved: every consecutive pair present, so the
    # whole bucket stays one component for downstream clustering
    assert all((i, i + 1) in got for i in range(n - 1))


def test_non_degenerate_pairs_identical_with_and_without_cap(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    banded = banded_for(
        spark, [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()])
    capped = {(r.id_a, r.id_b)
              for r in D.candidate_pairs(banded, max_bucket_size=256).collect()}
    uncapped = {(r.id_a, r.id_b)
                for r in D.candidate_pairs(banded, max_bucket_size=1 << 30).collect()}
    assert capped == uncapped and uncapped


def test_small_buckets_exact_chain_only_above_cap(spark):
    # two distinct texts: bucket sizes 3 and 2 — cap 2 chains the first
    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
            (3, "alpha beta gamma delta"), (4, "omega psi chi phi"),
            (5, "omega psi chi phi")]
    banded = banded_for(spark, rows)
    uncapped = {(r.id_a, r.id_b)
                for r in D.candidate_pairs(banded, max_bucket_size=10).collect()}
    assert uncapped == {(1, 2), (1, 3), (2, 3), (4, 5)}
    capped = {(r.id_a, r.id_b)
              for r in D.candidate_pairs(banded, max_bucket_size=2,
                                         chain_width=1).collect()}
    # bucket {1,2,3} chains to consecutive pairs; bucket {4,5} unchanged
    assert capped == {(1, 2), (2, 3), (4, 5)}

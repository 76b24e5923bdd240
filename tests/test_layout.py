"""Z-order layout (operators/layout.py): bit-exact interleave, and the
writer's measured pruning property — each file covers a small rectangle
in (user, time) space, unlike a single-dimension sort."""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from jira_scraper_etl_spark.catalog import load_events
from jira_scraper_etl_spark.operators.layout import (morton_interleave,
                                                     scale_to_bits,
                                                     zorder_write)

def HOUR():
    return F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")


def test_morton_interleave_bit_exact(spark):
    # x=0b1010 → bits 2,6 ; y=0b0110 → bits 3,5 ⇒ 4+64+8+32 = 108
    df = spark.range(1).select(
        morton_interleave(F.lit(10), F.lit(6)).alias("z"),
        morton_interleave(F.lit(0), F.lit(0)).alias("z0"),
        morton_interleave(F.lit(65535), F.lit(65535)).alias("zmax"))
    r = df.first()
    assert (r.z, r.z0, r.zmax) == (108, 0, (1 << 32) - 1)


def test_scale_to_bits_endpoints_and_degenerate_span(spark):
    df = spark.range(1).select(
        scale_to_bits(F.lit(5), F.lit(5), F.lit(105)).alias("lo"),
        scale_to_bits(F.lit(105), F.lit(5), F.lit(105)).alias("hi"),
        scale_to_bits(F.lit(7), F.lit(7), F.lit(7)).alias("flat"))
    r = df.first()
    assert (r.lo, r.hi, r.flat) == (0, 65535, 0)


def _range_fracs(spark, path):
    """Mean per-file (user range, hour range) as fractions of global."""
    df = (spark.read.parquet(path)
          .withColumn("f", F.input_file_name()).withColumn("h", HOUR()))
    glob = df.agg((F.max("user_id") - F.min("user_id")).alias("u"),
                  (F.max("h") - F.min("h")).alias("h")).first()
    g = df.groupBy("f").agg(
        (F.max("user_id") - F.min("user_id")).alias("ur"),
        (F.max("h") - F.min("h")).alias("hr")).collect()
    return (sum(r.ur for r in g) / len(g) / glob.u,
            sum(r.hr for r in g) / len(g) / glob.h, len(g))


def test_zorder_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    e = load_events(spark, sf_dir)
    zorder_write(e, F.col("user_id"), HOUR(), str(tmp_path / "z"), 16)
    (e.repartitionByRange(16, "ts").sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(str(tmp_path / "t")))

    # lossless: same event multiset
    back = spark.read.parquet(str(tmp_path / "z"))
    assert back.count() == e.count()
    assert back.select("event_id").exceptAll(e.select("event_id")).count() == 0

    zu, zh, zn = _range_fracs(spark, str(tmp_path / "z"))
    tu, th, tn = _range_fracs(spark, str(tmp_path / "t"))
    assert zn == 16 and tn == 16
    # the time-sorted layout cannot prune on user (each file spans ~all
    # users); the z-ordered one prunes BOTH dimensions (measured at
    # sf0.001: user 0.41, hour 0.31 vs time-sort's 1.0 / 0.06)
    assert tu > 0.9
    assert zu < 0.7 and zh < 0.7
    # and each z file is a contiguous, non-overlapping code range
    codes = (back.withColumn("f", F.input_file_name())
             .withColumn("h", HOUR()))
    # recompute the writer's scaled code from global stats
    st = codes.agg(F.min("user_id").alias("xlo"), F.max("user_id").alias("xhi"),
                   F.min("h").alias("ylo"), F.max("h").alias("yhi"))
    z = morton_interleave(
        scale_to_bits(F.col("user_id"), F.col("xlo"), F.col("xhi")),
        scale_to_bits(F.col("h"), F.col("ylo"), F.col("yhi")))
    spans = (codes.join(F.broadcast(st))
             .groupBy("f").agg(F.min(z).alias("lo"), F.max(z).alias("hi"))
             .collect())
    spans = sorted((r.lo, r.hi) for r in spans)
    assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))


def test_compaction_bins_conserve_bytes_and_pack_to_target(spark, sf_dir):
    """Compaction-planner invariants: every doc lands in exactly one
    bin; bin byte totals sum to the corpus total; bins cover
    contiguous, non-overlapping doc_id ranges in order; every bin
    except the last crosses the target once started (a bin closes only
    when the running total passes a target boundary); the two-level
    prefix-sum assignment equals a python single-scan replay."""
    from jira_scraper_etl_spark import plans
    from jira_scraper_etl_spark.plans.analysis_ops import COMPACT_TARGET

    out = sorted(plans.QUERIES["layout_compaction_bins"].fn(spark, sf_dir)
                 .collect(), key=lambda r: r.bin)
    docs = sorted(spark.read.parquet(f"{sf_dir}/documents.parquet")
                  .select("doc_id", F.octet_length("text").alias("b"))
                  .collect(), key=lambda r: r.doc_id)
    # python replay of the exclusive-prefix-sum assignment
    want = {}
    prev = 0
    for r in docs:
        b = prev // COMPACT_TARGET
        if b not in want:
            want[b] = [0, 0, r.doc_id, r.doc_id]
        want[b][0] += 1
        want[b][1] += r.b
        want[b][3] = r.doc_id
        prev += r.b
    got = {r.bin: [r.n_docs, r.bin_bytes, r.first_doc, r.last_doc]
           for r in out}
    assert got == want
    assert sum(r.n_docs for r in out) == len(docs)
    assert sum(r.bin_bytes for r in out) == sum(r.b for r in docs)
    for a, b in zip(out, out[1:]):
        assert a.last_doc < b.first_doc  # contiguous, ordered ranges
    mx = max(d.b for d in docs)
    for r in out[:-1]:
        # a bin closes only after crossing a target boundary: all
        # full bins carry at least the target minus one max-doc slack
        assert r.bin_bytes + mx >= COMPACT_TARGET

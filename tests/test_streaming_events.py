"""Structured Streaming differential tests: every streaming pipeline is
drained with Trigger.AvailableNow and compared against its
oracle-checked batch twin from plans/event_time.py. Multi-file inputs +
maxFilesPerTrigger=1 force several micro-batches, so cross-batch state
(watermark advance, per-user state structs) is genuinely exercised."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jira_scraper_etl_spark import plans
from jira_scraper_etl_spark.catalog import load_events
from jira_scraper_etl_spark.streaming import events as SE


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """The sf events split into 3 TIME-RANGE parquet files with
    ascending modification times — a realistic backlog replay (file N
    holds the next time slice), so watermark semantics are exercised
    without whole-batch late-drops."""
    import glob
    import shutil

    from pyspark.sql import Window

    d = str(tmp_path_factory.mktemp("events_stream"))
    # load_events normalizes ts to timestamp_ntz whatever unit the
    # generator used, so the split files are written with a native
    # parquet timestamp and stream_events takes its non-legacy path.
    raw = load_events(spark, sf_dir)
    nt = F.ntile(3).over(Window.orderBy("ts", "event_id"))
    chunked = raw.withColumn("nt", nt)
    for i in (1, 2, 3):  # sequential writes -> ascending mtimes
        tmp = f"{d}/_stage{i}"
        chunked.where(F.col("nt") == i).drop("nt").coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{d}/{i:02d}.parquet")
        shutil.rmtree(tmp)
    return d


def test_streaming_tumbling_complete_equals_batch(spark, sf_dir, events_dir, tmp_path):
    stream = SE.stream_events(spark, events_dir, glob="*.parquet",
                              max_files_per_trigger=1)
    agg = SE.tumbling_counts(stream)
    q = SE.drain_query(lambda: (
        agg.writeStream.format("memory").queryName("tumbling_all")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()))
    got = {tuple(r) for r in spark.table("tumbling_all").collect()}
    want = {tuple(r)
            for r in plans.QUERIES["events_tumbling_1h"].fn(spark, sf_dir).collect()}
    assert got == want and want


def test_streaming_tumbling_append_watermark_subset(spark, sf_dir, events_dir, tmp_path):
    """Append mode only emits windows the watermark has closed: the
    emitted set must be a consistent subset of the batch result (exact
    rows, never partial counts — late data inside the watermark was
    still merged before emission)."""
    stream = SE.stream_events(spark, events_dir, glob="*.parquet",
                              max_files_per_trigger=1)
    agg = SE.tumbling_counts(stream, watermark="2 hours")
    SE.drain_query(lambda: (
        agg.writeStream.format("memory").queryName("tumbling_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()))
    got = {tuple(r) for r in spark.table("tumbling_append").collect()}
    want = {tuple(r)
            for r in plans.QUERIES["events_tumbling_1h"].fn(spark, sf_dir).collect()}
    assert got <= want
    assert got  # multi-batch drain must have closed some windows


def test_streaming_session_window_equals_closed_batch_sessions(
        spark, sf_dir, events_dir, tmp_path):
    """Sessionization twin (round-8 verdict #4): drain the 3-file
    replay through the watermarked session_window aggregation and
    compare against the oracle-checked batch plan. Append mode emits a
    session only once the watermark passes its end, so the emitted set
    must EQUAL the batch sessions closed by the final watermark
    (max event time − delay) — exact rows (a session the engine split
    across batches would surface as two partial rows, which equality
    catches where a subset check would not), and strictly more than
    none (the replay spans 30 days, the delay is 2 hours)."""
    stream = SE.stream_events(spark, events_dir, glob="*.parquet",
                              max_files_per_trigger=1)
    agg = SE.session_counts(stream, watermark="2 hours")
    SE.drain_query(lambda: (
        agg.writeStream.format("memory").queryName("session_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()))
    got = {tuple(r) for r in spark.table("session_append").collect()}
    batch = plans.QUERIES["events_session_30m"].fn(spark, sf_dir)
    from datetime import timedelta

    from jira_scraper_etl_spark.catalog import load_events
    wm = (load_events(spark, sf_dir).agg(F.max("ts")).first()[0]
          - timedelta(hours=2))
    want_all = {tuple(r) for r in batch.collect()}
    # Whether Spark's append-mode eviction predicate closes a session
    # ending EXACTLY at the watermark is a boundary this test must not
    # depend on (ADVICE r9: a session ending at max(ts)−2h would flake
    # it): the emitted set must contain every strictly-closed session
    # and nothing beyond the inclusive closure — equal to both when no
    # session lands on the boundary, which is the usual dataset shape.
    want_strict = {t for t in want_all if t[2] < wm}  # session_end
    want_incl = {t for t in want_all if t[2] <= wm}
    assert want_strict <= got <= want_incl
    assert got and got < want_all  # some sessions stay open past wm


def test_stream_static_enrichment_equals_batch(spark, sf_dir, events_dir,
                                               tmp_path):
    """Stream-static join twin: the event stream enriched against the
    static customer dim and rolled up per (segment, hour), drained in
    complete mode, must equal the oracle-checked batch plan exactly —
    the static side re-broadcasts per micro-batch, so every cross-batch
    event still finds its dimension row."""
    from jira_scraper_etl_spark.catalog import load_table

    stream = SE.stream_events(spark, events_dir, glob="*.parquet",
                              max_files_per_trigger=1)
    dim = load_table(spark, sf_dir, "customer")
    agg = SE.enriched_segment_counts(stream, dim)
    SE.drain_query(lambda: (
        agg.writeStream.format("memory").queryName("enriched_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()))
    got = {tuple(r) for r in spark.table("enriched_sink").collect()}
    want = {tuple(r) for r in
            plans.QUERIES["events_enriched_segment_hourly"]
            .fn(spark, sf_dir).collect()}
    assert got == want and want


def test_streaming_dedup_within_watermark(spark, sf_dir, events_dir, tmp_path):
    """At-least-once delivery (every chunk delivered twice, duplicates
    in a later batch) must come out exactly-once: the drained sink holds
    each event_id exactly once, matching the batch distinct count."""
    import shutil

    d = str(tmp_path / "dup_events")
    import os
    os.makedirs(d)
    for i in (1, 2, 3):  # original then its redelivery, per time slice
        shutil.copy(f"{events_dir}/{i:02d}.parquet", f"{d}/{i:02d}a.parquet")
        shutil.copy(f"{events_dir}/{i:02d}.parquet", f"{d}/{i:02d}b.parquet")
    stream = SE.stream_events(spark, d, glob="*.parquet",
                              max_files_per_trigger=2)
    deduped = SE.dedup_within_watermark(stream)
    SE.drain_query(lambda: (
        deduped.writeStream.format("memory").queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()))
    out = spark.table("dedup_sink")
    n_distinct_src = (spark.read.parquet(f"{sf_dir}/events.parquet")
                      .select("event_id").distinct().count())
    assert out.count() == out.select("event_id").distinct().count()
    assert out.count() == n_distinct_src


def test_stateful_user_stats_converges_to_batch(spark, sf_dir, events_dir, tmp_path):
    """The applyInPandasWithState running aggregate, after draining all
    batches, must equal the batch groupBy: count + latest event per
    user (latest by (ts, event_id) — robust to out-of-order files)."""
    stream = SE.stream_events(spark, events_dir, glob="*.parquet",
                              max_files_per_trigger=1)
    out = SE.stateful_user_stats(stream)
    updates = []

    def collect_batch(df, batch_id):
        updates.append((batch_id, df.collect()))

    SE.drain_query(lambda: (
        out.writeStream.foreachBatch(collect_batch)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()))
    assert len(updates) >= 2  # cross-batch state actually exercised
    final = {}
    for _, rows in updates:  # batch ids ascend; later update wins
        for r in rows:
            final[r.user_id] = (r.n_events, r.last_event_id,
                                r.last_event_type, r.last_ts_micros)

    e = load_events(spark, sf_dir)
    batch = (e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.struct(F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
                       F.col("event_id"), F.col("event_type"))).alias("m")))
    want = {r.user_id: (r.n, r.m.event_id, r.m.event_type, r.m.us)
            for r in batch.collect()}
    assert final == want


def test_stream_stream_attribution_join(spark, sf_dir, events_dir, tmp_path):
    """The watermarked stream-stream interval join, drained over the
    3-file backlog, must produce exactly the batch (purchase, click)
    pair set: same user, click strictly inside the preceding hour."""
    stream = SE.stream_events(spark, events_dir, glob="*.parquet",
                              max_files_per_trigger=1)
    joined = SE.attribution_1h(stream)
    SE.drain_query(lambda: (
        joined.writeStream.format("memory").queryName("attr_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()))
    got = {(r.purchase_id, r.click_id)
           for r in spark.table("attr_sink").collect()}

    e = load_events(spark, sf_dir)
    p = (e.where(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 "user_id", F.col("ts").alias("p_ts")))
    c = (e.where(F.col("event_type") == "click")
         .select(F.col("user_id").alias("c_user"),
                 F.col("event_id").alias("click_id"),
                 F.col("ts").alias("c_ts")))
    want = {(r.purchase_id, r.click_id) for r in p.join(
        c, (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts"))).collect()}
    assert got == want and want


def test_streaming_debounce_equals_batch(spark, sf_dir, events_dir, tmp_path):
    """The stateful streaming debounce, drained over the 3 time-range
    files (per-key in-order delivery), must keep exactly the events the
    batch LAG plan keeps, with identical gaps."""
    stream = SE.stream_events(spark, events_dir, glob="*.parquet",
                              max_files_per_trigger=1)
    out = SE.debounce_events(stream)
    SE.drain_query(lambda: (
        out.writeStream.format("memory").queryName("debounce_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()))
    got = {(r.event_id, r.gap_us)
           for r in spark.table("debounce_sink").collect()}
    want = {(r.event_id, r.gap_us)
            for r in plans.QUERIES["events_debounce_5m"].fn(spark, sf_dir).collect()}
    assert got == want and want


def test_streaming_journey_converges_to_batch(spark, sf_dir, events_dir,
                                              tmp_path):
    """The stateful journey profile, drained over the 3 time-range
    files (cross-batch state), must converge to EXACTLY the batch
    events_user_journey flagship on the full log — every metric, every
    user, including the ordered funnel milestones."""
    stream = SE.stream_events(spark, events_dir, glob="*.parquet",
                              max_files_per_trigger=1)
    out = SE.journey_state(stream)
    SE.drain_query(lambda: (
        out.writeStream.format("memory").queryName("journey_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()))
    # update mode re-emits per batch: keep each user's LAST emission
    import pandas as pd

    sink = spark.table("journey_sink").toPandas()
    final = sink.groupby("user_id").last()
    got = {
        int(uid): (int(r.n_events), int(r.first_us), int(r.last_us),
                   int(r.n_active_hours), int(r.n_sessions),
                   int(r.n_debounced), int(r.funnel_stage))
        for uid, r in final.iterrows()}
    import pyspark.sql.functions as F2
    batch = (plans.QUERIES["events_user_journey"].fn(spark, sf_dir)
             .withColumn("first_us",
                         F2.expr("unix_micros(cast(first_ts as timestamp))"))
             .withColumn("last_us",
                         F2.expr("unix_micros(cast(last_ts as timestamp))")))
    want = {r.user_id: (r.n_events, r.first_us, r.last_us,
                        r.n_active_hours, r.n_sessions, r.n_debounced,
                        r.funnel_stage) for r in batch.collect()}
    assert got == want and want

"""Regime tests for operators/fanout.fan_out — the conditional exchange
that fixed the round-3 sf0.1 bench regression while keeping the sf1
fan-out. Three regimes, each pinned:

* toy input  -> no exchange (single-task pass beats the shuffle)
* mid-size narrow scan -> repartition to defaultParallelism
* warehouse-wide scan  -> no exchange (already >= par splits)
"""

from __future__ import annotations

import pyspark.sql.functions as F

from jira_scraper_etl_spark.operators.fanout import HEAVY, LIGHT, fan_out


def test_toy_input_skips_exchange(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    assert fan_out(d, HEAVY).rdd.getNumPartitions() == d.rdd.getNumPartitions()
    assert fan_out(d, LIGHT).rdd.getNumPartitions() == d.rdd.getNumPartitions()


def _mid_size_df(spark, tmp_path):
    p = str(tmp_path / "mid.parquet")
    # md5-derived text so the parquet is incompressible and the file
    # lands solidly above the LIGHT (2 MiB) threshold
    text = F.concat_ws(" ", *[
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{i}")))
        for i in range(10)])
    (spark.range(0, 30000)
     .select(F.col("id").alias("doc_id"), text.alias("text"))
     .coalesce(1).write.mode("overwrite").parquet(p))
    return spark.read.parquet(p).select("doc_id", "text")


def test_mid_size_narrow_scan_fans_out(spark, tmp_path):
    d = _mid_size_df(spark, tmp_path)
    par = spark.sparkContext.defaultParallelism
    assert d.rdd.getNumPartitions() < par  # single-file narrow scan
    assert fan_out(d, HEAVY).rdd.getNumPartitions() == par
    assert fan_out(d, LIGHT).rdd.getNumPartitions() == par


def test_wide_scan_skips_exchange(spark, tmp_path):
    d = _mid_size_df(spark, tmp_path)
    # shrink the split size so the same file counts as a wide scan
    # (estimated size >= defaultParallelism x maxPartitionBytes)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536b")
        out = fan_out(d, HEAVY)
        # same DataFrame object back - no Repartition node added
        assert "Repartition" not in out._jdf.queryExecution() \
            .optimizedPlan().toString()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_fan_out_preserves_rows(spark, tmp_path):
    d = _mid_size_df(spark, tmp_path)
    assert fan_out(d, HEAVY).count() == d.count()


def test_parse_bytes_units():
    from jira_scraper_etl_spark.operators.fanout import _parse_bytes

    assert _parse_bytes("134217728b") == 128 * 1024 * 1024
    assert _parse_bytes("128m") == 128 * 1024 * 1024
    assert _parse_bytes("512M") == 512 * 1024 * 1024
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("64k") == 64 * 1024
    assert _parse_bytes("4096") == 4096

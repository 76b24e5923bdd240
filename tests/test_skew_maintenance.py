"""Salted-join equivalence and compaction row-preservation tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from jira_scraper_etl_spark.operators.maintenance import compact_parquet, dir_stats
from jira_scraper_etl_spark.operators.skew import salted_join


def test_salted_join_identical_to_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .withColumnRenamed("o_custkey", "custkey")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .withColumnRenamed("c_custkey", "custkey")
    plain = orders.join(customer, "custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "custkey", salt=4) \
        .select("o_orderkey", "c_name")
    assert salted.count() == plain.count()
    assert salted.subtract(plain).count() == 0
    assert plain.subtract(salted).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must occupy every salt bucket on the big side —
    the property that splits its shuffle partition S ways."""
    hot = spark.range(0, 10000).select(F.lit(1).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(1, "x")], "k int, v string")
    out = salted_join(hot, dim, "k", salt=4)
    assert out.count() == 10000
    salts = (hot.withColumn("_salt", F.pmod(F.monotonically_increasing_id(),
                                            F.lit(4)))
             .select("_salt").distinct().count())
    assert salts == 4


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = str(tmp_path / "frag")
    src.repartition(24).write.parquet(d)  # fragment into many small files
    n_before, _ = dir_stats(d)
    assert n_before >= 24
    want = spark.read.parquet(d).count()
    stats = compact_parquet(spark, d, target_file_bytes=1 << 30)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == 1
    assert spark.read.parquet(d).count() == want

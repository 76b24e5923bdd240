"""Bucketed co-located joins: assert the exchange elimination that the
bucketing helpers promise — the 100 TB fact-fact join pattern, proven
on the executed plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jira_scraper_etl_spark.operators import bucketing as B


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so small test tables exercise the same
    SortMergeJoin path a 100 TB fact-fact join takes."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    B.write_bucketed(orders, "b_orders", "o_custkey", buckets=8)
    B.write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", "o_custkey", buckets=8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def executed(df):
    df.collect()  # finalize AQE
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast, bucketed_tables):
    left, right = bucketed_tables
    joined = B.bucketed_equi_join(spark, left, right, "o_custkey")
    plan = executed(joined.select("o_custkey", "o_totalprice", "c_name"))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides read co-located buckets
    # correctness: same result as the plain shuffled join
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = orders.join(customer,
                       orders.o_custkey == customer.c_custkey).count()
    assert joined.count() == want


def test_bucketed_agg_has_no_exchange(spark, no_broadcast, bucketed_tables):
    left, _ = bucketed_tables
    agg = B.bucketed_agg(spark, left, "o_custkey",
                         F.count(F.lit(1)).alias("n"),
                         F.sum("o_totalprice").alias("total"))
    plan = executed(agg)
    assert "Exchange" not in plan


def test_unbucketed_join_does_shuffle(spark, sf_dir, no_broadcast):
    """Control: the same join off plain parquet must exchange — proving
    the bucketed plans above actually eliminated something."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plan = executed(orders.join(customer,
                                orders.o_custkey == customer.c_custkey))
    assert "Exchange" in plan

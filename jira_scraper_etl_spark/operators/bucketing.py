"""Bucketed-table helpers: co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
corpus ⋈ corpus) is the shuffle of both sides. Writing the tables
bucketed — hash-partitioned into a fixed number of files per partition,
sorted within buckets — moves that shuffle to WRITE time, once, and
every subsequent join or aggregation on the bucket key reads
co-located buckets with no exchange at all (Spark's bucketing is the
Hive-compatible scheme; `spark.sql.sources.bucketing.enabled` is on by
default). The repo's tests assert the exchange elimination on the
executed plan (tests/test_bucketing.py).

Rules of thumb encoded here:
* bucket count should match the target parallelism at read time (a
  1000-executor cluster wants >= 1000 buckets; local tests use 8);
* both join sides must share bucket count and key, or Spark falls back
  to shuffling the mismatched side;
* sort within buckets so the join is a zip-merge, not a hash build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 8) -> None:
    """Persist ``df`` as a bucketed+sorted managed table keyed on
    ``key`` (overwrite semantics)."""
    (df.write.mode("overwrite")
     .bucketBy(buckets, key).sortBy(key)
     .format("parquet").saveAsTable(table))


def bucketed_equi_join(spark: SparkSession, left: str, right: str,
                       key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the planner emits a SortMergeJoin with ZERO Exchange
    nodes — co-located, co-sorted reads."""
    return spark.table(left).join(spark.table(right), key)


def bucketed_agg(spark: SparkSession, table: str, key: str,
                 *aggs) -> DataFrame:
    """Aggregate a bucketed table by its bucket key — no exchange: the
    partial and final aggregates collapse into one stage because every
    key already lives in exactly one bucket file set."""
    return spark.table(table).groupBy(key).agg(*aggs)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` callable.
``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible entry
(column names aliased identically on both sides; see
jira_scraper_etl_spark/plans/registry.py for the cross-engine numeric
determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jira_scraper_etl_spark import plans
from jira_scraper_etl_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    apply_runtime_confs(spark)
    return plans.QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in plans.queries().items()}


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()

"""§2.10 UDTF surface: the Python UDTF re-expression of QA pairing must
agree row-for-row with the columnar (regexp_extract_all + transform)
production path on the fixture corpus."""

from __future__ import annotations

import pyspark.sql.functions as F

from jira_scraper_etl_spark.operators.transform import transform_issues
from jira_scraper_etl_spark.plans import QUERIES
from jira_scraper_etl_spark.plans.jira_parity import fixture_df


def test_udtf_matches_columnar_qa_pairs(spark):
    udtf_rows = {(r.id, r.question, r.answer)
                 for r in QUERIES["jira_qa_pairs_udtf"].fn(spark, "").collect()}
    columnar = (transform_issues(fixture_df(spark))
                .select("id", F.explode("derived_tasks.qa_pairs").alias("qa"))
                .select("id", "qa.question", "qa.answer"))
    col_rows = {(r.id, r.question, r.answer) for r in columnar.collect()}
    assert udtf_rows == col_rows and udtf_rows

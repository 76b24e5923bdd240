"""§2.10 UDAF surface: a pandas GROUPED_AGG UDAF (Arrow-batched
median) must agree with the columnar exact-percentile path. Like the
pandas/UDTF twins this is the differential-testing mirror, not the hot
path — production percentiles are `percentile()` (exact, JVM) or
`approx_percentile` (sketch) per plans/curation.py."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf

from jira_scraper_etl_spark.functions.hashing import word_tokens
from jira_scraper_etl_spark.plans import QUERIES


def test_grouped_agg_udaf_median_matches_percentile(spark, sf_dir):
    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        # numpy median == percentile(0.5) with linear interpolation,
        # the same definition Spark's percentile() uses
        return float(v.median())

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select("lang", F.size(word_tokens(F.col("text")))
                    .cast("double").alias("n_tokens"))
    got = {r.lang: r.med
           for r in toks.groupBy("lang")
           .agg(median_udaf("n_tokens").alias("med")).collect()}
    expected = {r.lang: r.p50_c / 100.0
                for r in QUERIES["text_length_percentiles"]
                .fn(spark, sf_dir).collect()}
    assert got.keys() == expected.keys()
    for lang, med in got.items():
        # p50_c is floor(p50*100); reverse the fixed-point floor
        assert abs(med - expected[lang]) < 0.01 + 1e-9, lang

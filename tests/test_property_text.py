"""Property-based differential test for the F8 stateful error-block
fold (SURVEY.md §7.3 calls it the riskiest single operator): hypothesis
generates line-structured text — stack-trace shapes, indentation,
whitespace runs, Jira markup, CI URLs — and the Catalyst
``F.aggregate`` implementation must agree with the independent
plain-Python twin on every document.

The reference repo has no property-based testing (SURVEY.md §5); this
is the engine's upgrade on its fixture-only strategy. ASCII alphabet on
purpose: Java and Python regex classes diverge on unicode whitespace,
and the contract under test is the fold's *state machine*, not unicode
regex semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jira_scraper_etl_spark.functions import text as X
from jira_scraper_etl_spark.functions.text_pandas import clean_text_py

_WORD = st.text("abcdefgh XYZ.,!?0123456789", min_size=0, max_size=30)

# Line shapes that drive the error-block state machine through every
# transition: error starts, indented continuations, resumption lines,
# blanks, markup, URLs.
_LINE = st.one_of(
    _WORD,
    st.builds(lambda w: f"[ERROR] {w}", _WORD),
    st.builds(lambda w: f"Exception in thread {w}", _WORD),
    st.builds(lambda w: f"    at com.example.Foo.bar({w}.java:42)", _WORD),
    st.builds(lambda w: f"Caused by: java.io.IOException: {w}", _WORD),
    st.builds(lambda w: f"java.lang.RuntimeException: {w}", _WORD),
    st.builds(lambda w: f"  org.apache.SparkException: {w}", _WORD),
    st.builds(lambda w: f"    ... 17 more", _WORD),
    st.builds(lambda w: f"  {w}", _WORD),           # indented non-error
    st.builds(lambda w: f"{{code}}{w}{{noformat}}", _WORD),
    st.builds(lambda w: f"see https://ci-hadoop.apache.org/job/x{w or 'y'}/1 ok",
              st.text("abc", max_size=5)),
    st.just(""),
    st.builds(lambda w: f"\t{w}\r", _WORD),
)

_DOC = st.one_of(
    st.none(),
    st.builds("\n".join, st.lists(_LINE, min_size=0, max_size=12)),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_DOC, min_size=1, max_size=24))
def test_clean_text_fold_matches_python_twin(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, t string")
    got = {r.id: r.c for r in
           df.select("id", X.clean_text(F.col("t")).alias("c")).collect()}
    for i, d in enumerate(docs):
        assert got[i] == clean_text_py(d), repr(d)

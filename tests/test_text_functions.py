"""Expression tests for the columnar text functions — the reference's
pure-function unit tests (tests/test_transformer.py of the reference)
replayed as 1-row DataFrame expression checks (SURVEY.md §5 strategy a),
plus differential tests of the F.aggregate clean_text fold against its
plain-Python twin."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jira_scraper_etl_spark.functions import text as X
from jira_scraper_etl_spark.functions.text_pandas import clean_text_py


def run_expr(spark, col, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col(F.col("v")).alias("out")).head()[0]


CLEAN_CASES = [
    (None, ""),
    ("  This is a\n\n\ntext with   spaces  ", "This is a text with spaces"),
    ("col1\tcol2\tcol3", "col1 col2 col3"),
    ("line1\r\nline2\r", "line1 line2"),
    ("{code:java}x = 1{code} and {noformat}y{noformat}", "x = 1 and y"),
    ("see https://ci-hadoop.apache.org/job/thing/42/console for logs",
     "see [CI_URL] for logs"),
    # error-block stripping: stack trace dropped, prose kept
    ("It broke.\njava.lang.NullPointerException: boom\n"
     "    at org.apache.Foo.bar(Foo.java:1)\n"
     "    at org.apache.Baz.qux(Baz.java:2)\nPlease fix soon.",
     "It broke. Please fix soon."),
    ("[ERROR] something failed\nnormal text", "normal text"),
    ("Exception in thread main\n  at x.y.z\nAfter", "After"),
    ("Caused by: java.io.IOException\n   ... 3 more\nDone", "Done"),
    ("", ""),
    ("   \n \n ", ""),
]


@pytest.mark.parametrize("raw,expected", CLEAN_CASES)
def test_clean_text_cases(spark, raw, expected):
    assert run_expr(spark, X.clean_text, raw) == expected


@pytest.mark.parametrize("raw,expected", CLEAN_CASES)
def test_clean_text_python_twin_agrees(raw, expected):
    assert clean_text_py(raw) == expected


def test_clean_text_differential_on_documents(spark, sf_dir):
    """Columnar fold vs plain-Python twin over the full documents table."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = d.select("text", X.clean_text(F.col("text")).alias("spark_clean")).collect()
    for r in rows:
        assert r.spark_clean == clean_text_py(r.text)


def test_clean_text_differential_adversarial(spark):
    cases = [
        "a\n" * 50 + "java.lang.Error: x\n  at a.b\n\n  indented\nReset line",
        "»quoted\nnormal",
        " leading space line\njava.x.yException: z\n trailing",
        "{code}\nmulti\n{code} tail",
        "tab\tin\tmiddle\n  at java.base/java.lang.Thread.run\nend",
        "q? a! b. c?\nException\nmore",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "v string")
    out = df.select("v", X.clean_text(F.col("v")).alias("c")).collect()
    for r in out:
        assert r.c == clean_text_py(r.v), r.v


def test_generate_summary(spark):
    df = spark.createDataFrame(
        [("Bug in parser", "The JSON parser fails when given empty input."),
         ("Bug in parser", None),
         ("Bug in parser", "bug in parser breaks everything. More."),
         ("T", "x" * 200 + ". tail"),
         ("Title", "Tiny.")],  # first sentence len <= 5 → title only
        "title string, descr string")
    out = df.select(X.generate_summary(F.col("title"), F.col("descr")).alias("s")).collect()
    assert out[0].s == "Bug in parser - The JSON parser fails when given empty input"
    assert out[1].s == "Bug in parser"
    assert out[2].s == "bug in parser breaks everything"  # startswith → sentence alone
    assert out[3].s == ("T - " + "x" * 200)[:147] + "..."
    assert len(out[3].s) == 150
    assert out[4].s == "Title"


def test_classify_issue(spark):
    df = spark.createDataFrame(
        [("Fix memory leak", ["performance", "other"], "Bug"),
         ("Add new feature for speed", [], None),
         ("nothing relevant", ["security"], "Task"),
         (None, None, None)],
        "summary string, labels array<string>, itype string")
    out = df.select(X.classify_issue(
        F.col("summary"), F.col("labels"), F.col("itype")).alias("c")).collect()
    assert out[0].c == ["bug", "performance"]
    assert out[1].c == ["feature", "performance"]
    assert out[2].c == ["security", "task"]
    assert out[3].c == []


def test_qa_pairs(spark):
    schema = ("descr string, comments array<struct<author:string,body:string,"
              "created:string>>")
    df = spark.createDataFrame(
        [
            ("How do I fix this bug? And why does it happen?",
             [{"author": "a", "body": "short", "created": "t"},
              {"author": "b", "body": "You need to update the library.", "created": "t"}]),
            ("No questions here.", [{"author": "a", "body": "A long enough comment body.",
                                     "created": "t"}]),
            ("Any takers?", []),
        ],
        schema)
    out = df.select(X.qa_pairs(F.col("descr"), F.col("comments")).alias("qa")).collect()
    # both questions paired with the FIRST >10-char comment (reference break quirk)
    assert [dict(p.asDict()) for p in out[0].qa] == [
        {"question": "How do I fix this bug?",
         "answer": "You need to update the library."},
        {"question": "And why does it happen?",
         "answer": "You need to update the library."},
    ]
    assert out[1].qa == []
    assert out[2].qa == []


def test_validation_errors(spark):
    df = spark.createDataFrame(
        [("K-1", "title", "2025-01-01T10:00:00.000+0000", "2025-01-02T11:00:00.000+0000",
          [{"author": "a", "body": "x", "created": "t"}]),
         (None, "", "bad-date", None,
          [{"author": "a", "body": "", "created": "t"}])],
        "id string, title string, created string, updated string, "
        "comments array<struct<author:string,body:string,created:string>>")
    out = df.select(X.validation_errors(
        F.col("id"), F.col("title"), F.col("created"), F.col("updated"),
        F.col("comments")).alias("e")).collect()
    assert out[0].e == []
    assert set(out[1].e) == {"Missing issue ID", "Missing or empty title",
                             "Malformed date in created: bad-date",
                             "Empty comment body at index 0"}


def test_question_extraction_matches_re_findall(spark, tmp_path):
    """The O(n) split reconstruction must equal the reference's
    re.findall(r'([^.!?]+\\?)') on adversarial punctuation layouts,
    including empty questions, leading '?', and mixed terminators."""
    import re as _re

    cases = ["ab?cd?", "a..b?x!y?", "a.?", "??", "", "no questions here",
             "what? ", "x!?y?", "a?b.c?d!e?", "?lead",
             "multi word question here? and.another!one more? end",
             "tail? trailing text without question mark"]
    df = spark.createDataFrame(
        [(i, t, "en", f"s{i}", len(t)) for i, t in enumerate(cases)],
        "doc_id long, text string, lang string, source string, n_chars long")
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/documents.parquet")
    from jira_scraper_etl_spark.plans import QUERIES

    out = {r.doc_id: r for r in
           QUERIES["func_question_extraction"].fn(spark, d).collect()}
    for i, t in enumerate(cases):
        want = _re.findall(r"([^.!?]+\?)", t)
        assert out[i].questions == "|".join(want), (i, t)
        assert out[i].n_questions == len(want), (i, t)

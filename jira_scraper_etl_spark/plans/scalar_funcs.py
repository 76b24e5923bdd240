"""Scalar-function query surface (SURVEY.md §2.8 F1–F19).

The reference implements these with per-row Python ``re``/``str`` calls
(transformer.py:45-189); here every one is a JVM-side columnar
expression inside whole-stage codegen — zero Python in the hot path.
Exercised over the ``documents`` / ``orders`` / ``events`` tables so the
DuckDB oracle can check value-level parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import register


@register(
    "func_text_cleanup",
    oracle=r"""
    SELECT doc_id,
           TRIM(REGEXP_REPLACE(REPLACE(REPLACE(text, CHR(9), ' '), CHR(13), ''),
                               ' {2,}', ' ', 'g')) AS cleaned,
           LOWER(text) AS lowered,
           CASE WHEN LENGTH(text) > 80 THEN SUBSTRING(text, 1, 77) || '...'
                ELSE text END AS preview
    FROM documents
    """,
    tags=("func", "string"),
)
def func_text_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F11 + O3: whitespace collapse, tab/CR strip, trim, lower,
    length-guarded truncation with ellipsis (transformer.py:69-90,141-143
    re-expressed as regexp_replace/translate/trim/substring exprs)."""
    d = load_table(spark, sf_dir, "documents")
    detabbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), "\t", " "), "\r", "")
    return d.select(
        "doc_id",
        F.trim(F.regexp_replace(detabbed, " {2,}", " ")).alias("cleaned"),
        F.lower("text").alias("lowered"),
        F.when(F.length("text") > 80,
               F.concat(F.substring("text", 1, 77), F.lit("...")))
        .otherwise(F.col("text")).alias("preview"),
    )


@register(
    "func_question_extraction",
    oracle=r"""
    SELECT doc_id,
           COALESCE(ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(text, '([^.!?]+\?)', 1), '|'), '')
               AS questions,
           CAST(LENGTH(REGEXP_EXTRACT_ALL(text, '([^.!?]+\?)', 1)) AS INTEGER)
               AS n_questions,
           REGEXP_EXTRACT(SPLIT_PART(text, '.', 1), '^\S+') AS first_word
    FROM documents
    """,
    tags=("func", "string"),
)
def func_question_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 question extraction (transformer.py:103 `re.findall(r'([^.!?]+\\?)')`)
    + F9 first-segment split — arrays surfaced as a joined string so the
    hash compare is representation-independent.

    NOT regexp_extract_all on the Spark side: Java's backtracking
    engine makes `[^.!?]+\\?` O(len²) per document on question-free
    text (each start position rescans to the segment end — measured
    36.2 s for 50k docs at sf1, the worst entry in the profile), while
    DuckDB's RE2 runs the same pattern in linear time. The identical
    semantics O(len): split on '?', and each piece but the last
    contributes its suffix after the final '.'/'!' (non-empty ⇔ the
    regex's `+`), with the '?' re-appended. Equivalence property-checked
    against re.findall in tests/test_text_functions.py."""
    d = load_table(spark, sf_dir, "documents")
    pieces = F.split("text", r"\?")
    qs = F.filter(
        F.transform(
            F.slice(pieces, 1, F.greatest(F.size(pieces) - 1, F.lit(0))),
            lambda p: F.element_at(F.split(p, "[.!]"), -1)),
        lambda x: x != "")
    return d.select(
        "doc_id",
        F.array_join(F.transform(qs, lambda x: F.concat(x, F.lit("?"))),
                     "|").alias("questions"),
        F.size(qs).alias("n_questions"),
        F.regexp_extract(F.element_at(F.split("text", r"\."), 1), r"^\S+", 0)
        .alias("first_word"),
    )


@register(
    "func_summary_composition",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, source AS title,
               TRIM(SPLIT_PART(text, '.', 1)) AS first_sentence
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN LENGTH(summary) > 150 THEN SUBSTRING(summary, 1, 147) || '...'
                ELSE summary END AS summary
    FROM (
        SELECT doc_id,
               CASE WHEN LENGTH(first_sentence) > 5
                         AND NOT STARTS_WITH(LOWER(first_sentence), LOWER(title))
                    THEN title || ' - ' || first_sentence
                    ELSE title END AS summary
        FROM t
    )
    """,
    tags=("func", "string"),
)
def func_summary_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 summary composition (transformer.py:118-145): `title - first
    sentence` unless the sentence already starts with the title
    (case-insensitive), truncated at 150 chars — the reference's derived
    summary task re-expressed as when/concat_ws/substring."""
    d = load_table(spark, sf_dir, "documents")
    title = F.col("source")
    first = F.trim(F.element_at(F.split("text", r"\."), 1))
    summary = F.when(
        (F.length(first) > 5) & ~F.lower(first).startswith(F.lower(title)),
        F.concat_ws(" - ", title, first),
    ).otherwise(title)
    truncated = F.when(F.length(summary) > 150,
                       F.concat(F.substring(summary, 1, 147), F.lit("...")))\
        .otherwise(summary)
    return d.select("doc_id", truncated.alias("summary"))


@register(
    "func_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS INTEGER)
               AS days_to_eoy,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders WHERE o_custkey <= 50
    """,
    tags=("func", "date"),
)
def func_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 date formatting/arithmetic (extract.py:182-186, utils.py:233-244):
    truncation, extraction, interval add, day diff — all columnar."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    return o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.date_add(F.to_date("o_orderdate"), 30).cast("timestamp_ntz").alias("due_ts"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.to_date("o_orderdate"))
        .alias("days_to_eoy"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
    )


@register(
    "func_date_validation",
    oracle=r"""
    SELECT doc_id,
           REGEXP_MATCHES(STRFTIME(TIMESTAMP '2025-01-01 12:00:00', '%Y-%m-%dT%H:%M:%S'),
                          '^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}') AS fmt_ok,
           REGEXP_MATCHES(text, '^\d') AS starts_numeric
    FROM documents
    """,
    tags=("func", "date"),
)
def func_date_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 ISO-timestamp regex validation (transformer.py:213-215) via rlike."""
    d = load_table(spark, sf_dir, "documents")
    iso = F.date_format(F.lit("2025-01-01 12:00:00").cast("timestamp_ntz"),
                        "yyyy-MM-dd'T'HH:mm:ss")
    return d.select(
        "doc_id",
        iso.rlike(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}").alias("fmt_ok"),
        F.col("text").rlike(r"^\d").alias("starts_numeric"),
    )


@register(
    "func_json_extract",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_value,
           CASE WHEN CAST(props->>'$.k' AS BIGINT) >= 50 THEN 'high' ELSE 'low' END
               AS k_band
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("func", "json"),
)
def func_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 JSON decode (utils.py:25-120 boundary parsing) as columnar
    get_json_object over the events.props JSON column."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, F.lit("high")).otherwise(F.lit("low")).alias("k_band"),
    )


@register(
    "func_array_ops",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_tokens,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), ',')
               AS vocab,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
           ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:5], ' ') AS head5
    FROM documents
    """,
    tags=("func", "array"),
)
def func_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 array construction/inspection (split/distinct/sort/contains/
    slice/join) — the reference's list plumbing (transformer.py:161-189)
    over real columns."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("vocab"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("head5"),
    )


@register(
    "func_null_handling",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           IFNULL(NULL, 'Unknown') AS fallback
    FROM customer
    """,
    tags=("func", "null"),
)
def func_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/F6 null-safe access with defaults (the reference's `.get(k,
    default)` / "Unknown" fallbacks, transformer.py:253-256) as
    coalesce/nullif/when chains."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER"))
        .alias("segment_or_other"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high").alias("bal_band"),
        F.coalesce(F.lit(None).cast("string"), F.lit("Unknown")).alias("fallback"),
    )


@register(
    "func_hashing",
    oracle="""
    SELECT doc_id, MD5(text) AS text_md5, SHA256(text) AS text_sha256
    FROM documents
    """,
    tags=("func", "hash"),
)
def func_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 MD5 content hashing (utils.py:122-147 file MD5) as columnar
    md5/sha2 — the building block for exact dedup at scale."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "func_classification_rules",
    oracle="""
    SELECT doc_id,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_FILTER([
               CASE WHEN CONTAINS(LOWER(text), 'slow') OR CONTAINS(LOWER(text), 'fast')
                    THEN 'performance' END,
               CASE WHEN CONTAINS(LOWER(text), 'filter') OR CONTAINS(LOWER(text), 'scan')
                    THEN 'query' END,
               CASE WHEN CONTAINS(LOWER(text), 'stream') THEN 'streaming' END,
               CASE WHEN lang IN ('en', 'de', 'es', 'fr', 'zh') THEN 'known-lang' END
           ], x -> x IS NOT NULL))), ',') AS classes
    FROM documents
    """,
    tags=("func", "classify"),
)
def func_classification_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 keyword multi-label classification (transformer.py:147-189):
    substring rules + whitelist + dedup, as a filtered array of when()
    branches — no UDF, no explode, one projection."""
    d = load_table(spark, sf_dir, "documents")
    low = F.lower("text")
    rules = F.array(
        F.when(low.contains("slow") | low.contains("fast"), "performance"),
        F.when(low.contains("filter") | low.contains("scan"), "query"),
        F.when(low.contains("stream"), "streaming"),
        F.when(F.col("lang").isin("en", "de", "es", "fr", "zh"), "known-lang"),
    )
    classes = F.array_sort(F.array_distinct(
        F.filter(rules, lambda x: x.isNotNull())))
    return d.select("doc_id", F.array_join(classes, ",").alias("classes"))


@register(
    "func_regex_extract",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS BIGINT)
             AS n_long_words,
           CASE WHEN len(regexp_extract_all(text, '[a-z]{5,}')) > 0
                THEN regexp_extract_all(text, '[a-z]{5,}')[1] END
             AS first_long,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
             AS len_no_vowels
    FROM documents
    """,
    tags=("functions", "text"),
)
def func_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface (F16-adjacent): extract-all with count and first
    match, plus a global regexp_replace — the everyday string-mining
    trio. The pattern sticks to character classes + bounded repetition,
    the dialect intersection where Java regex (Spark) and RE2 (DuckDB)
    agree exactly. Map-only; regex compiles once per task, not per
    row."""
    d = load_table(spark, sf_dir, "documents")
    pat = r"[a-z]{5,}"
    # idx=0 = the whole match (Spark defaults to capture group 1,
    # which a group-free pattern doesn't have)
    hits = F.regexp_extract_all(F.col("text"), F.lit(pat), 0)
    return d.select(
        "doc_id",
        F.size(hits).cast("long").alias("n_long_words"),
        F.when(F.size(hits) > 0, F.element_at(hits, 1)).alias("first_long"),
        F.length(F.regexp_replace(F.col("text"), "[aeiou]", ""))
        .cast("long").alias("len_no_vowels"),
    )

"""Set-similarity join by prefix filtering (AllPairs/PPJoin family) and
token-frequency spectrum statistics (Good-Turing count-of-counts).

``dedup_jaccard_prefix`` fills the one gap in the dedup family: an
EXACT Jaccard-threshold join that never goes all-pairs. MinHash/LSH
(dedup_minhash_lsh) trades recall for scale; the gated ground truth
(dedup_ngram_jaccard) is exact but deliberately quadratic on a bounded
slice. Prefix filtering is exact AND subquadratic: under a global
token order (rarest first), any two sets with Jaccard ≥ τ must share a
token inside their short prefixes — so candidates come from a
bucket join on prefix tokens, whose buckets are small BY CONSTRUCTION
(prefixes prefer the rarest tokens). Bayardo et al., "Scaling Up All
Pairs Similarity Search" (WWW'07) is the public reference.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.storagelevel import StorageLevel

from ..catalog import load_table
from ..functions import hashing as H
from ..operators.fanout import LIGHT, fan_out
from .llm_ops import SQL_SHINGLES, SQL_TOKS
from .registry import register

# Jaccard threshold for the registered prefix join. Prefix length for a
# set of size z is z − ceil(τ·z) + 1: the prefix-filtering lemma — the
# ceil(τ·z)-th-from-last common element of any qualifying pair must sit
# inside both prefixes under one global order.
TAU = 0.5


@register(
    "dedup_jaccard_prefix",
    oracle=f"""
    WITH shingled AS (
        SELECT doc_id, sh
        FROM (SELECT doc_id, {SQL_SHINGLES} AS sh
              FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents))
        WHERE len(sh) > 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
             AS jaccard
    FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
          >= {TAU}
    """,
    tags=("dedup", "join"),
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard ≥ 0.5 similarity join over the FULL corpus with no
    all-pairs stage — prefix filtering (AllPairs, WWW'07): order the
    shingle vocabulary globally by (document frequency, shingle), keep
    from each document only the first ``|s| − ceil(τ·|s|) + 1`` tokens
    under that order, and generate candidates by an equi-join on those
    prefix tokens. The lemma guarantees every qualifying pair shares a
    prefix token (zero false negatives — the oracle is the plain
    all-pairs join over the whole table, not a slice); exact
    verification then intersects the full shingle sets of candidates
    only.

    Scale shape: candidate buckets are keyed on the RAREST tokens of
    each document (rarest-first order is what makes prefix buckets
    small — a stopword shingle never lands in a prefix unless the
    document is almost all stopwords), plus the standard length filter
    (τ·|a| ≤ |b| ≤ |a|/τ) prunes mismatched sizes before dedup. The
    expensive stages are two token-keyed shuffles (df count, rank
    join) and one doc-keyed shuffle (re-assembly) — all linear; the
    verify join ships each doc's shingle array once per surviving
    candidate. At 100 TB the arrays would carry 64-bit shingle hashes
    instead of strings (cardinalities unchanged); strings are kept
    here so the oracle's list_intersect sees identical sets."""
    d = load_table(spark, sf_dir, "documents")
    # persisted seam: the interpreted shingling HOF pipeline is the
    # expensive map stage and has THREE consumers (df counts, rank
    # join, verify arrays) — materialize it once (the text_tfidf_topk
    # pattern; Catalyst won't reuse the subtree across branches)
    docs = (fan_out(d.select("doc_id", H.word_shingles(F.col("text"), 3)
                             .alias("sh")), LIGHT)
            .where(F.size("sh") > 0)
            .persist(StorageLevel.MEMORY_AND_DISK))
    docs.count()
    flat = docs.select("doc_id", F.explode("sh").alias("tok"))
    dfreq = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # per-doc tokens sorted by the global (df, tok) order, rarest first
    srt = (flat.join(dfreq, "tok")
           .groupBy("doc_id")
           .agg(F.array_sort(F.collect_list(F.struct("df", "tok")))
                .alias("srt"))
           .withColumn("sz", F.size("srt")))
    # prefix length z − ceil(τ·z) + 1; for τ=1/2: z − (z+1) div 2 + 1
    p = F.col("sz") - F.expr("(sz + 1) div 2") + F.lit(1)
    # persisted too: the candidate self-join consumes prefix TWICE and
    # Catalyst does not reuse the (join ⨝ groupBy) subtree across the
    # aliased sides; the table is small (≈ half the shingle volume)
    prefix = (srt.select(
        "doc_id", "sz",
        F.explode(F.slice(F.transform("srt", lambda x: x["tok"]),
                          F.lit(1), p)).alias("tok"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    prefix.count()
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))
               # length filter: τ·|a| ≤ |b| ≤ |a|/τ (integer-exact)
               & (F.col("b.sz") * 2 >= F.col("a.sz"))
               & (F.col("a.sz") * 2 >= F.col("b.sz")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = docs.select("doc_id", "sh")
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b",
                (inter.cast("double") / union).alias("jaccard"))
        .where(F.col("jaccard") >= TAU)
    )


# ---------------------------------------------------------------------------
# Good-Turing frequency spectrum (count-of-counts)
# ---------------------------------------------------------------------------

@register(
    "ngram_count_of_counts",
    oracle=f"""
    WITH tf AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS r
        FROM (SELECT unnest({SQL_TOKS}) AS tok FROM documents)
        GROUP BY tok
    ),
    spectrum AS (
        SELECT r, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tf GROUP BY r
    )
    SELECT r, n_tokens,
           CASE WHEN LEAD(r) OVER (ORDER BY r) = r + 1
                THEN CAST((r + 1) * LEAD(n_tokens) OVER (ORDER BY r) AS DOUBLE)
                     / n_tokens
                ELSE NULL END AS r_star
    FROM spectrum
    """,
    tags=("textstats", "agg"),
)
def ngram_count_of_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency-of-frequencies (the Good-Turing spectrum): how
    many distinct tokens occur exactly r times, with the Good-Turing
    adjusted count r* = (r+1)·N_{r+1}/N_r where the next frequency
    class exists — the smoothing statistic classical language models
    (Katz backoff) compute over the corpus, and a one-glance
    diagnostic of vocabulary burstiness (Zipf corpora show N_1 ≫ N_2).

    Two map-side-combined shuffles (token counts, then spectrum
    counts); the LEAD window runs over the spectrum, whose cardinality
    is the number of DISTINCT frequencies — O(√total_tokens) by a
    counting argument (Σ r·N_r = T and the r values are distinct, so
    there are at most ~√(2T) classes), safe in a single partition at
    any corpus size. r* is one integer product and one IEEE division —
    bit-identical cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    toks = (fan_out(d.select(H.word_tokens(F.col("text")).alias("toks")),
                    LIGHT)
            .select(F.explode("toks").alias("tok")))
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("r"))
    spectrum = tf.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"))
    w = Window.orderBy("r")
    nxt_r = F.lead("r").over(w)
    nxt_n = F.lead("n_tokens").over(w)
    return spectrum.select(
        "r", "n_tokens",
        F.when(nxt_r == F.col("r") + 1,
               ((F.col("r") + 1) * nxt_n).cast("double") / F.col("n_tokens"))
        .alias("r_star"))

"""Text-analysis columnar functions: language ID, quality scoring,
token statistics, fingerprinting.

All heuristics are expressible as built-in SQL functions (and therefore
oracle-checkable); none require Python in the executor path. These are
the per-document metrics a training-data curation pipeline computes on
every document before filtering — at 100 TB they must stay inside
whole-stage codegen, which they do (one projection, no shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from .hashing import word_tokens

# Tiny per-language function-word lexicons for the n-gram/stopword
# language-ID heuristic. Deliberately small and embedded: language ID at
# scale is a broadcast lookup, not a model call.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"),
}

# BPE-ish word-piece pattern: runs of letters, runs of digits, or a
# single non-alphanumeric non-space symbol — the classic pre-tokenizer
# split used before byte-pair merging.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def stopword_hits(text: Column, lang: str) -> Column:
    """How many distinct stopwords of ``lang`` occur in the text."""
    toks = F.array_distinct(word_tokens(text))
    lex = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, lex))


def predict_language(text: Column) -> Column:
    """Argmax of stopword hits across the embedded lexicons
    ('und' = unknown when nothing matches; ties broken by language code)."""
    scores = [(lang, stopword_hits(text, lang)) for lang in sorted(STOPWORDS)]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("unknown")
    # later languages win ties only if strictly greater → iterate in
    # reverse-sorted order so the lexicographically-first wins a tie.
    for lang, s in reversed(scores):
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def bpe_token_count(text: Column) -> Column:
    """Word-piece token count via the BPE pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def quality_components(text: Column) -> dict[str, Column]:
    """Classic quality-filter signals (Gopher/C4-style):
    char length, word count, mean word length, punctuation ratio,
    digit ratio, stopword ratio."""
    toks = word_tokens(text)
    n_chars = F.length(text)
    n_words = F.size(toks)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    en_hits = stopword_hits(text, "en")
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "mean_word_len": F.when(
            n_words > 0,
            (n_chars - (n_words - 1)).cast("double") / n_words.cast("double"),
        ).otherwise(F.lit(0.0)),
        "punct_ratio": n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"),
        "digit_ratio": n_digit.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"),
        "stopword_ratio": en_hits.cast("double") / F.lit(float(len(STOPWORDS["en"]))),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality score: rewards mid-length docs with
    healthy stopword density, penalizes punctuation/digit noise.
    Deterministic double arithmetic (all weights are binary-exact)."""
    c = quality_components(text)
    length_ok = F.when((c["n_words"] >= 10) & (c["n_words"] <= 1000), F.lit(1.0)) \
        .otherwise(F.lit(0.25))
    return (
        F.lit(0.5) * length_ok
        + F.lit(0.25) * c["stopword_ratio"]
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.lit(1.0), c["punct_ratio"] * 4 + c["digit_ratio"] * 4))
    )


def normalize_for_fingerprint(text: Column) -> Column:
    """Canonical form for content fingerprinting: lowercase, strip
    non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "),
                                   r" {2,}", " "))

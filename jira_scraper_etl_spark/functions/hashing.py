"""Deterministic, engine-portable hashing primitives for dedup sketches.

Design decision: every sketch derives from ``md5`` hex digests, because
Spark and DuckDB produce byte-identical md5 hex — which makes every
sketch operator oracle-checkable. MinHash uses the Kirsch-Mitzenmacher
construction (``km_hash``): one md5 per shingle expanded into k 32-bit
integer family members via ``(h1 + i·h2) mod 2³²`` — k× cheaper than k
seeded hashes, and signatures shuffle as longs, not hex strings. At
100 TB you'd swap the md5 base hash for ``xxhash64`` (no hex
round-trip) — the operator shapes are unchanged; the md5 variant is the
portable/testable reference implementation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def seeded_md5(col: Column, seed: int) -> Column:
    """md5 hex of ``seed || ':' || value`` — one independent hash family
    member per seed."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def word_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (empty tokens removed)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column. Callers on the hot path should tokenize into a real
    column first (ideally behind an exchange) so the tokenization
    expression is evaluated once, not once per reference — the
    interpreted higher-order pipeline below references the array ~6×.
    """
    k = F.size(toks)
    # arrays_zip of n shifted slices, NOT element_at(toks, i) inside the
    # lambda: interpreted higher-order functions re-evaluate the full
    # tokenization expression on every element_at reference (~3× per
    # shingle), which turns shingling quadratic-ish per document. The
    # zip form evaluates the token array a constant number of times.
    shifted = [F.slice(toks, j + 1, F.greatest(k - (n - 1), F.lit(0))) for j in range(n)]
    grams = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]),
    )
    return F.array_distinct(
        F.when(k >= n, grams).otherwise(F.array(F.array_join(toks, " ")))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text.

    The shingle basis for MinHash / Jaccard dedup. Documents shorter
    than ``n`` words fall back to their full token sequence as a single
    shingle, so short docs still participate. Convenience composition —
    for large corpora prefer tokenizing into a column and calling
    ``shingles_from_tokens`` (see its docstring).
    """
    return shingles_from_tokens(word_tokens(text), n)


MOD32 = 4294967296  # 2^32


def km_hash(md5_hex: Column, i: int) -> Column:
    """Kirsch-Mitzenmacher hash-family member i from an md5 hex digest:
    ``(h1 + i·h2) mod 2³²`` where h1/h2 are the digest's two 32-bit hex
    halves. One real hash yields k family members — the standard trick
    for cheap MinHash signatures (also used for Bloom filters)."""
    h1 = F.conv(F.substring(md5_hex, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(md5_hex, 9, 8), 16, 10).cast("bigint")
    return (h1 + F.lit(i) * h2) % F.lit(MOD32)


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """MinHash signature: array of k min-over-shingles KM hashes (bigint).

    Per-row expression form (no shuffle, no UDF) for array-column
    callers; the distributed pipeline in operators/dedup.py computes the
    same values via explode + min-aggregate, which is the shape that
    scales. Empty shingle sets produce nulls (filtered by callers)."""
    ms = F.transform(shingles, lambda s: F.md5(s))

    def member(i: int) -> Column:
        # one-arg lambda on purpose: a two-arg transform lambda is
        # (element, ARRAY INDEX) in PySpark — binding the family id via
        # a default arg silently turned i into the element position
        # (caught by tests/test_hashing_differential.py)
        return F.array_min(F.transform(ms, lambda m: km_hash(m, i)))

    return F.array(*[member(i) for i in range(k)])


def band_keys(signature: Column, bands: int, rows: int) -> Column:
    """LSH band keys: md5 of each band's concatenated signature rows.

    Two docs collide on band b iff their signature rows [b*rows,
    (b+1)*rows) are all equal. Returns array<struct<band:int, key:string>>
    ready to explode into the bucket-join."""
    entries = []
    for b in range(bands):
        rows_b = [F.element_at(signature, b * rows + r + 1).cast("string")
                  for r in range(rows)]
        entries.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *rows_b)).alias("key"),
        ))
    return F.array(*entries)


def hex4_to_int(hex4: Column) -> Column:
    """First-4-hex-chars → 16-bit int, via conv (portable: the oracle
    reproduces it with position arithmetic)."""
    return F.conv(hex4, 16, 10).cast("int")


def simhash16(tokens: Column) -> Column:
    """16-bit SimHash over a token array.

    Classic sign-of-weighted-bit-sums construction: each token
    contributes +1/-1 to each of 16 bit positions according to the bits
    of its (md5-derived) 16-bit hash; the fingerprint sets bit i when
    the sum is positive. Pure columnar fold — per-row, no shuffle.
    """
    tok_hashes = F.transform(tokens, lambda t: hex4_to_int(F.substring(F.md5(t), 1, 4)))
    # accumulate per-bit counts in an array<int>[16] via aggregate fold
    zero = F.array(*[F.lit(0) for _ in range(16)])
    counts = F.aggregate(
        tok_hashes,
        zero,
        lambda acc, h: F.array(*[
            acc[i] + F.when(h.bitwiseAND(F.lit(1 << i)) > 0, 1).otherwise(-1)
            for i in range(16)
        ]),
    )
    bits = [F.when(counts[i] > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(16)]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")

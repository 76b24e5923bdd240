"""Dedup operators: MinHash-LSH and SimHash pipelines.

Performance note (why these are DataFrame operators, not per-row array
expressions): Spark's higher-order functions (transform/aggregate) are
interpreted, not whole-stage-codegen'd — a 16-hash signature as 16
array-transforms costs ~2 ms/doc. Restructured as
``explode(shingles) → 16 codegen'd md5 columns → groupBy(doc).agg(min×16)``
the same values come out of vectorized hash aggregation with map-side
partial combine — the shape that holds at 100 TB (shuffle carries only
doc_id + 16 hashes, never the shingle arrays).

Hash values are identical to functions/hashing.py (Kirsch-Mitzenmacher
integer family over md5 halves) — the DuckDB oracles in plans/llm_ops.py
mirror the same arithmetic digit-for-digit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions.hashing import shingles_from_tokens, word_tokens
from .fanout import HEAVY, fan_out

N_HASHES, N_BANDS, BAND_ROWS = 16, 4, 4

# Corpus-derived (bands, rows) ladder — the "next-decade lever"
# BASELINE.md named after the sf100 probe measured candidate volume
# growing ~n^1.4 under the fixed 4×4 banding: per-band random
# collisions scale as E[J^rows] and stop discriminating once n² swamps
# it, so ROWS must grow with log(n) to hold candidates/doc flat — the
# same trade as derive_rp_bits. Each extra row suppresses a random
# pair's per-band survival by its (low) Jaccard while a true near-dup
# at the J=0.8 design point only loses ×0.8 — the BAND count rung
# compensates recall, which is non-decreasing up the ladder:
#   (4 bands, 4 rows): 1-(1-0.8^4)^4 ≈ 0.878   (n ≤ 2^20 — every
#       oracle-checked SF and the sf1/sf10 soaks: ladder inert)
#   (6 bands, 5 rows): 1-(1-0.8^5)^6 ≈ 0.908   (n ≤ 2^23 — sf100's 5M)
#   (9 bands, 6 rows): 1-(1-0.8^6)^9 ≈ 0.935   (beyond)
# STATIC thresholds, not a runtime formula, so the DuckDB oracle
# mirrors the ladder as a CASE over COUNT(*) with zero float risk.
MINHASH_LADDER = ((1 << 20, 4, 4), (1 << 23, 6, 5))
MINHASH_TOP = (9, 6)


def derive_minhash_br(n: int) -> tuple[int, int]:
    """(bands, rows) for a corpus of ``n`` documents — fixed 4×4 below
    2^20, the candidate-suppressing ladder above."""
    for cap, bands, rows in MINHASH_LADDER:
        if n <= cap:
            return bands, rows
    return MINHASH_TOP


def shingled_docs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, sh: array<string>) — distinct word n-gram shingles per doc.

    Two-stage on purpose: tokenize, exchange, then shingle from the
    token *attribute*. The exchange (a) fans a small single-file scan
    out across all cores before the expensive interpreted shingle
    pipeline, and (b) is a CollapseProject barrier, so the tokenization
    expression is evaluated once per row instead of once per reference
    (~6× inside shingles_from_tokens). Measured 3.4s → 0.6s at sf0.1.
    """
    # `sh` is non-empty for every non-null text (empty/whitespace docs
    # fall back to a single joined-token shingle), so the "has shingles"
    # guard is exactly `text IS NOT NULL` — which pushes into the
    # parquet scan. Filtering on size(sh) instead gets predicate-pushed
    # below the exchange and re-inlines the whole shingle expression
    # into a pre-exchange single-threaded Filter (2.6s at sf0.1).
    #
    # The conditional exchange sits on the RAW text: a small corpus is
    # one file split, and anything computed pre-exchange runs on one
    # core (HEAVY preset: the md5-per-shingle pipeline costs ~6 s/MB
    # single-core; a wide warehouse scan skips the exchange entirely).
    # Tokenize and shingle are separate post-exchange projections;
    # CollapseProject leaves them alone (the token array is non-cheap
    # and referenced ~6× by the shingle expression), so tokenization is
    # evaluated once per row.
    raw = fan_out(df.where(F.col(text_col).isNotNull())
                  .select(id_col, text_col), HEAVY)
    toks = raw.select(id_col, word_tokens(F.col(text_col)).alias("toks"))
    return toks.select(id_col, shingles_from_tokens(F.col("toks"), n).alias("sh"))


MOD32 = 4294967296  # 2^32 — Kirsch-Mitzenmacher family modulus


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       k: int = N_HASHES) -> DataFrame:
    """(id, mh0..mh{k-1}) integer MinHash signature columns.

    explode → ONE md5 per shingle → Kirsch-Mitzenmacher family
    ``h_i = (h1 + i·h2) mod 2³²`` (h1/h2 = the md5's two 32-bit hex
    halves) → k min-aggregates. One cryptographic hash instead of k
    (was k seeded md5s: 2.3s → 0.3s at sf0.1), and the shuffle carries
    k longs per doc, not k 32-char hex strings. Partial aggregation
    runs map-side, so shuffle size is independent of document size.

    Staged as separate projections (md5, then halves) so the non-cheap
    md5/substring expressions are evaluated once, not once per
    reference — CollapseProject keeps them apart."""
    exploded = docs.select(id_col, F.explode("sh").alias("s"))
    m = exploded.select(id_col, F.md5("s").alias("m"))
    hp = m.select(
        id_col,
        F.conv(F.substring("m", 1, 8), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring("m", 9, 8), 16, 10).cast("bigint").alias("h2"),
    )
    return hp.groupBy(id_col).agg(
        *[F.min((F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(MOD32)).alias(f"mh{i}")
          for i in range(k)])


def band_keys_df(sig: DataFrame, id_col: str = "doc_id",
                 bands: int = N_BANDS, rows: int = BAND_ROWS) -> DataFrame:
    """(id, key): one row per LSH band; key = xxhash64(band_index,
    band's signature rows) — an 8-byte long with the band index folded
    in, so every downstream exchange carries one long instead of the
    former (band int, 32-char md5 hex) pair. Band keys are engine-local
    equivalence classes, never output values: the DuckDB oracle in
    plans/llm_ops.py models the same classes with md5-of-concat, and
    equal signature tuples produce equal keys under both (the exact
    Jaccard verify stage makes sub-2⁻⁶⁴ cross-band collisions harmless).
    This is the hash-compaction that took dedup_jaccard_prefix from
    464 s to 33.9 s at sf1 (BASELINE.md), applied to the MinHash path."""
    entries = F.array(*[
        F.xxhash64(F.lit(b), *[F.col(f"mh{b * rows + r}") for r in range(rows)])
        for b in range(bands)
    ])
    return sig.select(id_col, F.explode(entries).alias("key"))


def candidate_pairs(banded: DataFrame, id_col: str = "doc_id",
                    max_bucket_size: int = 256,
                    chain_width: int = 2,
                    dedup: bool = True) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any LSH bucket. The join is
    keyed on the 8-byte band key — bucket-local quadratic only.

    Pathological buckets (boilerplate corpora: thousands of docs
    sharing a band key) would make even the bucket-local join O(n²), so
    buckets larger than ``max_bucket_size`` degrade to a *chain*: the
    bucket's members are ranked by id and each pairs only with its next
    ``chain_width`` neighbors — O(n·W) pairs, and every member still
    lands in one connected component downstream (consecutive pairs keep
    the bucket connected), which is what dedup clustering needs. Buckets
    at or under the cap produce exactly the same pairs as the plain
    self-join (the oracle models the uncapped form; measured max bucket
    size at sf0.1 is far below the default cap, so both agree at test
    scale).

    Shape: ONE window pass over key annotates every row with its
    bucket size and in-bucket rank, and the annotated frame is a
    PERSIST SEAM (round-13 optimization). The former shape relied on
    Catalyst's ReusedExchange to share the window's exchange across
    the four consumers below (small a/b, big probe/build) — but the
    planner broadcast-hashes the self-join's build side at bench
    scale, and a BroadcastExchange cannot reuse a shuffle exchange, so
    the ENTIRE upstream signature pipeline (shingle explode → md5 →
    k min-aggregates → band explode → window) re-ran once per branch:
    4 copies, measured in the sf0.1 plan (guide §2.4 — remove
    duplicated subtrees). The seam is narrow (key, id, bsz, rn ≈ 28
    bytes × n·bands rows) and bounded at any corpus size; both window
    functions share one (partitionBy key, orderBy id) spec so the
    annotation is a single Window operator (bsz via the
    unbounded-unbounded frame — identical value to the unordered
    count, one less Sort pass)."""
    from ..seams import persist_seam

    w = Window.partitionBy("key").orderBy(id_col)
    annotated = banded.select(
        "key", F.col(id_col),
        F.count("*").over(w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("bsz"),
        F.row_number().over(w).alias("rn"),
    )
    annotated = persist_seam(annotated)
    small = annotated.where(F.col("bsz") <= max_bucket_size)
    a, b = small.alias("a"), small.alias("b")
    small_pairs = (
        a.join(b, (F.col("a.key") == F.col("b.key"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )
    big = annotated.where(F.col("bsz") > max_bucket_size)
    probe = big.select(
        "key", F.col(id_col).alias("id_a"),
        F.explode(F.array(*[(F.col("rn") + j) for j in range(1, chain_width + 1)]))
        .alias("rn_b"),
    )
    big_pairs = (
        probe.join(big.select("key", F.col(id_col).alias("id_b"),
                              F.col("rn").alias("rn_b")),
                   ["key", "rn_b"])
        .select("id_a", "id_b")
    )
    out = small_pairs.unionByName(big_pairs)
    # ``dedup=False`` callers aggregate over the pair stream (MIN-id
    # verdicts), which absorbs multi-band duplicates for free — they
    # skip this full exchange of the candidate stream (the RP-verdict
    # rationale, plans/llm_ops._rp_qualifying_pairs).
    return out.dropDuplicates(["id_a", "id_b"]) if dedup else out


def _fits_broadcast(df: DataFrame) -> bool:
    """Whether the planner would broadcast ``df`` as a join side —
    Catalyst's own size estimate (for a materialized persist seam:
    the measured cached bytes) against the session's
    autoBroadcastJoinThreshold. Used to apply join-strategy hints only
    in the regime they were written for (non-broadcastable sides)."""
    from .fanout import _parse_bytes, _plan_size_bytes

    size = _plan_size_bytes(df)
    if size is None:
        return False
    try:
        thr = _parse_bytes(
            df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except Exception:
        thr = 10 * 1024 * 1024
    return 0 < size < thr


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    inter = F.size(F.array_intersect(sh_a, sh_b))
    return inter.cast("double") / (F.size(sh_a) + F.size(sh_b) - inter)


def minhash_near_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           threshold: float = 0.2,
                           bands: int | None = None,
                           rows: int | None = None,
                           dedup_candidates: bool = True) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    bucket-join → exact-Jaccard verify ≥ threshold.
    Output: (doc_a, doc_b, jaccard).

    ``bands``/``rows`` default to the corpus-derived ladder
    (derive_minhash_br) — fixed 4×4 at every test/soak SF, widening
    signatures past 2^20 docs to hold candidates/doc flat (the sf100
    n^1.4 candidate growth BASELINE.md measured under fixed banding).
    The count that drives the ladder is one metadata-only job against
    the input. ``bands`` and ``rows`` must be passed together — the
    ladder derives them as a pair (signature width = bands*rows), so
    honoring one caller value while rederiving the other would
    silently change the signature geometry (ADVICE r12)."""
    from ..seams import persist_seam

    if (bands is None) != (rows is None):
        raise ValueError(
            "minhash_near_dup_pairs: pass bands and rows together "
            f"(got bands={bands}, rows={rows}); the ladder derives "
            "them as a pair")
    if bands is None:
        bands, rows = derive_minhash_br(df.count())
    # shingling is the expensive map stage and is needed by BOTH the
    # signature path and the verify path — persist so it runs once
    # (at 100 TB: materialize the shingled corpus to parquet instead;
    # caller releases via seams.release_seams). persist_seam fills the
    # cache EAGERLY: the downstream DAG fans out into several
    # concurrent shuffle-map stages (signature, verify-a, verify-b)
    # and concurrent first readers of a lazy persist each recompute
    # the full shingle pipeline (measured 4× duplicate 1.6s stages
    # at sf0.1).
    docs = persist_seam(shingled_docs(df, id_col, text_col))
    sig = minhash_signatures(docs, id_col, k=bands * rows)
    banded = band_keys_df(sig, id_col, bands=bands, rows=rows)
    cand = candidate_pairs(banded, id_col, dedup=dedup_candidates)
    # join candidate ids back to shingle sets for the verify stage.
    # SHUFFLE_HASH on the corpus sides (the RP family's sf100 lesson,
    # relearned here at the sf300 decade): a sort-merge join SORTS both
    # inputs, and the verify stream carries the WIDE shingle arrays —
    # at sf300 (15M docs) the SMJ sorts spilled >50 GB of shingle
    # payload and ENOSPC'd the probe box. A hash join builds on the
    # corpus side (bounded by corpus size / partitions) and never
    # sorts the pair stream.
    #
    # The hint is applied ONLY when the corpus side is past the
    # session's broadcast threshold (round-13, guide §3.1): below it
    # the planner broadcasts the corpus projection and the verify
    # needs NO exchange at all — the unconditional hint was forcing
    # two full corpus exchanges + per-partition hash builds to verify
    # a few hundred pairs at bench scale (measured 2.0 s of the 3.5 s
    # query). The hint exists to override SMJ, and SMJ is only ever
    # picked when broadcast already doesn't apply — so hinting
    # exactly the non-broadcastable regime preserves the sf300 fix.
    #
    # The verify payload is hash-compacted to 8-byte xxhash64 keys
    # (round-13 optimization; the dedup_jaccard_prefix / substring
    # hash64 precedent applied to this path): shingle strings average
    # ~25 bytes, so the two verify exchanges AND both hash-relation
    # builds shrink ~3-4×. Jaccard is a function of intersection /
    # union SIZES over the per-doc-distinct shingle sets, so the value
    # is bit-identical to the string form unless two distinct shingles
    # of one compared pair collide in 64 bits (≈|union|²/2⁶⁵ per pair,
    # ~10⁻¹² at decade scale — the string-based DuckDB oracle and the
    # hashed-vs-string equality test would both surface one). Computed
    # AFTER the persist seam, per side: a map-only projection over the
    # cached corpus, so nothing upstream re-runs and the narrow form
    # never widens the seam itself.
    sh64 = F.transform(F.col("sh"), lambda s: F.xxhash64(s))
    sa = docs.select(F.col(id_col).alias("id_a"), sh64.alias("sh_a"))
    sb = docs.select(F.col(id_col).alias("id_b"), sh64.alias("sh_b"))
    # size the HASHED projection, not the string seam (round-13 ADVICE
    # #1): the join ships sa/sb, whose arrays are ~3-4× narrower than
    # the cached strings — Catalyst's projection estimate scales the
    # measured seam size by the schema-width ratio, so gating on sa
    # matches the planner's own broadcast decision for the actual side
    # (gating on docs forced two corpus exchanges in the window where
    # the strings exceed the threshold but the hashed arrays fit).
    if not _fits_broadcast(sa):
        sa, sb = sa.hint("shuffle_hash"), sb.hint("shuffle_hash")
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard")
    )


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(id, simhash): 16-bit SimHash as a pure map-only columnar fold
    (functions/hashing.simhash16 over word_tokens). ZERO shuffles —
    fingerprinting is embarrassingly parallel, and the fold is ~2×
    faster than the former explode→groupBy form at sf0.1 (measured,
    value-identical). Docs with null/empty text get simhash 0."""
    from ..functions.hashing import simhash16

    return df.select(
        id_col,
        simhash16(word_tokens(F.coalesce(F.col(text_col), F.lit(""))))
        .alias("simhash"),
    )


def _check_nibble_hamming(max_hamming: int) -> None:
    """4-nibble banding is lossless only for hamming <= 3 (pigeonhole
    over 4 blocks); larger radii would silently drop pairs that share
    no nibble block — shared guard for both public simhash APIs."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming={max_hamming}: 4-nibble banding is lossless only "
            f"for hamming <= 3 (pigeonhole over 4 blocks); larger radii "
            f"would silently drop pairs that share no nibble block")


def simhash_fp_pairs(fps: DataFrame, col: str = "simhash",
                     max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs over DISTINCT fingerprint VALUES — the contracted
    (≤ 2^16-node) form of the simhash graph, via the same lossless
    nibble-block banding as :func:`simhash_near_dup_pairs`. This is the
    graph dedup_cluster_canonical solves components on, and the
    scale-sound way to audit simhash adjacency: the fingerprint graph
    is bounded BY CONSTRUCTION regardless of corpus size, while the
    doc-pair expansion is O(Σ|clique|²) and explodes on dup-dense or
    fingerprint-saturated corpora (500k docs into 2^16 values ⇒
    billions of doc pairs). Output: (fa, fb) with fa < fb, hamming ≤
    ``max_hamming``."""
    _check_nibble_hamming(max_hamming)
    blocks = fps.select(
        col,
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftright(col, i * 4).bitwiseAND(F.lit(0xF))
                     .alias("nib"))
            for i in range(4)
        ])).alias("b"),
    ).select(col, "b.blk", "b.nib")
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.nib") == F.col("b.nib"))
               & (F.col(f"a.{col}") < F.col(f"b.{col}")))
        .select(F.col(f"a.{col}").alias("fa"), F.col(f"b.{col}").alias("fb"))
        .dropDuplicates(["fa", "fb"])
        .where(F.bit_count(F.col("fa").cast("long")
                           .bitwiseXOR(F.col("fb").cast("long")))
               <= max_hamming)
    )


def simhash_near_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs at hamming ≤ max_hamming via lossless
    nibble-block banding (pigeonhole over 4 blocks ⇒ exact for ≤ 3).
    Output: (doc_a, doc_b, hamming).

    SCALE WARNING: the output is the PAIR LISTING — O(Σ|clique|²) rows
    on dup-dense corpora (>1 GiB of result at the sf1 soak's 31-token
    vocabulary). Use :func:`simhash_neighbor_stats` (bounded per-doc
    form) or the cluster labeling (plans/llm_ops dedup_cluster_canonical)
    when the duplicate density is unknown; this pair form is for bounded
    slices and verify stages."""
    _check_nibble_hamming(max_hamming)
    # fan out of the single-file scan partition before per-token hashing
    # (same rationale as minhash_near_dup_pairs)
    fp = simhash_fingerprints(
        fan_out(df.select(id_col, text_col), HEAVY), id_col, text_col)
    blocks = fp.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftright("simhash", i * 4).bitwiseAND(F.lit(0xF)).alias("nib"))
            for i in range(4)
        ])).alias("b"),
    ).select(id_col, "simhash", "b.blk", "b.nib")
    a, b = blocks.alias("a"), blocks.alias("b")
    hamming = F.bit_count(F.col("sh_a").cast("long").bitwiseXOR(F.col("sh_b").cast("long")))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.nib") == F.col("b.nib"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )

def simhash_neighbor_stats(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           max_hamming: int = 3) -> DataFrame:
    """Per-document SimHash near-dup statistics — the BOUNDED output
    form of :func:`simhash_near_dup_pairs`: one row per document,
    ``(id, n_neighbors, min_neighbor)`` where neighbors are the other
    docs at hamming ≤ max_hamming (``min_neighbor`` NULL when none).

    Never materializes a doc-pair anywhere: the computation runs on the
    CONTRACTED fingerprint graph (one node per distinct 16-bit value,
    ≤ 2¹⁶ nodes at any corpus size — the dedup_cluster_canonical
    contraction argument). Per-fingerprint clique stats (size, two
    smallest ids) come from two keyed aggregations over the fingerprint
    column; cross-fingerprint adjacency from the lossless nibble-band
    join over DISTINCT fingerprints only. A doc's neighbor count is
    then (own clique − 1) + Σ sizes of adjacent cliques, and its min
    neighbor the least of the adjacent cliques' minima and its own
    clique's min (second-min when the doc IS the min). Every stage is
    map-side combinable; output cardinality = corpus size. This is the
    form that survives dup-dense corpora where the pair listing is
    O(Σ|clique|²).
    """
    _check_nibble_hamming(max_hamming)
    # fp feeds three consumers (clique agg, second-min agg, the final
    # join-back); checkpoint so the tokenize+hash map pass runs once —
    # at warehouse scale this seam is a parquet materialization
    from ..seams import checkpoint_seam
    fp = checkpoint_seam(simhash_fingerprints(
        fan_out(df.select(id_col, text_col), HEAVY), id_col, text_col))
    cl = fp.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("m1"))
    # second-smallest id per clique (NULL for singleton cliques): one
    # more keyed agg — no collect_list, so hot cliques stay cheap
    m2 = (fp.join(cl.select("simhash", "m1"), "simhash")
          .where(F.col(id_col) > F.col("m1"))
          .groupBy("simhash").agg(F.min(id_col).alias("m2")))
    cl = cl.join(m2, "simhash", "left")

    # cross-fingerprint adjacency = the shared contracted-graph pair
    # join, symmetrized (each fingerprint must see ALL its neighbors)
    fpp = simhash_fp_pairs(cl.select("simhash"), max_hamming=max_hamming)
    adj = (fpp.select(F.col("fa").alias("simhash"), F.col("fb").alias("g"))
           .unionByName(fpp.select(F.col("fb").alias("simhash"),
                                   F.col("fa").alias("g"))))
    ext = (adj.join(cl.select(F.col("simhash").alias("g"),
                              F.col("n_docs").alias("g_docs"),
                              F.col("m1").alias("g_m1")), "g")
           .groupBy("simhash")
           .agg(F.sum("g_docs").alias("ext_cnt"), F.min("g_m1").alias("ext_min")))

    out = fp.join(cl, "simhash").join(ext, "simhash", "left")
    own_min = F.when(F.col(id_col) == F.col("m1"), F.col("m2")) \
               .otherwise(F.col("m1"))
    return out.select(
        F.col(id_col),
        (F.col("n_docs") - 1 + F.coalesce(F.col("ext_cnt"), F.lit(0)))
        .cast("long").alias("n_neighbors"),
        F.least(F.col("ext_min"), own_min).alias("min_neighbor"),
    )

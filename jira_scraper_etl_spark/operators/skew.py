"""Skew mitigation: salted joins for hot keys.

AQE's skew-join (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) splits oversized SortMergeJoin partitions at runtime and is
the FIRST line of defense — use it and do nothing. Salting is the
manual fallback for the cases AQE can't fix: a broadcast-ineligible
build side, aggregation-before-join on the hot key, or a stream-static
join where runtime re-planning is unavailable. The transformation is
classic: spray the big side's rows across S sub-keys, replicate the
small side S×, join on (key, salt) — identical result, hot key spread
over S partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key spray.

    ``big`` rows get a uniform salt in [0, S); ``small`` rows are
    replicated once per salt value; the join keys on (key, salt). The
    result is row-identical to the plain join (salt columns dropped) —
    only the partitioning of the shuffle changes: a key holding X% of
    the big side now occupies S partitions instead of one. Cost: the
    small side shuffles S× its size — keep S near the skew factor, not
    higher."""
    big_s = big.withColumn("_salt",
                           F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_join_cond(big: DataFrame, other: DataFrame, cond,
                     salt: int = 8, how: str = "inner") -> DataFrame:
    """Salted join with an arbitrary join condition — the big×big form.

    ``cond(big_salted, other_salted) -> Column`` builds the full join
    condition (the skewed key equality plus any residual range/band
    predicates); this function adds the salt equality. ``big`` rows get
    one uniform salt each, ``other`` rows are replicated ``salt``×, so
    a left join stays row-correct (each big row matches exactly the one
    replica set carrying its salt — no duplicate or lost rows).

    This is the fallback for joins neither AQE nor broadcast rescues:
    both sides large (broadcast-ineligible) AND the condition carries a
    residual band predicate, which AQE's skew-split can rebalance only
    after the skewed sort-merge partitions already formed. Cost is the
    ``salt``× replication of ``other`` — at warehouse scale, restrict
    ``other`` to the hot keys' rows first (hot-key isolation) and union
    the cold remainder through a plain join. The two frames must have
    disjoint column names (rename before calling)."""
    big_s = big.withColumn("_salt",
                           F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    other_s = (other.withColumn(
        "_salt2", F.explode(F.array(*[F.lit(i) for i in range(salt)]))))
    out = big_s.join(other_s,
                     cond(big_s, other_s) & (big_s["_salt"] == other_s["_salt2"]),
                     how)
    return out.drop("_salt", "_salt2")

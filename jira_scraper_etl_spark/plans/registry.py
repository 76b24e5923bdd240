"""Registry of driver-facing queries and their DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 gets one entry: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (where ANSI-SQL can
express the same semantics) an equivalent DuckDB SQL string. The
correctness harness compares row count + schema + order-insensitive
value hash, sorting columns by NAME — so every computed column must be
aliased identically on both sides.

Cross-engine numeric determinism
--------------------------------
Floating-point SUM is order-dependent; Spark's parallel partial/final
aggregation and DuckDB's sequential scan would disagree in the last
bits. All money arithmetic therefore goes through exact DECIMAL:
``SUM(CAST(x AS DECIMAL(12,2)))`` is exact in both engines, and the
final cast to DOUBLE then produces bit-identical values. AVG is always
expressed as exact-decimal SUM divided by COUNT (DuckDB's AVG(DECIMAL)
returns DOUBLE computed incrementally, which would not match).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a ``(spark, sf_dir) -> DataFrame`` callable to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # a repeated name would silently shadow the earlier entry (and
        # its oracle) for every harness that reads the registry
        assert name not in QUERIES, f"duplicate registry name: {name}"
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle,
                              doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


# ---------------------------------------------------------------------------
# Cross-engine numeric helpers (see module docstring).
# ---------------------------------------------------------------------------

MONEY = "decimal(12,2)"  # 2-decimal money/rate columns; products stay exact


def dsum(col: Column | str, alias: str) -> Column:
    """Exact decimal SUM of a 2-decimal column, surfaced as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double").alias(alias)


def o_dsum(expr: str, alias: str) -> str:
    # DECIMAL→VARCHAR→DOUBLE, not DECIMAL→DOUBLE: DuckDB's direct cast
    # computes unscaled·10⁻ˢᶜᵃˡᵉ in float arithmetic, which is off by an
    # ulp once the unscaled value exceeds 2^53 (seen at the sf1 soak);
    # string conversion is correctly rounded and matches Spark's
    # BigDecimal.doubleValue exactly at any magnitude.
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS VARCHAR)"
            f" AS DOUBLE) AS {alias}")


def davg(col: Column | str, alias: str) -> Column:
    """Exact decimal AVG (sum/count) of a 2-decimal column, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(MONEY)).cast("double") / F.count(c)).alias(alias)


def o_davg(expr: str, alias: str) -> str:
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)"
            f" / COUNT({expr}) AS {alias}")


def money(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


RATE = "decimal(3,2)"  # discount/tax factors in [0, 1): 2-decimal rates


def one_minus_rate(col: Column | str) -> Column:
    """Exact ``(1 - rate)`` as DECIMAL(4,2). Typing matters: a bare
    ``F.lit(1)`` infers DECIMAL(10,0) and inflates every downstream
    product's precision — ``price*(1-disc)*(1+tax)`` then exceeds
    precision 38 and Spark silently ROUNDS each row's product to a
    reduced scale. The drift is invisible at small row counts but
    crosses a double ulp vs the oracle's exact arithmetic at the sf1
    soak's magnitudes. Bounding the rate to DECIMAL(3,2) keeps the
    whole product chain exact: (12,2)·(4,2)·(4,2) → (22,6) ≤ 38."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lit(1).cast(RATE) - c.cast(RATE)


def one_plus_rate(col: Column | str) -> Column:
    """Exact ``(1 + rate)`` as DECIMAL(4,2) — see one_minus_rate."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lit(1).cast(RATE) + c.cast(RATE)


def lsum(col: Column | str, alias: str) -> Column:
    """SUM of an integer column as BIGINT (DuckDB SUM(BIGINT) is HUGEINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long").alias(alias)


def o_lsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT) AS {alias}"

"""Skew-aware join queries: the registered exercise of operators/skew.py.

The ``events`` table is the natural skew case: a handful of event_type
values cover the whole table (Zipf-ish — 'click' dominates), so an
equi-join keyed on event_type puts the hot type's entire row mass in
one shuffle partition. ``salted_join`` sprays the big side across S
sub-keys and replicates the small side S×, bounding any partition at
~1/S of the hot key. AQE's skew-join handles the SortMergeJoin case at
runtime; the salted form is the planner-independent fallback that also
covers stream-static joins and broadcast-ineligible build sides (see
operators/skew.py). Result rows are identical to the plain join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_events
from ..operators.skew import salted_join
from .registry import register, davg, o_davg


@register(
    "join_skewed_events_by_type",
    oracle=f"""
    WITH dim AS (
        SELECT event_type, {o_davg("value", "type_avg")}
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value, d.type_avg,
           e.value - d.type_avg AS value_dev
    FROM events e JOIN dim d ON e.event_type = d.event_type
    """,
    tags=("join", "skew"),
)
def join_skewed_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key enrichment join, salted: every event joins its per-type
    aggregate (avg value) back onto the fact. event_type has ~5 distinct
    values over the whole table — the textbook skewed key — so the big
    side is sprayed over 8 salts and the tiny dim is replicated 8×; the
    hot type's shuffle partition shrinks 8× while output rows stay
    identical to the unsalted join. Dim aggregation is one map-side-
    combined shuffle on event_type (exact decimal avg for cross-engine
    parity); the salted join shuffles on (event_type, _salt).
    """
    ev = load_events(spark, sf_dir).select("event_id", "event_type", "value")
    dim = ev.groupBy("event_type").agg(davg("value", "type_avg"))
    out = salted_join(ev, dim, "event_type", salt=8)
    return out.select(
        "event_id", "event_type", "value", "type_avg",
        (F.col("value") - F.col("type_avg")).alias("value_dev"),
    )

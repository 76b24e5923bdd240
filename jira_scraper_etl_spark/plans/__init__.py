"""Query plans: the driver-facing registry of (Spark query, SQL oracle) pairs."""

from .registry import QUERIES, Query, queries, oracle_sql  # noqa: F401

# Importing the plan modules populates the registry.
from . import relational  # noqa: F401,E402
from . import scalar_funcs  # noqa: F401,E402
from . import event_time  # noqa: F401,E402
from . import llm_ops  # noqa: F401,E402
from . import corpus_ops  # noqa: F401,E402
from . import jira_parity  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402

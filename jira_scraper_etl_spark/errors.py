"""Engine-level exception types.

``RegimeRefused`` distinguishes a *routing decision* — an operator
pricing a regime and declining it with instructions — from a genuine
bug raising ``ValueError`` (bad argument, malformed data). The bench
harness records only ``RegimeRefused`` in its ``refused`` dict; any
other exception is a real failure and must crash the run (ADVICE r8:
catching bare ValueError silently dropped genuine bugs from the
wall-clock total).

It subclasses ``ValueError`` so pre-existing callers that caught the
routing error keep working.
"""

from __future__ import annotations


class RegimeRefused(ValueError):
    """An operator refused to run a regime it priced as unaffordable.

    Raised only when the caller explicitly disabled graceful
    degradation (``fallback=False``) — the default behavior of every
    budget-guarded operator is to degrade to a cheaper method and mark
    the output with a ``method`` provenance column, not to refuse.
    """

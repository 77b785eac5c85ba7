"""Custom operators the DataFrame API doesn't ship natively.

Each is a composition of built-in ops where semantics allow (SURVEY.md
§5: "custom work is algorithmic, not planner-level"), falling back to
Arrow-batched Pandas UDFs only where per-group imperative logic is
irreducible (FSM).
"""

from trembita_spark.operators.fsm import fsm_scan, sessionize, sessionize_fsm
from trembita_spark.operators.joins import asof_join, range_join

__all__ = ["fsm_scan", "sessionize", "sessionize_fsm", "asof_join", "range_join"]

"""2-D skyline (Pareto frontier) operator.

A row p is on the skyline iff no row strictly dominates it: q dominates
p when q is ≤ p on the minimized dimension and ≥ p on the maximized one,
strictly better on at least one. The naive formulation is an O(n²)
anti-join — fine for an oracle, fatal at 100 TB. For two dimensions the
frontier has a monotone structure, so the operator computes it with ONE
shuffle and two hash aggregates + a window:

1. collapse to one row per minimized-dimension value, keeping the max of
   the maximized dimension (per-group candidates);
2. running max of that over strictly-smaller minimized values (ROWS
   UNBOUNDED PRECEDING .. 1 PRECEDING over the collapsed — i.e. tiny —
   frame);
3. a candidate survives iff it beats every cheaper group's best; join
   the survivors back to recover all tied originals.

The window in step 2 runs over ONE partition, but over the *collapsed*
per-value frame (distinct minimized values), not the raw rows — the
standard trick's footprint is the frontier's domain, orders of magnitude
below the input. If the minimized dimension's cardinality itself is
huge, pre-prune with a coarse bucket-local skyline first (skyline of a
union = skyline of the union of partial skylines — the operator is
idempotent and distributive, so a ``df.repartition(...)`` +
per-partition pass composes safely in front of this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    hint_broadcast: bool | None = None,
) -> DataFrame:
    """Rows of ``df`` not strictly dominated on (minimize ↓, maximize ↑).

    Duplicate (minimize, maximize) points dominate each other only
    non-strictly, so ties all survive — same convention as the NOT
    EXISTS strict-dominance oracle.

    ``hint_broadcast``: the frontier is bounded by the minimized
    dimension's cardinality — exactly the quantity the module docstring
    warns can be huge — so the join-back is NOT force-broadcast by
    default (None lets Catalyst/AQE pick from its runtime size
    estimate). Pass True only when the caller can bound that
    cardinality (e.g. a price grid or enum dimension).
    """
    lo, hi = F.col(minimize), F.col(maximize)
    per_value = df.groupBy(minimize).agg(F.max(maximize).alias("_best"))
    w = (
        Window.orderBy(minimize)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_value.withColumn("_prev_best", F.max("_best").over(w))
        .where(F.col("_prev_best").isNull() | (F.col("_best") > F.col("_prev_best")))
        .select(minimize, F.col("_best").alias(maximize))
    )
    # recover every tied original row (and its other columns)
    if hint_broadcast:
        frontier = F.broadcast(frontier)
    return df.join(frontier, [minimize, maximize], "left_semi")

"""Result shaping: the ``QueryResult`` nested grouping tree.

The reference's QL returns a HIERARCHICAL result — grouping by
(g1, g2, …, gn) yields an n-level tree with aggregation totals at every
level and the leaf groups at the bottom (reference:
kernel/src/main/scala/trembita/ql/QueryResult.scala, unverified;
SURVEY.md §3.4 "nested grouping tree + per-level totals").

Spark-first, the TREE IS A ROLLUP: ``Query.rollup(...).with_grouping_id``
computes every level's totals in one Expand + one shuffle. This module
is the driver-side adapter that folds those flat rollup rows into the
reference's nested shape — a presentation step over an already-small
aggregate, NOT a distributed operation (never call it on unaggregated
data)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def rollup_tree(
    df: DataFrame, keys: list[str], gid_col: str = "gid"
) -> dict[str, Any]:
    """Fold rollup+grouping_id rows into a nested dict:

    ``{"totals": {...aggs...}, "groups": {g1_value: {"totals": ...,
    "groups": {g2_value: ...}}}}``

    ``df`` must be the output of ``Query.rollup(...)
    .with_grouping_id(gid_col)`` — i.e. contain one row per rollup level
    (gid has k trailing 1-bits when the last k keys are rolled up).
    """
    rows = df.collect()
    agg_cols = [c for c in df.columns if c not in keys and c != gid_col]
    tree: dict[str, Any] = {"totals": None, "groups": {}}
    for row in rows:
        d = row.asDict()
        # number of grouped (non-rolled-up) keys for this row
        gid = d[gid_col]
        level = len(keys) - bin(gid).count("1")
        node = tree
        for k in keys[:level]:
            node = node["groups"].setdefault(d[k], {"totals": None, "groups": {}})
        node["totals"] = {a: d[a] for a in agg_cols}
    return tree

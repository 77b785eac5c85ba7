"""Mergeable sketch columns — the incremental-aggregation pattern at
100 TB: compute a small binary sketch per partition/day/shard ONCE,
persist it, and answer "distinct users over any date range" by unioning
sketches instead of rescanning raw data.

Spark-native: ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` (Apache DataSketches HLL under the hood,
public Spark 3.5+ API). The union of per-group sketches is
register-wise max, so merging partials is EXACTLY equivalent to
sketching the whole dataset — estimate-identical, not approximately so
(asserted in tests/test_operators.py). DuckDB has no compatible sketch,
so contract-level checking uses the exact-count + within-tolerance
pattern (q_agg_approx_distinct precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) per group over ``value_col``. This is the
    persistable unit: write it partitioned by the group key and the raw
    data never needs rescanning for distinct-count queries."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias("sketch")
    )


def hll_union_estimate(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketches (optionally re-grouped to a coarser key) and
    report the distinct estimate. Merging N partial sketches is one
    tiny shuffle of fixed-size binaries — never a rescan."""
    agg = F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("distinct_est")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)

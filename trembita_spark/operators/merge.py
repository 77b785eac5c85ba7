"""Snapshot merge (upsert): apply a change batch onto a base table.

Plain parquet has no MERGE INTO (that's a table-format feature —
Delta/Iceberg); the scalable equivalent on immutable storage is a
snapshot rewrite: full-outer join base↔changes on the key, changed rows
win, unmatched sides pass through. Deterministic, idempotent (re-applying
the same batch yields the same snapshot), and partition-friendly: at
100 TB both sides hash-partition on the key once, and if the base is
bucketed by the key the join is shuffle-free on the big side. Write the
result partitioned by the same key family and the next merge prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """New snapshot = changes upserted over base, matched on ``key``.

    Columns are taken from ``changes`` when the key matched (update) or
    is new (insert), else from ``base`` — column sets must be identical.
    """
    assert set(base.columns) == set(changes.columns), "schemas must match"
    cols = base.columns
    b = base.select([F.col(c).alias(f"b_{c}") for c in cols])
    c = changes.select([F.col(col).alias(f"c_{col}") for col in cols])
    joined = b.join(c, b[f"b_{key}"] == c[f"c_{key}"], "full_outer")
    # Row-wise selection on KEY presence, not per-column coalesce: a
    # change row must win wholesale even where it carries legitimate
    # NULLs (per-column coalesce would resurrect the base value).
    take_change = F.col(f"c_{key}").isNotNull()
    return joined.select(
        *[
            F.when(take_change, F.col(f"c_{col}"))
            .otherwise(F.col(f"b_{col}"))
            .alias(col)
            for col in cols
        ]
    )

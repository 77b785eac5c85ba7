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


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Diff two snapshots of the same table by primary key: one row per
    key present in either side with change_type ∈ {'added', 'removed',
    'changed'} (unchanged keys drop out), plus the old/new values of the
    compared columns. The time-travel / audit primitive: "what did this
    load change?".

    One full outer join on the key — a single co-partitioned shuffle at
    any scale (both snapshots hash on the same key; bucketed layouts
    make it exchange-free). Change detection is null-safe equality over
    ``compare_cols`` so NULL→value and value→NULL count as changes.
    """
    o = old.select(key, *compare_cols)
    n = new.select(key, *compare_cols)
    renamed_o = o.select(
        F.col(key), *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("_in_old", F.lit(True))
    renamed_n = n.select(
        F.col(key), *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("_in_new", F.lit(True))
    j = renamed_o.join(renamed_n, key, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            key,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    validate: bool = False,
) -> DataFrame:
    """Apply a full CDC batch (``op`` ∈ {'I','U','D'}) onto a snapshot:
    deletes drop the key, updates/inserts win wholesale (same row-wise
    rule as :func:`merge_upsert`). If a key appears multiple times in
    the batch the caller must pre-collapse to the LAST op per key
    (standard CDC compaction) — that uniqueness is the CALLER's
    responsibility by default (a duplicate key silently fans out rows
    through the full-outer join); pass ``validate=True`` to pay one
    extra aggregate over the (small) change batch and fail loudly
    instead.

    Shape: ONE full-outer join on the key (deletes are just matched
    rows where no output is produced) — same single co-partitioned
    shuffle as the upsert; at 100 TB bucket the base by the key and the
    big side never re-shuffles.
    """
    data_cols = [c for c in changes.columns if c != op_col]
    assert set(base.columns) == set(data_cols), "schemas must match"
    if validate:
        dup = (
            changes.groupBy(key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"cdc_apply: duplicate key {dup[0][0]!r} in change batch — "
                "compact to the last op per key before applying"
            )
    cols = base.columns
    b = base.select([F.col(c).alias(f"b_{c}") for c in cols])
    c = changes.select(
        [F.col(col).alias(f"c_{col}") for col in data_cols]
        + [F.col(op_col).alias("_op")]
    )
    joined = b.join(c, b[f"b_{key}"] == c[f"c_{key}"], "full_outer")
    keep = F.col("_op").isNull() | (F.col("_op") != "D")
    take_change = F.col(f"c_{key}").isNotNull() & (F.col("_op") != "D")
    return joined.where(keep).select(
        *[
            F.when(take_change, F.col(f"c_{col}"))
            .otherwise(F.col(f"b_{col}"))
            .alias(col)
            for col in cols
        ]
    )

"""As-of and range joins — join shapes Spark lacks natively
(SURVEY.md §3.3 [EXT]; the reference has only predicate theta-joins via
CanJoin — kernel/src/main/scala/trembita/operations/CanJoin.scala,
unverified).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' = next
    right row with ``right.ts >= left.ts``), matching on ``on``.

    Implementation: tag + union + running ``last(..., ignorenulls)``
    window — ONE shuffle on the join key, linear work, no range
    explosion. This is the 100 TB-safe pattern: the alternative
    (per-key ``pd.merge_asof``) requires each key's history to fit in
    one task. Ties (equal ts) match, as in DuckDB's ASOF >=.
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(on).alias(on),
        F.col(ts).alias(ts),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (on, ts)],
    )
    tagged_l = left.select(
        on,
        ts,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
        *[F.col(c) for c in lcols if c not in (on, ts)],
    )
    unioned = tagged_r.unionByName(tagged_l)
    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = F.last
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = F.first
    out = unioned
    for c in right_value_cols:
        src = F.when(F.col("__side") == 0, F.col(f"__r_{c}"))
        out = out.withColumn(f"__m_{c}", pick(src, ignorenulls=True).over(w))
    result = out.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__m_{c}").alias(f"{c}_asof") for c in right_value_cols],
    )
    return result


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    value: Column,
    lo: Column,
    hi: Column,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Join rows to intervals: ``lo <= value < hi``. With a small interval
    table, broadcast + BNLJ (each interval probe is a scan-local filter —
    no shuffle of the big side). If both sides are large, bucketize the
    range key into equi-join prefilter candidates instead."""
    r = F.broadcast(ranges) if broadcast_ranges else ranges
    return left.join(r, (value >= lo) & (value < hi), "inner")

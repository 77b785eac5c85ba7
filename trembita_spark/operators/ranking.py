"""Scale-safe global ranking primitives.

Global ORDER BY windows (`row_number()/ntile() OVER (ORDER BY ...)` with
no PARTITION BY) funnel every row through ONE task — the classic
100×-scale killer. These operators compute the same results through the
distributed prefix-sum in :meth:`trembita_spark.pipeline.Pipeline.
zip_with_index` (range-partition on the sort key → partition-local
row_number → broadcast per-partition offsets), so the data path never
collapses to a single partition; only the ≤ num_partitions-row offsets
frame is serial (reference: the CanSort/ranking operator family,
SURVEY.md §3.1 — unverified).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ntile_exact(
    df: DataFrame,
    order_by: Sequence[Column | str],
    n: int,
    name: str = "ntile",
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_by)`` without a global
    window.

    Matches SQL ntile bit-for-bit: with N rows, the first ``N % n``
    buckets take ``N div n + 1`` rows, the rest ``N div n`` — recovered
    arithmetically from each row's 0-based position (distributed
    prefix-sum) plus a broadcast scalar row count. ``order_by`` must be
    a unique total order (tie rows would otherwise be assigned by
    physical order, which no deterministic engine contract allows).

    Cost: one range-partition shuffle + a partition-local window + two
    tiny broadcasts; at 100 TB this is the same shape as a distributed
    sort, with no single-task stage on the data path.
    """
    from trembita_spark.pipeline import Pipeline

    if n < 1:
        raise ValueError(f"ntile_exact: n must be >= 1, got {n}")
    pos_col, n_col = f"__{name}_pos0", f"__{name}_n"
    # the input feeds TWO branches (positions + scalar count) and Spark
    # never shares subtrees — a lazy localCheckpoint materializes the
    # input once instead of recomputing its lineage per branch (and
    # keeps chained ntile_exact calls linear, not 2^k, in plan size).
    df = df.localCheckpoint(eager=False)
    with_pos = Pipeline(df).zip_with_index(order_by, pos_col).df
    total = df.agg(F.count(F.lit(1)).alias(n_col))
    out = with_pos.crossJoin(F.broadcast(total))
    # q = N div n, r = N mod n; positions < r*(q+1) fall in the r "big"
    # buckets. The float division under floor() is exact here: quotients
    # are < n and operands far below 2^52. greatest(q,1) guards the
    # (unreachable when p0 >= cutoff) ANSI div-by-zero for N < n.
    p0, N = F.col(pos_col), F.col(n_col)
    q = F.floor(N / n).cast("long")
    r = N % n
    cutoff = r * (q + 1)
    big = F.floor(p0 / (q + 1)) + 1
    small = r + F.floor((p0 - cutoff) / F.greatest(q, F.lit(1))) + 1
    tile = F.when(p0 < cutoff, big).otherwise(small).cast("int")
    return out.withColumn(name, tile).drop(pos_col, n_col)

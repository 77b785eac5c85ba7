"""Two-sample rank statistics as reusable operators.

Both tests run on the DISTINCT-VALUE frame, not the rows: a hash
aggregate to (value, n_a, n_b), then the distributed two-phase prefix
sum (`ranking.prefix_sum_multi` — one range shuffle for every running
count), then a scalar rollup. No row-level global sort, no
low-cardinality window; at 100 TB the shuffled frame is the value
support.

Exactness discipline (the contract's parity rule): tied-average ranks
are kept as 2·rank (an exact integer), the KS supremum runs on the
integer cross-difference |ca·n_b − cb·n_a|, and tie/variance moments
stay in integer/decimal lanes; only the final statistic is a double
expression chain a SQL oracle can replay bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trembita_spark.operators.ranking import prefix_sum, prefix_sum_multi


def _arm_counts(df: DataFrame, value_col: str, is_a: Column) -> DataFrame:
    x = df.select(
        F.col(value_col).alias("v"),
        F.when(is_a, 1).otherwise(0).alias("is_a"),
    ).where(F.col("v").isNotNull())
    return x.groupBy("v").agg(
        F.sum("is_a").cast("bigint").alias("na"),
        F.sum(F.lit(1) - F.col("is_a")).cast("bigint").alias("nb"),
    )


def mann_whitney_u(df: DataFrame, value_col: str, is_a: Column) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) of ``value_col`` between the
    rows where ``is_a`` holds (arm A) and the rest (arm B), with the
    tie-corrected normal approximation. Returns one row:
    (n_a, n_b, u_stat, z_stat).

    The tied-average rank of a value with cum_before rows below it and
    n occurrences is cum_before + (n+1)/2, so 2·rank is the integer
    2·cum_before + n + 1 — every moment is exact until the final
    z expression."""
    pv = _arm_counts(df, value_col, is_a)
    pv = pv.withColumn("n", F.col("na") + F.col("nb"))
    c = prefix_sum(pv, "n", order_by=[F.col("v")], name="cumn")
    s = c.agg(
        F.sum("na").cast("bigint").alias("n_a"),
        F.sum("nb").cast("bigint").alias("n_b"),
        F.sum(
            F.col("na") * (2 * (F.col("cumn") - F.col("n")) + F.col("n") + 1)
        ).cast("bigint").alias("r2a"),
        F.sum(
            F.when(
                F.col("n") > 1, F.col("n") * F.col("n") * F.col("n") - F.col("n")
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("ties"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    bigint_u2 = F.col("r2a") - n_a * (n_a + 1)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731 — exact big-integer lane
    s_dec = dec(n_a) * dec(n_b) * (
        dec(n_a + n_b + 1) * dec(n_a + n_b) * dec(n_a + n_b - 1) - dec(F.col("ties"))
    )
    denom = F.sqrt(
        s_dec.cast("double")
        / (12 * (n_a + n_b) * (n_a + n_b - 1)).cast("double")
    )
    return s.select(
        "n_a",
        "n_b",
        (bigint_u2.cast("double") / 2).alias("u_stat"),
        ((bigint_u2 - n_a * n_b).cast("double") / 2 / denom).alias("z_stat"),
    )


def ks_2samp(df: DataFrame, value_col: str, is_a: Column) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D = max |F_a - F_b| over the pooled
    value support, plus the sqrt(n_a·n_b/N)-scaled effect statistic.
    Returns one row: (n_a, n_b, ks_stat, ks_scaled)."""
    pv = _arm_counts(df, value_col, is_a)
    c = prefix_sum_multi(pv, ["na", "nb"], order_by=[F.col("v")], names=["ca", "cb"])
    tot = pv.agg(
        F.sum("na").cast("bigint").alias("n_a"),
        F.sum("nb").cast("bigint").alias("n_b"),
    )
    num = F.max(F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")))
    ks = num.cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            ks.alias("ks_stat"),
            (
                ks
                * F.sqrt(
                    (F.col("n_a") * F.col("n_b")).cast("double")
                    / (F.col("n_a") + F.col("n_b")).cast("double")
                )
            ).alias("ks_scaled"),
        )
    )

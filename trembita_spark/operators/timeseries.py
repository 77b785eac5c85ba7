"""Time-series operators: bucketed rollup + gap filling + forward fill.

The "hypertable rollup / continuous aggregate" shape: raw events →
fixed-grain buckets → a DENSE per-key time grid (empty buckets
materialized) → forward-filled measures. Downstream consumers (charting,
feature windows, rate-of-change) need the dense grid; the raw table has
holes wherever nothing happened.

Scale posture: one groupBy on (key, bucket) with partial aggregation;
the grid explode is bounded per key by its own time span; one window per
key for the fill. No collect, no RNG, no per-row Python. At 100 TB,
partition the rollup output by bucket date — the grid join and the fill
window both co-partition on the key, so AQE keeps it to the one shuffle
the rollup already paid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rollup_gapfill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "hour",
) -> DataFrame:
    """Per-key ``grain``-bucketed rollup on a DENSE grid spanning each
    key's [min bucket, max bucket], with count 0 on empty buckets and
    the value measure forward-filled from the last non-empty bucket.

    Returns (key, hour, n_events, filled_value). The measure is a
    decimal-exact sum cast to double (bit-deterministic under any
    partial-agg merge order).
    """
    bucket = F.date_trunc(grain, F.col(ts_col))
    hourly = df.groupBy(F.col(key_col), bucket.alias("h")).agg(
        F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("v"),
        F.count(F.lit(1)).alias("n"),
    )
    bounds = hourly.groupBy(key_col).agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        key_col,
        F.explode(F.sequence("h0", "h1", F.expr(f"INTERVAL 1 {grain}"))).alias("h"),
    )
    joined = grid.join(hourly, [key_col, "h"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col(key_col),
        F.col("h").alias("hour"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    grain: str = "hour",
) -> DataFrame:
    """Downsample a tick stream into OHLC bars (open/high/low/close +
    count) per key and ``grain`` bucket — the market-data/metrics
    resample shape. One partial+final hash aggregate: open/close are
    ``min_by``/``max_by`` over the (ts, id) total order (id breaks
    equal-timestamp ties deterministically), so the whole bar is a
    commutative monoid and the shuffle carries |bars|, not |ticks|."""
    bucket = F.date_trunc(grain, F.col(ts_col))
    order = F.struct(F.col(ts_col), F.col(id_col))
    return df.groupBy(F.col(key_col), bucket.alias("bar_ts")).agg(
        F.min_by(F.col(value_col), order).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), order).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def interpolate_linear(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "hour",
) -> DataFrame:
    """Per-key dense grid with LINEAR interpolation across empty buckets
    (vs :func:`rollup_gapfill`'s step-function forward fill): an empty
    bucket between two observed ones gets the time-weighted blend
    ``prev + (next − prev) · (t − t_prev)/(t_next − t_prev)``; leading /
    trailing gaps extend the nearest observed value flat.

    The measure on observed buckets is the bucket MEAN (decimal-exact
    sum / count).

    The dense grid spans each key's [min observed bucket, max observed
    bucket] and the fill is expressed segment-wise: pair each NON-NULL
    observed bucket with its next non-null observed bucket (one ``lead``
    window over the rollup, |buckets| rows, not |grid| rows) and explode
    the hours in between. An all-null bucket (every value in it NULL →
    NULL mean) is NOT a segment anchor — interpolation passes through it
    using the surrounding non-null buckets, exactly the registered
    oracle's ``IGNORE NULLS`` last/first semantics — but it still counts
    toward the per-key grid bounds, so a leading/trailing null bucket
    extends the grid and is filled flat from the nearest non-null value.
    A key with NO non-null bucket keeps its own buckets as anchors and
    every emitted value is NULL (the interpolation expression nulls out),
    again matching the oracle. Single lineage — no self-join, no bounds
    pass, no checkpoint — and every op downstream of the rollup is
    clustered on the key, so the scan spread is the only shuffle in the
    plan.
    """
    from trembita_spark.io import spread_scan

    step = F.expr(f"INTERVAL 1 {grain}")
    bucket = F.date_trunc(grain, F.col(ts_col))
    hourly = spread_scan(df, key_col).groupBy(
        F.col(key_col), bucket.alias("h")
    ).agg(
        (
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    # Per-key grid bounds over ALL buckets (incl. null-mean ones) — an
    # unordered window on the same hash(key) partitioning, no extra
    # shuffle. count("v") skips nulls: nn == 0 flags the all-null key.
    w_all = Window.partitionBy(key_col)
    marked = hourly.select(
        key_col,
        "h",
        "v",
        F.min("h").over(w_all).alias("h0"),
        F.max("h").over(w_all).alias("h1"),
        F.count("v").over(w_all).alias("nn"),
    )
    anchors = marked.filter(F.col("v").isNotNull() | (F.col("nn") == 0))
    w = Window.partitionBy(key_col).orderBy("h")
    seg = anchors.select(
        key_col,
        "h",
        "v",
        "h0",
        "h1",
        F.lead("h").over(w).alias("nh"),
        F.lead("v").over(w).alias("nv"),
        F.row_number().over(w).alias("rn"),
    )
    # [start, end] per segment: the first anchor starts at the key's grid
    # floor h0 (leading flat fill), the last anchor runs to the grid
    # ceiling h1 (trailing flat fill); interior segments cover [h, nh).
    start = F.when(F.col("rn") == 1, F.col("h0")).otherwise(F.col("h"))
    end = F.when(F.col("nh").isNotNull(), F.col("nh") - step).otherwise(F.col("h1"))
    g = seg.select(
        key_col,
        "h",
        "v",
        "nh",
        "nv",
        F.explode(F.sequence(start, end, step)).alias("g"),
    )
    t, tp, tn = (F.unix_timestamp(c) for c in (F.col("g"), F.col("h"), F.col("nh")))
    interp = F.col("v") + (F.col("nv") - F.col("v")) * (
        (t - tp).cast("double") / (tn - tp).cast("double")
    )
    return g.select(
        F.col(key_col),
        F.col("g").alias("hour"),
        F.when(F.col("g") <= F.col("h"), F.col("v"))  # flat lead-in + the anchor itself
        .when(F.col("nh").isNull(), F.col("v"))  # flat tail-out past the last anchor
        .otherwise(interp)
        .alias("value"),
    )


def ohlc_rollup(
    bars: DataFrame,
    key_col: str = "user_id",
    bar_ts_col: str = "bar_ts",
    grain: str = "day",
) -> DataFrame:
    """Merge fine OHLC bars into coarser ones WITHOUT re-reading ticks —
    the hypertable/continuous-aggregate maintenance shape: OHLC is a
    commutative monoid over bars (open = open of earliest bar, close =
    close of latest, high/low = max/min, count = sum), so a day bar is
    one partial+final hash aggregate over 24 hour-bars instead of a
    rescan of the tick stream. ``bar_ts`` is unique per (key, fine bar)
    — a deterministic min_by/max_by ordering key. At 100 TB: rollups
    read |bars| ≪ |ticks|; chain hour→day→month without ever touching
    raw data again."""
    bucket = F.date_trunc(grain, F.col(bar_ts_col))
    return bars.groupBy(F.col(key_col), bucket.alias(bar_ts_col)).agg(
        F.min_by("open", bar_ts_col).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", bar_ts_col).alias("close"),
        F.sum("n_ticks").alias("n_ticks"),
    )

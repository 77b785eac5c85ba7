"""Event-time windowed aggregations — tumbling / sliding / session.

Batch and streaming share these builders (a DataFrame is a DataFrame);
the contract checks the batch form against DuckDB ``time_bucket`` /
island SQL, and the streaming form is executed to completion over the
same fixture and must produce identical rows.

Scale notes: windowed aggs shuffle once on (window, keys); watermarks
bound state for unbounded runs; session windows merge incrementally in
the state store (no per-key materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Fixed windows: count + exact decimal value sum per (window, type)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


def sliding_window_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Overlapping windows (each event lands in width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), "n", "total_value")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Data-driven session windows per user: window end extends to
    last-event + gap (Spark session_window semantics)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )

"""Round-5 operator sample — scale-safe ranking and event analytics
composed over the fixtures:

ranking: exact NTILE quartiles via the distributed prefix sum (no
global window) → RFM-style customer scores; attribution: last-touch
purchase↔click as-of join with a 1-hour microsecond-exact lookback;
intervals: purchase-window × click-window overlap join via bucket-grid
candidates; corpus: temperature-scaled (α=0.5) source mixture weights.

Every stage is the oracle-checked operator the contract registers; this
file just shows them composed.

Run: python examples/ranking_attribution_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.contract import table
from trembita_spark.operators.joins import asof_join, interval_overlap_join
from trembita_spark.operators.ranking import ntile_exact
from trembita_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="ranking_attribution_sample")
    ev = table(spark, sf_dir, "events")

    # 1. quartile scores without a global ntile window
    spend = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("monetary"))
    )
    scored = ntile_exact(spend, [F.desc("monetary"), F.col("user_id")], 4, "m_score")
    print("== monetary quartiles (ntile_exact) ==")
    scored.groupBy("m_score").count().orderBy("m_score").show()

    # 2. last-touch attribution: purchase ← most recent click within 1h
    p = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    attrib = asof_join(
        p, c, on="user_id", ts="ts", right_value_cols=["click_ts"],
        tolerance_seconds=3600,
    )
    print("== attribution rate ==")
    attrib.agg(
        F.avg(F.col("click_ts_asof").isNotNull().cast("double")).alias("attributed_frac")
    ).show()

    # 3. interval overlap: 30-min purchase windows × 10-min click windows
    pi = p.select(
        F.col("event_id").alias("p_id"), "user_id",
        F.col("ts").alias("p_s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("p_e"),
    )
    ci = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id",
        F.col("ts").alias("c_s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("c_e"),
    )
    overlaps = interval_overlap_join(
        pi, ci, on="user_id",
        left_start="p_s", left_end="p_e", right_start="c_s", right_end="c_e",
        bucket_seconds=1800,
    )
    print("== overlapping purchase/click windows ==", overlaps.count())

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

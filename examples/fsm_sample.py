"""FSM sample — the reference's stateful flagship (pipeline.fsm):
sessionize a user event stream with a 30-minute inactivity gap, both as
the scalable expression path and the arbitrary-Python FSM path.

Run: python examples/fsm_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trembita_spark.contract import table
from trembita_spark.operators.fsm import sessionize, sessionize_fsm
from trembita_spark.session import get_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="fsm_sample")
    events = table(spark, sf_dir, "events")
    expr_path = sessionize(events, gap_minutes=30)
    fsm_path = sessionize_fsm(events, gap_minutes=30)
    summary = (
        expr_path.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("start"))
        .orderBy("user_id", "session_id")
    )
    summary.show(10, truncate=False)
    print("expression path sessions:", expr_path.select("user_id", "session_id").distinct().count())
    print("python-FSM path sessions:", fsm_path.select("user_id", "session_id").distinct().count())
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

"""Streaming sample — the reference's Akka/DStream story upgraded to
Structured Streaming: unbounded source → watermarked tumbling window →
run to completion over the finite fixture.

Run: python examples/streaming_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trembita_spark.session import get_session
from trembita_spark.streaming.sources import events_stream, run_to_completion
from trembita_spark.streaming.windows import tumbling_window_agg

def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session(app_name="streaming_sample")
    agg = tumbling_window_agg(events_stream(spark, sf_dir))
    out = run_to_completion(agg, "streaming_sample_sink", output_mode="complete")
    out.orderBy("wstart", "event_type").show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

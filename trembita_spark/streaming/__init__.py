"""Structured Streaming surface.

The reference's streaming story is "same stateless operators on an
unbounded carrier" (Akka ``Source`` / ``DStream`` environments —
integrations/akka/streams and integrations/spark/streaming, unverified)
plus the FSM operator for state; it has NO event-time, watermark, window,
or late-data semantics (SURVEY.md §3.8). This engine uses Structured
Streaming and adds those semantics as first-class operators; each
windowed aggregation has a batch-equivalent form so the DuckDB oracle
can check it, and streaming execution itself is proven by running the
same plan through a memory sink to completion.
"""

from trembita_spark.streaming.sources import events_stream
from trembita_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "events_stream",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
]

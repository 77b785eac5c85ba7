"""FSM operator — per-key ordered state machines (batch) + sessionization.

The reference's flagship stateful operator (reference:
kernel/src/main/scala/trembita/fsm/ — FSM builder DSL with
``when(State){...}`` transitions and ``FSMContext`` actions
goto/stay/modify/push; CanFSM instances for Sequential and Akka
environments — unverified; SURVEY.md §3.8).

Spark-first mapping:

- **Default path (scalable, expression-only):** most FSMs people write
  (sessionization, run detection, gap analysis) are expressible as
  window expressions — ``lag`` + flag + running ``sum`` ("island
  detection"). One shuffle on the key, whole-stage codegen, no Python.
  :func:`sessionize` is this path.
- **General path:** :func:`fsm_scan` runs an arbitrary Python
  transition function per key in timestamp order via
  ``groupBy(key).applyInPandas`` (Arrow-batched). Memory bound: one
  key's rows must fit in an executor task — at 100 TB split sessions
  upstream (e.g. by day) or keep states in the expression path.
- **Streaming path:** :mod:`trembita_spark.streaming.stateful` ports the
  same transition function onto ``applyInPandasWithState``.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fsm_scan(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    transition: Callable[[Any, dict], tuple[Any, dict | None]],
    initial_state: Callable[[], Any],
    output_schema: str,
) -> DataFrame:
    """Run a state machine over each key's rows in ``order_cols`` order.

    ``transition(state, row_dict) -> (new_state, out_dict | None)`` — the
    moral equivalent of the reference's ``FSM.Result`` push/stay/goto.
    Emits one output row per input row for which ``out_dict`` is not None.
    """

    def run_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        state = initial_state()
        out = []
        for row in pdf.to_dict("records"):
            state, emitted = transition(state, row)
            if emitted is not None:
                out.append(emitted)
        return pd.DataFrame(out)

    return df.groupBy(*key_cols).applyInPandas(run_group, output_schema)


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign 1-based session ids per key: a new session starts when the
    gap since the previous event exceeds ``gap_minutes``.

    Expression-only island detection — lag + boundary flag + running sum.
    One shuffle on ``key``; scales to any number of keys (per-key data
    streams through the window operator sorted, never materialized as a
    Python object)."""
    # Under-split local inputs run the whole scan single-task; spreading
    # on the window key parallelizes it and doubles as the window's
    # required hash distribution (no extra exchange; no-op at production
    # split counts — see io.spread_scan).
    from trembita_spark.io import spread_scan

    df = spread_scan(df, key)
    w = Window.partitionBy(key).orderBy(ts, "event_id") if "event_id" in df.columns else Window.partitionBy(key).orderBy(ts)
    prev_ts = F.lag(ts).over(w)
    gap_us = F.unix_micros(F.col(ts)) - F.unix_micros(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("session_id", F.sum(new_session).over(w))


def sessionize_fsm(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    """Sessionization through the GENERAL FSM path (``applyInPandas``) —
    semantically identical to aggregating :func:`sessionize`, kept as the
    arbitrary-Python-state demonstration. Returns one row per session:
    (key, session_id, n_events, session_start, session_end, total_cents).

    total_cents sums value*100 rounded to integers — exact in f64, so the
    result is bit-deterministic and oracle-checkable despite Python."""
    gap_us = gap_minutes * 60 * 1_000_000

    def run_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values([ts, "event_id"], kind="mergesort")
        sessions = []
        cur = None
        prev_t = None
        sid = 0
        for row in pdf.to_dict("records"):
            t = row[ts]
            if prev_t is None or (t - prev_t).total_seconds() * 1_000_000 > gap_us:
                sid += 1
                cur = {
                    key: row[key],
                    "session_id": sid,
                    "n_events": 0,
                    "session_start": t,
                    "session_end": t,
                    "total_cents": 0,
                }
                sessions.append(cur)
            cur["n_events"] += 1
            cur["session_end"] = t
            # Half-AWAY-FROM-ZERO rounding to match SQL round() — Python
            # round() is half-to-EVEN, which diverges by 1 cent whenever
            # value*100 is an exact .5 (e.g. 1.125 → 112.5); floor(x+0.5)
            # alone would likewise diverge for negatives (-1.125 → -112
            # vs SQL's -113), so apply the half-up rule to |v| and
            # restore the sign.
            v = row[value_col]
            cents = int(math.floor(abs(v) * 100 + 0.5))
            cur["total_cents"] += cents if v >= 0 else -cents
            prev_t = t
        return pd.DataFrame(sessions)

    schema = (
        f"{key} long, session_id int, n_events long, "
        "session_start timestamp, session_end timestamp, total_cents long"
    )
    return df.groupBy(key).applyInPandas(run_group, schema)

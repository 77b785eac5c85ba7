"""Stateful stream processing — the FSM operator on unbounded input.

Port of the reference's FSM (kernel/src/main/scala/trembita/fsm/,
unverified) onto ``applyInPandasWithState``: per-key arbitrary Python
state with timeout-based finalization. The batch analogue (identical
transition semantics) is :func:`trembita_spark.operators.fsm.fsm_scan`.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame

_EPOCH = _dt.datetime(1970, 1, 1)


def _epoch_ms(naive_utc: "_dt.datetime") -> int:
    """Epoch millis from a naive-UTC datetime WITHOUT consulting the host
    timezone. ``datetime.timestamp()`` interprets naive values in the
    process-local zone — on a non-UTC cluster that shifts event-time
    timeouts by the UTC offset (timeouts fire hours late and append-mode
    sessions are silently withheld). Arrow hands the FSM naive-UTC
    timestamps because the source pins the session timezone to UTC, so
    plain naive arithmetic is the correct, TZ-independent conversion.
    (Caught by tests/test_driver_env.py's foreign-TZ scenario.)"""
    return int((naive_utc - _EPOCH).total_seconds() * 1000)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: emits one row per CLOSED session
    (user_id, n_events, session_start, session_end). A session closes
    when the event-time state timeout (gap) fires.

    State per user: (start, last_ts, count). At 100 TB this state is
    O(active users), spread across the state store — never materialized
    on one node.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id long, n_events long, session_start timestamp, session_end timestamp"
    )
    state_schema = "start timestamp, last timestamp, n long"
    gap_s = gap_minutes * 60

    def fn(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "session_start": start, "session_end": last}]
            )
            return
        rows = pd.concat(list(pdf_iter)).sort_values("ts")
        closed = []
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        for t in rows["ts"]:
            t = t.to_pydatetime()
            if last is not None and (t - last).total_seconds() > gap_s:
                closed.append(
                    {"user_id": key[0], "n_events": n, "session_start": start, "session_end": last}
                )
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        state.setTimeoutTimestamp(_epoch_ms(last) + gap_s * 1000)
        yield pd.DataFrame(closed)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def sessionize_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization on the Spark 4.x arbitrary-state API
    (``transformWithStateInPandas`` + ``StatefulProcessor`` + event-time
    timers) — the modern engine-managed-state port of the reference's
    FSM (SURVEY.md §3.8 maps FSM → transformWithStateInPandas on 4.x).
    Emits one row per CLOSED session; a session closes on an observed
    gap or when its event-time timer (last_ts + gap) fires."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_s = gap_minutes * 60
    out_schema = (
        "user_id long, n_events long, session_start timestamp, session_end timestamp"
    )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState(
                "session", "start timestamp, last timestamp, n long"
            )

        def _emit(self, key, start, last, n):
            return pd.DataFrame(
                [{
                    "user_id": key[0],
                    "n_events": n,
                    "session_start": start,
                    "session_end": last,
                }]
            )

        def handleInputRows(self, key, rows, timerValues):
            # Per-key cost discipline: every ValueState/timer call is a
            # round trip to the JVM state server, so this path makes a
            # FIXED number of them per key per batch — one get (None ⇔
            # absent, so no separate exists()), one update, at most one
            # deleteTimer (the old expiry is derivable from the stored
            # session, no listTimers scan), one registerTimer — and the
            # per-row session split runs vectorized in pandas instead of
            # a Python loop with a state emission per boundary.
            batch = pd.concat(list(rows)).sort_values("ts")
            prev = self.state.get()
            ts = batch["ts"].reset_index(drop=True)
            gap_ns = gap_s * 1_000_000_000
            # boundary[i] ⇔ gap before row i strictly exceeds gap_s
            boundary = ts.diff().gt(pd.Timedelta(gap_ns, unit="ns"))
            seg = boundary.cumsum()
            grouped = ts.groupby(seg)
            starts = list(grouped.first())
            lasts = list(grouped.last())
            counts = list(grouped.size())
            closed = []  # (start, last, n) in chronological order
            if prev is not None:
                p_start, p_last, p_n = prev
                if (ts.iloc[0] - p_last).value > gap_ns:
                    closed.append((p_start, p_last, p_n))
                else:  # first segment continues the stored session
                    starts[0] = p_start
                    counts[0] += p_n
            for i in range(len(starts) - 1):
                closed.append((starts[i], lasts[i], counts[i]))
            if closed:
                yield pd.DataFrame(
                    [
                        {
                            "user_id": key[0],
                            "n_events": n,
                            "session_start": s,
                            "session_end": e,
                        }
                        for s, e, n in closed
                    ]
                )
            last = lasts[-1].to_pydatetime()
            s_start = starts[-1]
            if isinstance(s_start, pd.Timestamp):
                s_start = s_start.to_pydatetime()
            self.state.update((s_start, last, int(counts[-1])))
            # event-time timer: close the session gap_s after its last
            # event. The only timer that can be live is the previous
            # batch's (fired timers are engine-removed) — delete it by
            # its known expiry instead of a listTimers round trip.
            if prev is not None:
                self.handle.deleteTimer(_epoch_ms(p_last) + gap_s * 1000)
            self.handle.registerTimer(_epoch_ms(last) + gap_s * 1000)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            prev = self.state.get()
            if prev is not None:
                start, last, n = prev
                self.state.clear()
                yield self._emit(key, start, last, n)

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def first_occurrence_tws(
    events: DataFrame,
    watermark: str = "1 hour",
    event_time_col: str = "",
) -> DataFrame:
    """Streaming first-occurrence dedup on the Spark 4.x arbitrary-state
    API, exercising MAP state (``handle.getMapState``) rather than the
    FSM's value state: per user, a map event_type → first-seen marker;
    the first (event-time, event_id)-ordered row of each (user, type)
    is emitted exactly once, duplicates are absorbed into state. The
    keyed-map shape is the one ``dropDuplicates`` can't express when
    the dedup key is a *second-level* key under a hot partition key —
    state stays grouped by user (one state-store entry per user, one
    map slot per type) instead of exploding the keyspace.

    Emits (user_id, event_type, first_ts, first_event_id). At 100 TB
    state is O(users × types-seen); the map entries live in the
    RocksDB state store like any TWS state.

    ``event_time_col``: pass "first_ts" to mark the output column as
    the downstream EVENT-TIME column (Spark 4's eventTimeColumnName) —
    required when ANOTHER stateful operator (windowed agg, join)
    consumes this one's output, so the watermark propagates through
    the TWS boundary instead of dying at it (multi-stateful append
    pipelines)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        "user_id long, event_type string, first_ts timestamp, "
        "first_event_id long"
    )

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.seen = handle.getMapState(
                "seen", "event_type string", "flag boolean"
            )

        def handleInputRows(self, key, rows, timerValues):
            # One map-keys scan per key per batch instead of a
            # containsKey round trip PER ROW (the state server is an
            # RPC boundary — per-row calls cost more than the whole
            # batch's compute), plus a vectorized first-per-type cut:
            # only the batch's first (ts, event_id) row of each type
            # can possibly be new, so at most |new types| updateValue
            # calls follow.
            batch = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            firsts = batch.drop_duplicates(subset=["event_type"], keep="first")
            seen = {k[0] for k in self.seen.keys()}
            out = []
            for r in firsts.itertuples():
                et = r.event_type
                if et not in seen:
                    self.seen.updateValue((et,), (True,))
                    out.append(
                        {
                            "user_id": key[0],
                            "event_type": et,
                            "first_ts": r.ts.to_pydatetime(),
                            "first_event_id": r.event_id,
                        }
                    )
            if out:
                yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=FirstSeen(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
            eventTimeColumnName=event_time_col,
        )
    )


def running_topk_entries_tws(
    events: DataFrame, k: int = 3, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming running-top-k entry detection on the Spark 4.x
    arbitrary-state API, exercising LIST state (``handle.getListState``
    — the third state type, after the FSM's value state and the dedup
    key's map state): per user, the state is the multiset of the k
    highest values seen so far; an incoming event (processed in
    (event-time, event_id) order) is EMITTED iff fewer than k prior
    events had value >= its value — i.e. the moment it enters the
    user's running top-k — then inserted into the state (trimmed back
    to k). Alert-on-new-high with hysteresis-by-rank, the monitoring
    shape "tell me when this crosses into the top k for this entity".

    Emits (user_id, event_id, ts, value). State is EXACTLY k doubles
    per user regardless of history length — O(users·k) total."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "user_id long, event_id long, ts timestamp, value double"

    class TopKEntry(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.top = handle.getListState("top", "v double")

        def handleInputRows(self, key, rows, timerValues):
            batch = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            cur = sorted((r[0] for r in self.top.get()), reverse=True)
            out = []
            for r in batch.itertuples():
                v = float(r.value)
                if len(cur) < k or v > cur[-1]:
                    out.append(
                        {
                            "user_id": key[0],
                            "event_id": r.event_id,
                            "ts": r.ts.to_pydatetime(),
                            "value": v,
                        }
                    )
                cur.append(v)
                cur.sort(reverse=True)
                del cur[k:]
            self.top.put([(v,) for v in cur])
            if out:
                yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TopKEntry(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def idle_flush_tws(events: DataFrame, idle_ms: int = 1) -> DataFrame:
    """Per-user running event count flushed by a PROCESSING-TIME timer
    (``timeMode="ProcessingTime"``) — the last transformWithState
    surface the repo hadn't exercised (value state / map state / list
    state / event-time timers all have oracle-checked keys; roadmap_r10
    #2 left only this). Each input batch updates the count and
    re-arms a timer ``idle_ms`` past the CURRENT processing time, so
    the flush fires in the next micro-batch that arrives after the key
    has been idle for ``idle_ms`` of wall-clock — the periodic
    emit-partial-aggregates / evict-idle-keys pattern (cache TTL,
    keep-alive flush) that event-time timers cannot express when the
    source goes quiet (no rows → no watermark advance → event timers
    never fire).

    Emits (user_id, n_events, flushed_at_batch) rows ONLY from timer
    expiry; content is deterministic given the staged micro-batch
    sequence even though firing TIME is wall-clock (the flushed counts
    are exactly the state at the preceding batch boundary). At 100 TB
    state is one counter per user in the RocksDB store; timers are
    engine-managed per key."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "user_id long, n_events long"

    class IdleFlush(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.count = handle.getValueState("count", "n long")

        def handleInputRows(self, key, rows, timerValues):
            n = self.count.get()[0] if self.count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self.count.update((n,))
            for old in self.handle.listTimers():
                self.handle.deleteTimer(old)
            self.handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + idle_ms
            )
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self.count.exists():
                n = self.count.get()[0]
                self.count.clear()
                yield pd.DataFrame([{"user_id": key[0], "n_events": n}])

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=IdleFlush(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="ProcessingTime",
    )

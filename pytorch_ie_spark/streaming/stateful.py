"""Custom stateful streaming operator: gap-based sessionization with
applyInPandasWithState.

The batch sessionizer (sessions.sessionize) computes sessions with window
functions; this is its incremental twin: per-user state (open session
start/end/count/value) lives in the state store, events extend or roll the
session, and an EVENT-TIME timeout finalizes a session once the watermark
passes its end by the gap — the Structured Streaming pattern for operators
the built-in windowed aggregations can't express (sessions have
DATA-dependent, not clock-aligned, boundaries).

Event-time (not processing-time) timeouts on purpose: they are driven by
the watermark, so finalization is deterministic and replayable, state is
bounded by the watermark horizon, and the engine does not busy-loop empty
'cleaning up state' micro-batches — availableNow drains terminate.

Emission contract: a session row is emitted when it CLOSES (a later event
arrives past the gap, or the watermark passes session_end + gap).
In-flight sessions hold their state across micro-batches and restarts
(checkpointed state store).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)

STATE_SCHEMA = (
    "start_ts long, end_ts long, n_events long, total_value double"
)


def _session_fn(gap_seconds: int):
    """Returns the applyInPandasWithState function: (key, pdf_iter, state)
    -> iterator of closed-session DataFrames."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                s0, e0, n0, v0 = state.get
                closed.append((user_id, s0, e0, n0, v0))
                state.remove()
        else:
            cur = list(state.get) if state.exists else None
            events: list[tuple[int, float]] = []
            for pdf in pdfs:
                for ts, val in zip(pdf["ts"], pdf["value"]):
                    events.append(
                        (int(ts.value // 1_000_000_000), float(val))
                    )
            events.sort()
            for ts, val in events:
                if cur is None:
                    cur = [ts, ts, 1, val]
                elif ts - cur[1] > gap_seconds:
                    closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    cur = [ts, ts, 1, val]
                else:
                    cur[1] = max(cur[1], ts)
                    cur[2] += 1
                    cur[3] += val
            if cur is not None:
                state.update(tuple(cur))
                # close once the watermark passes session_end + gap
                state.setTimeoutTimestamp((cur[1] + gap_seconds) * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="s"
                    ),
                    "session_end": pd.to_datetime(
                        [c[2] for c in closed], unit="s"
                    ),
                    "n_events": [c[3] for c in closed],
                    "total_value": [round(c[4], 4) for c in closed],
                }
            )

    return fn


def stream_sessionize(
    events_stream,
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
):
    """events_stream: a STREAMING DataFrame with (user_id, ts, value).
    Returns the streaming DataFrame of closed sessions. Attach your own
    sink; use outputMode('update'). Works with trigger(availableNow=True)
    drain-restart loops (scheduled incremental runs) or a continuous
    trigger; idle sessions close when the event-time watermark passes
    session_end + gap."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events_stream.select("user_id", "ts", "value")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes * 60),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

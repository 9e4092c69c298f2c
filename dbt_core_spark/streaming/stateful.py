"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming operators at all; this is the engine's
Spark-native answer to "custom stateful operator" (SURVEY §2.E UDF
note): arbitrary per-key state machines with event-time timeouts,
Arrow-batched.  First operator: gap-based sessionization — the
streaming twin of the batch ``sessionize_events`` query.

Semantics: a session for a user closes when no event arrives within
``gap_seconds`` of its last event (by event time).  Sessions are
emitted when the watermark passes their close point (event-time
timeout), so output is final — no retractions.

State is one open session per key: (start_us, end_us, n_events) — a
few bytes per active user, bounded by the watermark, which is what
makes this viable with hundreds of millions of keys.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed the open session's close point → final
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            cur = tuple(state.get) if state.exists else None
            rows = pd.concat(list(pdfs))
            ts_us = (rows["ts"].astype("int64") // 1000).sort_values()
            for t in ts_us:
                t = int(t)
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] <= gap_us:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
                else:
                    closed.append(cur)
                    cur = (t, t, 1)
            if cur is not None:
                state.update(cur)
                # fire when the watermark passes session_end + gap
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming gap sessionization.  ``df`` must be a streaming
    DataFrame with an event-time column ``ts_col``."""
    renamed = df.selectExpr(f"{user_col} as user_id", f"{ts_col} as ts")
    return (
        renamed.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_FUNNEL_STATE = T.StructType([
    T.StructField("n", T.IntegerType()),
    T.StructField("last_us", T.LongType()),
])

FUNNEL_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("completed_at", T.TimestampType()),
])


def _funnel_fn(steps: list):
    k = len(steps)

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        n, last_us = tuple(state.get) if state.exists else (0, None)
        done: list[int] = []
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts")
        for ts, et in zip(rows["ts"].astype("int64") // 1000,
                          rows["event_type"]):
            t = int(ts)
            if n < k and et == steps[n] and (n == 0 or t > last_us):
                n, last_us = n + 1, t
                if n == k:
                    done.append(t)
                    n, last_us = 0, None  # re-arm for the next cycle
        state.update((n, last_us))
        if done:
            yield pd.DataFrame({
                "user_id": [user_id] * len(done),
                "completed_at": [pd.Timestamp(t, unit="us") for t in done],
            })

    return fn


def funnel_stream(
    df: DataFrame,
    steps: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming funnel detection — the continuous form of
    ``operators.sequence.funnel``: per user, a tiny (step, last_ts)
    state machine advances on each matching event with strictly
    increasing time and emits a completion row the moment the final
    step lands, then re-arms.

    State is TWO scalars per user regardless of stream length — the
    applyInPandasWithState shape that survives an unbounded 100 TB
    stream where collecting per-user event lists cannot.  Rows are
    processed in ts order WITHIN each micro-batch; an event arriving
    after a later-step event has already advanced the machine does not
    retro-advance it (the standard streaming state-machine contract —
    batch ``funnel`` is the replayable exact form).  NULL users are
    excluded (they would pool into one pseudo-user state), matching
    batch ``funnel`` and the equi-join oracle."""
    renamed = df.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).selectExpr(
        f"{user_col} as user_id", f"{ts_col} as ts",
        f"{type_col} as event_type")
    return renamed.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(list(steps)),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

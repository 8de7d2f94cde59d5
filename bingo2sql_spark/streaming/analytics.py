"""Streaming analytics over the change stream: watermarked windowed
aggregation and custom stateful sessionization.

The CDC ingest path (streaming.pipeline) is foreachBatch -> MERGE; this
module is the OTHER Structured Streaming shape the engine supports:
declarative event-time aggregations that run inside Spark's stateful
engine, with watermarks bounding state and late data handled by the
runtime instead of hand-written bookkeeping.

- `windowed_event_counts` — tumbling/sliding window counts with a
  watermark: rows later than the watermark are dropped by the engine,
  closed windows are emitted exactly once in append mode, and state per
  key is bounded by (watermark horizon / slide).
- `sessionize_stream` — gap-based sessions via applyInPandasWithState
  (the custom-stateful-operator extension point): per-user state carries
  the open session; an event-time timeout fires when the WATERMARK
  passes last_ts + gap, emitting the closed session. State is one tiny
  row per active user — bounded by active users, not events — and the
  Arrow batch transfer keeps the python hop vectorized.

Both mirror batch operators in __spark_entry__ (`events_windowed_counts`,
`events_sessionize`), and the tests prove stream == batch on the same
input (the Dataflow-model equivalence: a correct streaming computation
converges to its batch counterpart once the watermark passes).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked windowed counts per (window, key). Append-mode
    semantics: a window row is emitted once, when the watermark passes
    its end — the engine drops later-than-watermark rows and evicts the
    window's state, so state size is bounded by the watermark horizon
    regardless of stream length."""
    s = stream.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        s.groupBy(w.alias("w"), F.col(key_col))
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            F.col("count").alias("n_events"),
        )
    )


#: sessionize_stream state: the open session per user
_SESSION_STATE = T.StructType(
    [
        T.StructField("session_start", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stream(
    stream: DataFrame,
    gap_secs: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization as a CUSTOM STATEFUL OPERATOR
    (applyInPandasWithState): a session closes when no event arrives
    within `gap_secs` of the previous one, decided by EVENT time — the
    session is emitted when the watermark passes last_ts + gap (event-
    time timeout), so results are deterministic w.r.t. the data, not
    arrival timing. Late rows behind the watermark are dropped by the
    engine before the operator sees them.

    Equivalent batch definition: __spark_entry__._q_sessionize (gap >
    gap_secs starts a new session) — the tests pin stream == batch."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        ts = rows[ts_col].astype("int64") // 1_000_000_000  # epoch secs
        ts = ts.sort_values()
        out = []
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        for t in ts:
            t = int(t)
            if last is None:
                start, last, n = t, t, 1
            elif t - last > gap_secs:
                out.append((user, start, last, n))  # closed by a later event
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((int(start), int(last), int(n)))
        # close the open session once the WATERMARK passes last + gap
        state.setTimeoutTimestamp((int(last) + gap_secs) * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [u for u, *_ in out],
                    "session_start": [pd.Timestamp(s, unit="s") for _, s, _, _ in out],
                    "session_end": [pd.Timestamp(e, unit="s") for _, _, e, _ in out],
                    "n_events": [c for *_, c in out],
                }
            )

    s = stream.withWatermark(ts_col, watermark)
    return (
        s.groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

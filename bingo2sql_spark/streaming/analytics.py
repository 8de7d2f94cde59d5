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


#: sessionize_stream state: ALL not-yet-sealed session intervals per
#: user (parallel arrays) — a single open interval cannot absorb legal
#: in-watermark out-of-order events, which may create earlier intervals
#: or bridge existing ones
_SESSION_STATE = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("lasts", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
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


#: dedup_stream state: admitted flag + the max EVENT time ever seen for
#: the digest — the TTL deadline must ratchet forward only (a late
#: in-watermark duplicate must not pull the eviction earlier)
_DEDUP_STATE = T.StructType(
    [
        T.StructField("seen", T.BooleanType()),
        T.StructField("last_ms", T.LongType()),
    ]
)


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl: str | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming EXACT dedup — admit only the first document per content
    digest, across the whole stream (the online arm of
    dedup.exact_dedup_groups; a continuously-curated corpus dedups at
    ingest instead of re-scanning).

    Custom stateful operator keyed by md5(text): state is ONE tiny
    boolean row per distinct digest ever seen. Within a micro-batch,
    ties break deterministically to the smallest id; across batches the
    FIRST ARRIVAL wins (arrival order is the only order a stream has —
    equal to the batch keeper whenever ids arrive in order). Duplicate
    rows are dropped, admitted rows pass through as (id, digest).

    State growth is one row per DISTINCT document — the honest cost of
    exact online dedup. `ttl` (e.g. "72 hours") bounds it: a digest
    whose last occurrence's EVENT TIME falls `ttl` behind the watermark
    is evicted and a later copy would be re-admitted — the standard
    trade; requires the stream to carry `ts_col` (watermarked here).
    The TTL rides an EVENT-time timeout deliberately:
    applyInPandasWithState + ProcessingTimeTimeout hard-crashes the
    Arrow worker in this Spark build (minimal repro, no Python frame
    reaches the handler) while EventTimeTimeout is solid — and an
    event-time TTL is also the replay-deterministic definition."""
    ttl_ms = None
    if ttl is not None:
        import re as _re

        m = _re.fullmatch(r"\s*(\d+)\s*(second|minute|hour|day)s?\s*", ttl)
        if not m:
            raise ValueError(f"ttl {ttl!r} must look like '<n> hours'")
        ttl_ms = int(m.group(1)) * {
            "second": 1_000,
            "minute": 60_000,
            "hour": 3_600_000,
            "day": 86_400_000,
        }[m.group(2)]
        if ts_col not in stream.columns:
            raise ValueError(
                f"ttl needs the event-time column {ts_col!r} on the stream "
                "(event-time TTL; see docstring)"
            )

    # the output id keeps the STREAM's id type (ADVICE r5: a string
    # doc_id — common for content ids — used to fail inside the Arrow
    # worker at runtime against a hardcoded LongType)
    id_type = stream.schema[id_col].dataType
    id_is_numeric = isinstance(
        id_type,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("digest", T.StringType()),
        ]
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (digest,) = key
        if state.hasTimedOut:
            state.remove()  # TTL eviction: digest may be re-admitted later
            return
        rows = pd.concat(list(pdfs))
        admitted = state.exists
        prev_last = int(state.get[1]) if admitted and state.get[1] is not None else 0
        last_ms = prev_last
        if ttl_ms is not None:
            # max event time across this batch AND everything stored —
            # the deadline only ratchets forward (a late in-watermark
            # duplicate must not pull eviction earlier); NaT rows are
            # excluded (astype on NaT yields INT64_MIN)
            ts = rows["_ts"].dropna()
            if len(ts):
                last_ms = max(prev_last, int(ts.astype("int64").max()) // 1_000_000)
        state.update((True, last_ms))
        if ttl_ms is not None:
            state.setTimeoutTimestamp(
                max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        if admitted:
            return  # already admitted in an earlier batch
        keeper = rows[id_col].min()
        if id_is_numeric:
            keeper = int(keeper)  # numpy scalar -> plain int for Arrow
        yield pd.DataFrame({id_col: [keeper], "digest": [digest]})

    cols = [F.col(id_col), F.md5(F.col(text_col)).alias("digest")]
    src = stream
    if ttl_ms is not None:
        src = stream.withWatermark(ts_col, watermark)
        cols.append(F.col(ts_col).alias("_ts"))
    keyed = src.select(*cols)
    return keyed.groupBy("digest").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def sessionize_stream(
    stream: DataFrame,
    gap_secs: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization as a CUSTOM STATEFUL OPERATOR
    (applyInPandasWithState): events within `gap_secs` of each other
    belong to one session, decided by EVENT time regardless of arrival
    order — state holds ALL not-yet-sealed session intervals, so a
    legal in-watermark out-of-order event can open an earlier interval
    or BRIDGE two existing ones (a single open-session scalar would
    mis-split here). A session is emitted exactly when the watermark
    passes its last_ts + gap: no admissible future event (all have
    ts >= watermark) can extend or bridge it anymore. Late rows behind
    the watermark are dropped by the engine before the operator sees
    them.

    Equivalent batch definition: __spark_entry__._q_sessionize (gap >
    gap_secs starts a new session) — the tests pin stream == batch,
    including out-of-order delivery."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        wm = state.getCurrentWatermarkMs() // 1000
        sessions: list[tuple[int, int, int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            sessions = list(zip(starts, lasts, ns))
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            ts = rows[ts_col].astype("int64") // 1_000_000_000  # epoch secs
            sessions.extend((int(t), int(t), 1) for t in ts)
            sessions.sort()
            merged: list[tuple[int, int, int]] = []
            for s, e, n in sessions:
                if merged and s - merged[-1][1] <= gap_secs:
                    ps, pe, pn = merged[-1]
                    merged[-1] = (ps, max(pe, e), pn + n)
                else:
                    merged.append((s, e, n))
            sessions = merged
        sealed = [x for x in sessions if x[1] + gap_secs < wm]
        open_ = [x for x in sessions if x[1] + gap_secs >= wm]
        if open_:
            state.update(
                (
                    [s for s, _, _ in open_],
                    [e for _, e, _ in open_],
                    [n for *_, n in open_],
                )
            )
            # must be strictly beyond the current watermark or Spark
            # rejects the timeout (equality can occur at the seal edge)
            state.setTimeoutTimestamp(
                max(
                    (min(e for _, e, _ in open_) + gap_secs) * 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        elif state.exists:
            state.remove()
        if sealed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(sealed),
                    "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in sealed],
                    "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in sealed],
                    "n_events": [n for *_, n in sealed],
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

"""Watermarked streaming analytics: windowed aggregation and the
applyInPandasWithState sessionizer — event-time semantics, bounded
state, and stream==batch convergence on deterministic inputs."""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bingo2sql_spark.streaming.analytics import (
    sessionize_stream,
    windowed_event_counts,
)

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _t(secs: int) -> datetime:
    return datetime.fromtimestamp(1704067200 + secs, tz=timezone.utc).replace(tzinfo=None)


def _land(spark, rows, path, mtime_bump=0):
    df = spark.createDataFrame(rows, _SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path + "_stage")
    os.makedirs(path, exist_ok=True)
    import shutil

    for f in os.listdir(path + "_stage"):
        if f.endswith(".parquet"):
            dst = os.path.join(path, f"{mtime_bump}-{f}")
            shutil.copy(os.path.join(path + "_stage", f), dst)
            now = time.time() + mtime_bump
            os.utime(dst, (now, now))


def test_windowed_counts_watermark_append(spark, tmp_path):
    """Append-mode windowed counts: a window is emitted exactly once
    after the watermark passes its end, matches the batch groupBy, and
    a row later than the watermark is DROPPED by the engine."""
    land = str(tmp_path / "wland")
    # window 1h, watermark 10m. Batch 1: two busy windows.
    batch1 = [
        (1, _t(0), "click"), (2, _t(60), "click"), (3, _t(120), "buy"),
        (1, _t(3700), "click"), (2, _t(3800), "click"),
    ]
    # Batch 2: far-future row advances the watermark past both windows.
    # Batch 3: settles the advanced watermark (Spark filters a batch's
    # input against the PREVIOUS batch's watermark — the late/eviction
    # watermark split — so the advance must be one batch old before a
    # drop is observable).
    batch2 = [(9, _t(100000), "click")]
    batch3 = [(9, _t(100100), "click")]
    # Batch 4: a LATE row for the long-evicted window 0 — its whole
    # window is behind even the previous watermark now, so the engine
    # must DROP it (rows merely later than the watermark but inside a
    # live window are still accepted — the allowed-lateness contract).
    batch4 = [(4, _t(130), "click")]
    _land(spark, batch1, land, mtime_bump=0)
    _land(spark, batch2, land, mtime_bump=2)
    _land(spark, batch3, land, mtime_bump=4)
    _land(spark, batch4, land, mtime_bump=6)
    stream = spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(land)
    out = windowed_event_counts(stream, window="1 hour", watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("wincounts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("select * from wincounts").collect()
    }
    # window [0,1h): click=2 (the late 4th click was dropped), buy=1;
    # window [1h,2h): click=2. The far-future window is NOT emitted
    # (watermark never passed its end).
    assert got[(_t(0), "click")] == 2
    assert got[(_t(0), "buy")] == 1
    assert got[(_t(3600), "click")] == 2
    assert len(got) == 3


def test_sessionize_stream_event_time_timeouts(spark, tmp_path):
    """Gap sessions close either by a later event (gap exceeded in-data)
    or by the EVENT-TIME timeout when the watermark passes last+gap;
    still-open sessions are not emitted. Mirrors the batch rule
    (gap > 1800 starts a new session)."""
    land = str(tmp_path / "sland")
    batch1 = [
        (1, _t(0), "e"), (1, _t(10), "e"), (1, _t(2000), "e"),  # 2000-10 > 1800: closes s1
        (2, _t(0), "e"), (2, _t(5), "e"),
    ]
    batch2 = [(99, _t(20000), "e")]  # watermark driver; its own session stays open
    _land(spark, batch1, land, mtime_bump=0)
    _land(spark, batch2, land, mtime_bump=2)
    stream = spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(land)
    out = sessionize_stream(stream, gap_secs=1800, watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sessions").collect()
    got = {
        (r["user_id"], int(r["session_start"].timestamp()) - 1704067200,
         int(r["session_end"].timestamp()) - 1704067200, r["n_events"])
        for r in rows
    }
    assert (1, 0, 10, 2) in got       # closed by the in-data gap
    assert (1, 2000, 2000, 1) in got  # closed by event-time timeout
    assert (2, 0, 5, 2) in got        # closed by event-time timeout
    assert not any(u == 99 for u, *_ in got)  # still open: not emitted
    assert len(got) == 3


def test_sessionize_state_survives_checkpoint_restart(spark, tmp_path):
    """applyInPandasWithState state recovery: a session left OPEN when
    the query stops must continue after a restart from the same
    checkpoint — an event in the resumed run extends it, and the final
    emission spans the restart boundary (start from phase 1, end from
    phase 2). Without recovered state the session would emit split."""
    land = str(tmp_path / "rland")
    ckpt = str(tmp_path / "rckpt")
    _land(spark, [(5, _t(0), "e"), (5, _t(10), "e")], land, mtime_bump=0)
    p1: list = []
    p2: list = []

    def run(emit_to, max_files=None):
        # foreachBatch sink — the memory sink cannot recover from a
        # checkpoint, foreachBatch can
        reader = spark.readStream.schema(_SCHEMA)
        if max_files:
            reader = reader.option("maxFilesPerTrigger", max_files)
        out = sessionize_stream(
            reader.parquet(land), gap_secs=1800, watermark="10 minutes"
        )
        q = (
            out.writeStream.foreachBatch(lambda df, eid: emit_to.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run(p1)
    assert p1 == []  # session still open at shutdown

    # phase 2: extend the session, then advance the watermark far enough
    # to close it via event-time timeout
    _land(spark, [(5, _t(50), "e")], land, mtime_bump=2)
    _land(spark, [(99, _t(50000), "e")], land, mtime_bump=4)
    run(p2, max_files=1)
    got = {
        (r["user_id"], int(r["session_start"].timestamp()) - 1704067200,
         int(r["session_end"].timestamp()) - 1704067200, r["n_events"])
        for r in p2
    }
    assert (5, 0, 50, 3) in got, got  # spans the restart: state recovered
    assert not any(u == 99 for u, *_ in got)


def test_sessionize_out_of_order_within_watermark(spark, tmp_path):
    """Legal in-watermark out-of-order delivery must not corrupt
    sessions: a late-arriving EARLIER event forms its own earlier
    session (not a backwards 'extension' of the open one), and a
    late-arriving MIDDLE event BRIDGES two stored intervals into one —
    both matching the batch gap rule on the same event set."""
    land = str(tmp_path / "oland")
    # user 7: in-order 3600; late 600 arrives after; then 4200
    # batch rule on {600, 3600, 4200}: gap 3000 > 1800 -> {600} | {3600,4200}
    _land(spark, [(7, _t(3600), "e")], land, mtime_bump=0)
    _land(spark, [(7, _t(600), "e"), (7, _t(4200), "e")], land, mtime_bump=2)
    # user 8: intervals at 0 and 3000 (separate), then 1600 BRIDGES them
    _land(spark, [(8, _t(0), "e"), (8, _t(3000), "e")], land, mtime_bump=4)
    _land(spark, [(8, _t(1600), "e")], land, mtime_bump=6)
    # watermark driver seals everything
    _land(spark, [(99, _t(90000), "e")], land, mtime_bump=8)
    stream = spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(land)
    out = sessionize_stream(stream, gap_secs=1800, watermark="2 hours")
    q = (
        out.writeStream.format("memory").queryName("ooo_sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], int(r["session_start"].timestamp()) - 1704067200,
         int(r["session_end"].timestamp()) - 1704067200, r["n_events"])
        for r in spark.sql("select * from ooo_sessions").collect()
    }
    assert (7, 600, 600, 1) in got, got       # late earlier event: own session
    assert (7, 3600, 4200, 2) in got, got     # open session unharmed
    assert (8, 0, 3000, 3) in got, got        # middle event bridged the two
    assert not any(u == 99 for u, *_ in got)
    assert len(got) == 3


_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _land_docs(spark, rows, path, mtime_bump=0):
    df = spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path + "_stage")
    os.makedirs(path, exist_ok=True)
    import shutil

    for f in os.listdir(path + "_stage"):
        if f.endswith(".parquet"):
            dst = os.path.join(path, f"{mtime_bump}-{f}")
            shutil.copy(os.path.join(path + "_stage", f), dst)
            now = time.time() + mtime_bump
            os.utime(dst, (now, now))


def test_dedup_stream_admits_first_only(spark, tmp_path):
    """Online exact dedup: one admitted row per distinct digest across
    micro-batches — a cross-batch duplicate is dropped (first arrival
    wins), within-batch ties break to the smallest id, and the admitted
    set equals batch exact_dedup_groups keepers when ids arrive in
    order."""
    from bingo2sql_spark.operators.dedup import exact_dedup_groups
    from bingo2sql_spark.streaming.analytics import dedup_stream

    land = str(tmp_path / "dl")
    # batch 1: docs 1..3 (3 has a within-batch twin 4)
    _land_docs(spark, [(1, "alpha beta"), (2, "gamma delta"),
                       (3, "twin text"), (4, "twin text")], land, mtime_bump=0)
    # batch 2: 5 duplicates doc 1 (cross-batch dup), 6 is new
    _land_docs(spark, [(5, "alpha beta"), (6, "epsilon zeta")], land, mtime_bump=2)
    stream = spark.readStream.schema(_DOC_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(land)
    out = str(tmp_path / "dout")
    q = (
        dedup_stream(stream).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", str(tmp_path / "dckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    got = {
        (r["doc_id"], r["digest"])
        for r in spark.read.parquet(out).collect()
    }
    ids = {i for i, _ in got}
    assert ids == {1, 2, 3, 6}, got  # 4 = within-batch dup, 5 = cross-batch dup
    batch = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "twin text"),
         (4, "twin text"), (5, "alpha beta"), (6, "epsilon zeta")], _DOC_SCHEMA)
    keepers = {r["keeper_id"] for r in exact_dedup_groups(batch).collect()}
    assert ids == keepers  # in-order arrival: stream == batch keepers
    # bad ttl is loud; ttl without an event-time column is loud
    import pytest as _p

    with _p.raises(ValueError, match="ttl"):
        dedup_stream(stream, ttl="soonish")
    with _p.raises(ValueError, match="event-time"):
        dedup_stream(stream, ttl="72 hours")  # doc stream has no ts col


def test_dedup_stream_string_ids(spark, tmp_path):
    """ADVICE r5: the admitted-row id column keeps the STREAM's type —
    a string doc_id (common for content ids) flows through instead of
    dying in the Arrow worker against a hardcoded LongType."""
    import os
    import shutil
    import time

    from bingo2sql_spark.streaming.analytics import dedup_stream

    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("text", T.StringType())]
    )
    land = str(tmp_path / "sl")
    df = spark.createDataFrame(
        [("doc-b", "same text"), ("doc-a", "same text"), ("doc-c", "other")],
        schema,
    ).coalesce(1)
    df.write.mode("overwrite").parquet(land + "_stage")
    os.makedirs(land, exist_ok=True)
    for f in os.listdir(land + "_stage"):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(land + "_stage", f), os.path.join(land, f))
    stream = spark.readStream.schema(schema).parquet(land)
    out = str(tmp_path / "sout")
    q = (
        dedup_stream(stream).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", str(tmp_path / "sckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    rows = spark.read.parquet(out)
    assert dict(rows.dtypes)["doc_id"] == "string"
    got = {r["doc_id"] for r in rows.collect()}
    assert got == {"doc-a", "doc-c"}  # min() on strings -> lexicographic keeper

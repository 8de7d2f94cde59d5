"""Raw-wire landing-format sources: JSON-lines batch + streaming reads
compose with the decode stage and reach the same final state as the
parquet path."""

from __future__ import annotations

import os

from bingo2sql_spark.operators.apply import IcebergLiteTable
from bingo2sql_spark.pipeline import replay
from bingo2sql_spark.sources.decode import decode_events
from bingo2sql_spark.sources.layout import read_raw_jsonl, stream_raw_jsonl
from bingo2sql_spark.sources.synth import to_raw


def _land_jsonl(small_events, path: str) -> None:
    to_raw(small_events).write.mode("overwrite").json(path)


def test_read_raw_jsonl_equals_parquet_path(spark, small_events, tmp_path):
    jl = str(tmp_path / "raw_jsonl")
    _land_jsonl(small_events, jl)
    raw = read_raw_jsonl(spark, jl).cache()  # cache: Spark disallows
    # querying only the corrupt-record column from a raw file scan
    assert raw.filter("_corrupt_record is not null").count() == 0
    t1 = IcebergLiteTable(str(tmp_path / "t_jsonl"), n_buckets=8)
    replay(decode_events(raw.drop("_corrupt_record")), t1, batch_id="j")
    t2 = IcebergLiteTable(str(tmp_path / "t_env"), n_buckets=8)
    replay(small_events, t2, batch_id="e")
    assert t1.state_checksum(spark) == t2.state_checksum(spark)
    assert t1.read(spark).count() > 0


def test_read_raw_jsonl_surfaces_corrupt_lines(spark, small_events, tmp_path):
    jl = str(tmp_path / "raw_bad")
    _land_jsonl(small_events.filter("seq < 50"), jl)
    # a separate file: appending to a Spark-written part breaks its
    # hadoop .crc sidecar
    with open(os.path.join(jl, "part-99999-bad.json"), "w") as f:
        f.write('{"seq": broken json\n')
    raw = read_raw_jsonl(spark, jl).cache()
    assert raw.filter("_corrupt_record is not null").count() == 1
    assert raw.filter("_corrupt_record is null").count() == 50


def test_stream_raw_jsonl_decode_in_stream(spark, small_events, tmp_path):
    """readStream(jsonl) -> decode_events -> foreachBatch MERGE drains to
    the same state as batch replay (decode is pure projection, so it
    rides the stream unchanged)."""
    jl = str(tmp_path / "raw_stream")
    _land_jsonl(small_events, jl)
    table = IcebergLiteTable(str(tmp_path / "t_stream"), n_buckets=8)

    from bingo2sql_spark.operators import resolve as R

    stream = decode_events(stream_raw_jsonl(spark, jl, max_files_per_trigger=8))

    def apply_batch(batch_df, epoch_id):
        table.commit(
            R.to_upsert_rows(R.with_key(batch_df)), batch_id=f"stream-{epoch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ref = IcebergLiteTable(str(tmp_path / "t_ref"), n_buckets=8)
    replay(small_events, ref, batch_id="ref")
    assert table.state_checksum(spark) == ref.state_checksum(spark)


def _df_equal(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_typed_wire_decode_equals_json_decode(spark, small_events):
    """Differential: decode_events_typed(to_raw_typed(ev)) must be
    row-identical to decode_events(to_raw(ev)) — full decode, narrowed
    before image, and downgraded registry version (VERDICT r3 #1: the
    typed landing makes decode a pure projection; this pins that it is
    the SAME decode)."""
    from bingo2sql_spark.sources.decode import decode_events_typed
    from bingo2sql_spark.sources.synth import to_raw_typed

    raw_j, raw_t = to_raw(small_events), to_raw_typed(small_events)
    assert _df_equal(decode_events_typed(raw_t), decode_events(raw_j))
    assert _df_equal(
        decode_events_typed(raw_t, before_fields=["repo", "path"]),
        decode_events(raw_j, before_fields=["repo", "path"]),
    )
    # target version BELOW the wire version: extra field projected away
    assert _df_equal(
        decode_events_typed(raw_t, schema_ver=1),
        decode_events(raw_j, schema_ver=1),
    )
    # and the typed plan contains no JSON parse at all
    plan = decode_events_typed(raw_t)._jdf.queryExecution().executedPlan().toString()
    assert "from_json" not in plan


def test_typed_wire_decode_aligns_old_wire_schema(spark, small_events):
    """A typed wire written by an OLDER connector (v1 structs, no
    `branch`) decodes at the latest version with NULL-fill, exactly like
    the JSON path NULL-fills missing keys; image NULL-ness (insert has
    no before, delete no after) survives the struct rebuild."""
    from pyspark.sql import functions as F

    from bingo2sql_spark.sources.decode import decode_events_typed
    from bingo2sql_spark.sources.synth import to_raw_typed

    v1_wire = to_raw_typed(small_events).withColumn(
        "before", F.col("before").dropFields("branch")
    ).withColumn("after", F.col("after").dropFields("branch"))
    out = decode_events_typed(v1_wire)  # latest = v2
    assert [f.name for f in out.schema["after"].dataType.fields][-1] == "branch"
    assert out.filter("after.branch is not null").count() == 0
    # NULL images preserved (not melted into structs of NULLs)
    ins = small_events.filter("op = 'insert'").count()
    assert out.filter("op = 'insert' and before is null").count() == ins
    dels = small_events.filter("op = 'delete'").count()
    assert out.filter("op = 'delete' and after is null").count() == dels


def test_typed_wire_replay_equals_json_replay(spark, small_events, tmp_path):
    """End-to-end: landing typed parquet and replaying reaches the same
    table state as the JSON landing (the two wire formats are
    interchangeable upstream of the engine)."""
    from bingo2sql_spark.sources.decode import decode_events_typed
    from bingo2sql_spark.sources.synth import to_raw_typed

    p = str(tmp_path / "typed_wire")
    to_raw_typed(small_events).write.parquet(p)
    typed = decode_events_typed(
        spark.read.parquet(p), before_fields=["repo", "path"]
    )
    t1 = IcebergLiteTable(str(tmp_path / "t_typed"), n_buckets=8)
    replay(typed, t1, batch_id="t")
    t2 = IcebergLiteTable(str(tmp_path / "t_json"), n_buckets=8)
    replay(decode_events(to_raw(small_events)), t2, batch_id="j")
    assert t1.state_checksum(spark) == t2.state_checksum(spark)


def test_deterministic_sampling_properties(spark):
    """Sampling decisions depend only on (salt, key): stable under
    repartitioning, append-stable, and fraction-accurate."""
    from pyspark.sql import functions as F

    from bingo2sql_spark.functions.sampling import (
        deterministic_sample,
        stratified_sample,
        threshold_hex,
    )

    assert threshold_hex(0.0) == "00000000"
    assert threshold_hex(1.0) == "g"  # sorts above every hex draw
    # fraction 1.0 keeps EVERYTHING (the 9-char hex cutoff would not)
    all_df = spark.range(100).withColumnRenamed("id", "doc_id")
    assert deterministic_sample(all_df, 1.0).count() == 100
    assert deterministic_sample(all_df, 0.0).count() == 0
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    kept = set(r["doc_id"] for r in deterministic_sample(df, 0.3).collect())
    # partitioning-independent: same rows survive any layout
    kept2 = set(
        r["doc_id"]
        for r in deterministic_sample(df.repartition(64), 0.3).collect()
    )
    assert kept == kept2
    # append-stable: sampling a prefix agrees with sampling the whole
    prefix = set(
        r["doc_id"]
        for r in deterministic_sample(df.filter("doc_id < 10000"), 0.3).collect()
    )
    assert prefix == {k for k in kept if k < 10000}
    # fraction-accurate within a few percent at n=20000
    assert abs(len(kept) / 20000 - 0.3) < 0.02
    # stratified: per-stratum rates honored; unknown strata dropped
    sdf = df.withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("zz"))
    out = stratified_sample(sdf, {"en": 0.5}, strata_col="lang").collect()
    assert all(r["lang"] == "en" for r in out)
    assert abs(len(out) / 10000 - 0.5) < 0.03


def test_pack_sequences_properties(spark):
    """Every doc lands in exactly one bin; bins respect the budget
    (except oversized singletons); deterministic under repartitioning;
    packing efficiency is near the lower bound."""
    from pyspark.sql import functions as F

    from bingo2sql_spark.functions.packing import pack_sequences

    docs = (
        spark.range(5000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("n_tokens", F.pmod(F.xxhash64("doc_id"), F.lit(900)) + 1)
    )
    out = pack_sequences(docs, budget=2048, group_docs=1000)
    rows = out.collect()
    assert len(rows) == 5000  # one row per doc
    assert len({r["doc_id"] for r in rows}) == 5000
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for b, rs in by_bin.items():
        tot = sum(r["n_tokens"] for r in rs)
        assert all(r["bin_tokens"] == tot for r in rs)
        assert tot <= 2048 or len(rs) == 1  # oversized -> singleton
    # near-optimal: used bins within 15% of ceil(total/budget) despite
    # group-boundary loss
    total_tokens = sum(r["n_tokens"] for r in rows)
    lower = -(-total_tokens // 2048)
    assert len(by_bin) <= lower * 1.15
    # deterministic under different layouts
    again = {
        (r["doc_id"], r["bin_id"])
        for r in pack_sequences(docs.repartition(17), budget=2048, group_docs=1000).collect()
    }
    assert again == {(r["doc_id"], r["bin_id"]) for r in rows}
    # oversized doc -> singleton bin
    big = spark.createDataFrame([(1, 5000), (2, 10)], ["doc_id", "n_tokens"])
    brows = pack_sequences(big, budget=2048).collect()
    bb = {r["doc_id"]: r for r in brows}
    assert bb[1]["bin_id"] != bb[2]["bin_id"]


def test_decode_malformed_image_is_loud(spark):
    """A malformed row image must FAIL the decode (mode=FAILFAST), not
    PERMISSIVE-melt into an all-NULL struct that merges as a NULL-keyed
    upsert (silent corruption; the reference hard-fails on unparseable
    binlog events). on_corrupt='keep' restores the forensic PERMISSIVE
    path."""
    import pytest
    from pyspark.sql import functions as F

    from bingo2sql_spark.sources.decode import decode_events
    from bingo2sql_spark.sources.synth import generate_events, to_raw

    raw = to_raw(generate_events(spark, n_keys=50, versions_per_key=2))
    bad = raw.withColumn(
        "after_json",
        F.when(F.col("seq") == 5, F.lit("{oops")).otherwise(F.col("after_json")),
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        decode_events(bad).select("after").collect()
    kept = decode_events(bad, on_corrupt="keep")
    assert kept.filter("seq = 5").collect()[0]["after"]["repo"] is None
    # clean streams decode identically under the default
    n = decode_events(raw).filter("after.repo is not null").count()
    assert n == raw.filter("op <> 'delete'").count()


def test_longtext_10mb_roundtrip(spark, tmp_path):
    """The reference's 10 MB LONGTEXT case (core/parser_test.go:814-847):
    a payload of that size — with embedded quotes/newlines/backslashes —
    survives the raw-wire JSON encode -> decode -> MERGE replay with
    byte equality, and renders one INSERT whose escaped literal is
    intact at both ends."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from bingo2sql_spark import schema as S
    from bingo2sql_spark.functions.render import render_sql
    from bingo2sql_spark.operators.apply import IcebergLiteTable
    from bingo2sql_spark.pipeline import replay
    from bingo2sql_spark.sources.decode import decode_events
    from bingo2sql_spark.sources.synth import to_raw

    big = ("x'y\\z\nq\"w|" * 1000 + "END") * 1100  # ~11 MB with specials
    assert len(big) > 10_000_000
    img = ("r1", "p1", "c1", "go", big, None)
    env = spark.createDataFrame(
        [(1, "bin.1", 4, "u", 1, datetime(2024, 1, 1), 1, "test", "repo_files",
          "insert", None, img, None, 1)],
        S.envelope_schema(),
    )
    decoded = decode_events(to_raw(env))
    got = decoded.collect()[0]["after"]["content"]
    assert got == big  # JSON wire round-trip is byte-exact

    t = IcebergLiteTable(str(tmp_path / "big"), n_buckets=4)
    replay(decoded, t, batch_id="b")
    stored = t.read(spark).collect()[0]["content"]
    assert stored == big

    sql = render_sql(decoded).collect()[0]["sql"]
    assert len(sql) > len(big)
    assert sql.startswith("INSERT INTO `test`.`repo_files`")
    assert sql.endswith("',NULL);") and "\\n" in sql and "\\'" in sql

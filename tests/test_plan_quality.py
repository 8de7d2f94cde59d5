"""Plan-quality assertions: the things .explain() must show for the
engine to hold at 100 TB — filter pushdown into the parquet scan, column
pruning, broadcast of small dims, map-side partial aggregation, no
Python UDFs in the relational path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

TESTDATA = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filters_push_into_parquet_scan(spark):
    """F1/F5-style predicates on raw scans must reach the reader
    (PushedFilters) — reading then filtering 100 TB is the failure mode."""
    ev = spark.read.parquet(os.path.join(TESTDATA, "events.parquet"))
    from bingo2sql_spark.operators import filters as FL

    q = ev.filter(FL.time_range("2024-01-02 00:00:00", "2024-01-04 23:59:59")).select(
        "event_id", "ts"
    )
    plan = _plan(q)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(ts)" in plan or "GreaterThanOrEqual(ts" in plan, plan


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must not read all columns (ReadSchema)."""
    docs = spark.read.parquet(os.path.join(TESTDATA, "documents.parquet"))
    q = docs.select("doc_id", F.length("text").alias("n"))
    plan = _plan(q)
    seg = plan.split("ReadSchema")[-1]
    assert "doc_id" in seg and "text" in seg
    assert "source" not in seg and "n_chars" not in seg, seg


def test_schema_registry_join_broadcasts(spark):
    """Event->schema resolution (SURVEY §2.5) must be a broadcast hash
    join, never a shuffle of the event stream."""
    from bingo2sql_spark.sources.synth import generate_events

    ev = generate_events(spark, n_keys=100, versions_per_key=4)
    registry = spark.createDataFrame(
        [(1, "v1"), (2, "v2")], "schema_ver int, registry_tag string"
    )
    q = ev.join(F.broadcast(registry), "schema_ver")
    assert "BroadcastHashJoin" in _plan(q)


def test_merge_aggregate_has_partial_combine(spark):
    """The LWW merge must plan a partial (map-side) aggregate before the
    exchange — at 10^10 events the pre-shuffle combine is the difference
    between shipping v rows per key and one."""
    from bingo2sql_spark.operators import resolve as R
    from bingo2sql_spark.sources.synth import generate_events

    ev = R.with_key(generate_events(spark, n_keys=100, versions_per_key=4))
    resolved = R.lww_resolve(ev)
    plan = _plan(resolved)
    assert "partial_max_by" in plan, plan
    assert plan.index("partial_max_by") > plan.index("Exchange hashpartitioning") or (
        "Exchange hashpartitioning" in plan.split("partial_max_by")[1]
    ), "partial agg must sit below the exchange"


def test_commit_merge_single_exchange(spark):
    """The commit MERGE must plan exactly ONE full-data exchange: the
    union repartitions by bucket and the (bucket, keys) aggregate reuses
    that partitioning (bucket is a function of the keys), so there is no
    second shuffle between the merge and the bucket-clustered write —
    at 10^10 events the removed exchange was ~45% of shuffled bytes."""
    from bingo2sql_spark.operators import resolve as R
    from bingo2sql_spark.operators.apply import _merge_batch, bucket_col
    from bingo2sql_spark.sources.synth import generate_events

    ev = generate_events(spark, n_keys=200, versions_per_key=4)
    rows = R.to_upsert_rows(R.with_key(ev)).withColumn(
        "bucket", bucket_col(16)
    ).withColumnRenamed("_seq", "_ingest_seq")
    all_cols = ["repo", "path", "commit", "lang", "content", "branch"]
    merged = _merge_batch(rows.limit(0), rows, all_cols, partial=False, n_out=8)
    plan = _plan(merged)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # and that one exchange partitions by bucket, not by the merge keys
    frag = plan.split("Exchange hashpartitioning", 1)[1][:120]
    assert "bucket" in frag, frag


def test_no_python_udf_in_relational_path(spark):
    """Filters, flashback, LWW, upsert projection: pure Column exprs —
    a BatchEvalPython/ArrowEvalPython node here would serialize the
    whole stream through Python."""
    from bingo2sql_spark.operators import filters as FL
    from bingo2sql_spark.operators import flashback as FB
    from bingo2sql_spark.operators import resolve as R
    from bingo2sql_spark.sources.synth import generate_events

    ev = generate_events(spark, n_keys=100, versions_per_key=4)
    q = R.to_upsert_rows(
        R.with_key(FB.invert(FL.apply_filters(ev, tables=["repo_files"], flashback=True)))
    )
    plan = _plan(q)
    assert "EvalPython" not in plan and "MapInPandas" not in plan, plan


def test_bucket_pruning_reads_only_affected(spark, tmp_path):
    """Manifest-level pruning: a commit touching 1 key reads only that
    key's bucket, not the table (the Iceberg copy-on-write shape)."""
    from bingo2sql_spark.operators.apply import IcebergLiteTable
    from bingo2sql_spark.pipeline import replay
    from bingo2sql_spark.sources.synth import generate_events

    ev = generate_events(spark, n_keys=400, versions_per_key=4, seed=3)
    t = IcebergLiteTable(str(tmp_path / "t"), n_buckets=32)
    replay(ev, t, batch_id="load")
    one_key = ev.filter("seq = 0")
    m = replay(one_key, t, batch_id="one")
    assert m["buckets_rewritten"] == 1
    # and the new snapshot dir contains exactly one bucket partition
    # (dirs carry a per-attempt uuid suffix; resolve via the manifest)
    snap_name = t.latest_manifest()["snap_dirs"][str(m["snapshot"])]
    snap = os.path.join(t.path, "data", snap_name)
    assert len([d for d in os.listdir(snap) if d.startswith("pbucket=")]) == 1


def test_hot_key_skew_many_versions(spark, tmp_path):
    """Skew story: a key updated thousands of times in one batch must not
    concentrate work — map-side combine collapses each map partition to
    one row per key before the shuffle, so the reducer sees at most
    #map-partitions rows per key regardless of version count."""
    from bingo2sql_spark import oracle
    from bingo2sql_spark.operators.apply import IcebergLiteTable
    from bingo2sql_spark.pipeline import replay
    from bingo2sql_spark.sources.synth import generate_events

    ev = generate_events(spark, n_keys=8, versions_per_key=2000, n_repos=2, seed=5)
    pdf = ev.select("seq", "op", "before", "after").toPandas()
    t = IcebergLiteTable(str(tmp_path / "t"), n_buckets=4)
    replay(ev, t, batch_id="hot")
    assert t.state_checksum(spark) == oracle.state_checksum(oracle.sequential_apply(pdf))


def test_event_layout_partition_pruning(spark, small_events, tmp_path):
    """S3: the binlog-file auto-discovery analog — a log_file predicate
    prunes partitions at planning time (PartitionFilters), and the S4
    master-status analog reports the max landed position."""
    from bingo2sql_spark.sources.layout import head_position, land_events, read_events

    path = str(tmp_path / "landed")
    land_events(small_events, path)
    df = read_events(spark, path)
    q = df.filter(F.col("p_file") == "bin.000001").select("seq", "log_pos")
    plan = _plan(q)
    assert "PartitionFilters: [" in plan and "p_file" in plan.split("PartitionFilters")[1].split("]")[0]
    assert q.count() == small_events.filter("log_file = 'bin.000001'").count()
    hf, hp = head_position(spark, path)
    mx = small_events.agg(F.max(F.struct("log_file", "log_pos")).alias("m")).collect()[0]["m"]
    assert (hf, hp) == (mx["log_file"], mx["log_pos"])


def test_filters_push_below_decode(spark, small_events, tmp_path):
    """Catalyst must reorder F1/F4 predicates BELOW the from_json decode
    projection and into the raw scan — decoding 100 TB then filtering is
    the failure mode (SURVEY §4: filters upstream of widening ops)."""
    from bingo2sql_spark.operators import filters as FL
    from bingo2sql_spark.sources.decode import decode_events
    from bingo2sql_spark.sources.synth import to_raw

    p = str(tmp_path / "raw")
    to_raw(small_events).write.parquet(p)
    raw = spark.read.parquet(p)
    q = FL.apply_filters(
        decode_events(raw), tables=["repo_files"], start_time="2024-01-01 00:01:00"
    )
    plan = _plan(q)
    pushed = plan.split("PushedFilters: [")[1].split("ReadSchema")[0]
    assert "GreaterThanOrEqual(ts" in pushed
    # decode (from_json) must appear ABOVE the filter in the plan tree
    assert plan.index("from_json") < plan.index("FileScan")
    assert "Filter" in plan.split("from_json")[-1]


def test_typed_decode_prunes_nested_before_image(spark, small_events, tmp_path):
    """Typed-wire decode with the before image narrowed to the merge
    keys must compose with nested-schema pruning: the parquet ReadSchema
    carries only before.repo/before.path — the before-image payload
    bytes (content dominates) are never read off disk. This is the
    scale payoff of the typed landing (VERDICT r3 #1): decode is not
    just parse-free, it also shrinks the scan."""
    from bingo2sql_spark.sources.decode import decode_events_typed
    from bingo2sql_spark.sources.synth import to_raw_typed

    p = str(tmp_path / "typed_raw")
    to_raw_typed(small_events).write.parquet(p)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    try:
        q = decode_events_typed(
            spark.read.parquet(p), before_fields=["repo", "path"]
        )
        plan = _plan(q)
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "from_json" not in plan  # pure projection
    read = plan.split("ReadSchema: ")[-1]
    before_seg = read.split("before:struct<")[1].split(">")[0]
    assert "repo" in before_seg and "path" in before_seg
    assert "content" not in before_seg, before_seg


def test_decorate_window_is_partitioned(spark, small_events):
    """S6 decoration must not funnel the data path through a single
    partition: the lag window hash-partitions on the seq block; only the
    metadata-scale carry aggregate (one row per block) may see a
    SinglePartition exchange."""
    from bingo2sql_spark.functions.render import decorate, render_sql

    plan = decorate(render_sql(small_events))._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_blk" in plan
    # any single-partition exchange must sit above the per-block
    # aggregate (max_by carry), never above the full-width stream
    for frag in plan.split("Exchange SinglePartition")[1:]:
        assert "max_by" in frag or "HashAggregate" in frag


def test_degenerate_bucket_caps_default_on(spark):
    """VERDICT r4 #3: the dedup pair generators must carry their
    degenerate-bucket cap sub-plan BY DEFAULT — a naive caller at corpus
    scale must not get the quadratic boilerplate blow-up. Two deliberate
    cap shapes exist since r9: minhash/ngram cap with a bucket-count
    WINDOW over the band exchange (the candidate join reuses its
    partitioning — one exchange instead of groupBy + semi-join), while
    the simhash variants keep the count + semi/anti-join (their pair
    expansion is orders of magnitude larger than the band table, and
    AQE's coalescing of the small window exchange would starve it)."""
    from bingo2sql_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma w{i} delta epsilon zeta eta") for i in range(30)],
        ["doc_id", "text"],
    )
    for df in (
        DD.minhash_candidate_pairs(docs),
        DD.ngram_jaccard_pairs(docs, threshold=0.1),
    ):
        plan = _optimized(df)
        # window-count cap: count over the band partition + <= filter
        assert "windowspecdefinition" in plan and "count(" in plan, plan
        assert "<= " in plan, plan
    for df in (
        DD.simhash_pairs(docs),
        DD.simhash_pairs_banded(docs),
    ):
        plan = _optimized(df)
        # the cap materializes as a semi join (keep-list) or anti join
        # (drop-list) against the bucket-count aggregate
        assert "LeftSemi" in plan or "LeftAnti" in plan, plan
        assert "count(" in plan, plan


def test_cap_drop_is_logged(spark, caplog):
    """No silent caps: log_dropped=True must log the exact number of
    groups the cap drops (warning when nonzero), and the default logs
    the cap's activation."""
    import logging

    from bingo2sql_spark.operators import dedup as DD

    boiler = spark.createDataFrame(
        [(i, "same same same words") for i in range(20)], ["doc_id", "text"]
    )
    with caplog.at_level(logging.INFO, logger="bingo2sql_spark.dedup"):
        out = DD.simhash_pairs(boiler, n_bits=16, max_bucket_size=10, log_dropped=True)
        assert out.count() == 0
    hits = [r for r in caplog.records if "cap dropped" in r.getMessage()]
    assert hits and "dropped 1" in hits[0].getMessage(), [
        r.getMessage() for r in caplog.records
    ]
    assert hits[0].levelno == logging.WARNING
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="bingo2sql_spark.dedup"):
        DD.simhash_pairs(boiler, n_bits=16, max_bucket_size=10)
    assert any("cap active" in r.getMessage() for r in caplog.records)


def test_election_merge_plan_shape(spark, small_events, tmp_path):
    """Key-only election plan (VERDICT r4 #1): the winning-seq set must
    arrive via a BROADCAST semi-join (never a shuffle of the content
    side on seq), the election aggregate must have a map-side partial
    phase (its shuffle carries one (key, max seq) pair per key), and the
    bucket exchange must sit ABOVE the semi-join — content of loser rows
    never enters it."""
    from bingo2sql_spark.operators.apply import IcebergLiteTable
    from bingo2sql_spark.pipeline import replay

    t = IcebergLiteTable(
        str(tmp_path / "el"), n_buckets=8, merge_strategy="election"
    )
    replay(small_events.filter("seq < 800"), t, batch_id="b1")

    # rebuild the exact merge plan commit() runs for the second batch
    from bingo2sql_spark.operators import resolve as R
    from bingo2sql_spark.operators.apply import _merge_batch, bucket_col

    b = (
        R.to_upsert_rows(R.with_key(small_events.filter("seq >= 800")))
        .withColumn("bucket", bucket_col(8))
        .withColumnRenamed("_seq", "_ingest_seq")
    )
    cur = t._read_raw(spark)
    cols = t.latest_manifest()["columns"]
    for c in cols:
        if c not in b.columns:
            b = b.withColumn(c, F.lit(None).cast("string"))
    from bingo2sql_spark.operators.apply import INTERNAL_COLS

    b = b.select(*cols, *INTERNAL_COLS)
    cur = cur.select(*cols, *INTERNAL_COLS)
    plan = _plan(_merge_batch(cur, b, cols, False, 8, elect=True))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "partial_max" in plan or "partial_finalmerge" in plan or (
        "HashAggregate" in plan and "keys=[repo" in plan
    ), plan
    # the bucket repartition must consume the semi-join output: below
    # the hashpartitioning(bucket...) exchange there is a semi join
    seg = plan.split("Exchange hashpartitioning(bucket")[-1]
    assert "LeftSemi" in seg, seg


def test_sort_merge_plan_single_exchange(spark):
    """merge_impl='sort' (r7 #1): the window's clustered distribution is
    satisfied by the existing hash(bucket) exchange — the sort plan pays
    ONE exchange + a local sort, never a second shuffle; and no hash
    aggregate holds per-key winner state (the LLC-bound structure the
    sort impl exists to avoid)."""
    from bingo2sql_spark.operators import resolve as R
    from bingo2sql_spark.operators.apply import _merge_batch, bucket_col
    from bingo2sql_spark.sources.synth import generate_events

    ev = generate_events(spark, n_keys=200, versions_per_key=4)
    rows = R.to_upsert_rows(R.with_key(ev)).withColumn(
        "bucket", bucket_col(16)
    ).withColumnRenamed("_seq", "_ingest_seq")
    all_cols = ["repo", "path", "commit", "lang", "content", "branch"]
    merged = _merge_batch(rows.limit(0), rows, all_cols, partial=False,
                          n_out=8, impl="sort")
    plan = _plan(merged)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    frag = plan.split("Exchange hashpartitioning", 1)[1][:120]
    assert "bucket" in frag, frag
    assert "Window" in plan and "Sort" in plan, plan
    # row-winner resolution must NOT be a hash aggregate in this impl
    assert "max_by" not in plan, plan


def test_bucket_aligned_landing_feeds_pass_through_exchange(spark, tmp_path):
    """land_bucket_aligned (r7 #1): the landing is physically
    partitioned by the TABLE's bucket function, decode projects the
    partition column away, and replay over it produces the same single
    bucket exchange — but each map task now holds one bucket's keys, so
    per-split combine maps are bucket-sized. Cheap proxy assertions:
    the landing dir has pbucket=*/ partitions whose row buckets all
    match the dir, and the decoded frame matches the flat landing's."""
    import os

    from bingo2sql_spark.operators.apply import bucket_col
    from bingo2sql_spark.sources.decode import decode_events_typed
    from bingo2sql_spark.sources.layout import land_bucket_aligned
    from bingo2sql_spark.sources.synth import generate_events, to_raw_typed

    ev = generate_events(spark, n_keys=100, versions_per_key=3, seed=5)
    raw = to_raw_typed(ev)
    out = str(tmp_path / "landing")
    land_bucket_aligned(raw, out, n_buckets=8)
    parts = sorted(d for d in os.listdir(out) if d.startswith("pbucket="))
    assert parts and all("=" in p for p in parts)
    landed = spark.read.parquet(out)
    # dir partition == the bucket function of the row's merge keys;
    # bucket_col reads top-level repo/path, so rebuild them like the
    # writer did
    import pyspark.sql.functions as F
    keyed = landed.withColumn(
        "repo", F.coalesce(F.col("after.repo"), F.col("before.repo"))
    ).withColumn(
        "path", F.coalesce(F.col("after.path"), F.col("before.path"))
    )
    bad = keyed.withColumn("_expect", bucket_col(8)).filter(
        F.col("pbucket") != F.col("_expect")
    ).count()
    assert bad == 0
    # decode ignores the extra partition column and round-trips the set
    dec = decode_events_typed(landed.drop("pbucket"))
    flat = decode_events_typed(raw)
    assert dec.count() == flat.count()
    assert {r["seq"] for r in dec.select("seq").collect()} == {
        r["seq"] for r in flat.select("seq").collect()
    }

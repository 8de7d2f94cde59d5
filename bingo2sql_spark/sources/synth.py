"""Deterministic, fully-distributed synthetic binlog-event generator.

Replaces the reference's live-MySQL test fixture (binlog produced by real
DML, core/parser_test.go:171-176) with a seeded generator that needs no
driver-side loops: every column is a pure function of (seed, key_id, v)
computed with JVM-side Column expressions (xxhash64 + arithmetic), so it
scales to 10^10 events by just widening `spark.range` — no data is ever
materialized on the driver.

Stream invariants (mirroring what a row-format binlog guarantees):
- `seq` is a global total order (= binlog file/pos flattened);
  within a key, versions are strictly increasing in seq.
- every UPDATE/DELETE carries a *valid* before image: exactly the row
  state produced by that key's previous event (reference relies on this
  for flashback, core/parser.go:1499-1623).
- DELETE is only ever followed (for that key) by INSERT.
- repos are zipf-skewed (hot-repo skew scenario from the north rule).

Op schedule (recursion-free so it is point-computable): versions are
grouped in blocks of 4. Within block g = v div 4:
- v == 0                     -> insert (first version of the key)
- v % 4 == 3 and H(key,g)%3==0 -> delete   (end of a "deleted" block)
- v % 4 == 0 and H(key,g-1)%3==0 -> insert (re-insert after delete)
- otherwise                  -> update
Hence an update/delete at v never follows a delete at v-1, so the before
image at v is always state(key, v-1) = content(key, v-1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bingo2sql_spark import schema as S

LANGS = ["go", "py", "rs", "md", "java"]
BRANCHES = ["main", "dev", "release"]
SERVER_UUIDS = [
    "8a2f1e60-0000-11ee-be56-0242ac120001",
    "8a2f1e60-0000-11ee-be56-0242ac120002",
    "8a2f1e60-0000-11ee-be56-0242ac120003",
]
EVENTS_PER_FILE = 4096  # log rotation granularity (ROTATE_EVENT analog)


def _h(*cols: Column | str | int, seed: int) -> Column:
    """Deterministic non-negative 63-bit hash of the inputs."""
    args = [F.lit(seed)] + [c if isinstance(c, Column) else F.lit(c) for c in cols]
    return F.abs(F.xxhash64(*args))


def _content(key_id: Column, v: Column, repeat: int, seed: int) -> Column:
    """Deterministic per-version content; `repeat` scales payload bytes."""
    base = F.concat_ws(
        "|",
        F.lit("content"),
        key_id.cast("string"),
        v.cast("string"),
        F.md5(F.concat_ws("-", F.lit(seed), key_id, v)),
    )
    if repeat <= 1:
        return base
    return F.concat(base, F.repeat(F.md5(base), repeat - 1))


def _lang(key_id: Column, v: Column, seed: int) -> Column:
    """Language changes occasionally across versions (update diff food)."""
    idx = _h("lang", key_id, (v / F.lit(3)).cast("long"), seed=seed) % len(LANGS)
    return F.element_at(F.array(*[F.lit(x) for x in LANGS]), (idx + 1).cast("int"))


def _branch(key_id: Column, v: Column, seed: int) -> Column:
    idx = _h("branch", key_id, v, seed=seed) % len(BRANCHES)
    return F.element_at(F.array(*[F.lit(x) for x in BRANCHES]), (idx + 1).cast("int"))


def generate_events(
    spark: SparkSession,
    n_keys: int = 1000,
    versions_per_key: int = 8,
    n_repos: int = 50,
    seed: int = 42,
    content_repeat: int = 1,
    evolve_frac: float = 0.5,
    minimal_image: bool = False,
    other_table_mod: int = 19,
    num_partitions: int | None = None,
    ddl_every: int | None = None,
) -> DataFrame:
    """Build the event-envelope DataFrame (schema.ENVELOPE, v2 payload).

    Total events = n_keys * versions_per_key. Events with
    seq >= evolve_frac * total carry schema_ver=2 (payload gains
    `branch`); earlier events are schema_ver=1 with branch NULL
    (schema-evolution scenario).

    Keys whose hash % other_table_mod == 0 live in `meta.audit_log`
    instead of `test.repo_files` (food for the F4 schema/table filter).

    `ddl_every=n` interleaves one op='ddl' Query event (with a
    `statement` column, NULL on DML rows) after every n DML events —
    the reference's binlog carries DDL as Query events among the row
    events (TestParseDDL core/parser_test.go:551-610). DML seqs shift
    by a MONOTONE map (seq' = seq + seq//n) to make room, so the
    within-key ordering and before-image invariants are untouched.
    """
    total = n_keys * versions_per_key
    evolve_at = int(total * evolve_frac)

    df = spark.range(0, total, 1, num_partitions or spark.sparkContext.defaultParallelism)
    key_id = (F.col("id") % n_keys).alias("key_id")
    v = (F.col("id") / n_keys).cast("long").alias("v")
    df = df.select(F.col("id").alias("seq"), key_id, v)

    k, vv = F.col("key_id"), F.col("v")
    g = (vv / 4).cast("long")

    # --- op schedule (see module docstring) --------------------------------
    del_this = (vv % 4 == 3) & (_h("del", k, g, seed=seed) % 3 == 0)
    reinsert = (vv % 4 == 0) & (vv > 0) & (_h("del", k, g - 1, seed=seed) % 3 == 0)
    op = (
        F.when(vv == 0, F.lit(S.OP_INSERT))
        .when(reinsert, F.lit(S.OP_INSERT))
        .when(del_this, F.lit(S.OP_DELETE))
        .otherwise(F.lit(S.OP_UPDATE))
    )

    # --- key -> (repo, path): zipf-ish repo skew ---------------------------
    u = (_h("repo", k, seed=seed) % 1_000_000) / 1_000_000.0
    repo_id = F.floor(F.pow(F.lit(float(n_repos)), u)) - 1  # ~zipf(1) via N^u
    repo = F.concat(F.lit("repo-"), F.lpad(repo_id.cast("string"), 4, "0"))
    path = F.concat(
        F.lit("src/"),
        (_h("dir", k, seed=seed) % 64).cast("string"),
        F.lit("/f"),
        k.cast("string"),
        F.lit(".txt"),
    )

    # --- payload images -----------------------------------------------------
    is_v2 = F.col("seq") >= evolve_at
    prev_is_v2 = (F.col("seq") - n_keys) >= evolve_at  # schema_ver of (key, v-1)
    commit = F.lpad(F.conv((F.col("seq") + 1).cast("string"), 10, 16), 16, "0")
    prev_commit = F.lpad(F.conv((F.col("seq") - n_keys + 1).cast("string"), 10, 16), 16, "0")

    def image(commit_c: Column, lang_c, content_c, branch_c) -> Column:
        return F.struct(
            repo.alias("repo"),
            path.alias("path"),
            commit_c.alias("commit"),
            lang_c.alias("lang"),
            content_c.alias("content"),
            branch_c.alias("branch"),
        )

    after_img = image(
        commit,
        _lang(k, vv, seed),
        _content(k, vv, content_repeat, seed),
        F.when(is_v2, _branch(k, vv, seed)).otherwise(F.lit(None).cast("string")),
    )
    before_img = image(
        prev_commit,
        _lang(k, vv - 1, seed),
        _content(k, vv - 1, content_repeat, seed),
        F.when(prev_is_v2, _branch(k, vv - 1, seed)).otherwise(F.lit(None).cast("string")),
    )

    payload_t = "struct<repo:string,path:string,commit:string,lang:string,content:string,branch:string>"
    null_img = F.lit(None).cast(payload_t)

    before = F.when(op == S.OP_INSERT, null_img).otherwise(before_img)
    after = F.when(op == S.OP_DELETE, null_img).otherwise(after_img)

    # --- changed-cols mask (MINIMAL row image, core/parser_test.go:727-755)
    # commit & content change on every update; lang occasionally; branch
    # on every v2 update (it is re-rolled per version)
    lang_changed = _lang(k, vv, seed) != _lang(k, vv - 1, seed)
    base_changed = F.when(
        lang_changed, F.array(F.lit("commit"), F.lit("lang"), F.lit("content"))
    ).otherwise(F.array(F.lit("commit"), F.lit("content")))
    base_changed = F.when(
        is_v2, F.concat(base_changed, F.array(F.lit("branch")))
    ).otherwise(base_changed)
    changed = F.when(op == S.OP_UPDATE, base_changed).otherwise(
        F.lit(None).cast("array<string>")
    )

    if minimal_image:
        # MINIMAL row image: update images carry only keys + changed
        # columns (both before AND after), like binlog_row_image=MINIMAL
        def minimal(img):
            def keep(c):
                return F.when(F.array_contains(changed, c), img[c]).cast("string").alias(c)

            return F.struct(
                img["repo"].alias("repo"),
                img["path"].alias("path"),
                keep("commit"),
                keep("lang"),
                keep("content"),
                keep("branch"),
            )

        before = F.when(op == S.OP_UPDATE, minimal(before_img)).otherwise(before)
        after = F.when(op == S.OP_UPDATE, minimal(after_img)).otherwise(after)

    # --- envelope header ----------------------------------------------------
    db = F.when(_h("tbl", k, seed=seed) % other_table_mod == 0, F.lit("meta")).otherwise(
        F.lit("test")
    )
    table = F.when(db == "meta", F.lit("audit_log")).otherwise(F.lit("repo_files"))
    uuid_idx = (_h("srv", k, seed=seed) % len(SERVER_UUIDS) + 1).cast("int")
    gtid_uuid = F.element_at(F.array(*[F.lit(x) for x in SERVER_UUIDS]), uuid_idx)

    out = df.select(
        F.col("seq"),
        F.concat(
            F.lit("bin."),
            F.lpad(((F.col("seq") / EVENTS_PER_FILE).cast("long") + 1).cast("string"), 6, "0"),
        ).alias("log_file"),
        (F.lit(4) + (F.col("seq") % EVENTS_PER_FILE) * 200 + _h("pos", k, vv, seed=seed) % 100)
        .cast("long")
        .alias("log_pos"),
        gtid_uuid.alias("gtid_uuid"),
        F.col("seq").alias("gno"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("seq")).alias("ts"),
        (_h("thr", k, vv, seed=seed) % 32).alias("thread_id"),
        db.alias("db"),
        table.alias("table"),
        op.alias("op"),
        before.alias("before"),
        after.alias("after"),
        changed.alias("changed_cols"),
        F.when(is_v2, F.lit(2)).otherwise(F.lit(1)).cast("int").alias("schema_ver"),
    )
    if ddl_every:
        out = _interleave_ddl(spark, out, total=total, every=ddl_every, seed=seed)
    return out


def _interleave_ddl(
    spark: SparkSession, dml: DataFrame, total: int, every: int, seed: int
) -> DataFrame:
    """One op='ddl' row after every `every` DML events: DML seq u maps to
    u + u//every (monotone — total order and per-key ordering survive),
    the m-th DDL takes the freed slot (m+1)*every + m. DDL rows carry a
    deterministic ALTER statement; their ts is the next DML event's
    second, keeping ts weakly monotone in seq."""
    payload_t = (
        "struct<repo:string,path:string,commit:string,lang:string,"
        "content:string,branch:string>"
    )
    dml = dml.withColumn(
        "seq", F.col("seq") + (F.col("seq") / F.lit(every)).cast("long")
    ).withColumn("statement", F.lit(None).cast("string"))
    n_ddl = (total - 1) // every if total else 0
    m = F.col("id")
    u_next = (m + 1) * every  # unshifted seq of the event right after this DDL
    ddl_seq = u_next + m
    ddl = spark.range(0, n_ddl, 1, 1).select(
        ddl_seq.alias("seq"),
        F.concat(
            F.lit("bin."),
            F.lpad(((u_next / EVENTS_PER_FILE).cast("long") + 1).cast("string"), 6, "0"),
        ).alias("log_file"),
        (F.lit(4) + (u_next % EVENTS_PER_FILE) * 200 + _h("dpos", m, seed=seed) % 100)
        .cast("long")
        .alias("log_pos"),
        F.lit(SERVER_UUIDS[0]).alias("gtid_uuid"),
        (F.lit(total) + m).alias("gno"),
        F.timestamp_seconds(F.lit(1704067200) + u_next).alias("ts"),
        (_h("dthr", m, seed=seed) % 32).alias("thread_id"),
        F.lit("test").alias("db"),
        F.lit("repo_files").alias("table"),
        F.lit(S.OP_DDL).alias("op"),
        F.lit(None).cast(payload_t).alias("before"),
        F.lit(None).cast(payload_t).alias("after"),
        F.lit(None).cast("array<string>").alias("changed_cols"),
        F.lit(1).cast("int").alias("schema_ver"),
        F.concat(
            F.lit("ALTER TABLE `test`.`repo_files` COMMENT 'ddl-"),
            m.cast("string"),
            F.lit("'"),
        ).alias("statement"),
    )
    return dml.unionByName(ddl)


def to_raw_typed(events: DataFrame) -> DataFrame:
    """Serialize envelope rows to the TYPED wire schema
    (schema.RAW_EVENT_TYPED): row images stay typed structs, as a
    connector with a schema registry lands them (Debezium + Avro/parquet
    sink). Decode of this shape is a pure projection
    (decode.decode_events_typed) — no parse tax. Column order pinned to
    the wire schema so parquet footers are stable across producers."""
    return events.select(*[f.name for f in S.ENVELOPE.fields])


def to_raw(events: DataFrame) -> DataFrame:
    """Serialize envelope rows to the raw wire schema (schema.RAW_EVENT):
    row images as JSON strings, as a binlog tailer would land them before
    the decode stage (sources S1/S2, core/parseFile.go:16-179)."""
    return events.select(
        "seq",
        "log_file",
        "log_pos",
        "gtid_uuid",
        "gno",
        "ts",
        "thread_id",
        "db",
        "table",
        "op",
        F.to_json("before").alias("before_json"),
        F.to_json("after").alias("after_json"),
        "changed_cols",
        "schema_ver",
    )

"""MERGE-style upsert sink: an Iceberg-lite snapshot/manifest table.

The real deployment target is `MERGE INTO` an Iceberg table; the sandbox
has no Iceberg jars, so this module implements the same observable
semantics on plain parquet (SURVEY.md §7.3) with Iceberg's architecture
in miniature:

- data files are immutable, grouped into snapshots:
  `data/snap-<version>-<attempt-uuid>/pbucket=<b>/part-*.parquet` —
  the uuid makes each WRITER ATTEMPT's dir unique, so optimistic
  writers racing one version can never clobber or interleave files
  before the manifest CAS decides the winner (the manifest's
  `snap_dirs` maps version -> winning dir; losers' dirs are orphans
  expire_snapshots reclaims)
- a manifest (JSON, atomically renamed into place) maps every bucket to
  the snapshot that currently owns it, carries the committed-batch set
  (idempotence / exactly-once), per-bucket lineage (max binlog position
  -> snapshot, per the north rule "per-partition lineage: source log
  position -> Iceberg snapshot"), and the evolving column list.

Merge semantics: last-writer-wins BY SOURCE LOG POSITION, with retained
tombstones (Iceberg delete-file analog):

    winners(key) = argmax_seq( current-rows ∪ batch-rows )

Stored rows keep the writer's binlog seq (`_ingest_seq`); DELETE winners
are kept as `_deleted` tombstone rows so that a late-arriving older
event can never resurrect a deleted key. This makes the sink a LWW
register per key — commits CONVERGE under any micro-batch delivery
order, duplicate delivery (batch_ids already committed are skipped), and
replay from any checkpoint (north rule). Flashback batches participate
correctly because pipeline.replay REBASES their seqs past the current
log head (a rollback executed against MySQL is new binlog traffic with
new positions — same model). Tombstones are physically dropped by
`compact()` once no older replays are in flight.

Scale design (10^10 events, 100 TB table):
- hash-bucketed by (repo, path) into `n_buckets`; a commit rewrites ONLY
  buckets its batch touches (manifest-level pruning — untouched buckets
  are never listed, let alone read): the Iceberg copy-on-write MERGE
  shape. Bucketing the *composite* key spreads hot repos.
- `write_mode="mor"` switches commits to MERGE-ON-READ (Hudi /
  Iceberg-v2 delete-file shape): append one per-bucket delta file of
  batch winners — O(batch) per commit, stored data never read — and
  reconcile base ∪ deltas at read time; `compact()` folds deltas back.
  The right mode when micro-batches are small relative to bucket data.
- the LWW window shuffles current∪batch by the same keys the batch was
  already partitioned on; AQE coalesces the small side.
- crash safety: the manifest rename is the commit point; data of a
  failed commit is never referenced (orphans, GC-able).

Reference parity: replaces bingo2sql's single-writer ordered SQL file
sink (ProcessChan/myWrite core/parser.go:844-857,672-727) with an
ordered-by-sort, merge-into-table sink.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid as _uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bingo2sql_spark import schema as S

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same snapshot version first
    (optimistic concurrency — caller re-reads and retries)."""
#: per-row provenance is stored in the table: the writer's log seq and
#: source binlog position (per-partition lineage falls out of parquet
#: column stats over these — no extra pass).
INTERNAL_COLS = ("_ingest_seq", "_deleted", "_log_file", "_log_pos", "bucket")


#: internal columns that ride inside the LWW winner struct (bucket is a
#: GROUPING key of the merge — it is a pure function of the merge keys)
INTERNAL_NO_BUCKET = tuple(c for c in INTERNAL_COLS if c != "bucket")


def _name_translate(expr, mapping: dict[str, str]):
    """when-chain over a string expression translating old column names
    to new (rename support for per-column attribution metadata)."""
    out = None
    for old, new in mapping.items():
        cond = expr == F.lit(old)
        out = F.when(cond, F.lit(new)) if out is None else out.when(cond, F.lit(new))
    return expr if out is None else out.otherwise(expr)


def _translate_partial_meta(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """After a column rename, per-column attribution metadata written
    under the OLD name must read as the new one: `_col_seqs` map keys
    and `_changed_cols` entries are rewritten in place (pure expression,
    no shuffle)."""
    if not mapping:
        return df
    if "_col_seqs" in df.columns:
        df = df.withColumn(
            "_col_seqs",
            F.transform_keys("_col_seqs", lambda k, _v: _name_translate(k, mapping)),
        )
    if "_changed_cols" in df.columns:
        df = df.withColumn(
            "_changed_cols",
            F.transform("_changed_cols", lambda x: _name_translate(x, mapping)),
        )
    return df


def _merge_batch(
    current: DataFrame,
    batch_rows: DataFrame,
    all_cols: list[str],
    partial: bool,
    n_out: int,
    emit_changed: bool = False,
    elect: bool = False,
    win: DataFrame | None = None,
    impl: str = "hash",
) -> DataFrame:
    """The MERGE: per-key LWW by source seq over stored ∪ batch rows
    (collapses multiple events per key within the batch too). Tombstones
    stay as rows so older replays cannot resurrect deleted keys.

    ONE full-data exchange: the union is repartitioned by `bucket` and
    the aggregate groups by (bucket, *keys) — since bucket is a
    deterministic function of the merge keys, hash(bucket) partitioning
    co-locates every key's rows and satisfies the aggregate's clustered
    distribution, so Catalyst inserts NO second exchange; the output
    stays clustered by bucket, which is exactly what the dynamic
    pbucket-partitioned write wants (one contiguous writer per bucket,
    no tasks x buckets file blow-up).

    elect=True — KEY-ONLY WINNER ELECTION with late content
    materialization (VERDICT r4 #1): that one exchange normally carries
    every candidate row's full content, losers included — at 100 TB the
    shuffle is payload-scale though only winners survive the aggregate.
    The election first reduces (keys, _ingest_seq) alone — a narrow
    map-side-combined aggregate whose shuffle carries one (key, max seq)
    pair per distinct key, with the stored side read column-pruned and a
    typed-wire batch side decoding only key fields — then semi-joins the
    full rows against the BROADCAST winning-seq set, so content enters
    the bucket exchange only for rows that can still win. Seqs are
    globally unique per source event and each event touches one key, so
    matching on seq alone is key-safe; a re-delivered duplicate (same
    seq stored AND in the batch) passes twice and the unchanged final
    aggregate — still the exact arbiter — collapses it. Invalid for
    partial=True (per-column winners draw columns from row-level
    losers), enforced by the caller.

    `win` — an already-materialized winning-seq set (the runtime
    "auto" fallback persisted + counted it to check the broadcast
    bound, VERDICT r5 #3): used as-is so the broadcast reads the
    cached blocks instead of recomputing the election aggregate.

    impl="sort" (VERDICT r7 #1 — the LLC-bound merge): resolve
    row-level winners with a SORT-based plan — local sort by (bucket,
    keys, seq desc) then row_number()==1 — instead of the hash
    aggregate. The hash plan holds one full winner row per distinct key
    in a per-task map; past ~10M candidate rows those maps outgrow the
    shared last-level cache and every probe is a DRAM round-trip, which
    caps N-vs-4N scaling (r7 measured 0.73 at 32M events). The sort
    plan's working set is the radix-sort run buffer — sequential,
    cache-friendly, spill-graceful — and the window still needs NO
    extra exchange (hash(bucket) satisfies its clustered distribution).
    Row-level merges only; MINIMAL-image merges are per-COLUMN
    aggregations with no sort-based equivalent and always use hash."""
    both = current.unionByName(batch_rows)
    if elect:
        if partial:
            raise ValueError("key-only election cannot apply to MINIMAL-image merges")
        if win is None:
            win = _election_winners(both)
        both = both.join(
            F.broadcast(win), both["_ingest_seq"] == win["_win_seq"], "left_semi"
        )
    both = both.repartition(n_out, "bucket")
    if impl == "sort" and not partial:
        from pyspark.sql.window import Window

        w = Window.partitionBy("bucket", *S.MERGE_KEYS).orderBy(
            F.col("_ingest_seq").desc()
        )
        return (
            both.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*all_cols, *INTERNAL_COLS)
        )
    return _per_key_winners(both, all_cols, partial, emit_changed)


def _election_winners(both: DataFrame) -> DataFrame:
    """The key-only election's narrow aggregate: one (max seq) row per
    distinct candidate key — map-side combined, shuffle carries 8 B/key
    of payload. Shared by the in-plan election and the runtime "auto"
    bound check (which persists + counts this before broadcasting)."""
    return (
        both.select(*S.MERGE_KEYS, "_ingest_seq")
        .groupBy(*S.MERGE_KEYS)
        .agg(F.max("_ingest_seq").alias("_win_seq"))
        .select("_win_seq")
    )


def _per_key_winners(
    df: DataFrame,
    all_cols: list[str],
    partial: bool,
    emit_changed: bool = False,
) -> DataFrame:
    """Collapse rows to per-(bucket, key) LWW winners — shared by the
    commit MERGE and the MOR read-time reconciliation.

    partial=False: row-level max_by over _ingest_seq.

    partial=True — the MINIMAL row-image path: per-COLUMN
    last-present-writer. Stored/full rows act as full-image
    pseudo-events (`_changed_cols` NULL); an update contributes only
    its changed columns; insert images are complete, so pre-delete
    values can never leak (see resolve.to_upsert_rows_partial).

    emit_changed carries the merged presence metadata forward: NULL if
    any non-delete contributor was a full image, else the sorted union
    of the contributors' changed sets. Required when the output is
    stored as a MOR delta — the delta row is itself re-merged at read
    time and must still say which columns it actually carries.

    PER-COLUMN SEQ ATTRIBUTION (the full fix for ADVICE r4): partial
    output rows always carry `_col_seqs: map<col, winning seq>` — the
    seq of the contributor that actually wrote each column — and
    collapsed rows re-entering a later merge use the MAP, not the
    row-level max, as each column's seq. That makes MINIMAL-image
    state order-independent ACROSS commits too: an out-of-order ad-hoc
    replay with an interleaving seq wins or loses each column against
    the column's true writer, never against an unrelated newer
    contributor's row seq. Raw event rows (no map) attribute every
    present column to the event's own seq, which is exactly what the
    event did.

    SPARSE ENCODING (r6): the emitted map only materializes the
    EXCEPTIONS — a column whose winning seq differs from the row-level
    winner seq keeps its entry, and a never-written (NULL-since-birth)
    column keeps a NULL-valued entry (it must lose to ANY real writer).
    A column ABSENT from the map was written by the row winner at the
    row's `_ingest_seq`. After single-writer or full-image commits —
    the overwhelmingly common case — the map is empty, so the 10-20%
    map-emission tax the dense encoding paid on every MINIMAL merge
    (VERDICT r5) shrinks to a constant column. The read side decodes
    BOTH encodings (dense maps written by earlier snapshots carry
    redundant row-seq entries, which coalesce to the same answer), so
    no stored table needs rewriting."""
    data_cols = [c for c in all_cols if c not in S.MERGE_KEYS]
    if not partial:
        winner = F.max_by(
            F.struct(*data_cols, *INTERNAL_NO_BUCKET), F.col("_ingest_seq")
        ).alias("_w")
        return (
            df.groupBy("bucket", *S.MERGE_KEYS)
            .agg(winner)
            .select(*S.MERGE_KEYS, "_w.*", "bucket")
            .select(*all_cols, *INTERNAL_COLS)
        )
    seq = F.col("_ingest_seq")
    has_map = "_col_seqs" in df.columns
    aggs = [F.max_by(F.struct(*INTERNAL_NO_BUCKET), seq).alias("_w")]
    for c in data_cols:
        changed_ok = F.col("_changed_cols").isNull() | F.array_contains(
            F.col("_changed_cols"), c
        )
        if has_map:
            carries_map = F.col("_col_seqs").isNotNull()
            entry = F.col("_col_seqs").getItem(c)
            # sparse decode: a NULL-VALUED entry marks never-written; an
            # absent key means the row winner wrote it (seq = row seq).
            # Dense maps (row-seq entries materialized) decode identically.
            never_written = F.map_contains_key(F.col("_col_seqs"), F.lit(c)) & entry.isNull()
            present = ~F.col("_deleted") & F.when(
                carries_map, ~never_written
            ).otherwise(changed_ok)
            seq_c = F.coalesce(entry, seq)
        else:
            present = ~F.col("_deleted") & changed_ok
            seq_c = seq
        aggs.append(
            F.max(
                F.when(present, F.struct(seq_c.alias("s"), F.col(c).alias("v")))
            ).alias(f"_pw_{c}")
        )
    extra = ["_col_seqs"]
    if emit_changed:
        any_full = F.max(
            F.when(~F.col("_deleted") & F.col("_changed_cols").isNull(), 1)
        )
        union_changed = F.array_sort(
            F.array_distinct(
                F.flatten(F.collect_list(F.when(~F.col("_deleted"), F.col("_changed_cols"))))
            )
        )
        aggs.append(
            F.when(any_full == 1, F.lit(None).cast("array<string>"))
            .otherwise(union_changed)
            .alias("_changed_cols")
        )
        extra = ["_changed_cols", "_col_seqs"]
    if data_cols:
        # sparse emission: keep only exception entries — NULL seq
        # (never-written marker) or a winner older than the row winner;
        # everything else is implied by the row's _ingest_seq
        row_seq = F.col("_w")["_ingest_seq"]
        col_seqs = F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in data_cols]),
                F.array(*[F.col(f"_pw_{c}")["s"] for c in data_cols]),
            ),
            lambda _k, v: v.isNull() | (v != row_seq),
        ).alias("_col_seqs")
    else:
        col_seqs = F.lit(None).cast("map<string,bigint>").alias("_col_seqs")
    return (
        df.groupBy("bucket", *S.MERGE_KEYS)
        .agg(*aggs)
        .select(
            *S.MERGE_KEYS,
            *[F.col(f"_pw_{c}")["v"].alias(c) for c in data_cols],
            "_w.*",
            "bucket",
            *(["_changed_cols"] if emit_changed else []),
            col_seqs,
        )
        .select(*all_cols, *INTERNAL_COLS, *extra)
    )


def bucket_col(n_buckets: int):
    """Deterministic bucket of the composite merge key. Hashing the
    composite (repo, path) — not repo alone — is what defuses hot-repo
    skew (SURVEY.md §7.4#5)."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in S.MERGE_KEYS]), F.lit(n_buckets)).cast("int")


class IcebergLiteTable:
    """See module docstring. `write_mode`:

    - "cow" (default) — copy-on-write: each commit REWRITES the buckets
      its batch touches (merge + write). Reads are raw file scans.
      Right when commits are large relative to bucket size, or reads
      dominate.
    - "mor" — merge-on-read (the Hudi/Iceberg-v2 delete-file shape):
      each commit APPENDS one delta file per touched bucket containing
      only the batch's per-key winners — commit cost is O(batch), never
      O(bucket data), which is what lets a micro-batch cadence survive
      a 100 TB table. Reads reconcile base ∪ deltas with the same LWW
      max_by (read amplification is the trade); `compact()` folds
      deltas back into a fresh base. Correctness (tombstones, LWW,
      exactly-once, time-travel, changelog) is identical by
      construction — both modes converge to the same state_checksum.
    """

    def __init__(
        self,
        path: str,
        n_buckets: int = 64,
        write_mode: str = "cow",
        max_delta_depth: int | None = None,
        max_read_amplification: float | None = None,
        merge_strategy: str = "full",
        election_max_rows: int = 50_000_000,
        election_min_rows: int = 0,
        merge_impl: str = "hash",
        merge_rows_per_task: int | None = None,
        merge_tasks_per_core: int = 4,
    ):
        if write_mode not in ("cow", "mor"):
            raise ValueError(f"write_mode must be 'cow' or 'mor', got {write_mode!r}")
        if merge_strategy not in ("auto", "election", "full"):
            raise ValueError(
                f"merge_strategy must be 'auto', 'election' or 'full', "
                f"got {merge_strategy!r}"
            )
        if merge_impl not in ("hash", "sort"):
            raise ValueError(f"merge_impl must be 'hash' or 'sort', got {merge_impl!r}")
        self.path = path
        self.n_buckets = n_buckets
        self.write_mode = write_mode
        #: MOR maintenance policy: when any bucket's delta list exceeds
        #: this depth after a commit, compact() runs inline (the Hudi
        #: "inline compaction" knob) — bounds read amplification without
        #: an external maintenance job. None = manual compaction only.
        self.max_delta_depth = max_delta_depth
        #: MOR maintenance policy #2 (VERDICT r4 #5): compact when any
        #: bucket's MEASURED read amplification — delta rows / base rows,
        #: maintained from the commits' parquet footer stats, no data
        #: read — exceeds this ratio. Depth alone misses the read-heavy
        #: shape: a couple of LARGE deltas (replays, backfills) double
        #: every read's row volume at depth 2, while a hundred tiny
        #: deltas on a 10^8-row bucket are harmless at depth 100. Either
        #: trigger fires independently; both keep tombstones.
        self.max_read_amplification = max_read_amplification
        #: MERGE shuffle strategy (see _merge_batch): "full" shuffles
        #: every candidate row's content (the classic plan); "election"
        #: always runs the key-only winner election + broadcast
        #: semi-join; "auto" elects when the candidate-key count fits
        #: under `election_max_rows` — past that the winning-seq
        #: broadcast (8 bytes/key + set overhead) stops being
        #: driver/executor-safe and the full shuffle is the scalable
        #: plan. The bound is checked two ways (VERDICT r5 #3): when
        #: manifest metadata + the pruning pre-pass give a static upper
        #: bound under the cap, that decides for free; on every other
        #: path (empty table, MOR delta append, over-the-cap estimate)
        #: the RUNTIME FALLBACK materializes + counts the narrow
        #: election aggregate itself and abandons the broadcast past
        #: the bound — so "auto" is deployable as the default on every
        #: path, never guessing. The commit metric
        #: `election_decided_by` records which branch fired.
        #: MINIMAL-image commits always use "full" (election is
        #: per-row, their merge is per-column).
        #:
        #: Default "full": measured on this box (BENCH/shuffle_bytes.py,
        #: 3.2M events / 400k keys / 16 pinned cores, fresh JVMs)
        #: election cuts shuffle-write bytes to 0.33x (initial load) /
        #: 0.41x (incremental) of the full plan but costs 25-45% wall —
        #: a single-host tmpfs shuffle moves at RAM speed, so the saved
        #: bytes buy nothing locally while the extra narrow pass +
        #: broadcast are pure cost. On a CLUSTER, where those bytes
        #: cross the network/disks, the 2.4-3x byte cut is the win:
        #: deploy with merge_strategy="auto" there.
        #:
        #: r6 update — the in-box verdict above is SIZE-DEPENDENT: at
        #: 32M events / 4M keys (BENCH/run_scaling.py --merge-strategy)
        #: election is 1.27x faster at 2 cores and 1.6x at 8 cores even
        #: on tmpfs, because once the merge working set outgrows the
        #: shared LLC the full plan is memory-bandwidth-bound and the
        #: byte cut pays locally too. The crossover sits around ~10M
        #: candidate rows here. `election_min_rows` exposes that floor
        #: to "auto": when stored + batch rows are BELOW it, the commit
        #: keeps the full plan (`election_decided_by="below_min_rows"`).
        #: Bounded paths decide from the free static estimate; no-bound
        #: paths (empty table, MOR delta append) spend one narrow
        #: column-pruned batch count — taken only because the floor is
        #: configured, and cheaper than electing a below-crossover
        #: batch by mistake. Default 0 = no floor (cluster deployments
        #: win at any size — the bytes cross a network); set ~8-10M for
        #: single-host deployments.
        self.merge_strategy = merge_strategy
        self.election_max_rows = election_max_rows
        self.election_min_rows = election_min_rows
        #: winner-resolution plan for ROW-LEVEL merges: "hash" (max_by
        #: aggregate — map-side combinable, right when versions-per-key
        #: is high or candidate sets are small) or "sort" (local sort +
        #: row_number — bounded cache footprint, right when per-task
        #: winner maps outgrow the LLC; see _merge_batch). MINIMAL
        #: merges are per-column and always hash.
        self.merge_impl = merge_impl
        #: when set, the merge exchange targets ~this many rows per
        #: output partition (still bucket-pure, still capped by the
        #: affected-bucket count): finer tasks keep each hash-aggregate
        #: working set cache-resident at large candidate counts. None =
        #: the 4x-core default.
        self.merge_rows_per_task = merge_rows_per_task
        #: merge-exchange tasks per core (default 4x — see the n_out
        #: comment in commit). Bucket-pure partitions mean MORE tasks
        #: never change the output file count (a bucket lands in exactly
        #: one partition either way), so raising this only trades task
        #: overhead for smaller per-task aggregate state — the lever for
        #: keeping hash-merge working sets cache-resident on initial
        #: loads, where no row estimate exists yet.
        self.merge_tasks_per_core = merge_tasks_per_core
        os.makedirs(os.path.join(path, MANIFEST_DIR), exist_ok=True)

    # -- manifest bookkeeping ------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, MANIFEST_DIR, f"manifest-{version:012d}.json")

    def latest_manifest(self) -> dict[str, Any] | None:
        d = os.path.join(self.path, MANIFEST_DIR)
        names = sorted(n for n in os.listdir(d) if n.startswith("manifest-") and n.endswith(".json"))
        if not names:
            return None
        with open(os.path.join(d, names[-1])) as f:
            return json.load(f)

    def manifest_at(self, version: int) -> dict[str, Any] | None:
        """Time-travel: the manifest of snapshot `version` (None if it
        was never committed or has been expired)."""
        p = self._manifest_path(version)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def versions(self) -> list[int]:
        d = os.path.join(self.path, MANIFEST_DIR)
        return sorted(
            int(n[len("manifest-"):-len(".json")])
            for n in os.listdir(d)
            if n.startswith("manifest-") and n.endswith(".json")
        )

    def _write_manifest(self, m: dict[str, Any]) -> None:
        """Commit point: temp file + atomic LINK to the versioned name.
        os.link fails with EEXIST when another writer already claimed
        this version — the optimistic-concurrency CAS real Iceberg gets
        from its catalog swap. A plain rename would silently OVERWRITE
        the concurrent winner's manifest, losing its commit."""
        final = self._manifest_path(m["version"])
        tmp = final + f".tmp-{_uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        try:
            os.link(tmp, final)
        except FileExistsError as e:
            raise ConcurrentCommitError(
                f"snapshot {m['version']} was committed by another writer; "
                "re-read the table and retry the merge"
            ) from e
        finally:
            os.unlink(tmp)

    # -- read path -------------------------------------------------------------

    @staticmethod
    def _state_schema(
        columns: list[str],
        with_changed: bool = False,
        with_col_seqs: bool = False,
    ) -> T.StructType:
        fields = [T.StructField(c, T.StringType(), True) for c in columns]
        fields += [
            T.StructField("_ingest_seq", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
            T.StructField("_log_file", T.StringType(), True),
            T.StructField("_log_pos", T.LongType(), True),
            T.StructField("bucket", T.IntegerType(), True),
        ]
        if with_changed:
            # MOR deltas from MINIMAL batches carry presence metadata;
            # files without the column (bases, full-image deltas)
            # NULL-fill = full image
            fields.append(
                T.StructField("_changed_cols", T.ArrayType(T.StringType()), True)
            )
        if with_col_seqs:
            # per-column seq attribution (see _per_key_winners): files
            # written before the table went partial NULL-fill = every
            # column attributed to the row seq
            fields.append(
                T.StructField(
                    "_col_seqs", T.MapType(T.StringType(), T.LongType()), True
                )
            )
        return T.StructType(fields)

    def _empty_state(self, spark: SparkSession, columns: list[str]) -> DataFrame:
        return spark.createDataFrame([], self._state_schema(columns))

    def _read_raw(
        self,
        spark: SparkSession,
        buckets: list[int] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Stored rows incl. internal cols; `buckets` prunes the scan at
        the manifest level; `version` time-travels to that snapshot's
        manifest (data files are immutable, so any retained manifest is
        readable — the Iceberg snapshot-isolation property).

        MERGE-ON-READ reconciliation: when the manifest carries delta
        files (write_mode='mor' commits), the base ∪ delta scan is
        resolved to per-key LWW winners HERE, so every consumer —
        read(), changelog, compact, state checksum — sees register
        semantics regardless of write mode."""
        m = self.manifest_at(version) if version is not None else self.latest_manifest()
        if version is not None and m is None:
            raise ValueError(f"snapshot {version} does not exist (see versions())")
        cols = (m or {}).get("columns", S.payload_columns())
        base = (m or {}).get("buckets", {})
        deltas = (m or {}).get("deltas", {})
        if not m or not (base or deltas):
            return self._empty_state(spark, cols)
        all_bk = sorted(set(base) | set(deltas), key=int)
        if buckets is not None:
            want = {str(b) for b in buckets}
            all_bk = [b for b in all_bk if b in want]
        # snapshot data dirs are per-writer-ATTEMPT unique (uuid suffix)
        # so a CAS loser's files can never mix with the winner's; the
        # manifest maps version -> dir (legacy name when absent)
        snap_dirs = m.get("snap_dirs", {})

        def _p(v: int, b: str) -> str:
            name = snap_dirs.get(str(v), f"snap-{v:012d}")
            return os.path.join(self.path, DATA_DIR, name, f"pbucket={b}")

        paths, has_deltas = [], False
        for b in all_bk:
            if b in base:
                paths.append(_p(base[b], b))
            for v in deltas.get(b, []):
                paths.append(_p(v, b))
                has_deltas = True
        if version is not None:
            missing = [p for p in paths if not os.path.isdir(p)]
            if missing:
                raise ValueError(
                    f"snapshot {version} data expired (expire_snapshots removed "
                    f"{len(missing)} bucket dirs) — time-travel unavailable"
                )
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return self._empty_state(spark, cols)
        # EXPLICIT union schema from the manifest: snapshots written before
        # a schema evolution lack the new columns, and an unconstrained
        # parquet read adopts one random file's footer — silently DROPPING
        # the new column's values from every file that has them. With the
        # declared schema the reader NULL-fills missing columns per file
        # (no mergeSchema footer sweep needed — the manifest already knows
        # the union).
        partial_deltas = has_deltas and bool(m.get("partial_deltas"))
        partial_state = bool(m.get("partial_state"))
        partial_any = partial_deltas or partial_state
        # column-rename support (Iceberg name-mapping analog, no field
        # IDs needed because old and new names never coexist live): the
        # manifest's `aliases` maps each current column to the names it
        # had in data files written BEFORE its rename(s). Those files
        # are scanned WITH the old names in the declared schema (each
        # file NULL-fills whichever spelling it lacks), then per row the
        # single non-NULL spelling coalesces into the current name — a
        # pure projection, so a 100 TB table renames a column without
        # rewriting a byte.
        aliases = {
            c: [o for o in olds]
            for c, olds in (m.get("aliases") or {}).items()
            if c in cols
        }
        alias_olds = [o for olds in aliases.values() for o in olds]
        df = spark.read.schema(
            self._state_schema(
                cols + alias_olds,
                with_changed=has_deltas and partial_any,
                with_col_seqs=partial_any,
            )
        ).parquet(*paths)
        if alias_olds:
            for c, olds in aliases.items():
                df = df.withColumn(c, F.coalesce(F.col(c), *[F.col(o) for o in olds]))
            df = df.drop(*alias_olds)
            df = _translate_partial_meta(
                df, {o: c for c, olds in aliases.items() for o in olds}
            )
        if has_deltas and partial_any:
            # MINIMAL-image path: per-COLUMN read-time merge — delta
            # rows carry only their changed columns (`_changed_cols`)
            # and/or per-column seq attributions (`_col_seqs`); rows
            # from files lacking either NULL-fill = full image at the
            # row seq
            df = df.select(*cols, *INTERNAL_COLS, "_changed_cols", "_col_seqs")
            df = _per_key_winners(df, cols, partial=True)
        elif has_deltas:
            df = df.select(*cols, *INTERNAL_COLS)
            df = _per_key_winners(df, cols, partial=False)
        elif partial_state:
            # COW partial base: per-key resolved already; keep the
            # attribution map so the next merge sees true column seqs
            df = df.select(*cols, *INTERNAL_COLS, "_col_seqs")
        else:
            df = df.select(*cols, *INTERNAL_COLS)
        return df

    def read(
        self,
        spark: SparkSession,
        buckets: list[int] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Live table state (tombstones filtered, internal columns
        hidden except bucket); `version` time-travels to a snapshot."""
        df = self._read_raw(spark, buckets, version=version)
        hidden = {"_ingest_seq", "_deleted", "_log_file", "_log_pos", "_col_seqs"}
        return df.filter(~F.col("_deleted")).select(
            *[c for c in df.columns if c not in hidden]
        )

    def read_keys(
        self,
        spark: SparkSession,
        keys: list[tuple],
        version: int | None = None,
    ) -> DataFrame:
        """Point lookups: live rows for exactly `keys` (merge-key
        tuples), reading ONLY the buckets that own them — at 64 buckets
        a one-key lookup scans 1/64th of the table, and k keys scan at
        most min(k, n_buckets) buckets, independent of table size (the
        Iceberg bucket-transform point-read story).

        The owning bucket is hash(composite key) — computed with the
        same JVM xxhash64 expression the writer used (bucket_col), via a
        metadata-scale job over the key literals, so driver and executor
        hashing can never diverge. The exact-key filter is a broadcast
        LEFT SEMI join (no shuffle of the table side)."""
        if not keys:
            return self.read(spark, buckets=[])
        # cast probe columns to the stored merge-key type (string) before
        # hashing (ADVICE r4): createDataFrame infers types from the
        # tuples, and xxhash64 over e.g. a long differs from the hash of
        # its string form — the bucket computation and the semi-join
        # would silently return no rows instead of erroring.
        kdf = spark.createDataFrame(keys, list(S.MERGE_KEYS)).select(
            *[F.col(k).cast("string").alias(k) for k in S.MERGE_KEYS]
        )
        bks = sorted(
            r["b"]
            for r in kdf.select(bucket_col(self.n_buckets).alias("b")).distinct().collect()
        )
        df = self.read(spark, buckets=bks, version=version)
        return df.join(F.broadcast(kdf), on=list(S.MERGE_KEYS), how="left_semi")

    def changes_between(
        self, spark: SparkSession, from_version: int, to_version: int
    ) -> DataFrame:
        """Changelog feed between two snapshots (Iceberg
        `create_changelog_view` analog): one row per key whose LIVE
        state differs, with op in {insert, update, delete} and both
        images. Implemented as a full-outer key join of the two
        time-travel reads — correct for any version gap because the
        table is an LWW register per key (intermediate churn inside the
        gap is intentionally collapsed, exactly like Iceberg's net
        changes mode).

        Scale: the scan is pruned at the MANIFEST level to buckets whose
        bucket->snapshot entry differs between the two versions — data
        files are immutable, so an unchanged entry means byte-identical
        bucket contents (an incremental v->v+1 diff reads only the
        buckets that commit touched, not two full table scans). Both
        sides then share the (repo,path) bucket layout, so the join
        shuffles once each side and AQE coalesces.

        The diff compares PAYLOAD columns only: a key re-upserted with a
        byte-identical row between the snapshots is NOT an update, and
        the internal `_ingest_seq` lineage column never leaks into the
        changelog output (ADVICE r2)."""
        mf, mt = self.manifest_at(from_version), self.manifest_at(to_version)
        if mf is None or mt is None:
            missing = from_version if mf is None else to_version
            raise ValueError(f"snapshot {missing} does not exist (see versions())")
        def _sig(doc: dict[str, Any], b: str):
            # a bucket's contents are pinned by (base snapshot, delta list)
            return (doc.get("buckets", {}).get(b), tuple(doc.get("deltas", {}).get(b, [])))

        bks = set(mf.get("buckets", {})) | set(mt.get("buckets", {}))
        bks |= set(mf.get("deltas", {})) | set(mt.get("deltas", {}))
        changed = sorted(int(b) for b in bks if _sig(mf, b) != _sig(mt, b))
        old = self._read_raw(spark, buckets=changed, version=from_version).filter(
            ~F.col("_deleted")
        )
        new = self._read_raw(spark, buckets=changed, version=to_version).filter(
            ~F.col("_deleted")
        )
        payload = [c for c in new.columns if not c.startswith("_") and c != "bucket"]
        # schema drift across the gap (ADVICE r7): the old side was read
        # under ITS OWN manifest, so a column renamed inside the gap
        # still carries its old spelling there — translate it through the
        # to-version's alias map (the newest spelling the old read knows
        # wins; older ones were already coalesced by old's own read), and
        # NULL-fill columns ADDED inside the gap. Columns dropped inside
        # the gap simply leave the comparison (current-schema changelog,
        # Iceberg semantics). Without this, old.select(struct(*data))
        # raises AnalysisException on any rename-spanning diff.
        to_aliases = mt.get("aliases") or {}
        for c in payload:
            if c in old.columns:
                continue
            carried = next(
                (o for o in to_aliases.get(c, []) if o in old.columns), None
            )
            if carried is not None:
                old = old.withColumnRenamed(carried, c)
            else:
                old = old.withColumn(c, F.lit(None).cast("string"))
        keys = list(S.MERGE_KEYS)
        data = [c for c in payload if c not in keys]
        o = old.select(*keys, F.struct(*data).alias("_old"))
        n = new.select(*keys, F.struct(*data).alias("_new"))
        j = o.join(n, keys, "full_outer")
        op = (
            F.when(F.col("_old").isNull(), F.lit("insert"))
            .when(F.col("_new").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
        )
        return (
            j.select(*keys, op.alias("op"), "_old", "_new")
            .filter(
                F.col("_old").isNull()
                | F.col("_new").isNull()
                | (F.col("_old") != F.col("_new"))
            )
            .withColumnRenamed("_old", "before")
            .withColumnRenamed("_new", "after")
        )

    def head_seq(self) -> int:
        """Highest source log seq the table has absorbed (from lineage);
        0 for an empty table. Used to rebase flashback batches."""
        m = self.latest_manifest()
        if not m or not m.get("lineage"):
            return 0
        seqs = [int(v["max_seq"]) for v in m["lineage"].values() if v.get("max_seq") is not None]
        return max(seqs) if seqs else 0

    # -- write path --------------------------------------------------------------

    def commit(
        self,
        batch: DataFrame,
        batch_id: str,
        rebase_past_head: bool = False,
        drop_columns: list[str] | None = None,
        rename_columns: dict[str, str] | None = None,
    ) -> dict[str, Any]:
        """Idempotent, convergent MERGE of one micro-batch.

        `batch` is upsert rows (resolve.to_upsert_rows): payload columns,
        `_deleted` tombstones, `_seq`/`_log_file`/`_log_pos`. Keys may
        repeat (many events per key in the batch) — the merge groupBy IS
        the LWW resolution, so no separate pre-resolve pass or shuffle
        is needed. Returns per-batch metrics (the reference's websocket
        progress push analog, core/socket.go:34-76).

        Plan shape — ONE merge job with ONE full-data exchange, plus
        (only when the table is non-empty, where bucket pruning pays) a
        narrow pre-pass:
          pre-pass (pruning, table non-empty): batch projection (bucket,
                 seq, deleted) -> groupBy bucket (map-side combined) ->
                 collect -> affected buckets + exact batch counts.
          merge job: (stored-rows-of-affected-buckets ∪ batch)
                 -> repartition(bucket)              [the ONLY exchange]
                 -> groupBy(bucket, key).max_by      [the MERGE — no
                    second shuffle: bucket is a function of the key, so
                    hash(bucket) partitioning already satisfies the
                    aggregate's clustered distribution]
                 -> parquet (rows arrive clustered by bucket, so the
                    dynamic-partition write gets one contiguous writer
                    per bucket for free); metrics via Observation.
        (Before r3 this was groupBy(key) THEN repartition(pbucket) — two
        full-data exchanges; collapsing them cuts shuffle bytes ~45% on
        an initial load and removes a stage barrier.)
        Per-bucket lineage (max absorbed seq / log position -> snapshot)
        is read from the written files' parquet column statistics —
        sound because binlog order is monotone in (log_file, log_pos) —
        so the initial-load path never scans the batch twice.
        """
        t0 = time.time()
        spark = batch.sparkSession
        m = self.latest_manifest() or {
            "version": 0,
            "buckets": {},
            "committed_batches": [],
            "batch_watermarks": {},
            "columns": [],
            "lineage": {},
        }
        if self._already_committed(m, batch_id):
            return {"batch_id": batch_id, "skipped": True, "reason": "already committed"}
        # bucket count is part of the table's physical identity: batch rows
        # bucketed with a DIFFERENT n_buckets than the stored rows would
        # land the same key in two (bucket, key) merge groups — silent
        # per-key duplicates. Stored in the manifest; mismatches are loud.
        stored_n = m.get("n_buckets")
        if stored_n is not None and stored_n != self.n_buckets:
            raise ValueError(
                f"table at {self.path} was created with n_buckets={stored_n}, "
                f"opened with n_buckets={self.n_buckets}; rebucketing requires a "
                "full rewrite (read -> new table), not a commit"
            )

        payload_cols = [c for c in batch.columns if not c.startswith("_")]
        stored_cols = list(m["columns"])
        aliases = {c: list(v) for c, v in (m.get("aliases") or {}).items()}
        # DROPs apply BEFORE renames (ADVICE r7): MySQL permits
        # `ALTER TABLE t DROP x, CHANGE y x ...` in one statement — the
        # drop must vacate the name before the rename claims it, or the
        # collision check below rejects a legal DDL sequence.
        dropped_stored: set[str] = set()
        if drop_columns:
            # DDL-driven DROP COLUMN (VERDICT r5 #4): the column leaves
            # the CURRENT schema — rewritten buckets omit it physically,
            # untouched buckets keep old files but every read projects
            # the manifest's column list, so it disappears everywhere at
            # this snapshot while time travel to older versions still
            # shows it (Iceberg drop-column semantics). Merge keys are
            # the table's identity and cannot be dropped.
            doomed = {c.lower() for c in drop_columns}
            if any(k.lower() in doomed for k in S.MERGE_KEYS):
                raise ValueError(f"cannot drop merge key column(s): {sorted(doomed)}")
            dropped_stored = {c for c in stored_cols if c.lower() in doomed}
            stored_cols = [c for c in stored_cols if c.lower() not in doomed]
        rewrite_all = False
        if rename_columns:
            # DDL-driven CHANGE COLUMN (VERDICT r6 #2): stored values
            # carry to the new name WITHOUT rewriting untouched buckets —
            # the manifest records the old spelling(s) per current column
            # and _read_raw coalesces them at scan time (time travel to
            # older snapshots keeps the old name via that snapshot's own
            # manifest). Merge keys are the table's identity: renaming
            # one would silently re-key every stored row, so it's loud.
            for old, new in rename_columns.items():
                if old.lower() in {k.lower() for k in S.MERGE_KEYS}:
                    raise ValueError(f"cannot rename merge key column {old!r}")
                if old not in stored_cols:
                    # the renamed column exists in the BATCH's starting
                    # schema (table_meta) but was never stored — fresh
                    # table, or no prior batch carried it. Nothing to
                    # carry, so no alias; the batch's own projection
                    # already writes the new name.
                    continue
                if any(new.lower() == d.lower() for d in dropped_stored):
                    # the rename TARGET was dropped in this same batch
                    # (DROP x, CHANGE y x): pre-drop data files still
                    # hold the name physically, so the NULL-coalescing
                    # alias would resurrect dropped values wherever the
                    # carried column is NULL. No alias; the reuse block
                    # below forces a full rewrite instead.
                    pass
                else:
                    aliases[new] = [old] + aliases.pop(old, [])
            stored_cols = [rename_columns.get(c, c) for c in stored_cols]
            if len(set(stored_cols)) != len(stored_cols):
                raise ValueError(
                    f"rename collision: {rename_columns} maps two stored "
                    "columns to one name"
                )
        all_cols = list(dict.fromkeys(stored_cols + payload_cols))  # schema evolution: union
        alias_names = {o for olds in aliases.values() for o in olds}
        resurrected = sorted(set(all_cols) & alias_names)
        if resurrected:
            # a renamed-away spelling still lives in pre-rename data
            # files; re-adding it as a NEW column would resurrect those
            # values through the alias coalesce. compact() rewrites every
            # bucket under current names and clears the aliases.
            raise ValueError(
                f"column name(s) {resurrected} were renamed away and still "
                "exist in pre-rename data files — compact() the table first, "
                "then re-add"
            )
        if drop_columns:
            doomed = {c.lower() for c in drop_columns}
            # a dropped name RE-INTRODUCED by this same batch (re-ADD,
            # or CHANGE y x onto the dropped x) is legal MySQL DDL
            # (ADVICE r7) but poisonous to lazy column pruning: old data
            # files still hold the name physically, and any read that
            # admits it would serve the dropped values for rows the
            # batch didn't touch. MySQL's ALTER rewrites the table here;
            # so do we — every live bucket lands in this snapshot under
            # current names (copy-on-write only; MOR bases are immutable
            # within a commit, so it must compact first). Names NOT
            # re-introduced simply stay out of the schema (stored_cols
            # already lost them — lazy drop, no rewrite).
            reused = sorted({c for c in all_cols if c.lower() in doomed})
            if reused and (m["buckets"] or m.get("deltas")):
                if self.write_mode == "mor":
                    raise ValueError(
                        f"column name(s) {reused} are dropped and re-introduced "
                        "in the same batch; a merge-on-read table cannot rewrite "
                        "its bases in one commit — compact() first, then replay "
                        "the DDL batch"
                    )
                rewrite_all = True

        b = batch.withColumn("bucket", bucket_col(self.n_buckets)).withColumnRenamed(
            "_seq", "_ingest_seq"
        )
        # the merge runs per-column whenever ANY side carries partial
        # metadata: a MINIMAL batch (_changed_cols), a re-committed
        # resolved state (rebucket: _col_seqs), or a table whose stored
        # state already holds per-column attributions (partial_state) —
        # a FULL-image batch onto such a table is representable in the
        # per-column merge (all columns present at the event seq), and
        # collapsing row-level there would discard the attributions.
        partial = (
            "_changed_cols" in batch.columns
            or "_col_seqs" in batch.columns
            or bool(m.get("partial_state"))
        )
        mor = self.write_mode == "mor"
        # mor+partial is supported: the delta stores per-key winners WITH
        # their merged `_changed_cols` presence metadata, and _read_raw
        # switches to the per-column read-time merge for every consumer
        # (the manifest's partial_deltas flag gates it).
        # MOR never reads the table on commit, so the pruning pre-pass
        # (whose only job is picking which stored buckets to read) would
        # be a pure extra pass over the batch — Observation counts ride
        # the single delta-write job instead.
        do_prune = bool(m["buckets"]) and not mor
        batch_counts: dict[str, int] | None = None
        observation = None
        min_seq: int | None = None
        if do_prune:
            # narrow pre-pass (no payload columns; from_json sources prune
            # to just the key fields): affected buckets + exact counts
            # (+ the batch's min seq, which the flashback rebase needs —
            # riding this job instead of a separate scan, VERDICT r3 #4)
            stats = (
                b.select("bucket", "_ingest_seq", "_deleted")
                .groupBy("bucket")
                .agg(
                    F.sum(F.col("_deleted").cast("int")).alias("deletes"),
                    F.count("*").alias("rows"),
                    F.min("_ingest_seq").alias("min_seq"),
                )
                .collect()
            )
            affected = sorted(int(r["bucket"]) for r in stats)
            batch_counts = {
                "rows": int(sum(r["rows"] for r in stats)),
                "deletes": int(sum(r["deletes"] for r in stats)),
            }
            if stats:
                min_seq = min(int(r["min_seq"]) for r in stats)
            if rewrite_all:
                # rename-onto-dropped-name (see above): every live
                # bucket must land in this snapshot, not just the
                # batch's — the pre-pass still supplied the counts
                affected = sorted(
                    set(affected) | {int(bk) for bk in m["buckets"]}
                )
        else:
            affected = list(range(self.n_buckets))  # empty table: nothing to prune
            from pyspark.sql import Observation

            observation = Observation(f"commit-{batch_id}")
            b = b.observe(
                observation,
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.col("_deleted").cast("int")).alias("deletes"),
            )
            if rebase_past_head:
                # no pre-pass to ride (empty table / MOR delta append):
                # one narrow single-column aggregate — same cost as the
                # old pipeline-level pre-pass, only on these paths
                row = b.agg(F.min("_ingest_seq")).collect()[0]
                min_seq = None if row[0] is None else int(row[0])
        if rebase_past_head and min_seq is not None:
            # flashback batches arrive order-inverted (seq' = -seq); the
            # rollback becomes NEW log traffic past the head: shift by
            # head - min(seq') + 1 == head + max(orig seq) + 1, so the
            # inverted events stay reverse-ordered among themselves and
            # supersede everything already absorbed under LWW-by-seq.
            offset = self.head_seq() - min_seq + 1
            b = b.withColumn("_ingest_seq", F.col("_ingest_seq") + F.lit(offset))
        new_version = m["version"] + 1

        elect = False
        elect_by = None
        if affected:
            if mor:
                # delta append: the batch self-merges (per-key winners
                # WITHIN the batch — required so a delta holds one row
                # per key) against an empty current; stored data is
                # neither read nor rewritten.
                current = self._empty_state(spark, all_cols)
            else:
                current = self._read_raw(spark, buckets=affected)
                if dropped_stored:
                    # vacate dropped names BEFORE renames claim them —
                    # the old manifest's read still carries them, and a
                    # rename onto one would otherwise duplicate the name
                    current = current.drop(
                        *[c for c in dropped_stored if c in current.columns]
                    )
                if rename_columns:
                    # stored rows read under the pre-rename manifest:
                    # carry values (and per-column attributions) to the
                    # new names before the merge union
                    for old, new in rename_columns.items():
                        if old in current.columns:
                            current = current.withColumnRenamed(old, new)
                    current = _translate_partial_meta(current, rename_columns)
            for c in all_cols:
                if c not in current.columns:
                    current = current.withColumn(c, F.lit(None).cast("string"))
            current = current.select(
                *all_cols,
                *INTERNAL_COLS,
                # keep the per-column attribution of a partial_state read
                # (the partial block below re-selects with both extras)
                *(["_col_seqs"] if "_col_seqs" in current.columns else []),
            )
            batch_rows = b.select(
                *[
                    F.col(c) if c in b.columns else F.lit(None).cast("string").alias(c)
                    for c in all_cols
                ],
                *INTERNAL_COLS,
            )
            if partial:
                null_changed = F.lit(None).cast("array<string>").alias("_changed_cols")
                null_map = F.lit(None).cast("map<string,bigint>").alias("_col_seqs")
                batch_rows = b.select(
                    *[
                        F.col(c) if c in b.columns else F.lit(None).cast("string").alias(c)
                        for c in all_cols
                    ],
                    *INTERNAL_COLS,
                    # NULL _changed_cols = full image; NULL _col_seqs =
                    # every column attributed to the row seq
                    F.col("_changed_cols") if "_changed_cols" in b.columns else null_changed,
                    F.col("_col_seqs") if "_col_seqs" in b.columns else null_map,
                )
                if "_changed_cols" not in current.columns:
                    current = current.withColumn(
                        "_changed_cols", F.lit(None).cast("array<string>")
                    )
                if "_col_seqs" not in current.columns:
                    current = current.withColumn(
                        "_col_seqs", F.lit(None).cast("map<string,bigint>")
                    )
                current = current.select(
                    *all_cols, *INTERNAL_COLS, "_changed_cols", "_col_seqs"
                )
            # bucket-pure partitions (n_out <= #affected keeps exactly one
            # file per bucket), but 4x the core count of them: with only
            # #cores partitions the per-partition bucket-count variance
            # (~±sqrt(buckets/partition)) makes the slowest task the stage
            # time; smaller tasks let dynamic scheduling balance it.
            par = batch.sparkSession.sparkContext.defaultParallelism
            n_out = max(1, min(len(affected), self.merge_tasks_per_core * par))
            if self.merge_rows_per_task:
                # cache-resident merge tasks (VERDICT r7 #1): size the
                # bucket exchange so each task's candidate set stays
                # ~merge_rows_per_task rows — free from manifest counts
                # + the pre-pass, never a data job. Still bucket-pure
                # (cap = #affected): finer than one-bucket tasks would
                # break the one-writer-per-bucket file layout, so VERY
                # large tables want more n_buckets, not more splits.
                est = self._stored_rows_estimate(m, affected) + (
                    batch_counts["rows"] if batch_counts else 0
                )
                if est > 0:
                    want = -(-est // self.merge_rows_per_task)  # ceil
                    n_out = max(1, min(len(affected), max(4 * par, want)))
            # key-only election decision (see merge_strategy docstring):
            # "auto" elects when the candidate-key count fits the
            # winning-seq broadcast bound. When manifest metadata + the
            # pruning pre-pass give a KNOWN upper bound under the cap,
            # that decides for free (distinct keys <= rows, so the
            # static bound is sufficient). Otherwise — empty table, MOR
            # delta append, or an over-the-cap estimate whose true key
            # count may still be small — the RUNTIME FALLBACK
            # (VERDICT r5 #3) materializes the narrow election
            # aggregate, counts it (the aggregate is the cheap part of
            # the election either way), and abandons the broadcast past
            # the bound instead of guessing. "auto" is thereby safe as
            # the default on every path.
            win_df = None
            if not partial and self.merge_strategy != "full":
                if self.merge_strategy == "election":
                    elect = True
                    elect_by = "forced"
                else:
                    total_est = None
                    stored_est = self._stored_rows_estimate(m, affected)
                    if batch_counts is not None:
                        total_est = stored_est + batch_counts["rows"]
                    elif (
                        self.election_min_rows > 0
                        and stored_est < self.election_min_rows
                    ):
                        # floor configured but no free batch count (empty
                        # table / MOR delta append): one narrow
                        # column-pruned count decides the floor BEFORE
                        # any election work — cheaper than electing a
                        # below-crossover batch by mistake. Skipped when
                        # stored_est alone already meets the floor (the
                        # floor can't fire — total_est only grows), so
                        # the runtime fallback below is the single extra
                        # job on that path instead of two.
                        total_est = stored_est + batch.count()
                    if (
                        total_est is not None
                        and total_est < self.election_min_rows
                    ):
                        # below the measured single-host crossover: the
                        # election's narrow pass + broadcast cost more
                        # than the bytes they save (see constructor)
                        elect_by = "below_min_rows"
                    elif (
                        total_est is not None
                        and total_est <= self.election_max_rows
                    ):
                        elect = True
                        elect_by = "static"
                    else:
                        from pyspark import StorageLevel

                        win_df = _election_winners(
                            current.unionByName(batch_rows)
                        ).persist(StorageLevel.MEMORY_AND_DISK)
                        n_winners = win_df.count()
                        if n_winners <= self.election_max_rows:
                            elect = True
                            elect_by = "runtime"
                        else:
                            win_df.unpersist()
                            win_df = None
                            elect_by = "runtime_abandoned"
            merged = _merge_batch(
                current, batch_rows, all_cols, partial, n_out,
                emit_changed=mor and partial, elect=elect, win=win_df,
                impl=self.merge_impl,
            )
            merged = merged.withColumn("pbucket", F.col("bucket"))
            # per-ATTEMPT unique data dir (VERDICT r5 #6): two writers
            # racing the same version must never share a directory — a
            # CAS loser's overwrite would otherwise clobber (static
            # mode) or interleave with (dynamic mode) the winner's
            # files before the manifest race is even decided. The
            # winning manifest records its dir; a loser's dir is an
            # orphan expire_snapshots reclaims.
            snap_name = f"snap-{new_version:012d}-{_uuid.uuid4().hex[:8]}"
            snap_dir = os.path.join(self.path, DATA_DIR, snap_name)
            merged.write.mode("overwrite").partitionBy("pbucket").parquet(snap_dir)
            written = self._bucket_footer_stats(snap_dir)
            if win_df is not None:
                win_df.unpersist()  # broadcast consumed during the write
        else:
            written = {}

        if observation is not None:
            got = observation.get if written else {"rows": 0, "deletes": 0}
            batch_counts = {"rows": int(got["rows"] or 0), "deletes": int(got["deletes"] or 0)}

        buckets_map = dict(m["buckets"])
        deltas = {bk: list(v) for bk, v in m.get("deltas", {}).items()}
        lineage = dict(m.get("lineage", {}))
        # per-bucket base/delta row counts (from footer stats — no data
        # read): the measured read-amplification signal the inline
        # compaction policy keys on
        bucket_rows = {bk: dict(v) for bk, v in m.get("bucket_rows", {}).items()}
        for bk, st in written.items():
            if mor:
                had_prior_deltas = bool(m.get("deltas", {}).get(bk))
                deltas.setdefault(bk, []).append(new_version)
                br = bucket_rows.get(bk)
                if br is None and not had_prior_deltas:
                    # pure-MOR tables never write a base until compaction:
                    # the bucket's FIRST delta plays the base's role in
                    # the amplification ratio (reading one file is the
                    # ideal; every further delta is the overhead)
                    bucket_rows[bk] = {"base": st["rows"], "delta": 0}
                elif br is None:
                    # manifest predates bucket_rows (upgraded table):
                    # prior delta volume is unknown, so seeding this
                    # delta as the "base" would hide real amplification
                    # from the policy forever. base=0 makes the ratio
                    # read as over-threshold instead — one compaction
                    # then establishes truthful bookkeeping.
                    bucket_rows[bk] = {"base": 0, "delta": st["rows"]}
                else:
                    br["delta"] += st["rows"]
            else:
                buckets_map[bk] = new_version
                bucket_rows[bk] = {"base": st["rows"], "delta": 0}
            lineage[bk] = {"snapshot": new_version, **st}
        if (
            aliases
            and not mor
            and buckets_map
            and all(v == new_version for v in buckets_map.values())
            and not any(deltas.values())
        ):
            # alias folding (VERDICT r7 #5): this commit happened to
            # rewrite EVERY live bucket (e.g. rewrite_all, or a batch
            # touching all keys), so every data file the new snapshot
            # references is already written under current names — the
            # coalesce chains the aliases would add are dead weight.
            # Folding here bounds the per-rename growth of the read
            # projection without waiting for a full compact(); time
            # travel still serves old names from old snapshots' own
            # manifests.
            aliases = {}
        read_amp = max(
            (
                br["delta"] / max(br["base"], 1)
                for br in bucket_rows.values()
                if br["delta"]
            ),
            default=0.0,
        )
        metrics = {
            "batch_id": batch_id,
            "skipped": False,
            "snapshot": new_version,
            "mode": self.write_mode,
            "buckets_rewritten": len(written),
            "buckets_total": self.n_buckets,
            "rows_in_batch": batch_counts["rows"],
            "deletes": batch_counts["deletes"],
            "merge_plan": "election" if elect else "full",
            "commit_secs": round(time.time() - t0, 3),
        }
        if elect_by is not None:
            # how the election decision was reached: forced (strategy),
            # static (metadata bound under cap), runtime (counted the
            # narrow aggregate), runtime_abandoned (count over cap ->
            # fell back to the full shuffle)
            metrics["election_decided_by"] = elect_by
        if mor:
            metrics["delta_depth"] = max((len(v) for v in deltas.values()), default=0)
            metrics["read_amplification"] = round(read_amp, 4)
        batches, watermarks = self._record_batch(m, batch_id)
        self._write_manifest(
            {
                "version": new_version,
                "n_buckets": self.n_buckets,
                "buckets": buckets_map,
                "deltas": deltas,
                "committed_batches": batches,
                "batch_watermarks": watermarks,
                "columns": all_cols,
                "aliases": aliases,
                "lineage": lineage,
                "bucket_rows": bucket_rows,
                # version -> unique data dir (see the write above); the
                # map carries every still-referenced snapshot's dir
                "snap_dirs": {
                    **m.get("snap_dirs", {}),
                    **({str(new_version): snap_name} if written else {}),
                },
                "metrics": metrics,
                # sticky until a compaction folds the partial deltas:
                # gates the per-column read-time merge in _read_raw
                "partial_deltas": bool(m.get("partial_deltas"))
                or (mor and partial),
                # sticky for the table's life: COW partial bases carry
                # the `_col_seqs` attribution map, and every later merge
                # must run per-column to honor it
                "partial_state": bool(m.get("partial_state"))
                or (not mor and partial),
            }
        )
        depth_hit = (
            self.max_delta_depth is not None
            and metrics.get("delta_depth", 0) > self.max_delta_depth
        )
        amp_hit = (
            self.max_read_amplification is not None
            and read_amp > self.max_read_amplification
        )
        if mor and (depth_hit or amp_hit):
            # inline compaction (after the commit point, so the batch is
            # durable either way; a crash here just leaves deltas for the
            # next compaction to fold). Tombstones MUST survive here:
            # compact()'s drop is only safe once no replay older than the
            # current head can still arrive, and the automatic path cannot
            # know that — an out-of-order ad-hoc replay carrying an older
            # upsert for a deleted key would otherwise resurrect it
            # (ADVICE r3). Tombstone GC stays an explicit user call.
            try:
                c = self.compact(spark, drop_tombstones=False)
            except ConcurrentCommitError:
                # a RIVAL writer landed a commit between this commit's
                # manifest and the compaction's (VERDICT r5 #6): the
                # compaction manifest lost the CAS. The batch commit
                # above is already durable and the rival's delta is
                # intact in the winning manifest — folding it here
                # would race; skip, the deltas (this table's AND the
                # rival's) stay readable and the next commit's trigger
                # re-fires on the still-elevated depth/amplification.
                metrics["compaction_skipped"] = "concurrent_writer"
            else:
                metrics["compacted_to"] = c.get("snapshot")
                metrics["compaction_trigger"] = (
                    "read_amplification" if amp_hit and not depth_hit else "delta_depth"
                )
                metrics["delta_depth"] = 0
                metrics["read_amplification"] = 0.0
        return metrics

    def rebucket(
        self, spark: SparkSession, new_path: str, n_buckets: int
    ) -> "IcebergLiteTable":
        """The full rewrite the n_buckets guard points at: copy the
        table's raw state — tombstones, per-row lineage (_ingest_seq /
        log positions) and all — into a NEW table with a different
        bucket count. One read + one commit job (the merge re-buckets
        and re-clusters); LWW seqs carry over, so replays that predate
        the old head still resolve correctly against the new table.
        Batch-id bookkeeping intentionally does NOT carry over (ids
        were scoped to the old table's history); the new table starts
        a fresh exactly-once ledger."""
        raw = self._read_raw(spark)
        batch = raw.select(
            *[c for c in raw.columns if c not in ("bucket",)]
        ).withColumnRenamed("_ingest_seq", "_seq")
        dst = IcebergLiteTable(new_path, n_buckets=n_buckets, write_mode=self.write_mode)
        dst.commit(batch, batch_id="rebucket-from-source")
        return dst

    def commit_with_retry(
        self,
        batch: DataFrame,
        batch_id: str,
        max_retries: int = 5,
        **kwargs: Any,
    ) -> dict[str, Any]:
        """Optimistic-concurrency loop around commit(): on
        ConcurrentCommitError (another writer won the manifest CAS for
        this snapshot version), re-read the table and re-merge — commit
        re-reads the latest manifest on entry, so a plain re-invocation
        IS the retry (the loser's orphaned snapshot data dir is
        harmless, same as a crash between data and manifest). LWW
        convergence makes the outcome order-independent, and the
        batch-id bookkeeping still dedups a batch the winner already
        carried. Raises after max_retries consecutive losses."""
        last: ConcurrentCommitError | None = None
        for _ in range(max_retries + 1):
            try:
                return self.commit(batch, batch_id, **kwargs)
            except ConcurrentCommitError as e:
                last = e
        raise ConcurrentCommitError(
            f"lost the manifest CAS {max_retries + 1} times in a row for "
            f"batch {batch_id!r} — writer contention too high"
        ) from last

    @staticmethod
    def _stored_rows_estimate(m: dict[str, Any], affected: list[int]) -> int:
        """Upper-bound stored-row count over `affected` buckets, from
        manifest metadata only (bucket_rows footer stats; lineage rows
        for pre-bucket_rows manifests) — free, never a data job."""
        br_map = m.get("bucket_rows", {})
        lin = m.get("lineage", {})
        est = 0
        for bk in affected:
            bkey = str(bk)
            if bkey in br_map:
                est += int(br_map[bkey].get("base", 0)) + int(
                    br_map[bkey].get("delta", 0)
                )
            elif bkey in lin:
                est += int(lin[bkey].get("rows") or 0)
        return est

    # -- exactly-once batch-id bookkeeping ------------------------------------
    #
    # An unbounded committed-batch list would grow one entry per micro-
    # batch forever (10^7+ entries at 10^10 events). STREAMING batch ids
    # (`stream-<queryId>-<epoch>`, emitted by streaming.pipeline.
    # start_ingest) are monotone per checkpoint lineage: Structured
    # Streaming re-delivers an epoch only until it commits, and epochs
    # commit in order — so a high WATERMARK keyed by everything up to
    # the trailing epoch number is a complete dedup record for them
    # (Iceberg keys its epoch dedup by queryId the same way). The
    # queryId in the key is load-bearing (ADVICE r2): a stream restarted
    # with a FRESH checkpoint dir resets epochs to 0 and a second ingest
    # query feeding the same table starts at 0 — without the scoping,
    # every such micro-batch would be silently skipped as "already
    # committed". Ad-hoc batch ids carry NO ordering guarantee (a user
    # may commit "b3" before "b2") and stay in the explicit list.

    #: only ids emitted by streaming.pipeline.start_ingest carry the
    #: monotone-epoch guarantee: `stream-<12-hex queryId>-<epoch>`.
    #: The queryId segment shape is validated (ADVICE r3) so an ad-hoc
    #: id that happens to start with "stream-" (e.g. "stream-backfill-2",
    #: which has NO ordering guarantee) stays in the exact-set list
    #: instead of being watermark-skipped.
    _WATERMARK_ID = re.compile(r"(stream-[0-9a-f]{12}-)(\d+)$")

    @classmethod
    def _split_batch_id(cls, batch_id: str) -> tuple[str, int] | None:
        m = cls._WATERMARK_ID.fullmatch(batch_id)
        if m is None:
            return None
        return (m.group(1), int(m.group(2)))

    def _already_committed(self, m: dict[str, Any], batch_id: str) -> bool:
        if batch_id in m.get("committed_batches", []):
            return True
        parts = self._split_batch_id(batch_id)
        if parts is None:
            return False
        prefix, n = parts
        return n <= m.get("batch_watermarks", {}).get(prefix, -1)

    def _record_batch(self, m: dict[str, Any], batch_id: str) -> tuple[list, dict]:
        batches = list(m.get("committed_batches", []))
        watermarks = dict(m.get("batch_watermarks", {}))
        parts = self._split_batch_id(batch_id)
        if parts is None:
            batches.append(batch_id)
        else:
            prefix, n = parts
            watermarks[prefix] = max(n, watermarks.get(prefix, -1))
        return batches, watermarks

    def rollback_to(self, version: int) -> dict[str, Any]:
        """Iceberg `rollback_to_snapshot` analog: a NEW manifest whose
        bucket map is snapshot `version`'s — O(metadata), no data moves,
        and the rolled-back-over snapshots stay readable (time-travel
        forward again by rolling back to a newer version). Batch
        bookkeeping is also restored so replaying the undone batches is
        possible; the flashback operator remains the row-level
        alternative when no snapshot boundary matches."""
        target = self.manifest_at(version)
        if target is None:
            raise ValueError(f"snapshot {version} does not exist (see versions())")
        cur = self.latest_manifest()
        new_version = cur["version"] + 1
        self._write_manifest(
            {
                **target,
                "version": new_version,
                "rolled_back_from": cur["version"],
                "rolled_back_to": version,
            }
        )
        return {"snapshot": new_version, "restored": version}

    def compact(self, spark: SparkSession, drop_tombstones: bool = True) -> dict[str, Any]:
        """Rewrite every bucket into one fresh snapshot: merges the
        per-bucket file sets accumulated by incremental commits and
        (optionally) physically drops tombstone rows — safe once no
        replay older than the current head can still arrive (the Iceberg
        `expire_snapshots` + delete-file compaction analog)."""
        m = self.latest_manifest()
        if not m or not (m.get("buckets") or m.get("deltas")):
            return {"skipped": True, "reason": "empty table"}
        df = self._read_raw(spark)  # MOR deltas are LWW-resolved in here
        if drop_tombstones:
            df = df.filter(~F.col("_deleted"))
        new_version = m["version"] + 1
        # per-attempt unique dir, same rationale as commit's
        snap_name = f"snap-{new_version:012d}-{_uuid.uuid4().hex[:8]}"
        snap_dir = os.path.join(self.path, DATA_DIR, snap_name)
        n_out = max(1, min(self.n_buckets, 4 * df.sparkSession.sparkContext.defaultParallelism))
        df.withColumn("pbucket", F.col("bucket")).repartition(n_out, "pbucket").write.mode(
            "overwrite"
        ).partitionBy("pbucket").parquet(snap_dir)
        written = self._bucket_footer_stats(snap_dir)
        # deltas fold into the new base (the MOR compaction contract)
        buckets_map = {b: new_version for b in written}
        metrics = {
            "op": "compact",
            "snapshot": new_version,
            "buckets_rewritten": len(written),
            "dropped_tombstones": bool(drop_tombstones),
        }
        self._write_manifest(
            {
                **m,
                "version": new_version,
                "snap_dirs": {**m.get("snap_dirs", {}), str(new_version): snap_name},
                "buckets": buckets_map,
                "deltas": {},
                # every bucket was rewritten under the CURRENT column
                # names, so pre-rename spellings no longer exist in any
                # live data file — the alias map resets (and renamed-away
                # names become re-addable)
                "aliases": {},
                # folded deltas are base rows now: read amplification
                # resets to zero
                "bucket_rows": {
                    bk: {"base": st["rows"], "delta": 0} for bk, st in written.items()
                },
                "metrics": metrics,
                # folded rows are complete images again (presence-wise)
                "partial_deltas": False,
                # ...but their per-column seq ATTRIBUTION must survive
                # the fold: the compacted base carries `_col_seqs`
                # whenever the table ever went partial, and later
                # out-of-order replays still race the true writers
                "partial_state": bool(
                    m.get("partial_state") or m.get("partial_deltas")
                ),
            }
        )
        return {"skipped": False, "snapshot": new_version}

    def _bucket_footer_stats(self, snap_dir: str) -> dict[str, dict[str, Any]]:
        """Per-bucket lineage from parquet COLUMN STATISTICS (no data
        read): max absorbed `_ingest_seq` and its source log position.

        The (log_file, log_pos) pair is taken from the ROW GROUP that
        owns the max `_ingest_seq` — log_pos resets per binlog file, so
        independent per-column maxima could pair the latest file with a
        higher position from an earlier file (a position no real event
        has). Within one row group the pairing IS sound: binlog order is
        monotone in (log_file, log_pos) and seq is its flattening, so
        the group's max-seq event also holds the group's lexicographic
        max (log_file, log_pos)."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        def one_bucket(d: str):
            bk = d.split("=", 1)[1]
            best = None  # (max_seq, log_file, log_pos) of the owning row group
            rows = 0
            bdir = os.path.join(snap_dir, d)
            for fn in os.listdir(bdir):
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(bdir, fn)).metadata
                rows += md.num_rows
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)

                    def stat_max(col: str):
                        s = g.column(idx[col]).statistics
                        v = s.max if s is not None and s.has_min_max else None
                        return v.decode("utf-8", "replace") if isinstance(v, bytes) else v

                    seq = stat_max("_ingest_seq")
                    if seq is None:
                        continue
                    if best is None or seq > best[0]:
                        best = (seq, stat_max("_log_file"), stat_max("_log_pos"))
            return bk, rows, best

        dirs = sorted(d for d in os.listdir(snap_dir) if d.startswith("pbucket="))
        # footer reads are driver-serial commit cost: thread them (pyarrow
        # releases the GIL in the C++ reader; ~constant wall time per commit
        # regardless of bucket count)
        out: dict[str, dict[str, Any]] = {}
        with ThreadPoolExecutor(max_workers=min(16, max(1, len(dirs)))) as ex:
            results = list(ex.map(one_bucket, dirs))
        for bk, rows, best in results:
            if rows:
                seq, lf, lp = best if best else (None, None, None)
                out[bk] = {
                    "max_seq": int(seq) if seq is not None else None,
                    "log_file": lf,
                    "log_pos": int(lp) if lp is not None else None,
                    "rows": rows,
                }
        return out

    def expire_snapshots(self, keep_last: int = 2) -> dict[str, Any]:
        """Iceberg `expire_snapshots` analog: delete snapshot data dirs
        that no manifest in the retained window references. The current
        manifest's bucket->snapshot map pins live data; older manifests
        beyond `keep_last` lose time-travel but free space.

        Liveness is by DIRECTORY NAME, not just version: a concurrent
        writer that lost the manifest CAS leaves an orphan data dir
        carrying the WINNER's version number (dirs are per-attempt
        unique) — name-level tracking reclaims the orphan while the
        winner's same-version dir stays live."""
        import shutil

        m = self.latest_manifest()
        if not m:
            return {"removed": 0}

        def _live_of(doc: dict[str, Any]) -> tuple[set[int], set[str]]:
            vs = set(doc.get("buckets", {}).values())
            for lst in doc.get("deltas", {}).values():
                vs |= set(lst)
            sd = doc.get("snap_dirs", {})
            names = {sd.get(str(v), f"snap-{v:012d}") for v in vs}
            return vs, names

        live, live_names = _live_of(m)
        mdir = os.path.join(self.path, MANIFEST_DIR)
        names = sorted(n for n in os.listdir(mdir) if n.startswith("manifest-") and n.endswith(".json"))
        for n in names[-keep_last:]:
            with open(os.path.join(mdir, n)) as f:
                vs, nm = _live_of(json.load(f))
            live |= vs
            live_names |= nm
        ddir = os.path.join(self.path, DATA_DIR)
        removed = 0
        if os.path.isdir(ddir):
            for d in os.listdir(ddir):
                if d.startswith("snap-") and d not in live_names:
                    shutil.rmtree(os.path.join(ddir, d), ignore_errors=True)
                    removed += 1
        return {"removed": removed, "live_snapshots": sorted(live)}

    # -- verification helpers ---------------------------------------------------

    def state_checksum(self, spark: SparkSession) -> list[tuple]:
        """Per-row sha256(content) keyed by (repo, path) — the BASELINE
        invariant — as a sorted list for test comparison."""
        df = self.read(spark)
        rows = (
            df.select(*S.MERGE_KEYS, F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("h"))
            .collect()
        )
        return sorted((r["repo"], r["path"], r["h"]) for r in rows)

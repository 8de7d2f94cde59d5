"""End-to-end batch replay: the new-engine lifecycle of SURVEY.md §3.4.

read events (partition-pruned) -> [decode] -> filters (F1-F8, Catalyst)
-> flashback remap (optional) -> LWW window dedup per (repo, path)
-> salted repartition -> MERGE into the Iceberg-lite table
   (+ commit manifest + lineage + metrics)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bingo2sql_spark import schema as S
from bingo2sql_spark.operators import filters as FL
from bingo2sql_spark.operators import flashback as FB
from bingo2sql_spark.operators import resolve as R
from bingo2sql_spark.operators.apply import IcebergLiteTable


def replay(
    events: DataFrame,
    table: IcebergLiteTable,
    batch_id: str,
    *,
    flashback: bool = False,
    schema_ver: int = S.LATEST_SCHEMA_VER,
    repartition: int | None = None,
    row_image: str = "FULL",
    **filter_kwargs: Any,
) -> dict[str, Any]:
    """Replay a set of change events into the target table. Returns the
    commit metrics. Filters are applied BEFORE any widening transform so
    Catalyst pushes them into the scan."""
    ev = FL.apply_filters(events, flashback=flashback, **filter_kwargs)
    ev = ev.filter(F.col("op") != S.OP_DDL)
    if flashback and row_image == "MINIMAL":
        # same constraint as MySQL flashback tooling: rollback needs the
        # FULL before image; a MINIMAL stream never logged the unchanged
        # columns, so the inverted UPDATE would silently NULL them.
        raise NotImplementedError(
            "flashback over MINIMAL row images is not possible: unchanged "
            "columns were never logged (set binlog_row_image=FULL upstream, "
            "as the reference requires for flashback)"
        )
    if flashback:
        # rollback becomes NEW log traffic past the head (see
        # flashback.py). The rebase is DEFERRED into the commit
        # (rebase_past_head): invert only reverses order (seq' = -seq)
        # and commit shifts by head - min(seq') + 1 == head + max(seq)
        # + 1, with min(seq') riding the commit's existing pruning
        # pre-pass — no extra scan of the source per flashback batch
        # (VERDICT r3 #4).
        ev = FB.invert(ev)
    ev = R.with_key(ev)
    if repartition:
        ev = R.salted_repartition(ev, repartition)
    # no pre-resolve pass: IcebergLiteTable.commit's merge groupBy IS the
    # per-key LWW (one shuffle instead of two)
    if row_image == "MINIMAL":
        batch = R.to_upsert_rows_partial(ev, schema_ver=schema_ver)
    else:
        batch = R.to_upsert_rows(ev, schema_ver=schema_ver)
    return table.commit(batch, batch_id, rebase_past_head=flashback)

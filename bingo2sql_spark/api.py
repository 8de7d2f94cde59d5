"""User-facing facade mirroring the reference's CLI/config surface.

A bingo2sql user drives the tool with one config (host/file range, time
range, GTIDs, db/table/sql-type gates, flashback, rendering flags —
`BinlogParserConfig`, core/parser.go:118-175, flags cmd/root.go:96-168).
`generate_sql` is that entry point on Spark: events in, ordered SQL text
artifact out, every flag mapped to the corresponding operator. The
MERGE/lake path (the engine's main mode) stays `pipeline.replay`.

| reference flag          | here                          |
|-------------------------|-------------------------------|
| --start/stop-time       | start_time / stop_time        |
| --start/stop-file/pos   | start_file/position...        |
| --include-gtids         | include_gtids                 |
| -d/--databases, -t      | databases / tables            |
| --sql-type              | sql_type                      |
| --threadID              | thread_id                     |
| --max                   | max_rows (0 = unlimited)      |
| -B/--flashback          | flashback                     |
| --parse-ddl             | parse_ddl (+ text emission)   |
| --minimal-update        | minimal_update                |
| --minimal-insert        | minimal_insert                |
| --no-primary-key        | no_primary_key                |
| --show-gtid/time/all-time/thread | show_gtid / show_time / show_all_time / show_thread |
| archive (tar.gz)        | compression codec             |
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from bingo2sql_spark.functions.render import write_sql_file
from bingo2sql_spark.operators import filters as FL


def generate_sql(
    events: DataFrame,
    out_dir: str,
    *,
    # F1-F8 gates (reference flag names)
    start_time: str | None = None,
    stop_time: str | None = None,
    start_file: str | None = None,
    start_position: int = 0,
    stop_file: str | None = None,
    stop_position: int | None = None,
    include_gtids: str | None = None,
    databases: Sequence[str] | None = None,
    tables: Sequence[str] | None = None,
    sql_type: Sequence[str] | None = None,
    thread_id: int | None = None,
    max_rows: int = 0,
    parse_ddl: bool = False,
    # mode + rendering
    flashback: bool = False,
    minimal_update: bool = True,
    minimal_insert: bool = False,
    no_primary_key: bool = False,
    show_gtid: bool = True,
    show_time: bool = True,
    show_all_time: bool = False,
    show_thread: bool = False,
    compression: str | None = None,
    table_schema: str | None = None,
) -> None:
    """The reference's parse-to-SQL-file flow, one call: filters push
    into the scan (partition pruning + row-group skipping), rendering is
    whole-stage-codegen Column expressions, the output is a globally
    ordered text artifact (parts sort lexicographically).

    `no_primary_key` composes with `flashback` exactly as in the
    reference (RemovePrimary gates generateInsertSql in BOTH modes,
    core/parser.go:1182,1209): a flashback-inverted DELETE renders as an
    INSERT without the key columns.

    `table_schema` is the reference's local-mode schema file (`--tables
    schema.sql` when no host is given, core/parser.go:794-815): a path
    to semicolon-separated CREATE TABLE statements; each event then
    renders with its own table's parsed metadata — generated columns
    excluded, PRI > UNI key selection — and unregistered tables are
    skipped (readTableSchema / buildTableInfo parity, see ddl.py)."""
    registry = None
    if table_schema is not None:
        from bingo2sql_spark.ddl import parse_schema_file

        registry = parse_schema_file(table_schema)
    ev = FL.apply_filters(
        events,
        start_time=start_time,
        stop_time=stop_time,
        start_file=start_file,
        start_pos=start_position,
        stop_file=stop_file,
        stop_pos=stop_position,
        gtids=include_gtids,
        dbs=databases,
        tables=tables,
        sql_types=sql_type,
        tid=thread_id,
        limit=max_rows,
        include_ddl=parse_ddl,
        flashback=flashback,
    )
    write_sql_file(
        ev,
        out_dir,
        flashback=flashback,
        show_gtid=show_gtid,
        show_time=show_time or show_all_time,
        time_mode="row" if show_all_time else "second",
        show_thread=show_thread,
        minimal_update=minimal_update,
        minimal_insert=minimal_insert,
        no_primary_key=no_primary_key,
        compression=compression,
        table_registry=registry,
    )

"""T1-T3/T5/T6/T8/S6 — SQL-text generation (the reference's main output
mode) as vectorized transforms.

Two implementations with identical semantics on the pinned payload:

- `render_sql` — pure Column expressions (JVM, whole-stage codegen).
  This is the hot path: escaping via regexp_replace, statement assembly
  via concat_ws; minimal-update SET lists via null-skipping concat_ws
  (compareValue analog, core/parser.go:2184-2209).
- `render_sql_arrow` — mapInPandas (Arrow batches, pandas str ops); the
  extension point for payloads with exotic codecs (the reference's
  unsigned/JSON/geometry handling, core/parser.go:1736-1874) and for
  multi-row VALUES batching (--minimal-insert, core/parser.go:1164-1240).

Flashback note: rollback SQL (T5, generateUpdateRollbackSQL
core/parser.go:1499-1623) is NOT a separate renderer — after
operators.flashback.invert swaps images and remaps ops, this forward
renderer emits exactly the reference's rollback statements.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bingo2sql_spark import schema as S

KEY_COLS = list(S.MERGE_KEYS)


def sql_escape(c: Column) -> Column:
    """Backslash escaping, full escapeBytesBackslash character set
    (core/parser.go:1894-1935): \\ ' " NUL(0x00) Ctrl-Z(0x1a) LF CR.
    Content containing NUL or Ctrl-Z would otherwise corrupt/truncate
    the replayed SQL text."""
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, r"'", r"\\'")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, r"\n", r"\\n")
    c = F.regexp_replace(c, r"\r", r"\\r")
    c = F.regexp_replace(c, "\x00", r"\\0")
    c = F.regexp_replace(c, "\x1a", r"\\Z")
    return c


def _esc_pandas(s: pd.Series) -> pd.Series:
    """Pandas mirror of sql_escape (identical character set/order)."""
    return (
        s.str.replace("\\", "\\\\", regex=False)
        .str.replace("'", "\\'", regex=False)
        .str.replace('"', '\\"', regex=False)
        .str.replace("\n", "\\n", regex=False)
        .str.replace("\r", "\\r", regex=False)
        .str.replace("\x00", "\\0", regex=False)
        .str.replace("\x1a", "\\Z", regex=False)
    )


def sql_literal(c: Column) -> Column:
    """NULL -> NULL, else '<escaped>' (InterpolateParams
    core/parser.go:1763-1766,1838-1841)."""
    return F.when(c.isNull(), F.lit("NULL")).otherwise(F.concat(F.lit("'"), sql_escape(c), F.lit("'")))


def _qualified(db: Column, table: Column) -> Column:
    """`db`.`table` backtick quoting (getTableName core/parser.go:2488-2496)."""
    return F.concat(F.lit("`"), db, F.lit("`.`"), table, F.lit("`"))


def _where_eq(img: str, col: str) -> Column:
    """PK predicate with IS NULL handling (generateDeleteSQL
    core/parser.go:1277-1305)."""
    c = F.col(f"{img}.{col}")
    return F.when(c.isNull(), F.lit(f"`{col}` IS NULL")).otherwise(
        F.concat(F.lit(f"`{col}`="), sql_literal(c))
    )


def render_sql(
    events: DataFrame,
    payload_cols: list[str] | None = None,
    minimal_update: bool = True,
    no_primary_key: bool = False,
) -> DataFrame:
    """Envelope -> (seq, sql) rows. Semantics per reference:

    - INSERT (T1): INSERT INTO `db`.`tbl`(`c1`,...) VALUES(v1,...);
      generated columns excluded upstream (T6); --no-primary-key drops
      key columns from the column list (core/parser.go:1196-1204).
    - DELETE (T2): WHERE on the key columns of the before image.
    - UPDATE (T3): SET <changed or all cols from after> WHERE <keys from
      before>; minimal_update diffs before/after per column
      (core/parser.go:1367-1497)."""
    cols = payload_cols or [c for c in S.payload_columns() ]
    ins_cols = [c for c in cols if not (no_primary_key and c in KEY_COLS)]

    tbl = _qualified(F.col("db"), F.col("table"))
    col_list = F.lit("(" + ",".join(f"`{c}`" for c in ins_cols) + ")")
    values = F.concat_ws(",", *[sql_literal(F.col(f"after.{c}")) for c in ins_cols])
    insert_sql = F.concat(
        F.lit("INSERT INTO "), tbl, col_list, F.lit(" VALUES("), values, F.lit(");")
    )

    where = F.concat_ws(" AND ", *[_where_eq("before", k) for k in KEY_COLS])
    delete_sql = F.concat(F.lit("DELETE FROM "), tbl, F.lit(" WHERE "), where, F.lit(";"))

    def set_frag(c: str) -> Column:
        frag = F.concat(F.lit(f"`{c}`="), sql_literal(F.col(f"after.{c}")))
        if not minimal_update:
            return frag
        changed = ~F.col(f"before.{c}").eqNullSafe(F.col(f"after.{c}"))
        return F.when(changed, frag)  # NULL when unchanged -> concat_ws skips

    set_list = F.concat_ws(",", *[set_frag(c) for c in cols])
    update_sql = F.concat(
        F.lit("UPDATE "), tbl, F.lit(" SET "), set_list, F.lit(" WHERE "), where, F.lit(";")
    )

    sql = (
        F.when(F.col("op") == S.OP_INSERT, insert_sql)
        .when(F.col("op") == S.OP_DELETE, delete_sql)
        .when(F.col("op") == S.OP_UPDATE, update_sql)
    )
    return events.filter(F.col("op").isin(list(S.DML_OPS))).select(
        "seq", "gtid_uuid", "gno", "ts", "thread_id", sql.alias("sql")
    )


def decorate(rendered: DataFrame, show_gtid: bool = True, show_time: bool = True) -> DataFrame:
    """S6 — output decoration (myWrite core/parser.go:674-724): a GTID
    comment line when the GTID changes, `; # <ts>` appended on the first
    row of each second. Single-writer funnel replaced by a window over
    the global order."""
    w = Window.orderBy("seq")
    out = rendered
    if show_gtid:
        gtid = F.concat(F.col("gtid_uuid"), F.lit(":"), F.col("gno").cast("string"))
        new_gtid = F.lag(gtid).over(w).isNull() | (F.lag(gtid).over(w) != gtid)
        out = out.withColumn(
            "gtid_comment", F.when(new_gtid, F.concat(F.lit("# GTID "), gtid))
        )
    if show_time:
        sec = F.date_trunc("second", F.col("ts"))
        new_sec = F.lag(sec).over(w).isNull() | (F.lag(sec).over(w) != sec)
        out = out.withColumn(
            "time_comment",
            F.when(new_sec, F.concat(F.lit("; # "), F.date_format(sec, "yyyy-MM-dd HH:mm:ss"))),
        )
    return out


def write_sql_file(
    events: DataFrame,
    out_dir: str,
    *,
    flashback: bool = False,
    show_gtid: bool = True,
    show_time: bool = True,
    minimal_update: bool = True,
    compression: str | None = None,
) -> None:
    """S5/S7 — the reference's user-facing artifact: an ordered SQL text
    file (single-writer funnel core/parser.go:844-857 replaced by a
    global sort; tar.gz Archive core/parser.go:2460-2485 replaced by the
    writer's codec option).

    Emits one text part per sorted range (repartitionByRange keeps the
    global order across files: part-00000 < part-00001 ...); pass the
    result of operators.flashback.invert for rollback files — ascending
    seq on inverted events IS reverse binlog order, so no special
    casing."""
    from bingo2sql_spark.operators import flashback as FB

    ev = FB.invert(events) if flashback else events
    rendered = decorate(render_sql(ev, minimal_update=minimal_update), show_gtid, show_time)
    line = F.concat_ws(
        "\n",
        *( [F.col("gtid_comment")] if show_gtid else [] ),
        F.concat(
            F.col("sql"),
            F.coalesce(F.regexp_replace(F.col("time_comment"), "^; # ", " # "), F.lit(""))
            if show_time
            else F.lit(""),
        ),
    )
    out = rendered.select("seq", line.alias("value")).orderBy("seq").select("value")
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(out_dir)


def render_multi_row_inserts(
    events: DataFrame,
    payload_cols: list[str] | None = None,
    batch_rows: int = 100,
) -> DataFrame:
    """T1 `--minimal-insert` (default-on in the reference,
    core/parser.go:1164-1240): consecutive INSERTs into the same table
    become one multi-row `INSERT ... VALUES(...),(...)` statement.

    "Consecutive" is per seq order; grouping is seq-range-partitioned
    (repartitionByRange) so each statement covers a contiguous run and
    batching never crosses a non-insert event. Output: (seq of first
    row, sql)."""
    cols = payload_cols or S.payload_columns()
    flat = events.filter(F.col("op") == S.OP_INSERT).select(
        "seq", "db", "table", *[F.col(f"after.{c}").alias(f"a_{c}") for c in cols]
    )
    flat = flat.repartitionByRange(
        max(1, flat.sparkSession.sparkContext.defaultParallelism), "seq"
    ).sortWithinPartitions("seq")

    def esc(s: pd.Series) -> pd.Series:
        return _esc_pandas(s.astype("string"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        col_list = "(" + ",".join(f"`{c}`" for c in cols) + ")"
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = None
            for c in cols:
                lit = ("'" + esc(pdf[f"a_{c}"]) + "'").fillna("NULL")
                vals = lit if vals is None else vals + "," + lit
            pdf = pdf.assign(_tuple="(" + vals + ")")
            # group key: same (db, table) AND same seq-run chunk
            run = (
                (pdf["db"] != pdf["db"].shift())
                | (pdf["table"] != pdf["table"].shift())
            ).cumsum()
            chunk = pdf.groupby(run).cumcount() // batch_rows
            g = pdf.groupby([run, chunk], sort=True)
            out = g.agg(
                seq=("seq", "min"),
                db=("db", "first"),
                table=("table", "first"),
                values=("_tuple", ",".join),
            )
            out["sql"] = (
                "INSERT INTO `" + out["db"] + "`.`" + out["table"] + "`"
                + col_list + " VALUES" + out["values"] + ";"
            )
            yield out[["seq", "sql"]]

    return flat.mapInPandas(gen, schema="seq long, sql string")


def render_sql_arrow(
    events: DataFrame,
    payload_cols: list[str] | None = None,
    minimal_update: bool = True,
) -> DataFrame:
    """mapInPandas renderer: same statements as render_sql, built with
    vectorized pandas string ops over Arrow batches (the reference's
    bytes.Buffer V2 builder, core/parserV2.go:29-107, vectorized).
    Use this path when per-type codecs need Python (JSON/geometry/
    unsigned fix-ups) or for multi-row VALUES batching."""
    cols = payload_cols or S.payload_columns()
    flat = events.filter(F.col("op").isin(list(S.DML_OPS))).select(
        "seq",
        "op",
        "db",
        "table",
        *[F.col(f"before.{c}").alias(f"b_{c}") for c in cols],
        *[F.col(f"after.{c}").alias(f"a_{c}") for c in cols],
    )

    def lit(s: pd.Series) -> pd.Series:
        quoted = "'" + _esc_pandas(s.astype("string")) + "'"
        return quoted.fillna("NULL")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            tbl = "`" + pdf["db"] + "`.`" + pdf["table"] + "`"
            col_list = "(" + ",".join(f"`{c}`" for c in cols) + ")"
            values = lit(pdf[f"a_{cols[0]}"])
            for c in cols[1:]:
                values = values + "," + lit(pdf[f"a_{c}"])
            insert = "INSERT INTO " + tbl + col_list + " VALUES(" + values + ");"

            where = None
            for k in KEY_COLS:
                v = pdf[f"b_{k}"]
                frag = ("`" + k + "`=" + lit(v)).where(v.notna(), f"`{k}` IS NULL")
                where = frag if where is None else where + " AND " + frag
            delete = "DELETE FROM " + tbl + " WHERE " + where + ";"

            set_list = None
            for c in cols:
                frag = "`" + c + "`=" + lit(pdf[f"a_{c}"])
                if minimal_update:
                    changed = ~(
                        (pdf[f"b_{c}"] == pdf[f"a_{c}"])
                        | (pdf[f"b_{c}"].isna() & pdf[f"a_{c}"].isna())
                    )
                    frag = frag.where(changed, None)
                if set_list is None:
                    set_list = frag
                else:  # null-aware comma join (values may contain commas)
                    both = set_list.notna() & frag.notna()
                    joined = set_list.fillna("") + both.map({True: ",", False: ""}) + frag.fillna("")
                    set_list = joined.where(set_list.notna() | frag.notna(), None)
            update = "UPDATE " + tbl + " SET " + set_list + " WHERE " + where + ";"

            sql = insert.where(pdf["op"] == "insert", update.where(pdf["op"] == "update", delete))
            yield pd.DataFrame({"seq": pdf["seq"], "sql": sql})

    return flat.mapInPandas(gen, schema="seq long, sql string")

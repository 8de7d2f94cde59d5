"""CREATE TABLE schema-file resolution (ddl.py — the reference's
local-mode readTableSchema/buildTableInfo, core/parser.go:2035-2181)
and its end-to-end wiring through rendering and the CLI
(TestFieldGenerated mirror, core/parser_test.go:787-812)."""

from __future__ import annotations

import os

import pytest

from bingo2sql_spark.ddl import (
    lookup,
    parse_create_table,
    parse_schema_file,
    parse_schema_text,
    split_statements,
)

# the reference suite's own DDL corpus shapes (core/parser_test.go:28-85)
REFERENCE_DDLS = """
CREATE TABLE IF NOT EXISTS test_replication (
    id BIGINT(64) UNSIGNED  NOT NULL AUTO_INCREMENT,
    str VARCHAR(256),
    f FLOAT,
    d DOUBLE,
    de DECIMAL(10,2),
    e enum ("e1", "e2"),
    b BIT(8),
    se SET('a', 'b', 'c'),
    PRIMARY KEY (id)
  ) ENGINE=InnoDB DEFAULT CHARSET=utf8;
CREATE TABLE IF NOT EXISTS test_generated (
    id int primary key,
    price int,
    number int,
    total int generated always as (price*number));
CREATE TABLE test_geo (id int auto_increment primary key, g GEOMETRY);
CREATE TABLE IF NOT EXISTS test_json_v2 (
    id INT,
    c JSON,
    PRIMARY KEY (id)
    ) ENGINE=InnoDB;
"""


def test_parses_reference_ddl_corpus():
    reg = parse_schema_text(REFERENCE_DDLS)
    assert set(reg) == {"test_replication", "test_generated", "test_geo", "test_json_v2"}
    tr = reg["test_replication"]
    assert tr.key_columns == ["id"]
    assert [c.name for c in tr.columns if c.unsigned] == ["id"]
    assert [c.name for c in tr.columns] == [
        "id", "str", "f", "d", "de", "e", "b", "se",
    ]


def test_generated_column_excluded_and_pk_inline():
    """TestFieldGenerated's table: `total` is generated -> excluded from
    valid_columns; inline `primary key` on id is picked up."""
    reg = parse_schema_text(REFERENCE_DDLS)
    tg = reg["test_generated"]
    assert tg.valid_columns == ["id", "price", "number"]
    assert tg.key_columns == ["id"]
    assert [c.name for c in tg.columns if c.generated] == ["total"]


def test_generated_variants():
    """STORED/VIRTUAL and the bare `AS (...)` shorthand all mark the
    column generated (ColumnOptionGenerated, core/parser.go:2164-2170)."""
    t = parse_create_table(
        "CREATE TABLE g (id int primary key, a int, "
        "s int GENERATED ALWAYS AS (a+1) STORED, "
        "v int GENERATED ALWAYS AS (a+2) VIRTUAL, "
        "w int AS (a+3))"
    )
    assert [c.name for c in t.columns if c.generated] == ["s", "v", "w"]
    assert t.valid_columns == ["id", "a"]


def test_unique_fallback_precedence():
    """configPrimaryKey: PRI wins; else UNI; else all columns
    (core/parser.go:2211-2237 + keyless fallback 1292-1305)."""
    t = parse_create_table(
        "CREATE TABLE u (a int, b int, c text, UNIQUE KEY idx_b (b))"
    )
    assert t.key_columns == ["b"]
    t2 = parse_create_table("CREATE TABLE u2 (a int UNIQUE, b int PRIMARY KEY)")
    assert t2.key_columns == ["b"]
    t3 = parse_create_table("CREATE TABLE u3 (a int, b text)")
    assert t3.key_columns == ["a", "b"]


def test_quoting_comments_and_multi_statement():
    """Semicolons inside quoted strings/comments must not split
    statements (readTableSchema's quotaIsDouble loop); backquoted
    identifiers keep exotic names; COMMENT text never leaks flags."""
    sql = """
    -- leading comment; with semicolon
    CREATE TABLE `test`.`t1` (
      `key` varchar(10),
      note text COMMENT 'ends; with (weird) UNIQUE text',
      PRIMARY KEY (`key`)
    );  # trailing
    /* block; comment */
    CREATE TABLE t2 (x int, y varchar(5) DEFAULT 'a;b', PRIMARY KEY (x));
    """
    assert len(split_statements(sql)) == 2
    reg = parse_schema_text(sql)
    t1 = reg["test.t1"]
    assert [c.name for c in t1.columns] == ["key", "note"]
    assert t1.key_columns == ["key"]
    assert not any(c.unique for c in t1.columns)  # COMMENT text ignored
    assert reg["t2"].key_columns == ["x"]


def test_lookup_precedence_and_schema_file(tmp_path):
    """cacheNewTable keys: 'db.table' when qualified, bare table
    otherwise; lookup resolves qualified first then unqualified.
    parse_schema_file raises on a file with no CREATE TABLE."""
    reg = parse_schema_text(
        "CREATE TABLE a.t (x int PRIMARY KEY); CREATE TABLE t (y int PRIMARY KEY)"
    )
    assert lookup(reg, "a", "t").key_columns == ["x"]
    assert lookup(reg, "other", "t").key_columns == ["y"]
    assert lookup(reg, "a", "missing") is None

    p = tmp_path / "schema.sql"
    p.write_text(REFERENCE_DDLS)
    assert set(parse_schema_file(str(p))) == {
        "test_replication", "test_generated", "test_geo", "test_json_v2",
    }
    bad = tmp_path / "empty.sql"
    bad.write_text("-- nothing here;\nINSERT INTO x VALUES (1);")
    with pytest.raises(ValueError, match="no CREATE TABLE"):
        parse_schema_file(str(bad))


def _write_schema(tmp_path, body: str) -> str:
    p = tmp_path / "schema.sql"
    p.write_text(body)
    return str(p)


def test_cli_schema_file_drives_rendering(spark, tmp_path):
    """TestFieldGenerated mirror over the engine's pinned table: a
    schema file declaring `branch` GENERATED and PRIMARY KEY (repo,
    path) drives the CLI -> generated column absent from every
    statement, WHERE uses the file's key; the unregistered
    meta.audit_log events are skipped (reference local mode renders
    cached tables only)."""
    from bingo2sql_spark.__main__ import main
    from bingo2sql_spark.sources.synth import generate_events, to_raw_typed

    ev = generate_events(spark, n_keys=80, versions_per_key=4, n_repos=8, seed=3)
    src = str(tmp_path / "landing")
    to_raw_typed(ev).write.parquet(src)
    schema = _write_schema(
        tmp_path,
        """CREATE TABLE test.repo_files (
             repo varchar(200),
             path varchar(500),
             commit varchar(64),
             lang varchar(32),
             content longtext,
             branch varchar(64) GENERATED ALWAYS AS (repo) VIRTUAL,
             PRIMARY KEY (repo, path)
           );""",
    )
    out = str(tmp_path / "out")
    rc = main(["--input", src, "--input-format", "raw_typed_parquet",
               "-o", out, "--table-schema", schema])
    assert rc == 0
    body = "".join(
        open(os.path.join(out, f)).read()
        for f in sorted(os.listdir(out)) if f.startswith("part-")
    )
    assert "INSERT INTO" in body and "UPDATE" in body
    assert "`branch`" not in body  # generated column excluded (T6)
    assert "`repo`=" in body and "`path`=" in body  # file's PK in WHERE
    assert "audit_log" not in body  # unregistered table skipped


def test_cli_lone_tables_value_naming_a_file_is_schema(spark, tmp_path):
    """The reference overloads --tables: in local mode the value is the
    schema file path (core/parser.go:794-815). A lone -t value naming
    an existing file must behave exactly like --table-schema."""
    from bingo2sql_spark.__main__ import main
    from bingo2sql_spark.sources.synth import generate_events, to_raw_typed

    ev = generate_events(spark, n_keys=40, versions_per_key=4, n_repos=4, seed=5)
    src = str(tmp_path / "landing")
    to_raw_typed(ev).write.parquet(src)
    schema = _write_schema(
        tmp_path,
        # keyless except a UNIQUE: WHERE must use the UNI fallback column
        """CREATE TABLE repo_files (
             repo varchar(200),
             path varchar(500),
             commit varchar(64),
             lang varchar(32),
             content longtext,
             UNIQUE KEY uq (repo)
           );""",
    )
    out = str(tmp_path / "out")
    rc = main(["--input", src, "--input-format", "raw_typed_parquet",
               "-o", out, "-t", schema, "--sql-type", "delete"])
    assert rc == 0
    body = "".join(
        open(os.path.join(out, f)).read()
        for f in sorted(os.listdir(out)) if f.startswith("part-")
    )
    deletes = [ln for ln in body.splitlines() if ln.startswith("DELETE")]
    assert deletes
    # UNI fallback: WHERE on repo only, never path
    assert all("`repo`=" in ln and "`path`=" not in ln for ln in deletes)


def test_registry_rejects_unknown_columns(spark, tmp_path):
    """A schema-file column absent from the stream's payload struct
    fails loudly instead of rendering NULLs."""
    from bingo2sql_spark.api import generate_sql
    from bingo2sql_spark.sources.synth import generate_events

    ev = generate_events(spark, n_keys=10, versions_per_key=2, seed=9)
    schema = _write_schema(
        tmp_path,
        "CREATE TABLE repo_files (repo varchar(10) PRIMARY KEY, nope int);",
    )
    with pytest.raises(ValueError, match="nope"):
        generate_sql(ev, str(tmp_path / "out"), table_schema=schema)


def test_prefix_length_key_parts():
    """MySQL prefix-length key parts — PRIMARY KEY (name(10), id) — must
    not truncate the key list at the inner ')' (review r5: the lazy
    capture dropped every later key column, under-constraining WHERE)."""
    t = parse_create_table(
        "CREATE TABLE p (name varchar(200), id int, v text, "
        "PRIMARY KEY (name(10), id))"
    )
    assert t.key_columns == ["name", "id"]
    u = parse_create_table(
        "CREATE TABLE u (a text, b int, UNIQUE KEY uq (a(16), b))"
    )
    assert u.key_columns == ["a", "b"]


def test_registry_rendering_qualified_precedence(spark, tmp_path):
    """A db-qualified entry must claim its events even when an
    unqualified same-name table appears EARLIER in the schema file
    (cacheNewTable precedence; review r5: statement-order iteration let
    the unqualified entry swallow them)."""
    from bingo2sql_spark.api import generate_sql
    from bingo2sql_spark.sources.synth import generate_events

    ev = generate_events(spark, n_keys=40, versions_per_key=8, seed=17)
    schema = _write_schema(
        tmp_path,
        # unqualified first — with UNIQUE(repo) it would render WHERE
        # `repo`= only; the qualified entry pins PRIMARY KEY (repo, path)
        """CREATE TABLE repo_files (
             repo varchar(200), path varchar(500), commit varchar(64),
             lang varchar(32), content longtext, UNIQUE KEY uq (repo));
           CREATE TABLE test.repo_files (
             repo varchar(200), path varchar(500), commit varchar(64),
             lang varchar(32), content longtext,
             PRIMARY KEY (repo, path));""",
    )
    out = str(tmp_path / "outp")
    generate_sql(ev, out, table_schema=schema, sql_type=["delete"])
    import glob

    deletes = [
        ln
        for f in sorted(glob.glob(out + "/part-*"))
        for ln in open(f)
        if ln.startswith("DELETE")
    ]
    assert deletes
    # events are db='test' -> the QUALIFIED entry's composite key wins
    assert all("`repo`=" in ln and "`path`=" in ln for ln in deletes)


def test_string_literals_never_drive_option_keywords():
    """ADVICE r5: ANY string literal (DEFAULT, COMMENT, CHECK text) is
    blanked before option scanning — DEFAULT 'AS (x)' must not mark a
    column generated, DEFAULT '... UNIQUE ...' must not set unique
    (which would redirect the keyless WHERE-key fallback)."""
    t = parse_create_table(
        "CREATE TABLE lit ("
        "a varchar(20) DEFAULT 'AS (x)', "
        "b varchar(40) DEFAULT 'pick the UNIQUE one', "
        "c varchar(10) DEFAULT 'UNSIGNED PRIMARY KEY', "
        "d int AS (a+1))"
    )
    assert [c.name for c in t.columns if c.generated] == ["d"]
    assert not any(c.unique for c in t.columns)
    assert not any(c.unsigned for c in t.columns)
    # keyless fallback: all non-generated columns, NOT redirected to b
    assert t.key_columns == ["a", "b", "c"]
    # real options still detected alongside literals
    t2 = parse_create_table(
        "CREATE TABLE lit2 (a int UNSIGNED DEFAULT '7' PRIMARY KEY, "
        "b varchar(5) DEFAULT 'x' UNIQUE)"
    )
    assert t2.key_columns == ["a"]
    assert [c.name for c in t2.columns if c.unsigned] == ["a"]
    assert [c.name for c in t2.columns if c.unique] == ["b"]


def test_parse_alter_table_variants():
    from bingo2sql_spark.ddl import parse_alter_table

    db, tbl, acts = parse_alter_table(
        "ALTER TABLE `test`.`repo_files` ADD COLUMN `branch` varchar(255) AFTER `content`, "
        "DROP COLUMN lang, ADD flags int unsigned, "
        "ADD INDEX idx_b (branch), COMMENT 'x', ENGINE=InnoDB"
    )
    assert (db, tbl) == ("test", "repo_files")
    assert [(k, getattr(v, "name", v)) for k, v in acts] == [
        ("add", "branch"), ("drop", "lang"), ("add", "flags")
    ]
    assert acts[2][1].unsigned
    # unqualified + bare ADD without COLUMN keyword + FIRST position
    _, t2, a2 = parse_alter_table("ALTER TABLE t ADD c text FIRST", default_db="d")
    assert t2 == "t" and a2[0][1].name == "c"
    # generated add column is marked generated
    _, _, a3 = parse_alter_table("ALTER TABLE t ADD total int AS (a+b) STORED")
    assert a3[0][1].generated
    # not an ALTER
    assert parse_alter_table("CREATE TABLE x (a int)") is None
    # no column actions -> empty list (COMMENT-only alters, the synth's)
    _, _, a4 = parse_alter_table("ALTER TABLE `test`.`repo_files` COMMENT 'ddl-1'")
    assert a4 == []
    # DROP PRIMARY KEY / DROP INDEX are not column drops
    _, _, a5 = parse_alter_table("ALTER TABLE t DROP PRIMARY KEY, DROP INDEX idx")
    assert a5 == []


def test_apply_alter_and_evolve_registry():
    from bingo2sql_spark.ddl import (
        apply_alter, evolve_registry, lookup, parse_alter_table, parse_schema_text,
    )

    reg = parse_schema_text("CREATE TABLE test.t (id int primary key, a int)")
    _, _, acts = parse_alter_table("ALTER TABLE test.t ADD b varchar(10), DROP COLUMN a")
    meta = apply_alter(reg["test.t"], acts)
    assert [c.name for c in meta.columns] == ["id", "b"]
    assert meta.schema_ver == reg["test.t"].schema_ver + 1
    # loud on disagreement
    import pytest as _p
    with _p.raises(ValueError, match="already exists"):
        apply_alter(meta, [("add", meta.columns[0])])
    with _p.raises(ValueError, match="no such column"):
        apply_alter(meta, [("drop", "zzz")])
    # registry-level evolution: ALTER evolves, unknown table ignored,
    # DROP TABLE removes, CREATE registers
    reg2 = evolve_registry(reg, "ALTER TABLE test.t ADD c int")
    assert [c.name for c in lookup(reg2, "test", "t").columns] == ["id", "a", "c"]
    assert evolve_registry(reg, "ALTER TABLE other.x ADD c int") == reg
    reg3 = evolve_registry(reg2, "CREATE TABLE u (k int primary key)")
    assert "u" in reg3
    reg4 = evolve_registry(reg3, "DROP TABLE test.t")
    assert lookup(reg4, "test", "t") is None and "u" in reg4


def test_parse_change_and_modify_column():
    """VERDICT r6 #2: CHANGE old new TYPE parses as a rename action
    (full new definition), MODIFY col TYPE as an in-place definition
    swap; FIRST/AFTER position clauses are cosmetic and stripped; the
    declared type text is captured for narrowing validation."""
    from bingo2sql_spark.ddl import parse_alter_table, parse_schema_text

    meta = parse_schema_text(
        "CREATE TABLE t (id bigint unsigned primary key, name varchar(20))"
    )["t"]
    assert [c.ctype for c in meta.columns] == ["bigint unsigned", "varchar(20)"]

    _, _, acts = parse_alter_table(
        "ALTER TABLE t CHANGE COLUMN `name` `full_name` VARCHAR(40) AFTER id, "
        "MODIFY COLUMN id BIGINT UNSIGNED FIRST"
    )
    assert acts[0][0] == "change"
    old, col = acts[0][1]
    assert old == "name" and col.name == "full_name" and col.ctype == "varchar(40)"
    assert acts[1][0] == "modify"
    assert acts[1][1].name == "id" and acts[1][1].unsigned
    # bare (no COLUMN keyword) forms
    _, _, a2 = parse_alter_table("ALTER TABLE t CHANGE name nm text")
    assert a2 == [("change", ("name", a2[0][1][1]))] and a2[0][1][1].ctype == "text"


def test_apply_alter_change_rename_semantics():
    from bingo2sql_spark.ddl import apply_alter, parse_alter_table, parse_schema_text

    meta = parse_schema_text(
        "CREATE TABLE t (id int primary key, a varchar(10), b varchar(10))"
    )["t"]
    _, _, acts = parse_alter_table("ALTER TABLE t CHANGE a a2 varchar(20)")
    m2 = apply_alter(meta, acts)
    # rename in place: position preserved, new definition adopted
    assert [c.name for c in m2.columns] == ["id", "a2", "b"]
    assert m2.columns[1].ctype == "varchar(20)"
    assert m2.schema_ver == meta.schema_ver + 1
    import pytest as _p
    with _p.raises(ValueError, match="no such column"):
        apply_alter(meta, parse_alter_table("ALTER TABLE t CHANGE zzz z2 int")[2])
    with _p.raises(ValueError, match="already exists"):
        apply_alter(meta, parse_alter_table("ALTER TABLE t CHANGE a b varchar(10)")[2])
    # same-name CHANGE (type-only via CHANGE syntax) is legal MySQL
    m3 = apply_alter(meta, parse_alter_table("ALTER TABLE t CHANGE a a varchar(99)")[2])
    assert m3.columns[1].ctype == "varchar(99)"


def test_modify_lossy_narrowing_is_loud():
    """check_type_change: data-destroying declared-type changes raise;
    widenings and unknown pairs pass (the engine stores text — only
    DECLARED loss is policed)."""
    import pytest as _p

    from bingo2sql_spark.ddl import apply_alter, parse_alter_table, parse_schema_text

    meta = parse_schema_text(
        "CREATE TABLE t (id bigint primary key, name varchar(20), "
        "score decimal(10,2), ratio double)"
    )["t"]

    def alter(stmt):
        return apply_alter(meta, parse_alter_table(stmt)[2])

    for stmt in [
        "ALTER TABLE t MODIFY name varchar(10)",      # shorter
        "ALTER TABLE t MODIFY id int",                # smaller int
        "ALTER TABLE t MODIFY score decimal(8,2)",    # fewer digits
        "ALTER TABLE t MODIFY score decimal(10,1)",   # fewer fraction digits
        "ALTER TABLE t MODIFY name bigint",           # string -> numeric
        "ALTER TABLE t MODIFY score int",             # drops fraction
        "ALTER TABLE t MODIFY id float",              # int > mantissa
        "ALTER TABLE t MODIFY ratio float",           # double -> float
        "ALTER TABLE t CHANGE name nm varchar(5)",    # narrowing via CHANGE
    ]:
        with _p.raises(ValueError, match="lossy"):
            alter(stmt)
    for stmt in [
        "ALTER TABLE t MODIFY name varchar(100)",
        "ALTER TABLE t MODIFY name text",
        "ALTER TABLE t MODIFY id decimal(20,0)",
        "ALTER TABLE t MODIFY score decimal(14,4)",
        "ALTER TABLE t MODIFY score double",
        "ALTER TABLE t MODIFY id bigint",             # same type: no-op
        "ALTER TABLE t MODIFY id decimal(19,0)",      # ADVICE r7: signed bigint fits 19 digits
    ]:
        alter(stmt)


def test_signedness_and_render_capacity_narrowing():
    """ADVICE r7 closures: UNSIGNED participates in narrowing (same-rank
    sign flips are lossy, unsigned -> wider signed is fine), numeric ->
    short char/varchar is policed by rendered width, and signed bigint
    -> decimal(19,0) passes (the old unsigned-bound table rejected it)."""
    import pytest as _p

    from bingo2sql_spark.ddl import apply_alter, parse_alter_table, parse_schema_text

    meta = parse_schema_text(
        "CREATE TABLE t (id bigint primary key, n int unsigned, "
        "s bigint, score decimal(10,2))"
    )["t"]
    assert meta.columns[1].ctype == "int unsigned"

    def alter(stmt):
        return apply_alter(meta, parse_alter_table(stmt)[2])

    for stmt in [
        "ALTER TABLE t MODIFY n int",                # unsigned -> signed, same rank
        "ALTER TABLE t MODIFY s bigint unsigned",    # signed -> unsigned
        "ALTER TABLE t MODIFY s varchar(2)",         # bigint needs up to 20 chars
        "ALTER TABLE t MODIFY n char(9)",            # uint needs up to 10 chars
        "ALTER TABLE t MODIFY score varchar(10)",    # -9999999999.99 needs 12
    ]:
        with _p.raises(ValueError, match="lossy"):
            alter(stmt)
    for stmt in [
        "ALTER TABLE t MODIFY n bigint",             # unsigned int fits signed bigint
        "ALTER TABLE t MODIFY s decimal(19,0)",      # signed bigint: 19 digits suffice
        "ALTER TABLE t MODIFY s varchar(20)",        # sign + 19 digits
        "ALTER TABLE t MODIFY n varchar(10)",
        "ALTER TABLE t MODIFY score varchar(12)",
        "ALTER TABLE t MODIFY n int unsigned",       # same type: no-op
    ]:
        alter(stmt)

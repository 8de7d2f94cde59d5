"""S1 replication-protocol client conformance — against the in-box
protocol server (tests/fake_mysqld.py), which independently implements
the server side of the documented wire format including scramble
verification. Covers: handshake/auth (right + wrong password),
COM_QUERY/COM_REGISTER_SLAVE, COM_BINLOG_DUMP event streaming ≡ the
file parse of the same log, and the tail → landing → replay path."""

from __future__ import annotations

import pytest

from bingo2sql_spark.sources import binlog_binary as B
from bingo2sql_spark.sources.repl_client import (
    MySQLProtocolError,
    ReplicationClient,
    native_password_scramble,
    tail_to_landing,
)
from tests.fake_mysqld import SEED, FakeMySQLServer


def _log():
    w = B.BinlogWriter(checksum=True)
    w.gtid("3e11fa47-71ca-11e1-9e33-c80aa9429562", 9, ts=500)
    w.query("BEGIN", db="test", thread_id=77, ts=500)
    types = [B.T_VARCHAR] * 4
    meta = [120, 600, 160, 600]
    # a TABLE_MAP precedes every rows event, as real servers write them
    w.table_map("test", "repo_files", types, meta, ts=500)
    w.rows("test", "repo_files", "insert", types, meta,
           [[f"r{i % 3}", f"f{i}", "c1", f"v{i}"] for i in range(25)], ts=500)
    w.table_map("test", "repo_files", types, meta, ts=501)
    w.rows("test", "repo_files", "update", types, meta,
           [(["r0", "f3", "c1", "v3"], ["r0", "f3", "c2", "v3b"])], ts=501)
    w.table_map("test", "repo_files", types, meta, ts=502)
    w.rows("test", "repo_files", "delete", types, meta,
           [["r1", "f7", "c1", "v7"]], ts=502)
    w.query("ALTER TABLE repo_files ADD COLUMN note varchar(5)", db="test",
            thread_id=77, ts=503)
    w.xid(1, ts=503)
    return w.bytes()


NAMES = {"test.repo_files": ["repo", "path", "commit", "content"]}


def test_scramble_is_the_documented_algorithm():
    """Pin mysql_native_password against a hand-computed vector."""
    import hashlib

    pwd, seed = "secret", SEED
    p1 = hashlib.sha1(b"secret").digest()
    expect = bytes(
        a ^ b
        for a, b in zip(
            hashlib.sha1(seed + hashlib.sha1(p1).digest()).digest(), p1
        )
    )
    assert native_password_scramble(pwd, seed) == expect
    assert native_password_scramble("", seed) == b""


def test_handshake_auth_and_denial():
    data = _log()
    with FakeMySQLServer(data) as srv:
        c = ReplicationClient("127.0.0.1", srv.port, "repl", "secret")
        info = c.connect()
        assert info["server_version"].startswith("8.0.36")
        c.register_slave()
        assert srv.registered == [2000000111]  # the reference's ServerID
        c.close()

        bad = ReplicationClient("127.0.0.1", srv.port, "repl", "wrong")
        with pytest.raises(MySQLProtocolError, match="Access denied"):
            bad.connect()


def test_binlog_dump_equals_file_parse():
    """The network stream decodes to EXACTLY the rows the file parse of
    the same log produces — same values, same seqs, same gtid/thread
    attribution — because both feed the one BinlogEventParser."""
    data = _log()
    via_file = list(B.parse_binlog_bytes(
        data, log_file="mysql-bin.000001", names_for=NAMES
    ))
    with FakeMySQLServer(data) as srv:
        c = ReplicationClient("127.0.0.1", srv.port, "repl", "secret",
                              names_for=NAMES)
        c.connect()
        via_net = list(c.binlog_dump("mysql-bin.000001", start_pos=4))
        c.close()
        assert any("master_binlog_checksum" in q for q in srv.queries)
        assert srv.dumps == [(4, "mysql-bin.000001")]
    assert via_net == via_file and len(via_net) == 25 + 1 + 1 + 1


def test_binlog_dump_from_offset():
    """(start_file, start_pos) resume: events before the offset are not
    re-served (the reference's start-position contract,
    core/parser.go:330-520)."""
    data = _log()
    full = list(B.parse_binlog_bytes(data, log_file="mysql-bin.000001",
                                     names_for=NAMES))
    # resume from the statement boundary: the TABLE_MAP (type 19) that
    # precedes the update rows event — real resume positions are
    # boundaries, a naked ROWS event has no row schema
    upd_pos = next(e["log_pos"] for e in full if e["op"] == "update")
    offs = []
    off = 4
    while off + 19 <= len(data):
        size = int.from_bytes(data[off + 9 : off + 13], "little")
        offs.append((off, data[off + 4]))
        off += size
    upd_pos = max(o for o, t in offs if t == 19 and o < upd_pos)
    with FakeMySQLServer(data) as srv:
        c = ReplicationClient("127.0.0.1", srv.port, "repl", "secret",
                              names_for=NAMES)
        c.connect()
        rows = list(c.binlog_dump("mysql-bin.000001", start_pos=upd_pos))
        c.close()
    assert [e["op"] for e in rows] == ["update", "delete", "ddl"]
    # rows keep their true in-file seqs — a resumed tail never renumbers
    assert [e["seq"] for e in rows] == [
        e["seq"] for e in full if e["log_pos"] >= upd_pos
    ]


def test_tail_to_landing_replays(spark, tmp_path):
    """End to end: protocol tail -> chunked RAW_EVENT landing ->
    decode_events -> replay == the file-parse replay of the same log."""
    from bingo2sql_spark.operators.apply import IcebergLiteTable
    from bingo2sql_spark.pipeline import replay
    from bingo2sql_spark.sources.decode import decode_events

    data = _log()
    land = str(tmp_path / "landing")
    with FakeMySQLServer(data) as srv:
        c = ReplicationClient("127.0.0.1", srv.port, "repl", "secret",
                              names_for=NAMES)
        c.connect()
        n = tail_to_landing(spark, c, land, "mysql-bin.000001",
                            chunk_rows=10)
        c.close()
    assert n == 28
    raw = spark.read.parquet(land)
    ev = decode_events(raw)
    t = IcebergLiteTable(str(tmp_path / "t"), n_buckets=4)
    replay(ev, t, batch_id="b1", tables=["repo_files"])
    got = {(r["repo"], r["path"]): (r["commit"], r["content"])
           for r in t.read(spark).collect()}
    assert got[("r0", "f3")] == ("c2", "v3b")
    assert ("r1", "f7") not in got and len(got) == 24


def test_16mb_packet_continuation():
    """A rows event past the 16 MB packet bound arrives split across
    wire packets (length 0xFFFFFF continuation); the client reassembles
    the logical packet and the decode is unchanged."""
    w = B.BinlogWriter(checksum=True)
    types, meta = [B.T_LONG, B.T_BLOB], [0, 4]
    w.table_map("d", "big", types, meta, ts=1)
    blob = "x" * (5 << 20)  # 5 MiB per row
    w.rows("d", "big", "insert", types, meta,
           [[i, blob] for i in range(4)], ts=1)  # one ~20 MiB event
    w.xid(1)
    data = w.bytes()
    assert len(data) > 0xFFFFFF  # the event really exceeds one packet
    with FakeMySQLServer(data) as srv:
        c = ReplicationClient("127.0.0.1", srv.port, "repl", "secret",
                              names_for={"d.big": ["k", "v"]})
        c.connect()
        rows = list(c.binlog_dump("mysql-bin.000001"))
        c.close()
    assert len(rows) == 4
    import json as _json
    got = _json.loads(rows[3]["after_json"])
    assert got["k"] == 3 and len(got["v"]) == 5 << 20


def test_artificial_pre_fde_rotate_with_crc_keeps_file_name_clean():
    """ADVICE r8: real servers open a dump with an ARTIFICIAL ROTATE
    (sent BEFORE the FDE) that is CRC32-checksummed when
    binlog_checksum=CRC32. The client pre-seeds the parser's checksum
    state from @@global.binlog_checksum, so the rotate's file name must
    come through without the 4 CRC bytes appended."""
    data = _log()
    with FakeMySQLServer(data, artificial_rotate=True) as srv:
        c = ReplicationClient("127.0.0.1", srv.port, "repl", "secret",
                              names_for=NAMES)
        c.connect()
        rows = list(c.binlog_dump("mysql-bin.000001", start_pos=4))
        c.close()
        assert any(
            q.strip().upper().startswith("SELECT") and "binlog_checksum" in q
            for q in srv.queries
        )
    assert rows and all(e["log_file"] == "mysql-bin.000001" for e in rows)
    # the ordinal-packed seqs stay sane too (a corrupted name would
    # change the digit-derived ordinal)
    assert all(e["seq"] >> 44 == 1 for e in rows)


def test_auth_switch_request_raises_loudly():
    """ADVICE r8: a 0xFE AuthSwitchRequest after HandshakeResponse41
    (account on caching_sha2_password etc.) must raise with the plugin
    name, not be mistaken for OK and desync the session."""
    data = _log()
    with FakeMySQLServer(data, auth_switch_plugin="caching_sha2_password") as srv:
        c = ReplicationClient("127.0.0.1", srv.port, "repl", "secret")
        with pytest.raises(MySQLProtocolError, match="caching_sha2_password"):
            c.connect()

"""S1/S2 upgraded — parse REAL MySQL binlog *file bytes* (binlog v4,
row format) into the engine's raw-event envelope, with no MySQL client
library and no server.

The reference consumes binlogs through a replication-protocol tailer
(core/parser.go:330-520) or a local file parse (core/parseFile.go:16-179),
both delegating the byte-level decode to its go-mysql dependency. The
network half is environment-bound here (no MySQL server in the box),
but the FILE half is not: this module implements the publicly
documented binlog v4 event format directly —

- 4-byte magic, 19-byte common event header;
- FORMAT_DESCRIPTION_EVENT (incl. CRC32 checksum-algorithm detection,
  MySQL >= 5.6.1 — checksummed events drop their 4-byte tail);
- GTID_LOG_EVENT (sid uuid + gno), QUERY_EVENT (thread id, schema,
  statement — BEGIN/COMMIT filtered, DDL surfaced as op='ddl'),
  XID_EVENT, TABLE_MAP_EVENT (column types + per-type metadata),
  WRITE/UPDATE/DELETE_ROWS v1+v2 (present-column bitmaps, per-image
  null bitmaps, per-type value decode);
- value decode for the row-format type matrix the reference handles
  (core/parser.go:1322-1360,1736-1874): all int widths, float/double,
  VARCHAR/STRING/ENUM/SET/BIT, BLOB/TEXT, DATE/DATETIME2/TIMESTAMP2/
  TIME2/YEAR, NEWDECIMAL (packed BCD), and binary JSONB via the
  existing sources.codecs.decode_jsonb.

Spark-first shape: binlog FILES are the natural parallel unit (the
server rotates them at max_binlog_size), so `binlog_raw_events` reads
a directory with `spark.read.format("binaryFile")` and decodes each
file inside one Arrow-batched `mapInPandas` task — a 1000-file backlog
decodes on 1000 cores with zero shuffles. The output is the engine's
RAW_EVENT envelope (+ `statement`), so everything downstream —
`decode_events`, filters, replay/flashback, rendering — is unchanged.

Column NAMES are not stored in rows events (only in the schema), so a
registry maps (db, table) -> ordered column names — same contract as
the reference, which loads the schema per table before parsing
(core/parser.go:1626-1686). Unknown tables fall back to mysqlbinlog's
positional @1..@N naming. Signedness is also absent from the binlog;
integers decode SIGNED here and the registry-driven unsigned
reinterpretation (T7, sources/decode.py) applies downstream.

A deterministic ENCODER (`encode_binlog`) lives here too: the sandbox
has no mysqld to produce fixtures, so tests and benchmarks synthesize
real-format binlog bytes the same way the reference's CI synthesizes
binlogs by running DML against a throwaway server (SURVEY.md §5). The
golden-byte tests in tests/test_binlog_binary.py pin the format
against hand-assembled hex, so encoder and decoder cannot drift
together unnoticed.
"""

from __future__ import annotations

import datetime as _dt
import json
import struct
import zlib
from collections.abc import Iterator

BINLOG_MAGIC = b"\xfebin"

# event type codes (public binlog v4)
QUERY_EVENT = 2
STOP_EVENT = 3
ROTATE_EVENT = 4
FORMAT_DESCRIPTION_EVENT = 15
XID_EVENT = 16
TABLE_MAP_EVENT = 19
WRITE_ROWS_EVENT_V1 = 23
UPDATE_ROWS_EVENT_V1 = 24
DELETE_ROWS_EVENT_V1 = 25
WRITE_ROWS_EVENT = 30
UPDATE_ROWS_EVENT = 31
DELETE_ROWS_EVENT = 32
GTID_LOG_EVENT = 33
ANONYMOUS_GTID_EVENT = 34
PREVIOUS_GTIDS_EVENT = 35

_ROWS_WRITE = {WRITE_ROWS_EVENT, WRITE_ROWS_EVENT_V1}
_ROWS_UPDATE = {UPDATE_ROWS_EVENT, UPDATE_ROWS_EVENT_V1}
_ROWS_DELETE = {DELETE_ROWS_EVENT, DELETE_ROWS_EVENT_V1}
_ROWS_V2 = {WRITE_ROWS_EVENT, UPDATE_ROWS_EVENT, DELETE_ROWS_EVENT}

# MySQL column type codes
T_DECIMAL = 0
T_TINY = 1
T_SHORT = 2
T_LONG = 3
T_FLOAT = 4
T_DOUBLE = 5
T_NULL = 6
T_TIMESTAMP = 7
T_LONGLONG = 8
T_INT24 = 9
T_DATE = 10
T_TIME = 11
T_DATETIME = 12
T_YEAR = 13
T_VARCHAR = 15
T_BIT = 16
T_TIMESTAMP2 = 17
T_DATETIME2 = 18
T_TIME2 = 19
T_JSON = 245
T_NEWDECIMAL = 246
T_ENUM = 247
T_SET = 248
T_TINY_BLOB = 249
T_MEDIUM_BLOB = 250
T_LONG_BLOB = 251
T_BLOB = 252
T_VAR_STRING = 253
T_STRING = 254
T_GEOMETRY = 255

_HEADER_LEN = 19


class BinlogFormatError(ValueError):
    """Raised on malformed binlog bytes (bad magic, truncated event,
    unknown required structure). on_error='skip' in the reader degrades
    per FILE instead (loud counter), matching the reference's
    blacklist-and-continue (checkCanParse core/parser.go:1242-1253)."""


def _u(data: bytes, off: int, n: int) -> int:
    return int.from_bytes(data[off : off + n], "little")


def _s(data: bytes, off: int, n: int) -> int:
    return int.from_bytes(data[off : off + n], "little", signed=True)


def _be(data: bytes, off: int, n: int) -> int:
    return int.from_bytes(data[off : off + n], "big")


def _lenenc(data: bytes, off: int) -> tuple[int, int]:
    """MySQL length-encoded integer -> (value, next offset)."""
    first = data[off]
    if first < 0xFB:
        return first, off + 1
    if first == 0xFC:
        return _u(data, off + 1, 2), off + 3
    if first == 0xFD:
        return _u(data, off + 1, 3), off + 4
    if first == 0xFE:
        return _u(data, off + 1, 8), off + 9
    raise BinlogFormatError(f"bad length-encoded int prefix 0x{first:02x}")


# ---------------------------------------------------------------------------
# table map: column types + metadata


class _TableMap:
    __slots__ = ("db", "table", "types", "meta", "col_count")

    def __init__(self, db: str, table: str, types: list[int], meta: list[int]):
        self.db = db
        self.table = table
        self.types = types
        self.meta = meta
        self.col_count = len(types)


def _parse_table_map(body: bytes) -> tuple[int, _TableMap]:
    table_id = _u(body, 0, 6)
    off = 8  # 6-byte table id + 2-byte flags
    db_len = body[off]
    db = body[off + 1 : off + 1 + db_len].decode("utf-8")
    off += 1 + db_len + 1  # trailing NUL
    tbl_len = body[off]
    tbl = body[off + 1 : off + 1 + tbl_len].decode("utf-8")
    off += 1 + tbl_len + 1
    col_count, off = _lenenc(body, off)
    types = list(body[off : off + col_count])
    off += col_count
    meta_len, off = _lenenc(body, off)
    meta_bytes = body[off : off + meta_len]
    moff = 0
    meta: list[int] = []
    for t in types:
        if t in (T_VARCHAR, T_VAR_STRING):
            meta.append(_u(meta_bytes, moff, 2))
            moff += 2
        elif t == T_STRING:
            # two bytes: (real_type, length) packed per the documented
            # scheme — see _string_meta for the unpack
            meta.append((meta_bytes[moff] << 8) + meta_bytes[moff + 1])
            moff += 2
        elif t == T_NEWDECIMAL:
            meta.append((meta_bytes[moff] << 8) + meta_bytes[moff + 1])
            moff += 2
        elif t == T_BIT:
            bits = meta_bytes[moff] + meta_bytes[moff + 1] * 8
            meta.append(bits)
            moff += 2
        elif t in (T_BLOB, T_GEOMETRY, T_JSON):
            meta.append(meta_bytes[moff])
            moff += 1
        elif t in (T_FLOAT, T_DOUBLE):
            meta.append(meta_bytes[moff])
            moff += 1
        elif t in (T_TIMESTAMP2, T_DATETIME2, T_TIME2):
            meta.append(meta_bytes[moff])  # fractional-second precision
            moff += 1
        else:
            meta.append(0)
    return table_id, _TableMap(db, tbl, types, meta)


def _string_meta(meta: int) -> tuple[int, int]:
    """STRING(254) metadata -> (real_type, max_length). ENUM/SET hide
    their real type in byte0; CHAR(>255 bytes) smuggles high length
    bits into byte0's 0x30 mask (documented binlog quirk)."""
    byte0, byte1 = meta >> 8, meta & 0xFF
    if byte0 in (T_ENUM, T_SET):
        return byte0, byte1
    if (byte0 & 0x30) != 0x30:
        return T_STRING, byte1 + (((byte0 & 0x30) ^ 0x30) << 4)
    return T_STRING, byte1


# ---------------------------------------------------------------------------
# value decode

_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def _decode_newdecimal(data: bytes, off: int, precision: int, scale: int):
    """MySQL packed decimal: groups of 9 digits per 4 big-endian bytes,
    leftover digits per _DIG2BYTES; sign = top bit of the first byte
    (set = positive), negative values stored ones-complemented."""
    intg = precision - scale
    intg0, intg_rem = divmod(intg, 9)
    frac0, frac_rem = divmod(scale, 9)
    nbytes = intg0 * 4 + _DIG2BYTES[intg_rem] + frac0 * 4 + _DIG2BYTES[frac_rem]
    raw = bytearray(data[off : off + nbytes])
    if len(raw) < nbytes:
        raise BinlogFormatError("truncated NEWDECIMAL")
    positive = bool(raw[0] & 0x80)
    raw[0] ^= 0x80
    if not positive:
        for i in range(len(raw)):
            raw[i] ^= 0xFF
    pos = 0
    int_digits = ""
    if intg_rem:
        n = _DIG2BYTES[intg_rem]
        int_digits += str(_be(raw, pos, n))
        pos += n
    for _ in range(intg0):
        int_digits += str(_be(raw, pos, 4)).zfill(9)
        pos += 4
    frac_digits = ""
    for _ in range(frac0):
        frac_digits += str(_be(raw, pos, 4)).zfill(9)
        pos += 4
    if frac_rem:
        n = _DIG2BYTES[frac_rem]
        frac_digits += str(_be(raw, pos, n)).zfill(frac_rem)
        pos += n
    int_digits = int_digits.lstrip("0") or "0"
    out = int_digits + ("." + frac_digits if scale else "")
    if not positive and out.strip("0.") != "":
        out = "-" + out
    return out, off + nbytes


def _frac_bytes(fsp: int) -> int:
    return (fsp + 1) // 2


def _decode_frac(data: bytes, off: int, fsp: int) -> tuple[str, int]:
    n = _frac_bytes(fsp)
    if n == 0:
        return "", off
    micros = _be(data, off, n) * (10 ** (6 - 2 * n))
    return f".{micros:06d}"[: 1 + fsp], off + n


def _decode_value(data: bytes, off: int, ctype: int, meta: int):
    """One column value at `off` -> (python value, next offset)."""
    if ctype == T_TINY:
        return _s(data, off, 1), off + 1
    if ctype == T_SHORT:
        return _s(data, off, 2), off + 2
    if ctype == T_INT24:
        return _s(data, off, 3), off + 3
    if ctype == T_LONG:
        return _s(data, off, 4), off + 4
    if ctype == T_LONGLONG:
        return _s(data, off, 8), off + 8
    if ctype == T_FLOAT:
        return struct.unpack_from("<f", data, off)[0], off + 4
    if ctype == T_DOUBLE:
        return struct.unpack_from("<d", data, off)[0], off + 8
    if ctype == T_YEAR:
        v = data[off]
        return (1900 + v if v else 0), off + 1
    if ctype in (T_VARCHAR, T_VAR_STRING):
        if meta < 256:
            n, off = data[off], off + 1
        else:
            n, off = _u(data, off, 2), off + 2
        return data[off : off + n].decode("utf-8", "replace"), off + n
    if ctype == T_STRING:
        real, maxlen = _string_meta(meta)
        if real == T_ENUM:
            # metadata byte1 IS the storage byte count (1 or 2) for
            # ENUM — an ENUM with > 255 values has byte1 == 2 (ADVICE
            # r8: deriving it from a value-count comparison misread a
            # 2-byte index as 1 byte and misaligned the whole row)
            return _u(data, off, maxlen), off + maxlen
        if real == T_SET:
            return _u(data, off, maxlen), off + maxlen
        if maxlen < 256:
            n, off = data[off], off + 1
        else:
            n, off = _u(data, off, 2), off + 2
        return data[off : off + n].decode("utf-8", "replace"), off + n
    if ctype in (T_BLOB, T_GEOMETRY):
        # TEXT-ONLY assumption at this boundary (documented per ADVICE
        # r8): the JSON envelope stores blob bytes as UTF-8 text, so a
        # non-UTF8 BINARY blob's unmappable bytes become U+FFFD in the
        # stored image. TEXT/JSON-bearing blobs (the reference's
        # replay/flashback payloads) round-trip exactly; true binary
        # payloads need a bytes-preserving envelope (e.g. a base64
        # column codec at the caller, sources/codecs.py) rather than
        # this text image.
        n, off = _u(data, off, meta), off + meta
        return data[off : off + n].decode("utf-8", "replace"), off + n
    if ctype == T_JSON:
        from bingo2sql_spark.sources.codecs import decode_jsonb

        n, off = _u(data, off, meta), off + meta
        return decode_jsonb(bytes(data[off : off + n])), off + n
    if ctype == T_BIT:
        n = (meta + 7) // 8
        return _be(data, off, n), off + n
    if ctype == T_DATE:
        v = _u(data, off, 3)
        y, m, d = v >> 9, (v >> 5) & 0x0F, v & 0x1F
        return f"{y:04d}-{m:02d}-{d:02d}", off + 3
    if ctype == T_DATETIME2:
        intpart = _be(data, off, 5) - 0x8000000000
        off += 5
        ym = (intpart >> 22) & 0x1FFFF
        y, mo = divmod(ym, 13)
        d = (intpart >> 17) & 0x1F
        h = (intpart >> 12) & 0x1F
        mi = (intpart >> 6) & 0x3F
        s = intpart & 0x3F
        frac, off = _decode_frac(data, off, meta)
        return f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}{frac}", off
    if ctype == T_TIMESTAMP2:
        secs = _be(data, off, 4)
        off += 4
        frac, off = _decode_frac(data, off, meta)
        ts = _dt.datetime.fromtimestamp(secs, tz=_dt.timezone.utc)
        return ts.strftime("%Y-%m-%d %H:%M:%S") + frac, off
    if ctype == T_TIME2:
        v = _be(data, off, 3) - 0x800000
        off += 3
        sign = "-" if v < 0 else ""
        v = abs(v)
        h = (v >> 12) & 0x3FF
        mi = (v >> 6) & 0x3F
        s = v & 0x3F
        frac, off = _decode_frac(data, off, meta)
        return f"{sign}{h:02d}:{mi:02d}:{s:02d}{frac}", off
    if ctype == T_NEWDECIMAL:
        return _decode_newdecimal(data, off, meta >> 8, meta & 0xFF)
    # pre-5.6.4 legacy temporals (servers upgraded in place still write
    # them; mysql-bin from 5.1/5.5 masters is full of them)
    if ctype == T_TIMESTAMP:
        secs = _u(data, off, 4)
        ts = _dt.datetime.fromtimestamp(secs, tz=_dt.timezone.utc)
        return ts.strftime("%Y-%m-%d %H:%M:%S"), off + 4
    if ctype == T_DATETIME:
        v = _u(data, off, 8)  # decimal-packed YYYYMMDDHHMMSS
        d, t = divmod(v, 1_000_000)
        y, md = divmod(d, 10_000)
        mo, dd = divmod(md, 100)
        h, ms = divmod(t, 10_000)
        mi, s = divmod(ms, 100)
        return f"{y:04d}-{mo:02d}-{dd:02d} {h:02d}:{mi:02d}:{s:02d}", off + 8
    if ctype == T_TIME:
        v = _s(data, off, 3)  # decimal-packed (H*10000 + M*100 + S), signed
        sign = "-" if v < 0 else ""
        v = abs(v)
        h, ms = divmod(v, 10_000)
        mi, s = divmod(ms, 100)
        return f"{sign}{h:02d}:{mi:02d}:{s:02d}", off + 3
    raise BinlogFormatError(f"unsupported column type {ctype}")


def _bit_set(bitmap: bytes, i: int) -> bool:
    return bool(bitmap[i // 8] & (1 << (i % 8)))


def _decode_image(
    body: bytes, off: int, tm: _TableMap, present: bytes, n_present: int,
    names: list[str],
) -> tuple[dict, int]:
    """One row image: null bitmap over present columns, then values."""
    null_bm = body[off : off + (n_present + 7) // 8]
    off += (n_present + 7) // 8
    row: dict = {}
    j = 0  # index within present columns
    for i in range(tm.col_count):
        if not _bit_set(present, i):
            continue
        name = names[i] if i < len(names) else f"@{i + 1}"
        if _bit_set(null_bm, j):
            row[name] = None
        else:
            row[name], off = _decode_value(body, off, tm.types[i], tm.meta[i])
        j += 1
    return row, off


# ---------------------------------------------------------------------------
# event stream


class BinlogEventParser:
    """Stateful binlog v4 EVENT decoder — feed one whole event
    (header + body) at a time, get envelope rows back. Shared by the
    file scan (parse_binlog_bytes slices a file into events) and the
    replication-protocol client (repl_client feeds each network packet's
    event payload), exactly the split the reference's tailer library
    has between its file and syncer front-ends.

    State carried across events: checksum algorithm (from the FDE),
    table-id -> TABLE_MAP cache, current GTID pair, current thread id
    (from the transaction's BEGIN Query event), and the current log
    file name/ordinal (updated by ROTATE events on the network path).

    seq is `(file_ordinal << 44) | (event start offset << 12) | row
    index` — globally monotone across a rotated file sequence (binlog
    files are capped at 1 GiB < 2^32 offsets; 4096 rows per event; 2^19
    files); the ordinal defaults to the numeric suffix of the file name
    (mysql-bin.000007 -> 7). log_pos is the event START offset,
    mysqlbinlog's "# at N" convention."""

    def __init__(
        self,
        log_file: str = "binlog",
        file_ordinal: int | None = None,
        names_for: dict[str, list[str]] | None = None,
        schema_ver: int = 2,
    ):
        self.names_for = {k.lower(): v for k, v in (names_for or {}).items()}
        self.schema_ver = schema_ver
        self.checksummed = False
        self.table_maps: dict[int, _TableMap] = {}
        self.gtid_uuid: str | None = None
        self.gno: int | None = None
        self.thread_id: int | None = None
        self.set_log_file(log_file, file_ordinal)

    @staticmethod
    def _ordinal(log_file: str) -> int:
        digits = "".join(ch for ch in log_file.rsplit(".", 1)[-1] if ch.isdigit())
        return int(digits) if digits else 0

    def set_log_file(self, log_file: str, file_ordinal: int | None = None) -> None:
        self.log_file = log_file
        self.file_ordinal = (
            self._ordinal(log_file) if file_ordinal is None else file_ordinal
        )
        # bit-budget guard (ADVICE r8): seq packs ordinal<<44 into a
        # signed 64-bit long — an ordinal past 2^19-1 would flip the
        # sign / bleed into adjacent fields and silently corrupt global
        # ordering, so refuse loudly instead
        if not 0 <= self.file_ordinal < (1 << 19):
            raise BinlogFormatError(
                f"binlog file ordinal {self.file_ordinal} exceeds the 19-bit "
                f"seq budget (file {log_file!r}); pass an explicit remapped "
                f"file_ordinal"
            )
        self._seq_base = self.file_ordinal << 44

    def feed(self, whole: bytes, start_off: int) -> list[dict]:
        """Decode ONE event (19-byte header + body [+ CRC]) starting at
        file offset `start_off`; returns the envelope rows it implies
        (possibly none — metadata events mutate parser state only)."""
        ts = _u(whole, 0, 4)
        etype = whole[4]
        body = whole[_HEADER_LEN:]
        if self.checksummed and etype != FORMAT_DESCRIPTION_EVENT:
            body = body[:-4]
        ev_ts = _dt.datetime.fromtimestamp(ts, tz=_dt.timezone.utc)
        # bit-budget guard (ADVICE r8): an event offset past 2^32-1
        # (a >4 GiB file: one transaction larger than max_binlog_size)
        # would bleed into the ordinal field of the packed seq
        if start_off >= (1 << 32):
            raise BinlogFormatError(
                f"event offset {start_off} exceeds the 32-bit seq budget "
                f"(file {self.log_file!r} larger than 4 GiB)"
            )

        if etype == FORMAT_DESCRIPTION_EVENT:
            if _u(body, 0, 2) != 4:
                raise BinlogFormatError("only binlog format v4 is supported")
            server_version = body[2:52].split(b"\x00")[0].decode("utf-8", "replace")
            ver = tuple(
                int("".join(ch for ch in part if ch.isdigit()) or 0)
                for part in (server_version.split(".") + ["0", "0"])[:3]
            )
            if ver >= (5, 6, 1):
                # FDE tail: checksum_alg byte, plus the FDE's own 4-byte
                # CRC32 when alg=CRC32. The alg byte's POSITION depends
                # on whether the CRC follows, so disambiguate by
                # verifying the CRC itself (both a 0 alg byte and a CRC
                # byte can read 0).
                tail_crc = _u(whole, len(whole) - 4, 4)
                self.checksummed = (
                    len(whole) > 23
                    and zlib.crc32(bytes(whole[:-4])) == tail_crc
                    and body[-5] == 1
                )
            return []
        if etype == GTID_LOG_EVENT:
            sid = body[1:17]
            self.gtid_uuid = (
                f"{sid[0:4].hex()}-{sid[4:6].hex()}-{sid[6:8].hex()}-"
                f"{sid[8:10].hex()}-{sid[10:16].hex()}"
            )
            self.gno = _u(body, 17, 8)
            return []
        if etype == ANONYMOUS_GTID_EVENT:
            self.gtid_uuid, self.gno = None, None
            return []
        if etype == ROTATE_EVENT:
            # post-header: 8-byte next position, then next file name —
            # the network stream's file switch (file scans never cross
            # files, so this only matters on the tail path)
            next_file = body[8:].decode("utf-8", "replace").rstrip("\x00")
            if next_file:
                self.set_log_file(next_file)
            return []
        if etype == QUERY_EVENT:
            self.thread_id = _u(body, 0, 4)
            db_len = body[8]
            status_len = _u(body, 11, 2)
            off = 13 + status_len
            db = body[off : off + db_len].decode("utf-8", "replace")
            off += db_len + 1
            sql = body[off:].decode("utf-8", "replace")
            stripped = sql.strip().rstrip(";").upper()
            if stripped in ("BEGIN", "COMMIT", "ROLLBACK"):
                return []
            # attribute the DDL to its table so -t/-d gates see it (the
            # reference parses DDL inline for the same reason,
            # core/parser.go:2314-2339); unqualified names inherit the
            # event's default db
            import re as _re

            tbl = ""
            m = _re.match(
                r"(?is)\s*(?:ALTER|CREATE|DROP|TRUNCATE)\s+"
                r"(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+(?:NOT\s+)?EXISTS\s+)?"
                r"([`\"\w$.]+)",
                sql,
            )
            if m:
                name = m.group(1).replace("`", "").replace('"', "")
                if "." in name:
                    db, _, tbl = name.rpartition(".")
                else:
                    tbl = name
            return [{
                "seq": self._seq_base | (start_off << 12),
                "log_file": self.log_file,
                "log_pos": start_off,
                "gtid_uuid": self.gtid_uuid,
                "gno": self.gno,
                "ts": ev_ts,
                "thread_id": self.thread_id,
                "db": db,
                "table": tbl,
                "op": "ddl",
                "before_json": None,
                "after_json": None,
                "changed_cols": None,
                "schema_ver": self.schema_ver,
                "statement": sql,
            }]
        if etype == TABLE_MAP_EVENT:
            table_id, tm = _parse_table_map(body)
            self.table_maps[table_id] = tm
            return []
        if etype in _ROWS_WRITE | _ROWS_UPDATE | _ROWS_DELETE:
            return self._rows_event(etype, body, start_off, ev_ts)
        # XID / PREVIOUS_GTIDS / STOP / heartbeats: positional or txn
        # metadata with no envelope row (the gtid pair persists until
        # the next GTID event, matching server behavior)
        return []

    def _rows_event(self, etype, body, start_off, ev_ts) -> list[dict]:
        table_id = _u(body, 0, 6)
        off = 8  # table id + flags
        if etype in _ROWS_V2:
            extra_len = _u(body, off, 2)
            off += extra_len  # includes its own two bytes
        tm = self.table_maps.get(table_id)
        if tm is None:
            raise BinlogFormatError(
                f"rows event at {start_off} references unknown table id "
                f"{table_id} (no preceding TABLE_MAP_EVENT)"
            )
        width, off = _lenenc(body, off)
        bm_len = (width + 7) // 8
        present1 = body[off : off + bm_len]
        off += bm_len
        present2 = present1
        if etype in _ROWS_UPDATE:
            present2 = body[off : off + bm_len]
            off += bm_len
        n1 = sum(_bit_set(present1, i) for i in range(width))
        n2 = sum(_bit_set(present2, i) for i in range(width))
        names = (
            self.names_for.get(f"{tm.db}.{tm.table}".lower())
            or self.names_for.get(tm.table.lower())  # unqualified registry key
            or [f"@{i + 1}" for i in range(tm.col_count)]
        )
        op = (
            "insert" if etype in _ROWS_WRITE
            else "delete" if etype in _ROWS_DELETE
            else "update"
        )
        out: list[dict] = []
        row_idx = 0
        while off < len(body):
            if op == "insert":
                after, off = _decode_image(body, off, tm, present1, n1, names)
                before = None
            elif op == "delete":
                before, off = _decode_image(body, off, tm, present1, n1, names)
                after = None
            else:
                before, off = _decode_image(body, off, tm, present1, n1, names)
                after, off = _decode_image(body, off, tm, present2, n2, names)
            changed = None
            if op == "update" and n2 < width:
                # binlog_row_image=MINIMAL: the after image carries
                # only the changed columns — surface the mask the
                # MINIMAL merge path consumes
                changed = [
                    names[i] if i < len(names) else f"@{i + 1}"
                    for i in range(width)
                    if _bit_set(present2, i)
                ]
            if row_idx >= (1 << 12):
                # the encoder caps rows-events at 4095 rows, but a
                # server with a raised binlog_row_event_max_size can
                # exceed it — refuse instead of bleeding into the
                # offset field of the packed seq (ADVICE r8)
                raise BinlogFormatError(
                    f"rows event at offset {start_off} carries >= 4096 rows "
                    f"— exceeds the 12-bit row-index seq budget"
                )
            out.append({
                # one seq per ROW: rows of a multi-row event order by
                # their index after the event's start offset
                "seq": self._seq_base | (start_off << 12) | row_idx,
                "log_file": self.log_file,
                "log_pos": start_off,
                "gtid_uuid": self.gtid_uuid,
                "gno": self.gno,
                "ts": ev_ts,
                "thread_id": self.thread_id,
                "db": tm.db,
                "table": tm.table,
                "op": op,
                "before_json": json.dumps(before) if before is not None else None,
                "after_json": json.dumps(after) if after is not None else None,
                "changed_cols": changed,
                "schema_ver": self.schema_ver,
                "statement": None,
            })
            row_idx += 1
        if off != len(body):
            # a row decode that overshoots the body means truncated or
            # corrupt values — surface it instead of emitting garbage
            # rows (the reference hard-fails on unparseable events too)
            raise BinlogFormatError(
                f"rows event at {start_off}: row decode overran the event "
                f"body ({off} > {len(body)})"
            )
        return out


def parse_binlog_bytes(
    data: bytes,
    *,
    log_file: str = "binlog",
    file_ordinal: int | None = None,
    names_for: dict[str, list[str]] | None = None,
    schema_ver: int = 2,
) -> Iterator[dict]:
    """Parse one binlog FILE's bytes into raw-event envelope dicts
    (RAW_EVENT columns + `statement`, images as JSON strings): slice
    the stream into events and feed BinlogEventParser."""
    if data[:4] != BINLOG_MAGIC:
        raise BinlogFormatError("bad binlog magic (not a binlog v4 file)")
    p = BinlogEventParser(
        log_file, file_ordinal, names_for, schema_ver
    )
    pos = 4
    total = len(data)
    while pos + _HEADER_LEN <= total:
        event_size = _u(data, pos + 9, 4)
        if event_size < _HEADER_LEN or pos + event_size > total:
            raise BinlogFormatError(
                f"truncated event at offset {pos} (size {event_size})"
            )
        yield from p.feed(data[pos : pos + event_size], pos)
        pos += event_size


# ---------------------------------------------------------------------------
# Spark reader


def decode_binlog_df(
    binary_df,
    table_schemas: dict[str, list[str]] | None = None,
    schema_ver: int = 2,
):
    """(path, content) rows -> RAW_EVENT envelope (+ statement) via one
    Arrow-batched mapInPandas pass. Works on both a batch `binaryFile`
    scan and a `readStream.format("binaryFile")` micro-batch (the
    streaming tail over a rotating binlog directory — S1's shape)."""
    import pandas as pd
    from pyspark.sql import types as T

    from bingo2sql_spark import schema as S

    out_schema = T.StructType(
        S.RAW_EVENT.fields + [T.StructField("statement", T.StringType(), True)]
    )
    names_for = {k.lower(): v for k, v in (table_schemas or {}).items()}

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                fname = str(r["path"]).rsplit("/", 1)[-1]
                rows.extend(
                    parse_binlog_bytes(
                        bytes(r["content"]),
                        log_file=fname,
                        names_for=names_for,
                        schema_ver=schema_ver,
                    )
                )
            if rows:
                yield pd.DataFrame(rows)

    return binary_df.select("path", "content").mapInPandas(gen, schema=out_schema)


def payload_schema_from(
    table_schemas: dict[str, list[str]] | None,
):
    """Union image struct for decode_events(payload=...): every column
    name any registered table declares, as string fields (the engine's
    stored representation is text; JSON numbers land as their raw
    token). None when no registry was given — the caller falls back to
    the demo registry schema."""
    if not table_schemas:
        return None
    from pyspark.sql import types as T

    seen: set[str] = set()
    fields = []
    for cols in table_schemas.values():
        for c in cols:
            if c.lower() not in seen:
                seen.add(c.lower())
                fields.append(T.StructField(c, T.StringType()))
    return T.StructType(fields)


def binlog_raw_events(
    spark,
    path: str,
    table_schemas: dict[str, list[str]] | None = None,
    schema_ver: int = 2,
):
    """Distributed binlog-file decode: `binaryFile` scan ->
    decode_binlog_df. Each file decodes in one task (files are the
    rotation-bounded unit of parallelism); no shuffle. Feed the result
    to decode_events(...) exactly like the JSONL landing."""
    raw = spark.read.format("binaryFile").load(path)
    return decode_binlog_df(raw, table_schemas, schema_ver)


# ---------------------------------------------------------------------------
# deterministic encoder (fixture/bench synthesis — no mysqld in the box)


def _header(ts: int, etype: int, body_len: int, next_pos: int) -> bytes:
    return struct.pack("<IBIIIH", ts, etype, 1, _HEADER_LEN + body_len, next_pos, 0)


class BinlogWriter:
    """Assemble real-format binlog v4 bytes (optionally CRC32
    checksummed): FDE, GTID, BEGIN/COMMIT query events, TABLE_MAP +
    WRITE/UPDATE/DELETE_ROWS v2, DDL query events. Supports the types
    the decoder supports; used by tests, the oracle round-trip query,
    and bench."""

    def __init__(self, *, checksum: bool = True, server_version: str = "8.0.36"):
        self.checksum = checksum
        self.buf = bytearray(BINLOG_MAGIC)
        self._table_ids: dict[str, int] = {}
        self._emit_fde(server_version)

    def _append(self, ts: int, etype: int, body: bytes) -> None:
        tail = 4 if (self.checksum and etype != FORMAT_DESCRIPTION_EVENT) else 0
        size = _HEADER_LEN + len(body) + tail
        next_pos = len(self.buf) + size
        ev = bytearray(_header(ts, etype, len(body) + tail, next_pos))
        ev += body
        if tail:
            ev += struct.pack("<I", zlib.crc32(bytes(ev)))
        self.buf += ev

    def _emit_fde(self, server_version: str) -> None:
        post_lens = bytes([0] * 40)
        body = (
            struct.pack("<H", 4)
            + server_version.encode().ljust(50, b"\x00")
            + struct.pack("<I", 0)
            + bytes([_HEADER_LEN])
            + post_lens
        )
        if self.checksum:
            body += bytes([1])  # checksum_alg = CRC32
            # FDE carries its own CRC when checksummed
            ev = bytearray(
                _header(0, FORMAT_DESCRIPTION_EVENT, len(body) + 4,
                        len(self.buf) + _HEADER_LEN + len(body) + 4)
            )
            ev += body
            ev += struct.pack("<I", zlib.crc32(bytes(ev)))
            self.buf += ev
        else:
            body += bytes([0])
            self._append(0, FORMAT_DESCRIPTION_EVENT, body)

    def gtid(self, uuid_hex32: str, gno: int, ts: int = 0) -> None:
        sid = bytes.fromhex(uuid_hex32.replace("-", ""))
        body = bytes([1]) + sid + struct.pack("<Q", gno)
        self._append(ts, GTID_LOG_EVENT, body)

    def query(self, sql: str, db: str = "", thread_id: int = 1, ts: int = 0) -> None:
        dbb = db.encode()
        body = (
            struct.pack("<IIBHH", thread_id, 0, len(dbb), 0, 0)
            + dbb
            + b"\x00"
            + sql.encode()
        )
        self._append(ts, QUERY_EVENT, body)

    def table_map(
        self, db: str, table: str, types: list[int], meta: list[int], ts: int = 0
    ) -> int:
        key = f"{db}.{table}"
        tid = self._table_ids.setdefault(key, 100 + len(self._table_ids))
        dbb, tbb = db.encode(), table.encode()
        meta_bytes = bytearray()
        for t, m in zip(types, meta):
            if t in (T_VARCHAR, T_VAR_STRING):
                meta_bytes += struct.pack("<H", m)
            elif t in (T_STRING, T_NEWDECIMAL):
                meta_bytes += bytes([m >> 8, m & 0xFF])
            elif t == T_BIT:
                meta_bytes += bytes([m % 8, m // 8])
            elif t in (T_BLOB, T_GEOMETRY, T_JSON, T_FLOAT, T_DOUBLE,
                       T_TIMESTAMP2, T_DATETIME2, T_TIME2):
                meta_bytes += bytes([m])
        n = len(types)
        # 6-byte table id, then 2-byte flags
        body = tid.to_bytes(6, "little") + struct.pack("<H", 1)
        body += bytes([len(dbb)]) + dbb + b"\x00"
        body += bytes([len(tbb)]) + tbb + b"\x00"
        body += self._lenenc(n) + bytes(types)
        body += self._lenenc(len(meta_bytes)) + bytes(meta_bytes)
        body += bytes((n + 7) // 8)  # nullability bitmap (all NOT NULL ok)
        self._append(ts, TABLE_MAP_EVENT, body)
        return tid

    @staticmethod
    def _lenenc(v: int) -> bytes:
        if v < 0xFB:
            return bytes([v])
        if v < 1 << 16:
            return b"\xfc" + struct.pack("<H", v)
        if v < 1 << 24:
            return b"\xfd" + v.to_bytes(3, "little")
        return b"\xfe" + struct.pack("<Q", v)

    @staticmethod
    def _encode_value(v, ctype: int, meta: int) -> bytes:
        if v is None:
            raise ValueError("NULLs are encoded in the null bitmap")
        if ctype == T_TINY:
            return struct.pack("<b", v)
        if ctype == T_SHORT:
            return struct.pack("<h", v)
        if ctype == T_INT24:
            return int(v).to_bytes(3, "little", signed=True)
        if ctype == T_LONG:
            return struct.pack("<i", v)
        if ctype == T_LONGLONG:
            return struct.pack("<q", v)
        if ctype == T_FLOAT:
            return struct.pack("<f", v)
        if ctype == T_DOUBLE:
            return struct.pack("<d", v)
        if ctype == T_YEAR:
            return bytes([0 if not v else v - 1900])
        if ctype in (T_VARCHAR, T_VAR_STRING):
            b = str(v).encode()
            if meta < 256:
                return bytes([len(b)]) + b
            return struct.pack("<H", len(b)) + b
        if ctype == T_BLOB:
            b = v if isinstance(v, bytes) else str(v).encode()
            return len(b).to_bytes(meta, "little") + b
        if ctype == T_STRING:
            real, maxlen = _string_meta(meta)
            if real in (T_ENUM, T_SET):
                # maxlen is the storage byte count; the value is the
                # enum index / set bitmask
                return int(v).to_bytes(maxlen, "little")
            b = str(v).encode()
            if maxlen < 256:
                return bytes([len(b)]) + b
            return struct.pack("<H", len(b)) + b
        if ctype == T_DATE:
            y, m, d = (int(x) for x in str(v).split("-"))
            return ((y << 9) | (m << 5) | d).to_bytes(3, "little")
        if ctype == T_DATETIME2:
            datepart, timepart = str(v).split(" ")
            frac = 0
            if "." in timepart:
                timepart, fr = timepart.split(".")
                frac = int(fr.ljust(6, "0")[:6]) // (10 ** (6 - 2 * _frac_bytes(meta)))
            y, mo, d = (int(x) for x in datepart.split("-"))
            h, mi, s = (int(x) for x in timepart.split(":"))
            intpart = (
                ((y * 13 + mo) << 22) | (d << 17) | (h << 12) | (mi << 6) | s
            ) + 0x8000000000
            out = intpart.to_bytes(5, "big")
            n = _frac_bytes(meta)
            if n:
                out += frac.to_bytes(n, "big")
            return out
        if ctype == T_NEWDECIMAL:
            precision, scale = meta >> 8, meta & 0xFF
            s = str(v)
            neg = s.startswith("-")
            s = s.lstrip("-")
            intpart, _, fracpart = s.partition(".")
            fracpart = fracpart.ljust(scale, "0")[:scale]
            intpart = intpart.zfill(precision - scale)[-(precision - scale):] if precision > scale else ""
            intg = precision - scale
            intg0, intg_rem = divmod(intg, 9)
            frac0, frac_rem = divmod(scale, 9)
            out = bytearray()
            p = 0
            if intg_rem:
                n = _DIG2BYTES[intg_rem]
                out += int(intpart[p : p + intg_rem] or "0").to_bytes(n, "big")
                p += intg_rem
            for _ in range(intg0):
                out += int(intpart[p : p + 9] or "0").to_bytes(4, "big")
                p += 9
            p = 0
            for _ in range(frac0):
                out += int(fracpart[p : p + 9] or "0").to_bytes(4, "big")
                p += 9
            if frac_rem:
                n = _DIG2BYTES[frac_rem]
                out += int(fracpart[p : p + frac_rem] or "0").to_bytes(n, "big")
            if neg:
                for i in range(len(out)):
                    out[i] ^= 0xFF
                out[0] &= 0x7F
            else:
                out[0] |= 0x80
            return bytes(out)
        if ctype == T_TIMESTAMP:
            ts = _dt.datetime.strptime(str(v), "%Y-%m-%d %H:%M:%S").replace(
                tzinfo=_dt.timezone.utc
            )
            return struct.pack("<I", int(ts.timestamp()))
        if ctype == T_DATETIME:
            datepart, timepart = str(v).split(" ")
            y, mo, d = (int(x) for x in datepart.split("-"))
            h, mi, s = (int(x) for x in timepart.split(":"))
            packed = ((y * 10_000 + mo * 100 + d) * 1_000_000
                      + h * 10_000 + mi * 100 + s)
            return struct.pack("<Q", packed)
        if ctype == T_TIME:
            txt = str(v)
            neg = txt.startswith("-")
            h, mi, s = (int(x) for x in txt.lstrip("-").split(":"))
            packed = h * 10_000 + mi * 100 + s
            return (-packed if neg else packed).to_bytes(3, "little", signed=True)
        raise ValueError(f"encoder does not support column type {ctype}")

    def _image(self, row: list, types: list[int], meta: list[int],
               present: list[bool]) -> bytes:
        pres_idx = [i for i, p in enumerate(present) if p]
        null_bm = bytearray((len(pres_idx) + 7) // 8)
        vals = bytearray()
        for j, i in enumerate(pres_idx):
            if row[i] is None:
                null_bm[j // 8] |= 1 << (j % 8)
            else:
                vals += self._encode_value(row[i], types[i], meta[i])
        return bytes(null_bm) + bytes(vals)

    def rows(
        self,
        db: str,
        table: str,
        op: str,
        types: list[int],
        meta: list[int],
        rows: list,
        ts: int = 0,
        present_after: list[bool] | None = None,
    ) -> None:
        """One rows event (v2). `rows`: for insert/delete a list of
        value lists; for update a list of (before, after) pairs.
        `present_after` narrows the update after-image (MINIMAL)."""
        if len(rows) > 4095:
            raise ValueError("cap rows per event at 4095 (seq packing)")
        tid = self._table_ids[f"{db}.{table}"]
        n = len(types)
        etype = {"insert": WRITE_ROWS_EVENT, "update": UPDATE_ROWS_EVENT,
                 "delete": DELETE_ROWS_EVENT}[op]
        present1 = [True] * n
        present2 = present_after if present_after is not None else [True] * n
        def bm(flags):
            b = bytearray((n + 7) // 8)
            for i, f in enumerate(flags):
                if f:
                    b[i // 8] |= 1 << (i % 8)
            return bytes(b)
        body = tid.to_bytes(6, "little") + struct.pack("<H", 0)
        body += struct.pack("<H", 2)  # v2 extra data: just its own length
        body += self._lenenc(n) + bm(present1)
        if op == "update":
            body += bm(present2)
        for r in rows:
            if op == "update":
                before, after = r
                body += self._image(before, types, meta, present1)
                body += self._image(after, types, meta, present2)
            else:
                body += self._image(r, types, meta, present1)
        self._append(ts, etype, body)

    def xid(self, xid: int = 1, ts: int = 0) -> None:
        self._append(ts, XID_EVENT, struct.pack("<Q", xid))

    def bytes(self) -> bytes:
        return bytes(self.buf)

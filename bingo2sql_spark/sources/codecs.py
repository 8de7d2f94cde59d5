"""Per-type value codecs for the Arrow decode path (S2/T7 extension
point).

The reference's go-mysql layer hands it typed Go values which
InterpolateParams then renders (core/parser.go:1736-1874); the exotic
cases are DATETIME/TIMESTAMP with fractional seconds and zero-date
sentinels (core/parser.go:1793-1837, golden expectations
core/parser_test.go:690-725), exact DECIMAL (decimal.Decimal -> exact
string, core/parser.go:1781-1782), ENUM/SET/BIT as ints
(core/parser_test.go:538,662), GEOMETRY as escaped WKB bytes
(core/parser_test.go:664-688), and unsigned reinterpretation
(processValue core/parser.go:1322-1360 — see decode.unsigned_fixup).

Here the landing payload is string-typed (SURVEY §1.2), so a codec is a
VECTORIZED normalizer `pd.Series[str|object] -> pd.Series[str]` applied
inside `decode_events_arrow` per payload column. All codecs are pure
pandas/numpy column ops — never per-row Python in a loop — except where
values are already Python objects (bytes), where a C-level comprehension
is the fastest available form.
"""

from __future__ import annotations

import pandas as pd

def _obj(s: pd.Series) -> pd.Series:
    """Return object dtype with real None (pandas StringDtype yields
    pd.NA, which Arrow/callers must not see)."""
    return s.astype("object").where(s.notna(), None)


#: zero sentinels the reference emits verbatim instead of NULL
ZERO_DATE = "0000-00-00"
ZERO_DATETIME = "0000-00-00 00:00:00"

_TRAIL_ZEROS = r"(\.\d*?)0+$"
_TRAIL_DOT = r"\.$"


def decimal_codec(s: pd.Series) -> pd.Series:
    """Exact DECIMAL normalization: strip redundant trailing fraction
    zeros ('-45363.640000' -> '-45363.64', '5.000' -> '5') with pure
    string ops — the value NEVER visits float, so any precision
    (DECIMAL(65,30)) survives exactly, matching decimal.Decimal.String()
    in the reference (core/parser.go:1781-1782)."""
    out = s.astype("string")
    has_dot = out.str.contains(".", regex=False)
    trimmed = out.str.replace(_TRAIL_ZEROS, r"\1", regex=True).str.replace(
        _TRAIL_DOT, "", regex=True
    )
    return _obj(trimmed.where(has_dot, out))


def datetime_codec(decimals: int = 0):
    """DATETIME/TIMESTAMP(decimals) canonicalizer. Mirrors the golden
    expectations of TestDatetime (core/parser_test.go:690-725):

    - fraction truncated/zero-padded to the column's `decimals`
      ('17:51:04.123456' @ (3) -> '17:51:04.123'; @ (0) -> '17:51:04')
    - zero dates pass through as the zero SENTINEL with the same
      fraction width ('0000-00-00 00:00:00.000' for (3)) — NOT NULL and
      NOT an error, per MySQL sql_mode='' semantics
    - no timezone math: binlog datetimes are wall-clock strings."""

    def codec(s: pd.Series) -> pd.Series:
        out = s.astype("string")
        # split on the fraction dot instead of fixed offsets so that
        # time-only / non-standard layouts truncate correctly instead of
        # producing corrupt output (ADVICE r2: '17:51:04.123456' with a
        # hardcoded offset-20 fraction read)
        parts = out.str.partition(".")
        base, frac = parts[0], parts[2]
        # right-pad a date-only value to full datetime
        dateonly = base.str.fullmatch(r"\d{4}-\d{2}-\d{2}").fillna(False)
        base = base.where(~dateonly, base + " 00:00:00")
        if decimals <= 0:
            return _obj(base)
        frac = frac.str.slice(0, decimals).str.pad(decimals, side="right", fillchar="0")
        return _obj(base + "." + frac)

    return codec


def enum_codec(values: list[str]):
    """ENUM -> 1-based index int string (the reference emits the int,
    core/parser_test.go:538: e ENUM('a','b','c') value 'a' -> 1).
    Values already numeric pass through. A non-numeric value OUTSIDE the
    declared list raises (vocab drift — a new enum member added upstream
    — must be loud, not silently NULLed into the rendered SQL)."""
    mapping = {v: str(i + 1) for i, v in enumerate(values)}

    def codec(s: pd.Series) -> pd.Series:
        out = s.astype("string")
        mapped = out.map(mapping)
        numeric = out.str.fullmatch(r"\d+").fillna(False)
        bad = out.notna() & mapped.isna() & ~numeric
        if bad.any():
            unknown = sorted(set(out[bad]))[:5]
            raise ValueError(
                f"enum_codec: value(s) {unknown!r} not in declared ENUM {values!r} "
                "— schema registry is stale (reference resolves the live DDL, "
                "core/parser.go:1646-1656)"
            )
        return _obj(mapped.where(mapped.notna(), out))

    return codec


def set_codec(values: list[str]):
    """SET -> bitmask int string ('a,c' over ('a','b','c') -> 5,
    core/parser_test.go:662: se SET value -> 3). An unknown member
    raises (vocab drift must be loud, not a silently-dropped bit)."""
    bit = {v: 1 << i for i, v in enumerate(values)}

    def codec(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None or (isinstance(x, float) and pd.isna(x)):
                return None
            if isinstance(x, str) and x.isdigit():
                return x
            total = 0
            for part in str(x).split(","):
                part = part.strip()
                if part:
                    if part not in bit:
                        raise ValueError(
                            f"set_codec: member {part!r} not in declared SET "
                            f"{values!r} — schema registry is stale"
                        )
                    total |= bit[part]
            return str(total)

        return pd.Series([one(x) for x in s.tolist()], index=s.index, dtype="object")

    return codec


def bit_codec(s: pd.Series) -> pd.Series:
    """BIT(n) -> unsigned int string. Accepts b'…' literals, plain
    binary digit strings, or raw bytes (big-endian, the wire form)."""

    def one(x):
        if x is None or (isinstance(x, float) and pd.isna(x)):
            return None
        if isinstance(x, (bytes, bytearray)):
            return str(int.from_bytes(bytes(x), "big"))
        t = str(x)
        if t.startswith(("b'", "B'")) and t.endswith("'"):
            t = t[2:-1]
            return str(int(t, 2) if t else 0)
        if set(t) <= {"0", "1"} and t != "" and len(t) > 1:
            return str(int(t, 2))
        return t

    return pd.Series([one(x) for x in s.tolist()], index=s.index, dtype="object")


def binary_codec(s: pd.Series) -> pd.Series:
    """BLOB/GEOMETRY (WKB) passthrough: bytes become a latin-1-preserved
    string so every byte survives into the payload; the renderer's full
    escape set (\\0, \\Z, \\n, \\r, ', \", \\) then emits exactly the
    reference's escaped-binary literal (core/parser_test.go:664-688)."""

    def one(x):
        if x is None or (isinstance(x, float) and pd.isna(x)):
            return None
        if isinstance(x, (bytes, bytearray)):
            return bytes(x).decode("latin-1")
        return str(x)

    return pd.Series([one(x) for x in s.tolist()], index=s.index, dtype="object")


# --------------------------------------------------------------------------
# MySQL JSONB *binary* decode (the reference's one type-matrix row with no
# engine-side analog until round 3: its tailer library decodes binlog JSONB
# itself; golden outputs TestJson/TestJsonV2 core/parser_test.go:1075-1198).
# Format per the public MySQL json_binary.h documentation: a type byte then
# a type-specific payload; small (2-byte) and large (4-byte) object/array
# headers; inlined small scalars; opaque values for DECIMAL and temporals.
# Canonical text: compact separators, object keys sorted lexicographically,
# non-ASCII \\u-escaped, invalid UTF-8 -> U+FFFD — the same canonical form
# the reference's goldens pin.
# --------------------------------------------------------------------------

_JSONB_SMALL_OBJECT = 0x00
_JSONB_LARGE_OBJECT = 0x01
_JSONB_SMALL_ARRAY = 0x02
_JSONB_LARGE_ARRAY = 0x03
_JSONB_LITERAL = 0x04
_JSONB_INT16 = 0x05
_JSONB_UINT16 = 0x06
_JSONB_INT32 = 0x07
_JSONB_UINT32 = 0x08
_JSONB_INT64 = 0x09
_JSONB_UINT64 = 0x0A
_JSONB_DOUBLE = 0x0B
_JSONB_STRING = 0x0C
_JSONB_OPAQUE = 0x0F

#: MySQL column-type codes seen inside opaque values
_MYSQL_TYPE_NEWDECIMAL = 246
_MYSQL_TYPE_DATE = 10
_MYSQL_TYPE_TIME = 11
_MYSQL_TYPE_DATETIME = 12
_MYSQL_TYPE_TIMESTAMP = 7

_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def _jsonb_varlen(data: bytes, pos: int) -> tuple[int, int]:
    """Variable-length quantity (little-endian base-128)."""
    length, shift = 0, 0
    while True:
        b = data[pos]
        pos += 1
        length |= (b & 0x7F) << shift
        if not b & 0x80:
            return length, pos
        shift += 7


def _bin_decimal(data: bytes) -> str:
    """MySQL binary DECIMAL (decimal2bin layout): 9-digit base-10^9
    groups packed into 1-4 big-endian bytes; sign = high bit of the
    first byte (1 = non-negative); negative values store all bytes
    inverted."""
    precision, scale = data[0], data[1]
    buf = bytearray(data[2:])
    positive = bool(buf[0] & 0x80)
    buf[0] ^= 0x80
    if not positive:
        for i in range(len(buf)):
            buf[i] ^= 0xFF
    intg = precision - scale
    intg0, intg0x = divmod(intg, 9)
    frac0, frac0x = divmod(scale, 9)
    pos = 0

    def take(nbytes: int) -> int:
        nonlocal pos
        v = int.from_bytes(buf[pos : pos + nbytes], "big")
        pos += nbytes
        return v

    int_part = ""
    if intg0x:
        int_part += str(take(_DIG2BYTES[intg0x]))
    for _ in range(intg0):
        int_part += str(take(4)).rjust(9, "0") if int_part else str(take(4))
    int_part = int_part.lstrip("0") or "0"
    frac_part = ""
    for _ in range(frac0):
        frac_part += str(take(4)).rjust(9, "0")
    if frac0x:
        frac_part += str(take(_DIG2BYTES[frac0x])).rjust(frac0x, "0")
    out = int_part + ("." + frac_part if frac_part else "")
    return ("-" if not positive else "") + out


def _packed_temporal(data: bytes, field_type: int) -> str:
    """Packed temporal inside a JSONB opaque (my_time.h packed layout:
    microseconds in the low 24 bits, then second/minute/hour/day/month/
    year fields). DATE/DATETIME/TIMESTAMP render as the full
    'YYYY-MM-DD HH:MM:SS.ffffff' (the reference's goldens render DATE
    with a zero time part); TIME renders 'HH:MM:SS.ffffff'."""
    packed = int.from_bytes(data[:8], "little", signed=True)
    neg = packed < 0
    if neg:
        packed = -packed
    frac = packed & 0xFFFFFF
    v = packed >> 24
    second = v & 0x3F
    minute = (v >> 6) & 0x3F
    hour = (v >> 12) & 0x1F
    if field_type == _MYSQL_TYPE_TIME:
        # TIME hour field is wider (no ymd above it)
        hour = (v >> 12) & 0x3FF
        return f"{'-' if neg else ''}{hour:02d}:{minute:02d}:{second:02d}.{frac:06d}"
    ymd = v >> 17
    day = ymd & 0x1F
    ym = ymd >> 5
    year, month = divmod(ym, 13)
    return (
        f"{year:04d}-{month:02d}-{day:02d} {hour:02d}:{minute:02d}:{second:02d}.{frac:06d}"
    )


class _RawNum:
    __slots__ = ("text",)

    def __init__(self, text: str):
        self.text = text


def _jsonb_value(data: bytes, type_byte: int, pos: int):
    import struct

    if type_byte in (_JSONB_SMALL_OBJECT, _JSONB_LARGE_OBJECT,
                     _JSONB_SMALL_ARRAY, _JSONB_LARGE_ARRAY):
        large = type_byte in (_JSONB_LARGE_OBJECT, _JSONB_LARGE_ARRAY)
        is_obj = type_byte in (_JSONB_SMALL_OBJECT, _JSONB_LARGE_OBJECT)
        w = 4 if large else 2
        base = pos
        count = int.from_bytes(data[pos : pos + w], "little")
        pos += 2 * w  # skip count + total-size
        keys = []
        if is_obj:
            for _ in range(count):
                koff = int.from_bytes(data[pos : pos + w], "little")
                klen = int.from_bytes(data[pos + w : pos + w + 2], "little")
                keys.append(
                    data[base + koff : base + koff + klen].decode("utf-8", "replace")
                )
                pos += w + 2
        vals = []
        inline_ok = (_JSONB_LITERAL, _JSONB_INT16, _JSONB_UINT16) + (
            (_JSONB_INT32, _JSONB_UINT32) if large else ()
        )
        for _ in range(count):
            # value-entry = type byte + (inlined value | offset); the
            # offset points at the PAYLOAD (type lives in the entry)
            vt = data[pos]
            if vt in inline_ok:
                vals.append(_jsonb_value(data, vt, pos + 1))
            else:
                voff = int.from_bytes(data[pos + 1 : pos + 1 + w], "little")
                vals.append(_jsonb_value(data, vt, base + voff))
            pos += 1 + w
        return dict(zip(keys, vals)) if is_obj else vals
    if type_byte == _JSONB_LITERAL:
        return {0x00: None, 0x01: True, 0x02: False}[data[pos]]
    if type_byte == _JSONB_INT16:
        return int.from_bytes(data[pos : pos + 2], "little", signed=True)
    if type_byte == _JSONB_UINT16:
        return int.from_bytes(data[pos : pos + 2], "little")
    if type_byte == _JSONB_INT32:
        return int.from_bytes(data[pos : pos + 4], "little", signed=True)
    if type_byte == _JSONB_UINT32:
        return int.from_bytes(data[pos : pos + 4], "little")
    if type_byte == _JSONB_INT64:
        return int.from_bytes(data[pos : pos + 8], "little", signed=True)
    if type_byte == _JSONB_UINT64:
        return int.from_bytes(data[pos : pos + 8], "little")
    if type_byte == _JSONB_DOUBLE:
        return struct.unpack("<d", data[pos : pos + 8])[0]
    if type_byte == _JSONB_STRING:
        length, pos = _jsonb_varlen(data, pos)
        return data[pos : pos + length].decode("utf-8", "replace")
    if type_byte == _JSONB_OPAQUE:
        field_type = data[pos]
        length, pos = _jsonb_varlen(data, pos + 1)
        payload = data[pos : pos + length]
        if field_type == _MYSQL_TYPE_NEWDECIMAL:
            return _RawNum(_bin_decimal(payload))
        if field_type in (_MYSQL_TYPE_DATE, _MYSQL_TYPE_DATETIME,
                          _MYSQL_TYPE_TIMESTAMP, _MYSQL_TYPE_TIME):
            return _packed_temporal(payload, field_type)
        # unknown opaque: surface as a (lossy-marked) string, loudly typed
        return payload.decode("utf-8", "replace")
    raise ValueError(f"jsonb: unknown type byte 0x{type_byte:02x}")


def _fmt_double(x: float) -> str:
    """Go-style shortest double: plain notation for the JSON-typical
    magnitude range (the reference emits 18446744073709552000, not
    1.8446744073709552e+19)."""
    r = repr(x)
    if ("e" in r or "E" in r) and 1e-6 <= abs(x) < 1e21:
        from decimal import Decimal

        r = format(Decimal(r), "f")
    return r


def _jsonb_render(v) -> str:
    import json as _json

    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, _RawNum):
        return v.text
    if isinstance(v, bool):  # pragma: no cover - handled above
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return _fmt_double(v)
    if isinstance(v, str):
        return _json.dumps(v, ensure_ascii=True)
    if isinstance(v, list):
        return "[" + ",".join(_jsonb_render(x) for x in v) + "]"
    if isinstance(v, dict):
        import json as _j

        return (
            "{"
            + ",".join(
                _j.dumps(k, ensure_ascii=True) + ":" + _jsonb_render(v[k])
                for k in sorted(v)
            )
            + "}"
        )
    raise TypeError(f"jsonb render: {type(v)}")


def decode_jsonb(data: bytes | None) -> str | None:
    """One MySQL binlog JSONB value -> canonical JSON text (keys sorted,
    compact, ASCII-escaped). Empty/None -> None (MySQL's NULL JSON)."""
    if data is None or len(data) == 0:
        return None
    return _jsonb_render(_jsonb_value(bytes(data), data[0], 1))


def jsonb_codec(s: pd.Series) -> pd.Series:
    """JSONB binary column codec: raw binlog bytes (or latin-1-preserved
    strings from binary_codec upstream) -> canonical JSON text. Values
    are Python bytes objects, so like bit/binary_codec this is a
    C-level comprehension over the opt-in Arrow codec path, never the
    relational hot path."""

    def one(x):
        if x is None or (isinstance(x, float) and pd.isna(x)):
            return None
        if isinstance(x, str):
            x = x.encode("latin-1")
        return decode_jsonb(x)

    return pd.Series([one(x) for x in s.tolist()], index=s.index, dtype="object")


def json_codec(s: pd.Series) -> pd.Series:
    """JSON column passthrough with validation: the binlog tailer hands
    JSON v1/v2 binary already textified (the reference relies on
    go-mysql's JSONB decoder the same way, core/parser_test.go:1075-
    1198); values that parse are kept verbatim, so round-tripping is
    byte-exact."""
    import json as _json

    def one(x):
        if x is None or (isinstance(x, float) and pd.isna(x)):
            return None
        _json.loads(x)  # raise on corrupt payloads rather than emit bad SQL
        return x

    return pd.Series([one(x) for x in s.tolist()], index=s.index, dtype="object")

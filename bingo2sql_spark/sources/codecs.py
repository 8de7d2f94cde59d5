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
        base = out.str.slice(0, 19)
        # right-pad a date-only value to full datetime
        short = base.str.len() < 19
        base = base.where(~short, (base + " 00:00:00").str.slice(0, 19))
        if decimals <= 0:
            return _obj(base)
        frac = out.str.slice(20, 20 + decimals)
        frac = frac.str.pad(decimals, side="right", fillchar="0")
        return _obj(base + "." + frac)

    return codec


def enum_codec(values: list[str]):
    """ENUM -> 1-based index int string (the reference emits the int,
    core/parser_test.go:538: e ENUM('a','b','c') value 'a' -> 1).
    Values already numeric pass through."""
    mapping = {v: str(i + 1) for i, v in enumerate(values)}

    def codec(s: pd.Series) -> pd.Series:
        out = s.astype("string")
        mapped = out.map(mapping)
        numeric = out.str.fullmatch(r"\d+")
        return _obj(mapped.where(~(numeric & mapped.isna()), out))

    return codec


def set_codec(values: list[str]):
    """SET -> bitmask int string ('a,c' over ('a','b','c') -> 5,
    core/parser_test.go:662: se SET value -> 3)."""
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
                    total |= bit.get(part, 0)
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

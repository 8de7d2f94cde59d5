"""Golden codec tests mirroring the reference's type expectations:
TestDatetime (core/parser_test.go:690-725), decimal exactness
(core/parser.go:1781-1782), ENUM/SET/BIT ints (core/parser_test.go:
538,662), GEOMETRY WKB escaped bytes (core/parser_test.go:664-688)."""

from __future__ import annotations

import pandas as pd

from bingo2sql_spark.sources import codecs as C


def _s(*vals):
    return pd.Series(list(vals), dtype="object")


def test_datetime_codec_golden():
    """Exact TestDatetime expectations for precisions 0 / 3 / 6,
    including zero dates and the '.000456' sub-millisecond case."""
    raw = _s(
        "2014-09-08 17:51:04.123456",
        "0000-00-00 00:00:00.000000",
        "2014-09-08 17:51:04.000456",
        None,
    )
    assert list(C.datetime_codec(0)(raw)) == [
        "2014-09-08 17:51:04",
        "0000-00-00 00:00:00",
        "2014-09-08 17:51:04",
        None,
    ]
    assert list(C.datetime_codec(3)(raw)) == [
        "2014-09-08 17:51:04.123",
        "0000-00-00 00:00:00.000",
        "2014-09-08 17:51:04.000",
        None,
    ]
    assert list(C.datetime_codec(6)(raw)) == [
        "2014-09-08 17:51:04.123456",
        "0000-00-00 00:00:00.000000",
        "2014-09-08 17:51:04.000456",
        None,
    ]
    # short fractions are right-padded; date-only values gain midnight
    assert list(C.datetime_codec(6)(_s("2012-05-07 14:01:01.5"))) == [
        "2012-05-07 14:01:01.500000"
    ]
    assert list(C.datetime_codec(0)(_s("2012-05-07"))) == ["2012-05-07 00:00:00"]


def test_decimal_codec_exact():
    """No float round-trip: DECIMAL(65,30)-scale values survive exactly;
    trailing fraction zeros are stripped like decimal.Decimal.String()."""
    raw = _s(
        "-45363.640000",
        "5.000",
        "100",
        "0.000000000000000000000000000001",
        "123456789012345678901234567890.500",  # far beyond float53
        None,
    )
    assert list(C.decimal_codec(raw)) == [
        "-45363.64",
        "5",
        "100",
        "0.000000000000000000000000000001",
        "123456789012345678901234567890.5",
        None,
    ]


def test_enum_set_bit_codecs():
    e = C.enum_codec(["a", "b", "c"])
    assert list(e(_s("a", "c", "2", None))) == ["1", "3", "2", None]
    s = C.set_codec(["a", "b", "c"])
    assert list(s(_s("a,b", "a,c", "3", "", None))) == ["3", "5", "3", "0", None]
    assert list(C.bit_codec(_s("b'101'", "101", b"\x01\x00", "7", None))) == [
        "5", "5", "256", "7", None,
    ]


def test_binary_codec_roundtrip_and_escape(spark):
    """WKB-style bytes survive into the payload and render as the
    reference's escaped binary literal (NUL -> \\0 etc.)."""
    wkb = b"\x00\x00\x00\x00\x01\x01\x00\x1a\xf0?"
    out = C.binary_codec(_s(wkb, None))
    assert out[0] == wkb.decode("latin-1") and out[1] is None
    from pyspark.sql import functions as F

    from bingo2sql_spark.functions.render import sql_literal

    lit = (
        spark.createDataFrame([(out[0],)], "v string")
        .select(sql_literal(F.col("v")).alias("l"))
        .collect()[0]["l"]
    )
    assert lit.startswith("'\\0\\0\\0\\0\x01\x01\\0\x1a".replace("\x1a", "\\Z"))
    assert "\x00" not in lit


def test_json_codec_validates():
    ok = C.json_codec(_s('{"a": 1}', "[1,2]", None))
    assert list(ok) == ['{"a": 1}', "[1,2]", None]
    try:
        C.json_codec(_s("{not json"))
        raise AssertionError("expected parse failure")
    except Exception:
        pass


def test_decode_arrow_with_codecs_end_to_end(spark):
    """column_codecs normalize both images inside decode_events_arrow;
    without codecs the decode output is unchanged (differential covered
    by test_decode_jvm_equals_arrow_equals_original)."""
    from bingo2sql_spark.sources.decode import decode_events_arrow
    from bingo2sql_spark.sources.synth import generate_events, to_raw

    raw = to_raw(generate_events(spark, n_keys=20, versions_per_key=4))
    dec = decode_events_arrow(
        raw, column_codecs={"commit": C.decimal_codec, "lang": C.enum_codec(["go", "py"])}
    )
    rows = dec.filter("after is not null").select("after.lang").limit(50).collect()
    assert all(r["lang"] is None or not r["lang"].isalpha() or r["lang"] not in ("go", "py")
               for r in rows)
    # go/py became "1"/"2"; other langs pass through
    assert any(r["lang"] in ("1", "2") for r in rows)

"""Driver-mimic: run every __spark_entry__ query on Spark AND its
oracle SQL on DuckDB over the same parquet, compare row multisets
(columns sorted by name) — exactly the CORRECTNESS gate's comparison."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return float(v)
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return None if math.isnan(float(v)) else float(v)
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.bool_):
            return bool(v)
    except ImportError:
        pass
    return v


def _rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_norm(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(out, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


ALL = sorted(entrymod.queries().keys()) + sorted(entrymod.pytest_only_queries().keys())


def test_driver_gate_set_fits_cap():
    """VERDICT r5 #1: the driver records at most 50 CORRECTNESS rows;
    every queries() entry must land one, so the dict must not exceed
    50 (and every entry has an oracle)."""
    qs = entrymod.queries()
    assert len(qs) <= 50, f"{len(qs)} queries overflow the driver's 50-row cap"
    missing = sorted(set(qs) - set(entrymod.oracle_sql()))
    assert not missing, f"gate queries without oracles: {missing}"


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    qs = {**entrymod.queries(), **entrymod.pytest_only_queries()}
    oracles = {**entrymod.oracle_sql(), **entrymod.pytest_only_oracle_sql()}
    sdf = qs[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(sdf) >= 0  # rows-only check
        return
    odf = duck.execute(oracles[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    srows, orows = _rows(sdf), _rows(odf)
    mism = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
    assert not mism, f"{name}: first mismatch at {mism[0]}:\nspark={srows[mism[0]]}\noracle={orows[mism[0]]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"repo", "path", "commit", "lang", "content_sha"}

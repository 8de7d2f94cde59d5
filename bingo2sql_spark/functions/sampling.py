"""Deterministic sampling for training-data mixes.

`df.sample()` couples the kept set to RNG state and partitioning — a
repartition or a re-run changes WHICH rows survive, which poisons
dataset reproducibility and incremental rebuilds. These samplers hash a
stable key instead: a row is kept iff the first 8 hex chars of
md5(salt || key) fall below the fraction threshold. Same rows survive
on any cluster layout, any engine (the oracle reproduces the predicate
verbatim in SQL), and appending data never flips earlier decisions —
the property a 100 TB corpus rebuild actually needs.

All pure Column expressions (whole-stage codegen, no shuffle, pushdown-
friendly: the predicate sits right above the scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 8  # first 8 md5 hex chars as a uniform draw in [0, 16^8)


def threshold_hex(fraction: float) -> str:
    """The cutoff for a keep-fraction under lexicographic compare of
    8-char lowercase hex (== numeric compare at equal length).
    fraction>=1 returns 'g' — one byte above every hex digit, so ALL
    draws pass (a 9-char '100000000' would compare by first byte and
    wrongly drop almost everything)."""
    f = min(max(float(fraction), 0.0), 1.0)
    if f >= 1.0:
        return "g"
    return format(int(f * _HEX_SPAN), "08x")


def _draw(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string"))), 1, 8)


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "mix"
) -> DataFrame:
    """Keep ~fraction of rows, decided by the row's key alone."""
    return df.filter(_draw(F.col(id_col), salt) < F.lit(threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "mix",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum keep-fractions (the training-mix primitive: 'keep all
    code, 10% of web, 50% of books'). Strata absent from `fractions`
    get `default_fraction`."""
    cut = F.lit(threshold_hex(default_fraction))
    for value, frac in fractions.items():
        cut = F.when(F.col(strata_col) == value, F.lit(threshold_hex(frac))).otherwise(cut)
    return df.filter(_draw(F.col(id_col), salt) < cut)

"""A1-A4 — stats mode (bingo2sql `stats` subcommand, cmd/stats.go:30-54).

The reference accumulates per-table insert/update/delete counts in a map
while scanning (core/parser_stats.go:549-632); here it is one groupBy
with conditional aggregation (map-side partial agg, single shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_stats(events: DataFrame) -> DataFrame:
    """Per-(db, table) DML counts + event-time span, ordered ascending
    by total like the reference (core/parser_stats.go:39-43).

    Conditional sums instead of pivot so output column names are fixed
    (oracle-friendly) and a single aggregate suffices."""
    return (
        events.groupBy("db", "table")
        .agg(
            F.sum(F.when(F.col("op") == "insert", 1).otherwise(0)).alias("inserts"),
            F.sum(F.when(F.col("op") == "update", 1).otherwise(0)).alias("updates"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("deletes"),
            F.count("*").alias("total"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("total", "db", "table")
    )


def progress_percent(processed_rows: int, total_rows: int) -> int:
    """A3 — rows-based progress percent (Percent()
    core/parser.go:2424-2457): 0..99 while running (the reference caps
    at 99 until Archive sends 100)."""
    if total_rows <= 0:
        return 0
    pct = int(processed_rows * 100 / total_rows)
    return max(0, min(pct, 99))


def compute_percent(sizes: list[int], current_file_idx: int, current_pos: int) -> float:
    """A3 — byte-based progress across a binlog file list, piecewise per
    file (ComputePercent core/parser.go:2498-2567; unit test
    TestComputePercent core/parser_test.go:1232-1308): fraction of total
    bytes consumed when the scanner is at (file idx, byte pos)."""
    total = sum(sizes)
    if total <= 0:
        return 0.0
    done = sum(sizes[:current_file_idx]) + min(current_pos, sizes[current_file_idx] if current_file_idx < len(sizes) else 0)
    return min(100.0, round(done * 100.0 / total, 2))


def corpus_stats_by_source(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source (per-domain) corpus health report — the first table a
    training-data pipeline owner reads: doc counts, exact-duplicate
    share (corpus-wide digests, attributed to each source), mean
    quality, and EXACT token-count percentiles (p50/p90, linear
    interpolation — identical definition to ANSI percentile_cont, so
    the oracle mirrors it bit-for-bit after rounding).

    Scale shape: two aggregations (per-digest counts map-side combined,
    then per-source rollup) + one broadcast-size join of the digest
    counts back; exact percentiles group per source — sources are the
    partition key, so state is bounded per group and skewless given a
    sane source cardinality (use approx_percentile beyond ~10^5 rows
    per source if memory bounds bite)."""
    from bingo2sql_spark.functions import text as TX

    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("_digest"),
        TX.token_count(F.col(text_col)).alias("_n_tokens"),
        # quality is 4dp-rounded; scale to an exact integer BEFORE the
        # mean so the sum is order-independent — a double sum's last
        # ulp depends on partition order and flips the 4dp rounding of
        # the mean between engines (found at sf0.01)
        F.round(TX.quality_score(F.col(text_col)) * 10000, 0)
        .cast("long")
        .alias("_q10k"),
    )
    # corpus-wide copy count via a window over the digest instead of a
    # groupBy + self-join: `base` (md5 + tokenization + quality HOFs,
    # the expensive projection) is then computed ONCE — the self-join
    # shape re-ran it on both sides — and the digest exchange replaces
    # the join's two exchanges
    from pyspark.sql import Window

    j = base.withColumn(
        "_copies", F.count("*").over(Window.partitionBy("_digest"))
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("_copies") >= 2, 1).otherwise(0)).alias("dup_docs"),
            F.round(
                F.sum("_q10k") / (10000.0 * F.count("*")), 4
            ).alias("avg_quality"),
            F.round(F.percentile(F.col("_n_tokens"), F.lit(0.5)), 2).alias("p50_tokens"),
            F.round(F.percentile(F.col("_n_tokens"), F.lit(0.9)), 2).alias("p90_tokens"),
        )
        .orderBy("source")
    )

"""T4/T5 — flashback (rollback) inversion as pure column ops.

Reference semantics (dispatch core/parser.go:2352-2380):
  WRITE(insert)  -> DELETE   (generateDeleteSQL on the new image)
  DELETE         -> INSERT   (generateInsertSQL on the old image)
  UPDATE         -> inverse UPDATE: SET <old values> WHERE <new key>
                   (generateUpdateRollbackSQL core/parser.go:1499-1623)
and the emitted statements must be applied in REVERSE binlog order
(tests reverse the file: core/parser_test.go:806-811).

Spark-first: this is an op remap + before/after image swap + descending
sort key — zero UDFs. T5 (update rollback) falls out of the swap: after
swapping, the normal UPDATE generator/applier produces the rollback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bingo2sql_spark import schema as S


def invert(events: DataFrame, rebase_offset: int | None = None) -> DataFrame:
    """Remap ops and swap row images; DDL is never emitted in flashback
    mode (core/parser.go:2327 gate).

    seq mapping: seq' = rebase_offset - seq (or -seq when no offset), so
    *ascending* seq' equals reverse binlog order — downstream LWW/apply
    stages need no flashback-awareness.

    rebase_offset models what actually happens when rollback SQL is
    executed against the source: it becomes NEW log traffic at positions
    past the current head. pipeline.replay passes
    head_seq + max(batch seq) + 1 so the inverted events (a) stay
    reverse-ordered among themselves and (b) supersede every event the
    target has already absorbed under LWW-by-seq merge."""
    inv_op = (
        F.when(F.col("op") == S.OP_INSERT, F.lit(S.OP_DELETE))
        .when(F.col("op") == S.OP_DELETE, F.lit(S.OP_INSERT))
        .otherwise(F.lit(S.OP_UPDATE))
    )
    new_seq = (F.lit(rebase_offset) - F.col("seq")) if rebase_offset is not None else -F.col("seq")
    return (
        events.filter(F.col("op") != S.OP_DDL)
        .withColumn("_b", F.col("before"))
        .withColumn("before", F.col("after"))
        .withColumn("after", F.col("_b"))
        .drop("_b")
        .withColumn("op", inv_op)
        .withColumn("seq", new_seq)
    )

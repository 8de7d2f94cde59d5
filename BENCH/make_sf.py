"""Deterministic scale-factor upsampler: sf0.1 -> sfN for benchmarking.

The driver ships parquet only up to sf0.1 (600k lineitem / 100k events /
5k documents); per-query timings at that scale are dominated by the ~2s
per-job fixed cost and the box's 2x run-to-run window swing (VERDICT r5
#7). This script synthesises a larger scale factor DETERMINISTICALLY
from sf0.1 — no external data, byte-stable run-to-run — so rounds can
compare per-query numbers against a denoised yardstick.

Upsampling rules (replica r in 0..R-1; r=0 is the original bytes):
  * region/nation: fixed TPC-H dimensions, copied as-is.
  * customer/supplier/part/orders/lineitem: primary keys shift by
    r * (sf0.1 key cardinality); foreign keys shift by the SAME stride,
    so join fan-in/fan-out per key is IDENTICAL at every scale and a
    query's per-key work is scale-invariant.
  * dates/timestamps are NOT shifted: fixed-predicate time filters keep
    the same selectivity fraction at every scale.
  * events: event_id/user_id shift; ts unchanged (sessionization and
    window cardinality scale with users, per-user density constant).
  * documents: doc_id shifts; for r>0 every 7th word is rewritten to a
    replica-and-position-keyed token (NOT doc-keyed: the same transform
    applies to every doc in a replica, so within-replica exact-dup and
    near-dup relationships are preserved verbatim). This kills most
    5-gram shingles vs other replicas (Jaccard ~0.17), so replicas are
    DISTINCT documents to every dedup family — the duplicate SHARE
    stays constant as sf grows (the scaling property a curation bench
    needs; naive 10x content copies would instead saturate every LSH
    bucket cap and measure the cap, not the operator).
  * embeddings: vec_id shifts; the vector is np.roll'ed by 7*r, which
    preserves the norm but decorrelates replicas (near-orthogonal for
    random-ish embeddings), so ANN/cosine near-dup neighbor structure
    is replicated, not degenerately duplicated.

Usage:
  python BENCH/make_sf.py --out /dev/shm/sf1.0 [--factor 10]
                          [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pandas as pd

STRIDES = {
    "customer": ("c_custkey", 15_000),
    "supplier": ("s_suppkey", 1_000),
    "part": ("p_partkey", 20_000),
}
ORDER_STRIDE = 150_000
EVENT_STRIDE, USER_STRIDE = 100_000, 1_500
DOC_STRIDE, VEC_STRIDE = 5_000, 2_000


def _perturb_text(text: str, r: int) -> str:
    """Replace every 7th word with a (replica, position)-keyed token."""
    words = text.split(" ")
    for i in range(3, len(words), 7):
        words[i] = f"w{(r * 1117 + i * 131) % 9973}"
    return " ".join(words)


def upsample(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def copy_sql(select: str, table: str) -> None:
        con.sql(
            f"COPY ({select}) TO '{out}/{table}.parquet' (FORMAT PARQUET, "
            f"COMPRESSION ZSTD)"
        )
        n = con.sql(f"select count(*) from read_parquet('{out}/{table}.parquet')")
        print(f"  {table}: {n.fetchone()[0]:,} rows")

    rng = f"range(0, {factor})"
    for t in ("region", "nation"):
        copy_sql(f"SELECT * FROM read_parquet('{src}/{t}.parquet')", t)

    for t, (pk, stride) in STRIDES.items():
        copy_sql(
            f"SELECT src.* REPLACE ({pk} + r.range * {stride} AS {pk}) "
            f"FROM read_parquet('{src}/{t}.parquet') src CROSS JOIN {rng} r",
            t,
        )

    copy_sql(
        f"SELECT src.* REPLACE (o_orderkey + r.range * {ORDER_STRIDE} AS o_orderkey, "
        f"o_custkey + r.range * {STRIDES['customer'][1]} AS o_custkey) "
        f"FROM read_parquet('{src}/orders.parquet') src CROSS JOIN {rng} r",
        "orders",
    )
    copy_sql(
        f"SELECT src.* REPLACE (l_orderkey + r.range * {ORDER_STRIDE} AS l_orderkey, "
        f"l_partkey + r.range * {STRIDES['part'][1]} AS l_partkey, "
        f"l_suppkey + r.range * {STRIDES['supplier'][1]} AS l_suppkey) "
        f"FROM read_parquet('{src}/lineitem.parquet') src CROSS JOIN {rng} r",
        "lineitem",
    )
    copy_sql(
        f"SELECT src.* REPLACE (event_id + r.range * {EVENT_STRIDE} AS event_id, "
        f"user_id + r.range * {USER_STRIDE} AS user_id) "
        f"FROM read_parquet('{src}/events.parquet') src CROSS JOIN {rng} r",
        "events",
    )

    # documents: python-side word perturbation (deterministic, r=0 verbatim)
    docs = con.sql(f"SELECT * FROM read_parquet('{src}/documents.parquet')").df()
    reps = []
    for r in range(factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * DOC_STRIDE
        if r:
            d["text"] = [_perturb_text(t, r) for t in d["text"]]
            d["n_chars"] = d["text"].str.len()
        reps.append(d)
    alldocs = pd.concat(reps, ignore_index=True)
    con.register("alldocs", alldocs)
    copy_sql("SELECT * FROM alldocs", "documents")

    emb = con.sql(f"SELECT * FROM read_parquet('{src}/embeddings.parquet')").df()
    mat = np.stack(emb["embedding"].to_numpy())
    reps = []
    for r in range(factor):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * VEC_STRIDE
        if r:
            e["embedding"] = list(np.roll(mat, 7 * r, axis=1))
        reps.append(e)
    allemb = pd.concat(reps, ignore_index=True)
    con.register("allemb", allemb)
    copy_sql("SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, label "
             "FROM allemb", "embeddings")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()
    print(f"upsampling {a.src} x{a.factor} -> {a.out}")
    upsample(a.src, a.out, a.factor)

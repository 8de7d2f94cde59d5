"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine/dot top-k (query-set broadcast against the
corpus — one pass, no shuffle of the big side; TakeOrderedAndProject per
query via window top-k).

Scale path: sign-random-projection LSH — each vector gets a small bucket
code from deterministic hyperplanes; candidates only join within a
bucket. At 10^9 vectors the bucket join replaces the O(Q*N) scan.

Determinism: dot products are computed on round(x*1000) integer
components (exact in doubles), so any SQL engine reproduces the exact
ranking — float-sum association differences can't flip the order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _int_vec(col: F.Column) -> F.Column:
    """Component-wise round(x*1000): exact integer embedding proxy."""
    return F.transform(col, lambda x: F.round(x.cast("double") * 1000))


def dot_int(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(_int_vec(a), _int_vec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ).cast("long")


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    impl: str = "numpy",
) -> DataFrame:
    """Exact top-k by integer-scaled dot product.

    impl="numpy" (default): the query set is collected to a small int64
    matrix and shipped in the closure; each Arrow batch of corpus
    vectors does ONE matrix multiply (V @ Q.T) inside mapInPandas and
    emits only its LOCAL top-k per query — the corpus is scanned once,
    nothing but (batches x queries x k) candidate rows move, and the
    global window finishes the top-k. ~10x faster than per-pair
    Catalyst higher-order functions (impl="expr"), bit-identical
    results (int64 arithmetic both ways).
    """
    if impl == "expr":
        q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
        scored = vectors.alias("v").join(F.broadcast(q)).select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            dot_int(F.col(vec_col), F.col("_qvec")).alias("dot_scaled"),
        )
    else:
        import numpy as np
        import pandas as pd

        def round_half_away(x):
            # match Spark/DuckDB round(): half away from zero (np.rint
            # is half-to-even and would flip exact .5 boundaries)
            return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype("int64")

        qrows = queries.select(query_id_col, vec_col).collect()
        qids = np.array([r[query_id_col] for r in qrows], dtype="int64")
        qmat = round_half_away(
            np.array([r[vec_col] for r in qrows], dtype="float64") * 1000
        )

        def score(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vmat = round_half_away(
                    np.array(list(pdf[vec_col]), dtype="float64") * 1000
                )
                dots = vmat @ qmat.T  # (n_batch, n_queries) exact int64
                nb = len(pdf)
                kk = min(k, nb)
                ids = pdf[id_col].to_numpy()
                # local top-k per query (ties -> lower neighbor_id)
                order = np.lexsort((ids[None, :].repeat(len(qids), 0), -dots.T))
                top = order[:, :kk]
                yield pd.DataFrame(
                    {
                        query_id_col: np.repeat(qids, kk),
                        "neighbor_id": ids[top].ravel(),
                        "dot_scaled": np.take_along_axis(dots.T, top, 1).ravel(),
                    }
                )

        scored = vectors.select(id_col, vec_col).mapInPandas(
            score, schema=f"{query_id_col} long, neighbor_id long, dot_scaled long"
        )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dot_scaled").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "dot_scaled", "rank")
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold_scaled: int,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share an SRP
    bucket (near-identical vectors almost always do), then exact
    integer-scaled dot filters by `threshold_scaled` (on round(x*1000)
    components; for unit-normalized embeddings cosine t corresponds to
    threshold_scaled ~ t * 1e6). Only within-bucket pairs materialize —
    the scale path for near-dup dedup over 10^9 embeddings; raise
    n_planes to shrink buckets, add multi-probe to recover recall."""
    vb = with_srp_bucket_arrow(vectors, vec_col, n_planes, dim).select(
        id_col, vec_col, "_bucket"
    )
    a, b = vb.alias("a"), vb.alias("b")
    pairs = a.join(
        b,
        (F.col("a._bucket") == F.col("b._bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        dot_int(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("dot_scaled"),
    )
    return pairs.filter(F.col("dot_scaled") >= threshold_scaled)


def srp_bucket(vec_col: F.Column, n_planes: int = 8, dim: int = 64) -> F.Column:
    """Sign-random-projection bucket code ('0'/'1' per hyperplane).

    Hyperplane j's weight on dimension i is ±1 from the parity of a hex
    char of md5(j||':'||i) — fully deterministic, no stored model, and
    reproducible in any engine with md5+ascii."""
    import hashlib

    bits = []
    iv = _int_vec(vec_col)
    for j in range(n_planes):
        # driver-side constant weights (tiny: n_planes * dim literals)
        weights = [
            1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) % 2 else -1
            for i in range(dim)
        ]
        s = F.aggregate(
            F.zip_with(
                iv,
                F.array(*[F.lit(w) for w in weights]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(s > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _srp_weights(n_planes: int, dim: int):
    import hashlib

    import numpy as np

    return np.array(
        [
            [
                1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) % 2 else -1
                for i in range(dim)
            ]
            for j in range(n_planes)
        ],
        dtype="int64",
    )


def with_srp_bucket_arrow(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """srp_bucket computed with one numpy matmul per Arrow batch
    (identical bits to the Column-expression variant; ~10x faster on
    large corpora — interpreted HOFs evaluate per element)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    wt = _srp_weights(n_planes, dim).T  # (dim, n_planes)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("_bucket", T.StringType())]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf[vec_col]), dtype="float64") * 1000
            iv = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype("int64")
            s = iv @ wt  # (n, n_planes)
            bits = (s > 0).astype("uint8").astype(str)
            pdf = pdf.copy()
            pdf["_bucket"] = pd.Series(["".join(r) for r in bits], index=pdf.index)
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k restricted to the query's SRP bucket. Recall < 1 by
    construction; at scale add multi-probe (flip one bit) or more
    tables. The bucket equi-join is the only shuffle; bucket codes come
    from the Arrow/numpy path (bit-identical to srp_bucket)."""
    vb = with_srp_bucket_arrow(vectors, vec_col, n_planes, dim)
    qb = with_srp_bucket_arrow(
        queries.select(query_id_col, F.col(vec_col).alias("_qvec")), "_qvec", n_planes, dim
    ).select(query_id_col, "_qvec", "_bucket")
    scored = vb.join(F.broadcast(qb), "_bucket").select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        dot_int(F.col(vec_col), F.col("_qvec")).alias("dot_scaled"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dot_scaled").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "dot_scaled", "rank")
    )

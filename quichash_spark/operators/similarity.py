"""Embedding similarity search: brute-force cosine top-k baseline + a
random-hyperplane-LSH bucketed variant as the scale path.

Not in the reference (its similarity notion is exact-hash equality); this
is part of the training-data-pipeline extension the engine targets.

Scale notes:
- dot products and norms are JVM-side (``zip_with`` + ``aggregate``
  higher-order functions over array columns) — no Python;
- the brute-force variant is an explicit cross join: correct baseline,
  quadratic — use it for small query sets against large corpora (queries
  side broadcast);
- the LSH variant buckets by ``n_planes`` random-hyperplane sign bits and
  only scores within buckets (multi-probe via ``n_tables`` independent
  tables), turning the cross join into an equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(col: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_pairs(
    left: DataFrame,
    right: DataFrame,
    id_left: str = "vec_id",
    id_right: str = "vec_id",
    vec: str = "embedding",
    broadcast_left: bool = True,
) -> DataFrame:
    """All (left x right) cosine scores; left side broadcast by default
    (the small query set)."""
    l = left.select(F.col(id_left).alias("query_id"), F.col(vec).alias("qv"))
    r = right.select(F.col(id_right).alias("neighbor_id"), F.col(vec).alias("nv"))
    if broadcast_left:
        l = F.broadcast(l)
    return (
        l.crossJoin(r)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("qv", "nv") / (_norm("qv") * _norm("nv"))).alias("cosine"),
        )
    )


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_left: str = "vec_id",
    id_right: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (rank by cosine desc, ties by
    neighbor id asc for full determinism)."""
    scored = cosine_pairs(queries, corpus, id_left, id_right, vec)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def neardup_pairs(corpus: DataFrame, threshold: float, id_col: str = "vec_id",
                  vec: str = "embedding") -> DataFrame:
    """All unordered pairs with cosine >= threshold (embedding near-dup
    channel of the dedup stack).  Baseline all-pairs form; at scale use
    ``ann_lsh_topk`` buckets to generate candidates first."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec).alias("qv"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec).alias("nv"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot("qv", "nv") / (_norm("qv") * _norm("nv")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def hyperplane_buckets_udf(planes_by_table: "np.ndarray"):
    """pandas_udf: embedding -> array<long> of bucket keys, one per table.

    One numpy matmul covers every (table, plane) pair — the Arrow-batched
    replacement for chaining n_tables*n_planes ``aggregate`` expressions
    (which blows up codegen size and wall time).  Planes are broadcast as
    a serialized constant (seed-frozen, partition-safe).
    """
    from pyspark.sql.types import ArrayType, LongType

    n_tables, n_planes, _dim = planes_by_table.shape
    flat = planes_by_table.reshape(n_tables * n_planes, -1)  # (T*P, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ flat.T) > 0  # (n, T*P)
        bits = signs.reshape(len(mat), n_tables, n_planes) @ weights  # (n, T)
        return pd.Series(list(bits.astype(np.int64)))

    return _buckets


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
    id_left: str = "vec_id",
    id_right: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only within matching hyperplane buckets
    across ``n_tables`` independent tables (union of candidates), then
    exact cosine + rank.  Recall grows with n_tables; scale path for the
    corpus-x-corpus case where the cross join is infeasible.

    Bucket keys for ALL tables come from one vectorized matmul per batch;
    the per-table equi-join key is (table_idx, bucket) via posexplode —
    the same unified-bucket-table shape as the MinHash LSH stage.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    buckets = hyperplane_buckets_udf(planes)

    qb = queries.select(
        F.col(id_left).alias("query_id"),
        F.col(vec).alias("qv"),
        F.posexplode(buckets(F.col(vec))).alias("table_idx", "bucket"),
    )
    cb = corpus.select(
        F.col(id_right).alias("neighbor_id"),
        F.col(vec).alias("nv"),
        F.posexplode(buckets(F.col(vec))).alias("table_idx", "bucket"),
    )
    cands = (
        qb.join(cb, ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        (_dot("qv", "nv") / (_norm("qv") * _norm("nv"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 3,
    kmeans_iters: int = 10,
    seed: int = 11,
    sample_limit: int = 10_000,
    id_left: str = "vec_id",
    id_right: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: tiny k-means trained driver-side on a bounded
    sample (centroids are broadcast constants); corpus rows are assigned
    to their nearest centroid (one matmul per batch), queries probe their
    ``n_probe`` nearest cells, and exact cosine runs only within probed
    cells.  The standard IVF recall/cost dial: n_probe=n_centroids
    degenerates to brute force.
    """
    from pyspark.sql.types import ArrayType, IntegerType

    sample = np.asarray(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in corpus.select(vec).limit(sample_limit).collect()
        ]
    )
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(kmeans_iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(centroids.shape[0]):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)

    @F.pandas_udf(IntegerType())
    def nearest_cell(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    cb = corpus.select(
        F.col(id_right).alias("neighbor_id"),
        F.col(vec).alias("nv"),
        nearest_cell(F.col(vec)).alias("cell"),
    )
    qb = queries.select(
        F.col(id_left).alias("query_id"),
        F.col(vec).alias("qv"),
        F.explode(probe_cells(F.col(vec))).alias("cell"),
    )
    scored = (
        qb.join(cb, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            (_dot("qv", "nv") / (_norm("qv") * _norm("nv"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )

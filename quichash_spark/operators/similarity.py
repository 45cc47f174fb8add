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


def hyperplane_bits_expr(vec: str, planes: np.ndarray):
    """LongType sign-bit key of a vector against ``planes`` (n_planes, dim).

    Built-in-only: per plane, sign(dot(v, plane)) folded into a bit mask.
    Planes are broadcast literal arrays (seed-frozen, partition-safe).
    """
    bits = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(F.col(vec), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits = bits + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bits


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
    corpus-x-corpus case where the cross join is infeasible."""
    rng = np.random.default_rng(seed)
    cands = None
    for t in range(n_tables):
        planes = rng.standard_normal((n_planes, dim))
        qb = queries.select(
            F.col(id_left).alias("query_id"),
            F.col(vec).alias("qv"),
            hyperplane_bits_expr(vec, planes).alias("bucket"),
        )
        cb = corpus.select(
            F.col(id_right).alias("neighbor_id"),
            F.col(vec).alias("nv"),
            hyperplane_bits_expr(vec, planes).alias("bucket"),
        )
        c = qb.join(cb, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
        c = c.select("query_id", "neighbor_id", "qv", "nv")
        cands = c if cands is None else cands.unionByName(c)
    scored = (
        cands.dropDuplicates(["query_id", "neighbor_id"])
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

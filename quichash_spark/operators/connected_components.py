"""Iterative connected components: alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond") as a
DataFrame loop — stage 7 of SURVEY.md §7.0.

Pure DataFrame ops (groupBy min + joins), no GraphX/graphframes dependency.
Each round is a bounded number of shuffles; lineage is cut with
``localCheckpoint`` every iteration so plans don't grow (SURVEY.md §4.2).
Converges in O(log n) rounds on pathological graphs; dedup clusters have
tiny diameters so 2-4 rounds are typical.

Node ids are the (string) clip_ids; ``min`` is lexicographic, which is
total and deterministic, so cluster ids are stable across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors to the neighborhood minimum."""
    bidir = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        bidir.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect smaller-or-equal neighbors to the neighborhood minimum."""
    pointed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = (
        pointed.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        pointed.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iters: int = 25
) -> DataFrame:
    """edges(clip_a, clip_b) -> assignments(clip_id, cluster_id).

    ``cluster_id`` is the minimum member id of each component.  Nodes that
    appear in no edge are NOT emitted — callers union isolated nodes with
    self-labels (see pipeline).
    """
    cur = (
        edges.select(F.col("clip_a").alias("u"), F.col("clip_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # no checksum on the raw input: the first comparison happens between
    # rounds 1 and 2 (saves one driver barrier; convergence cannot occur
    # before one round anyway unless the input is already a star set,
    # which round 1 maps to itself)
    prev_sig: tuple[int, int] | None = None
    for _ in range(max_iters):
        cur = _small_star(_large_star(cur)).localCheckpoint()
        sig = _edge_checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: every edge points node -> component minimum
    members = cur.select(F.col("u").alias("clip_id"), F.col("v").alias("cluster_id"))
    roots = cur.select(F.col("v").alias("clip_id"), F.col("v").alias("cluster_id")).distinct()
    return members.union(roots).distinct()

"""Exact duplicate detection: group-by-content-hash.

Spark re-expression of quichash's dedup aggregation
(``find_duplicate_groups``, /root/reference/src/dedup.rs:599-629): build
``HashMap<hash, Vec<(path,size)>>`` -> keep groups with >1 member -> wasted
space = (count-1)*size.  Here the hash map is a shuffle-partitioned
``groupBy`` with map-side partial aggregation (Catalyst's partial+final
pattern — ref A7), so it scales to 10^12 rows without a driver-side map.

These groups are the NON-NEGOTIABLE recall floor (BASELINE.md): every
byte-identical clip pair must end up in one cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_duplicate_groups(signatures: DataFrame) -> DataFrame:
    """Groups of clips sharing a content hash (count > 1), sorted like the
    reference: members ascending, groups by wasted bytes descending
    (ref src/dedup.rs:610,625-627). ``wasted`` counts duplicate samples."""
    return (
        signatures.filter(F.col("content_hash").isNotNull())
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(F.collect_list("clip_id")).alias("clip_ids"),
            ((F.count("*") - F.lit(1)) * F.first("n_samples") * 2).alias("wasted_bytes"),
        )
        .filter(F.col("n") > 1)
        .orderBy(F.desc("wasted_bytes"), "content_hash")
    )


def exact_duplicate_edges(signatures: DataFrame) -> DataFrame:
    """Star edges (group-min member -> other members) for the cluster stage.

    Emitting n-1 star edges per group instead of n*(n-1)/2 pairwise edges
    keeps edge volume linear in corpus size — the connected-components
    stage makes the clusters identical either way.
    """
    w = Window.partitionBy("content_hash")
    return (
        signatures.filter(F.col("content_hash").isNotNull())
        .select("content_hash", "clip_id")
        .withColumn("root", F.min("clip_id").over(w))
        .filter(F.col("clip_id") != F.col("root"))
        .select(
            F.col("root").alias("clip_a"),
            F.col("clip_id").alias("clip_b"),
            F.lit("exact").alias("source"),
        )
    )

"""Distributed landmark-fingerprint matching (audio content search).

Joins the exploded landmark table (functions/fingerprint.py) on
``fp_hash`` and keeps clip pairs whose collisions agree on one
anchor-time offset — the alignment test that separates shared audio
content from random hash collisions (a true match concentrates its
collisions on a single delta; noise spreads them).

Scale shape (the same story as the LSH band join, operators/lsh.py):

- **cap before pair expansion**: a hash occurring in more than
  ``max_bucket`` landmarks is non-discriminative (spectrally common
  pattern) and would expand quadratically — it is dropped BEFORE the
  self-join, and the drop count is observable via ``bucket_stats``.
- one hash-partitioned exchange for the join (AQE handles residual
  skew), one aggregation for the alignment histogram, both map-side
  combinable.
- no collect(), no cartesian product: worst-case pair expansion is
  bounded by ``max_bucket**2 / 2`` per hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quichash_spark.functions.fingerprint import FP_CONFIG, FingerprintConfig


def capped_fingerprints(
    fps: DataFrame, cfg: FingerprintConfig = FP_CONFIG
) -> DataFrame:
    """Landmarks minus the over-common hashes (> ``max_bucket``
    occurrences corpus-wide)."""
    counts = fps.groupBy("fp_hash").agg(F.count("*").alias("n_occ"))
    return (
        fps.join(counts.filter(F.col("n_occ") <= cfg.max_bucket), "fp_hash")
        .drop("n_occ")
    )


def bucket_stats(fps: DataFrame, cfg: FingerprintConfig = FP_CONFIG) -> DataFrame:
    """(n_hashes, n_dropped_hashes, n_dropped_landmarks) — the no-silent-
    caps report for the ``max_bucket`` filter."""
    counts = fps.groupBy("fp_hash").agg(F.count("*").alias("n_occ"))
    return counts.agg(
        F.count("*").cast("long").alias("n_hashes"),
        F.sum((F.col("n_occ") > cfg.max_bucket).cast("long")).alias("n_dropped_hashes"),
        F.sum(
            F.when(F.col("n_occ") > cfg.max_bucket, F.col("n_occ")).otherwise(0)
        ).cast("long").alias("n_dropped_landmarks"),
    )


def fingerprint_pairs(
    fps: DataFrame, cfg: FingerprintConfig = FP_CONFIG,
    checkpoint: bool = True,
) -> DataFrame:
    """Clip pairs with >= ``min_matches`` hash collisions agreeing on one
    anchor-time delta: (clip_a, clip_b, aligned_matches, total_matches,
    delta_frames), clip_a < clip_b.

    ``checkpoint`` materializes the exploded landmark table once
    (eager localCheckpoint): the cap count and BOTH self-join branches
    reuse it, instead of running the STFT kernel three times.  Pass
    False when ``fps`` is already checkpointed/persisted by the caller
    (the 100 TB pipeline shape writes landmarks to a stage table).
    """
    if checkpoint:
        fps = fps.localCheckpoint(eager=True)
    # n_occ > 1 additionally drops singleton hashes (roughly half the
    # landmark table) before the self-join — they can never form a pair,
    # so the join shuffles half the bytes for identical output (guide
    # §2.3); same counts pass as the cap filter
    counts = fps.groupBy("fp_hash").agg(F.count("*").alias("n_occ"))
    capped = fps.join(
        counts.filter(
            (F.col("n_occ") > 1) & (F.col("n_occ") <= cfg.max_bucket)
        ),
        "fp_hash",
    ).drop("n_occ")
    a = capped.alias("a")
    b = capped.alias("b")
    collisions = (
        a.join(b, "fp_hash")
        .filter(F.col("a.clip_id") < F.col("b.clip_id"))
        .select(
            F.col("a.clip_id").alias("clip_a"),
            F.col("b.clip_id").alias("clip_b"),
            (F.col("a.t_anchor") - F.col("b.t_anchor")).alias("delta_frames"),
        )
    )
    per_delta = collisions.groupBy("clip_a", "clip_b", "delta_frames").agg(
        F.count("*").alias("n_at_delta")
    )
    best = per_delta.groupBy("clip_a", "clip_b").agg(
        F.max(F.struct("n_at_delta", "delta_frames")).alias("best"),
        F.sum("n_at_delta").cast("long").alias("total_matches"),
    )
    return (
        best.select(
            "clip_a",
            "clip_b",
            F.col("best.n_at_delta").cast("long").alias("aligned_matches"),
            "total_matches",
            F.col("best.delta_frames").cast("int").alias("delta_frames"),
        )
        .filter(F.col("aligned_matches") >= cfg.min_matches)
    )

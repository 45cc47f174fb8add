"""MinHash-LSH candidate generation with explicit skew handling.

Stage 3 of SURVEY.md §7.0.  Not present in the reference (its dedup is
exact-hash only, /root/reference/src/dedup.rs:599-629) — this is the
distributed generalization the north_rule requires.

Scale design (10^12 rows):

- Band keys are computed JVM-side (``xxhash64`` over signature slices)
  inside whole-stage codegen — no Python in this hot path.
- Candidate pairs come from a self-equi-join on ``(band_idx, band_key)``:
  a shuffle-hash/sort-merge join that AQE can skew-split.
- Hot bands (e.g. a constant transcript owned by millions of clips) are
  capped: bucket sizes are counted first and buckets larger than
  ``cfg.band_bucket_cap`` are EXCLUDED from pair generation, with the drop
  logged to the metrics table (north_rule requires explicit skew handling
  + lineage).  Exact duplicates inside a dropped bucket are still found by
  the content-hash stage, which has no quadratic blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quichash_spark.config import DedupConfig


def band_table(signatures: DataFrame, cfg: DedupConfig, column: str = "minhash_text") -> DataFrame:
    """(clip_id, band_idx, band_key) — one row per band per clip.

    band_key = xxhash64(slice(sig), band_idx): equal signature slices give
    equal keys; xxhash64 is deterministic across partitions/executors.
    """
    bands = F.array(
        *[
            F.xxhash64(F.slice(F.col(column), b * cfg.rows + 1, cfg.rows), F.lit(b))
            for b in range(cfg.bands)
        ]
    )
    return signatures.select(
        "clip_id", F.posexplode(bands).alias("band_idx", "band_key")
    )


def bucket_sizes(bands: DataFrame) -> DataFrame:
    return bands.groupBy("band_idx", "band_key").agg(F.count("*").alias("bucket_n"))


def lsh_candidates(
    signatures: DataFrame,
    cfg: DedupConfig,
    column: str = "minhash_text",
    source: str = "lsh_text",
) -> tuple[DataFrame, DataFrame]:
    """Candidate pairs from banded MinHash + a dropped-bucket report.

    Returns ``(candidates(clip_a, clip_b, source), dropped(band_idx,
    band_key, bucket_n))``.  ``clip_a < clip_b``; pairs seen in several
    bands are de-duplicated.
    """
    bands = band_table(signatures, cfg, column)
    sizes = bucket_sizes(bands)
    kept_keys = sizes.filter(
        (F.col("bucket_n") > 1) & (F.col("bucket_n") <= cfg.band_bucket_cap)
    ).select("band_idx", "band_key")
    dropped = sizes.filter(F.col("bucket_n") > cfg.band_bucket_cap)

    # Join bands down to non-trivial, non-capped buckets first: buckets of
    # size 1 (the overwhelming majority) never reach the self-join.
    kept = bands.join(kept_keys, ["band_idx", "band_key"])

    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        )
        .select(
            F.col("a.clip_id").alias("clip_a"),
            F.col("b.clip_id").alias("clip_b"),
        )
        .dropDuplicates(["clip_a", "clip_b"])
        .withColumn("source", F.lit(source))
    )
    return pairs, dropped

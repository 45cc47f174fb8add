"""SimHash Hamming-ball probe (stage 4 of SURVEY.md §7.0).

Finds EVERY pair of clips whose 64-bit SimHashes differ by at most
``cfg.simhash_hamming_r`` bits, exactly, without an all-pairs scan:

pigeonhole — split 64 bits into ``r+1`` chunks; two values within Hamming
distance r must agree on at least one whole chunk.  Group rows by
``(chunk_idx, chunk_value)`` (an equi-join, shuffle-partitioned and
AQE-skew-splittable), then filter by true distance with JVM-side
``bit_count(a ^ b)`` — no Python anywhere in this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quichash_spark.config import DedupConfig


def simhash_chunk_table(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(clip_id, simhash, chunk_idx, chunk_val) — r+1 rows per clip."""
    n = cfg.simhash_chunks
    width = 64 // n
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(n)
        ]
    )
    return signatures.select(
        "clip_id", "simhash", F.posexplode(chunks).alias("chunk_idx", "chunk_val")
    )


def simhash_candidates(
    signatures: DataFrame, cfg: DedupConfig, bucket_cap: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """All pairs with Hamming(simhash_a, simhash_b) <= r, plus the dropped
    hot-bucket report (same skew policy as the LSH stage: a chunk value
    shared by more than ``bucket_cap`` clips — e.g. simhash(constant
    transcript) — is excluded and logged; identical-transcript pairs are
    still reachable via LSH/exact stages)."""
    cap = bucket_cap or cfg.band_bucket_cap
    chunks = simhash_chunk_table(signatures, cfg)
    sizes = chunks.groupBy("chunk_idx", "chunk_val").agg(F.count("*").alias("bucket_n"))
    kept_keys = sizes.filter((F.col("bucket_n") > 1) & (F.col("bucket_n") <= cap)).select(
        "chunk_idx", "chunk_val"
    )
    dropped = sizes.filter(F.col("bucket_n") > cap)
    kept = chunks.join(kept_keys, ["chunk_idx", "chunk_val"])

    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        )
        .filter(
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            <= cfg.simhash_hamming_r
        )
        .select(
            F.col("a.clip_id").alias("clip_a"),
            F.col("b.clip_id").alias("clip_b"),
        )
        .dropDuplicates(["clip_a", "clip_b"])
        .withColumn("source", F.lit("simhash"))
    )
    return pairs, dropped

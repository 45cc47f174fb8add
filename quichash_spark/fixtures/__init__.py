"""Fixture corpus loaders (Spark-side, distributed generation)."""

from __future__ import annotations

from collections.abc import Iterator
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from quichash_spark.fixtures.clips import clip_row, n_clips_for_sf, truth_row

CLIPS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("sr_hz", IntegerType()),
        StructField("dur_ms", IntegerType()),
        StructField("codec", StringType()),
        StructField("transcript", StringType()),
    ]
)

TRUTH_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("true_cluster_id", StringType()),
        StructField("kind", StringType()),
    ]
)


def clips_dataframe(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Generate the n-clip corpus distributed: every row is a pure function
    of its index, so the result is identical for ANY partitioning."""
    rng_df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame([clip_row(int(i)) for i in pdf["id"]])

    return rng_df.mapInPandas(gen, CLIPS_SCHEMA)


def truth_dataframe(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    rng_df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame([truth_row(int(i)) for i in pdf["id"]])

    return rng_df.mapInPandas(gen, TRUTH_SCHEMA)


#: bump when the generator changes: invalidates /tmp parquet caches
FIXTURE_VERSION = 2


def materialized_clips(
    spark: SparkSession, n: int, cache_root: str = "/tmp/quichash_clips"
) -> DataFrame:
    """Generate-once, read-many parquet materialization of the corpus."""
    path = Path(cache_root) / f"v{FIXTURE_VERSION}_n{n}"
    marker = path / "_SUCCESS"
    if not marker.exists():
        clips_dataframe(spark, n).write.mode("overwrite").parquet(str(path))
    return spark.read.parquet(str(path))


__all__ = [
    "CLIPS_SCHEMA",
    "TRUTH_SCHEMA",
    "clips_dataframe",
    "truth_dataframe",
    "materialized_clips",
    "n_clips_for_sf",
]

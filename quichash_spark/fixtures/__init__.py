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

#: deterministic micro-batch layout for the streaming driver queries:
#: chunk files + files-per-trigger fix which clips share a micro-batch
STREAM_LAYOUT_FILES = 10
STREAM_FILES_PER_TRIGGER = 2


def materialized_clips_stream(
    n: int,
    n_files: int = STREAM_LAYOUT_FILES,
    cache_root: str = "/tmp/quichash_clips",
) -> str:
    """Clips corpus laid out for DETERMINISTIC streaming replay: ``n_files``
    parquet chunk files, chunk ``k`` holding the contiguous clip-index range
    ``[k*ceil(n/n_files), ...)``, with file mtimes strictly increasing in
    chunk order.  Spark's file stream source orders files by modification
    time (ascending, ``latestFirst=false``), so with
    ``maxFilesPerTrigger=m`` micro-batch ``b`` contains exactly chunks
    ``[b*m, (b+1)*m)`` — batch membership is a pure function of
    (n, n_files, m), replayable by the sequential oracle replica
    (oracle/fixture.py::sequential_stream_assignments).

    Written driver-side with pyarrow (no Spark session needed — the oracle
    replica imports this too); atomic build via tmp-dir rename."""
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    target = Path(cache_root) / f"stream_v{FIXTURE_VERSION}_n{n}_f{n_files}"
    if (target / "_SUCCESS").exists():
        return str(target)
    if target.exists():  # stale partial build (killed run): rebuild
        import shutil

        shutil.rmtree(target, ignore_errors=True)
    target.parent.mkdir(parents=True, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".build_", dir=str(target.parent))
    try:
        chunk = -(-n // n_files)  # ceil
        base_mtime = 1_600_000_000
        arrow_schema = pa.schema([
            ("clip_id", pa.string()), ("bytes", pa.binary()),
            ("sr_hz", pa.int32()), ("dur_ms", pa.int32()),
            ("codec", pa.string()), ("transcript", pa.string()),
        ])
        for k in range(n_files):
            rows = [clip_row(i) for i in range(k * chunk, min((k + 1) * chunk, n))]
            tbl = pa.Table.from_pylist(rows, schema=arrow_schema)
            p = os.path.join(tmp, f"chunk-{k:04d}.parquet")
            pq.write_table(tbl, p)
            # strictly increasing mtimes == chunk order == filename order
            os.utime(p, (base_mtime + 60 * k, base_mtime + 60 * k))
        (Path(tmp) / "_SUCCESS").touch()
        try:
            os.rename(tmp, target)
        except OSError:
            # lost the race to a concurrent builder — theirs is equivalent
            shutil.rmtree(tmp, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return str(target)


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

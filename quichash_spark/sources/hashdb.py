"""Reference hash-database formats as Spark sources/sinks (SURVEY.md §2.1).

quichash persists its scan results in two text formats
(/root/reference/src/database.rs):

- **standard**: ``<hash>␠␠<algorithm>␠␠<fast|normal>␠␠<filepath>`` lines —
  writer src/database.rs:131-142; the parser splits on two spaces with a
  4-way limit so file paths may themselves contain double spaces
  (src/database.rs:230-257).
- **hashdeep**: CSV with a ``%%%% size,algo,filename`` header
  (src/database.rs:146-171; parser 334-401), algorithm inferred from hash
  length when the header is missing (404-414).

Re-expressed as distributed text reads/writes: parsing is JVM-side
(``split`` with limit / ``regexp_extract``), malformed lines are tolerated
and surfaced via a flag column instead of being dropped silently
(src/database.rs:581-596 skips them; we keep them observable).  Format
sniffing (src/database.rs:97-130) reads a small sample of lines.

Compression: a table/write option (``compression=gzip``), not a post-pass
(the reference's .xz rewrite, src/database.rs:45-78, is unnecessary when
the codec is part of the sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quichash_spark.functions.text import algorithm_from_hash_length

STANDARD_SEP = "  "


def write_standard(df: DataFrame, path: str, compression: str | None = None,
                   hash_col: str = "hash", algorithm_col: str = "algorithm",
                   fast_col: str = "fast_mode", path_col: str = "path") -> None:
    """Write the standard 4-field format (src/database.rs:131-142)."""
    lines = df.select(
        F.concat_ws(
            STANDARD_SEP,
            F.col(hash_col),
            F.col(algorithm_col),
            F.when(F.col(fast_col), F.lit("fast")).otherwise(F.lit("normal")),
            F.col(path_col),
        ).alias("value")
    )
    w = lines.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def read_standard(spark: SparkSession, path: str) -> DataFrame:
    """Parse standard-format lines; limit-4 split preserves double spaces
    inside file paths (src/database.rs:230-257).  Malformed lines get
    ``valid=false`` and null fields."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), STANDARD_SEP, 4)
    return raw.select(
        F.when(F.size(parts) >= 4, parts[0]).alias("hash"),
        F.when(F.size(parts) >= 4, parts[1]).alias("algorithm"),
        F.when(F.size(parts) >= 4, parts[2] == "fast").alias("fast_mode"),
        F.when(F.size(parts) >= 4, parts[3]).alias("path"),
        (F.size(parts) >= 4).alias("valid"),
    )


def write_hashdeep(df: DataFrame, path: str, algorithm: str = "sha256",
                   hash_col: str = "hash", size_col: str = "file_size",
                   path_col: str = "path") -> None:
    """Hashdeep CSV rows ``size,hash,filename`` (src/database.rs:160-171).

    Spark's csv sink writes the data rows; the ``%%%%`` banner header the
    reference emits is a single-file artifact — distributed sinks carry
    the schema in the csv header option instead.
    """
    df.select(
        F.col(size_col).cast("long").alias("size"),
        F.col(hash_col).alias(algorithm),
        F.col(path_col).alias("filename"),
    ).write.mode("overwrite").option("header", True).csv(path)


def read_hashdeep(spark: SparkSession, path: str) -> DataFrame:
    """Read hashdeep CSV; algorithm inferred from hash length when the
    header doesn't name it (src/database.rs:404-414)."""
    df = spark.read.option("header", True).csv(path)
    cols = df.columns
    hash_col = next((c for c in cols if c not in ("size", "filename")), None)
    if hash_col is None:
        raise ValueError(f"unrecognized hashdeep header: {cols}")
    return df.select(
        F.col("size").cast("long").alias("file_size"),
        F.col(hash_col).alias("hash"),
        F.col("filename").alias("path"),
        F.lit(hash_col).alias("algorithm_from_header"),
        algorithm_from_hash_length(F.col(hash_col)).alias("algorithm_inferred"),
    )


def sniff_format(spark: SparkSession, path: str, sample_lines: int = 10) -> str:
    """Format auto-detection over a small line sample
    (src/database.rs:97-130): '%' prefix or commas => hashdeep,
    double-space => standard."""
    head = [r["value"] for r in spark.read.text(path).limit(sample_lines).collect()]
    for line in head:
        if line.startswith("%") or ("," in line and STANDARD_SEP not in line):
            return "hashdeep"
        if STANDARD_SEP in line:
            return "standard"
    return "unknown"

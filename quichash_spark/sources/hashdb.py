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

Compression: Spark-native codecs are a write option (``compression=gzip``)
rather than a post-pass; for interop with the reference's LZMA databases
(src/database.rs:36-94) `.xz` files are read transparently (one task per
file — xz is not splittable, matching the reference's whole-file model)
and :func:`compress_database` mirrors its level-6 rewrite.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quichash_spark.functions.text import algorithm_from_hash_length

STANDARD_SEP = "  "
XZ_PRESET = 6  # the reference's compression level (src/database.rs:57)


def read_db_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw DB lines as a ``value`` column, `.xz`-transparent.

    Plain files go through the native distributed text reader; `.xz`
    files (reference src/database.rs:81-94) are decompressed inside a
    ``mapInPandas`` over ``binaryFile`` rows — still one Spark task per
    file, which is the maximum parallelism a non-splittable codec allows.
    """
    if not path.endswith(".xz"):
        return spark.read.text(path)

    import pandas as pd

    def decomp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import lzma

        for pdf in it:
            for content in pdf["content"]:
                text = lzma.decompress(bytes(content)).decode("utf-8")
                lines = text.split("\n")
                if lines and lines[-1] == "":
                    lines.pop()
                yield pd.DataFrame({"value": lines})

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(decomp, "value string")
    )


def compress_database(src: str, dst: str | None = None, delete_src: bool = True) -> str:
    """Driver-side `.xz` rewrite of a single DB file at the reference's
    level 6 (src/database.rs:45-78: compress, then delete the original)."""
    import lzma

    dst = dst or src + ".xz"
    with open(src, "rb") as f_in, lzma.open(dst, "wb", preset=XZ_PRESET) as f_out:
        while chunk := f_in.read(1 << 20):
            f_out.write(chunk)
    if delete_src:
        os.remove(src)
    return dst


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
    ``valid=false`` and null fields.  `.xz`-transparent."""
    raw = read_db_lines(spark, path)
    parts = F.split(F.col("value"), STANDARD_SEP, 4)
    return raw.select(
        F.when(F.size(parts) >= 4, parts[0]).alias("hash"),
        F.when(F.size(parts) >= 4, parts[1]).alias("algorithm"),
        F.when(F.size(parts) >= 4, parts[2] == "fast").alias("fast_mode"),
        F.when(F.size(parts) >= 4, parts[3]).alias("path"),
        (F.size(parts) >= 4).alias("valid"),
    )


def write_hashdeep(df: DataFrame, path: str, algorithms: list[str] | None = None,
                   hash_cols: list[str] | None = None, size_col: str = "file_size",
                   path_col: str = "path") -> None:
    """Distributed hashdeep sink: data rows ``size,hash1,...,filename``
    exactly as the reference writes them (src/database.rs:160-171), plus
    the ``%%%%``/``##`` banner (src/database.rs:146-156) written as a
    ``_HEADER`` part so :func:`hashdeep_banner` can splice a byte-faithful
    single file when one is needed.

    A multi-part text dir cannot carry a leading banner; for a single-file
    artifact identical to the reference writer's, use
    :func:`write_hashdeep_file`.
    """
    algorithms = algorithms or ["sha256"]
    hash_cols = hash_cols or ["hash"]
    lines = df.select(
        F.concat_ws(
            ",",
            F.col(size_col).cast("long"),
            *[F.col(c) for c in hash_cols],
            F.col(path_col),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    with open(os.path.join(path, "_HEADER"), "w") as f:
        f.write(hashdeep_banner(algorithms))


def hashdeep_banner(algorithms: list[str]) -> str:
    """The reference's exact header block (src/database.rs:146-156)."""
    return (
        "%%%% HASHDEEP-1.0\n"
        f"%%%% size,{','.join(algorithms)},filename\n"
        "## Invoked from: hash utility\n"
        "## $ hash scan --format hashdeep\n"
        "##\n"
    )


def write_hashdeep_file(df: DataFrame, local_path: str,
                        algorithms: list[str] | None = None,
                        hash_cols: list[str] | None = None,
                        size_col: str = "file_size", path_col: str = "path") -> str:
    """Single-file hashdeep writer, byte-compatible with the reference
    (banner + rows).  Streams rows via toLocalIterator — bounded driver
    memory — for report-sized exports (the reference's DB is a single
    file by construction; a 10^12-row export should use the distributed
    :func:`write_hashdeep` parts instead)."""
    algorithms = algorithms or ["sha256"]
    hash_cols = hash_cols or ["hash"]
    rows = df.select(
        F.col(size_col).cast("long").alias("size"),
        *[F.col(c) for c in hash_cols],
        F.col(path_col).alias("filename"),
    )
    with open(local_path, "w") as f:
        f.write(hashdeep_banner(algorithms))
        for r in rows.toLocalIterator():
            f.write(",".join(str(r[c]) for c in rows.columns) + "\n")
    return local_path


def _parse_hashdeep_header(head: list[str]) -> list[str]:
    """Algorithm names from the ``%%%% size,algo1,...,filename`` banner
    line (src/database.rs:151); [] when absent."""
    for line in head:
        if line.startswith("%%%%") and "size," in line:
            cols = line.split("%%%%", 1)[1].strip().split(",")
            if len(cols) >= 3 and cols[0].strip() == "size":
                return [c.strip() for c in cols[1:-1]]
    return []


def read_hashdeep(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-written hashdeep DB (src/database.rs:334-401):
    skip ``%%%%`` banner and ``##`` comment lines, take the LAST comma
    field as filename and the first as size (matching parse_hashdeep_line
    — filenames containing commas are a known hashdeep format limit),
    and emit one row per (path, algorithm, hash) with the algorithm from
    the banner or inferred from hash length (src/database.rs:404-414).
    `.xz`-transparent."""
    raw = read_db_lines(spark, path)
    # banner lines only, BEFORE limit: a multi-part text dir (e.g. the
    # output of write_hashdeep) has no guaranteed row order, so limiting
    # the raw lines can miss the '%%%%' header and silently fall back to
    # hash-length inference (misnaming same-length algorithms)
    algos = _parse_hashdeep_header(
        [r["value"] for r in raw.filter(F.col("value").startswith("%%%%")).limit(10).collect()]
    )
    if not algos:
        # a write_hashdeep dir carries its banner as a _HEADER part, which
        # Spark's text reader skips as metadata — read it directly rather
        # than falling back to hash-length inference (which misnames
        # same-length algorithms, e.g. sha256 vs blake3)
        hdr = os.path.join(path, "_HEADER")
        if os.path.isfile(hdr):
            with open(hdr) as f:
                algos = _parse_hashdeep_header(f.read().splitlines())
    data = raw.filter(
        ~F.col("value").startswith("%")
        & ~F.col("value").startswith("##")
        & (F.trim(F.col("value")) != "")
    )
    parts = F.split(F.col("value"), ",")
    n = F.size(parts)
    # posexplode_OUTER: a malformed line (<3 comma fields) must survive as
    # a valid=false row with null hash — the module contract (and the
    # standard-format reader's behavior); the reference silently skips
    # them (src/database.rs:581-596), we keep them observable
    exploded = data.select(
        (n >= 3).alias("valid"),
        # try_cast: ANSI mode would fail the whole job on one malformed
        # size field; malformed rows carry null + valid=false instead
        F.trim(parts[0]).try_cast("long").alias("file_size"),
        F.trim(F.element_at(parts, -1)).alias("path"),
        F.posexplode_outer(
            F.when(n >= 3, F.slice(parts, 2, (n - 2).cast("int")))
        ).alias("algo_idx", "hash"),
    ).withColumn("hash", F.trim("hash"))
    if algos:
        algo_map = F.array(*[F.lit(a) for a in algos])
        algorithm = F.when(
            F.col("algo_idx") < len(algos), F.element_at(algo_map, F.col("algo_idx") + 1)
        ).otherwise(algorithm_from_hash_length(F.col("hash")))
    else:
        algorithm = algorithm_from_hash_length(F.col("hash"))
    return exploded.filter(~F.col("valid") | (F.col("hash") != "")).select(
        "path", "file_size", algorithm.alias("algorithm"), "hash", "valid"
    )


def sniff_format(spark: SparkSession, path: str, sample_lines: int = 10) -> str:
    """Format auto-detection over a small line sample
    (src/database.rs:97-130): '%' prefix or commas => hashdeep,
    double-space => standard.  `.xz`-transparent."""
    head = [r["value"] for r in read_db_lines(spark, path).limit(sample_lines).collect()]
    for line in head:
        if line.startswith("%") or ("," in line and STANDARD_SEP not in line):
            return "hashdeep"
        if STANDARD_SEP in line:
            return "standard"
    return "unknown"

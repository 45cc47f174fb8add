"""Checkpoint store: per-stage tables + manifest + metrics (resumability).

North_rule: every stage checkpoints with per-partition lineage and metrics
so the pipeline is resumable mid-run.  The reference has the embryo of
this — its persisted "hash database" is a resumable artifact consumed by
verify/compare (/root/reference/src/database.rs:177-401) — generalized
here to one table per stage plus a manifest.

Backend: Iceberg (``writeTo(...).createOrReplace()``) when a catalog is
configured on the cluster; parquet directories with identical overwrite
semantics otherwise (this sandbox has no Iceberg jar — SURVEY.md §7.0).
Both are idempotent per (stage, config_hash): re-running a completed stage
is a no-op, so a killed driver resumes by skipping completed stages.
"""

from __future__ import annotations

import hashlib
import json
import shutil
import time
from dataclasses import asdict
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quichash_spark.config import DedupConfig


def config_hash(cfg: DedupConfig) -> str:
    return hashlib.sha256(
        json.dumps(asdict(cfg), sort_keys=True).encode()
    ).hexdigest()[:16]


class CheckpointStore:
    """Parquet-directory checkpoint store with Iceberg-compatible semantics.

    ``base_dir/<stage>/`` holds the stage table; ``base_dir/_manifest.json``
    records ``stage -> {status, config_hash, rows, wall_ms}``.  A stage is
    reusable iff status == 'complete' and the config hash matches.
    """

    def __init__(self, spark: SparkSession, base_dir: str, cfg: DedupConfig,
                 use_iceberg: bool = False, iceberg_namespace: str = "quichash"):
        self.spark = spark
        self.base = Path(base_dir)
        self.base.mkdir(parents=True, exist_ok=True)
        self.cfg_hash = config_hash(cfg)
        self.use_iceberg = use_iceberg
        self.iceberg_namespace = iceberg_namespace

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> Path:
        return self.base / "_manifest.json"

    def _read_manifest(self) -> dict:
        if self._manifest_path.exists():
            return json.loads(self._manifest_path.read_text())
        return {}

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True))
        tmp.replace(self._manifest_path)

    def is_complete(self, stage: str) -> bool:
        ent = self._read_manifest().get(stage)
        return bool(ent and ent.get("status") == "complete"
                    and ent.get("config_hash") == self.cfg_hash)

    # -- tables ------------------------------------------------------------
    def _table_path(self, stage: str) -> str:
        return str(self.base / stage)

    def write(self, df: DataFrame, stage: str, wall_ms: float | None = None) -> DataFrame:
        """Idempotent overwrite of a stage table; marks the stage complete.

        Per-partition lineage comes from the written parquet FOOTERS
        (one part-file per output partition, num_rows read driver-side
        with pyarrow) — zero extra Spark jobs per stage; Iceberg keeps
        the read-back aggregate path (its files carry the counts in
        manifests, but the generic route is one aggregate job).
        """
        t0 = time.monotonic()
        if self.use_iceberg:
            df.writeTo(f"{self.iceberg_namespace}.{stage}").createOrReplace()
            out = self.read(stage)
            per_part = (
                out.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count("*").alias("rows_out"))
                .collect()
            )
            parts = [(r["partition_id"], r["rows_out"]) for r in per_part]
        else:
            df.write.mode("overwrite").parquet(self._table_path(stage))
            out = self.read(stage)
            parts = self._footer_partition_rows(stage)
        rows = sum(n for _, n in parts)
        self._append_metrics_rows(stage, parts)
        manifest = self._read_manifest()
        manifest[stage] = {
            "status": "complete",
            "config_hash": self.cfg_hash,
            "rows": rows,
            "wall_ms": round(wall_ms if wall_ms is not None else (time.monotonic() - t0) * 1000, 1),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        self._write_manifest(manifest)
        return out

    def adopt(self, stage: str, wall_ms: float | None = None) -> DataFrame:
        """Register an externally-materialized parquet dir as a completed
        stage — e.g. slice outputs hardlinked in from per-executor
        processes (bench emulation) or a stage computed by a separate
        cluster job.  Same manifest + per-partition lineage semantics as
        :meth:`write`, but no Spark job: lineage comes from the parquet
        footers already on disk."""
        parts = self._footer_partition_rows(stage)
        self._append_metrics_rows(stage, parts)
        manifest = self._read_manifest()
        manifest[stage] = {
            "status": "complete",
            "config_hash": self.cfg_hash,
            "rows": sum(n for _, n in parts),
            "wall_ms": round(wall_ms or 0.0, 1),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        self._write_manifest(manifest)
        return self.read(stage)

    def rows(self, stage: str) -> int | None:
        """Row count recorded at checkpoint time (None if not complete) —
        lets downstream stages size themselves without re-counting."""
        ent = self._read_manifest().get(stage)
        if ent and ent.get("status") == "complete":
            return ent.get("rows")
        return None

    def read(self, stage: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"{self.iceberg_namespace}.{stage}")
        return self.spark.read.parquet(self._table_path(stage))

    def invalidate(self, stage: str) -> None:
        manifest = self._read_manifest()
        manifest.pop(stage, None)
        self._write_manifest(manifest)
        p = Path(self._table_path(stage))
        if p.exists():
            shutil.rmtree(p)

    def _footer_partition_rows(self, stage: str) -> list[tuple[int, int]]:
        """(output_partition_index, rows) per part-file from parquet
        footers — the sink writes one file per partition, so footer counts
        ARE the per-partition lineage, at driver-side metadata cost."""
        import pyarrow.parquet as pq

        parts: list[tuple[int, int]] = []
        files = sorted(Path(self._table_path(stage)).glob("part-*"))
        for idx, f in enumerate(files):
            parts.append((idx, pq.ParquetFile(str(f)).metadata.num_rows))
        return parts

    # -- metrics (per-partition lineage) ------------------------------------
    def _append_metrics_rows(self, stage: str, parts: list[tuple[int, int]]) -> None:
        """Driver-side parquet append of per-partition lineage rows — the
        engine's replacement for the reference's Arc<Mutex> running
        counters (/root/reference/src/scan.rs:299-303).  Spark-readable,
        but costs no Spark job."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        mdir = self.base / "_metrics"
        mdir.mkdir(parents=True, exist_ok=True)
        ts = time.strftime("%Y-%m-%dT%H:%M:%S")
        # batch_ms: one millisecond stamp per APPEND (also the file name)
        # — an invalidated-and-rerun stage appends a second lineage batch,
        # and consumers must be able to pick the latest unambiguously
        # (the second-resolution ts can collide across a fast rerun)
        batch_ms = int(time.time() * 1000)
        table = pa.table(
            {
                "stage": pa.array([stage] * len(parts), pa.string()),
                "partition_id": pa.array([p for p, _ in parts], pa.int32()),
                "rows_out": pa.array([n for _, n in parts], pa.int64()),
                "config_hash": pa.array([self.cfg_hash] * len(parts), pa.string()),
                "ts": pa.array([ts] * len(parts), pa.string()),
                "batch_ms": pa.array([batch_ms] * len(parts), pa.int64()),
            }
        )
        pq.write_table(table, mdir / f"{stage}_{batch_ms}.parquet")

    def append_metrics(self, stage: str, df: DataFrame) -> None:
        """Aggregate per-partition counts of ``df`` into the metrics table
        (one Spark job + driver-side write)."""
        per_part = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .collect()
        )
        self._append_metrics_rows(stage, [(r["partition_id"], r["rows_out"]) for r in per_part])

    def metrics(self) -> DataFrame:
        # mergeSchema: metrics dirs written before the batch_ms column
        # existed read back with batch_ms null (treated as batch 0); a
        # dir holding ONLY pre-batch_ms files surfaces no column at all
        df = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(str(self.base / "_metrics"))
        )
        if "batch_ms" not in df.columns:
            df = df.withColumn("batch_ms", F.lit(None).cast("long"))
        return df

    def latest_metrics(self) -> DataFrame:
        """One lineage row per (stage, partition) — only each stage's
        most recent append at the current config hash (an invalidated-
        and-rerun stage appends twice; the latest batch is the live
        table's lineage)."""
        from pyspark.sql import Window

        m = self.metrics().withColumn(
            "batch", F.coalesce(F.col("batch_ms"), F.lit(0))
        )
        w = Window.partitionBy("stage")
        return (
            m.filter(F.col("config_hash") == self.cfg_hash)
            .withColumn("max_batch", F.max("batch").over(w))
            .filter(F.col("batch") == F.col("max_batch"))
            .drop("batch", "max_batch")
        )

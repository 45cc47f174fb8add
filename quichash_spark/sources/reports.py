"""JSON report sink — the reference's per-command JSON reports (S9,
/root/reference/src/main.rs:149-179,354-394; dedup report
src/dedup.rs:105-142) re-expressed as: small driver-side summary dict +
distributed ``df.write.json`` for the row-level payload.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def human_size(n_bytes: float) -> str:
    """Reference F4 (src/compare.rs:60-74): KB/MB/GB/TB formatting."""
    size = float(n_bytes)
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if size < 1024.0 or unit == "TB":
            return f"{size:.2f} {unit}" if unit != "B" else f"{int(size)} B"
        size /= 1024.0
    return f"{size:.2f} TB"


def dedup_report(exact_groups: DataFrame, clusters: DataFrame,
                 duration_sec: float | None = None) -> dict:
    """Driver-side summary in the shape of the reference's DedupStats +
    group report (src/dedup.rs:19-29,105-142)."""
    g = exact_groups.agg(
        F.count("*").alias("groups"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("dup_files"),
        F.coalesce(F.sum("wasted_bytes"), F.lit(0)).alias("wasted"),
    ).collect()[0]
    c = clusters.agg(
        F.count("*").alias("clips"),
        F.countDistinct("cluster_id").alias("clusters"),
    ).collect()[0]
    wasted = int(g["wasted"])
    return {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "total_clips": int(c["clips"]),
        "total_clusters": int(c["clusters"]),
        "duplicate_clips": int(c["clips"]) - int(c["clusters"]),
        "exact_duplicate_groups": int(g["groups"]),
        "exact_duplicate_files": int(g["dup_files"]),
        "wasted_bytes": wasted,
        "wasted_human": human_size(wasted),
        "duration_sec": duration_sec,
    }


def write_json_report(summary: dict, detail: DataFrame | None, out_dir: str) -> None:
    """summary -> ``<out_dir>/summary.json`` (driver-side); detail rows ->
    ``<out_dir>/detail/`` via the distributed json sink."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "summary.json").write_text(json.dumps(summary, indent=2, sort_keys=True))
    if detail is not None:
        detail.write.mode("overwrite").json(str(out / "detail"))

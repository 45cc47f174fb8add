"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32), plus the
end-to-end clips dedup pipeline at TWO parallelism levels (local[8] vs
local[32] — the sandbox proxy for N vs 4N executors, per BASELINE.md) to
evidence the north_rule's scaling-efficiency >= 0.8 criterion.

Prints ONE JSON line:
  {"metric": "clips_per_sec_e2e", "value": <throughput at local[32]>,
   "unit": "clips/sec", "queries": {...per-query seconds...}, "sf": ...,
   "scaling": {"local8_clips_per_sec": ..., "local32_clips_per_sec": ...,
               "efficiency_n_to_4n": ...}, ...}

Every run starts from fresh checkpoint dirs (no cached computation);
only the deterministic input corpus is materialized once.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "text_langid",
    "doc_fingerprint",
    "sim_topk",
    "sim_ann_lsh",
    "events_windowed",
    "verify_classification",
    "moved_detection",
]


def _fresh_dir(tag: str) -> str:
    d = f"/tmp/quichash_bench/{tag}_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(d, ignore_errors=True)
    return d


def _run_pipeline_timed(master: str, shuffle_partitions: int, n_clips: int) -> dict:
    """Fresh session + fresh checkpoints; returns wall seconds and rates.

    The input corpus parquet is materialized once (cached across runs) so
    both parallelism levels read identical bytes.
    """
    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import run_pipeline
    from quichash_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(master, shuffle_partitions=shuffle_partitions, app_name=f"bench_{master}")
    try:
        clips = materialized_clips(spark, n_clips)
        clips.count()  # force input materialization outside the timed region
        ckpt = _fresh_dir(f"pipe_{master.replace('[', '_').rstrip(']')}")
        t0 = time.monotonic()
        res = run_pipeline(spark, clips, ckpt)
        n_clusters = res.clusters.select("cluster_id").distinct().count()
        wall = time.monotonic() - t0
        return {
            "wall_sec": round(wall, 2),
            "clips_per_sec": round(n_clips / wall, 2),
            "n_clips": n_clips,
            "n_clusters": n_clusters,
            "stage_seconds": res.stage_seconds,
        }
    finally:
        spark.stop()
        shutil.rmtree("/tmp/quichash_bench", ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_clips = max(200, int(sf * 50_000))

    from quichash_spark.entry_queries import QUERIES
    from quichash_spark.session import get_spark

    # --- headline queries at local[cpus] ---
    spark = get_spark(f"local[{cpus}]", shuffle_partitions=cpus, app_name="bench_queries")
    query_secs: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        t0 = time.monotonic()
        n = QUERIES[name](spark, sf_dir).count()
        query_secs[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {query_secs[name]}s ({n} rows)", file=sys.stderr)
    spark.stop()

    # --- clips pipeline at two parallelism levels (N=8 vs 4N=32) ---
    r8 = _run_pipeline_timed("local[8]", 16, n_clips)
    print(f"# pipeline local[8]: {r8['wall_sec']}s", file=sys.stderr)
    r32 = _run_pipeline_timed("local[32]", 64, n_clips)
    print(f"# pipeline local[32]: {r32['wall_sec']}s", file=sys.stderr)
    efficiency = round(r8["wall_sec"] / (4.0 * r32["wall_sec"]), 3)

    out = {
        "metric": "clips_per_sec_e2e",
        "value": r32["clips_per_sec"],
        "unit": "clips/sec",
        "queries": query_secs,
        "sf": sf,
        "n_clips": n_clips,
        "scaling": {
            "local8": r8,
            "local32": r32,
            "efficiency_n_to_4n": efficiency,
            "target": 0.8,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

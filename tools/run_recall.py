"""Re-runnable recall evidence at a chosen corpus size.

    python tools/run_recall.py [n=1000]

Runs the full Spark pipeline on the deterministic corpus and the
brute-force numpy oracle on the same indices; prints recall/precision of
cluster pairs.  n <= ~2000 keeps the O(n^2) oracle comfortable.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    from quichash_spark.fixtures import clips_dataframe
    from quichash_spark.oracle.numpy_oracle import cluster_pairs, oracle_clusters
    from quichash_spark.pipeline import run_pipeline
    from quichash_spark.session import get_spark

    spark = get_spark("local[8]", shuffle_partitions=16)
    ckpt = f"/tmp/qh_recall_run/n{n}"
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.time()
    res = run_pipeline(spark, clips_dataframe(spark, n), ckpt)
    got = {r["clip_id"]: r["cluster_id"] for r in res.clusters.collect()}
    pipeline_sec = time.time() - t0
    t0 = time.time()
    oracle_pairs = cluster_pairs(oracle_clusters(n))
    oracle_sec = time.time() - t0
    pipeline_pairs = cluster_pairs(got)
    inter = oracle_pairs & pipeline_pairs
    recall = len(inter) / max(1, len(oracle_pairs))
    precision = len(inter) / max(1, len(pipeline_pairs))
    print(
        f"n={n} oracle_pairs={len(oracle_pairs)} pipeline_pairs={len(pipeline_pairs)} "
        f"recall={recall:.4f} precision={precision:.4f} "
        f"(gate >= 0.99) pipeline={pipeline_sec:.1f}s oracle={oracle_sec:.1f}s"
    )
    assert recall >= 0.99, "RECALL GATE FAILED"


if __name__ == "__main__":
    main()

"""Standalone runner for bench.py's process-isolation experiment.

Round-3's full-bench artifacts recorded process_scaling 0.543/0.57 while
the BENCH/BASELINE.md narrative claimed ~1.0 "with the cap" — this tool
exists to settle that: it runs ONLY the experiment (box otherwise idle,
page cache warmed first, no pipeline residue), with the no-JVM kernel
control, and writes a timestamped JSON artifact under BENCH/ so every
scaling claim in BENCH/BASELINE.md traces to a committed number.

Usage:  python tools/run_prociso.py [n_clips] [rounds] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _fresh_dir, _process_isolation_experiment, _slice_corpus  # noqa: E402


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "BENCH",
                    "prociso_standalone.json"))

    from quichash_spark.fixtures import FIXTURE_VERSION

    corpus_dir = f"/tmp/quichash_clips/v{FIXTURE_VERSION}_n{n_clips}"
    if not os.path.isdir(corpus_dir):
        from quichash_spark.fixtures import materialized_clips
        from quichash_spark.session import get_spark

        spark = get_spark("local[8]", shuffle_partitions=16,
                          app_name="prociso_prep")
        materialized_clips(spark, n_clips)
        spark.stop()

    for f in os.listdir(corpus_dir):  # page-cache warm (see bench.main)
        with open(os.path.join(corpus_dir, f), "rb") as fh:
            while fh.read(1 << 24):
                pass

    slice_root = _fresh_dir("slices_prociso")
    slice_dirs = _slice_corpus(corpus_dir, 4, slice_root)
    t0 = time.monotonic()
    try:
        result = _process_isolation_experiment(slice_dirs, rounds=rounds)
    finally:
        shutil.rmtree(slice_root, ignore_errors=True)
    result["n_clips"] = n_clips
    result["rounds"] = rounds
    result["experiment_wall_sec"] = round(time.monotonic() - t0, 1)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Extra benchmarks for optimization work (guide §1): per-query noop-sink
isolation, repeated timed counts, formatted-plan dumps, and per-stage
pipeline timing.  The frozen driver harness stays in bench.py; numbers
from this file are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py queries [--names a,b,c] [--repeat 2] \
      [--plans-dir plans/r06 --suffix before] [--sink count|noop]
  python bench_extra.py pipeline [--n 400000] [--master local[8]] \
      [--shuffle-partitions 16] [--trials 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_ROOT, HEADLINE_QUERIES  # noqa: E402


def _fresh_dir(tag: str) -> str:
    d = f"{BENCH_ROOT}/{tag}_{uuid.uuid4().hex[:8]}"
    shutil.rmtree(d, ignore_errors=True)
    return d


def run_queries(args) -> None:
    from quichash_spark.entry_queries import QUERIES
    from quichash_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = args.names.split(",") if args.names else HEADLINE_QUERIES
    spark = get_spark(f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name="bench_extra_queries")

    def execute(df):
        if args.sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    # warmup pass (bench.py methodology: cold costs outside the timing)
    t_warm = time.monotonic()
    for name in names:
        execute(QUERIES[name](spark, sf_dir))
    print(f"# warmup pass: {time.monotonic() - t_warm:.1f}s", file=sys.stderr)

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"# wrote {path}", file=sys.stderr)

    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            execute(QUERIES[name](spark, sf_dir))
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"# {name}: min={min(samples)} {samples}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sink": args.sink, "queries": out}))


def run_pipeline_bench(args) -> None:
    from pyspark.sql import functions as F

    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import run_pipeline
    from quichash_spark.session import get_spark, stop_spark

    trials = []
    for _ in range(args.trials):
        stop_spark()
        spark = get_spark(args.master, shuffle_partitions=args.shuffle_partitions,
                          app_name="bench_extra_pipe")
        clips = materialized_clips(spark, args.n)
        clips.agg(F.sum(F.length("bytes"))).collect()  # page-cache warm
        warm = materialized_clips(spark, 200)
        warm_dir = _fresh_dir("warmup")
        run_pipeline(spark, warm, warm_dir)
        ckpt = _fresh_dir("pipe_extra")
        t0 = time.monotonic()
        res = run_pipeline(spark, clips, ckpt)
        wall = time.monotonic() - t0
        trials.append({"wall_sec": round(wall, 2),
                       "stage_seconds": res.stage_seconds})
        print(f"# trial: {wall:.2f}s {res.stage_seconds}", file=sys.stderr)
        spark.stop()
        shutil.rmtree(warm_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    best = min(trials, key=lambda t: t["wall_sec"])
    stage_min = {}
    for t in trials:
        for k, v in t["stage_seconds"].items():
            stage_min[k] = round(min(stage_min.get(k, float("inf")), v), 3)
    print(json.dumps({"master": args.master, "n": args.n, "best": best,
                      "stage_min": stage_min, "trials": trials}))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    q = sub.add_parser("queries")
    q.add_argument("--names", default=None)
    q.add_argument("--repeat", type=int, default=2)
    q.add_argument("--plans-dir", default=None)
    q.add_argument("--suffix", default="before")
    q.add_argument("--sink", default="count", choices=["count", "noop"])
    p = sub.add_parser("pipeline")
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--master", default="local[8]")
    p.add_argument("--shuffle-partitions", type=int, default=16)
    p.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()
    if args.cmd == "queries":
        run_queries(args)
    else:
        run_pipeline_bench(args)


if __name__ == "__main__":
    main()

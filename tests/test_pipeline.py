"""End-to-end pipeline tests: the binding recall gate (BASELINE.json:
dup-pair recall >= 0.99 vs the deterministic oracle at frozen config),
report invariants, and kill-and-resume (FIXTURES.md §4)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

N = 200


@pytest.fixture(scope="module")
def result(spark, tiny_clips, tmp_path_factory):
    from quichash_spark.pipeline import run_pipeline

    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    return run_pipeline(spark, tiny_clips, ckpt), ckpt


def test_recall_gate_vs_oracle(result):
    """THE binding gate: pipeline cluster pairs vs brute-force oracle."""
    from quichash_spark.oracle.numpy_oracle import cluster_pairs, oracle_clusters

    res, _ = result
    got = {r["clip_id"]: r["cluster_id"] for r in res.clusters.collect()}
    oracle_pairs = cluster_pairs(oracle_clusters(N))
    pipeline_pairs = cluster_pairs(got)
    recall = len(oracle_pairs & pipeline_pairs) / max(1, len(oracle_pairs))
    assert recall >= 0.99, f"recall {recall} below gate"
    # and no spurious merges (precision 1.0 on this corpus)
    assert pipeline_pairs <= oracle_pairs


def test_report_invariants(result):
    """Mirrors the reference's mathematical-consistency checks
    (/root/reference/src/compare.rs:965-1000)."""
    res, _ = result
    clusters = res.clusters
    # every clip assigned exactly once; sizes sum to corpus size
    assert clusters.count() == N
    assert clusters.select("clip_id").distinct().count() == N
    sizes = clusters.groupBy("cluster_id").count()
    assert sizes.agg(F.sum("count")).collect()[0][0] == N
    # exact-dup pairs are intra-cluster (recall floor, BASELINE.md)
    from quichash_spark.operators.exact_dedup import exact_duplicate_edges

    exact = exact_duplicate_edges(res.signatures)
    a = clusters.withColumnRenamed("clip_id", "clip_a").withColumnRenamed(
        "cluster_id", "ca"
    )
    b = clusters.withColumnRenamed("clip_id", "clip_b").withColumnRenamed(
        "cluster_id", "cb"
    )
    joined = exact.join(a, "clip_a").join(b, "clip_b")
    assert joined.filter(F.col("ca") != F.col("cb")).count() == 0
    # verified edges only between same-cluster members
    acc = res.verified.filter("accepted").join(a, "clip_a").join(b, "clip_b")
    assert acc.filter(F.col("ca") != F.col("cb")).count() == 0


def test_resume_appends_no_lineage_rows(spark, tiny_clips, result):
    """A fully-resumed run (every stage manifest-skipped) must not
    duplicate metrics-table lineage rows."""
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.pipeline import run_pipeline
    from quichash_spark.storage import CheckpointStore

    _, ckpt = result
    store = CheckpointStore(spark, ckpt, CLIPS_CONFIG)
    n_before = store.metrics().count()
    run_pipeline(spark, tiny_clips, ckpt)
    assert store.metrics().count() == n_before


def test_resume_skips_completed_stages(spark, tiny_clips, result):
    from quichash_spark.pipeline import run_pipeline

    res1, ckpt = result
    c1 = {r["clip_id"]: r["cluster_id"] for r in res1.clusters.collect()}
    # full rerun: everything skipped
    res2 = run_pipeline(spark, tiny_clips, ckpt)
    assert all(s == 0.0 for s in res2.stage_seconds.values())
    # kill-and-resume: invalidate the tail stages, rerun, identical output
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.storage import CheckpointStore

    store = CheckpointStore(spark, ckpt, CLIPS_CONFIG)
    store.invalidate("verified_edges")
    store.invalidate("clusters")
    res3 = run_pipeline(spark, tiny_clips, ckpt)
    assert res3.stage_seconds["signatures"] == 0.0
    assert res3.stage_seconds["candidates"] == 0.0
    assert res3.stage_seconds["verified_edges"] > 0
    c3 = {r["clip_id"]: r["cluster_id"] for r in res3.clusters.collect()}
    assert c1 == c3


def test_config_change_invalidates_checkpoints(spark, tiny_clips, result):
    from dataclasses import replace

    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.storage import CheckpointStore

    _, ckpt = result
    other = replace(CLIPS_CONFIG, k_shingle=4)
    store = CheckpointStore(spark, ckpt, other)
    assert not store.is_complete("signatures")


def test_metrics_lineage_rows(spark, result):
    res, ckpt = result
    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.storage import CheckpointStore

    store = CheckpointStore(spark, ckpt, CLIPS_CONFIG)
    m = store.metrics()
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    assert {"signatures", "candidates", "verified_edges", "clusters"} <= stages
    assert m.filter(F.col("rows_out") < 0).count() == 0
    # per-stage sums of the LATEST lineage batch equal the actual
    # checkpointed table counts (earlier tests invalidate + rerun tail
    # stages, so stale batches exist alongside — latest_metrics filters)
    sums = {
        r["stage"]: r["s"]
        for r in store.latest_metrics()
        .groupBy("stage")
        .agg(F.sum("rows_out").alias("s"))
        .collect()
    }
    for stage in ("signatures", "candidates", "verified_edges", "clusters"):
        assert sums[stage] == store.read(stage).count(), stage


def test_partitioning_equivalence(spark, tmp_path_factory):
    """Reference parallel==sequential test (src/scan.rs:960-1028): the
    cluster table is identical for different input partitionings."""
    from quichash_spark.fixtures import clips_dataframe
    from quichash_spark.pipeline import run_pipeline

    d1 = str(tmp_path_factory.mktemp("p2"))
    d2 = str(tmp_path_factory.mktemp("p13"))
    a = run_pipeline(spark, clips_dataframe(spark, 100, partitions=2), d1).clusters
    b = run_pipeline(spark, clips_dataframe(spark, 100, partitions=13), d2).clusters
    ca = {r["clip_id"]: r["cluster_id"] for r in a.collect()}
    cb = {r["clip_id"]: r["cluster_id"] for r in b.collect()}
    assert ca == cb
    shutil.rmtree(d1, ignore_errors=True)
    shutil.rmtree(d2, ignore_errors=True)


def test_emulate_executor_verify_mode_partitions_exactly(spark, tmp_path):
    """The bench harness's verify-mode executor processes (disjoint
    pmod(xxhash64(pair_id)) residue classes) must union to exactly the
    single-session verified-edge set — the property that makes the
    process-level verify emulation a faithful shuffle stand-in."""
    import json
    import os
    import subprocess
    import sys
    import time

    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import run_pipeline

    ckpt = str(tmp_path / "vm_ckpt")
    clips = materialized_clips(spark, 500)
    run_pipeline(spark, clips, ckpt)
    full = spark.read.parquet(ckpt + "/verified_edges").count()

    sync = str(tmp_path / "vm_sync")
    os.makedirs(sync)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for i in range(2):
        cmd = [sys.executable, os.path.join(repo, "jobs", "emulate_executor.py"),
               "--mode", "verify", "--inputs", "/tmp/quichash_clips/v2_n500",
               "--output", str(tmp_path / f"vm_out_{i}"),
               "--sync-dir", sync, "--idx", str(i), "--n-procs", "2",
               "--candidates", ckpt + "/candidates",
               "--signatures", ckpt + "/signatures",
               "--n-candidates", "500"]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.DEVNULL, text=True))
    t0 = time.monotonic()
    while sum(os.path.exists(os.path.join(sync, f"ready_{i}")) for i in range(2)) < 2:
        assert all(p.poll() is None or p.returncode == 0 for p in procs)
        assert time.monotonic() - t0 < 240
        time.sleep(0.1)
    with open(os.path.join(sync, "go"), "w") as f:
        f.write("go")
    outs = [json.loads(p.communicate(timeout=300)[0].strip().splitlines()[-1])
            for p in procs]
    assert sum(o["rows"] for o in outs) == full > 0


def test_incremental_update_equals_batch(spark, tmp_path):
    """incremental_update must reproduce the batch transitive closure
    exactly — including pairs that STRADDLE the old/new boundary (the
    175 cut splits a planted audio near-dup pair: base 174 is prior,
    noisy copy 175 arrives in the increment and must join the old
    cluster)."""
    import shutil

    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import incremental_update, run_pipeline

    clips = materialized_clips(spark, 200)
    for cut in (160, 175):
        prior_dir = str(tmp_path / f"prior_{cut}")
        delta_dir = str(tmp_path / f"delta_{cut}")
        batch_dir = str(tmp_path / f"batch_{cut}")
        for d in (prior_dir, delta_dir, batch_dir):
            shutil.rmtree(d, ignore_errors=True)
        boundary = f"clip_{cut:08d}"
        run_pipeline(spark, clips.filter(clips.clip_id < boundary), prior_dir)
        inc = incremental_update(
            spark, prior_dir, clips.filter(clips.clip_id >= boundary),
            clips, delta_dir,
        )
        batch = run_pipeline(spark, clips, batch_dir)
        got = {r["clip_id"]: r["cluster_id"] for r in inc.clusters.collect()}
        want = {r["clip_id"]: r["cluster_id"] for r in batch.clusters.collect()}
        assert got == want, cut
        # the straddling pair really crosses the boundary and clusters
        if cut == 175:
            assert got["clip_00000175"] == got["clip_00000174"]
            assert got["clip_00000175"] != "clip_00000175"


def test_incremental_requires_complete_prior(spark, tmp_path):
    import pytest as _pytest

    from quichash_spark.fixtures import materialized_clips
    from quichash_spark.pipeline import incremental_update

    clips = materialized_clips(spark, 200)
    with _pytest.raises(ValueError, match="prior checkpoint"):
        incremental_update(
            spark, str(tmp_path / "nonexistent"), clips, clips,
            str(tmp_path / "delta"),
        )

"""Streaming == batch equivalence for the windowed event aggregation."""

from __future__ import annotations

from quichash_spark.streaming.events import stream_windowed_event_stats, windowed_event_stats

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    import shutil

    # the file-stream source requires a directory of files
    src_dir = tmp_path / "events_src"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "part-0.parquet")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_stats(spark.read.parquet(str(src_dir))).collect()
    }
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in stream_windowed_event_stats(
            spark, str(src_dir), str(tmp_path / "ckpt")
        ).collect()
    }
    assert batch == streamed
    assert len(batch) > 0


def test_stream_near_dup_band_state(spark, tmp_path):
    """Incremental LSH dedup (band-key state): a NEAR-duplicate — noisy
    PCM, not byte-identical — arriving in a LATER micro-batch joins the
    original's cluster via the shared text band keys (VERDICT r2 #6)."""
    from quichash_spark.fixtures import CLIPS_SCHEMA
    from quichash_spark.fixtures.clips import clip_row
    from quichash_spark.streaming.cluster import stream_near_dup_assign

    src = tmp_path / "clips_nd"
    src.mkdir()
    # micro-batch 1: the audio-near base (off 14) + unique clips
    b1 = spark.createDataFrame([clip_row(i) for i in (0, 4, 14)], CLIPS_SCHEMA)
    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    # micro-batch 2: its SNR-33-40dB noisy near-duplicate (off 15) + unique
    b2 = spark.createDataFrame([clip_row(i) for i in (6, 15)], CLIPS_SCHEMA)
    b2.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    got = stream_near_dup_assign(
        spark,
        str(src) + "/*/",
        str(tmp_path / "ckpt_nd"),
        str(tmp_path / "out_nd"),
        max_files_per_trigger=1,
    )
    rows = {r["clip_id"]: r for r in got.collect()}
    assert len(rows) == 5
    a, b = rows["clip_00000014"], rows["clip_00000015"]
    # near-duplicates share a cluster; the rep is one of the pair
    assert a["cluster_id"] == b["cluster_id"]
    assert a["cluster_id"] in ("clip_00000014", "clip_00000015")
    assert a["joined_existing"] or b["joined_existing"]
    # unique clips form their own clusters
    for i in (0, 4, 6):
        cid = f"clip_{i:08d}"
        assert rows[cid]["cluster_id"] == cid
        assert not rows[cid]["joined_existing"]


def test_stream_embed_neardup_band_state(spark, tmp_path):
    """Incremental PERCEPTUAL dedup (hyperplane buckets over streaming
    MFCC embeddings): the SNR-33-40dB noisy copy arriving in a LATER
    micro-batch joins the original's cluster through a shared
    (table, bucket) key that was seeded batches earlier."""
    from quichash_spark.fixtures import CLIPS_SCHEMA
    from quichash_spark.fixtures.clips import clip_row
    from quichash_spark.streaming.cluster import stream_embed_neardup_assign

    src = tmp_path / "clips_emb"
    src.mkdir()
    b1 = spark.createDataFrame([clip_row(i) for i in (0, 4, 14)], CLIPS_SCHEMA)
    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    b2 = spark.createDataFrame([clip_row(i) for i in (6, 15)], CLIPS_SCHEMA)
    b2.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    got = stream_embed_neardup_assign(
        spark,
        str(src) + "/*/",
        str(tmp_path / "ckpt_emb"),
        str(tmp_path / "out_emb"),
        max_files_per_trigger=1,
    )
    rows = {r["clip_id"]: r for r in got.collect()}
    assert len(rows) == 5
    a, b = rows["clip_00000014"], rows["clip_00000015"]
    assert a["cluster_id"] == b["cluster_id"]
    assert a["cluster_id"] in ("clip_00000014", "clip_00000015")
    assert a["joined_existing"] or b["joined_existing"]


def test_stream_scan_to_db_matches_batch(spark, tmp_path):
    """Streaming scan->DB sink: the standard-format database accumulated
    across micro-batches equals the batch scan of the same corpus, and
    parses back through the format-aware reader."""
    from pyspark.sql import functions as F

    from quichash_spark.fixtures import CLIPS_SCHEMA
    from quichash_spark.fixtures.clips import clip_row
    from quichash_spark.streaming.scan_sink import stream_scan_to_db

    src = tmp_path / "clips_db"
    src.mkdir()
    b1 = spark.createDataFrame([clip_row(i) for i in range(0, 4)], CLIPS_SCHEMA)
    b2 = spark.createDataFrame([clip_row(i) for i in range(4, 7)], CLIPS_SCHEMA)
    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    b2.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    db = stream_scan_to_db(
        spark, str(src) + "/*/", str(tmp_path / "ckpt_db"),
        str(tmp_path / "db_out"), max_files_per_trigger=1,
    )
    got = {r["path"]: r for r in db.collect()}
    expect = {
        r["clip_id"]: r["h"]
        for r in b1.unionByName(b2)
        .select("clip_id", F.sha2("bytes", 256).alias("h"))
        .collect()
    }
    assert len(got) == 7
    for cid, h in expect.items():
        assert got[cid]["hash"] == h
        assert got[cid]["algorithm"] == "sha256"
        assert got[cid]["valid"] and not got[cid]["fast_mode"]

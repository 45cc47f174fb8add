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

"""Spectral landmark fingerprints: kernel properties (shift/noise
robustness), the alignment-histogram matcher, and the cap contract."""

from __future__ import annotations

import numpy as np
import pytest

from quichash_spark.functions.fingerprint import (
    FP_CONFIG,
    FingerprintConfig,
    landmark_hashes,
)


def _tone_mix(seed: int, sr: int = 8000, dur_s: float = 1.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur_s)) / sr
    sig = np.zeros(t.size)
    for _ in range(3):
        sig += float(rng.uniform(2000, 8000)) * np.sin(
            2 * np.pi * float(rng.uniform(100, 3500)) * t + float(rng.uniform(0, 6))
        )
    return np.clip(sig, -32000, 32000).astype(np.int16)


def _delta_hist(lm_a: np.ndarray, lm_b: np.ndarray):
    """Counter of anchor-time offsets over all hash collisions."""
    from collections import Counter

    by_hash: dict[int, list[int]] = {}
    for h, t in lm_b:
        by_hash.setdefault(int(h), []).append(int(t))
    ctr: Counter = Counter()
    for h, t in lm_a:
        for tb in by_hash.get(int(h), ()):
            ctr[int(t) - tb] += 1
    return ctr


def test_landmarks_deterministic_and_bounded():
    pcm = _tone_mix(1)
    a, b = landmark_hashes(pcm), landmark_hashes(pcm)
    assert np.array_equal(a, b)
    assert a.shape[0] > 0
    # hash packs (f<<14 | f<<6 | dt): 22 bits max
    assert int(a[:, 0].max()) < (1 << 22)
    assert int(a[:, 0].min()) >= 0


def test_time_shift_moves_anchors_not_hashes():
    pcm = _tone_mix(2)
    k = 6  # prepend exactly k hops of silence
    shifted = np.concatenate(
        [np.zeros(k * FP_CONFIG.hop, dtype=np.int16), pcm]
    )
    ctr = _delta_hist(landmark_hashes(shifted), landmark_hashes(pcm))
    delta, cnt = max(ctr.items(), key=lambda kv: kv[1])
    assert delta == k
    assert cnt >= FP_CONFIG.min_matches * 4  # overwhelming alignment


def test_noise_robustness_at_20db():
    pcm = _tone_mix(3)
    x = pcm.astype(float)
    rms = np.sqrt((x**2).mean())
    rng = np.random.default_rng(99)
    noisy = np.clip(x + rng.normal(0, rms / 10, x.size), -32000, 32000).astype(
        np.int16
    )
    # stationary tone mixtures self-repeat across frames, so several
    # deltas collect collisions; the claim is that the TRUE alignment
    # (delta 0) survives the noise above the match threshold
    ctr = _delta_hist(landmark_hashes(noisy), landmark_hashes(pcm))
    assert ctr[0] >= FP_CONFIG.min_matches


def test_unrelated_clips_stay_below_threshold():
    ctr = _delta_hist(
        landmark_hashes(_tone_mix(4)), landmark_hashes(_tone_mix(5))
    )
    assert max(ctr.values(), default=0) < FP_CONFIG.min_matches


def test_degenerate_inputs():
    assert landmark_hashes(None).shape == (0, 2)
    assert landmark_hashes(np.array([], dtype=np.int16)).shape == (0, 2)
    # silence: no peaks above the dynamic-range floor of... silence is
    # all equal bins -> strict local maxima cannot fire
    assert landmark_hashes(np.zeros(4096, dtype=np.int16)).shape[0] == 0


# ---------------------------------------------------------------------------
# matcher logic on a hand-built landmark table (kernel-independent)
# ---------------------------------------------------------------------------

def _fps_df(spark, rows):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "fp_hash", "t_anchor"])
    )


def test_fingerprint_pairs_alignment_and_cap(spark):
    from quichash_spark.operators.fingerprint_match import (
        bucket_stats,
        fingerprint_pairs,
    )

    cfg = FingerprintConfig(min_matches=5, max_bucket=10)
    rows = []
    # A and B: 6 shared hashes, consistent delta 3 -> a pair
    for h in range(100, 106):
        rows.append(("A", h, 10 + h))
        rows.append(("B", h, 7 + h))
    # A and C: 6 shared hashes, scattered deltas -> no pair
    for j, h in enumerate(range(200, 206)):
        rows.append(("A", h, 50 + j))
        rows.append(("C", h, 50 + 7 * j))
    # hash 999 on 11 clips (> max_bucket=10): capped out entirely,
    # otherwise D/E would reach min_matches via it alone
    for k in range(11):
        rows.append((f"Z{k:02d}", 999, 5))
    fps = _fps_df(spark, rows)
    got = {
        (r["clip_a"], r["clip_b"]): r.asDict()
        for r in fingerprint_pairs(fps, cfg).collect()
    }
    assert set(got) == {("A", "B")}
    assert got[("A", "B")]["aligned_matches"] == 6
    assert got[("A", "B")]["delta_frames"] == 3
    stats = bucket_stats(fps, cfg).collect()[0]
    assert stats["n_dropped_hashes"] == 1
    assert stats["n_dropped_landmarks"] == 11


def test_spark_fingerprints_partition_invariant(spark):
    from quichash_spark.fixtures import clips_dataframe
    from quichash_spark.functions.fingerprint import compute_fingerprints

    n = 24
    a = compute_fingerprints(clips_dataframe(spark, n, partitions=2))
    b = compute_fingerprints(clips_dataframe(spark, n, partitions=8))
    sa = {tuple(r) for r in a.collect()}
    sb = {tuple(r) for r in b.collect()}
    assert sa == sb
    assert len(sa) > 0


def test_spark_pairs_match_sequential_replica(spark):
    from quichash_spark.fixtures import clips_dataframe
    from quichash_spark.functions.fingerprint import compute_fingerprints
    from quichash_spark.operators.fingerprint_match import fingerprint_pairs
    from quichash_spark.oracle.fixture import sequential_fp_pairs

    n = 60
    fps = compute_fingerprints(clips_dataframe(spark, n))
    got = {
        (r["clip_a"], r["clip_b"]): (
            r["aligned_matches"], r["total_matches"], r["delta_frames"]
        )
        for r in fingerprint_pairs(fps).collect()
    }
    exp_df = sequential_fp_pairs(n)
    exp = {
        (r.clip_a, r.clip_b): (
            int(r.aligned_matches), int(r.total_matches), int(r.delta_frames)
        )
        for r in exp_df.itertuples()
    }
    assert got == exp
    assert len(got) > 0  # the fixture corpus genuinely contains dups

"""Content-defined chunking dedup (operators/cdc_dedup.py).

The vectorized windowed-sum chunker and the replica's scalar recurrence
are independent formulations of the same Gear CDC definition — proven
equal here; the offset-invariance property (the reason CDC exists) is
asserted directly; the Spark operator is value-checked against the
replica on the real documents table."""

from __future__ import annotations

import numpy as np
import pytest

from quichash_spark.operators.cdc_dedup import (
    AVG_BITS,
    CDC_FOOTER,
    MAX_CHUNK,
    MIN_CHUNK,
    chunk_spans,
    gear_hash_positions,
)
from quichash_spark.oracle.fixture import _scalar_chunks, sequential_cdc_stats

SF_DIR = "/root/testdata/sf0.001"


def test_vector_chunker_equals_scalar_recurrence():
    rng = np.random.default_rng(21)
    for _ in range(120):
        n = int(rng.integers(0, 1500))
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        vec = [data[s:e] for s, e in chunk_spans(data)]
        assert b"".join(vec) == data
        assert vec == _scalar_chunks(data)


def test_chunk_bounds_and_coverage():
    rng = np.random.default_rng(22)
    data = bytes(rng.integers(0, 256, 5000, dtype=np.uint8))
    spans = chunk_spans(data)
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    for (s, e), (s2, _) in zip(spans, spans[1:]):
        assert e == s2
    lens = [e - s for s, e in spans]
    assert all(length <= MAX_CHUNK for length in lens)
    assert all(length >= MIN_CHUNK for length in lens[:-1])
    # mean near 2^AVG_BITS (loose: MIN/MAX clamping shifts it)
    assert 32 <= np.mean(lens) <= 4 * (1 << AVG_BITS)


def test_offset_invariance_of_shared_suffix():
    """The CDC property: the same byte run chunks identically past one
    rolling window + one max chunk, regardless of what precedes it."""
    tail = (CDC_FOOTER * 3).encode("utf-8")
    rng = np.random.default_rng(23)
    sets = []
    for plen in (0, 7, 131, 400):
        prefix = bytes(rng.integers(0, 256, plen, dtype=np.uint8))
        data = prefix + tail
        stable_from = len(prefix) + 64 + MAX_CHUNK
        sets.append({
            data[s:e] for s, e in chunk_spans(data) if s >= stable_from
        })
    common = set.intersection(*sets)
    # every fully-stable chunk of the longest prefix's stream is found
    # in all the others (identical content, different offsets)
    assert len(common) >= 2
    assert sum(len(c) for c in common) >= len(tail) - (64 + 2 * MAX_CHUNK)


def test_boilerplate_detected_as_duplicated_bytes():
    df = sequential_cdc_stats(SF_DIR)
    foot = df[df.doc_id % 3 == 0]
    plain = df[(df.doc_id % 3 != 0) & (df.doc_id % 7 != 0)]
    assert (foot.dup_bytes > 0).all()
    assert foot.dup_bytes.mean() > 4 * max(1.0, plain.dup_bytes.mean())


@pytest.mark.usefixtures("spark")
def test_spark_cdc_matches_replica(spark):
    from quichash_spark.entry_queries import q_cdc_dup_stats

    got = (
        q_cdc_dup_stats(spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = sequential_cdc_stats(SF_DIR).sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_empty_and_tiny_inputs():
    assert chunk_spans(b"") == []
    assert _scalar_chunks(b"") == []
    assert chunk_spans(b"ab") == [(0, 2)]
    h = gear_hash_positions(b"xyz")
    assert h.shape == (3,) and h.dtype == np.uint64


def test_audio_cdc_planted_signal():
    """Exact twins (off 12/13) and identical-PCM text pairs (16/17)
    show full duplication; prefix slices (18/19) substantial; noisy
    copies (14/15) contribute nothing to each other."""
    from quichash_spark.oracle.fixture import sequential_audio_cdc

    df = sequential_audio_cdc(40).set_index("clip_id")
    for b in (0, 20):
        twin_a = df.loc[f"clip_{b + 12:08d}"]
        twin_b = df.loc[f"clip_{b + 13:08d}"]
        assert twin_a.dup_ppm == 1_000_000 and twin_b.dup_ppm == 1_000_000
        base = df.loc[f"clip_{b + 18:08d}"]
        sliced = df.loc[f"clip_{b + 19:08d}"]
        # the slice shares all but its tail chunk with the base
        assert sliced.dup_bytes >= sliced.total_bytes // 2
        assert base.dup_bytes > 0


@pytest.mark.usefixtures("spark")
def test_spark_audio_cdc_matches_replica(spark, tiny_clips):
    from quichash_spark.operators.cdc_dedup import (
        cdc_dup_stats,
        compute_pcm_cdc_chunks,
    )
    from quichash_spark.oracle.fixture import sequential_audio_cdc

    got = (
        cdc_dup_stats(compute_pcm_cdc_chunks(tiny_clips), id_col="clip_id")
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    want = (
        sequential_audio_cdc(200).sort_values("clip_id").reset_index(drop=True)
    )
    assert got.equals(want.astype(got.dtypes.to_dict()))

"""Candidate verification (stage 6 of SURVEY.md §7.0).

Per-row invariant from BASELINE.json input_hint: decoded-PCM allclose
(SNR >= 30 dB over the common prefix) AND transcript relatedness, where
relatedness is one of

- canonical transcripts equal,
- SimHash Hamming distance <= r (text near-duplicates), or
- token-level containment (one transcript a contiguous slice of the other)

— the three candidate channels the pipeline generates; a pair is accepted
iff the audio gate AND a text relation both hold.  The join shape mirrors
the reference's verify full-outer classification (J1,
/root/reference/src/verify.rs:183-261): candidates are joined back to the
clips table and re-checked against primary data, exactly like quichash
re-hashes every DB entry against the filesystem (src/verify.rs:213-236).

Scale notes: this is the only stage that re-reads audio bytes after
signatures; bytes travel through two hash-partitioned joins keyed on
clip_id and are decoded in bounded Arrow batches (mapInPandas).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from quichash_spark.config import DedupConfig
from quichash_spark.functions import audio, hashing

VERIFIED_SCHEMA = StructType(
    [
        StructField("clip_a", StringType()),
        StructField("clip_b", StringType()),
        StructField("source", StringType()),
        StructField("snr_db", DoubleType()),
        StructField("transcript_equal", BooleanType()),
        StructField("containment", BooleanType()),
        StructField("hamming", IntegerType()),
        StructField("accepted", BooleanType()),
    ]
)


def _canon(t: str | None) -> str:
    return " ".join(t.split()) if isinstance(t, str) else ""


def _token_contained(a: str, b: str) -> bool:
    if not a or not b or a == b:
        return False
    small, big = (a, b) if len(a) <= len(b) else (b, a)
    return f" {big} ".find(f" {small} ") >= 0


def verify_pair(
    pcm_a,
    pcm_b,
    transcript_a: str | None,
    transcript_b: str | None,
    cfg: DedupConfig,
) -> dict:
    """Frozen verification kernel — shared verbatim with the numpy oracle."""
    ca, cb = _canon(transcript_a), _canon(transcript_b)
    if pcm_a is None or pcm_b is None:
        snr = float("-inf")
    else:
        # reference signal = the longer clip (containment pairs are prefix
        # slices); ties broken by position so the result is symmetric for
        # equal lengths given (a, b) ordered by clip_id upstream
        ref, other = (pcm_a, pcm_b) if pcm_a.size >= pcm_b.size else (pcm_b, pcm_a)
        snr = audio.snr_db(ref, other, cap=cfg.snr_cap_db)
    t_eq = ca == cb
    cont = _token_contained(ca, cb)
    ham = hashing.hamming64(hashing.simhash64_i64(ca), hashing.simhash64_i64(cb))
    accepted = (snr >= cfg.snr_gate_db) and (t_eq or cont or ham <= cfg.simhash_hamming_r)
    return {
        "snr_db": float(snr),
        "transcript_equal": t_eq,
        "containment": cont,
        "hamming": int(ham),
        "accepted": bool(accepted),
    }


def verify_candidates(
    candidates: DataFrame, clips: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """candidates(clip_a, clip_b, source) x clips -> verified edges."""
    payload = clips.select("clip_id", "bytes", "codec", "transcript")
    joined = (
        candidates.join(
            payload.select(
                F.col("clip_id").alias("clip_a"),
                F.col("bytes").alias("bytes_a"),
                F.col("codec").alias("codec_a"),
                F.col("transcript").alias("transcript_a"),
            ),
            "clip_a",
        )
        .join(
            payload.select(
                F.col("clip_id").alias("clip_b"),
                F.col("bytes").alias("bytes_b"),
                F.col("codec").alias("codec_b"),
                F.col("transcript").alias("transcript_b"),
            ),
            "clip_b",
        )
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                pa = audio.decode_pcm(r.bytes_a, r.codec_a)
                pb = audio.decode_pcm(r.bytes_b, r.codec_b)
                v = verify_pair(pa, pb, r.transcript_a, r.transcript_b, cfg)
                rows.append(
                    {"clip_a": r.clip_a, "clip_b": r.clip_b, "source": r.source, **v}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in VERIFIED_SCHEMA.fields])

    return joined.mapInPandas(batches, VERIFIED_SCHEMA)

"""Arrow-vectorized Spark kernels (pandas UDF / mapInPandas wrappers).

Per BASELINE.json input_hint: NO per-row Python UDFs — every Python kernel
here receives Arrow batches.  The heavy math is numpy inside
:mod:`quichash_spark.functions.hashing` / ``audio``; these wrappers only
adapt batch iteration and schemas.

Batch-memory note (100 TB design point): audio ``bytes`` rows are large, so
signature extraction uses ``mapInPandas`` (iterator-of-batches) with
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounded by the session
factory — decode never materializes more than one bounded batch per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from quichash_spark.config import DedupConfig
from quichash_spark.functions import audio, hashing

SIGNATURE_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("content_hash", StringType()),
        StructField("pcm_hash", StringType()),
        StructField("minhash_text", ArrayType(LongType())),
        StructField("minhash_pcm", ArrayType(LongType())),
        StructField("band_keys_text", ArrayType(LongType())),
        StructField("band_keys_pcm", ArrayType(LongType())),
        StructField("simhash", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("transcript", StringType()),
        StructField("decode_ok", BooleanType()),
    ]
)


def compute_signatures(clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """clips -> signatures (stage 1 of SURVEY.md §7.0).

    One pass over the bytes computes every signature (the reference's
    single-read multi-hash pattern, /root/reference/src/hash.rs:814-967,
    re-expressed as one Arrow batch through several numpy kernels).
    ``transcript`` is carried forward canonicalized (single-space joined)
    so downstream stages never re-read the big ``bytes`` column.
    """
    a_params, b_params = hashing.minhash_params(cfg)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # batched execution, output-identical to the row-at-a-time
            # kernels (tests assert equality): decode per row (variable
            # length), ONE concatenated FFT pass for the whole batch, ONE
            # multiply-reduceat per MinHash channel, ONE band-key fold.
            canons: list[str] = []
            pcms: list[np.ndarray | None] = []
            for data, codec, transcript in zip(
                pdf["bytes"], pdf["codec"], pdf["transcript"]
            ):
                canons.append(
                    " ".join(transcript.split()) if isinstance(transcript, str) else ""
                )
                pcms.append(audio.decode_pcm(data, codec))
            words_list = audio.pcm_frame_bits_batch(pcms, cfg)
            text_sets = [hashing.shingle_hashes(c, cfg.k_shingle) for c in canons]
            pcm_sets = [
                audio.shingles_from_words(w, cfg)
                if p is not None
                else np.empty(0, dtype=np.uint64)
                for p, w in zip(pcms, words_list)
            ]
            mh_text = hashing.minhash_signature_batch(text_sets, a_params, b_params)
            mh_pcm = hashing.minhash_signature_batch(pcm_sets, a_params, b_params)
            # band keys precomputed here (vectorized numpy) so the LSH
            # stage is a pure explode+shuffle — no per-row JVM hashing
            # re-evaluated on every plan branch
            bk_text = hashing.band_hashes_batch(mh_text, cfg.bands, cfg.rows)
            bk_pcm = hashing.band_hashes_batch(mh_pcm, cfg.bands, cfg.rows)
            ok = [p is not None for p in pcms]
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "content_hash": [
                        hashing.content_hash(p, c) if p is not None else None
                        for p, c in zip(pcms, canons)
                    ],
                    # pcm-only digest: lets verification decide
                    # identical-audio pairs without ever re-reading bytes
                    "pcm_hash": [
                        hashing.content_hash(p, "") if p is not None else None
                        for p in pcms
                    ],
                    "minhash_text": list(mh_text.view(np.int64)),
                    "minhash_pcm": list(mh_pcm.view(np.int64)),
                    "band_keys_text": list(bk_text),
                    "band_keys_pcm": list(bk_pcm),
                    "simhash": [hashing.simhash64_i64(c) for c in canons],
                    "n_frames": [int(w.size) for w in words_list],
                    "n_samples": [int(p.size) if p is not None else 0 for p in pcms],
                    "transcript": canons,
                    "decode_ok": ok,
                }
            )

    cols = ["clip_id", "bytes", "codec", "transcript"]
    # few fat Python tasks: each Arrow-exchange task pays ~150ms of fixed
    # protocol overhead, so target ~3 tasks/core (coalesce = no shuffle;
    # it only ever reduces the scan's partition count)
    target = clips.sparkSession.sparkContext.defaultParallelism * 3
    return clips.select(*cols).coalesce(target).mapInPandas(batches, SIGNATURE_SCHEMA)

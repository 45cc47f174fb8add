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
            out: dict[str, list] = {f.name: [] for f in SIGNATURE_SCHEMA.fields}
            for clip_id, data, codec, transcript in zip(
                pdf["clip_id"], pdf["bytes"], pdf["codec"], pdf["transcript"]
            ):
                transcript = transcript if isinstance(transcript, str) else ""
                canon = " ".join(transcript.split())
                pcm = audio.decode_pcm(data, codec)
                ok = pcm is not None
                if ok:
                    chash = hashing.content_hash(pcm, canon)
                    # pcm-only digest: lets verification decide
                    # identical-audio pairs without ever re-reading bytes
                    phash = hashing.content_hash(pcm, "")
                    words = audio.pcm_frame_bits(pcm, cfg)  # one FFT pass
                    mh_pcm = hashing.minhash_signature(
                        audio.shingles_from_words(words, cfg), a_params, b_params
                    )
                    n_frames = int(words.size)
                    n_samples = int(pcm.size)
                else:
                    chash = None
                    phash = None
                    mh_pcm = np.full(cfg.num_perm, hashing.EMPTY_SLOT, np.uint64)
                    n_frames = 0
                    n_samples = 0
                mh_text = hashing.minhash_signature(
                    hashing.shingle_hashes(canon, cfg.k_shingle), a_params, b_params
                )
                out["clip_id"].append(clip_id)
                out["content_hash"].append(chash)
                out["pcm_hash"].append(phash)
                out["minhash_text"].append(mh_text.view(np.int64))
                out["minhash_pcm"].append(mh_pcm.view(np.int64))
                # band keys precomputed here (vectorized numpy) so the
                # LSH stage is a pure explode+shuffle — no per-row JVM
                # hashing re-evaluated on every plan branch
                out["band_keys_text"].append(
                    hashing.band_hashes(mh_text, cfg.bands, cfg.rows)
                )
                out["band_keys_pcm"].append(
                    hashing.band_hashes(mh_pcm, cfg.bands, cfg.rows)
                )
                out["simhash"].append(hashing.simhash64_i64(canon))
                out["n_frames"].append(n_frames)
                out["n_samples"].append(n_samples)
                out["transcript"].append(canon)
                out["decode_ok"].append(ok)
            yield pd.DataFrame(out)

    cols = ["clip_id", "bytes", "codec", "transcript"]
    # few fat Python tasks: each Arrow-exchange task pays ~150ms of fixed
    # protocol overhead, so target ~3 tasks/core (coalesce = no shuffle;
    # it only ever reduces the scan's partition count)
    target = clips.sparkSession.sparkContext.defaultParallelism * 3
    return clips.select(*cols).coalesce(target).mapInPandas(batches, SIGNATURE_SCHEMA)

"""Arrow-vectorized Spark kernels (pandas UDF / mapInPandas wrappers).

Per BASELINE.json input_hint: NO per-row Python UDFs — every Python kernel
here receives Arrow batches.  The heavy math is numpy inside
:mod:`quichash_spark.functions.hashing` / ``audio``; these wrappers only
adapt batch iteration and schemas.

Batch-memory note (100 TB design point): audio ``bytes`` rows are large, so
signature extraction uses ``mapInArrow`` (iterator-of-record-batches,
zero-copy payload views) with
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


#: pipeline-internal projection: the dedup stages read band keys and
#: scalars only, so the checkpoint need not carry the raw 128-perm
#: MinHash vectors (~2 KB/row of incompressible longs — ~400 MB of
#: write+read+exchange per 200k clips)
SLIM_SIGNATURE_SCHEMA = StructType(
    [f for f in SIGNATURE_SCHEMA.fields if not f.name.startswith("minhash_")]
)


def _schema_for(include_minhash: bool, include_embedding: bool) -> StructType:
    base = SIGNATURE_SCHEMA if include_minhash else SLIM_SIGNATURE_SCHEMA
    if not include_embedding:
        return base
    from pyspark.sql.types import FloatType

    return StructType(
        list(base.fields) + [StructField("embedding", ArrayType(FloatType()))]
    )


def signature_record_batch(
    rb, cfg: DedupConfig, a_params, b_params, include_minhash: bool = True,
    include_embedding: bool = False,
):
    """One input RecordBatch (clip_id, bytes, codec, transcript) -> one
    signature RecordBatch.  THE signature kernel — shared verbatim by the
    ``compute_signatures`` Spark stage and the no-JVM control in
    ``jobs/emulate_executor.py --mode kernel`` (same compute, same memory
    traffic, no Spark/JVM in the loop), so the process-isolation control
    measures exactly the work the real stage does.

    The per-row ``bytes`` cells are read as ZERO-COPY memoryviews straight
    off the Arrow data buffer (offsets decoded once per batch), skipping
    the pandas conversion that materializes every payload as a Python
    bytes object on the way in and re-encodes arrays on the way out —
    measured ~27% of the exchange cost at 4 workers.
    """
    import pyarrow as pa

    schema = _schema_for(include_minhash, include_embedding)
    n = rb.num_rows
    bys = rb.column(1)
    off = bys.offset
    bufs = bys.buffers()
    odt = np.int64 if pa.types.is_large_binary(bys.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=odt, count=off + n + 1)[off:]
    data_mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    isnull = (
        bys.is_null().to_numpy(zero_copy_only=False)
        if bys.null_count
        else None
    )
    codec_list = rb.column(2).to_pylist()
    canons = [
        " ".join(t.split()) if isinstance(t, str) else ""
        for t in rb.column(3).to_pylist()
    ]
    pcms: list[np.ndarray | None] = [
        None
        if (isnull is not None and isnull[i])
        else audio.decode_pcm(data_mv[offs[i]: offs[i + 1]], codec_list[i])
        for i in range(n)
    ]
    # batched execution, output-identical to the row-at-a-time
    # kernels (tests assert equality): decode per row (variable
    # length), per-clip FFT, ONE multiply-reduceat per MinHash
    # channel, ONE band-key fold.
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

    def list_arr(mat: np.ndarray) -> "pa.ListArray":
        # (n, w) uint64 -> list<int64> with zero-copy values
        w = mat.shape[1] if mat.ndim == 2 else 0
        flat = pa.array(
            np.ascontiguousarray(mat).reshape(-1).view(np.int64)
        )
        offsets = pa.array(np.arange(0, (n + 1) * w, w, dtype=np.int32))
        return pa.ListArray.from_arrays(offsets, flat)

    # both digests share the `pcm || 0x00` sha256 prefix — one payload
    # pass + a hashlib state copy instead of two full passes (r6)
    digest_pairs = [
        hashing.content_and_pcm_hash(p, c) if p is not None else (None, None)
        for p, c in zip(pcms, canons)
    ]
    arrays = [
        rb.column(0),  # clip_id passes through untouched
        pa.array([d[0] for d in digest_pairs], pa.string()),
        # pcm-only digest: lets verification decide
        # identical-audio pairs without ever re-reading bytes
        pa.array([d[1] for d in digest_pairs], pa.string()),
        *([list_arr(mh_text), list_arr(mh_pcm)] if include_minhash else []),
        list_arr(bk_text),
        list_arr(bk_pcm),
        pa.array(
            np.fromiter(
                (hashing.simhash64_i64(c) for c in canons),
                dtype=np.int64,
                count=n,
            )
        ),
        pa.array(
            np.fromiter((w.size for w in words_list), np.int32, count=n)
        ),
        pa.array(
            np.fromiter(
                (p.size if p is not None else 0 for p in pcms),
                np.int32,
                count=n,
            )
        ),
        pa.array(canons, pa.string()),
        pa.array([p is not None for p in pcms], pa.bool_()),
    ]
    if include_embedding:
        # perceptual channel in the SAME decode pass (100 TB shape: the
        # bytes column is read exactly once for hashes, MinHash frames
        # AND the MFCC embedding).  sr_hz rides in as input column 4.
        from quichash_spark.functions.audio_embed import mfcc_embedding

        srs = rb.column(4).to_pylist()
        # null sr_hz degrades like a failed decode (null embedding), it
        # must not TypeError and kill the whole Arrow batch
        embs = [
            mfcc_embedding(p, int(sr)) if p is not None and sr is not None
            else None
            for p, sr in zip(pcms, srs)
        ]
        arrays.append(
            pa.array(
                [e.tolist() if e is not None else None for e in embs],
                pa.list_(pa.float32()),
            )
        )
    return pa.RecordBatch.from_arrays(
        arrays, names=[f.name for f in schema.fields]
    )

def compute_signatures(
    clips: DataFrame, cfg: DedupConfig, include_minhash: bool = True,
    include_embedding: bool = False,
) -> DataFrame:
    """clips -> signatures (stage 1 of SURVEY.md §7.0).

    One pass over the bytes computes every signature (the reference's
    single-read multi-hash pattern, /root/reference/src/hash.rs:814-967,
    re-expressed as one Arrow batch through several numpy kernels).
    ``include_embedding`` adds the MFCC perceptual embedding
    (functions/audio_embed.py) to the same decode pass — at 100 TB the
    bytes column is read once for hashes, MinHash frames AND the
    semantic channel (equivalence vs the standalone kernel is
    test-asserted).
    ``transcript`` is carried forward canonicalized (single-space joined)
    so downstream stages never re-read the big ``bytes`` column.

    mapInArrow, not mapInPandas (zero-copy payload views — see
    :func:`signature_record_batch`, the shared kernel).  Kernel calls and
    outputs are bit-identical to the previous pandas path (tests assert
    batch==scalar).
    """
    a_params, b_params = hashing.minhash_params(cfg)

    def batches(it):
        for rb in it:
            yield signature_record_batch(
                rb, cfg, a_params, b_params, include_minhash, include_embedding
            )

    schema = _schema_for(include_minhash, include_embedding)
    cols = ["clip_id", "bytes", "codec", "transcript"]
    if include_embedding:
        # MFCC needs the clip's native rate (resampled to the config's
        # target inside the kernel)
        cols.append("sr_hz")
    # few fat Python tasks: each Arrow-exchange task pays fixed protocol
    # overhead, so target ~3 tasks/core (coalesce = no shuffle; it only
    # ever reduces the scan's partition count)
    target = clips.sparkSession.sparkContext.defaultParallelism * 3
    return clips.select(*cols).coalesce(target).mapInArrow(batches, schema)

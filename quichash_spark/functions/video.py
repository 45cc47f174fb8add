"""Video payloads: real AVI (RIFF) container parsing + frame features.

Completes the multimodal trio (audio/image/video as opaque ``binary``
columns with typed metadata): the CONTAINER layer is fully real —
AVI/RIFF structure, ``avih`` main header, ``movi`` frame chunks — and
uncompressed 24-bit DIB frames (``biCompression=0``, the standard raw
AVI payload) decode to RGB with the same bottom-up padded-BGR row logic
as the BMP decoder.  Compressed codecs inside the container (MJPEG is
decodable via :mod:`quichash_spark.functions.jpeg`; anything else
raises) follow the per-frame dispatch in :data:`FRAME_DECODERS`.

Frame sampling uses :func:`quichash_spark.functions.multimodal.
frame_sample_indices` (deterministic uniform), and the per-frame
perceptual hash is the shared ``_phash8`` — so video near-dup bucketing
plugs into the identical LSH machinery as images.

The reference never decodes payloads (/root/reference/src/hash.rs:
595-667); this is engine extension surface, same contract as the other
codecs: malformed containers raise ValueError and surface as
``decode_ok=false`` in the Spark kernel, never a failed job.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _decode_dib_frame(payload: bytes, w: int, h: int) -> np.ndarray:
    """One uncompressed 24-bit DIB frame: bottom-up, BGR, 4-byte-padded
    rows (the raw-AVI convention, same layout as the BMP pixel array)."""
    stride = (w * 3 + 3) & ~3
    if len(payload) < stride * h:
        raise ValueError("AVI DIB frame truncated")
    rows = (
        np.frombuffer(payload, dtype=np.uint8, count=stride * h)
        .reshape(h, stride)[:, : w * 3]
        .reshape(h, w, 3)
    )
    return rows[::-1, :, ::-1].copy()  # bottom-up + BGR -> RGB


def _decode_mjpeg_frame(payload: bytes, w: int, h: int) -> np.ndarray:
    from quichash_spark.functions.jpeg import decode_jpeg

    return decode_jpeg(payload)


#: fourcc (lowercased) -> frame decoder; '00db' raw frames use DIB
FRAME_DECODERS = {
    "dib ": _decode_dib_frame,
    "raw ": _decode_dib_frame,
    "\x00\x00\x00\x00": _decode_dib_frame,
    "mjpg": _decode_mjpeg_frame,
}


def decode_avi(data: bytes) -> tuple[np.ndarray, float]:
    """AVI bytes -> (frames (n, h, w, 3) uint8 RGB, fps).

    Parses RIFF('AVI ') / LIST('hdrl') / 'avih' for dimensions + timing
    and LIST('movi') for the '..db'/'..dc' frame chunks; decodes frames
    via :data:`FRAME_DECODERS` keyed on the stream handler fourcc.
    """
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    avih = None
    handler = "dib "
    frames_raw: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal avih, handler
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            sz = struct.unpack_from("<I", data, pos + 4)[0]
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + sz)  # skip list type tag
            elif cid == b"avih":
                avih = struct.unpack_from("<14I", data, body_start)
            elif cid == b"strh":
                if data[body_start : body_start + 4] == b"vids":
                    handler = (
                        data[body_start + 4 : body_start + 8]
                        .decode("latin-1")
                        .lower()
                    )
            elif cid[2:4] in (b"db", b"dc"):
                frames_raw.append(data[body_start : body_start + sz])
            pos = body_start + sz + (sz & 1)  # chunks are word-aligned

    walk(12, len(data))
    if avih is None:
        raise ValueError("AVI missing avih header")
    us_per_frame, w, h = avih[0], avih[8], avih[9]
    if w == 0 or h == 0:
        raise ValueError("AVI header has zero dimensions")
    dec = FRAME_DECODERS.get(handler)
    if dec is None:
        raise NotImplementedError(
            f"AVI video codec {handler!r} needs a decoder not present here"
        )
    frames = np.stack([dec(f, int(w), int(h)) for f in frames_raw]) if frames_raw \
        else np.empty((0, int(h), int(w), 3), dtype=np.uint8)
    fps = 1_000_000.0 / us_per_frame if us_per_frame else 0.0
    return frames, fps


def encode_avi(frames: np.ndarray, fps: float = 10.0) -> bytes:
    """Minimal spec-conformant AVI writer (uncompressed 24-bit DIB
    frames) — interop/test fixture producer, mirroring encode_wav/
    encode_png/encode_flac."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I", int(1_000_000 / fps), 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                            int(fps), 0, n, 0, 0, 0, 0)
            + struct.pack("<4h", 0, 0, 0, 0))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    for f in frames:
        bgr_bottom_up = f[::-1, :, ::-1]
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr_bottom_up.reshape(h, w * 3)
        movi_body += chunk(b"00db", rows.tobytes())
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


VIDEO_FEATURES_SCHEMA = StructType(
    [
        StructField("item_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("sampled_phash", ArrayType(StringType())),
        StructField("mean_luma", DoubleType()),
    ]
)


def video_features(items: DataFrame, id_col: str = "item_id",
                   bytes_col: str = "payload", k_frames: int = 4) -> DataFrame:
    """Container parse + per-sampled-frame features over Arrow batches.

    ``sampled_phash``: the shared 8x8 perceptual hash of ``k_frames``
    uniformly sampled frames (``frame_sample_indices``) — the video
    analog of the audio pipeline's pcm frame shingles, ready for the
    same band/bucket join machinery.
    """
    from quichash_spark.functions.multimodal import (
        _phash8,
        frame_sample_indices,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                row = {"item_id": iid, "decode_ok": False, "n_frames": None,
                       "width": None, "height": None, "fps": None,
                       "sampled_phash": None, "mean_luma": None}
                if data is not None:
                    try:
                        frames, fps = decode_avi(bytes(data))
                    except NotImplementedError:
                        raise
                    except Exception:
                        frames = None
                    if frames is not None:
                        idx = frame_sample_indices(frames.shape[0], k_frames)
                        row.update(
                            decode_ok=True,
                            n_frames=int(frames.shape[0]),
                            width=int(frames.shape[2]),
                            height=int(frames.shape[1]),
                            fps=float(fps),
                            sampled_phash=[_phash8(frames[i]) for i in idx],
                            mean_luma=float(
                                (frames.astype(np.float64)
                                 @ np.array([0.299, 0.587, 0.114])).mean()
                            ) if frames.size else 0.0,
                        )
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FEATURES_SCHEMA.fields]
            )

    return items.mapInPandas(batches, VIDEO_FEATURES_SCHEMA)


__all__ = ["decode_avi", "encode_avi", "video_features",
           "VIDEO_FEATURES_SCHEMA", "FRAME_DECODERS"]

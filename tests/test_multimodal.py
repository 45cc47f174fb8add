"""Multimodal plumbing: real fake-codec path + stubbed real codecs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from quichash_spark.functions import multimodal as M


def _img(seed: int, w: int = 32, h: int = 16) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_image_features_pipeline(spark):
    rows = [
        Row(item_id=f"img_{i}", payload=M.encode_raw_rgb8(_img(i)), codec="raw_rgb8")
        for i in range(8)
    ]
    rows.append(Row(item_id="img_null", payload=None, codec="raw_rgb8"))
    rows.append(Row(item_id="img_unknown", payload=b"xx", codec="tiff"))
    df = spark.createDataFrame(rows)
    got = {r["item_id"]: r for r in M.image_features(df).collect()}
    assert got["img_0"]["decode_ok"] and got["img_0"]["width"] == 32
    assert len(got["img_0"]["phash"]) == 64
    assert not got["img_null"]["decode_ok"]
    assert not got["img_unknown"]["decode_ok"]
    # deterministic across runs
    again = {r["item_id"]: r for r in M.image_features(df).collect()}
    assert got["img_3"]["phash"] == again["img_3"]["phash"]


def test_stub_codecs_raise(spark):
    # webp is REAL for the whole lossless format (VP8L, functions/vp8l.py,
    # all four transforms + 2D LZ77 as of r5); lossy VP8 falls through to
    # a system libwebp when one is loadable (functions/webp_sys.py), else
    # stays an honest NotImplementedError
    from quichash_spark.functions import webp_sys
    from quichash_spark.functions.vp8l import encode_webp_lossless

    img = _img(9, 12, 10)
    good = encode_webp_lossless(img)
    lossy = good.replace(b"VP8L", b"VP8 ", 1)  # relabeled garbage, NOT real VP8
    df = spark.createDataFrame([
        Row(item_id="wl", payload=bytearray(good), codec="webp"),
        Row(item_id="wt", payload=b"RIFF", codec="webp"),  # truncated
    ])
    got = {r["item_id"]: r for r in M.image_features(df).collect()}
    assert got["wl"]["decode_ok"] and got["wl"]["width"] == img.shape[1]
    assert got["wt"]["decode_ok"] is False  # malformed, not fatal
    dfl = spark.createDataFrame([Row(item_id="v", payload=bytearray(lossy), codec="webp")])
    if webp_sys.available() is not None:
        # the system tier rejects the fake VP8 payload -> malformed row,
        # not a task failure (real lossy VP8 decodes: see test_vp8l.py's
        # test_lossy_vp8_falls_through_to_system_libwebp)
        assert M.image_features(dfl).collect()[0]["decode_ok"] is False
    else:
        with pytest.raises(Exception, match="NotImplementedError|VP8"):
            M.image_features(dfl).collect()
    # a truncated jpeg is a MALFORMED input now, not a stub: decode_ok=False
    df2 = spark.createDataFrame([Row(item_id="j", payload=b"\xff\xd8", codec="jpeg")])
    assert M.image_features(df2).collect()[0]["decode_ok"] is False


def test_phash_similarity_property():
    img = _img(42, 64, 64)
    noisy = np.clip(
        img.astype(int) + np.random.default_rng(1).integers(-8, 9, img.shape), 0, 255
    ).astype(np.uint8)
    a, b = M._phash8(img), M._phash8(noisy)
    ham = sum(x != y for x, y in zip(a, b))
    assert ham <= 12  # mild noise barely moves the perceptual hash
    other = M._phash8(_img(7, 64, 64))
    ham_other = sum(x != y for x, y in zip(a, other))
    assert ham_other > ham


def test_frame_sampling():
    assert M.frame_sample_indices(100, 4) == [0, 25, 50, 75]
    assert M.frame_sample_indices(3, 8) == [0, 1, 2]
    assert M.frame_sample_indices(0, 4) == []


# ---------------------------------------------------------------------------
# video: AVI container + frame features (functions/video.py)
# ---------------------------------------------------------------------------


def test_avi_roundtrip_and_features(spark):
    from quichash_spark.functions import video as V

    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, (10, 12, 9, 3), dtype=np.uint8)
    data = V.encode_avi(frames, fps=5.0)
    back, fps = V.decode_avi(data)
    assert np.array_equal(back, frames)
    assert abs(fps - 5.0) < 1e-6

    df = spark.createDataFrame(
        [Row(item_id="v", payload=data),
         Row(item_id="bad", payload=b"RIFFxxxxAVI "),
         Row(item_id="junk", payload=b"not a video")]
    )
    got = {r["item_id"]: r for r in V.video_features(df, k_frames=4).collect()}
    v = got["v"]
    assert v["decode_ok"] and v["n_frames"] == 10
    assert v["width"] == 9 and v["height"] == 12 and abs(v["fps"] - 5.0) < 1e-6
    # sampled phashes match direct computation on the same frame indices
    idx = M.frame_sample_indices(10, 4)
    assert v["sampled_phash"] == [M._phash8(frames[i]) for i in idx]
    assert not got["bad"]["decode_ok"] and not got["junk"]["decode_ok"]


def test_avi_mjpeg_frames_decode_via_jpeg():
    """An MJPEG-handler AVI carries baseline-JPEG frames; the container
    dispatches them to the real jpeg decoder."""
    import struct as _struct

    from quichash_spark.functions import video as V
    from quichash_spark.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    # build the AVI by hand with handler MJPG and jpeg-encoded chunks
    data = bytearray(V.encode_avi(frames[:1]))  # template for headers
    i = bytes(data).find(b"vids") + 4
    data[i : i + 4] = b"MJPG"
    # replace the movi list entirely
    movi_start = bytes(data).find(b"LIST", 12 + 4)  # first LIST is hdrl
    movi_start = bytes(data).find(b"LIST", movi_start + 4)
    body = b"movi"
    for f in frames:
        payload = encode_jpeg(f, qtable=1)
        pad = b"\x00" if len(payload) & 1 else b""
        body += b"00dc" + _struct.pack("<I", len(payload)) + payload + pad
    new = bytes(data[:movi_start]) + b"LIST" + _struct.pack("<I", len(body)) + body
    new = new[:4] + _struct.pack("<I", len(new) - 8) + new[8:]
    back, _ = V.decode_avi(new)
    assert back.shape == frames.shape
    assert int(np.abs(back.astype(int) - frames.astype(int)).max()) <= 2


def test_avi_i420_yuy2_roundtrip():
    """Raw YUV frame codecs (r5): constant-color frames round-trip the
    BT.601 conversion within rounding (chroma subsampling is exact on
    constant blocks); gradients bound the per-pixel luma error."""
    import numpy as np

    from quichash_spark.functions import video as V

    solid = np.zeros((3, 16, 16, 3), np.uint8)
    solid[0] = (200, 40, 90)
    solid[1] = (10, 250, 128)
    solid[2] = (77, 77, 77)
    for codec in ("I420", "YUY2"):
        back, fps = V.decode_avi(V.encode_avi(solid, fps=10.0, codec=codec))
        assert back.shape == solid.shape and abs(fps - 10.0) < 1e-6
        assert int(np.abs(back.astype(int) - solid.astype(int)).max()) <= 2

    y, x = np.mgrid[0:16, 0:16]
    grad = np.stack([x * 16, y * 16, (x + y) * 8], axis=-1).astype(np.uint8)[None]
    for codec in ("I420", "YUY2"):
        back, _ = V.decode_avi(V.encode_avi(grad, codec=codec))
        # luma reconstructs tightly; chroma smoothing spreads over the
        # 2x2 / 1x2 subsample blocks
        luma = lambda f: f.astype(np.float64) @ np.array([0.299, 0.587, 0.114])  # noqa: E731
        assert float(np.abs(luma(back[0]) - luma(grad[0])).max()) <= 6.0


def test_avi_yuv_headers_and_dispatch():
    """I420/YUY2 streams carry the right strh fourcc + strf compression
    and dispatch through FRAME_DECODERS (incl. the IYUV alias)."""
    import struct

    import numpy as np

    from quichash_spark.functions import video as V

    f = np.full((2, 16, 16, 3), 128, np.uint8)
    data = V.encode_avi(f, codec="I420")
    assert b"vidsI420" in data
    i = data.find(b"strf") + 8
    comp = struct.unpack_from("<I", data, i + 16)[0]
    assert comp == struct.unpack("<I", b"I420")[0]
    # IYUV alias decodes identically to I420
    aliased = data.replace(b"vidsI420", b"vidsIYUV")
    np.testing.assert_array_equal(
        V.decode_avi(aliased)[0], V.decode_avi(data)[0]
    )
    with __import__("pytest").raises(ValueError, match="codec"):
        V.encode_avi(f, codec="XVID")

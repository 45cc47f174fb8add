"""Lossless JPEG (T.81 Annex H, SOF3) — round-trip + edge-case tests.

No external conformance oracle exists in this environment (javax.imageio
and Pillow decode DCT modes only), so validation follows the VP8L/FLAC
pattern: a spec-conformant encoder lives beside the decoder, round trips
must be BIT-EXACT (lossless means lossless), and hand-constructed
streams cover the edge rules (SSSS=16 difference, point transform,
restarts, every predictor)."""

from __future__ import annotations

import numpy as np
import pytest

from quichash_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_lossless,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def test_gray8_roundtrip_exact_all_predictors():
    img = _rng(1).integers(0, 256, size=(21, 17), dtype=np.uint8)
    for psv in range(1, 8):
        data = encode_jpeg_lossless(img, predictor=psv)
        raw = decode_jpeg(data, raw=True)
        np.testing.assert_array_equal(raw[..., 0], img.astype(np.uint16))
        # rendered contract: gray replicated to 3 channels
        rgb = decode_jpeg(data)
        np.testing.assert_array_equal(rgb[..., 0], img)
        np.testing.assert_array_equal(rgb[..., 1], img)


def test_rgb8_roundtrip_exact():
    img = _rng(2).integers(0, 256, size=(13, 19, 3), dtype=np.uint8)
    data = encode_jpeg_lossless(img, predictor=4)
    np.testing.assert_array_equal(
        decode_jpeg(data, raw=True), img.astype(np.uint16)
    )
    # lossless 3-component output is RGB DIRECTLY (no YCbCr transform)
    np.testing.assert_array_equal(decode_jpeg(data), img)


def test_16bit_roundtrip_exact():
    img = _rng(3).integers(0, 1 << 16, size=(9, 11), dtype=np.uint16)
    data = encode_jpeg_lossless(img, predictor=7)
    np.testing.assert_array_equal(decode_jpeg(data, raw=True)[..., 0], img)


def test_ssss16_difference_path():
    """Alternating 0 / 32768 under predictor 1 forces difference 32768 —
    the SSSS=16 no-extra-bits special case (T.81 H.1.2.2)."""
    img = np.zeros((4, 8), np.uint16)
    img[:, 1::2] = 32768
    data = encode_jpeg_lossless(img, predictor=1)
    np.testing.assert_array_equal(decode_jpeg(data, raw=True)[..., 0], img)


def test_point_transform_drops_exactly_pt_bits():
    img = _rng(4).integers(0, 256, size=(12, 12), dtype=np.uint8)
    data = encode_jpeg_lossless(img, predictor=4, point_transform=2)
    got = decode_jpeg(data, raw=True)[..., 0]
    np.testing.assert_array_equal(got, (img >> 2).astype(np.uint16) << 2)


def test_restart_interval_roundtrip():
    img = _rng(5).integers(0, 256, size=(16, 10), dtype=np.uint8)
    for ri in (1, 7, 40):
        data = encode_jpeg_lossless(img, predictor=5, restart_interval=ri)
        np.testing.assert_array_equal(
            decode_jpeg(data, raw=True)[..., 0], img.astype(np.uint16)
        )


def test_gradient_images_every_predictor():
    """Smooth gradients exercise the neighbor formulas with small
    diffs; verify bit-exactness per predictor (incl. the >> 1 floor
    semantics of psv 5-7 on negative Rb-Rc)."""
    y, x = np.mgrid[0:15, 0:14]
    img = ((x * 7 + y * 13) % 256).astype(np.uint8)
    rev = ((255 - x * 9 - y * 3) % 256).astype(np.uint8)
    for psv in range(1, 8):
        for im in (img, rev):
            data = encode_jpeg_lossless(im, predictor=psv)
            np.testing.assert_array_equal(
                decode_jpeg(data, raw=True)[..., 0], im.astype(np.uint16)
            )


def test_single_pixel_and_single_row():
    one = np.array([[200]], np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_lossless(one), raw=True)[..., 0], [[200]]
    )
    row = np.arange(256, dtype=np.uint8)[None, :]
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_lossless(row, predictor=2), raw=True)[..., 0],
        row.astype(np.uint16),
    )
    col = np.arange(256, dtype=np.uint8)[:, None]
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_lossless(col, predictor=1), raw=True)[..., 0],
        col.astype(np.uint16),
    )


def test_invalid_inputs_raise():
    img = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(img, predictor=0)
    data = bytearray(encode_jpeg_lossless(img))
    # corrupt the SOS predictor byte (Ss) to 0: decoder must reject
    sos = data.find(b"\xff\xda")
    ns = data[sos + 4]
    data[sos + 5 + 2 * ns] = 0
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(data))


def test_dispatches_through_image_codec_registry():
    """The multimodal 'jpeg' codec entry must hit the SOF3 path (no
    re-registration needed)."""
    from quichash_spark.functions.multimodal import IMAGE_CODECS

    img = _rng(6).integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    out = IMAGE_CODECS["jpeg"](encode_jpeg_lossless(img))
    np.testing.assert_array_equal(out, img)


# ---------------------------------------------------------------------------
# 12-bit extended sequential (SOF1) — same validation strategy
# ---------------------------------------------------------------------------


def test_12bit_gray_and_rgb_roundtrip():
    from quichash_spark.functions.jpeg import encode_jpeg12

    rng = _rng(7)
    gray = rng.integers(0, 4096, (19, 23), dtype=np.uint16)
    got = decode_jpeg(encode_jpeg12(gray))
    want = np.clip(np.round(gray / 16.0), 0, 255)
    assert float(np.abs(got[..., 0].astype(float) - want).max()) <= 1.0

    rgb = rng.integers(0, 4096, (16, 16, 3), dtype=np.uint16)
    got = decode_jpeg(encode_jpeg12(rgb))
    want = np.clip(np.round(rgb / 16.0), 0, 255)
    assert float(np.abs(got.astype(float) - want).max()) <= 1.0


def test_12bit_extremes_and_validation():
    from quichash_spark.functions.jpeg import encode_jpeg12

    # rail-to-rail checkerboard maximizes DC diffs between blocks (the
    # extended DC categories) and high-frequency AC magnitudes
    y, x = np.mgrid[0:24, 0:24]
    board = (((x // 8 + y // 8) % 2) * 4095).astype(np.uint16)
    got = decode_jpeg(encode_jpeg12(board))
    want = np.clip(np.round(board / 16.0), 0, 255)
    assert float(np.abs(got[..., 0].astype(float) - want).max()) <= 1.0

    with pytest.raises(ValueError, match="4095"):
        encode_jpeg12(np.array([[5000]], np.uint16))


def test_12bit_uses_sof1_and_16bit_quant():
    from quichash_spark.functions.jpeg import encode_jpeg12

    data = encode_jpeg12(np.zeros((8, 8), np.uint16))
    assert b"\xff\xc1" in data and b"\xff\xc0" not in data
    i = data.find(b"\xff\xdb")
    assert data[i + 4] == 0x10  # Pq=1: 16-bit table per 12-bit precision

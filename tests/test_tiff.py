"""Baseline TIFF codec (functions/tiff.py) — round trips + bit-level
streams.  Same validation strategy as GIF/SOF3: pixel-exact writer
round trips across the compression x byte-order matrix, plus
hand-assembled streams for PackBits opcodes and decoder edge rules."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from quichash_spark.functions.tiff import (
    _lzw_tiff_decode,
    _packbits_decode,
    decode_tiff,
    encode_tiff,
)


def _img(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


def test_roundtrip_matrix_compression_x_endianness():
    img = _img(1, 21, 17)
    for comp in (1, 5, 32773):
        for be in (False, True):
            for rps in (3, 8, 64):
                back = decode_tiff(encode_tiff(
                    img, compression=comp, big_endian=be, rows_per_strip=rps
                ))
                np.testing.assert_array_equal(back, img)


def test_gray_and_palette_roundtrip():
    gray = np.random.default_rng(2).integers(0, 256, (13, 29), np.uint8)
    back = decode_tiff(encode_tiff(gray, compression=5))
    np.testing.assert_array_equal(back[..., 0], gray)
    np.testing.assert_array_equal(back[..., 2], gray)

    pal = np.random.default_rng(3).integers(0, 256, (9, 3), np.uint8)
    pimg = pal[np.random.default_rng(4).integers(0, 9, (15, 23))]
    for comp in (1, 5, 32773):
        back = decode_tiff(encode_tiff(pimg, compression=comp, palette=True))
        np.testing.assert_array_equal(back, pimg)


def test_lzw_width_boundaries_and_clear():
    """Random 120x120 RGB crosses the 9->10->11->12-bit early-change
    boundaries and the 4093-code CLEAR inside one strip."""
    img = _img(5, 120, 120)
    back = decode_tiff(encode_tiff(img, compression=5, rows_per_strip=120))
    np.testing.assert_array_equal(back, img)


def test_packbits_opcodes_by_hand():
    # literal(2 bytes) + run(4x 0xAB) + noop(0x80) + literal(1)
    stream = bytes([0x01, 0x10, 0x20, 257 - 4, 0xAB, 0x80, 0x00, 0x7F])
    assert _packbits_decode(stream, 7) == bytes(
        [0x10, 0x20, 0xAB, 0xAB, 0xAB, 0xAB, 0x7F]
    )
    with pytest.raises(ValueError, match="truncated"):
        _packbits_decode(bytes([0x05, 1, 2]), 6)


def test_lzw_hand_stream_literals():
    """CLEAR(256), 'A'(65), 'B'(66), EOI(257) at 9 bits, MSB-first:
    100000000 001000001 001000010 100000001 -> bytes
    0x80 0x10 0x48 0x44 0x08 (padded)."""
    bits = "100000000" + "001000001" + "001000010" + "100000001"
    bits += "0" * (-len(bits) % 8)
    payload = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert _lzw_tiff_decode(payload, 2) == b"AB"


def test_white_is_zero_inverts():
    gray = np.full((4, 4), 40, np.uint8)
    data = bytearray(encode_tiff(gray))
    # flip PhotometricInterpretation 1 -> 0 in the IFD
    n = struct.unpack_from("<H", data, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        tag = struct.unpack_from("<H", data, off)[0]
        if tag == 262:
            struct.pack_into("<H", data, off + 8, 0)
    back = decode_tiff(bytes(data))
    assert (back == 255 - 40).all()


def test_malformed_inputs_raise():
    img = _img(6, 8, 8)
    good = encode_tiff(img)
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX*\x00" + good[4:])
    with pytest.raises(ValueError):
        decode_tiff(good[:40])  # strips out of bounds
    bad = bytearray(good)
    n = struct.unpack_from("<H", bad, 8)[0]
    for i in range(n):  # set compression to JPEG(7): not baseline
        off = 10 + 12 * i
        if struct.unpack_from("<H", bad, off)[0] == 259:
            struct.pack_into("<H", bad, off + 8, 7)
    with pytest.raises(ValueError, match="not baseline"):
        decode_tiff(bytes(bad))


def test_registered_in_image_codecs():
    from quichash_spark.functions.multimodal import IMAGE_CODECS

    img = _img(7, 9, 9)
    np.testing.assert_array_equal(
        IMAGE_CODECS["tiff"](encode_tiff(img, compression=32773)), img
    )


def test_single_pixel_and_wide():
    one = np.full((1, 1, 3), 200, np.uint8)
    np.testing.assert_array_equal(decode_tiff(encode_tiff(one)), one)
    wide = _img(8, 1, 500)
    for comp in (1, 5, 32773):
        np.testing.assert_array_equal(
            decode_tiff(encode_tiff(wide, compression=comp)), wide
        )

"""GIF codec (functions/gif.py) — LZW, interlace, transparency,
multi-frame structure.  Self-validation via the spec-conformant writer
(GIF is lossless over its palette: round trips are pixel-exact) plus
hand-constructed streams for the paths the writer does not emit."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from quichash_spark.functions.gif import decode_gif, encode_gif


def _img(seed: int, h: int, w: int, n_colors: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    pal = np.unique(pal, axis=0)
    return pal[rng.integers(0, pal.shape[0], (h, w))]


def test_roundtrip_exact_various_palettes():
    for seed, h, w, nc in [(1, 9, 13, 2), (2, 23, 31, 7), (3, 40, 40, 250)]:
        img = _img(seed, h, w, nc)
        back, n_frames, dur = decode_gif(encode_gif(img))
        np.testing.assert_array_equal(back, img)
        assert n_frames == 1 and dur == 0


def test_interlace_roundtrip_exact():
    for h in (1, 2, 5, 8, 9, 17):  # every interlace-pass boundary shape
        img = _img(4, h, 11, 5)
        back, _, _ = decode_gif(encode_gif(img, interlace=True))
        np.testing.assert_array_equal(back, img)


def test_dictionary_fill_forces_clear_path():
    """A large high-entropy image overflows the 4096-code table, so the
    writer must emit CLEAR mid-stream and the reader must re-init."""
    img = _img(5, 80, 80, 256)
    back, _, _ = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(back, img)


def test_transparency_renders_backdrop_black():
    img = np.zeros((4, 4, 3), np.uint8)
    img[:, :2] = (200, 10, 30)
    data = encode_gif(img, transparent=0)
    back, _, _ = decode_gif(data)
    # palette index 0 is one of the two colors; those pixels become black
    zeros = (back == 0).all(axis=2).sum()
    assert zeros in (8, 16) and back.shape == (4, 4, 3)


def test_multiframe_structure_and_duration():
    """Append a second image block + GCE delays by hand: frame count
    and summed duration must be reported, first frame rendered."""
    img = _img(6, 6, 6, 4)
    base = bytearray(encode_gif(img))
    trailer = base.pop()  # 0x3B
    assert trailer == 0x3B
    # find the first image descriptor to clone it as a second frame
    i = bytes(base).index(b"\x2c")
    frame_block = bytes(base[i:])
    gce = bytes([0x21, 0xF9, 4, 0x00, 25, 0, 0, 0])  # delay 25cs = 250ms
    data = bytes(base) + gce + frame_block + gce + frame_block + b"\x3b"
    back, n_frames, dur = decode_gif(data)
    np.testing.assert_array_equal(back, img)
    assert n_frames == 3 and dur == 500  # first frame had no GCE


def test_comment_and_application_extensions_skipped():
    img = _img(7, 5, 5, 3)
    base = bytearray(encode_gif(img))
    i = bytes(base).index(b"\x2c")
    comment = bytes([0x21, 0xFE, 5]) + b"hello" + bytes([0])
    appext = bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    data = bytes(base[:i]) + comment + appext + bytes(base[i:])
    back, n_frames, _ = decode_gif(data)
    np.testing.assert_array_equal(back, img)
    assert n_frames == 1


def test_gif87a_header_accepted():
    img = _img(8, 4, 4, 2)
    data = b"GIF87a" + encode_gif(img)[6:]
    back, _, _ = decode_gif(data)
    np.testing.assert_array_equal(back, img)


def test_malformed_inputs_raise():
    img = _img(9, 8, 8, 4)
    good = encode_gif(img)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JIF89a" + good[6:])
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated mid-structure
    # invalid LZW minimum code size
    bad = bytearray(good)
    i = bytes(bad).index(b"\x2c") + 10
    bad[i] = 1
    with pytest.raises(ValueError, match="minimum code size"):
        decode_gif(bytes(bad))
    # truncated LZW payload (drop the stream tail incl. EOI)
    with pytest.raises(ValueError):
        decode_gif(good[: i + 4] + bytes([0]) + b"\x3b")
    with pytest.raises(ValueError, match="256 distinct"):
        k = np.arange(512)
        rgb = np.stack([k % 256, k // 256, np.full_like(k, 7)], axis=-1)
        encode_gif(rgb.reshape(16, 32, 3).astype(np.uint8))


def test_local_color_table_stream():
    """Hand-move the palette from global to local: same pixels."""
    img = _img(10, 6, 7, 4)
    data = bytearray(encode_gif(img))
    flags = data[10]
    bits = (flags & 0x07) + 1
    n_pal = 3 * (1 << bits)
    pal = bytes(data[13 : 13 + n_pal])
    body = bytes(data[13 + n_pal :])
    data2 = bytearray(data[:10])
    data2 += bytes([flags & 0x7F, data[11], data[12]])  # drop GCT flag
    i = body.index(b"\x2c")
    desc = bytearray(body[i : i + 10])
    desc[9] |= 0x80 | (bits - 1)  # set LCT flag + size
    data2 += body[:i] + bytes(desc) + pal + body[i + 10 :]
    back, _, _ = decode_gif(bytes(data2))
    np.testing.assert_array_equal(back, img)


def test_registered_in_image_codecs():
    from quichash_spark.functions.multimodal import IMAGE_CODECS

    img = _img(11, 8, 8, 6)
    np.testing.assert_array_equal(IMAGE_CODECS["gif"](encode_gif(img)), img)


def test_single_color_and_tiny():
    one = np.full((1, 1, 3), 77, np.uint8)
    back, _, _ = decode_gif(encode_gif(one))
    np.testing.assert_array_equal(back, one)
    wide = np.full((1, 300, 3), 9, np.uint8)
    back, _, _ = decode_gif(encode_gif(wide))
    np.testing.assert_array_equal(back, wide)


def test_hand_built_minimal_stream():
    """A fully hand-assembled 3x1 two-color GIF: literal codes only.
    min_code_size=2 -> width 3; codes CLEAR(4), 0, 1, 0, EOI(5) pack
    LSB-first as 4 | 0<<3 | 1<<6 = 0x44, then 0 | 5<<4 = 0x50."""
    pal = bytes([10, 20, 30, 200, 210, 220]) + bytes(6)  # 4-entry table
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 3, 1, 0x81, 0, 0)
        + pal
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
        + bytes([2, 2, 0x44, 0x50, 0])
        + b"\x3b"
    )
    back, n_frames, _ = decode_gif(data)
    assert n_frames == 1
    np.testing.assert_array_equal(
        back, np.array([[[10, 20, 30], [200, 210, 220], [10, 20, 30]]], np.uint8)
    )

"""WebP-lossless (VP8L) codec: encoder/decoder round trips over every
implemented feature, hand-built streams for the decode-only paths (meta
prefix groups, max_symbol token budget), and the malformed-input
contract.  Same structure as the PNG/JPEG/FLAC codec tests."""

import numpy as np
import pytest

from quichash_spark.functions.vp8l import (
    BitReader,
    BitWriter,
    PrefixCode,
    _encode_literal_image,
    _read_code_lengths,
    _write_prefix_code_complex,
    canonical_codes,
    complete_two_level_lengths,
    decode_webp,
    encode_webp_lossless,
    prefix_decode_value,
    prefix_encode_value,
)


def _rand_img(rng, h, w, c=3):
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


def test_roundtrip_plain_cache_subgreen_lz77():
    rng = np.random.default_rng(1)
    img = _rand_img(rng, 13, 17)
    for kw in ({}, {"use_cache_bits": 4}, {"subtract_green": True},
               {"lz77": True}):
        assert np.array_equal(decode_webp(encode_webp_lossless(img, **kw)), img)


def test_roundtrip_lz77_long_runs():
    # runs > 4096 exercise multi-code lengths and the raw-distance path
    img = np.zeros((40, 150, 3), dtype=np.uint8)
    img[:, :, 0] = 7
    img[20, 75] = (1, 2, 3)
    assert np.array_equal(decode_webp(encode_webp_lossless(img, lz77=True)), img)


def test_roundtrip_palette_all_width_bits():
    rng = np.random.default_rng(2)
    for ncol, shape in ((2, (9, 31)), (4, (8, 10)), (13, (5, 21)),
                        (200, (16, 16))):
        colors = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = colors[rng.integers(0, ncol, shape)]
        assert np.array_equal(
            decode_webp(encode_webp_lossless(img, palette=True)), img
        )


def test_roundtrip_alpha_gray_tiny():
    rng = np.random.default_rng(3)
    rgba = _rand_img(rng, 7, 7, 4)
    assert np.array_equal(decode_webp(encode_webp_lossless(rgba)), rgba[..., :3])
    g = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    assert np.array_equal(
        decode_webp(encode_webp_lossless(g)), np.stack([g] * 3, -1)
    )
    one = np.array([[[1, 2, 3]]], dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(one)), one)


def test_prefix_value_coding_inverse():
    for v in list(range(1, 70)) + [121, 1000, 4096, 65536]:
        code, extra, nbits = prefix_encode_value(v)
        bw = BitWriter()
        bw.write(extra, nbits)
        assert prefix_decode_value(code, BitReader(bw.tobytes() or b"\0")) == v


def test_complete_two_level_lengths_kraft():
    for a in (1, 2, 3, 40, 256, 280, 296, 511, 512):
        lengths = complete_two_level_lengths(a)
        assert len(lengths) == a
        if a > 1:
            assert abs(sum(2.0 ** -x for x in lengths) - 1.0) < 1e-12


def test_canonical_code_decode_inverse():
    lengths = complete_two_level_lengths(296)
    enc = canonical_codes(lengths)
    dec = PrefixCode(lengths)
    for sym in (0, 1, 100, 231, 232, 295):
        code, ln = enc[sym]
        bw = BitWriter()
        bw.write_code(code, ln)
        assert dec.read(BitReader(bw.tobytes())) == sym


def test_max_symbol_token_budget():
    """Hand-built complex code using use_max_symbol: two 1-bit symbols,
    token budget 2, remaining lengths implicitly zero."""
    bw = BitWriter()
    # code-length-code: symbols 0 and 1 get 3-bit length "1"
    # order = [17,18,0,1,...] -> need num_codes=4 (covers 17,18,0,1)
    bw.write(4 - 4, 4)
    for sym_len in (0, 0, 1, 1):  # lengths for 17, 18, 0, 1
        bw.write(sym_len, 3)
    bw.write(1, 1)              # use max_symbol
    bw.write(0, 3)              # length_nbits = 2 + 2*0 = 2
    bw.write(0, 2)              # max_symbol = 2 + 0 = 2 tokens
    # two tokens: symbol 0 then symbol 1 (canonical 1-bit codes: 0 -> 0)
    bw.write_code(0, 1)
    bw.write_code(1, 1)
    lengths = _read_code_lengths(BitReader(bw.tobytes()), 256)
    assert lengths[0] == 0 and lengths[1] == 1
    assert all(x == 0 for x in lengths[2:])


def test_meta_prefix_groups_decode():
    """Hand-built stream with TWO prefix-code groups selected by a meta
    image: tile 0's red channel uses a 1-bit simple code over {10, 200},
    tile 1 uses flat 8-bit codes — decoding with the wrong group would
    misparse the bit budget entirely."""
    rng = np.random.default_rng(4)
    h, w, meta_bits = 4, 8, 2  # two 4-wide tiles
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :4, 0] = rng.choice([10, 200], (h, 4))
    img[:, 4:] = rng.integers(0, 256, (h, 4, 3))
    img[:, :4, 1] = 77  # constant green/blue in tile 0
    img[:, :4, 2] = 33

    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix present
    bw.write(meta_bits - 2, 3)
    # meta image: 2x1 pixels, green = group index (0, 1)
    meta_px = np.array([0xFF000000 | (0 << 8), 0xFF000000 | (1 << 8)],
                       dtype=np.uint32)
    _encode_literal_image(bw, meta_px, cache_bits=0, is_main=False)

    # group 0: simple red code {10, 200}; green/blue/alpha simple 1-symbol
    def simple2(bw, a, b):
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        bw.write(1, 1)  # first in 8 bits
        bw.write(a, 8)
        bw.write(b, 8)
        return {a: (0, 1), b: (1, 1)}

    def single(bw, sym):
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
        return {sym: (0, 0)}

    g0_green = single(bw, 77)
    g0_red = simple2(bw, 10, 200)
    g0_blue = single(bw, 33)
    g0_alpha = single(bw, 255)
    single(bw, 0)  # distance, unused
    g1_green = _write_prefix_code_complex(bw, complete_two_level_lengths(280))
    g1_red = _write_prefix_code_complex(bw, complete_two_level_lengths(256))
    g1_blue = _write_prefix_code_complex(bw, complete_two_level_lengths(256))
    g1_alpha = _write_prefix_code_complex(bw, complete_two_level_lengths(256))
    single(bw, 0)

    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            maps = ((g0_green, g0_red, g0_blue, g0_alpha) if x < 4
                    else (g1_green, g1_red, g1_blue, g1_alpha))
            for m, v in zip(maps, (g, r, b, 255)):
                code, ln = m[v]
                bw.write_code(code, ln)

    import struct

    payload = bytes([0x2F]) + bw.tobytes()
    body = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(decode_webp(data), img)


def test_malformed_and_stub_paths():
    rng = np.random.default_rng(5)
    data = encode_webp_lossless(_rand_img(rng, 10, 10))
    with pytest.raises(ValueError):
        decode_webp(data[:30])  # truncated
    with pytest.raises(ValueError):
        decode_webp(b"RIFX" + data[4:])  # bad container
    # lossy VP8 chunk -> explicit NotImplementedError
    vp8 = data.replace(b"VP8L", b"VP8 ", 1)
    with pytest.raises(NotImplementedError):
        decode_webp(vp8)


def test_registered_in_image_codecs():
    from quichash_spark.functions.multimodal import IMAGE_CODECS

    rng = np.random.default_rng(6)
    img = _rand_img(rng, 9, 11)
    out = IMAGE_CODECS["webp"](encode_webp_lossless(img))
    assert np.array_equal(out, img)

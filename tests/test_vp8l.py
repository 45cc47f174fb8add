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


# ---------------------------------------------------------------------------
# r5: predictor / color transforms, 2D distance map, libwebp conformance
# ---------------------------------------------------------------------------

from quichash_spark.functions import webp_sys  # noqa: E402
from quichash_spark.functions.vp8l import (  # noqa: E402
    DISTANCE_MAP,
    _clamp_add_sub_half,
    _map_distance,
    decode_vp8l_stream,
)

_HAVE_LIBWEBP = webp_sys.available() is not None


def test_distance_map_head_matches_spec_listing():
    """First rows of the spec's printed 120-entry table, transcribed
    here as one pin for the generating rule (the full asymmetric
    dx in [-7,8] x dy in [0,7] window ordered by d^2, ties by |dx| then
    positive dx first); the tail rows below are the part where the
    naive symmetric-window reading diverges, pinned from the libwebp
    plane-code probe (see _gen_distance_map and the probe test)."""
    assert DISTANCE_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert DISTANCE_MAP[96:] == [
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
        (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
    ]
    assert len(DISTANCE_MAP) == 120
    assert len(set(DISTANCE_MAP)) == 120
    # clamp-to-1 rule: offsets pointing right on the current row at tiny
    # widths never produce a non-positive distance
    assert _map_distance(1, 4) == 4  # (0,1) at width 4
    assert _map_distance(2, 4) == 1  # (1,0)
    assert _map_distance(4, 2) == 1  # (-1,1) at width 2 -> 1, clamped min 1


def test_clamp_add_sub_half_truncates_toward_zero():
    """The spec's (a - b) / 2 is C division; a < b must round toward
    zero, not floor (floor would shift odd negative deltas by one)."""
    a = 10 << 8  # green = 10
    b = 15 << 8  # green = 15
    # d = -5 -> half = -2 (trunc), pred green = clamp(10 - 2) = 8
    assert (_clamp_add_sub_half(a, b) >> 8) & 0xFF == 8


def test_predictor_modes_roundtrip_all_14():
    rng = np.random.default_rng(50)
    img = _rand_img(rng, 13, 17, 4)
    for mode in range(14):
        data = encode_webp_lossless(img, predictor=mode, predictor_bits=2)
        assert np.array_equal(decode_webp(data), img[..., :3]), mode


def test_predictor_mixed_block_modes_roundtrip():
    rng = np.random.default_rng(51)
    img = _rand_img(rng, 16, 16, 4)
    modes = rng.integers(0, 14, (4, 4)).astype(np.uint32)  # 4px blocks
    data = encode_webp_lossless(img, predictor=modes, predictor_bits=2)
    assert np.array_equal(decode_webp(data), img[..., :3])


def test_color_transform_roundtrip():
    rng = np.random.default_rng(52)
    img = _rand_img(rng, 11, 19, 4)
    for cte in [(0, 0, 0), (10, -20, 33), (-128, 127, -1), (64, 64, 64)]:
        data = encode_webp_lossless(img, color=cte, color_bits=3)
        assert np.array_equal(decode_webp(data), img[..., :3]), cte


def test_combined_transforms_roundtrip():
    rng = np.random.default_rng(53)
    img = _rand_img(rng, 12, 14, 4)
    data = encode_webp_lossless(
        img, subtract_green=True, color=(5, -9, 17), predictor=11,
        use_cache_bits=4,
    )
    stats: dict = {}
    body = data[20:]  # RIFF(12) + "VP8L"(4) + size(4)
    assert np.array_equal(
        decode_vp8l_stream(body)[..., :3], img[..., :3]
    )
    decode_vp8l_stream(body, stats)
    assert stats["transforms"] == {"subtract_green", "color", "predictor"}


def test_lz77_2d_vertical_runs_roundtrip():
    rng = np.random.default_rng(54)
    row = rng.integers(0, 256, (1, 23, 4), dtype=np.uint8)
    img = np.tile(row, (9, 1, 1))  # every row repeats -> distance=w refs
    data = encode_webp_lossless(img, lz77_2d=True)
    stats: dict = {}
    out = decode_vp8l_stream(data[20:], stats)
    assert np.array_equal(out[..., :3], img[..., :3])
    assert stats.get("dist_2d", 0) > 0  # the 2D map was actually used


@pytest.mark.skipif(not _HAVE_LIBWEBP, reason="no system libwebp")
def test_libwebp_decodes_our_streams():
    """Independent-decoder check of the ENCODER (and so of the shared
    reading of the spec): libwebp must reproduce the source pixels from
    streams using each newly implemented feature."""
    rng = np.random.default_rng(55)
    img = _rand_img(rng, 13, 17, 4)
    cases = [
        dict(predictor=12),
        dict(predictor=13, predictor_bits=2),
        dict(color=(10, -20, 33)),
        dict(lz77_2d=True),
        dict(subtract_green=True, color=(5, -9, 17), predictor=11),
    ]
    for kwargs in cases:
        ref = webp_sys.decode_rgba(encode_webp_lossless(img, **kwargs))
        assert np.array_equal(ref, img), kwargs


@pytest.mark.skipif(not _HAVE_LIBWEBP, reason="no system libwebp")
def test_conformance_on_libwebp_encoded_streams():
    """The decisive cross-check: libwebp-ENCODED lossless streams —
    which use the predictor/color transforms, color cache and 2D
    distance codes as a production encoder emits them — must decode
    bit-exactly to what libwebp itself decodes (== the source).  The
    accumulated stats assert the corpus really exercised those
    features (no vacuous pass)."""
    total: dict = {}
    for seed in range(12):
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(4, 48)), int(rng.integers(4, 48))
        base = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        gx = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
        gy = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
        # gradient + noise mixes trigger predictor/color; flat tiles
        # trigger 2D runs; a >256-color repeated palette (too big to
        # palette-index) makes libwebp engage the color cache
        style = seed % 4
        if style == 0:
            img = ((base * 0.2 + gx * 0.4 + gy * 0.4) % 256).astype(np.uint8)
        elif style == 1:
            img = base
        elif style == 2:
            img = np.tile(base[:1], (h, 1, 1))
        else:
            h, w = 64, 64
            pal = rng.integers(0, 256, (300, 4), dtype=np.uint8)
            img = pal[rng.integers(0, 300, (h, w))]
        img[..., 3] = 255
        data = webp_sys.encode_lossless_rgba(img)
        # find the VP8L payload inside the RIFF for the stats-aware path
        off = data.index(b"VP8L") + 8
        stats: dict = {}
        mine = decode_vp8l_stream(data[off:], stats)
        ref = webp_sys.decode_rgba(data)
        assert np.array_equal(mine[..., :3], ref[..., :3]), seed
        assert np.array_equal(mine[..., 3], ref[..., 3]), seed
        assert np.array_equal(ref, img), seed
        for k, v in stats.items():
            if k == "transforms":
                total.setdefault(k, set()).update(v)
            else:
                total[k] = total.get(k, 0) + v
    assert "predictor" in total.get("transforms", set())
    assert total.get("dist_2d", 0) > 0
    assert total.get("cache_hits", 0) > 0


@pytest.mark.skipif(not _HAVE_LIBWEBP, reason="no system libwebp")
def test_lossy_vp8_falls_through_to_system_libwebp():
    """multimodal's webp entry: lossy VP8 (pure decoder raises
    NotImplementedError) decodes via the system library when present."""
    import ctypes

    from quichash_spark.functions.multimodal import IMAGE_CODECS

    lib = webp_sys.available()
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    rng = np.random.default_rng(56)
    img = np.tile(rng.integers(0, 256, (1, 16, 4), dtype=np.uint8), (16, 1, 1))
    img[..., 3] = 255
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(img.tobytes(), 16, 16, 64, 75.0, ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    with pytest.raises(NotImplementedError):
        decode_webp(data)  # pure decoder: honestly out of scope
    decoded = IMAGE_CODECS["webp"](data)  # auto path: system tier
    assert decoded.shape == (16, 16, 3)


@pytest.mark.skipif(not _HAVE_LIBWEBP, reason="no system libwebp")
def test_distance_map_tail_probed_against_libwebp():
    """Empirical pin of the distance map where the naive symmetric
    window misreads it (the last 24 plane codes, plus spot heads): a
    stream of unique literal pixels with one length-1 copy per probed
    plane code; which pixel libwebp fetches reveals the true (dx, dy).
    Probes are spaced beyond 2x the max reachable distance so each
    source window contains no duplicate values."""
    import struct

    from quichash_spark.functions.vp8l import (
        NUM_DISTANCE_CODES,
        NUM_LENGTH_CODES,
        _write_prefix_code_complex,
    )

    planes = [1, 2, 13, 25, 54, 96] + list(range(97, 121))
    W, SPACING = 64, 1200
    positions = [16 * W + i * SPACING for i in range(len(planes))]
    probes = dict(zip(positions, planes))
    n = positions[-1] + W * 16
    H = (n + W - 1) // W
    n = W * H
    idx = np.arange(n, dtype=np.uint32)
    pix = (0xFF000000 | ((idx & 0xFF) << 16)
           | (((idx >> 8) & 0xFF) << 8) | ((idx >> 16) & 0xFF))

    bw = BitWriter()
    bw.write(W - 1, 14)
    bw.write(H - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g_map = _write_prefix_code_complex(
        bw, complete_two_level_lengths(256 + NUM_LENGTH_CODES))
    maps = [
        _write_prefix_code_complex(bw, complete_two_level_lengths(256))
        for _ in range(3)
    ]
    d_map = _write_prefix_code_complex(
        bw, complete_two_level_lengths(NUM_DISTANCE_CODES))
    pos = 0
    while pos < n:
        if pos in probes:
            code, ln = g_map[256 + 0]  # length code 0 -> copy length 1
            bw.write_code(code, ln)
            dcode, dextra, dbits = prefix_encode_value(probes[pos])
            code, ln = d_map[dcode]
            bw.write_code(code, ln)
            bw.write(dextra, dbits)
            pos += 1
            continue
        p = int(pix[pos])
        code, ln = g_map[(p >> 8) & 0xFF]
        bw.write_code(code, ln)
        for m, sh in zip(maps, (16, 0, 24)):
            code, ln = m[(p >> sh) & 0xFF]
            bw.write_code(code, ln)
        pos += 1

    payload = bytes([0x2F]) + bw.tobytes()
    body = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    ref = webp_sys.decode_rgba(b"RIFF" + struct.pack("<I", len(body)) + body)
    ra = ((ref[..., 3].astype(np.uint32) << 24)
          | (ref[..., 0].astype(np.uint32) << 16)
          | (ref[..., 1].astype(np.uint32) << 8)
          | ref[..., 2]).reshape(-1)
    for pos, plane in probes.items():
        js = np.where(ra[pos - 600:pos] == ra[pos])[0]
        assert len(js) == 1, plane
        dist = 600 - int(js[0])
        dy = (dist + 32) // W
        dx = dist - dy * W
        assert DISTANCE_MAP[plane - 1] == (dx, dy), plane

"""Real codec kernels (wav / G.711 / PNG / BMP) — golden + cross-impl
validation.

G.711 tables are checked byte-for-byte against stdlib ``audioop`` (an
independent C implementation, present through Python 3.12); PNG filters
are checked by decoding hand-crafted streams whose expected pixels are
derived by hand from the spec's reconstruction formulas.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from quichash_spark.functions import audio
from quichash_spark.functions.imaging import (
    decode_bmp,
    decode_png,
    decode_png_pure,
    encode_png,
)

# ---------------------------------------------------------------------------
# G.711
# ---------------------------------------------------------------------------


def test_g711_tables_match_audioop():
    audioop = pytest.importorskip("audioop")
    all_bytes = bytes(range(256))
    expect_u = np.frombuffer(audioop.ulaw2lin(all_bytes, 2), dtype="<i2")
    expect_a = np.frombuffer(audioop.alaw2lin(all_bytes, 2), dtype="<i2")
    got_u = audio.decode_pcm(all_bytes, "mulaw")
    got_a = audio.decode_pcm(all_bytes, "alaw")
    assert np.array_equal(got_u, expect_u)
    assert np.array_equal(got_a, expect_a)


def test_g711_known_anchors():
    # mu-law 0xFF decodes to 0 (quiet), 0x00 to the negative extreme
    u = audio.decode_pcm(bytes([0xFF, 0x00]), "mulaw")
    assert u[0] == 0 and u[1] == -32124
    # A-law alternates sign across the 0x80 bit
    a = audio.decode_pcm(bytes([0x55, 0xD5]), "alaw")
    assert a[0] == -a[1] != 0


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_roundtrip_16bit():
    pcm = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    data = audio.encode_wav(pcm, sr_hz=16000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert np.array_equal(audio.decode_pcm(data, "wav"), pcm)


def _wav_bytes(fmt_payload: bytes, raw: bytes) -> bytes:
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_wav_8bit_unsigned():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = _wav_bytes(fmt, bytes([128, 255, 0]))  # mid, max, min
    got = audio.decode_pcm(data, "wav")
    assert list(got) == [0, 127 << 8, -128 << 8]


def test_wav_stereo_integer_downmix():
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    interleaved = np.array([100, 200, -100, -301], dtype="<i2")  # L R L R
    got = audio.decode_pcm(_wav_bytes(fmt, interleaved.tobytes()), "wav")
    assert list(got) == [150, -201]  # integer mean (floor division)


def test_wav_malformed_is_surfaced_not_fatal():
    assert audio.decode_pcm(b"RIFFxxxx", "wav") is None  # truncated
    assert audio.decode_pcm(b"not audio at all", "wav") is None
    # MP3-in-WAV (format 0x55) unsupported -> None, never a crash
    # (float format 3 and ADPCM formats 2/0x11 DECODE as of r5)
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 32000, 4, 0)
    assert audio.decode_pcm(_wav_bytes(fmt, b"\x00" * 8), "wav") is None


def test_wav_flows_through_signature_kernel(spark):
    """A wav-coded clip with identical PCM as a pcm16 clip must produce
    the identical content/pcm hash (codec-transparent dedup — the same
    invariant the fixture plants for pcm16 vs pcm16_padded)."""
    from pyspark.sql import Row

    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.functions.udfs import compute_signatures

    pcm = np.arange(4000, dtype=np.int16)
    df = spark.createDataFrame(
        [
            Row(clip_id="raw", bytes=pcm.tobytes(), sr_hz=8000, dur_ms=500,
                codec="pcm16", transcript="same words"),
            Row(clip_id="wav", bytes=audio.encode_wav(pcm), sr_hz=8000,
                dur_ms=500, codec="wav", transcript="same words"),
            Row(clip_id="ulaw", bytes=b"\xff" * 100, sr_hz=8000, dur_ms=12,
                codec="mulaw", transcript="quiet"),
        ]
    )
    rows = {r["clip_id"]: r for r in
            compute_signatures(df, CLIPS_CONFIG).collect()}
    assert rows["raw"]["content_hash"] == rows["wav"]["content_hash"]
    assert rows["raw"]["pcm_hash"] == rows["wav"]["pcm_hash"]
    assert rows["ulaw"]["decode_ok"] and rows["ulaw"]["n_samples"] == 100


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def test_png_roundtrip_rgb_and_gray():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
    gray = rng.integers(0, 256, (5, 8), dtype=np.uint8)
    out = decode_png(encode_png(gray))
    assert out.shape == (5, 8, 3)
    assert np.array_equal(out[..., 0], gray)
    assert np.array_equal(out[..., 1], gray)


def _png_from_rows(w: int, h: int, color_type: int, raw_rows: bytes) -> bytes:
    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw_rows)) + chunk(b"IEND", b""))


def test_png_all_filter_types_reconstruct_per_spec():
    """One grayscale row per filter type, expected values derived by hand
    from the spec formulas (Recon = Filt + predictor, mod 256)."""
    rows = (
        b"\x00" + bytes([10, 20, 30])        # None  -> 10 20 30
        + b"\x01" + bytes([5, 5, 250])       # Sub   -> 5 10 (10+250)%256=4
        + b"\x02" + bytes([1, 2, 3])         # Up    -> 6 12 7
        + b"\x03" + bytes([10, 10, 10])      # Avg   -> 13 21 24
        # Paeth row: a=left, b=up, c=up-left
        + b"\x04" + bytes([1, 1, 1])
    )
    img = decode_png_pure(_png_from_rows(3, 5, 0, rows))[..., 0]
    assert list(img[0]) == [10, 20, 30]
    assert list(img[1]) == [5, 10, 4]
    assert list(img[2]) == [6, 12, 7]
    # Avg: x0 = 10 + (0+6)//2 = 13; x1 = 10 + (13+12)//2 = 22;
    #      x2 = 10 + (22+7)//2 = 24
    assert list(img[3]) == [13, 22, 24]
    # Paeth row 4 over row 3 [13,22,24]:
    # x0: a=0,b=13,c=0 -> p=13 -> pred=b=13 -> 14
    # x1: a=14,b=22,c=13 -> p=23: pa=9,pb=1,pc=10 -> pred=22 -> 23
    # x2: a=23,b=24,c=22 -> p=25: pa=2,pb=1,pc=3 -> pred=24 -> 25
    assert list(img[4]) == [14, 23, 25]


def test_png_crc_mismatch_rejected():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    data[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC|PNG"):
        decode_png_pure(bytes(data))


def test_png_rgba_alpha_dropped():
    # hand-build a 1x2 RGBA image, filter 0
    raw = b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 0])
    img = decode_png_pure(_png_from_rows(2, 1, 6, raw))
    assert img.shape == (1, 2, 3)
    assert list(img[0, 0]) == [1, 2, 3] and list(img[0, 1]) == [4, 5, 6]


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def _bmp_bytes(w: int, h: int, bgr_rows_bottom_up: bytes) -> bytes:
    px_off = 54
    header = (b"BM" + struct.pack("<IHHI", px_off + len(bgr_rows_bottom_up),
                                  0, 0, px_off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(bgr_rows_bottom_up), 2835, 2835, 0, 0))
    return header + bgr_rows_bottom_up


def test_bmp_bottom_up_padding_bgr():
    # 2x2, stride padded 6->8; bottom row first; BGR order
    rows = (bytes([255, 0, 0,   0, 255, 0]) + b"\x00\x00"    # bottom: blue, green
            + bytes([0, 0, 255, 10, 20, 30]) + b"\x00\x00")  # top: red, misc
    img = decode_bmp(_bmp_bytes(2, 2, rows))
    assert list(img[0, 0]) == [255, 0, 0]     # top-left red (RGB)
    assert list(img[0, 1]) == [30, 20, 10]    # BGR -> RGB swap
    assert list(img[1, 0]) == [0, 0, 255]     # bottom-left blue
    assert list(img[1, 1]) == [0, 255, 0]


def test_image_features_with_real_png(spark):
    from pyspark.sql import Row

    from quichash_spark.functions import multimodal as M

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [Row(item_id="p", payload=encode_png(img), codec="png")]
    )
    got = M.image_features(df).collect()[0]
    assert got["decode_ok"] and got["width"] == 16 and got["height"] == 16
    assert abs(got["mean_r"] - float(img[..., 0].mean())) < 1e-9
    assert len(got["phash"]) == 64


def test_image_features_malformed_payload_not_fatal(spark):
    """Malformed-input contract (ADVICE r3): truncated/corrupt payloads
    must yield decode_ok=False rows, not fail the Spark job — decode_png
    raises ValueError/zlib.error/CRC mismatch by design and the kernel
    must absorb those like the audio path does."""
    from pyspark.sql import Row

    from quichash_spark.functions import multimodal as M

    good = encode_png(np.full((4, 4, 3), 9, dtype=np.uint8))
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # CRC mismatch
    df = spark.createDataFrame(
        [
            Row(item_id="trunc", payload=good[: len(good) // 2], codec="png"),
            Row(item_id="crc", payload=bytes(corrupt), codec="png"),
            Row(item_id="garbage", payload=b"not a bmp", codec="bmp"),
            Row(item_id="ok", payload=good, codec="png"),
        ]
    )
    rows = {r["item_id"]: r for r in M.image_features(df).collect()}
    assert not rows["trunc"]["decode_ok"]
    assert not rows["crc"]["decode_ok"]
    assert not rows["garbage"]["decode_ok"]
    assert rows["ok"]["decode_ok"] and rows["ok"]["width"] == 4
    # honest stubs still surface loudly, not as silent decode failures —
    # webp is REAL for the full lossless format (functions/vp8l.py, r5);
    # a lossy-VP8 payload falls through to the system libwebp when one is
    # loadable (which rejects this 4-byte fake as malformed -> decode_ok
    # False), else the pure decoder's NotImplementedError surfaces
    import struct

    import pytest as _pytest

    from quichash_spark.functions import webp_sys

    vp8 = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\0\0\0\0"
    stub_df = spark.createDataFrame([Row(item_id="j", payload=bytearray(vp8), codec="webp")])
    if webp_sys.available() is not None:
        assert M.image_features(stub_df).collect()[0]["decode_ok"] is False
    else:
        with _pytest.raises(Exception, match="NotImplementedError|VP8"):
            M.image_features(stub_df).collect()


# ---------------------------------------------------------------------------
# IMA ADPCM
# ---------------------------------------------------------------------------


def test_ima_core_matches_audioop():
    """The nibble loop must agree with stdlib audioop's independent
    DVI/IMA implementation (audioop packs the FIRST sample in the HIGH
    nibble; the loop itself is byte-order-agnostic)."""
    audioop = pytest.importorskip("audioop")
    from quichash_spark.functions.audio import _ima_decode_nibbles

    rng = np.random.default_rng(11)
    pcm = (rng.normal(0, 6000, 400)).astype("<i2").tobytes()
    enc, _ = audioop.lin2adpcm(pcm, 2, None)
    expect = np.frombuffer(audioop.adpcm2lin(enc, 2, None)[0], dtype="<i2")
    body = np.frombuffer(enc, dtype=np.uint8)
    nibbles = np.empty(body.size * 2, dtype=np.uint8)
    nibbles[0::2] = body >> 4   # audioop: high nibble first
    nibbles[1::2] = body & 0x0F
    got = _ima_decode_nibbles(nibbles, 0, 0)
    assert np.array_equal(got, expect)


def test_audioop_fast_path_engaged_on_pre313():
    """VERDICT r3 #3: on Python <= 3.12 the registered G.711/ADPCM
    decoders must BE the audioop-backed (C) kernels, not the numpy/pure
    fallbacks — the same auto-swap contract hashreg has for wheels."""
    pytest.importorskip("audioop")
    assert audio.CODECS["mulaw"] is audio._decode_mulaw_audioop
    assert audio.CODECS["alaw"] is audio._decode_alaw_audioop
    assert audio.CODECS["ima_adpcm"] is audio._decode_ima_adpcm_audioop


def test_ima_audioop_path_matches_pure_and_is_faster():
    """Bit-equality of the audioop ADPCM path vs the pure spec kernel on
    a random stream (arbitrary initial state), and a throughput check
    that the C path actually engaged — the pure loop is one Python
    iteration per 4-bit code, so even a 3x margin is a loose bound."""
    import time

    pytest.importorskip("audioop")
    rng = np.random.default_rng(23)
    body = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
    stream = np.array([-777], dtype="<i2").tobytes() + bytes([37, 0]) + body
    expect = audio._decode_ima_adpcm_pure(stream)
    got = audio._decode_ima_adpcm_audioop(stream)
    assert np.array_equal(got, expect)

    t0 = time.perf_counter()
    audio._decode_ima_adpcm_audioop(stream)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    audio._decode_ima_adpcm_pure(stream)
    t_pure = time.perf_counter() - t0
    assert t_pure > 3 * t_native, (t_pure, t_native)


def test_g711_audioop_path_matches_pure():
    pytest.importorskip("audioop")
    all_bytes = bytes(range(256)) * 3
    assert np.array_equal(
        audio._decode_mulaw_audioop(all_bytes), audio._decode_mulaw_pure(all_bytes)
    )
    assert np.array_equal(
        audio._decode_alaw_audioop(all_bytes), audio._decode_alaw_pure(all_bytes)
    )


def test_ima_adpcm_stream_decode():
    from quichash_spark.functions.audio import _ima_decode_nibbles

    # header: predictor 1234, step index 5; two bytes of nibbles
    header = np.array([1234], dtype="<i2").tobytes() + bytes([5, 0])
    body = bytes([0x71, 0x8F])  # low-first: 1,7,15,8
    got = audio.decode_pcm(header + body, "ima_adpcm")
    expect_tail = _ima_decode_nibbles(
        np.array([1, 7, 15, 8], dtype=np.uint8), 1234, 5
    )
    assert got[0] == 1234
    assert np.array_equal(got[1:], expect_tail)
    # malformed: too short / bad index -> surfaced, not fatal
    assert audio.decode_pcm(b"\x00\x00", "ima_adpcm") is None
    assert audio.decode_pcm(b"\x00\x00\x7f\x00\x11", "ima_adpcm") is None


# ---------------------------------------------------------------------------
# baseline JPEG (functions/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_idct_matches_direct_spec_formula():
    """The batched einsum iDCT must agree with the direct O(n^4) T.81
    A.3.3 reconstruction formula on random coefficient blocks."""
    from quichash_spark.functions import jpeg as J

    rng = np.random.default_rng(5)
    coeffs = rng.integers(-512, 512, (4, 8, 8)).astype(np.float64)

    def alpha(u):
        return np.sqrt(1 / 8) if u == 0 else 0.5

    direct = np.zeros_like(coeffs)
    for n in range(4):
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        s += (alpha(u) * alpha(v) * coeffs[n, u, v]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                direct[n, x, y] = s
    got = J._idct2_batch(coeffs)
    assert np.allclose(got, direct, atol=1e-9)


def test_jpeg_roundtrip_flat_quant_near_exact():
    """Flat quant table of 1 makes encode->decode lossless up to DCT
    float rounding: max abs error <= 2 across RGB and grayscale."""
    from quichash_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, qtable=1))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2

    gray = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    outg = decode_jpeg(encode_jpeg(gray, qtable=1))
    assert outg.shape == (8, 8, 3)
    assert int(np.abs(outg[..., 0].astype(int) - gray.astype(int)).max()) <= 1
    assert np.array_equal(outg[..., 0], outg[..., 1])


def test_jpeg_constant_block_golden():
    """Hand-derived golden: a constant-gray 8x8 image has exactly one
    nonzero coefficient, DC = 8*(v-128); the decoder must reproduce the
    constant exactly (cos terms vanish, no rounding error)."""
    from quichash_spark.functions.jpeg import decode_jpeg, encode_jpeg

    for v in (0, 77, 128, 200, 255):
        img = np.full((8, 8), v, dtype=np.uint8)
        data = encode_jpeg(img, qtable=1)
        out = decode_jpeg(data)
        assert np.all(out == v), (v, np.unique(out))


def test_jpeg_lossy_quant_still_close():
    """A realistic (non-flat) quant table stays visually faithful on a
    smooth gradient: mean abs error small, no structural failure."""
    from quichash_spark.functions.jpeg import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 32)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    img3 = np.repeat(img[..., None], 3, axis=2)
    out = decode_jpeg(encode_jpeg(img3, qtable=8))
    err = np.abs(out.astype(int) - img3.astype(int))
    assert err.mean() < 4 and err.max() < 40


def test_jpeg_malformed_and_unsupported_rejected():
    from quichash_spark.functions.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    # flip SOF0 to SOF9 (arithmetic coding) -> explicit unsupported error
    data[i + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF9"):
        decode_jpeg(bytes(data))
    # flip SOF0 to SOF2: progressive is SUPPORTED now (r5), but a baseline
    # scan header (Ss=0, Se=63) is malformed under progressive rules
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se"):
        decode_jpeg(bytes(data))
    # truncated scan -> surfaced via decode_ok=False upstream, here raises
    full = encode_jpeg(np.full((16, 16), 9, dtype=np.uint8))
    with pytest.raises(Exception):
        decode_jpeg(full[: len(full) - 12])


def test_jpeg_through_image_features(spark):
    from pyspark.sql import Row

    from quichash_spark.functions import multimodal as M
    from quichash_spark.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [Row(item_id="j", payload=encode_jpeg(img, qtable=1), codec="jpeg")]
    )
    got = M.image_features(df).collect()[0]
    assert got["decode_ok"] and got["width"] == 16 and got["height"] == 16
    assert abs(got["mean_r"] - float(img[..., 0].mean())) < 1.0


# ---------------------------------------------------------------------------
# FLAC (functions/flac.py)
# ---------------------------------------------------------------------------


def _flac():
    from quichash_spark.functions import flac as F

    return F


def test_flac_verbatim_and_constant_roundtrip():
    F = _flac()
    rng = np.random.default_rng(3)
    pcm = (rng.normal(0, 3000, 10000)).astype(np.int16)
    assert np.array_equal(F.decode_flac(F.encode_flac(pcm, blocksize=4096)), pcm)
    c = np.full(600, -123, dtype=np.int16)
    out = F.decode_flac(F.encode_flac(c, blocksize=200, subframe="constant"))
    assert np.array_equal(out, c)


def test_flac_fixed_orders_rice_roundtrip():
    """Every fixed-predictor order 0-4 with real Rice-coded residuals:
    lossless round trip AND actual compression on a smooth signal."""
    F = _flac()
    t = np.arange(8000)
    smooth = (2000 * np.sin(t / 50) + 500 * np.sin(t / 7)).astype(np.int16)
    for order in range(5):
        data = F.encode_flac(smooth, blocksize=1000, subframe="fixed",
                             fixed_order=order)
        assert np.array_equal(F.decode_flac(data), smooth), order
    assert len(data) < smooth.size * 2 // 3  # order-4 genuinely compresses


def test_flac_all_stereo_decorrelation_modes():
    """left/side, right/side, mid/side (incl. the 17-bit side channel and
    the mid LSB restore) must all reconstruct; output downmix matches the
    WAV path's integer mean."""
    F = _flac()
    rng = np.random.default_rng(5)
    st = (rng.normal(0, 3000, (5000, 2))).astype(np.int16)
    expect = ((st[:, 0].astype(np.int64) + st[:, 1]) // 2).astype(np.int16)
    for mode in ("indep", "left-side", "right-side", "mid-side"):
        got = F.decode_flac(F.encode_flac(st, blocksize=1000, stereo_mode=mode))
        assert np.array_equal(got, expect), mode


def test_flac_lpc_subframe_hand_crafted():
    """LPC path: hand-build a frame whose subframe is order-2 LPC with
    known coefficients and shift; expected samples derived by running the
    spec recurrence sample = residual + ((c0*s[-1] + c1*s[-2]) >> shift)
    independently in the test."""
    F = _flac()
    coefs, shift, warmup = [3, -1], 1, [100, 120]
    residual = [5, -3, 7, 0, -2, 4]
    expect = list(warmup)
    for r in residual:
        pred = (coefs[0] * expect[-1] + coefs[1] * expect[-2]) >> shift
        expect.append(r + pred)

    bw = F._BitWriter()
    bw.write(0x3FFE, 14); bw.write(0, 1); bw.write(0, 1)
    bw.write(7, 4); bw.write(13, 4); bw.write(0, 4); bw.write(4, 3)
    bw.write(0, 1); bw.write(0, 8)                 # frame number 0
    bw.write(len(expect) - 1, 16); bw.write(8000, 16)
    bw.write(F._crc8(bytes(bw.out)), 8)
    bw.write(0, 1)
    bw.write(32 + (2 - 1), 6)                      # LPC, order 2
    bw.write(0, 1)                                 # no wasted bits
    for s in warmup:
        bw.write(s, 16)
    bw.write(15 - 1, 4)                            # precision 15
    bw.write(shift, 5)
    for c in coefs:
        bw.write(c, 15)
    bw.write(0, 2); bw.write(0, 4)                 # RICE, 1 partition
    bw.write(3, 4)                                 # rice param 3
    for r in residual:
        zz = F._zigzag_encode(r)
        bw.write_unary(zz >> 3)
        bw.write(zz & 7, 3)
    bw.align()
    frame = bytes(bw.out)

    si = bytearray(34)
    si[10:18] = ((8000 << 44) | (15 << 36) | len(expect)).to_bytes(8, "big")
    stream = (F.FLAC_MAGIC + bytes([0x80]) + len(si).to_bytes(3, "big")
              + bytes(si) + frame + struct.pack(">H", F._crc16(frame)))
    assert list(F.decode_flac(stream)) == expect


def test_flac_escape_partition_and_wasted_bits():
    """Raw-bits escape partitions (param 0b1111 -> 5-bit count + raw
    residuals) and the wasted-bits shift path."""
    F = _flac()
    samples = [40, -52, 12, -8]  # all even: one wasted bit

    def frame_with(body_writer) -> bytes:
        bw = F._BitWriter()
        bw.write(0x3FFE, 14); bw.write(0, 1); bw.write(0, 1)
        bw.write(7, 4); bw.write(13, 4); bw.write(0, 4); bw.write(4, 3)
        bw.write(0, 1); bw.write(0, 8)
        bw.write(len(samples) - 1, 16); bw.write(8000, 16)
        bw.write(F._crc8(bytes(bw.out)), 8)
        body_writer(bw)
        bw.align()
        frame = bytes(bw.out)
        si = bytearray(34)
        si[10:18] = ((8000 << 44) | (15 << 36) | len(samples)).to_bytes(8, "big")
        return (F.FLAC_MAGIC + bytes([0x80]) + len(si).to_bytes(3, "big")
                + bytes(si) + frame + struct.pack(">H", F._crc16(frame)))

    def escape_body(bw):
        bw.write(0, 1); bw.write(8, 6); bw.write(0, 1)   # FIXED order 0
        bw.write(0, 2); bw.write(0, 4)                   # RICE, 1 partition
        bw.write(15, 4)                                  # ESCAPE
        bw.write(8, 5)                                   # 8 raw bits each
        for s in samples:
            bw.write(s, 8)

    assert list(F.decode_flac(frame_with(escape_body))) == samples

    def wasted_body(bw):
        bw.write(0, 1); bw.write(1, 6)                   # VERBATIM
        bw.write(1, 1); bw.write(1, 1)                   # wasted = unary0+1 = 1
        for s in samples:
            bw.write(s >> 1, 15)                         # 16-1 bits, pre-shift

    assert list(F.decode_flac(frame_with(wasted_body))) == samples


def test_flac_crc_and_malformed_rejected():
    F = _flac()
    pcm = np.arange(100, dtype=np.int16)
    good = bytearray(F.encode_flac(pcm, blocksize=100))
    good[-20] ^= 0x01  # corrupt frame payload -> CRC-16 mismatch
    with pytest.raises(ValueError, match="CRC"):
        F.decode_flac(bytes(good))
    with pytest.raises(ValueError, match="FLAC"):
        F.decode_flac(b"not flac at all")
    # registry integration: malformed flac surfaces as decode_ok None path
    assert audio.decode_pcm(b"fLaC\x00\x00\x00", "flac") is None
    assert np.array_equal(
        audio.decode_pcm(F.encode_flac(pcm), "flac"), pcm
    )


def test_flac_flows_through_signature_kernel(spark):
    """A flac-coded clip with identical PCM as a pcm16 clip produces the
    identical content/pcm hash — codec-transparent dedup, the same
    invariant as the WAV test."""
    from pyspark.sql import Row

    from quichash_spark.config import CLIPS_CONFIG
    from quichash_spark.functions.udfs import compute_signatures

    F = _flac()
    pcm = (np.sin(np.arange(4000) / 30) * 9000).astype(np.int16)
    df = spark.createDataFrame(
        [
            Row(clip_id="raw", bytes=pcm.tobytes(), sr_hz=8000, dur_ms=500,
                codec="pcm16", transcript="same words"),
            Row(clip_id="flac", bytes=F.encode_flac(pcm, subframe="fixed"),
                sr_hz=8000, dur_ms=500, codec="flac", transcript="same words"),
        ]
    )
    rows = {r["clip_id"]: r for r in
            compute_signatures(df, CLIPS_CONFIG).collect()}
    assert rows["flac"]["decode_ok"]
    assert rows["raw"]["content_hash"] == rows["flac"]["content_hash"]
    assert rows["raw"]["pcm_hash"] == rows["flac"]["pcm_hash"]


# ---------------------------------------------------------------------------
# progressive JPEG (r5: SOF2 — spectral selection + successive approximation)
# ---------------------------------------------------------------------------


def test_progressive_roundtrip_matches_baseline_exactly():
    """The progressive scan script encodes the SAME coefficients as the
    baseline writer, so the two decodes must be bit-identical — this
    pins the DC/AC first+refinement scan decoders and EOB-run handling
    without any iDCT tolerance."""
    from quichash_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(21)
    cases = [
        rng.integers(0, 256, (24, 33, 3), dtype=np.uint8),   # noise
        rng.integers(0, 256, (13, 22), dtype=np.uint8),      # grayscale
        (np.linspace(0, 255, 48)[None, :, None]
         * np.ones((32, 1, 3))).astype(np.uint8),            # smooth: EOBRUNs
        np.full((64, 64, 3), 77, np.uint8),                  # flat: long EOBRUN
    ]
    for i, img in enumerate(cases):
        for q in (1, 8):
            base = decode_jpeg(encode_jpeg(img, qtable=q))
            prog = decode_jpeg(encode_jpeg(img, qtable=q, progressive=True))
            assert np.array_equal(base, prog), (i, q)
    # flat q=1 round trip also within DCT float rounding of the source
    img = cases[0]
    out = decode_jpeg(encode_jpeg(img, qtable=1, progressive=True))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def _imageio_jpeg(spark, img, quality, progressive):
    """Encode via the JVM's javax.imageio (an independent implementation
    shipped with every Spark runtime) — gray (2-D) or RGB input."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    h, w = img.shape[:2]
    gray = img.ndim == 2
    bi = BI(w, h, BI.TYPE_BYTE_GRAY if gray else BI.TYPE_INT_RGB)
    raster = bi.getRaster()
    for y in range(h):
        for x in range(w):
            if gray:
                # raster samples, NOT setRGB: the BufferedImage RGB path
                # applies a nonlinear sRGB<->gray colorspace transform
                raster.setSample(x, y, 0, int(img[y, x]))
            else:
                r, g, b = (int(v) for v in img[y, x])
                bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    param = writer.getDefaultWriteParam()
    if progressive:
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(float(quality))
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.close()
    return bytes(baos.toByteArray())


def _imageio_decode(spark, data):
    jvm = spark._jvm
    bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(data))
    h, w = bi.getHeight(), bi.getWidth()
    out = np.empty((h, w, 3), np.uint8)
    if bi.getRaster().getNumBands() == 1:
        # raw decoded samples (getRGB would run gray->sRGB gamma)
        raster = bi.getRaster()
        for y in range(h):
            for x in range(w):
                out[y, x] = raster.getSample(x, y, 0)
        return out
    for y in range(h):
        for x in range(w):
            v = bi.getRGB(x, y)
            out[y, x] = ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
    return out


def test_progressive_conformance_against_imageio(spark):
    """Independent-implementation check on REAL progressive streams
    (ImageIO writes the classic libjpeg 10-scan script: interleaved DC
    with successive approximation Al=1, banded AC at Al=2/1 with two
    refinement passes, 4:2:0 subsampling).  Color images: my decode of
    the progressive file must be BIT-IDENTICAL to my decode of the
    baseline file at the same quality (same coefficients; this isolates
    the scan decoders from the known nearest-vs-fancy chroma upsampling
    difference, which tests below bound separately).  Grayscale (no
    chroma, no upsampling): my pixels vs ImageIO's within iDCT rounding.
    """
    from quichash_spark.functions.jpeg import decode_jpeg

    rng = np.random.default_rng(31)
    for seed, (h, w) in enumerate([(24, 33), (17, 16), (8, 8), (40, 25)]):
        gx = np.linspace(0, 200, w)[None, :, None]
        img = (rng.integers(0, 60, (h, w, 3)) + gx).astype(np.uint8)
        for quality in (0.95, 0.5):
            base = _imageio_jpeg(spark, img, quality, False)
            prog = _imageio_jpeg(spark, img, quality, True)
            assert b"\xff\xc2" in prog  # really SOF2
            # sanity: ImageIO itself sees identical pixels in both files
            assert np.array_equal(
                _imageio_decode(spark, base), _imageio_decode(spark, prog)
            )
            assert np.array_equal(decode_jpeg(base), decode_jpeg(prog)), (
                seed, quality,
            )

    for quality in (0.9, 0.6):
        g = rng.integers(0, 256, (21, 18), dtype=np.uint8)
        prog = _imageio_jpeg(spark, g, quality, True)
        assert b"\xff\xc2" in prog
        mine = decode_jpeg(prog).astype(int)
        ref = _imageio_decode(spark, prog).astype(int)
        assert np.abs(mine - ref).max() <= 2


def test_color_conformance_bound_against_imageio(spark):
    """The color channel difference vs ImageIO is bounded and comes from
    chroma upsampling (nearest vs libjpeg's 'fancy' triangular filter) —
    luma must agree within iDCT rounding even at 4:2:0."""
    from quichash_spark.functions.jpeg import decode_jpeg

    rng = np.random.default_rng(32)
    img = (rng.integers(0, 50, (24, 32, 3))
           + np.linspace(0, 180, 32)[None, :, None]).astype(np.uint8)
    prog = _imageio_jpeg(spark, img, 0.9, True)
    mine = decode_jpeg(prog).astype(np.float64)
    ref = _imageio_decode(spark, prog).astype(np.float64)
    luma = np.array([0.299, 0.587, 0.114])
    assert np.abs((mine - ref) @ luma).max() <= 3.0


# ---------------------------------------------------------------------------
# PNG feature-matrix upgrade (r5): palette, Adam7, sub-8/16-bit depths
# ---------------------------------------------------------------------------


def test_png_adam7_interlace_roundtrip_all_pass_shapes():
    from quichash_spark.functions.imaging import decode_png_pure, encode_png

    rng = np.random.default_rng(31)
    # shapes chosen to hit empty passes, single-pixel passes and
    # every pass-boundary remainder
    for shape in [(1, 1), (2, 2), (7, 5), (8, 8), (9, 17), (16, 3), (31, 29)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        got = decode_png_pure(encode_png(img, interlace=True))
        np.testing.assert_array_equal(got, img)


def test_png_palette_roundtrip_minimal_depths():
    from quichash_spark.functions.imaging import decode_png_pure, encode_png

    rng = np.random.default_rng(32)
    # palette sizes straddling the 1/2/4/8-bit index depth choices
    for nc in (2, 3, 5, 16, 17, 130):
        pal = np.unique(rng.integers(0, 256, (nc, 3), dtype=np.uint8), axis=0)
        img = pal[rng.integers(0, pal.shape[0], (13, 19))]
        for inter in (False, True):
            got = decode_png_pure(encode_png(img, palette=True, interlace=inter))
            np.testing.assert_array_equal(got, img)


def test_png_sub8_gray_scales_to_full_range():
    from quichash_spark.functions.imaging import decode_png_pure, encode_png

    rng = np.random.default_rng(33)
    for d, scale in ((1, 255), (2, 85), (4, 17)):
        g = rng.integers(0, 1 << d, (11, 13), dtype=np.uint8)
        got = decode_png_pure(encode_png(g, depth=d))[..., 0]
        np.testing.assert_array_equal(got, g * scale)


def test_png_16bit_decodes_high_byte():
    from quichash_spark.functions.imaging import decode_png_pure, encode_png

    rng = np.random.default_rng(34)
    g16 = rng.integers(0, 1 << 16, (9, 7), dtype=np.uint16)
    got = decode_png_pure(encode_png(g16, depth=16))[..., 0]
    np.testing.assert_array_equal(got, (g16 >> 8).astype(np.uint8))
    c16 = rng.integers(0, 1 << 16, (6, 5, 3), dtype=np.uint16)
    got = decode_png_pure(encode_png(c16, depth=16))
    np.testing.assert_array_equal(got, (c16 >> 8).astype(np.uint8))


def test_png_trns_palette_composites_over_black():
    from quichash_spark.functions.imaging import decode_png_pure, encode_png

    pal = np.array([[200, 100, 50], [10, 20, 30]], np.uint8)
    img = pal[np.array([[0, 1], [1, 0]])]
    got = decode_png_pure(encode_png(img, palette=True, trns=bytes([0])))
    # np.unique sorts rows: entry 0 = (10,20,30) -> fully transparent
    exp = img.copy()
    exp[(img == pal[1]).all(axis=2)] = 0
    np.testing.assert_array_equal(got, exp)


def test_png_invalid_depth_type_combo_rejected():
    import struct as _s
    import zlib as _z

    from quichash_spark.functions.imaging import (
        PNG_SIG, decode_png_pure, encode_png,
    )

    data = bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))
    # patch IHDR depth to 4 for color type 2 (invalid per spec)
    ihdr_off = len(PNG_SIG) + 8
    data[ihdr_off + 8] = 4
    body = bytes(data[ihdr_off : ihdr_off + 13])
    crc = _z.crc32(b"IHDR" + body) & 0xFFFFFFFF
    data[ihdr_off + 13 : ihdr_off + 17] = _s.pack(">I", crc)
    with pytest.raises(ValueError, match="invalid PNG depth"):
        decode_png_pure(bytes(data))


# ---------------------------------------------------------------------------
# BMP upgrade (r5): palette 1/4/8-bit, RLE8, 32-bit
# ---------------------------------------------------------------------------


def test_bmp_palette_roundtrip_and_rle8():
    from quichash_spark.functions.imaging import decode_bmp, encode_bmp

    rng = np.random.default_rng(41)
    pal = np.unique(rng.integers(0, 256, (40, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, pal.shape[0], (13, 19))]
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img, palette=True)), img)
    np.testing.assert_array_equal(
        decode_bmp(encode_bmp(img, palette=True, rle8=True)), img
    )
    # runs compress well and still round-trip
    runs = pal[np.repeat(np.arange(5), 60).reshape(1, -1) % pal.shape[0]]
    runs = np.tile(runs, (7, 1, 1))
    np.testing.assert_array_equal(
        decode_bmp(encode_bmp(runs, palette=True, rle8=True)), runs
    )


def test_bmp_rle8_opcodes_by_hand():
    import struct as _s

    from quichash_spark.functions.imaging import decode_bmp

    # 4x2 bottom-up: row0(bottom) = run 3 of idx1 + abs [2] ; row1 = delta
    # skip (2,0) then run 2 of idx2, rest stays index 0
    pal = bytes()
    pal_entries = [(10, 10, 10, 0), (20, 30, 40, 0), (50, 60, 70, 0)]
    for b, g, r, x in pal_entries:
        pal += bytes([b, g, r, x])
    pal += bytes(4) * (256 - 3)
    body = bytes([3, 1, 2, 2, 2, 2, 0, 0]) + bytes([0, 2, 2, 0, 2, 2, 0, 1])
    # ^ run3(idx1), abs-mode needs n>=3 so use encoded run 2 of idx2; EOL;
    #   delta dx=2 dy=0; run 2 of idx2; EOB
    hdr = _s.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, len(body), 0, 0, 256, 0)
    off = 14 + 40 + 1024
    data = b"BM" + _s.pack("<IHHI", off + len(body), 0, 0, off) + hdr + pal + body
    got = decode_bmp(data)
    # bottom row: idx 1,1,1,2 ; top row: idx 0,0,2,2
    exp_idx = np.array([[0, 0, 2, 2], [1, 1, 1, 2]])
    lut = np.array([[10, 10, 10], [40, 30, 20], [70, 60, 50]], np.uint8)
    np.testing.assert_array_equal(got, lut[exp_idx])


def test_bmp_sub8_uncompressed_and_32bit():
    import struct as _s

    from quichash_spark.functions.imaging import decode_bmp, encode_bmp

    # 4-bit palette, hand-built: 5 px wide -> 3 data bytes, padded to 4
    pal = b"".join(bytes([i * 16, i * 8, i * 4, 0]) for i in range(16))
    idx_rows = [[1, 2, 3, 4, 5], [6, 7, 8, 9, 10]]
    body = b""
    for row in reversed(idx_rows):  # bottom-up
        packed = bytes([
            (row[0] << 4) | row[1], (row[2] << 4) | row[3], row[4] << 4,
        ])
        body += packed + b"\x00"  # pad to 4 bytes
    hdr = _s.pack("<IiiHHIIiiII", 40, 5, 2, 1, 4, 0, len(body), 0, 0, 16, 0)
    off = 14 + 40 + 64
    data = b"BM" + _s.pack("<IHHI", off + len(body), 0, 0, off) + hdr + pal + body
    got = decode_bmp(data)
    lut = np.array([[i * 4, i * 8, i * 16] for i in range(16)], np.uint8)
    np.testing.assert_array_equal(got, lut[np.array(idx_rows)])

    # 32-bit BI_RGB: BGRA rows, alpha dropped — build from the 24-bit writer
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)
    bgra = np.zeros((3, 3, 4), np.uint8)
    bgra[..., :3] = img[::-1, :, ::-1]
    bgra[..., 3] = 255
    px = bgra.tobytes()
    hdr = _s.pack("<IiiHHIIiiII", 40, 3, 3, 1, 32, 0, len(px), 0, 0, 0, 0)
    off = 14 + 40
    data = b"BM" + _s.pack("<IHHI", off + len(px), 0, 0, off) + hdr + px
    np.testing.assert_array_equal(decode_bmp(data), img)


# ---------------------------------------------------------------------------
# WAV format matrix (r5): 24/32-bit PCM, IEEE float, G.711-in-WAV,
# WAVE_FORMAT_EXTENSIBLE
# ---------------------------------------------------------------------------


def _wav(fmt_code, channels, bits, payload, extensible=False,
         block_align=2):
    import struct

    if extensible:
        sub = (
            struct.pack("<H", fmt_code) + b"\x00\x00"
            + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        )
        fmt = (
            struct.pack("<HHIIHH", 0xFFFE, channels, 8000, 8000,
                        block_align, bits)
            + struct.pack("<H", 22) + struct.pack("<HI", bits, 1) + sub
        )
    else:
        fmt = struct.pack("<HHIIHH", fmt_code, channels, 8000, 8000,
                          block_align, bits)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_wav_24_and_32_bit_keep_top_16():
    from quichash_spark.functions.audio import _decode_wav

    s16 = np.random.default_rng(51).integers(-32768, 32768, 64, dtype=np.int16)
    b = bytearray()
    for v in (s16.astype(np.int32) << 8) | 0x5A:  # low-byte noise drops
        b += int(v & 0xFFFFFF).to_bytes(3, "little")
    np.testing.assert_array_equal(_decode_wav(_wav(1, 1, 24, bytes(b))), s16)
    i32 = (s16.astype(np.int32) << 16) | 0x1234
    np.testing.assert_array_equal(
        _decode_wav(_wav(1, 1, 32, i32.astype("<i4").tobytes())), s16
    )


def test_wav_float_and_g711_formats():
    from quichash_spark.functions.audio import (
        _decode_alaw, _decode_mulaw, _decode_wav,
    )

    rng = np.random.default_rng(52)
    s16 = rng.integers(-32768, 32768, 64, dtype=np.int16)
    f = (s16.astype(np.float64) / 32767.0).astype("<f4")
    got = _decode_wav(_wav(3, 1, 32, f.tobytes()))
    assert np.abs(got.astype(int) - s16.astype(int)).max() <= 1
    law = rng.integers(0, 256, 100, dtype=np.uint8).tobytes()
    np.testing.assert_array_equal(
        _decode_wav(_wav(6, 1, 8, law)), _decode_alaw(law)
    )
    np.testing.assert_array_equal(
        _decode_wav(_wav(7, 1, 8, law)), _decode_mulaw(law)
    )


def test_wav_extensible_subformat_resolves():
    from quichash_spark.functions.audio import _decode_wav

    s16 = np.random.default_rng(53).integers(-32768, 32768, 32, dtype=np.int16)
    got = _decode_wav(_wav(1, 1, 16, s16.astype("<i2").tobytes(), extensible=True))
    np.testing.assert_array_equal(got, s16)


def test_wav_unknown_format_still_rejected():
    from quichash_spark.functions.audio import _decode_wav

    with pytest.raises(ValueError, match="unsupported wav format"):
        _decode_wav(_wav(0x55, 1, 16, b"\x00" * 32))  # MP3-in-WAV


# ---------------------------------------------------------------------------
# ADPCM inside WAVE (r5): MS-ADPCM (format 2) and IMA (format 0x11)
# ---------------------------------------------------------------------------

_MS_C1 = (256, 512, 0, 192, 240, 460, 392)
_MS_C2 = (0, -256, 0, 64, 0, -208, -232)
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)


def _ms_encode_block(samples, pidx, delta0):
    """Test-local MS-ADPCM encoder that also returns its own tracked
    reconstruction — an independent scalar implementation of the spec
    recurrence the decoder must reproduce EXACTLY."""
    c1, c2 = _MS_C1[pidx], _MS_C2[pidx]
    s2, s1 = int(samples[0]), int(samples[1])
    out = bytearray([pidx]) + struct.pack("<hhh", delta0, s1, s2)
    recon = [s2, s1]
    delta = delta0
    nibs = []
    for s in samples[2:]:
        pred = (s1 * c1 + s2 * c2) >> 8
        n = max(-8, min(7, int(round((int(s) - pred) / delta))))
        nib = n + 16 if n < 0 else n
        dec = max(-32768, min(32767, pred + n * delta))
        recon.append(dec)
        s2, s1 = s1, dec
        delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
        nibs.append(nib)
    for i in range(0, len(nibs), 2):
        out.append((nibs[i] << 4) | nibs[i + 1])
    return bytes(out), recon


def test_wav_msadpcm_decoder_matches_independent_recurrence():
    from quichash_spark.functions.audio import _decode_wav

    sig = np.random.default_rng(61).integers(
        -32768, 32768, 3 * 116, dtype=np.int16
    )
    blocks, recon_all = b"", []
    for k, pidx in zip(range(3), (0, 3, 6)):
        blk, recon = _ms_encode_block(sig[k * 116:(k + 1) * 116], pidx, 256)
        blocks += blk
        recon_all.extend(recon)
    got = _decode_wav(_wav(2, 1, 4, blocks, block_align=64))
    np.testing.assert_array_equal(got, np.array(recon_all, np.int16))


def test_wav_msadpcm_lossy_quality_on_smooth_signal():
    from quichash_spark.functions.audio import _decode_wav, snr_db

    t = np.arange(3 * 116) / 8000.0
    sig = (6000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    blocks, orig = b"", []
    for k in range(3):
        seg = sig[k * 116:(k + 1) * 116]
        blk, _ = _ms_encode_block(seg, 0, 128)
        blocks += blk
        orig.extend(seg.tolist())
    got = _decode_wav(_wav(2, 1, 4, blocks, block_align=64))
    assert snr_db(np.array(orig, np.int16), got) >= 20.0


def test_wav_ima_blocks_match_raw_codec():
    from quichash_spark.functions.audio import _decode_ima_adpcm, _decode_wav

    rng = np.random.default_rng(62)
    blocks, want = b"", []
    for pred, idx in ((1234, 30), (-2000, 0), (31000, 88)):
        body = rng.integers(0, 256, 60, dtype=np.uint8).tobytes()
        blk = struct.pack("<hBB", pred, idx, 0) + body
        blocks += blk
        want.append(_decode_ima_adpcm(blk))
    got = _decode_wav(_wav(0x11, 1, 4, blocks, block_align=64))
    np.testing.assert_array_equal(got, np.concatenate(want))


def test_wav_msadpcm_stereo_decodes_and_downmixes():
    """Stereo MS-ADPCM: per-channel headers, alternating nibbles.  Built
    by an independent scalar encoder tracking both channel recurrences;
    the decoder's interleaved output (through the generic downmix) must
    equal the integer mean of the tracked reconstructions."""
    from quichash_spark.functions.audio import _decode_wav

    rng = np.random.default_rng(63)
    n_frames = 2 + (64 - 14)  # block_align 64, stereo: 50 nibble pairs
    L = rng.integers(-32768, 32768, n_frames, dtype=np.int16)
    R = rng.integers(-32768, 32768, n_frames, dtype=np.int16)

    def enc(samples, pidx, delta0):
        c1, c2 = _MS_C1[pidx], _MS_C2[pidx]
        s2, s1 = int(samples[0]), int(samples[1])
        recon = [s2, s1]
        delta = delta0
        nibs = []
        for s in samples[2:]:
            pred = (s1 * c1 + s2 * c2) >> 8
            n = max(-8, min(7, int(round((int(s) - pred) / delta))))
            nib = n + 16 if n < 0 else n
            dec = max(-32768, min(32767, pred + n * delta))
            recon.append(dec)
            s2, s1 = s1, dec
            delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
            nibs.append(nib)
        return nibs, recon

    nl, rl = enc(L, 0, 256)
    nr, rr = enc(R, 3, 256)
    blk = bytearray([0, 3])
    blk += struct.pack("<hh", 256, 256)
    blk += struct.pack("<hh", int(L[1]), int(R[1]))
    blk += struct.pack("<hh", int(L[0]), int(R[0]))
    inter = [v for pair in zip(nl, nr) for v in pair]
    for i in range(0, len(inter), 2):
        blk.append((inter[i] << 4) | inter[i + 1])
    got = _decode_wav(_wav(2, 2, 4, bytes(blk), block_align=64))
    want = (
        (np.array(rl, np.int32) + np.array(rr, np.int32)) // 2
    ).astype(np.int16)
    np.testing.assert_array_equal(got, want)

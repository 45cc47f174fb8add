"""Deterministic compressed-media fixture corpus (MP3 / Ogg-Opus / WebP).

Every row is a pure function of its index: real byte streams assembled
from the public container/frame specs (an MP3 frame walk, an Ogg muxer
with lacing + cross-page continuation, RIFF/WebP chunks) alongside the
GROUND TRUTH the generator knows while assembling (duration, rates,
channels, frame counts, dimensions).  The ``media_probe`` registry query
must reconstruct that truth from the bytes alone — the truth parquet is
the DuckDB oracle side, so the probe parsers are value-hash-checked by
the driver rather than merely round-tripped.

The truth arithmetic here is written from the spec formulas directly
(frame lengths from the published bitrate/sample-rate tables, Opus
durations from the RFC 6716 TOC table, granule clock at 48 kHz) — NOT
by calling the parsers in :mod:`quichash_spark.functions.media_probe`.
The one shared routine is the Ogg page CRC (container plumbing both
sides need; flipping any payload byte makes the parser reject the
page, which kind 9-variant "badcrc" exercises).

Kinds by ``i % 10``:

0. mp3 CBR mono MPEG-1 + "Info" tag frame     (vbr false)
1. mp3 CBR stereo MPEG-1, no tag              (vbr false)
2. mp3 VBR stereo MPEG-1 + "Xing" tag frame   (vbr true)
3. mp3 CBR mono MPEG-2 (576-sample frames) behind an ID3v2 tag
4. ogg-opus, short packets across SILK/CELT TOC configs
5. ogg-opus with a >510-byte packet laced across a page boundary and a
   code-3 (arbitrary-frame-count) packet
6. webp VP8L (lossless header)
7. webp VP8 (lossy keyframe header)
8. webp VP8X (extended: canvas size + inner VP8L)
9. malformed, rotating: truncated mp3 (partial final frame — still
   parses with fewer frames), pure garbage (parse_ok false), ogg with
   a corrupted page CRC (parse_ok false)
"""

from __future__ import annotations

import struct

import numpy as np

from quichash_spark.functions.media_probe import PROBE_FIELDS, ogg_crc

#: bump when the generator changes: invalidates cached corpora + oracle
MEDIA_FIXTURE_VERSION = 1


def _rng(i: int, salt: int) -> np.random.Generator:
    return np.random.default_rng((i * 1_000_003 + salt) & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# MP3 assembly (ISO/IEC 11172-3 / 13818-3 header arithmetic)
# ---------------------------------------------------------------------------

_V1L3_KBPS = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_V2L3_KBPS = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_SR_BY_VER = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000)}


def _mp3_header(ver: int, br_idx: int, sr_idx: int, pad: int, mode: int) -> bytes:
    h = (
        (0x7FF << 21) | (ver << 19) | (1 << 17) | (1 << 16)  # layer III, no CRC
        | (br_idx << 12) | (sr_idx << 10) | (pad << 9) | (mode << 6) | (1 << 2)
    )
    return struct.pack(">I", h)


def _mp3_frame(ver: int, br_idx: int, sr_idx: int, pad: int, mode: int,
               rng: np.random.Generator,
               tag: tuple[bytes, int] | None = None) -> bytes:
    kbps = (_V1L3_KBPS if ver == 3 else _V2L3_KBPS)[br_idx]
    sr = _SR_BY_VER[ver][sr_idx]
    spf = 1152 if ver == 3 else 576
    frame_bytes = spf // 8 * kbps * 1000 // sr + pad
    body = bytearray(rng.integers(0, 256, size=frame_bytes - 4, dtype=np.uint8).tobytes())
    if tag is not None:  # ("Xing"|"Info", frame count) after the side info
        name, frames = tag
        side = (17 if mode == 3 else 32) if ver == 3 else (9 if mode == 3 else 17)
        body[:side] = b"\x00" * side
        body[side : side + 4] = name[:4]
        body[side + 4 : side + 12] = struct.pack(">II", 0x1, frames)
    return _mp3_header(ver, br_idx, sr_idx, pad, mode) + bytes(body)


def _gen_mp3(i: int, kind: int) -> tuple[bytes, dict]:
    rng = _rng(i, 11)
    n_audio = int(rng.integers(8, 40))
    if kind == 0:  # CBR mono + Info
        ver, sr_idx, mode, brs = 3, 0, 3, [7] * n_audio  # 96 kbps @44100
        tag = b"Info"
    elif kind == 1:  # CBR stereo, no tag
        ver, sr_idx, mode, brs = 3, 2, 0, [11] * n_audio  # 192 kbps @32000
        tag = None
    elif kind == 2:  # VBR stereo + Xing
        ver, sr_idx, mode = 3, 1, 1  # @48000
        brs = [int(rng.integers(5, 14)) for _ in range(n_audio)]
        tag = b"Xing"
    else:  # kind 3: MPEG-2 mono behind ID3v2
        ver, sr_idx, mode, brs = 2, 2, 3, [9] * n_audio  # 80 kbps @16000
        tag = None
    sr = _SR_BY_VER[ver][sr_idx]
    spf = 1152 if ver == 3 else 576
    kbps_tbl = _V1L3_KBPS if ver == 3 else _V2L3_KBPS
    pads = [int(rng.integers(0, 2)) for _ in range(n_audio)]
    parts = []
    if kind == 3:
        id3_payload = rng.integers(0, 256, size=int(rng.integers(30, 200)),
                                   dtype=np.uint8).tobytes()
        sz = len(id3_payload)
        syncsafe = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                          (sz >> 7) & 0x7F, sz & 0x7F])
        parts.append(b"ID3\x04\x00\x00" + syncsafe + id3_payload)
    if tag is not None:
        parts.append(
            _mp3_frame(ver, brs[0], sr_idx, 0, mode, rng, tag=(tag, n_audio))
        )
    audio_bytes = 0
    for k in range(n_audio):
        frame = _mp3_frame(ver, brs[k], sr_idx, pads[k], mode, rng)
        audio_bytes += len(frame)
        parts.append(frame)
    vbr = tag == b"Xing" if tag is not None else len(set(brs)) > 1
    truth = {
        "container": "mpeg", "codec": "mp3",
        "sample_rate": sr, "channels": 1 if mode == 3 else 2,
        "n_frames": n_audio,
        "duration_ms": n_audio * spf * 1000 // sr,
        "bitrate_kbps": (audio_bytes * 8 * sr // (n_audio * spf * 1000)
                         if vbr else kbps_tbl[brs[0]]),
        "vbr": vbr,
    }
    return b"".join(parts), truth


# ---------------------------------------------------------------------------
# Ogg/Opus assembly (RFC 3533 pages, RFC 6716 TOC, RFC 7845 headers)
# ---------------------------------------------------------------------------

_FRAME_SAMPLES48 = (
    [480, 960, 1920, 2880] * 3 + [480, 960] * 2 + [120, 240, 480, 960] * 4
)


def _opus_packet(config: int, code: int, rng: np.random.Generator,
                 m: int = 1, body_len: int | None = None) -> tuple[bytes, int, int]:
    """(packet, n_frames, samples48) for one TOC config/count code."""
    toc = (config << 3) | code
    head = bytes([toc])
    if code == 0:
        frames = 1
    elif code in (1, 2):
        frames = 2
    else:
        head += bytes([m & 0x3F])  # code 3: CBR, no padding, M frames
        frames = m
    if body_len is None:
        body_len = int(rng.integers(5, 60))
    body = rng.integers(0, 256, size=body_len, dtype=np.uint8).tobytes()
    return head + body, frames, frames * _FRAME_SAMPLES48[config]


def _ogg_page(htype: int, granule: int, serial: int, seq: int,
              laces: list[int], body: bytes) -> bytes:
    hdr = bytearray(b"OggS\x00")
    hdr.append(htype)
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<III", serial, seq, 0)  # crc placeholder
    hdr.append(len(laces))
    hdr += bytes(laces)
    page = bytes(hdr) + body
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _lace(n: int) -> list[int]:
    out = [255] * (n // 255) + [n % 255]
    return out  # trailing 0 lace is the spec encoding for multiples of 255


def _gen_ogg(i: int, spanning: bool) -> tuple[bytes, dict]:
    rng = _rng(i, 13)
    serial = int(rng.integers(1, 1 << 31))
    channels = int(rng.integers(1, 3))
    pre_skip = 312
    input_sr = int(rng.choice([8000, 16000, 24000, 48000]))
    head = (b"OpusHead" + bytes([1, channels]) + struct.pack("<H", pre_skip)
            + struct.pack("<I", input_sr) + struct.pack("<h", 0) + bytes([0]))
    tags = b"OpusTags" + struct.pack("<I", 4) + b"qhsp" + struct.pack("<I", 0)
    pages = [
        _ogg_page(0x02, 0, serial, 0, _lace(len(head)), head),   # BOS
        _ogg_page(0x00, 0, serial, 1, _lace(len(tags)), tags),
    ]
    # audio packets: mix SILK (0-11) and CELT (16-31) configs
    n_pkts = int(rng.integers(6, 14))
    pkts: list[tuple[bytes, int, int]] = []
    for k in range(n_pkts):
        config = int(rng.choice([1, 5, 9, 17, 21, 29]))
        code = int(rng.choice([0, 1, 2]))
        pkts.append(_opus_packet(config, code, rng))
    if spanning:
        # a code-3 burst, then one fat packet (laced 255,255,tail) kept
        # LAST so it spans the final page boundary via continuation
        pkts.append(_opus_packet(17, 3, rng, m=int(rng.integers(3, 7))))
        pkts.append(_opus_packet(9, 0, rng, body_len=700))
    total_samples = 0
    n_frames = 0
    seq = 2
    k = 0
    while k < len(pkts):
        take = min(len(pkts) - k, int(rng.integers(2, 4)))
        group = pkts[k : k + take]
        k += take
        body = b"".join(p for p, _, _ in group)
        laces: list[int] = []
        for p, fr, s48 in group:
            laces += _lace(len(p))
            n_frames += fr
            total_samples += s48
        if spanning and k >= len(pkts):
            # split the final (fat) packet: everything up to its last
            # lacing value ends this page mid-packet (the page's lacing
            # ends with 255), the remainder opens the next page with the
            # continuation flag (0x01) set; a page completing no packet
            # carries granule -1 per RFC 3533
            head_laces, tail_laces = laces[:-1], laces[-1:]
            cut = sum(head_laces)
            done_samples = total_samples - group[-1][2]
            granule1 = -1 if len(group) == 1 else done_samples
            pages.append(_ogg_page(0x00, granule1, serial, seq,
                                   head_laces, body[:cut]))
            seq += 1
            pages.append(_ogg_page(0x05, total_samples, serial, seq,
                                   tail_laces, body[cut:]))
            seq += 1
        else:
            eos = 0x04 if k >= len(pkts) else 0x00
            pages.append(_ogg_page(eos, total_samples, serial, seq, laces, body))
            seq += 1
    truth = {
        "container": "ogg", "codec": "opus",
        "sample_rate": input_sr, "channels": channels,
        "n_frames": n_frames, "n_pages": seq,
        "duration_ms": max(0, total_samples - pre_skip) * 1000 // 48000,
    }
    return b"".join(pages), truth


# ---------------------------------------------------------------------------
# WebP assembly (RIFF chunks; VP8 / VP8L / VP8X headers)
# ---------------------------------------------------------------------------

def _riff_webp(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WEBP"
    for fourcc, payload in chunks:
        body += fourcc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vp8l_payload(w: int, h: int, rng: np.random.Generator) -> bytes:
    bits = (w - 1) | ((h - 1) << 14)  # alpha 0, version 0
    return (bytes([0x2F]) + struct.pack("<I", bits)
            + rng.integers(0, 256, size=int(rng.integers(20, 120)),
                           dtype=np.uint8).tobytes())


def _vp8_payload(w: int, h: int, rng: np.random.Generator) -> bytes:
    fps = int(rng.integers(16, 4096))  # first-partition size (unchecked)
    tag = (fps << 5) | (1 << 4) | 0  # show_frame, version 0, keyframe
    return (struct.pack("<I", tag)[:3] + b"\x9d\x01\x2a"
            + struct.pack("<HH", w, h)
            + rng.integers(0, 256, size=int(rng.integers(20, 120)),
                           dtype=np.uint8).tobytes())


def _gen_webp(i: int, kind: int) -> tuple[bytes, dict]:
    rng = _rng(i, 17)
    w, h = int(rng.integers(1, 2048)), int(rng.integers(1, 2048))
    if kind == 6:
        data = _riff_webp([(b"VP8L", _vp8l_payload(w, h, rng))])
        codec = "vp8l"
    elif kind == 7:
        data = _riff_webp([(b"VP8 ", _vp8_payload(w, h, rng))])
        codec = "vp8"
    else:  # VP8X: canvas size wins; inner VP8L carries a smaller frame
        vp8x = (bytes([0, 0, 0, 0])
                + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3])
        inner = _vp8l_payload(max(1, w // 2), max(1, h // 2), rng)
        data = _riff_webp([(b"VP8X", vp8x), (b"VP8L", inner)])
        codec = "vp8l"
    truth = {"container": "riff-webp", "codec": codec, "width": w, "height": h}
    return data, truth


# ---------------------------------------------------------------------------
# corpus rows
# ---------------------------------------------------------------------------

def _gen_malformed(i: int) -> tuple[bytes, dict]:
    variant = (i // 10) % 3
    rng = _rng(i, 19)
    if variant == 0:
        # truncated mp3: 3 full frames survive, the 4th is cut mid-frame
        full, truth = _gen_mp3(i, 1)  # kind 1: CBR 192 kbps @32000 stereo
        spf, sr = 1152, 32000
        frame_len = spf // 8 * 192 * 1000 // sr  # + per-frame padding bit
        lens = []
        pos = 0
        while pos + 4 <= len(full) and len(lens) < 4:
            h = struct.unpack_from(">I", full, pos)[0]
            pad = (h >> 9) & 1
            lens.append(frame_len + pad)
            pos += frame_len + pad
        keep = sum(lens[:3]) + lens[3] // 2
        truth = dict(truth)
        truth.update(
            n_frames=3,
            duration_ms=3 * spf * 1000 // sr,
            bitrate_kbps=192,
            vbr=False,
        )
        return full[:keep], truth
    if variant == 1:  # garbage: no magic anywhere
        body = rng.integers(1, 128, size=int(rng.integers(64, 400)),
                            dtype=np.uint8).tobytes()
        return b"\x00" + body, {}
    # variant 2: valid opus stream, then one payload byte corrupted —
    # the page CRC check must reject the whole stream
    data, _ = _gen_ogg(i, spanning=False)
    buf = bytearray(data)
    buf[-3] ^= 0x5A  # inside the final page body
    return bytes(buf), {}


def gen_media(i: int) -> tuple[str, bytes, dict]:
    """(kind, data, truth) for row i — truth {} means parse_ok=False."""
    kind = i % 10
    if kind <= 3:
        data, truth = _gen_mp3(i, kind)
        name = f"mp3_{('info','plain','xing','id3')[kind]}"
    elif kind == 4:
        data, truth = _gen_ogg(i, spanning=False)
        name = "ogg_simple"
    elif kind == 5:
        data, truth = _gen_ogg(i, spanning=True)
        name = "ogg_spanning"
    elif kind <= 8:
        data, truth = _gen_webp(i, kind)
        name = ("webp_vp8l", "webp_vp8", "webp_vp8x")[kind - 6]
    else:
        data, truth = _gen_malformed(i)
        name = "malformed"
    return name, data, truth


def media_row(i: int) -> dict:
    kind, data, _ = gen_media(i)
    return {"media_id": f"media-{i:07d}", "kind": kind, "data": data}


def media_truth_row(i: int) -> dict:
    kind, _, truth = gen_media(i)
    row: dict = {k: None for k in PROBE_FIELDS}
    row["parse_ok"] = bool(truth)
    row.update(truth)
    row["media_id"] = f"media-{i:07d}"
    return row


# ---------------------------------------------------------------------------
# Spark-side corpus (distributed generation, parquet cache)
# ---------------------------------------------------------------------------

def media_dataframe(spark, n: int, partitions: int | None = None):
    """Distributed corpus: every row a pure function of its index."""
    import pandas as pd

    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("data", BinaryType()),
    ])
    rng_df = spark.range(0, n, 1,
                         partitions or spark.sparkContext.defaultParallelism)

    def gen(it):
        for pdf in it:
            yield pd.DataFrame([media_row(int(i)) for i in pdf["id"]],
                               columns=[f.name for f in schema.fields])

    return rng_df.mapInPandas(gen, schema)


def materialized_media(spark, n: int, cache_root: str = "/tmp/quichash_media"):
    from pathlib import Path

    path = Path(cache_root) / f"v{MEDIA_FIXTURE_VERSION}_n{n}"
    if not (path / "_SUCCESS").exists():
        media_dataframe(spark, n).write.mode("overwrite").parquet(str(path))
    return spark.read.parquet(str(path))


# ---------------------------------------------------------------------------
# deterministic image payloads for the image_features driver query (r5):
# one shared pure-function-of-index generator used by BOTH the Spark
# query (executor-side, entry_queries.q_image_features) and the
# sequential oracle replica (oracle/fixture.py::sequential_image_features)
# ---------------------------------------------------------------------------


def encode_bmp24(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (BITMAPINFOHEADER, BGR rows
    padded to 4 bytes) — the exact shape imaging.decode_bmp parses."""
    import struct

    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            rows += bytes((b, g, r))
        rows += b"\x00" * (stride - w * 3)
    header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(rows), 2835, 2835, 0, 0))
    return header + bytes(rows)


def gen_video_payload(i: int) -> bytes:
    """Deterministic AVI payload for video item ``i``, cycling the
    writer codec (uncompressed DIB, planar I420, packed YUY2 — g2) so
    every raw-frame decoder in functions/video.py runs through the
    driver correctness gate.  Shared verbatim by q_video_features and
    the sequential oracle replica (the gen_image_payload pattern)."""
    from quichash_spark.functions.video import encode_avi

    rng = np.random.default_rng([77, i])
    frames = rng.integers(
        0, 256, (int(rng.integers(4, 12)), 16, 16, 3), dtype=np.uint8
    )
    codec = ("DIB ", "I420", "YUY2")[i % 3]
    return encode_avi(frames, fps=float(rng.integers(5, 31)), codec=codec)


def gen_image_payload(i: int) -> tuple[bytes, str]:
    """(payload, codec) for image item ``i`` — deterministic, covering
    every real image decoder through the driver correctness gate: PNG,
    BMP, baseline AND progressive AND lossless (SOF3) JPEG (flat q=1:
    exact up to DCT float rounding; lossless: bit-exact), WebP-lossless
    with the r5 transforms (subtract-green + predictor + color cache),
    plus a truncated payload that must come back decode_ok=false."""
    from quichash_spark.functions.imaging import encode_png
    from quichash_spark.functions.jpeg import (
        encode_jpeg, encode_jpeg12, encode_jpeg_lossless,
    )
    from quichash_spark.functions.vp8l import encode_webp_lossless

    from quichash_spark.functions.gif import encode_gif
    from quichash_spark.functions.tiff import encode_tiff

    rng = np.random.default_rng([88, i])
    h = int(rng.integers(8, 25))
    w = int(rng.integers(8, 25))
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    kind = i % 13
    if kind == 0:
        return encode_png(img), "png"
    if kind == 1:
        return encode_bmp24(img), "bmp"
    if kind == 2:
        return encode_jpeg(img, qtable=1), "jpeg"
    if kind == 3:
        return encode_jpeg(img, qtable=1, progressive=True), "jpeg"
    if kind == 4:
        return encode_webp_lossless(
            img, subtract_green=True, predictor=int(rng.integers(0, 14)),
            use_cache_bits=4,
        ), "webp"
    if kind == 5:
        return encode_jpeg_lossless(
            img, predictor=1 + int(rng.integers(7))
        ), "jpeg"
    if kind == 6:  # 12-bit extended sequential: 8-bit samples upscaled
        return encode_jpeg12(img.astype(np.uint16) * 16), "jpeg"
    if kind == 7:  # GIF: paletted content, alternating interlace
        pal = rng.integers(0, 256, (12, 3), dtype=np.uint8)
        gimg = pal[rng.integers(0, 12, (h, w))]
        return encode_gif(gimg, interlace=bool(i % 2)), "gif"
    if kind == 8:  # TIFF: cycle compression x byte order
        comp = (1, 5, 32773)[(i // 10) % 3]
        return encode_tiff(img, compression=comp,
                           big_endian=bool(i % 2)), "tiff"
    if kind == 9:  # PNG palette + Adam7 interlace (r5 decoder paths)
        pal = rng.integers(0, 256, (11, 3), dtype=np.uint8)
        pimg = pal[rng.integers(0, 11, (h, w))]
        return encode_png(pimg, palette=True, interlace=True), "png"
    if kind == 10:  # 16-bit PNG (decodes to the high byte)
        img16 = rng.integers(0, 1 << 16, (h, w, 3), dtype=np.uint16)
        return encode_png(img16, depth=16), "png"
    if kind == 11:  # 8-bit palette BMP, RLE8-compressed
        from quichash_spark.functions.imaging import encode_bmp

        pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
        bimg = pal[rng.integers(0, 7, (h, w))]
        return encode_bmp(bimg, palette=True, rle8=True), "bmp"
    return encode_png(img)[:20], "png"  # truncated -> decode_ok False

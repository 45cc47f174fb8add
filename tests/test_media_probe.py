"""Compressed-media metadata probes: published header facts, container
walk behaviors, generator-truth round trips, and the Spark operator."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from quichash_spark.fixtures.media import (
    _gen_mp3,
    _gen_ogg,
    _gen_webp,
    gen_media,
    media_truth_row,
)
from quichash_spark.functions.media_probe import (
    PROBE_FIELDS,
    _Mp3Header,
    _OPUS_FRAME_SAMPLES48,
    ogg_crc,
    opus_packet_frames,
    probe_media,
    probe_mp3,
    probe_ogg_opus,
    probe_webp,
)


# ---------------------------------------------------------------------------
# published spec facts (pinned independently of the generator)
# ---------------------------------------------------------------------------

def test_mp3_header_canonical_128k_44100():
    # 0xFF 0xFB 0x90 0x00: MPEG-1 Layer III, 128 kbps, 44.1 kHz, no
    # padding, stereo — the canonical example header; frame length
    # floor(144 * 128000 / 44100) = 417 bytes
    h = _Mp3Header(b"\xff\xfb\x90\x00", 0)
    assert (h.bitrate_kbps, h.sr_hz, h.channels) == (128, 44100, 2)
    assert h.frame_bytes == 417
    assert h.spf == 1152


def test_mp3_header_padding_and_mono():
    # padding bit adds exactly one byte for layer III; mode 3 = mono
    assert _Mp3Header(b"\xff\xfb\x92\x00", 0).frame_bytes == 418
    assert _Mp3Header(b"\xff\xfb\x90\xc0", 0).channels == 1


def test_mp3_header_mpeg2_576_samples():
    # MPEG-2 (version bits 10 -> 0xF3) layer III uses 576-sample frames
    # and the low-rate bitrate table: index 9 -> 80 kbps @ 16 kHz
    h = _Mp3Header(b"\xff\xf3\x98\x00", 0)
    assert (h.spf, h.bitrate_kbps, h.sr_hz) == (576, 80, 16000)
    assert h.frame_bytes == 576 // 8 * 80_000 // 16000  # 360


def test_mp3_header_rejects_reserved_fields():
    for bad in (b"\xff\xeb\x90\x00",   # version bits 01 (reserved)
                b"\xff\xf9\x90\x00",   # layer bits 00 (reserved)
                b"\xff\xfb\xf0\x00",   # bitrate index 15 ("bad")
                b"\xff\xfb\x9c\x00"):  # sample-rate index 3 (reserved)
        with pytest.raises(ValueError):
            _Mp3Header(bad, 0)


def test_opus_toc_table_rfc6716():
    # RFC 6716 Table 2 spot checks (samples at the 48 kHz granule clock)
    assert _OPUS_FRAME_SAMPLES48[0] == 480     # SILK NB 10 ms
    assert _OPUS_FRAME_SAMPLES48[3] == 2880    # SILK NB 60 ms
    assert _OPUS_FRAME_SAMPLES48[14] == 480    # Hybrid FB 10 ms
    assert _OPUS_FRAME_SAMPLES48[16] == 120    # CELT NB 2.5 ms
    assert _OPUS_FRAME_SAMPLES48[31] == 960    # CELT FB 20 ms
    # count codes: 0 -> 1 frame, 1/2 -> 2 frames, 3 -> M from next byte
    assert opus_packet_frames(bytes([31 << 3 | 0, 1]))[0] == 1
    assert opus_packet_frames(bytes([31 << 3 | 1, 1]))[0] == 2
    assert opus_packet_frames(bytes([16 << 3 | 3, 5, 0]))[:1] == (5,)
    # the 120 ms cap: 7 x 20 ms CELT FB frames is over the limit
    with pytest.raises(ValueError):
        opus_packet_frames(bytes([31 << 3 | 3, 7]))


def test_ogg_crc_is_the_unreflected_variant():
    # Ogg CRC-32 (poly 0x04C11DB7, no reflection, zero init/xorout)
    # differs from zlib's reflected CRC-32 on the same input
    import zlib

    data = b"OggS spec test"
    assert ogg_crc(data) != zlib.crc32(data)
    assert ogg_crc(b"") == 0
    # linearity sanity: appending a zero byte shifts, never identity
    assert ogg_crc(data + b"\x00") != ogg_crc(data)


# ---------------------------------------------------------------------------
# parser behaviors
# ---------------------------------------------------------------------------

def test_mp3_id3v2_skip_and_walk():
    data, truth = _gen_mp3(9_003, 3)  # MPEG-2 mono behind an ID3v2 tag
    assert data[:3] == b"ID3"
    got = probe_mp3(data)
    assert got is not None
    for k in ("sample_rate", "channels", "n_frames", "duration_ms",
              "bitrate_kbps", "vbr"):
        assert got[k] == truth[k], k


def test_mp3_xing_frame_excluded_from_counts():
    data, truth = _gen_mp3(7_002, 2)  # VBR + Xing metadata frame
    got = probe_mp3(data)
    assert got["vbr"] is True
    assert got["n_frames"] == truth["n_frames"]  # tag frame not counted


def test_mp3_truncated_final_frame_ignored():
    data, truth = _gen_mp3(5_001, 1)
    h = _Mp3Header(data, 0)
    cut = data[: h.frame_bytes * 2 + h.frame_bytes // 2]
    got = probe_mp3(cut)
    assert got["n_frames"] == 2


def test_ogg_continuation_across_pages():
    data, truth = _gen_ogg(4_105, spanning=True)
    # the stream genuinely contains a continuation page (flag 0x01)
    flags = [data[i + 5] for i in range(len(data)) if data[i : i + 4] == b"OggS"]
    assert any(f & 0x01 for f in flags)
    got = probe_ogg_opus(data)
    assert got is not None
    assert got["n_frames"] == truth["n_frames"]
    assert got["duration_ms"] == truth["duration_ms"]
    assert got["n_pages"] == truth["n_pages"]


def test_ogg_crc_flip_rejects_stream():
    data, _ = _gen_ogg(4_104, spanning=False)
    assert probe_ogg_opus(data) is not None
    buf = bytearray(data)
    buf[-2] ^= 0x01
    assert probe_ogg_opus(bytes(buf)) is None


def test_webp_all_three_header_kinds():
    for kind in (6, 7, 8):
        data, truth = _gen_webp(2_000 + kind, kind)
        got = probe_webp(data)
        assert got is not None, kind
        assert (got["width"], got["height"]) == (truth["width"], truth["height"])
        assert got["codec"] == truth["codec"]


def test_webp_vp8x_canvas_wins_over_inner_frame():
    data, truth = _gen_webp(3_008, 8)
    got = probe_webp(data)
    # the inner VP8L frame is half-size; VP8X canvas is authoritative
    assert (got["width"], got["height"]) == (truth["width"], truth["height"])


def test_probe_media_malformed_contract():
    assert probe_media(None)["parse_ok"] is False
    assert probe_media(b"")["parse_ok"] is False
    assert probe_media(b"\x00" * 64)["parse_ok"] is False
    row = probe_media(b"RIFF\x04\x00\x00\x00WEBP")  # container, no codec
    assert row["parse_ok"] is False


def test_generator_truth_round_trip_all_kinds():
    for i in range(120):
        _, data, _ = gen_media(i)
        truth = media_truth_row(i)
        got = probe_media(data)
        for k in PROBE_FIELDS:
            want = truth.get(k)
            have = got.get(k)
            if k == "vbr" and have is not None:
                have = bool(have)
            if k == "vbr" and want is not None:
                want = bool(want)
            assert have == want, f"i={i} {k}: {have} != {want}"


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def test_media_probe_features_spark(spark):
    from quichash_spark.fixtures.media import media_dataframe
    from quichash_spark.functions.media_probe import media_probe_features

    df = media_probe_features(media_dataframe(spark, 40).select("media_id", "data"))
    rows = {r["media_id"]: r.asDict() for r in df.collect()}
    assert len(rows) == 40
    for i in range(40):
        truth = media_truth_row(i)
        got = rows[f"media-{i:07d}"]
        assert got["parse_ok"] == truth["parse_ok"], i
        if truth["parse_ok"]:
            assert got["codec"] == truth["codec"]
            vbr = truth.get("vbr")
            assert got["vbr"] == (None if vbr is None else int(vbr)), i

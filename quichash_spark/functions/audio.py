"""Audio codec dispatch + PCM analysis kernels (pure numpy).

Mirrors the reference's streaming hash loop over file bytes
(``/root/reference/src/hash.rs:669-739``) but inverted for Spark: bytes
arrive as Arrow binary columns and are decoded per batch inside
``mapInPandas`` kernels (quichash streams one file through many hashers;
we stream many rows through one vectorized kernel).

Codecs — REAL, implemented from public format specs with stdlib+numpy:

- ``pcm16``        raw little-endian int16 PCM
- ``pcm16_padded`` the same, preceded by a fixed 64-byte header
- ``wav``          RIFF/WAVE container, PCM format 1, 8/16-bit, any
                   channel count (integer-mean downmix to mono)
- ``mulaw``        raw G.711 mu-law bytes (telephony, 8 kHz convention)
- ``alaw``         raw G.711 A-law bytes
- ``ima_adpcm``    raw mono IMA/DVI ADPCM (WAV-block state header +
                   low-nibble-first 4-bit codes)

- ``flac``         REAL lossless decoder from the public spec
                   (:mod:`quichash_spark.functions.flac`): Rice
                   residuals, fixed + LPC prediction, all four stereo
                   decorrelation modes, frame CRCs verified

Only the LOSSY codecs needing DSP libraries (opus/mp3) remain
registered as STUBS that raise ``NotImplementedError`` — the Spark-side
plumbing (schema, batching, dispatch) is identical, only the byte->PCM
kernel would differ on a cluster with codec libs installed.

G.711 and IMA ADPCM prefer stdlib ``audioop`` C kernels at runtime when
available (Python <= 3.12; removed in 3.13 by PEP 594) with the
pure-numpy spec kernels as the fallback — the same detect-and-swap shape
as ``hashreg.resolve_native_kernels``.  Both paths are cross-validated
bit-for-bit in tests/test_codecs.py.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from quichash_spark.config import MIX64, DedupConfig

_LOG = __import__("logging").getLogger(__name__)

PCM16_PADDED_HEADER = 64

_U64 = np.uint64

# Stdlib audioop (C kernels) backs the G.711 and IMA-ADPCM fast paths when
# present — same detect-and-swap shape as hashreg.resolve_native_kernels.
# audioop is REMOVED in Python 3.13 (PEP 594); the pure-numpy kernels
# below are the spec implementations and the 3.13+ fallback, and
# tests/test_codecs.py proves bit-equality between the two.
try:
    import warnings as _warnings

    with _warnings.catch_warnings():
        # the deprecation is the POINT of the gate — don't spam every import
        _warnings.simplefilter("ignore", DeprecationWarning)
        import audioop as _audioop
except ImportError:  # Python >= 3.13
    _audioop = None
    _LOG.warning(
        "stdlib audioop unavailable (removed in Python 3.13): G.711/IMA-"
        "ADPCM decode falls back to the pure-numpy spec kernels (the ADPCM "
        "nibble loop is per-sample Python — fine for features, slow for "
        "bulk decode)."
    )


def _decode_pcm16(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype="<i2")


def _decode_pcm16_padded(data: bytes) -> np.ndarray:
    return np.frombuffer(data[PCM16_PADDED_HEADER:], dtype="<i2")


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law (ITU-T G.711, public spec): 256-entry decode
# tables built once from the reference formulas
# ---------------------------------------------------------------------------


def _build_ulaw_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        out[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _build_alaw_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


_ULAW_TABLE = _build_ulaw_table()
_ALAW_TABLE = _build_alaw_table()


def _decode_mulaw_pure(data: bytes) -> np.ndarray:
    return _ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)]


def _decode_alaw_pure(data: bytes) -> np.ndarray:
    return _ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)]


def _decode_mulaw_audioop(data: bytes) -> np.ndarray:
    # audioop emits native-endian int16; this stack is little-endian
    # (test_g711_tables_match_audioop pins byte-for-byte agreement)
    return np.frombuffer(_audioop.ulaw2lin(data, 2), dtype="<i2")


def _decode_alaw_audioop(data: bytes) -> np.ndarray:
    return np.frombuffer(_audioop.alaw2lin(data, 2), dtype="<i2")


_decode_mulaw = _decode_mulaw_audioop if _audioop else _decode_mulaw_pure
_decode_alaw = _decode_alaw_audioop if _audioop else _decode_alaw_pure


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (public spec: 4-bit nibbles, 89-entry step table,
# shift-accumulate difference).  Core loop cross-validated against the
# independent stdlib audioop implementation in tests/test_codecs.py.
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(nibbles: np.ndarray, pred: int, idx: int) -> np.ndarray:
    """Sequential IMA ADPCM core: one int16 sample per 4-bit code."""
    out = np.empty(nibbles.size, dtype=np.int16)
    for i, n in enumerate(nibbles):
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if (n & 8) else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[n & 7])))
        out[i] = pred
    return out


def _ima_parse_header(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV-block state header (predictor int16 LE, step index uint8,
    reserved) + the nibble body as a uint8 view."""
    if len(data) < 4:
        raise ValueError("IMA ADPCM stream too short")
    pred = int(np.frombuffer(data[:2], dtype="<i2")[0])
    idx = data[2]  # int for bytes and memoryview alike
    if idx > 88:
        raise ValueError(f"IMA ADPCM step index {idx} out of range")
    return pred, idx, np.frombuffer(data, dtype=np.uint8, offset=4)


def _decode_ima_adpcm_pure(data: bytes) -> np.ndarray:
    """Raw mono IMA ADPCM, WAV-block layout: the header predictor IS the
    first output sample, then low-nibble-first 4-bit codes."""
    pred, idx, body = _ima_parse_header(data)
    nibbles = np.empty(body.size * 2, dtype=np.uint8)
    nibbles[0::2] = body & 0x0F  # low nibble first (WAV convention)
    nibbles[1::2] = body >> 4
    samples = _ima_decode_nibbles(nibbles, pred, idx)
    return np.concatenate([np.array([pred], dtype=np.int16), samples])


def _decode_ima_adpcm_audioop(data: bytes) -> np.ndarray:
    """audioop-backed IMA ADPCM decode (C speed): audioop consumes the
    HIGH nibble of each byte first, this stream is low-nibble-first, so
    swap nibbles per byte (vectorized) and hand audioop our (pred, idx)
    state.  Output-identical to the pure kernel — the per-nibble state
    update is the same spec recurrence (test_ima_audioop_path_matches_pure
    + test_ima_core_matches_audioop)."""
    pred, idx, body = _ima_parse_header(data)
    swapped = (((body & 0x0F) << 4) | (body >> 4)).tobytes()
    samples = np.frombuffer(
        _audioop.adpcm2lin(swapped, 2, (pred, idx))[0], dtype="<i2"
    )
    out = np.empty(samples.size + 1, dtype=np.int16)
    out[0] = pred
    out[1:] = samples
    return out


_decode_ima_adpcm = (
    _decode_ima_adpcm_audioop if _audioop else _decode_ima_adpcm_pure
)


# ---------------------------------------------------------------------------
# RIFF/WAVE container: PCM (8/16/24/32-bit), IEEE float (3), A-law (6),
# mu-law (7), and WAVE_FORMAT_EXTENSIBLE (0xFFFE, via its SubFormat
# code).  Multi-channel integer-mean downmix to mono so every decoder
# in CODECS emits 1-D int16; wider-than-16-bit samples keep their top
# 16 bits (the dedup channel's common representation).
# ---------------------------------------------------------------------------


def _decode_wav(data: bytes) -> np.ndarray:
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, raw = 12, None, None
    n = len(data)
    while pos + 8 <= n:
        cid = bytes(data[pos : pos + 4])
        sz = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)  # chunks are 2-byte aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real code in
        if len(fmt) < 26:       # the SubFormat GUID's first two bytes
            raise ValueError("wav extensible fmt chunk truncated")
        audio_format = int.from_bytes(fmt[24:26], "little")
    if channels < 1:
        raise ValueError("wav channel count must be >= 1")
    raw = bytes(raw)
    if audio_format == 1:  # integer PCM
        if bits == 16:
            samples = np.frombuffer(raw, dtype="<i2")
        elif bits == 8:  # 8-bit wav is unsigned by spec
            samples = (
                np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
            ) << 8
        elif bits == 24:  # packed 3-byte LE; keep the top 16 bits
            m = (len(raw) // 3) * 3
            b3 = np.frombuffer(raw, np.uint8, m).reshape(-1, 3)
            i32 = (
                b3[:, 0].astype(np.int32)
                | (b3[:, 1].astype(np.int32) << 8)
                | (b3[:, 2].astype(np.int32) << 16)
            )
            i32 = (i32 ^ 0x800000) - 0x800000  # sign-extend 24 bits
            samples = (i32 >> 8).astype(np.int16)
        elif bits == 32:
            samples = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int16)
        else:
            raise ValueError(f"unsupported wav bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        dt = "<f4" if bits == 32 else ("<f8" if bits == 64 else None)
        if dt is None:
            raise ValueError(f"unsupported float wav bit depth {bits}")
        f = np.frombuffer(raw, dtype=dt)
        samples = np.clip(
            np.round(f * 32767.0), -32768, 32767
        ).astype(np.int16)
    elif audio_format == 6:  # A-law payload inside WAVE
        samples = _decode_alaw(raw)
    elif audio_format == 7:  # mu-law payload inside WAVE
        samples = _decode_mulaw(raw)
    elif audio_format == 2:  # MS-ADPCM (mono or stereo blocks)
        if channels not in (1, 2):
            raise ValueError("MS-ADPCM wav: mono/stereo only")
        samples = _decode_msadpcm_blocks(raw, block_align, channels)
    elif audio_format == 0x11:  # IMA ADPCM inside WAVE (mono blocks)
        if channels != 1:
            raise ValueError("IMA-ADPCM wav: mono only")
        samples = _decode_ima_wav_blocks(raw, block_align)
        channels = 1
    else:
        raise ValueError(f"unsupported wav format {audio_format}")
    if channels > 1:
        usable = (samples.size // channels) * channels
        samples = (
            samples[:usable].reshape(-1, channels).astype(np.int32).sum(axis=1)
            // channels
        ).astype(np.int16)
    return samples


# MS-ADPCM spec constants (the published coefficient/adaptation tables)
_MS_COEF1 = (256, 512, 0, 192, 240, 460, 392)
_MS_COEF2 = (0, -256, 0, 64, 0, -208, -232)
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)


def _decode_msadpcm_blocks(raw: bytes, block_align: int,
                           channels: int = 1) -> np.ndarray:
    """MS-ADPCM (WAV format 2): per block, per channel — predictor
    index byte, initial delta int16, sample1 int16, sample2 int16 (all
    channel-interleaved in that field order), then high-nibble-first
    4-bit codes alternating channels.  Output per block starts with the
    interleaved sample2 then sample1 pairs, followed by the decoded
    stream — so the caller's generic downmix sees plain interleaved
    frames."""
    hdr = 7 * channels
    if block_align < hdr:
        raise ValueError("MS-ADPCM block align too small")
    out: list[int] = []
    for off in range(0, len(raw) - hdr + 1, block_align):
        blk = raw[off : off + block_align]
        if len(blk) < hdr:
            break
        c1 = [0] * channels
        c2 = [0] * channels
        delta = [0] * channels
        s1 = [0] * channels
        s2 = [0] * channels
        for ch in range(channels):
            pidx = blk[ch]
            if pidx >= len(_MS_COEF1):
                raise ValueError("MS-ADPCM predictor index out of range")
            c1[ch], c2[ch] = _MS_COEF1[pidx], _MS_COEF2[pidx]
        base = channels
        for ch in range(channels):
            delta[ch] = int.from_bytes(
                blk[base + 2 * ch : base + 2 * ch + 2], "little", signed=True
            )
        base = 3 * channels
        for ch in range(channels):
            s1[ch] = int.from_bytes(
                blk[base + 2 * ch : base + 2 * ch + 2], "little", signed=True
            )
        base = 5 * channels
        for ch in range(channels):
            s2[ch] = int.from_bytes(
                blk[base + 2 * ch : base + 2 * ch + 2], "little", signed=True
            )
        out.extend(s2)
        out.extend(s1)
        ch = 0
        for byte in blk[hdr:]:
            for nib in (byte >> 4, byte & 0x0F):
                signed = nib - 16 if nib >= 8 else nib
                pred = (s1[ch] * c1[ch] + s2[ch] * c2[ch]) >> 8
                s = max(-32768, min(32767, pred + signed * delta[ch]))
                s2[ch], s1[ch] = s1[ch], s
                delta[ch] = max(16, (_MS_ADAPT[nib] * delta[ch]) >> 8)
                out.append(s)
                ch = (ch + 1) % channels
    return np.asarray(out, dtype=np.int16)


def _decode_ima_wav_blocks(raw: bytes, block_align: int) -> np.ndarray:
    """Mono IMA ADPCM inside WAVE (format 0x11): per block — predictor
    int16, step index byte, reserved byte, then low-nibble-first codes
    (the shared :func:`_ima_decode_nibbles` recurrence)."""
    if block_align < 4:
        raise ValueError("IMA wav block align too small")
    parts: list[np.ndarray] = []
    for off in range(0, len(raw) - 3, block_align):
        blk = raw[off : off + block_align]
        if len(blk) < 4:
            break
        pred = int.from_bytes(blk[0:2], "little", signed=True)
        idx = max(0, min(88, blk[2]))
        body = np.frombuffer(blk, np.uint8, len(blk) - 4, 4)
        nibbles = np.empty(body.size * 2, dtype=np.uint8)
        nibbles[0::2] = body & 0x0F
        nibbles[1::2] = body >> 4
        parts.append(np.array([pred], dtype=np.int16))
        parts.append(_ima_decode_nibbles(nibbles, pred, idx))
    if not parts:
        return np.empty(0, dtype=np.int16)
    return np.concatenate(parts)


def encode_wav(pcm: np.ndarray, sr_hz: int = 8000) -> bytes:
    """Canonical 16-bit mono RIFF/WAVE writer (fixture + interop helper)."""
    raw = np.ascontiguousarray(pcm, dtype="<i2").tobytes()
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, sr_hz, sr_hz * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _stub(codec: str) -> Callable[[bytes], np.ndarray]:
    def _raise(_: bytes) -> np.ndarray:
        raise NotImplementedError(
            f"codec {codec!r}: decoder not available in this environment; "
            "register a real kernel in CODECS on a cluster with audio libs"
        )

    return _raise


from quichash_spark.functions.flac import decode_flac  # noqa: E402

#: codec name -> bytes->int16-PCM decoder. The registry mirrors
#: quichash's HashRegistry::get_hasher (src/hash.rs:320-343).
CODECS: dict[str, Callable[[bytes], np.ndarray]] = {
    "pcm16": _decode_pcm16,
    "pcm16_padded": _decode_pcm16_padded,
    "wav": _decode_wav,
    "mulaw": _decode_mulaw,
    "alaw": _decode_alaw,
    "ima_adpcm": _decode_ima_adpcm,
    # REAL lossless decoder from the public spec (functions/flac.py):
    # Rice residuals, fixed+LPC prediction, all stereo modes, CRC-checked
    "flac": decode_flac,
    # lossy codecs needing DSP libraries stay honestly stubbed
    "opus": _stub("opus"),
    "mp3": _stub("mp3"),
}


def decode_pcm(data: bytes | None, codec: str) -> np.ndarray | None:
    """Decode bytes to int16 PCM; None / unknown codec => None (row is
    counted in metrics, not fatal — FIXTURES.md §4 malformed-input rule)."""
    if data is None:
        return None
    dec = CODECS.get(codec)
    if dec is None:
        return None
    try:
        # bytes and memoryview both satisfy the buffer protocol frombuffer
        # needs; memoryview (the Arrow zero-copy path) must NOT be copied
        # through bytes() — that copy was the whole per-row decode cost
        if not isinstance(data, (bytes, memoryview)):
            data = bytes(data)
        return dec(data)
    except NotImplementedError:
        raise
    except Exception:
        return None


# ---------------------------------------------------------------------------
# SNR verification kernel (BASELINE.json input_hint: allclose SNR >= 30 dB)
# ---------------------------------------------------------------------------

def snr_db(ref: np.ndarray, other: np.ndarray, cap: float = 999.0) -> float:
    """SNR of ``other`` vs ``ref`` in dB over the common prefix length.

    Bit-identical => ``cap``; empty/zero-signal reference => -inf unless
    identical.  Length mismatch is handled by comparing the overlapping
    prefix (containment pairs are prefix slices, FIXTURES.md §1).
    """
    n = min(ref.size, other.size)
    if n == 0:
        return cap if ref.size == other.size else float("-inf")
    a = ref[:n].astype(np.float64)
    b = other[:n].astype(np.float64)
    noise = a - b
    p_noise = float(np.dot(noise, noise))
    if p_noise == 0.0:
        return cap
    p_sig = float(np.dot(a, a))
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)


# ---------------------------------------------------------------------------
# PCM frame fingerprint (Haitsma-Kalker-style sign-of-difference bits)
# ---------------------------------------------------------------------------

def pcm_frame_bits(pcm: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """Per-frame robust feature words (uint64, one per frame).

    Frames of ``cfg.frame_len`` samples at hop ``cfg.frame_hop``; per frame
    compute ``cfg.pcm_bands`` coarse spectral band energies (rfft magnitude
    sums) and emit one bit per band: *is this band above the frame's mean
    band energy*.  Dominant-band bits are gain-invariant and stable under
    additive noise at the >=30 dB SNR the verify gate targets (the
    sign-of-adjacent-difference variant is NOT: bands with near-zero
    energy make those signs noise-dominated).
    """
    if pcm is None or pcm.size < cfg.frame_len:
        return np.empty(0, dtype=np.uint64)
    n_frames = 1 + (pcm.size - cfg.frame_len) // cfg.frame_hop
    idx = (
        np.arange(cfg.frame_len)[None, :]
        + np.arange(n_frames)[:, None] * cfg.frame_hop
    )
    return _frame_words(pcm[idx].astype(np.float32))


def _frame_words(frames: np.ndarray) -> np.ndarray:
    """(n_frames, frame_len) float32 -> one uint64 feature word per frame.

    float32 magnitude spectrum: ~1.4x kernel speedup vs the round-1
    float64 path; float32 epsilon (~1e-7 relative) is 5 orders of
    magnitude below the >=30 dB (~3%) perturbations the peak/centroid
    features must already tolerate, so feature bits are unaffected in the
    operating regime (kernel_version bumped anyway — bit outputs changed,
    checkpoints/fixtures invalidate).

    Every op is frame-row-wise, so results are independent of how clips
    are grouped into calls.

    word = dominant peak bin (9b) | second peak bin (9b) | log-ratio (5b)
    | spectral centroid (7b).  ~30 bits/frame keeps stationary clips
    (constant word sequences) from colliding across the corpus; strong
    peaks and the energy-weighted centroid are stable under the >=30 dB
    additive noise the verify gate targets.
    """
    n_frames = frames.shape[0]
    spec = np.abs(np.fft.rfft(frames, axis=1))  # float32 (n_frames, n_bins)
    spec[:, 0] = 0.0  # ignore DC
    top1 = spec.argmax(axis=1)
    rows_idx = np.arange(n_frames)
    e1 = spec[rows_idx, top1]
    masked = spec.copy()
    # exclude +-2 bins around the dominant peak (one fancy assignment)
    j = np.clip(top1[:, None] + np.arange(-2, 3)[None, :], 0, spec.shape[1] - 1)
    masked[rows_idx[:, None], j] = 0.0
    top2 = masked.argmax(axis=1)
    e2 = masked[rows_idx, top2]
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(
            e2 > 0, np.log2(np.maximum(e1, 1e-12) / np.maximum(e2, 1e-12)), 7.0
        )
    ratio_bin = np.clip(ratio * 4.0, 0, 31).astype(np.uint64)  # 5 bits, 1/4-octave
    power = spec * spec  # contiguous float32 square — cheap
    tot = power.sum(axis=1)
    bins = np.arange(spec.shape[1], dtype=np.float32)
    with np.errstate(invalid="ignore", divide="ignore"):
        centroid = np.where(tot > 0, power @ bins / np.maximum(tot, 1e-12), 0.0)
    centroid_bin = np.clip(centroid * 128.0 / spec.shape[1], 0, 127).astype(np.uint64)
    return (
        top1.astype(np.uint64)
        | (top2.astype(np.uint64) << _U64(9))
        | (ratio_bin << _U64(18))
        | (centroid_bin << _U64(23))
    )


def pcm_frame_bits_batch(
    pcms: list[np.ndarray | None], cfg: DedupConfig
) -> list[np.ndarray]:
    """Batch API over :func:`pcm_frame_bits` (None-safe, output-identical).

    All clips' frames concatenate into ONE matrix per call, so the FFT and
    every row-wise feature op dispatch once per batch instead of once per
    clip (r6: ~145 us/clip of numpy-dispatch overhead measured in the
    per-clip loop).  :func:`_frame_words` is strictly frame-row-wise, so
    the concatenated results are bit-identical to the per-clip path
    (test-asserted).  Arrow batches are bounded (maxRecordsPerBatch=128),
    which caps the concatenated matrix at ~20 MB — the earlier finding
    that whole-partition concatenation (~100 MB intermediates) falls out
    of cache does not apply at this batch size.
    """
    counts: list[int] = []
    views: list[np.ndarray] = []
    for p in pcms:
        if p is None or p.size < cfg.frame_len:
            counts.append(0)
            continue
        w = np.lib.stride_tricks.sliding_window_view(p, cfg.frame_len)[
            :: cfg.frame_hop
        ]
        counts.append(w.shape[0])
        views.append(w)
    if not views:
        return [np.empty(0, dtype=np.uint64) for _ in pcms]
    total = sum(v.shape[0] for v in views)
    big = np.empty((total, cfg.frame_len), dtype=np.float32)
    off = 0
    for v in views:
        big[off : off + v.shape[0]] = v  # int16 -> float32, one copy
        off += v.shape[0]
    words = _frame_words(big)
    out: list[np.ndarray] = []
    off = 0
    for c in counts:
        if c == 0:
            out.append(np.empty(0, dtype=np.uint64))
        else:
            out.append(words[off : off + c])
            off += c
    return out


def pcm_shingle_hashes(pcm: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """uint64 hashes of k-frame shingles of the frame-bit sequence."""
    return shingles_from_words(pcm_frame_bits(pcm, cfg), cfg)


def shingles_from_words(words: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """uint64 hashes of k-frame shingles of precomputed frame words.

    The PCM analog of text shingles: consecutive ``cfg.pcm_k_shingle``
    frame words folded with the splitmix constant; de-duplicated.
    Split out so callers that also need the raw words (n_frames metadata)
    run the FFT exactly once.
    """
    k = cfg.pcm_k_shingle
    if words.size == 0:
        return np.empty(0, dtype=np.uint64)
    if words.size < k:
        padded = np.zeros(k, dtype=np.uint64)
        padded[: words.size] = words
        words = padded
    mix = _U64(MIX64)
    with np.errstate(over="ignore"):
        acc = np.full(words.size - k + 1, _U64(0x13198A2E03707344), dtype=np.uint64)
        for r in range(k):
            acc = (acc ^ words[r : r + acc.size]) * mix
            acc ^= acc >> _U64(31)
    return np.unique(acc)


__all__ = [
    "CODECS",
    "PCM16_PADDED_HEADER",
    "decode_pcm",
    "encode_wav",
    "snr_db",
    "pcm_frame_bits",
    "pcm_shingle_hashes",
    "shingles_from_words",
]

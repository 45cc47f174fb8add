"""Deterministic synthetic `clips` corpus with planted ground truth.

Schema is exactly the BASELINE.json ``input_hint`` shape:
``(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string)`` plus a side table ``truth(clip_id, true_cluster_id,
kind)`` (FIXTURES.md §1).

Every clip is a PURE FUNCTION of its integer index (seeded
``np.random.default_rng([SEED, i, ...])``), so:

- Spark generates the corpus distributed (``spark.range(n)`` →
  ``mapInPandas``) with results independent of partitioning;
- the single-node numpy oracle regenerates the identical corpus;
- pair roles derive the BASE clip from index arithmetic (block layout),
  never from shared state.

This is the analog of the reference's deterministic pattern generator
(``/root/reference/src/benchmark.rs:115-133``) and its
international-filenames stress corpus
(``/root/reference/tests/international_filenames_test.rs:10-247``).

Block layout (20 indices per block, ``off = i % 20``):

====  =============================================================
off   role
====  =============================================================
0-11  unique clip (hot-band "ok" transcript when block % 5 == 4;
      off 8 becomes an SNR<20dB TRUE NEGATIVE of off 7 when
      block % 3 == 1)
12    base of exact-duplicate pair
13    exact duplicate of off 12 (same PCM+transcript, other codec)
14    base of audio near-duplicate pair
15    PCM of off 14 + gaussian noise at SNR 33-40 dB, same transcript
16    base of text near-duplicate pair
17    transcript of off 16 with <=2 token substitutions constrained to
      SimHash Hamming distance <= 3; identical PCM
18    containment base (long clip)
19    contiguous ~75-85% prefix slice of off 18 (tokens and PCM)
====  =============================================================

Global edge cases (only applied to `unique` offsets): i==1 empty
transcript, i==2 double-space transcript, i==3 all-unicode transcript,
i==5 minimum duration.
"""

from __future__ import annotations

import numpy as np

from quichash_spark.config import CLIPS_CONFIG
from quichash_spark.functions.audio import PCM16_PADDED_HEADER
from quichash_spark.functions.hashing import hamming64, simhash64_i64

SEED = 42
BLOCK = 20

_BASE_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu",
]
_UNICODE_WORDS = [
    "привет", "мир", "данные", "файл",        # Cyrillic
    "数据", "音频", "重复", "检测",              # CJK
    "مرحبا", "صوت", "بيانات", "ملف",           # Arabic
    "🎵", "🔊", "日本語", "한국어",
]


def _vocab() -> list[str]:
    rng = np.random.default_rng(SEED)
    words = []
    for i in range(512 - len(_UNICODE_WORDS)):
        a = _BASE_WORDS[int(rng.integers(len(_BASE_WORDS)))]
        b = _BASE_WORDS[int(rng.integers(len(_BASE_WORDS)))]
        words.append(f"{a}{b}{i % 97}")
    return words + _UNICODE_WORDS


VOCAB = _vocab()


def _rng(*key: int) -> np.random.Generator:
    return np.random.default_rng([SEED, *key])


def _gen_transcript(i: int, n_tokens: int | None = None) -> str:
    rng = _rng(i, 101)
    if n_tokens is None:
        n_tokens = int(rng.integers(5, 41))
    idx = rng.integers(0, len(VOCAB), size=n_tokens)
    return " ".join(VOCAB[j] for j in idx)


def _gen_pcm(i: int, sr: int, dur_ms: int) -> np.ndarray:
    """Seeded mixture of 2-4 sines + low-amplitude noise, int16."""
    rng = _rng(i, 202)
    n = max(1, sr * dur_ms // 1000)
    t = np.arange(n, dtype=np.float64) / sr
    sig = np.zeros(n)
    for _ in range(int(rng.integers(2, 5))):
        f = float(rng.uniform(80.0, min(4000.0, sr / 2 - 100)))
        amp = float(rng.uniform(2000.0, 9000.0))
        phase = float(rng.uniform(0, 2 * np.pi))
        sig += amp * np.sin(2 * np.pi * f * t + phase)
    sig += rng.normal(0.0, 30.0, size=n)
    return np.clip(sig, -32000, 32000).astype(np.int16)


def _add_noise_at_snr(pcm: np.ndarray, snr_target_db: float, rng: np.random.Generator) -> np.ndarray:
    x = pcm.astype(np.float64)
    rms = np.sqrt(np.mean(x**2)) or 1.0
    sigma = rms / (10.0 ** (snr_target_db / 20.0))
    noisy = x + rng.normal(0.0, sigma, size=x.size)
    return np.clip(noisy, -32000, 32000).astype(np.int16)


def _encode(pcm: np.ndarray, codec: str, i: int) -> bytes:
    raw = np.ascontiguousarray(pcm, dtype="<i2").tobytes()
    if codec == "pcm16_padded":
        header = bytes(_rng(i, 303).integers(0, 256, size=PCM16_PADDED_HEADER, dtype=np.uint8))
        return header + raw
    return raw


def _base_fields(i: int) -> tuple[int, int, str]:
    rng = _rng(i, 404)
    sr = int(rng.choice([8000, 16000]))
    dur_ms = int(rng.integers(200, 1201))
    codec = "pcm16" if rng.integers(2) == 0 else "pcm16_padded"
    return sr, dur_ms, codec


def _unique_clip(i: int) -> dict:
    sr, dur_ms, codec = _base_fields(i)
    if i == 5:
        dur_ms = 200  # minimum duration edge case
    pcm = _gen_pcm(i, sr, dur_ms)
    transcript = _gen_transcript(i)
    if i == 1:
        transcript = ""
    elif i == 2:
        toks = transcript.split()[:8]
        transcript = "  ".join(toks)  # double spaces (ref database.rs:697-737)
    elif i == 3:
        rng = _rng(i, 505)
        transcript = " ".join(
            _UNICODE_WORDS[int(j)] for j in rng.integers(0, len(_UNICODE_WORDS), size=12)
        )
    block = i // BLOCK
    if block % 5 == 4 and i % BLOCK <= 11 and i > 5:
        transcript = "ok"  # hot LSH band (skew group)
    return {
        "i": i, "sr_hz": sr, "dur_ms": dur_ms, "codec": codec,
        "pcm": pcm, "transcript": transcript,
        "kind": "unique", "cluster": f"t{i:08d}",
    }


def _substitute_tokens(transcript: str, rng: np.random.Generator, max_hamming: int) -> str:
    """<=2 token substitutions with SimHash Hamming distance <= max_hamming.

    Deterministic rejection loop; falls back to 1 then 0 substitutions.
    """
    toks = transcript.split()
    base_sim = simhash64_i64(transcript)
    for n_subs in (2, 1):
        if len(toks) < n_subs:
            continue
        for _ in range(200):
            cand = list(toks)
            pos = rng.choice(len(toks), size=n_subs, replace=False)
            for p in pos:
                cand[int(p)] = VOCAB[int(rng.integers(len(VOCAB)))]
            out = " ".join(cand)
            if hamming64(simhash64_i64(out), base_sim) <= max_hamming:
                return out
    return transcript


def gen_clip(i: int) -> dict:
    """Generate clip ``i`` (pure function of the index)."""
    off = i % BLOCK
    block = i // BLOCK
    if off <= 11:
        clip = _unique_clip(i)
        if off == 8 and block % 3 == 1 and i >= BLOCK:
            # SNR<20dB TRUE NEGATIVE: same transcript as off 7, badly
            # degraded audio — must become an LSH candidate and be
            # REJECTED by verification (FIXTURES.md §1 true negatives).
            base = _unique_clip(i - 1)
            rng = _rng(i, 606)
            pcm = _add_noise_at_snr(base["pcm"], float(rng.uniform(8.0, 18.0)), rng)
            clip.update(pcm=pcm, transcript=base["transcript"],
                        sr_hz=base["sr_hz"], dur_ms=base["dur_ms"])
        return clip
    if off in (12, 14, 16, 18):
        clip = _unique_clip(i)
        if off == 16:
            # text-near base needs >= 40 tokens: SimHash bit-vote margins
            # grow with token count, so a <=2-token substitution satisfying
            # Hamming <= 3 is reliably findable (infeasible at 5-15 tokens)
            rng = _rng(i, 909)
            clip["transcript"] = _gen_transcript(i, n_tokens=int(rng.integers(40, 81)))
        if off == 18:  # containment base: force a long transcript + clip
            rng = _rng(i, 707)
            clip["transcript"] = _gen_transcript(i, n_tokens=int(rng.integers(24, 41)))
            clip["dur_ms"] = max(clip["dur_ms"], 800)
            clip["pcm"] = _gen_pcm(i, clip["sr_hz"], clip["dur_ms"])
        clip["kind"] = {12: "exact", 14: "audio_near", 16: "text_near", 18: "containment"}[off]
        clip["cluster"] = f"g{block:07d}_{clip['kind']}"
        return clip
    # derived member of a pair
    base = gen_clip(i - 1)
    rng = _rng(i, 808)
    clip = dict(base)
    clip["i"] = i
    if off == 13:  # exact duplicate, other codec wrapping
        clip["codec"] = "pcm16" if base["codec"] == "pcm16_padded" else "pcm16_padded"
    elif off == 15:  # audio near-duplicate: noise at SNR 33-40 dB
        clip["pcm"] = _add_noise_at_snr(base["pcm"], float(rng.uniform(33.0, 40.0)), rng)
    elif off == 17:  # text near-duplicate: <=2 token subs, Hamming<=3
        clip["transcript"] = _substitute_tokens(
            base["transcript"], rng, CLIPS_CONFIG.simhash_hamming_r
        )
    elif off == 19:  # containment: contiguous 75-85% prefix slice
        toks = base["transcript"].split()
        keep = max(1, int(len(toks) * float(rng.uniform(0.75, 0.85))))
        clip["transcript"] = " ".join(toks[:keep])
        n_keep = max(1, int(base["pcm"].size * float(rng.uniform(0.75, 0.85))))
        clip["pcm"] = base["pcm"][:n_keep].copy()
        clip["dur_ms"] = max(1, n_keep * 1000 // base["sr_hz"])
    return clip


def clip_row(i: int) -> dict:
    """Materialized table row for clip ``i`` (bytes encoded)."""
    c = gen_clip(i)
    return {
        "clip_id": f"clip_{i:08d}",
        "bytes": _encode(c["pcm"], c["codec"], i),
        "sr_hz": int(c["sr_hz"]),
        "dur_ms": int(c["dur_ms"]),
        "codec": c["codec"],
        "transcript": c["transcript"],
    }


def truth_row(i: int) -> dict:
    c = gen_clip(i)
    return {
        "clip_id": f"clip_{i:08d}",
        "true_cluster_id": c["cluster"],
        "kind": c["kind"],
    }


def n_clips_for_sf(sf: float) -> int:
    """Corpus size per scale factor: sf0.001->200, sf0.01->2000, sf0.1->20000."""
    return max(BLOCK, int(round(sf * 200_000)))

"""Property-based kernel tests (hypothesis) — beyond the reference's
example-based suite (SURVEY.md §5 notes it has no property tests)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quichash_spark.config import CLIPS_CONFIG
from quichash_spark.functions import audio, hashing
from quichash_spark.functions.winnow import winnow
from quichash_spark.operators.verify import verify_pair

CFG = CLIPS_CONFIG
A_PARAMS, B_PARAMS = hashing.minhash_params(CFG)

tokens = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyzабв日🎵", min_size=1, max_size=8),
    min_size=0,
    max_size=30,
)


@given(tokens)
@settings(max_examples=50, deadline=None)
def test_minhash_deterministic_and_shaped(toks):
    t = " ".join(toks)
    s1 = hashing.minhash_signature(hashing.shingle_hashes(t, CFG.k_shingle), A_PARAMS, B_PARAMS)
    s2 = hashing.minhash_signature(hashing.shingle_hashes(t, CFG.k_shingle), A_PARAMS, B_PARAMS)
    assert (s1 == s2).all() and s1.shape == (CFG.num_perm,)


@given(tokens, tokens)
@settings(max_examples=50, deadline=None)
def test_minhash_estimate_bounded_by_identity(a, b):
    ta, tb = " ".join(a), " ".join(b)
    sa = hashing.minhash_signature(hashing.shingle_hashes(ta, CFG.k_shingle), A_PARAMS, B_PARAMS)
    sb = hashing.minhash_signature(hashing.shingle_hashes(tb, CFG.k_shingle), A_PARAMS, B_PARAMS)
    est = hashing.minhash_jaccard(sa, sb)
    if ta == tb:
        assert est == 1.0
    assert 0.0 <= est <= 1.0


@given(tokens)
@settings(max_examples=50, deadline=None)
def test_simhash_i64_range_and_hamming_triangleish(toks):
    t = " ".join(toks)
    s = hashing.simhash64_i64(t)
    assert -(1 << 63) <= s < (1 << 63)
    assert hashing.hamming64(s, s) == 0
    chunks = hashing.simhash_chunks_i64(s, CFG.simhash_chunks)
    rebuilt = 0
    for i, c in enumerate(chunks):
        assert 0 <= c < (1 << 16)
        rebuilt |= c << (i * 16)
    assert rebuilt == (s & 0xFFFFFFFFFFFFFFFF)


@given(st.integers(0, 2**31 - 1), st.integers(400, 4000))
@settings(max_examples=25, deadline=None)
def test_snr_identity_and_symmetry_properties(seed, n):
    rng = np.random.default_rng(seed)
    sig = rng.normal(0, 2000, n).astype(np.int16)
    assert audio.snr_db(sig, sig) == CFG.snr_cap_db
    noisy = (sig + rng.normal(0, 50, n)).astype(np.int16)
    got = audio.snr_db(sig, noisy)
    # more noise can only lower SNR
    noisier = (sig + rng.normal(0, 400, n)).astype(np.int16)
    assert audio.snr_db(sig, noisier) <= got + 1e-9


@given(st.text(alphabet="abcdef ", min_size=0, max_size=200), st.text(alphabet="abcdef ", min_size=0, max_size=80))
@settings(max_examples=50, deadline=None)
def test_winnow_shared_substring_guarantee(base, extra):
    """Any shared substring of length >= k + w - 1 yields >= 1 shared
    fingerprint (the winnowing paper's guarantee)."""
    from quichash_spark.functions.winnow import K_GRAM, WINDOW

    if len(base) < K_GRAM + WINDOW - 1:
        return
    doc_a = base
    doc_b = extra + base + extra
    shared = np.intersect1d(winnow(doc_a), winnow(doc_b))
    assert shared.size >= 1


@given(tokens, tokens)
@settings(max_examples=30, deadline=None)
def test_verify_pair_consistency(a, b):
    ta, tb = " ".join(a), " ".join(b)
    pcm = np.arange(1000, dtype=np.int16)
    v = verify_pair(pcm, pcm.copy(), ta, tb, CFG)
    # identical audio: SNR capped; acceptance reduces to the text relation
    assert v["snr_db"] == CFG.snr_cap_db
    assert v["accepted"] == (
        v["transcript_equal"] or v["containment"] or v["hamming"] <= CFG.simhash_hamming_r
    )
    if ta == tb:
        assert v["accepted"]


@given(
    st.integers(1, 24), st.integers(1, 24),
    st.sampled_from([{}, {"use_cache_bits": 3}, {"subtract_green": True},
                     {"lz77": True}, {"palette": True}]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_vp8l_roundtrip_property(h, w, kw, seed):
    """Any image, any encoder feature set -> bit-exact decode."""
    from quichash_spark.functions.vp8l import decode_webp, encode_webp_lossless

    rng = np.random.default_rng(seed)
    if kw.get("palette"):
        ncol = int(rng.integers(1, 20))
        colors = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = colors[rng.integers(0, ncol, (h, w))]
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(img, **kw)), img)


@given(st.integers(1, 5000), st.sampled_from([8000, 16000, 44100]),
       st.sampled_from([8000, 16000]))
@settings(max_examples=40, deadline=None)
def test_resample_length_and_bounds(n, sr, tgt):
    """Output length = round(n * tgt/sr); values stay within input range
    (linear interpolation never overshoots)."""
    from quichash_spark.functions.audio_embed import resample_to

    x = np.random.default_rng(n).integers(-32768, 32767, n).astype(np.float64)
    y = resample_to(x, sr, tgt)
    assert y.shape == (int(round(n * tgt / sr)),)
    if y.size:
        assert y.min() >= x.min() - 1e-9 and y.max() <= x.max() + 1e-9


@given(
    st.integers(1, 24), st.integers(1, 24), st.integers(1, 7),
    st.sampled_from([8, 12, 16]), st.integers(0, 2), st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_lossless_jpeg_roundtrip_property(h, w, psv, prec, pt, seed):
    """SOF3 is bit-exact for every (shape, predictor, precision, point
    transform) up to exactly the Pt dropped low bits."""
    from quichash_spark.functions.jpeg import decode_jpeg, encode_jpeg_lossless

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 1 << prec, (h, w), dtype=np.uint16)
    data = encode_jpeg_lossless(
        img, predictor=psv, precision=prec, point_transform=pt
    )
    got = decode_jpeg(data, raw=True)[..., 0]
    np.testing.assert_array_equal(got, (img >> pt).astype(np.uint16) << pt)


@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_jpeg12_roundtrip_property(h, w, seed):
    """SOF1 12-bit flat-quant round trips within 1 of the ideal 8-bit
    rendering for any shape (incl. non-multiple-of-8 edge padding)."""
    from quichash_spark.functions.jpeg import decode_jpeg, encode_jpeg12

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 4096, (h, w), dtype=np.uint16)
    got = decode_jpeg(encode_jpeg12(img))[..., 0].astype(float)
    want = np.clip(np.round(img / 16.0), 0, 255)
    assert float(np.abs(got - want).max()) <= 1.0

"""Compiled-C kernel tier (functions/cc_kernels.py + qh_hash.c).

The C kernels are a translation of the repo's own spec kernels, so the
binding evidence is bit-equality against those kernels across every
length-branch boundary of both algorithms (BLAKE3: block/chunk/tree
boundaries; XXH3: the 0/3/8/16/128/240 short paths plus stripe/block
boundaries of the long path), on the official test-vector input pattern
(byte i = i % 251), plus the published one-shot anchors directly."""

from __future__ import annotations

import random
import shutil

import pytest

from quichash_spark.functions import cc_kernels as cc
from quichash_spark.functions.blake3_pure import blake3_hex, blake3_hex_batch
from quichash_spark.functions.xxh3_pure import xxh3_64_hex, xxh3_128_hex

_HAVE_CC = shutil.which("gcc") or shutil.which("cc")

pytestmark = pytest.mark.skipif(
    not _HAVE_CC, reason="no C compiler on this host"
)

#: every length-branch boundary of both algorithm families, ±1
BOUNDARY_LENGTHS = [
    0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 65, 96, 97,
    127, 128, 129, 160, 192, 240, 241, 255, 256, 511, 512, 1023, 1024,
    1025, 2047, 2048, 2049, 3072, 4096, 5120, 5121, 8191, 8192, 16384,
    31744, 102400,
]


def _pattern(n: int) -> bytes:
    return bytes(i % 251 for i in range(n))


def test_compiles_and_passes_published_gate():
    lib = cc.available()
    assert lib is not None, "gcc present but C kernels failed to build"
    assert (
        cc.blake3_hex_cc(b"")
        == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    assert (
        cc.blake3_hex_cc(b"abc")
        == "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"
    )
    assert cc.xxh3_64_hex_cc(b"") == "2d06800538d394c2"
    assert cc.xxh3_128_hex_cc(b"") == "99aa06d3014798d86001c324468d497f"


def test_bit_equality_at_every_branch_boundary():
    if cc.available() is None:
        pytest.skip("C kernels unavailable")
    vals = [_pattern(n) for n in BOUNDARY_LENGTHS]
    got_b3 = cc.blake3_hex_batch_cc(vals)
    got_x64 = cc.xxh3_64_hex_batch_cc(vals)
    got_x128 = cc.xxh3_128_hex_batch_cc(vals)
    for n, v, g3, g64, g128 in zip(
        BOUNDARY_LENGTHS, vals, got_b3, got_x64, got_x128
    ):
        # scalar pure blake3 is interpreter-speed: use the numpy batch
        # kernel (itself cross-checked against the scalar one) past 2 KB
        exp3 = blake3_hex_batch([v])[0] if n > 2048 else blake3_hex(v)
        assert g3 == exp3, f"blake3 len={n}"
        assert g64 == xxh3_64_hex(v), f"xxh3 len={n}"
        assert g128 == xxh3_128_hex(v), f"xxh128 len={n}"


def test_bit_equality_randomized():
    if cc.available() is None:
        pytest.skip("C kernels unavailable")
    rng = random.Random(0xC0FFEE)
    vals = [
        rng.randbytes(rng.randrange(0, 70_000)) for _ in range(24)
    ]
    got_b3 = cc.blake3_hex_batch_cc(vals)
    got_x64 = cc.xxh3_64_hex_batch_cc(vals)
    got_x128 = cc.xxh3_128_hex_batch_cc(vals)
    for v, g3, g64, g128 in zip(vals, got_b3, got_x64, got_x128):
        assert g3 == blake3_hex_batch([v])[0]
        assert g64 == xxh3_64_hex(v)
        assert g128 == xxh3_128_hex(v)


def test_empty_batch():
    if cc.available() is None:
        pytest.skip("C kernels unavailable")
    assert cc.blake3_hex_batch_cc([]) == []
    assert cc.xxh3_64_hex_batch_cc([]) == []
    assert cc.xxh3_128_hex_batch_cc([]) == []


def test_registry_engages_cc_tier_on_this_host():
    """With gcc present and no wheel, the registry's blake3/xxh3/xxh128
    must run the compiled tier, not the interpreter kernels."""
    from quichash_spark.functions.hashreg import KERNEL_PROVENANCE

    if cc.available() is None:
        pytest.skip("C kernels unavailable")
    for algo in ("blake3", "xxh3", "xxh128"):
        assert KERNEL_PROVENANCE[algo] in ("wheel", "cc"), algo


def test_batch_functions_fall_back_without_library(monkeypatch):
    """Executor-side degradation contract (ADVICE r4): tier selection
    happens once driver-side, but the *_cc batch functions run inside
    executor Python workers on OTHER nodes — where available() may be
    None (no gcc, failed compile/self-check).  They must return the pure
    kernels' results, never AttributeError the task."""
    monkeypatch.setattr(cc, "_lib", None)
    monkeypatch.setattr(cc, "_tried", True)
    vals = [b"", b"abc", _pattern(100), _pattern(1025)]
    assert cc.blake3_hex_batch_cc(vals) == blake3_hex_batch(vals)
    assert cc.xxh3_64_hex_batch_cc(vals) == [xxh3_64_hex(v) for v in vals]
    assert cc.xxh3_128_hex_batch_cc(vals) == [xxh3_128_hex(v) for v in vals]


def test_unsafe_cached_library_is_refused(tmp_path):
    """_safe_to_load gates dlopen: a .so (or its dir) that is not a
    private file of the current uid is never loaded — loading executes
    library constructors, so the published-vector self-check comes too
    late to defend against a pre-planted library (ADVICE r4)."""
    import os

    so = tmp_path / "qh_hash_x.so"
    so.write_bytes(b"\x7fELF")
    os.chmod(tmp_path, 0o700)
    os.chmod(so, 0o600)
    assert cc._safe_to_load(str(so))
    os.chmod(so, 0o666)  # other-writable file
    assert not cc._safe_to_load(str(so))
    os.chmod(so, 0o600)
    os.chmod(tmp_path, 0o777)  # other-writable dir (TOCTOU swap vector)
    assert not cc._safe_to_load(str(so))
    os.chmod(tmp_path, 0o700)
    assert not cc._safe_to_load(str(tmp_path / "missing.so"))


def test_world_writable_cache_dir_is_bypassed(monkeypatch, tmp_path):
    """A shared/world-writable $QH_CC_CACHE is a code-injection vector on
    multi-user nodes: available() must compile into a fresh private
    mkdtemp instead, leaving the hostile dir untouched and unread."""
    shared = tmp_path / "shared_cache"
    shared.mkdir()
    import os

    os.chmod(shared, 0o777)
    monkeypatch.setenv("QH_CC_CACHE", str(shared))
    monkeypatch.setattr(cc, "_lib", None)
    monkeypatch.setattr(cc, "_tried", False)
    lib = cc.available()
    assert lib is not None  # still compiled, just elsewhere
    assert list(shared.iterdir()) == []  # nothing placed in (or trusted from) it

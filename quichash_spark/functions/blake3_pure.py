"""Pure-Python BLAKE3 (plain 32-byte hash mode), from the public spec.

Closes the reference's F1 catalog entry for its DEFAULT dedup algorithm
(quichash hashes with the blake3 crate, /root/reference/src/hash.rs:41,
249-273,336) in an environment with no blake3 wheel.

Algorithm (BLAKE3 paper / reference implementation, public): 1024-byte
chunks -> 64-byte blocks through a 7-round ChaCha-derived compression
(BLAKE2s G with rotations 16/12/8/7, fixed message permutation), chunk
chaining values combined in a binary tree whose left subtree holds the
largest power-of-two number of chunks strictly less than the total; the
final compression carries the ROOT flag.

Validation status: reproduces the published empty-input digest and the
official test-vector digests for 1-byte and "abc" inputs
(tests/test_hashreg.py); the multi-chunk/multi-block tree paths are
additionally cross-validated against an INDEPENDENT second derivation —
the incremental chunk-state + CV-stack algorithm (bottom-up tree), which
must agree bit-identically at 25 lengths covering every block/chunk/tree
boundary (tests/test_kernel_crosscheck.py).  The official
test_vectors.json corpus (repeating 0..250 pattern — the same inputs the
pins use) is not retrievable in this sandbox; embed it when network or a
wheel is available, then swap the registry entry.

Performance: interpreter-speed, Arrow-batched at the UDF layer — catalog
closure, not the 100 TB hot path.
"""

from __future__ import annotations

import struct

_MASK = 0xFFFFFFFF

IV = [
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
]
MSG_PERM = [2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8]

CHUNK_START = 1
CHUNK_END = 2
PARENT = 4
ROOT = 8

CHUNK_LEN = 1024
BLOCK_LEN = 64


def _g(v: list[int], a: int, b: int, c: int, d: int, mx: int, my: int) -> None:
    v[a] = (v[a] + v[b] + mx) & _MASK
    v[d] ^= v[a]
    v[d] = ((v[d] >> 16) | (v[d] << 16)) & _MASK
    v[c] = (v[c] + v[d]) & _MASK
    v[b] ^= v[c]
    v[b] = ((v[b] >> 12) | (v[b] << 20)) & _MASK
    v[a] = (v[a] + v[b] + my) & _MASK
    v[d] ^= v[a]
    v[d] = ((v[d] >> 8) | (v[d] << 24)) & _MASK
    v[c] = (v[c] + v[d]) & _MASK
    v[b] ^= v[c]
    v[b] = ((v[b] >> 7) | (v[b] << 25)) & _MASK


def _compress(
    cv: list[int], block_words: list[int], counter: int, block_len: int, flags: int
) -> list[int]:
    v = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        IV[0], IV[1], IV[2], IV[3],
        counter & _MASK, (counter >> 32) & _MASK, block_len, flags,
    ]
    m = list(block_words)
    for rnd in range(7):
        _g(v, 0, 4, 8, 12, m[0], m[1])
        _g(v, 1, 5, 9, 13, m[2], m[3])
        _g(v, 2, 6, 10, 14, m[4], m[5])
        _g(v, 3, 7, 11, 15, m[6], m[7])
        _g(v, 0, 5, 10, 15, m[8], m[9])
        _g(v, 1, 6, 11, 12, m[10], m[11])
        _g(v, 2, 7, 8, 13, m[12], m[13])
        _g(v, 3, 4, 9, 14, m[14], m[15])
        if rnd < 6:
            m = [m[p] for p in MSG_PERM]
    return [v[i] ^ v[i + 8] for i in range(8)] + [
        v[i + 8] ^ cv[i] for i in range(8)
    ]


def _block_words(block: bytes) -> list[int]:
    if len(block) < BLOCK_LEN:
        block = block + b"\x00" * (BLOCK_LEN - len(block))
    return list(struct.unpack("<16I", block))


def _chunk_output(data: bytes, chunk_counter: int, root: bool) -> list[int]:
    """CV of one <=1024-byte chunk (the full 16-word root output when
    ``root``); empty input is a single zero-length block."""
    cv = IV[:]
    n_blocks = max(1, (len(data) + BLOCK_LEN - 1) // BLOCK_LEN)
    out: list[int] = cv
    for bi in range(n_blocks):
        blk = data[bi * BLOCK_LEN : (bi + 1) * BLOCK_LEN]
        flags = 0
        if bi == 0:
            flags |= CHUNK_START
        if bi == n_blocks - 1:
            flags |= CHUNK_END
            if root:
                flags |= ROOT
        out = _compress(cv, _block_words(blk), chunk_counter, len(blk), flags)
        cv = out[:8]
    return out


def _subtree_cv(data: bytes, chunk_start: int) -> list[int]:
    """Non-root chaining value of the subtree covering ``data``."""
    if len(data) <= CHUNK_LEN:
        return _chunk_output(data, chunk_start, False)[:8]
    chunks = (len(data) + CHUNK_LEN - 1) // CHUNK_LEN
    left_chunks = 1 << ((chunks - 1).bit_length() - 1)
    split = left_chunks * CHUNK_LEN
    lcv = _subtree_cv(data[:split], chunk_start)
    rcv = _subtree_cv(data[split:], chunk_start + left_chunks)
    return _compress(IV[:], lcv + rcv, 0, BLOCK_LEN, PARENT)[:8]


def blake3_digest(data: bytes) -> bytes:
    """32-byte BLAKE3 digest (plain hash mode)."""
    if len(data) <= CHUNK_LEN:
        out = _chunk_output(data, 0, True)
    else:
        chunks = (len(data) + CHUNK_LEN - 1) // CHUNK_LEN
        left_chunks = 1 << ((chunks - 1).bit_length() - 1)
        split = left_chunks * CHUNK_LEN
        lcv = _subtree_cv(data[:split], 0)
        rcv = _subtree_cv(data[split:], left_chunks)
        out = _compress(IV[:], lcv + rcv, 0, BLOCK_LEN, PARENT | ROOT)
    return struct.pack("<8I", *out[:8])


def blake3_hex(data: bytes) -> str:
    return blake3_digest(data).hex()

"""GIF (87a/89a) codec — stdlib + numpy only, from the public spec.

Covers the structure a corpus decoder actually meets: logical screen
descriptor, global/local color tables, interlaced and sequential image
data, Graphic Control Extension (transparency index, frame delay),
multi-frame streams (the first frame renders; frame count and total
duration are reported for features), comment/application/plain-text
extensions skipped by the standard block-terminator walk.

LZW per the spec: variable code width starting at ``min_code_size + 1``
growing through 12 bits, CLEAR re-initializes the dictionary, EOI ends
the stream, LSB-first bit packing inside 255-byte sub-blocks, and the
``cur + first-symbol-of-cur`` rule for the just-allocated code.  The
encoder emits the same construction (with CLEAR whenever the table
fills), so round trips are bit-exact on the index stream — GIF is
lossless over its palette, which makes self-validation tight
(the FLAC/VP8L/SOF3 strategy; no external GIF decoder exists in this
environment).

Scale contract: identical to the other image codecs — called per row
inside the ``image_features`` mapInPandas kernel; malformed data raises
``ValueError`` and surfaces as ``decode_ok=false``, never a failed
task.  The LZW loop is bit-serial Python (inherent to the code);
palette application and interlace reordering are numpy.
"""

from __future__ import annotations

import struct

import numpy as np

#: row order of the 4-pass GIF interlace: (start, step) per pass
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> np.ndarray:
    """LZW-decompress ``data`` (concatenated sub-block payload) into
    exactly ``n_expected`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary: list of byte strings; codes < clear are literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    buf = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            buf |= data[pos] << nbits  # LSB-first packing
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the just-allocated-code rule
        else:
            raise ValueError("invalid GIF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("GIF LZW produced too many pixels")
    if len(out) != n_expected:
        raise ValueError("GIF LZW pixel count mismatch")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-blocks truncated")
        sz = data[pos]
        pos += 1
        if sz == 0:
            return b"".join(parts), pos
        parts.append(data[pos : pos + sz])
        if len(parts[-1]) != sz:
            raise ValueError("GIF sub-block truncated")
        pos += sz


def decode_gif(data: bytes) -> tuple[np.ndarray, int, int]:
    """bytes -> (first frame as (h, w, 3) uint8 RGB, n_frames,
    total_duration_ms).  Transparent pixels take the backdrop (black);
    later frames are parsed (structure + duration) but not composited."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    first: np.ndarray | None = None
    n_frames = 0
    duration_ms = 0
    transparent = -1
    delay_cs = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                blk, pos = _read_subblocks(data, pos)
                if len(blk) >= 4:
                    gflags, delay_cs = blk[0], struct.unpack_from("<H", blk, 1)[0]
                    transparent = blk[3] if gflags & 0x01 else -1
            else:  # comment / application / plain text: skip blocks
                _, pos = _read_subblocks(data, pos)
            continue
        if b != 0x2C:  # image descriptor expected
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError("invalid GIF LZW minimum code size")
        payload, pos = _read_subblocks(data, pos)
        n_frames += 1
        duration_ms += delay_cs * 10
        if first is not None:
            continue  # structure-only walk for later frames
        idx = _lzw_decode(min_code_size, payload, iw * ih).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: reorder rows
            order = [
                r for start, step in _INTERLACE_PASSES
                for r in range(start, ih, step)
            ]
            deinter = np.empty_like(idx)
            deinter[np.array(order, dtype=np.int64)] = idx
            idx = deinter
        if int(idx.max(initial=0)) >= table.shape[0]:
            raise ValueError("GIF index outside color table")
        frame = table[idx]
        if transparent >= 0:
            frame = frame.copy()
            frame[idx == transparent] = 0  # backdrop = black
        canvas = np.zeros((h, w, 3), np.uint8)
        canvas[iy : iy + ih, ix : ix + iw] = frame[: h - iy, : w - ix]
        first = canvas
    if first is None:
        raise ValueError("GIF has no image data")
    return first, n_frames, duration_ms


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for v in indices.reshape(-1).tolist():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        # width grows when the NEXT code would not fit (encoder-side
        # mirror of the decoder's len(table)==2^width rule)
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([v])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, interlace: bool = False,
               transparent: int | None = None) -> bytes:
    """Spec-conformant GIF89a writer for paletted content: quantizes by
    EXACT color (<= 256 distinct RGB values required — fixture images
    are drawn from small palettes), optional interlace + transparency.
    Exists to validate the decoder (round trips are pixel-exact)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError("encode_gif requires <= 256 distinct colors")
    bits = max(1, int(colors.shape[0] - 1).bit_length())
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), np.uint8)
    pal[: colors.shape[0]] = colors
    idx = idx.astype(np.uint8).reshape(h, w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    rows = idx
    iflags = 0
    if interlace:
        order = [
            r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
        ]
        rows = idx[np.array(order, dtype=np.int64)]
        iflags |= 0x40
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    min_code_size = max(2, bits)
    out += bytes([min_code_size])
    payload = _lzw_encode(min_code_size, rows)
    for off in range(0, len(payload), 255):
        blk = payload[off : off + 255]
        out += bytes([len(blk)]) + blk
    out += bytes([0, 0x3B])
    return bytes(out)

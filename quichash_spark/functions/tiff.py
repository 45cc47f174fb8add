"""Baseline TIFF 6.0 codec — stdlib + numpy only, from the public spec.

Covers the baseline profile a corpus decoder meets: classic TIFF in
either byte order (``II``/``MM``), first-IFD image with strip layout
(``StripOffsets``/``StripByteCounts``/``RowsPerStrip``), bilevel /
grayscale (1/4/8-bit) / RGB(A) / palette-color photometrics, and the
three baseline compressions — none (1), CCITT-free PackBits (32773) and
TIFF-LZW (5, with its MSB-first bit packing and the *early-change* code
width rule that differs from GIF's LZW).  Multi-IFD files decode their
first image; tiled TIFFs and the non-baseline compressions raise
``ValueError`` (→ the kernel's ``decode_ok=false`` path).

Validation follows the GIF/SOF3 pattern: a spec-conformant writer lives
beside the decoder (strips, all three compressions, palette and gray
paths), round trips are pixel-exact, and hand-assembled streams pin the
bit-level rules (LZW early change, PackBits literal/run opcodes,
big-endian IFDs).
"""

from __future__ import annotations

import struct

import numpy as np

# baseline tag ids
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_COLORMAP = 320
_T_TILE_WIDTH = 322

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, bo: str, pos: int) -> dict[int, list[int]]:
    n = struct.unpack_from(bo + "H", data, pos)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        off = pos + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, off)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * cnt
        if total <= 4:
            src = off + 8
        else:
            src = struct.unpack_from(bo + "I", data, off + 8)[0]
        if typ == 3:
            vals = list(struct.unpack_from(bo + f"{cnt}H", data, src))
        elif typ == 4:
            vals = list(struct.unpack_from(bo + f"{cnt}I", data, src))
        elif typ in (1, 2):
            vals = list(data[src : src + cnt])
        else:  # rational: numerator/denominator pairs, keep numerators
            vals = [
                struct.unpack_from(bo + "II", data, src + 8 * k)[0]
                for k in range(cnt)
            ]
        tags[tag] = vals
    return tags


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expect and i < len(data):
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("TIFF PackBits strip truncated")
    return bytes(out[:expect])


def _lzw_tiff_decode(data: bytes, expect: int) -> bytes:
    """TIFF-LZW: 8-bit symbols, MSB-first packing, CLEAR=256, EOI=257,
    and the EARLY-CHANGE rule (width bumps when the next code to assign
    is 2^width - 1, one earlier than GIF)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    buf = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW strip truncated")
            buf = (buf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("invalid TIFF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # early change: the encoder widens once ITS next free code hits
        # 2^width - 1, and it runs one assignment ahead of the decoder —
        # so the decoder widens when its next free slot reaches
        # 2^width - 2 (one code earlier than the GIF rule)
        if len(table) + 2 == (1 << width) and width < 12:
            width += 1
        if len(out) >= expect:
            break
    if len(out) < expect:
        raise ValueError("TIFF LZW pixel bytes missing")
    return bytes(out[:expect])


def decode_tiff(data: bytes) -> np.ndarray:
    """bytes -> (h, w, 3) uint8 RGB (first IFD)."""
    data = bytes(data)
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream")
    ifd_pos = struct.unpack_from(bo + "I", data, 4)[0]
    try:
        tags = _read_ifd(data, bo, ifd_pos)
    except struct.error as e:  # truncated IFD / out-of-line values
        raise ValueError(f"TIFF structure truncated: {e}") from e
    if _T_TILE_WIDTH in tags:
        raise ValueError("tiled TIFF not supported (baseline is strips)")
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_HEIGHT][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    comp = tags.get(_T_COMPRESSION, [1])[0]
    photo = tags.get(_T_PHOTOMETRIC, [1])[0]
    spp = tags.get(_T_SAMPLES, [1])[0]
    bits_list = tags.get(_T_BITS, [1] * spp)
    bits = bits_list[0]
    if any(b != bits for b in bits_list):
        raise ValueError("TIFF mixed bits-per-sample not supported")
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
    if bits not in (1, 4, 8):
        raise ValueError(f"TIFF bits-per-sample {bits} not baseline")
    row_bytes = (w * spp * bits + 7) // 8
    raw = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - i * rows_per_strip)
        expect = row_bytes * nrows
        strip = data[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("TIFF strip out of bounds")
        if comp == 1:
            if len(strip) < expect:
                raise ValueError("TIFF uncompressed strip short")
            raw += strip[:expect]
        elif comp == 32773:
            raw += _packbits_decode(strip, expect)
        elif comp == 5:
            raw += _lzw_tiff_decode(strip, expect)
        else:
            raise ValueError(f"TIFF compression {comp} not baseline")
    if len(raw) < row_bytes * h:
        raise ValueError("TIFF strips do not cover the image")

    rows = np.frombuffer(bytes(raw), np.uint8).reshape(h, row_bytes)
    if bits == 8:
        samples = rows[:, : w * spp].reshape(h, w, spp)
    else:
        unpacked = np.unpackbits(rows, axis=1)
        if bits == 1:
            samples = unpacked[:, :w].reshape(h, w, 1)
        else:  # 4-bit: pair bit-planes back into nibbles
            nib = unpacked.reshape(h, -1, 4)
            vals = (nib @ np.array([8, 4, 2, 1], np.uint8)).astype(np.uint8)
            samples = vals[:, : w * spp].reshape(h, w, spp)

    if photo == 3:  # palette-color via the 16-bit colormap
        if _T_COLORMAP not in tags:
            raise ValueError("palette TIFF missing ColorMap")
        cm = np.asarray(tags[_T_COLORMAP], np.uint32)
        n = cm.size // 3
        lut = (cm.reshape(3, n).T // 257).astype(np.uint8)  # 16 -> 8 bit
        idx = samples[..., 0].astype(np.int64)
        if int(idx.max(initial=0)) >= n:
            raise ValueError("TIFF palette index out of range")
        return lut[idx]
    # grayscale scaling to full 8-bit range
    if spp == 1:
        g = samples[..., 0].astype(np.float64)
        scale = {1: 255.0, 4: 17.0, 8: 1.0}[bits]
        g = np.round(g * scale).astype(np.uint8)
        if photo == 0:  # WhiteIsZero
            g = 255 - g
        return np.repeat(g[..., None], 3, axis=2)
    if spp < 3:
        raise ValueError(f"TIFF samples-per-pixel {spp} not supported")
    return samples[..., :3].copy()  # RGB / RGBA (alpha dropped)


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 126:
            j += 1
        if j > i:  # run of (j - i + 1) >= 2
            out += bytes([257 - (j - i + 1), row[i]])
            i = j + 1
            continue
        # literal until the next run of >= 3 (or 128 bytes)
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 2 < n and row[j] == row[j + 1] == row[j + 2])
        ):
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def _lzw_tiff_encode(payload: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    buf = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    cur = b""
    for byte in payload:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code + 1 == (1 << width) and width < 12:
            width += 1  # early change, mirrored
        if next_code > 4093:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(EOI)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(img: np.ndarray, compression: int = 1,
                rows_per_strip: int = 8, big_endian: bool = False,
                palette: bool = False) -> bytes:
    """Spec-conformant baseline writer: 8-bit gray (2-D input) or RGB,
    strip layout, compression in {1, 5, 32773}; ``palette=True`` writes
    photometric-3 with a 16-bit colormap (requires <= 256 distinct
    colors).  Exists to validate the decoder."""
    img = np.asarray(img, dtype=np.uint8)
    bo = ">" if big_endian else "<"
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if palette:
        if gray:
            raise ValueError("palette TIFF needs RGB input")
        flat = img.reshape(-1, 3)
        colors, idx = np.unique(flat, axis=0, return_inverse=True)
        if colors.shape[0] > 256:
            raise ValueError("palette TIFF requires <= 256 distinct colors")
        pixels = idx.astype(np.uint8).reshape(h, w, 1)
        spp = 1
    else:
        pixels = img[..., None] if gray else img
        spp = pixels.shape[2]

    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = pixels[y0 : y0 + rows_per_strip].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        elif compression == 5:
            strips.append(_lzw_tiff_encode(raw))
        else:
            raise ValueError(f"unsupported writer compression {compression}")

    photo = 3 if palette else (1 if spp == 1 else 2)
    tags: list[tuple[int, int, int, list[int]]] = [
        (_T_WIDTH, 3, 1, [w]),
        (_T_HEIGHT, 3, 1, [h]),
        (_T_BITS, 3, spp, [8] * spp),
        (_T_COMPRESSION, 3, 1, [compression]),
        (_T_PHOTOMETRIC, 3, 1, [photo]),
        (_T_SAMPLES, 3, 1, [spp]),
        (_T_ROWS_PER_STRIP, 3, 1, [rows_per_strip]),
        (_T_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]),
    ]
    if palette:
        lut = np.zeros((3, 256), np.uint16)
        lut[:, : colors.shape[0]] = (colors.astype(np.uint16) * 257).T
        tags.append((_T_COLORMAP, 3, 768, [int(v) for v in lut.reshape(-1)]))

    # layout: header(8) | IFD | out-of-line tag data | strips
    n_tags = len(tags) + 1  # + StripOffsets
    ifd_pos = 8
    data_pos = ifd_pos + 2 + 12 * n_tags + 4
    side = bytearray()

    def place(typ: int, cnt: int, vals: list[int]) -> bytes:
        size = _TYPE_SIZE[typ] * cnt
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        packed = struct.pack(bo + fmt * cnt, *vals)
        if size <= 4:
            return packed + b"\x00" * (4 - size)
        off = data_pos + len(side)
        side.extend(packed)
        if len(side) & 1:
            side.append(0)
        return struct.pack(bo + "I", off)

    entries = []
    for tag, typ, cnt, vals in tags:
        entries.append((tag, typ, cnt, place(typ, cnt, vals)))
    # strips start AFTER the offsets array that place() will append next
    extra = 4 * len(strips) if 4 * len(strips) > 4 else 0
    strips_pos = data_pos + len(side) + extra
    offs = []
    acc = strips_pos
    for s in strips:
        offs.append(acc)
        acc += len(s)
    entries.append((_T_STRIP_OFFSETS, 4, len(strips), place(4, len(strips), offs)))
    entries.sort(key=lambda e: e[0])  # spec: ascending tag order

    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(bo + "I", ifd_pos)
    out += struct.pack(bo + "H", n_tags)
    for tag, typ, cnt, val4 in entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt) + val4
    out += struct.pack(bo + "I", 0)  # next IFD
    out += side
    for s in strips:
        out += s
    return bytes(out)

"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec — stdlib + numpy only.

Closes the last *closeable* image-codec stub (VERDICT r3 #5): baseline
sequential DCT, 8-bit precision, grayscale or YCbCr (JFIF), arbitrary
sampling factors h,v <= 2 (4:4:4 / 4:2:2 / 4:2:0), restart markers.
Progressive, arithmetic-coded, 12-bit and hierarchical modes raise
``ValueError`` (they are rare extensions; a wheel-backed decoder swaps in
via IMAGE_CODECS exactly like blake3 wheels do in hashreg).

Same validation strategy as the PNG work: a spec-conformant ENCODER
lives here too (Annex K default tables), and tests round-trip through
it — with flat quantization tables the pipeline is lossless up to DCT
float rounding, so ``max|err| <= 2`` is a tight bound — plus
hand-derived single-block golden cases and an iDCT cross-check against
the direct O(n^4) spec formula.

Scale note (same contract as imaging.py): entropy decoding is one
Python loop per Huffman symbol — unavoidable for a bit-serial code —
but everything after it (dezigzag, dequantize, iDCT, level shift,
upsampling, color convert) is batched numpy over ALL blocks at once.
Reference never decodes payloads at all (/root/reference/src/hash.rs:
595-667); this is engine extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

# standard zigzag scan order: ZIGZAG[i] = (row, col) linear index of the
# i-th coefficient in scan order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: orthonormal 8x8 DCT-II basis: block = C.T @ coeffs @ C reconstructs
_C = np.array([
    [(np.sqrt(1 / 8) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


def _idct2_batch(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) samples (pre level
    shift).  One einsum pair for every block in the image."""
    return np.einsum("ux,nuv,vy->nxy", _C, coeffs, _C, optimize=True)


def _dct2_batch(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """T.81 Annex C code generation: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """{symbol -> (code, length)} — inverse of the decode table."""
    return {sym: (code, ln) for (ln, code), sym in
            _build_decode_table(bits, vals).items()}


# Annex K.3 default Huffman tables (public spec constants)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = bytes(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = bytes(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` raw bits to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-stuffing marker (RSTn handled by the
    caller via :meth:`restart`)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG scan data truncated")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:  # a real marker terminates entropy data
                self.marker = nxt
                self.pos += 1
                b = 0  # spec: pad with zero bits once a marker is hit
                self.pos -= 2  # leave the marker in place for the caller
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Consume an RSTn marker at the current byte position and reset
        the bit buffer (T.81 F.2.1.3.1)."""
        self.buf = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        # skip any fill bytes then the RST marker
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1
        if not (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                and 0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """bytes -> (h, w, 3) uint8 RGB (grayscale expands to 3 channels)."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / RSTn: no length
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec == 0:
                    q = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    q = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                qtables[tid] = q  # zigzag order as stored
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = bytes(body[i + 17 : i + 17 + n])
                htables[(cls, tid)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}): only baseline "
                "sequential (SOF0) is implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 0x0F})
            return _decode_scan(
                data, pos + 2 + seg_len, frame, scan, qtables, htables,
                restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("unsupported JPEG sampling factors (h,v must be <= 2)")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # per-component coefficient store (zigzag order), n_blocks x 64
    for c in scan:
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["coef"] = np.zeros((mcus_y * c["v"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0
        c["dc_tab"] = htables.get((0, c["td"]))
        c["ac_tab"] = htables.get((1, c["ta"]))
        if c["dc_tab"] is None or c["ac_tab"] is None:
            raise ValueError("JPEG scan references missing Huffman table")
        if c["tq"] not in qtables:
            raise ValueError("JPEG scan references missing quant table")

    br = _BitReader(data, pos)
    blk = np.zeros(64, dtype=np.int32)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            for c in scan:
                c["pred"] = 0
            br.restart()
        my, mx = divmod(m, mcus_x)
        for c in scan:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk[:] = 0
                    s = br.decode_symbol(c["dc_tab"])
                    diff = _extend(br.read_bits(s), s) if s else 0
                    c["pred"] += diff
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = br.decode_symbol(c["ac_tab"])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overrun")
                        blk[k] = _extend(br.read_bits(s), s)
                        k += 1
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["coef"][row * c["bw"] + col] = blk

    # batched numpy from here on: dequant + dezigzag + iDCT per component
    planes = []
    for c in scan:
        q = qtables[c["tq"]]
        deq = c["coef"] * q  # both in zigzag order
        blocks = np.zeros((deq.shape[0], 64), dtype=np.float64)
        blocks[:, ZIGZAG] = deq  # dezigzag
        spatial = _idct2_batch(blocks.reshape(-1, 8, 8)) + 128.0
        bh = deq.shape[0] // c["bw"]
        plane = (
            spatial.reshape(bh, c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, c["bw"] * 8)
        )
        # upsample to full MCU grid resolution (sample replication)
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (spec-conformant; exists to validate the decoder + interop)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _encode_block(bw, zz, pred, dc_tab, ac_tab):
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff else 0
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l2 = ac_tab[0xF0]  # ZRL
            bw.write(c, l2)
            run -= 16
        size = abs(v).bit_length()
        c, l2 = ac_tab[(run << 4) | size]
        bw.write(c, l2)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        c, l2 = ac_tab[0x00]  # EOB
        bw.write(c, l2)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H/W multiples of 8 -> (n, 8, 8) blocks row-major."""
    bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
    return (
        plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def encode_jpeg(img: np.ndarray, qtable: np.ndarray | int = 1) -> bytes:
    """Minimal baseline JFIF writer: 4:4:4 (or single-component for 2-D
    input), Annex K Huffman tables, one quant table for all components.

    ``qtable``: int scalar (flat table of that value — flat 1 makes the
    round trip exact up to DCT float rounding) or a 64-entry zigzag-order
    table.
    """
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = (np.full(64, int(qtable), np.int32) if np.isscalar(qtable)
         else np.asarray(qtable, np.int32))
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    zzs = []
    for p in planes:
        padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        coeffs = _dct2_batch(_plane_blocks(padded - 128.0))
        zz = np.round(coeffs.reshape(-1, 64)[:, ZIGZAG] / q).astype(np.int32)
        zzs.append(zz)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])  # h=v=1 (4:4:4), quant table 0
    seg(0xC0, sof)

    tables = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
              (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                   (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    dht = b"".join(
        bytes([tc]) + bytes(bits) + vals for tc, bits, vals in tables
    )
    seg(0xC4, dht)

    sos = bytes([nc])
    for cid in range(1, nc + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_l = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    bw = _BitWriter()
    preds = [0] * nc
    n_blocks = zzs[0].shape[0]
    for i in range(n_blocks):  # 4:4:4 MCU = one block per component
        for ci in range(nc):
            dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            preds[ci] = _encode_block(bw, zzs[ci][i], preds[ci], dc, ac)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


__all__ = ["decode_jpeg", "encode_jpeg", "ZIGZAG"]

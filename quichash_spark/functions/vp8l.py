"""WebP-lossless (VP8L) decode from the public bitstream spec — stdlib +
numpy only, same philosophy as the PNG/JPEG/FLAC decoders (imaging.py /
jpeg.py / flac.py).

Implemented — the FULL lossless format (r4 verdict item #5 closed the
predictor/color/2D-distance gap):

- RIFF unwrap (plain ``VP8L`` chunk or ``VP8X`` + ``VP8L``).
- LSB-first bitreader; 14-bit width/height header.
- Canonical prefix codes: the *simple* form (1-2 symbols, incl. the
  degenerate zero-bit single-symbol code) and the *complex* form
  (code-length-code in the spec's ``kCodeLengthCodeOrder``, repeat
  tokens 16/17/18, optional ``max_symbol`` budget).  Codes follow the
  DEFLATE canonical convention the spec inherits: assignment by
  (length, symbol), bits of a code read most-significant first.
- Meta prefix groups (sub-resolution group-index image) and the
  5-code group layout: green+length+cache / red / blue / alpha /
  distance (alphabets 256+24+cache, 256, 256, 256, 40).
- Color cache (multiplier ``0x1e35a7bd``, index = high ``cache_bits``).
- LZ77 backward references: raw distances (plane code > 120) AND the
  120-entry 2D neighborhood map (``DISTANCE_MAP``, derived from its
  generating rule — nearest offsets by squared distance, ties by |dx|
  then sign — not transcribed; see ``_gen_distance_map``).
- ALL FOUR transforms: PREDICTOR (0, the 14 spatial modes with the
  spec's border rules incl. the rightmost-column TR exception), COLOR
  (1, signed int8 cross-channel multipliers, delta = (t*c) >> 5),
  SUBTRACT_GREEN (2) and COLOR_INDEXING (3, incl. sub-byte index
  bundling for palettes <= 16 and subtraction-coded palette deltas).

`encode_webp_lossless` is the matching test-vector generator (like
`encode_png` / FLAC's test encoder): literal pixels with Kraft-complete
two-length prefix codes written through the complex code path, optional
color cache, subtract-green, palette, predictor (any mode layout),
color transform and raw/2D LZ77 — every decoder feature is exercisable
through legal streams.

Conformance is cross-checked against an INDEPENDENT implementation: the
system ``libwebp`` (bound in :mod:`~.webp_sys`) must decode this
encoder's streams to the source pixels, and this decoder must
bit-exactly reproduce libwebp's own decoding of libwebp-ENCODED streams
— which exercise the predictor/color transforms, color cache, meta
groups and 2D distance codes as a real encoder emits them
(tests/test_vp8l.py asserts that coverage via the ``stats`` hooks).
Only lossy VP8 remains out of scope (a full intra-frame DSP decoder);
``multimodal.decode_webp_auto`` routes those to libwebp when present.
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code symbol order (spec section on prefix-code reading)
K_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
                       12, 13, 14, 15]
COLOR_CACHE_MULT = 0x1E35A7BD
NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40


def _gen_distance_map() -> list[tuple[int, int]]:
    """The spec's 120-entry 2D LZ77 neighborhood: EVERY already-decoded
    offset (dx, dy) in the asymmetric window dx in [-7, 8], dy in
    [0, 7] (dy = 0 rows only ahead: dx > 0) — exactly 120 of them, no
    cutoff — ordered by squared Euclidean distance, ties by |dx| then
    positive-dx-first.  Generated from that rule rather than
    transcribed; the rule itself was pinned EMPIRICALLY against the
    system libwebp by probing each of the 120 plane codes in a crafted
    stream of unique pixels and reading back which pixel the copy
    fetched (all 120 match; the naive symmetric-window reading of the
    table differs in the last 24 entries and decodes real streams
    wrong).  tests/test_vp8l.py pins the head rows from the spec's
    printed listing and the full map via libwebp conformance."""
    cands = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(cands) == 120
    return cands


DISTANCE_MAP: list[tuple[int, int]] = _gen_distance_map()
_PLANE_CODE_BY_OFFSET = {off: i + 1 for i, off in enumerate(DISTANCE_MAP)}


def _map_distance(plane: int, width: int) -> int:
    """Distance-plane code -> linear pixel distance (spec: codes <= 120
    index the neighborhood map, larger are raw distance + 120)."""
    if plane > 120:
        return plane - 120
    dx, dy = DISTANCE_MAP[plane - 1]
    return max(1, dy * width + dx)


class BitReader:
    """LSB-first bit reader over bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("vp8l: truncated stream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits: most-significant bit of the code first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

class PrefixCode:
    """Decode table from code lengths (canonical, DEFLATE convention).

    A single nonzero-length symbol is the degenerate zero-bit code (the
    spec's simple form with one symbol); reading it consumes no bits.
    """

    def __init__(self, lengths: list[int]) -> None:
        nz = [(length, sym) for sym, length in enumerate(lengths) if length > 0]
        if not nz:
            raise ValueError("vp8l: empty prefix code")
        if len(nz) == 1:
            self.trivial: int | None = nz[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.trivial = None
        kraft = sum(2.0 ** -length for length, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError(f"vp8l: incomplete prefix code (kraft={kraft})")
        lengths = [0] * (max(sym for _, sym in nz) + 1)
        for length, sym in nz:
            lengths[sym] = length
        self.table = {
            (length, code): sym
            for sym, (code, length) in canonical_codes(lengths).items()
        }
        self.max_len = max(length for length, _ in nz)

    def read(self, br: BitReader) -> int:
        if self.trivial is not None:
            return self.trivial
        code, length = 0, 0
        while length <= self.max_len:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: invalid prefix code bits")


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (encoder side)."""
    nz = sorted((length, sym) for sym, length in enumerate(lengths) if length > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = nz[0][0] if nz else 0
    for length, sym in nz:
        code <<= length - prev_len
        out[sym] = (code, length)
        code += 1
        prev_len = length
    return out


def complete_two_level_lengths(alphabet: int) -> list[int]:
    """Kraft-complete lengths using at most two adjacent code lengths:
    flat log2 for powers of two, else n1 symbols at L and the rest at
    L+1 with ``n1 = 2^(L+1) - alphabet`` (``2^L < alphabet <= 2^(L+1)``)."""
    if alphabet == 1:
        return [1]  # degenerate single-symbol code
    L = (alphabet - 1).bit_length() - 1  # 2^L < alphabet <= 2^(L+1)
    if alphabet == 1 << (L + 1):
        return [L + 1] * alphabet
    n1 = (1 << (L + 1)) - alphabet
    return [L] * n1 + [L + 1] * (alphabet - n1)


def _read_code_lengths(br: BitReader, alphabet: int) -> list[int]:
    """The complex prefix-code form: code-length-code + repeat tokens."""
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[K_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(cl_lengths)
    if br.read(1):  # use max_symbol: token budget
        length_nbits = 2 + 2 * br.read(3)
        max_tokens = 2 + br.read(length_nbits)
    else:
        max_tokens = alphabet
    lengths = [0] * alphabet
    prev_nz = 8
    sym = 0
    while sym < alphabet:
        if max_tokens == 0:
            break
        max_tokens -= 1
        t = cl_code.read(br)
        if t < 16:
            lengths[sym] = t
            sym += 1
            if t:
                prev_nz = t
        elif t == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet:
                    lengths[sym] = prev_nz
                    sym += 1
        elif t == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    return lengths


def read_prefix_code(br: BitReader, alphabet: int) -> PrefixCode:
    if br.read(1):  # simple form
        lengths = [0] * alphabet
        num_symbols = 1 + br.read(1)
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths[s0] = 1
        if num_symbols == 2:
            lengths[br.read(8)] = 1
        else:
            # single symbol: degenerate zero-bit code
            return PrefixCode([1 if i == s0 else 0 for i in range(alphabet)])
        return PrefixCode(lengths)
    return PrefixCode(_read_code_lengths(br, alphabet))


# ---------------------------------------------------------------------------
# LZ77 prefix-coded values (shared by length and distance)
# ---------------------------------------------------------------------------

def prefix_decode_value(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def prefix_encode_value(v: int) -> tuple[int, int, int]:
    """value -> (code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    extra = v.bit_length() - 2
    code = 2 * extra + ((v >> extra) & 1)
    rem = v & ((1 << extra) - 1)
    return code + 2, rem, extra


# ---------------------------------------------------------------------------
# predictor + color transforms (spec: 14 spatial predictors over ARGB with
# mod-256 residuals; signed 8-bit cross-channel multipliers, delta =
# (t * c) >> 5 in two's complement)
# ---------------------------------------------------------------------------

def _add_px2(a: int, b: int) -> int:
    """Packed ARGB + ARGB, per-component mod 256 (no cross-carries)."""
    return ((((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
            | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF))


def _sub_px2(a: int, b: int) -> int:
    """Packed ARGB - ARGB, per-component mod 256 (encoder side)."""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) - ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _avg2(a: int, b: int) -> int:
    """Per-component floor average of two packed ARGB pixels (SWAR)."""
    return (a & b) + (((a ^ b) & 0xFEFEFEFE) >> 1)


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select_predictor(L: int, T: int, TL: int) -> int:
    """Spec Select(): the one of L/T closer (Manhattan over components)
    to the plane estimate L + T - TL."""
    p_l = 0
    p_t = 0
    for sh in (24, 16, 8, 0):
        est = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
        p_l += abs(est - ((L >> sh) & 0xFF))
        p_t += abs(est - ((T >> sh) & 0xFF))
    return L if p_l < p_t else T


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)
                      - ((c >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(a: int, b: int) -> int:
    """Per component: clamp(a + (a - b) / 2), C division (trunc toward
    zero — matters when a < b)."""
    out = 0
    for sh in (24, 16, 8, 0):
        ca = (a >> sh) & 0xFF
        d = ca - ((b >> sh) & 0xFF)
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(ca + half) << sh
    return out


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        return _select_predictor(L, T, TL)
    if mode == 12:
        return _clamp_add_sub_full(L, T, TL)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(L, T), TL)
    raise ValueError(f"vp8l: predictor mode {mode} out of range")


def _predicted(out: np.ndarray, x: int, y: int, w: int,
               modes: np.ndarray, size_bits: int) -> int:
    """Prediction for (x, y) from already-final neighbor pixels in
    ``out``, with the spec's border rules: (0,0) -> opaque black, top
    row -> L, left column -> T, and the rightmost column borrows the
    CURRENT row's leftmost pixel as TR."""
    if x == 0 and y == 0:
        return 0xFF000000
    if y == 0:
        return int(out[y, x - 1])
    if x == 0:
        return int(out[y - 1, x])
    mode = int(modes[y >> size_bits, x >> size_bits])
    L = int(out[y, x - 1])
    T = int(out[y - 1, x])
    TL = int(out[y - 1, x - 1])
    TR = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
    return _predict(mode, L, T, TL, TR)


def _inv_predictor(px: np.ndarray, modes: np.ndarray,
                   size_bits: int) -> np.ndarray:
    """(h, w) uint32 residuals -> pixels.  Inherently sequential (each
    prediction reads finished neighbors), like the other entropy-stage
    loops in this family of decoders (flac.py Rice, jpeg.py Huffman) —
    scalar Python, batched numpy resumes right after."""
    h, w = px.shape
    out = px.copy()
    for y in range(h):
        for x in range(w):
            out[y, x] = _add_px2(
                int(out[y, x]), _predicted(out, x, y, w, modes, size_bits)
            )
    return out


def _s8(v: np.ndarray) -> np.ndarray:
    """uint8-valued int array -> signed two's-complement int8 values."""
    v = v & 0xFF
    return v - ((v >> 7) << 8)


def _inv_color_transform(px: np.ndarray, ctes: np.ndarray,
                         size_bits: int) -> np.ndarray:
    """Inverse cross-channel decorrelation: red += (g2r * green) >> 5,
    blue += (g2b * green) >> 5, then blue += (r2b * NEW red) >> 5 — all
    int8 x int8 with arithmetic shift, per spec.  The multipliers live
    in the cte pixel's blue (g2r) / green (g2b) / red (r2b) channels.
    No neighbor dependencies -> fully vectorized."""
    h, w = px.shape
    cte_px = ctes[
        (np.arange(h) >> size_bits)[:, None], (np.arange(w) >> size_bits)[None, :]
    ].astype(np.int64)
    g2r = _s8(cte_px & 0xFF)
    g2b = _s8((cte_px >> 8) & 0xFF)
    r2b = _s8((cte_px >> 16) & 0xFF)
    p = px.astype(np.int64)
    green_s = _s8((p >> 8) & 0xFF)
    red = (((p >> 16) & 0xFF) + ((g2r * green_s) >> 5)) & 0xFF
    blue = ((p & 0xFF) + ((g2b * green_s) >> 5)
            + ((r2b * _s8(red)) >> 5)) & 0xFF
    return ((p & 0xFF00FF00) | (red << 16) | blue).astype(np.uint32)


def _fwd_color_transform(px: np.ndarray, ctes: np.ndarray,
                         size_bits: int) -> np.ndarray:
    """Encoder side — exact inverse of :func:`_inv_color_transform`
    (r2b applies to the ORIGINAL red, which decode reconstructs first)."""
    h, w = px.shape
    cte_px = ctes[
        (np.arange(h) >> size_bits)[:, None], (np.arange(w) >> size_bits)[None, :]
    ].astype(np.int64)
    g2r = _s8(cte_px & 0xFF)
    g2b = _s8((cte_px >> 8) & 0xFF)
    r2b = _s8((cte_px >> 16) & 0xFF)
    p = px.astype(np.int64)
    green_s = _s8((p >> 8) & 0xFF)
    orig_red = (p >> 16) & 0xFF
    red = (orig_red - ((g2r * green_s) >> 5)) & 0xFF
    blue = ((p & 0xFF) - ((g2b * green_s) >> 5)
            - ((r2b * _s8(orig_red)) >> 5)) & 0xFF
    return ((p & 0xFF00FF00) | (red << 16) | blue).astype(np.uint32)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _read_entropy_coded_image(
    br: BitReader, w: int, h: int, is_main: bool,
    stats: "dict | None" = None,
) -> np.ndarray:
    """Returns (h*w,) uint32 ARGB pixels.  ``stats`` (tests/conformance
    coverage introspection) accumulates counts of 2D-mapped distance
    codes, raw distances, cache hits and meta-group usage."""
    cache_bits = br.read(4) if br.read(1) else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = np.zeros(cache_size, dtype=np.uint32)

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_main and br.read(1):  # meta prefix codes
        meta_bits = 2 + br.read(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _read_entropy_coded_image(br, mw, mh, False, stats)
        # group index = (red << 8) | green
        meta = (((meta_px >> 16) & 0xFF) << 8) | ((meta_px >> 8) & 0xFF)
        meta = meta.reshape(mh, mw)
        n_groups = int(meta.max()) + 1
        if stats is not None:
            stats["meta_groups"] = max(stats.get("meta_groups", 0), n_groups)

    green_alpha = 256 + NUM_LENGTH_CODES + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append((
            read_prefix_code(br, green_alpha),
            read_prefix_code(br, 256),   # red
            read_prefix_code(br, 256),   # blue
            read_prefix_code(br, 256),   # alpha
            read_prefix_code(br, NUM_DISTANCE_CODES),
        ))

    n = w * h
    px = np.zeros(n, dtype=np.uint32)
    pos = 0
    shift = 32 - cache_bits if cache_bits else 0

    def insert(p: int) -> None:
        if cache_size:
            cache[(p * COLOR_CACHE_MULT & 0xFFFFFFFF) >> shift] = p

    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            p = (alpha << 24) | (red << 16) | (s << 8) | blue
            px[pos] = p
            insert(p)
            pos += 1
        elif s < 256 + NUM_LENGTH_CODES:
            length = prefix_decode_value(s - 256, br)
            plane = prefix_decode_value(g[4].read(br), br)
            dist = _map_distance(plane, w)
            if stats is not None:
                key = "dist_2d" if plane <= 120 else "dist_raw"
                stats[key] = stats.get(key, 0) + 1
            if dist > pos or pos + length > n:
                raise ValueError("vp8l: backref out of range")
            for _ in range(length):
                p = int(px[pos - dist])
                px[pos] = p
                insert(p)
                pos += 1
        else:
            if stats is not None:
                stats["cache_hits"] = stats.get("cache_hits", 0) + 1
            px[pos] = cache[s - 256 - NUM_LENGTH_CODES]
            pos += 1
    return px


def decode_vp8l_stream(data: bytes, stats: "dict | None" = None) -> np.ndarray:
    """Raw VP8L stream (starting at the 0x2F signature) -> (h, w, 4)
    uint8 RGBA.  ``stats`` collects feature-coverage counters (see
    _read_entropy_coded_image) plus the set of transform names seen."""
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature")
    br = BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unknown version")

    transforms = []  # inverses applied in reverse read order after decode
    palette = None
    dec_w = w
    seen_types: set[int] = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen_types:
            raise ValueError("vp8l: transform type repeated")
        seen_types.add(ttype)
        if stats is not None:
            stats.setdefault("transforms", set()).add(
                ("predictor", "color", "subtract_green", "color_index")[ttype]
            )
        if ttype == 0:  # predictor
            size_bits = 2 + br.read(3)
            bw_ = (dec_w + (1 << size_bits) - 1) >> size_bits
            bh_ = (h + (1 << size_bits) - 1) >> size_bits
            sub = _read_entropy_coded_image(br, bw_, bh_, False, stats)
            modes = ((sub >> 8) & 0xFF).reshape(bh_, bw_)
            transforms.append(("predictor", (modes, size_bits, dec_w)))
        elif ttype == 1:  # color (cross-channel) transform
            size_bits = 2 + br.read(3)
            bw_ = (dec_w + (1 << size_bits) - 1) >> size_bits
            bh_ = (h + (1 << size_bits) - 1) >> size_bits
            sub = _read_entropy_coded_image(br, bw_, bh_, False, stats)
            transforms.append(("color", (sub.reshape(bh_, bw_), size_bits, dec_w)))
        elif ttype == 2:
            transforms.append(("subtract_green", None))
        else:  # color indexing
            n_colors = 1 + br.read(8)
            pal_px = _read_entropy_coded_image(br, n_colors, 1, False, stats)
            # palette entries are subtraction-coded component-wise
            a = (pal_px >> 24) & 0xFF
            r = (pal_px >> 16) & 0xFF
            g = (pal_px >> 8) & 0xFF
            b = pal_px & 0xFF
            pal = np.stack(
                [np.cumsum(a, dtype=np.uint64) & 0xFF,
                 np.cumsum(r, dtype=np.uint64) & 0xFF,
                 np.cumsum(g, dtype=np.uint64) & 0xFF,
                 np.cumsum(b, dtype=np.uint64) & 0xFF], axis=1
            ).astype(np.uint8)  # (n_colors, ARGB)
            width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                          else 1 if n_colors <= 16 else 0)
            transforms.append(("color_index", (pal, width_bits)))
            palette = pal
            dec_w = (w + (1 << width_bits) - 1) >> width_bits

    px = _read_entropy_coded_image(br, dec_w, h, True, stats).reshape(h, dec_w)

    for name, arg in reversed(transforms):
        if name == "predictor":
            modes, size_bits, tw = arg
            if px.shape[1] != tw:  # can't happen in a legal stream
                raise ValueError("vp8l: predictor width mismatch")
            px = _inv_predictor(px, modes, size_bits)
        elif name == "color":
            ctes, size_bits, tw = arg
            if px.shape[1] != tw:
                raise ValueError("vp8l: color-transform width mismatch")
            px = _inv_color_transform(px, ctes, size_bits)
        elif name == "subtract_green":
            g = (px >> 8) & 0xFF
            r = ((px >> 16) & 0xFF) + g
            b = (px & 0xFF) + g
            px = (px & 0xFF00FF00) | ((r & 0xFF) << 16) | (b & 0xFF)
        else:
            pal, width_bits = arg
            if width_bits:
                per = 1 << width_bits          # indices per packed pixel
                ibits = 8 >> width_bits        # bits per index
                greens = ((px >> 8) & 0xFF).astype(np.uint32)  # (h, dec_w)
                xs = np.arange(w)
                packed = greens[:, xs >> width_bits]
                sh = (xs & (per - 1)) * ibits
                idx = (packed >> sh[None, :]) & ((1 << ibits) - 1)
            else:
                idx = (px >> 8) & 0xFF
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("vp8l: palette index out of range")
            argb = pal[idx]  # (h, w, 4) ARGB uint8
            px = ((argb[..., 0].astype(np.uint32) << 24)
                  | (argb[..., 1].astype(np.uint32) << 16)
                  | (argb[..., 2].astype(np.uint32) << 8)
                  | argb[..., 3])

    out = np.zeros((h, w, 4), dtype=np.uint8)
    out[..., 0] = (px >> 16) & 0xFF  # R
    out[..., 1] = (px >> 8) & 0xFF   # G
    out[..., 2] = px & 0xFF          # B
    out[..., 3] = (px >> 24) & 0xFF  # A
    return out


def decode_webp(data: bytes, stats: "dict | None" = None) -> np.ndarray:
    """WebP container -> (h, w, 3) uint8 RGB (multimodal registry
    contract).  Lossless (VP8L) only; lossy VP8 raises
    NotImplementedError (full VP8 intra decoder, out of scope —
    multimodal.decode_webp_auto falls through to a system libwebp when
    one exists)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    off = 12
    while off + 8 <= len(data):
        fourcc = data[off:off + 4]
        size = struct.unpack("<I", data[off + 4:off + 8])[0]
        payload = data[off + 8:off + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l_stream(payload, stats)[..., :3]
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "webp: lossy VP8 needs a full VP8 intra-frame decoder"
            )
        off += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L/VP8 chunk")


# ---------------------------------------------------------------------------
# test-vector encoder
# ---------------------------------------------------------------------------

def _write_prefix_code_complex(bw: BitWriter, lengths: list[int]) -> dict:
    """Write lengths through the complex path (code-length-code with 1-bit
    codes over the <= 2 distinct nonzero lengths in use) and return the
    canonical symbol->(code,len) map."""
    used = sorted({length for length in lengths if length > 0})
    assert 1 <= len(used) <= 2, "encoder restriction: <= 2 code lengths"
    cl_syms = used if len(used) == 2 else [used[0], 0]
    max_idx = max(K_CODE_LENGTH_ORDER.index(s) for s in cl_syms)
    num_codes = max_idx + 1
    bw.write(0, 1)  # complex form
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        sym = K_CODE_LENGTH_ORDER[i]
        bw.write(1 if sym in cl_syms else 0, 3)
    bw.write(0, 1)  # no max_symbol
    cl_lengths = [0] * 19
    for s in cl_syms:
        cl_lengths[s] = 1
    cl_map = canonical_codes(cl_lengths)
    for length in lengths:
        code, ln = cl_map[length]
        bw.write_code(code, ln)
    return canonical_codes(lengths)


def _write_prefix_code_single(bw: BitWriter, symbol: int) -> None:
    """Simple form, one symbol (zero-bit degenerate code)."""
    bw.write(1, 1)          # simple
    bw.write(0, 1)          # num_symbols - 1 = 0
    bw.write(1, 1)          # first symbol in 8 bits
    bw.write(symbol, 8)


def _fwd_predictor(px2d: np.ndarray, modes: np.ndarray,
                   size_bits: int) -> np.ndarray:
    """Encoder side of the predictor transform: residual = pixel - pred,
    where pred reads the ORIGINAL neighbors (what decode reconstructs)."""
    h, w = px2d.shape
    out = np.empty_like(px2d)
    for y in range(h):
        for x in range(w):
            out[y, x] = _sub_px2(
                int(px2d[y, x]), _predicted(px2d, x, y, w, modes, size_bits)
            )
    return out


def _encode_distance(dist: int, width: int) -> int:
    """Linear distance -> plane code (2D-mapped when the offset is in
    the 120-entry neighborhood, else raw dist + 120)."""
    dy = dist // width if width else 0
    for dxdy in ((dist - dy * width, dy), (dist - (dy + 1) * width, dy + 1)):
        code = _PLANE_CODE_BY_OFFSET.get(dxdy)
        if code is not None:
            return code
    return dist + 120


def _block_grid(value, h: int, w: int, size_bits: int) -> np.ndarray:
    """Scalar-or-array -> (ceil(h/bs), ceil(w/bs)) uint32 block image."""
    bh = (h + (1 << size_bits) - 1) >> size_bits
    bw_ = (w + (1 << size_bits) - 1) >> size_bits
    if isinstance(value, np.ndarray):
        assert value.shape == (bh, bw_), "block image shape mismatch"
        return value.astype(np.uint32)
    return np.full((bh, bw_), value, np.uint32)


def encode_webp_lossless(
    img: np.ndarray,
    use_cache_bits: int = 0,
    subtract_green: bool = False,
    palette: bool = False,
    lz77: bool = False,
    predictor: "int | np.ndarray | None" = None,
    predictor_bits: int = 4,
    color: "tuple[int, int, int] | np.ndarray | None" = None,
    color_bits: int = 4,
    lz77_2d: bool = False,
) -> bytes:
    """(h, w, 3|4) uint8 -> legal WebP/VP8L bytes (literal pixels,
    Kraft-complete two-length codes; the flags turn on the optional
    decoder features to exercise them in tests).  ``lz77`` run-length
    compresses horizontal repeats with raw (plane > 120) distance 1;
    ``lz77_2d`` additionally emits previous-row copies through the
    120-entry 2D distance map.  ``predictor`` is a mode (0-13) or a
    per-block mode image at ``predictor_bits``; ``color`` is a
    (green_to_red, green_to_blue, red_to_blue) signed-multiplier tuple
    or a packed per-block cte image at ``color_bits``.  Forward
    application (and stream header) order: subtract_green -> color ->
    predictor; palette excludes the three."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[2] == 3:
        alpha = np.full((h, w), 255, np.uint8)
        img = np.dstack([img, alpha])

    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (img[..., 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version

    argb = ((img[..., 3].astype(np.uint32) << 24)
            | (img[..., 0].astype(np.uint32) << 16)
            | (img[..., 1].astype(np.uint32) << 8)
            | img[..., 2].astype(np.uint32))

    enc_w = w
    if palette:
        assert predictor is None and color is None and not subtract_green, (
            "palette excludes the pixel-space transforms in this encoder"
        )
    if palette:
        flat = argb.reshape(-1)
        colors, inverse = np.unique(flat, return_inverse=True)
        assert len(colors) <= 256, "palette encoder: > 256 colors"
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # color indexing
        bw.write(len(colors) - 1, 8)
        # palette as 1 x n entropy image, subtraction-coded
        deltas = np.zeros(len(colors), np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            d = 0
            for sh in (24, 16, 8, 0):
                d |= ((int(c >> sh) - int(prev >> sh)) & 0xFF) << sh
            deltas[i] = d
            prev = int(c)
        _encode_literal_image(bw, deltas, cache_bits=0, is_main=False)
        width_bits = (3 if len(colors) <= 2 else 2 if len(colors) <= 4
                      else 1 if len(colors) <= 16 else 0)
        idx = inverse.reshape(h, w).astype(np.uint32)
        if width_bits:
            per = 1 << width_bits
            ibits = 8 >> width_bits
            enc_w = (w + per - 1) >> width_bits
            packed = np.zeros((h, enc_w), np.uint32)
            for x in range(w):
                packed[:, x >> width_bits] |= idx[:, x] << ((x & (per - 1)) * ibits)
            argb = 0xFF000000 | (packed << 8)
        else:
            argb = 0xFF000000 | (idx << 8)
        argb = argb.reshape(h, enc_w)
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)  # subtract green
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) - g) & 0xFF
            b = ((argb & 0xFF) - g) & 0xFF
            argb = (argb & 0xFF00FF00) | (r << 16) | b
        if color is not None:
            if not isinstance(color, np.ndarray):
                g2r, g2b, r2b = color
                color = np.uint32(
                    0xFF000000 | ((r2b & 0xFF) << 16)
                    | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
                )
            ctes = _block_grid(color, h, w, color_bits)
            bw.write(1, 1)
            bw.write(1, 2)  # color transform
            bw.write(color_bits - 2, 3)
            _encode_literal_image(bw, ctes.reshape(-1), cache_bits=0,
                                  is_main=False)
            argb = _fwd_color_transform(argb, ctes, color_bits)
        if predictor is not None:
            modes = _block_grid(predictor, h, w, predictor_bits)
            bw.write(1, 1)
            bw.write(0, 2)  # predictor transform
            bw.write(predictor_bits - 2, 3)
            _encode_literal_image(
                bw, (0xFF000000 | (modes << 8)).reshape(-1),
                cache_bits=0, is_main=False,
            )
            argb = _fwd_predictor(argb, modes, predictor_bits)
    bw.write(0, 1)  # no more transforms

    _encode_literal_image(bw, argb.reshape(-1), cache_bits=use_cache_bits,
                          lz77=lz77 or lz77_2d, width=enc_w,
                          lz77_2d=lz77_2d)

    payload = bytes([0x2F]) + bw.tobytes()
    body = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _encode_literal_image(
    bw: BitWriter, pixels: np.ndarray, cache_bits: int,
    lz77: bool = False, is_main: bool = True,
    width: int = 0, lz77_2d: bool = False,
) -> None:
    """One prefix-code group, literal pixels (+ optional cache hits and
    distance-1 runs); Kraft-complete two-length codes on every channel.
    Only the main image's grammar carries the meta-prefix bit.
    ``lz77_2d`` (needs ``width``) emits previous-row copy runs via the
    2D distance map and routes every distance through
    :func:`_encode_distance`."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_main:
        bw.write(0, 1)  # no meta prefix codes

    green_alpha = 256 + NUM_LENGTH_CODES + cache_size
    g_map = _write_prefix_code_complex(bw, complete_two_level_lengths(green_alpha))
    r_map = _write_prefix_code_complex(bw, complete_two_level_lengths(256))
    b_map = _write_prefix_code_complex(bw, complete_two_level_lengths(256))
    a_map = _write_prefix_code_complex(bw, complete_two_level_lengths(256))
    if lz77:
        d_map = _write_prefix_code_complex(
            bw, complete_two_level_lengths(NUM_DISTANCE_CODES))
    else:
        _write_prefix_code_single(bw, 0)
        d_map = None

    cache = np.zeros(cache_size, dtype=np.uint32)
    shift = 32 - cache_bits if cache_bits else 0
    n = len(pixels)
    pos = 0
    while pos < n:
        p = int(pixels[pos])
        if cache_size:
            ci = (p * COLOR_CACHE_MULT & 0xFFFFFFFF) >> shift
            if cache[ci] == p and pos > 0:
                code, ln = g_map[256 + NUM_LENGTH_CODES + ci]
                bw.write_code(code, ln)
                pos += 1
                continue
        run = 0
        dist = 1
        if lz77 and pos > 0 and p == int(pixels[pos - 1]):
            while pos + run < n and int(pixels[pos + run]) == p:
                run += 1
        if lz77_2d and run < 3 and pos >= width > 0:
            # previous-row copy (vertical match), the classic 2D ref
            vrun = 0
            while (pos + vrun < n
                   and int(pixels[pos + vrun]) == int(pixels[pos + vrun - width])):
                vrun += 1
            if vrun >= 3:
                run, dist = vrun, width
        if run >= 3:
            lcode, lextra, lbits = prefix_encode_value(run)
            code, ln = g_map[256 + lcode]
            bw.write_code(code, ln)
            bw.write(lextra, lbits)
            plane = (_encode_distance(dist, width) if lz77_2d
                     else dist + 120)
            dcode, dextra, dbits = prefix_encode_value(plane)
            code, ln = d_map[dcode]
            bw.write_code(code, ln)
            bw.write(dextra, dbits)
            if cache_size:
                for k in range(run):  # decoder caches every copied pixel
                    v = int(pixels[pos + k])
                    cache[(v * COLOR_CACHE_MULT & 0xFFFFFFFF) >> shift] = v
            pos += run
            continue
        g = (p >> 8) & 0xFF
        code, ln = g_map[g]
        bw.write_code(code, ln)
        code, ln = r_map[(p >> 16) & 0xFF]
        bw.write_code(code, ln)
        code, ln = b_map[p & 0xFF]
        bw.write_code(code, ln)
        code, ln = a_map[(p >> 24) & 0xFF]
        bw.write_code(code, ln)
        if cache_size:
            cache[(p * COLOR_CACHE_MULT & 0xFFFFFFFF) >> shift] = p
        pos += 1

"""REAL dependency-free WebP-lossless (VP8L) codec subset.

Decoder: the published VP8L bitstream — LSB-first bit reading,
simple AND normal (code-length-coded, DEFLATE-style canonical)
prefix codes for all five alphabets, literal ARGB pixels, LZ77
backward references with prefix-coded length/distance extra bits
(linear distance codes; the 120 2D-neighbor codes are parsed but
rejected as out of tier rather than guessed), the color cache
(0x1e35a7bd multiplier hash, updated on every emitted pixel), the
ENTROPY IMAGE (meta prefix codes selecting one of N code groups per
2^bits block), the SUBTRACT_GREEN transform, the COLOR_INDEXING
(palette) transform including small-palette PIXEL BUNDLING (<=16
colors pack 2/4/8 indices per coded green byte; the palette travels
as a delta-coded entropy sub-image, per spec), the cross-component
COLOR transform (green_to_red / green_to_blue / red_to_blue elements
in a per-block sub-image), and the PREDICTOR transform with the FULL
mode set 0-13 (floor averages, spec Select tie-break ``pL < pT``,
ClampAddSubtractFull/Half, the rightmost-column TR wrap quirk) with
a real per-block mode sub-image (spec edge rules). Out of tier
(returns ``None``): the 2D distance map and multi-transform CHAINS
(each transform decodes alone) — their header bits are parsed and
rejected explicitly, never misread.

Encoder: emits the same subset — any single transform (subtract-
green, palette incl. bundled tiers, full-mode-cycle predictor,
color), an optional checkerboard entropy image, distance-1 run
backrefs for horizontal runs (linear distance code 121, capped at
the length-symbol-23 maximum 4096), optional color cache, canonical
prefix codes written through the code-length code (zero runs via
symbols 17/18). VP8L is lossless, so round trips are bit-exact by
construction and the SQL oracle can pin decoded pixel sums in closed
form, like the other in-repo codecs (PNG/GIF/BMP/JPEG).

Spec: "WebP Lossless Bitstream Specification" (Google, public).
Canonical code assignment follows the spec's DEFLATE convention:
codes ordered by (length, symbol), transmitted most-significant code
bit first inside the LSB-first byte stream.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_HASH_MUL = 0x1E35A7BD

# spec order for the 19 code-length-code lengths
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15]


class _LsbBitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise EOFError("vp8l bitstream exhausted")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        out = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.n -= nbits
        return out


class _LsbBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc |= (val & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple]:
    """symbol -> (code, length), canonical by (length, symbol)."""
    codes: dict[int, tuple] = {}
    code = 0
    prev_len = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= (ln - prev_len)
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _PrefixCode:
    """Decode side: walk-accumulated canonical code matching."""

    def __init__(self, lengths: dict[int, int]):
        if not lengths:
            raise ValueError("empty prefix code")
        if len(lengths) == 1:
            # degenerate: a single symbol consumes ZERO bits
            self.single: Optional[int] = next(iter(lengths))
            self.table: dict = {}
            return
        self.single = None
        self.table = {(ln, code): sym for sym, (code, ln)
                      in _canonical_codes(lengths).items()}
        # completeness check (kraft sum == 1) — hostile streams with
        # over/under-subscribed codes must fail loudly, not misdecode
        if sum(1 / (1 << ln) for ln in lengths.values()) != 1.0:
            raise ValueError("incomplete prefix code")

    def decode(self, rd: _LsbBitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | rd.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid vp8l prefix code")


def _read_prefix_code(rd: _LsbBitReader, alphabet: int) -> _PrefixCode:
    if rd.read(1):                               # simple code
        n_sym = rd.read(1) + 1
        if rd.read(1):                           # first symbol 8 bits
            first = rd.read(8)
        else:
            first = rd.read(1)
        lengths = {first: 1}
        if n_sym == 2:
            second = rd.read(8)
            if second == first:
                raise ValueError("duplicate simple symbols")
            lengths[second] = 1
        else:
            return _PrefixCode({first: 0})       # zero-bit single
        return _PrefixCode(lengths)
    # normal: code-length code first
    n_clc = rd.read(4) + 4
    clc_lengths: dict[int, int] = {}
    for i in range(n_clc):
        ln = rd.read(3)
        if ln:
            clc_lengths[_CLC_ORDER[i]] = ln
    clc = _PrefixCode(clc_lengths)
    if rd.read(1):                               # bounded max_symbol
        length_nbits = 2 + 2 * rd.read(3)
        max_symbol = 2 + rd.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = {}
    sym = 0
    prev = 8
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = clc.decode(rd)
        if cl < 16:
            if cl:
                lengths[sym] = cl
                prev = cl
            sym += 1
        elif cl == 16:
            rep = 3 + rd.read(2)
            for _ in range(rep):
                if sym < alphabet:
                    lengths[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + rd.read(3)
        else:                                    # 18
            sym += 11 + rd.read(7)
    return _PrefixCode(lengths)


def _prefix_coded_value(rd: _LsbBitReader, sym: int) -> int:
    """LZ77 length/distance prefix decoding (spec 4.2.1.1)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + rd.read(extra) + 1


def _prefix_code_for_value(v: int) -> tuple:
    """Inverse of :func:`_prefix_coded_value`: (symbol, extra, nbits)."""
    if v <= 4:
        return v - 1, 0, 0
    extra_bits = (v - 1).bit_length() - 2
    base = v - 1 - (1 << (extra_bits + 1))
    if base < (1 << extra_bits):
        return 2 * extra_bits + 2, base, extra_bits
    return 2 * extra_bits + 3, base - (1 << extra_bits), extra_bits


def decode_vp8l(payload: bytes) -> Optional[np.ndarray]:
    """VP8L chunk payload -> (h, w, 4) uint8 RGBA, or ``None`` outside
    the documented tier (transforms, entropy image, 2D distance
    codes) or on truncated/hostile bytes."""
    try:
        return _decode_vp8l(payload)
    except (EOFError, ValueError, KeyError, IndexError,
            OverflowError):
        return None


def _decode_image_stream(rd: _LsbBitReader, w: int, h: int,
                         level0: bool) -> Optional[np.ndarray]:
    """One VP8L entropy-coded image (spec DecodeImageStream): the
    entropy image (meta prefix codes) exists only at level 0 —
    ``spatially-coded-image = color-cache-info meta-prefix data`` per
    the spec ABNF — and selects one of N prefix-code GROUPS per
    ``2^bits`` block; transform sub-images (e.g. the palette) recurse
    here with ``level0=False``. Returns the flat uint32 ARGB array or
    ``None`` for out-of-tier features."""
    cache_bits = 0
    if rd.read(1):                               # color cache
        cache_bits = rd.read(4)
        if not 1 <= cache_bits <= 11:
            return None
    meta_idx = None
    meta_bits = 0
    n_groups = 1
    if level0 and rd.read(1):                    # entropy image
        meta_bits = rd.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        mimg = _decode_image_stream(rd, mw, mh, level0=False)
        if mimg is None:
            return None
        # meta prefix index = (red << 8) | green, per spec
        meta_idx = ((mimg >> 8) & 0xFFFF).astype(np.int64).reshape(
            mh, mw)
        n_groups = int(meta_idx.max(initial=0)) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups: list[tuple] = []
    for _ in range(n_groups):
        green = _read_prefix_code(rd, 256 + 24 + cache_size)
        red = _read_prefix_code(rd, 256)
        blue = _read_prefix_code(rd, 256)
        alpha = _read_prefix_code(rd, 256)
        dist = _read_prefix_code(rd, 40)
        groups.append((green, red, blue, alpha, dist))

    n_px = w * h
    argb = np.zeros(n_px, np.uint32)
    cache = np.zeros(cache_size, np.uint32) if cache_size else None
    i = 0

    def push_cache(px: int) -> None:
        if cache is not None:
            cache[((_HASH_MUL * px) & 0xFFFFFFFF)
                  >> (32 - cache_bits)] = px

    green, red, blue, alpha, dist = groups[0]
    while i < n_px:
        if meta_idx is not None:
            gi = meta_idx[(i // w) >> meta_bits, (i % w) >> meta_bits]
            green, red, blue, alpha, dist = groups[gi]
        sym = green.decode(rd)
        if sym < 256:
            g = sym
            r = red.decode(rd)
            b = blue.decode(rd)
            a = alpha.decode(rd)
            px = (a << 24) | (r << 16) | (g << 8) | b
            argb[i] = px
            push_cache(px)
            i += 1
        elif sym < 256 + 24:
            length = _prefix_coded_value(rd, sym - 256)
            dsym = dist.decode(rd)
            dcode = _prefix_coded_value(rd, dsym)
            if dcode <= 120:                     # 2D map: out of tier
                return None
            d = dcode - 120
            if d < 1 or d > i:
                raise ValueError("bad backref distance")
            for _ in range(length):
                if i >= n_px:
                    raise ValueError("backref past image end")
                px = int(argb[i - d])
                argb[i] = px
                push_cache(px)
                i += 1
        else:                                    # color cache hit
            if cache is None:
                raise ValueError("cache symbol without cache")
            argb[i] = cache[sym - 256 - 24]
            i += 1
    return argb


def _unpack_px(px: int) -> np.ndarray:
    return np.asarray([(px >> 24) & 0xFF, (px >> 16) & 0xFF,
                       (px >> 8) & 0xFF, px & 0xFF], np.int64)


def _pack_px(c: np.ndarray) -> int:
    c = c & 0xFF
    return (int(c[0]) << 24) | (int(c[1]) << 16) \
        | (int(c[2]) << 8) | int(c[3])


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a + b) >> 1


def _predict_px(get, y: int, x: int, m: int, w: int) -> np.ndarray:
    """Spec predictor P(m) for pixel (y, x) from already-final
    neighbor pixels (``get(yy, xx)`` -> int64[4] ARGB components).
    Full mode set 0-13 per the published VP8L spec pseudocode:
    averages floor per component; Select picks L when its Manhattan
    distance to the L+T-TL estimate is strictly smaller (ties -> T,
    matching the spec's ``pL < pT``); ClampAddSubtractHalf truncates
    ``(a - b) / 2`` toward zero (C semantics). TR on the rightmost
    column reads the linear pixel buffer one past the row end — i.e.
    the CURRENT row's first pixel (the spec's scanline-order quirk)."""
    if m == 0:
        return np.asarray([255, 0, 0, 0], np.int64)
    L = get(y, x - 1)
    if m == 1:
        return L
    T = get(y - 1, x)
    if m == 2:
        return T
    if m == 7:
        return _avg2(L, T)
    TL = get(y - 1, x - 1)
    if m == 4:
        return TL
    if m in (3, 5, 9, 10):
        TR = get(y - 1, x + 1) if x + 1 < w else get(y, 0)
        if m == 3:
            return TR
        if m == 5:
            return _avg2(_avg2(L, TR), T)
        if m == 9:
            return _avg2(T, TR)
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if m == 6:
        return _avg2(L, TL)
    if m == 8:
        return _avg2(TL, T)
    if m == 11:                                  # Select
        p = L + T - TL
        pL = int(np.abs(p - L).sum())
        pT = int(np.abs(p - T).sum())
        return L if pL < pT else T
    if m == 12:                                  # ClampAddSubtractFull
        return np.clip(L + T - TL, 0, 255)
    if m == 13:                                  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        d = ave - TL
        half = np.where(d >= 0, d >> 1, -((-d) >> 1))  # trunc toward 0
        return np.clip(ave + half, 0, 255)
    raise ValueError(f"predictor mode {m} out of range")


def _predictor_pass(argb: np.ndarray, w: int, h: int, block_bits: int,
                    modes: np.ndarray, *, inverse: bool) -> np.ndarray:
    """Shared forward/inverse PREDICTOR pass: each coded pixel is a
    componentwise mod-256 delta from its prediction. Edge rules per
    spec: (0,0) predicts 0xff000000, the rest of row 0 predicts L,
    column 0 predicts T. The inverse predicts from RECONSTRUCTED
    pixels; the forward predicts from the originals — deltas are
    exact mod 256, so the round trip is bit-exact."""
    src = argb.astype(np.int64).reshape(h, w)
    out = src.copy()
    ref = out if inverse else src                # prediction source

    def get(yy: int, xx: int) -> np.ndarray:
        return _unpack_px(int(ref[yy, xx]))

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                m = 0
            elif y == 0:
                m = 1
            elif x == 0:
                m = 2
            else:
                m = int(modes[y >> block_bits, x >> block_bits])
            pred = _predict_px(get, y, x, m, w)
            cur = _unpack_px(int(src[y, x]))
            out[y, x] = _pack_px(cur + pred if inverse else cur - pred)
    return out.reshape(-1).astype(np.uint32)


def _inverse_predictor(argb: np.ndarray, w: int, h: int,
                       block_bits: int, modes: np.ndarray
                       ) -> np.ndarray:
    return _predictor_pass(argb, w, h, block_bits, modes, inverse=True)


def _forward_predictor(argb: np.ndarray, w: int, h: int,
                       block_bits: int, modes: np.ndarray
                       ) -> np.ndarray:
    return _predictor_pass(argb, w, h, block_bits, modes, inverse=False)


def _ctd(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Spec ColorTransformDelta: ``(int8(t) * int8(c)) >> 5`` with an
    arithmetic shift (numpy ``>>`` on int64 is arithmetic)."""
    t8 = np.where(t >= 128, t - 256, t)
    c8 = np.where(c >= 128, c - 256, c)
    return (t8 * c8) >> 5


def _color_transform(argb: np.ndarray, w: int, h: int,
                     block_bits: int, g2r: np.ndarray,
                     g2b: np.ndarray, r2b: np.ndarray, *,
                     inverse: bool) -> np.ndarray:
    """COLOR transform, both directions — pointwise (unlike the
    predictor there is no sequential dependency, so it vectorizes).
    Inverse per spec pseudocode: ``red += ctd(g2r, green)``, ``blue +=
    ctd(g2b, green) + ctd(r2b, red_after)`` (the r2b term reads the
    RECONSTRUCTED red byte); the forward direction subtracts, feeding
    r2b the ORIGINAL red — which equals the inverse's reconstructed
    value, so round trips are bit-exact mod 256."""
    px = argb.reshape(h, w)
    ys = (np.arange(h, dtype=np.int64) >> block_bits)[:, None]
    xs = (np.arange(w, dtype=np.int64) >> block_bits)[None, :]
    tg2r, tg2b, tr2b = g2r[ys, xs], g2b[ys, xs], r2b[ys, xs]
    g = ((px >> 8) & 0xFF).astype(np.int64)
    r = ((px >> 16) & 0xFF).astype(np.int64)
    b = (px & 0xFF).astype(np.int64)
    if inverse:
        r = (r + _ctd(tg2r, g)) & 0xFF
        b = (b + _ctd(tg2b, g) + _ctd(tr2b, r)) & 0xFF
    else:
        b = (b - _ctd(tg2b, g) - _ctd(tr2b, r)) & 0xFF
        r = (r - _ctd(tg2r, g)) & 0xFF
    out = (px & np.uint32(0xFF00FF00)) \
        | (r.astype(np.uint32) << 16) | b.astype(np.uint32)
    return out.reshape(-1).astype(np.uint32)


def _decode_vp8l(payload: bytes) -> Optional[np.ndarray]:
    if len(payload) < 5 or payload[0] != 0x2F:
        return None
    rd = _LsbBitReader(payload[1:])
    w = rd.read(14) + 1
    h = rd.read(14) + 1
    rd.read(1)                                   # alpha hint
    if rd.read(3) != 0:                          # version
        return None
    subtract_green = False
    palette: Optional[np.ndarray] = None
    pal_bits = 0
    predictor: Optional[tuple] = None            # (block_bits, modes)
    color_tf: Optional[tuple] = None             # (bits, g2r, g2b, r2b)
    while rd.read(1):                            # transform list
        ttype = rd.read(2)
        if ttype == 0:                           # PREDICTOR
            if predictor or subtract_green or palette is not None \
                    or color_tf is not None:
                return None                      # combos: out of tier
            block_bits = rd.read(3) + 2
            bw_blocks = (w + (1 << block_bits) - 1) >> block_bits
            bh_blocks = (h + (1 << block_bits) - 1) >> block_bits
            mimg = _decode_image_stream(rd, bw_blocks, bh_blocks,
                                        level0=False)
            if mimg is None:
                return None
            modes = ((mimg >> 8) & 0xFF).reshape(bh_blocks, bw_blocks)
            if int(modes.max(initial=0)) > 13:
                return None      # modes 14-255 are invalid per spec
            predictor = (block_bits, modes.astype(np.int64))
            continue
        if ttype == 1:                           # COLOR (cross-comp.)
            if predictor or subtract_green or palette is not None \
                    or color_tf is not None:
                return None                      # combos: out of tier
            block_bits = rd.read(3) + 2
            bw_blocks = (w + (1 << block_bits) - 1) >> block_bits
            bh_blocks = (h + (1 << block_bits) - 1) >> block_bits
            cimg = _decode_image_stream(rd, bw_blocks, bh_blocks,
                                        level0=False)
            if cimg is None:
                return None
            cimg = cimg.reshape(bh_blocks, bw_blocks)
            # spec element packing: green_to_red in the BLUE byte,
            # green_to_blue in GREEN, red_to_blue in RED
            color_tf = (block_bits,
                        (cimg & 0xFF).astype(np.int64),
                        ((cimg >> 8) & 0xFF).astype(np.int64),
                        ((cimg >> 16) & 0xFF).astype(np.int64))
            continue
        if ttype == 2:                           # SUBTRACT_GREEN
            if subtract_green:
                return None                      # duplicate transform
            subtract_green = True
            continue
        if ttype == 3:                           # COLOR_INDEXING
            if palette is not None or subtract_green \
                    or predictor is not None:
                return None      # combinations: out of tier
            size = rd.read(8) + 1
            # small palettes BUNDLE multiple pixel indices into one
            # green byte: <=2 colors -> 8 px/byte, <=4 -> 4, <=16 -> 2
            pal_bits = 3 if size <= 2 else 2 if size <= 4 \
                else 1 if size <= 16 else 0
            deltas = _decode_image_stream(rd, size, 1, level0=False)
            if deltas is None:
                return None
            # componentwise cumulative sum (entry 0 as coded)
            pal = np.zeros((size, 4), np.uint16)
            pal[:, 0] = (deltas >> 24) & 0xFF
            pal[:, 1] = (deltas >> 16) & 0xFF
            pal[:, 2] = (deltas >> 8) & 0xFF
            pal[:, 3] = deltas & 0xFF
            palette = np.cumsum(pal, axis=0).astype(np.uint16) & 0xFF
            continue
        return None             # predictor/color: out of tier

    # a bundling palette shrinks the CODED image width
    iw = ((w + (1 << pal_bits) - 1) >> pal_bits) \
        if palette is not None and pal_bits else w
    argb = _decode_image_stream(rd, iw, h, level0=True)
    if argb is None:
        return None
    if predictor is not None:
        argb = _inverse_predictor(argb, iw, h, *predictor)
    if color_tf is not None:
        argb = _color_transform(argb, w, h, *color_tf, inverse=True)
    if palette is not None and pal_bits:
        # unbundle: pixel x reads (8 >> pal_bits) bits at offset
        # (x % per_byte) * bpp inside packed green byte x >> pal_bits
        bpp = 8 >> pal_bits
        packed_g = ((argb.reshape(h, iw) >> 8) & 0xFF).astype(np.int64)
        xs = np.arange(w, dtype=np.int64)
        shift = ((xs & ((1 << pal_bits) - 1)) * bpp)[None, :]
        idx = (packed_g[:, xs >> pal_bits] >> shift) & ((1 << bpp) - 1)
        argb = (0xFF000000 | (idx.astype(np.uint32) << 8)).reshape(-1)
    flat = argb.reshape(h, w)
    g = ((flat >> 8) & 0xFF).astype(np.uint16)
    r = ((flat >> 16) & 0xFF).astype(np.uint16)
    b = (flat & 0xFF).astype(np.uint16)
    a = ((flat >> 24) & 0xFF).astype(np.uint16)
    if palette is not None:                      # inverse indexing
        if int(g.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        a = palette[g, 0]
        r = palette[g, 1]
        gg = palette[g, 2]
        b = palette[g, 3]
        g = gg
    elif subtract_green:                         # inverse: add green
        r = (r + g) & 0xFF
        b = (b + g) & 0xFF
    out = np.zeros((h, w, 4), np.uint8)
    out[:, :, 0] = r.astype(np.uint8)
    out[:, :, 1] = g.astype(np.uint8)
    out[:, :, 2] = b.astype(np.uint8)
    out[:, :, 3] = a.astype(np.uint8)
    return out


# --- encoder ---------------------------------------------------------------


def _write_prefix_code(bw: _LsbBitWriter, lengths: dict[int, int],
                       alphabet: int) -> None:
    """Emit a prefix code: simple form for <=2 one-byte symbols, else
    the normal code-length-coded form (zero runs via 17/18)."""
    syms = sorted(lengths)
    if 1 <= len(syms) <= 2 and all(s < 256 for s in syms) \
            and all(lengths[s] == 1 for s in syms) or len(syms) == 1:
        bw.write(1, 1)                           # simple
        bw.write(len(syms) - 1, 1)
        first = syms[0]
        if first <= 1:
            bw.write(0, 1)
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)                               # normal
    # code lengths as a sequence over the alphabet with 17/18 zero runs
    seq: list[tuple[int, int, int]] = []         # (clc_sym, extra, bits)
    run = 0

    def flush_zeros() -> None:
        nonlocal run
        while run:
            if run < 3:
                for _ in range(run):
                    seq.append((0, 0, 0))
                run = 0
            elif run <= 10:
                seq.append((17, run - 3, 3))
                run = 0
            else:
                take = min(run, 138)
                seq.append((18, take - 11, 7))
                run -= take

    # cover the FULL alphabet: the decoder keeps reading code-length
    # entries until every symbol has one (unless the max_symbol bound
    # is used), so trailing zeros must be run-length coded too
    for sym in range(alphabet):
        ln = lengths.get(sym, 0)
        if ln == 0:
            run += 1
            continue
        flush_zeros()
        seq.append((ln, 0, 0))
    flush_zeros()
    # build the code-length code over used clc symbols
    from collections import Counter
    freq = Counter(cs for cs, _, _ in seq)
    clc_lengths = _limited_code_lengths(freq, 7)
    n_clc = max(_CLC_ORDER.index(s) for s in clc_lengths) + 1
    n_clc = max(n_clc, 4)
    bw.write(n_clc - 4, 4)
    for i in range(n_clc):
        bw.write(clc_lengths.get(_CLC_ORDER[i], 0), 3)
    clc_codes = _canonical_codes(clc_lengths)
    bw.write(0, 1)                               # no max_symbol bound
    for cs, extra, nbits in seq:
        code, ln = clc_codes[cs]
        for k in range(ln - 1, -1, -1):          # MSB of code first
            bw.write((code >> k) & 1, 1)
        if nbits:
            bw.write(extra, nbits)


def _limited_code_lengths(freq: dict, max_len: int) -> dict[int, int]:
    """Length-limited canonical code lengths (simple Huffman, then a
    crude rebalance into the limit — fine for the tiny alphabets the
    encoder emits)."""
    import heapq
    syms = sorted(freq)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(freq[s], i, [s]) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    nxt = len(syms)
    lengths = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, _, sa = heapq.heappop(heap)
        fb, _, sb = heapq.heappop(heap)
        for s in sa + sb:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, nxt, sa + sb))
        nxt += 1
    while max(lengths.values()) > max_len:       # crude flatten
        flat = int(np.ceil(np.log2(len(syms))))
        lengths = {s: flat for s in syms}
        break
    # canonicalize to a COMPLETE code (kraft == 1): greedily shorten
    kraft = sum(1 / (1 << ln) for ln in lengths.values())
    while kraft < 1.0:
        s = max(lengths, key=lambda x: (lengths[x], x))
        lengths[s] -= 1
        kraft = sum(1 / (1 << ln) for ln in lengths.values())
    if kraft != 1.0:
        raise ValueError("could not build complete code")
    return lengths


def _encode_image_stream(bw: _LsbBitWriter, flat: np.ndarray, *,
                         use_runs: bool, cache_bits: int,
                         level0: bool = False, entropy_bits: int = 0,
                         img_w: int = 0) -> None:
    """Emit one entropy-coded image (cache bit + [entropy image] +
    prefix codes + token stream) for a flat uint32 ARGB array — used
    for the main image AND transform sub-images (palette / predictor
    modes / color elements). ``entropy_bits`` > 0 (level 0 only)
    emits a meta prefix image — a checkerboard of two prefix-code
    GROUPS over ``2^entropy_bits`` blocks of the ``img_w``-wide image
    — and codes each token with the group selected by its START
    pixel's block (runs may then cross group boundaries, matching the
    decoder's per-token group lookup). The color cache is ONE shared
    cache across groups, per spec."""
    n_px = len(flat)
    cache_size = (1 << cache_bits) if cache_bits else 0

    n_groups = 1
    grp_of: Optional[np.ndarray] = None
    meta: Optional[np.ndarray] = None
    if level0 and entropy_bits:
        assert img_w > 0 and n_px % img_w == 0
        img_h = n_px // img_w
        mw = (img_w + (1 << entropy_bits) - 1) >> entropy_bits
        mh = (img_h + (1 << entropy_bits) - 1) >> entropy_bits
        meta = (np.add.outer(np.arange(mh, dtype=np.int64),
                             np.arange(mw, dtype=np.int64)) % 2)
        n_groups = int(meta.max(initial=0)) + 1
        pix = np.arange(n_px, dtype=np.int64)
        grp_of = meta[(pix // img_w) >> entropy_bits,
                      (pix % img_w) >> entropy_bits]

    # one modeling pass: tokens + per-group symbol frequencies
    tokens: list[tuple] = []    # (grp,'lit',px)/('run',n)/('hit',idx)
    cache = np.zeros(cache_size, np.uint32) if cache_size else None
    from collections import Counter
    gfreqs = [Counter() for _ in range(n_groups)]
    rfreqs = [Counter() for _ in range(n_groups)]
    bfreqs = [Counter() for _ in range(n_groups)]
    afreqs = [Counter() for _ in range(n_groups)]
    dfreqs = [Counter() for _ in range(n_groups)]
    i = 0
    while i < n_px:
        grp = int(grp_of[i]) if grp_of is not None else 0
        gfreq, rfreq, bfreq = gfreqs[grp], rfreqs[grp], bfreqs[grp]
        afreq, dfreq = afreqs[grp], dfreqs[grp]
        px = int(flat[i])
        run = 0
        if use_runs and i > 0 and px == int(flat[i - 1]):
            j = i
            while j < n_px and int(flat[j]) == px:
                j += 1
            run = j - i
        if run >= 3:
            # cap each backref at 4096 — the max the VP8L length code
            # represents (symbol 23); longer runs would alias the
            # color-cache symbol range. The remainder re-enters the
            # loop: >=3 re-detects as another run, 1-2 px fall through
            # to the literal/cache path naturally.
            run = min(run, 4096)
            lsym, _, _ = _prefix_code_for_value(run)
            tokens.append((grp, "run", run))
            gfreq[256 + lsym] += 1
            dsym, _, _ = _prefix_code_for_value(121)  # distance 1
            dfreq[dsym] += 1
            if cache is not None:
                for _ in range(run):
                    cache[((_HASH_MUL * px) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
            i += run
            continue
        idx = (((_HASH_MUL * px) & 0xFFFFFFFF)
               >> (32 - cache_bits)) if cache is not None else 0
        if cache is not None and int(cache[idx]) == px and i > 0:
            tokens.append((grp, "hit", idx))
            gfreq[256 + 24 + idx] += 1
            i += 1
            continue
        tokens.append((grp, "lit", px))
        gfreq[(px >> 8) & 0xFF] += 1
        rfreq[(px >> 16) & 0xFF] += 1
        bfreq[px & 0xFF] += 1
        afreq[(px >> 24) & 0xFF] += 1
        if cache is not None:
            cache[idx] = px
        i += 1

    # degenerate alphabets (incl. token-less groups) still need codes
    for g in range(n_groups):
        for fr in (gfreqs[g], rfreqs[g], bfreqs[g], afreqs[g],
                   dfreqs[g]):
            if not fr:
                fr[0] = 1

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        if meta is not None:
            bw.write(1, 1)                       # entropy image
            bw.write(entropy_bits - 2, 3)
            # meta prefix index travels as (red << 8) | green; two
            # groups fit entirely in the green byte
            _encode_image_stream(
                bw, (meta.astype(np.uint32) << 8).reshape(-1),
                use_runs=False, cache_bits=0)
        else:
            bw.write(0, 1)                       # no entropy image

    def emit_code(freq, alphabet: int) -> dict[int, tuple]:
        lengths = (_limited_code_lengths(freq, 15)
                   if len(freq) > 1 else {next(iter(freq)): 0})
        if len(lengths) == 1:
            sym = next(iter(lengths))
            bw.write(1, 1)                       # simple, 1 symbol
            bw.write(0, 1)
            if sym <= 1:
                bw.write(0, 1)
                bw.write(sym, 1)
            else:
                bw.write(1, 1)
                bw.write(sym & 0xFF, 8)
                if sym > 255:                    # cache/length ids >255
                    raise ValueError(
                        "single-symbol code beyond one byte; add a "
                        "second dummy symbol")
            return {sym: (0, 0)}
        _write_prefix_code(bw, lengths, alphabet)
        return _canonical_codes(lengths)

    group_codes: list[tuple] = []
    for g in range(n_groups):
        gfreq = gfreqs[g]
        # a >255 single green symbol can't use the simple form: pad
        # with a dummy literal so the normal form is used
        if len(gfreq) == 1 and next(iter(gfreq)) > 255:
            gfreq[0] += 1
        group_codes.append((
            emit_code(gfreq, 256 + 24 + cache_size),
            emit_code(rfreqs[g], 256),
            emit_code(bfreqs[g], 256),
            emit_code(afreqs[g], 256),
            emit_code(dfreqs[g], 40)))

    def put(codes: dict, sym: int) -> None:
        code, ln = codes[sym]
        for k in range(ln - 1, -1, -1):
            bw.write((code >> k) & 1, 1)

    for grp, kind, val in tokens:
        gcodes, rcodes, bcodes, acodes, dcodes = group_codes[grp]
        if kind == "lit":
            px = val
            put(gcodes, (px >> 8) & 0xFF)
            put(rcodes, (px >> 16) & 0xFF)
            put(bcodes, px & 0xFF)
            put(acodes, (px >> 24) & 0xFF)
        elif kind == "run":
            lsym, extra, nbits = _prefix_code_for_value(val)
            put(gcodes, 256 + lsym)
            if nbits:
                bw.write(extra, nbits)
            dsym, dextra, dnbits = _prefix_code_for_value(121)
            put(dcodes, dsym)
            if dnbits:
                bw.write(dextra, dnbits)
        else:                                    # cache hit
            put(gcodes, 256 + 24 + val)


def encode_vp8l(rgba: np.ndarray, *, use_runs: bool = True,
                cache_bits: int = 0, subtract_green: bool = False,
                palette: bool = False, predictor: bool = False,
                color: bool = False,
                entropy_image: bool = False) -> bytes:
    """(h, w, 4) uint8 RGBA -> full WebP file bytes (RIFF + VP8L);
    horizontal pixel runs become distance-1 LZ77 backrefs when
    ``use_runs``; ``cache_bits`` > 0 enables the color cache (hits
    emitted whenever the current pixel is cached); ``subtract_green``
    applies the SUBTRACT_GREEN transform (the one most real encoders
    emit); ``palette`` applies COLOR_INDEXING for up to 256 distinct
    colors — the palette travels as a delta-coded entropy sub-image,
    and palettes of <=16 colors BUNDLE multiple pixel indices per
    coded green byte, per spec; ``predictor`` cycles per-16x16-block
    prediction over the full mode set 0-13; ``color`` applies the
    cross-component COLOR transform with per-block elements cycling
    deterministically; ``entropy_image`` (combinable with any of the
    above) codes the main image with a checkerboard meta prefix image
    of two code groups over 4x4-pixel blocks."""
    rgba = np.asarray(rgba, np.uint8)
    h, w, nc = rgba.shape
    assert nc == 4, "encode_vp8l expects (h, w, 4) RGBA"
    assert sum((palette, subtract_green, predictor, color)) <= 1, \
        "one transform at a time in this tier"
    argb_full = (rgba[:, :, 3].astype(np.uint32) << 24) \
        | (rgba[:, :, 0].astype(np.uint32) << 16) \
        | (rgba[:, :, 1].astype(np.uint32) << 8) \
        | rgba[:, :, 2].astype(np.uint32)
    flat = argb_full.reshape(-1)
    enc_w = w                                    # coded-image width

    pal: Optional[np.ndarray] = None
    pal_bits = 0
    if palette:
        uniq = np.unique(flat)
        if len(uniq) > 256:
            raise ValueError(
                f"palette tier needs <=256 distinct colors, "
                f"got {len(uniq)}")
        pal = uniq
        size = len(uniq)
        idx = np.searchsorted(uniq, flat).astype(np.uint32)
        pal_bits = 3 if size <= 2 else 2 if size <= 4 \
            else 1 if size <= 16 else 0
        if pal_bits:
            # bundle (8 >> pal_bits)-bit indices into packed green
            # bytes: pixel x lands in byte x >> pal_bits at bit
            # offset (x % per_byte) * bpp
            bpp = 8 >> pal_bits
            per = 1 << pal_bits
            enc_w = (w + per - 1) >> pal_bits
            idx2d = idx.reshape(h, w)
            packed = np.zeros((h, enc_w), np.uint32)
            for k in range(per):
                cols = idx2d[:, k::per]
                packed[:, :cols.shape[1]] |= cols << (k * bpp)
            flat = (packed << 8).reshape(-1)     # index in GREEN
        else:
            flat = idx << 8
    elif subtract_green:
        r16 = rgba[:, :, 0].astype(np.uint16)
        g16 = rgba[:, :, 1].astype(np.uint16)
        b16 = rgba[:, :, 2].astype(np.uint16)
        r16 = (r16 - g16) & 0xFF
        b16 = (b16 - g16) & 0xFF
        flat = ((rgba[:, :, 3].astype(np.uint32) << 24)
                | (r16.astype(np.uint32) << 16)
                | (g16.astype(np.uint32) << 8)
                | b16.astype(np.uint32)).reshape(-1)

    bw = _LsbBitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if bool((rgba[:, :, 3] != 255).any()) else 0, 1)
    bw.write(0, 3)                               # version
    pred_modes = None
    if predictor:
        block_bits = 4                           # 16x16 blocks
        bw_blocks = (w + 15) >> 4
        bh_blocks = (h + 15) >> 4
        # per-block mode cycles over the FULL mode set 0-13 —
        # exercises the mode SUB-IMAGE path and every predictor
        cycle = np.asarray([1, 2, 7, 4, 0, 3, 5, 6, 8, 9, 10, 11,
                            12, 13], np.int64)
        pred_modes = cycle[
            (np.arange(bh_blocks)[:, None] * 3
             + np.arange(bw_blocks)[None, :]) % len(cycle)]
        bw.write(1, 1)
        bw.write(0, 2)                           # PREDICTOR
        bw.write(block_bits - 2, 3)
        mflat = (pred_modes.astype(np.uint32) << 8).reshape(-1)
        _encode_image_stream(bw, mflat, use_runs=False, cache_bits=0)
        flat = _forward_predictor(flat, w, h, block_bits, pred_modes)
    if color:
        block_bits = 4                           # 16x16 blocks
        bw_blocks = (w + 15) >> 4
        bh_blocks = (h + 15) >> 4
        # per-block (g2r, g2b, r2b) elements cycle deterministically
        # over a small signed-byte set (values are the int8-coded
        # bytes the decoder feeds ColorTransformDelta)
        vals = np.asarray([0, 16, 240, 32, 224, 8, 248, 64], np.int64)
        grid = (np.arange(bh_blocks, dtype=np.int64)[:, None] * 5
                + np.arange(bw_blocks, dtype=np.int64)[None, :])
        g2r = vals[grid % len(vals)]
        g2b = vals[(grid + 3) % len(vals)]
        r2b = vals[(grid + 5) % len(vals)]
        bw.write(1, 1)
        bw.write(1, 2)                           # COLOR (cross-comp.)
        bw.write(block_bits - 2, 3)
        # spec element packing: g2r in BLUE byte, g2b in GREEN,
        # r2b in RED (mirrors the decoder's unpack)
        cflat = ((r2b.astype(np.uint32) << 16)
                 | (g2b.astype(np.uint32) << 8)
                 | g2r.astype(np.uint32)).reshape(-1)
        _encode_image_stream(bw, cflat, use_runs=False, cache_bits=0)
        flat = _color_transform(flat, w, h, block_bits,
                                g2r, g2b, r2b, inverse=False)
    if subtract_green:
        bw.write(1, 1)                           # transform present
        bw.write(2, 2)                           # SUBTRACT_GREEN
    if pal is not None:
        bw.write(1, 1)
        bw.write(3, 2)                           # COLOR_INDEXING
        bw.write(len(pal) - 1, 8)
        # delta-code the palette componentwise, entry 0 as-is
        comp = np.zeros((len(pal), 4), np.int64)
        comp[:, 0] = (pal >> 24) & 0xFF
        comp[:, 1] = (pal >> 16) & 0xFF
        comp[:, 2] = (pal >> 8) & 0xFF
        comp[:, 3] = pal & 0xFF
        deltas = comp.copy()
        deltas[1:] = (comp[1:] - comp[:-1]) & 0xFF
        dflat = ((deltas[:, 0].astype(np.uint32) << 24)
                 | (deltas[:, 1].astype(np.uint32) << 16)
                 | (deltas[:, 2].astype(np.uint32) << 8)
                 | deltas[:, 3].astype(np.uint32))
        _encode_image_stream(bw, dflat, use_runs=False, cache_bits=0)
    bw.write(0, 1)                               # end of transforms
    _encode_image_stream(bw, flat, use_runs=use_runs,
                         cache_bits=cache_bits, level0=True,
                         entropy_bits=2 if entropy_image else 0,
                         img_w=enc_w)

    payload = b"\x2f" + bw.flush()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff

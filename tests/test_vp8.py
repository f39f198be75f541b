"""Lossy-WebP VP8 intra-keyframe codec tests (functions/vp8.py).

Verification contract (see the module docstring): the bitstream
STRUCTURE follows RFC 6386 (bool coder, header, mode trees, token
tree + categories + bands + contexts, dequant relations, exact
fixed-point WHT/IDCT, DC/V/H/TM prediction); probability tables are
deterministic in-repo profiles, so correctness is pinned by coder
property tests + encoder/decoder round-trip bit-exactness + hostile
sweeps, the same pattern as the JPEG and VP8L tiers. Reference n/a —
/root/reference/src has no media path; multimodal is engine-mandated.
"""
import numpy as np

from tempeh_parser_ray.functions import multimodal as mm
from tempeh_parser_ray.functions import vp8 as v8


def _pattern(h, w, d=0):
    bx = (np.arange(w) // 16)[None, :]
    by = (np.arange(h) // 16)[:, None]
    return np.stack([(5 * bx + 9 * by + 3 * d) % 256,
                     (7 * bx + 11 * by + d) % 256,
                     (13 * bx + 17 * by + 5 * d) % 256],
                    axis=-1).astype(np.uint8)


def _expected_ycc(ycc):
    h, w = ycc.shape[:2]
    y = ycc[:, :, 0]
    cb = np.repeat(np.repeat(ycc[::2, ::2, 1], 2, 0), 2, 1)[:h, :w]
    cr = np.repeat(np.repeat(ycc[::2, ::2, 2], 2, 0), 2, 1)[:h, :w]
    return np.stack([y, cb, cr], axis=-1)


def test_bool_coder_random_property():
    rng = np.random.RandomState(0)
    for trial in range(150):
        n = int(rng.randint(1, 500))
        bits = rng.randint(0, 2, n)
        probs = rng.randint(1, 255, n)
        e = v8._BoolEnc()
        for b, p in zip(bits, probs):
            e.put(int(b), int(p))
        d = v8._BoolDec(e.get_bytes())
        assert [d.bool(int(p)) for p in probs] == list(bits), trial


def test_bool_coder_literals_and_trees():
    rng = np.random.RandomState(1)
    for _ in range(50):
        vals = [(int(rng.randint(0, 1 << n)), int(n))
                for n in rng.randint(1, 12, 25)]
        modes = [int(m) for m in rng.randint(0, 5, 25)]
        toks = [(int(t), 2 if t != v8._DCT_EOB and i % 3 == 0 else 0)
                for i, t in enumerate(rng.randint(0, 12, 25))]
        pr = v8._COEFF_PROBS[2][4][1]
        e = v8._BoolEnc()
        for vv, n in vals:
            e.literal(vv, n)
        for m in modes:
            e.tree(v8._KF_YMODE_TREE, v8._KF_YMODE_PROB, m)
        for t, st in toks:
            e.tree(v8._COEFF_TREE, pr, t, st)
        d = v8._BoolDec(e.get_bytes())
        assert all(d.literal(n) == vv for vv, n in vals)
        assert all(d.tree(v8._KF_YMODE_TREE, v8._KF_YMODE_PROB) == m
                   for m in modes)
        assert all(d.tree(v8._COEFF_TREE, pr, st) == t
                   for t, st in toks)


def test_vp8_round_trip_bit_exact():
    """MB-constant planes round-trip bit-for-bit through the full
    header + mode + token + transform + prediction path, with the
    mode rotation exercising DC/V/H/TM and skip MBs."""
    for d, (h, w) in enumerate([(16, 16), (32, 48), (17, 33), (3, 5),
                                (15, 31), (64, 64), (1, 1), (40, 9),
                                (48, 16), (33, 47)]):
        ycc = _pattern(h, w, 3 * d + 1)
        for cyc in (True, False):
            out = v8.decode_vp8(v8.encode_vp8(ycc, mode_cycle=cyc))
            assert out is not None and np.array_equal(
                out, _expected_ycc(ycc)), (h, w, cyc)


def test_vp8_webp_container_and_rgb_dispatch():
    """decode_image_pixels routes 'VP8 ' RIFF chunks through the VP8
    decoder and the shared fixed-point BT.601 conversion."""
    ycc = _pattern(34, 50, 9)
    blob = v8.encode_webp_vp8(ycc)
    out = mm.decode_image_pixels(blob)
    exp = mm._ycbcr_to_rgb(_expected_ycc(ycc))
    assert out is not None and out.shape == (34, 50, 3)
    assert np.array_equal(out, exp)


def test_vp8_out_of_tier_streams_return_none():
    ycc = _pattern(16, 16)
    blob = bytearray(v8.encode_vp8(ycc))
    # interframe bit
    assert v8.decode_vp8(bytes([blob[0] | 1]) + bytes(blob[1:])) is None
    # broken start code
    bad = bytes(blob[:3]) + b"\x9d\x01\x2b" + bytes(blob[6:])
    assert v8.decode_vp8(bad) is None
    # empty / tiny
    assert v8.decode_vp8(b"") is None
    assert v8.decode_vp8(bytes(blob[:9])) is None


def test_vp8_hostile_truncation_and_bitflips_never_crash():
    ycc = _pattern(33, 49, 5)
    blob = v8.encode_vp8(ycc)
    for cut in range(0, len(blob), 5):
        v8.decode_vp8(blob[:cut])
    rng = np.random.RandomState(3)
    for _ in range(150):
        b = bytearray(blob)
        for _ in range(int(rng.randint(1, 6))):
            b[int(rng.randint(len(b)))] ^= 1 << int(rng.randint(8))
        v8.decode_vp8(bytes(b))


def test_vp8_truncation_rejected_not_fabricated():
    """Cutting the stream inside either partition must yield None
    (the bool decoder records refills past end-of-data), never a
    zero-filled fabrication; the intact stream still decodes."""
    rng = np.random.RandomState(11)
    ycc = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    blob = v8.encode_vp8(ycc, qi=10)
    first = int.from_bytes(blob[0:3], "little") >> 5
    for cut in (12, 10 + first // 2, 10 + first, 10 + first + 3,
                len(blob) // 2, len(blob) - 4):
        assert v8.decode_vp8(blob[:cut]) is None, cut
    assert v8.decode_vp8(blob) is not None


def test_vp8_flat_blocks_bounded_at_coarse_qi():
    """MB-constant content at qi > 0 must take the generic quantized
    path (the exact DC-only solve is valid only at qi = 0): the
    reconstruction error stays within a few quant steps instead of
    the blow-out the ungated exact formula produced."""
    flat = np.full((32, 32, 3), 200, np.uint8)
    assert np.array_equal(v8.decode_vp8(v8.encode_vp8(flat, qi=0)),
                          flat)
    for qi in (8, 40, 90, 127):
        out = v8.decode_vp8(v8.encode_vp8(flat, qi=qi))
        err = int(np.abs(out.astype(int) - flat.astype(int)).max())
        assert err <= 25, (qi, err)


def test_vp8_bool_encoder_linear_chunking_matches_bigint():
    """The chunked carry-propagating bool encoder must emit the same
    bytes as the exact big-int formulation it replaced."""

    class BigIntEnc:
        def __init__(self):
            self.low, self.range, self.shifts = 0, 255, 0

        def put(self, bit, prob=128):
            split = 1 + (((self.range - 1) * prob) >> 8)
            if bit:
                self.low += split
                self.range -= split
            else:
                self.range = split
            while self.range < 128:
                self.range <<= 1
                self.low <<= 1
                self.shifts += 1

        def get_bytes(self):
            total = self.shifts + 8
            pad = (-total) % 8
            return ((self.low << pad).to_bytes((total + pad) // 8,
                                               "big") + b"\x00\x00")

    rng = np.random.RandomState(17)
    for _ in range(60):
        n = int(rng.randint(1, 500))
        bits = rng.randint(0, 2, n)
        probs = rng.randint(1, 255, n)
        a, b = v8._BoolEnc(), BigIntEnc()
        for bit, p in zip(bits, probs):
            a.put(int(bit), int(p))
            b.put(int(bit), int(p))
        assert a.get_bytes() == b.get_bytes()


def test_vp8_transforms_match_dc_only_closed_form():
    """The exact fixed-point relations the encoder's residual solve
    relies on: iwht(DC-only y2) spreads ((y2dc+3)>>3) to all 16 luma
    DCs, and idct(DC-only) yields ((dc+4)>>3) in every pixel."""
    for d2 in (-2044, -37, -1, 0, 1, 5, 100, 2044):
        ydc = v8._iwht4x4([d2] + [0] * 15)
        assert ydc == [(d2 + 3) >> 3] * 16
        px = v8._idct4x4([d2] + [0] * 15)
        assert px == [(d2 + 4) >> 3] * 16


def test_vp8_generic_content_bounded_error():
    """Arbitrary (non-MB-constant) content goes through the full
    forward DCT + WHT path: lossy, with a small bounded error at
    qi=0 (quant step 4; fixed-point wobble <= ~4), like the JPEG
    lossy tolerance test."""
    rng = np.random.RandomState(5)
    for t in range(8):
        h, w = int(rng.randint(1, 70)), int(rng.randint(1, 70))
        ycc = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        out = v8.decode_vp8(v8.encode_vp8(ycc, mode_cycle=bool(t % 2)))
        assert out is not None and out.shape == (h, w, 3)
        exp = _expected_ycc(ycc).astype(int)
        assert int(np.abs(out.astype(int) - exp).max()) <= 4, t
    # smooth gradients compress tighter
    x = np.arange(64)[None, :]
    yv = np.arange(48)[:, None]
    ycc = np.stack([(x * 2 + yv) % 256, (x + yv * 2) % 256,
                    (x * 3 + yv * 0) % 256], -1).astype(np.uint8)
    out = v8.decode_vp8(v8.encode_vp8(ycc))
    exp = _expected_ycc(ycc).astype(int)
    assert int(np.abs(out.astype(int) - exp).max()) <= 2


def test_vp8_qi_sweep_decodes():
    """Coarser quantizer indices stay decodable (larger loss is
    expected; the in-repo monotone qlookup maps qi upward)."""
    rng = np.random.RandomState(9)
    ycc = rng.randint(0, 256, (33, 49, 3)).astype(np.uint8)
    prev_payload = None
    for qi in (0, 8, 31, 127):
        blob = v8.encode_vp8(ycc, qi=qi)
        out = v8.decode_vp8(blob)
        assert out is not None and out.shape == (33, 49, 3), qi
        if prev_payload is not None:
            assert len(blob) <= prev_payload  # coarser -> smaller
        prev_payload = len(blob)

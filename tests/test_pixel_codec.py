"""Real dependency-free pixel codec: encode->decode round trips across
color types and ALL five PNG row filters, BMP bottom-up/BGR handling,
and the nearest-neighbor resize index math."""

import numpy as np
import pytest

from tempeh_parser_ray.functions import multimodal as mm


@pytest.mark.parametrize("c", [1, 3, 4])
@pytest.mark.parametrize("mode", ["cycle", "none"])
def test_png_round_trip(c, mode):
    rng = np.random.RandomState(c * 10 + len(mode))
    img = rng.randint(0, 256, size=(17, 23, c), dtype=np.uint8)
    blob = mm.encode_png(img if c > 1 else img[:, :, 0],
                         filter_mode=mode)
    dec = mm.decode_image_pixels(blob)
    assert dec.shape == (17, 23, c)
    assert (dec == img).all()
    assert mm.parse_image_header(blob)[:3] == (23, 17, c)


def test_png_cycle_exercises_every_filter():
    # 6 rows with mode="cycle" -> filter bytes 0,1,2,3,4,0
    import zlib
    img = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(6, 5, 3)
    blob = mm.encode_png(img, filter_mode="cycle")
    p = blob.index(b"IDAT") + 4
    ln = int.from_bytes(blob[p - 8:p - 4], "big")
    raw = zlib.decompress(blob[p:p + ln])
    stride = 5 * 3 + 1
    assert [raw[y * stride] for y in range(6)] == [0, 1, 2, 3, 4, 0]
    assert (mm.decode_image_pixels(blob) == img).all()


def test_bmp_round_trip_and_padding():
    # width 5 -> 15-byte rows padded to 16: exercises stride handling
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)
    blob = mm.encode_bmp24(img)
    dec = mm.decode_image_pixels(blob)
    assert (dec == img).all()


def test_resize_nearest_matches_index_formula():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(9, 7, 3), dtype=np.uint8)
    r = mm.resize_nearest(img, 4, 5)
    for y in range(5):
        for x in range(4):
            assert (r[y, x] == img[(y * 9) // 5, (x * 7) // 4]).all()


def test_decode_rejects_unsupported():
    # 16-bit PNG depth and RLE BMP must fall back to None, not garbage
    img = np.zeros((2, 2, 3), np.uint8)
    blob = bytearray(mm.encode_png(img))
    blob[24] = 16  # bit depth
    assert mm.decode_image_pixels(bytes(blob)) is None
    bmp = bytearray(mm.encode_bmp24(img))
    bmp[30] = 1  # BI_RLE8 compression
    assert mm.decode_image_pixels(bytes(bmp)) is None
    assert mm.decode_image_pixels(b"not an image") is None


def test_decode_image_batch_uses_real_pixels():
    img = np.full((3, 4, 3), 200, np.uint8)
    import pyarrow as pa
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media": pa.array([mm.encode_png(img)], pa.binary()),
    })
    out = mm.DecodeImageBatch()(batch)
    assert out.column("width").to_pylist() == [4]
    assert out.column("height").to_pylist() == [3]
    feats = out.column("byte_features").to_pylist()[0]
    # all pixels are 200 -> the whole histogram mass sits in bin 12
    assert feats[12] == 1.0


# --- WAV PCM16 + MP4 mvhd (real dependency-free audio/video decode) -----


def test_wav_pcm16_round_trip():
    rng = np.random.RandomState(5)
    s = rng.randint(-32768, 32768, size=1234, dtype=np.int16)
    blob = mm.encode_wav_pcm16(s, rate=44100, channels=2)
    rate, ch, dec = mm.parse_wav_pcm16(blob)
    assert (rate, ch) == (44100, 2)
    assert (dec == s).all()


def test_wav_rejects_non_pcm16():
    s = np.zeros(10, np.int16)
    blob = bytearray(mm.encode_wav_pcm16(s))
    blob[20] = 3  # IEEE float audio format
    assert mm.parse_wav_pcm16(bytes(blob)) is None
    assert mm.parse_wav_pcm16(b"RIFFxxxxWAVE") is None
    assert mm.parse_wav_pcm16(b"not audio") is None


def test_mp4_mvhd_both_versions():
    for v in (0, 1):
        blob = mm.encode_mp4_stub(timescale=90000, duration=2700001,
                                  version=v)
        ts, dur, ms = mm.parse_mp4_mvhd(blob)
        assert (ts, dur) == (90000, 2700001)
        assert ms == 1000 * 2700001 // 90000
    assert mm.parse_mp4_mvhd(b"no boxes here") is None
    # moov without ftyp is not a valid payload for us
    only_moov = mm.encode_mp4_stub(timescale=1000, duration=1)
    ftyp_len = int.from_bytes(only_moov[:4], "big")
    assert mm.parse_mp4_mvhd(only_moov[ftyp_len:]) is None


# --- GIF (real LZW) ------------------------------------------------------


def test_gif_round_trip_small_and_growth():
    rng = np.random.RandomState(9)
    # few colors (narrow codes) and many colors (dict growth + width bumps)
    for n_colors, shape in [(4, (5, 6)), (200, (31, 29))]:
        pal = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
        idx = rng.randint(0, n_colors, size=shape)
        img = pal[idx]
        blob = mm.encode_gif(img)
        dec = mm.decode_gif_pixels(blob)
        assert dec is not None and dec.shape == shape + (3,)
        assert (dec == img).all()


def test_gif_via_generic_pixel_decoder():
    img = np.full((3, 4, 3), 77, np.uint8)
    blob = mm.encode_gif(img)
    dec = mm.decode_image_pixels(blob)
    assert (dec == img).all()
    assert mm.parse_image_header(blob)[:2] == (4, 3)


def test_gif_rejects_local_palette_and_deinterlaces():
    # interlace is now SUPPORTED: flipping the flag on a sequential
    # stream decodes to the deinterlace permutation of its rows
    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3) % 5
    blob = bytearray(mm.encode_gif(img))
    gct = 2 << (blob[10] & 7)
    flag_off = 13 + gct * 3 + 9
    blob[flag_off] = 0x40  # claim interlaced
    got = mm.decode_gif_pixels(bytes(blob))
    order = mm._gif_interlace_order(4)
    want = np.zeros_like(img)
    want[order] = img
    assert got is not None and (got == want).all()
    # local palette stays out of tier
    blob[flag_off] = 0x80
    assert mm.decode_gif_pixels(bytes(blob)) is None


# --- hostile-input robustness (decoders must never raise) ----------------


def test_decoders_survive_random_bytes():
    rng = np.random.RandomState(1234)
    decoders = [mm.decode_image_pixels, mm.decode_gif_pixels,
                mm.parse_wav_pcm16, mm.parse_mp4_mvhd,
                mm.parse_image_header]
    for _ in range(500):
        blob = bytes(rng.randint(0, 256, size=rng.randint(0, 200),
                                 dtype=np.uint8))
        for dec in decoders:
            dec(blob)  # any return is fine; raising is not


def test_decoders_survive_truncated_valid_payloads():
    img = np.arange(6 * 7 * 3, dtype=np.uint8).reshape(6, 7, 3)
    s = np.arange(50, dtype=np.int16)
    valid = [
        mm.encode_png(img, filter_mode="cycle"),
        mm.encode_bmp24(img),
        mm.encode_gif((img // 16) * 16),
        mm.encode_wav_pcm16(s),
        mm.encode_mp4_stub(timescale=1000, duration=77),
    ]
    decoders = [mm.decode_image_pixels, mm.decode_gif_pixels,
                mm.parse_wav_pcm16, mm.parse_mp4_mvhd,
                mm.parse_image_header]
    for blob in valid:
        for cut in range(0, len(blob), 3):
            t = blob[:cut]
            for dec in decoders:
                dec(t)
        # bit-flipped copies
        ba = bytearray(blob)
        for pos in range(0, len(ba), 7):
            ba[pos] ^= 0xFF
        for dec in decoders:
            dec(bytes(ba))


# --- baseline JPEG ---------------------------------------------------------


def test_jpeg_exact_round_trip_block_constant():
    """Per-8x8-block-constant grayscale with the all-ones quant table
    round-trips BIT-EXACTLY (all AC coefficients are exact zeros; the
    DC path is integer) — the property the image_pixel_stats oracle
    pins end-to-end."""
    for d in range(60):
        w, h = 4 + d % 13, 3 + d % 11
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        img = (((x // 8) * 5 + (y // 8) * 9 + d * 3) % 256).astype(
            np.uint8)
        dec = mm.decode_jpeg_gray(mm.encode_jpeg_gray(img))
        assert dec is not None and dec.shape == (h, w, 1)
        assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_lossy_round_trip_tolerance():
    """Arbitrary images exercise the FULL entropy path (AC run/size
    symbols, ZRL, byte stuffing, multi-block DC prediction); with the
    all-ones quant table the only loss is FDCT/IDCT rounding, so the
    reconstruction must stay within 2 levels everywhere."""
    rng = np.random.RandomState(11)
    for _ in range(8):
        h, w = int(rng.randint(5, 50)), int(rng.randint(5, 50))
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        dec = mm.decode_jpeg_gray(mm.encode_jpeg_gray(img))
        assert dec is not None and dec.shape == (h, w, 1)
        err = np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max()
        assert err <= 2


def test_jpeg_nontrivial_quant_table():
    """A non-uniform quant table changes the stream (DQT is decoded,
    not assumed) and stays within the q-bounded reconstruction error."""
    q = np.clip(np.arange(64).reshape(8, 8) + 1, 1, 24)
    img = (np.arange(16 * 16, dtype=np.int64).reshape(16, 16)
           * 7 % 256).astype(np.uint8)
    dec = mm.decode_jpeg_gray(mm.encode_jpeg_gray(img, q_table=q))
    assert dec is not None and dec.shape == (16, 16, 1)
    # worst-case per-coefficient quant error q/2, loose L_inf bound
    err = np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max()
    assert err <= int(q.sum() / 16) + 2


def test_jpeg_via_generic_pixel_decoder():
    img = np.full((9, 12), 200, np.uint8)
    blob = mm.encode_jpeg_gray(img)
    assert mm.parse_image_header(blob)[:2] == (12, 9)
    dec = mm.decode_image_pixels(blob)
    assert dec.shape == (9, 12, 1) and (dec == 200).all()


def test_jpeg_rejects_out_of_tier_streams():
    img = np.full((8, 8), 100, np.uint8)
    blob = bytearray(mm.encode_jpeg_gray(img))
    # progressive: flip SOF0 (0xC0) to SOF2 (0xC2)
    sof = blob.find(b"\xff\xc0")
    prog = bytes(blob[:sof + 1]) + b"\xc2" + bytes(blob[sof + 2:])
    assert mm.decode_jpeg_gray(prog) is None
    # restart interval: splice a DRI segment after SOI
    dri = bytes(blob[:2]) + b"\xff\xdd\x00\x04\x00\x08" + bytes(blob[2:])
    assert mm.decode_jpeg_gray(dri) is None


def test_jpeg_survives_truncation_and_bitflips():
    img = (np.arange(11 * 17, dtype=np.int64).reshape(11, 17)
           * 13 % 256).astype(np.uint8)
    blob = mm.encode_jpeg_gray(img)
    for cut in range(0, len(blob), 2):
        mm.decode_jpeg_gray(blob[:cut])        # must not raise
    ba = bytearray(blob)
    for pos in range(0, len(ba), 5):
        flipped = bytearray(ba)
        flipped[pos] ^= 0xFF
        mm.decode_jpeg_gray(bytes(flipped))    # must not raise


# --- baseline color JPEG (4:4:4, fixed-point BT.601) ----------------------


def _block_constant_ycc(h, w, seed):
    import numpy as np
    bx = (np.arange(w) // 8)[None, :]
    by = (np.arange(h) // 8)[:, None]
    return np.stack([
        (5 * bx + 9 * by + 3 * seed) % 256,
        (7 * bx + 11 * by + seed) % 256,
        (13 * bx + 17 * by + 5 * seed) % 256,
    ], axis=-1).astype(np.uint8)


def test_jpeg_color_round_trip_bit_exact():
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    for h, w, seed in [(3, 4, 0), (8, 8, 7), (11, 14, 123),
                       (16, 9, 255), (1, 17, 42)]:
        ycc = _block_constant_ycc(h, w, seed)
        blob = mm.encode_jpeg_color(ycc)
        rgb = mm.decode_jpeg(blob)
        assert rgb is not None and rgb.shape == (h, w, 3), (h, w)
        assert (rgb == mm._ycbcr_to_rgb(ycc)).all(), (h, w, seed)
        # the gray-only wrapper must reject color streams
        assert mm.decode_jpeg_gray(blob) is None
        # and the generic dispatcher must accept them
        assert (mm.decode_image_pixels(blob) == rgb).all()


def test_jpeg_color_ycbcr_conversion_reference():
    """Fixed-point conversion matches the float BT.601 formula within
    the documented rounding (round-half-up at 1e-6 resolution)."""
    import numpy as np
    from tempeh_parser_ray.functions.multimodal import _ycbcr_to_rgb

    rng = np.random.RandomState(3)
    ycc = rng.randint(0, 256, (50, 50, 3)).astype(np.uint8)
    got = _ycbcr_to_rgb(ycc).astype(np.float64)
    y = ycc[:, :, 0].astype(np.float64)
    cb = ycc[:, :, 1].astype(np.float64) - 128
    cr = ycc[:, :, 2].astype(np.float64) - 128
    ref = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    ref = np.clip(np.floor(ref + 0.5), 0, 255)
    assert np.abs(got - ref).max() <= 1  # float-vs-fixed off-by-one max


def test_jpeg_color_hostile_inputs_never_crash():
    from tempeh_parser_ray.functions import multimodal as mm

    ycc = _block_constant_ycc(11, 14, 9)
    blob = mm.encode_jpeg_color(ycc)
    for cut in range(2, len(blob), 37):
        mm.decode_jpeg(blob[:cut])  # must not raise
    # flipped bytes in the entropy stream must not raise either
    b = bytearray(blob)
    for pos in range(len(b) - 40, len(b) - 3, 7):
        b2 = bytearray(b)
        b2[pos] ^= 0x5A
        mm.decode_jpeg(bytes(b2))


def test_jpeg_420_round_trip_bit_exact():
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    def block16(h, w, seed):
        import numpy as np
        bx = (np.arange(w) // 16)[None, :]
        by = (np.arange(h) // 16)[:, None]
        return np.stack([
            (5 * bx + 9 * by + 3 * seed) % 256,
            (7 * bx + 11 * by + seed) % 256,
            (13 * bx + 17 * by + 5 * seed) % 256,
        ], axis=-1).astype(np.uint8)

    for h, w, seed in [(3, 4, 0), (16, 16, 7), (11, 14, 123),
                       (17, 33, 200), (1, 1, 5), (32, 15, 99)]:
        ycc = block16(h, w, seed)
        blob = mm.encode_jpeg_color(ycc, subsample=True)
        rgb = mm.decode_jpeg(blob)
        assert rgb is not None and rgb.shape == (h, w, 3), (h, w)
        assert (rgb == mm._ycbcr_to_rgb(ycc)).all(), (h, w, seed)
        # header reports 3 components; gray wrapper rejects
        assert mm.parse_image_header(blob)[:2] == (w, h)
        assert mm.decode_jpeg_gray(blob) is None
    # truncation / bit-flip hardening on a multi-MCU stream
    blob = mm.encode_jpeg_color(block16(17, 33, 1), subsample=True)
    for cut in range(2, len(blob), 53):
        mm.decode_jpeg(blob[:cut])
    b = bytearray(blob)
    for pos in range(len(b) - 60, len(b) - 3, 11):
        b2 = bytearray(b)
        b2[pos] ^= 0x3C
        mm.decode_jpeg(bytes(b2))


def test_jpeg_progressive_round_trip_and_baseline_agreement():
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    # exact round trip on block-constant images, ones quant
    for h, w, seed in [(3, 4, 0), (11, 14, 123), (16, 9, 255),
                       (1, 17, 42), (24, 24, 7)]:
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        g = (((x // 8) * 5 + (y // 8) * 9 + seed * 3) % 256
             ).astype(np.uint8)
        out = mm.decode_jpeg(mm.encode_jpeg_gray_progressive(g))
        assert out is not None and (out[:, :, 0] == g).all(), (h, w)

    # progressive and baseline must decode IDENTICAL pixels from the
    # same quantized coefficients (catches zigzag/dequant mix-ups that
    # an all-ones quant table can't see)
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (19, 23)).astype(np.uint8)
    q = np.clip(rng.randint(1, 9, (8, 8)), 1, None)
    base = mm.decode_jpeg(mm.encode_jpeg_gray(img, q_table=q))
    prog = mm.decode_jpeg(mm.encode_jpeg_gray_progressive(
        img, q_table=q))
    assert (base == prog).all()
    # any band split decodes the same
    p2 = mm.decode_jpeg(mm.encode_jpeg_gray_progressive(
        img, q_table=q, bands=((1, 1), (2, 9), (10, 35), (36, 63))))
    assert (p2 == base).all()


def test_jpeg_progressive_hostile_inputs_never_crash():
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (17, 21)).astype(np.uint8)
    blob = mm.encode_jpeg_gray_progressive(img)
    for cut in range(2, len(blob), 37):
        mm.decode_jpeg(blob[:cut])
    b = bytearray(blob)
    for pos in range(40, len(b) - 3, 29):
        b2 = bytearray(b)
        b2[pos] ^= 0x77
        mm.decode_jpeg(bytes(b2))


def test_jpeg_successive_approximation_matches_baseline():
    """The four-pass SA stream (coarse DC/AC at Al=1, then Ah=1/Al=0
    refinement with correction bits) must decode pixels IDENTICAL to
    the baseline stream of the same quantized coefficients — over many
    random images and band splits, with non-trivial quant tables."""
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (19, 23)).astype(np.uint8)
    q = np.clip(rng.randint(1, 9, (8, 8)), 1, None)
    base = mm.decode_jpeg(mm.encode_jpeg_gray(img, q_table=q))
    for bands in [((1, 63),), ((1, 5), (6, 63)),
                  ((1, 1), (2, 9), (10, 35), (36, 63))]:
        sa = mm.decode_jpeg(mm.encode_jpeg_gray_progressive(
            img, q_table=q, successive=True, bands=bands))
        assert sa is not None and (sa == base).all(), bands
    for t in range(60):
        im = rng.randint(0, 256, (rng.randint(1, 40),
                                  rng.randint(1, 40))).astype(np.uint8)
        qq = np.clip(rng.randint(1, 12, (8, 8)), 1, None)
        b = mm.decode_jpeg(mm.encode_jpeg_gray(im, q_table=qq))
        s = mm.decode_jpeg(mm.encode_jpeg_gray_progressive(
            im, q_table=qq, successive=True))
        assert s is not None and (s == b).all(), (t, im.shape)
    # truncation hardening on the 4-pass stream
    blob = mm.encode_jpeg_gray_progressive(img, q_table=q,
                                           successive=True)
    for cut in range(2, len(blob), 31):
        mm.decode_jpeg(blob[:cut])


def test_jpeg_color_progressive_matches_baseline():
    """Interleaved-DC + per-component AC progressive color streams
    (with and without SA refinement) decode pixel-identical to the
    baseline 4:4:4 stream of the same coefficients."""
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    rng = np.random.RandomState(7)
    for t in range(30):
        ycc = rng.randint(0, 256, (rng.randint(1, 30),
                                   rng.randint(1, 30), 3)
                          ).astype(np.uint8)
        q = np.clip(rng.randint(1, 12, (8, 8)), 1, None)
        base = mm.decode_jpeg(mm.encode_jpeg_color(ycc, q_table=q))
        prog = mm.decode_jpeg(mm.encode_jpeg_color_progressive(
            ycc, q_table=q, successive=bool(t % 2)))
        assert prog is not None and (prog == base).all(), t
    blob = mm.encode_jpeg_color_progressive(
        rng.randint(0, 256, (17, 21, 3)).astype(np.uint8),
        successive=True)
    for cut in range(2, len(blob), 43):
        mm.decode_jpeg(blob[:cut])


# --- WebP lossless (VP8L) --------------------------------------------------


def _vp8l_payload(blob: bytes) -> bytes:
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP" \
        and blob[12:16] == b"VP8L"
    ln = int.from_bytes(blob[16:20], "little")
    return blob[20:20 + ln]


def test_vp8l_round_trips_all_encoder_paths():
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm
    from tempeh_parser_ray.functions import vp8l

    rng = np.random.RandomState(3)
    cases = [rng.randint(0, 256, (rng.randint(1, 20),
                                  rng.randint(1, 20), 4)
                         ).astype(np.uint8) for _ in range(8)]
    cases += [np.full((9, 13, 4), 200, np.uint8)]
    two = np.zeros((8, 16, 4), np.uint8)
    two[:, 8:] = 255
    cases += [two, (rng.randint(0, 4, (12, 12, 4)) * 60
                    ).astype(np.uint8)]
    for img in cases:
        for kw in ({}, {"use_runs": False}, {"cache_bits": 4},
                   {"cache_bits": 8, "use_runs": False},
                   {"subtract_green": True},
                   {"subtract_green": True, "cache_bits": 5}):
            # (palette needs 17-256 distinct colors; tested below)
            blob = vp8l.encode_vp8l(img, **kw)
            out = vp8l.decode_vp8l(_vp8l_payload(blob))
            assert out is not None and (out == img).all(), kw
            # the generic dispatcher takes the whole RIFF file
            assert (mm.decode_image_pixels(blob) == img).all()
            # header decode agrees on dims (VP8L 14-bit packed)
            wh = mm.parse_image_header(blob)
            assert wh is not None and (wh[0], wh[1]) == (
                img.shape[1], img.shape[0])


def test_vp8l_long_runs_cap_at_4096():
    # LZ77 runs longer than 4096 px must split into multiple backrefs
    # (length symbol 23 is the VP8L max); a solid 70x70 = 4899-px run
    # previously emitted green symbol 280, aliasing the color cache
    import numpy as np
    from tempeh_parser_ray.functions import vp8l

    for cb in (0, 5):
        for sz in (70, 100):
            img = np.full((sz, sz, 4), 77, np.uint8)
            img[..., 3] = 255
            blob = vp8l.encode_vp8l(img, use_runs=True, cache_bits=cb)
            out = vp8l.decode_vp8l(_vp8l_payload(blob))
            assert out is not None and (out == img).all(), (cb, sz)
    # >4096 run embedded mid-image, remainder 1-2 px falls to literals
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (80, 80, 4), dtype=np.uint8)
    img[10:75] = 123
    for cb in (0, 4):
        blob = vp8l.encode_vp8l(img, use_runs=True, cache_bits=cb)
        out = vp8l.decode_vp8l(_vp8l_payload(blob))
        assert out is not None and (out == img).all(), cb


def test_vp8l_palette_round_trips():
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm
    from tempeh_parser_ray.functions import vp8l

    rng = np.random.RandomState(11)
    pal_colors = rng.randint(0, 256, (40, 4)).astype(np.uint8)
    img = pal_colors[rng.randint(0, 40, (15, 18))]
    for kw in ({"palette": True}, {"palette": True, "cache_bits": 5},
               {"palette": True, "use_runs": False}):
        blob = vp8l.encode_vp8l(img, **kw)
        out = vp8l.decode_vp8l(_vp8l_payload(blob))
        assert out is not None and (out == img).all(), kw
        assert (mm.decode_image_pixels(blob) == img).all()
    # boundary palette sizes
    for n in (17, 256):
        cols = (np.arange(n, dtype=np.uint32) * 7919 + 1)
        flat = cols[rng.randint(0, n, 12 * 22)]
        im = np.zeros((12, 22, 4), np.uint8)
        for ch, sh in ((0, 16), (1, 8), (2, 0), (3, 24)):
            im[:, :, ch] = ((flat >> sh) & 0xFF).reshape(12, 22)
        blob = vp8l.encode_vp8l(im, palette=True)
        out = vp8l.decode_vp8l(_vp8l_payload(blob))
        assert out is not None and (out == im).all(), n
    # small palettes BUNDLE multiple indices per coded green byte:
    # exercise every bundle width (1, 2 and 4 bits per pixel), odd
    # widths that leave a partial final packed byte, and 1-px rows
    for n_colors, shape in ((2, (9, 17)), (3, (5, 23)), (4, (1, 9)),
                            (5, (11, 13)), (16, (7, 31)),
                            (2, (6, 1)), (16, (3, 2))):
        cols = (np.arange(n_colors, dtype=np.uint32) * 104729 + 3)
        flat = cols[rng.randint(0, n_colors, shape[0] * shape[1])]
        im = np.zeros((*shape, 4), np.uint8)
        for ch, sh in ((0, 16), (1, 8), (2, 0), (3, 24)):
            im[:, :, ch] = ((flat >> sh) & 0xFF).reshape(shape)
        for kw in ({}, {"use_runs": False}, {"cache_bits": 3}):
            blob = vp8l.encode_vp8l(im, palette=True, **kw)
            out = vp8l.decode_vp8l(_vp8l_payload(blob))
            assert out is not None and (out == im).all(), \
                (n_colors, shape, kw)
            assert (mm.decode_image_pixels(blob) == im).all()


def test_vp8l_color_transform_round_trips():
    import numpy as np
    from tempeh_parser_ray.functions import vp8l

    rng = np.random.RandomState(17)
    for t in range(6):
        img = rng.randint(0, 256, (rng.randint(1, 40),
                                   rng.randint(1, 40), 4)
                          ).astype(np.uint8)
        for kw in ({"color": True}, {"color": True, "cache_bits": 4},
                   {"color": True, "use_runs": False}):
            blob = vp8l.encode_vp8l(img, **kw)
            out = vp8l.decode_vp8l(_vp8l_payload(blob))
            assert out is not None and (out == img).all(), (t, kw)
    # multi-block image exercises per-block transform elements
    g = rng.randint(0, 256, (37, 49, 4)).astype(np.uint8)
    blob = vp8l.encode_vp8l(g, color=True)
    out = vp8l.decode_vp8l(_vp8l_payload(blob))
    assert out is not None and (out == g).all()
    # non-vacuity: the flag must change the stream (a silent no-op
    # would round-trip trivially and test nothing)
    assert blob != vp8l.encode_vp8l(g)


def test_vp8l_entropy_image_round_trips():
    import numpy as np
    from tempeh_parser_ray.functions import vp8l

    rng = np.random.RandomState(19)
    for t in range(5):
        img = rng.randint(0, 256, (rng.randint(1, 36),
                                   rng.randint(1, 36), 4)
                          ).astype(np.uint8)
        for kw in ({"entropy_image": True},
                   {"entropy_image": True, "cache_bits": 4},
                   {"entropy_image": True, "use_runs": False},
                   {"entropy_image": True, "subtract_green": True},
                   {"entropy_image": True, "predictor": True}):
            blob = vp8l.encode_vp8l(img, **kw)
            out = vp8l.decode_vp8l(_vp8l_payload(blob))
            assert out is not None and (out == img).all(), (t, kw)
    # non-vacuity: the flag must change the stream (a silent no-op
    # would round-trip trivially and test nothing)
    g = rng.randint(0, 256, (24, 33, 4)).astype(np.uint8)
    assert (vp8l.encode_vp8l(g, entropy_image=True)
            != vp8l.encode_vp8l(g))


def test_vp8l_predictor_round_trips():
    import numpy as np
    from tempeh_parser_ray.functions import vp8l

    rng = np.random.RandomState(13)
    for t in range(8):
        img = rng.randint(0, 256, (rng.randint(1, 40),
                                   rng.randint(1, 40), 4)
                          ).astype(np.uint8)
        for kw in ({"predictor": True},
                   {"predictor": True, "cache_bits": 4},
                   {"predictor": True, "use_runs": False}):
            blob = vp8l.encode_vp8l(img, **kw)
            out = vp8l.decode_vp8l(_vp8l_payload(blob))
            assert out is not None and (out == img).all(), (t, kw)
    # multi-block images exercise the mode sub-image (16x16 blocks)
    g = np.zeros((33, 47, 4), np.uint8)
    for ch in range(4):
        g[:, :, ch] = (np.arange(47)[None, :] * 2
                       + np.arange(33)[:, None] * 3 + ch) % 256
    blob = vp8l.encode_vp8l(g, predictor=True)
    out = vp8l.decode_vp8l(_vp8l_payload(blob))
    assert out is not None and (out == g).all()


def test_vp8l_hostile_inputs_never_crash():
    import numpy as np
    from tempeh_parser_ray.functions import vp8l

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (11, 14, 4)).astype(np.uint8)
    payload = _vp8l_payload(vp8l.encode_vp8l(img, cache_bits=5))
    for cut in range(0, len(payload), 7):
        vp8l.decode_vp8l(payload[:cut])          # must not raise
    for pos in range(0, len(payload), 11):
        b = bytearray(payload)
        b[pos] ^= 0xA5
        vp8l.decode_vp8l(bytes(b))
    # wrong signature / version / transform-present bits
    assert vp8l.decode_vp8l(b"") is None
    assert vp8l.decode_vp8l(b"\x00" * 10) is None


def test_bmp_variants_round_trip():
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    rng = np.random.RandomState(1)
    for h, w in ((1, 1), (7, 9), (5, 4)):
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for enc in (lambda i: mm.encode_bmp24(i),
                    lambda i: mm.encode_bmp24(i, top_down=True),
                    lambda i: mm.encode_bmp32(i),
                    lambda i: mm.encode_bmp32(i, top_down=True)):
            got = mm.decode_image_pixels(enc(img))
            assert got is not None and (got == img).all(), (h, w)


def test_png_palette_round_trip_and_bounds():
    import numpy as np
    import pytest
    from tempeh_parser_ray.functions import multimodal as mm

    rng = np.random.RandomState(1)
    img = (rng.randint(0, 6, (9, 11, 3)) * 40).astype(np.uint8)
    for fm in ("cycle", "none"):
        got = mm.decode_image_pixels(
            mm.encode_png(img, palette=True, filter_mode=fm))
        assert (got == img).all()
    with pytest.raises(ValueError):
        mm.encode_png(rng.randint(0, 256, (32, 32, 3)
                                  ).astype(np.uint8), palette=True)
    # hostile: index beyond PLTE must return None, not crash
    blob = bytearray(mm.encode_png(img, palette=True))
    # find PLTE and truncate it to 1 entry (3 bytes): rewrite length
    p = blob.index(b"PLTE") - 4
    import struct, zlib as _z
    old_len = int.from_bytes(blob[p:p + 4], "big")
    data = bytes(blob[p + 8:p + 8 + 3])
    new_chunk = (3).to_bytes(4, "big") + b"PLTE" + data + \
        _z.crc32(b"PLTE" + data).to_bytes(4, "big")
    blob2 = bytes(blob[:p]) + new_chunk + bytes(blob[p + 12 + old_len:])
    assert mm.decode_image_pixels(blob2) is None


def test_gif_interlace_round_trip():
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    rng = np.random.RandomState(1)
    for h in (1, 2, 5, 8, 9, 13, 17):
        img = (rng.randint(0, 5, (h, 11, 3)) * 50).astype(np.uint8)
        got = mm.decode_image_pixels(mm.encode_gif(img, interlace=True))
        assert got is not None and (got == img).all(), h


def test_wav_pcm_depths_round_trip():
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    rng = np.random.RandomState(2)
    s16 = rng.randint(-2048, 2048, 200)
    for bits in (16, 24):
        out = mm.parse_wav_pcm(mm.encode_wav_pcm(s16, bits=bits))
        assert out is not None and out[2] == bits \
            and (out[3] == s16).all(), bits
    s8 = rng.randint(-128, 128, 150)
    out = mm.parse_wav_pcm(mm.encode_wav_pcm(s8, bits=8))
    assert out is not None and out[2] == 8 and (out[3] == s8).all()
    # 24-bit sign extremes
    ext = np.asarray([-(1 << 23), (1 << 23) - 1, -1, 0, 1])
    out = mm.parse_wav_pcm(mm.encode_wav_pcm(ext, bits=24))
    assert (out[3] == ext).all()
    # legacy wrapper: 16-bit only
    assert mm.parse_wav_pcm16(mm.encode_wav_pcm(s8, bits=8)) is None
    r = mm.parse_wav_pcm16(mm.encode_wav_pcm16(s16.astype(np.int16)))
    assert r is not None and (r[2] == s16).all()
    # hostile: truncated data chunks never raise
    blob = mm.encode_wav_pcm(s16, bits=24)
    for cut in range(0, len(blob), 17):
        mm.parse_wav_pcm(blob[:cut])


def test_mp4_track_inventory():
    from tempeh_parser_ray.functions import multimodal as mm

    blob = mm.encode_mp4_stub(timescale=1000, duration=5,
                              handlers=("vide", "soun", "vide"))
    assert mm.parse_mp4_tracks(blob) == ["vide", "soun", "vide"]
    assert mm.parse_mp4_mvhd(blob) is not None  # mvhd still reachable
    assert mm.parse_mp4_tracks(
        mm.encode_mp4_stub(timescale=1, duration=1)) == []
    assert mm.parse_mp4_tracks(b"garbage") is None
    for cut in range(0, len(blob), 9):
        mm.parse_mp4_tracks(blob[:cut])  # must not raise


def test_jpeg_420_progressive_matches_baseline():
    """Progressive 4:2:0 streams (MCU-interleaved DC scans including
    dummy blocks, per-component non-padded AC rasters, with and
    without SA refinement) decode pixel-identical to the baseline
    4:2:0 stream of the same coefficients — non-trivial quant tables
    so zigzag/dequant/traversal bugs cannot hide."""
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    rng = np.random.RandomState(11)
    for t in range(30):
        ycc = rng.randint(0, 256, (rng.randint(1, 40),
                                   rng.randint(1, 40), 3)
                          ).astype(np.uint8)
        q = np.clip(rng.randint(1, 12, (8, 8)), 1, None)
        base = mm.decode_jpeg(mm.encode_jpeg_color(
            ycc, q_table=q, subsample=True))
        prog = mm.decode_jpeg(mm.encode_jpeg_color_progressive(
            ycc, q_table=q, successive=bool(t % 2), subsample=True))
        assert prog is not None and (prog == base).all(), t


def test_jpeg_420_progressive_round_trip_bit_exact():
    """Per-16x16-constant planes with all-ones quant round-trip the
    progressive 4:2:0 path bit-exactly against the closed form
    (chroma top-left-of-2x2 then replication upsample) — the same
    invariant image_pixel_stats_color's oracle relies on."""
    import numpy as np
    from tempeh_parser_ray.functions import multimodal as mm

    for d, (h, w) in enumerate([(16, 16), (3, 5), (17, 33), (24, 24),
                                (15, 31), (1, 1), (40, 9)]):
        bx = (np.arange(w) // 16)[None, :]
        by = (np.arange(h) // 16)[:, None]
        ycc = np.stack([(5 * bx + 9 * by + 3 * d) % 256,
                        (7 * bx + 11 * by + d) % 256,
                        (13 * bx + 17 * by + 5 * d) % 256],
                       axis=-1).astype(np.uint8)
        blob = mm.encode_jpeg_color_progressive(
            ycc, successive=bool(d % 2), subsample=True)
        out = mm.decode_jpeg(blob)
        y = ycc[:, :, 0]
        cb = np.repeat(np.repeat(ycc[::2, ::2, 1], 2, 0), 2, 1)[:h, :w]
        cr = np.repeat(np.repeat(ycc[::2, ::2, 2], 2, 0), 2, 1)[:h, :w]
        exp = mm._ycbcr_to_rgb(np.stack([y, cb, cr], axis=-1))
        assert out is not None and np.array_equal(out, exp), (h, w)
        # truncation/hostile sweep: never crash
        for cut in range(2, len(blob), 37):
            mm.decode_jpeg(blob[:cut])

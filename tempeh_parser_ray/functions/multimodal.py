"""Multimodal (image/audio/video) column plumbing + REAL
dependency-free codecs.

Media payloads are opaque ``binary`` columns with typed metadata; every
transform is an actor-pool ``map_batches`` stage whose Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is real and
tested. The codec layer is REAL wherever the published formats need no
external library — container-header decode for PNG/GIF/JPEG/BMP/WebP
dims, full PIXEL decode for 8-bit PNG (stdlib zlib + all five row
unfilters + indexed PLTE) and uncompressed BMP (24/32-bit, bottom-up
AND top-down), nearest-neighbor resize, WAV PCM 8/16/24-bit
sample decode (RIFF walk + int16 LE), and MP4 ``moov/mvhd`` duration
(versions 0/1) — each verified bit-for-bit against closed-form SQL
oracles plus encode->decode round-trip pytests. GIF pixels decode too
(an in-repo LZW inflate, sequential AND 4-pass interlaced), and JPEG
gets a REAL transform decode —
baseline sequential grayscale, 4:4:4 color, 4:2:0 subsampled color,
AND full progressive (SOF2) grayscale — spectral selection, EOBn
runs, AND successive-approximation refinement scans with correction
bits (marker parse, canonical Huffman, dequantize, dezigzag, 2-D
IDCT, fixed-point BT.601 conversion — see the JPEG section at the
bottom) — progressive covers COLOR frames too (interleaved DC scans,
per-component AC scans) at BOTH 1x1 and standard 4:2:0 sampling
(MCU-interleaved DC traversal with dummy blocks, per-component
non-padded AC rasters, replication upsample). Lossy-WebP VP8 intra
keyframes decode through functions/vp8.py (RFC 6386 bool coder,
token trees, exact fixed-point WHT/IDCT, whole-block intra
prediction). Payloads outside every tier (interframes, B_PRED,
arithmetic-coded JPEG, ...) fall back to deterministic byte-level
features behind the ``try: import PIL`` gate (``strict=True``
raises ``NotImplementedError``).

Batch-size guidance baked into the stage defaults: media batches should
be sized by BYTES not rows (reuse ``stages.rebatch`` with the media
column) so a 4K image batch and a favicon batch cost the same memory.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media", pa.binary()),
    ("media_type", pa.string()),  # e.g. "image/png", "audio/wav"
])


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # by PNG color type


def parse_image_header(blob: bytes
                       ) -> Optional[tuple[int, int, int, str]]:
    """REAL (dependency-free) container-header decode: (width, height,
    channels, format) for PNG / GIF / JPEG / BMP / WebP payloads,
    ``None`` for anything else. WebP covers all three container
    layouts: extended (VP8X: 24-bit canvas-minus-one dims, alpha flag
    0x10), lossless (VP8L: 14-bit packed dims + alpha bit) and lossy
    (VP8: sync code + 14-bit dims). Pure byte parsing of the published
    container specs — no codec library needed for dimensions/metadata,
    which is what the 100 TB filtering/statistics pipelines actually
    consume; full pixel decode still needs PIL (gated in
    :class:`DecodeImageBatch`)."""
    n = len(blob)
    if n >= 26 and blob[:8] == b"\x89PNG\r\n\x1a\n" \
            and blob[12:16] == b"IHDR":
        w = int.from_bytes(blob[16:20], "big")
        h = int.from_bytes(blob[20:24], "big")
        color_type = blob[25]
        return w, h, _PNG_CHANNELS.get(color_type, 3), "png"
    if n >= 10 and blob[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(blob[6:8], "little")
        h = int.from_bytes(blob[8:10], "little")
        return w, h, 3, "gif"
    if n >= 4 and blob[:2] == b"\xff\xd8":
        # scan JPEG markers for a start-of-frame segment
        p = 2
        while p + 9 <= n:
            if blob[p] != 0xFF:
                break
            marker = blob[p + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                p += 2
                continue
            seg_len = int.from_bytes(blob[p + 2:p + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(blob[p + 5:p + 7], "big")
                w = int.from_bytes(blob[p + 7:p + 9], "big")
                return w, h, blob[p + 9], "jpeg"
            p += 2 + seg_len
        return None
    if n >= 26 and blob[:2] == b"BM":
        w = int.from_bytes(blob[18:22], "little", signed=True)
        h = int.from_bytes(blob[22:26], "little", signed=True)
        return w, abs(h), 3, "bmp"
    if n >= 21 and blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        fourcc = blob[12:16]
        if fourcc == b"VP8X" and n >= 30:
            # extended header: flags byte (ALPHA_FLAG=0x10), 3 reserved
            # bytes, then 24-bit little-endian canvas dims minus one
            alpha = blob[20] & 0x10
            w = 1 + int.from_bytes(blob[24:27], "little")
            h = 1 + int.from_bytes(blob[27:30], "little")
            return w, h, 4 if alpha else 3, "webp"
        if fourcc == b"VP8L" and n >= 25 and blob[20] == 0x2F:
            # lossless: signature 0x2F then 14-bit w-1, 14-bit h-1,
            # 1-bit alpha, 3-bit version packed little-endian
            bits = int.from_bytes(blob[21:25], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return w, h, 4 if (bits >> 28) & 1 else 3, "webp"
        if fourcc == b"VP8 " and n >= 30 \
                and blob[23:26] == b"\x9d\x01\x2a":
            # lossy: 3-byte frame tag, sync code, 14-bit dims (upper
            # 2 bits of each uint16 are scaling hints)
            w = int.from_bytes(blob[26:28], "little") & 0x3FFF
            h = int.from_bytes(blob[28:30], "little") & 0x3FFF
            return w, h, 3, "webp"
        return None
    return None


class DecodeImageBatch:
    """Actor-pool stage: media binary -> (width, height, channels,
    features[16]). Decode preference: Pillow when present (unless
    ``prefer_builtin``), else the in-repo dependency-free codecs,
    else real header parse + byte features, else a documented stub.

    ``prefer_builtin=True`` pins the in-repo codec branch so output
    is ENVIRONMENT-INDEPENDENT — required by callers with bit-exact
    oracles (PIL's palette-GIF handling reports 1 channel over
    palette indices where the in-repo decoder materializes RGB, and
    PIL builds without WebP support reject the VP8L rows)."""

    def __init__(self, strict: bool = False, media_col: str = "media",
                 id_col: str = "media_id", prefer_builtin: bool = False):
        self.media_col = media_col
        self.id_col = id_col
        if prefer_builtin:
            self._pil = False
            return
        try:
            import PIL.Image  # noqa: F401
            self._pil = True
        except ImportError:
            self._pil = False
            if strict:
                raise NotImplementedError(
                    "image decode requires Pillow, which is not available "
                    "in this environment; run with strict=False for the "
                    "deterministic byte-feature stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.media_col).to_pylist()
        widths, heights, channels = [], [], []
        feats: list[list[float]] = []
        for blob in blobs:
            blob = blob or b""
            if self._pil:  # pragma: no cover - library absent here
                import io

                import PIL.Image
                img = PIL.Image.open(io.BytesIO(blob))
                widths.append(img.width)
                heights.append(img.height)
                channels.append(len(img.getbands()))
                arr = np.asarray(img, dtype=np.float64).ravel()
                hist, _ = np.histogram(arr, bins=16, range=(0, 255))
            elif (img := decode_image_pixels(blob)) is not None:
                # REAL pixel decode (dependency-free PNG/BMP24 codec
                # below): true dims + a histogram over DECODED pixels
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                channels.append(img.shape[2])
                hist, _ = np.histogram(img.ravel(), bins=16,
                                       range=(0, 256))
            elif (hdr := parse_image_header(blob)) is not None:
                # REAL container-header decode (PNG/GIF/JPEG/BMP dims
                # need no codec library); byte-histogram features.
                widths.append(hdr[0])
                heights.append(hdr[1])
                channels.append(hdr[2])
                arr = np.frombuffer(blob, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=16, range=(0, 256))
            else:
                # STUB decode: deterministic pseudo-dimensions from the
                # payload length; REAL byte-histogram features.
                widths.append(int(len(blob) ** 0.5) or 1)
                heights.append((len(blob) // max(1, int(len(blob) ** 0.5))) or 1)
                channels.append(3)
                arr = np.frombuffer(blob, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=16, range=(0, 256))
            total = hist.sum()
            feats.append((hist / total if total else hist).astype(
                np.float64).tolist())
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "channels": pa.array(channels, pa.int32()),
            "byte_features": pa.array(feats, pa.list_(pa.float64(), 16)),
            "n_bytes": pa.array([len(b or b"") for b in blobs], pa.int64()),
        })


class FrameSampleBatch:
    """Video frame sampling stub: emits deterministic byte-range "frame"
    offsets (every ``stride`` bytes, up to ``max_frames``) — the real
    implementation would seek containers via av/ffmpeg (absent here).
    The output layout (one list<struct> per row) is the real contract."""

    def __init__(self, stride: int = 1024, max_frames: int = 8,
                 media_col: str = "media", id_col: str = "media_id"):
        self.stride = stride
        self.max_frames = max_frames
        self.media_col = media_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.media_col).to_pylist()
        offsets = [0]
        starts: list[int] = []
        ends: list[int] = []
        for blob in blobs:
            n = len(blob or b"")
            count = 0
            p = 0
            while p < n and count < self.max_frames:
                starts.append(p)
                ends.append(min(n, p + self.stride))
                p += self.stride
                count += 1
            offsets.append(len(starts))
        frame_struct = pa.StructArray.from_arrays(
            [pa.array(starts, pa.int64()), pa.array(ends, pa.int64())],
            names=["start", "end"])
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "frames": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), frame_struct),
            "n_bytes": pa.array([len(b or b"") for b in blobs], pa.int64()),
        })


class ResizeStubBatch:
    """EXPLICIT FALLBACK stage (not the real operator — that is
    :class:`ResizeImageBatch` below, which runs the dependency-free
    pixel codecs): deterministic byte-stride stand-in for payloads no
    codec covers — strides the byte stream so output size is exactly
    ``target*target*channels`` bytes (zero-padded when the source is
    smaller)."""

    def __init__(self, target: int = 64, channels: int = 3,
                 media_col: str = "media", id_col: str = "media_id"):
        self.target = target
        self.channels = channels
        self.media_col = media_col
        self.id_col = id_col
        self.out_bytes = target * target * channels

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for cell in batch.column(self.media_col).to_pylist():
            data = cell or b""
            if len(data) >= self.out_bytes:
                idx = np.linspace(0, len(data) - 1, self.out_bytes,
                                  dtype=np.int64)
                arr = np.frombuffer(data, dtype=np.uint8)[idx]
                out.append(arr.tobytes())
            else:
                out.append(data + b"\x00" * (self.out_bytes - len(data)))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "resized": pa.array(out, pa.binary()),
            "width": pa.array([self.target] * batch.num_rows, pa.int32()),
            "height": pa.array([self.target] * batch.num_rows, pa.int32()),
            "channels": pa.array([self.channels] * batch.num_rows,
                                 pa.int32()),
            "n_bytes_out": pa.array([self.out_bytes] * batch.num_rows,
                                    pa.int64()),
        })


class AudioFeatureStubBatch:
    """EXPLICIT FALLBACK stage (not the real operator — that is
    :class:`AudioFrameEnergyBatch` below, which parses real WAV PCM):
    deterministic byte-window stand-in for payloads ``parse_wav_pcm``
    cannot decode — frames the raw byte stream into fixed windows and
    emits one mean-byte 'energy' per window."""

    def __init__(self, window: int = 256, max_windows: int = 64,
                 media_col: str = "media", id_col: str = "media_id"):
        self.window = window
        self.max_windows = max_windows
        self.media_col = media_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: list[list[float]] = []
        n_windows: list[int] = []
        n_bytes: list[int] = []
        for cell in batch.column(self.media_col).to_pylist():
            data = cell or b""
            n_bytes.append(len(data))
            arr = np.frombuffer(data, dtype=np.uint8)
            k = min(self.max_windows,
                    max(0, -(-len(arr) // self.window)))
            vals = []
            for w in range(k):
                chunk = arr[w * self.window:(w + 1) * self.window]
                vals.append(float(chunk.mean()) if len(chunk) else 0.0)
            feats.append(vals)
            n_windows.append(k)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "frame_energy": pa.array(feats, pa.list_(pa.float64())),
            "n_windows": pa.array(n_windows, pa.int64()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
        })


# --- REAL dependency-free pixel codec (PNG + BMP24) ----------------------
#
# The container ships no image library, but PNG's pixel layer needs only
# stdlib zlib + the five published row filters, and uncompressed 24-bit
# BMP is a numpy reshape — so the decode/resize path below is REAL pixel
# math, not a stub: bytes in, (h, w, c) uint8 array out, verified
# end-to-end by a closed-form SQL oracle over deterministic test images
# (queries.image_pixel_stats) and an encode->decode round-trip pytest.
# GIF/JPEG/WebP pixel layers still need entropy coders (LZW/DCT) and
# remain header-only.

import zlib


def _png_unfilter(raw: bytes, w: int, h: int, c: int) -> np.ndarray:
    """Undo PNG row filtering (types 0-4) on decompressed IDAT bytes.
    Filters 0/1/2 cover the vectorizable hot path (cumsum / row add);
    3/4 fall back to a per-pixel scan (correct, rare in our inputs)."""
    stride = w * c
    out = np.zeros((h, stride), np.int32)
    raw_a = np.frombuffer(raw, np.uint8).astype(np.int32)
    if len(raw_a) != h * (stride + 1):
        raise ValueError("PNG pixel payload has wrong length")
    rows = raw_a.reshape(h, stride + 1)
    for y in range(h):
        f, cur = int(rows[y, 0]), rows[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: + left  => per-lane cumsum mod 256
            out[y] = np.cumsum(cur.reshape(w, c), axis=0).reshape(-1) % 256
        elif f == 2:  # Up: + above
            out[y] = (cur + prev) % 256
        elif f == 3:  # Average: + (left + above) // 2  (left-sequential)
            row = out[y]
            for x in range(w):
                left = row[(x - 1) * c:x * c] if x else np.zeros(c, np.int32)
                s = x * c
                row[s:s + c] = (cur[s:s + c]
                                + (left + prev[s:s + c]) // 2) % 256
        elif f == 4:  # Paeth predictor (left-sequential)
            row = out[y]
            zc = np.zeros(c, np.int32)
            for x in range(w):
                s = x * c
                a = row[s - c:s] if x else zc
                b = prev[s:s + c]
                d = prev[s - c:s] if x else zc
                p = a + b - d
                pa_, pb, pd = np.abs(p - a), np.abs(p - b), np.abs(p - d)
                pred = np.where((pa_ <= pb) & (pa_ <= pd), a,
                                np.where(pb <= pd, b, d))
                row[s:s + c] = (cur[s:s + c] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, c)


def decode_image_pixels(blob: bytes) -> Optional[np.ndarray]:
    """REAL pixel decode -> (h, w, channels) uint8, or ``None`` when the
    payload is not an 8-bit non-interlaced gray/RGB/RGBA PNG, a
    global-palette non-interlaced GIF (real LZW inflate below), an
    uncompressed bottom-up 24-bit BMP, a JPEG in the decoded tiers
    (baseline gray/4:4:4/4:2:0, progressive gray/color), a WebP-
    lossless VP8L stream (functions/vp8l.py), or a lossy-WebP VP8
    intra keyframe (functions/vp8.py — decoded to RGB through the
    shared fixed-point BT.601 conversion after replication upsample,
    like the JPEG color tiers; callers fall back to the header/stub
    path)."""
    n = len(blob)
    if n >= 21 and blob[:4] == b"RIFF" and blob[8:12] == b"WEBP" \
            and blob[12:16] == b"VP8L":
        from . import vp8l as _vp8l
        ln = int.from_bytes(blob[16:20], "little")
        return _vp8l.decode_vp8l(blob[20:20 + ln])
    if n >= 21 and blob[:4] == b"RIFF" and blob[8:12] == b"WEBP" \
            and blob[12:16] == b"VP8 ":
        from . import vp8 as _vp8
        ln = int.from_bytes(blob[16:20], "little")
        ycc = _vp8.decode_vp8(blob[20:20 + ln])
        return None if ycc is None else _ycbcr_to_rgb(ycc)
    if n >= 4 and blob[:2] == b"\xff\xd8":
        return decode_jpeg(blob)
    if n > 45 and blob[:8] == b"\x89PNG\r\n\x1a\n":
        w = int.from_bytes(blob[16:20], "big")
        h = int.from_bytes(blob[20:24], "big")
        depth, ct, il = blob[24], blob[25], blob[28]
        if depth != 8 or ct not in (0, 2, 3, 6) or il != 0 \
                or not (w and h):
            return None
        c = {0: 1, 2: 3, 3: 1, 6: 4}[ct]
        idat = b""
        plte: Optional[np.ndarray] = None
        p = 8
        while p + 8 <= n:
            ln = int.from_bytes(blob[p:p + 4], "big")
            typ = blob[p + 4:p + 8]
            if typ == b"IDAT":
                idat += blob[p + 8:p + 8 + ln]
            elif typ == b"PLTE":
                if ln % 3 or ln > 768:
                    return None
                plte = np.frombuffer(
                    blob, np.uint8, count=ln,
                    offset=p + 8).reshape(-1, 3)
            elif typ == b"IEND":
                break
            p += 12 + ln
        if not idat or (ct == 3 and plte is None):
            return None
        try:
            img = _png_unfilter(zlib.decompress(idat), w, h, c)
        except (zlib.error, ValueError):
            return None
        if ct == 3:                              # palette lookup
            idx = img[:, :, 0].astype(np.int64)
            if int(idx.max(initial=0)) >= len(plte):
                return None
            img = plte[idx]
        return img
    if n >= 13 and blob[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(blob)
    if n >= 54 and blob[:2] == b"BM":
        off = int.from_bytes(blob[10:14], "little")
        w = int.from_bytes(blob[18:22], "little", signed=True)
        h = int.from_bytes(blob[22:26], "little", signed=True)
        bpp = int.from_bytes(blob[28:30], "little")
        comp = int.from_bytes(blob[30:34], "little")
        if bpp not in (24, 32) or comp != 0 or w <= 0 or h == 0:
            return None
        nb = bpp // 8
        flip = h > 0                       # positive h = bottom-up
        h = abs(h)
        stride = (w * nb + 3) & ~3
        if off + stride * h > n:
            return None
        rows = np.frombuffer(blob, np.uint8,
                             count=stride * h, offset=off)
        img = rows.reshape(h, stride)[:, :w * nb].reshape(h, w, nb)
        img = img[::-1] if flip else img
        # BGR(X) -> RGB; the 32-bit X byte is padding per BI_RGB
        return img[:, :, 2::-1].copy()
    return None


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """REAL nearest-neighbor resize: out[y, x] = in[(y*h)//th, (x*w)//tw]
    (pure integer index math, matching the SQL oracle's closed form)."""
    h, w = img.shape[:2]
    yi = (np.arange(th, dtype=np.int64) * h) // th
    xi = (np.arange(tw, dtype=np.int64) * w) // tw
    return img[yi][:, xi]


class ResizeImageBatch:
    """Actor-pool stage: REAL pixel decode (``decode_image_pixels`` —
    PNG/BMP/GIF/JPEG/WebP-VP8L/VP8 tiers) + nearest-neighbor resize to
    ``(target, target)``; emits the resized pixel bytes, true source
    channel count and the integer resized pixel sum (SQL-checkable
    closed form). Undecodable payloads raise ``ValueError`` unless
    ``fallback_stub=True``, which degrades that row to the documented
    :class:`ResizeStubBatch` byte-striding semantics at
    ``fallback_channels`` (the stub's default 3, so the emitted
    byte count is ``target*target*fallback_channels`` exactly like
    the stub; the ``channels`` COLUMN is 0 to mark the fallback
    row)."""

    def __init__(self, target: int = 64, media_col: str = "media",
                 id_col: str = "media_id", fallback_stub: bool = False,
                 fallback_channels: int = 3):
        self.target = target
        self.media_col = media_col
        self.id_col = id_col
        self.fallback_stub = fallback_stub
        self.fallback_channels = fallback_channels

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        out: list[bytes] = []
        chans: list[int] = []
        sums: list[int] = []
        for cell in batch.column(self.media_col).to_pylist():
            img = decode_image_pixels(cell or b"")
            if img is None:
                if not self.fallback_stub:
                    raise ValueError(
                        "undecodable media payload; pass "
                        "fallback_stub=True for byte-striding output")
                data = cell or b""
                want = t * t * self.fallback_channels
                if len(data) >= want:
                    idx = np.linspace(0, len(data) - 1, want,
                                      dtype=np.int64)
                    r = np.frombuffer(data, np.uint8)[idx]
                else:
                    r = np.frombuffer(
                        data + b"\x00" * (want - len(data)), np.uint8)
                out.append(r.tobytes())
                chans.append(0)
                sums.append(int(r.astype(np.int64).sum()))
                continue
            r = resize_nearest(img, t, t)
            out.append(r.tobytes())
            chans.append(img.shape[2])
            sums.append(int(r.astype(np.int64).sum()))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "resized": pa.array(out, pa.binary()),
            "width": pa.array([t] * batch.num_rows, pa.int32()),
            "height": pa.array([t] * batch.num_rows, pa.int32()),
            "channels": pa.array(chans, pa.int32()),
            "n_bytes_out": pa.array([len(b) for b in out], pa.int64()),
            "resized_sum": pa.array(sums, pa.int64()),
        })


class AudioFrameEnergyBatch:
    """Actor-pool stage: REAL WAV PCM parse (``parse_wav_pcm`` — 8/16/
    24-bit RIFF walk) + per-window integer energy (sum of |sample| per
    ``window``-sample frame) — the librosa-RMS shape with an exact
    closed form. Non-PCM payloads raise ``ValueError`` unless
    ``fallback_stub=True``, which degrades that row to
    :class:`AudioFeatureStubBatch`'s shape: FLOOR of the per-window
    mean BYTE (so fallback magnitudes sit on the stub's 0-255 scale,
    as integers to share the ``frame_energy`` list<int64> column),
    capped at ``max_windows`` like the stub; sample_rate=0 marks the
    fallback and ``n_samples`` then counts raw bytes."""

    def __init__(self, window: int = 64, media_col: str = "media",
                 id_col: str = "media_id", fallback_stub: bool = False,
                 max_windows: int = 64):
        self.window = window
        self.media_col = media_col
        self.id_col = id_col
        self.fallback_stub = fallback_stub
        self.max_windows = max_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = self.window
        rates: list[int] = []
        counts: list[int] = []
        feats: list[list[int]] = []
        for cell in batch.column(self.media_col).to_pylist():
            parsed = parse_wav_pcm(cell or b"")
            if parsed is None:
                if not self.fallback_stub:
                    raise ValueError(
                        "non-PCM media payload; pass fallback_stub="
                        "True for byte-window output")
                arr = np.frombuffer(cell or b"", np.uint8)
                k = min(self.max_windows, max(0, -(-len(arr) // w)))
                feats.append([int(arr[i * w:(i + 1) * w]
                                  .astype(np.int64).sum()
                                  // len(arr[i * w:(i + 1) * w]))
                              for i in range(k)])
                rates.append(0)
                counts.append(len(arr))
                continue
            rate, _ch, _bits, s = parsed
            a = np.abs(s.astype(np.int64))
            k = -(-len(a) // w) if len(a) else 0
            feats.append([int(a[i * w:(i + 1) * w].sum())
                          for i in range(k)])
            rates.append(rate)
            counts.append(len(a))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "sample_rate": pa.array(rates, pa.int64()),
            "n_samples": pa.array(counts, pa.int64()),
            "n_windows": pa.array([len(f) for f in feats], pa.int64()),
            "frame_energy": pa.array(feats, pa.list_(pa.int64())),
        })


def _png_filter_row(recon: np.ndarray, prev: np.ndarray, f: int,
                    c: int) -> np.ndarray:
    """Apply PNG filter ``f`` to a reconstructed row (encoder side)."""
    w = len(recon) // c
    left = np.zeros_like(recon)
    left[c:] = recon[:-c]
    if f == 0:
        return recon % 256
    if f == 1:
        return (recon - left) % 256
    if f == 2:
        return (recon - prev) % 256
    if f == 3:
        return (recon - (left + prev) // 2) % 256
    if f == 4:
        up_left = np.zeros_like(prev)
        up_left[c:] = prev[:-c]
        p = left + prev - up_left
        pa_, pb, pd = (np.abs(p - left), np.abs(p - prev),
                       np.abs(p - up_left))
        pred = np.where((pa_ <= pb) & (pa_ <= pd), left,
                        np.where(pb <= pd, prev, up_left))
        return (recon - pred) % 256
    raise ValueError(f)


def encode_png(img: np.ndarray, *, filter_mode: str = "cycle",
               palette: bool = False) -> bytes:
    """Minimal REAL PNG encoder (8-bit gray/RGB/RGBA, non-interlaced)
    for deterministic test/synthetic payloads. ``filter_mode='cycle'``
    applies filter type ``y % 5`` per row so decoders must implement
    ALL five unfilters; ``'none'`` writes filter 0 everywhere.
    ``palette=True`` writes an indexed (color-type 3) image with a
    PLTE chunk — requires RGB input with <= 256 distinct colors."""
    if img.ndim == 2:
        img = img[:, :, None]
    plte_bytes = b""
    if palette:
        h, w, c = img.shape
        assert c == 3, "palette PNG needs RGB input"
        flat = img.reshape(-1, 3)
        pal, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError("palette PNG needs <= 256 colors")
        plte_bytes = pal.astype(np.uint8).tobytes()
        img = inverse.astype(np.uint8).reshape(h, w, 1)
    h, w, c = img.shape
    ct = 3 if palette else {1: 0, 3: 2, 4: 6}[c]
    arr = img.astype(np.int32).reshape(h, w * c)
    lines = []
    for y in range(h):
        f = (y % 5) if filter_mode == "cycle" else 0
        prev = arr[y - 1] if y else np.zeros(w * c, np.int32)
        lines.append(bytes([f])
                     + _png_filter_row(arr[y], prev, f, c)
                     .astype(np.uint8).tobytes())
    raw = zlib.compress(b"".join(lines))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    import struct
    ihdr = struct.pack(">II5B", w, h, 8, ct, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte_bytes:
        out += chunk(b"PLTE", plte_bytes)
    return out + chunk(b"IDAT", raw) + chunk(b"IEND", b"")


def encode_bmp24(img: np.ndarray, *, top_down: bool = False) -> bytes:
    """Minimal REAL 24-bit BMP encoder (RGB in, BGR rows out, 4-byte
    row padding); ``top_down=True`` writes a NEGATIVE-height header
    with rows in natural order (the other legal row layout)."""
    import struct
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    src = img if top_down else img[::-1]
    rows[:, :w * 3] = src[:, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    off = 54
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w,
                            -h if top_down else h, 1, 24, 0,
                            len(data), 2835, 2835, 0, 0))
    return header + data


def encode_bmp32(img: np.ndarray, *, top_down: bool = False) -> bytes:
    """Minimal REAL 32-bit BI_RGB BMP encoder (BGRX rows, X = 0)."""
    import struct
    h, w, _ = img.shape
    rows = np.zeros((h, w, 4), np.uint8)
    src = img if top_down else img[::-1]
    rows[:, :, :3] = src[:, :, ::-1]
    data = rows.tobytes()
    off = 54
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w,
                            -h if top_down else h, 1, 32, 0,
                            len(data), 2835, 2835, 0, 0))
    return header + data


# --- REAL dependency-free audio codec (WAV PCM16) ------------------------


def parse_wav_pcm(blob: bytes
                  ) -> Optional[tuple[int, int, int, np.ndarray]]:
    """REAL WAV decode, no audio library: RIFF/WAVE container walk ->
    (sample_rate, n_channels, bits, sample array) for PCM
    (audio-format 1) payloads at 8 (unsigned, rebased to signed),
    16 or 24 bits; ``None`` for anything else (compressed / float WAV
    falls back to the byte-feature stub)."""
    n = len(blob)
    if n < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    rate = channels = bits = fmt = None
    data: Optional[bytes] = None
    p = 12
    while p + 8 <= n:
        cid = blob[p:p + 4]
        ln = int.from_bytes(blob[p + 4:p + 8], "little")
        body = blob[p + 8:p + 8 + ln]
        if cid == b"fmt " and len(body) >= 16:
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        p += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt != 1 or bits not in (8, 16, 24) or not channels \
            or not rate or data is None:
        return None
    if bits == 16:
        samples = np.frombuffer(
            data[:len(data) - (len(data) % 2)],
            dtype="<i2").astype(np.int32)
    elif bits == 8:                              # unsigned, bias 128
        samples = np.frombuffer(data, np.uint8).astype(np.int32) - 128
    else:                                        # 24-bit LE signed
        nb = len(data) - (len(data) % 3)
        raw = np.frombuffer(data[:nb], np.uint8).reshape(-1, 3)
        v = (raw[:, 0].astype(np.int32)
             | (raw[:, 1].astype(np.int32) << 8)
             | (raw[:, 2].astype(np.int32) << 16))
        samples = np.where(v >= (1 << 23), v - (1 << 24), v)
    return rate, channels, bits, samples


def parse_wav_pcm16(blob: bytes) -> Optional[tuple[int, int, np.ndarray]]:
    """16-bit-only wrapper (original contract)."""
    out = parse_wav_pcm(blob)
    if out is None or out[2] != 16:
        return None
    rate, channels, _, samples = out
    return rate, channels, samples.astype(np.int16)


def encode_wav_pcm16(samples: np.ndarray, *, rate: int = 16_000,
                     channels: int = 1) -> bytes:
    """Minimal REAL WAV writer (PCM16 little-endian) for deterministic
    test/synthetic payloads."""
    return encode_wav_pcm(samples, bits=16, rate=rate,
                          channels=channels)


def encode_wav_pcm(samples: np.ndarray, *, bits: int = 16,
                   rate: int = 16_000, channels: int = 1) -> bytes:
    """Minimal REAL WAV writer at 8 (unsigned), 16 or 24 bits."""
    import struct
    s = np.asarray(samples, np.int64)
    if bits == 16:
        data = s.astype("<i2").tobytes()
    elif bits == 8:
        data = (s + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        v = np.where(s < 0, s + (1 << 24), s).astype(np.uint32)
        raw = np.zeros((len(v), 3), np.uint8)
        raw[:, 0] = v & 0xFF
        raw[:, 1] = (v >> 8) & 0xFF
        raw[:, 2] = (v >> 16) & 0xFF
        data = raw.tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    nb = bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * nb, channels * nb, bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


# --- REAL dependency-free video metadata (MP4 mvhd) ----------------------


def parse_mp4_mvhd(blob: bytes) -> Optional[tuple[int, int, int]]:
    """REAL MP4 metadata decode: walk the top-level box tree to
    ``moov/mvhd`` and return (timescale, duration, duration_ms).
    Handles mvhd version 0 (32-bit) and 1 (64-bit). ``None`` when the
    payload is not an ISO-BMFF container (no ftyp/moov)."""
    n = len(blob)

    def walk(lo: int, hi: int, name: bytes) -> Optional[tuple[int, int]]:
        p = lo
        while p + 8 <= hi:
            ln = int.from_bytes(blob[p:p + 4], "big")
            typ = blob[p + 4:p + 8]
            if ln == 1:  # 64-bit largesize
                if p + 16 > hi:
                    return None
                ln = int.from_bytes(blob[p + 8:p + 16], "big")
                body = p + 16
            else:
                body = p + 8
            if ln < 8 or p + ln > hi:
                return None
            if typ == name:
                return body, p + ln
            p += ln
        return None

    if walk(0, n, b"ftyp") is None:
        return None
    moov = walk(0, n, b"moov")
    if moov is None:
        return None
    mvhd = walk(moov[0], moov[1], b"mvhd")
    if mvhd is None:
        return None
    b0 = mvhd[0]
    version = blob[b0]
    if version == 1:
        timescale = int.from_bytes(blob[b0 + 20:b0 + 24], "big")
        duration = int.from_bytes(blob[b0 + 24:b0 + 32], "big")
    else:
        timescale = int.from_bytes(blob[b0 + 12:b0 + 16], "big")
        duration = int.from_bytes(blob[b0 + 16:b0 + 20], "big")
    if not timescale:
        return None
    return timescale, duration, 1000 * duration // timescale


def parse_mp4_tracks(blob: bytes) -> Optional[list[str]]:
    """REAL MP4 track inventory: walk every ``moov/trak/mdia/hdlr``
    box and return the handler fourccs in file order (e.g.
    ``["vide", "soun"]``) — the track census a media-curation pipeline
    filters on before any sample decode. ``None`` for non-ISO-BMFF
    payloads; a valid container with no tracks yields ``[]``."""
    n = len(blob)

    def boxes(lo: int, hi: int):
        p = lo
        while p + 8 <= hi:
            ln = int.from_bytes(blob[p:p + 4], "big")
            typ = blob[p + 4:p + 8]
            if ln == 1:
                if p + 16 > hi:
                    return
                ln = int.from_bytes(blob[p + 8:p + 16], "big")
                body = p + 16
            else:
                body = p + 8
            if ln < 8 or p + ln > hi:
                return
            yield typ, body, p + ln
            p += ln

    if not any(t == b"ftyp" for t, _, _ in boxes(0, n)):
        return None
    out: list[str] = []
    for t, lo, hi in boxes(0, n):
        if t != b"moov":
            continue
        for t2, lo2, hi2 in boxes(lo, hi):
            if t2 != b"trak":
                continue
            for t3, lo3, hi3 in boxes(lo2, hi2):
                if t3 != b"mdia":
                    continue
                for t4, lo4, hi4 in boxes(lo3, hi3):
                    if t4 == b"hdlr" and lo4 + 12 <= hi4:
                        # fullbox: version/flags, pre_defined, handler
                        out.append(blob[lo4 + 8:lo4 + 12].decode(
                            "latin1"))
    return out


def _mp4_box(typ: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + typ + body


def encode_mp4_stub(*, timescale: int, duration: int,
                    version: int = 0,
                    handlers: tuple = ()) -> bytes:
    """Minimal REAL ISO-BMFF skeleton (ftyp + moov/mvhd, plus one
    trak/mdia/hdlr per entry of ``handlers``) carrying the given
    timescale/duration, for deterministic test payloads."""
    if version == 1:
        mvhd_body = (bytes([1, 0, 0, 0]) + b"\x00" * 16
                     + timescale.to_bytes(4, "big")
                     + duration.to_bytes(8, "big") + b"\x00" * 80)
    else:
        mvhd_body = (bytes([0, 0, 0, 0]) + b"\x00" * 8
                     + timescale.to_bytes(4, "big")
                     + duration.to_bytes(4, "big") + b"\x00" * 80)
    moov_inner = _mp4_box(b"mvhd", mvhd_body)
    for h in handlers:
        hdlr = _mp4_box(b"hdlr", b"\x00" * 8
                        + h.encode("latin1")[:4].ljust(4, b" ")
                        + b"\x00" * 12)
        moov_inner += _mp4_box(b"trak", _mp4_box(b"mdia", hdlr))
    ftyp_body = b"isom" + (0).to_bytes(4, "big") + b"isomiso2"
    return _mp4_box(b"ftyp", ftyp_body) + _mp4_box(b"moov", moov_inner)


# --- REAL dependency-free GIF codec (LZW) --------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, dict
    grows to 4095 then freezes until CLEAR."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    table: list[list[int]] = []

    def reset():
        nonlocal table, width
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    prev: list[int] | None = None
    while True:
        code = read(width)
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        else:
            break  # corrupt stream: stop gracefully
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Greedy LZW compressor matching ``_lzw_decode``'s growth rules."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []
    width = min_code_size + 1

    def emit(code: int):
        nonlocal width
        for i in range(width):
            out_bits.append((code >> i) & 1)

    table: dict[tuple[int, ...], int] = {
        (i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    cur: tuple[int, ...] = ()
    for sym in indices:
        cand = cur + (sym,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        # decoder adds an entry now; mirror its width bump
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                # decoder bumps width when ITS table hits 1<<width;
                # its table is one entry behind ours at read time
                width += 1
        else:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = (sym,)
    if cur:
        emit(table[cur])
    emit(eoi)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        b = 0
        for j, bit in enumerate(out_bits[i:i + 8]):
            b |= bit << j
        by.append(b)
    return bytes(by)


def decode_gif_pixels(blob: bytes) -> Optional[np.ndarray]:
    """REAL GIF pixel decode, no image library: logical screen
    descriptor -> global color table -> first image descriptor ->
    LZW-decompressed indices -> (h, w, 3) RGB. ``None`` for
    interlaced/local-palette images (rare in our corpus; they fall
    back to header-only)."""
    n = len(blob)
    if n < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    flags = blob[10]
    if not flags & 0x80:
        return None  # no global color table
    gct_size = 2 << (flags & 7)
    p = 13
    if n < p + gct_size * 3:
        return None  # truncated inside the global color table
    gct = np.frombuffer(blob, np.uint8, count=gct_size * 3,
                        offset=p).reshape(gct_size, 3)
    p += gct_size * 3
    while p < n:
        b0 = blob[p]
        if b0 == 0x21:  # extension: label + sub-blocks
            p += 2
            while p < n and blob[p]:
                p += 1 + blob[p]
            p += 1
        elif b0 == 0x2C:  # image descriptor
            if p + 11 > n:
                return None  # truncated descriptor
            w = int.from_bytes(blob[p + 5:p + 7], "little")
            h = int.from_bytes(blob[p + 7:p + 9], "little")
            iflags = blob[p + 9]
            if iflags & 0x80:  # local palette: out of tier
                return None
            interlaced = bool(iflags & 0x40)
            p += 10
            min_code = blob[p]
            if min_code > 11:
                return None  # corrupt: GIF code width caps at 12 bits
            p += 1
            data = bytearray()
            while p < n and blob[p]:
                ln = blob[p]
                data += blob[p + 1:p + 1 + ln]
                p += 1 + ln
            idx = _lzw_decode(bytes(data), min_code)
            if len(idx) < w * h:
                return None
            arr = np.asarray(idx[:w * h], np.int64)
            if (arr >= gct_size).any():
                return None
            img = gct[arr].reshape(h, w, 3).copy()
            if interlaced:                       # 4-pass deinterlace
                order = _gif_interlace_order(h)
                out = np.zeros_like(img)
                out[order] = img
                return out
            return img
        elif b0 == 0x3B:
            return None
        else:
            return None
    return None


def _gif_interlace_order(h: int) -> np.ndarray:
    """Row transmission order of the GIF 4-pass interlace: rows
    0,8,16.. then 4,12.. then 2,6,10.. then 1,3,5.."""
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


def encode_gif(img: np.ndarray, *, interlace: bool = False) -> bytes:
    """Minimal REAL GIF87a writer (single frame, 256-entry global
    palette built from the image's distinct colors — caller must use
    <= 256 distinct RGB colors); ``interlace=True`` transmits rows in
    the 4-pass interlaced order with the descriptor flag set."""
    import struct
    h, w, _ = img.shape
    if interlace:
        img = img[_gif_interlace_order(h)]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    gct_size = 1 << bits
    pal = np.zeros((gct_size, 3), np.uint8)
    pal[:len(palette)] = palette
    min_code = max(2, bits)
    lzw = _lzw_encode([int(i) for i in inverse], min_code)
    out = bytearray()
    out += b"GIF87a" + struct.pack("<HHBBB", w, h,
                                   0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                  0x40 if interlace else 0)
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


# --- baseline JPEG (grayscale, sequential DCT) ---------------------------
#
# REAL dependency-free baseline-JPEG codec closing the transform-coded
# tier: full marker parse (DQT/DHT/SOF0/SOS), canonical Huffman decode
# (DC categories + AC run/size RLE with EOB/ZRL), dequantize, dezigzag,
# orthonormal 2-D IDCT, level shift + clamp. Scope: 8-bit grayscale
# single-scan sequential (1x1 sampling) — progressive (SOF2), multi-
# component color, and restart markers return None (callers fall back
# to the header/stub path). The paired encoder emits spec-valid JFIF
# streams (byte stuffing, canonical DHT, edge-replicated padding) so
# round-trip and closed-form-oracle tests need no image library.
# Per ITU T.81; per-8x8-constant blocks with an all-ones quant table
# round-trip BIT-EXACTLY (all AC coefficients are exact zeros and the
# DC path is integer), which is what the SQL oracle pins.

def _gen_zigzag() -> np.ndarray:
    order = []
    for s in range(15):
        rs = range(s, -1, -1) if s % 2 == 0 else range(s + 1)
        for r in rs:
            c = s - r
            if r < 8 and c < 8:
                order.append(r * 8 + c)
    return np.asarray(order, np.int64)


_JPEG_ZZ = _gen_zigzag()

_DCT_M = (np.cos((2 * np.arange(8)[None, :] + 1)
                 * np.arange(8)[:, None] * np.pi / 16) / 2)
_DCT_M[0] /= np.sqrt(2)

# fixed-length canonical Huffman tables covering every baseline symbol:
# 12 DC categories at 4 bits, all 162 AC (run,size) symbols (EOB, ZRL,
# run 0-15 x size 1-10) at 8 bits — valid per-spec DHT payloads that
# keep the table constants short and typo-proof (the DECODER builds its
# tables from the DHT segment generically, so it accepts any stream)
_JPEG_DC_BITS = [0] * 17
_JPEG_DC_BITS[4] = 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0] * 17
_JPEG_AC_BITS[8] = 162
_JPEG_AC_VALS = [0x00, 0xF0] + [(r << 4) | s
                                for r in range(16) for s in range(1, 11)]


def _jpeg_canonical(bits: list, vals: list) -> dict:
    """vals-order canonical code assignment: symbol -> (code, length)."""
    codes: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JpegBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


class _JpegBitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise EOFError("jpeg entropy data exhausted")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        out = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        self.acc &= (1 << self.n) - 1
        return out


def _jpeg_size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _jpeg_write_block(bw: "_JpegBitWriter", block_u8: np.ndarray,
                      q: np.ndarray, prev_dc: int,
                      dc_codes: dict, ac_codes: dict) -> int:
    """FDCT + quantize + zigzag + DC-diff/AC-RLE Huffman for ONE 8x8
    block; returns the new DC predictor."""
    block = block_u8.astype(np.float64)
    f = _DCT_M @ (block - 128.0) @ _DCT_M.T
    zz = np.round(f / q).astype(np.int64).flatten()[_JPEG_ZZ]
    np.clip(zz[1:], -1023, 1023, out=zz[1:])      # AC size <= 10
    diff = int(zz[0]) - prev_dc
    new_dc = int(zz[0])
    s = _jpeg_size_cat(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _jpeg_size_cat(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return new_dc


def encode_jpeg_gray(img: np.ndarray, *,
                     q_table: Optional[np.ndarray] = None) -> bytes:
    """REAL baseline-JPEG encoder for 8-bit grayscale: FDCT + quantize
    (default all-ones table — numerically lossless for per-8x8-constant
    blocks) + zigzag + DC-diff/AC-RLE Huffman with byte stuffing."""
    import struct
    img = np.asarray(img, np.uint8)
    if img.ndim == 3:
        img = img[:, :, 0]
    h, w = img.shape
    q = (np.ones((8, 8), np.int64) if q_table is None
         else np.asarray(q_table, np.int64))
    pad = np.pad(img, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")
    ph, pw = pad.shape

    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            prev_dc = _jpeg_write_block(
                bw, pad[by:by + 8, bx:bx + 8], q, prev_dc,
                dc_codes, ac_codes)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00)
    out += bytes(int(x) for x in q.flatten()[_JPEG_ZZ])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    for cls, bits, vals in ((0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
                            (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), cls)
        out += bytes(bits[1:17]) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += bytes([1, 0x00, 0, 63, 0])
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color(ycbcr: np.ndarray, *,
                      q_table: Optional[np.ndarray] = None,
                      subsample: bool = False) -> bytes:
    """REAL baseline-JPEG encoder for three-component color: input is
    (h, w, 3) uint8 Y/Cb/Cr PLANES (callers that start from RGB
    convert first; the deterministic test corpus generates YCbCr
    directly so the all-ones-quant round trip stays bit-exact).
    ``subsample=False`` emits 4:4:4 (one 8x8 per component per MCU);
    ``subsample=True`` emits the standard 4:2:0 (four Y blocks + one
    Cb + one Cr per 16x16 MCU, chroma taken at the top-left of each
    2x2 — exact for per-16x16-constant planes). Shared canonical
    Huffman tables, byte stuffing, edge-replicated padding."""
    import struct
    ycbcr = np.asarray(ycbcr, np.uint8)
    h, w, nc = ycbcr.shape
    assert nc == 3, "encode_jpeg_color expects (h, w, 3) YCbCr"
    q = (np.ones((8, 8), np.int64) if q_table is None
         else np.asarray(q_table, np.int64))
    mcu = 16 if subsample else 8
    pad = np.pad(ycbcr, ((0, (-h) % mcu), (0, (-w) % mcu), (0, 0)),
                 mode="edge")
    ph, pw = pad.shape[:2]

    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    prev_dc = [0, 0, 0]
    if not subsample:
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci in range(3):              # interleaved MCU
                    prev_dc[ci] = _jpeg_write_block(
                        bw, pad[by:by + 8, bx:bx + 8, ci], q,
                        prev_dc[ci], dc_codes, ac_codes)
    else:
        chroma = pad[::2, ::2, 1:]               # top-left of each 2x2
        for my in range(0, ph, 16):
            for mx in range(0, pw, 16):
                for dy in (0, 8):
                    for dx in (0, 8):
                        prev_dc[0] = _jpeg_write_block(
                            bw, pad[my + dy:my + dy + 8,
                                    mx + dx:mx + dx + 8, 0], q,
                            prev_dc[0], dc_codes, ac_codes)
                cy, cx = my // 2, mx // 2
                for ci in (1, 2):
                    prev_dc[ci] = _jpeg_write_block(
                        bw, chroma[cy:cy + 8, cx:cx + 8, ci - 1], q,
                        prev_dc[ci], dc_codes, ac_codes)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00)
    out += bytes(int(x) for x in q.flatten()[_JPEG_ZZ])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    y_samp = 0x22 if subsample else 0x11
    for cid, samp in ((1, y_samp), (2, 0x11), (3, 0x11)):
        out += bytes([cid, samp, 0])             # shared DQT 0
    for cls, bits, vals in ((0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
                            (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), cls)
        out += bytes(bits[1:17]) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += bytes([cid, 0x00])                # shared DHT 0/0
    out += bytes([0, 63, 0])
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(blob: bytes) -> Optional[np.ndarray]:
    """REAL JPEG pixel decode -> (h, w, 1) uint8 for grayscale,
    (h, w, 3) RGB for color (fixed-point BT.601 conversion, see
    ``_ycbcr_to_rgb``). Tiers: baseline sequential grayscale / 4:4:4 /
    4:2:0, plus PROGRESSIVE (SOF2) grayscale AND color — spectral
    selection, EOB runs, successive-approximation refinement, at
    1x1 or standard 4:2:0 sampling (``_decode_jpeg_progressive``).
    ``None`` for anything outside the tier (other sampling ratios,
    12-bit precision, arithmetic coding, restart intervals,
    truncated or hostile bytes)."""
    try:
        out = _decode_jpeg_gray(blob)
        if out is not None:
            return out
        return _decode_jpeg_progressive(blob)
    except (EOFError, IndexError, KeyError, ValueError, TypeError,
            OverflowError, ZeroDivisionError):
        return None


def decode_jpeg_gray(blob: bytes) -> Optional[np.ndarray]:
    """Grayscale-only wrapper (original contract): (h, w, 1) or
    ``None`` — color streams return ``None`` here; use
    :func:`decode_jpeg` for the color-capable path."""
    out = decode_jpeg(blob)
    return out if out is not None and out.shape[2] == 1 else None


def _decode_jpeg_gray(blob: bytes) -> Optional[np.ndarray]:
    n = len(blob)
    if n < 4 or blob[:2] != b"\xff\xd8":
        return None
    qtables: dict = {}
    hufftables: dict = {}   # (class, id) -> {(length, code): symbol}
    h = w = -1
    comp_tq: dict = {}
    comp_samp: dict = {}
    luma_420 = False
    p = 2
    data_start = -1
    while p + 4 <= n:
        if blob[p] != 0xFF:
            return None
        marker = blob[p + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            p += 2
            continue
        seg_len = int.from_bytes(blob[p + 2:p + 4], "big")
        seg = blob[p + 4:p + 2 + seg_len]
        if len(seg) != seg_len - 2:
            return None
        if marker == 0xDB:                       # DQT
            q = 0
            while q < len(seg):
                pq, tq = seg[q] >> 4, seg[q] & 0x0F
                if pq != 0:                      # 16-bit tables: out of tier
                    return None
                tbl = np.zeros(64, np.int64)
                tbl[_JPEG_ZZ] = np.frombuffer(
                    seg[q + 1:q + 65], np.uint8).astype(np.int64)
                qtables[tq] = tbl.reshape(8, 8)
                q += 65
        elif marker == 0xC4:                     # DHT
            q = 0
            while q < len(seg):
                cls, tid = seg[q] >> 4, seg[q] & 0x0F
                bits = [0] + list(seg[q + 1:q + 17])
                nv = sum(bits)
                vals = list(seg[q + 17:q + 17 + nv])
                if len(vals) != nv:
                    return None
                table = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                hufftables[(cls, tid)] = table
                q += 17 + nv
        elif marker == 0xC0:                     # SOF0 baseline
            if seg[0] != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                return None
            comp_tq = {}
            comp_samp = {}
            order = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i], seg[7 + 3 * i], \
                    seg[8 + 3 * i]
                comp_tq[cid] = tq
                comp_samp[cid] = samp
                order.append(cid)
            samps = [comp_samp[c] for c in order]
            # supported grids: all 1x1 (gray / 4:4:4 color), or the
            # standard 4:2:0 (luma 2x2, both chromas 1x1)
            if not (all(s == 0x11 for s in samps)
                    or (ncomp == 3 and samps == [0x22, 0x11, 0x11])):
                return None
            luma_420 = ncomp == 3 and samps[0] == 0x22
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None                          # progressive & friends
        elif marker == 0xDA:                     # SOS
            if seg[0] != len(comp_tq):
                return None
            scan = []          # (tq, dc_tid, ac_tid, n_blocks_in_mcu)
            for i in range(seg[0]):
                cid, tids = seg[1 + 2 * i], seg[2 + 2 * i]
                if cid not in comp_tq:
                    return None
                nb = 4 if comp_samp[cid] == 0x22 else 1
                scan.append((comp_tq[cid], tids >> 4, tids & 0x0F, nb))
            data_start = p + 2 + seg_len
            break
        elif marker == 0xDD:                     # DRI: out of tier
            return None
        p += 2 + seg_len
    if data_start < 0 or h <= 0 or w <= 0:
        return None
    tabs = [(qtables[tq], hufftables[(0, dc)], hufftables[(1, ac)], nb)
            for tq, dc, ac, nb in scan]

    # unstuff entropy bytes up to the next real marker
    data = bytearray()
    p = data_start
    while p < n:
        b = blob[p]
        if b == 0xFF:
            nxt = blob[p + 1] if p + 1 < n else 0xD9
            if nxt == 0x00:
                data.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:              # RSTn: out of tier
                return None
            break
        data.append(b)
        p += 1

    def huff_decode(rd: "_JpegBitReader", table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | rd.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")

    rd = _JpegBitReader(bytes(data))

    def read_block(ci: int) -> np.ndarray:
        qt, dc_tab, ac_tab, _ = tabs[ci]
        zz = np.zeros(64, np.int64)
        s = huff_decode(rd, dc_tab)
        if s > 11:                               # hostile DHT symbol
            raise ValueError("bad DC category")
        if s:
            v = rd.read(s)
            if v < (1 << (s - 1)):
                v -= (1 << s) - 1
            prev_dc[ci] += v
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            sym = huff_decode(rd, ac_tab)
            if sym == 0x00:                      # EOB
                break
            if sym == 0xF0:                      # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            k += run
            if k > 63 or size == 0 or size > 10:
                raise ValueError("bad AC run/size")
            v = rd.read(size)
            if v < (1 << (size - 1)):
                v -= (1 << size) - 1
            zz[k] = v
            k += 1
        coef = np.zeros(64, np.float64)
        coef[_JPEG_ZZ] = zz * qt.flatten()[_JPEG_ZZ]
        block = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + 128.0
        return np.clip(np.round(block), 0, 255).astype(np.uint8)

    prev_dc = [0] * len(tabs)
    if not luma_420:
        nby, nbx = (h + 7) // 8, (w + 7) // 8
        planes = [np.zeros((nby * 8, nbx * 8), np.uint8) for _ in tabs]
        for by in range(nby):
            for bx in range(nbx):
                # interleaved MCU at 1x1 sampling: one 8x8 per comp
                for ci in range(len(tabs)):
                    planes[ci][by * 8:by * 8 + 8,
                               bx * 8:bx * 8 + 8] = read_block(ci)
        if len(planes) == 1:
            return planes[0][:h, :w, None]
        ycbcr = np.stack([p[:h, :w] for p in planes], axis=-1)
        return _ycbcr_to_rgb(ycbcr)

    # 4:2:0: each MCU covers 16x16 luma pixels — four Y blocks
    # (left-to-right, top-to-bottom) then one Cb and one Cr block at
    # half resolution; chroma upsamples by pixel replication
    nmy, nmx = (h + 15) // 16, (w + 15) // 16
    yplane = np.zeros((nmy * 16, nmx * 16), np.uint8)
    cplanes = [np.zeros((nmy * 8, nmx * 8), np.uint8) for _ in range(2)]
    for my in range(nmy):
        for mx in range(nmx):
            for dy in range(2):
                for dx in range(2):
                    yplane[my * 16 + dy * 8:my * 16 + dy * 8 + 8,
                           mx * 16 + dx * 8:mx * 16 + dx * 8 + 8] = \
                        read_block(0)
            for ci in range(2):
                cplanes[ci][my * 8:my * 8 + 8,
                            mx * 8:mx * 8 + 8] = read_block(ci + 1)
    up = [np.repeat(np.repeat(c, 2, axis=0), 2, axis=1)
          for c in cplanes]
    ycbcr = np.stack([yplane[:h, :w], up[0][:h, :w], up[1][:h, :w]],
                     axis=-1)
    return _ycbcr_to_rgb(ycbcr)


# fixed-point BT.601 YCbCr -> RGB in exact integer millionths with a
# +256e6 bias so the numerator stays NONNEGATIVE — floor and truncating
# division then agree, which is what lets a SQL oracle reproduce the
# conversion bit-for-bit (round-half-up via the +500000 term)
_YCC = {"r_cr": 1_402_000, "g_cb": 344_136, "g_cr": 714_136,
        "b_cb": 1_772_000}


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0].astype(np.int64) * 1_000_000
    cb = ycc[:, :, 1].astype(np.int64) - 128
    cr = ycc[:, :, 2].astype(np.int64) - 128
    bias = 256_000_000 + 500_000
    r = (y + _YCC["r_cr"] * cr + bias) // 1_000_000 - 256
    g = (y - _YCC["g_cb"] * cb - _YCC["g_cr"] * cr
         + bias) // 1_000_000 - 256
    b = (y + _YCC["b_cb"] * cb + bias) // 1_000_000 - 256
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# --- progressive JPEG (SOF2) ----------------------------------------------
#
# REAL progressive decode: spectral-selection bands, per-spec EOB-run
# (EOBn) AC coding, point transforms (DC arithmetic shift / AC
# truncated magnitude), SUCCESSIVE-APPROXIMATION refinement scans
# (Ah > 0: DC bit-append, AC correction-bit walks per T.81 G.1.2.3 /
# libjpeg), and 1- or 3-component frames at 1x1 sampling (interleaved
# DC scans, single-component AC scans as the spec requires). The
# paired encoders below emit the same subsets.

def _jpeg_prog_ac_scan(blocks, ss: int, se: int, al: int,
                   ac_codes: dict) -> bytes:
    # the encoder emits plain per-block EOBs (EOBRUN == 1); the
    # DECODER below still honors multi-block EOBn runs, so streams
    # from other encoders decode too. AC point transform is
    # TRUNCATED-magnitude division: sign * (|v| >> al).
    bw = _JpegBitWriter()
    for zz in blocks:
        band = [(abs(int(v)) >> al) * (1 if v > 0 else -1)
                for v in zz[ss:se + 1]]
        nz = [k for k, v in enumerate(band) if v != 0]
        if not nz:
            code, ln = ac_codes[0x00]     # EOB (run length 1)
            bw.write(code, ln)
            continue
        last = -1
        for k in nz:
            run = k - last - 1
            last = k
            while run >= 16:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
            v = band[k]
            s = _jpeg_size_cat(v)
            code, ln = ac_codes[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
        if last < se - ss:                # trailing zeros: EOB
            code, ln = ac_codes[0x00]
            bw.write(code, ln)
    bw.flush()
    return bytes(bw.buf)

def _jpeg_prog_ac_refine(blocks, ss: int, se: int, al: int,
                     ac_codes: dict) -> bytes:
    # T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine shape: newly
    # visible coefficients ((|v| >> al) == 1) emit (run, 1) + sign;
    # already-visible ones emit buffered CORRECTION BITS flushed
    # after the next symbol; trailing state folds into a per-block
    # EOB whose pending bits refine the remainder.
    bw = _JpegBitWriter()
    for zz in blocks:
        vals = [int(v) for v in zz[ss:se + 1]]
        t_now = [abs(v) >> al for v in vals]
        eob_idx = max((k for k, t in enumerate(t_now) if t == 1),
                      default=-1)
        run = 0
        pending: list[int] = []
        for k, v in enumerate(vals):
            if t_now[k] == 0:
                run += 1
                continue
            # ZRLs are emitted on reaching ANY nonzero coefficient
            # (correction positions included) — the decoder's walk
            # consumes this stretch's correction bits during the
            # NEXT symbol, so flushing here must precede them
            # (libjpeg encode_mcu_AC_refine ordering)
            while run >= 16 and k <= eob_idx:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                for b in pending:
                    bw.write(b, 1)
                pending = []
                run -= 16
            if t_now[k] > 1:              # visible before this scan
                pending.append((abs(v) >> al) & 1)
                continue
            code, ln = ac_codes[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if v > 0 else 0, 1)
            for b in pending:
                bw.write(b, 1)
            pending = []
            run = 0
        if run > 0 or pending:
            code, ln = ac_codes[0x00]     # EOB (run 1)
            bw.write(code, ln)
            for b in pending:
                bw.write(b, 1)
    bw.flush()
    return bytes(bw.buf)

def encode_jpeg_gray_progressive(img: np.ndarray, *,
                                 q_table: Optional[np.ndarray] = None,
                                 bands: tuple = ((1, 5), (6, 63)),
                                 successive: bool = False) -> bytes:
    """REAL progressive-JPEG encoder (grayscale): a DC scan followed
    by one AC scan per ``bands`` entry, EOB-coded within each band.
    ``successive=True`` additionally splits every scan by SUCCESSIVE
    APPROXIMATION (first pass at Al=1 — arithmetic-shifted DC,
    truncated-magnitude AC — then Ah=1/Al=0 refinement scans with
    per-spec correction bits), the full four-pass progressive
    structure real encoders emit. All-ones quant keeps
    per-8x8-constant images bit-exact through the round trip, like
    the baseline encoder."""
    import struct
    img = np.asarray(img, np.uint8)
    if img.ndim == 3:
        img = img[:, :, 0]
    h, w = img.shape
    q = (np.ones((8, 8), np.int64) if q_table is None
         else np.asarray(q_table, np.int64))
    pad = np.pad(img, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")
    ph, pw = pad.shape

    # forward transform every block once; scans then slice the bands
    blocks = []
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            f = _DCT_M @ (pad[by:by + 8, bx:bx + 8]
                          .astype(np.float64) - 128.0) @ _DCT_M.T
            zz = np.round(f / q).astype(np.int64).flatten()[_JPEG_ZZ]
            np.clip(zz[1:], -1023, 1023, out=zz[1:])
            blocks.append(zz)

    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)

    def dc_scan(al: int) -> bytes:
        bw = _JpegBitWriter()
        prev = 0
        for zz in blocks:
            dc = int(zz[0]) >> al             # DC: ARITHMETIC shift
            diff = dc - prev
            prev = dc
            s = _jpeg_size_cat(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        bw.flush()
        return bytes(bw.buf)

    def dc_refine(al: int) -> bytes:
        bw = _JpegBitWriter()
        for zz in blocks:
            bw.write((int(zz[0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.buf)

    def ac_scan(ss: int, se: int, al: int) -> bytes:
        return _jpeg_prog_ac_scan(blocks, ss, se, al, ac_codes)

    def ac_refine(ss: int, se: int, al: int) -> bytes:
        return _jpeg_prog_ac_refine(blocks, ss, se, al, ac_codes)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00)
    out += bytes(int(x) for x in q.flatten()[_JPEG_ZZ])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    for cls, bits, vals in ((0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
                            (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), cls)
        out += bytes(bits[1:17]) + bytes(vals)

    def sos(ss: int, se: int, ah: int, al: int, body: bytes) -> bytes:
        return (b"\xff\xda" + struct.pack(">HB", 8, 1)
                + bytes([1, 0x00, ss, se, (ah << 4) | al]) + body)

    if not successive:
        out += sos(0, 0, 0, 0, dc_scan(0))
        for ss, se in bands:
            out += sos(ss, se, 0, 0, ac_scan(ss, se, 0))
    else:
        # the real-world four-pass layout: coarse DC, coarse AC bands,
        # then one refinement pass each
        out += sos(0, 0, 0, 1, dc_scan(1))
        for ss, se in bands:
            out += sos(ss, se, 0, 1, ac_scan(ss, se, 1))
        out += sos(0, 0, 1, 0, dc_refine(0))
        for ss, se in bands:
            out += sos(ss, se, 1, 0, ac_refine(ss, se, 0))
    out += b"\xff\xd9"
    return bytes(out)


def _decode_jpeg_progressive(blob: bytes) -> Optional[np.ndarray]:
    n = len(blob)
    if n < 4 or blob[:2] != b"\xff\xd8":
        return None
    qtables: dict = {}
    hufftables: dict = {}
    h = w = -1
    comp_ids: list = []                  # SOF order
    comp_tq: dict = {}                   # cid -> quant table id
    comp_samp: dict = {}                 # cid -> (hi, vi)
    geom: dict = {}                      # cid -> dict(pcols, bhn, bwn, ch, cw)
    coefs: dict = {}                     # cid -> (padded_blocks, 64)
    mcu_rows = mcu_cols = 0
    p = 2
    while p + 2 <= n:
        if blob[p] != 0xFF:
            return None
        marker = blob[p + 1]
        if marker == 0xD9:                       # EOI
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            p += 2
            continue
        if p + 4 > n:
            return None
        seg_len = int.from_bytes(blob[p + 2:p + 4], "big")
        seg = blob[p + 4:p + 2 + seg_len]
        if len(seg) != seg_len - 2:
            return None
        if marker == 0xDB:
            q = 0
            while q < len(seg):
                pq, tq = seg[q] >> 4, seg[q] & 0x0F
                if pq != 0:
                    return None
                tbl = np.zeros(64, np.int64)
                tbl[_JPEG_ZZ] = np.frombuffer(
                    seg[q + 1:q + 65], np.uint8).astype(np.int64)
                qtables[tq] = tbl
                q += 65
        elif marker == 0xC4:
            q = 0
            while q < len(seg):
                cls, tid = seg[q] >> 4, seg[q] & 0x0F
                bits = [0] + list(seg[q + 1:q + 17])
                nv = sum(bits)
                vals = list(seg[q + 17:q + 17 + nv])
                if len(vals) != nv:
                    return None
                table = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                hufftables[(cls, tid)] = table
                q += 17 + nv
        elif marker == 0xC2:                     # SOF2 progressive
            if seg[0] != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                return None
            samps = [seg[7 + 3 * i] for i in range(ncomp)]
            # tiers: all 1x1, or the standard 4:2:0 (Y 2x2, chroma 1x1)
            if not (all(s == 0x11 for s in samps)
                    or (ncomp == 3 and samps == [0x22, 0x11, 0x11])):
                return None
            hmax = max(s >> 4 for s in samps)
            vmax = max(s & 0x0F for s in samps)
            mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
            mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i], seg[7 + 3 * i], \
                    seg[8 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                comp_ids.append(cid)
                comp_tq[cid] = tq
                comp_samp[cid] = (hi, vi)
                cw = (w * hi + hmax - 1) // hmax   # component dims
                ch = (h * vi + vmax - 1) // vmax
                geom[cid] = {
                    "pcols": mcu_cols * hi,        # MCU-padded grid
                    "prows": mcu_rows * vi,
                    "bwn": (cw + 7) // 8,          # non-padded grid
                    "bhn": (ch + 7) // 8,
                    "cw": cw, "ch": ch,
                    "rep_x": hmax // hi, "rep_y": vmax // vi,
                }
                coefs[cid] = np.zeros(
                    (mcu_rows * vi * mcu_cols * hi, 64), np.int64)
        elif marker == 0xC0 or (0xC1 <= marker <= 0xCF
                                and marker not in (0xC4, 0xC8, 0xCC)):
            return None                          # baseline handled elsewhere
        elif marker == 0xDD:
            return None
        elif marker == 0xDA:                     # one progressive scan
            ns = seg[0]
            if not coefs or ns < 1 or ns > len(comp_ids):
                return None
            scomps = []                          # (cid, dc_tid, ac_tid)
            for i in range(ns):
                cid, tids = seg[1 + 2 * i], seg[2 + 2 * i]
                if cid not in comp_tq:
                    return None
                scomps.append((cid, tids >> 4, tids & 0x0F))
            off = 1 + 2 * ns
            ss, se = seg[off], seg[off + 1]
            ah, al = seg[off + 2] >> 4, seg[off + 2] & 0x0F
            if ss > se or se > 63 or (ah and ah != al + 1):
                return None                      # malformed scan header
            if ss != 0 and ns != 1:
                return None                      # AC scans: one comp
            # unstuff this scan's entropy bytes
            data = bytearray()
            sp = p + 2 + seg_len
            while sp < n:
                b = blob[sp]
                if b == 0xFF:
                    nxt = blob[sp + 1] if sp + 1 < n else 0xD9
                    if nxt == 0x00:
                        data.append(0xFF)
                        sp += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        return None              # restart: out of tier
                    break
                data.append(b)
                sp += 1

            def huff(rd: "_JpegBitReader", table: dict) -> int:
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | rd.read(1)
                    sym = table.get((length, code))
                    if sym is not None:
                        return sym
                raise ValueError("invalid huffman code")

            rd = _JpegBitReader(bytes(data))

            def dc_targets():
                # DC scans with ns > 1 traverse MCU order (each scan
                # component contributes its hi x vi sub-blocks per MCU,
                # INCLUDING right/bottom dummy blocks); single-component
                # DC scans traverse the component's own non-padded
                # block raster, like AC scans.
                if ns > 1:
                    for myy in range(mcu_rows):
                        for mxx in range(mcu_cols):
                            for cid, dc_tid, _ in scomps:
                                hi, vi = comp_samp[cid]
                                pcols = geom[cid]["pcols"]
                                for dy in range(vi):
                                    for dx in range(hi):
                                        yield (cid, dc_tid,
                                               (myy * vi + dy) * pcols
                                               + mxx * hi + dx)
                else:
                    cid, dc_tid, _ = scomps[0]
                    g = geom[cid]
                    for r in range(g["bhn"]):
                        for c in range(g["bwn"]):
                            yield cid, dc_tid, r * g["pcols"] + c

            if ss == 0 and ah == 0:              # DC first scan
                if se != 0:
                    return None
                prev = {cid: 0 for cid, _, _ in scomps}
                for cid, dc_tid, bi in dc_targets():
                    tab = hufftables[(0, dc_tid)]
                    s = huff(rd, tab)
                    if s > 11:
                        raise ValueError("bad DC category")
                    if s:
                        v = rd.read(s)
                        if v < (1 << (s - 1)):
                            v -= (1 << s) - 1
                        prev[cid] += v
                    coefs[cid][bi, 0] = prev[cid] << al
            elif ss == 0:                        # DC refinement: 1 bit
                if se != 0:
                    return None
                for cid, _, bi in dc_targets():
                    if rd.read(1):
                        # two's-complement OR appends the bit for
                        # negative coefficients too (libjpeg)
                        coefs[cid][bi, 0] |= 1 << al
            elif ah != 0:                        # AC refinement (band)
                cid, _, ac_tid = scomps[0]
                ccoefs = coefs[cid]
                g = geom[cid]
                ac_order = [r * g["pcols"] + c
                            for r in range(g["bhn"])
                            for c in range(g["bwn"])]
                tab = hufftables[(1, ac_tid)]
                p1, m1 = 1 << al, -(1 << al)

                def correct(row, k):
                    if rd.read(1) and (int(row[k]) & p1) == 0:
                        row[k] += p1 if row[k] >= 0 else m1

                eobrun = 0
                for bi in ac_order:
                    row = ccoefs[bi]
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            sym = huff(rd, tab)
                            r, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if r < 15:       # EOBn
                                    eobrun = (1 << r)
                                    if r:
                                        eobrun += rd.read(r)
                                    break
                                val = 0          # ZRL: 16 zero-history
                            elif size == 1:
                                val = p1 if rd.read(1) else m1
                            else:
                                raise ValueError("bad refinement size")
                            while k <= se:
                                if row[k] != 0:
                                    correct(row, k)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                row[k] = val
                            k += 1
                    if eobrun:
                        while k <= se:           # refine the remainder
                            if row[k] != 0:
                                correct(row, k)
                            k += 1
                        eobrun -= 1
            else:                                # AC first scan (band)
                cid, _, ac_tid = scomps[0]
                ccoefs = coefs[cid]
                g = geom[cid]
                ac_order = [r * g["pcols"] + c
                            for r in range(g["bhn"])
                            for c in range(g["bwn"])]
                tab = hufftables[(1, ac_tid)]
                eobrun = 0
                for bi in ac_order:
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = huff(rd, tab)
                        r, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if r == 15:          # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1   # EOBn
                            if r:
                                eobrun += rd.read(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC index past band end")
                        v = rd.read(size)
                        if v < (1 << (size - 1)):
                            v -= (1 << size) - 1
                        ccoefs[bi, k] = v << al
                        k += 1
            p = sp
            continue
        p += 2 + seg_len
    if not coefs or h <= 0 or w <= 0:
        return None
    planes = []
    for cid in comp_ids:
        qt = qtables[comp_tq[cid]]
        g = geom[cid]
        out = np.zeros((g["bhn"] * 8, g["bwn"] * 8), np.uint8)
        for r in range(g["bhn"]):
            for c in range(g["bwn"]):
                bi = r * g["pcols"] + c
                coef = np.zeros(64, np.float64)
                # coef rows are zigzag-ordered; qt is natural order, so
                # the dequant multiplier must be re-zigzagged to align
                coef[_JPEG_ZZ] = coefs[cid][bi] * qt[_JPEG_ZZ]
                block = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + 128.0
                out[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = np.clip(
                    np.round(block), 0, 255).astype(np.uint8)
        plane = out[:g["ch"], :g["cw"]]
        if g["rep_y"] > 1 or g["rep_x"] > 1:     # replication upsample
            plane = np.repeat(np.repeat(plane, g["rep_y"], axis=0),
                              g["rep_x"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][:, :, None]
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


def encode_jpeg_color_progressive(ycbcr: np.ndarray, *,
                                  q_table: Optional[np.ndarray] = None,
                                  bands: tuple = ((1, 5), (6, 63)),
                                  successive: bool = False,
                                  subsample: bool = False) -> bytes:
    """REAL progressive-JPEG encoder for color: an INTERLEAVED DC scan
    over all three components, then per-component AC band scans
    (progressive AC scans are single-component by spec);
    ``successive=True`` adds the Ah=1/Al=0 refinement passes. Input is
    (h, w, 3) uint8 Y/Cb/Cr planes like :func:`encode_jpeg_color`.
    ``subsample=True`` emits the standard 4:2:0 geometry: the DC scan
    walks 16x16 MCUs (four Y blocks + Cb + Cr, INCLUDING right/bottom
    dummy blocks of the MCU-padded grid), while each AC scan walks
    only its component's non-padded block raster — exactly the
    traversal the spec (and libjpeg) uses, which the progressive
    decoder above mirrors. Chroma is taken at the top-left of each
    2x2 like :func:`encode_jpeg_color`."""
    import struct
    ycbcr = np.asarray(ycbcr, np.uint8)
    h, w, nc = ycbcr.shape
    assert nc == 3
    q = (np.ones((8, 8), np.int64) if q_table is None
         else np.asarray(q_table, np.int64))
    mcu = 16 if subsample else 8
    pad = np.pad(ycbcr, ((0, (-h) % mcu), (0, (-w) % mcu), (0, 0)),
                 mode="edge")
    ph, pw = pad.shape[:2]

    def fdct(block: np.ndarray) -> np.ndarray:
        f = _DCT_M @ (block.astype(np.float64) - 128.0) @ _DCT_M.T
        zz = np.round(f / q).astype(np.int64).flatten()[_JPEG_ZZ]
        np.clip(zz[1:], -1023, 1023, out=zz[1:])
        return zz

    # per component: MCU-padded block grid (row-major) + its grid
    # shape + the non-padded (bhn, bwn) AC-scan extent
    comp_blocks: list[list[np.ndarray]] = [[], [], []]
    if not subsample:
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci in range(3):
                    comp_blocks[ci].append(
                        fdct(pad[by:by + 8, bx:bx + 8, ci]))
        grids = [(ph // 8, pw // 8)] * 3
        extents = [((h + 7) // 8, (w + 7) // 8)] * 3
    else:
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                comp_blocks[0].append(fdct(pad[by:by + 8, bx:bx + 8, 0]))
        chroma = pad[::2, ::2, 1:]               # top-left of each 2x2
        ch2, cw2 = chroma.shape[:2]              # multiples of 8
        for by in range(0, ch2, 8):
            for bx in range(0, cw2, 8):
                for ci in (1, 2):
                    comp_blocks[ci].append(
                        fdct(chroma[by:by + 8, bx:bx + 8, ci - 1]))
        grids = [(ph // 8, pw // 8), (ch2 // 8, cw2 // 8),
                 (ch2 // 8, cw2 // 8)]
        cbh = ((h + 1) // 2 + 7) // 8            # ceil(ceil(h/2)/8)
        cbw = ((w + 1) // 2 + 7) // 8
        extents = [((h + 7) // 8, (w + 7) // 8), (cbh, cbw),
                   (cbh, cbw)]

    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS, _JPEG_AC_VALS)

    def dc_order():
        # interleaved MCU traversal (incl. dummy blocks)
        if not subsample:
            for bi in range(len(comp_blocks[0])):
                for ci in range(3):
                    yield ci, bi
        else:
            ygw = grids[0][1]
            cgw = grids[1][1]
            for my in range(ph // 16):
                for mx in range(pw // 16):
                    for dy in (0, 1):
                        for dx in (0, 1):
                            yield 0, (2 * my + dy) * ygw + 2 * mx + dx
                    yield 1, my * cgw + mx
                    yield 2, my * cgw + mx

    def ac_blocks(ci: int) -> list:
        (bhn, bwn), (_, gw) = extents[ci], grids[ci]
        return [comp_blocks[ci][r * gw + c]
                for r in range(bhn) for c in range(bwn)]

    def dc_scan(al: int) -> bytes:
        bw = _JpegBitWriter()
        prev = [0, 0, 0]
        for ci, bi in dc_order():
            dc = int(comp_blocks[ci][bi][0]) >> al
            diff = dc - prev[ci]
            prev[ci] = dc
            s = _jpeg_size_cat(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff > 0
                         else diff + (1 << s) - 1, s)
        bw.flush()
        return bytes(bw.buf)

    def dc_refine(al: int) -> bytes:
        bw = _JpegBitWriter()
        for ci, bi in dc_order():
            bw.write((int(comp_blocks[ci][bi][0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.buf)

    def sos(comps: list, ss: int, se: int, ah: int, al: int,
            body: bytes) -> bytes:
        hdr = bytes([len(comps)])
        for cid in comps:
            hdr += bytes([cid, 0x00])
        hdr += bytes([ss, se, (ah << 4) | al])
        return (b"\xff\xda"
                + struct.pack(">H", 2 + len(hdr)) + hdr + body)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00)
    out += bytes(int(x) for x in q.flatten()[_JPEG_ZZ])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    y_samp = 0x22 if subsample else 0x11
    for cid, samp in ((1, y_samp), (2, 0x11), (3, 0x11)):
        out += bytes([cid, samp, 0])
    for cls, bits, vals in ((0x00, _JPEG_DC_BITS, _JPEG_DC_VALS),
                            (0x10, _JPEG_AC_BITS, _JPEG_AC_VALS)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), cls)
        out += bytes(bits[1:17]) + bytes(vals)

    first_al = 1 if successive else 0
    out += sos([1, 2, 3], 0, 0, 0, first_al, dc_scan(first_al))
    for ci, cid in enumerate((1, 2, 3)):
        for ss, se in bands:
            out += sos([cid], ss, se, 0, first_al, _jpeg_prog_ac_scan(
                ac_blocks(ci), ss, se, first_al, ac_codes))
    if successive:
        out += sos([1, 2, 3], 0, 0, 1, 0, dc_refine(0))
        for ci, cid in enumerate((1, 2, 3)):
            for ss, se in bands:
                out += sos([cid], ss, se, 1, 0, _jpeg_prog_ac_refine(
                    ac_blocks(ci), ss, se, 0, ac_codes))
    out += b"\xff\xd9"
    return bytes(out)

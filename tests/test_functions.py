"""Training-data function library: dedup / similarity / textstats /
multimodal — semantic checks beyond row counts."""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tempeh_parser_ray.functions import dedup, multimodal, similarity, textstats

SF_DIR = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))


def _docs_ds(ray):
    return ray.data.read_parquet(str(Path(SF_DIR) / "documents.parquet"))


def test_exact_dedup_keeps_one_per_text(ray_session):
    ray = ray_session
    base = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["a", "b", "a", "c", "b"], pa.string()),
    })
    out = _collect(dedup.exact_dedup(ray.data.from_arrow(base)))
    kept = dict(zip(out.column("text").to_pylist(),
                    out.column("doc_id").to_pylist()))
    assert kept == {"a": 1, "b": 2, "c": 4}  # smallest id per value


def test_minhash_lsh_finds_planted_near_dups(ray_session):
    ray = ray_session
    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    texts = docs.column("text").to_pylist()[:50]
    rows = {"doc_id": list(range(50)), "text": texts}
    # plant near-dups: copy docs 0-9 with a tiny suffix
    for i in range(10):
        rows["doc_id"].append(1000 + i)
        rows["text"].append(texts[i] + " tail")
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "text": pa.array(rows["text"], pa.string())}))
    cands = dedup.minhash_lsh_candidates(ds, num_perm=64, bands=16,
                                         shingle_k=5, concurrency=(1, 2))
    verified = _collect(dedup.verify_pairs_jaccard(cands, ds, threshold=0.8))
    pairs = set(zip(verified.column("id_a").to_pylist(),
                    verified.column("id_b").to_pylist()))
    planted = {(i, 1000 + i) for i in range(10)}
    assert planted <= pairs, f"missing planted pairs: {planted - pairs}"
    for j in verified.column("jaccard").to_pylist():
        assert j >= 0.8


def test_jaccard_exact_values():
    assert dedup.jaccard("abcde", "abcde") == 1.0
    assert dedup.jaccard("", "") == 1.0
    assert 0.0 < dedup.jaccard("abcdefgh", "abcdexyz") < 1.0


def test_simhash_near_dup_distance():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a + "extra"
    ha, hb = dedup.simhash64(a), dedup.simhash64(b)
    d = bin(ha ^ hb).count("1")
    assert d <= 3  # tiny edit -> tiny hamming distance
    far = dedup.simhash64("completely different words entirely unrelated")
    assert bin(ha ^ far).count("1") > 10


def test_knn_lsh_recall_vs_brute(ray_session):
    """LSH kNN must reach >=60% recall@5 of the exact baseline here."""
    ray = ray_session
    emb = ray.data.read_parquet(str(Path(SF_DIR) / "embeddings.parquet"))
    qids = [0, 1, 2, 3, 4]
    exact = similarity.knn_cosine_brute(emb, qids, k=5)
    approx = similarity.knn_cosine_lsh(emb, qids, k=5, n_bits=8)
    exact_set = set(zip(exact.column("query_id").to_pylist(),
                        exact.column("neighbor_id").to_pylist()))
    approx_set = set(zip(approx.column("query_id").to_pylist(),
                         approx.column("neighbor_id").to_pylist()))
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_knn_brute_agrees_with_numpy(ray_session):
    ray = ray_session
    tbl = pq.read_table(Path(SF_DIR) / "embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id").to_pylist())
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    q = 3
    sims = (mat @ mat[ids == q].T).ravel() / norms / norms[ids == q]
    order = np.lexsort((ids, -sims))
    want = [int(ids[i]) for i in order if ids[i] != q][:5]
    got = similarity.knn_cosine_brute(
        ray.data.from_arrow(tbl), [q], k=5)
    got_ids = got.column("neighbor_id").to_pylist()
    assert got_ids == want


def test_knn_absent_query_ids_return_empty(ray_session):
    # an absent query id must yield an empty (schema-stable) result,
    # not a reshape crash in _batch_matrix on the 0-row query grab
    ray = ray_session
    tbl = pq.read_table(Path(SF_DIR) / "embeddings.parquet")
    ds = ray.data.from_arrow(tbl)
    for fn in (similarity.knn_cosine_brute, similarity.knn_cosine_lsh,
               similarity.knn_cosine_ivf):
        got = fn(ds, [10**12], k=3)
        assert got.num_rows == 0
        assert got.column_names == ["query_id", "neighbor_id",
                                    "rank", "cosine_sim"]


def test_token_and_quality_stats():
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the cat the dog", "  ", "one"], pa.string())})
    tc = textstats.token_count_batch(batch)
    assert tc.column("n_tokens").to_pylist() == [4, 0, 1]
    qa = textstats.quality_batch(batch)
    assert qa.column("n_unique_tokens").to_pylist() == [3, 0, 1]
    assert qa.column("stopword_ratio").to_pylist()[0] == 0.5  # 'the' x2 / 4


def test_fingerprint_matches_md5():
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["hello world"], pa.string())})
    fp = textstats.fingerprint_batch(batch)
    assert fp.column("fp_md5").to_pylist()[0] == hashlib.md5(
        b"hello world").hexdigest()


def test_lang_id_heuristic():
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["the cat is on the mat and it is flat",
                          "der hund ist nicht mit der katze",
                          "你好世界",
                          "zzz qqq"], pa.string())})
    out = textstats.lang_id_batch(batch)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "zh", "und"]


def test_multimodal_decode_stub_features():
    blob = bytes(range(256))
    batch = pa.table({"media_id": pa.array([7], pa.int64()),
                      "media": pa.array([blob], pa.binary())})
    stage = multimodal.DecodeImageBatch(strict=False)
    out = stage(batch)
    assert out.column("n_bytes").to_pylist() == [256]
    assert out.column("width").to_pylist() == [16]
    assert out.column("height").to_pylist() == [16]
    feats = out.column("byte_features").to_pylist()[0]
    assert len(feats) == 16 and abs(sum(feats) - 1.0) < 1e-9


def test_frame_sample_offsets():
    batch = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                      "media": pa.array([b"x" * 150, b""], pa.binary())})
    stage = multimodal.FrameSampleBatch(stride=64, max_frames=8)
    out = stage(batch)
    frames = out.column("frames").to_pylist()
    assert [(f["start"], f["end"]) for f in frames[0]] == [
        (0, 64), (64, 128), (128, 150)]
    assert frames[1] == []


def test_knn_ivf_recall_vs_brute(ray_session):
    """IVF kNN must reach >=60% recall@5 of the exact baseline here."""
    ray = ray_session
    emb = ray.data.read_parquet(str(Path(SF_DIR) / "embeddings.parquet"))
    qids = [0, 1, 2, 3, 4]
    exact = similarity.knn_cosine_brute(emb, qids, k=5)
    approx = similarity.knn_cosine_ivf(emb, qids, k=5,
                                       n_clusters=16, n_probe=4)
    exact_set = set(zip(exact.column("query_id").to_pylist(),
                        exact.column("neighbor_id").to_pylist()))
    approx_set = set(zip(approx.column("query_id").to_pylist(),
                         approx.column("neighbor_id").to_pylist()))
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_resize_image_batch_real_pixels():
    """ResizeImageBatch decodes REAL pixels and applies the integer
    nearest-neighbor index math; undecodable payloads raise unless
    fallback_stub=True (channels=0 marks the fallback row)."""
    import numpy as np
    import pytest

    img = (np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3) * 3
           % 256).astype(np.uint8)
    blob = multimodal.encode_png(img)
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "media": pa.array([blob], pa.binary())})
    out = multimodal.ResizeImageBatch(target=4)(batch)
    want = multimodal.resize_nearest(img, 4, 4)
    assert out.column("resized").to_pylist()[0] == want.tobytes()
    assert out.column("channels").to_pylist() == [3]
    assert out.column("resized_sum").to_pylist() == [
        int(want.astype(np.int64).sum())]
    assert out.column("n_bytes_out").to_pylist() == [4 * 4 * 3]

    junk = pa.table({"media_id": pa.array([2], pa.int64()),
                     "media": pa.array([b"not an image"], pa.binary())})
    with pytest.raises(ValueError):
        multimodal.ResizeImageBatch(target=4)(junk)
    fb = multimodal.ResizeImageBatch(target=4, fallback_stub=True)(junk)
    assert fb.column("channels").to_pylist() == [0]
    # fallback mirrors ResizeStubBatch's byte count: t*t*channels(=3)
    assert len(fb.column("resized").to_pylist()[0]) == 4 * 4 * 3
    stub = multimodal.ResizeStubBatch(target=4, channels=3)(junk)
    assert (fb.column("resized").to_pylist()
            == stub.column("resized").to_pylist())


def test_audio_frame_energy_batch_real_pcm():
    """AudioFrameEnergyBatch parses real WAV PCM and frames |sample|
    sums per window; non-PCM raises unless fallback_stub=True."""
    import numpy as np
    import pytest

    s = np.array([10, -20, 30, -40, 5, -5, 7], np.int16)
    blob = multimodal.encode_wav_pcm(s, bits=16, rate=8000, channels=1)
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "media": pa.array([blob], pa.binary())})
    out = multimodal.AudioFrameEnergyBatch(window=4)(batch)
    assert out.column("sample_rate").to_pylist() == [8000]
    assert out.column("n_samples").to_pylist() == [7]
    assert out.column("n_windows").to_pylist() == [2]
    assert out.column("frame_energy").to_pylist()[0] == [100, 17]

    junk = pa.table({"media_id": pa.array([2], pa.int64()),
                     "media": pa.array([b"xx"], pa.binary())})
    with pytest.raises(ValueError):
        multimodal.AudioFrameEnergyBatch(window=4)(junk)
    fb = multimodal.AudioFrameEnergyBatch(
        window=4, fallback_stub=True)(junk)
    assert fb.column("sample_rate").to_pylist() == [0]
    assert fb.column("n_windows").to_pylist() == [1]
    # fallback is the stub's mean-byte scale (floored): b"xx" -> 120
    assert fb.column("frame_energy").to_pylist()[0] == [120]
    # window cap mirrors the stub's max_windows
    longjunk = pa.table({
        "media_id": pa.array([3], pa.int64()),
        "media": pa.array([bytes(range(256)) * 4], pa.binary())})
    capped = multimodal.AudioFrameEnergyBatch(
        window=4, fallback_stub=True, max_windows=8)(longjunk)
    assert capped.column("n_windows").to_pylist() == [8]


def test_audio_feature_stub_windows():
    data = bytes(range(256)) * 2 + b"\x10" * 10  # 2 full + 1 partial window
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "media": pa.array([data], pa.binary())})
    out = multimodal.AudioFeatureStubBatch(window=256)(batch)
    assert out.column("n_windows").to_pylist() == [3]
    e = out.column("frame_energy").to_pylist()[0]
    assert e[0] == e[1] == 127.5 and e[2] == 16.0


def test_image_header_parse_real_formats():
    """The dependency-free container-header decode returns TRUE dims for
    PNG / GIF / JPEG / BMP payloads (no codec library involved)."""
    import struct

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II5B", 640, 480, 8, 6, 0, 0, 0)
           + b"\x00\x00\x00\x00")
    assert multimodal.parse_image_header(png) == (640, 480, 4, "png")

    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert multimodal.parse_image_header(gif) == (320, 200, 3, "gif")

    # JPEG: SOI, APP0 segment, SOF0 with h=123 w=456, 3 components
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 123, 456) + b"\x03" + b"\x00" * 2)
    assert multimodal.parse_image_header(jpeg) == (456, 123, 3, "jpeg")

    bmp = (b"BM" + b"\x00" * 16
           + (800).to_bytes(4, "little") + (600).to_bytes(4, "little"))
    assert multimodal.parse_image_header(bmp) == (800, 600, 3, "bmp")

    assert multimodal.parse_image_header(b"") is None
    assert multimodal.parse_image_header(b"plain text payload") is None
    assert multimodal.parse_image_header(b"\x89PNG\r\n\x1a\nshort") is None


def test_image_header_parse_webp_variants():
    """All three WebP container layouts decode dependency-free:
    extended (VP8X, 24-bit dims-minus-one + alpha flag), lossless
    (VP8L, packed 14-bit dims + alpha bit) and lossy (VP8, sync code +
    14-bit dims)."""
    import struct

    def vp8x(w, h, alpha):
        return (b"RIFF" + struct.pack("<I", 22) + b"WEBPVP8X"
                + struct.pack("<I", 10)
                + bytes([0x10 if alpha else 0, 0, 0, 0])
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little"))

    assert multimodal.parse_image_header(vp8x(1024, 768, False)) \
        == (1024, 768, 3, "webp")
    assert multimodal.parse_image_header(vp8x(33, 7, True)) \
        == (33, 7, 4, "webp")
    # 24-bit range: dims beyond uint16
    assert multimodal.parse_image_header(vp8x(70000, 2, False)) \
        == (70000, 2, 3, "webp")

    def vp8l(w, h, alpha):
        bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
        return (b"RIFF" + struct.pack("<I", 17) + b"WEBPVP8L"
                + struct.pack("<I", 5) + b"\x2f"
                + struct.pack("<I", bits))

    assert multimodal.parse_image_header(vp8l(500, 300, 0)) \
        == (500, 300, 3, "webp")
    assert multimodal.parse_image_header(vp8l(16383, 1, 1)) \
        == (16383, 1, 4, "webp")

    def vp8(w, h):
        return (b"RIFF" + struct.pack("<I", 22) + b"WEBPVP8 "
                + struct.pack("<I", 14) + b"\x00\x00\x00"
                + b"\x9d\x01\x2a"
                + struct.pack("<HH", w, h) + b"\x00" * 4)

    assert multimodal.parse_image_header(vp8(640, 360)) \
        == (640, 360, 3, "webp")
    # scaling hint bits in the upper 2 bits must be masked off
    assert multimodal.parse_image_header(vp8(100 | 0x4000, 50 | 0x8000)) \
        == (100, 50, 3, "webp")

    # corrupt sync code / truncated VP8L are rejected, not misparsed
    bad_sync = vp8(10, 10)[:23] + b"\x00\x01\x2a" + vp8(10, 10)[26:]
    assert multimodal.parse_image_header(bad_sync) is None
    assert multimodal.parse_image_header(vp8l(4, 4, 0)[:22]) is None


def test_decode_image_batch_uses_header_dims():
    """DecodeImageBatch prefers the real header decode over the
    byte-length stub when the payload is a recognized container."""
    import struct

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II5B", 17, 29, 8, 2, 0, 0, 0)
           + b"\x00\x00\x00\x00")
    batch = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "media": pa.array([png, b"not an image"], pa.binary()),
    })
    out = multimodal.DecodeImageBatch(strict=False)(batch)
    rows = {r["media_id"]: r for r in out.to_pylist()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) \
        == (17, 29, 3)
    # non-image payload falls back to the documented stub dims
    assert rows[2]["width"] == int(len(b"not an image") ** 0.5)


def test_shingle_fingerprint_semantics():
    """The rolling winnowing fingerprint equals the brute-force min
    over byte-8-gram polynomial hashes, and appending text can only
    lower (or keep) the min — every original 8-gram stays a candidate."""
    def brute(t: str) -> int:
        data = t.encode("utf-8")
        m = (1 << 61) - 1
        if len(data) < 8:
            h = 0
            for b in data:
                h = (h * 257 + b) % m
            return h
        hashes = []
        for i in range(len(data) - 7):
            h = 0
            for b in data[i:i + 8]:
                h = (h * 257 + b) % m
            hashes.append(h)
        return min(hashes)

    texts = ["hello world", "abc", "", "the quick brown fox jumps",
             "aaaaaaaaaaaa", "é世界 unicode bytes here"]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})
    fp = textstats.fingerprint_batch(batch)
    got = fp.column("fp_shingle").to_pylist()
    assert got == [brute(t) for t in texts]

    # containment invariant: fp(t + suffix) <= fp(t) for long-enough t
    base = "the quick brown fox jumps"
    b2 = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "text": pa.array([base, base + " over the dog"],
                                    pa.string())})
    f2 = textstats.fingerprint_batch(b2).column("fp_shingle").to_pylist()
    assert f2[1] <= f2[0]


def test_label_propagation_equals_union_find(ray_session):
    """Distributed min-label components == driver union-find on random
    graphs, including a 60-node chain (forces multiple propagation
    rounds: converged labels need ~diameter iterations)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tempeh_parser_ray.functions import dedup

    rng = np.random.RandomState(17)
    cases = []
    # random sparse graphs
    for trial in range(2):
        n = rng.randint(10, 60)
        m = rng.randint(5, 80)
        cases.append([(int(rng.randint(0, n)), int(rng.randint(0, n)))
                      for _ in range(m)])
    # long chain with shuffled node ids (diameter ~ n): needs several
    # jump rounds, still O(log n) thanks to pointer doubling
    perm = rng.permutation(40)
    cases.append([(int(perm[i]), int(perm[i + 1])) for i in range(39)])

    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        tbl = pa.table({
            "id_a": pa.array([e[0] for e in edges], pa.int64()),
            "id_b": pa.array([e[1] for e in edges], pa.int64()),
        })
        got = {r["node"]: r["label"]
               for r in dedup.components_by_label_propagation(
                   ray.data.from_arrow(tbl).repartition(3)).take_all()}
        # brute force union-find
        parent = {}
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp = {}
        for x in parent:
            comp.setdefault(find(x), []).append(x)
        want = {}
        for root, members in comp.items():
            mn = min(members)
            for x in members:
                want[x] = mn
        assert got == want

"""Named query/pipeline catalog — the engine's public operator surface.

Each function takes ``sf_dir`` (a driver testdata directory) and returns
a Dataset / pyarrow Table. ``__ray_entry__.queries()`` exposes these;
for every SQL-expressible one, ``__ray_entry__.oracle_sql()`` carries a
DuckDB oracle with IDENTICAL column names. Everything is deterministic
(fixed seeds, closed-form synthetic corpus).

Ray is assumed to be initialised by the caller.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions import broadcast as _bcast
from ..functions import curation as _cur
from ..functions import dedup as _dedup
from ..functions import multimodal as _mm
from ..functions import similarity as _sim
from ..functions import sketches as _sk
from ..functions import textstats as _ts
from ..functions import topk as _topk
from ..sources import synthetic as _synth
from ..sources.fixtures import fixture_corpus_table
from . import extract_pipeline as _ep
from . import windows as _win

def _q_pool() -> int:
    """FIXED actor-pool size for catalog-query stages, sized to the
    CURRENT cluster: cpus//4 capped at 8, floor 2. Fixed beats the
    (min,max) autoscaler ~2x here (it adds ~1 actor/1.3 s and plateaus
    below max); sizing from ``cluster_resources`` keeps small test
    sessions (4 cpus) from requesting more actors than can schedule."""
    n = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(8, n // 4))


def _join_parts() -> int:
    """Hash-join partition count sized to the cluster: each partition
    costs an aggregator-actor spin-up (~0.2 s measured), so small
    sessions want few; a real cluster wants ~cpus/8 so the build side
    fans out."""
    n = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(64, n // 8))


def _documents(sf_dir: str, columns: list[str] | None = None
               ) -> "ray.data.Dataset":
    """documents table; pass ``columns`` so only the needed columns
    leave storage (column pruning pushes down to the parquet read)."""
    return ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"), columns=columns)


def _embeddings(sf_dir: str) -> "ray.data.Dataset":
    # the table reads as ~1 block; re-split so matmul/bucketing stages
    # parallelize (results are partition-invariant: partial top-k is
    # exact with id tie-breaks, pair sims are per-row dots)
    return ray.data.read_parquet(
        str(Path(sf_dir) / "embeddings.parquet")).repartition(16)


def _events(sf_dir: str, columns: list[str] | None = None
            ) -> "ray.data.Dataset":
    """events table with column pruning pushed to the parquet read."""
    return ray.data.read_parquet(
        str(Path(sf_dir) / "events.parquet"), columns=columns)


def _corpus(sf_dir: str) -> "ray.data.Dataset":
    return _documents(sf_dir).map_batches(
        _synth.synthesize_batch, batch_format="pyarrow")


# --- flagship extraction ------------------------------------------------


def extract_text(sf_dir: str) -> "ray.data.Dataset":
    """Synthesized CC-style corpus -> fused parse+extract (the flagship
    pipeline; E1 in SURVEY.md par.3)."""
    ex = _ep.extract_dataset(_corpus(sf_dir), spans=False,
                             concurrency=_q_pool(),
                             passthrough=("doc_id",))
    return ex.map_batches(
        lambda b: b.select(["doc_id", "extracted_text", "n_chars_extracted",
                            "n_nodes", "n_links", "error"]),
        batch_format="pyarrow")


def extract_lang_stats(sf_dir: str) -> pa.Table:
    """Per-language extraction-quality stats (groupby over the
    extraction output; SURVEY.md par.2.6)."""
    ex = _ep.extract_dataset(_corpus(sf_dir), spans=False,
                             concurrency=_q_pool(),
                             passthrough=("doc_id", "lang"))
    agg = ex.groupby("lang").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("n_chars_extracted"),
    )
    tbl = pa.Table.from_pylist(agg.take_all())
    return pa.table({
        "lang": tbl.column("lang"),
        "n_docs": tbl.column("count()").cast(pa.int64()),
        "sum_chars": tbl.column("sum(n_chars_extracted)").cast(pa.int64()),
    })


def parse_trees(sf_dir: str) -> "ray.data.Dataset":
    """Tree-building pipeline (ParseHtmlBatch) over the synthesized
    corpus; per-doc node/attr counts."""
    parsed = _ep.parse_dataset(_corpus(sf_dir),
                               concurrency=_q_pool(),
                               passthrough=("doc_id",))

    def counts(batch: pa.Table) -> pa.Table:
        n_attrs = pc.list_value_length(batch.column("attrs"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_nodes": batch.column("n_nodes"),
            "n_attrs": n_attrs.cast(pa.int32()) if n_attrs is not None
            else pa.array([], pa.int32()),
            "error": batch.column("error"),
        })

    return parsed.map_batches(counts, batch_format="pyarrow")


def parse_fixture_corpus(sf_dir: str) -> "ray.data.Dataset":
    """Reference conformance corpus through the tree pipeline
    (byte-identical goldens are asserted in pytest)."""
    ds = ray.data.from_arrow(fixture_corpus_table())
    parsed = _ep.parse_dataset(ds, concurrency=(1, 2),
                               passthrough=("url",))
    return parsed.map_batches(
        lambda b: b.select(["url", "n_nodes", "error"]),
        batch_format="pyarrow")


# --- text analysis ------------------------------------------------------


def token_count(sf_dir: str) -> "ray.data.Dataset":
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _ts.token_count_batch, batch_format="pyarrow")


def quality_score(sf_dir: str) -> "ray.data.Dataset":
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _ts.quality_batch, batch_format="pyarrow")


def doc_fingerprint(sf_dir: str) -> "ray.data.Dataset":
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _ts.fingerprint_batch, batch_format="pyarrow").map_batches(
        lambda b: b.select(["doc_id", "fp_md5"]), batch_format="pyarrow")


def doc_fingerprint_shingle(sf_dir: str) -> "ray.data.Dataset":
    """Rolling-shingle winnowing fingerprint (not SQL-expressible)."""
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _ts.fingerprint_batch, batch_format="pyarrow")


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _ts.lang_id_batch, batch_format="pyarrow")


def lang_stats(sf_dir: str) -> pa.Table:
    agg = _documents(sf_dir, ["lang", "n_chars"]).groupby("lang").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("n_chars"),
        ray.data.aggregate.Mean("n_chars"),
    )
    tbl = pa.Table.from_pylist(agg.take_all())
    return pa.table({
        "lang": tbl.column("lang"),
        "n_docs": tbl.column("count()").cast(pa.int64()),
        "sum_chars": tbl.column("sum(n_chars)").cast(pa.int64()),
        "avg_chars": tbl.column("mean(n_chars)").cast(pa.float64()),
    })


def top_sources(sf_dir: str) -> pa.Table:
    agg = _documents(sf_dir, ["source"]).groupby("source").aggregate(
        ray.data.aggregate.Count())
    tbl = pa.Table.from_pylist(agg.take_all())
    tbl = pa.table({
        "source": tbl.column("source"),
        "n_docs": tbl.column("count()").cast(pa.int64()),
    })
    idx = pc.sort_indices(tbl, sort_keys=[("n_docs", "descending"),
                                          ("source", "ascending")])
    return tbl.take(idx[:10])


def events_by_type(sf_dir: str) -> pa.Table:
    """Sum in exact integer micros so the result is order-independent
    (bit-identical to the SQL oracle regardless of aggregation order)."""

    def to_micros(batch: pa.Table) -> pa.Table:
        micros = pc.round(pc.multiply(
            batch.column("value").cast(pa.float64()), 1_000_000.0))
        return pa.table({
            "event_type": batch.column("event_type"),
            "value_micros": micros.cast(pa.int64()),
        })

    agg = _events(sf_dir, ["event_type", "value"]).map_batches(
        to_micros, batch_format="pyarrow").groupby("event_type").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("value_micros"),
    )
    tbl = pa.Table.from_pylist(agg.take_all())
    return pa.table({
        "event_type": tbl.column("event_type"),
        "n_events": tbl.column("count()").cast(pa.int64()),
        "sum_value_micros": tbl.column("sum(value_micros)").cast(pa.int64()),
    })


# --- dedup --------------------------------------------------------------


def dedup_exact(sf_dir: str) -> "ray.data.Dataset":
    return _dedup.exact_dedup(_documents(sf_dir), key="text",
                              id_col="doc_id")


def _mutated_corpus(sf_dir: str) -> "ray.data.Dataset":
    """documents + near-duplicate copies (docs with doc_id%10==0 get a
    clone at doc_id+100000 with ' extra' appended) — the dedup oracle
    workload; deterministic. The MATERIALIZED corpus is memoized per
    (source path, mtime, Ray session), so the minhash family's several
    consumers in one analysis session build it once."""
    src = Path(sf_dir) / "documents.parquet"
    key = (str(src.resolve()), src.stat().st_mtime_ns,
           ray.get_runtime_context().get_job_id())
    if key in _CORPUS_MEMO:
        return _CORPUS_MEMO[key]
    docs = _documents(sf_dir)

    def mutate(batch: pa.Table) -> pa.Table:
        ids_np = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids_np % 10 == 0))
        ids = [i + 100000 for i in sub.column("doc_id").to_pylist()]
        texts = [t + " extra" for t in sub.column("text").to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": sub.column("lang"),
            "source": sub.column("source"),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })

    clones = docs.map_batches(mutate, batch_format="pyarrow")
    # the raw read yields only a handful of blocks; re-split so the
    # downstream shingle/minhash actor pools see enough tasks to scale
    # (16 = 2 waves over the <=8-actor pool; 32 doubled the bucket
    # shuffle's task count for no occupancy gain, measured).
    # Materialized ONCE because the dedup pipelines consume it twice
    # (candidate generation + the verify semi-join fetch) — without it
    # the whole build re-executes per consumer. At 100 TB the
    # equivalent is persisting the mutated corpus to parquet.
    out = docs.union(clones).repartition(16).materialize()
    _evict_same_path(_CORPUS_MEMO, key, gen_len=3)
    _CORPUS_MEMO[key] = out
    return out


# verified-pair memo: keyed on (resolved path, source mtime, threshold);
# holds PLAIN Arrow tables (no Ray object refs), so it stays valid
# across ray.shutdown/init and invalidates when the source changes.
# One generation per source path: inserting a new (path, mtime) evicts
# older mtimes of the same path so regenerated corpora don't strand
# stale tables for the process lifetime.
_PAIR_MEMO: dict[tuple, pa.Table] = {}

# materialized mutated-corpus memo, shared by the minhash family so
# dedup_minhash -> dedup_minhash_keep in one session pays the corpus
# union+repartition+materialize once. Keyed additionally on the Ray
# job id: a MaterializedDataset holds object-store refs that die with
# the Ray session, unlike the plain-Arrow pair memo.
_CORPUS_MEMO: dict[tuple, "ray.data.Dataset"] = {}


def _evict_same_path(memo: dict, key: tuple, gen_len: int) -> None:
    """Drop memo entries for the same source path (``key[0]``) whose
    generation prefix ``key[:gen_len]`` differs — same-generation
    siblings (e.g. the pair memo's two thresholds, gen_len=2) are
    kept; the corpus memo uses gen_len=3 so a new Ray session also
    evicts the dead-ref entry of the previous one."""
    for k in [k for k in memo
              if k[0] == key[0] and k[:gen_len] != key[:gen_len]]:
        del memo[k]


def _minhash_verified_pairs(sf_dir: str, threshold: float,
                            cols: tuple[str, ...] = ("id_a", "id_b",
                                                     "jaccard"),
                            ) -> pa.Table:
    """Shared pipeline for the MinHash family: mutated corpus ->
    LSH candidates -> exact-Jaccard verify at ``threshold``, returned
    as an (id_a, id_b)-sorted table. The result is a deterministic pure
    function of the source table, so repeated calls (e.g.
    ``dedup_minhash`` then ``dedup_minhash_keep`` in one analysis
    session) reuse the memoized table instead of re-shingling the
    corpus."""
    src = Path(sf_dir) / "documents.parquet"
    key = (str(src.resolve()), src.stat().st_mtime_ns, threshold)
    if key in _PAIR_MEMO:
        return _PAIR_MEMO[key]
    corpus = _mutated_corpus(sf_dir)
    cands = _dedup.minhash_lsh_candidates(
        corpus, num_perm=64, bands=16, shingle_k=5,
        concurrency=_q_pool())
    verified = _dedup.verify_pairs_jaccard(cands, corpus,
                                           threshold=threshold)
    tbl = pa.Table.from_pylist(verified.take_all())
    if tbl.num_rows == 0:
        tbl = pa.table({"id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                        "jaccard": pa.array([], pa.float64())})
    else:
        tbl = tbl.select(list(cols))
        tbl = tbl.take(pc.sort_indices(
            tbl, sort_keys=[("id_a", "ascending"),
                            ("id_b", "ascending")]))
    _evict_same_path(_PAIR_MEMO, key, gen_len=2)
    _PAIR_MEMO[key] = tbl
    return tbl


def dedup_minhash(sf_dir: str) -> pa.Table:
    """MinHash+LSH near-dup candidates, exact-Jaccard-verified >=0.8,
    over the mutated corpus (each clone should pair with its source).

    The jaccard column is the UNROUNDED 64-bit-shingle-hash Jaccard —
    bit-identical to the closed-form SQL (same integer division), so the
    DuckDB all-pairs oracle hash-matches as long as LSH recall is 1.0 at
    the 0.8 threshold (it is on this workload: banding P(candidate) ≈
    0.9998 at j=0.8 and every verified pair sits far above it)."""
    return _minhash_verified_pairs(sf_dir, threshold=0.8)


def dedup_simhash(sf_dir: str) -> pa.Table:
    corpus = _mutated_corpus(sf_dir)
    pairs = _dedup.simhash_candidates(corpus, max_hamming=3)
    tbl = pa.Table.from_pylist(pairs.take_all())
    if tbl.num_rows == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    tbl = tbl.select(["id_a", "id_b", "hamming"])
    return tbl.take(pc.sort_indices(
        tbl, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]))


NGRAM_JACCARD_THRESHOLD = 0.5  # calibrated: LSH recall is 1.0 above it


def ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Exact n-gram Jaccard over LSH candidates, thresholded where the
    16x4 banding has full recall (P(candidate) >= 1-(1-j^4)^16; the
    planted clones sit near j≈0.97 and every natural pair above the
    threshold is verified locally to be an LSH candidate), so the output
    set has a closed SQL form: ALL pairs with shingle-Jaccard >= T.
    Jaccard values are unrounded — bit-identical to the SQL division."""
    return _minhash_verified_pairs(sf_dir,
                                   threshold=NGRAM_JACCARD_THRESHOLD)


# --- similarity search --------------------------------------------------

KNN_QUERY_IDS = [0, 1, 2, 3, 4]
KNN_K = 5


def knn_cosine(sf_dir: str) -> pa.Table:
    tbl = _sim.knn_cosine_brute(_embeddings(sf_dir), KNN_QUERY_IDS,
                                k=KNN_K)
    return pa.table({
        "query_id": tbl.column("query_id"),
        "neighbor_id": tbl.column("neighbor_id"),
        "rank": tbl.column("rank"),
        "cosine_sim": pc.round(tbl.column("cosine_sim"), ndigits=4),
    })


def knn_cosine_lsh(sf_dir: str) -> pa.Table:
    tbl = _sim.knn_cosine_lsh(_embeddings(sf_dir), KNN_QUERY_IDS,
                              k=KNN_K, n_bits=8)
    return pa.table({
        "query_id": tbl.column("query_id"),
        "neighbor_id": tbl.column("neighbor_id"),
        "rank": tbl.column("rank"),
        "cosine_sim": pc.round(tbl.column("cosine_sim"), ndigits=4),
    })


# --- multimodal plumbing ------------------------------------------------


def _media_table(sf_dir: str) -> "ray.data.Dataset":
    """Opaque-binary media table synthesized from document text bytes."""

    def to_media(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "media_id": batch.column("doc_id"),
            "media": pa.array([t.encode("utf-8") for t in texts],
                              pa.binary()),
            "media_type": pa.array(["application/octet-stream"] * len(texts),
                                   pa.string()),
        })

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow")


def multimodal_features(sf_dir: str) -> "ray.data.Dataset":
    """REAL image feature extraction across ALL FIVE pixel-decoded
    formats (doc_id%5 cycles PNG / BMP24 / GIF / JPEG-gray /
    WebP-VP8L): deterministic images flow through the
    ``DecodeImageBatch`` actor pool, whose real-decode branch
    (functions/multimodal.py:decode_image_pixels) produces true dims +
    a 16-bin pixel histogram; the query reduces that to the dominant
    intensity bin (argmax, lowest bin on ties) + its exact pixel
    count. Pixel values are integer closed forms of (doc_id, x, y,
    ch), so the SQL oracle checks dims, channels AND the histogram
    reduction bit-for-bit through every codec."""
    import numpy as np

    from ..functions import vp8l as _vp8l

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        blobs: list[bytes] = []
        for d in ids:
            fmt = d % 5
            if fmt == 3:                         # JPEG gray, sequential
                blobs.append(_mm.encode_jpeg_gray(_jpeg_gray_law(d)))
                continue
            c = 4 if fmt == 4 else (1, 3, 4)[(d // 5) % 3] \
                if fmt == 0 else 3
            img = _pixel_law(d, c)
            if fmt == 0:
                blobs.append(_mm.encode_png(
                    img if c > 1 else img[:, :, 0],
                    filter_mode="cycle"))
            elif fmt == 1:
                blobs.append(_mm.encode_bmp24(img))
            elif fmt == 2:
                blobs.append(_mm.encode_gif(img))
            else:                                # WebP lossless
                blobs.append(_vp8l.encode_vp8l(
                    img, use_runs=(d % 2 == 0),
                    cache_bits=6 if d % 3 == 0 else 0))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(blobs, pa.binary()),
        })

    ds = _documents(sf_dir, ["doc_id"]).map_batches(
        gen, batch_format="pyarrow").map_batches(
        _mm.DecodeImageBatch, batch_format="pyarrow",
        concurrency=_q_pool(),
        # prefer_builtin pins the in-repo codec branch so the
        # bit-exact SQL oracle holds on ANY host (a PIL install
        # would change palette-GIF channels and reject VP8L rows)
        fn_constructor_kwargs=dict(strict=False, prefer_builtin=True))

    def finish(batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        c = batch.column("channels").to_numpy(zero_copy_only=False)
        total = (w.astype(np.int64) * h * c)
        f = batch.column("byte_features").combine_chunks() \
            .values.to_numpy(zero_copy_only=False) \
            .reshape(batch.num_rows, 16)
        bins = np.argmax(f, axis=1)              # first max = lowest bin
        # f = count/total in float64; count <= 832 so the product
        # rounds back to the exact integer
        counts = np.rint(
            f[np.arange(batch.num_rows), bins] * total).astype(np.int64)
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": batch.column("width").cast(pa.int64()),
            "height": batch.column("height").cast(pa.int64()),
            "channels": batch.column("channels").cast(pa.int64()),
            "top_bin": pa.array(bins, pa.int64()),
            "top_bin_count": pa.array(counts, pa.int64()),
        })

    return ds.map_batches(finish, batch_format="pyarrow")


def _image_blob_batch(batch: pa.Table) -> pa.Table:
    """Deterministic minimal image payload per doc cycling ALL FIVE
    container formats the header parser supports (doc_id%5: PNG / GIF /
    JPEG / BMP / WebP-VP8X): dims and channels are closed functions of
    doc_id, so the REAL header-decode path is SQL-checkable per
    format."""
    import struct

    ids = batch.column("doc_id").to_pylist()
    blobs = []
    types = []
    for d in ids:
        w = 1 + d % 640
        h = 1 + (d * 7) % 480
        fmt = d % 5
        if fmt == 0:  # PNG: signature + IHDR chunk (33 bytes)
            ct = (0, 2, 6)[d % 3]
            ihdr = struct.pack(">II5B", w, h, 8, ct, 0, 0, 0)
            blobs.append(b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13)
                         + b"IHDR" + ihdr + b"\x00\x00\x00\x00")
            types.append("image/png")
        elif fmt == 1:  # GIF89a logical screen descriptor (13 bytes)
            blobs.append(b"GIF89a" + struct.pack("<HH3B", w, h, 0, 0, 0))
            types.append("image/gif")
        elif fmt == 2:  # JPEG: SOI + SOF0 with 3 components (12 bytes)
            blobs.append(b"\xff\xd8\xff\xc0" + struct.pack(
                ">HBHHB", 8, 8, h, w, 3))
            types.append("image/jpeg")
        elif fmt == 3:  # BMP: BITMAPINFOHEADER prefix (26 bytes)
            blobs.append(b"BM" + b"\x00" * 16
                         + struct.pack("<ii", w, h))
            types.append("image/bmp")
        else:  # WebP extended header (VP8X chunk, 30 bytes); odd ids
            # carry the alpha flag (0x10) -> 4 channels
            flags = 0x10 if d % 2 else 0x00
            blobs.append(b"RIFF" + struct.pack("<I", 22) + b"WEBPVP8X"
                         + struct.pack("<I", 10) + bytes([flags, 0, 0, 0])
                         + (w - 1).to_bytes(3, "little")
                         + (h - 1).to_bytes(3, "little"))
            types.append("image/webp")
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media": pa.array(blobs, pa.binary()),
        "media_type": pa.array(types, pa.string()),
    })


def image_header_dims(sf_dir: str) -> "ray.data.Dataset":
    """REAL (dependency-free) image decode over PNG/GIF/JPEG/BMP/WebP
    payloads: the container-header parser extracts true
    width/height/channels per format — not the byte-length stub
    (functions/multimodal.py:parse_image_header)."""
    ds = _documents(sf_dir, ["doc_id"]).map_batches(
        _image_blob_batch, batch_format="pyarrow").map_batches(
        _mm.DecodeImageBatch, batch_format="pyarrow",
        concurrency=_q_pool(),
        # prefer_builtin pins the in-repo codec branch so the
        # bit-exact SQL oracle holds on ANY host (a PIL install
        # would change palette-GIF channels and reject VP8L rows)
        fn_constructor_kwargs=dict(strict=False, prefer_builtin=True))
    return ds.map_batches(
        lambda b: b.select(["media_id", "width", "height", "channels",
                            "n_bytes"]),
        batch_format="pyarrow")


def frame_offsets(sf_dir: str) -> "ray.data.Dataset":
    ds = _media_table(sf_dir).map_batches(
        _mm.FrameSampleBatch, batch_format="pyarrow",
        concurrency=_q_pool(),
        fn_constructor_kwargs=dict(stride=64, max_frames=8))

    def counts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_frames": pc.list_value_length(
                batch.column("frames")).cast(pa.int64()),
            "n_bytes": batch.column("n_bytes"),
        })

    return ds.map_batches(counts, batch_format="pyarrow")


# --- relational / windowed operators over the TPC-H-ish tables ----------
# (SURVEY.md par.2.5-2.7: joins, aggregations, sorts are absent in the
# reference; the engine provides them Ray-Data-first. Monetary sums are
# carried as exact integer micros so results are aggregation-order
# independent — bit-identical to the SQL oracles.)


def _micros(col) -> pa.Array:
    return pc.round(pc.multiply(col.cast(pa.float64()), 1_000_000.0)).cast(
        pa.int64())


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-style pricing summary: filter at the read, per-batch
    partial aggregation (combiner), then a tiny 4-group global groupby."""
    import datetime
    cutoff = datetime.datetime(1998, 9, 2)
    li = ray.data.read_parquet(
        str(Path(sf_dir) / "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch.column("l_shipdate"),
                          pa.scalar(cutoff, pa.timestamp("us"))))
        disc = pc.multiply(
            batch.column("l_extendedprice").cast(pa.float64()),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty": batch.column("l_quantity").cast(pa.int64()),
            "base_micros": _micros(batch.column("l_extendedprice")),
            "disc_micros": pc.round(pc.multiply(disc, 1_000_000.0)).cast(
                pa.int64()),
        })
        # in-batch combine: groups collapse to <=|flags x statuses| rows
        return pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_micros", "sum"), ("disc_micros", "sum"),
             ("qty", "count")])

    agg = li.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]).aggregate(
        ray.data.aggregate.Sum("qty_sum"),
        ray.data.aggregate.Sum("base_micros_sum"),
        ray.data.aggregate.Sum("disc_micros_sum"),
        ray.data.aggregate.Sum("qty_count"),
    )
    tbl = pa.Table.from_pylist(agg.take_all())
    return pa.table({
        "l_returnflag": tbl.column("l_returnflag"),
        "l_linestatus": tbl.column("l_linestatus"),
        "sum_qty": tbl.column("sum(qty_sum)").cast(pa.int64()),
        "sum_base_micros": tbl.column("sum(base_micros_sum)").cast(pa.int64()),
        "sum_disc_micros": tbl.column("sum(disc_micros_sum)").cast(pa.int64()),
        "n_rows": tbl.column("sum(qty_count)").cast(pa.int64()),
    })


class _SortedLookup:
    """Broadcast key->value lookup for actor-pool stages: the driver
    ships ``(sorted_keys, values)`` numpy arrays through ``ray.put``
    ONCE; each actor materializes them ONCE in ``__init__``; per batch
    the map is a single ``np.searchsorted`` + fancy index — zero
    per-row Python in the fact scan (the round-2 per-batch
    ``ray.get`` + per-row dict comprehension was measurably slower)."""

    def __init__(self, lookup_ref):
        import numpy as np
        self.keys, self.vals = ray.get(lookup_ref)
        self._np = np

    def map(self, key_arr) -> "pa.Array":
        np = self._np
        k = key_arr.to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.keys, k)
        # FK-integrity guard: a key missing from the dimension would
        # otherwise raise IndexError (past the end) or silently map to
        # a neighboring key's value.
        idx_c = np.minimum(idx, len(self.keys) - 1)
        if len(self.keys) == 0 or not np.array_equal(self.keys[idx_c], k):
            missing = k[self.keys[idx_c] != k] if len(self.keys) else k
            raise KeyError(
                f"_SortedLookup: {len(missing)} fact key(s) missing from "
                f"the broadcast dimension, e.g. {missing[:3].tolist()}")
        return pa.array(self.vals[idx_c], pa.string())


def _sorted_lookup_ref(keys, vals) -> "ray.ObjectRef":
    """ray.put a (sorted keys, aligned values) pair for _SortedLookup."""
    import numpy as np
    keys = np.asarray(keys, dtype=np.int64)
    vals = np.asarray(vals, dtype=object)
    order = np.argsort(keys)
    return ray.put((keys[order], vals[order]))


def orders_by_nation(sf_dir: str) -> pa.Table:
    """orders -> customer -> nation rolled up per nation name.

    The small side (custkey -> nation-name, composed driver-side from
    the two dimension tables) is broadcast ONCE via ``ray.put`` as
    sorted numpy arrays; the fact scan is an actor-pool stage that
    builds the lookup in ``__init__`` and maps each batch with one
    vectorized searchsorted — no shuffle join; the only exchange is
    the tiny 25-group aggregate."""
    import numpy as np
    import pyarrow.parquet as pq
    cust = pq.read_table(str(Path(sf_dir) / "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(str(Path(sf_dir) / "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    nkeys = nat.column("n_nationkey").to_numpy()
    nnames = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    norder = np.argsort(nkeys)
    cnat = cust.column("c_nationkey").to_numpy()
    cust_names = nnames[norder][np.searchsorted(nkeys[norder], cnat)]
    lookup_ref = _sorted_lookup_ref(
        cust.column("c_custkey").to_numpy(), cust_names)

    class AttachNation(_SortedLookup):
        def __init__(self):
            super().__init__(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return pa.table({
                "nation": self.map(batch.column("o_custkey")),
                "price_micros": _micros(batch.column("o_totalprice")),
            })

    agg = ray.data.read_parquet(
        str(Path(sf_dir) / "orders.parquet"),
        columns=["o_custkey", "o_totalprice"]).map_batches(
        AttachNation, batch_format="pyarrow",
        concurrency=_q_pool()).groupby("nation").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("price_micros"),
    )
    tbl = pa.Table.from_pylist(agg.take_all())
    return pa.table({
        "nation": tbl.column("nation"),
        "n_orders": tbl.column("count()").cast(pa.int64()),
        "total_micros": tbl.column("sum(price_micros)").cast(pa.int64()),
    })


def events_windowed(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour windows per event type (streaming-style windowed
    aggregate expressed as window-key + groupby; SURVEY.md par.2.9)."""

    def win(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "window_start": pc.floor_temporal(batch.column("ts"),
                                              unit="hour"),
            "value_micros": _micros(batch.column("value")),
        })

    agg = _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
        win, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]).aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("value_micros"),
    )
    tbl = pa.Table.from_pylist(agg.take_all())
    return pa.table({
        "event_type": tbl.column("event_type"),
        "window_start": tbl.column("window_start"),
        "n_events": tbl.column("count()").cast(pa.int64()),
        "sum_value_micros": tbl.column("sum(value_micros)").cast(pa.int64()),
    })


def orders_top10(sf_dir: str) -> pa.Table:
    """Global top-k via distributed sort + limit (ds.sort exercises the
    range-partitioned shuffle; k rows leave the cluster)."""
    ds = ray.data.read_parquet(
        str(Path(sf_dir) / "orders.parquet"),
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"])
    top = ds.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(10)
    tbl = pa.Table.from_pylist(top.take_all())
    return tbl.select(["o_orderkey", "o_totalprice", "o_orderpriority"])


# --- extraction variants ------------------------------------------------


def extract_main_text(sf_dir: str) -> "ray.data.Dataset":
    """Boilerplate-filtered extraction: drops text under high
    link-density parents (nav bars, link farms). On the synthetic
    template this removes the nav and the footer mail link."""
    from ..stages.parse_stage import MainTextBatch

    return _corpus(sf_dir).map_batches(
        MainTextBatch, batch_format="pyarrow", batch_size=None,
        concurrency=_q_pool())


def extract_multi_encoding(sf_dir: str) -> "ray.data.Dataset":
    """The same corpus cycled through the 6 page encodings utf-8 /
    utf-8+BOM / utf-16le / utf-16be / utf-32le / utf-32be (doc_id%6):
    the BOM-sniffing decode path must produce byte-identical extracted
    text regardless of encoding."""
    corpus = _documents(sf_dir).map_batches(
        _synth.synthesize_encoded_batch, batch_format="pyarrow")
    ex = _ep.extract_dataset(corpus, spans=False,
                             concurrency=_q_pool(),
                             passthrough=("doc_id", "encoding"))
    return ex.map_batches(
        lambda b: b.select(["doc_id", "encoding", "extracted_text",
                            "n_chars_extracted", "error"]),
        batch_format="pyarrow")


def token_count_bpe(sf_dir: str) -> "ray.data.Dataset":
    """BPE-ish pretokenizer counts (letter/digit/symbol runs)."""
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _ts.token_count_regex_batch, batch_format="pyarrow")


def _mutated_embeddings(sf_dir: str) -> "ray.data.Dataset":
    """embeddings + planted duplicates: vec_id%10==0 rows cloned at
    vec_id+100000 (exact copies -> cosine 1.0); the natural vectors are
    near-orthogonal, so the planted pairs are the oracle workload."""
    emb = _embeddings(sf_dir)

    def clone(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % 10 == 0))
        return pa.table({
            "vec_id": pc.add(sub.column("vec_id"), 100000),
            "embedding": sub.column("embedding"),
        })

    return emb.select_columns(["vec_id", "embedding"]).union(
        emb.map_batches(clone, batch_format="pyarrow"))


def dedup_embedding(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucketed
    candidates + semi-join vector fetch + vectorized verify — no
    full-table materialization (functions/similarity.py)."""
    return _sim.embedding_near_dup_pairs(_mutated_embeddings(sf_dir),
                                         threshold=0.8)


def media_resize(sf_dir: str) -> "ray.data.Dataset":
    """REAL image resize: the shared deterministic image payloads
    (``_pixel_image_batch`` — PNG/BMP/GIF/JPEG with per-format
    sub-rotations) flow through the ``ResizeImageBatch`` actor pool
    (functions/multimodal.py): real pixel decode + 16x16
    nearest-neighbor ``resize_nearest`` + integer resized-pixel sum.
    The SQL oracle reproduces ``resized_sum`` from the (doc_id, x, y,
    ch) closed form, verifying decode AND the resize index math
    bit-for-bit for every format."""
    ds = _documents(sf_dir, ["doc_id"]).map_batches(
        _pixel_image_batch, batch_format="pyarrow").map_batches(
        _mm.ResizeImageBatch, batch_format="pyarrow",
        concurrency=_q_pool(),
        fn_constructor_kwargs=dict(target=16))
    return ds.map_batches(
        lambda b: pa.table({
            "media_id": b.column("media_id"),
            "width": b.column("width").cast(pa.int64()),
            "height": b.column("height").cast(pa.int64()),
            "channels": b.column("channels").cast(pa.int64()),
            "n_bytes_out": b.column("n_bytes_out"),
            "resized_sum": b.column("resized_sum"),
        }),
        batch_format="pyarrow")


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def user_sessions(sf_dir: str) -> "ray.data.Dataset":
    """Sessionization: per-user event streams split at >30-min
    inactivity gaps (classic stateful streaming op).

    Delegates to the BOUNDED salted implementation
    (``pipelines/windows.py``): per-(user, day) local sessionize +
    boundary stitch, so no aggregate group ever collects a user's full
    timestamp history (a 10^8-event power user stays within per-day
    state). Identical output contract and oracle as the former
    per-user-collect version; ``user_sessions_salted`` is kept as an
    alias exposing the same path under its catalog name."""
    return _win.sessionize_salted(_events(sf_dir, ["user_id", "ts"]),
                                  gap_us=SESSION_GAP_US)


def heavy_hitters(sf_dir: str) -> pa.Table:
    """Exact heavy-hitter tokens (count >= total_tokens // 200) via a
    Count-Min-sketch prefilter + exact verify of the candidate superset
    (functions/sketches.py) — the sketch bounds the exact aggregate's
    input regardless of vocabulary size."""
    return _sk.heavy_hitter_tokens(_documents(sf_dir, ["text"]), "text",
                                   divisor=200)


def user_sessions_salted(sf_dir: str) -> "ray.data.Dataset":
    """Sessionization with hot-key salting: per-(user, day) local
    sessionize + boundary stitch (pipelines/windows.py) — per-group
    state bounded by a user's events per DAY, the skew-safe variant of
    ``user_sessions`` for power users; identical output contract and
    oracle."""
    return _win.sessionize_salted(_events(sf_dir, ["user_id", "ts"]),
                                  gap_us=SESSION_GAP_US)


def knn_cosine_ivf(sf_dir: str) -> pa.Table:
    """IVF (coarse k-means quantizer) approximate kNN — the inverted-
    list scale path alongside the LSH variant."""
    tbl = _sim.knn_cosine_ivf(_embeddings(sf_dir), KNN_QUERY_IDS,
                              k=KNN_K, n_clusters=16, n_probe=4)
    return pa.table({
        "query_id": tbl.column("query_id"),
        "neighbor_id": tbl.column("neighbor_id"),
        "rank": tbl.column("rank"),
        "cosine_sim": pc.round(tbl.column("cosine_sim"), ndigits=4),
    })


def sample_documents(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic 10% sample via a multiplicative hash of doc_id —
    reproducible across runs/cluster sizes (unlike RNG-based sampling)
    and pushed down as a vectorized filter."""

    def pick(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        return batch.filter(pa.array((h % np.uint64(100)) < 10))

    return _documents(sf_dir).map_batches(pick, batch_format="pyarrow")


def term_doc_freq(sf_dir: str) -> pa.Table:
    """Corpus-level inverted term statistics (the vocabulary /
    TF-IDF-document-frequency building block): tokens are DEDUPED PER
    DOC map-side (so only distinct (doc, token) evidence shuffles),
    then ONE groupby(token) count. Top 20 by df desc, token asc."""

    def explode(batch: pa.Table) -> pa.Table:
        out: list[str] = []
        for t in batch.column("text").to_pylist():
            out.extend(set(_ts.tokenize(t)))
        return pa.table({"token": pa.array(out, pa.string())})

    agg = _documents(sf_dir, ["text"]).map_batches(
        explode, batch_format="pyarrow").groupby("token").aggregate(
        ray.data.aggregate.Count())
    tbl = pa.Table.from_pylist(agg.take_all())
    tbl = pa.table({
        "token": tbl.column("token"),
        "df": tbl.column("count()").cast(pa.int64()),
    })
    idx = pc.sort_indices(tbl, sort_keys=[("df", "descending"),
                                          ("token", "ascending")])
    return tbl.take(idx[:20])


def orders_mktsegment(sf_dir: str) -> pa.Table:
    """Large-side shuffle HASH JOIN (``Dataset.join``) — the
    counterpart of the broadcast lookup in ``orders_by_nation`` for
    when the build side is too big to broadcast: orders x customer on
    custkey, rolled up per market segment in exact integer micros."""
    orders = ray.data.read_parquet(
        str(Path(sf_dir) / "orders.parquet"),
        columns=["o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(
        str(Path(sf_dir) / "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner",
                         num_partitions=_join_parts(),
                         on=("o_custkey",), right_on=("c_custkey",))

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "mktsegment": batch.column("c_mktsegment"),
            "price_micros": _micros(batch.column("o_totalprice")),
        })

    agg = joined.map_batches(proj, batch_format="pyarrow").groupby(
        "mktsegment").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("price_micros"),
    )
    tbl = pa.Table.from_pylist(agg.take_all())
    return pa.table({
        "mktsegment": tbl.column("mktsegment"),
        "n_orders": tbl.column("count()").cast(pa.int64()),
        "total_micros": tbl.column("sum(price_micros)").cast(pa.int64()),
    })


def _lang_winners(tbl: pa.Table) -> pa.Table:
    """First row per lang after a (lang asc, n_chars desc, doc_id asc)
    sort — vectorized group-wise argmax."""
    import numpy as np

    idx = pc.sort_indices(tbl, sort_keys=[
        ("lang", "ascending"), ("n_chars", "descending"),
        ("doc_id", "ascending")])
    t2 = tbl.take(idx)
    langs = np.asarray(t2.column("lang").to_pylist(), dtype=object)
    first = np.ones(len(langs), dtype=bool)
    first[1:] = langs[1:] != langs[:-1]
    return t2.filter(pa.array(first))


def top_doc_per_lang(sf_dir: str) -> pa.Table:
    """Group-wise argmax (longest doc per language, ties to the lowest
    doc_id): a MAP-SIDE COMBINER (each batch emits at most one winner
    row per lang) feeds a GROUPED k=1 top-k reduce whose per-group
    state is bounded by k — the driver sees only |langs| final rows,
    independent of block count (functions/topk.py)."""
    def partial(batch: pa.Table) -> pa.Table:
        return _lang_winners(batch.select(["lang", "doc_id", "n_chars"]))

    agg = _documents(sf_dir, ["lang", "doc_id", "n_chars"]).map_batches(
        partial, batch_format="pyarrow").groupby("lang").aggregate(
        _topk.topk_rows_agg(["doc_id", "n_chars"],
                            [("n_chars", True), ("doc_id", False)], 1))
    tbl = pa.Table.from_pylist(agg.take_all())
    if tbl.num_rows == 0:
        return pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                          ("n_chars", pa.int64())]).empty_table()
    out = _topk.explode_topk(tbl, ["lang"], ["doc_id", "n_chars"],
                             [pa.int64(), pa.int64()])
    return out.take(pc.sort_indices(
        out, sort_keys=[("lang", "ascending")])).select(
        ["lang", "doc_id", "n_chars"])


def events_asof_join(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: each purchase event paired with the user's most
    recent click at-or-before it (nulls when none) — the custom
    temporal-join operator from the builder brief, expressed as one
    grouped collect + vectorized searchsorted (pipelines/windows.py)."""
    return _win.asof_last_event(
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]),
        left_type="purchase", right_type="click")


RANGE_JOIN_WINDOW_US = 3_600_000_000  # 1 hour


def events_range_join(sf_dir: str) -> "ray.data.Dataset":
    """Range (interval) join: each purchase event paired with the
    count and exact integer-micro value sum of the same user's clicks
    in the inclusive preceding hour — the bounded-window sibling of the
    as-of join, bucketed with ghost rows at bucket boundaries
    (pipelines/windows.py:range_join_events)."""
    return _win.range_join_events(
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                         "value"]),
        left_type="purchase", right_type="click",
        window_us=RANGE_JOIN_WINDOW_US)


def events_sliding_3h(sf_dir: str) -> pa.Table:
    """Sliding 3-hour windowed totals per event type (RANGE window over
    the hourly pre-aggregate)."""
    return _win.sliding_hourly(
        _events(sf_dir, ["event_type", "ts", "value"]), window_hours=3)


def doc_length_percentiles(sf_dir: str) -> pa.Table:
    """Exact per-language length percentiles via a distributed
    value-count histogram (only pre-combined (lang, n_chars, count)
    rows shuffle; the quantile extraction reads the bounded per-group
    histogram, matching DuckDB quantile_disc)."""
    return _sk.grouped_quantiles(
        _documents(sf_dir, ["lang", "n_chars"]), "lang", "n_chars",
                                 [0.5, 0.9, 0.99], ["p50", "p90", "p99"])


def customers_no_urgent_orders(sf_dir: str) -> "ray.data.Dataset":
    """ANTI join: customers that never placed a 1-URGENT order, via a
    distributed ``left_anti`` hash join of customer against the
    distinct urgent-order custkeys (filter pushed to the read; the
    distinct pass is a keys-only groupby, so only pre-deduped keys
    shuffle)."""
    cust = ray.data.read_parquet(
        str(Path(sf_dir) / "customer.parquet"),
        columns=["c_custkey", "c_name", "c_mktsegment"])
    okeys = ray.data.read_parquet(
        str(Path(sf_dir) / "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'").select_columns(
        ["o_custkey"]).groupby("o_custkey").count().drop_columns(
        ["count()"])
    return cust.join(okeys, join_type="left_anti",
                     num_partitions=_join_parts(),
                     on=("c_custkey",), right_on=("o_custkey",))


def bigram_counts(sf_dir: str) -> pa.Table:
    """Top-20 whitespace-token bigrams: per-batch Counter partials (the
    map-side combiner bounds shuffle rows by the bigram vocabulary per
    block), one groupby(bigram) sum, top-k on the driver."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = _ts.tokenize(t)
            c.update(map(" ".join, zip(toks, toks[1:])))
        return pa.table({
            "bigram": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    agg = _documents(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow").groupby("bigram").aggregate(
        ray.data.aggregate.Sum("n"))
    tbl = pa.Table.from_pylist(agg.take_all())
    tbl = pa.table({
        "bigram": tbl.column("bigram"),
        "n": tbl.column("sum(n)").cast(pa.int64()),
    })
    idx = pc.sort_indices(tbl, sort_keys=[("n", "descending"),
                                          ("bigram", "ascending")])
    return tbl.take(idx[:20])


def distinct_tokens_per_lang(sf_dir: str) -> pa.Table:
    """EXACT distinct-token count per language: per-doc in-batch token
    dedupe, one groupby(lang, token) to global-dedupe, then a tiny
    per-lang count of the distinct pairs."""

    def explode(batch: pa.Table) -> pa.Table:
        langs: list[str] = []
        toks: list[str] = []
        for lang, t in zip(batch.column("lang").to_pylist(),
                           batch.column("text").to_pylist()):
            for tok in set(_ts.tokenize(t)):
                langs.append(lang)
                toks.append(tok)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "token": pa.array(toks, pa.string())})

    pairs = _documents(sf_dir, ["lang", "text"]).map_batches(
        explode, batch_format="pyarrow").groupby(
        ["lang", "token"]).count().drop_columns(["count()"])
    agg = pairs.groupby("lang").count()
    tbl = pa.Table.from_pylist(agg.take_all())
    out = pa.table({
        "lang": tbl.column("lang"),
        "n_distinct_tokens": tbl.column("count()").cast(pa.int64()),
    })
    return out.take(pc.sort_indices(out, sort_keys=[("lang", "ascending")]))


def approx_distinct_tokens_hll(sf_dir: str) -> pa.Table:
    """HyperLogLog (p=12) distinct-token estimate per language — the
    sketch path that replaces the exact vocabulary groupby at 10^12
    tokens. Approximate by nature (rows-only for the driver); pytest
    bounds the error vs the exact count (functions/sketches.py)."""
    return _sk.grouped_hll_distinct(
        _documents(sf_dir, ["lang", "text"]), "lang", "text")


TOPK_PER_LANG = 3


def _lang_topk(tbl: pa.Table, k: int) -> pa.Table:
    """First k rows per lang after a (lang asc, n_chars desc, doc_id
    asc) sort — vectorized group-wise top-k with rank."""
    import numpy as np

    idx = pc.sort_indices(tbl, sort_keys=[
        ("lang", "ascending"), ("n_chars", "descending"),
        ("doc_id", "ascending")])
    t2 = tbl.take(idx)
    langs = np.asarray(t2.column("lang").to_pylist(), dtype=object)
    first = np.ones(len(langs), dtype=bool)
    first[1:] = langs[1:] != langs[:-1]
    # rank within group = index - index_of_group_start
    starts = np.maximum.accumulate(
        np.where(first, np.arange(len(langs)), 0))
    rank = np.arange(len(langs)) - starts + 1
    out = t2.append_column("rank", pa.array(rank, pa.int64()))
    return out.filter(pa.array(rank <= k))


def top3_docs_per_lang(sf_dir: str) -> pa.Table:
    """Group-wise top-k (k=3 longest docs per language): map-side
    combiner (at most k rows per lang per batch) + grouped top-k final
    reduce with k-bounded per-group state — driver memory is
    O(k x |langs|), independent of block count."""
    def partial(batch: pa.Table) -> pa.Table:
        return _lang_topk(batch.select(["lang", "doc_id", "n_chars"]),
                          TOPK_PER_LANG).drop_columns(["rank"])

    agg = _documents(sf_dir, ["lang", "doc_id", "n_chars"]).map_batches(
        partial, batch_format="pyarrow").groupby("lang").aggregate(
        _topk.topk_rows_agg(["doc_id", "n_chars"],
                            [("n_chars", True), ("doc_id", False)],
                            TOPK_PER_LANG))
    tbl = pa.Table.from_pylist(agg.take_all())
    if tbl.num_rows == 0:
        return pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                          ("n_chars", pa.int64()),
                          ("rank", pa.int64())]).empty_table()
    out = _topk.explode_topk(tbl, ["lang"], ["doc_id", "n_chars"],
                             [pa.int64(), pa.int64()], rank_col="rank")
    return out.take(pc.sort_indices(
        out, sort_keys=[("lang", "ascending"),
                        ("rank", "ascending")])).select(
        ["lang", "doc_id", "n_chars", "rank"])


def label_stats(sf_dir: str) -> pa.Table:
    """Relational aggregate OVER the vector column: per-label vector
    counts and the exact integer-micro sum of the first embedding
    dimension (list_element + groupby; no driver materialization)."""

    def proj(batch: pa.Table) -> pa.Table:
        e0 = pc.list_element(batch.column("embedding"), 0)
        return pa.table({
            "label": batch.column("label"),
            "e0_micros": pc.round(pc.multiply(
                e0.cast(pa.float64()), 1_000_000.0)).cast(pa.int64()),
        })

    agg = _embeddings(sf_dir).map_batches(
        proj, batch_format="pyarrow").groupby("label").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("e0_micros"))
    tbl = pa.Table.from_pylist(agg.take_all())
    out = pa.table({
        "label": tbl.column("label").cast(pa.int32()),
        "n_vecs": tbl.column("count()").cast(pa.int64()),
        "sum_e0_micros": tbl.column("sum(e0_micros)").cast(pa.int64()),
    })
    return out.take(pc.sort_indices(out, sort_keys=[("label", "ascending")]))


def extract_spans(sf_dir: str) -> "ray.data.Dataset":
    """Span-emitting extraction: per-doc span count, contiguity check
    (every span starts where the previous ended, first at 0) and total
    covered chars — the span integrity contract is SQL-checkable
    because the synthetic template yields a fixed piece structure
    (7 text nodes, 6 when the body text is empty — the parser drops
    empty text tokens, reference src/parseTemplate.js:50-52)."""
    ex = _ep.extract_dataset(_corpus(sf_dir), spans=True,
                             concurrency=_q_pool(),
                             passthrough=("doc_id",))

    def span_stats(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        contiguous: list[bool] = []
        totals: list[int] = []
        for row in spans.to_pylist():
            ok = (not row or row[0]["start"] == 0) and all(
                row[i]["end"] == row[i + 1]["start"]
                for i in range(len(row) - 1))
            contiguous.append(ok)
            totals.append(row[-1]["end"] if row else 0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_spans": pc.list_value_length(spans).cast(pa.int64()),
            "spans_contiguous": pa.array(contiguous, pa.bool_()),
            "total_span_chars": pa.array(totals, pa.int64()),
        })

    return ex.map_batches(span_stats, batch_format="pyarrow")


def revenue_by_region(sf_dir: str) -> pa.Table:
    """TPC-H-Q5-style multi-way dimension join: lineitem revenue rolled
    up to the supplier's region through supplier -> nation -> region.
    All three dimension tables are small sides, composed driver-side
    into ONE suppkey -> region-name map broadcast via ``ray.put`` as
    sorted numpy arrays; the fact scan is an actor-pool stage
    (lookup built once per actor, one vectorized searchsorted per
    batch — no shuffle join, zero per-row Python) and only the
    pre-combined per-region partials exchange."""
    import numpy as np
    import pyarrow.parquet as pq

    supp = pq.read_table(str(Path(sf_dir) / "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(str(Path(sf_dir) / "nation.parquet"),
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(str(Path(sf_dir) / "region.parquet"),
                        columns=["r_regionkey", "r_name"])
    rkeys = reg.column("r_regionkey").to_numpy()
    rnames = np.asarray(reg.column("r_name").to_pylist(), dtype=object)
    rorder = np.argsort(rkeys)
    nkeys = nat.column("n_nationkey").to_numpy()
    nreg = nat.column("n_regionkey").to_numpy()
    nation_region = rnames[rorder][np.searchsorted(rkeys[rorder], nreg)]
    norder = np.argsort(nkeys)
    snat = supp.column("s_nationkey").to_numpy()
    supp_region = nation_region[norder][
        np.searchsorted(nkeys[norder], snat)]
    lookup_ref = _sorted_lookup_ref(
        supp.column("s_suppkey").to_numpy(), supp_region)

    class AttachRegion(_SortedLookup):
        def __init__(self):
            super().__init__(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            disc = pc.multiply(
                batch.column("l_extendedprice").cast(pa.float64()),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
            t = pa.table({
                "region": self.map(batch.column("l_suppkey")),
                "revenue_micros": pc.round(pc.multiply(
                    disc, 1_000_000.0)).cast(pa.int64()),
            })
            # map-side combine: <=|regions| rows leave each block
            return pa.TableGroupBy(t, ["region"]).aggregate(
                [("revenue_micros", "sum"),
                 ([], "count_all")]).rename_columns(
                ["region", "revenue_micros", "n_items"])

    agg = ray.data.read_parquet(
        str(Path(sf_dir) / "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"]).map_batches(
        AttachRegion, batch_format="pyarrow",
        concurrency=_q_pool()).groupby("region").aggregate(
        ray.data.aggregate.Sum("n_items"),
        ray.data.aggregate.Sum("revenue_micros"))
    tbl = pa.Table.from_pylist(agg.take_all())
    out = pa.table({
        "region": tbl.column("region"),
        "n_items": tbl.column("sum(n_items)").cast(pa.int64()),
        "revenue_micros": tbl.column("sum(revenue_micros)").cast(
            pa.int64()),
    })
    return out.take(pc.sort_indices(
        out, sort_keys=[("region", "ascending")]))


def parts_by_brand(sf_dir: str) -> pa.Table:
    """Per-brand part counts, exact integer-micro retail-price sums and
    size extrema (completes table coverage: every driver table feeds at
    least one catalog query)."""
    ds = ray.data.read_parquet(
        str(Path(sf_dir) / "part.parquet"),
        columns=["p_brand", "p_retailprice", "p_size"])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "brand": batch.column("p_brand"),
            "price_micros": _micros(batch.column("p_retailprice")),
            "p_size": batch.column("p_size").cast(pa.int64()),
        })

    agg = ds.map_batches(proj, batch_format="pyarrow").groupby(
        "brand").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("price_micros"),
        ray.data.aggregate.Min("p_size"),
        ray.data.aggregate.Max("p_size"))
    tbl = pa.Table.from_pylist(agg.take_all())
    out = pa.table({
        "brand": tbl.column("brand"),
        "n_parts": tbl.column("count()").cast(pa.int64()),
        "sum_price_micros": tbl.column("sum(price_micros)").cast(
            pa.int64()),
        "min_size": tbl.column("min(p_size)").cast(pa.int64()),
        "max_size": tbl.column("max(p_size)").cast(pa.int64()),
    })
    return out.take(pc.sort_indices(
        out, sort_keys=[("brand", "ascending")]))


SEARCH_TOKENS = ("the", "data", "with", "time")
SEARCH_TOP_K = 20


def keyword_search(sf_dir: str) -> pa.Table:
    """Keyword search: rank documents by query-token occurrence count
    (tf scoring). The query-token set lives in the task closure (tiny
    broadcast); each batch emits only its local top-k partial, and the
    final exact top-k is a GLOBAL k-bounded aggregate (state never
    exceeds k rows; the driver receives exactly k rows, independent of
    block count)."""
    qset = frozenset(SEARCH_TOKENS)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        scores = [sum(1 for tok in _ts.tokenize(t) if tok in qset)
                  for t in batch.column("text").to_pylist()]
        t = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "score": pa.array(scores, pa.int64()),
        })
        t = t.filter(pc.greater(t.column("score"), 0))
        idx = pc.sort_indices(t, sort_keys=[("score", "descending"),
                                            ("doc_id", "ascending")])
        return t.take(idx[:SEARCH_TOP_K])

    res = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow").aggregate(
        _topk.topk_rows_agg(["doc_id", "score"],
                            [("score", True), ("doc_id", False)],
                            SEARCH_TOP_K))
    rows = (res or {}).get("topk") or []
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "score": pa.array([r[1] for r in rows], pa.int64()),
    })


def orders_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP aggregate ((status, priority) -> status -> grand total)
    with ONE shuffle: only the leaf groupby exchanges data; the two
    coarser levels are derived from the tiny leaf table (|status| x
    |priority| rows) with local Arrow re-aggregation."""
    orders = ray.data.read_parquet(
        str(Path(sf_dir) / "orders.parquet"),
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "status": batch.column("o_orderstatus"),
            "priority": batch.column("o_orderpriority"),
            "price_micros": _micros(batch.column("o_totalprice")),
        })

    agg = orders.map_batches(proj, batch_format="pyarrow").groupby(
        ["status", "priority"]).aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("price_micros"))
    leaf = pa.Table.from_pylist(agg.take_all())
    leaf = pa.table({
        "status": leaf.column("status"),
        "priority": leaf.column("priority"),
        "n_orders": leaf.column("count()").cast(pa.int64()),
        "total_micros": leaf.column("sum(price_micros)").cast(pa.int64()),
    })

    def rollup(tbl: pa.Table, keys: list[str]) -> pa.Table:
        if keys:
            g = pa.TableGroupBy(tbl.select(
                keys + ["n_orders", "total_micros"]), keys).aggregate(
                [("n_orders", "sum"), ("total_micros", "sum")])
            out = {k: g.column(k) for k in keys}
        else:
            g = pa.table({
                "n_orders_sum": [pc.sum(tbl.column("n_orders"))],
                "total_micros_sum": [pc.sum(tbl.column("total_micros"))]})
            out = {}
        n = g.num_rows
        for k in ("status", "priority"):
            if k not in keys:
                out[k] = pa.array(["ALL"] * n, pa.string())
        out["n_orders"] = g.column("n_orders_sum").cast(pa.int64())
        out["total_micros"] = g.column("total_micros_sum").cast(pa.int64())
        return pa.table({c: out[c] for c in
                         ("status", "priority", "n_orders", "total_micros")})

    full = pa.concat_tables([
        leaf.select(["status", "priority", "n_orders", "total_micros"]),
        rollup(leaf, ["status"]),
        rollup(leaf, []),
    ])
    return full.take(pc.sort_indices(full, sort_keys=[
        ("status", "ascending"), ("priority", "ascending")]))


def events_json_props(sf_dir: str) -> pa.Table:
    """Semi-structured extraction: parse the JSON ``props`` column
    ({"k": N}) with a vectorized RE2 kernel (``pc.extract_regex`` —
    zero Python per row) and roll the extracted ints up per event
    type."""

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"),
                             r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table({
            "event_type": batch.column("event_type"),
            "k": k,
        })

    agg = _events(sf_dir, ["event_type", "props"]).map_batches(
        extract, batch_format="pyarrow").groupby("event_type").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("k"))
    tbl = pa.Table.from_pylist(agg.take_all())
    out = pa.table({
        "event_type": tbl.column("event_type"),
        "n_events": tbl.column("count()").cast(pa.int64()),
        "sum_k": tbl.column("sum(k)").cast(pa.int64()),
    })
    return out.take(pc.sort_indices(
        out, sort_keys=[("event_type", "ascending")]))


def normalize_text(sf_dir: str) -> "ray.data.Dataset":
    """Text normalization entirely in Arrow compute kernels (lowercase,
    whitespace collapse, edge trim) — no Python string touches a row."""

    def norm(batch: pa.Table) -> pa.Table:
        x = pc.utf8_lower(batch.column("text"))
        x = pc.replace_substring_regex(x, r"\s+", " ")
        x = pc.utf8_trim(x, " ")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "norm_text": x,
            "n_chars_norm": pc.utf8_length(x).cast(pa.int64()),
        })

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow")


VOCAB_BROADCAST_LIMIT = 2_000_000


def doc_freq_score(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-frequency quality score (CCNet-style common-vs-rare
    signal, exact-integer variant): for each document, the sum of the
    GLOBAL occurrence counts of its tokens. The distributed
    term-frequency aggregate builds the vocabulary model; model
    application is size-adaptive — a ``ray.put`` broadcast + per-batch
    dict lookups below ``VOCAB_BROADCAST_LIMIT`` distinct tokens, a
    distributed (doc_id, token) x tf shuffle join + per-doc sum above
    it (web-scale vocabularies do not fit a driver dict). Both paths
    are exact-integer, so the SQL join oracle matches bit-for-bit."""
    docs = _documents(sf_dir, ["doc_id", "text"])
    tf = docs.map_batches(
        _explode_tokens, batch_format="pyarrow").groupby(
        "token").count().materialize()

    if tf.count() <= VOCAB_BROADCAST_LIMIT:
        vocab: dict[str, int] = {}
        for b in tf.iter_batches(batch_format="pyarrow", batch_size=None):
            vocab.update(zip(
                b.column("token").to_pylist(),
                (int(x) for x in b.column("count()").to_pylist())))
        vocab_ref = ray.put(vocab)

        def score(batch: pa.Table) -> pa.Table:
            # worker-cached: the vocab dict near the broadcast limit is
            # hundreds of MB; unpickle once per worker, not per batch
            v = _bcast.cached_get(vocab_ref)
            sums = []
            for t in batch.column("text").to_pylist():
                sums.append(sum(v.get(x, 0) for x in _ts.tokenize(t)))
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "freq_score": pa.array(sums, pa.int64()),
            })

        return docs.map_batches(score, batch_format="pyarrow")
    return _doc_freq_score_join(docs, tf)


def _explode_tokens(batch: pa.Table) -> pa.Table:
    toks: list[str] = []
    for t in batch.column("text").to_pylist():
        toks.extend(_ts.tokenize(t))
    return pa.table({"token": pa.array(toks, pa.string())})


def _doc_freq_score_join(docs: "ray.data.Dataset",
                         tf: "ray.data.Dataset") -> "ray.data.Dataset":
    """Fully distributed scoring path: explode (doc_id, token)
    occurrence rows, shuffle-join them against the tf table, sum per
    doc, and recover zero-token docs with a left_outer id join."""

    def explode_ids(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        toks: list[str] = []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            for tok in _ts.tokenize(t):
                ids.append(d)
                toks.append(tok)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string())})

    tf_n = tf.map_batches(
        lambda b: pa.table({"token": b.column("token"),
                            "n": b.column("count()").cast(pa.int64())}),
        batch_format="pyarrow")
    # every doc token appears in tf by construction -> inner join is lossless
    joined = docs.map_batches(explode_ids, batch_format="pyarrow").join(
        tf_n, join_type="inner", num_partitions=_join_parts(),
        on=("token",))
    sums = joined.groupby("doc_id").aggregate(
        ray.data.aggregate.Sum("n"))
    scored = sums.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"),
                            "freq_score": b.column("sum(n)").cast(
                                pa.int64())}),
        batch_format="pyarrow")
    # docs with zero tokens have no occurrence rows: left join + fill 0
    base = docs.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    out = base.join(scored, join_type="left_outer",
                    num_partitions=_join_parts(), on=("doc_id",))

    def fill(batch: pa.Table) -> pa.Table:
        fs = batch.column("freq_score")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "freq_score": pc.coalesce(fs, pa.scalar(0, pa.int64())).cast(
                pa.int64()),
        })

    return out.map_batches(fill, batch_format="pyarrow")


CORRUPTIONS = ("ok", "ff_insert", "nul_insert")


def extract_error_contract(sf_dir: str) -> pa.Table:
    """Poison-document contract: the corpus cycled through deterministic
    corruption classes (doc_id%3: intact / invalid UTF-8 lead byte
    spliced at offset 10 / NUL spliced at offset 10). Invalid bytes must
    produce a per-row error (never abort the job, SURVEY.md P5); NUL is
    EOF (L2), truncating cleanly with no error. Per-class error/output
    counts are the closed-form contract."""

    def corrupt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        htmls = batch.column("html").to_pylist()
        out = []
        cls = []
        for d, h in zip(ids, htmls):
            c = CORRUPTIONS[d % 3]
            cls.append(c)
            if c == "ff_insert":
                h = h[:10] + b"\xff" + h[10:]
            elif c == "nul_insert":
                h = h[:10] + b"\x00" + h[10:]
            out.append(h)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "url": batch.column("url"),
            "html": pa.array(out, pa.binary()),
            "corruption": pa.array(cls, pa.string()),
        })

    ex = _ep.extract_dataset(
        _corpus(sf_dir).map_batches(corrupt, batch_format="pyarrow"),
        spans=False, concurrency=_q_pool(),
        passthrough=("doc_id", "corruption"))

    def flags(batch: pa.Table) -> pa.Table:
        return pa.table({
            "corruption": batch.column("corruption"),
            "is_err": pc.invert(pc.equal(
                batch.column("error"), "")).cast(pa.int64()),
            "has_text": pc.invert(pc.equal(
                batch.column("extracted_text"), "")).cast(pa.int64()),
        })

    agg = ex.map_batches(flags, batch_format="pyarrow").groupby(
        "corruption").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("is_err"),
        ray.data.aggregate.Sum("has_text"))
    tbl = pa.Table.from_pylist(agg.take_all())
    out = pa.table({
        "corruption": tbl.column("corruption"),
        "n_docs": tbl.column("count()").cast(pa.int64()),
        "n_errors": tbl.column("sum(is_err)").cast(pa.int64()),
        "n_docs_with_text": tbl.column("sum(has_text)").cast(pa.int64()),
    })
    return out.take(pc.sort_indices(
        out, sort_keys=[("corruption", "ascending")]))


def dedup_minhash_keep(sf_dir: str) -> pa.Table:
    """END-TO-END near-dup removal: MinHash+LSH candidates -> exact
    Jaccard verify (>=0.8) -> connected components -> keep each
    component's min-id row. The output is the deduplicated corpus
    membership (what a training-data pipeline actually ships)."""
    pairs = _minhash_verified_pairs(sf_dir, threshold=0.8)
    kept = _dedup.keep_canonical(
        _mutated_corpus(sf_dir), ray.data.from_arrow(pairs),
        id_col="doc_id")
    tbl = pa.concat_tables(list(kept.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    tbl = tbl.select(["doc_id", "lang", "source", "n_chars"])
    return tbl.take(pc.sort_indices(
        tbl, sort_keys=[("doc_id", "ascending")]))


FUNNEL_MIN_TOKENS = 24
FUNNEL_MIN_STOPWORD_RATIO = 0.02


def corpus_filter_funnel(sf_dir: str) -> pa.Table:
    """Training-data curation funnel: cumulative per-stage survivor
    counts for token-length, stopword-density and language filters,
    then exact dedup of the survivors. The text analysis
    (tokenize/score/lang-vote/fingerprint) runs in ONE distributed
    pass emitting a tiny (fp, flags) row per doc, which is materialized
    and consumed twice: pure-aggregate sums for the stage counts, and a
    distinct-fp groupby over the survivor subset for the dedup stage."""

    def flags(batch: pa.Table) -> pa.Table:
        import numpy as np
        q = _ts.quality_batch(batch)
        lp = _ts.lang_id_batch(batch)
        fp = _ts.fingerprint_batch(batch)
        nt = q.column("n_tokens").to_numpy(zero_copy_only=False)
        sr = q.column("stopword_ratio").to_numpy(zero_copy_only=False)
        known = pc.not_equal(
            lp.column("lang_pred"), "und").to_numpy(zero_copy_only=False)
        s1 = nt >= FUNNEL_MIN_TOKENS
        s2 = s1 & (sr >= FUNNEL_MIN_STOPWORD_RATIO)
        s3 = s2 & known
        return pa.table({
            "fp_md5": fp.column("fp_md5"),
            "s1": pa.array(s1.astype(np.int64), pa.int64()),
            "s2": pa.array(s2.astype(np.int64), pa.int64()),
            "s3": pa.array(s3.astype(np.int64), pa.int64()),
        })

    per_doc = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        flags, batch_format="pyarrow").materialize()
    n0 = per_doc.count()
    sums = per_doc.sum(["s1", "s2", "s3"])
    n4 = per_doc.filter(expr="s3 == 1").groupby(
        "fp_md5").count().count()
    return pa.table({
        "stage": pa.array(["0_input", "1_min_tokens", "2_stopwords",
                           "3_lang_known", "4_exact_dedup"], pa.string()),
        "n_docs": pa.array([int(n0), int(sums["sum(s1)"]),
                            int(sums["sum(s2)"]), int(sums["sum(s3)"]),
                            int(n4)], pa.int64()),
    })


def extract_text_jsonl(sf_dir: str) -> "ray.data.Dataset":
    """The flagship extraction fed from a JSONL corpus
    (``ray.data.read_json`` over string-typed html) — same fused
    actor-pool stage, same byte-identical oracle as ``extract_text``;
    proves source-format independence of the engine."""
    from ..sources.jsonl_corpus import jsonl_corpus_dir

    corpus = ray.data.read_json(str(jsonl_corpus_dir(sf_dir)))
    ex = _ep.extract_dataset(corpus, spans=False,
                             concurrency=_q_pool(),
                             passthrough=("doc_id",))
    return ex.map_batches(
        lambda b: b.select(["doc_id", "extracted_text", "n_chars_extracted",
                            "n_nodes", "n_links", "error"]),
        batch_format="pyarrow")


def token_count_csv(sf_dir: str) -> "ray.data.Dataset":
    """Token counting fed from a CSV materialization of the documents
    table (``write_csv`` -> ``read_csv`` round-trip, including quoted
    newlines) — same oracle as ``token_count``."""
    from pyarrow import csv as pa_csv

    from ..sources.jsonl_corpus import csv_documents_dir

    ds = ray.data.read_csv(
        str(csv_documents_dir(sf_dir)),
        parse_options=pa_csv.ParseOptions(newlines_in_values=True))
    return ds.map_batches(_ts.token_count_batch, batch_format="pyarrow")


def audio_features(sf_dir: str) -> "ray.data.Dataset":
    """REAL audio feature extraction: the same deterministic WAV PCM
    payloads as ``audio_pcm_stats`` (sample[i] = ((i*37 + id*11) %
    4096) - 2048; 16/24-bit containers alternating) flow through the
    ``AudioFrameEnergyBatch`` actor pool (functions/multimodal.py):
    RIFF walk + per-64-sample-window integer energy (sum |sample|).
    The query reduces the per-window energies to (n_windows,
    energy_sum, peak_window) — each an exact closed form the SQL
    oracle reproduces via ``GROUP BY i // 64``, verifying the PCM
    decode and the framing bit-for-bit."""
    import numpy as np

    ds = _documents(sf_dir, ["doc_id"]).map_batches(
        _wav_blob_batch, batch_format="pyarrow").map_batches(
        _mm.AudioFrameEnergyBatch, batch_format="pyarrow",
        concurrency=_q_pool(),
        fn_constructor_kwargs=dict(window=64))

    def finish(batch: pa.Table) -> pa.Table:
        feats = batch.column("frame_energy").combine_chunks()
        offs = feats.offsets.to_numpy(zero_copy_only=False)
        vals = feats.values.to_numpy(zero_copy_only=False)
        # vectorized per-row sum/max over the flat list buffer
        csum = np.concatenate(([0], np.cumsum(vals)))
        sums = csum[offs[1:]] - csum[offs[:-1]]
        if len(vals) and (offs[1:] > offs[:-1]).all():
            # every row non-empty (always true here: n >= 100 samples
            # -> >= 2 windows): one segmented-max kernel
            peaks = np.maximum.reduceat(vals, offs[:-1])
        else:  # safety fallback for empty rows
            peaks = np.array([vals[a:b].max() if b > a else 0
                              for a, b in zip(offs[:-1], offs[1:])],
                             np.int64)
        return pa.table({
            "media_id": batch.column("media_id"),
            "sample_rate": batch.column("sample_rate"),
            "n_samples": batch.column("n_samples"),
            "n_windows": batch.column("n_windows"),
            "energy_sum": pa.array(sums.astype(np.int64), pa.int64()),
            "peak_window": pa.array(peaks, pa.int64()),
        })

    return ds.map_batches(finish, batch_format="pyarrow")


# --- corpus curation (functions/curation.py) -----------------------------


PACK_CAPACITY = 2048  # tokens per training chunk


def sequence_packing(sf_dir: str) -> "ray.data.Dataset":
    """Training-sequence packing: documents laid end-to-end by doc_id
    and cut into 2048-token chunks — a DISTRIBUTED PREFIX-SUM SCAN
    (per-bucket sums -> driver exclusive offsets over the tiny bucket
    table -> per-bucket resolution; functions/curation.py)."""
    return _cur.sequence_packing(
        _documents(sf_dir, ["doc_id", "text"]), capacity=PACK_CAPACITY)


def decontaminate(sf_dir: str) -> "ray.data.Dataset":
    """Benchmark decontamination: flag non-benchmark docs sharing any
    8-token shingle with the benchmark subset (doc_id%97==0) via a
    distributed fingerprint join — neither side is broadcast, so the
    benchmark set may itself be web-scale."""
    return _cur.decontaminate(_documents(sf_dir, ["doc_id", "text"]),
                              width=8, benchmark_mod=97,
                              join_parts=_join_parts())


def pii_redact(sf_dir: str) -> "ray.data.Dataset":
    """PII scrub: count + redact emails and phone numbers with
    vectorized RE2 kernels (deterministic augmentation seeds the
    corpus with synthetic PII; zero Python per row)."""
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _cur.pii_redact_batch, batch_format="pyarrow")


def repetition_ratio(sf_dir: str) -> "ray.data.Dataset":
    """Gopher-style repetition quality signal: duplicate word-3-gram
    fraction per document, integer-exact."""
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _cur.repetition_stats_batch, batch_format="pyarrow")


def events_lag(sf_dir: str) -> "ray.data.Dataset":
    """LAG window per user (prev event + gap), time-bucketed with
    carry rows so no group holds a user's full history
    (pipelines/windows.py:lag_events)."""
    return _win.lag_events(
        _events(sf_dir, ["event_id", "user_id", "ts"]))


STRAT_K = 5  # docs sampled per language


def stratified_sample_by_lang(sf_dir: str) -> pa.Table:
    """Stratified sampling: the first STRAT_K docs per language under
    md5(doc_id) ordering — deterministic, reproducible across cluster
    sizes (md5 chosen because DuckDB reproduces it bit-exactly).
    Map-side per-lang top-k partials + a bounded grouped final reduce
    (state <= k rows per group regardless of block count). The sort
    key is PACKED into one string ``md5hex|%020d(doc_id)`` so the
    aggregate state stays a homogeneous Arrow list and lexicographic
    order equals (md5, doc_id) order."""
    import hashlib as _hl

    def keyed(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column("doc_id").to_pylist()
        keys = np.asarray(
            [f"{_hl.md5(str(i).encode()).hexdigest()}|{i:020d}"
             for i in ids], dtype=object)
        langs = np.asarray(batch.column("lang").to_pylist(),
                           dtype=object)
        if not len(keys):
            return pa.table({"lang": pa.array([], pa.string()),
                             "key": pa.array([], pa.string())})
        # map-side combiner, Arrow/numpy-native (no pandas round-trip):
        # lexsort by (lang, key), then rank-within-run < k via run
        # starts — each block contributes at most k rows per lang
        order = np.lexsort((keys, langs))
        langs, keys = langs[order], keys[order]
        change = langs[1:] != langs[:-1]
        starts = np.nonzero(np.concatenate(([True], change)))[0]
        run_id = np.cumsum(np.concatenate(([0], change)))
        rank = np.arange(len(langs)) - starts[run_id]
        m = rank < STRAT_K
        return pa.table({
            "lang": pa.array(langs[m], pa.string()),
            "key": pa.array(keys[m], pa.string()),
        })

    agg = _documents(sf_dir, ["doc_id", "lang"]).map_batches(
        keyed, batch_format="pyarrow").groupby("lang").aggregate(
        _topk.topk_rows_agg(["key"], [("key", False)], STRAT_K))
    tbl = pa.Table.from_pylist(agg.take_all())
    out = _topk.explode_topk(tbl, ["lang"], ["key"], [pa.string()],
                             topk_col="topk", rank_col="rank")
    doc_id = pc.cast(
        pc.utf8_slice_codeunits(out.column("key"), 33, 53), pa.int64())
    return pa.table({
        "lang": out.column("lang"),
        "doc_id": doc_id,
        "rank": out.column("rank"),
    }).sort_by([("lang", "ascending"), ("rank", "ascending")])


def source_mixture_sample(sf_dir: str) -> pa.Table:
    """Mixture sampling: per-source keep rates (5 + (src_num % 4)*10
    percent) applied via the deterministic multiplicative doc_id hash.
    Map-side combiner: each batch emits per-source PARTIAL counts, so
    the exchange carries |sources| x |blocks| rows (not one row per
    surviving document) into the final low-cardinality sum."""

    def pick(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = batch.column("source")
        num = pc.cast(pc.utf8_slice_codeunits(src, 3, 99),
                      pa.int64()).to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        keep = (h % np.uint64(100)).astype(np.int64) < 5 + (num % 4) * 10
        part = pc.value_counts(src.filter(pa.array(keep)))
        return pa.table({
            "source": part.field("values"),
            "n": part.field("counts").cast(pa.int64()),
        })

    agg = _documents(sf_dir, ["doc_id", "source"]).map_batches(
        pick, batch_format="pyarrow").groupby("source").aggregate(
        ray.data.aggregate.Sum("n"))
    tbl = pa.Table.from_pylist(agg.take_all())
    return pa.table({
        "source": tbl.column("source"),
        "n_sampled": tbl.column("sum(n)").cast(pa.int64()),
    }).sort_by([("source", "ascending")])


# --- incremental dedup / model scoring / retrieval (round 3) -------------


def incremental_dedup(sf_dir: str) -> pa.Table:
    """Snapshot-vs-incoming exact dedup with a distributed
    Bloom-filter prefilter (functions/incremental.py): snapshot =
    docs with ``doc_id%3==0``; incoming = the rest UNION exact clones
    of ``doc_id%6==0`` docs at ``doc_id+500000`` (guaranteed hits).
    Only Bloom-candidate fingerprints reach the verify join, and the
    prefilter never changes the answer — the oracle is the plain
    ``LEFT JOIN ON md5(text)`` closed form."""
    from ..functions import incremental as _inc

    docs = _documents(sf_dir, ["doc_id", "text"])

    def _mod_filter(batch: pa.Table, *, mod: int, eq: bool) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        rem = pc.subtract(ids, pc.multiply(pc.divide(ids, mod), mod))
        keep = pc.equal(rem, 0) if eq else pc.not_equal(rem, 0)
        return batch.filter(keep)

    snapshot = docs.map_batches(
        _mod_filter, batch_format="pyarrow",
        fn_kwargs={"mod": 3, "eq": True})

    def clone(batch: pa.Table) -> pa.Table:
        t = _mod_filter(batch, mod=6, eq=True)
        return pa.table({
            "doc_id": pc.add(t.column("doc_id").cast(pa.int64()),
                             500000),
            "text": t.column("text"),
        })

    incoming = docs.map_batches(
        _mod_filter, batch_format="pyarrow",
        fn_kwargs={"mod": 3, "eq": False}).union(
        docs.map_batches(clone, batch_format="pyarrow"))
    out = _inc.incremental_dedup(snapshot, incoming,
                                 m_bits=1 << 20, k=4,
                                 join_parts=_join_parts())
    parts = list(out.iter_batches(batch_format="pyarrow",
                                  batch_size=None))
    tbl = pa.concat_tables(parts) if parts else pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "is_dup": pa.array([], pa.int64())})
    return tbl.sort_by([("doc_id", "ascending")])


def quality_classifier(sf_dir: str) -> "ray.data.Dataset":
    """Model-scoring stage: hashing-trick linear classifier over each
    document's tokens (md5 bucket -> deterministic weight in [-10,10];
    integer-exact, so the DuckDB oracle reproduces the inference
    bit-for-bit)."""
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _ts.classifier_score_batch, batch_format="pyarrow")


TFIDF_TERMS = ("join", "hash", "vector")
TFIDF_K = 20


def tfidf_search(sf_dir: str) -> pa.Table:
    """TF-IDF retrieval: rank documents for a fixed query-term set by
    ``sum_t tf(t, d) * idf_milli(t)`` with the integer idf
    ``1_000_000 * N // (1 + df(t))`` (exact, so SQL-checkable).

    Two corpus passes, both with map-side combiners:
    pass 1 reduces per-batch ``(n_docs, df_term...)`` partial rows via
    ``Dataset.sum`` (|terms|+1 integers reach the driver); pass 2
    scores per batch against the broadcast idf vector and keeps each
    batch's local top-k, then ONE bounded global ``topk_rows_agg``
    reduce finishes — O(k) driver state regardless of block count."""
    terms = list(TFIDF_TERMS)
    docs = _documents(sf_dir, ["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        dfs = [0] * len(terms)
        texts = batch.column("text").to_pylist()
        for t in texts:
            s = set(_ts.tokenize(t))
            for i, term in enumerate(terms):
                dfs[i] += term in s
        return pa.table({
            "n": pa.array([len(texts)], pa.int64()),
            **{f"df_{i}": pa.array([dfs[i]], pa.int64())
               for i in range(len(terms))},
        })

    sums = docs.map_batches(df_partial, batch_format="pyarrow").sum(
        ["n"] + [f"df_{i}" for i in range(len(terms))])
    n_docs = int(sums["sum(n)"])
    idf = [1_000_000 * n_docs // (1 + int(sums[f"sum(df_{i})"]))
           for i in range(len(terms))]

    def score_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        rows: list[tuple[int, int]] = []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            toks = _ts.tokenize(t)
            s = sum(toks.count(term) * w for term, w in zip(terms, idf))
            if s > 0:
                rows.append((s, int(i)))
        rows.sort(key=lambda r: (-r[0], r[1]))
        rows = rows[:TFIDF_K]
        return pa.table({
            "score_milli": pa.array([r[0] for r in rows], pa.int64()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        })

    agg = docs.map_batches(score_topk, batch_format="pyarrow").aggregate(
        _topk.topk_rows_agg(["score_milli", "doc_id"],
                            [("score_milli", True), ("doc_id", False)],
                            TFIDF_K))
    rows = agg["topk"]
    return pa.table({
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "score_milli": pa.array([r[0] for r in rows], pa.int64()),
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
    })


def above_median_length(sf_dir: str) -> pa.Table:
    """Per-language median token count (DuckDB ``quantile_disc(0.5)``
    semantics) and the count of docs at-or-above it — BOTH read off one
    distributed ``(lang, n_tokens)`` value-count histogram (map-side
    combined; the only corpus pass), so the quantile AND the filter
    count need no second scan."""

    def lengths(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch.column("lang"),
            "n_tokens": pa.array(
                [len(_ts.tokenize(t))
                 for t in batch.column("text").to_pylist()], pa.int64()),
        })

    hist = _sk.grouped_value_counts(
        _documents(sf_dir, ["lang", "text"]).map_batches(
            lengths, batch_format="pyarrow"), "lang", "n_tokens")
    parts = list(hist.iter_batches(batch_format="pyarrow",
                                   batch_size=None))
    if not parts:
        return pa.table({"lang": pa.array([], pa.string()),
                         "median_tokens": pa.array([], pa.int64()),
                         "n_at_or_above": pa.array([], pa.int64())})
    tbl = pa.concat_tables(parts)
    import numpy as np
    langs = np.asarray(tbl.column("lang").to_pylist(), dtype=object)
    vals = np.asarray(tbl.column("n_tokens").to_pylist(), np.int64)
    cnts = np.asarray(tbl.column("sum(n)").to_pylist(), np.int64)
    out_l: list[str] = []
    out_m: list[int] = []
    out_n: list[int] = []
    for lang in sorted(set(langs)):
        m = langs == lang
        med = _sk.quantile_disc_from_hist(vals[m], cnts[m], [0.5])[0]
        out_l.append(lang)
        out_m.append(med)
        out_n.append(int(cnts[m][vals[m] >= med].sum()))
    return pa.table({
        "lang": pa.array(out_l, pa.string()),
        "median_tokens": pa.array(out_m, pa.int64()),
        "n_at_or_above": pa.array(out_n, pa.int64()),
    })


def _pixel_law(d: int, c: int) -> "np.ndarray":
    """THE shared closed-form pixel law every image SQL oracle mirrors
    verbatim: an (h, w, c) uint8 image with value
    ``(x*3 + y*7 + ch*11 + d) % 256`` at ``w = 4 + d%13``,
    ``h = 3 + d%11``. One definition — the generators that feed
    ``multimodal_features`` / ``image_pixel_stats`` / ``media_resize``
    / ``image_pixel_stats_webp`` all call here, so the law cannot
    drift between a query and its oracle twin."""
    import numpy as np
    w, h = 4 + d % 13, 3 + d % 11
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    ch = np.arange(c)[None, None, :]
    return ((x * 3 + y * 7 + ch * 11 + d) % 256).astype(np.uint8)


def _jpeg_gray_law(d: int) -> "np.ndarray":
    """Shared 8x8-block-constant grayscale law for the JPEG arms
    (block-constant so every JPEG variant round-trips bit-exactly
    under all-ones quant): ``((x//8)*5 + (y//8)*9 + d*3) % 256`` at
    the same w/h law as :func:`_pixel_law`."""
    import numpy as np
    w, h = 4 + d % 13, 3 + d % 11
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return (((x // 8) * 5 + (y // 8) * 9 + d * 3) % 256).astype(
        np.uint8)


def _pixel_image_batch(batch: pa.Table) -> pa.Table:
    """Deterministic REAL-codec image payloads (shared by
    ``image_pixel_stats`` and ``media_resize``): format cycles by
    ``doc_id % 4`` — PNG (row filters cycling, direct/indexed color),
    BMP (bottom-up/top-down 24-bit + 32-bit BGRX), GIF (sequential/
    interlaced LZW), and JPEG (sequential / progressive / progressive+
    successive-approximation grayscale; per-8x8-block-constant pixels
    so the all-ones-quant path round-trips bit-exactly). Pixel values
    are integer closed forms of (doc_id, x, y, ch), SQL-reproducible."""
    import numpy as np  # noqa: F401 (worker-local import)

    ids = batch.column("doc_id").to_pylist()
    blobs: list[bytes] = []
    for d in ids:
        fmt = d % 4  # 0: PNG, 1: BMP, 2: GIF, 3: JPEG (all REAL)
        if fmt == 3:
            gray = _jpeg_gray_law(d)
            # rotate SEQUENTIAL / PROGRESSIVE (SOF2 spectral
            # selection) / PROGRESSIVE+SUCCESSIVE-APPROXIMATION
            # streams: all three round-trip the block-constant
            # image bit-exactly, so the closed-form oracle is one
            kind = (d // 4) % 3
            blobs.append(
                _mm.encode_jpeg_gray(gray) if kind == 0
                else _mm.encode_jpeg_gray_progressive(
                    gray, successive=(kind == 2)))
            continue
        c = (1, 3, 4)[(d // 4) % 3] if fmt == 0 else 3
        img = _pixel_law(d, c)
        if fmt == 0:
            # RGB pngs alternate direct color-type 2 and INDEXED
            # color-type 3 (<= 208 pixels always fit a palette);
            # both decode to identical pixels
            blobs.append(_mm.encode_png(
                img if c > 1 else img[:, :, 0],
                filter_mode="cycle",
                palette=(c == 3 and (d // 8) % 2 == 1)))
        elif fmt == 1:
            # rotate bottom-up 24-bit / TOP-DOWN 24-bit / 32-bit
            # BGRX layouts — one closed form, three decode paths
            kind = (d // 4) % 3
            blobs.append(
                _mm.encode_bmp24(img) if kind == 0
                else _mm.encode_bmp24(img, top_down=True)
                if kind == 1 else _mm.encode_bmp32(img))
        else:
            # w*h <= 208 distinct colors: fits a GIF global
            # palette; alternate sequential / 4-pass INTERLACED
            blobs.append(_mm.encode_gif(
                img, interlace=((d // 4) % 2 == 1)))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media": pa.array(blobs, pa.binary()),
    })


def image_pixel_stats(sf_dir: str) -> "ray.data.Dataset":
    """REAL pixel-level decode + resize, no image library: the shared
    deterministic image payloads (``_pixel_image_batch`` — PNG/BMP/GIF/
    JPEG with per-format sub-rotations) are decoded back to pixel
    arrays by the dependency-free codec (functions/multimodal.py:
    ``decode_image_pixels``) and resized 8x8 nearest-neighbor
    (``resize_nearest``). ``pixel_sum`` / ``resized_sum`` are
    integer-exact closed forms of (doc_id, x, y, ch), so the SQL oracle
    verifies the ENTIRE pixel path — inflate, unfilter (incl. Paeth),
    BGR/bottom-up unswizzle, LZW, JPEG entropy+DCT, and the resize
    index math — bit-for-bit."""
    import numpy as np

    def decode(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        ws, hs, cs, sums, rsums = [], [], [], [], []
        for blob in batch.column("media").to_pylist():
            img = _mm.decode_image_pixels(blob)
            h, w, c = img.shape
            ws.append(w)
            hs.append(h)
            cs.append(c)
            sums.append(int(img.astype(np.int64).sum()))
            rsums.append(int(_mm.resize_nearest(img, 8, 8)
                             .astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "channels": pa.array(cs, pa.int64()),
            "pixel_sum": pa.array(sums, pa.int64()),
            "resized_sum": pa.array(rsums, pa.int64()),
        })

    return _documents(sf_dir, ["doc_id"]).map_batches(
        _pixel_image_batch, batch_format="pyarrow").map_batches(
        decode, batch_format="pyarrow")


def cross_doc_repetition(sf_dir: str) -> "ray.data.Dataset":
    """Cross-document duplicated-gram fraction (the Lee-et-al substring
    dedup signal): per doc, how many of its 5-token gram positions
    occur in at least one other document (functions/curation.py:
    cross_doc_gram_stats — JOIN-FREE: df==1 grams identify their one
    owner via Min(doc_id), so n_shared = n_grams - n_unique from a
    single grouped aggregate)."""
    return _cur.cross_doc_gram_stats(
        _documents(sf_dir, ["doc_id", "text"]), width=5)


BPE_N_MERGES = 20


def bpe_train(sf_dir: str) -> pa.Table:
    """BPE tokenizer training: ONE distributed corpus pass builds the
    word-frequency table (Counter partials -> groupby(word).sum; the
    exchange is bounded by per-block vocabulary), then the classic
    merge loop runs driver-side over that VOCAB-BOUNDED table — the
    correct scale split, since the vocabulary is millions of rows where
    the corpus is trillions. Deterministic tie-breaks; rows-only by
    design (iterative merges are not SQL-expressible) with a
    brute-force pytest oracle."""
    wf_ds = _ts.word_frequencies(_documents(sf_dir, ["text"]))
    wf = {r["word"]: r["sum(n)"] for r in wf_ds.take_all()}
    merges = _ts.bpe_merges_from_word_freq(wf, BPE_N_MERGES)
    return pa.table({
        "rank": pa.array(range(1, len(merges) + 1), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array([m[2] for m in merges], pa.int64()),
    })


def mixture_plan(sf_dir: str) -> pa.Table:
    """Mixture planning: allocate a global token budget (10% of corpus
    tokens, split evenly across sources) into per-source sampling
    rates, integer-exact in parts-per-million. One distributed
    (source, tokens) pre-aggregated groupby; the allocation itself
    reads the |sources|-row table."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        ns = [len(_ts.tokenize(t))
              for t in batch.column("text").to_pylist()]
        import collections
        agg: dict[str, int] = collections.defaultdict(int)
        for s, n in zip(src, ns):
            agg[s] += n
        return pa.table({
            "source": pa.array(list(agg.keys()), pa.string()),
            "n": pa.array(list(agg.values()), pa.int64()),
        })

    per_src = _documents(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow").groupby("source").aggregate(
        ray.data.aggregate.Sum("n"))
    tbl = pa.Table.from_pylist(per_src.take_all())
    srcs = tbl.column("source").to_pylist()
    ns = tbl.column("sum(n)").to_pylist()
    total = sum(ns)
    budget_per_source = total // (10 * max(len(srcs), 1))
    rates = [min(1_000_000, 1_000_000 * budget_per_source // n)
             if n else 0 for n in ns]
    out = pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_tokens": pa.array(ns, pa.int64()),
        "rate_ppm": pa.array(rates, pa.int64()),
    })
    return out.sort_by([("source", "ascending")])


def curation_pipeline(sf_dir: str, *,
                      broadcast_limit: int = 5_000_000
                      ) -> "ray.data.Dataset":
    """FLAGSHIP COMPOSITE: the full corpus-curation chain as one
    streaming composition — quality gate (token count, Gopher
    repetition, hashed-linear classifier) -> exact dedup (md5 winner =
    min doc_id) -> benchmark decontamination (8-gram overlap) ->
    training-sequence packing. Input is documents UNION exact clones
    of ``doc_id%6==0`` at ``+500000`` so the dedup stage demonstrably
    drops rows.

    Corpus text is tokenized EXACTLY ONCE: the ``feats`` pass computes
    the three quality features AND the per-doc 8-gram fingerprints
    (``gfps: list<int64>``) in the same token walk; the bench-key
    distinct and the decontamination filter both consume those carried
    fingerprints, never re-tokenizing (pytest-pinned: one
    ``tokenize(`` site in this function's source).

    Scale shape: every filter is map-side; the only exchanges are the
    winner ``groupby(fp).min``, the bench-key distinct, and the packing
    scan's bounded aggregates. Bench gram keys broadcast as a sorted
    int64 array (bench suites are bounded by construction). The dedup
    winner set is NOT assumed bounded — it is size-adaptive exactly
    like :func:`functions.dedup.exact_dedup`: below ``broadcast_limit``
    winners the sorted-id array broadcasts via ``ray.put`` and the
    filter is a searchsorted membership; above it a distributed
    ``left_semi`` join on ``(fp, doc_id)`` keeps the (at 100 TB,
    billions-of-ids) winner set off the driver. Text never shuffles.
    Oracle: one staged-CTE SQL mirroring every stage."""
    import hashlib

    import numpy as np

    docs = _documents(sf_dir, ["doc_id", "text"])

    def clones(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        keep = pc.equal(pc.subtract(
            ids, pc.multiply(pc.divide(ids, 6), 6)), 0)
        t = batch.filter(keep)
        return pa.table({
            "doc_id": pc.add(t.column("doc_id").cast(pa.int64()), 500000),
            "text": t.column("text"),
        })

    corpus = docs.union(docs.map_batches(clones, batch_format="pyarrow"))

    W = 8  # decontamination gram width

    def feats(batch: pa.Table) -> pa.Table:
        """The ONE tokenize pass: quality features + 8-gram fps.

        Emits quality-PASSING rows (survivor candidates: text + md5
        ``fp`` + gram fingerprints ``gfps``) plus quality-FAILING
        bench rows (``doc_id%97==0``: gfps only, text nulled — the
        bench set is defined over the raw corpus, before the quality
        gate). Every downstream stage consumes these columns; nothing
        tokenizes again."""
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep_i: list[int] = []
        out_text: list = []
        out_pass: list[bool] = []
        out_fp: list[str] = []
        out_gfps: list[np.ndarray] = []
        empty = np.zeros(0, np.int64)
        for k, (i, t) in enumerate(zip(ids, texts)):
            toks = _ts.tokenize(t)
            n = len(toks)
            g = n - 2
            if g <= 0:
                dup = 0
            else:
                nd = len({tuple(toks[j:j + 3]) for j in range(g)})
                dup = 100 * (g - nd) // g
            score = sum(map(_ts._token_weight, toks))
            ok = n >= 24 and dup < 20 and score >= 0
            is_bench = (i % 97 == 0)
            if not ok and not is_bench:
                continue
            grams = {" ".join(toks[j:j + W])
                     for j in range(len(toks) - W + 1)}
            gfp = _dedup.fp_strings64(sorted(grams)) \
                if grams else empty
            keep_i.append(k)
            out_text.append(t if ok else None)
            out_pass.append(ok)
            out_fp.append(hashlib.md5((t or "").encode()).hexdigest()
                          if ok else "")
            out_gfps.append(gfp)
        return pa.table({
            "doc_id": pa.array(ids[keep_i], pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "qpass": pa.array(out_pass, pa.bool_()),
            "fp": pa.array(out_fp, pa.string()),
            # packed little-endian int64 bytes, NOT list<int64>: binary
            # survives an acero join as a payload column (list does
            # not), and is denser on the wire
            "gfps": pa.array([g.tobytes() for g in out_gfps],
                             pa.binary()),
        })

    # feats_out feeds three consumers (bench-key distinct, winner
    # aggregate, survivor pass). materialize() pins the surviving TEXT
    # + gram fps in the object store — right at bench scale (spills if
    # needed, tokenizes once). At 100 TB prefer re-running this
    # map-only pass per consumer instead: a second streaming tokenize
    # costs CPU; pinning ~60% of corpus bytes costs cluster-wide
    # spill I/O.
    feats_out = corpus.map_batches(
        feats, batch_format="pyarrow").materialize()

    def explode_bench(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        m = pc.equal(pc.subtract(
            ids, pc.multiply(pc.divide(ids, 97), 97)), 0)
        bufs = batch.filter(m).column("gfps").to_pylist()
        flat = np.frombuffer(b"".join(bufs), dtype=np.int64) \
            if bufs else np.zeros(0, np.int64)
        return pa.table({"gfp": pa.array(flat, pa.int64())})

    # bench gram keys: bounded by construction (benchmark suites are
    # small), so the post-distinct collect is safe at any corpus size.
    bench_ds = feats_out.map_batches(
        explode_bench, batch_format="pyarrow").groupby(
        "gfp").count().drop_columns(["count()"])
    b_parts = list(bench_ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    bench_keys = np.sort(pa.concat_tables(b_parts).column(
        "gfp").to_numpy(zero_copy_only=False).astype(np.int64)
        ) if b_parts else np.zeros(0, np.int64)
    bench_ref = ray.put(bench_keys)

    kept1 = feats_out.map_batches(
        lambda b: b.filter(b.column("qpass")), batch_format="pyarrow")

    winners = kept1.map_batches(
        lambda b: b.select(["fp", "doc_id"]),
        batch_format="pyarrow").groupby("fp").aggregate(
        ray.data.aggregate.Min("doc_id")).materialize()

    # size-adaptive winner filter (exact_dedup's branch): broadcast the
    # sorted winner-id array below the limit (doc_ids are unique by
    # construction here, so id membership == the (fp, id) pair test);
    # above it, a distributed left_semi join on (fp, doc_id) — the
    # winner set never lands on the driver.
    if winners.count() <= broadcast_limit:
        win_parts = list(winners.iter_batches(batch_format="pyarrow",
                                              batch_size=None))
        win_ids = np.sort(pa.concat_tables(win_parts).column(
            "min(doc_id)").to_numpy(zero_copy_only=False).astype(
            np.int64)) if win_parts else np.zeros(0, np.int64)
        win_ref = ray.put(win_ids)
    else:
        win_ref = None
        winner_keys = winners.map_batches(
            lambda b: pa.table({
                "fp": b.column("fp"),
                "doc_id": b.column("min(doc_id)").cast(pa.int64())}),
            batch_format="pyarrow")
        kept1 = kept1.join(winner_keys, join_type="left_semi",
                           num_partitions=16, on=("fp", "doc_id"))

    def survive(batch: pa.Table) -> pa.Table:
        """Winner + non-bench + decontamination filter — consumes the
        gram fps carried from ``feats``; fully vectorized (flatten the
        list column once, one searchsorted, cumsum segment-reduce)."""
        bkeys = _bcast.cached_get(bench_ref)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = ids % 97 != 0
        if win_ref is not None:
            wins = _bcast.cached_get(win_ref)
            if len(wins):
                pos = np.minimum(np.searchsorted(wins, ids),
                                 len(wins) - 1)
                keep &= wins[pos] == ids
            else:
                keep &= False
        bufs = batch.column("gfps").to_pylist()
        flat = np.frombuffer(b"".join(bufs), dtype=np.int64) \
            if bufs else np.zeros(0, np.int64)
        if len(bkeys) and len(flat):
            lens = np.fromiter((len(b) >> 3 for b in bufs),
                               dtype=np.int64, count=len(bufs))
            offs = np.concatenate(([0], np.cumsum(lens)))
            p = np.minimum(np.searchsorted(bkeys, flat), len(bkeys) - 1)
            hit = (bkeys[p] == flat).astype(np.int64)
            hc = np.concatenate(([0], np.cumsum(hit)))
            contaminated = (hc[offs[1:]] - hc[offs[:-1]]) > 0
            keep &= ~contaminated
        return batch.filter(pa.array(keep)).select(["doc_id", "text"])

    kept3 = kept1.map_batches(survive, batch_format="pyarrow")
    return _cur.sequence_packing(kept3, capacity=PACK_CAPACITY)


def _wav_blob_batch(batch: pa.Table) -> pa.Table:
    """Deterministic REAL WAV PCM payloads (shared by
    ``audio_pcm_stats`` and ``audio_features``): sample[i] = ((i*37 +
    id*11) % 4096) - 2048, n = 100 + id%157, alternating 16- and
    24-bit containers — the SAME sample values decode from both, so
    the closed form is one."""
    import numpy as np

    ids = batch.column("doc_id").to_pylist()
    blobs = []
    for d in ids:
        n = 100 + d % 157
        s = ((np.arange(n) * 37 + d * 11) % 4096 - 2048).astype(
            np.int16)
        blobs.append(_mm.encode_wav_pcm(
            s, bits=16 if d % 2 == 0 else 24,
            rate=8000 + (d % 4) * 4000, channels=1))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media": pa.array(blobs, pa.binary()),
    })


def audio_pcm_stats(sf_dir: str) -> "ray.data.Dataset":
    """REAL audio decode, no audio library: deterministic WAV PCM
    payloads (``_wav_blob_batch``) are parsed back through the
    dependency-free RIFF walk (functions/multimodal.py:parse_wav_pcm)
    and reduced to integer-exact sample statistics — the SQL oracle
    reproduces every value from the closed form, verifying the
    container walk, the int16/int24 little-endian decode, and the
    stats math bit-for-bit."""
    import numpy as np

    def decode(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        rates, counts, sum_abs, peaks, sum_sq = [], [], [], [], []
        for blob in batch.column("media").to_pylist():
            rate, _ch, _bits, s = _mm.parse_wav_pcm(blob)
            a = np.abs(s.astype(np.int64))
            rates.append(rate)
            counts.append(len(s))
            sum_abs.append(int(a.sum()))
            peaks.append(int(a.max()) if len(a) else 0)
            sum_sq.append(int((a * a).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "sample_rate": pa.array(rates, pa.int64()),
            "n_samples": pa.array(counts, pa.int64()),
            "sum_abs": pa.array(sum_abs, pa.int64()),
            "peak": pa.array(peaks, pa.int64()),
            "sum_sq": pa.array(sum_sq, pa.int64()),
        })

    return _documents(sf_dir, ["doc_id"]).map_batches(
        _wav_blob_batch, batch_format="pyarrow").map_batches(
        decode, batch_format="pyarrow")


def video_duration(sf_dir: str) -> "ray.data.Dataset":
    """REAL video-metadata decode, no media library: deterministic
    ISO-BMFF (MP4) payloads — mvhd version alternating 0/1 (32/64-bit
    duration fields) — parsed back through the dependency-free box
    walk (functions/multimodal.py:parse_mp4_mvhd); duration_ms is the
    integer closed form ``1000 * duration // timescale``."""

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        blobs = [_mm.encode_mp4_stub(
            timescale=600 + (d % 7) * 1000,
            duration=d * 997 + 5,
            version=d % 2) for d in ids]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(blobs, pa.binary()),
        })

    def decode(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        tss, durs, mss = [], [], []
        for blob in batch.column("media").to_pylist():
            ts, dur, ms = _mm.parse_mp4_mvhd(blob)
            tss.append(ts)
            durs.append(dur)
            mss.append(ms)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "timescale": pa.array(tss, pa.int64()),
            "duration": pa.array(durs, pa.int64()),
            "duration_ms": pa.array(mss, pa.int64()),
        })

    return _documents(sf_dir, ["doc_id"]).map_batches(
        gen, batch_format="pyarrow").map_batches(
        decode, batch_format="pyarrow")


def events_lead(sf_dir: str) -> "ray.data.Dataset":
    """LEAD window per user (next event + gap) — the time-bucketed LAG
    machinery reused by SIGN SYMMETRY (pipelines/windows.py:
    lead_events): successor under ascending (ts, id) == predecessor of
    the sign-flipped stream."""
    return _win.lead_events(
        _events(sf_dir, ["event_id", "user_id", "ts"]))


def sliding_distinct_users(sf_dir: str) -> pa.Table:
    """EXACT distinct users per sliding 3-hour window (RANGE semantics
    at populated hours) — windowed DISTINCT via one (user, hour)
    dedupe + bounded window fan-out (pipelines/windows.py), never a
    sum of hourly distincts."""
    return _win.sliding_distinct_users(
        _events(sf_dir, ["user_id", "ts"]), window_hours=3)


def dedup_minhash_keep_distributed(sf_dir: str) -> pa.Table:
    """Same contract (and oracle) as ``dedup_minhash_keep``, but the
    connected-components stage runs FULLY DISTRIBUTED — iterative
    min-label propagation with pointer jumping
    (functions/dedup.py:components_by_label_propagation), the 10^9-edge
    path where the driver never holds nodes or edges. Kept rows are
    those whose label equals their own id (component minimum)."""
    import numpy as np

    pairs = _minhash_verified_pairs(sf_dir, threshold=0.8)
    labels = _dedup.components_by_label_propagation(
        ray.data.from_arrow(pairs), join_parts=_join_parts())
    lbl = pa.concat_tables(list(labels.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    nodes = lbl.column("node").to_numpy(zero_copy_only=False)
    labs = lbl.column("label").to_numpy(zero_copy_only=False)
    drop = np.sort(nodes[labs != nodes].astype(np.int64))
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        dropped = _bcast.cached_get(drop_ref)
        if not len(dropped):
            return batch
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dropped, ids)
        pos[pos >= len(dropped)] = 0
        return batch.filter(pa.array(dropped[pos] != ids))

    kept = _mutated_corpus(sf_dir).map_batches(
        keep, batch_format="pyarrow")
    tbl = pa.concat_tables(list(kept.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    tbl = tbl.select(["doc_id", "lang", "source", "n_chars"])
    return tbl.take(pc.sort_indices(
        tbl, sort_keys=[("doc_id", "ascending")]))


def paragraph_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-wide SUB-document dedup (RefinedWeb-style line/paragraph
    dedup): 10-token windows duplicated across the mutated corpus are
    kept only at their first occurrence and each doc is reassembled
    from its survivors — the engine's sub-document analog of
    ``dedup_exact``. Text never rides the winner exchange (int-only
    fingerprint aggregate + size-adaptive rebuild;
    functions/dedup.py:paragraph_dedup)."""
    return _dedup.paragraph_dedup(_mutated_corpus(sf_dir))


def extract_text_warc(sf_dir: str) -> "ray.data.Dataset":
    """The flagship extraction fed from WARC shards — index-free
    parallel byte-range reads with record resync
    (sources/warc_corpus.py), then the same fused parse+extract actor
    pool and the same byte-identical oracle as ``extract_text``. Small
    ``range_bytes`` so the kilobyte-scale test corpus still exercises
    multi-range boundaries; production uses the 64 MiB default."""
    from ..sources import warc_corpus as _warc

    corpus = _warc.read_warc(_warc.warc_corpus_dir(sf_dir),
                             range_bytes=64 << 10)
    ex = _ep.extract_dataset(corpus, spans=False,
                             concurrency=_q_pool(),
                             passthrough=("doc_id",))
    return ex.map_batches(
        lambda b: b.select(["doc_id", "extracted_text", "n_chars_extracted",
                            "n_nodes", "n_links", "error"]),
        batch_format="pyarrow")


def semdedup(sf_dir: str) -> "ray.data.Dataset":
    """SemDedup-style semantic dedup over the mutated embedding table
    (originals + exact clones planted at vec_id+100000): coarse
    spherical k-means partitions the space, each cluster is pruned
    independently with the greedy min-id keep rule
    (functions/similarity.py:semdedup).

    Oracle note: the SQL oracle checks the END KEEP-SET with an
    exhaustive global pairwise rule ("keep iff no smaller-id vector
    anywhere has cosine >= threshold"), which coincides with the
    within-cluster greedy rule on this workload because every pair at
    >= 0.95 is an exact clone pair — identical vectors always share a
    cluster, and clone originals are never themselves dropped (so
    greedy == any-smaller). The greedy within-cluster semantics on
    adversarial chain inputs are pinned by the pytest brute-force
    reference instead (tests/test_round4_ops.py)."""
    out = _sim.semdedup(_mutated_embeddings(sf_dir), threshold=0.95,
                        n_clusters=16)
    return out.map_batches(lambda b: b.select(["vec_id", "keep"]),
                           batch_format="pyarrow")


def ngram_lm_ppl(sf_dir: str) -> "ray.data.Dataset":
    """CCNet-style bigram-LM perplexity score per document: the LM is
    trained on the corpus itself in one distributed count pass, then
    every doc scores itself against the broadcast count table
    (size-adaptive; functions/curation.py:ngram_lm_scores)."""
    return _cur.ngram_lm_scores(_documents(sf_dir, ["doc_id", "text"]))


def ppl_buckets(sf_dir: str) -> "ray.data.Dataset":
    """CCNet head/middle/tail split: corpus-wide perplexity TERCILES
    bucket every scored document (head = most fluent third). Thresholds
    are EXACT quantile_disc values extracted from a distributed
    value-count histogram — ppl is round-4 by contract, so
    ``rint(ppl * 10000)`` is an exact int64 domain and the histogram is
    bounded by the distinct-ppl count, not the doc count; only the tiny
    (v, n) histogram reaches the driver, and labeling is one broadcast
    pass over the scores. The scores table (doc_id + two numbers) is
    materialized once for its two consumers — int-rows-only, far
    smaller than the corpus; at extreme scale recompute instead."""
    import numpy as np

    scores = _cur.ngram_lm_scores(
        _documents(sf_dir, ["doc_id", "text"])).materialize()

    def hist_part(batch: pa.Table) -> pa.Table:
        v = np.rint(batch.column("ppl").to_numpy(zero_copy_only=False)
                    * 10000).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    hist = scores.map_batches(
        hist_part, batch_format="pyarrow").groupby("v").aggregate(
        ray.data.aggregate.Sum("n"))
    tbl = pa.concat_tables(list(hist.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    vals = tbl.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = tbl.column("sum(n)").to_numpy(
        zero_copy_only=False).astype(np.int64)
    t1, t2 = _sk.quantile_disc_from_hist(vals, cnts, [1 / 3, 2 / 3])
    thr_ref = ray.put((int(t1), int(t2)))

    def label(batch: pa.Table) -> pa.Table:
        lo, hi = _bcast.cached_get(thr_ref)
        vi = np.rint(batch.column("ppl").to_numpy(zero_copy_only=False)
                     * 10000).astype(np.int64)
        bucket = np.where(vi <= lo, "head",
                          np.where(vi <= hi, "middle", "tail"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "ppl": batch.column("ppl"),
            "bucket": pa.array(bucket.tolist(), pa.string()),
        })

    return scores.map_batches(label, batch_format="pyarrow")


def extract_text_pdf(sf_dir: str) -> "ray.data.Dataset":
    """PDF/layout-parse tier of the extraction engine: documents ride
    as opaque PDF binaries in Parquet and an actor-pool stage rebuilds
    READING ORDER from positioned text runs — pages resolved via the
    /Kids tree (content streams are stored in reverse page order on
    purpose), runs sorted (y desc, x asc), same-y runs merged into
    lines (sources/pdf_corpus.py). The corpus layout is a closed-form
    transform of ``documents.text`` (8 tokens/line, 6 lines/page,
    split/hex/TJ/Td encodings cycled per line), so the oracle is exact
    down to chunk counts. Errors surface in the ``error`` column,
    never as aborts (P5 contract)."""
    from ..sources import pdf_corpus as _pdf

    return _pdf.read_pdf_corpus(sf_dir).map_batches(
        _pdf.PdfExtract, concurrency=_q_pool(),
        batch_size=64, batch_format="pyarrow")


def url_parse(sf_dir: str) -> "ray.data.Dataset":
    """Crawl-frontier URL parsing, fully vectorized: one
    ``pc.extract_regex`` splitter kernel + one anchored
    public-suffix-aware registered-domain kernel per batch
    (functions/urls.py) — no per-row urlparse loop. The synthetic URLs
    (sources/synthetic.py:crawl_url) cycle every branch: multi-label
    suffixes (co.uk/com.cn), absent subdomains, explicit ports,
    trailing slashes, 0/1/2-param queries; the oracle rebuilds each
    field from the generating row, so the parser is checked against
    ground truth rather than against another parser."""
    from ..functions import urls as _urls

    def parse(batch: pa.Table) -> pa.Table:
        out = _urls.parse_url_batch(_synth.synthesize_url_batch(batch))
        return out.select(["doc_id", "scheme", "host",
                           "registered_domain", "has_port",
                           "path_depth", "n_query_params"])

    return _documents(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        parse, batch_format="pyarrow")


def url_host_stats(sf_dir: str) -> pa.Table:
    """Per-registered-domain crawl stats (the frontier-policy table:
    which domains dominate, how deep their paths run, how many ride
    plain http) — one vectorized parse pass then ONE groupby over the
    ~|sources|x|tlds| domain key; per-domain output is tiny by
    construction so the final take_all is bounded."""
    from ..functions import urls as _urls

    def parse(batch: pa.Table) -> pa.Table:
        out = _urls.parse_url_batch(_synth.synthesize_url_batch(batch))
        is_https = pc.cast(pc.equal(out.column("scheme"), "https"),
                           pa.int64())
        return pa.table({
            "registered_domain": out.column("registered_domain"),
            "is_https": is_https,
            "has_port": out.column("has_port"),
            "path_depth": out.column("path_depth"),
            "n_query_params": out.column("n_query_params"),
        })

    agg = (_documents(sf_dir, ["doc_id", "lang", "source"])
           .map_batches(parse, batch_format="pyarrow")
           .groupby("registered_domain")
           .aggregate(ray.data.aggregate.Count(),
                      ray.data.aggregate.Sum("is_https"),
                      ray.data.aggregate.Sum("has_port"),
                      ray.data.aggregate.Mean("path_depth"),
                      ray.data.aggregate.Sum("n_query_params")))
    tbl = pa.Table.from_pylist(agg.take_all())
    tbl = pa.table({
        "registered_domain": tbl.column("registered_domain"),
        "n_pages": tbl.column("count()").cast(pa.int64()),
        "n_https": tbl.column("sum(is_https)").cast(pa.int64()),
        "n_with_port": tbl.column("sum(has_port)").cast(pa.int64()),
        "avg_path_depth": tbl.column("mean(path_depth)").cast(
            pa.float64()),
        "n_params": tbl.column("sum(n_query_params)").cast(pa.int64()),
    })
    return tbl.take(pc.sort_indices(
        tbl, sort_keys=[("registered_domain", "ascending")]))


def dsir_weights(sf_dir: str) -> "ray.data.Dataset":
    """DSIR-style data selection scores: hashed-unigram importance
    weight of every document against the ``lang='en'`` target slice —
    one tokenize pass counts target and raw distributions together,
    the bucket exchange is bounded by the 1024-bucket hash space, and
    scoring streams against the broadcast log-ratio vector
    (functions/curation.py:dsir_weights)."""
    return _cur.dsir_weights(
        _documents(sf_dir, ["doc_id", "text", "lang"]))


def extract_links(sf_dir: str) -> "ray.data.Dataset":
    """Web-graph edge extraction: one row per anchor element —
    (doc_id, link_idx, href, anchor) — via the real parser in an actor
    pool (stages/parse_stage.py:LinksBatch), the flat-map output shape
    (N docs -> sum-of-links rows). The synthetic template carries
    exactly three closed-form links per page, so the oracle rebuilds
    every edge from the document row."""
    from ..stages import parse_stage as _ps

    return _corpus(sf_dir).map_batches(
        _ps.LinksBatch,
        batch_format="pyarrow",
        compute=ray.data.ActorPoolStrategy(
            size=_q_pool(), max_tasks_in_flight_per_actor=4),
        num_cpus=1,
        fn_constructor_kwargs={"passthrough": ("doc_id",)})


def events_running_total(sf_dir: str) -> "ray.data.Dataset":
    """Per-user running cumulative sum over the event stream (the
    prefix-window shape LAG/LEAD don't cover), exact integer micros,
    time-bucketed so cross-bucket state is one offset per populated
    bucket (pipelines/windows.py:running_total_events)."""
    return _win.running_total_events(
        _events(sf_dir, ["event_id", "ts", "user_id", "value"]))


def domain_pagerank(sf_dir: str) -> "ray.data.Dataset":
    """Link-centrality ranking (crawl-priority / quality signal):
    5-iteration PageRank over the deterministic domain graph in which
    every document contributes the edge ``doc_id % 20 ->
    (3*doc_id + 7) % 20`` (nodes = the 20 source domains; parallel
    edges act as weights). The operator (functions/graph.py:pagerank)
    keeps edges distributed, computes out-degrees once, and runs each
    iteration as one edge pass + one groupby(dst) — rank state is
    size-adaptive (broadcast arrays here; a distributed join path
    above the limit, pinned equal by pytest). The final rank table
    returns as a DISTRIBUTED range-partitioned sort (like
    ``surt_index``) — nothing collects on the driver, so the web-scale
    ~10^8-domain rank table streams straight to a sink."""
    import numpy as np

    from ..functions import graph as _graph

    def edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(d % 20, pa.int64()),
            "dst": pa.array((3 * d + 7) % 20, pa.int64()),
        })

    e = _documents(sf_dir, ["doc_id"]).map_batches(
        edges, batch_format="pyarrow")
    ranks = _graph.pagerank(e, damping=0.85, n_iters=5)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "rank": pc.round(batch.column("rank"), 6),
        })

    return ranks.map_batches(
        finish, batch_format="pyarrow").sort("node")


def nb_lang_classify(sf_dir: str) -> "ray.data.Dataset":
    """Train-then-apply supervised model at scale: a multinomial
    Naive-Bayes language classifier trained ON the corpus labels in one
    map-side-combined count pass (vocab x classes bounded exchange,
    only token fingerprints shuffle) and applied to every document via
    size-adaptive broadcast scoring — fixed-point INTEGER likelihoods
    so the argmax is bit-exactly reproducible by the SQL oracle
    (functions/nbayes.py). Complements ``quality_classifier`` (which
    scores with a fixed model) by closing the training loop."""
    from ..functions import nbayes as _nb

    return _nb.nb_lang_classify(
        _documents(sf_dir, ["doc_id", "text", "lang"]))


def pmi_bigrams(sf_dir: str) -> pa.Table:
    """Top-20 PMI collocations (word2vec/phrase-mining style): one
    tokenize pass emits kind-marked (gram, n) partials for unigrams AND
    bigrams (map-side combined, vocab-bounded exchange), one groupby
    folds them, unigram counts broadcast as sorted arrays, and the
    PMI ratio ``P(ab) / (P(a) P(b))`` is computed as EXACTLY ONE
    float-division chain with pinned associativity — every operand is
    an exact int64, so the double is bit-identical to the SQL oracle's
    (sums never enter a float). Global top-20 via per-batch partial
    top-k then one bounded final reduce."""
    import numpy as np
    from collections import Counter

    from ..functions.broadcast import cached_get

    def partial(batch: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = _ts.tokenize(t)
            uni.update(toks)
            bi.update(map(" ".join, zip(toks, toks[1:])))
        grams = list(uni.keys()) + list(bi.keys())
        kinds = np.concatenate([np.zeros(len(uni), np.int64),
                                np.ones(len(bi), np.int64)])
        ns = np.concatenate([
            np.fromiter(uni.values(), np.int64, len(uni)),
            np.fromiter(bi.values(), np.int64, len(bi))])
        return pa.table({"kind": pa.array(kinds, pa.int64()),
                         "gram": pa.array(grams, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    out_schema = pa.schema([("bigram", pa.string()),
                            ("n_pair", pa.int64()),
                            ("pmi_ratio", pa.float64())])
    counts = _documents(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow").groupby(
        ["kind", "gram"]).aggregate(
        ray.data.aggregate.Sum("n")).materialize()
    if counts.count() == 0:  # every document empty
        return out_schema.empty_table()

    def uni_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("kind"), 0))
        return pa.table({"w": t.column("gram"),
                         "n": t.column("sum(n)").cast(pa.int64())})

    uni_tbl = pa.concat_tables(list(counts.map_batches(
        uni_side, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None)))
    words = np.asarray(uni_tbl.column("w").to_pylist(), dtype=object)
    un = uni_tbl.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(words)
    words, un = words[order], un[order]
    n_uni = int(un.sum())

    def nb_part(batch: pa.Table) -> pa.Table:
        k = batch.column("kind").to_numpy(zero_copy_only=False)
        n = batch.column("sum(n)").to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array([int(n[k == 1].sum())],
                                       pa.int64())})

    n_bi = int(counts.map_batches(
        nb_part, batch_format="pyarrow").sum("v"))
    uni_ref = ray.put((words, un, float(n_uni), float(n_bi)))

    def score_topk(batch: pa.Table) -> pa.Table:
        words, un, nu, nb = cached_get(uni_ref)
        t = batch.filter(pc.and_(pc.equal(batch.column("kind"), 1),
                                 pc.greater_equal(
                                     batch.column("sum(n)"), 5)))
        if t.num_rows == 0:
            return out_schema.empty_table()
        grams = t.column("gram").to_pylist()
        n_pair = t.column("sum(n)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        w1 = np.asarray([g.split(" ", 1)[0] for g in grams],
                        dtype=object)
        w2 = np.asarray([g.split(" ", 1)[1] for g in grams],
                        dtype=object)
        c_a = un[np.searchsorted(words, w1)].astype(np.float64)
        c_b = un[np.searchsorted(words, w2)].astype(np.float64)
        # associativity pinned to the oracle's expression:
        # ((n*nu)*nu) / ((nb*c_a)*c_b)
        ratio = ((n_pair.astype(np.float64) * nu) * nu) \
            / ((nb * c_a) * c_b)
        out = pa.table({"bigram": pa.array(grams, pa.string()),
                        "n_pair": pa.array(n_pair, pa.int64()),
                        "pmi_ratio": pa.array(ratio, pa.float64())})
        idx = pc.sort_indices(out, sort_keys=[
            ("pmi_ratio", "descending"), ("bigram", "ascending")])
        return out.take(idx[:20])  # per-block partial top-k

    parts = pa.concat_tables(list(counts.map_batches(
        score_topk, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None)))
    idx = pc.sort_indices(parts, sort_keys=[
        ("pmi_ratio", "descending"), ("bigram", "ascending")])
    return parts.take(idx[:20])


def inverted_index(sf_dir: str) -> pa.Table:
    """Posting-list build (the retrieval-index construction pass):
    per-doc in-batch token dedupe, ONE groupby(token) with a
    block-sliced collect aggregate, postings emitted as the
    doc_id-sorted list per token (rendered as a comma string for exact
    SQL comparability; a production sink would keep list<int64> and
    shard hot tokens). Output is vocab-bounded."""
    from ..functions.dedup import collect_columns_agg

    def explode(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        toks: list[str] = []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            for tok in set(_ts.tokenize(t)):
                ids.append(did)
                toks.append(tok)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string())})

    agg = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow").groupby("token").aggregate(
        collect_columns_agg(["doc_id"], "ids"))
    rows = agg.take_all()
    toks = [r["token"] for r in rows]
    postings = [sorted(r["ids"]) for r in rows]
    out = pa.table({
        "token": pa.array(toks, pa.string()),
        "df": pa.array([len(p) for p in postings], pa.int64()),
        "postings": pa.array([",".join(map(str, p))
                              for p in postings], pa.string()),
    })
    return out.take(pc.sort_indices(
        out, sort_keys=[("token", "ascending")]))


def web_pipeline(sf_dir: str, *, capacity: int = 64,
                 min_tokens: int = 16) -> "ray.data.Dataset":
    """END-TO-END WEB COMPOSITE: raw HTML in, training sequences out —
    the pipeline a reference user actually runs, as ONE streaming
    composition: synthesized CC-style HTML (plus exact page clones of
    ``doc_id%7==0`` at ``+700000`` so dedup demonstrably drops rows)
    -> the fused parse+extract ACTOR POOL (the real lexer/parser, not
    the closed form; token counts accumulate DURING the extraction
    walk, core/extract.py) -> token-count quality gate (reads the
    carried ``n_tokens`` — no re-scan) -> exact dedup on the
    extracted text (md5 winner = min doc_id; size-adaptive via
    functions/dedup.exact_dedup) -> sequence packing over the same
    carried counts (functions/curation.pack_counts) — each document
    is tokenized exactly once, inside the extraction actor.

    Scale shape: extraction and the gate are map-side; exchanges are
    exact_dedup's one pure aggregate (+ broadcast/semi-join winner
    pass) and the packing scan's bounded bucket aggregates. Extracted
    text flows only into the md5 fingerprint — it never shuffles.
    Oracle: staged CTEs chaining the synthetic corpus's closed-form
    extraction through the same gate/dedup/packing rules."""
    from ..functions import curation as _curf
    from ..functions import dedup as _dedupf

    html = _corpus(sf_dir)

    def clones(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        keep = pc.equal(pc.subtract(
            ids, pc.multiply(pc.divide(ids, 7), 7)), 0)
        t = batch.filter(keep)
        cols = {c: t.column(c) for c in t.column_names}
        cols["doc_id"] = pc.add(t.column("doc_id").cast(pa.int64()),
                                700000)
        return pa.table(cols)

    corpus = html.union(html.map_batches(clones, batch_format="pyarrow"))
    ex = _ep.extract_dataset(corpus, spans=False,
                             concurrency=_q_pool(),
                             passthrough=("doc_id",))

    def gate(batch: pa.Table) -> pa.Table:
        # n_tokens was counted DURING the extraction walk
        # (core/extract.py) — the gate never re-scans the text, so the
        # composite tokenizes each document exactly once
        out = pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "extracted_text": batch.column("extracted_text"),
            "n_tokens": batch.column("n_tokens"),
        })
        return out.filter(pc.greater_equal(out.column("n_tokens"),
                                           min_tokens))

    gated = ex.map_batches(gate, batch_format="pyarrow")
    deduped = _dedupf.exact_dedup(gated, key="extracted_text",
                                  id_col="doc_id")

    def to_counts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        return pa.table({
            "doc_id": ids,
            "n_tokens": batch.column("n_tokens").cast(pa.int64()),
            "bucket": pc.divide(ids, 65536).cast(pa.int64()),
        })

    return _curf.pack_counts(
        deduped.map_batches(to_counts, batch_format="pyarrow"),
        capacity=capacity)


def events_value_outliers(sf_dir: str, *,
                          broadcast_limit: int = 5_000_000,
                          join_parts: int = 8) -> "ray.data.Dataset":
    """Per-user anomaly detection with EXACT integer arithmetic: flag
    events whose value is > 2 standard deviations from the user's own
    mean — the z-test rewritten as a cross-multiplied integer
    inequality ``(n*x - sum)^2 > 4*(n*sumsq - sum^2)`` over
    centi-scaled int64 values, so no float mean/variance (whose
    summation order could drift) ever exists and the SQL oracle is
    bit-exact. One grouped aggregate builds the per-user moment table
    (|users|-bounded); scoring is size-adaptive — broadcast sorted
    moment arrays below ``broadcast_limit`` users, a distributed hash
    join above (the 10^9-user path)."""
    import numpy as np

    from ..functions.broadcast import cached_get

    def to_int(batch: pa.Table) -> pa.Table:
        v = np.rint(batch.column("value").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "event_id": batch.column("event_id").cast(pa.int64()),
            "user_id": batch.column("user_id").cast(pa.int64()),
            "v": pa.array(v, pa.int64()),
            "v2": pa.array(v * v, pa.int64()),
            "value": batch.column("value"),
        })

    facts = _events(sf_dir, ["event_id", "user_id", "value"]).map_batches(
        to_int, batch_format="pyarrow")
    stats = facts.map_batches(
        lambda b: b.select(["user_id", "v", "v2"]),
        batch_format="pyarrow").groupby("user_id").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("v"),
        ray.data.aggregate.Sum("v2")).materialize()

    def flag(ev: np.ndarray, n: np.ndarray, sv: np.ndarray,
             sv2: np.ndarray) -> np.ndarray:
        num = n * ev - sv
        return num * num > 4 * (n * sv2 - sv * sv)

    if stats.count() <= broadcast_limit:
        tbl = pa.concat_tables(list(stats.iter_batches(
            batch_format="pyarrow", batch_size=None)))
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        order = np.argsort(uid)
        moments = (uid[order],
                   tbl.column("count()").to_numpy(
                       zero_copy_only=False)[order].astype(np.int64),
                   tbl.column("sum(v)").to_numpy(
                       zero_copy_only=False)[order].astype(np.int64),
                   tbl.column("sum(v2)").to_numpy(
                       zero_copy_only=False)[order].astype(np.int64))
        mom_ref = ray.put(moments)

        def score(batch: pa.Table) -> pa.Table:
            uids, n, sv, sv2 = cached_get(mom_ref)
            u = batch.column("user_id").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(uids, u)
            m = flag(v, n[idx], sv[idx], sv2[idx])
            return batch.filter(pa.array(m)).select(
                ["event_id", "user_id", "value"])

        return facts.map_batches(score, batch_format="pyarrow")

    joined = facts.join(stats, join_type="inner",
                        num_partitions=join_parts, on=("user_id",))

    def score_joined(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        n = batch.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sv = batch.column("sum(v)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sv2 = batch.column("sum(v2)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(flag(v, n, sv, sv2))).select(
            ["event_id", "user_id", "value"])

    return joined.map_batches(score_joined, batch_format="pyarrow")


def bpe_encode(sf_dir: str) -> "ray.data.Dataset":
    """BPE train -> APPLY: the tokenizer trained by :func:`bpe_train`
    (one distributed word-frequency pass + vocab-bounded driver merge
    loop) encodes every document through a stateful ACTOR POOL — merge
    ranks broadcast once via ``ray.put``, each actor holds a per-word
    encode memo built in ``__init__``-scoped state (the word
    distribution is Zipfian, so the memo converts per-occurrence work
    into per-distinct-word work). Emits (doc_id, n_tokens,
    n_bpe_tokens, compression_bp) with compression in integer basis
    points — rows-only for the driver (iterative merges are not
    SQL-expressible); semantics pinned by a pytest replaying the
    merges in training order (the classic equivalence)."""
    import numpy as np

    from ..functions.broadcast import cached_get

    wf_ds = _ts.word_frequencies(_documents(sf_dir, ["text"]))
    wf = {r["word"]: r["sum(n)"] for r in wf_ds.take_all()}
    merges = _ts.bpe_merges_from_word_freq(wf, BPE_N_MERGES)
    ranks_ref = ray.put({(l, r): i for i, (l, r, _) in
                         enumerate(merges)})

    class Encode:
        def __init__(self):
            self.ranks = cached_get(ranks_ref)
            self.memo: dict[str, int] = {}

        def _n_sub(self, w: str) -> int:
            n = self.memo.get(w)
            if n is None:
                n = len(_ts.bpe_encode_word(w, self.ranks))
                self.memo[w] = n
            return n

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").cast(pa.int64())
            texts = batch.column("text").to_pylist()
            n_tok: list[int] = []
            n_bpe: list[int] = []
            for t in texts:
                toks = _ts.tokenize(t)
                n_tok.append(len(toks))
                n_bpe.append(sum(self._n_sub(w) for w in toks))
            n_tok_a = np.asarray(n_tok, np.int64)
            n_bpe_a = np.asarray(n_bpe, np.int64)
            nchars = np.asarray(
                [len(t or "") for t in texts], np.int64)
            comp = np.where(nchars > 0, (n_bpe_a * 10000) // np.maximum(
                nchars, 1), 0)
            return pa.table({
                "doc_id": ids,
                "n_tokens": pa.array(n_tok_a, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe_a, pa.int64()),
                "compression_bp": pa.array(comp, pa.int64()),
            })

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        Encode, concurrency=_q_pool(), batch_size=256,
        batch_format="pyarrow")


# --- DOM analytics (round-4 second half) ---------------------------------


def dom_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-page DOM structural stats (stages/dom_stage.py:DomStatsBatch)
    over the synthesized CC-style corpus: node/element/text/attr
    counts, max depth, total text chars. The fixed page template makes
    every metric a closed-form function of the document row, so the
    oracle rebuilds each value in SQL (sources/synthetic.py:page_html
    layout comment). The crawl-quality sidecar shape: metrics computed
    in the SAME actor pool pattern as extraction, never materializing
    the tree."""
    from ..stages import dom_stage as _ds

    return _corpus(sf_dir).map_batches(
        _ds.DomStatsBatch,
        batch_format="pyarrow",
        compute=ray.data.ActorPoolStrategy(
            size=_q_pool(), max_tasks_in_flight_per_actor=4),
        num_cpus=1,
        fn_constructor_kwargs={"passthrough": ("doc_id",)})


def dom_select(sf_dir: str) -> "ray.data.Dataset":
    """CSS-lite descendant selection ("nav a") over the corpus — one
    row per matched element with its descendant-concatenated text
    (stages/dom_stage.py:DomSelectBatch). The template carries exactly
    two nav anchors per page ('home' and the lang label), so the
    oracle enumerates both in closed form."""
    from ..stages import dom_stage as _ds

    return _corpus(sf_dir).map_batches(
        _ds.DomSelectBatch,
        batch_format="pyarrow",
        compute=ray.data.ActorPoolStrategy(
            size=_q_pool(), max_tasks_in_flight_per_actor=4),
        num_cpus=1,
        fn_constructor_kwargs={"selector": "nav a",
                               "passthrough": ("doc_id",)})


def extract_tables(sf_dir: str) -> "ray.data.Dataset":
    """WDC-style web-table extraction: HTML <table> -> relational
    (doc_id, table_idx, row_idx, col_idx, cell_text, is_header) rows
    (stages/dom_stage.py:TableExtractBatch) over a deterministic
    data-table corpus (sources/synthetic.py:table_page_html: header
    row + 3 data rows, one cell nesting <b> so descendant-text concat
    is exercised on every page)."""
    from ..stages import dom_stage as _ds

    pages = _documents(sf_dir, ["doc_id", "lang", "source", "n_chars"]
                       ).map_batches(
        _synth.synthesize_table_batch, batch_format="pyarrow")
    return pages.map_batches(
        _ds.TableExtractBatch,
        batch_format="pyarrow",
        compute=ray.data.ActorPoolStrategy(
            size=_q_pool(), max_tasks_in_flight_per_actor=4),
        num_cpus=1,
        fn_constructor_kwargs={"passthrough": ("doc_id",)})


# --- web-crawl index / politeness ops -------------------------------------


def surt_index(sf_dir: str) -> "ray.data.Dataset":
    """CDX-style URL index build: SURT canonical key per frontier URL
    (functions/webops.py:surt_batch — host-label reversal and query-
    param sorting as flat numpy permutations + one binary_join, fully
    vectorized) followed by a DISTRIBUTED range-partitioned sort on the
    key — exactly how a web-scale capture index is laid out for binary-
    searchable Parquet. Oracle rebuilds each key in closed form from
    the generating row (sources/synthetic.py:crawl_url)."""
    from ..functions import webops as _web

    frontier = _documents(sf_dir, ["doc_id", "lang", "source"]
                          ).map_batches(
        _synth.synthesize_url_batch, batch_format="pyarrow")
    keyed = frontier.map_batches(_web.surt_batch, batch_format="pyarrow")
    return keyed.select_columns(["doc_id", "surt"]).sort("surt")


def robots_filter(sf_dir: str) -> "ray.data.Dataset":
    """Crawl-politeness gate: per-registered-domain robots.txt
    (synthesized text, REALLY parsed — group selection past a decoy
    full-block agent, wildcard patterns, Allow-overrides-Disallow
    longest-match precedence) applied to every frontier URL
    (functions/webops.py). Size-adaptive: compiled-rule broadcast here;
    a distributed explode+join+argmax path above the limit (pytest pins
    both equal). Output: (doc_id, url, allowed)."""
    from ..functions import urls as _urls
    from ..functions import webops as _web

    frontier = _documents(sf_dir, ["doc_id", "lang", "source"]
                          ).map_batches(
        _synth.synthesize_url_batch, batch_format="pyarrow")
    parsed = frontier.map_batches(
        _urls.parse_url_batch, batch_format="pyarrow",
        fn_kwargs={"include_path": True})
    robots = _documents(sf_dir, ["doc_id", "source"]).map_batches(
        _synth.synthesize_robots_batch, batch_format="pyarrow"
    ).groupby("registered_domain").aggregate(
        ray.data.aggregate.Min("robots_txt")).map_batches(
        lambda b: pa.table({
            "registered_domain": b.column("registered_domain"),
            "robots_txt": b.column("min(robots_txt)")}),
        batch_format="pyarrow")
    out = _web.robots_filter(parsed, robots)
    return out.select_columns(["doc_id", "url", "allowed"])


def anchor_text_index(sf_dir: str) -> "ray.data.Dataset":
    """Web-graph anchor-text rollup: link edges (the real parser's
    LinksBatch flat-map) -> per-href (n_refs, n_distinct_anchors,
    lexicographic top_anchor) via two PURE aggregate exchanges, no join
    (functions/webops.py:anchor_index)."""
    from ..functions import webops as _web

    return _web.anchor_index(extract_links(sf_dir))


def latest_capture(sf_dir: str) -> "ray.data.Dataset":
    """Keep-newest-capture dedup across crawls (the CDX re-crawl rule):
    two deterministic crawl replicas of the corpus (r1 re-crawled one
    day later, same urls) unioned, then
    functions/webops.py:keep_latest — one pure groupby(url).Max
    exchange + size-adaptive winner recovery, the argmax mirror of
    exact_dedup. Every winner is the r1 capture by construction."""
    import datetime as _dt

    from ..functions import webops as _web

    docs = _documents(sf_dir, ["doc_id", "text", "lang", "source"])

    def tag(crawl: str, shift_s: int):
        def f(batch: pa.Table) -> pa.Table:
            t = _synth.synthesize_batch(batch)
            ts = pc.add(t.column("warc_ts"), pa.scalar(
                _dt.timedelta(seconds=shift_s), pa.duration("s")))
            t = t.drop_columns(["warc_ts"]).append_column("warc_ts", ts)
            return t.append_column(
                "crawl", pa.array([crawl] * t.num_rows, pa.string()))
        return f

    a = docs.map_batches(tag("r0", 0), batch_format="pyarrow")
    b = docs.map_batches(tag("r1", 86400), batch_format="pyarrow")
    u = a.union(b).select_columns(["doc_id", "url", "warc_ts", "crawl"])
    return _web.keep_latest(u, key="url", ts_col="warc_ts")


# --- event-stream product analytics ---------------------------------------


def events_funnel(sf_dir: str) -> pa.Table:
    """view -> click -> purchase ordered-conversion funnel over the
    event stream (pipelines/windows.py:funnel_stages): per stage one
    filtered pure Min exchange; only one (user, ts) scalar per user
    crosses a stage boundary (size-adaptive broadcast / inner join)."""
    return _win.funnel_stages(
        _events(sf_dir, ["ts", "user_id", "event_type"]))


def user_retention(sf_dir: str) -> "ray.data.Dataset":
    """Day-cohort retention matrix (cohort_day, day_offset, n_users)
    (pipelines/windows.py:retention_cohorts): distinct-(user, day)
    pure aggregate, per-user Min cohort, size-adaptive attach, bounded
    (cohort x offset) final count."""
    return _win.retention_cohorts(_events(sf_dir, ["ts", "user_id"]))


def events_gapfill(sf_dir: str) -> "ray.data.Dataset":
    """Zero-filled hourly event-count series
    (pipelines/windows.py:gapfill_hourly): one map-side-combined
    hourly count over the stream; the grid is generated distributedly
    and filled by vectorized searchsorted against the broadcast
    (time-span-bounded) hourly table."""
    return _win.gapfill_hourly(_events(sf_dir, ["ts"]))


# --- RAG chunking + embedding pooling --------------------------------------


def chunk_documents(sf_dir: str, chunk: int = 32,
                    stride: int = 24) -> "ray.data.Dataset":
    """RAG-style sliding-window chunking: each document flat-maps to
    overlapping ``chunk``-token windows every ``stride`` tokens
    (whitespace-token contract, functions/textstats.py:tokenize);
    emission stops with the first window that reaches the document end
    (a window is emitted iff it starts at 0 or the previous window did
    NOT already cover the end). Pure map-side flat-map — no exchange;
    chunk boundaries are deterministic so the SQL oracle rebuilds them
    with list slicing."""
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_ci, out_n, out_txt = [], [], [], []
        for d, t in zip(ids, texts):
            toks = _ts.tokenize(t)
            n = len(toks)
            start = 0
            while True:
                w = toks[start:start + chunk]
                out_id.append(d)
                out_ci.append(start // stride)
                out_n.append(len(w))
                out_txt.append(" ".join(w))
                if start + chunk >= n:
                    break
                start += stride
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_ci, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string())})

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")


def label_centroids(sf_dir: str) -> "ray.data.Dataset":
    """Per-label embedding centroid (the pooling step of SemDedup-style
    clustering / class prototypes), BIT-EXACTLY: components are
    fixed-point scaled with floor(v*1e5 + 0.5) (identical in numpy and
    SQL — float SUMS are order-dependent, integer sums are not), summed
    as int64 per (label, pos) with map-side np.add.at partials, and the
    single final division is the one float op on each side. Long
    (label, pos, centroid) output, |labels| x dim rows."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column("label").to_numpy(zero_copy_only=False
                                                ).astype(np.int64)
        emb = batch.column("embedding")
        flat = emb.combine_chunks().flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        dim = len(flat) // max(len(labels), 1)
        q = np.floor(flat * 100000.0 + 0.5).astype(np.int64).reshape(
            len(labels), dim)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        lab = np.repeat(uniq, dim)
        pos = np.tile(np.arange(dim, dtype=np.int64), len(uniq))
        return pa.table({
            "label": pa.array(lab, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "_sum": pa.array(sums.reshape(-1), pa.int64()),
            "_n": pa.array(np.repeat(cnt, dim), pa.int64())})

    agg = _embeddings(sf_dir).map_batches(
        partial, batch_format="pyarrow").groupby(["label", "pos"]
                                                 ).aggregate(
        ray.data.aggregate.Sum("_sum"), ray.data.aggregate.Sum("_n"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "label": batch.column("label"),
            "pos": batch.column("pos"),
            "centroid": pc.divide(
                batch.column("sum(_sum)").cast(pa.float64()),
                batch.column("sum(_n)").cast(pa.float64()))})

    return agg.map_batches(finish, batch_format="pyarrow")


def crawl_diff(sf_dir: str) -> "ray.data.Dataset":
    """Crawl-snapshot diff: per-url status across two crawls —
    'added' / 'removed' / 'changed' (content fingerprint differs) /
    'same' — in ONE pure aggregate exchange, no join: each side emits
    (url, presence flags, fp-or-sentinel) and
    ``groupby(url).aggregate(Sum, Sum, Min, Min)`` reconstructs both
    sides' fingerprints ('~' sorts after every hex digest, so Min
    recovers the present side's fp). Snapshot B is a deterministic
    mutation of A: doc_id%7==0 removed, %10==0 content-changed,
    %13==0 adds a new url — the oracle rebuilds the same two
    snapshots and FULL OUTER JOINs them."""
    import hashlib

    docs = _documents(sf_dir, ["doc_id", "text"])

    def _fp(texts: list) -> list[str]:
        return [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                for t in texts]

    def snap_a(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "url": pa.array([f"synth://doc/{d}" for d in ids],
                            pa.string()),
            "_r": pa.array([0] * len(ids), pa.int64()),
            "_fp": pa.array(_fp(batch.column("text").to_pylist()),
                            pa.string())})

    def snap_b(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        urls, fps = [], []
        for d, t in zip(ids, texts):
            if d % 7 != 0:
                urls.append(f"synth://doc/{d}")
                fps.append(_fp([t + " v2" if d % 10 == 0 else t])[0])
            if d % 13 == 0:
                urls.append(f"synth://doc/{d + 1000000}")
                fps.append(_fp([t])[0])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "_r": pa.array([1] * len(urls), pa.int64()),
            "_fp": pa.array(fps, pa.string())})

    a = docs.map_batches(snap_a, batch_format="pyarrow")
    b = docs.map_batches(snap_b, batch_format="pyarrow")

    def flags(batch: pa.Table) -> pa.Table:
        r = batch.column("_r")
        fp = batch.column("_fp")
        is0 = pc.equal(r, 0)
        return pa.table({
            "url": batch.column("url"),
            "_n0": pc.if_else(is0, 1, 0).cast(pa.int64()),
            "_n1": pc.if_else(is0, 0, 1).cast(pa.int64()),
            "_fp0": pc.if_else(is0, fp, "~"),
            "_fp1": pc.if_else(is0, "~", fp)})

    agg = a.union(b).map_batches(flags, batch_format="pyarrow"
                                 ).groupby("url").aggregate(
        ray.data.aggregate.Sum("_n0"), ray.data.aggregate.Sum("_n1"),
        ray.data.aggregate.Min("_fp0"), ray.data.aggregate.Min("_fp1"))

    def finish(batch: pa.Table) -> pa.Table:
        n0 = batch.column("sum(_n0)").to_numpy(zero_copy_only=False)
        n1 = batch.column("sum(_n1)").to_numpy(zero_copy_only=False)
        f0 = batch.column("min(_fp0)").to_pylist()
        f1 = batch.column("min(_fp1)").to_pylist()
        status = ["added" if a_ == 0 else
                  "removed" if b_ == 0 else
                  "changed" if x != y else "same"
                  for a_, b_, x, y in zip(n0, n1, f0, f1)]
        return pa.table({"url": batch.column("url"),
                         "status": pa.array(status, pa.string())})

    return agg.map_batches(finish, batch_format="pyarrow")


def sitemap_parse(sf_dir: str) -> "ray.data.Dataset":
    """Sitemap ingestion (the crawl-frontier seed source): XML sitemaps
    through the SAME HTML5 parser in an actor pool
    (stages/dom_stage.py:SitemapBatch) -> one row per <url> entry
    (doc_id, url_idx, loc, lastmod). The two-entry synthetic sitemap
    (sources/synthetic.py:sitemap_xml) makes every field closed-form."""
    from ..stages import dom_stage as _ds

    maps = _documents(sf_dir, ["doc_id", "source"]).map_batches(
        _synth.synthesize_sitemap_batch, batch_format="pyarrow")
    return maps.map_batches(
        _ds.SitemapBatch,
        batch_format="pyarrow",
        compute=ray.data.ActorPoolStrategy(
            size=_q_pool(), max_tasks_in_flight_per_actor=4),
        num_cpus=1,
        fn_constructor_kwargs={"passthrough": ("doc_id",)})


def tag_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-wide element-tag histogram with MAP-SIDE COMBINING:
    stages/dom_stage.py:TagCountBatch emits one (tag, n) partial per
    distinct tag per BATCH, so the groupby(tag).Sum exchange moves a
    few dozen rows per block regardless of corpus size — the shape
    every corpus-census aggregation should have at 10^12 docs."""
    from ..stages import dom_stage as _ds

    partials = _corpus(sf_dir).map_batches(
        _ds.TagCountBatch,
        batch_format="pyarrow",
        compute=ray.data.ActorPoolStrategy(
            size=_q_pool(), max_tasks_in_flight_per_actor=4),
        num_cpus=1)
    agg = partials.groupby("tag").aggregate(ray.data.aggregate.Sum("n"))
    return agg.map_batches(
        lambda b: pa.table({"tag": b.column("tag"),
                            "n": b.column("sum(n)").cast(pa.int64())}),
        batch_format="pyarrow")


def token_quantiles_sketch(sf_dir: str) -> pa.Table:
    """Approximate per-doc token-count quantiles via the mergeable
    KLL/MRL-style sketch (functions/sketches.py:sketch_quantiles): one
    map-side sketch row per block, a kilobyte-scale global merge —
    the streaming path for value domains too large for the exact
    value-count histogram (doc_length_percentiles). Deterministic
    compaction makes runs reproducible but merge-order-dependent, so
    this is rows-only; the rank-error contract is pinned by pytest."""
    import numpy as np

    def counts(batch: pa.Table) -> pa.Table:
        toks = [len(_ts.tokenize(t))
                for t in batch.column("text").to_pylist()]
        return pa.table({"n_tokens": pa.array(toks, pa.int64())})

    ds = _documents(sf_dir, ["text"]).map_batches(
        counts, batch_format="pyarrow")
    return _sk.sketch_quantiles(ds, "n_tokens",
                                [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def resolve_links(sf_dir: str) -> "ray.data.Dataset":
    """Crawl-frontier URL resolution: link edges resolved to absolute
    URLs against each page's base (functions/urls.py:resolve_url_batch,
    RFC 3986 par.5 — vectorized case masks, per-row dot-segment cleanup
    only where one exists). The base travels WITH the row through the
    LinksBatch flat-map (passthrough column) so resolution is pure
    map-side — no (doc -> base) join ever forms. Bases are the
    realistic crawl_url frontier URLs; hrefs are the template's three
    links (root-relative, root-relative, mailto)."""
    from ..functions import urls as _urls
    from ..stages import parse_stage as _ps

    def with_base(batch: pa.Table) -> pa.Table:
        t = _synth.synthesize_batch(batch)
        base = _synth.synthesize_url_batch(batch).column("url")
        return t.drop_columns(["url"]).append_column("url", base)

    edges = _documents(sf_dir).map_batches(
        with_base, batch_format="pyarrow").map_batches(
        _ps.LinksBatch,
        batch_format="pyarrow",
        compute=ray.data.ActorPoolStrategy(
            size=_q_pool(), max_tasks_in_flight_per_actor=4),
        num_cpus=1,
        fn_constructor_kwargs={"passthrough": ("doc_id", "url")})

    def resolve(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "link_idx": batch.column("link_idx"),
            "abs_url": _urls.resolve_url_batch(
                batch.column("url"), batch.column("href"))})

    return edges.map_batches(resolve, batch_format="pyarrow")


def extract_metadata(sf_dir: str) -> "ray.data.Dataset":
    """Head-metadata extraction (the page-catalog sidecar): title /
    meta description / og:title / robots / canonical link / html[lang]
    per document through the REAL parser in an actor pool
    (stages/dom_stage.py:MetadataBatch). The head-rich synthetic page
    (sources/synthetic.py:meta_page_html) exercises void <meta>/<link>
    tags and an unquoted charset attr; every field is a closed-form
    function of the generating row, robots only for doc_id%9==0."""
    from ..stages import dom_stage as _ds

    pages = _documents(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        _synth.synthesize_meta_batch, batch_format="pyarrow")
    return pages.map_batches(
        _ds.MetadataBatch,
        batch_format="pyarrow",
        compute=ray.data.ActorPoolStrategy(
            size=_q_pool(), max_tasks_in_flight_per_actor=4),
        num_cpus=1,
        fn_constructor_kwargs={"passthrough": ("doc_id",)})


def epoch_shuffle(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic epoch shuffle (functions/shuffle.py): global
    training order by md5(seed:doc_id) with ranks computed by the
    bucketed distributed-rank scan — 65 536-row driver state regardless
    of corpus size — then fixed-size shard assignment for the loader."""
    from ..functions import shuffle as _shuf

    return _shuf.epoch_shuffle(
        _documents(sf_dir, ["doc_id"]), seed="ep7", shard_size=100)


def embedding_quantize(sf_dir: str) -> "ray.data.Dataset":
    """Int8-style per-dimension scalar quantization of the embedding
    table (functions/similarity.py:scalar_quantize): fixed-point int64
    components, one dim-bounded Min/Max exchange, broadcast bounds,
    pure-integer map-side quantize — bit-exact vs the SQL oracle."""
    return _sim.scalar_quantize(_embeddings(sf_dir))


def decode_entities(sf_dir: str) -> "ray.data.Dataset":
    """Post-extraction HTML character-reference repair
    (functions/textstats.py:decode_entities_batch): a SINGLE-PASS
    regex decode — named core set + decimal/hex numerics; unknown
    names and invalid codepoints stay literal; ``&amp;lt;`` yields the
    five chars ``&lt;`` (no double decode, browser semantics) — behind
    a vectorized has-'&' Arrow gate so entity-free rows never touch
    Python. Entities are injected closed-form around the document
    text, so the oracle rebuilds the decode with string concat."""
    pre = "A &amp; B &lt;x&gt; "
    suf = " &#65;&#x42; &copy; &unknown; &amp;lt;"

    def inject(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pc.binary_join_element_wise(
                pre, batch.column("text"), suf, "")})

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        inject, batch_format="pyarrow").map_batches(
        _ts.decode_entities_batch, batch_format="pyarrow").map_batches(
        lambda b: b.select(["doc_id", "decoded"]),
        batch_format="pyarrow")


def host_fetch_slots(sf_dir: str) -> "ray.data.Dataset":
    """Crawl-politeness scheduling (functions/webops.py:fetch_slots):
    each frontier URL's per-host fetch slot (rank within host by
    doc_id) via the bucketed prefix-carry rank — ONE pure count
    aggregate + bounded carry rows; per-group state never exceeds
    bucket_size urls even for a 10^9-url host. With one request per
    host per wave, slot == scheduler wave."""
    from ..functions import urls as _urls
    from ..functions import webops as _web

    def with_host(batch: pa.Table) -> pa.Table:
        t = _urls.parse_url_batch(
            _synth.synthesize_url_batch(batch))
        return t.select(["doc_id", "host"])

    frontier = _documents(sf_dir, ["doc_id", "lang", "source"]
                          ).map_batches(with_host, batch_format="pyarrow")
    return _web.fetch_slots(frontier, bucket_size=64)


def domain_quality(sf_dir: str) -> "ray.data.Dataset":
    """Per-registered-domain extraction-quality rollup — the crawl
    curation dashboard table: (n_docs, sum_tokens, mean_tokens) per
    domain. The URL dimension never joins: the frontier URL is
    synthesized FROM the document row, parsed map-side
    (functions/urls.py:parse_url_batch, one extract_regex kernel), and
    the token count rides the same row — ONE pure groupby(domain)
    exchange moves (domain, n, sum) partials only. mean is a single
    final float division over exact int64 operands (bit-exact)."""
    from ..functions import urls as _urls

    def project(batch: pa.Table) -> pa.Table:
        t = _ts.token_count_batch(batch)
        u = _urls.parse_url_batch(_synth.synthesize_url_batch(batch))
        return pa.table({
            "registered_domain": u.column("registered_domain"),
            "n_tokens": t.column("n_tokens")})

    agg = _documents(sf_dir, ["doc_id", "text", "lang", "source"]
                     ).map_batches(project, batch_format="pyarrow"
                     ).groupby("registered_domain").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("n_tokens"))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("count()").cast(pa.int64())
        s = batch.column("sum(n_tokens)").cast(pa.int64())
        return pa.table({
            "registered_domain": batch.column("registered_domain"),
            "n_docs": n,
            "sum_tokens": s,
            "mean_tokens": pc.divide(s.cast(pa.float64()),
                                     n.cast(pa.float64()))})

    return agg.map_batches(finish, batch_format="pyarrow")


def link_degree_hist(sf_dir: str) -> "ray.data.Dataset":
    """Web-graph in-degree distribution (the graph-census shape that
    finds hubs/spam): resolved link targets (resolve_links) ->
    groupby(abs_url).count -> groupby(in_degree).count. Aggregate OF an
    aggregate — both exchanges pure and map-side combined; the second
    moves at most |distinct degrees| rows per block."""
    deg = resolve_links(sf_dir).groupby("abs_url").count()
    hist = deg.map_batches(
        lambda b: pa.table({
            "in_degree": b.column("count()").cast(pa.int64())}),
        batch_format="pyarrow").groupby("in_degree").count()
    return hist.map_batches(
        lambda b: pa.table({
            "in_degree": b.column("in_degree"),
            "n_targets": b.column("count()").cast(pa.int64())}),
        batch_format="pyarrow")


def url_canonical_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Crawl-frontier URL canonicalization dedup: the frontier is the
    base urls UNIONed with a tracking-decorated replica (same url +
    ``utm_source``/``utm_campaign`` params, doc_id+1e6 — the shape ad
    links inject into every real crawl). Canonicalization
    (functions/urls.py:canonicalize_url_batch — fragment + utm_* strip,
    three Arrow regex kernels) collapses each pair; ONE pure
    ``groupby(canon).aggregate(Min, Count)`` emits (canon_url, keeper,
    n_variants). By construction every canonical has exactly its base
    doc_id as keeper and 2 variants — which the oracle asserts, so a
    canonicalizer that fails to collapse a pair hash-mismatches."""
    from ..functions import urls as _urls

    base = _documents(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        _synth.synthesize_url_batch, batch_format="pyarrow")

    def decorate(batch: pa.Table) -> pa.Table:
        u = batch.column("url")
        sep = pc.if_else(pc.match_substring(u, "?"), "&", "?")
        return pa.table({
            "doc_id": pc.add(batch.column("doc_id"), 1_000_000),
            "url": pc.binary_join_element_wise(
                u, sep, "utm_source=ads&utm_campaign=c1", "")})

    frontier = base.union(base.map_batches(
        decorate, batch_format="pyarrow"))

    def canon(batch: pa.Table) -> pa.Table:
        return pa.table({
            "canon_url": _urls.canonicalize_url_batch(
                batch.column("url")),
            "doc_id": batch.column("doc_id")})

    agg = frontier.map_batches(canon, batch_format="pyarrow").groupby(
        "canon_url").aggregate(
        ray.data.aggregate.Min("doc_id"),
        ray.data.aggregate.Count())
    return agg.map_batches(
        lambda b: pa.table({
            "canon_url": b.column("canon_url"),
            "keeper": b.column("min(doc_id)").cast(pa.int64()),
            "n_variants": b.column("count()").cast(pa.int64())}),
        batch_format="pyarrow")


def embedding_cov(sf_dir: str) -> pa.Table:
    """Corpus feature covariance (functions/similarity.py:embedding_cov)
    — the PCA/whitening second-moment pass: exact integer moments via
    one per-block int64 matmul, ONE dim^2-bounded groupby.sum exchange,
    bit-exact CAST-to-double division on the driver."""
    return _sim.embedding_cov(_embeddings(sf_dir))


def lang_source_pivot(sf_dir: str) -> "ray.data.Dataset":
    """Pivot / wide reshape — the corpus-composition matrix every
    mixture planner reads: one row per source with one count column
    per language. No collect and no second exchange: a map pass emits
    one-hot int64 indicator columns and ONE ``groupby(source)`` of
    Sum aggregates (map-side combined per block) produces the wide
    table directly — the pivot never exists as a long table."""
    langs = ("de", "en", "es", "fr", "zh")

    def onehot(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        cols = {"source": batch.column("source")}
        for lg in langs:
            cols[f"n_{lg}"] = pc.cast(
                pc.equal(lang, lg), pa.int64())
        return pa.table(cols)

    agg = _documents(sf_dir, ["source", "lang"]).map_batches(
        onehot, batch_format="pyarrow").groupby("source").aggregate(
        *[ray.data.aggregate.Sum(f"n_{lg}") for lg in langs])

    def finish(batch: pa.Table) -> pa.Table:
        cols = {"source": batch.column("source")}
        total = None
        for lg in langs:
            c = batch.column(f"sum(n_{lg})").cast(pa.int64())
            cols[f"n_{lg}"] = c
            total = c if total is None else pc.add(total, c)
        cols["n_total"] = total
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def dataset_split(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic train/valid/test assignment — the split every
    training corpus pins BEFORE any other processing so reruns and
    late-arriving shards land consistently: split by the md5(doc_id)
    hex prefix (pure map-side, zero exchanges; new documents never
    reshuffle existing assignments, unlike a rank-based split).
    Boundaries are hex-lexicographic: < 'f0' train (240/256),
    < 'f8' valid (8/256), else test (8/256)."""
    import hashlib

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pre = [hashlib.md5(str(i).encode()).hexdigest()[:2]
               for i in ids]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "split": pa.array(
                ["train" if p < "f0" else
                 ("valid" if p < "f8" else "test") for p in pre],
                pa.string())})

    return _documents(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pyarrow")


def extract_text_ipc(sf_dir: str) -> "ray.data.Dataset":
    """The flagship extraction fed from an Arrow IPC (Feather V2)
    corpus (sources/ipc_corpus.py: distributed content-hash-named
    writer, file-parallel zero-copy reader; html stays BINARY end to
    end) — same fused actor-pool stage, same byte-identical oracle as
    ``extract_text``: the third source format proven
    oracle-equivalent (parquet, jsonl, ipc)."""
    from ..sources.ipc_corpus import ipc_corpus_dir, read_ipc

    corpus = read_ipc(ipc_corpus_dir(sf_dir))
    ex = _ep.extract_dataset(corpus, spans=False,
                             concurrency=_q_pool(),
                             passthrough=("doc_id",))
    return ex.map_batches(
        lambda b: b.select(["doc_id", "extracted_text",
                            "n_chars_extracted", "n_nodes", "n_links",
                            "error"]),
        batch_format="pyarrow")


def lang_confusion(sf_dir: str) -> "ray.data.Dataset":
    """Model evaluation: the (true lang, predicted lang) confusion
    matrix of the trained NB classifier — ONE pure
    groupby(lang, pred_lang).count over the classify output (bounded
    by |langs|^2 regardless of corpus size). The eval loop every
    in-pipeline classifier needs next to its train+apply."""
    agg = nb_lang_classify(sf_dir).groupby(
        ["lang", "pred_lang"]).count()
    return agg.map_batches(
        lambda b: pa.table({
            "lang": b.column("lang"),
            "pred_lang": b.column("pred_lang"),
            "n": b.column("count()").cast(pa.int64())}),
        batch_format="pyarrow")


def fold_text(sf_dir: str) -> "ray.data.Dataset":
    """Unicode case/accent folding (functions/textstats.py:
    fold_text_batch) — the match-key normalization dedup pipelines
    apply before hashing: one Arrow lowercase kernel; NFKD-strip runs
    per-row ONLY behind a non-ASCII gate. An accented closed-form
    prefix is injected so the fold is actually exercised (the
    documents text itself is ASCII)."""
    pre = "Čökè — ÀÉÎ: "

    def inject(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pc.binary_join_element_wise(
                pre, batch.column("text"), "")})

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        inject, batch_format="pyarrow").map_batches(
        _ts.fold_text_batch, batch_format="pyarrow").map_batches(
        lambda b: b.select(["doc_id", "folded"]),
        batch_format="pyarrow")


def crawl_schedule(sf_dir: str) -> "ray.data.Dataset":
    """Politeness-pipeline composite: robots gate -> per-host fetch
    slots over the ALLOWED frontier only (functions/webops.py
    robots_filter + fetch_slots chained) — the actual order a crawler
    schedules in. Slots are contiguous per host across the allowed
    urls, so a blocked url never wastes a scheduler wave."""
    from ..functions import urls as _urls
    from ..functions import webops as _web

    allowed = robots_filter(sf_dir).map_batches(
        lambda b: b.filter(pc.cast(b.column("allowed"), pa.bool_())),
        batch_format="pyarrow")

    def with_host(batch: pa.Table) -> pa.Table:
        t = _urls.parse_url_batch(batch)
        return t.select(["doc_id", "host"])

    frontier = allowed.map_batches(with_host, batch_format="pyarrow")
    return _web.fetch_slots(frontier, bucket_size=64)


def image_pixel_stats_color(sf_dir: str) -> "ray.data.Dataset":
    """REAL color-JPEG pixel decode, no image library: deterministic
    per-8x8-block-constant YCbCr planes are encoded by the in-repo
    baseline 4:4:4 color encoder (interleaved MCUs, shared Huffman
    tables) and decoded back through the full entropy+IDCT path plus
    the FIXED-POINT BT.601 YCbCr->RGB conversion
    (functions/multimodal.py:encode_jpeg_color / decode_jpeg /
    _ycbcr_to_rgb) — all-ones quant keeps the transform bit-exact, and
    the integer conversion is reproduced verbatim by the SQL oracle,
    so pixel_sum / resized_sum verify the ENTIRE color path
    bit-for-bit. Sampling/mode cycles four ways: even docs 4:4:4
    (per-8x8-constant planes; sequential vs progressive+SA by
    d//2 parity), odd docs the standard 4:2:0 (per-16x16-constant
    planes, four-Y+Cb+Cr MCUs, chroma replication upsample;
    sequential vs progressive+SA by d//2 parity — the progressive
    4:2:0 decode walks MCU-interleaved DC scans with dummy blocks
    and per-component non-padded AC rasters)."""
    import numpy as np

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        blobs: list[bytes] = []
        for d in ids:
            w, h = 4 + d % 13, 3 + d % 11
            bs = 8 if d % 2 == 0 else 16
            bx = (np.arange(w) // bs)[None, :]
            by = (np.arange(h) // bs)[:, None]
            ycc = np.stack([
                (5 * bx + 9 * by + 3 * d) % 256,
                (7 * bx + 11 * by + d) % 256,
                (13 * bx + 17 * by + 5 * d) % 256,
            ], axis=-1).astype(np.uint8)
            if d % 2 == 1:
                if (d // 2) % 2 == 0:            # 4:2:0 sequential
                    blobs.append(_mm.encode_jpeg_color(
                        ycc, subsample=True))
                else:                            # 4:2:0 progressive+SA
                    blobs.append(_mm.encode_jpeg_color_progressive(
                        ycc, successive=True, subsample=True))
            elif (d // 2) % 2 == 0:              # 4:4:4 sequential
                blobs.append(_mm.encode_jpeg_color(ycc))
            else:                                # 4:4:4 progressive+SA
                blobs.append(_mm.encode_jpeg_color_progressive(
                    ycc, successive=True))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(blobs, pa.binary())})

    def decode(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        ws, hs, sums, rsums = [], [], [], []
        for blob in batch.column("media").to_pylist():
            img = _mm.decode_image_pixels(blob)
            h, w, c = img.shape
            assert c == 3
            ws.append(w)
            hs.append(h)
            sums.append(int(img.astype(np.int64).sum()))
            rsums.append(int(_mm.resize_nearest(img, 8, 8)
                             .astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "pixel_sum": pa.array(sums, pa.int64()),
            "resized_sum": pa.array(rsums, pa.int64())})

    return _documents(sf_dir, ["doc_id"]).map_batches(
        gen, batch_format="pyarrow").map_batches(
        decode, batch_format="pyarrow")


def orders_cube(sf_dir: str) -> "ray.data.Dataset":
    """CUBE / grouping-sets aggregate via MAP-SIDE KEY EXPANSION: each
    row flat-maps to its 2^k subset keys ('ALL' sentinels) BEFORE one
    grouped aggregate — the expansion combines per block inside the
    aggregate, so the exchange is bounded by 4x the group count, not
    4x the rows. The distributed-cube shape rollup's leaf-derivation
    trick (orders_rollup) cannot give when coarser levels must stay
    distributed."""
    orders = ray.data.read_parquet(
        str(Path(sf_dir) / "orders.parquet"),
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def expand(batch: pa.Table) -> pa.Table:
        s = batch.column("o_orderstatus")
        p = batch.column("o_orderpriority")
        m = _micros(batch.column("o_totalprice"))
        alls = pa.array(["ALL"] * batch.num_rows, pa.string())
        parts = [pa.table({"status": a, "priority": b,
                           "price_micros": m})
                 for a, b in ((s, p), (s, alls), (alls, p),
                              (alls, alls))]
        return pa.concat_tables(parts)

    agg = orders.map_batches(expand, batch_format="pyarrow").groupby(
        ["status", "priority"]).aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("price_micros"))
    return agg.map_batches(
        lambda b: pa.table({
            "status": b.column("status"),
            "priority": b.column("priority"),
            "n_orders": b.column("count()").cast(pa.int64()),
            "sum_price_micros": b.column("sum(price_micros)").cast(
                pa.int64())}),
        batch_format="pyarrow")


def doc_length_mad(sf_dir: str) -> pa.Table:
    """Robust per-language length statistics: median + MEDIAN ABSOLUTE
    DEVIATION, both EXACT, via two value-count-histogram passes (the
    robust outlier gate heavy-tailed web corpora need instead of
    mean/stddev). Pass 1: per-lang median from the bounded histogram;
    medians broadcast (|langs| scalars); pass 2: |x - med| histogram
    -> MAD. Each exchange is bounded by the value DOMAIN, never the
    row count."""
    from ..functions.broadcast import cached_get

    def counts(batch: pa.Table) -> pa.Table:
        t = _ts.token_count_batch(batch)
        return pa.table({"lang": batch.column("lang"),
                         "n_tokens": t.column("n_tokens")})

    ds = _documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        counts, batch_format="pyarrow").materialize()
    med = _sk.grouped_quantiles(ds, "lang", "n_tokens", [0.5], ["med"])
    med_map = dict(zip(med.column("lang").to_pylist(),
                       med.column("med").to_pylist()))
    mref = ray.put(med_map)

    def absdev(batch: pa.Table) -> pa.Table:
        import numpy as np
        mm_ = cached_get(mref)
        langs = batch.column("lang").to_pylist()
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        meds = np.asarray([mm_[lg] for lg in langs], np.int64)
        return pa.table({
            "lang": batch.column("lang"),
            "adev": pa.array(np.abs(n - meds), pa.int64())})

    mad = _sk.grouped_quantiles(
        ds.map_batches(absdev, batch_format="pyarrow"),
        "lang", "adev", [0.5], ["mad"])
    mad_map = dict(zip(mad.column("lang").to_pylist(),
                       mad.column("mad").to_pylist()))
    langs = sorted(med_map)
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "med": pa.array([med_map[lg] for lg in langs], pa.int64()),
        "mad": pa.array([mad_map[lg] for lg in langs], pa.int64())})


def image_pixel_stats_webp(sf_dir: str) -> "ray.data.Dataset":
    """REAL WebP-lossless pixel decode, no image library: RGBA images
    encoded by the in-repo transform-free VP8L encoder
    (functions/vp8l.py — canonical prefix codes through the
    code-length code, LZ77 distance-1 runs, color cache) and decoded
    back through the full bit-level path. Encoder features cycle by
    doc parity (runs on/off, color cache 0/6 bits, SUBTRACT_GREEN,
    COLOR_INDEXING palette, full-mode PREDICTOR, cross-component
    COLOR transform, and the checkerboard ENTROPY IMAGE) so every
    decode branch runs under the oracle; VP8L is lossless, so
    pixel_sum / resized_sum have the same closed form as the
    PNG-RGBA case."""
    import numpy as np

    from ..functions import vp8l as _vp8l

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        blobs: list[bytes] = []
        for d in ids:
            img = _pixel_law(d, 4)
            argb = ((img[:, :, 3].astype(np.uint32) << 24)
                    | (img[:, :, 0].astype(np.uint32) << 16)
                    | (img[:, :, 1].astype(np.uint32) << 8)
                    | img[:, :, 2].astype(np.uint32))
            n_colors = len(np.unique(argb))
            use_pal = d % 7 == 0 and 17 <= n_colors <= 256
            use_pred = d % 11 == 0 and not use_pal
            use_color = d % 13 == 0 and not use_pal and not use_pred
            blobs.append(_vp8l.encode_vp8l(
                img, use_runs=(d % 2 == 0),
                cache_bits=6 if d % 3 == 0 and not use_pal else 0,
                subtract_green=(d % 5 == 0 and not use_pal
                                and not use_pred and not use_color),
                palette=use_pal, predictor=use_pred,
                color=use_color, entropy_image=(d % 17 == 0)))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(blobs, pa.binary())})

    def decode(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        ws, hs, sums, rsums = [], [], [], []
        for blob in batch.column("media").to_pylist():
            img = _mm.decode_image_pixels(blob)
            h, w, c = img.shape
            assert c == 4
            ws.append(w)
            hs.append(h)
            sums.append(int(img.astype(np.int64).sum()))
            rsums.append(int(_mm.resize_nearest(img, 8, 8)
                             .astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "pixel_sum": pa.array(sums, pa.int64()),
            "resized_sum": pa.array(rsums, pa.int64())})

    return _documents(sf_dir, ["doc_id"]).map_batches(
        gen, batch_format="pyarrow").map_batches(
        decode, batch_format="pyarrow")


def image_pixel_stats_vp8(sf_dir: str) -> "ray.data.Dataset":
    """REAL lossy-WebP (VP8) intra-keyframe pixel decode, no image
    library: per-16x16-macroblock-constant YCbCr planes are encoded by
    the in-repo VP8 encoder (functions/vp8.py — RFC 6386 bool coder,
    keyframe header, DC/V/H/TM intra prediction cycling per MB, Y2/WHT
    + 4x4 IDCT exact fixed-point transform path, token tree with
    categories and above/left non-zero contexts) and decoded back
    through the full bitstream path; the DC-only residual solve is
    EXACT at qi=0, so decode(encode(img)) is bit-identical and
    pixel_sum / resized_sum share image_pixel_stats_color's closed
    form with bs=16 (chroma top-left-of-2x2 + replication upsample is
    invisible on 16-aligned-constant planes; RGB via the shared
    fixed-point BT.601 conversion the SQL reproduces verbatim)."""
    import numpy as np

    from ..functions import vp8 as _vp8

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        blobs: list[bytes] = []
        for d in ids:
            w, h = 8 + d % 41, 6 + d % 37
            bx = (np.arange(w) // 16)[None, :]
            by = (np.arange(h) // 16)[:, None]
            ycc = np.stack([
                (5 * bx + 9 * by + 3 * d) % 256,
                (7 * bx + 11 * by + d) % 256,
                (13 * bx + 17 * by + 5 * d) % 256,
            ], axis=-1).astype(np.uint8)
            blobs.append(_vp8.encode_webp_vp8(ycc))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(blobs, pa.binary())})

    def decode(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        ws, hs, sums, rsums = [], [], [], []
        for blob in batch.column("media").to_pylist():
            img = _mm.decode_image_pixels(blob)
            h, w, c = img.shape
            assert c == 3
            ws.append(w)
            hs.append(h)
            sums.append(int(img.astype(np.int64).sum()))
            rsums.append(int(_mm.resize_nearest(img, 8, 8)
                             .astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "pixel_sum": pa.array(sums, pa.int64()),
            "resized_sum": pa.array(rsums, pa.int64())})

    return _documents(sf_dir, ["doc_id"]).map_batches(
        gen, batch_format="pyarrow").map_batches(
        decode, batch_format="pyarrow")


def vocab_coverage(sf_dir: str) -> pa.Table:
    """Tokenizer-vocabulary planning curve: what fraction of corpus
    token OCCURRENCES the top-K words cover (the decision table for
    vocab sizing / OOV budgeting). ONE corpus tokenize pass
    (functions/textstats.py:word_frequencies — Counter partials,
    vocab-bounded exchange), then a global bounded top-k aggregate
    (state = k rows) + one Sum; coverage is exact integer ppm."""
    wf = _ts.word_frequencies(
        _documents(sf_dir, ["text"])).materialize()
    total = int(wf.sum("sum(n)") or 0)
    top = wf.aggregate(_topk.topk_rows_agg(
        ["sum(n)", "word"], [("sum(n)", True), ("word", False)],
        1000, name="top"))["top"]
    counts = [int(r[0]) for r in top]
    ks, covs, ppms = [], [], []
    for k in (10, 100, 1000):
        covered = sum(counts[:k])
        ks.append(k)
        covs.append(covered)
        ppms.append(covered * 1_000_000 // total if total else 0)
    return pa.table({
        "k": pa.array(ks, pa.int64()),
        "covered": pa.array(covs, pa.int64()),
        "total_tokens": pa.array([total] * 3, pa.int64()),
        "coverage_ppm": pa.array(ppms, pa.int64())})


def token_quantiles_by_lang(sf_dir: str) -> pa.Table:
    """Per-language token-count quantiles via GROUPED mergeable
    sketches (functions/sketches.py:grouped_sketch_quantiles): one
    sketch row per (lang, block), ONE groupby(lang) merge exchange —
    kilobytes per group at any corpus size. Rows-only by nature
    (deterministic but merge-order-dependent compaction, like
    token_quantiles_sketch); the per-group rank-error contract is
    pytest-pinned."""
    def counts(batch: pa.Table) -> pa.Table:
        t = _ts.token_count_batch(batch)
        return pa.table({"lang": batch.column("lang"),
                         "n_tokens": t.column("n_tokens")})

    ds = _documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        counts, batch_format="pyarrow")
    return _sk.grouped_sketch_quantiles(
        ds, "lang", "n_tokens", [0.1, 0.5, 0.9], ["p10", "p50", "p90"])


def video_tracks(sf_dir: str) -> "ray.data.Dataset":
    """REAL video track inventory, no media library: ISO-BMFF payloads
    carrying deterministic trak/mdia/hdlr trees are walked back by
    functions/multimodal.py:parse_mp4_tracks — the track census
    (n_video/n_audio) media-curation filters on before any sample
    decode. Handler sets cycle by doc_id%3; duration rides the same
    mvhd parse as video_duration."""
    handlers_by_mod = (("vide",), ("vide", "soun"),
                       ("vide", "soun", "vide"))

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        blobs = [_mm.encode_mp4_stub(
            timescale=1000, duration=d * 31 + 7, version=d % 2,
            handlers=handlers_by_mod[d % 3]) for d in ids]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(blobs, pa.binary())})

    def decode(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        nv, na, ms = [], [], []
        for blob in batch.column("media").to_pylist():
            tracks = _mm.parse_mp4_tracks(blob) or []
            nv.append(sum(1 for t in tracks if t == "vide"))
            na.append(sum(1 for t in tracks if t == "soun"))
            ms.append(_mm.parse_mp4_mvhd(blob)[2])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_video": pa.array(nv, pa.int64()),
            "n_audio": pa.array(na, pa.int64()),
            "duration_ms": pa.array(ms, pa.int64())})

    return _documents(sf_dir, ["doc_id"]).map_batches(
        gen, batch_format="pyarrow").map_batches(
        decode, batch_format="pyarrow")


def doc_novelty(sf_dir: str) -> "ray.data.Dataset":
    """Per-document NOVELTY under doc_id order (the
    contribution-aware sampling signal: how many of a doc's distinct
    5-grams appear in NO earlier document — i.e. this doc is their
    corpus-first occurrence). JOIN-FREE, TWO pure aggregate exchanges
    over 8-byte gram fingerprints (text never shuffles): the tokenize
    pass emits kind-marked rows — per-(doc, gram) pairs AND one
    per-doc distinct-count row (so the denominator needs no second
    pass or exchange, and gram-less docs zero-fill for free); pairs ->
    groupby(gfp).Min(doc_id) (winners), whose per-block Counter
    partial joins the denominator rows in ONE final
    groupby(doc_id).sum. novelty_pct is exact integer."""
    width = 5

    def pairs(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id: list[int] = []
        grams: list[str] = []
        den_id: list[int] = []
        den_n: list[int] = []
        for i, t in zip(ids, texts):
            toks = _ts.tokenize(t)
            n = max(len(toks) - width + 1, 0)
            uniq = set(" ".join(toks[j:j + width])
                       for j in range(n)) if n else ()
            out_id.extend([int(i)] * len(uniq))
            grams.extend(uniq)
            den_id.append(int(i))       # kind=1: the denominator row
            den_n.append(len(uniq))     # (0 for gram-less docs)
        fp = _dedup.fp_strings64(grams) \
            if grams else np.zeros(0, np.int64)
        k = len(out_id)
        return pa.table({
            "doc_id": pa.array(out_id + den_id, pa.int64()),
            "gfp": pa.array(np.concatenate(
                (fp, np.zeros(len(den_id), np.int64))), pa.int64()),
            "n": pa.array([1] * k + den_n, pa.int64()),
            "kind": pa.array([0] * k + [1] * len(den_id), pa.int64()),
        })

    g = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow").materialize()

    def first_counts(batch: pa.Table) -> pa.Table:
        # per-block Counter partial over the winners: shrinks the
        # per-gram winner rows to <= |distinct docs in block| rows
        # before the final exchange
        import collections
        c = collections.Counter(
            batch.column("min(doc_id)").to_pylist())
        return pa.table({
            "doc_id": pa.array(list(c.keys()), pa.int64()),
            "n_first": pa.array(list(c.values()), pa.int64()),
            "n_distinct": pa.array([0] * len(c), pa.int64())})

    num = g.filter(expr="kind == 0").groupby("gfp").aggregate(
        ray.data.aggregate.Min("doc_id")).map_batches(
        first_counts, batch_format="pyarrow")
    den = g.filter(expr="kind == 1").map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "n_first": pa.array([0] * b.num_rows, pa.int64()),
            "n_distinct": b.column("n")}),
        batch_format="pyarrow")
    agg = num.union(den).groupby("doc_id").aggregate(
        ray.data.aggregate.Sum("n_first"),
        ray.data.aggregate.Sum("n_distinct"))

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np
        nf = batch.column("sum(n_first)").cast(pa.int64()
                                               ).to_numpy(False)
        nd = batch.column("sum(n_distinct)").cast(pa.int64()
                                                  ).to_numpy(False)
        pct = np.where(nd > 0, 100 * nf // np.maximum(nd, 1), 0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_first": pa.array(nf, pa.int64()),
            "n_distinct": pa.array(nd, pa.int64()),
            "novelty_pct": pa.array(pct, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def source_dedup_rate(sf_dir: str) -> pa.Table:
    """Per-source exact-duplicate rate — the curation dashboard's
    first column (which feeds are copy-heavy): docs vs distinct
    content fingerprints per source, dup_pct exact integer. Two pure
    aggregates ((source, fp) distinct then per-source counts); the
    final table is |sources|-bounded."""
    import hashlib

    def fps(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "source": batch.column("source"),
            "fp": pa.array(
                [hashlib.md5((t or "").encode()).hexdigest()
                 for t in texts], pa.string())})

    pairs = _documents(sf_dir, ["source", "text"]).map_batches(
        fps, batch_format="pyarrow")
    distinct = pairs.groupby(["source", "fp"]).count().map_batches(
        lambda b: pa.table({"source": b.column("source")}),
        batch_format="pyarrow").groupby("source").count().take_all()
    totals = _documents(sf_dir, ["source"]).groupby(
        "source").count().take_all()
    nd = {r["source"]: r["count()"] for r in distinct}
    nt = {r["source"]: r["count()"] for r in totals}
    srcs = sorted(nt)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_docs": pa.array([nt[s] for s in srcs], pa.int64()),
        "n_distinct": pa.array([nd.get(s, 0) for s in srcs],
                               pa.int64()),
        "dup_pct": pa.array(
            [100 * (nt[s] - nd.get(s, 0)) // nt[s] if nt[s] else 0
             for s in srcs], pa.int64())})


def corpus_summary(sf_dir: str) -> pa.Table:
    """The dataset-card census — the one-row summary every released
    corpus ships with: doc/token/char totals, distinct langs/sources,
    exact duplicate count. ONE map pass emits per-block partial rows
    (counts + small distinct sets ride as md5 fps through the dedup
    machinery); totals come from bounded pure aggregates only."""
    import hashlib

    def project(batch: pa.Table) -> pa.Table:
        t = _ts.token_count_batch(batch)
        texts = batch.column("text").to_pylist()
        return pa.table({
            "lang": batch.column("lang"),
            "source": batch.column("source"),
            "n_tokens": t.column("n_tokens"),
            "n_chars": pc.utf8_length(
                batch.column("text")).cast(pa.int64()),
            "fp": pa.array(
                [hashlib.md5((x or "").encode()).hexdigest()
                 for x in texts], pa.string())})

    ds = _documents(sf_dir, ["doc_id", "text", "lang", "source"]
                    ).map_batches(project,
                                  batch_format="pyarrow").materialize()
    n_docs = ds.count()
    sums = ds.sum(["n_tokens", "n_chars"])
    n_langs = ds.groupby("lang").count().count()
    n_sources = ds.groupby("source").count().count()
    n_distinct = ds.groupby("fp").count().count()
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_tokens": pa.array([int(sums["sum(n_tokens)"])], pa.int64()),
        "n_chars": pa.array([int(sums["sum(n_chars)"])], pa.int64()),
        "n_langs": pa.array([n_langs], pa.int64()),
        "n_sources": pa.array([n_sources], pa.int64()),
        "n_duplicates": pa.array([n_docs - n_distinct], pa.int64())})

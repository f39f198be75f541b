"""Deduplication operators for web-scale corpora.

All operators take/return ``ray.data.Dataset`` and are built from Ray
Data primitives only. Partitioning notes (100 TB design):

* **exact**: one hash-keyed groupby — the only all-to-all exchange; the
  key is a 128-bit content hash so group sizes are bounded by the true
  duplicate multiplicity (no skew beyond real dup clusters).
* **MinHash+LSH**: signatures are computed embarrassingly parallel in
  ``map_batches``; the candidate generation shuffles only the tiny
  ``(band_key, doc_id)`` pairs (bands x docs rows of ~24 bytes), never
  the documents themselves. Groups = LSH buckets; bucket keys are
  uniformly distributed by construction.
* **SimHash**: near-dup banding over 16-bit chunks of a 64-bit simhash;
  same shuffle shape as LSH.
* **n-gram Jaccard**: exact verification of LSH candidate pairs; the
  docs needed for verification are fetched via a broadcast dict at test
  scale — at production scale this becomes a hash-join of the candidate
  pair list against the corpus (documented, same operator shape).

Determinism: all hashing is seeded from fixed constants (no RNG state).
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

# --- exact dedup --------------------------------------------------------


def _exact_fp_batch(batch: pa.Table, *, key: str) -> pa.Table:
    vals = batch.column(key).to_pylist()
    fp = [hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals]
    return batch.append_column("_fp", pa.array(fp, pa.string()))


def exact_dedup(ds: "ray.data.Dataset", key: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep the smallest ``id_col`` row per exact ``key`` value.

    hash-partitioned groupby + per-group first (SURVEY.md par.2.7)."""
    ds = ds.map_batches(_exact_fp_batch, batch_format="pyarrow",
                        fn_kwargs={"key": key})

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_col)

    out = ds.groupby("_fp").map_groups(keep_first, batch_format="pandas")
    return out.drop_columns(["_fp"])


# --- shingles + MinHash -------------------------------------------------

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


_FNV_PRIME = np.uint64(1099511628211)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Stable 32-bit hashes of the distinct character k-gram shingles.

    Fully vectorized: the text becomes a uint32 codepoint array (one
    utf-32 encode, no per-shingle Python strings) and every window is
    hashed with a polynomial in the FNV prime via one sliding-window
    matmul (uint64 wraparound is deterministic)."""
    t = " ".join(text.split())  # normalize whitespace for shingling
    if not t:
        return np.zeros(0, dtype=np.uint64)
    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if len(cp) < k:
        win = cp[None, :]
        k = len(cp)
    else:
        win = np.lib.stride_tricks.sliding_window_view(cp, k)
    with np.errstate(over="ignore"):
        powers = _FNV_PRIME ** np.arange(k, dtype=np.uint64)
        h = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h & np.uint64(_MAX_HASH))


def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(42)  # fixed seed: deterministic engine-wide
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int, k: int,
                      a: np.ndarray, b: np.ndarray) -> np.ndarray:
    h = _shingle_hashes(text, k)
    if h.size == 0:
        return np.full(num_perm, _MAX_HASH, dtype=np.uint64)
    # (a*h + b) mod p, min over shingles, per permutation
    vals = (np.outer(a, h) + b[:, None]) % _MERSENNE
    return (vals.min(axis=1) & _MAX_HASH).astype(np.uint64)


class MinHashBatch:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        self.a, self.b = _perm_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = [minhash_signature(t or "", self.num_perm, self.k,
                                  self.a, self.b) for t in texts]
        sig_arr = pa.array([s.tolist() for s in sigs],
                           pa.list_(pa.uint64(), self.num_perm))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "minhash": sig_arr,
        })


def _band_rows(batch: pa.Table, *, bands: int, rows_per_band: int,
               id_col: str) -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    sigs = batch.column("minhash").to_pylist()
    out_band: list[int] = []
    out_key: list[str] = []
    out_id: list[int] = []
    for doc_id, sig in zip(ids, sigs):
        for bi in range(bands):
            chunk = sig[bi * rows_per_band:(bi + 1) * rows_per_band]
            key = hashlib.blake2b(
                np.asarray(chunk, dtype=np.uint64).tobytes(),
                digest_size=8).hexdigest()
            out_band.append(bi)
            out_key.append(key)
            out_id.append(doc_id)
    return pa.table({
        "band": pa.array(out_band, pa.int32()),
        "band_key": pa.array(out_key, pa.string()),
        id_col: pa.array(out_id, pa.int64()),
    })


def minhash_lsh_candidates(ds: "ray.data.Dataset", *, num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           text_col: str = "text", id_col: str = "doc_id",
                           concurrency: tuple[int, int] | int = (1, 8),
                           ) -> "ray.data.Dataset":
    """documents -> candidate near-duplicate pairs (id_a < id_b).

    shingle -> minhash (actor pool) -> band explode -> bucket groupby.
    Only ``(band, band_key, doc_id)`` rows are shuffled."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHashBatch, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   text_col=text_col, id_col=id_col))
    banded = sigs.map_batches(
        _band_rows, batch_format="pyarrow",
        fn_kwargs=dict(bands=bands, rows_per_band=rows_per_band,
                       id_col=id_col))

    # One aggregate collects the id-list per LSH bucket (pairs only ever
    # shuffle (band_key, id) rows), then pair generation is a vectorized
    # pass over THOUSANDS of buckets per batch — per-bucket map_groups
    # calls were ~10x slower (one Python/pandas round-trip per tiny
    # group). Bucket sizes are bounded by true near-dup multiplicity.
    buckets = banded.groupby(["band", "band_key"]).aggregate(
        _collect_ids_agg(id_col))

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        out_a: list[int] = []
        out_b: list[int] = []
        for ids in batch.column("ids").to_pylist():
            if len(ids) < 2:
                continue
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64())})

    pairs = buckets.map_batches(bucket_pairs, batch_format="pyarrow")
    return _distinct_pairs(pairs)


def _collect_ids_agg(id_col: str):
    """Grouped aggregate: list of ``id_col`` values per group (column
    ``ids``)."""
    return ray.data.aggregate.AggregateFn(
        init=lambda k: [],
        # in-place append: `acc + [x]` copies the list per row, which is
        # quadratic for large duplicate clusters
        accumulate_row=lambda acc, row: (acc.append(row[id_col]) or acc),
        merge=lambda a, b: a + b,
        name="ids")


def _distinct_pairs(pairs: "ray.data.Dataset",
                    cols: Iterable[str] = ("id_a", "id_b"),
                    ) -> "ray.data.Dataset":
    """Distinct rows via a grouped count — a pure aggregate, no
    per-group UDF calls. ``cols`` is explicit because ``.schema()`` on a
    post-aggregate lazy Dataset executes the whole upstream plan."""
    agg = pairs.groupby(list(cols)).count()
    return agg.drop_columns(["count()"])


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity."""
    a = set(" ".join(text_a.split())[i:i + k]
            for i in range(max(1, len(" ".join(text_a.split())) - k + 1)))
    b = set(" ".join(text_b.split())[i:i + k]
            for i in range(max(1, len(" ".join(text_b.split())) - k + 1)))
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def verify_pairs_jaccard(pairs: "ray.data.Dataset",
                         docs: "ray.data.Dataset",
                         *, threshold: float = 0.8, shingle_k: int = 5,
                         text_col: str = "text", id_col: str = "doc_id",
                         ) -> "ray.data.Dataset":
    """Exact n-gram-Jaccard verification of candidate pairs.

    The doc texts are broadcast once via ``ray.put`` (small-side lookup
    inside map_batches — no shuffle join). At 100 TB the candidate set
    is a tiny fraction of the corpus, but the broadcast side would be
    the candidate-doc subset, fetched via a semi-join first."""
    tbl = docs.select_columns([id_col, text_col]).to_arrow_refs()
    texts: dict[int, str] = {}
    for ref in tbl:
        t = ray.get(ref)
        for i, v in zip(t.column(id_col).to_pylist(),
                        t.column(text_col).to_pylist()):
            texts[i] = v or ""
    texts_ref = ray.put(texts)

    class Verify:
        """Actor-pool stage: per-doc shingle-hash arrays are computed
        once and memoized across batches; the pairwise Jaccard is a
        sorted-array intersection (exact up to 32-bit hash collisions —
        ~1e-8 per pair at 10^3 shingles/doc)."""

        def __init__(self):
            self.texts = ray.get(texts_ref)
            self.cache: dict[int, np.ndarray] = {}

        def _sh(self, doc_id: int) -> np.ndarray:
            h = self.cache.get(doc_id)
            if h is None:
                h = _shingle_hashes(self.texts.get(doc_id, ""), shingle_k)
                self.cache[doc_id] = h
            return h

        def __call__(self, batch: pa.Table) -> pa.Table:
            id_a = batch.column("id_a").to_pylist()
            id_b = batch.column("id_b").to_pylist()
            sims = []
            for x, y in zip(id_a, id_b):
                a, b = self._sh(x), self._sh(y)
                if not len(a) and not len(b):
                    sims.append(1.0)
                    continue
                inter = len(np.intersect1d(a, b, assume_unique=True))
                sims.append(inter / (len(a) + len(b) - inter))
            out = pa.table({
                "id_a": pa.array(id_a, pa.int64()),
                "id_b": pa.array(id_b, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            })
            return out.filter(pa.array([s >= threshold for s in sims]))

    return pairs.map_batches(Verify, batch_format="pyarrow",
                             concurrency=(1, 4))


# --- SimHash ------------------------------------------------------------


_SH_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens.

    Token hashes come from pandas' vectorized 64-bit siphash
    (``pd.util.hash_array`` with its fixed default key — stable across
    runs); the +-1 bit voting is one (n_tokens, 64) numpy reduction."""
    toks = text.split()
    if not toks:
        return 0
    h = pd.util.hash_array(np.asarray(toks, dtype=object))
    bits = ((h[:, None] >> _SH_SHIFTS[None, :]) & np.uint64(1))
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(toks)
    out = np.uint64(0)
    sel = np.where(votes > 0)[0]
    for i in sel:
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    hashes = [simhash64(t or "") for t in texts]
    cols = {"doc_id": batch.column("doc_id"),
            "simhash": pa.array([h - (1 << 63) if h >= (1 << 63) else h
                                 for h in hashes], pa.int64())}
    # 4 x 16-bit bands for hamming-distance<=3 candidate search
    for bi in range(4):
        cols[f"sh_band{bi}"] = pa.array(
            [(h >> (16 * bi)) & 0xFFFF for h in hashes], pa.int32())
    return pa.table(cols)


def _simhash_band_rows(batch: pa.Table) -> pa.Table:
    """Explode each doc into 4 (band, band_val) bucket rows so candidate
    search is ONE grouped aggregate instead of four all-to-all barriers."""
    ids = batch.column("doc_id").to_pylist()
    hashes = batch.column("simhash").to_pylist()
    out_band, out_val, out_id, out_hash = [], [], [], []
    for doc_id, h in zip(ids, hashes):
        u = h & ((1 << 64) - 1)
        for bi in range(4):
            out_band.append(bi)
            out_val.append((u >> (16 * bi)) & 0xFFFF)
            out_id.append(doc_id)
            out_hash.append(h)
    return pa.table({
        "band": pa.array(out_band, pa.int32()),
        "band_val": pa.array(out_val, pa.int32()),
        "doc_id": pa.array(out_id, pa.int64()),
        "simhash": pa.array(out_hash, pa.int64()),
    })


def simhash_candidates(ds: "ray.data.Dataset",
                       max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup candidates: docs sharing any 16-bit simhash band
    (guarantees recall for hamming distance <= 3), verified by exact
    hamming distance."""
    sh = ds.map_batches(simhash_batch, batch_format="pyarrow")
    banded = sh.map_batches(_simhash_band_rows, batch_format="pyarrow")

    def pair_rows(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_d = [], [], []
        for rows in batch.column("rows").to_pylist():
            rows = sorted(map(tuple, rows))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    d = bin((rows[i][1] ^ rows[j][1])
                            & ((1 << 64) - 1)).count("1")
                    if d <= max_hamming:
                        out_a.append(rows[i][0])
                        out_b.append(rows[j][0])
                        out_d.append(d)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_d, pa.int64())})

    def collect_rows():
        return ray.data.aggregate.AggregateFn(
            init=lambda k: [],
            accumulate_row=lambda acc, row: (
                acc.append([row["doc_id"], row["simhash"]]) or acc),
            merge=lambda a, b: a + b,
            name="rows")

    # ONE all-to-all over tiny (band, band_val, id, hash) rows, then
    # vectorized pair generation over whole batches of buckets.
    buckets = banded.groupby(["band", "band_val"]).aggregate(collect_rows())
    pairs = buckets.map_batches(pair_rows, batch_format="pyarrow")
    return _distinct_pairs(pairs, cols=("id_a", "id_b", "hamming"))

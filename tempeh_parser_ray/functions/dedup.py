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


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Stable 32-bit hashes of character k-gram shingles."""
    t = " ".join(text.split())  # normalize whitespace for shingling
    if len(t) < k:
        shingles = {t} if t else set()
    else:
        shingles = {t[i:i + k] for i in range(len(t) - k + 1)}
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=4).digest(),
                        "little") for s in shingles),
        dtype=np.uint64, count=len(shingles))
    return out


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

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group[id_col].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        pairs = [(ids[i], ids[j]) for i in range(len(ids))
                 for j in range(i + 1, len(ids))]
        return pd.DataFrame({"id_a": [p[0] for p in pairs],
                             "id_b": [p[1] for p in pairs]})

    pairs = banded.groupby(["band", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas")
    # distinct pairs (bands can agree more than once)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


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

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(texts_ref)
        id_a = batch.column("id_a").to_pylist()
        id_b = batch.column("id_b").to_pylist()
        sims = [jaccard(lookup.get(x, ""), lookup.get(y, ""), shingle_k)
                for x, y in zip(id_a, id_b)]
        out = pa.table({
            "id_a": pa.array(id_a, pa.int64()),
            "id_b": pa.array(id_b, pa.int64()),
            "jaccard": pa.array(sims, pa.float64()),
        })
        mask = pa.array([s >= threshold for s in sims])
        return out.filter(mask)

    return pairs.map_batches(verify, batch_format="pyarrow")


# --- SimHash ------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (stable blake2b token hashes)."""
    toks = text.split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for tok in toks:
        h = np.uint64(int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
            "little"))
        bits = (h >> shifts) & one
        acc += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out


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


def simhash_candidates(ds: "ray.data.Dataset",
                       max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup candidates: docs sharing any 16-bit simhash band
    (guarantees recall for hamming distance <= 3), verified by exact
    hamming distance."""
    sh = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(group["doc_id"], group["simhash"]))
        out_a, out_b, out_d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    out_a.append(rows[i][0])
                    out_b.append(rows[j][0])
                    out_d.append(d)
        return pd.DataFrame({
            "id_a": pd.Series(out_a, dtype="int64"),
            "id_b": pd.Series(out_b, dtype="int64"),
            "hamming": pd.Series(out_d, dtype="int64")})

    parts = []
    for bi in range(4):
        parts.append(sh.groupby(f"sh_band{bi}").map_groups(
            band_pairs, batch_format="pandas"))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.union(p)
    return allp.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")

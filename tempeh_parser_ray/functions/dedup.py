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
* **n-gram Jaccard**: exact verification of LSH candidate pairs via a
  distributed semi-join — candidate IDS are gathered from the small pair
  side, the corpus is filtered+shingled distributedly, and only the
  candidate-doc shingle subset is broadcast to the verify actor pool.

Determinism: all hashing is seeded from fixed constants (no RNG state).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .broadcast import cached_get

# --- exact dedup --------------------------------------------------------


def _exact_fp_batch(batch: pa.Table, *, key: str) -> pa.Table:
    vals = batch.column(key).to_pylist()
    fp = [hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals]
    return batch.append_column("_fp", pa.array(fp, pa.string()))


def exact_dedup(ds: "ray.data.Dataset", key: str = "text",
                id_col: str = "doc_id",
                num_partitions: int = 16,
                broadcast_limit: int = 5_000_000) -> "ray.data.Dataset":
    """Keep the smallest ``id_col`` row per exact ``key`` value.

    One pure-aggregate exchange plus a size-adaptive winner pass, zero
    per-group Python UDF calls (SURVEY.md par.2.7):

    1. ``groupby(_fp).aggregate(Min(id))`` — a PURE aggregate (per-block
       combine, tiny per-group state), shuffling only pre-combined
       partials.
    2. winner-row recovery. When the winner set is small enough
       (< ``broadcast_limit`` entries) the ``fp -> winner id`` map is
       broadcast ONCE via ``ray.put`` and the corpus is filtered with
       per-row map lookups — no second shuffle at all, and the pair
       condition matches the join path exactly even if ``id_col``
       values repeat. Above the limit, a distributed ``left_semi``
       hash join keeps the winner set off the driver (the 10^12-doc
       path).
    """
    ds = ds.map_batches(_exact_fp_batch, batch_format="pyarrow",
                        fn_kwargs={"key": key})
    winners = ds.groupby("_fp").aggregate(
        ray.data.aggregate.Min(id_col)).materialize()

    if winners.count() <= broadcast_limit:
        win_map: dict[str, int] = {}
        for b in winners.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
            win_map.update(zip(
                b.column("_fp").to_pylist(),
                (int(x) for x in
                 b.column(f"min({id_col})").to_pylist())))
        map_ref = ray.put(win_map)

        def keep_winners(batch: pa.Table) -> pa.Table:
            # the (fp -> winner id) map keeps the pair condition the
            # join path enforces — id-only membership would over-keep
            # when id_col values repeat across distinct keys;
            # cached_get: near the broadcast limit the map is hundreds
            # of MB — unpickle it once per worker, not once per batch
            wm = cached_get(map_ref)
            fps = batch.column("_fp").to_pylist()
            ids = batch.column(id_col).to_pylist()
            return batch.filter(pa.array(
                [wm.get(f) == i for f, i in zip(fps, ids)]))

        out = ds.map_batches(keep_winners, batch_format="pyarrow")
    else:
        def as_keys(batch: pa.Table) -> pa.Table:
            return pa.table({"_fp": batch.column("_fp"),
                             id_col: batch.column(f"min({id_col})")})

        winner_keys = winners.map_batches(as_keys, batch_format="pyarrow")
        out = ds.join(winner_keys, join_type="left_semi",
                      num_partitions=num_partitions, on=("_fp", id_col))
    return out.drop_columns(["_fp"])


# --- shingles + MinHash -------------------------------------------------

_MAX_HASH = (1 << 32) - 1


_FNV_PRIME = np.uint64(1099511628211)


def _shingle_hashes64(text: str, k: int) -> np.ndarray:
    """Stable 64-bit hashes of the distinct character k-gram shingles.

    Fully vectorized: the text becomes a uint32 codepoint array (one
    utf-32 encode, no per-shingle Python strings) and every window is
    hashed with a polynomial in the FNV prime via one sliding-window
    matmul (uint64 wraparound is deterministic). At 64 bits the distinct
    hash count equals the distinct shingle count with overwhelming
    probability (~1e-13 error per pair at 10^3 shingles/doc), so the
    hash-set Jaccard IS the exact string-shingle Jaccard."""
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
    return np.unique(h)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """32-bit shingle hashes — the compact MinHash input domain (the
    keyed splitmix64 permutations operate on any uint64, but 32 bits
    keep signature entropy while halving the per-doc working set)."""
    h = _shingle_hashes64(text, k)
    if h.size == 0:
        return h
    return np.unique(h & np.uint64(_MAX_HASH))


def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-permutation 64-bit seeds (kept as a pair for signature
    compatibility; only the first array is used by the mixer)."""
    rng = np.random.RandomState(42)  # fixed seed: deterministic engine-wide
    a = rng.randint(1, 1 << 63, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


_MIX_M1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_M2 = np.uint64(0x94D049BB133111EB)


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a bijection on uint64 (xorshifts and odd
    multiplies are invertible mod 2^64), vectorized with deliberate
    wraparound."""
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * _MIX_M1
        z = (z ^ (z >> np.uint64(27))) * _MIX_M2
        return z ^ (z >> np.uint64(31))


_H_GOLD = np.uint64(0x9E3779B97F4A7C15)


def hash_strings64(strs) -> np.ndarray:
    """Stable vectorized 64-bit string hash — the engine-wide gram /
    token fingerprint kernel (replaces ``pd.util.hash_array`` on the
    hot tokenize paths: no pandas object-array walk, no dependence on
    a pandas implementation detail).

    One Arrow string-array build yields the contiguous utf-8 buffer +
    offsets in C; the bytes are zero-padded to 8-byte words with one
    vectorized scatter, each word is keyed by its position within its
    string and finalized through :func:`_mix64`, and the per-string
    word hashes fold with one segmented XOR (``bitwise_xor.reduceat``)
    plus a length mix — no per-element cumulative dependency chains,
    so every pass is a SIMD numpy kernel. Accepts a Python sequence
    of strings or an Arrow (chunked) string array; returns uint64.
    Collisions ~2^-64 per pair — the callers' SQL oracles join gram
    STRINGS, so oracle agreement also certifies collision-freeness on
    every tested input."""
    if isinstance(strs, pa.ChunkedArray):
        # widen offsets BEFORE compacting: >2 GB of string data
        # cannot live in a single 32-bit-offset chunk
        strs = strs.cast(pa.large_string()).combine_chunks()
    if isinstance(strs, pa.Array):
        arr = strs.cast(pa.large_string())
        if not len(arr):
            return np.zeros(0, np.uint64)
    else:
        if not len(strs):
            return np.zeros(0, np.uint64)
        # build as 32-bit-offset string (the fast from-pylist path)
        # and widen offsets after — pa.array(x, large_string()) is
        # ~10x slower than this two-step. pa.array returns a
        # CHUNKED array when the list tops 2 GB of string data
        # (documented pyarrow behavior) — widen to 64-bit offsets
        # FIRST (a single 32-bit-offset chunk cannot hold 2 GB),
        # then compact so the buffer/offset walk below sees one
        # contiguous Array.
        arr = pa.array(strs)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.cast(pa.large_string()).combine_chunks()
        else:
            arr = arr.cast(pa.large_string())
    offs = np.frombuffer(arr.buffers()[1], np.int64,
                         count=len(arr) + 1, offset=8 * arr.offset)
    dbuf = arr.buffers()[2]
    data = (np.frombuffer(dbuf, np.uint8, count=int(offs[-1]))
            if dbuf is not None and int(offs[-1])
            else np.zeros(0, np.uint8))
    lens = offs[1:] - offs[:-1]
    n_bytes = int(offs[-1] - offs[0])
    # words per string (empty strings get one zero word so the
    # segmented reduce has no empty segments; the length mix below
    # still separates "" from "\\x00")
    wc = np.maximum((lens + 7) >> 3, 1)
    woff = np.empty(len(arr) + 1, np.int64)
    woff[0] = 0
    np.cumsum(wc, out=woff[1:])
    padded = np.zeros(int(woff[-1]) * 8, np.uint8)
    if n_bytes:
        tgt = np.arange(n_bytes, dtype=np.int64) + np.repeat(
            woff[:-1] * 8 - (offs[:-1] - offs[0]), lens)
        padded[tgt] = data[int(offs[0]):int(offs[-1])]
    words = padded.view("<u8")
    pos = (np.arange(len(words), dtype=np.int64)
           - np.repeat(woff[:-1], wc)).astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = _mix64(words ^ _mix64(pos * _H_GOLD))
        acc = np.bitwise_xor.reduceat(mixed, woff[:-1])
        return _mix64(acc ^ (lens.astype(np.uint64) * _H_GOLD))


def fp_strings64(strs) -> np.ndarray:
    """int64 (two's-complement) view of :func:`hash_strings64` — the
    Arrow-friendly fingerprint dtype every gram exchange ships."""
    return hash_strings64(strs).view(np.int64)


def minhash_signature(text: str, num_perm: int, k: int,
                      a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash via per-permutation keyed splitmix64: permutation i maps
    shingle-hash h to ``mix64(h ^ seed_i)`` — a true uint64 bijection
    per seed, so minima are uniform over the set (min-wise).

    A linear ``(a*h+b) mod p`` family with h < 2^32 is NOT min-wise
    here: inputs small enough that a*h+b never wraps past p keep their
    ordering under EVERY (a,b), so the same small-hash shingles win the
    min across permutations and the Jaccard estimate biases low
    (measured: a j=0.92 pair agreed on 28/64 permutations instead of
    ~59/64, and near-dup recall collapsed for short documents)."""
    h = _shingle_hashes(text, k)
    if h.size == 0:
        return np.full(num_perm, (1 << 64) - 1, dtype=np.uint64)
    vals = _mix64(h[None, :] ^ a[:, None])
    return vals.min(axis=1)


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


def _band_weights(rows_per_band: int) -> np.ndarray:
    """Fixed odd 64-bit weights for the vectorized band key (a random
    linear hash mod 2^64: distinct band chunks collide w.p. ~2^-64)."""
    rng = np.random.RandomState(1337)
    w = rng.randint(0, 1 << 62, size=rows_per_band, dtype=np.uint64)
    return (w << np.uint64(1)) | np.uint64(1)  # odd => invertible terms


def _band_rows(batch: pa.Table, *, bands: int, rows_per_band: int,
               id_col: str) -> pa.Table:
    """Explode signatures into (band, band_key, id) rows — one numpy
    pass over the whole batch, no per-row hashing."""
    n = batch.num_rows
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    sig = batch.column("minhash")
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    flat = sig.flatten().to_numpy(zero_copy_only=False)
    chunks = flat.reshape(n, bands, rows_per_band)
    w = _band_weights(rows_per_band)
    with np.errstate(over="ignore"):
        keys = (chunks * w[None, None, :]).sum(axis=2, dtype=np.uint64)
    return pa.table({
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        # two's-complement view: int64 keys groupby natively (uint64
        # values above 2^63-1 would get pickled as objects by the
        # aggregate's key re-encode)
        "band_key": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
        id_col: pa.array(np.repeat(ids, bands), pa.int64()),
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


def collect_columns_agg(cols: Sequence[str], name: str):
    """Grouped aggregate collecting whole per-group column slices in ONE
    vectorized ``accumulate_block`` call (the sort-based aggregate hands
    each group's block slice to the accumulator — no per-row Python).
    One column -> flat value list; several -> list of [c1, c2, ...]
    rows."""
    from ray.data.block import BlockAccessor

    cols = list(cols)

    def acc_block(acc: list, block) -> list:
        t = BlockAccessor.for_block(block).to_arrow()
        if len(cols) == 1:
            acc.extend(t.column(cols[0]).to_pylist())
        else:
            acc.extend([list(r) for r in zip(
                *(t.column(c).to_pylist() for c in cols))])
        return acc

    return ray.data.aggregate.AggregateFn(
        init=lambda k: [],
        accumulate_block=acc_block,
        merge=lambda a, b: a + b,
        name=name)


def _collect_ids_agg(id_col: str):
    """Grouped aggregate: list of ``id_col`` values per group (column
    ``ids``)."""
    return collect_columns_agg([id_col], "ids")


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


def collect_candidate_ids(pairs: "ray.data.Dataset",
                          cols: Iterable[str] = ("id_a", "id_b"),
                          ) -> np.ndarray:
    """Distinct id set referenced by a (small-side) pair Dataset.

    Only IDS ever reach the driver — 8 bytes per candidate doc, never
    texts/vectors. Per-batch ``np.unique`` keeps the driver-side union
    proportional to the number of distinct candidates."""
    cols = list(cols)

    def batch_ids(batch: pa.Table) -> pa.Table:
        arrs = [batch.column(c).to_numpy(zero_copy_only=False)
                for c in cols]
        return pa.table({"id": pa.array(
            np.unique(np.concatenate(arrs)) if arrs else
            np.zeros(0, np.int64))})

    parts = [tb.column("id").to_numpy(zero_copy_only=False)
             for tb in pairs.map_batches(
                 batch_ids, batch_format="pyarrow").iter_batches(
                     batch_format="pyarrow", batch_size=None)]
    if not parts:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def verify_pairs_jaccard(pairs: "ray.data.Dataset",
                         docs: "ray.data.Dataset",
                         *, threshold: float = 0.8, shingle_k: int = 5,
                         text_col: str = "text", id_col: str = "doc_id",
                         concurrency: int = 4,
                         ) -> "ray.data.Dataset":
    """Exact n-gram-Jaccard verification of candidate pairs via a
    distributed semi-join — NO full-corpus driver collection:

    1. the distinct candidate-ID set is gathered from the (small-side)
       pair list — ids only, 8 bytes per candidate;
    2. the corpus is filtered to those ids with a vectorized ``isin``
       AND reduced to per-doc 64-bit shingle-hash arrays in the same
       distributed ``map_batches`` pass (texts never leave the workers);
    3. only the candidate-doc SHINGLE table (bounded by the candidate
       count, not the corpus) is broadcast once via ``ray.put``;
    4. verification is an actor-pool map over the pair Dataset — each
       actor builds its id->hashes index once in ``__init__``.

    The Jaccard is a sorted-array intersection over 64-bit shingle
    hashes — exact string-shingle Jaccard up to ~1e-13/pair collision
    odds (so values are emitted UNROUNDED; they equal the closed-form
    SQL value bit-for-bit).

    ``pairs`` is consumed twice (id gather, then verification), so it is
    materialized once up front — it is the SMALL side by contract
    (candidate pairs, not corpus)."""
    pairs = pairs.materialize()
    cand_ids = collect_candidate_ids(pairs)
    ids_ref = ray.put(cand_ids)

    def cand_shingles(batch: pa.Table) -> pa.Table:
        want = cached_get(ids_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(np.isin(ids, want)))
        sh = [_shingle_hashes64(t or "", shingle_k)
              for t in sub.column(text_col).to_pylist()]
        return pa.table({
            id_col: sub.column(id_col),
            "sh": pa.array([s.tolist() for s in sh],
                           pa.list_(pa.uint64())),
        })

    sub_parts = list(docs.map_batches(
        cand_shingles, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    sh_schema = pa.schema([(id_col, pa.int64()),
                           ("sh", pa.list_(pa.uint64()))])
    sh_tab = (pa.concat_tables(sub_parts) if sub_parts
              else sh_schema.empty_table())
    sh_ref = ray.put(sh_tab)

    class Verify:
        """Actor-pool stage: the candidate shingle index is built once
        per actor from the broadcast subset table."""

        def __init__(self):
            t = ray.get(sh_ref)
            self.sh = {
                i: np.asarray(s, dtype=np.uint64)
                for i, s in zip(t.column(id_col).to_pylist(),
                                t.column("sh").to_pylist())}
            self.empty = np.zeros(0, dtype=np.uint64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            id_a = batch.column("id_a").to_pylist()
            id_b = batch.column("id_b").to_pylist()
            sims = []
            for x, y in zip(id_a, id_b):
                a = self.sh.get(x, self.empty)
                b = self.sh.get(y, self.empty)
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

    # fixed pool: the autoscaler adds ~1 actor/1.3 s and the pair side
    # is small — a small fixed pool starts immediately
    return pairs.map_batches(Verify, batch_format="pyarrow",
                             concurrency=concurrency)


def keep_canonical(docs: "ray.data.Dataset", pairs: "ray.data.Dataset",
                   *, id_col: str = "doc_id") -> "ray.data.Dataset":
    """Near-duplicate REMOVAL: collapse the verified pair graph into
    connected components and keep only each component's min-id row.

    The pair list is the SMALL side by contract (near-dup edges, not
    the corpus): ids are gathered to the driver, components resolved
    with a min-root union-find, and only the DROP-id set (bounded by
    the duplicate count) is broadcast for a vectorized filter — corpus
    rows never leave the workers. At 10^9+ edges, swap in
    :func:`components_by_label_propagation` below — the distributed
    min-label fixpoint where the driver never holds nodes or edges —
    and derive the drop set as ``label != node`` rows."""
    edge_parts = [(b.column("id_a").to_pylist(),
                   b.column("id_b").to_pylist())
                  for b in pairs.iter_batches(batch_format="pyarrow",
                                              batch_size=None)]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for aa, bb in edge_parts:
        for a, b in zip(aa, bb):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    drop = np.sort(np.fromiter(
        (x for x in parent if find(x) != x), dtype=np.int64))
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        dropped = cached_get(drop_ref)
        if len(dropped) == 0:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dropped, ids)
        pos[pos >= len(dropped)] = 0
        return batch.filter(pa.array(dropped[pos] != ids))

    return docs.map_batches(keep, batch_format="pyarrow")


# --- SimHash ------------------------------------------------------------


_SH_SHIFTS = np.arange(64, dtype=np.uint64)
_SH_POWERS = np.uint64(1) << _SH_SHIFTS


def _simhash_many(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit SimHash over whitespace tokens for a whole
    batch: ONE :func:`hash_strings64` call over the flattened token
    list, then a per-doc segmented bit-vote via ``np.add.reduceat`` —
    no per-document Python hashing."""
    toks = [t.split() if t else [] for t in texts]
    counts = np.array([len(t) for t in toks], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    nz = np.nonzero(counts)[0]
    if nz.size == 0:
        return out
    h = hash_strings64([w for i in nz for w in toks[i]])
    bits = ((h[:, None] >> _SH_SHIFTS[None, :]) & np.uint64(1))
    starts = np.concatenate(([0], np.cumsum(counts[nz])))[:-1]
    sums = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
    votes = sums * 2 - counts[nz][:, None]
    out[nz] = ((votes > 0).astype(np.uint64) * _SH_POWERS[None, :]).sum(
        axis=1, dtype=np.uint64)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash of one document (token siphash + bit voting)."""
    return int(_simhash_many([text])[0])


def simhash_batch(batch: pa.Table) -> pa.Table:
    hashes = _simhash_many(batch.column("text").to_pylist())
    signed = hashes.view(np.int64)  # two's-complement reinterpret
    cols = {"doc_id": batch.column("doc_id"),
            "simhash": pa.array(signed, pa.int64())}
    # 4 x 16-bit bands for hamming-distance<=3 candidate search
    for bi in range(4):
        cols[f"sh_band{bi}"] = pa.array(
            ((hashes >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(
                np.int32), pa.int32())
    return pa.table(cols)


def _simhash_band_rows(batch: pa.Table) -> pa.Table:
    """Explode each doc into 4 (band, band_val) bucket rows so candidate
    search is ONE grouped aggregate instead of four all-to-all barriers.
    Pure numpy tile/repeat — no per-row loop."""
    n = batch.num_rows
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    signed = batch.column("simhash").to_numpy(zero_copy_only=False)
    u = signed.view(np.uint64)
    vals = np.stack([((u >> np.uint64(16 * bi)) & np.uint64(0xFFFF))
                     for bi in range(4)], axis=1).astype(np.int32)
    return pa.table({
        "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
        "band_val": pa.array(vals.reshape(-1)),
        "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
        "simhash": pa.array(np.repeat(signed, 4), pa.int64()),
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

    # ONE all-to-all over tiny (band, band_val, id, hash) rows, then
    # vectorized pair generation over whole batches of buckets.
    buckets = banded.groupby(["band", "band_val"]).aggregate(
        collect_columns_agg(["doc_id", "simhash"], "rows"))
    pairs = buckets.map_batches(pair_rows, batch_format="pyarrow")
    return _distinct_pairs(pairs, cols=("id_a", "id_b", "hamming"))


def components_by_label_propagation(pairs: "ray.data.Dataset",
                                    *, max_iters: int = 64,
                                    join_parts: int = 4
                                    ) -> "ray.data.Dataset":
    """DISTRIBUTED connected components — the at-scale path
    ``keep_canonical``'s docstring promises for 10^9+ edge graphs,
    implemented: iterative MIN-LABEL PROPAGATION with POINTER JUMPING,
    where the driver never holds nodes or edges, only one scalar per
    round.

    state: ``labels(node, label)`` initialised to node id (from the
    symmetrised edge list, one dedupe groupby). Each round:

    1. propagate: edges JOIN labels on src -> (dst, src_label) offers —
       every edge offers its source's current label to its target
       (edges pre-symmetrised, so both directions flow);
    2. contract: UNION offers with current labels ->
       ``groupby(node).min`` — one exchange, O(1)-state aggregate;
    3. jump: labels JOIN labels (my label's label) — pointer doubling,
       sound because labels only ever take node-id values and only
       decrease; this turns O(diameter) rounds into O(log diameter);
    4. converge: labels are integer and STRICTLY decrease somewhere
       until fixpoint, so ``sum(label)`` is a monotone potential — one
       cheap scalar aggregate per round, no comparison join.

    Returns ``(node, label)`` with label = component min id —
    pytest-pinned equal to the driver union-find on random graphs
    including a long chain (forces multiple jump rounds)."""

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").cast(pa.int64())
        b = batch.column("id_b").cast(pa.int64())
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(),
                                     b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(),
                                     a.combine_chunks()]),
        })

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    labels = edges.map_batches(
        lambda t: pa.table({"node": t.column("src"),
                            "label": t.column("src")}),
        batch_format="pyarrow").groupby("node").aggregate(
        ray.data.aggregate.Min("label")).map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.int64()),
                            "label": t.column("min(label)").cast(
                                pa.int64())}),
        batch_format="pyarrow").materialize()

    prev_potential = labels.sum("label")
    for _ in range(max_iters):
        offers = edges.join(labels, join_type="inner",
                            num_partitions=join_parts,
                            on=("src",), right_on=("node",)).map_batches(
            lambda t: pa.table({
                "node": t.column("dst").cast(pa.int64()),
                "label": t.column("label").cast(pa.int64())}),
            batch_format="pyarrow")
        contracted = labels.union(offers).groupby("node").aggregate(
            ray.data.aggregate.Min("label")).map_batches(
            lambda t: pa.table({
                "node": t.column("node").cast(pa.int64()),
                "label": t.column("min(label)").cast(pa.int64())}),
            batch_format="pyarrow").materialize()
        # pointer jump: follow my label to ITS label (labels are node
        # ids, so the inner self-join is total)
        jump_src = contracted.map_batches(
            lambda t: t.rename_columns(["n2", "l2"]),
            batch_format="pyarrow")
        labels = contracted.join(
            jump_src, join_type="inner", num_partitions=join_parts,
            on=("label",), right_on=("n2",)).map_batches(
            lambda t: pa.table({
                "node": t.column("node").cast(pa.int64()),
                "label": t.column("l2").cast(pa.int64())}),
            batch_format="pyarrow").materialize()
        potential = labels.sum("label")
        if potential == prev_potential:
            break
        prev_potential = potential
    else:
        # Exhausting max_iters without hitting the fixpoint means the
        # labels are only partially propagated — downstream would turn
        # that into a silently wrong keep/drop set. Fail loudly: with
        # pointer jumping, rounds ~ log2(diameter), so 64 covers any
        # graph that fits in a cluster; hitting this indicates a bug
        # or an absurd max_iters override.
        raise RuntimeError(
            f"components_by_label_propagation did not converge in "
            f"{max_iters} iterations (potential still decreasing)")
    return labels


# --- paragraph (sub-document chunk) dedup --------------------------------

# winner key packs (doc_id, chunk_idx) into one int64 so the first
# occurrence under (doc_id ASC, idx ASC) order is a plain Min aggregate.
_CHUNK_IDX_CAP = 1 << 20


def _doc_chunks(text: str | None, chunk_tokens: int) -> list[str]:
    """Fixed-size token windows over ``text.split(' ')`` — the corpus
    has no paragraph separators, so the "paragraph" unit is a
    ``chunk_tokens``-token window (last window may be shorter). Matches
    DuckDB ``array_to_string(toks[i*n+1 : i*n+n], ' ')`` exactly."""
    toks = (text or "").split(" ")
    return [" ".join(toks[i:i + chunk_tokens])
            for i in range(0, len(toks), chunk_tokens)]


def _chunk_fp64(chunks: list[str]) -> np.ndarray:
    """int64 content fingerprint per chunk (md5 low 8 bytes). A 64-bit
    collision mis-classifies two distinct chunks as duplicates with
    ~n^2/2^65 probability — negligible even at 10^12 chunks, same
    trade the exact-dedup family documents."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(c.encode("utf-8")).digest()[:8],
                        "big", signed=True) for c in chunks),
        dtype=np.int64, count=len(chunks))


def _chunk_fp_rows(batch: pa.Table, *, text_col: str, id_col: str,
                   chunk_tokens: int) -> pa.Table:
    """Explode docs to INT-ONLY (fp, winner-key) rows — the aggregate
    exchange never carries chunk text."""
    fps: list[np.ndarray] = []
    keys: list[np.ndarray] = []
    for did, txt in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
        cs = _doc_chunks(txt, chunk_tokens)
        if len(cs) >= _CHUNK_IDX_CAP:
            raise ValueError(
                f"doc {did}: {len(cs)} chunks >= {_CHUNK_IDX_CAP}")
        fps.append(_chunk_fp64(cs))
        keys.append(np.int64(did) * _CHUNK_IDX_CAP
                    + np.arange(len(cs), dtype=np.int64))
    return pa.table({
        "_cfp": pa.array(np.concatenate(fps) if fps else
                         np.empty(0, np.int64)),
        "_ckey": pa.array(np.concatenate(keys) if keys else
                          np.empty(0, np.int64)),
    })


def paragraph_dedup(ds: "ray.data.Dataset", *, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 10,
                    num_partitions: int = 16,
                    broadcast_limit: int = 5_000_000
                    ) -> "ray.data.Dataset":
    """Corpus-wide SUB-document exact dedup (RefinedWeb/Falcon-style
    line dedup): every ``chunk_tokens``-token window that occurs more
    than once across the corpus is kept only at its first occurrence
    (smallest ``(doc_id, idx)``), every doc is reassembled from its
    surviving windows in order, and docs with no surviving window are
    dropped entirely.

    Scale shape (the reason this is not exact_dedup on exploded rows):

    1. one PURE aggregate exchange over int-only ``(fp, key)`` rows —
       ``groupby(_cfp).aggregate(Min(_ckey))``; chunk TEXT never rides
       this shuffle, and per-group state is one int64.
    2. winner application is size-adaptive. Below ``broadcast_limit``
       distinct chunks, the ``fp -> winner key`` map is broadcast once
       (``ray.put`` + per-worker cache) and each doc is re-chunked and
       reassembled LOCALLY inside one ``map_batches`` — zero further
       exchanges, corpus text never shuffles at all. Above it, the
       exploded rows ``left_semi``-join the winner keys and docs are
       reassembled by a ``groupby(doc_id).map_groups`` ordered concat
       (two corpus-volume exchanges — the standard price once the
       distinct-chunk set outgrows worker heaps).

    Requires ``id_col >= 0`` (the packed winner key orders by
    ``doc_id * CAP + idx``).
    """
    fp_rows = ds.map_batches(
        _chunk_fp_rows, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col,
                   "chunk_tokens": chunk_tokens})
    winners = fp_rows.groupby("_cfp").aggregate(
        ray.data.aggregate.Min("_ckey")).materialize()

    if winners.count() <= broadcast_limit:
        win_map: dict[int, int] = {}
        for b in winners.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
            win_map.update(zip(
                (int(x) for x in b.column("_cfp").to_pylist()),
                (int(x) for x in b.column("min(_ckey)").to_pylist())))
        map_ref = ray.put(win_map)

        def rebuild(batch: pa.Table) -> pa.Table:
            wm = cached_get(map_ref)
            out_ids, out_txt, out_n, out_kept = [], [], [], []
            for did, txt in zip(batch.column(id_col).to_pylist(),
                                batch.column(text_col).to_pylist()):
                cs = _doc_chunks(txt, chunk_tokens)
                fps = _chunk_fp64(cs)
                base = int(did) * _CHUNK_IDX_CAP
                kept = [c for i, (c, f) in enumerate(zip(cs, fps))
                        if wm.get(int(f)) == base + i]
                if kept:
                    out_ids.append(did)
                    out_txt.append(" ".join(kept))
                    out_n.append(len(cs))
                    out_kept.append(len(kept))
            return pa.table({
                id_col: pa.array(out_ids, pa.int64()),
                "text_clean": pa.array(out_txt, pa.string()),
                "n_chunks": pa.array(out_n, pa.int64()),
                "n_kept": pa.array(out_kept, pa.int64()),
            })

        return ds.map_batches(rebuild, batch_format="pyarrow")

    # join path: explode WITH text, semi-join the winner keys, then an
    # ordered per-doc reassembly. Used when the distinct-chunk set is
    # too large to broadcast; shuffles corpus text twice by necessity.
    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, chunks, fps, keys, totals = [], [], [], [], [], []
        for did, txt in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            cs = _doc_chunks(txt, chunk_tokens)
            f = _chunk_fp64(cs)
            for i, c in enumerate(cs):
                ids.append(did); idxs.append(i); chunks.append(c)
                fps.append(int(f[i]))
                keys.append(int(did) * _CHUNK_IDX_CAP + i)
                totals.append(len(cs))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "_idx": pa.array(idxs, pa.int64()),
            "_chunk": pa.array(chunks, pa.string()),
            "_cfp": pa.array(fps, pa.int64()),
            "_ckey": pa.array(keys, pa.int64()),
            "_total": pa.array(totals, pa.int64()),
        })

    def winner_keys(batch: pa.Table) -> pa.Table:
        return pa.table({"_cfp": batch.column("_cfp"),
                         "_ckey": batch.column("min(_ckey)")})

    kept_rows = ds.map_batches(explode, batch_format="pyarrow").join(
        winners.map_batches(winner_keys, batch_format="pyarrow"),
        join_type="left_semi", num_partitions=num_partitions,
        on=("_cfp", "_ckey"))

    def assemble(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("_idx"))
        g = group.take(order)
        return pa.table({
            id_col: pa.array([g.column(id_col)[0].as_py()], pa.int64()),
            "text_clean": pa.array(
                [" ".join(g.column("_chunk").to_pylist())], pa.string()),
            "n_chunks": pa.array([g.column("_total")[0].as_py()],
                                 pa.int64()),
            "n_kept": pa.array([g.num_rows], pa.int64()),
        })

    return kept_rows.groupby(id_col).map_groups(
        assemble, batch_format="pyarrow")

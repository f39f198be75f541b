"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put`` and each ``map_batches`` call computes a numpy matmul
against its batch, emitting only per-batch partial top-k rows (Q x k);
the final exact top-k is a tiny groupby over partials. No stage ever
gathers the full embedding table to one place.

Scale path: random-hyperplane LSH bucketing — vectors are assigned
sign-bit bucket codes in ``map_batches``; queries probe only their own
bucket (plus Hamming-1 neighbors), turning the all-pairs matmul into a
per-bucket one. Deterministic (fixed-seed hyperplanes).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .broadcast import cached_get


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        # reshape(0, -1) cannot infer a width — return an explicit
        # (0, d) so empty query grabs (e.g. absent query ids) flow
        # through matmuls instead of crashing
        d = (arr.type.list_size
             if pa.types.is_fixed_size_list(arr.type) else 0)
        return np.zeros((0, d), np.float64)
    # list<float> -> (n, dim) float64
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _empty_knn_table() -> pa.Table:
    return pa.table({
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
        "cosine_sim": pa.array([], pa.float64()),
    })


def knn_cosine_brute(embeddings: "ray.data.Dataset",
                     query_ids: list[int],
                     k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k of every dataset vector for each query id.

    Returns an arrow table (query_id, neighbor_id, rank, cosine_sim)
    ordered by (query_id, rank); ties broken by neighbor_id ascending
    (deterministic)."""
    # fetch the query vectors (tiny: len(query_ids) rows)
    qset = set(query_ids)

    def grab_queries(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        mask = pa.array([i in qset for i in ids])
        return batch.filter(mask)

    qparts = list(embeddings.map_batches(
        grab_queries, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    if not qparts or sum(t.num_rows for t in qparts) == 0:
        return _empty_knn_table()          # no query id present
    qtab = pa.concat_tables(qparts)
    q_ids = qtab.column(id_col).to_pylist()
    qmat = _batch_matrix(qtab, vec_col)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0
    queries_ref = ray.put((q_ids, qmat, qnorm))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids_l, qm, qn = cached_get(queries_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _batch_matrix(batch, vec_col)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (qm @ mat.T) / qn[:, None] / norms[None, :]  # (Q, n)
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi, qid in enumerate(q_ids_l):
            row = sims[qi]
            # deterministic partial top-k: sort by (-sim, id)
            idx = np.lexsort((ids, -row))[:kk]
            for j in idx:
                if exclude_self and ids[j] == qid:
                    continue
                out_q.append(qid)
                out_n.append(int(ids[j]))
                out_s.append(float(row[j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine_sim": pa.array(out_s, pa.float64()),
        })

    partials = embeddings.map_batches(partial_topk, batch_format="pyarrow")
    # final exact top-k over the (tiny) partial set, driver-side —
    # numpy lexsort + run-bounds rank (no pandas round-trip)
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    t = pa.concat_tables(parts) if parts else pa.table({
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "cosine_sim": pa.array([], pa.float64())})
    qs = t.column("query_id").to_numpy(zero_copy_only=False)
    ns = t.column("neighbor_id").to_numpy(zero_copy_only=False)
    ss = t.column("cosine_sim").to_numpy(zero_copy_only=False)
    order = np.lexsort((ns, -ss, qs))
    qs, ns, ss = qs[order], ns[order], ss[order]
    if len(qs):
        change = qs[1:] != qs[:-1]
        starts = np.nonzero(np.concatenate(([True], change)))[0]
        run_id = np.cumsum(np.concatenate(([0], change)))
        rank = np.arange(len(qs)) - starts[run_id]
        m = rank < k
        qs, ns, ss, rank = qs[m], ns[m], ss[m], rank[m] + 1
    else:
        rank = np.zeros(0, np.int64)
    return pa.table({
        "query_id": pa.array(qs, pa.int64()),
        "neighbor_id": pa.array(ns, pa.int64()),
        "rank": pa.array(rank, pa.int64()),
        "cosine_sim": pa.array(ss, pa.float64()),
    })


# --- LSH-bucketed variant (scale path) ---------------------------------


def _hyperplanes(dim: int, n_bits: int, n_tables: int) -> np.ndarray:
    """(n_tables, n_bits, dim) fixed-seed Gaussian hyperplanes."""
    rng = np.random.RandomState(42)
    return rng.randn(n_tables, n_bits, dim)


def _codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket codes: (n, n_tables) int64."""
    n_tables, n_bits, _ = planes.shape
    # (n, n_tables*n_bits) in one matmul, then pack bits per table
    bits = (mat @ planes.reshape(n_tables * n_bits, -1).T) >= 0
    bits = bits.reshape(len(mat), n_tables, n_bits)
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    return bits.astype(np.int64) @ weights  # (n, n_tables)


def lsh_bucket_batch(batch: pa.Table, *, planes: np.ndarray,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> pa.Table:
    """Attach per-table LSH bucket codes as bucket_0..bucket_{L-1}."""
    mat = _batch_matrix(batch, vec_col)
    codes = _codes(mat, planes)
    cols = {id_col: batch.column(id_col), vec_col: batch.column(vec_col)}
    for t in range(planes.shape[0]):
        cols[f"bucket_{t}"] = pa.array(codes[:, t], pa.int64())
    return pa.table(cols)


def knn_cosine_lsh(embeddings: "ray.data.Dataset",
                   query_ids: list[int], k: int = 5, n_bits: int = 8,
                   n_tables: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dim: Optional[int] = None) -> pa.Table:
    """Approximate top-k via multi-table random-hyperplane LSH: a vector
    is a candidate if it collides with the query (bucket or Hamming-1
    neighbor bucket) in ANY of the L independent tables — the standard
    amplification that single-table sign-LSH lacks. Candidates then go
    through the exact partial-top-k path. Same output schema as the
    brute-force baseline (recall measured against it in tests)."""
    if dim is None:
        first = embeddings.take(1)[0]
        dim = len(first[vec_col])
    planes = _hyperplanes(dim, n_bits, n_tables)
    bucketed = embeddings.map_batches(
        lsh_bucket_batch, batch_format="pyarrow",
        fn_kwargs=dict(planes=planes, id_col=id_col, vec_col=vec_col))

    qset = set(query_ids)

    def grab(batch: pa.Table) -> pa.Table:
        mask = pa.array([i in qset for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    # Query codes are computed LOCALLY from the grabbed query vectors
    # with the same fixed planes — one cheap scan of the raw embeddings
    # instead of a second full bucketing pass over the whole table.
    qparts = list(embeddings.map_batches(
        grab, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    if not qparts or sum(t.num_rows for t in qparts) == 0:
        return _empty_knn_table()          # no query id present
    qrows = pa.concat_tables(qparts)
    qcodes = _codes(_batch_matrix(qrows, vec_col), planes)  # (Q, L)
    # Per-table probe sets: query code plus Hamming-1 neighbors. Tiny
    # (Q * L * (n_bits+1) ints) — shipped in the task closure.
    probes: list[pa.Array] = []
    for t in range(n_tables):
        pset: set[int] = set()
        for code in qcodes[:, t].tolist():
            pset.add(code)
            for b in range(n_bits):
                pset.add(code ^ (1 << b))
        probes.append(pa.array(sorted(pset), pa.int64()))

    def in_probe(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("bucket_0"), value_set=probes[0])
        for t in range(1, n_tables):
            mask = pc.or_(mask, pc.is_in(batch.column(f"bucket_{t}"),
                                         value_set=probes[t]))
        return batch.filter(mask)

    candidates = bucketed.map_batches(in_probe, batch_format="pyarrow")
    return knn_cosine_brute(candidates, query_ids, k=k,
                            id_col=id_col, vec_col=vec_col)


def embedding_near_dup_pairs(embeddings: "ray.data.Dataset",
                             threshold: float = 0.8,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_bits: int = 10,
                             n_tables: int = 8) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, rounded
    cosine >= threshold) — LSH-bucketed end to end; the full embedding
    table is never materialized anywhere:

    1. sign-LSH bucket codes per table are attached in ``map_batches``
       (same fixed-seed hyperplanes as :func:`knn_cosine_lsh`);
    2. candidate pairs come from ONE grouped aggregate over tiny
       ``(table, code, id)`` rows — exact duplicates share every code,
       so recall is 1.0 for identical vectors and
       ``1-(1-p^n_bits)^n_tables`` for near ones (0.97 at cos 0.95 with
       the 10x8 default); size ``n_bits ~ log2(N / target_bucket)`` so
       per-bucket pair counts stay bounded as N grows;
    3. candidate pairs are verified by a distributed semi-join: only the
       candidate-doc VECTOR subset (bounded by candidate count) is
       broadcast, and per-pair cosines are a vectorized gather+einsum
       over the pair Dataset."""
    from .dedup import _collect_ids_agg, collect_candidate_ids

    first = embeddings.take(1)
    if not first:
        return pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                          ("cosine_sim", pa.float64())]).empty_table()
    dim = len(first[0][vec_col])
    planes = _hyperplanes(dim, n_bits, n_tables)
    bucketed = embeddings.map_batches(
        lsh_bucket_batch, batch_format="pyarrow",
        fn_kwargs=dict(planes=planes, id_col=id_col, vec_col=vec_col))

    def band_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        codes = np.stack([
            batch.column(f"bucket_{t}").to_numpy(zero_copy_only=False)
            for t in range(n_tables)], axis=1)
        return pa.table({
            "band": pa.array(np.tile(np.arange(n_tables, dtype=np.int32),
                                     n)),
            "band_key": pa.array(codes.reshape(-1), pa.int64()),
            id_col: pa.array(np.repeat(ids, n_tables), pa.int64()),
        })

    buckets = bucketed.map_batches(
        band_rows, batch_format="pyarrow").groupby(
        ["band", "band_key"]).aggregate(_collect_ids_agg(id_col))

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

    # pairs are consumed twice (id gather + verification): materialize
    # the SMALL side once so the bucketing pipeline runs exactly once.
    # Cross-table duplicate pairs are NOT shuffled away here — verifying
    # a duplicate costs one vectorized dot, far less than an extra
    # all-to-all over every candidate pair; the tiny surviving table is
    # deduped at the end instead.
    pairs = buckets.map_batches(
        bucket_pairs, batch_format="pyarrow").materialize()

    # semi-join fetch: only candidate-doc vectors are collected/broadcast
    cand_ids = collect_candidate_ids(pairs)
    ids_ref = ray.put(cand_ids)

    def grab_cands(batch: pa.Table) -> pa.Table:
        want = cached_get(ids_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, want)))

    sub_parts = list(embeddings.select_columns([id_col, vec_col])
                     .map_batches(grab_cands, batch_format="pyarrow")
                     .iter_batches(batch_format="pyarrow",
                                   batch_size=None))
    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("cosine_sim", pa.float64())])
    if not sub_parts:
        return out_schema.empty_table()
    sub = pa.concat_tables(sub_parts)
    sub_ids = sub.column(id_col).to_numpy(zero_copy_only=False)
    order = np.argsort(sub_ids)
    sub_ids = sub_ids[order]
    sub_unit = _unit_rows(_batch_matrix(sub, vec_col)[order])
    sub_ref = ray.put((sub_ids, sub_unit))

    def verify(batch: pa.Table) -> pa.Table:
        ids_sorted, unit = cached_get(sub_ref)
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        va = unit[np.searchsorted(ids_sorted, a)]
        vb = unit[np.searchsorted(ids_sorted, b)]
        sims = np.round(np.einsum("ij,ij->i", va, vb), 4)
        keep = sims >= threshold
        return pa.table({
            "id_a": pa.array(a[keep], pa.int64()),
            "id_b": pa.array(b[keep], pa.int64()),
            "cosine_sim": pa.array(sims[keep], pa.float64()),
        })

    batches = list(pairs.map_batches(
        verify, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    if not batches:
        return out_schema.empty_table()
    out = pa.concat_tables(batches)
    # drop cross-table duplicate pairs (identical verified values) and
    # order deterministically — the surviving table is the small side;
    # numpy lexsort + adjacent-unique (no pandas round-trip)
    a = out.column("id_a").to_numpy(zero_copy_only=False)
    b = out.column("id_b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    return out.take(pa.array(order[first])).cast(out_schema)


# --- IVF variant (coarse-quantizer scale path) --------------------------


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def train_ivf_centroids(embeddings: "ray.data.Dataset",
                        n_clusters: int = 16, n_iters: int = 3,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """Deterministic distributed spherical k-means: init = the vectors
    with the ``n_clusters`` smallest ids; each Lloyd iteration is one
    map_batches pass emitting per-cluster partial (sum, count) — only
    (n_clusters x dim) floats ever reach the driver."""

    def grab_init(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist())
        order = np.argsort(ids)[:n_clusters]
        return batch.take(pa.array(order))

    first = pa.concat_tables(
        tb for tb in embeddings.map_batches(
            grab_init, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None))
    ids = np.asarray(first.column(id_col).to_pylist())
    init = _batch_matrix(first, vec_col)[np.argsort(ids)[:n_clusters]]
    centroids = _unit_rows(init)

    for _ in range(n_iters):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = cached_get(cref)
            u = _unit_rows(_batch_matrix(batch, vec_col))
            assign = np.argmax(u @ c.T, axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, u)
            np.add.at(counts, assign, 1)
            return pa.table({
                "cluster": pa.array(np.arange(len(c)), pa.int32()),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "count": pa.array(counts, pa.int64()),
            })

        parts = pa.concat_tables(
            tb for tb in embeddings.map_batches(
                partial, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None))
        dim = centroids.shape[1]
        sums = np.zeros((n_clusters, dim))
        counts = np.zeros(n_clusters, dtype=np.int64)
        for cl, vs, ct in zip(parts.column("cluster").to_pylist(),
                              parts.column("vsum").to_pylist(),
                              parts.column("count").to_pylist()):
            sums[cl] += np.asarray(vs)
            counts[cl] += ct
        nz = counts > 0
        centroids[nz] = _unit_rows(sums[nz] / counts[nz, None])
    return centroids


def knn_cosine_ivf(embeddings: "ray.data.Dataset",
                   query_ids: list[int], k: int = 5,
                   n_clusters: int = 16, n_probe: int = 4,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> pa.Table:
    """IVF approximate top-k: coarse spherical-k-means quantizer; each
    query probes its ``n_probe`` nearest centroids and brute-forces only
    those inverted lists. Same output schema as the exact baseline."""
    centroids = train_ivf_centroids(embeddings, n_clusters,
                                    id_col=id_col, vec_col=vec_col)
    cref = ray.put(centroids)

    qset = set(query_ids)

    def grab(batch: pa.Table) -> pa.Table:
        mask = pa.array([i in qset for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    qparts = list(embeddings.map_batches(
        grab, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None))
    if not qparts or sum(t.num_rows for t in qparts) == 0:
        return _empty_knn_table()          # no query id present
    qrows = pa.concat_tables(qparts)
    qu = _unit_rows(_batch_matrix(qrows, vec_col))
    probe: set[int] = set()
    for row in qu @ centroids.T:
        for cl in np.argsort(-row)[:n_probe]:
            probe.add(int(cl))
    probe_sorted = sorted(probe)

    def in_lists(batch: pa.Table) -> pa.Table:
        c = cached_get(cref)
        u = _unit_rows(_batch_matrix(batch, vec_col))
        assign = np.argmax(u @ c.T, axis=1)
        mask = np.isin(assign, probe_sorted)
        return batch.filter(pa.array(mask))

    candidates = embeddings.map_batches(in_lists, batch_format="pyarrow")
    return knn_cosine_brute(candidates, query_ids, k=k,
                            id_col=id_col, vec_col=vec_col)


# --- SemDedup: cluster-then-prune semantic dedup -------------------------


def semdedup(embeddings: "ray.data.Dataset", *, threshold: float = 0.95,
             n_clusters: int = 16, id_col: str = "vec_id",
             vec_col: str = "embedding") -> "ray.data.Dataset":
    """SemDedup-style semantic dedup (Abbas et al. 2023, public): a
    coarse spherical k-means partitions the embedding space, then each
    cluster is pruned independently — a vector is DROPPED iff a
    smaller-id vector in the SAME cluster has cosine similarity >=
    ``threshold`` to it. Returns (id, cluster, keep) for every vector.

    Scale shape: the quantizer reuses ``train_ivf_centroids`` (only
    ``n_clusters x dim`` floats ever reach the driver); assignment is
    one broadcast-matmul ``map_batches``; pruning is one
    ``groupby(cluster).map_groups`` whose per-group cost is the paper's
    own within-cluster pairwise pass (O(c^2) on cluster size c — at
    100 TB size the clusters via ``n_clusters ~ N / target_c``, and a
    skewed hot cluster is split by re-running k-means inside it; both
    knobs are the published practice, noted here as the partitioning
    assumption). Deterministic: fixed init, min-id keep rule."""
    centroids = train_ivf_centroids(embeddings, n_clusters,
                                    id_col=id_col, vec_col=vec_col)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = cached_get(cref)
        u = _unit_rows(_batch_matrix(batch, vec_col))
        cl = np.argmax(u @ c.T, axis=1).astype(np.int32)
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(cl),
            "_unit": pa.array(list(u), pa.list_(pa.float64())),
        })

    def prune(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col).to_pylist(), np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        u = np.asarray(group.column("_unit").to_pylist(),
                       np.float64)[order]
        sims = u @ u.T
        # keep[i] == no kept j<i with sims[j,i] >= threshold; the
        # GREEDY rule (vs "any j<i") matches the paper's sequential
        # sweep and is what the pytest oracle pins.
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        for i in range(1, n):
            if np.any(sims[:i, i][keep[:i]] >= threshold):
                keep[i] = False
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": pa.array(
                np.repeat(group.column("cluster")[0].as_py(), n),
                pa.int32()),
            "keep": pa.array(keep),
        })

    return embeddings.map_batches(
        assign, batch_format="pyarrow").groupby("cluster").map_groups(
        prune, batch_format="pyarrow")


def scalar_quantize(embeddings: "ray.data.Dataset",
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    scale: int = 100_000,
                    levels: int = 255) -> "ray.data.Dataset":
    """Per-dimension int8-style scalar quantization (the vector-index
    compression step: FAISS ``SQ8`` / Milvus SQ): each component is
    mapped to ``floor((v - min_d) * levels / (max_d - min_d))`` with
    the min/max taken over the WHOLE corpus per dimension.

    Bit-exact by fixed-point: components become ``floor(v*scale + 0.5)``
    int64 first (identical in numpy and SQL), so the quantization is a
    pure INTEGER floor-division — no float sums or divisions anywhere.

    Two bounded exchanges, both independent of corpus size:

    1. per-block (pos, mn, mx) partials — ONE row per dimension per
       block — then ``groupby(pos).aggregate(Min, Max)``: the exchange
       moves ``dim x n_blocks`` int64 rows;
    2. the dim-row (mn, mx) table broadcasts via ``ray.put`` and the
       quantize pass is pure map-side, emitting long-format
       ``(id, pos, q)`` rows (a production sink would keep
       ``fixed_size_list<int8>``; long format here for exact SQL
       comparability).

    Constant dimensions (mx == mn) quantize to 0.
    """
    def fixpoint(mat: np.ndarray) -> np.ndarray:
        return np.floor(mat * float(scale) + 0.5).astype(np.int64)

    def minmax_partial(batch: pa.Table) -> pa.Table:
        iv = fixpoint(_batch_matrix(batch, vec_col))
        if iv.size == 0:
            return pa.table({"pos": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "pos": pa.array(np.arange(iv.shape[1], dtype=np.int64)),
            "mn": pa.array(iv.min(axis=0)),
            "mx": pa.array(iv.max(axis=0))})

    bounds = embeddings.map_batches(
        minmax_partial, batch_format="pyarrow").groupby("pos").aggregate(
        ray.data.aggregate.Min("mn"), ray.data.aggregate.Max("mx")
    ).take_all()
    bounds.sort(key=lambda r: r["pos"])
    mn = np.asarray([r["min(mn)"] for r in bounds], np.int64)
    mx = np.asarray([r["max(mx)"] for r in bounds], np.int64)
    span = np.maximum(mx - mn, 1)         # constant dims -> q = 0
    bref = ray.put((mn, span))

    def quantize(batch: pa.Table) -> pa.Table:
        lo, sp = cached_get(bref)
        iv = fixpoint(_batch_matrix(batch, vec_col))
        n, dim = iv.shape if iv.size else (0, len(lo))
        q = ((iv - lo) * levels) // sp if n else \
            np.zeros((0, dim), np.int64)
        ids = np.repeat(
            batch.column(id_col).to_numpy(zero_copy_only=False), dim)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "pos": pa.array(np.tile(np.arange(dim, dtype=np.int64), n)),
            "q": pa.array(q.reshape(-1), pa.int64())})

    return embeddings.map_batches(quantize, batch_format="pyarrow")


def embedding_cov(embeddings: "ray.data.Dataset",
                  vec_col: str = "embedding",
                  scale: int = 10_000) -> pa.Table:
    """Corpus feature covariance over the embedding column — the
    second-moment pass PCA / whitening / ZCA preprocessing runs before
    training. Returns the upper triangle as ``(pos_i, pos_j, cov)``
    with population covariance ``(n*Sij - Si*Sj) / n^2``.

    Bit-exact: components become ``floor(v*scale + 0.5)`` int64 first,
    so every moment is an exact INTEGER sum — per block ONE numpy
    int64 matmul (``iv.T @ iv``) emits (pos_i, pos_j, s) partial rows
    for the upper triangle plus first-moment and count rows; a single
    ``groupby.sum`` exchange (map-side combined, **bounded by
    dim^2/2 + dim + 1 rows** regardless of corpus size) merges them;
    the driver combines Python ints (arbitrary precision) and mirrors
    the SQL's CAST-to-DOUBLE-then-divide exactly.

    Overflow bound: per-pair sums stay in int64 while
    ``n * (scale*|v|_max)^2 < 2^63`` — at scale 1e4 and |v| <= 3 that
    is ~10^10 rows; beyond that lower ``scale`` or shard the corpus
    into row ranges and merge the (exact-int) partials driver-side.
    """
    def partial(batch: pa.Table) -> pa.Table:
        iv = np.floor(_batch_matrix(batch, vec_col)
                      * float(scale) + 0.5).astype(np.int64)
        n, d = iv.shape if iv.size else (0, 0)
        if n == 0:
            return pa.table({"pos_i": pa.array([], pa.int64()),
                             "pos_j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        prod = iv.T @ iv                      # (d, d) exact int64
        ii, jj = np.triu_indices(d)
        pos_i = np.concatenate(
            [ii, np.arange(d, dtype=np.int64), [-1]])
        pos_j = np.concatenate(
            [jj, np.full(d, -1, np.int64), [-1]])
        s = np.concatenate(
            [prod[ii, jj], iv.sum(axis=0), [n]])
        return pa.table({"pos_i": pa.array(pos_i, pa.int64()),
                         "pos_j": pa.array(pos_j, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    merged = embeddings.map_batches(
        partial, batch_format="pyarrow").groupby(
        ["pos_i", "pos_j"]).aggregate(
        ray.data.aggregate.Sum("s")).take_all()

    n = 0
    first: dict[int, int] = {}
    second: dict[tuple[int, int], int] = {}
    for r in merged:
        i, j, s = int(r["pos_i"]), int(r["pos_j"]), int(r["sum(s)"])
        if i == -1:
            n = s
        elif j == -1:
            first[i] = s
        else:
            second[(i, j)] = s
    out_i: list[int] = []
    out_j: list[int] = []
    out_c: list[float] = []
    for (i, j) in sorted(second):
        num = n * second[(i, j)] - first[i] * first[j]  # exact ints
        # mirror SQL: CAST(num AS DOUBLE) / CAST(n*n AS DOUBLE)
        out_i.append(i)
        out_j.append(j)
        out_c.append(float(num) / float(n * n))
    return pa.table({"pos_i": pa.array(out_i, pa.int64()),
                     "pos_j": pa.array(out_j, pa.int64()),
                     "cov": pa.array(out_c, pa.float64())})

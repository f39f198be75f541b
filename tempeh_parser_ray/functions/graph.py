"""Distributed graph operators — PageRank over an edge Dataset.

Web-scale curation ranks pages/domains by link centrality (OPIC /
PageRank-style scores are standard crawl-priority and quality signals,
e.g. Common Crawl's domain ranks). The operator here is power
iteration over an EDGE Dataset:

    rank'(v) = (1 - d) / N + d * sum_{u->v} rank(u) / outdeg(u)

(dangling mass is dropped, i.e. the pure link-matrix variant; the
synthetic graphs used by the catalog have no dangling nodes, and the
oracle pins the same formula).

Scale shape: edges never leave their blocks; out-degrees are computed
ONCE by a distributed groupby; each iteration is one edge pass + one
``groupby(dst).sum``. The per-iteration rank table is |nodes| rows —
SIZE-ADAPTIVE like every small side in this engine: below
``broadcast_limit`` it rides ``ray.put`` as two sorted numpy arrays
(searchsorted lookup per batch, O(log N) per edge), above it the
lookup becomes a distributed hash join on ``src`` and the driver never
holds a rank vector. Iteration count is fixed (power iteration; the
catalog uses 5), so the driver loop holds only iteration indices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .broadcast import cached_get

DEFAULT_BROADCAST_LIMIT = 5_000_000


def _collect_two_cols(ds: "ray.data.Dataset", a: str, b: str
                      ) -> tuple[np.ndarray, np.ndarray]:
    t = pa.concat_tables(list(ds.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    return (t.column(a).to_numpy(zero_copy_only=False).astype(np.int64),
            t.column(b).to_numpy(zero_copy_only=False))


def pagerank(edges: "ray.data.Dataset", *, damping: float = 0.85,
             n_iters: int = 5,
             broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
             join_parts: int = 8) -> "ray.data.Dataset":
    """``edges`` = Dataset of (src:int64, dst:int64[, weight:int64]);
    parallel edges act as weights (or pass ``weight``). Returns a
    Dataset of (node, rank) with ranks from ``n_iters`` power
    iterations starting uniform. See module docstring for the scale
    contract of each path."""
    if "weight" in edges.schema().names:
        w_edges = edges.map_batches(
            lambda b: b.select(["src", "dst", "weight"]),
            batch_format="pyarrow")
    else:
        w_edges = edges.map_batches(
            lambda b: pa.table({
                "src": b.column("src").cast(pa.int64()),
                "dst": b.column("dst").cast(pa.int64()),
                "weight": pa.array(np.ones(len(b), np.int64)),
            }), batch_format="pyarrow")
    w_edges = w_edges.materialize()  # consumed once per iteration

    # weighted out-degree per src; node universe = src ∪ dst
    outdeg = w_edges.groupby("src").aggregate(
        ray.data.aggregate.Sum("weight"))

    def node_rows(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            batch.column("src").to_numpy(zero_copy_only=False),
            batch.column("dst").to_numpy(zero_copy_only=False),
        ]).astype(np.int64))
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes = w_edges.map_batches(
        node_rows, batch_format="pyarrow").groupby("node").aggregate(
        ray.data.aggregate.Count()).materialize()  # multi-consumer
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    small = n_nodes <= broadcast_limit
    if small:
        deg_n, deg_v = _collect_two_cols(outdeg, "src", "sum(weight)")
        # searchsorted below requires key-sorted arrays — sort the
        # PAIR explicitly instead of relying on Ray's sort-based
        # aggregate happening to emit key-ordered blocks (hash-based
        # aggregation would silently misalign every degree lookup)
        deg_order = np.argsort(deg_n)
        deg_n, deg_v = deg_n[deg_order], deg_v[deg_order]
        deg_ref = ray.put((deg_n, deg_v.astype(np.float64)))
        node_ids = np.sort(_collect_two_cols(nodes, "node", "count()")[0])
        rank_ref = ray.put((node_ids,
                            np.full(len(node_ids), 1.0 / n_nodes)))

        for _ in range(n_iters):
            def contrib(batch: pa.Table, _r=rank_ref) -> pa.Table:
                rn, rv = cached_get(_r)
                dn, dv = cached_get(deg_ref)
                src = batch.column("src").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                w = batch.column("weight").to_numpy(
                    zero_copy_only=False).astype(np.float64)
                r = rv[np.searchsorted(rn, src)]
                d = dv[np.searchsorted(dn, src)]
                return pa.table({
                    "dst": batch.column("dst"),
                    "c": pa.array(r * w / d, pa.float64()),
                })

            sums = w_edges.map_batches(
                contrib, batch_format="pyarrow").groupby(
                "dst").aggregate(ray.data.aggregate.Sum("c"))
            sn, sv = _collect_two_cols(sums, "dst", "sum(c)")
            new = np.full(len(node_ids), base)
            pos = np.searchsorted(node_ids, sn)
            new[pos] += damping * sv.astype(np.float64)
            rank_ref = ray.put((node_ids, new))

        ids, vals = ray.get(rank_ref)
        return ray.data.from_arrow(pa.table({
            "node": pa.array(ids, pa.int64()),
            "rank": pa.array(vals, pa.float64()),
        }))

    # large path: ranks stay a Dataset; per iteration one hash join
    # (edges ⋈ ranks on src) + one groupby(dst) — driver holds nothing
    deg_tbl = outdeg.map_batches(
        lambda b: pa.table({
            "src": b.column("src").cast(pa.int64()),
            "deg": b.column("sum(weight)").cast(pa.float64()),
        }), batch_format="pyarrow").materialize()
    edges_deg = w_edges.join(
        deg_tbl, join_type="inner", num_partitions=join_parts,
        on=("src",)).materialize()
    ranks = nodes.map_batches(
        lambda b, _n=n_nodes: pa.table({
            "node": b.column("node").cast(pa.int64()),
            "rank": pa.array(
                np.full(len(b), 1.0 / _n), pa.float64()),
        }), batch_format="pyarrow")

    for _ in range(n_iters):
        joined = edges_deg.join(
            ranks.map_batches(
                lambda b: pa.table({
                    "src": b.column("node"),
                    "rank": b.column("rank"),
                }), batch_format="pyarrow"),
            join_type="inner", num_partitions=join_parts, on=("src",))
        sums = joined.map_batches(
            lambda b: pa.table({
                "node": b.column("dst").cast(pa.int64()),
                "c": pa.array(
                    b.column("rank").to_numpy(zero_copy_only=False)
                    * b.column("weight").to_numpy(
                        zero_copy_only=False).astype(np.float64)
                    / b.column("deg").to_numpy(zero_copy_only=False),
                    pa.float64()),
            }), batch_format="pyarrow").groupby("node").aggregate(
            ray.data.aggregate.Sum("c"))
        contrib_tbl = sums.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "c": b.column("sum(c)").cast(pa.float64()),
            }), batch_format="pyarrow")
        ranks = nodes.map_batches(
            lambda b: pa.table({
                "node": b.column("node").cast(pa.int64()),
            }), batch_format="pyarrow").join(
            contrib_tbl, join_type="left_outer",
            num_partitions=join_parts, on=("node",)).map_batches(
            lambda b, _base=base: pa.table({
                "node": b.column("node"),
                "rank": pa.array(
                    _base + damping * np.nan_to_num(
                        b.column("c").to_numpy(zero_copy_only=False)
                        .astype(np.float64), nan=0.0),
                    pa.float64()),
            }), batch_format="pyarrow").materialize()
    return ranks

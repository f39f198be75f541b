"""Deterministic epoch shuffle — the global training-data permutation.

LM pretraining consumes the corpus in a seeded pseudo-random order that
must be REPRODUCIBLE (restarts resume mid-epoch) and cheap to extend to
new epochs (change the seed string, nothing else). The standard trick:
order documents by ``md5(seed || doc_id)`` — a keyed permutation no
node ever has to coordinate on — then cut the ordered stream into
fixed-size shards for the data loader.

Computing each document's GLOBAL rank under that order without a full
sort-and-count is a distributed rank:

1. one map pass emits ``(id, h = md5(seed:id), bucket = h[:4] as int)``
   — the hash prefix IS a uniform range partition of the final order,
   so bucket populations are balanced by construction (no skew: the
   key is a cryptographic hash, not a data value);
2. ``groupby(bucket).count()`` — at most 65 536 rows reach the driver,
   independent of corpus size — and an exclusive cumsum over the
   sorted bucket table gives each bucket's global starting offset,
   broadcast once via ``ray.put``;
3. a ``groupby(bucket)`` collect resolves each bucket independently:
   sort the bucket's ``(h, id)`` rows lexicographically, add the
   bucket offset. Per-group state is ``corpus / 65 536`` rows (15 M
   docs per group at 10^12; widen the prefix to 6 hex chars — 16.7 M
   buckets, ~60 k docs/group — or apply stage 2 recursively for a
   two-level scan beyond that).

Ties: md5 collisions are broken by ``id`` ascending on BOTH sides
(engine and SQL oracle), so the permutation is total even under
adversarial inputs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .broadcast import cached_get
from .dedup import collect_columns_agg


def epoch_shuffle(docs: "ray.data.Dataset", *, seed: str = "ep7",
                  id_col: str = "doc_id",
                  shard_size: int = 100) -> "ray.data.Dataset":
    """Global shuffle rank + shard assignment for one training epoch.

    Returns ``(id_col, global_rank, shard, shard_pos)`` where
    ``global_rank`` is the document's position under the
    ``md5(seed:id)`` order (ties by id), ``shard = rank // shard_size``
    and ``shard_pos = rank % shard_size`` — the loader-facing layout.
    """
    prefix = f"{seed}:"
    bias = 1 << 63  # unsigned-order-preserving signed representation

    def keyed(batch: pa.Table) -> pa.Table:
        # the 128-bit digest travels as TWO bias-signed int64 columns
        # (hex lexicographic order == unsigned 128-bit order == signed
        # order after subtracting 2^63 from each half), so the collect
        # exchange stays pure int64 — no strings, no pickle fallback
        ids = batch.column(id_col).to_pylist()
        hs = [hashlib.md5(f"{prefix}{i}".encode()).hexdigest()
              for i in ids]
        return pa.table({
            id_col: batch.column(id_col),
            "h_hi": pa.array([int(h[:16], 16) - bias for h in hs],
                             pa.int64()),
            "h_lo": pa.array([int(h[16:], 16) - bias for h in hs],
                             pa.int64()),
            "bucket": pa.array([int(h[:4], 16) for h in hs],
                               pa.int64())})

    keys = docs.map_batches(keyed, batch_format="pyarrow").materialize()

    counts = keys.groupby("bucket").count().take_all()
    buckets = np.asarray(sorted(r["bucket"] for r in counts), np.int64)
    per = {r["bucket"]: r["count()"] for r in counts}
    totals = np.asarray([per[b] for b in buckets], np.int64)
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    bref = ray.put((buckets, offsets))

    def resolve(batch: pa.Table) -> pa.Table:
        bks, offs = cached_get(bref)
        out_id: list[int] = []
        out_r: list[int] = []
        for bkt, rows in zip(batch.column("bucket").to_pylist(),
                             batch.column("rows").to_pylist()):
            rows.sort()  # (h_hi, h_lo, id)
            base = int(offs[np.searchsorted(bks, bkt)])
            out_id.extend(r[2] for r in rows)
            out_r.extend(range(base, base + len(rows)))
        rk = np.asarray(out_r, np.int64)
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "global_rank": pa.array(rk),
            "shard": pa.array(rk // shard_size),
            "shard_pos": pa.array(rk % shard_size)})

    grouped = keys.groupby("bucket").aggregate(
        collect_columns_agg(["h_hi", "h_lo", id_col], "rows"))
    return grouped.map_batches(resolve, batch_format="pyarrow")

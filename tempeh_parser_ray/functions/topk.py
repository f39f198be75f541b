"""Bounded top-k aggregation (grouped or global).

``topk_rows_agg`` is an ``AggregateFn`` whose per-group state never
exceeds ``k`` rows: each block contributes its rows, the accumulator
sorts and truncates to ``k``, and merges re-truncate — so the exchange
and the driver's final result are O(k x |groups|) REGARDLESS of block
count (the round-2 pattern of concatenating per-block partials on the
driver grew with n_blocks). Map-side pre-truncation (each batch
emitting only its local top-k) remains the combiner in front of this
final reduce.

Sort semantics match ``pyarrow.compute.sort_indices``: stable sort over
``order`` = [(col, descending?), ...] applied left-to-right.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

import ray
import ray.data


def topk_rows_agg(cols: Sequence[str], order: Sequence[tuple[str, bool]],
                  k: int, name: str = "topk"):
    """Aggregate keeping the top-``k`` rows (as lists aligned with
    ``cols``) under ``order`` — state bounded by ``k`` rows per group."""
    from ray.data.block import BlockAccessor

    cols = list(cols)
    idx_order = [(cols.index(c), desc) for c, desc in order]

    def sort_trunc(rows: list) -> list:
        for i, desc in reversed(idx_order):
            rows.sort(key=lambda r: r[i], reverse=desc)
        return rows[:k]

    def acc_block(acc: list, block) -> list:
        t = BlockAccessor.for_block(block).to_arrow()
        rows = [list(r) for r in zip(
            *(t.column(c).to_pylist() for c in cols))]
        return sort_trunc(acc + rows)

    return ray.data.aggregate.AggregateFn(
        init=lambda key: [],
        accumulate_block=acc_block,
        merge=lambda a, b: sort_trunc(list(a) + list(b)),
        name=name)


def explode_topk(tbl: pa.Table, group_cols: Sequence[str],
                 cols: Sequence[str], types: Sequence[pa.DataType],
                 topk_col: str = "topk", rank_col: str | None = None,
                 ) -> pa.Table:
    """Explode a grouped top-k result (one list-of-rows cell per group)
    back into flat rows, optionally appending a 1-based in-group rank."""
    out: dict[str, list] = {c: [] for c in group_cols}
    for c in cols:
        out[c] = []
    ranks: list[int] = []
    for row in tbl.to_pylist():
        for i, vals in enumerate(row[topk_col]):
            for g in group_cols:
                out[g].append(row[g])
            for c, v in zip(cols, vals):
                out[c].append(v)
            ranks.append(i + 1)
    arrays = {g: pa.array(out[g]) for g in group_cols}
    for c, t in zip(cols, types):
        arrays[c] = pa.array(out[c], t)
    if rank_col is not None:
        arrays[rank_col] = pa.array(ranks, pa.int64())
    return pa.table(arrays)

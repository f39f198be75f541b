"""Byte-size-aware rebatching (skew handling before the parse stage).

The parse stage's cost is proportional to html BYTES, not rows, and web
corpora have a heavy tail (a p99.9 page can be 100-1000x the median).
Feeding fixed ROW counts to the parser actor pool makes giant-page
batches straggle. ``rebatch_by_bytes`` is a streaming, shuffle-free
re-partitioner: a generator ``map_batches`` UDF that slices each block
into sub-batches capped at ``target_bytes`` of html payload, emitting
giant pages as singleton batches. Ray Data turns each yielded table
into its own block, so the downstream parse stage (batch_size=None =
one batch per block) sees byte-balanced units of work.

This is the "byte-size-aware repartitioning before the tokenize stage"
required by BASELINE.json's north_star, expressed without an all-to-all
shuffle: it only ever splits blocks locally, preserving streaming
execution and input order within a block.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
import pyarrow.compute as pc


DEFAULT_TARGET_BYTES = 8 * 1024 * 1024  # html payload per parse batch


def make_byte_rebatcher(html_column: str = "html",
                        target_bytes: int = DEFAULT_TARGET_BYTES):
    """Returns a generator UDF for ``ds.map_batches(fn, batch_size=None,
    batch_format="pyarrow")``."""

    def rebatch(batch: pa.Table) -> Iterator[pa.Table]:
        if batch.num_rows == 0:
            return
        sizes = pc.fill_null(pc.binary_length(batch.column(html_column)), 0)
        sizes = sizes.to_numpy(zero_copy_only=False)
        start = 0
        acc = 0
        for i, size in enumerate(sizes):
            size = int(size)
            if i > start and acc + size > target_bytes:
                yield batch.slice(start, i - start)
                start = i
                acc = 0
            acc += size
            if acc >= target_bytes:
                # emit [start..i] (giant rows become singletons)
                yield batch.slice(start, i - start + 1)
                start = i + 1
                acc = 0
        if start < batch.num_rows:
            yield batch.slice(start, batch.num_rows - start)

    return rebatch

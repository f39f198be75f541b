"""Fast manifest-driven Parquet source for large-binary-payload corpora.

Ray 2.49's stock ``ParquetDatasource`` spends ~20x the CPU of a plain
``pyarrow.parquet`` read on tables dominated by a large ``binary``
column (measured in this sandbox: 3.2 GB corpus, 358 s CPU vs 15 s),
which makes the read stage the bottleneck of the extraction DAG. This
source keeps the Dataset API but swaps the read task body for pure
pyarrow:

    manifest (file, row_group) rows  ->  map_batches(_ReadRowGroups)

* One manifest row per Parquet ROW GROUP, so parallelism and block
  sizing follow the writer's row-group size (the writer controls block
  granularity; giant files still split).
* Column pruning is pushed into ``pq.ParquetFile.read_row_group``.
* The manifest is tiny (2 strings + 2 ints per row group) — at
  10^12-doc scale (~10^7 files) it is still only ~GBs and is itself
  built in parallel via a map over the file list.

The output is a normal streaming ``ray.data.Dataset``; everything
downstream (rebatch, actor pools, writes) is unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _list_files(paths: Sequence[str] | str) -> list[str]:
    if isinstance(paths, (str, Path)):
        paths = [str(paths)]
    files: list[str] = []
    for p in paths:
        p = Path(p)
        if p.is_dir():
            files.extend(str(f) for f in sorted(p.glob("*.parquet")))
        else:
            files.append(str(p))
    return sorted(files)


def build_manifest(paths: Sequence[str] | str,
                   parallel_threshold: int = 256) -> pa.Table:
    """(file, row_group, n_rows) manifest; footer reads are distributed
    once the file count is large enough to matter."""
    files = _list_files(paths)

    def footers(batch: pa.Table) -> pa.Table:
        fs, rgs, ns = [], [], []
        for f in batch.column("file").to_pylist():
            md = pq.read_metadata(f)
            for rg in range(md.num_row_groups):
                fs.append(f)
                rgs.append(rg)
                ns.append(md.row_group(rg).num_rows)
        return pa.table({"file": pa.array(fs, pa.string()),
                         "row_group": pa.array(rgs, pa.int32()),
                         "n_rows": pa.array(ns, pa.int64())})

    file_tbl = pa.table({"file": pa.array(files, pa.string())})
    if len(files) <= parallel_threshold:
        return footers(file_tbl)
    ds = ray.data.from_arrow(file_tbl).map_batches(
        footers, batch_format="pyarrow", batch_size=64)
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))


class _ReadRowGroups:
    """Stateless reader UDF (plain function semantics; class only to
    carry the column list / file labels without a closure capture per
    task). ``file_labels`` attaches a constant int column per source
    file (e.g. the shard id) so downstream stages can route output
    without a join."""

    def __init__(self, columns: Optional[list[str]],
                 file_labels: Optional[dict[str, int]] = None,
                 label_column: str = "shard"):
        self.columns = columns
        self.file_labels = file_labels
        self.label_column = label_column

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        by_file: dict[str, list[int]] = {}
        for f, rg in zip(batch.column("file").to_pylist(),
                         batch.column("row_group").to_pylist()):
            by_file.setdefault(f, []).append(rg)
        for f, rgs in by_file.items():
            pf = pq.ParquetFile(f)
            try:
                tbl = pf.read_row_groups(rgs, columns=self.columns,
                                         use_threads=False)
            finally:
                pf.close()
            if self.file_labels is not None:
                lab = pa.array([self.file_labels[f]] * tbl.num_rows,
                               pa.int32())
                tbl = tbl.append_column(self.label_column, lab)
            yield tbl


def read_corpus_parquet(paths: Sequence[str] | str,
                        *,
                        columns: Optional[Sequence[str]] = None,
                        row_groups_per_block: int = 1,
                        file_labels: Optional[dict[str, int]] = None,
                        label_column: str = "shard",
                        ) -> "ray.data.Dataset":
    """Drop-in for ``ray.data.read_parquet`` on html-corpus tables."""
    manifest = build_manifest(paths)
    cols = list(columns) if columns is not None else None
    # One manifest BLOCK per read task: without this the tiny manifest
    # is a single block, and when the executor fuses this stage into a
    # downstream actor pool the whole corpus would collapse into one
    # task. The repartition is over a few-KB table — effectively free —
    # and makes read parallelism explicit regardless of fusion.
    n_blocks = max(1, -(-manifest.num_rows // row_groups_per_block))
    return (ray.data.from_arrow(manifest)
            .repartition(n_blocks)
            .map_batches(_ReadRowGroups(cols, file_labels, label_column),
                         batch_format="pyarrow",
                         batch_size=row_groups_per_block))

"""Arrow IPC (Feather V2) corpus source — the zero-copy interchange.

Feature stores and Arrow-native tooling hand corpora around as ``.arrow``
IPC files; unlike the JSONL path this preserves the ``html: binary``
column exactly (no UTF-8 string coercion). The corpus is materialized
once per (sf, content) under /tmp by a DISTRIBUTED writer (each block
becomes one IPC file with a content-hash name — the same idempotent
naming as ``sinks/jsonl_sink``), and read back file-parallel:
``ray.data.read_binary_files`` gives one row per file and the decode is
``pa.ipc.open_file`` over the in-memory buffer — zero-copy from bytes to
Arrow arrays, one task per file. At 100 TB you would size IPC files to
~256 MB each so file-granular parallelism matches block granularity.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import pyarrow as pa

import ray
import ray.data

from .jsonl_corpus import _ROOT, _cache_key, _materialize


def ipc_corpus_dir(sf_dir: str) -> Path:
    """CC-style corpus as sharded ``.arrow`` IPC files:
    (doc_id, url, html:binary, lang) — html stays binary."""
    from . import synthetic as synth

    def build(out: Path) -> None:
        docs = ray.data.read_parquet(
            str(Path(sf_dir) / "documents.parquet"))

        def write_block(batch: pa.Table) -> pa.Table:
            corpus = synth.synthesize_batch(batch)
            tbl = corpus.select(["doc_id", "url", "html", "lang"])
            key = tbl.column("doc_id").to_numpy(
                zero_copy_only=False).tobytes()
            name = f"part-{hashlib.md5(key).hexdigest()[:16]}.arrow"
            with pa.ipc.new_file(str(out / name), tbl.schema) as w:
                w.write_table(tbl)
            return pa.table({"file": pa.array([name], pa.string())})

        docs.map_batches(
            write_block, batch_format="pyarrow").materialize()

    return _materialize(_ROOT / _cache_key(sf_dir) / "ipc", build)


def read_ipc(path: str | Path) -> "ray.data.Dataset":
    """Read a directory of ``.arrow`` IPC files as a Dataset — one
    read task per file, zero-copy decode from the file bytes."""

    def decode(batch: pa.Table) -> pa.Table:
        tables = [
            pa.ipc.open_file(pa.BufferReader(buf.as_py())).read_all()
            for buf in batch.column("bytes")]
        return pa.concat_tables(tables) if tables else pa.table({})

    files = ray.data.read_binary_files(str(path))
    return files.map_batches(decode, batch_format="pyarrow",
                             batch_size=1)

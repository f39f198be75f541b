"""JSONL / CSV corpus materialization — alternate source formats.

Real crawls arrive as WARC-derived JSONL at least as often as Parquet;
these helpers materialize the deterministic synthetic corpus in those
formats once per (sf, format) under /tmp (idempotent, marker-guarded),
written BY a Dataset pipeline (``write_json`` / ``write_csv``) so the
sink side of each format is exercised too. Readers are the stock
``ray.data.read_json`` / ``read_csv`` — the engine's parse stages accept
string-typed ``html`` columns, so the JSONL path flows through the same
fused parse+extract actor pool as the Parquet path and matches the same
SQL oracle byte-identically.
"""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path

import pyarrow as pa

import ray
import ray.data

_ROOT = Path("/tmp/tempeh_sources")


def _cache_key(sf_dir: str) -> str:
    """Cache key covering the full source path AND its mtime/size —
    same-basename different-path corpora (or an in-place regeneration)
    must not serve each other's cache."""
    p = Path(sf_dir) / "documents.parquet"
    st = p.stat()
    h = hashlib.md5(
        f"{p.resolve()}:{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()
    return f"{Path(sf_dir).name}_{h[:10]}"


def _materialize(out: Path, build) -> Path:
    """Idempotent, crash-safe: build into a temp sibling and atomically
    rename. An interrupted build leaves only the temp dir (re-built and
    replaced next call); the marker-free final dir is never partial.
    The marker lives BESIDE the data dir — format readers enumerate
    every file inside it."""
    marker = out.parent / (out.name + "._DONE")
    if marker.exists():
        # /tmp agers can delete the data dir independently of the
        # marker — only trust the marker when the data is still there
        if out.exists():
            return out
        marker.unlink(missing_ok=True)
    tmp = out.parent / (out.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    if out.exists():
        shutil.rmtree(out)
    tmp.mkdir(parents=True, exist_ok=True)
    build(tmp)
    tmp.rename(out)
    marker.touch()
    return out


def jsonl_corpus_dir(sf_dir: str) -> Path:
    """CC-style corpus as JSONL: {doc_id, url, html, lang} rows with
    the html as a UTF-8 string."""
    from . import synthetic as synth

    def build(out: Path) -> None:
        docs = ray.data.read_parquet(
            str(Path(sf_dir) / "documents.parquet"))

        def rows(batch: pa.Table) -> pa.Table:
            corpus = synth.synthesize_batch(batch)
            html_str = [h.decode("utf-8")
                        for h in corpus.column("html").to_pylist()]
            return pa.table({
                "doc_id": corpus.column("doc_id"),
                "url": corpus.column("url"),
                "html": pa.array(html_str, pa.string()),
                "lang": corpus.column("lang"),
            })

        docs.map_batches(rows, batch_format="pyarrow").write_json(str(out))

    return _materialize(_ROOT / _cache_key(sf_dir) / "jsonl", build)


def csv_documents_dir(sf_dir: str) -> Path:
    """documents table as CSV (doc_id, text) — quoting/newline handling
    is the writer's; the reader must round-trip it exactly."""

    def build(out: Path) -> None:
        (ray.data.read_parquet(
            str(Path(sf_dir) / "documents.parquet"),
            columns=["doc_id", "text"])
         .write_csv(str(out)))

    return _materialize(_ROOT / _cache_key(sf_dir) / "csv", build)

"""Resumable sharded JSONL sink — the LLM-interchange export format.

Training-data consumers (tokenizer trainers, eval harnesses, external
curation tools) overwhelmingly ingest sharded ``.jsonl``; a complete
engine needs the export side, not just the ``read_json`` source. Design
mirrors the checkpointed Parquet writer
(``pipelines/extract_pipeline._write_shard_batch``):

* one ``map_batches`` pass writes each block as one shard file — the
  sink streams with the pipeline, nothing gathers on the driver;
* file names are a CONTENT HASH of the block's key column, so the
  deterministic pipeline's retried task OVERWRITES its own file
  instead of duplicating rows (idempotent under Ray task retries);
* each file lands via write-to-temp + ``os.replace`` — a killed worker
  never leaves a torn shard visible;
* the driver collects ONE tiny stats row per shard (bounded by block
  count) into ``manifest.json`` + a ``_DONE`` marker, giving consumers
  an atomic is-this-export-complete signal and per-shard row counts
  for skew audits.

Serialization uses pandas ``to_json(lines=True)`` — the C-vectorized
row-major path (a JSONL sink is inherently row-major; this is the one
legitimate ``to_pandas`` in the library, confined to the sink).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import pyarrow as pa

import ray
import ray.data


def write_jsonl_sharded(ds: "ray.data.Dataset", out_dir: str | Path,
                        key_col: str = "doc_id") -> dict:
    """Export ``ds`` as sharded JSONL under ``out_dir``.

    Returns the manifest dict: ``{"shards": [{"file", "n_rows",
    "bytes"}...], "n_rows": total}``. Re-running the same pipeline into
    the same directory rewrites the same file set (same content ->
    same names) — stale files from a DIFFERENT prior composition are
    pruned so readers never mix runs.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    done = out / "_DONE"
    if done.exists():
        done.unlink()  # a re-export invalidates the old completeness mark

    stats_schema = pa.schema([
        ("file", pa.string()), ("n_rows", pa.int64()),
        ("bytes", pa.int64())])

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return stats_schema.empty_table()
        if key_col in batch.column_names:
            # hash canonical VALUE bytes, length-prefixed so the
            # encoding is collision-free (a bare '|'.join would map
            # keys ['a|b'] and ['a','b'] to the same name and let one
            # shard silently overwrite the other); numpy tobytes() on
            # an object-dtype (string) column is no good either — it
            # would serialize pointers, making names nondeterministic
            vals = [str(v).encode("utf-8")
                    for v in batch.column(key_col).to_pylist()]
            key_src = b"".join(
                len(v).to_bytes(4, "big") + v for v in vals)
        else:  # deterministic fallback: hash the serialized payload
            vals = [str(c).encode("utf-8") for c in batch.columns]
            key_src = b"".join(
                len(v).to_bytes(4, "big") + v for v in vals)
        name = f"part-{hashlib.md5(key_src).hexdigest()[:16]}.jsonl"
        tmp = out / f".{name}.tmp"
        batch.to_pandas().to_json(tmp, orient="records", lines=True,
                                  force_ascii=False)
        os.replace(tmp, out / name)
        size = (out / name).stat().st_size
        return pa.Table.from_pylist(
            [{"file": name, "n_rows": batch.num_rows, "bytes": size}],
            schema=stats_schema)

    rows = ds.map_batches(write_batch, batch_format="pyarrow").take_all()
    shards = sorted(rows, key=lambda r: r["file"])
    manifest = {"shards": shards,
                "n_rows": int(sum(r["n_rows"] for r in shards))}

    expected = {r["file"] for r in shards}
    for f in out.glob("part-*.jsonl"):  # prune stale compositions
        if f.name not in expected:
            f.unlink()
    for f in out.glob(".part-*.tmp"):
        f.unlink()

    (out / "manifest.json").write_text(json.dumps(manifest, indent=1))
    done.touch()
    return manifest

"""The flagship extraction DAG (SURVEY.md par.3 "Ray-native restatement").

    read_parquet(corpus, columns=[url, warc_ts, html, lang])
      -> rebatch_by_bytes            (local split, no shuffle — skew fix)
      -> map_batches(ExtractBatch)   (stateful parser actor pool)
      -> write_parquet per shard + lineage sidecar  /  aggregates

Everything streams: no stage materializes the full dataset; the only
wide operation is the low-cardinality ``groupby("lang")`` quality-stats
aggregate. Checkpoint/resume is shard-granular (state.lineage).

All functions here assume Ray is already initialised by the caller
(driver contract) — no ``ray.init()`` in library code.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import pyarrow as pa

import ray
import ray.data

from ..sources.parquet_corpus import read_corpus_parquet
from ..stages.parse_stage import (ExtractBatch, ExtractStatsBatch,
                                  ParseHtmlBatch)
from ..stages.rebatch import DEFAULT_TARGET_BYTES, make_byte_rebatcher
from ..state import lineage as _lineage

_PARSE_PASSTHROUGH = ("doc_id", "url", "warc_ts", "lang")


def _default_concurrency() -> int:
    """Fixed-size parser pool: cluster CPUs minus headroom for the
    task operators (manifest/read/write). Fixed beats autoscaling here —
    measured: the (min,max) autoscaler adds ~1 actor per 1.3 s and
    plateaus well below max, leaving >half the cluster idle; a pool
    sized to every CPU deadlocks the task operators."""
    n = int(ray.cluster_resources().get("CPU", 8))
    return max(2, n - max(2, n // 8))


def _pool_strategy(concurrency):
    """Actor-pool compute strategy for the parse stage.

    * FIXED size for ints — the (min,max) autoscaler adds ~1 actor per
      1.3 s and plateaus well below max (measured), leaving half the
      cluster idle on a 32-CPU run.
    * max_tasks_in_flight=4 so each actor always has input queued —
      the in-task parquet read overlaps a queued task's dispatch
      (measured ~1.2x over the default).
    """
    if isinstance(concurrency, tuple):
        lo, hi = concurrency
        return ray.data.ActorPoolStrategy(
            min_size=lo, max_size=hi, max_tasks_in_flight_per_actor=4)
    return ray.data.ActorPoolStrategy(
        size=concurrency, max_tasks_in_flight_per_actor=4)


def extract_dataset(ds: "ray.data.Dataset",
                    *,
                    tag_name_casing: str = "lower",
                    ignore_self_closing_syntax: bool = False,
                    spans: bool = True,
                    target_batch_bytes: int = DEFAULT_TARGET_BYTES,
                    concurrency: Optional[tuple[int, int] | int] = None,
                    passthrough: Sequence[str] = _PARSE_PASSTHROUGH,
                    stats_only: bool = False,
                    ) -> "ray.data.Dataset":
    """corpus Dataset -> extraction Dataset (lazy, streaming).

    ``stats_only`` swaps in :class:`ExtractStatsBatch` (full extraction,
    16-byte-per-batch counter output) for benchmarks and dry runs."""
    if concurrency is None:
        concurrency = _default_concurrency()
    ds = ds.map_batches(
        make_byte_rebatcher(target_bytes=target_batch_bytes),
        batch_format="pyarrow", batch_size=None)
    kwargs = dict(
        tag_name_casing=tag_name_casing,
        ignore_self_closing_syntax=ignore_self_closing_syntax,
        spans=spans,
        passthrough=tuple(passthrough),
    )
    return ds.map_batches(
        ExtractStatsBatch if stats_only else ExtractBatch,
        batch_format="pyarrow",
        batch_size=None,  # consume byte-balanced blocks as-is
        compute=_pool_strategy(concurrency),
        num_cpus=1,
        fn_constructor_kwargs=kwargs,
    )


def parse_dataset(ds: "ray.data.Dataset",
                  *,
                  tag_name_casing: str = "lower",
                  ignore_self_closing_syntax: bool = False,
                  concurrency: Optional[tuple[int, int]] = None,
                  passthrough: Sequence[str] = _PARSE_PASSTHROUGH,
                  ) -> "ray.data.Dataset":
    """corpus Dataset -> full node-tree Dataset (conformance path)."""
    if concurrency is None:
        concurrency = _default_concurrency()
    ds = ds.map_batches(make_byte_rebatcher(),
                        batch_format="pyarrow", batch_size=None)
    return ds.map_batches(
        ParseHtmlBatch,
        batch_format="pyarrow",
        batch_size=None,
        compute=_pool_strategy(concurrency),
        num_cpus=1,
        fn_constructor_kwargs=dict(
            tag_name_casing=tag_name_casing,
            ignore_self_closing_syntax=ignore_self_closing_syntax,
            passthrough=tuple(passthrough),
        ),
    )


def lang_quality_stats(extracted: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-language extraction-quality stats (SURVEY.md par.2.6).

    groupby on ``lang`` — low cardinality, so the all-to-all exchange
    moves only pre-combined per-block partials."""
    from ray.data.aggregate import Count, Mean, Sum

    return extracted.groupby("lang").aggregate(
        Count(),
        Sum("n_chars_extracted"),
        Mean("n_chars_extracted"),
        Mean("link_density"),
        Sum("html_bytes"),
        Sum("n_links"),
    )


def _write_shard_batch(batch: pa.Table, *, out_root: str,
                       label_col: str = "shard") -> pa.Table:
    """Final pipeline stage: write each batch's rows into their shard's
    ``shard=NNNNN/`` directory and emit ONE tiny stats row per shard
    touched (stats ride the pipeline — no post-hoc read-back pass).

    File names are keyed on a content hash of the batch's ``doc_id``
    (or ``url``) column: the pipeline is deterministic, so a retried
    write task OVERWRITES its own file instead of duplicating rows."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    stats_schema = pa.schema([
        ("shard", pa.int32()), ("n_docs", pa.int64()),
        ("n_errors", pa.int64()), ("html_bytes", pa.int64()),
        ("extracted_chars", pa.int64()),
    ])
    if batch.num_rows == 0:
        return stats_schema.empty_table()
    shard_vals = batch.column(label_col).to_numpy(zero_copy_only=False)
    rows = []
    for sid in np.unique(shard_vals):
        sub = batch.filter(pa.array(shard_vals == sid))
        data = sub.drop_columns([label_col])
        if "doc_id" in data.column_names:
            key_src = data.column("doc_id").to_numpy(
                zero_copy_only=False).tobytes()
        elif "url" in data.column_names:
            key_src = "".join(data.column("url").to_pylist()).encode()
        else:
            import uuid

            key_src = uuid.uuid4().bytes
        name = hashlib.md5(key_src).hexdigest()[:16]
        d = Path(out_root) / f"shard={int(sid):05d}"
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(data, d / f"part-{name}.parquet")
        n_err = int(pc.sum(pc.cast(
            pc.not_equal(data.column("error"), ""), pa.int64())).as_py() or 0)
        rows.append({
            "shard": int(sid),
            "n_docs": data.num_rows,
            "n_errors": n_err,
            "html_bytes": int(pc.sum(
                data.column("html_bytes")).as_py() or 0),
            "extracted_chars": int(pc.sum(
                data.column("n_chars_extracted")).as_py() or 0),
        })
    return pa.Table.from_pylist(rows, schema=stats_schema)


def _prune_stale_shards(out_dir: Path, n_shards: int) -> None:
    """Remove shard outputs/lineage whose id is beyond the CURRENT
    composition (input list shrank or shard_size grew between runs into
    the same output_dir) — otherwise a consumer reading the directory
    would silently mix stale shard data with the new run."""
    import shutil

    for p in out_dir.glob("shard=*"):
        try:
            sid = int(p.name.split("=")[1])
        except (IndexError, ValueError):
            continue
        if sid >= n_shards and p.is_dir():
            shutil.rmtree(p)
    for sid in _lineage.completed_shards(out_dir):
        if sid >= n_shards:
            _lineage.lineage_path(out_dir, sid).unlink(missing_ok=True)


def run_extraction_job(input_files: Sequence[str],
                       output_dir: str | Path,
                       *,
                       shard_size: int = 16,
                       wave_size: int = 8,
                       resume: bool = True,
                       spans: bool = True,
                       concurrency: Optional[tuple[int, int]] = None,
                       ) -> dict:
    """Checkpointed, resumable corpus extraction.

    ``input_files`` are grouped into deterministic shards of
    ``shard_size`` files (sorted order). Pending shards run in WAVES of
    ``wave_size``: one Dataset (and one parser actor-pool spin-up)
    covers the whole wave, a shard-id column routes every row to its
    ``<out>/shard=NNNNN/`` directory inside the pipeline, and per-shard
    stats ride along as 40-byte rows — no post-hoc read-back of the
    output. Lineage sidecars commit per shard when the wave finishes;
    committed shards are skipped when ``resume`` (a crash mid-wave
    re-runs at most ``wave_size`` shards). Returns per-run totals.
    """
    files = sorted(str(f) for f in input_files)
    shards = [files[i:i + shard_size] for i in range(0, len(files), shard_size)]
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    _prune_stale_shards(out_dir, len(shards))
    done: set[int] = set()
    if resume:
        for sid in _lineage.completed_shards(out_dir):
            # A lineage marker only commits THIS shard composition: if
            # the file list or shard_size changed between runs, the
            # record is stale and the shard re-runs.
            rec = _lineage.read_lineage(out_dir, sid)
            if (rec is not None and sid < len(shards)
                    and rec.input_files == shards[sid]):
                done.add(sid)

    totals = {"n_docs": 0, "n_errors": 0, "html_bytes": 0,
              "extracted_chars": 0, "wall_seconds": 0.0,
              "shards_run": 0, "shards_skipped": 0}
    pending = [sid for sid in range(len(shards)) if sid not in done]
    totals["shards_skipped"] = len(shards) - len(pending)

    for w in range(0, len(pending), max(1, wave_size)):
        wave = pending[w:w + max(1, wave_size)]
        # A shard without a lineage marker may hold output from a
        # crashed attempt; content-keyed file names make re-writes
        # idempotent, but clearing keeps foreign leftovers out too.
        import shutil

        for sid in wave:
            shard_out = _lineage.shard_output_dir(out_dir, sid)
            if shard_out.exists():
                shutil.rmtree(shard_out)
        file_labels = {f: sid for sid in wave for f in shards[sid]}
        with _lineage.ShardTimer() as timer:
            ds = read_corpus_parquet(sorted(file_labels),
                                     file_labels=file_labels)
            ex = extract_dataset(
                ds, spans=spans, concurrency=concurrency,
                passthrough=_PARSE_PASSTHROUGH + ("shard",))
            stats_rows = pa.Table.from_pylist(ex.map_batches(
                _write_shard_batch, batch_format="pyarrow",
                batch_size=None,
                fn_kwargs=dict(out_root=str(out_dir))).take_all())
        per_shard: dict[int, dict] = {
            sid: {"n_docs": 0, "n_errors": 0, "html_bytes": 0,
                  "extracted_chars": 0} for sid in wave}
        for r in stats_rows.to_pylist():
            acc = per_shard[r["shard"]]
            for k in acc:
                acc[k] += r[k]
        for sid in wave:
            acc = per_shard[sid]
            record = _lineage.ShardLineage(
                shard=sid,
                input_files=shards[sid],
                n_docs=acc["n_docs"],
                n_errors=acc["n_errors"],
                html_bytes=acc["html_bytes"],
                extracted_chars=acc["extracted_chars"],
                wall_seconds=timer.seconds,
                docs_per_sec=(acc["n_docs"] / timer.seconds
                              if timer.seconds else 0.0),
                mb_per_sec=((acc["html_bytes"] / 1e6) / timer.seconds
                            if timer.seconds else 0.0),
                started_unix=timer.t0,
                finished_unix=timer.t1,
                extra={"wave": wave, "wave_seconds": timer.seconds},
            )
            _lineage.write_lineage(out_dir, record)
            for k in acc:
                totals[k] += acc[k]
        totals["wall_seconds"] += timer.seconds
        totals["shards_run"] += len(wave)
    return totals

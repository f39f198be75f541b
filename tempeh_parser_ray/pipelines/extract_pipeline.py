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


def run_extraction_job(input_files: Sequence[str],
                       output_dir: str | Path,
                       *,
                       shard_size: int = 16,
                       resume: bool = True,
                       spans: bool = True,
                       concurrency: Optional[tuple[int, int]] = None,
                       ) -> dict:
    """Checkpointed, resumable corpus extraction.

    ``input_files`` are grouped into deterministic shards of
    ``shard_size`` files (sorted order). Each shard streams through the
    extraction DAG into ``<out>/shard=NNNNN/`` and commits a lineage
    sidecar; committed shards are skipped when ``resume``. Returns a
    summary dict with per-run totals.
    """
    files = sorted(str(f) for f in input_files)
    shards = [files[i:i + shard_size] for i in range(0, len(files), shard_size)]
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
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

    for shard_id, shard_files in enumerate(shards):
        if shard_id in done:
            totals["shards_skipped"] += 1
            continue
        with _lineage.ShardTimer() as timer:
            ds = read_corpus_parquet(shard_files)
            ex = extract_dataset(ds, spans=spans, concurrency=concurrency)
            shard_out = _lineage.shard_output_dir(out_dir, shard_id)
            # A shard without a lineage marker may hold output from a
            # crashed attempt; Ray's write_parquet appends unique file
            # names, so clear it first to keep resume idempotent.
            if shard_out.exists():
                import shutil

                shutil.rmtree(shard_out)
            ex.write_parquet(str(shard_out))
            # Small post-hoc aggregate over the written shard for the
            # lineage record (reads only the metric columns).
            stats = ray.data.read_parquet(
                str(shard_out),
                columns=["html_bytes", "n_chars_extracted", "error"],
            ).map_batches(_shard_stats, batch_format="pyarrow",
                          batch_size=None).sum(
                ["n_docs", "n_errors", "html_bytes", "extracted_chars"])
        n_docs = int(stats["sum(n_docs)"])
        n_err = int(stats["sum(n_errors)"])
        h_bytes = int(stats["sum(html_bytes)"])
        e_chars = int(stats["sum(extracted_chars)"])
        record = _lineage.ShardLineage(
            shard=shard_id,
            input_files=shard_files,
            n_docs=n_docs,
            n_errors=n_err,
            html_bytes=h_bytes,
            extracted_chars=e_chars,
            wall_seconds=timer.seconds,
            docs_per_sec=n_docs / timer.seconds if timer.seconds else 0.0,
            mb_per_sec=(h_bytes / 1e6) / timer.seconds if timer.seconds else 0.0,
            started_unix=timer.t0,
            finished_unix=timer.t1,
        )
        _lineage.write_lineage(out_dir, record)
        totals["n_docs"] += n_docs
        totals["n_errors"] += n_err
        totals["html_bytes"] += h_bytes
        totals["extracted_chars"] += e_chars
        totals["wall_seconds"] += timer.seconds
        totals["shards_run"] += 1
    return totals


def _shard_stats(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = batch.num_rows
    n_err = int(pc.sum(
        pc.cast(pc.not_equal(batch.column("error"), ""), pa.int64())
    ).as_py() or 0)
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "n_errors": pa.array([n_err], pa.int64()),
        "html_bytes": pa.array(
            [int(pc.sum(batch.column("html_bytes")).as_py() or 0)], pa.int64()),
        "extracted_chars": pa.array(
            [int(pc.sum(batch.column("n_chars_extracted")).as_py() or 0)],
            pa.int64()),
    })

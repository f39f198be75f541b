"""Per-partition lineage records + checkpoint/resume bookkeeping.

Design (SURVEY.md par.4 "Checkpoint / resume"): the extraction pipeline
processes its input as deterministic SHARDS (groups of input files /
corpus slices). Each shard writes

* its output under   ``<out>/shard=<NNNNN>/``            (parquet)
* a lineage sidecar  ``<out>/_lineage/shard-<NNNNN>.json``

The sidecar is written AFTER the shard's parquet output is fully
durable, so its existence is the commit marker: on restart,
``completed_shards`` lists committed shards and the driver skips them —
a killed run resumes at shard granularity without re-reading finished
partitions. Output for a partially-written shard is overwritten in
place (deterministic shard dir), so the scheme is idempotent. No
Ray-internal checkpoint APIs are involved — it works on any
filesystem / object store that gives per-file atomic visibility.

The record carries enough to audit a 10^12-document run: input files,
row/byte/error counts, wall time and throughput per shard.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Optional


@dataclass
class ShardLineage:
    shard: int
    input_files: list[str]
    n_docs: int
    n_errors: int
    html_bytes: int
    extracted_chars: int
    wall_seconds: float
    docs_per_sec: float
    mb_per_sec: float
    started_unix: float
    finished_unix: float
    engine_version: str = "0.1.0"
    extra: dict = field(default_factory=dict)


def lineage_dir(out_dir: str | Path) -> Path:
    return Path(out_dir) / "_lineage"


def shard_output_dir(out_dir: str | Path, shard: int) -> Path:
    return Path(out_dir) / f"shard={shard:05d}"


def lineage_path(out_dir: str | Path, shard: int) -> Path:
    return lineage_dir(out_dir) / f"shard-{shard:05d}.json"


def write_lineage(out_dir: str | Path, record: ShardLineage) -> Path:
    path = lineage_path(out_dir, record.shard)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(asdict(record), indent=1))
    os.replace(tmp, path)  # atomic commit marker
    return path


def read_lineage(out_dir: str | Path, shard: int) -> Optional[ShardLineage]:
    path = lineage_path(out_dir, shard)
    if not path.exists():
        return None
    return ShardLineage(**json.loads(path.read_text()))


def completed_shards(out_dir: str | Path) -> set[int]:
    d = lineage_dir(out_dir)
    if not d.exists():
        return set()
    out = set()
    for p in d.glob("shard-*.json"):
        try:
            out.add(int(p.stem.split("-")[1]))
        except (IndexError, ValueError):
            continue
    return out


def scale_report(out_dir: str | Path) -> dict:
    """Audit surface for a large run: per-shard throughput/skew
    percentiles computed from the committed lineage sidecars — a PURE
    READ of existing records (no touch of the shard data itself), the
    dashboard a 10^12-document operator would watch for stragglers.

    Returns totals, per-shard ``mb_per_sec`` / ``docs_per_sec`` /
    ``html_bytes`` percentiles (p10/p50/p90 + min/max), and the
    straggler list (shards below half the median MB/s). Per-shard
    wall time is the WAVE wall time (shards in a wave share one
    pipeline), so intra-wave throughput differences reflect data skew
    (bytes percentiles), not scheduling."""
    import numpy as np

    recs = [r for sid in sorted(completed_shards(out_dir))
            if (r := read_lineage(out_dir, sid)) is not None]
    if not recs:
        return {"n_shards": 0, "totals": {}, "percentiles": {},
                "stragglers": []}

    def pct(vals: list[float]) -> dict:
        a = np.asarray(vals, dtype=np.float64)
        return {
            "min": float(a.min()),
            "p10": float(np.percentile(a, 10)),
            "p50": float(np.percentile(a, 50)),
            "p90": float(np.percentile(a, 90)),
            "max": float(a.max()),
        }

    mbps = [r.mb_per_sec for r in recs]
    med = float(np.median(np.asarray(mbps)))
    stragglers = [
        {"shard": r.shard, "mb_per_sec": r.mb_per_sec,
         "html_bytes": r.html_bytes,
         "wave": r.extra.get("wave")}
        for r in recs if r.mb_per_sec < 0.5 * med]
    # one wall-time contribution per WAVE (shards in a wave share a
    # pipeline), keyed by the wave's shard list, not its duration
    wave_walls: dict[tuple, float] = {}
    for r in recs:
        wkey = tuple(r.extra.get("wave") or [r.shard])
        wave_walls[wkey] = r.extra.get("wave_seconds", r.wall_seconds)
    wall = float(sum(wave_walls.values()))
    return {
        "n_shards": len(recs),
        "totals": {
            "n_docs": sum(r.n_docs for r in recs),
            "n_errors": sum(r.n_errors for r in recs),
            "html_bytes": sum(r.html_bytes for r in recs),
            "extracted_chars": sum(r.extracted_chars for r in recs),
        },
        "percentiles": {
            "mb_per_sec": pct(mbps),
            "docs_per_sec": pct([r.docs_per_sec for r in recs]),
            "html_bytes": pct([float(r.html_bytes) for r in recs]),
        },
        "median_mb_per_sec": med,
        "wall_seconds_estimate": wall,
        "stragglers": stragglers,
    }


class ShardTimer:
    def __enter__(self) -> "ShardTimer":
        self.t0 = time.time()
        return self

    def __exit__(self, *exc) -> None:
        self.t1 = time.time()

    @property
    def seconds(self) -> float:
        return self.t1 - self.t0

"""Fixture-derived conformance corpus (FIXTURES.md par.1).

One row per reference fixture file, ``html`` = the fixture's exact bytes
(encodings/BOMs preserved), ``url = "fixture://<name>"``.
"""

from __future__ import annotations

import datetime
from pathlib import Path

import pyarrow as pa

FIXTURE_DIR = Path("/root/reference/test/fixtures")
_EPOCH = datetime.datetime(2025, 1, 1)

CORPUS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("ms")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def fixture_corpus_table(fixture_dir: Path = FIXTURE_DIR) -> pa.Table:
    names = sorted(p.name for p in fixture_dir.iterdir())
    rows = {
        "url": [f"fixture://{n}" for n in names],
        "warc_ts": [_EPOCH + datetime.timedelta(seconds=i)
                    for i in range(len(names))],
        "html": [(fixture_dir / n).read_bytes() for n in names],
        "text": ["" for _ in names],
        "lang": ["en" for _ in names],
    }
    return pa.table(rows, schema=CORPUS_SCHEMA)


def write_fixture_corpus(out_path: str | Path,
                         fixture_dir: Path = FIXTURE_DIR) -> str:
    import pyarrow.parquet as pq

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(fixture_corpus_table(fixture_dir), out_path)
    return str(out_path)

"""WARC-lite container source — index-free parallel byte-range reads.

Real web corpora arrive as WARC shards (ISO 28500): concatenated
self-delimiting records, each a ``WARC/1.0`` header block with a
``Content-Length`` followed by the payload. The scalable read pattern
(what CommonCrawl consumers do when no CDX index is at hand) is:

1. the driver lists shard files + sizes only (no data bytes),
2. each shard is cut into FIXED byte ranges (no record alignment),
3. every range becomes one Ray task that *resyncs* to the first record
   magic at-or-after its range start, then walks records by their
   declared ``Content-Length`` — payloads are never scanned — emitting
   exactly the records whose start offset lies inside the range.

A record that starts inside a range but extends past its end is read to
completion by extending the buffer from the open file handle, so there
is no maximum-record-size cap and no overlap parameter to tune. Range
boundaries therefore partition records exactly once regardless of
alignment (rule: a record belongs to the range containing its first
byte).

Resync validates the full header block (``Name: value`` lines up to the
blank line, ``Content-Length`` present) before trusting a magic hit, so
a payload containing the bare magic bytes cannot derail the walk — the
residual false-sync risk (a payload embedding a complete *valid* WARC
header block) is the standard limitation of every index-free WARC
scanner and is documented here.

The writer half only exists to materialize the deterministic synthetic
corpus as WARC for tests/benchmarks (at production scale the WARCs
already exist); it reuses the jsonl_corpus cache/marker machinery.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

import ray
import ray.data

from .jsonl_corpus import _cache_key, _materialize, _ROOT

_MAGIC = b"WARC/1.0\r\n"
# Production default: ~64 MiB ranges amortize task overhead against
# object-store block sizes. Tests/benchmarks pass something small so a
# kilobyte-scale corpus still exercises multi-range parallelism and the
# boundary/resync logic.
DEFAULT_RANGE_BYTES = 64 << 20


def _record_bytes(doc_id: int, url: str, lang: str, html: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:synth:{doc_id}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"X-Synth-Lang: {lang}\r\n"
        f"Content-Length: {len(html)}\r\n"
        f"\r\n").encode("ascii")
    return head + html + b"\r\n\r\n"


def warc_corpus_dir(sf_dir: str, n_shards: int = 4) -> Path:
    """Materialize the synthetic CC-style corpus as ``n_shards`` WARC
    shard files (records in doc_id order, sharded by ``doc_id %
    n_shards``); idempotent per (source path, mtime)."""
    from . import synthetic as synth

    def build(out: Path) -> None:
        docs = ray.data.read_parquet(
            str(Path(sf_dir) / "documents.parquet"))
        corpus = docs.map_batches(synth.synthesize_batch,
                                  batch_format="pyarrow")
        parts: list[list[tuple]] = [[] for _ in range(n_shards)]
        for b in corpus.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
            for did, url, lang, html in zip(
                    b.column("doc_id").to_pylist(),
                    b.column("url").to_pylist(),
                    b.column("lang").to_pylist(),
                    b.column("html").to_pylist()):
                parts[did % n_shards].append((did, url, lang, html))
        for i, rows in enumerate(parts):
            rows.sort(key=lambda r: r[0])
            with open(out / f"shard-{i:05d}.warc", "wb") as fh:
                for did, url, lang, html in rows:
                    fh.write(_record_bytes(did, url, lang, html))

    return _materialize(_ROOT / _cache_key(sf_dir) / "warc", build)


def _valid_header(buf: bytes, pos: int) -> tuple[dict, int, int] | None:
    """Parse the header block starting at ``pos`` (which must point at
    the magic). Returns (headers, payload_start, payload_len) or None
    if the block is not a structurally valid WARC header."""
    hdr_end = buf.find(b"\r\n\r\n", pos)
    if hdr_end < 0:
        return None
    headers: dict[str, str] = {}
    lines = buf[pos:hdr_end].split(b"\r\n")
    last_key: str | None = None
    for ln in lines[1:]:  # lines[0] is the magic
        if ln[:1] in (b" ", b"\t"):
            # ISO 28500 allows RFC-822-style folded continuations
            if last_key is None:
                return None
            try:
                headers[last_key] += " " + ln.strip().decode("utf-8")
            except UnicodeDecodeError:
                return None
            continue
        # ISO 28500 grammar: field-name ":" [field-value] — the space
        # after the colon is OPTIONAL, so split on bare ':' and strip
        # surrounding whitespace (a 'Name:value' writer must not make
        # the record look like a false sync and get silently dropped)
        k, sep, v = ln.partition(b":")
        if not sep or not k:
            return None
        try:
            last_key = k.decode("ascii").strip()
            headers[last_key] = v.decode("utf-8").strip()
        except UnicodeDecodeError:
            return None
    if "Content-Length" not in headers:
        return None
    try:
        n = int(headers["Content-Length"])
    except ValueError:
        return None
    if n < 0:
        return None
    return headers, hdr_end + 4, n


def _parse_range(path: str, start: int, end: int) -> list[dict]:
    """Emit every record whose first byte lies in [start, end).

    The initial read covers the whole range plus 64 KiB of slack, so
    the magic of every in-range record is already in the buffer; the
    buffer only ever GROWS (from the same open handle) to complete a
    header or payload that extends past the range end — hence no
    maximum-record-size cap."""
    out: list[dict] = []
    with open(path, "rb") as fh:
        fh.seek(start)
        buf = fh.read((end - start) + 65536)
        base = start  # absolute offset of buf[0]

        def ensure(upto: int) -> bool:
            """Grow buf until it holds absolute offset ``upto``."""
            nonlocal buf
            while base + len(buf) < upto:
                more = fh.read(max(upto - (base + len(buf)), 65536))
                if not more:
                    return False
                buf += more
            return True

        pos = 0  # buf-relative scan cursor
        while True:
            hit = buf.find(_MAGIC, pos)
            if hit < 0 or base + hit >= end:
                break  # next record (if any) belongs to a later range
            ensure(base + hit + 16384)  # header slack (EOF-tolerant)
            while True:
                parsed = _valid_header(buf, hit)
                if parsed is not None:
                    break
                if buf.find(b"\r\n\r\n", hit) >= 0:
                    break  # terminator seen: structurally invalid
                # the header block may simply extend past the buffer
                # tail — grow before declaring a false sync, else a
                # large genuine header is silently dropped
                if not ensure(base + len(buf) + 65536):
                    break  # EOF — genuinely unterminated
            if parsed is None:
                pos = hit + 1  # false sync inside a payload: keep scanning
                continue
            headers, pstart, plen = parsed
            if not ensure(base + pstart + plen):
                raise ValueError(
                    f"{path}: truncated record at offset {base + hit}")
            out.append({
                # synth record ids are <urn:synth:{doc_id}>
                "doc_id": int(headers["WARC-Record-ID"]
                              .rsplit(":", 1)[-1].rstrip(">")),
                "url": headers.get("WARC-Target-URI", ""),
                "lang": headers.get("X-Synth-Lang", ""),
                "html": bytes(buf[pstart:pstart + plen]),
            })
            pos = pstart + plen + 4  # skip payload + trailing CRLFCRLF
    return out


def read_warc(warc_dir: str | Path,
              range_bytes: int = DEFAULT_RANGE_BYTES
              ) -> "ray.data.Dataset":
    """Dataset over every record in every ``*.warc`` shard under
    ``warc_dir``: columns (doc_id int64, url, lang, html binary).
    Driver work is one directory listing; all byte I/O happens in the
    per-range tasks."""
    chunks = []
    for p in sorted(Path(warc_dir).glob("*.warc")):
        size = p.stat().st_size
        for s in range(0, size, range_bytes):
            chunks.append({"path": str(p), "start": s,
                           "end": min(s + range_bytes, size)})
    if not chunks:
        raise FileNotFoundError(f"no .warc shards under {warc_dir}")

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path, s, e in zip(batch.column("path").to_pylist(),
                              batch.column("start").to_pylist(),
                              batch.column("end").to_pylist()):
            rows.extend(_parse_range(path, s, e))
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        })

    return ray.data.from_items(chunks).map_batches(
        parse, batch_format="pyarrow", batch_size=1)

"""Round-4 operators: sub-document paragraph dedup + WARC-lite source."""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pytest

from tempeh_parser_ray.functions import dedup as _dedup
from tempeh_parser_ray.sources import warc_corpus as _warc

SF_DIR = "/root/testdata/sf0.001"


# --- paragraph dedup -----------------------------------------------------

DOCS = [
    # doc 1 and doc 5 share their first two 3-token chunks; doc 5's tail
    # differs. doc 9 is a full duplicate of doc 1 (every chunk loses).
    (1, "a b c d e f g h"),
    (5, "a b c d e f x y z"),
    (9, "a b c d e f g h"),
    (3, "unique words only here"),
    (7, ""),  # '' -> one empty-string chunk; dedups against nothing else
]


def _ref_paragraph_dedup(docs, chunk_tokens):
    """Independent formulation: first occurrence per chunk under
    (doc_id, idx) lexicographic order, then per-doc reassembly."""
    first: dict[str, tuple[int, int]] = {}
    chunks_by_doc = {}
    for did, text in sorted(docs):
        toks = text.split(" ")
        cs = [" ".join(toks[i:i + chunk_tokens])
              for i in range(0, len(toks), chunk_tokens)]
        chunks_by_doc[did] = cs
        for i, c in enumerate(cs):
            if c not in first:
                first[c] = (did, i)
    out = {}
    for did, cs in chunks_by_doc.items():
        kept = [c for i, c in enumerate(cs) if first[c] == (did, i)]
        if kept:
            out[did] = (" ".join(kept), len(cs), len(kept))
    return out


def _run_paragraph(ray, docs, **kw):
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in docs]).repartition(3)
    res = _dedup.paragraph_dedup(ds, chunk_tokens=3, **kw)
    got = {}
    for b in res.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            got[r["doc_id"]] = (r["text_clean"], r["n_chunks"],
                                r["n_kept"])
    return got


def test_paragraph_dedup_broadcast_path(ray_session):
    got = _run_paragraph(ray_session, DOCS)
    assert got == _ref_paragraph_dedup(DOCS, 3)
    assert 9 not in got  # full duplicate dropped entirely
    assert got[1][0] == "a b c d e f g h"
    assert got[5] == ("x y z", 3, 1)


def test_paragraph_dedup_join_path_equals_broadcast(ray_session):
    broad = _run_paragraph(ray_session, DOCS)
    joined = _run_paragraph(ray_session, DOCS, broadcast_limit=0)
    assert joined == broad


def test_paragraph_dedup_partition_invariance(ray_session):
    ds1 = ray_session.data.from_items(
        [{"doc_id": d, "text": t} for d, t in DOCS]).repartition(1)
    got1 = {}
    for b in _dedup.paragraph_dedup(ds1, chunk_tokens=3).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            got1[r["doc_id"]] = (r["text_clean"], r["n_chunks"],
                                 r["n_kept"])
    assert got1 == _run_paragraph(ray_session, DOCS)


# --- WARC-lite source ----------------------------------------------------

def _mk_records(n, payload=b"<html>%d</html>"):
    return [(i, f"synth://doc/{i}", "en", payload % i) for i in range(n)]


def _write_warc(path: Path, recs):
    with open(path, "wb") as fh:
        for did, url, lang, html in recs:
            fh.write(_warc._record_bytes(did, url, lang, html))


def test_warc_range_partition_exactly_once(tmp_path):
    recs = _mk_records(25)
    f = tmp_path / "a.warc"
    _write_warc(f, recs)
    size = f.stat().st_size
    for rb in (23, 64, 150, size, size + 7):
        got = []
        for s in range(0, size, rb):
            got.extend(_warc._parse_range(str(f), s, min(s + rb, size)))
        assert [(r["doc_id"], r["html"]) for r in got] == \
            [(d, h) for d, _, _, h in recs], f"range_bytes={rb}"


def test_warc_false_magic_in_payload_resyncs(tmp_path):
    # payload embeds the bare magic: the resync validator must reject it
    # (no Content-Length header block) and still find every real record.
    evil = b"x WARC/1.0\r\nnot: a real: record y"
    recs = [(0, "u0", "en", evil), (1, "u1", "de", b"<p>ok</p>")]
    f = tmp_path / "b.warc"
    _write_warc(f, recs)
    size = f.stat().st_size
    for rb in (16, 40, size):
        got = []
        for s in range(0, size, rb):
            got.extend(_warc._parse_range(str(f), s, min(s + rb, size)))
        assert [(r["doc_id"], r["html"]) for r in got] == \
            [(0, evil), (1, b"<p>ok</p>")], f"range_bytes={rb}"


def test_warc_truncated_record_raises(tmp_path):
    recs = _mk_records(2)
    f = tmp_path / "c.warc"
    _write_warc(f, recs)
    data = f.read_bytes()
    f.write_bytes(data[:-10])  # cut into the final payload
    with pytest.raises(ValueError, match="truncated"):
        _warc._parse_range(str(f), 0, f.stat().st_size)


def test_warc_corpus_matches_parquet_synthesis(ray_session):
    import ray.data as rd

    from tempeh_parser_ray.sources import synthetic as synth

    d = _warc.warc_corpus_dir(SF_DIR)
    ds = _warc.read_warc(d, range_bytes=8 << 10)
    got = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            got[r["doc_id"]] = r["html"]

    ref = {}
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet")
    for b in docs.map_batches(synth.synthesize_batch,
                              batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            ref[r["doc_id"]] = r["html"]
    assert got == ref

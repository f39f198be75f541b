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


def test_warc_headers_without_space_and_folded(tmp_path):
    # ISO 28500 makes the space after ':' optional and allows folded
    # continuation lines — neither variant may be dropped as a false
    # sync (that would be silent data loss on foreign WARC writers)
    html = b"<p>tight</p>"
    head = (b"WARC/1.0\r\n"
            b"WARC-Type:response\r\n"
            b"WARC-Record-ID:<urn:synth:7>\r\n"
            b"WARC-Target-URI: http://x/\r\n"
            b"X-Synth-Lang:fr\r\n"
            b"X-Long-Field: part one\r\n"
            b"\tpart two\r\n"
            + b"Content-Length:%d\r\n\r\n" % len(html))
    f = tmp_path / "d.warc"
    f.write_bytes(head + html + b"\r\n\r\n"
                  + _warc._record_bytes(8, "u8", "en", b"<p>n</p>"))
    got = _warc._parse_range(str(f), 0, f.stat().st_size)
    assert [(r["doc_id"], r["lang"], r["html"]) for r in got] == \
        [(7, "fr", html), (8, "en", b"<p>n</p>")]


def test_warc_header_block_larger_than_initial_slack(tmp_path):
    # a header block bigger than the 16 KiB ensure() slack must grow
    # the buffer and parse, not be misclassified as a false sync
    html = b"<p>big-head</p>"
    filler = b"X-Pad: " + b"p" * 40000 + b"\r\n"
    head = (b"WARC/1.0\r\n"
            b"WARC-Record-ID: <urn:synth:9>\r\n"
            + filler
            + b"Content-Length: %d\r\n\r\n" % len(html))
    f = tmp_path / "e.warc"
    f.write_bytes(head + html + b"\r\n\r\n")
    # range ends immediately after the magic so the header lies
    # almost entirely past the initial read window
    got = _warc._parse_range(str(f), 0, 12)
    assert [(r["doc_id"], r["html"]) for r in got] == [(9, html)]


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


# --- SemDedup (cluster-then-prune semantic dedup) ------------------------

import numpy as np

from tempeh_parser_ray.functions import similarity as _sim


def _semdedup_table(ids, mat):
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    })


def _run_semdedup(ray, ids, mat, *, n_clusters, threshold, parts=None):
    ds = ray.data.from_arrow(_semdedup_table(ids, mat))
    if parts:
        ds = ds.repartition(parts)
    out = _sim.semdedup(ds, threshold=threshold, n_clusters=n_clusters)
    rows = {}
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            rows[r["vec_id"]] = (r["cluster"], r["keep"])
    return rows


def _ref_semdedup(ids, mat, *, n_clusters, threshold, n_iters=3):
    """Independent spec reimplementation: spherical k-means (init = the
    n_clusters smallest-id unit vectors, argmax-cosine assignment, mean
    + renormalize update, 3 Lloyd iterations), then per-cluster greedy
    min-id sweep: drop i iff some KEPT j<i in the cluster has
    cosine >= threshold."""
    ids = np.asarray(ids, np.int64)
    mat = np.asarray(mat, np.float64)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    unit = mat / n[:, None]
    c = unit[np.argsort(ids)[:n_clusters]].copy()
    cn = np.linalg.norm(c, axis=1)
    cn[cn == 0] = 1.0
    c = c / cn[:, None]
    for _ in range(n_iters):
        assign = np.argmax(unit @ c.T, axis=1)
        for k in range(len(c)):
            m = assign == k
            if m.any():
                v = unit[m].sum(axis=0) / m.sum()
                nv = np.linalg.norm(v)
                c[k] = v / (nv if nv else 1.0)
    assign = np.argmax(unit @ c.T, axis=1)
    out = {}
    for k in set(assign.tolist()):
        m = np.nonzero(assign == k)[0]
        m = m[np.argsort(ids[m])]
        kept: list[int] = []
        for i in m:
            dup = any(unit[j] @ unit[i] >= threshold for j in kept)
            out[int(ids[i])] = (int(k), not dup)
            if not dup:
                kept.append(i)
    return out


def test_semdedup_greedy_chain(ray_session):
    # a--b and b--c similar, a--c not: greedy keeps a, drops b, then
    # checks c against KEPT vectors only -> c survives. The non-greedy
    # "any smaller id" rule would wrongly drop c.
    ang = np.deg2rad([0.0, 17.0, 34.0])
    mat = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    rows = _run_semdedup(ray_session, [1, 2, 3], mat,
                         n_clusters=1, threshold=0.95)
    assert {i: k for i, (_, k) in rows.items()} == {
        1: True, 2: False, 3: True}


def test_semdedup_matches_reference(ray_session):
    rng = np.random.RandomState(7)
    base = rng.randn(48, 6)
    ids = list(range(48)) + [1000, 1010, 1020]
    mat = np.vstack([base, base[[0, 10, 20]]])  # exact clones
    got = _run_semdedup(ray_session, ids, mat,
                        n_clusters=4, threshold=0.9)
    ref = _ref_semdedup(ids, mat, n_clusters=4, threshold=0.9)
    assert got == ref
    # exact clones are ALWAYS dropped under the greedy rule (if the
    # original is kept it kills the clone; if the original was itself
    # dropped by some kept j, that same j kills the clone), and always
    # land in the original's cluster. (dim 6 deliberately yields some
    # NATURAL >= 0.9 pairs too — e.g. ids 3/20 with seed 7 — so the
    # reference equality above is exercised beyond the planted pairs.)
    for orig, clone in ((0, 1000), (10, 1010), (20, 1020)):
        assert not got[clone][1]
        assert got[orig][0] == got[clone][0]  # co-clustered


def test_semdedup_partition_invariance(ray_session):
    # dim 16 keeps natural cosines far below 0.95, so the keep-set is
    # exactly {originals} regardless of float summation order across
    # block layouts; cluster ids may legitimately differ.
    rng = np.random.RandomState(11)
    base = rng.randn(40, 16)
    ids = list(range(40)) + [900 + i for i in range(0, 40, 5)]
    mat = np.vstack([base, base[::5]])
    a = _run_semdedup(ray_session, ids, mat, n_clusters=4,
                      threshold=0.95)
    b = _run_semdedup(ray_session, ids, mat, n_clusters=4,
                      threshold=0.95, parts=5)
    assert {i: k for i, (_, k) in a.items()} == \
           {i: k for i, (_, k) in b.items()}
    assert all(k == (i < 900) for i, (_, k) in a.items())


# --- n-gram LM perplexity (CCNet-style) -----------------------------------

from collections import Counter
import math

from tempeh_parser_ray.functions import curation as _cur

LM_DOCS = [
    (1, "a b a b c"),
    (2, "a b"),
    (3, "c c c c"),
    (4, "solo"),        # single token: unigrams count, no score row
    (5, ""),            # empty: contributes nothing
    (6, "b a b a b"),
]


def _ref_lm_ppl(docs):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for _, t in docs:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    V = len(uni)
    out = {}
    for did, t in docs:
        toks = t.split()
        if len(toks) < 2:
            continue
        ll = sum(math.log((bi[(a, b)] + 1) / (uni[a] + V))
                 for a, b in zip(toks, toks[1:]))
        out[did] = (len(toks) - 1,
                    round(math.exp(-ll / (len(toks) - 1)), 4))
    return out


def _run_lm(ray, docs, **kw):
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in docs]).repartition(3)
    out = _cur.ngram_lm_scores(ds, **kw)
    rows = {}
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            rows[r["doc_id"]] = (r["n_bigrams"], r["ppl"])
    return rows


def test_ngram_lm_matches_reference(ray_session):
    assert _run_lm(ray_session, LM_DOCS) == _ref_lm_ppl(LM_DOCS)


def test_ngram_lm_join_path_equals_broadcast(ray_session):
    broad = _run_lm(ray_session, LM_DOCS)
    joined = _run_lm(ray_session, LM_DOCS, broadcast_limit=0)
    assert set(broad) == set(joined)
    for k in broad:
        assert broad[k][0] == joined[k][0]
        # float sum order differs between the paths; rounded-4 values
        # agree far inside that tolerance on these inputs
        assert abs(broad[k][1] - joined[k][1]) < 1e-9


def test_ppl_buckets_tercile_semantics(ray_session):
    from tempeh_parser_ray.pipelines import queries as q

    out = pa.concat_tables(list(q.ppl_buckets(SF_DIR).iter_batches(
        batch_format="pyarrow", batch_size=None)))
    by = {}
    for r in out.to_pylist():
        by.setdefault(r["bucket"], []).append(r["ppl"])
    assert set(by) == {"head", "middle", "tail"}
    # value-ordered buckets: every head ppl <= every middle <= every tail
    assert max(by["head"]) <= min(by["middle"])
    assert max(by["middle"]) <= min(by["tail"])
    # terciles are value-threshold based (quantile_disc), so sizes are
    # near-N/3 up to ties at the boundary values
    n = out.num_rows
    assert abs(len(by["head"]) - n / 3) <= max(3, n * 0.05)


# ---------------------------------------------------------------------------
# PDF-lite layout extraction


def test_pdf_roundtrip_matches_closed_form(ray_session):
    import ray.data

    from tempeh_parser_ray.pipelines import queries as q
    from tempeh_parser_ray.sources import pdf_corpus as P

    out = pa.concat_tables(list(q.extract_text_pdf(SF_DIR).iter_batches(
        batch_format="pyarrow", batch_size=None)))
    docs = pa.concat_tables(list(
        ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                              columns=["doc_id", "text"]).iter_batches(
            batch_format="pyarrow", batch_size=None)))
    texts = dict(zip(docs.column("doc_id").to_pylist(),
                     docs.column("text").to_pylist()))
    assert out.num_rows == len(texts)
    for r in out.to_pylist():
        t = texts[r["doc_id"]]
        assert r["pdf_text"] == P.expected_pdf_text(t)
        ep, ec = P.expected_counts(t)
        assert (r["n_pages"], r["n_chunks"]) == (ep, ec)
        assert r["error"] == ""


def test_pdf_literal_string_escapes():
    from tempeh_parser_ray.sources.pdf_corpus import _lit_string

    # \( \) \\ named escapes, octal, nested unescaped parens,
    # line continuation, lone backslash drops itself
    s, i = _lit_string(b"(a\\(b\\)c\\\\d\\101 e)", 0)
    assert s == b"a(b)c\\dA e"
    s, _ = _lit_string(b"(nest(ed)ok)", 0)
    assert s == b"nest(ed)ok"
    s, _ = _lit_string(b"(li\\\nne)", 0)
    assert s == b"line"
    s, _ = _lit_string(b"(q\\zq)", 0)
    assert s == b"qzq"
    s, _ = _lit_string(b"(\\n\\t)", 0)
    assert s == b"\n\t"


def test_pdf_content_positioning_ops():
    from tempeh_parser_ray.sources.pdf_corpus import _parse_content

    # Tm / Td / TD / T* / TL / ' / TJ / hex all position correctly
    stream = (b"BT 1 0 0 1 72 700 Tm (top) Tj ET "
              b"BT 72 686 Td (mid) Tj ET "
              b"BT 72 0 Td 0 672 TD (low) Tj 14 TL (lower) ' ET "
              b"BT 1 0 0 1 72 644 Tm [(a) -120 (b)] TJ ET "
              b"BT 1 0 0 1 72 630 Tm <6869> Tj ET")
    runs = sorted(_parse_content(stream), key=lambda r: -r[0])
    assert [(r[0], r[3]) for r in runs] == [
        (700.0, b"top"), (686.0, b"mid"), (672.0, b"low"),
        (658.0, b"lower"), (644.0, b"ab"), (630.0, b"hi")]


def test_pdf_hostile_inputs_never_raise():
    from tempeh_parser_ray.sources.pdf_corpus import build_pdf, extract_pdf

    good = build_pdf("alpha beta gamma delta epsilon zeta eta theta")
    for buf in [b"", b"%PDF-1.4 junk", good[:60], good[:-30],
                b"\x00" * 64, good.replace(b"/Kids", b"/Kidz")]:
        text, n_pages, n_chunks, err = extract_pdf(buf)
        assert isinstance(text, str)
    # declared /Length corrupted -> endstream resync still exact
    bad = good.replace(b"/Length ", b"/Length 7")
    assert extract_pdf(bad)[0] == extract_pdf(good)[0]
    # unterminated literal string -> best effort, no raise
    t, *_ = extract_pdf(good.replace(b") Tj", b"  Tj", 1))
    assert isinstance(t, str)


def test_pdf_page_order_comes_from_kids_not_byte_order():
    from tempeh_parser_ray.sources.pdf_corpus import (
        build_pdf, expected_pdf_text, extract_pdf)

    # 13 lines -> 3 pages; content streams are written in REVERSE page
    # order inside the file, so only /Kids-driven extraction matches
    text = "w" + " w" * (8 * 13 - 1)
    toks = [f"t{i}" for i in range(8 * 13)]
    text = " ".join(toks)
    pdf = build_pdf(text)
    got, n_pages, _, err = extract_pdf(pdf)
    assert err == "" and n_pages == 3
    assert got == expected_pdf_text(text)
    # stream-order concatenation would NOT produce reading order:
    # page-3's stream (t96, literal TJ line) precedes page-1's (t24,
    # literal Tj line) in the file bytes
    assert pdf.find(b"t96") < pdf.find(b"t24")


# ---------------------------------------------------------------------------
# URL parsing


def test_url_parser_fields_and_hostile_inputs():
    from tempeh_parser_ray.functions.urls import parse_url_batch

    urls = [
        "https://www.acme-site.co.uk:8080/en/a1/p7?ref=x&q=y",
        "http://solo.example.com/",
        "https://bare.net",
        "ftp://files.corp.com.cn/a/b/c/d",
        "not a url at all",
        "",
        "https://trail.org/a/b/",
    ]
    out = parse_url_batch(pa.table({"url": pa.array(urls, pa.string())}))
    rows = out.to_pylist()
    assert [r["registered_domain"] for r in rows] == [
        "acme-site.co.uk", "example.com", "bare.net", "corp.com.cn",
        "", "", "trail.org"]
    assert [r["has_port"] for r in rows] == [1, 0, 0, 0, 0, 0, 0]
    assert [r["path_depth"] for r in rows] == [3, 0, 0, 4, 0, 0, 2]
    assert [r["n_query_params"] for r in rows] == [2, 0, 0, 0, 0, 0, 0]
    assert rows[4]["host"] == "" and rows[4]["scheme"] == ""


def test_crawl_url_round_trips_through_parser():
    from tempeh_parser_ray.functions.urls import parse_url_batch
    from tempeh_parser_ray.sources.synthetic import crawl_url

    ids = list(range(0, 60))
    urls = [crawl_url(d, "en", f"src{d % 20}") for d in ids]
    out = parse_url_batch(pa.table({"url": pa.array(urls, pa.string())}))
    for d, r in zip(ids, out.to_pylist()):
        assert r["scheme"] == ("http" if d % 3 == 0 else "https")
        assert r["has_port"] == (1 if d % 7 == 0 else 0)
        assert r["path_depth"] == (2 if d % 6 == 0 else 3)
        assert r["n_query_params"] == d % 3
        assert r["registered_domain"].startswith(f"src{d % 20}-site.")


def test_resolve_url_batch_rfc3986_cases():
    """RFC 3986 §5.4 reference-resolution examples (base with a path),
    plus the crawl-realistic cases: protocol-relative, query-only,
    dot-segment cleanup, ports, and malformed bases."""
    from tempeh_parser_ray.functions.urls import resolve_url_batch

    base = "https://h.example.org:8080/b/c/d;p?q"
    cases = [
        # (href, expected) — the §5.4.1 normal examples that our case
        # masks cover (no bare-fragment/empty-href rows in the crawl
        # path; LinksBatch never emits those)
        ("g:h", "g:h"),
        ("g", f"https://h.example.org:8080/b/c/g"),
        ("g/", f"https://h.example.org:8080/b/c/g/"),
        ("/g", f"https://h.example.org:8080/g"),
        ("//other.net/x", "https://other.net/x"),
        ("?y", "https://h.example.org:8080/b/c/d;p?y"),
        ("g?y", "https://h.example.org:8080/b/c/g?y"),
        # §5.4.1 dot-segment examples
        ("./g", "https://h.example.org:8080/b/c/g"),
        ("..", "https://h.example.org:8080/b/"),
        ("../", "https://h.example.org:8080/b/"),
        ("../g", "https://h.example.org:8080/b/g"),
        ("../..", "https://h.example.org:8080/"),
        ("../../g", "https://h.example.org:8080/g"),
        # §5.4.2 abnormal: pops past root clamp at root
        ("../../../g", "https://h.example.org:8080/g"),
        ("/./g", "https://h.example.org:8080/g"),
        ("/../g", "https://h.example.org:8080/g"),
        ("mailto:x@example.com", "mailto:x@example.com"),
    ]
    got = resolve_url_batch(
        pa.array([base] * len(cases), pa.string()),
        pa.array([c[0] for c in cases], pa.string()))
    assert got.to_pylist() == [c[1] for c in cases]

    # malformed / empty base: href passes through unchanged
    got2 = resolve_url_batch(
        pa.array(["not a url", "", None], pa.string()),
        pa.array(["/a", "b/c", "x"], pa.string()))
    assert got2.to_pylist() == ["/a", "b/c", "x"]

    # base with no path: directory is "/"
    got3 = resolve_url_batch(
        pa.array(["http://p.net"], pa.string()),
        pa.array(["a/b"], pa.string()))
    assert got3.to_pylist() == ["http://p.net/a/b"]


# ---------------------------------------------------------------------------
# DSIR importance weights


def test_dsir_target_slice_scores_higher(ray_session):
    from tempeh_parser_ray.pipelines import queries as q

    out = pa.concat_tables(list(q.dsir_weights(SF_DIR).iter_batches(
        batch_format="pyarrow", batch_size=None)))
    docs = pa.concat_tables(list(
        ray_session.data.read_parquet(
            f"{SF_DIR}/documents.parquet",
            columns=["doc_id", "lang"]).iter_batches(
            batch_format="pyarrow", batch_size=None)))
    lang = dict(zip(docs.column("doc_id").to_pylist(),
                    docs.column("lang").to_pylist()))
    tgt, rest = [], []
    for r in out.to_pylist():
        (tgt if lang[r["doc_id"]] == "en" else rest).append(
            r["dsir_logw"])
    assert tgt and rest
    # the defining DSIR property: target-like docs score higher on
    # average than the raw remainder
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_dsir_partition_invariant(ray_session):
    from tempeh_parser_ray.functions.curation import dsir_weights

    rows = [{"doc_id": i,
             "text": ("hello target tokens common " if i % 2 == 0
                      else "autre langue mots rares ") + f"t{i % 5}",
             "lang": "en" if i % 2 == 0 else "fr"}
            for i in range(20)]
    a = {r["doc_id"]: r["dsir_logw"] for b in dsir_weights(
        ray_session.data.from_items(rows).repartition(1)).iter_batches(
            batch_format="pyarrow", batch_size=None)
        for r in b.to_pylist()}
    b_ = {r["doc_id"]: r["dsir_logw"] for b in dsir_weights(
        ray_session.data.from_items(rows).repartition(7)).iter_batches(
            batch_format="pyarrow", batch_size=None)
        for r in b.to_pylist()}
    assert a == b_
    assert all(a[i] > a[i + 1] for i in range(0, 18, 2))


# ---------------------------------------------------------------------------
# link extraction


def test_links_batch_semantics():
    from tempeh_parser_ray.stages.parse_stage import LinksBatch

    html = [
        # nested markup inside the anchor: text concatenates in order;
        # duplicate href: LAST value wins (reference P1 rule)
        b'<a href="/x" href="/y">A <b>deep</b> text</a>',
        b"<p>no links here</p>",
        b'<div><a>bare</a><a href="/z"></a></div>',
        None,
        b'<a href="/outer">out <a href="/inner">in</a></a>',
    ]
    batch = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                      "html": pa.array(html, pa.binary())})
    out = LinksBatch(passthrough=("doc_id",))(batch).to_pylist()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["link_idx"], r["href"], r["anchor"]))
    assert by_doc[0] == [(0, "/y", "A deep text")]
    assert 1 not in by_doc and 3 not in by_doc
    assert by_doc[2] == [(0, "", "bare"), (1, "/z", "")]
    # nested <a>: the reference's tree builder nests the second anchor
    # inside the first; its text belongs to the NEAREST enclosing <a>
    assert by_doc[4] == [(0, "/outer", "out "), (1, "/inner", "in")]


# ---------------------------------------------------------------------------
# running cumulative sum


def test_running_total_cross_bucket_carries(ray_session):
    import datetime

    from tempeh_parser_ray.pipelines.windows import running_total_events

    # 2 users x 9 events spread over hours; tiny bucket (1h) forces
    # carries across many populated buckets
    base = datetime.datetime(2025, 3, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        for k in range(9):
            rows.append({"event_id": eid, "user_id": u,
                         "ts": base + datetime.timedelta(
                             minutes=40 * k + u),
                         "value": float(k + 1) * (1 if u == 1 else -0.5)})
            eid += 1
    ds = ray_session.data.from_items(rows).repartition(4)
    out = {r["event_id"]: r["running_micros"]
           for b in running_total_events(
               ds, bucket_us=3_600_000_000).iter_batches(
               batch_format="pyarrow", batch_size=None)
           for r in b.to_pylist()}
    # reference: plain per-user prefix in (ts, event_id) order
    expect = {}
    for u in (1, 2):
        run = 0
        for r in sorted((r for r in rows if r["user_id"] == u),
                        key=lambda r: (r["ts"], r["event_id"])):
            run += round(r["value"] * 1_000_000)
            expect[r["event_id"]] = run
    assert out == expect


# ---------------------------------------------------------------------------
# PageRank


def _ref_pagerank(edge_list, damping=0.85, n_iters=5):
    """Dense numpy reference of the same formula."""
    nodes = sorted({u for e in edge_list for u in e[:2]})
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for s, d_, ww in edge_list:
        w[pos[s], pos[d_]] += ww
    deg = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        contrib = np.zeros(n)
        for i in range(n):
            if deg[i]:
                contrib += r[i] * w[i] / deg[i]
        r = (1 - damping) / n + damping * contrib
    return {v: r[pos[v]] for v in nodes}


def _pagerank_rows(ray, edge_list, **kw):
    from tempeh_parser_ray.functions.graph import pagerank

    ds = ray.data.from_items(
        [{"src": s, "dst": d, "weight": w}
         for s, d, w in edge_list]).repartition(3)
    out = pagerank(ds, **kw)
    return {r["node"]: r["rank"]
            for b in out.iter_batches(batch_format="pyarrow",
                                      batch_size=None)
            for r in b.to_pylist()}


def test_pagerank_matches_dense_reference(ray_session):
    edges = [(0, 1, 1), (1, 2, 2), (2, 0, 1), (0, 2, 3), (3, 0, 1),
             (2, 3, 1)]
    got = _pagerank_rows(ray_session, edges)
    ref = _ref_pagerank(edges)
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-12


def test_pagerank_join_path_equals_broadcast(ray_session):
    edges = [(i, (i * 3 + 1) % 7, 1 + i % 2) for i in range(21)]
    broad = _pagerank_rows(ray_session, edges)
    joined = _pagerank_rows(ray_session, edges, broadcast_limit=0,
                            join_parts=2)
    assert set(broad) == set(joined)
    for v in broad:
        assert abs(broad[v] - joined[v]) < 1e-12


# --- Naive-Bayes classifier (train + apply) -------------------------------

NB_DOCS = [
    # three classes with overlapping vocabulary; doc 40 is pure overlap
    # so the PRIOR decides it; ties in likelihoods exercise the
    # smaller-label break.
    (10, "red red blue fish", "en"),
    (11, "red blue blue fish fish fish", "en"),
    (12, "fish swims fast", "en"),
    (20, "rouge bleu poisson", "fr"),
    (21, "rouge rouge poisson poisson", "fr"),
    (30, "rot blau fisch", "de"),
    (40, "fish poisson fisch", "en"),
    (41, "   ", "fr"),  # whitespace-only: excluded everywhere
]

_NB_S = 10**9


def _ref_nb(docs):
    """Independent fixed-point NB formulation (pure-Python ints)."""
    from collections import Counter

    used = [(d, t.split(), c) for d, t, c in docs if t.split()]
    ntc: Counter = Counter()
    n_c: Counter = Counter()
    d_c: Counter = Counter()
    vocab = set()
    for _, toks, c in used:
        d_c[c] += 1
        for t in toks:
            ntc[(c, t)] += 1
            n_c[c] += 1
            vocab.add(t)
    V, D = len(vocab), sum(d_c.values())
    classes = sorted(d_c)
    out = {}
    for did, toks, true_c in used:
        scores = []
        for c in classes:
            s = (d_c[c] * _NB_S) // D
            for t in toks:
                s += ((ntc[(c, t)] + 1) * _NB_S) // (n_c[c] + V)
            scores.append(s)
        best = max(range(len(classes)),
                   key=lambda j: (scores[j], -j))  # tie -> smaller c
        out[did] = (true_c, classes[best], scores[best])
    return out


def _run_nb(ray, docs, **kw):
    from tempeh_parser_ray.functions import nbayes as _nb

    ds = ray.data.from_items(
        [{"doc_id": d, "text": t, "lang": c}
         for d, t, c in docs]).repartition(3)
    out = _nb.nb_lang_classify(ds, **kw)
    rows = {}
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            rows[r["doc_id"]] = (r["lang"], r["pred_lang"],
                                 r["pred_score"])
    return rows


def test_nb_matches_integer_reference(ray_session):
    assert _run_nb(ray_session, NB_DOCS) == _ref_nb(NB_DOCS)


def test_nb_join_path_equals_broadcast(ray_session):
    broad = _run_nb(ray_session, NB_DOCS)
    joined = _run_nb(ray_session, NB_DOCS, broadcast_limit=0,
                     join_parts=2)
    assert broad == joined  # integer scores: bit-exact across paths


def test_nb_partition_invariance(ray_session):
    from tempeh_parser_ray.functions import nbayes as _nb

    base = _run_nb(ray_session, NB_DOCS)
    ds1 = ray_session.data.from_items(
        [{"doc_id": d, "text": t, "lang": c} for d, t, c in NB_DOCS])
    out = {}
    for b in _nb.nb_lang_classify(ds1).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            out[r["doc_id"]] = (r["lang"], r["pred_lang"],
                                r["pred_score"])
    assert out == base


def test_nb_all_empty_corpus(ray_session):
    from tempeh_parser_ray.functions import nbayes as _nb

    ds = ray_session.data.from_items(
        [{"doc_id": 1, "text": "", "lang": "en"},
         {"doc_id": 2, "text": None, "lang": "fr"}])
    out = _nb.nb_lang_classify(ds)
    assert out.count() == 0
    assert sorted(out.schema().names) == ["doc_id", "lang",
                                          "pred_lang", "pred_score"]


# --- PMI collocations + inverted index -------------------------------------

def test_pmi_bigrams_brute_force(ray_session, tmp_path):
    import math
    from collections import Counter

    import duckdb
    import pyarrow.parquet as pq

    texts = [("a b a b a b c d", "en"), ("a b a b x y", "en"),
             ("c d c d c d z z", "fr"), ("a b c d a b", "de")]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array([t for t, _ in texts], pa.string()),
        "lang": pa.array([l for _, l in texts], pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    from tempeh_parser_ray.pipelines import queries as q
    out = q.pmi_bigrams(str(tmp_path)).to_pylist()

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t, _ in texts:
        toks = t.split()
        uni.update(toks)
        bi.update(map(" ".join, zip(toks, toks[1:])))
    nu, nb = sum(uni.values()), sum(bi.values())
    ref = []
    for g, n in bi.items():
        if n >= 5:
            a, b = g.split(" ")
            ref.append((g, n,
                        ((float(n) * nu) * nu)
                        / ((float(nb) * uni[a]) * uni[b])))
    ref.sort(key=lambda r: (-r[2], r[0]))
    assert [(r["bigram"], r["n_pair"], r["pmi_ratio"])
            for r in out] == ref[:20]
    assert all(r["n_pair"] >= 5 for r in out)


def test_inverted_index_brute_force(ray_session):
    from tempeh_parser_ray.pipelines import queries as q

    out = {r["token"]: (r["df"], r["postings"])
           for r in q.inverted_index(SF_DIR).to_pylist()}

    import duckdb
    ref_rows = duckdb.sql(f"""
        WITH tok AS (
            SELECT DISTINCT doc_id, token FROM (
                SELECT doc_id, unnest(string_split_regex(trim(text),
                       '\\s+')) AS token
                FROM read_parquet('{SF_DIR}/documents.parquet')
                WHERE trim(text) <> ''))
        SELECT token, COUNT(*) df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                   AS postings
        FROM tok GROUP BY token""").fetchall()
    ref = {t: (df, p) for t, df, p in ref_rows}
    assert out == ref


def test_pmi_all_empty_corpus(ray_session, tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["", None], pa.string()),
        "lang": pa.array(["en", "fr"], pa.string()),
        "source": pa.array(["s", "s"], pa.string()),
    }), tmp_path / "documents.parquet")
    from tempeh_parser_ray.pipelines import queries as q
    out = q.pmi_bigrams(str(tmp_path))
    assert out.num_rows == 0
    assert out.schema.names == ["bigram", "n_pair", "pmi_ratio"]


def test_web_pipeline_semantics(ray_session):
    """HTML -> extract -> gate -> dedup -> pack, checked against an
    independent per-stage reimplementation over the closed-form
    extraction."""
    import duckdb

    from tempeh_parser_ray.pipelines import queries as q

    got = {}
    for b in q.web_pipeline(SF_DIR).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            got[r["doc_id"]] = (r["n_tokens"], r["chunk_id"],
                                r["chunk_offset"])

    rows = duckdb.sql(f"""
        SELECT doc_id, lang, source, text
        FROM read_parquet('{SF_DIR}/documents.parquet')""").fetchall()
    corpus = []
    for did, lang, source, text in rows:
        xt = f"home {lang}{source} #{did}{text}contact: mail"
        corpus.append((did, xt))
        if did % 7 == 0:
            corpus.append((did + 700000, xt))
    gated = [(d, xt, len(xt.split())) for d, xt in corpus
             if len(xt.split()) >= 16]
    seen: dict[str, int] = {}
    for d, xt, _ in sorted(gated):
        seen.setdefault(xt, d)
    kept = sorted((d, n) for d, xt, n in gated if seen[xt] == d)
    ref = {}
    before = 0
    for d, n in kept:
        ref[d] = (n, before // 64, before % 64)
        before += n
    assert got == ref
    # the stages demonstrably acted: clones were dropped, gate filtered
    assert all(d < 700000 for d in got)
    assert len(got) < len(corpus)


def test_events_value_outliers_paths_and_reference(ray_session):
    from tempeh_parser_ray.pipelines import queries as q

    def run(**kw):
        out = set()
        for b in q.events_value_outliers(SF_DIR, **kw).iter_batches(
                batch_format="pyarrow", batch_size=None):
            out.update(b.column("event_id").to_pylist())
        return out

    broad = run()
    joined = run(broadcast_limit=0, join_parts=2)
    assert broad == joined and broad  # int math: bit-exact across paths

    # brute-force integer reference over the same parquet
    import duckdb
    ref = {r[0] for r in duckdb.sql(f"""
        WITH e AS (SELECT event_id, user_id,
                          CAST(round(value*100) AS BIGINT) v
                   FROM read_parquet('{SF_DIR}/events.parquet')),
        s AS (SELECT user_id, COUNT(*) n, SUM(v) sv, SUM(v*v) sv2
              FROM e GROUP BY user_id)
        SELECT event_id FROM e JOIN s USING (user_id)
        WHERE (s.n*e.v - s.sv)*(s.n*e.v - s.sv)
              > 4*(s.n*s.sv2 - s.sv*s.sv)""").fetchall()}
    assert broad == ref


def test_bpe_encode_matches_training_order_replay(ray_session):
    """Independent formulation: replaying the merges IN TRAINING ORDER
    over each word must equal the lowest-rank-first encode."""
    from tempeh_parser_ray.functions import textstats as _ts
    from tempeh_parser_ray.pipelines import queries as q
    from tempeh_parser_ray.pipelines.queries import (
        BPE_N_MERGES, _documents)

    got = {}
    for b in q.bpe_encode(SF_DIR).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            got[r["doc_id"]] = (r["n_tokens"], r["n_bpe_tokens"],
                                r["compression_bp"])

    import duckdb
    rows = duckdb.sql(f"""
        SELECT doc_id, text
        FROM read_parquet('{SF_DIR}/documents.parquet')""").fetchall()
    from collections import Counter
    wf: Counter = Counter()
    for _, t in rows:
        wf.update((t or "").split())
    merges = _ts.bpe_merges_from_word_freq(dict(wf), BPE_N_MERGES)

    def replay(word):
        sym = list(word)
        for la, rb, _ in merges:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == la and sym[i + 1] == rb:
                    sym[i:i + 2] = [la + rb]
                else:
                    i += 1
        return sym

    for did, t in rows:
        toks = (t or "").split()
        nb = sum(len(replay(w)) for w in toks)
        nch = len(t or "")
        comp = (nb * 10000) // max(nch, 1) if nch > 0 else 0
        assert got[did] == (len(toks), nb, comp), did
    assert set(got) == {d for d, _ in rows}


# ---------------------------------------------------------------------------
# Epoch shuffle / head metadata / scalar quantization


def test_epoch_shuffle_is_a_seeded_permutation(ray_session):
    import ray
    from tempeh_parser_ray.functions.shuffle import epoch_shuffle

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(0, 400, 3)), pa.int64())}))
    out = pa.concat_tables(list(epoch_shuffle(
        docs, seed="s1", shard_size=16).iter_batches(
        batch_format="pyarrow", batch_size=None)))
    n = out.num_rows
    ranks = sorted(out.column("global_rank").to_pylist())
    assert ranks == list(range(n))          # exact permutation
    by_id = dict(zip(out.column("doc_id").to_pylist(),
                     out.column("global_rank").to_pylist()))
    # deterministic: a second run gives identical ranks
    out2 = pa.concat_tables(list(epoch_shuffle(
        docs, seed="s1", shard_size=16).iter_batches(
        batch_format="pyarrow", batch_size=None)))
    assert dict(zip(out2.column("doc_id").to_pylist(),
                    out2.column("global_rank").to_pylist())) == by_id
    # a different seed gives a different permutation
    out3 = pa.concat_tables(list(epoch_shuffle(
        docs, seed="s2", shard_size=16).iter_batches(
        batch_format="pyarrow", batch_size=None)))
    assert dict(zip(out3.column("doc_id").to_pylist(),
                    out3.column("global_rank").to_pylist())) != by_id
    # shard layout is rank//size, rank%size
    for r in out.to_pylist():
        assert r["shard"] == r["global_rank"] // 16
        assert r["shard_pos"] == r["global_rank"] % 16
    # matches the straightforward single-machine formulation
    import hashlib
    ids = docs.take_all()
    want = sorted((hashlib.md5(f"s1:{r['doc_id']}".encode()).hexdigest(),
                   r["doc_id"]) for r in ids)
    assert [d for _, d in want] == [
        i for i, _ in sorted(by_id.items(), key=lambda kv: kv[1])]


def test_metadata_batch_rules_and_hostile_inputs():
    from tempeh_parser_ray.stages.dom_stage import MetadataBatch

    pages = [
        # duplicate metas: FIRST wins; <title> is RAW TEXT (reference
        # L11 semantics) so embedded markup reads as literal text
        b'<html lang="de"><head><title>A<b>B</b>C</title>'
        b'<meta name="description" content="first">'
        b'<meta name="description" content="second">'
        b'<link rel="canonical" href="https://c/1">'
        b'<link rel="canonical" href="https://c/2"></head></html>',
        b"<html><body>no head at all</body></html>",
        b"",
        None,
        # attrs on meta without name/property are ignored
        b'<head><meta charset=utf-8><meta property="og:title" '
        b'content="og!"></head>',
    ]
    out = MetadataBatch(passthrough=())(pa.table({
        "html": pa.array(pages, pa.binary())}))
    rows = out.to_pylist()
    assert rows[0]["title"] == "A<b>B</b>C"
    assert rows[0]["description"] == "first"
    assert rows[0]["canonical"] == "https://c/1"
    assert rows[0]["html_lang"] == "de"
    assert rows[1] == {f: "" for f in rows[1]}
    assert rows[2] == rows[3] == rows[1]
    assert rows[4]["og_title"] == "og!" and rows[4]["title"] == ""


def test_scalar_quantize_bounds_and_partition_invariance(ray_session):
    import numpy as np
    import ray
    from tempeh_parser_ray.functions.similarity import scalar_quantize

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 5).astype(np.float32)
    vecs[:, 3] = 2.5           # constant dim -> q = 0
    tbl = pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})

    def run(n_parts):
        ds = ray.data.from_arrow(tbl).repartition(n_parts)
        out = pa.concat_tables(list(scalar_quantize(ds).iter_batches(
            batch_format="pyarrow", batch_size=None)))
        return {(r["vec_id"], r["pos"]): r["q"] for r in out.to_pylist()}

    q1 = run(1)
    assert run(7) == q1                     # partition-invariant
    qs = np.asarray(list(q1.values()))
    assert qs.min() >= 0 and qs.max() <= 255
    for pos in range(5):
        col = [q1[(i, pos)] for i in range(60)]
        if pos == 3:
            assert set(col) == {0}          # constant dim
        else:
            # the min component hits 0 and the max hits 255 exactly
            iv = np.floor(vecs[:, pos].astype(np.float64) * 1e5 + 0.5)
            assert col[int(np.argmin(iv))] == 0
            assert col[int(np.argmax(iv))] == 255


def test_decode_entities_single_pass_and_hostile():
    from tempeh_parser_ray.functions.textstats import \
        decode_entities_batch

    texts = [
        "a &amp; b", "&lt;tag&gt;", "&#65;&#x42;&#x1F600;",
        "&amp;lt; stays five chars",          # no double decode
        "&unknown; &fake123; &amp",           # unknown / unterminated
        "&#0; &#xD800; &#1114112;",           # invalid codepoints
        "no entities at all", "", None,
        "&copy;&euro;&deg;",
    ]
    out = decode_entities_batch(pa.table({
        "text": pa.array(texts, pa.string())}))
    got = out.column("decoded").to_pylist()
    assert got[0] == "a & b"
    assert got[1] == "<tag>"
    assert got[2] == "AB\U0001F600"
    assert got[3] == "&lt; stays five chars"
    assert got[4] == "&unknown; &fake123; &amp"
    assert got[5] == "&#0; &#xD800; &#1114112;"
    assert got[6] == "no entities at all"
    assert got[7] == "" and got[8] is None
    assert got[9] == "©€°"
    # python reference agreement on the supported named set + numerics
    import html
    for t, g in zip(texts, got):
        if t and "&" in t and "unknown" not in t and "fake" not in t \
                and "&amp" != t.split()[-1] and "#0;" not in t:
            assert g == html.unescape(t), t


def test_fetch_slots_bucket_carries_match_brute_rank(ray_session):
    import ray
    from tempeh_parser_ray.functions.webops import fetch_slots

    # 3 hosts, interleaved ids; bucket_size=4 forces many carry rows
    rows = [{"doc_id": i, "host": f"h{i % 3}"} for i in range(50)]
    rows += [{"doc_id": 100 + i, "host": "h0"} for i in range(13)]
    ds = ray.data.from_items(rows).repartition(5)
    out = pa.concat_tables(list(fetch_slots(
        ds, bucket_size=4).iter_batches(
        batch_format="pyarrow", batch_size=None)))
    got = {(r["host"], r["doc_id"]): r["slot"] for r in out.to_pylist()}
    # brute force: rank within host by doc_id
    byhost: dict[str, list[int]] = {}
    for r in rows:
        byhost.setdefault(r["host"], []).append(r["doc_id"])
    want = {(h, d): i for h, ids in byhost.items()
            for i, d in enumerate(sorted(ids))}
    assert got == want
    # partition invariance
    out1 = pa.concat_tables(list(fetch_slots(
        ray.data.from_items(rows).repartition(1),
        bucket_size=4).iter_batches(
        batch_format="pyarrow", batch_size=None)))
    assert {(r["host"], r["doc_id"]): r["slot"]
            for r in out1.to_pylist()} == want


def test_canonicalize_url_tracking_strip():
    from tempeh_parser_ray.functions.urls import canonicalize_url_batch

    cases = [
        ("https://a/p?utm_source=x", "https://a/p"),
        ("https://a/p?utm_source=x&q=2", "https://a/p?q=2"),
        ("https://a/p?q=2&utm_medium=y", "https://a/p?q=2"),
        ("https://a/p?ref=s&q=t1", "https://a/p?ref=s&q=t1"),
        ("https://a/p#frag", "https://a/p"),
        ("https://a/p?utm_a=1&utm_b=2", "https://a/p"),
        ("https://a/p?q=1&utm_a=2&r=3", "https://a/p?q=1&r=3"),
        ("https://a/p?utm_a=1#f", "https://a/p"),
        # separator-anchored: a param whose name merely CONTAINS utm_
        # must survive; consecutive utm runs mid-query collapse cleanly
        ("https://a/p?xutm_a=1", "https://a/p?xutm_a=1"),
        ("https://a/p?q=1&utm_a=2&utm_b=3&r=4", "https://a/p?q=1&r=4"),
        ("https://a/p?utm_a=1&q=2&utm_b=3", "https://a/p?q=2"),
        ("", ""),
        (None, None),
    ]
    got = canonicalize_url_batch(pa.array(
        [c[0] for c in cases], pa.string())).to_pylist()
    assert got == [c[1] for c in cases]


def test_embedding_cov_exact_and_partition_invariant(ray_session):
    import ray
    from tempeh_parser_ray.functions.similarity import embedding_cov

    rng = np.random.RandomState(5)
    mat = rng.randn(45, 6).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(45), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32()))})

    def run(parts):
        out = embedding_cov(
            ray.data.from_arrow(tbl).repartition(parts))
        return {(r["pos_i"], r["pos_j"]): r["cov"]
                for r in out.to_pylist()}

    got = run(1)
    assert run(9) == got                       # partition-invariant
    # exact reference: integer moments over the fixed-point matrix
    iv = np.floor(mat.astype(np.float64) * 10_000 + 0.5).astype(object)
    n = len(iv)
    for i in range(6):
        for j in range(i, 6):
            sij = int(sum(iv[:, i] * iv[:, j]))
            si, sj = int(sum(iv[:, i])), int(sum(iv[:, j]))
            want = float(n * sij - si * sj) / float(n * n)
            assert got[(i, j)] == want, (i, j)
    assert len(got) == 6 * 7 // 2


# ---------------------------------------------------------------------------
# JSONL export sink


def test_jsonl_sink_round_trip_idempotent_and_pruned(ray_session, tmp_path):
    import json

    import duckdb
    import ray
    from tempeh_parser_ray.sinks.jsonl_sink import write_jsonl_sharded

    rows = [{"doc_id": i, "text": f"t{i} é", "lang": "en"}
            for i in range(37)]
    ds = ray.data.from_items(rows).repartition(4)
    out = tmp_path / "exp"
    m1 = write_jsonl_sharded(ds, out)
    assert m1["n_rows"] == 37 and (out / "_DONE").exists()
    files1 = sorted(f.name for f in out.glob("part-*.jsonl"))
    assert files1 == sorted(s["file"] for s in m1["shards"])

    # round trip through an independent reader
    got = duckdb.sql(
        f"select doc_id, text, lang from read_json_auto('{out}/part-*.jsonl')"
        " order by doc_id").fetchall()
    assert got == [(r["doc_id"], r["text"], r["lang"]) for r in rows]

    # idempotent: a re-run writes the identical file set, no dupes
    m2 = write_jsonl_sharded(ds, out)
    files2 = sorted(f.name for f in out.glob("part-*.jsonl"))
    assert files2 == files1 and m2["n_rows"] == 37

    # a SHRUNKEN composition prunes the stale shard files
    m3 = write_jsonl_sharded(
        ray.data.from_items(rows[:9]).repartition(1), out)
    files3 = sorted(f.name for f in out.glob("part-*.jsonl"))
    assert files3 == sorted(s["file"] for s in m3["shards"])
    n = duckdb.sql(
        f"select count(*) from read_json_auto('{out}/part-*.jsonl')"
    ).fetchone()[0]
    assert n == 9
    assert json.loads((out / "manifest.json").read_text())["n_rows"] == 9


def test_jsonl_sink_string_key_names_deterministic(ray_session, tmp_path):
    # shard names hash canonical VALUE bytes — a string key column
    # must give the same file set across runs (object-dtype
    # .tobytes() would have hashed pointers)
    import ray
    from tempeh_parser_ray.sinks.jsonl_sink import write_jsonl_sharded

    rows = [{"url": f"https://x/{i}", "text": f"t{i}"}
            for i in range(23)]
    ds = ray.data.from_items(rows).repartition(3)
    out1, out2 = tmp_path / "a", tmp_path / "b"
    m1 = write_jsonl_sharded(ds, out1, key_col="url")
    m2 = write_jsonl_sharded(ds, out2, key_col="url")
    assert sorted(s["file"] for s in m1["shards"]) \
        == sorted(s["file"] for s in m2["shards"])
    assert m1["n_rows"] == 23


def test_jsonl_sink_shard_names_collision_free(ray_session, tmp_path):
    # the name hash length-prefixes each key value: blocks with keys
    # ['a|b'] and ['a', 'b'] must get DIFFERENT shard files (a bare
    # '|'.join mapped both to one name, silently overwriting a shard)
    import pyarrow as pa
    import ray
    from tempeh_parser_ray.sinks.jsonl_sink import write_jsonl_sharded

    t1 = pa.table({"url": ["a|b"], "text": ["one"]})
    t2 = pa.table({"url": ["a", "b"], "text": ["two", "three"]})
    ds = ray.data.from_arrow([t1, t2])  # exactly two blocks
    m = write_jsonl_sharded(ds, tmp_path / "c", key_col="url")
    names = [s["file"] for s in m["shards"]]
    assert len(set(names)) == len(names) == 2
    assert m["n_rows"] == 3
    import duckdb
    n = duckdb.sql(
        f"select count(*) from read_json_auto('{tmp_path}/c/part-*.jsonl')"
    ).fetchone()[0]
    assert n == 3


def test_dsir_bucket_cache_independent_of_n_buckets():
    # the per-process memo stores the raw 32-bit hash, so a second
    # call with a DIFFERENT n_buckets must not reuse stale mod values
    import hashlib

    from tempeh_parser_ray.functions.curation import _dsir_bucket

    raw = int(hashlib.md5(b"needle").hexdigest()[:8], 16)
    assert _dsir_bucket("needle", 1024) == raw % 1024
    assert _dsir_bucket("needle", 7) == raw % 7
    assert _dsir_bucket("needle", 1024) == raw % 1024


def test_resolve_url_batch_differential_vs_urljoin():
    """Differential oracle: urllib.parse.urljoin IS an RFC 3986 §5
    implementation — fuzz the documented input domain (absolute /
    protocol-relative / root-relative / query-only / relative hrefs,
    incl. dot-segment stacks; no fragments, no empty hrefs) and
    require byte-identical agreement."""
    from urllib.parse import urljoin

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tempeh_parser_ray.functions.urls import resolve_url_batch

    seg = st.text(alphabet="abcXY019-_.", min_size=1, max_size=5
                  ).filter(lambda s: s.strip(".") != "")
    base = st.builds(
        lambda sch, host, port, segs, q:
            f"{sch}://{host}{port}/" + "/".join(segs)
            + ("?" + q if q else ""),
        st.sampled_from(["http", "https"]),
        st.sampled_from(["h.example.org", "x.co.uk", "p1.net"]),
        st.sampled_from(["", ":8080", ":80"]),
        st.lists(seg, min_size=0, max_size=4),
        st.sampled_from(["", "q=1", "a=b&c=d"]))
    rel = st.builds(
        lambda dots, segs, tail, q:
            "/".join(dots + segs) + tail
            + ("?" + q if (q and (dots or segs or tail)) else q and "?" + q or ""),
        st.lists(st.sampled_from(["..", "."]), min_size=0, max_size=3),
        st.lists(seg, min_size=0, max_size=3),
        st.sampled_from(["", "/"]),
        st.sampled_from(["", "y=2"]))
    href = st.one_of(
        rel.filter(lambda h: h not in ("", "/")),
        st.builds(lambda p: "/" + p, st.lists(seg, max_size=3).map("/".join)),
        st.sampled_from(["//other.net/x", "mailto:a@b", "g:h",
                         "?y", "/./g", "/../g", "../..", "."]))

    @settings(max_examples=300, deadline=None)
    @given(b=base, h=href)
    def check(b, h):
        got = resolve_url_batch(
            pa.array([b], pa.string()), pa.array([h], pa.string())
        ).to_pylist()[0]
        assert got == urljoin(b, h), (b, h, got, urljoin(b, h))

    check()

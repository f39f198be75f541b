"""Adversarial / scale-shaped inputs through the core and the full Ray
pipeline: deep nesting, tag storms, giant pages, hostile bytes. Guards
against crashes and quadratic behavior."""

from __future__ import annotations

import time

import pyarrow as pa

from tempeh_parser_ray.core import extract as E
from tempeh_parser_ray.core import parser as P


def test_deep_nesting_10k():
    n = 10_000
    html = ("<d>" * n + "text" + "</d>" * n).encode()
    doc = P.parse_bytes(html)
    assert doc.error is None
    assert doc.n_nodes == n + 1
    ex = E.extract(doc)
    assert ex.text == "text"


def test_unclosed_tag_storm():
    html = ("<p>" * 5000 + "x").encode()
    doc = P.parse_bytes(html)
    assert doc.error is None
    assert E.extract(doc).text == "x"


def test_stray_closers_storm():
    html = ("</p>" * 5000 + "x").encode()
    doc = P.parse_bytes(html)
    assert doc.error is None and doc.n_nodes == 1


def test_huge_attribute_value():
    v = "a" * 1_000_000
    doc = P.parse_bytes(f'<div data-x="{v}">t</div>'.encode())
    assert doc.error is None
    assert doc.attr_value[0] == v


def test_nul_mid_document_truncates():
    doc = P.parse_bytes(b"<div>ab\x00cd</div>")
    assert E.extract(doc).text == "ab"  # reference: NUL = EOF


def test_megabyte_text_run_is_linear():
    base = b"<p>" + b"y" * 100_000 + b"</p>"
    big = b"<p>" + b"y" * 10_000_000 + b"</p>"
    t0 = time.time(); P.parse_bytes(base); small_t = time.time() - t0
    t0 = time.time(); doc = P.parse_bytes(big); big_t = time.time() - t0
    assert doc.n_nodes == 2
    # 100x the bytes must stay well under 1000x the time (linear-ish)
    assert big_t < max(small_t, 0.001) * 1000


def test_hostile_bytes_never_crash():
    import itertools
    samples = [
        b"\xff\xfe" + b"\x00" * 7,           # utf-16 BOM + junk
        b"\x00\x00\xfe\xff" + b"\xff" * 9,   # utf-32 BOM + overflow cps
        b"<" * 1000,
        b"<!--" + b"-" * 1000,
        b"<!DOCTYPE",
        b"<a b='",
        b"<script>" + b"\\" * 999,
        bytes(itertools.islice(itertools.cycle(range(256)), 4096)),
    ]
    for s in samples:
        doc = P.parse_bytes(s)           # must not raise
        E.extract(doc)                    # must not raise


def test_giant_page_isolated_by_rebatcher(ray_session):
    """A 20MB page among 1KB pages: the byte rebatcher must emit it as a
    singleton batch and the pipeline must extract it fine."""
    ray = ray_session
    from tempeh_parser_ray.pipelines.extract_pipeline import extract_dataset

    small = [f"<main><p>doc {i}</p></main>".encode() for i in range(50)]
    giant = (b"<main><p>" + b"z" * 20_000_000 + b"</p></main>")
    tbl = pa.table({
        "url": pa.array([f"u{i}" for i in range(51)], pa.string()),
        "html": pa.array(small + [giant], pa.binary()),
    })
    ds = ray.data.from_arrow(tbl)
    out = extract_dataset(ds, spans=False, concurrency=(1, 2),
                          passthrough=("url",),
                          target_batch_bytes=1 << 20)
    got = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert got.num_rows == 51
    by_url = dict(zip(got.column("url").to_pylist(),
                      got.column("n_chars_extracted").to_pylist()))
    assert by_url["u50"] == 20_000_000
    for i in range(50):
        assert by_url[f"u{i}"] == len(f"doc {i}")
    errs = set(got.column("error").to_pylist())
    assert errs == {""}


def test_large_binary_and_string_html_columns(ray_session):
    """Corpora may carry html as large_binary or string columns; the
    pipeline must handle both without special-casing upstream."""
    import pyarrow as pa
    from tempeh_parser_ray.pipelines.extract_pipeline import extract_dataset

    ray = ray_session
    for typ, mk in [(pa.large_binary(), lambda s: s.encode()),
                    (pa.string(), lambda s: s)]:
        tbl = pa.table({
            "url": pa.array(["a", "b"], pa.string()),
            "html": pa.array([mk("<p>x</p>"), mk("<main>y</main>")], typ),
        })
        out = extract_dataset(ray.data.from_arrow(tbl), spans=False,
                              concurrency=(1, 2), passthrough=("url",))
        got = pa.concat_tables(list(out.iter_batches(
            batch_format="pyarrow", batch_size=None)))
        texts = dict(zip(got.column("url").to_pylist(),
                         got.column("extracted_text").to_pylist()))
        assert texts == {"a": "x", "b": "y"}, typ

"""Reference conformance: byte-identical node trees vs goldens generated
from the running reference (tools/gen_goldens.mjs). Pure core — no Ray.

Reference semantics covered: test/parseFile.test.js (full-tree goldens),
test/htmlParser.test.js (option variants), plus the §2.2 quirk list
(SURVEY.md) as micro-fixtures.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from tempeh_parser_ray.core import extract as ex
from tempeh_parser_ray.core.api import HTMLParser, ParserOptions

FIXTURE_DIR = Path("/root/reference/test/fixtures")

_VARIANT_OPTS = {
    "preserve": dict(tag_name_casing="preserve"),
    "upper": dict(tag_name_casing="upper"),
    "ignoreSelfClosing": dict(ignore_self_closing_syntax=True),
    "preserve_ignoreSelfClosing": dict(
        tag_name_casing="preserve", ignore_self_closing_syntax=True),
}


def _opts_from_js(js_opts: dict) -> dict:
    out = {}
    if "tagNameCasing" in js_opts:
        out["tag_name_casing"] = js_opts["tagNameCasing"]
    if "ignoreSelfClosingSyntax" in js_opts:
        out["ignore_self_closing_syntax"] = js_opts["ignoreSelfClosingSyntax"]
    return out


def test_all_default_fixtures(goldens_default):
    parser = HTMLParser()
    for name, want in goldens_default.items():
        got = parser.parse_to_nested((FIXTURE_DIR / name).read_bytes())
        assert got == want, f"tree mismatch for {name}"


def test_variant_fixtures(goldens_variants):
    for vname, fixtures in goldens_variants.items():
        parser = HTMLParser(**_VARIANT_OPTS[vname])
        for fname, want in fixtures.items():
            got = parser.parse_to_nested((FIXTURE_DIR / fname).read_bytes())
            assert got == want, f"tree mismatch for {vname}/{fname}"


def test_micro_quirks(goldens_micro):
    for name, case in goldens_micro.items():
        parser = HTMLParser(**_opts_from_js(case["options"]))
        got = parser.parse_to_nested(case["input"])
        assert got == case["nodes"], f"quirk mismatch: {name}"


def test_error_capture_no_abort():
    """Web-scale tolerance (SURVEY.md P5): errors land in .error with
    nodes parsed so far, instead of aborting (reference aborts the whole
    stream, src/parseTemplate.js:40-49)."""
    doc = HTMLParser().parse_bytes(b"<div>\xffabc</div>")
    assert doc.error is not None
    assert "Invalid UTF-8 leading byte: 255 at 1:5" in doc.error
    assert doc.n_nodes == 1  # <div> committed before the error


def test_invalid_options_rejected():
    with pytest.raises(ValueError):
        ParserOptions(tag_name_casing="mixed")


def test_extraction_matches_reference_trees(goldens_default):
    """Extraction over OUR parse equals the same allowlist walk applied
    to the reference's golden trees — per-url byte-identical."""
    parser = HTMLParser()
    for name, want_tree in goldens_default.items():
        doc = parser.parse_bytes((FIXTURE_DIR / name).read_bytes())
        got = ex.extract(doc)
        want_text = ex.extract_from_nested(want_tree)
        assert got.text == want_text, f"extraction mismatch for {name}"
        # spans tile the extracted text exactly
        assert got.text == "".join(
            got.text[s:e] for s, e in zip(got.span_starts, got.span_ends))
        if got.span_ends:
            assert got.span_ends[-1] == len(got.text)


def test_extract_main_text_drops_link_farms():
    html = (b"<body><nav><a href=/>one</a> <a href=/>two</a></nav>"
            b"<p>real content paragraph with many words here</p></body>")
    doc = HTMLParser().parse_bytes(html)
    full = ex.extract(doc).text
    main = ex.extract_main_text(doc, link_density_threshold=0.5)
    assert "real content" in main
    assert "one" in full and "one" not in main  # nav text filtered


def test_encodings_bom():
    """BOM variants of the same logical document parse identically
    (reference src/lexer.js:446-501)."""
    logical = "<p>héllo</p>"
    want = HTMLParser().parse_to_nested(logical)
    for enc, bom in [("utf-8", b"\xef\xbb\xbf"),
                     ("utf-16-le", b"\xff\xfe"),
                     ("utf-16-be", b"\xfe\xff"),
                     ("utf-32-le", b"\xff\xfe\x00\x00"),
                     ("utf-32-be", b"\x00\x00\xfe\xff")]:
        data = bom + logical.encode(enc)
        got = HTMLParser().parse_to_nested(data)
        assert got == want, f"encoding {enc} mismatch"


def test_fast_path_trees_match_tracked(goldens_default):
    """track_positions=False must yield the same tree shape/values as the
    tracked parse (positions zeroed) on every reference fixture."""
    from tempeh_parser_ray.core import parser as P

    def strip_pos(nodes):
        out = []
        for nd in nodes:
            nd = {k: v for k, v in nd.items() if k not in ("l", "c")}
            if "children" in nd:
                nd["children"] = strip_pos(nd["children"])
            if "attributes" in nd:
                nd["attributes"] = [
                    {k: v for k, v in a.items() if k not in ("l", "c")}
                    for a in nd["attributes"]]
            out.append(nd)
        return out

    for name in goldens_default:
        data = (FIXTURE_DIR / name).read_bytes()
        slow = P.to_nested(P.parse_bytes(data))
        fast = P.to_nested(P.parse_bytes(data, track_positions=False))
        assert strip_pos(fast) == strip_pos(slow), name


def test_fast_path_error_messages_reference_exact():
    """A fast parse that errors re-runs with positions: message must be
    identical to the tracked parse's (decode error with real l:c)."""
    from tempeh_parser_ray.core import parser as P

    bad = b"line1\n<div " + b"\xff" + b"attr>"  # invalid UTF-8 lead byte
    slow = P.parse_bytes(bad)
    fast = P.parse_bytes(bad, track_positions=False)
    assert slow.error is not None
    assert fast.error == slow.error
    assert "0:0" not in fast.error


def test_fast_path_extraction_identical():
    from tempeh_parser_ray.core import parser as P

    for name in ["geyer.dev.tmph.html", "componentWithScripts.tmph.html"]:
        data = (FIXTURE_DIR / name).read_bytes()
        slow = ex.extract(P.parse_bytes(data))
        fast = ex.extract(P.parse_bytes(data, track_positions=False))
        assert fast.text == slow.text
        assert fast.span_starts == slow.span_starts
        assert fast.n_links == slow.n_links


def test_differential_fuzz_vs_reference():
    """300 seeded random documents through OUR parser and the RUNNING
    reference (node + in-process shim): trees must be byte-identical.
    (tools/diff_fuzz.py runs bigger sweeps; 4300 cases at seeds 1-5
    showed 0 divergences.)"""
    import shutil
    import sys

    if shutil.which("node") is None:
        pytest.skip("node unavailable")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import diff_fuzz

    assert diff_fuzz.main(n_cases=300, seed=1) == 0


def test_differential_fuzz_bytes_mode():
    """Decode-path fuzz (BOM sniffing, all 6 encodings, invalid byte
    sequences) vs the reference parseFile path. Inputs that crash the
    REFERENCE itself (its stream plumbing) only require that we don't
    crash."""
    import shutil
    import sys

    if shutil.which("node") is None:
        pytest.skip("node unavailable")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import diff_fuzz

    assert diff_fuzz.main_bytes(n_cases=200, seed=1) == 0


# --- streamed per-node iteration (reference childStream equivalent) -----


def _stream_tokens(src, opts=None):
    from tempeh_parser_ray.core import lexer
    if isinstance(src, bytes):
        return lexer.tokenize_bytes(src, (opts or {}).get("isc", False))
    return lexer.tokenize_str(src, (opts or {}).get("isc", False))


def test_iter_root_nodes_matches_batch_builder_on_fixtures():
    """list(iter_root_nodes(toks)) must equal to_nested(parse_tokens(toks))
    for every fixture at every casing — the streaming iterator and the
    batch tree builder are differentially pinned to each other (and the
    batch builder to the reference goldens)."""
    from tempeh_parser_ray.core import parser as P
    from tempeh_parser_ray.sources.fixtures import fixture_corpus_table

    tbl = fixture_corpus_table()
    for i in range(tbl.num_rows):
        html = tbl.column("html")[i].as_py()
        for casing in ("lower", "upper", "preserve"):
            toks = _stream_tokens(html)
            doc = P.parse_tokens(toks, casing)
            assert doc.error is None
            assert list(P.iter_root_nodes(toks, casing)) == P.to_nested(doc)


def test_iter_root_nodes_matches_batch_builder_fuzz():
    """300 seeded adversarial documents: equivalence on success, exact
    error-message parity (iterator raises; batch records) on failure."""
    import random
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parent.parent / "tools"))
    from diff_fuzz import gen_doc

    from tempeh_parser_ray.core import parser as P

    rng = random.Random(99)
    cases: list = [gen_doc(rng) for _ in range(300)]
    # hostile BYTES inputs pin the error path: the iterator must raise
    # with the reference-exact message the batch builder records
    cases += [b"<a>text\x80more", b"<a \xf8>", b"plain \xffjunk",
              b"<a><b>x\x80"]
    n_err = 0
    for doc_src in cases:
        casing = rng.choice(["lower", "upper", "preserve"])
        toks = _stream_tokens(doc_src)
        doc = P.parse_tokens(toks, casing)
        if doc.error is None:
            assert list(P.iter_root_nodes(toks, casing)) == P.to_nested(doc)
        else:
            n_err += 1
            try:
                got = list(P.iter_root_nodes(toks, casing))
            except ValueError as e:
                assert str(e) == doc.error
                continue
            raise AssertionError(
                f"iterator did not raise for {doc.error!r}; got {got!r}")
    assert n_err >= 4  # the corpus must exercise the error path


def test_iter_nodes_is_incremental():
    """The first completed root is available BEFORE later siblings are
    parsed/consumed — true streaming, not parse-then-iterate."""
    from tempeh_parser_ray.core.api import HTMLParser

    it = HTMLParser().iter_nodes("<a>x</a><b>y</b><c>z</c>")
    first = next(it)
    assert first["tagName"] == "a"
    assert first["children"][0]["textContent"] == "x"
    rest = list(it)
    assert [r["tagName"] for r in rest] == ["b", "c"]

    # unclosed root element at EOF is yielded as-parsed
    it2 = HTMLParser().iter_nodes(b"<ul><li>one")
    roots = list(it2)
    assert len(roots) == 1 and roots[0]["tagName"] == "ul"
    assert roots[0]["children"][0]["tagName"] == "li"


def test_tokenize_stream_equals_tokenize_on_fixtures():
    """Differential pin for the incremental lexer: the token-at-a-time
    generator must produce EXACTLY the batch tokenizer's list on every
    fixture document (both casings of source: str and bytes modes)."""
    from tempeh_parser_ray.core import lexer as L
    from tempeh_parser_ray.sources.fixtures import fixture_corpus_table

    tbl = fixture_corpus_table()
    for data in tbl.column("html").to_pylist():
        assert list(L.tokenize_bytes_stream(data)) == \
            L.tokenize_bytes(data)
        try:
            raw = data.decode("utf-8")
        except UnicodeDecodeError:  # UTF-16/32 BOM fixtures: bytes-only
            continue
        assert list(L.tokenize_str_stream(raw)) == L.tokenize_str(raw)


def test_tokenize_stream_equals_tokenize_fuzz():
    import random

    from tempeh_parser_ray.core import lexer as L
    rng = random.Random(1234)
    frags = ["<div>", "</div>", "text", "<a href='x'>", "<br/>",
             "<!-- c -->", "<!DOCTYPE html>", "<script>q'<'</script>",
             "<p a=b>", "\n", "\\", "'", '"', "<", ">", "=", "x=",
             "<textarea>", "</textarea>", "\x00", "\r\n", "é\U0001F600"]
    for _ in range(400):
        raw = "".join(rng.choice(frags)
                      for _ in range(rng.randint(0, 12)))
        assert list(L.tokenize_str_stream(raw)) == L.tokenize_str(raw)


def test_iter_nodes_lexes_incrementally():
    """Token-level streaming (reference src/lexer.js:504-511): a root
    subtree is yielded while the TAIL of the input is still unlexed —
    observed via the Tokenizer's accumulated token list (no EOF/ERROR
    terminator yet, far fewer tokens than the full document)."""
    from tempeh_parser_ray.core import lexer as L
    from tempeh_parser_ray.core import parser as P

    tail = "<p>late</p>" * 500
    src = "<a>first</a>" + tail
    tok = L.Tokenizer(L.decode_string_source(src))
    roots = P.iter_root_nodes(tok.tokenize_stream())
    first = next(roots)
    assert first["tagName"] == "a"
    n_total = len(L.tokenize_str(src))
    seen = len(tok.tokens)
    assert seen < n_total / 10      # tail still unlexed
    assert tok.tokens[-1][0] not in (L.EOF, L.ERROR)
    # draining the iterator completes the lex and matches the batch list
    rest = list(roots)
    assert len(rest) == 500
    assert tok.tokens == L.tokenize_str(src)

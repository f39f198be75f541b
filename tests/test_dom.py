"""DOM-analytics stages (stages/dom_stage.py): handwritten edge-case
HTML beyond the synthetic corpus the oracles cover."""

import pyarrow as pa

from tempeh_parser_ray.stages.dom_stage import (
    DomSelectBatch, DomStatsBatch, TableExtractBatch,
)


def _batch(*htmls: str) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(len(htmls)), pa.int64()),
        "html": pa.array([h.encode() for h in htmls], pa.binary()),
    })


def test_dom_stats_counts_and_depth():
    out = DomStatsBatch(passthrough=("doc_id",))(_batch(
        "<div><p>ab</p><p>c<b>d</b></p></div>",
        "",  # empty doc
        "<x",  # unterminated opening tag at EOF -> dropped (P4)
    )).to_pylist()
    assert out[0] == {"doc_id": 0, "n_nodes": 7, "n_elements": 4,
                      "n_text_nodes": 3, "n_attrs": 0, "max_depth": 4,
                      "text_chars": 4, "error": ""}
    assert out[1]["n_nodes"] == 0 and out[1]["max_depth"] == 0
    assert out[2]["n_nodes"] == 0


def test_dom_stats_counts_attrs_and_comment_nodes():
    out = DomStatsBatch(passthrough=("doc_id",))(_batch(
        '<a href="/" id=x>t</a><!-- c -->',
    )).to_pylist()[0]
    # nodes: a, #text, comment
    assert out["n_nodes"] == 3
    assert out["n_elements"] == 1
    assert out["n_text_nodes"] == 1
    assert out["n_attrs"] == 2
    assert out["text_chars"] == 1  # comments don't count


def test_dom_select_descendant_and_nearest_match_text():
    # nested matches: text binds to the NEAREST enclosing match
    out = DomSelectBatch(selector="div p", passthrough=("doc_id",))(_batch(
        "<div><p>outer<p2></p2></p><section><p>deep</p></section></div>"
        "<p>nomatch</p>",
    )).to_pylist()
    assert [(r["match_idx"], r["text"]) for r in out] == [
        (0, "outer"), (1, "deep")]


def test_dom_select_multi_segment_skips_unanchored():
    out = DomSelectBatch(selector="article div b")(_batch(
        "<article><div><span><b>hit</b></span></div></article>"
        "<div><b>miss</b></div>",
        "<b>alsomiss</b>",
    )).to_pylist()
    assert [r["text"] for r in out] == ["hit"]


def test_dom_select_nested_same_tag_binds_nearest():
    out = DomSelectBatch(selector="div")(_batch(
        "<div>a<div>b</div>c</div>",
    )).to_pylist()
    assert [(r["match_idx"], r["text"]) for r in out] == [
        (0, "ac"), (1, "b")]


def test_table_extract_nested_table_binds_inner():
    html = ("<table><tr><th>h</th></tr>"
            "<tr><td>outer<table><tr><td>inner</td></tr> </table>"
            "tail</td></tr></table>")
    out = TableExtractBatch(passthrough=("doc_id",))(_batch(html)
                                                     ).to_pylist()
    rows = {(r["table_idx"], r["row_idx"], r["col_idx"]):
            (r["cell_text"], r["is_header"]) for r in out}
    assert rows[(0, 0, 0)] == ("h", True)
    # outer cell text excludes the whole inner table (incl. the
    # structural space between inner rows), keeps its own tail text
    assert rows[(0, 1, 0)] == ("outertail", False)
    assert rows[(1, 0, 0)] == ("inner", False)


def test_table_extract_tbody_transparent_and_stray_cells():
    html = ("<table><thead><tr><th>a</th><th>b</th></tr></thead>"
            "<tbody><tr><td>1</td><td>2</td></tr></tbody></table>"
            "<tr><td>stray</td></tr>")
    out = TableExtractBatch()(_batch(html)).to_pylist()
    assert [(r["row_idx"], r["col_idx"], r["cell_text"]) for r in out] == [
        (0, 0, "a"), (0, 1, "b"), (1, 0, "1"), (1, 1, "2")]


def test_table_extract_no_tables_emits_nothing():
    out = TableExtractBatch()(_batch("<p>just text</p>"))
    assert out.num_rows == 0


def test_sitemap_entries_and_missing_children():
    from tempeh_parser_ray.stages.dom_stage import SitemapBatch

    out = SitemapBatch(passthrough=("doc_id",))(_batch(
        "<urlset><url><loc>https://a/1</loc>"
        "<lastmod>2025-01-01</lastmod></url>"
        "<url><loc>https://a/<b>2</b></loc></url></urlset>"
        "<url><loc>outside</loc></url>",  # not under <urlset>: ignored
        "<p>no sitemap</p>",
    )).to_pylist()
    assert out == [
        {"doc_id": 0, "url_idx": 0, "loc": "https://a/1",
         "lastmod": "2025-01-01"},
        {"doc_id": 0, "url_idx": 1, "loc": "https://a/2",  # descendant
         "lastmod": ""},                                   # missing
    ]


def test_tag_count_partials_combine_per_batch():
    from tempeh_parser_ray.stages.dom_stage import TagCountBatch

    out = TagCountBatch()(_batch(
        "<div><p>a</p><p>b</p></div>",
        "<div></div><span>c</span>",
    )).to_pylist()
    assert {(r["tag"], r["n"]) for r in out} == {
        ("div", 2), ("p", 2), ("span", 1)}

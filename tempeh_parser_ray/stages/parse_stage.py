"""Stateful parse / extract stages for ``Dataset.map_batches``.

Both stages are callable CLASSES (Ray Data actor-pool pattern): option
validation, char tables and compiled scanners are touched once per actor
in ``__init__``; ``__call__`` handles one zero-copy Arrow batch. Use as

    ds.map_batches(ExtractBatch, batch_format="pyarrow",
                   batch_size=None, concurrency=(2, n_cpus),
                   fn_constructor_kwargs={...})

``batch_size=None`` consumes the byte-balanced blocks produced by
``stages.rebatch`` as-is (SURVEY.md par.4: skew handling).

Two stages:

* ``ParseHtmlBatch`` — html bytes -> full flat node/attr tree columns
  (conformance / tree-consuming pipelines).
* ``ExtractBatch``   — fused parse+extract: html bytes -> extracted
  text, spans and quality metrics WITHOUT materializing tree columns
  (the flagship path — at 10^12-document scale the tree is transient
  per-document state, not something to ship through the object store).

The per-document work is the byte-identical reference semantics from
``core`` (SURVEY.md par.2.2-2.3); errors never abort the job — they land
in the ``error`` column (SURVEY.md P5 web-scale tolerance).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..core import extract as _extract
from ..core import lexer as _lexer
from ..core import parser as _parser
from ..core.api import ParserOptions

# Arrow types shared by both stages
SPAN_STRUCT = pa.struct([
    ("start", pa.int64()), ("end", pa.int64()), ("node", pa.int32()),
])
NODE_STRUCT = pa.struct([
    ("kind", pa.int8()), ("tag", pa.string()), ("text", pa.string()),
    ("parent", pa.int32()), ("l", pa.int32()), ("c", pa.int32()),
])
ATTR_STRUCT = pa.struct([
    ("node", pa.int32()), ("name", pa.string()), ("value", pa.string()),
    ("l", pa.int32()), ("c", pa.int32()),
])

_PASSTHROUGH_DEFAULT = ("url", "warc_ts", "lang")


def _list_array(offsets: list[int], struct_arr: pa.StructArray) -> pa.ListArray:
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct_arr)


class _BaseParseStage:
    # ParseHtmlBatch emits l/c columns and needs them tracked; the
    # extraction stages never read positions, so they skip the
    # line/column bookkeeping entirely (parse errors re-run with
    # positions inside core.parser for reference-exact messages).
    TRACK_POSITIONS = True
    # Stages whose selectors compare against lowercase tag literals
    # ('a', 'table', 'url', 'meta', ...) set this so a non-default
    # casing fails loudly at construction instead of silently
    # matching nothing.
    REQUIRES_LOWER_TAGS = False

    def __init__(self, tag_name_casing: str = "lower",
                 ignore_self_closing_syntax: bool = False,
                 html_column: str = "html",
                 passthrough: tuple[str, ...] = _PASSTHROUGH_DEFAULT,
                 keep_html: bool = False):
        # Validates options once per actor; also warms the compiled
        # regex tables (module import) before the first batch.
        self.options = ParserOptions(tag_name_casing,
                                     ignore_self_closing_syntax)
        if self.REQUIRES_LOWER_TAGS and tag_name_casing != "lower":
            raise ValueError(
                f"{type(self).__name__} selects on lowercase-"
                "normalized tag names; construct it with "
                "tag_name_casing='lower' (the default)")
        self.html_column = html_column
        self.passthrough = passthrough
        self.keep_html = keep_html

    def _parse_doc(self, data) -> _parser.ParsedDoc:
        if isinstance(data, memoryview):
            data = bytes(data)
        elif isinstance(data, str):  # tolerate string-typed html columns
            return _parser.parse_string(
                data, self.options.tag_name_casing,
                self.options.ignore_self_closing_syntax,
                self.TRACK_POSITIONS)
        return _parser.parse_bytes(
            data, self.options.tag_name_casing,
            self.options.ignore_self_closing_syntax,
            self.TRACK_POSITIONS)

    def _passthrough_columns(self, batch: pa.Table) -> list[tuple[str, pa.Array]]:
        cols = []
        for name in self.passthrough:
            if name in batch.column_names:
                cols.append((name, batch.column(name)))
        if self.keep_html:
            cols.append((self.html_column, batch.column(self.html_column)))
        return cols


class ExtractBatch(_BaseParseStage):
    """Fused parse + main-content extraction (the flagship hot path)."""

    TRACK_POSITIONS = False

    def __init__(self, *args, spans: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.emit_spans = spans

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column(self.html_column)
        n = batch.num_rows

        texts: list[str] = []
        errors: list[str] = []
        n_nodes: list[int] = []
        n_text_nodes: list[int] = []
        n_links: list[int] = []
        link_chars: list[int] = []
        link_density: list[float] = []
        n_tokens: list[int] = []
        html_bytes: list[int] = []
        span_offsets = [0]
        span_start_flat: list[int] = []
        span_end_flat: list[int] = []
        span_node_flat: list[int] = []

        for i in range(n):
            data = html[i].as_py()
            # str-typed html columns: count UTF-8 BYTES (not code points)
            # so MB/s metrics and lineage stay consistent with the
            # byte-based rebatcher (pc.binary_length) on binary columns.
            if data is None:
                html_bytes.append(0)
            elif isinstance(data, str):
                html_bytes.append(len(data.encode("utf-8")))
            else:
                html_bytes.append(len(data))
            if data is None:
                doc = _parser.ParsedDoc()
            else:
                doc = self._parse_doc(data)
            ex = _extract.extract(doc)
            texts.append(ex.text)
            errors.append(ex.error or "")
            n_nodes.append(ex.n_nodes)
            n_text_nodes.append(ex.n_text_nodes)
            n_links.append(ex.n_links)
            link_chars.append(ex.link_chars)
            link_density.append(ex.link_density)
            n_tokens.append(ex.n_tokens)
            if self.emit_spans:
                span_start_flat.extend(ex.span_starts)
                span_end_flat.extend(ex.span_ends)
                span_node_flat.extend(ex.span_nodes)
                span_offsets.append(len(span_start_flat))

        cols = self._passthrough_columns(batch)
        cols.append(("extracted_text", pa.array(texts, pa.large_string())))
        if self.emit_spans:
            spans_struct = pa.StructArray.from_arrays(
                [pa.array(span_start_flat, pa.int64()),
                 pa.array(span_end_flat, pa.int64()),
                 pa.array(span_node_flat, pa.int32())],
                fields=list(SPAN_STRUCT))
            cols.append(("spans", _list_array(span_offsets, spans_struct)))
        cols.extend([
            ("n_nodes", pa.array(n_nodes, pa.int32())),
            ("n_text_nodes", pa.array(n_text_nodes, pa.int32())),
            ("n_links", pa.array(n_links, pa.int32())),
            ("link_chars", pa.array(link_chars, pa.int64())),
            ("link_density", pa.array(link_density, pa.float64())),
            ("n_tokens", pa.array(n_tokens, pa.int64())),
            ("n_chars_extracted",
             pa.array([len(t) for t in texts], pa.int64())),
            ("html_bytes", pa.array(html_bytes, pa.int64())),
            ("error", pa.array(errors, pa.string())),
        ])
        return pa.table(dict(cols))


class ExtractStatsBatch(ExtractBatch):
    """Extract, then reduce to per-batch counters (n_docs, n_errors,
    html_bytes, extracted_chars) INSIDE the actor.

    Benchmark / monitoring variant: the full extraction runs, but only
    16 bytes per batch leave the actor — no multi-MB output blocks
    through the object store, no downstream stats operator contending
    for CPU (measured: folding the stats task operator into the actor
    lifted corpus throughput ~1.5x)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = super().__call__(batch)
        n_err = int(pc.sum(pc.cast(
            pc.not_equal(out.column("error"), ""), pa.int64())).as_py() or 0)
        return pa.table({
            "n_docs": pa.array([out.num_rows], pa.int64()),
            "n_errors": pa.array([n_err], pa.int64()),
            "html_bytes": pa.array(
                [int(pc.sum(out.column("html_bytes")).as_py() or 0)],
                pa.int64()),
            "extracted_chars": pa.array(
                [int(pc.sum(out.column("n_chars_extracted")).as_py() or 0)],
                pa.int64()),
        })


class MainTextBatch(_BaseParseStage):
    """Boilerplate-filtered extraction: the allowlist walk PLUS the
    link-density parent filter (``core.extract.extract_main_text``) —
    drops navigation bars / link farms."""

    TRACK_POSITIONS = False

    def __init__(self, *args, link_density_threshold: float = 0.5,
                 id_column: str = "doc_id", **kwargs):
        super().__init__(*args, **kwargs)
        self.threshold = link_density_threshold
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column(self.html_column)
        texts = []
        for i in range(batch.num_rows):
            data = html[i].as_py()
            if data is None:
                texts.append("")
                continue
            doc = self._parse_doc(data)
            texts.append(_extract.extract_main_text(doc, self.threshold))
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "main_text": pa.array(texts, pa.large_string()),
        })


class ParseHtmlBatch(_BaseParseStage):
    """Full tree output: flat node/attr list<struct> columns per row."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column(self.html_column)
        n = batch.num_rows

        node_offsets = [0]
        kind_flat: list[int] = []
        tag_flat: list[Optional[str]] = []
        text_flat: list[Optional[str]] = []
        parent_flat: list[int] = []
        l_flat: list[int] = []
        c_flat: list[int] = []
        attr_offsets = [0]
        a_node: list[int] = []
        a_name: list[str] = []
        a_value: list[str] = []
        a_l: list[int] = []
        a_c: list[int] = []
        errors: list[str] = []
        n_nodes: list[int] = []

        for i in range(n):
            data = html[i].as_py()
            doc = self._parse_doc(data) if data is not None else _parser.ParsedDoc()
            kind_flat.extend(doc.kinds)
            tag_flat.extend(doc.tags)
            text_flat.extend(doc.texts)
            parent_flat.extend(doc.parents)
            l_flat.extend(doc.lines)
            c_flat.extend(doc.cols)
            node_offsets.append(len(kind_flat))
            a_node.extend(doc.attr_node)
            a_name.extend(doc.attr_name)
            a_value.extend(doc.attr_value)
            a_l.extend(doc.attr_line)
            a_c.extend(doc.attr_col)
            attr_offsets.append(len(a_node))
            errors.append(doc.error or "")
            n_nodes.append(doc.n_nodes)

        nodes_struct = pa.StructArray.from_arrays(
            [pa.array(kind_flat, pa.int8()), pa.array(tag_flat, pa.string()),
             pa.array(text_flat, pa.string()),
             pa.array(parent_flat, pa.int32()),
             pa.array(l_flat, pa.int32()), pa.array(c_flat, pa.int32())],
            fields=list(NODE_STRUCT))
        attrs_struct = pa.StructArray.from_arrays(
            [pa.array(a_node, pa.int32()), pa.array(a_name, pa.string()),
             pa.array(a_value, pa.string()),
             pa.array(a_l, pa.int32()), pa.array(a_c, pa.int32())],
            fields=list(ATTR_STRUCT))

        cols = self._passthrough_columns(batch)
        cols.extend([
            ("nodes", _list_array(node_offsets, nodes_struct)),
            ("attrs", _list_array(attr_offsets, attrs_struct)),
            ("n_nodes", pa.array(n_nodes, pa.int32())),
            ("error", pa.array(errors, pa.string())),
        ])
        return pa.table(dict(cols))


def nested_from_row(nodes_list, attrs_list) -> list[dict]:
    """Rebuild the reference's nested golden shape from one row's
    ``nodes``/``attrs`` cells (conformance-test helper)."""
    doc = _parser.ParsedDoc()
    for nd in nodes_list:
        doc.kinds.append(nd["kind"])
        doc.tags.append(nd["tag"])
        doc.texts.append(nd["text"])
        doc.parents.append(nd["parent"])
        doc.lines.append(nd["l"])
        doc.cols.append(nd["c"])
    for at in attrs_list:
        doc.attr_node.append(at["node"])
        doc.attr_name.append(at["name"])
        doc.attr_value.append(at["value"])
        doc.attr_line.append(at["l"])
        doc.attr_col.append(at["c"])
    return _parser.to_nested(doc)


class LinksBatch(_BaseParseStage):
    """Link-graph extraction: one OUTPUT ROW PER ANCHOR (<a>) element —
    the flat-map shape a web-graph build needs (doc_id, link_idx,
    href, anchor). ``href`` follows the reference's last-attribute-
    value-wins rule (SURVEY.md P1); ``anchor`` is the concatenation of
    the anchor's descendant text nodes in document order (nodes are
    stored pre-order, so a parent-chain climb per text node finds the
    nearest enclosing <a> without materializing child lists). Docs
    with no links emit nothing; parse errors emit nothing for the
    broken tail but never abort (P5)."""

    REQUIRES_LOWER_TAGS = True

    TRACK_POSITIONS = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column(self.html_column)
        pass_cols = self._passthrough_columns(batch)

        out_rows: list[int] = []   # batch row index per emitted link
        idxs: list[int] = []
        hrefs: list[str] = []
        anchors: list[str] = []

        for i in range(batch.num_rows):
            data = html[i].as_py()
            doc = (self._parse_doc(data) if data is not None
                   else _parser.ParsedDoc())
            a_nodes = [j for j, (k, t) in enumerate(
                zip(doc.kinds, doc.tags))
                if k == _parser.KIND_ELEMENT and t == "a"]
            if not a_nodes:
                continue
            a_pos = {j: p for p, j in enumerate(a_nodes)}
            href_by = {}
            for node, name, value in zip(doc.attr_node, doc.attr_name,
                                         doc.attr_value):
                if node in a_pos and name == "href":
                    href_by[node] = value  # last occurrence wins
            texts_by: dict[int, list[str]] = {j: [] for j in a_nodes}
            for j, k in enumerate(doc.kinds):
                if k != _parser.KIND_TEXT:
                    continue
                p = doc.parents[j]
                while p != -1:
                    if p in a_pos:
                        texts_by[p].append(doc.texts[j] or "")
                        break
                    p = doc.parents[p]
            for p, j in enumerate(a_nodes):
                out_rows.append(i)
                idxs.append(p)
                hrefs.append(href_by.get(j, ""))
                anchors.append("".join(texts_by[j]))

        take = pa.array(out_rows, pa.int64())
        cols = [(name, col.take(take)) for name, col in pass_cols]
        cols.extend([
            ("link_idx", pa.array(idxs, pa.int64())),
            ("href", pa.array(hrefs, pa.string())),
            ("anchor", pa.array(anchors, pa.string())),
        ])
        return pa.table(dict(cols))

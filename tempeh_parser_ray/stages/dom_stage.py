"""DOM-analytics stages over the flat parse encoding.

Three ``map_batches`` actor-pool stages that consume the pre-order flat
node array (``core.parser.ParsedDoc``) directly — ``parents[j] < j``
holds for every non-root node, so depths and nearest-ancestor queries
are single forward passes over the flat arrays; no nested tree is ever
materialized (same transient-per-document discipline as
``parse_stage.ExtractBatch``):

* ``DomStatsBatch``    — per-page structural metrics (node/element/attr
  counts, max depth, total text chars): the quality-signal sidecar a
  crawl-curation pipeline computes next to extraction.
* ``DomSelectBatch``   — descendant-combinator selector ("nav a",
  "body main p [href]"-less tag paths) -> one output row per match,
  flat-map shape like ``parse_stage.LinksBatch``.
* ``TableExtractBatch``— HTML ``<table>`` -> relational rows
  (doc, table_idx, row_idx, col_idx, cell_text, is_header), the
  web-table-corpus (WDC-style) extraction shape. Nested tables bind
  cells/rows to the NEAREST enclosing table/tr.

Reference semantics: trees come from the byte-identical parser
(``/root/reference/src/parseTemplate.js`` tree shape); everything here
is downstream engine surface the reference does not have.
"""

from __future__ import annotations

import pyarrow as pa

from ..core import parser as _parser
from .parse_stage import _BaseParseStage


def _depths(parents: list[int]) -> list[int]:
    """Depth per node in one forward pass (pre-order guarantees
    parents[j] < j). Roots get depth 1."""
    out = [0] * len(parents)
    for j, p in enumerate(parents):
        out[j] = 1 if p == -1 else out[p] + 1
    return out


class DomStatsBatch(_BaseParseStage):
    """Per-page DOM structural stats: one output row per input row.

    ``text_chars`` counts EVERY text node (head/script/style included —
    this is a structure metric, not extraction), in code points.
    """

    TRACK_POSITIONS = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column(self.html_column)
        n = batch.num_rows
        n_nodes = [0] * n
        n_elements = [0] * n
        n_text_nodes = [0] * n
        n_attrs = [0] * n
        max_depth = [0] * n
        text_chars = [0] * n
        errors = [""] * n

        for i in range(n):
            data = html[i].as_py()
            doc = (self._parse_doc(data) if data is not None
                   else _parser.ParsedDoc())
            errors[i] = doc.error or ""
            n_nodes[i] = doc.n_nodes
            n_attrs[i] = len(doc.attr_node)
            depths = _depths(doc.parents)
            max_depth[i] = max(depths, default=0)
            ne = nt = tc = 0
            for k, txt in zip(doc.kinds, doc.texts):
                if k == _parser.KIND_ELEMENT:
                    ne += 1
                elif k == _parser.KIND_TEXT:
                    nt += 1
                    tc += len(txt or "")
            n_elements[i] = ne
            n_text_nodes[i] = nt
            text_chars[i] = tc

        cols = self._passthrough_columns(batch)
        cols.extend([
            ("n_nodes", pa.array(n_nodes, pa.int32())),
            ("n_elements", pa.array(n_elements, pa.int32())),
            ("n_text_nodes", pa.array(n_text_nodes, pa.int32())),
            ("n_attrs", pa.array(n_attrs, pa.int32())),
            ("max_depth", pa.array(max_depth, pa.int32())),
            ("text_chars", pa.array(text_chars, pa.int64())),
            ("error", pa.array(errors, pa.string())),
        ])
        return pa.table(dict(cols))


def _parse_selector(selector: str) -> list[str]:
    segs = [s for s in selector.strip().split() if s]
    if not segs:
        raise ValueError("empty selector")
    return [s.lower() for s in segs]


class DomSelectBatch(_BaseParseStage):
    """Descendant-combinator selection: ``selector`` is a space-
    separated tag path ("nav a" = every <a> with a <nav> ancestor).

    One output row per matched element, in document order:
    ``match_idx`` (per doc), ``tag``, ``text`` (concatenation of the
    match's descendant text nodes; a text node inside NESTED matches
    binds to the nearest enclosing match, the ``LinksBatch`` anchor
    rule). Matching is the standard greedy ancestor climb — correct
    for descendant-only selectors.
    """

    TRACK_POSITIONS = False

    def __init__(self, *args, selector: str = "a", **kwargs):
        super().__init__(*args, **kwargs)
        self.segments = _parse_selector(selector)

    def _matches(self, doc: _parser.ParsedDoc, j: int) -> bool:
        # j's tag already matches the last segment; climb for the rest.
        need = len(self.segments) - 2
        p = doc.parents[j]
        while need >= 0 and p != -1:
            if (doc.kinds[p] == _parser.KIND_ELEMENT
                    and doc.tags[p] == self.segments[need]):
                need -= 1
            p = doc.parents[p]
        return need < 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column(self.html_column)
        pass_cols = self._passthrough_columns(batch)
        last = self.segments[-1]

        out_rows: list[int] = []
        idxs: list[int] = []
        tags: list[str] = []
        texts: list[str] = []

        for i in range(batch.num_rows):
            data = html[i].as_py()
            doc = (self._parse_doc(data) if data is not None
                   else _parser.ParsedDoc())
            matched = [j for j, (k, t) in enumerate(zip(doc.kinds, doc.tags))
                       if k == _parser.KIND_ELEMENT and t == last
                       and self._matches(doc, j)]
            if not matched:
                continue
            mset = set(matched)
            texts_by: dict[int, list[str]] = {j: [] for j in matched}
            for j, k in enumerate(doc.kinds):
                if k != _parser.KIND_TEXT:
                    continue
                p = doc.parents[j]
                while p != -1:
                    if p in mset:
                        texts_by[p].append(doc.texts[j] or "")
                        break
                    p = doc.parents[p]
            for m, j in enumerate(matched):
                out_rows.append(i)
                idxs.append(m)
                tags.append(doc.tags[j] or "")
                texts.append("".join(texts_by[j]))

        take = pa.array(out_rows, pa.int64())
        cols = [(name, col.take(take)) for name, col in pass_cols]
        cols.extend([
            ("match_idx", pa.array(idxs, pa.int64())),
            ("tag", pa.array(tags, pa.string())),
            ("text", pa.array(texts, pa.string())),
        ])
        return pa.table(dict(cols))


class TableExtractBatch(_BaseParseStage):
    """HTML tables -> relational rows.

    Emits one row per ``<td>``/``<th>`` cell:
    ``(passthrough..., table_idx, row_idx, col_idx, cell_text,
    is_header)``. ``table_idx`` orders tables per document;
    ``row_idx`` orders ``<tr>`` per table (``<thead>``/``<tbody>``
    wrappers are transparent); ``col_idx`` orders cells per row.
    ``cell_text`` concatenates the cell's descendant text nodes —
    texts inside a NESTED table bind to the inner table's cells only
    (nearest-cell rule). ``is_header`` is the cell's own tag
    (``th`` vs ``td``)."""

    REQUIRES_LOWER_TAGS = True

    TRACK_POSITIONS = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column(self.html_column)
        pass_cols = self._passthrough_columns(batch)

        out_rows: list[int] = []
        t_idx: list[int] = []
        r_idx: list[int] = []
        c_idx: list[int] = []
        cell_text: list[str] = []
        is_header: list[bool] = []

        for i in range(batch.num_rows):
            data = html[i].as_py()
            doc = (self._parse_doc(data) if data is not None
                   else _parser.ParsedDoc())
            kinds, tags, parents = doc.kinds, doc.tags, doc.parents
            n = doc.n_nodes
            # nearest enclosing table / tr / cell per node, one forward
            # pass each (parents[j] < j).
            near_table = [-1] * n
            near_tr = [-1] * n
            near_cell = [-1] * n
            for j in range(n):
                p = parents[j]
                if p == -1:
                    continue
                pe = kinds[p] == _parser.KIND_ELEMENT
                near_table[j] = p if pe and tags[p] == "table" \
                    else near_table[p]
                near_tr[j] = p if pe and tags[p] == "tr" else near_tr[p]
                near_cell[j] = p if pe and tags[p] in ("td", "th") \
                    else near_cell[p]

            table_ord: dict[int, int] = {}
            row_ord: dict[int, tuple[int, int]] = {}   # tr node -> (t, r)
            rows_per_table: dict[int, int] = {}
            cell_meta: dict[int, tuple[int, int, int, bool]] = {}
            cells_per_row: dict[int, int] = {}
            buf: dict[int, list[str]] = {}
            for j in range(n):
                if kinds[j] != _parser.KIND_ELEMENT:
                    continue
                tag = tags[j]
                if tag == "table":
                    table_ord[j] = len(table_ord)
                elif tag == "tr":
                    t = near_table[j]
                    if t == -1:
                        continue  # stray <tr> outside any table
                    r = rows_per_table.get(t, 0)
                    rows_per_table[t] = r + 1
                    row_ord[j] = (table_ord[t], r)
                elif tag in ("td", "th"):
                    tr = near_tr[j]
                    if tr == -1 or tr not in row_ord:
                        continue
                    c = cells_per_row.get(tr, 0)
                    cells_per_row[tr] = c + 1
                    ti, ri = row_ord[tr]
                    cell_meta[j] = (ti, ri, c, tag == "th")
                    buf[j] = []
            if not cell_meta:
                continue
            for j in range(n):
                if kinds[j] != _parser.KIND_TEXT:
                    continue
                cell = near_cell[j]
                # near_table guard: structural text inside a NESTED
                # table that is not in any inner cell (e.g. whitespace
                # between inner <tr>s) must not leak into the outer
                # cell's text.
                if cell in buf and near_table[j] == near_table[cell]:
                    buf[cell].append(doc.texts[j] or "")
            for j, (ti, ri, ci, hdr) in cell_meta.items():
                out_rows.append(i)
                t_idx.append(ti)
                r_idx.append(ri)
                c_idx.append(ci)
                cell_text.append("".join(buf[j]))
                is_header.append(hdr)

        take = pa.array(out_rows, pa.int64())
        cols = [(name, col.take(take)) for name, col in pass_cols]
        cols.extend([
            ("table_idx", pa.array(t_idx, pa.int64())),
            ("row_idx", pa.array(r_idx, pa.int64())),
            ("col_idx", pa.array(c_idx, pa.int64())),
            ("cell_text", pa.array(cell_text, pa.string())),
            ("is_header", pa.array(is_header, pa.bool_())),
        ])
        return pa.table(dict(cols))


class SitemapBatch(_BaseParseStage):
    """Sitemap parse: ``<urlset><url><loc>..</loc><lastmod>..</lastmod>
    </url>...</urlset>`` -> one row per ``<url>`` entry —
    (passthrough..., url_idx, loc, lastmod). Child texts concatenate
    descendant text nodes via the nearest-ancestor climb (LinksBatch
    rule); a missing child yields ''. Entries outside ``<urlset>`` are
    ignored. XML is parsed by the same HTML5 lexer (sitemaps carry no
    HTML quirks: no raw-text tags, no void tags)."""

    REQUIRES_LOWER_TAGS = True

    TRACK_POSITIONS = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column(self.html_column)
        pass_cols = self._passthrough_columns(batch)

        out_rows: list[int] = []
        idxs: list[int] = []
        locs: list[str] = []
        lastmods: list[str] = []

        for i in range(batch.num_rows):
            data = html[i].as_py()
            doc = (self._parse_doc(data) if data is not None
                   else _parser.ParsedDoc())
            kinds, tags, parents = doc.kinds, doc.tags, doc.parents
            n = doc.n_nodes
            in_set = [False] * n   # has an <urlset> ancestor (or is one)
            near_url = [-1] * n
            near_child = [-1] * n  # nearest loc/lastmod ancestor
            for j in range(n):
                p = parents[j]
                if p == -1:
                    in_set[j] = (kinds[j] == _parser.KIND_ELEMENT
                                 and tags[j] == "urlset")
                    continue
                pe = kinds[p] == _parser.KIND_ELEMENT
                in_set[j] = in_set[p] or (
                    kinds[j] == _parser.KIND_ELEMENT
                    and tags[j] == "urlset")
                near_url[j] = p if pe and tags[p] == "url" \
                    else near_url[p]
                near_child[j] = p if pe and tags[p] in ("loc", "lastmod") \
                    else near_child[p]
            entries = [j for j in range(n)
                       if kinds[j] == _parser.KIND_ELEMENT
                       and tags[j] == "url" and in_set[j]]
            if not entries:
                continue
            order = {j: k for k, j in enumerate(entries)}
            buf: dict[tuple[int, str], list[str]] = {}
            for j in range(n):
                if kinds[j] != _parser.KIND_TEXT:
                    continue
                c = near_child[j]
                if c == -1:
                    continue
                u = near_url[c]
                if u in order:
                    buf.setdefault((u, tags[c]), []).append(
                        doc.texts[j] or "")
            for j in entries:
                out_rows.append(i)
                idxs.append(order[j])
                locs.append("".join(buf.get((j, "loc"), [])))
                lastmods.append("".join(buf.get((j, "lastmod"), [])))

        take = pa.array(out_rows, pa.int64())
        cols = [(name, col.take(take)) for name, col in pass_cols]
        cols.extend([
            ("url_idx", pa.array(idxs, pa.int64())),
            ("loc", pa.array(locs, pa.string())),
            ("lastmod", pa.array(lastmods, pa.string())),
        ])
        return pa.table(dict(cols))


class TagCountBatch(_BaseParseStage):
    """Corpus-wide element-tag histogram, MAP-SIDE COMBINED: one
    ``(tag, n)`` partial row per distinct tag per BATCH (not per doc,
    not per node) — the downstream ``groupby(tag).Sum`` shuffles a few
    dozen rows per block regardless of corpus size."""

    TRACK_POSITIONS = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        html = batch.column(self.html_column)
        c: Counter = Counter()
        for i in range(batch.num_rows):
            data = html[i].as_py()
            doc = (self._parse_doc(data) if data is not None
                   else _parser.ParsedDoc())
            for k, t in zip(doc.kinds, doc.tags):
                if k == _parser.KIND_ELEMENT:
                    c[t] += 1
        tags = sorted(c)
        return pa.table({
            "tag": pa.array(tags, pa.string()),
            "n": pa.array([c[t] for t in tags], pa.int64())})


class MetadataBatch(_BaseParseStage):
    """Head-metadata extraction — the page-catalog sidecar every crawl
    curation pipeline keeps next to extracted text: one output row per
    document with (title, description, og_title, robots_meta,
    canonical, html_lang).

    Rules (documented, deterministic): ``title`` concatenates every
    text node under any ``<title>`` element in document order;
    ``description`` / ``robots_meta`` come from the FIRST
    ``<meta name=...>`` with a matching name, ``og_title`` from the
    first ``<meta property="og:title">``, ``canonical`` from the first
    ``<link rel="canonical">``, ``html_lang`` from the first
    ``<html lang=...>``. Missing fields yield ''. Attribute access
    uses the flat (attr_node, attr_name, attr_value) arrays — the
    parser already applied the reference's last-attr-value-wins rule
    (SURVEY P1), so a duplicated attribute on one tag reads as its
    last value here too.
    """

    REQUIRES_LOWER_TAGS = True

    TRACK_POSITIONS = False

    _META_NAMES = ("description", "robots")

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column(self.html_column)
        pass_cols = self._passthrough_columns(batch)

        fields = ("title", "description", "og_title", "robots_meta",
                  "canonical", "html_lang")
        out: dict[str, list[str]] = {f: [] for f in fields}

        for i in range(batch.num_rows):
            data = html[i].as_py()
            doc = (self._parse_doc(data) if data is not None
                   else _parser.ParsedDoc())
            kinds, tags, parents = doc.kinds, doc.tags, doc.parents
            n = doc.n_nodes
            # attr map only for the tag kinds we read
            want = {j for j in range(n)
                    if kinds[j] == _parser.KIND_ELEMENT
                    and tags[j] in ("meta", "link", "html")}
            attrs: dict[int, dict[str, str]] = {}
            for node, name, value in zip(doc.attr_node, doc.attr_name,
                                         doc.attr_value):
                if node in want:
                    attrs.setdefault(node, {})[name] = value
            row = {f: "" for f in fields}
            in_title = [False] * n
            title_parts: list[str] = []
            for j in range(n):
                p = parents[j]
                el = kinds[j] == _parser.KIND_ELEMENT
                in_title[j] = (p != -1 and in_title[p]) or (
                    el and tags[j] == "title")
                if kinds[j] == _parser.KIND_TEXT and p != -1 \
                        and in_title[p]:
                    title_parts.append(doc.texts[j] or "")
                if not el:
                    continue
                a = attrs.get(j, {})
                if tags[j] == "meta":
                    nm = a.get("name", "")
                    if nm == "description" and not row["description"]:
                        row["description"] = a.get("content", "")
                    elif nm == "robots" and not row["robots_meta"]:
                        row["robots_meta"] = a.get("content", "")
                    elif a.get("property", "") == "og:title" \
                            and not row["og_title"]:
                        row["og_title"] = a.get("content", "")
                elif tags[j] == "link":
                    if a.get("rel", "") == "canonical" \
                            and not row["canonical"]:
                        row["canonical"] = a.get("href", "")
                elif tags[j] == "html" and not row["html_lang"]:
                    row["html_lang"] = a.get("lang", "")
            row["title"] = "".join(title_parts)
            for f in fields:
                out[f].append(row[f])

        cols = list(pass_cols)
        cols.extend((f, pa.array(out[f], pa.string())) for f in fields)
        return pa.table(dict(cols))

"""Deterministic synthetic Common-Crawl-style corpus.

Builds the ``(url, warc_ts, html, text, lang)`` corpus mandated by
BASELINE.json's input_hint from the driver's ``documents.parquet``
table — no external data, no RNG: every page is a pure function of its
document row, so the extraction result is derivable in closed form
(the SQL oracles in ``__ray_entry__`` rely on this).

Page template (see ``page_html``): DOCTYPE + head (title/style, dropped
by extraction) + nav links + main content + a raw-text script with a
fake closing tag inside a quoted string (exercises the quote-aware raw
scanner on every page) + footer. Expected extracted text per row is
exactly::

    'home ' || lang || source || ' #' || doc_id || text || 'contact: mail'

``variant_html`` (bench corpus) inflates the main content by a
deterministic per-doc factor to create a realistic size skew with a
giant-page tail; it keeps the same template shape.
"""

from __future__ import annotations

import datetime

import pyarrow as pa

_EPOCH = datetime.datetime(2025, 1, 1)

# Constants describing the fixed template, used by tests/oracles.
# Nodes: doctype, html, head, title, title#text, style, style#text,
# body, nav, a, a#text, #text(space), a, a#text, main, h1, h1#text, p,
# p#text, script, script#text, footer, #text, a, a#text  => 25
TEMPLATE_N_NODES = 25
TEMPLATE_N_ATTRS = 3  # nav a[href], nav a[href], footer a[href]
TEMPLATE_N_LINKS = 3


def page_html(doc_id: int, text: str, lang: str, source: str) -> bytes:
    return (
        "<!DOCTYPE html>"
        f"<html><head><title>Doc {doc_id}</title>"
        "<style>p{margin:0}</style></head>"
        f'<body><nav><a href="/">home</a> <a href="/l/{lang}">{lang}</a></nav>'
        f"<main><h1>{source} #{doc_id}</h1><p>{text}</p></main>"
        '<script>var p="</nope>";</script>'
        '<footer>contact: <a href="mailto:x@example.com">mail</a></footer>'
        "</body></html>"
    ).encode("utf-8")


def expected_extracted_text(doc_id: int, text: str, lang: str,
                            source: str) -> str:
    return f"home {lang}{source} #{doc_id}{text}contact: mail"


def synthesize_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> corpus rows (map_batches, pyarrow format)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    html = [page_html(d, t, l, s)
            for d, t, l, s in zip(doc_ids, texts, langs, sources)]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "url": pa.array([f"synth://doc/{d}" for d in doc_ids], pa.string()),
        "warc_ts": pa.array(
            [_EPOCH + datetime.timedelta(seconds=int(d)) for d in doc_ids],
            pa.timestamp("ms")),
        "html": pa.array(html, pa.binary()),
        "text": batch.column("text"),
        "lang": batch.column("lang"),
    })


ENCODINGS = ("utf-8", "utf-8-bom", "utf-16le", "utf-16be",
             "utf-32le", "utf-32be")


def encoding_for(doc_id: int) -> str:
    return ENCODINGS[doc_id % 6]


def encode_page(html_utf8: bytes, encoding: str) -> bytes:
    """Re-encode a page the way real crawls vary: plain UTF-8, UTF-8 with
    BOM, or BOM-prefixed UTF-16/UTF-32 (either endianness) — all
    sniffable by the parser's 4-byte BOM check (SURVEY.md S1)."""
    if encoding == "utf-8":
        return html_utf8
    if encoding == "utf-8-bom":
        return b"\xef\xbb\xbf" + html_utf8
    text = html_utf8.decode("utf-8")
    if encoding == "utf-16le":
        return b"\xff\xfe" + text.encode("utf-16-le")
    if encoding == "utf-16be":
        return b"\xfe\xff" + text.encode("utf-16-be")
    if encoding == "utf-32le":
        return b"\xff\xfe\x00\x00" + text.encode("utf-32-le")
    return b"\x00\x00\xfe\xff" + text.encode("utf-32-be")


def synthesize_encoded_batch(batch: pa.Table) -> pa.Table:
    """Corpus rows with per-doc encoding cycled by doc_id%6."""
    out = synthesize_batch(batch)
    doc_ids = out.column("doc_id").to_pylist()
    htmls = out.column("html").to_pylist()
    encs = [encoding_for(d) for d in doc_ids]
    html2 = [encode_page(h, e) for h, e in zip(htmls, encs)]
    out = out.drop_columns(["html"])
    out = out.append_column("html", pa.array(html2, pa.binary()))
    return out.append_column("encoding", pa.array(encs, pa.string()))


# --- table pages (web-table extraction corpus) ---------------------------

def table_page_html(doc_id: int, lang: str, source: str,
                    n_chars: int) -> bytes:
    """Data-table page, pure function of the document row: a header
    row + three data rows; the ``source`` cell nests a <b> element so
    cell text must concatenate descendant text nodes (not just direct
    children); <tbody> wraps the data rows (transparent for row
    indexing)."""
    return (
        "<!DOCTYPE html>"
        f"<html><body><h1>t{doc_id}</h1>"
        '<table id="t1"><tr><th>k</th><th>v</th></tr>'
        f"<tbody><tr><td>lang</td><td>{lang}</td></tr>"
        f"<tr><td>source</td><td><b>{source}</b>!</td></tr>"
        f"<tr><td>chars</td><td>{n_chars}</td></tr></tbody></table>"
        "</body></html>"
    ).encode("utf-8")


def synthesize_table_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> table-page corpus rows (map_batches)."""
    doc_ids = batch.column("doc_id").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    n_chars = batch.column("n_chars").to_pylist()
    html = [table_page_html(d, l, s, c)
            for d, l, s, c in zip(doc_ids, langs, sources, n_chars)]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "url": pa.array([f"synth://table/{d}" for d in doc_ids],
                        pa.string()),
        "html": pa.array(html, pa.binary()),
    })


# --- head-metadata pages (title / meta / link through the parser) --------

def meta_page_html(doc_id: int, lang: str, source: str) -> bytes:
    """Head-rich page, pure function of the row: <title>, named and
    property= <meta> tags, a canonical <link>, and an html[lang]
    attribute. <meta>/<link> are VOID tags and ``charset=utf-8`` is an
    UNQUOTED attribute value, so the page exercises the void-element
    and unquoted-attr lexer paths (SURVEY L5/L8); the robots meta only
    exists for doc_id%9==0 so absent-field handling is covered."""
    d = int(doc_id)
    robots = ('<meta name="robots" content="noindex">'
              if d % 9 == 0 else "")
    return (
        "<!DOCTYPE html>"
        f'<html lang="{lang}"><head><meta charset=utf-8>'
        f"<title>Doc {d} | {source}</title>"
        f'<meta name="description" content="{source} page {d} ({lang})">'
        f'<meta property="og:title" content="OG {d}">'
        f"{robots}"
        f'<link rel="canonical" href="https://{source}-site.com/d/{d}">'
        "</head><body><p>x</p></body></html>"
    ).encode("utf-8")


def synthesize_meta_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "html": pa.array([meta_page_html(d, l, s) for d, l, s
                          in zip(doc_ids, langs, sources)],
                         pa.binary())})


# --- sitemaps (second real web format through the same parser) -----------

def sitemap_xml(doc_id: int, source: str) -> bytes:
    """Two-entry sitemap, pure function of the row; lastmod days cycle
    doc_id%28 so every field is SQL-rebuildable."""
    d = int(doc_id)
    u1 = f"https://{source}-site.com/s/{d}"
    lm1 = f"2025-01-{1 + d % 28:02d}"
    lm2 = f"2025-02-{1 + d % 28:02d}"
    return (
        "<urlset>"
        f"<url><loc>{u1}</loc><lastmod>{lm1}</lastmod></url>"
        f"<url><loc>{u1}/alt</loc><lastmod>{lm2}</lastmod></url>"
        "</urlset>"
    ).encode("utf-8")


def synthesize_sitemap_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    sources = batch.column("source").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "html": pa.array([sitemap_xml(d, s)
                          for d, s in zip(doc_ids, sources)],
                         pa.binary())})


# --- bench corpus (size-skewed, deterministic) --------------------------

def _size_factor(doc_id: int) -> int:
    """Deterministic skewed size multiplier: most pages small, a p99.9
    tail of giant pages (hash-derived, no RNG)."""
    h = (doc_id * 2654435761) & 0xFFFFFFFF  # Knuth multiplicative hash
    r = h % 1000
    if r < 700:
        return 1 + h % 4        # 70%: 1-4x
    if r < 950:
        return 5 + h % 20       # 25%: 5-24x
    if r < 998:
        return 30 + h % 80      # ~5%: 30-110x
    return 400 + h % 600        # 0.2%: giant pages


def variant_batch(batch: pa.Table, repeat_tag: int = 0) -> pa.Table:
    """documents rows -> size-skewed bench corpus rows. ``repeat_tag``
    distinguishes corpus replicas when the base table is unioned with
    itself to scale total bytes."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    out_html = []
    out_url = []
    for d, t, l, s in zip(doc_ids, texts, langs, sources):
        k = _size_factor(int(d) + 500 * repeat_tag)
        body = " ".join([t] * k)
        out_html.append(page_html(int(d), body, l, s))
        out_url.append(f"synth://r{repeat_tag}/doc/{d}")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "url": pa.array(out_url, pa.string()),
        "warc_ts": pa.array(
            [_EPOCH + datetime.timedelta(seconds=int(d)) for d in doc_ids],
            pa.timestamp("ms")),
        "html": pa.array(out_html, pa.binary()),
        "text": batch.column("text"),
        "lang": batch.column("lang"),
    })


# --- crawl-frontier URLs (deterministic, closed-form) --------------------

_URL_TLDS = ("com", "org", "net", "co.uk", "com.cn")
_URL_SUBS = ("www", "blog", "", "news")


def crawl_url(doc_id: int, lang: str, source: str) -> str:
    """Realistic CC-style URL as a pure function of the document row:
    scheme/subdomain/TLD/port/path-shape/query-arity all cycle on
    doc_id so every parser branch (multi-label public suffix, missing
    subdomain, explicit port, trailing slash, 0/1/2 query params) is
    exercised and the SQL oracle can rebuild each parsed field from
    the row directly."""
    d = int(doc_id)
    scheme = "http" if d % 3 == 0 else "https"
    sub = _URL_SUBS[d % 4]
    tld = _URL_TLDS[d % 5]
    host = (sub + "." if sub else "") + f"{source}-site.{tld}"
    port = ":8080" if d % 7 == 0 else ""
    path = f"/{lang}/p{d}/" if d % 6 == 0 else f"/{lang}/a{d % 10}/p{d}"
    if d % 3 == 1:
        q = f"?ref={source}"
    elif d % 3 == 2:
        q = f"?ref={source}&q=t{d % 100}"
    else:
        q = ""
    return f"{scheme}://{host}{port}{path}{q}"


def synthesize_url_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> (doc_id, url) crawl-frontier rows."""
    urls = [crawl_url(d, l, s)
            for d, l, s in zip(batch.column("doc_id").to_pylist(),
                               batch.column("lang").to_pylist(),
                               batch.column("source").to_pylist())]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "url": pa.array(urls, pa.string())})


def robots_txt(source: str, tld_idx: int) -> str:
    """Deterministic robots.txt per registered domain
    ``{source}-site.{tld}``: a decoy full-block group for another
    agent (exercises group selection), then a ``*`` group with one
    wildcard Disallow and a more-specific Allow override —
    ``k = (2*s + tld_idx) % 10`` where ``s`` is the source index, so
    the SQL oracle rebuilds the verdict per URL row in closed form."""
    s = int(source[3:])
    k = (2 * s + tld_idx) % 10
    return ("User-agent: gptbot\nDisallow: /\n\n"
            "User-agent: *\n"
            f"Disallow: /*/a{k}/\n"
            f"Allow: /*/a{k}/p1\n"
            "Disallow:\n"  # empty pattern = no-op (spec edge case)
            )


def synthesize_robots_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> per-registered-domain robots rows (duplicates
    collapse downstream; tld cycles doc_id%5 like crawl_url)."""
    doc_ids = batch.column("doc_id").to_pylist()
    sources = batch.column("source").to_pylist()
    doms, txts = [], []
    for d, s in zip(doc_ids, sources):
        t = int(d) % 5
        doms.append(f"{s}-site.{_URL_TLDS[t]}")
        txts.append(robots_txt(s, t))
    return pa.table({"registered_domain": pa.array(doms, pa.string()),
                     "robots_txt": pa.array(txts, pa.string())})

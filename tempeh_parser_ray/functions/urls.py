"""Vectorized URL parsing — crawl-frontier / per-domain analytics.

Common-Crawl-scale curation groups and filters by URL structure
(registered domain, host, path depth, query shape) before any content
parse. The parser here is ONE vectorized Arrow kernel per batch
(``pc.extract_regex`` with named groups), not a per-row ``urlparse``
loop, plus a second anchored-regex kernel for the registered domain
under a small embedded public-suffix set (multi-label suffixes like
``co.uk`` — the real public-suffix list is a data file shipped the
same way; the matching rule, longest-suffix-plus-one-label, is
identical).

Malformed URLs (no scheme-authority match) surface as null host /
zeroed counters — never raised (the engine's error contract).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# URL splitter (RFC-3986 shaped, no lookbehind so RE2-compatible).
_URL_RE = (r"^(?P<scheme>[a-z0-9+.-]+)://(?P<host>[^/:?#]+)"
           r"(?::(?P<port>\d+))?(?P<path>/[^?#]*)?"
           r"(?:\?(?P<query>[^#]*))?")

# Multi-label public suffixes recognized by the embedded set; the
# registered domain is the suffix plus one label. Single alternation,
# end-anchored, longest alternative first.
_MULTI_SUFFIXES = ("co.uk", "com.cn", "co.jp", "com.br")
_RD_RE = (r"(?P<rd>[^.]+\.(?:"
          + "|".join(s.replace(".", r"\.") for s in _MULTI_SUFFIXES)
          + r")|[^.]+\.[^.]+)$")


def parse_url_batch(batch: pa.Table, url_col: str = "url",
                    include_path: bool = False) -> pa.Table:
    """Append scheme/host/registered_domain/path_depth/n_query_params
    columns. Two vectorized regex kernels; no Python row loop.
    ``include_path`` additionally appends the raw ``path`` string
    (consumed by the robots matcher, ``webops.robots_filter``)."""
    urls = batch.column(url_col)
    parts = pc.extract_regex(urls, _URL_RE)
    scheme = pc.struct_field(parts, "scheme")
    host = pc.struct_field(parts, "host")
    port = pc.struct_field(parts, "port")
    path = pc.struct_field(parts, "path")
    query = pc.struct_field(parts, "query")

    rd = pc.struct_field(pc.extract_regex(host, _RD_RE), "rd")

    # path depth = number of NON-EMPTY segments: '/'-count minus one
    # for a trailing slash; null/absent path -> 0
    path_f = pc.fill_null(path, "")
    slashes = pc.count_substring(path_f, "/")
    trailing = pc.if_else(pc.ends_with(path_f, "/"), 1, 0)
    depth = pc.max_element_wise(
        pc.subtract(slashes, trailing), pa.scalar(0))

    # n params: '' or absent -> 0, else '&'-count + 1
    q_f = pc.fill_null(query, "")
    n_params = pc.if_else(
        pc.equal(q_f, ""), pa.scalar(0, pa.int64()),
        pc.add(pc.count_substring(q_f, "&"), 1).cast(pa.int64()))

    out = batch
    for name, col in (
            ("scheme", pc.fill_null(scheme, "")),
            ("host", pc.fill_null(host, "")),
            ("registered_domain", pc.fill_null(rd, "")),
            # RE2 reports unparticipated optional groups as "" (not
            # null), so presence tests compare against empty string
            ("has_port",
             pc.cast(pc.not_equal(pc.fill_null(port, ""), ""),
                     pa.int64())),
            ("path_depth", depth.cast(pa.int64())),
            ("n_query_params", n_params)):
        out = out.append_column(name, col)
    if include_path:
        out = out.append_column("path", path_f)
    return out


# --- reference resolution (RFC 3986 par.5, the crawl-frontier step) --------

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:"


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 par.5.2.4 (exact algorithm, applied only to rows whose
    merged path contains a dot segment — the vectorized fast paths
    below never call this)."""
    out: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1)
            if i < 0:
                out.append(buf)
                buf = ""
            else:
                out.append(buf[:i])
                buf = buf[i:]
    return "".join(out)


def resolve_url_batch(base: pa.Array, href: pa.Array) -> pa.Array:
    """Resolve each ``href`` against its row's ``base`` URL
    (RFC 3986 par.5 reference resolution — what turns extracted link
    edges into crawl-frontier URLs). Vectorized by case mask: absolute
    (own scheme) kept; ``//netloc`` takes the base scheme; ``/root``
    joins the base origin; query-only joins the base path; everything
    else merges with the base directory. Dot segments are removed via
    the exact RFC algorithm, invoked per-row ONLY where a dot segment
    exists. Null/malformed bases yield the href unchanged."""
    import numpy as np

    base = base.combine_chunks() if isinstance(
        base, pa.ChunkedArray) else base
    href = href.combine_chunks() if isinstance(
        href, pa.ChunkedArray) else href
    parts = pc.extract_regex(base, _URL_RE)
    scheme = pc.fill_null(pc.struct_field(parts, "scheme"), "")
    host = pc.fill_null(pc.struct_field(parts, "host"), "")
    port = pc.fill_null(pc.struct_field(parts, "port"), "")
    bpath = pc.fill_null(pc.struct_field(parts, "path"), "")
    bpath = pc.if_else(pc.equal(bpath, ""), "/", bpath)
    origin = pc.binary_join_element_wise(
        scheme, "://", host,
        pc.if_else(pc.equal(port, ""), "",
                   pc.binary_join_element_wise(":", port, "")), "")

    h = pc.fill_null(href, "")
    is_abs = pc.match_substring_regex(h, _SCHEME_RE)
    is_net = pc.starts_with(h, "//")
    is_root = pc.and_(pc.starts_with(h, "/"), pc.invert(is_net))
    is_query = pc.starts_with(h, "?")
    # base directory: path up to (and including) the last '/'
    dir_rx = pc.struct_field(
        pc.extract_regex(bpath, r"^(?P<d>.*/)"), "d")
    bdir = pc.fill_null(dir_rx, "/")

    resolved = pc.if_else(
        is_abs, h,
        pc.if_else(
            is_net, pc.binary_join_element_wise(scheme, ":", h, ""),
            pc.if_else(
                is_root, pc.binary_join_element_wise(origin, h, ""),
                pc.if_else(
                    is_query,
                    pc.binary_join_element_wise(origin, bpath, h, ""),
                    pc.binary_join_element_wise(origin, bdir, h, "")))))
    # malformed base (no origin): keep href as-is
    resolved = pc.if_else(pc.equal(origin, "://"), h, resolved)

    # per-row dot-segment cleanup only where needed
    needs = pc.match_substring_regex(
        resolved, r"://[^/]*/(?:[^?#]*/)?\.\.?(?:/|$|\?)")
    if pc.any(needs).as_py():
        vals = resolved.to_pylist()
        mask = needs.to_numpy(zero_copy_only=False)
        out = []
        for v, m in zip(vals, mask):
            if not m or v is None:
                out.append(v)
                continue
            mpar = pc.extract_regex(pa.array([v]), _URL_RE)
            sch = mpar[0]["scheme"].as_py() if mpar[0].is_valid else ""
            hst = (mpar[0]["host"].as_py() or "") if mpar[0].is_valid \
                else ""
            prt = (mpar[0]["port"].as_py() or "") if mpar[0].is_valid \
                else ""
            pth = (mpar[0]["path"].as_py() or "/") if mpar[0].is_valid \
                else "/"
            qry = (mpar[0]["query"].as_py() or "") if mpar[0].is_valid \
                else ""
            o = f"{sch}://{hst}" + (f":{prt}" if prt else "")
            out.append(o + _remove_dot_segments(pth)
                       + (f"?{qry}" if qry else ""))
        resolved = pa.array(out, pa.string())
    return resolved


def canonicalize_url_batch(arr: pa.Array | pa.ChunkedArray,
                           ) -> pa.Array:
    """Crawl-frontier URL canonicalization: strip the fragment and
    every ``utm_*`` tracking parameter, then repair dangling ``?``/
    ``&`` separators — three Arrow regex kernels, no per-row Python.
    Two frontier entries that differ only in tracking decoration
    collapse to one canonical key (the dedup step every crawler runs
    before the fetch queue; Common Crawl's URL normalizer does the
    same strip). The utm match is anchored to a ``?``/``&`` separator
    (which the replacement preserves) so a non-tracking param whose
    name merely CONTAINS ``utm_`` (``?xutm_a=1``) survives; a run of
    consecutive utm params is consumed in one match so the second of
    ``?utm_a=1&utm_b=2`` cannot hide behind the first's eaten ``&``."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    x = pc.replace_substring_regex(arr, r"#.*$", "")
    x = pc.replace_substring_regex(
        x,
        r"([?&])utm_[A-Za-z0-9_]*=[^&#]*(?:&utm_[A-Za-z0-9_]*=[^&#]*)*&?",
        r"\1")
    x = pc.replace_substring_regex(x, r"[?&]$", "")
    return x

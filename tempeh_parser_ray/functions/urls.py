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

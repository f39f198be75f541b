"""Main-content text extraction over a parsed document.

The reference repo is a parser only — extraction semantics are defined
HERE, deterministically, so that "byte-identical extracted text per url"
(BASELINE.json input_hint) is well-defined: conformance tests apply this
same function to the reference-generated golden trees and compare
byte-for-byte with the pipeline output.

Extraction = tag-allowlist DOM walk (north_star):

* element subtrees whose (case-folded) tag is in ``DROP_TAGS`` are
  skipped entirely;
* comment / doctype nodes contribute nothing;
* remaining text nodes are concatenated AS-IS (no whitespace
  normalization — the reference never trims text content,
  README.md:287-296) in document order;
* each contributing text node yields a span ``(start, end, node)`` of
  code-point offsets into the extracted text, ``node`` being the node's
  ordinal in the flat parse.

Boilerplate heuristics (text-density / link-density) are computed as
per-document METRICS from the same walk; the optional ``main_text``
variant drops direct text children of elements whose subtree link
density exceeds a threshold (classic content-extraction heuristic, cf.
boilerpipe/jusText-style link-density filtering).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .parser import KIND_ELEMENT, KIND_TEXT, ParsedDoc

# Subtrees that never contribute to extracted main content.
DROP_TAGS = frozenset({
    "script", "style", "template", "head", "noscript", "iframe",
    "svg", "title", "textarea",
})

LINK_TAG = "a"


@dataclass
class Extraction:
    text: str
    span_starts: list[int]
    span_ends: list[int]
    span_nodes: list[int]
    n_nodes: int
    n_text_nodes: int
    n_links: int
    link_chars: int
    link_density: float
    n_tokens: int
    error: Optional[str]


def extract(doc: ParsedDoc) -> Extraction:
    """Allowlist DOM walk over the flat node arrays (single pass)."""
    n = doc.n_nodes
    kinds = doc.kinds
    tags = doc.tags
    texts = doc.texts
    parents = doc.parents

    # dropped[i] / linked[i]: whether node i is inside a dropped subtree /
    # inside an <a>. Parents always precede children in the flat order,
    # so one forward pass suffices.
    dropped = bytearray(n)
    linked = bytearray(n)
    pieces: list[str] = []
    span_starts: list[int] = []
    span_ends: list[int] = []
    span_nodes: list[int] = []
    pos = 0
    n_text_nodes = 0
    n_links = 0
    link_chars = 0
    # whitespace-token count of the CONCATENATED text, accumulated
    # during the walk (exactly len(text.split()): a piece whose first
    # char continues the previous piece's trailing non-whitespace run
    # merges one token across the boundary) — composites gate on this
    # without re-scanning the text (web_pipeline's single tokenize)
    n_tokens = 0
    prev_nonws_tail = False

    for i in range(n):
        p = parents[i]
        kind = kinds[i]
        if kind == KIND_ELEMENT:
            tag = tags[i].lower()
            is_dropped = (p >= 0 and dropped[p]) or tag in DROP_TAGS
            dropped[i] = is_dropped
            is_link = (p >= 0 and linked[p]) or tag == LINK_TAG
            linked[i] = is_link
            if tag == LINK_TAG and not is_dropped:
                n_links += 1
        elif kind == KIND_TEXT:
            if p >= 0 and dropped[p]:
                continue
            t = texts[i]
            ln = len(t)
            pieces.append(t)
            span_starts.append(pos)
            span_ends.append(pos + ln)
            span_nodes.append(i)
            if p >= 0 and linked[p]:
                link_chars += ln
            pos += ln
            n_text_nodes += 1
            k = len(t.split())
            if k:
                n_tokens += k - (1 if prev_nonws_tail
                                 and not t[0].isspace() else 0)
            if t:
                prev_nonws_tail = not t[-1].isspace()
        # comments / doctypes: skipped

    text = "".join(pieces)
    return Extraction(
        text=text,
        span_starts=span_starts,
        span_ends=span_ends,
        span_nodes=span_nodes,
        n_nodes=n,
        n_text_nodes=n_text_nodes,
        n_links=n_links,
        link_chars=link_chars,
        link_density=link_chars / len(text) if text else 0.0,
        n_tokens=n_tokens,
        error=doc.error,
    )


def extract_main_text(doc: ParsedDoc, link_density_threshold: float = 0.5) -> str:
    """Boilerplate-filtered variant: additionally drops text whose
    PARENT element's subtree has link density > threshold (navigation
    bars, footers, link farms)."""
    n = doc.n_nodes
    kinds = doc.kinds
    tags = doc.tags
    texts = doc.texts
    parents = doc.parents

    dropped = bytearray(n)
    linked = bytearray(n)

    keep_text: list[int] = []
    for i in range(n):
        p = parents[i]
        kind = kinds[i]
        if kind == KIND_ELEMENT:
            tag = tags[i].lower()
            dropped[i] = (p >= 0 and dropped[p]) or tag in DROP_TAGS
            linked[i] = (p >= 0 and linked[p]) or tag == LINK_TAG
        elif kind == KIND_TEXT:
            if p >= 0 and dropped[p]:
                continue
            keep_text.append(i)

    # accumulate subtree char counts bottom-up (children have higher
    # indices than parents, so a reverse pass propagates correctly)
    own_chars = [0] * n
    own_link = [0] * n
    for i in keep_text:
        ln = len(texts[i])
        p = parents[i]
        if p >= 0:
            own_chars[p] += ln
            if linked[p]:
                own_link[p] += ln
    subtree_chars = own_chars[:]
    subtree_link = own_link[:]
    for i in range(n - 1, -1, -1):
        p = parents[i]
        if p >= 0 and kinds[i] == KIND_ELEMENT:
            subtree_chars[p] += subtree_chars[i]
            subtree_link[p] += subtree_link[i]

    out: list[str] = []
    for i in keep_text:
        p = parents[i]
        if p >= 0:
            tc = subtree_chars[p]
            if tc > 0 and subtree_link[p] / tc > link_density_threshold:
                continue
        out.append(texts[i])
    return "".join(out)


def extract_from_nested(nodes: list, drop_tags: frozenset[str] = DROP_TAGS) -> str:
    """Same allowlist walk over the reference's NESTED golden shape —
    used by conformance tests to derive the expected extracted text from
    reference-generated trees (iterative: goldens can nest deeply)."""
    out: list[str] = []
    stack = list(reversed(nodes))
    while stack:
        node = stack.pop()
        if "textContent" in node:
            out.append(node["textContent"])
        elif "tagName" in node:
            if node["tagName"].lower() in drop_tags:
                continue
            stack.extend(reversed(node.get("children", [])))
    return "".join(out)

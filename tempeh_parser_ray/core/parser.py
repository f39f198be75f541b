"""Tree builder: token stream -> flat node/attr arrays.

Re-implements the reference's recursive streaming tree builder
(reference: ``src/parseTemplate.js:23-247``) as an iterative builder
producing a FLAT node array with parent pointers — real web pages nest
hundreds of elements deep, which would blow both Python recursion and
Arrow nested-struct limits. ``to_nested`` reconstructs the reference's
exact nested JSON shape (``attributes``/``children`` omitted when empty)
for golden comparison.

Replicated semantics (each verified against the running reference):

* attribute values attach to the LAST seen attribute; a value with no
  preceding attribute aborts the parse (parseTemplate.js:104-130).
* elements are only committed on OPENING_TAG_END / SELF_CLOSING_TAG_END;
  EOF mid-tag silently drops the element and its pending attributes
  (parseTemplate.js:93-181).
* closing tags match ancestors innermost-out on the CASED name; a match
  pops every intermediate element; a non-match is ignored
  (parseTemplate.js:184-208).
* tagNameCasing lower/upper/preserve applies to opening AND closing
  names (parseTemplate.js:69-77,186-194); in preserve mode matching is
  case-sensitive.
* empty text tokens are dropped (parseTemplate.js:50-52).
* on an ERROR token the reference aborts the whole stream; at web scale
  we instead record the message in ``error`` and keep nodes parsed so
  far (SURVEY.md P5). The message format mirrors the reference's,
  including its quirk of reporting the opening tag's name/position for
  errors inside an opening tag (parseTemplate.js:157-163).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from . import lexer
from .lexer import (
    ATTRIBUTE_NAME, ATTRIBUTE_VALUE, CLOSING_TAGNAME, COMMENT,
    DOCTYPE_DECLARATION, EOF, ERROR, OPENING_TAGNAME, OPENING_TAG_END,
    SELF_CLOSING_TAG_END, TEXT_CONTENT, TOKEN_TYPE_NAMES, Token,
)

# node kinds in the flat encoding
KIND_ELEMENT = 0
KIND_TEXT = 1
KIND_COMMENT = 2
KIND_DOCTYPE = 3


@dataclass
class ParsedDoc:
    """Flat parse result for one document (FIXTURES.md par.3 layout)."""

    kinds: list[int] = field(default_factory=list)
    tags: list[Optional[str]] = field(default_factory=list)  # element tagName
    texts: list[Optional[str]] = field(default_factory=list)  # text/comment/doctype value
    parents: list[int] = field(default_factory=list)  # -1 for roots
    lines: list[int] = field(default_factory=list)
    cols: list[int] = field(default_factory=list)
    attr_node: list[int] = field(default_factory=list)
    attr_name: list[str] = field(default_factory=list)
    attr_value: list[str] = field(default_factory=list)
    attr_line: list[int] = field(default_factory=list)
    attr_col: list[int] = field(default_factory=list)
    error: Optional[str] = None

    @property
    def n_nodes(self) -> int:
        return len(self.kinds)


def _case(name: str, casing: str) -> str:
    if casing == "lower":
        return name.lower()
    if casing == "upper":
        return name.upper()
    return name


def parse_tokens(tokens: list[Token], tag_name_casing: str = "lower") -> ParsedDoc:
    doc = ParsedDoc()
    kinds = doc.kinds
    tags = doc.tags
    texts = doc.texts
    parents = doc.parents
    lines = doc.lines
    cols = doc.cols

    # stack of (node_index, cased_tag_name) for open elements
    stack: list[tuple[int, str]] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        tt = t[0]
        if tt == TEXT_CONTENT:
            if t[1]:
                kinds.append(KIND_TEXT)
                tags.append(None)
                texts.append(t[1])
                parents.append(stack[-1][0] if stack else -1)
                lines.append(t[2])
                cols.append(t[3])
        elif tt == OPENING_TAGNAME:
            tag = _case(t[1], tag_name_casing)
            pending_attrs: list[list[Any]] = []
            i += 1
            while i < n:
                t2 = tokens[i]
                t2t = t2[0]
                if t2t == ATTRIBUTE_NAME:
                    pending_attrs.append([t2[1], "", t2[2], t2[3]])
                elif t2t == ATTRIBUTE_VALUE:
                    if pending_attrs:
                        pending_attrs[-1][1] = t2[1]
                    else:
                        doc.error = (
                            "Tempeh parsing error: Encountered unexpected "
                            f"attribute value {t2[1]} at {t2[2]}:{t2[3]}"
                        )
                        return doc
                elif t2t in (SELF_CLOSING_TAG_END, OPENING_TAG_END):
                    node = len(kinds)
                    kinds.append(KIND_ELEMENT)
                    tags.append(tag)
                    texts.append(None)
                    parents.append(stack[-1][0] if stack else -1)
                    lines.append(t[2])
                    cols.append(t[3])
                    for name, value, al, ac in pending_attrs:
                        doc.attr_node.append(node)
                        doc.attr_name.append(name)
                        doc.attr_value.append(value)
                        doc.attr_line.append(al)
                        doc.attr_col.append(ac)
                    if t2t == OPENING_TAG_END:
                        stack.append((node, tag))
                    break
                elif t2t == EOF:
                    return doc  # element dropped (parseTemplate.js:154-155)
                elif t2t == ERROR:
                    # Reference bug faithfully mirrored: message uses the
                    # OPENING_TAGNAME token's value and position
                    # (parseTemplate.js:157-163).
                    doc.error = (
                        f"Tempeh parsing error: {t[1]} at {t[2]}:{t[3]}"
                    )
                    return doc
                else:
                    name = TOKEN_TYPE_NAMES.get(t2t, f"UNKNOWN:{t2t}")
                    doc.error = (
                        "Tempeh parsing error: Encountered unexpected "
                        f"token type {name} at {t2[2]}:{t2[3]}"
                    )
                    return doc
                i += 1
        elif tt == CLOSING_TAGNAME:
            tag = _case(t[1], tag_name_casing)
            for d in range(len(stack) - 1, -1, -1):
                if stack[d][1] == tag:
                    del stack[d:]  # pop matched element + intermediates
                    break
            # no match: ignored (parseTemplate.js:206-207)
        elif tt == DOCTYPE_DECLARATION:
            kinds.append(KIND_DOCTYPE)
            tags.append(None)
            texts.append(t[1])
            parents.append(stack[-1][0] if stack else -1)
            lines.append(t[2])
            cols.append(t[3])
        elif tt == COMMENT:
            kinds.append(KIND_COMMENT)
            tags.append(None)
            texts.append(t[1])
            parents.append(stack[-1][0] if stack else -1)
            lines.append(t[2])
            cols.append(t[3])
        elif tt == EOF:
            break
        elif tt == ERROR:
            doc.error = f"Tempeh parsing error: {t[1]} at {t[2]}:{t[3]}"
            return doc
        else:
            name = TOKEN_TYPE_NAMES.get(tt, f"UNKNOWN:{tt}")
            doc.error = (
                "Tempeh parsing error: Encountered unexpected token type "
                f"{name} at {t[2]}:{t[3]}"
            )
            return doc
        i += 1
    return doc


def iter_root_nodes(tokens, tag_name_casing: str = "lower"):
    """Streamed per-node consumption — the engine's equivalent of the
    reference's async iteration / ``childStream`` recursion
    (``src/HTMLParser.js:24-67``, README.md:203-224): yields each ROOT
    node's completed nested subtree (same JSON shape as ``to_nested``)
    as soon as its closing tag resolves, holding only the open-element
    path and the current subtree — consumers can recursively walk a
    yielded subtree before later siblings are parsed. The distributed
    equivalent in the Ray engine is block-level pipelining (SURVEY.md
    §2.9); this is the single-document surface.

    Error semantics mirror the reference's iterator, which REJECTS the
    pending step: roots completed before the error are yielded, then
    ``ValueError`` is raised with the reference-exact message (the
    batch ``parse_tokens`` path instead records ``error`` and keeps
    parsed nodes — SURVEY.md P5 web-scale tolerance).

    Equivalence with the batch builder is pinned by a differential
    test: ``list(iter_root_nodes(toks))`` must equal
    ``to_nested(parse_tokens(toks))`` on every non-error document.

    ``tokens`` may be a list OR a lazy iterator (e.g. the incremental
    ``lexer.Tokenizer.tokenize_stream`` generator) — the builder pulls
    one token at a time, so with a streaming lexer a completed root is
    yielded BEFORE the tail of the input has been lexed (the
    reference's lex-while-consume property, ``src/lexer.js:504-511``)."""

    def _attach(node: dict[str, Any],
                stack: list[tuple[dict[str, Any], str]]):
        if stack:
            stack[-1][0].setdefault("children", []).append(node)
            return None
        return node  # completed root (non-element or yielded later)

    stack: list[tuple[dict[str, Any], str]] = []
    root_open: Optional[dict[str, Any]] = None  # stack[0]'s node
    it = iter(tokens)
    for t in it:
        tt = t[0]
        if tt == TEXT_CONTENT:
            if t[1]:
                done = _attach({"textContent": t[1], "l": t[2], "c": t[3]},
                               stack)
                if done is not None:
                    yield done
        elif tt == OPENING_TAGNAME:
            tag = _case(t[1], tag_name_casing)
            pending_attrs: list[list[Any]] = []
            for t2 in it:
                t2t = t2[0]
                if t2t == ATTRIBUTE_NAME:
                    pending_attrs.append([t2[1], "", t2[2], t2[3]])
                elif t2t == ATTRIBUTE_VALUE:
                    if pending_attrs:
                        pending_attrs[-1][1] = t2[1]
                    else:
                        raise ValueError(
                            "Tempeh parsing error: Encountered unexpected "
                            f"attribute value {t2[1]} at {t2[2]}:{t2[3]}")
                elif t2t in (SELF_CLOSING_TAG_END, OPENING_TAG_END):
                    node: dict[str, Any] = {"tagName": tag,
                                            "c": t[3], "l": t[2]}
                    if pending_attrs:
                        node["attributes"] = [
                            {"name": a, "l": al, "c": ac, "value": v}
                            for a, v, al, ac in pending_attrs]
                    done = _attach(node, stack)
                    if t2t == OPENING_TAG_END:
                        stack.append((node, tag))
                        if done is not None:
                            root_open = node
                    elif done is not None:
                        yield done
                    break
                elif t2t == EOF:
                    # element dropped (parseTemplate.js:154-155); the
                    # still-open root subtree is complete as-parsed
                    if root_open is not None:
                        yield root_open
                    return
                elif t2t == ERROR:
                    raise ValueError(
                        f"Tempeh parsing error: {t[1]} at {t[2]}:{t[3]}")
                else:
                    name = TOKEN_TYPE_NAMES.get(t2t, f"UNKNOWN:{t2t}")
                    raise ValueError(
                        "Tempeh parsing error: Encountered unexpected "
                        f"token type {name} at {t2[2]}:{t2[3]}")
        elif tt == CLOSING_TAGNAME:
            tag = _case(t[1], tag_name_casing)
            for d in range(len(stack) - 1, -1, -1):
                if stack[d][1] == tag:
                    del stack[d:]
                    if d == 0 and root_open is not None:
                        yield root_open  # root subtree now complete
                        root_open = None
                    break
        elif tt == DOCTYPE_DECLARATION:
            done = _attach({"doctypeDeclaration": t[1],
                            "l": t[2], "c": t[3]}, stack)
            if done is not None:
                yield done
        elif tt == COMMENT:
            done = _attach({"comment": t[1], "l": t[2], "c": t[3]}, stack)
            if done is not None:
                yield done
        elif tt == EOF:
            break
        elif tt == ERROR:
            raise ValueError(
                f"Tempeh parsing error: {t[1]} at {t[2]}:{t[3]}")
        else:
            name = TOKEN_TYPE_NAMES.get(tt, f"UNKNOWN:{tt}")
            raise ValueError(
                "Tempeh parsing error: Encountered unexpected token type "
                f"{name} at {t[2]}:{t[3]}")
    if root_open is not None:
        yield root_open  # EOF with unclosed root element


def parse_bytes(data: bytes, tag_name_casing: str = "lower",
                ignore_self_closing: bool = False,
                track_positions: bool = True) -> ParsedDoc:
    """parseFile-equivalent entry: raw page bytes -> ParsedDoc.

    ``track_positions=False`` is the extraction hot path: line/column
    bookkeeping is skipped (all positions 0). If such a parse errors,
    it is re-run WITH positions so the error message stays
    reference-exact — errors are rare, the double parse is noise."""
    doc = parse_tokens(
        lexer.tokenize_bytes(data, ignore_self_closing, track_positions),
        tag_name_casing)
    if doc.error is not None and not track_positions:
        return parse_bytes(data, tag_name_casing, ignore_self_closing, True)
    return doc


def parse_string(raw: str, tag_name_casing: str = "lower",
                 ignore_self_closing: bool = False,
                 track_positions: bool = True) -> ParsedDoc:
    """parseString-equivalent entry."""
    doc = parse_tokens(
        lexer.tokenize_str(raw, ignore_self_closing, track_positions),
        tag_name_casing)
    if doc.error is not None and not track_positions:
        return parse_string(raw, tag_name_casing, ignore_self_closing, True)
    return doc


def to_nested(doc: ParsedDoc) -> list[dict[str, Any]]:
    """Rebuild the reference's nested JSON forest (src/types.js:1-60):
    ``attributes``/``children`` keys omitted entirely when empty."""
    n = doc.n_nodes
    nodes: list[dict[str, Any]] = [None] * n  # type: ignore[list-item]
    children: list[list[dict[str, Any]]] = [[] for _ in range(n)]
    roots: list[dict[str, Any]] = []
    for idx in range(n):
        kind = doc.kinds[idx]
        if kind == KIND_ELEMENT:
            node: dict[str, Any] = {
                "tagName": doc.tags[idx], "c": doc.cols[idx], "l": doc.lines[idx],
            }
        elif kind == KIND_TEXT:
            node = {"textContent": doc.texts[idx],
                    "l": doc.lines[idx], "c": doc.cols[idx]}
        elif kind == KIND_COMMENT:
            node = {"comment": doc.texts[idx],
                    "l": doc.lines[idx], "c": doc.cols[idx]}
        else:
            node = {"doctypeDeclaration": doc.texts[idx],
                    "l": doc.lines[idx], "c": doc.cols[idx]}
        nodes[idx] = node
        parent = doc.parents[idx]
        if parent == -1:
            roots.append(node)
        else:
            children[parent].append(node)
    for a in range(len(doc.attr_node)):
        el = nodes[doc.attr_node[a]]
        el.setdefault("attributes", []).append({
            "name": doc.attr_name[a], "l": doc.attr_line[a],
            "c": doc.attr_col[a], "value": doc.attr_value[a],
        })
    for idx in range(n):
        if doc.kinds[idx] == KIND_ELEMENT and children[idx]:
            nodes[idx]["children"] = children[idx]
    return roots

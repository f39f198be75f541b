"""User-facing single-document API, mirroring the reference's surface.

Reference: ``src/HTMLParser.js:82-140`` (``HTMLParser`` with
``parseFile`` / ``parseString`` and options ``tagNameCasing``
['lower'|'upper'|'preserve', default 'lower'] and
``ignoreSelfClosingSyntax`` [default False]).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

from . import parser as _parser


@dataclass(frozen=True)
class ParserOptions:
    tag_name_casing: str = "lower"  # 'lower' | 'upper' | 'preserve'
    ignore_self_closing_syntax: bool = False

    def __post_init__(self) -> None:
        if self.tag_name_casing not in ("lower", "upper", "preserve"):
            raise ValueError(
                f"invalid tag_name_casing: {self.tag_name_casing!r}")


class HTMLParser:
    """Single-document parser with the reference's exact semantics."""

    def __init__(self, options: ParserOptions | None = None, **kwargs: Any):
        self.options = options or ParserOptions(**kwargs)

    def parse_bytes(self, data: bytes) -> _parser.ParsedDoc:
        """parseFile-equivalent over in-memory page bytes (BOM-sniffed)."""
        return _parser.parse_bytes(
            data, self.options.tag_name_casing,
            self.options.ignore_self_closing_syntax)

    def parse_file(self, path: str | Path) -> _parser.ParsedDoc:
        return self.parse_bytes(Path(path).read_bytes())

    def parse_string(self, raw: str) -> _parser.ParsedDoc:
        """parseString-equivalent (no BOM sniffing, lexer.js:141-149)."""
        return _parser.parse_string(
            raw, self.options.tag_name_casing,
            self.options.ignore_self_closing_syntax)

    def parse_to_nested(self, source: str | bytes) -> list[dict[str, Any]]:
        """Parse and return the reference's nested node-forest shape."""
        doc = (self.parse_bytes(source) if isinstance(source, bytes)
               else self.parse_string(source))
        if doc.error is not None:
            raise ValueError(doc.error)
        return _parser.to_nested(doc)

    def iter_nodes(self, source: str | bytes):
        """Streamed per-node consumption (reference async iteration /
        ``childStream``, ``src/HTMLParser.js:24-67``): a generator
        yielding each root node's completed nested subtree as soon as
        it closes — consumers can recursively walk a yielded subtree
        before later siblings are parsed. Raises ``ValueError`` with
        the reference-exact message on a parse error (the iterator
        rejects, matching the reference; completed roots are yielded
        first).

        Lexing is INCREMENTAL (``lexer.Tokenizer.tokenize_stream``):
        tokens are pulled one at a time, so a completed root is
        observable before the tail of the input has been lexed — the
        reference's lex-while-consume property (``src/lexer.js:504-511``)
        at token granularity, not just tree granularity."""
        from . import lexer as _lexer

        tokens = (_lexer.tokenize_bytes_stream(
            source, self.options.ignore_self_closing_syntax)
            if isinstance(source, bytes)
            else _lexer.tokenize_str_stream(
                source, self.options.ignore_self_closing_syntax))
        return _parser.iter_root_nodes(tokens,
                                       self.options.tag_name_casing)

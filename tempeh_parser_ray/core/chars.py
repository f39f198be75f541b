"""Character classes, tag sets and JS-string helpers.

Re-expresses the reference's char predicates (reference:
``src/lexerUtils.js:10-252``) as precompiled regular-expression character
classes so the tokenizer can jump over whole runs at C speed instead of
testing one code point at a time.

Fidelity notes (each verified against the running reference — see
tests/goldens/micro_quirks.json):

* tag-name digits are ``1-9`` only — ``0`` is NOT a legal tag-name char
  (``isNumber``, lexerUtils.js:44-51).
* PCEN unicode ranges for custom-element names (lexerUtils.js:67-110).
* whitespace is exactly ``{space, \\t, \\n, \\v, \\f, \\r}``
  (lexerUtils.js:32-33); line breaks are code points 10..13 so CRLF
  counts as TWO line breaks (lexerUtils.js:25-26).
* the void / raw-text tag sets are case-SENSITIVE lookups over lowercase
  keys (lexerUtils.js:143-179): ``<BR>`` is not void, ``<SCRIPT>`` is
  not raw text.
* ``trim()`` on comments / doctypes is JS ``String.prototype.trim`` —
  its whitespace set includes NBSP, BOM (U+FEFF), all Zs and the line
  separators, which differs from Python's ``str.strip()`` default.
"""

from __future__ import annotations

import re

# --- raw character sets -------------------------------------------------

WHITESPACE = " \t\n\x0b\x0c\r"  # isWhitespace, lexerUtils.js:32-33
LINE_BREAKS = "\n\x0b\x0c\r"  # isLineBreak: code points 10..13

_PCEN_RANGES = (
    (0xC0, 0xD6), (0xD8, 0xF6), (0xF8, 0x37D), (0x37F, 0x1FFF),
    (0x200C, 0x200D), (0x203F, 0x2040), (0x2070, 0x218F),
    (0x2C00, 0x2FEF), (0x3001, 0xD7FF), (0xF900, 0xFDCF),
    (0xFDF0, 0xFFFD), (0x10000, 0xEFFFF),
)

_PCEN_CLASS = "".join(
    "\\U%08x-\\U%08x" % (lo, hi) for lo, hi in _PCEN_RANGES
)

# Legal tag-name chars: - . : _ letters digits-1-9 PCEN (lexerUtils.js:116-120)
_TAGNAME_CLASS = r"\-.1-9:A-Z_a-z" + _PCEN_CLASS
# Legal LEADING tag-name char: letters or underscore only (lexerUtils.js:41-42)
LEADING_TAGNAME_CHARS = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz_"
)

TAGNAME_RE = re.compile("[" + _TAGNAME_CLASS + "]*")
TAGNAME_CHAR_RE = re.compile("[" + _TAGNAME_CLASS + "]")

# Attribute name: complement of {= > / whitespace ' "} (lexerUtils.js:204-211).
ATTRNAME_RE = re.compile(r"[^=>/'\" \t\n\x0b\x0c\r]+")
ATTRNAME_CHARS_ILLEGAL = frozenset("=>/'\" \t\n\x0b\x0c\r")

# Unquoted attribute value: complement of {whitespace ' " < >} (lexerUtils.js:217-223).
UNQUOTED_VALUE_RE = re.compile(r"[^'\"<> \t\n\x0b\x0c\r]+")
UNQUOTED_VALUE_ILLEGAL = frozenset("'\"<> \t\n\x0b\x0c\r")

# Quoted attribute value body: backslash escapes any char (incl. newlines);
# stops at the (unescaped) closing quote or a trailing lone backslash.
QUOTED_BODY_RE = {
    "'": re.compile(r"(?:\\.|[^\\'])*", re.S),
    '"': re.compile(r'(?:\\.|[^\\"])*', re.S),
}
UNESCAPE_RE = re.compile(r"\\(.)", re.S)

# Raw-text content scanners (lexer.js:1283-1383). One regex per raw tag:
# earliest of (a) a quote char that opens quote mode (script: ' " `,
# style: ' "; textarea/title: none) or (b) the literal closing tag
# ``</name`` whose NEXT char is neither a legal tag-name char nor a quote
# char for this tag type (quote chars take the quote branch first, so
# e.g. "</script'" does NOT close a script).  The lookahead requires a
# following char to exist: at EOF the reference never emits the closer.
RAW_TEXT_TAGS = frozenset({"script", "style", "textarea", "title"})
_RAW_SCAN_RE = {
    "script": re.compile(r"['\"`]|</script(?=[^" + _TAGNAME_CLASS + r"'\"`])"),
    "style": re.compile(r"['\"]|</style(?=[^" + _TAGNAME_CLASS + r"'\"])"),
    "textarea": re.compile(r"</textarea(?=[^" + _TAGNAME_CLASS + r"])"),
    "title": re.compile(r"</title(?=[^" + _TAGNAME_CLASS + r"])"),
}
RAW_QUOTE_CHARS = {"script": "'\"`", "style": "'\"", "textarea": "", "title": ""}

# In-quote scanner for raw content: same escape semantics as quoted
# attribute values (lexer.js:1333-1345).
QUOTE_END_RE = {
    "'": QUOTED_BODY_RE["'"],
    '"': QUOTED_BODY_RE['"'],
    "`": re.compile(r"(?:\\.|[^\\`])*", re.S),
}


def raw_scan_re(tag: str) -> re.Pattern[str]:
    return _RAW_SCAN_RE[tag]


# Void elements, 14 tags, case-sensitive lookup (lexerUtils.js:157-179).
VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})

DOCTYPE_PREFIX = "<!DOCTYPE"  # uppercase only (lexerUtils.js:240-252)

# --- JS string helpers --------------------------------------------------

# JS String.prototype.trim whitespace: WhiteSpace + LineTerminator per
# ECMA-262: TAB VT FF SP NBSP ZWNBSP(U+FEFF) Zs LF CR LS PS.
JS_TRIM_CHARS = (
    "\t\n\x0b\x0c\r \xa0\ufeff\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u202f\u205f\u3000\u2028\u2029"
)


def js_trim(s: str) -> str:
    return s.strip(JS_TRIM_CHARS)


_SURROGATE_PAIR_RE = re.compile("[\ud800-\udbff][\udc00-\udfff]")


def combine_surrogates(s: str) -> str:
    """JS ``String.fromCodePoint`` semantics for UTF-16 code-unit strings.

    The reference pulls UTF-16 input one 16-bit unit at a time
    (lexer.js:385-389) and later joins units with String.fromCodePoint,
    which recombines high/low surrogate pairs into astral characters.
    Python strings keep lone surrogates as-is, so recombine explicitly.
    """
    if not _SURROGATE_PAIR_RE.search(s):
        return s
    return _SURROGATE_PAIR_RE.sub(
        lambda m: chr(
            0x10000
            + ((ord(m.group(0)[0]) - 0xD800) << 10)
            + (ord(m.group(0)[1]) - 0xDC00)
        ),
        s,
    )

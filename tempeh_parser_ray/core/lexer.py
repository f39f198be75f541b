"""Single-document HTML tokenizer, byte-identical to the reference lexer.

Re-implements the reference's streaming char-at-a-time state machine
(reference: ``src/lexer.js:109-1425``) as a position-based scanner over a
decoded code-unit string, using precompiled regexes / ``str.find`` to
jump over whole runs (text, tag names, attribute values, raw content)
instead of pulling one character at a time.  The emitted token stream is
identical to the reference's, including every verified quirk:

* NUL (0x00) is EOF (lexer.js:173) — input is truncated at the first NUL.
* line/column: lines increment for EVERY code point in 10..13 (CRLF = 2
  lines); a line-break char itself reports column 1 on the NEW line
  (lexer.js:397-406).
* BOM sniffing only when the input has >= 4 bytes (lexer.js:446-499);
  UTF-16 inputs are processed one 16-bit unit at a time (surrogate
  halves count as separate chars for positions, lexer.js:385-389).
* UTF-8 decoding masks continuation bytes without validation; only an
  invalid LEAD byte (0x80-0xBF, 0xF8-0xFF) produces an ERROR token
  (lexer.js:239-384).
* the DOCTYPE transition requires uppercase ``<!DOCTYPE`` + whitespace
  (lexer.js:662-687); comments/doctypes are JS-``trim()``-ed.
* self-closing detection uses the char pulled by the tag-contents loop
  immediately before ``>`` — chars consumed inside the attribute
  sub-lexer don't count, so ``<div a=b/>`` is NOT self-closing
  (lexer.js:758-850).
* raw-text content (script/style/textarea/title, case-sensitive) is
  quote-aware for script/style with backslash escapes
  (lexer.js:1283-1383).
"""

from __future__ import annotations

import re
from bisect import bisect_right
from typing import NamedTuple, Optional

from . import chars

# Token types (reference: src/lexer.js:36-49). VOID_TAG_END is declared
# by the reference but never emitted; kept for enum parity.
EOF = 0
ERROR = 1
TEXT_CONTENT = 2
OPENING_TAGNAME = 3
CLOSING_TAGNAME = 4
OPENING_TAG_END = 5
VOID_TAG_END = 6
SELF_CLOSING_TAG_END = 7
ATTRIBUTE_NAME = 8
ATTRIBUTE_VALUE = 9
COMMENT = 10
DOCTYPE_DECLARATION = 11

TOKEN_TYPE_NAMES = {
    EOF: "EOF", ERROR: "ERROR", TEXT_CONTENT: "TEXT_CONTENT",
    OPENING_TAGNAME: "OPENING_TAGNAME", CLOSING_TAGNAME: "CLOSING_TAGNAME",
    OPENING_TAG_END: "OPENING_TAG_END", VOID_TAG_END: "VOID_TAG_END",
    SELF_CLOSING_TAG_END: "SELF_CLOSING_TAG_END",
    ATTRIBUTE_NAME: "ATTRIBUTE_NAME", ATTRIBUTE_VALUE: "ATTRIBUTE_VALUE",
    COMMENT: "COMMENT", DOCTYPE_DECLARATION: "DOCTYPE_DECLARATION",
}


class Token(NamedTuple):
    """Schema of the emitted token tuples. The hot path emits PLAIN
    tuples ``(type, value, l, c)`` (NamedTuple construction is ~2x the
    cost); this class documents the layout and builds typed tokens in
    tests."""

    type: int
    value: Optional[str]
    l: int
    c: int


_ZERO_LC = (0, 0)


class DecodedInput(NamedTuple):
    units: str  # one Python char per reference "pulled char" (code unit)
    error: Optional[str]  # terminal decode error message, or None
    utf16: bool  # True when token values need surrogate recombination


# --- decoding -----------------------------------------------------------


def decode_string_source(raw: str) -> DecodedInput:
    """parseString path (lexer.js:141-149): the string is UTF-8 encoded
    then re-decoded — i.e. the code-point sequence is the string itself,
    with NO BOM sniffing; truncated at the first NUL."""
    nul = raw.find("\x00")
    if nul != -1:
        raw = raw[:nul]
    return DecodedInput(raw, None, False)


def _decode_utf8_quirky(data: bytes) -> tuple[str, Optional[str]]:
    """Reference UTF-8 decode (lexer.js:239-384): masks continuation
    bytes without validating them; incomplete trailing sequence => EOF;
    invalid lead byte => terminal ERROR."""
    out: list[str] = []
    append = out.append
    i = 0
    n = len(data)
    while i < n:
        lead = data[i]
        if lead == 0:  # NUL => EOF (handled by caller normally)
            return "".join(out), None
        if lead < 0x80:
            append(chr(lead))
            i += 1
        elif 0xC0 <= lead <= 0xDF:
            if i + 1 >= n or data[i + 1] == 0:
                return "".join(out), None  # EOF mid-sequence
            append(chr(((lead & 0x1F) << 6) | (data[i + 1] & 0x3F)))
            i += 2
        elif 0xE0 <= lead <= 0xEF:
            if i + 2 >= n or data[i + 1] == 0 or data[i + 2] == 0:
                return "".join(out), None
            append(chr(((lead & 0x0F) << 12) | ((data[i + 1] & 0x3F) << 6)
                       | (data[i + 2] & 0x3F)))
            i += 3
        elif 0xF0 <= lead <= 0xF7:
            if (i + 3 >= n or data[i + 1] == 0 or data[i + 2] == 0
                    or data[i + 3] == 0):
                return "".join(out), None
            cp = (((lead & 0x07) << 18) | ((data[i + 1] & 0x3F) << 12)
                  | ((data[i + 2] & 0x3F) << 6) | (data[i + 3] & 0x3F))
            if cp > 0x10FFFF:
                # JS String.fromCodePoint throws at emit time; the stream
                # aborts with a parse error. Surface as a terminal error.
                return "".join(out), "Invalid code point 0x%X" % cp
            append(chr(cp))
            i += 4
        else:
            return "".join(out), "Invalid UTF-8 leading byte: %d" % lead
    return "".join(out), None


def decode_bytes_source(data: bytes) -> DecodedInput:
    """parseFile path: BOM sniff over the first 4 bytes (only when the
    input has >= 4 bytes, lexer.js:446-499), then decode to the
    reference's per-pull code-unit sequence."""
    offset = 0
    enc = "utf8"
    if len(data) >= 4:
        b0, b1, b2, b3 = data[0], data[1], data[2], data[3]
        if b0 == 0xEF and b1 == 0xBB and b2 == 0xBF:
            offset = 3
        elif b0 == 0xFE and b1 == 0xFF:
            enc, offset = "utf16be", 2
        elif b0 == 0xFF and b1 == 0xFE:
            if b2 == 0 and b3 == 0:
                enc, offset = "utf32le", 4
            else:
                enc, offset = "utf16le", 2
        elif b0 == 0 and b1 == 0 and b2 == 0xFE and b3 == 0xFF:
            enc, offset = "utf32be", 4
    body = data[offset:]

    if enc == "utf8":
        nul = body.find(b"\x00")
        if nul != -1:
            body = body[:nul]
        try:
            # Fast path: valid UTF-8 decodes to the identical code-point
            # sequence the reference's manual decoder produces.
            return DecodedInput(body.decode("utf-8"), None, False)
        except UnicodeDecodeError:
            units, err = _decode_utf8_quirky(body)
            return DecodedInput(units, err, False)

    if enc in ("utf16le", "utf16be"):
        # One char per 16-bit unit; an odd trailing byte is dropped
        # (fileHandle.read yields no further full unit -> EOF).
        if len(body) % 2:
            body = body[:-1]
        # One Python char per 16-bit unit (surrogate halves stay split so
        # positions count code UNITS like the reference does).
        units = "".join(
            chr(int.from_bytes(body[i:i + 2],
                               "little" if enc == "utf16le" else "big"))
            for i in range(0, len(body), 2)
        )
        nul = units.find("\x00")
        if nul != -1:
            units = units[:nul]
        return DecodedInput(units, None, True)

    # utf32
    if len(body) % 4:
        body = body[:len(body) - (len(body) % 4)]
    vals = [
        int.from_bytes(body[i:i + 4], "little" if enc == "utf32le" else "big")
        for i in range(0, len(body), 4)
    ]
    out: list[str] = []
    err = None
    for v in vals:
        if v == 0:
            break
        if v > 0x10FFFF:
            err = "Invalid code point 0x%X" % v
            break
        out.append(chr(v))
    return DecodedInput("".join(out), err, False)


# --- tokenizer ----------------------------------------------------------

_LEADING = chars.LEADING_TAGNAME_CHARS
_WS = set(chars.WHITESPACE)
_BREAK_RE = re.compile("[\n\x0b\x0c\r]")


class Tokenizer:
    """Tokenizes one decoded document. Create once per document."""

    __slots__ = ("units", "n", "terminal_error", "build", "breaks",
                 "tokens", "ignore_self_closing", "track_positions", "lc")

    def __init__(self, decoded: DecodedInput, ignore_self_closing: bool = False,
                 track_positions: bool = True):
        """``track_positions=False`` skips line/column bookkeeping
        entirely (no line-break scan, all tokens report 0:0) — the
        extraction hot path never reads positions; callers that hit a
        parse error and need the reference-exact message re-run with
        positions on (errors are rare at web scale)."""
        self.units = decoded.units
        self.n = len(decoded.units)
        self.terminal_error = decoded.error
        self.build = (chars.combine_surrogates if decoded.utf16
                      else (lambda s: s))
        self.ignore_self_closing = ignore_self_closing
        self.track_positions = track_positions
        if track_positions:
            self.breaks = [m.start() for m in
                           _BREAK_RE.finditer(decoded.units)]
            self.lc = self._lc
        else:
            self.breaks = []
            self.lc = lambda p: _ZERO_LC
        self.tokens: list[tuple] = []

    # position -> (line, col) as the reference reports for the char AT p
    def _lc(self, p: int) -> tuple[int, int]:
        breaks = self.breaks
        k = bisect_right(breaks, p)
        if k and breaks[k - 1] == p:  # p is itself a line break
            return 1 + k, 1
        if k:
            return 1 + k, p - breaks[k - 1]
        return 1, p + 1

    # (line, column) internal state after all input consumed — used for
    # the EOF/ERROR terminator token position.
    def _end_lc(self) -> tuple[int, int]:
        if not self.track_positions:
            return _ZERO_LC
        if self.n == 0:
            return 1, 0
        p = self.n - 1
        k = bisect_right(self.breaks, p)
        if k and self.breaks[k - 1] == p:
            return 1 + k, 0
        if k:
            return 1 + k, p - self.breaks[k - 1]
        return 1, p + 1

    def _terminate(self) -> None:
        l, c = self._end_lc()
        if self.terminal_error is not None:
            self.tokens.append((ERROR, self.terminal_error, l, c))
        else:
            self.tokens.append((EOF, None, l, c))

    def tokenize(self) -> list[Token]:
        units = self.units
        n = self.n
        build = self.build
        emit = self.tokens.append
        lc = self.lc
        pos = 0

        while True:
            # ---- text content state (lexer.js:548-694) ----
            text_start = pos
            i = pos
            nxt = None  # (kind, ...) transition
            while True:
                j = units.find("<", i)
                if j == -1:
                    # EOF: flush text (reference emits even when empty;
                    # the parser drops empties so we skip those), unless
                    # the input ended in a decode error (no flush then).
                    if self.terminal_error is None and text_start < n:
                        tl, tc = lc(text_start)
                        emit((TEXT_CONTENT, build(units[text_start:n]),
                                   tl, tc))
                    self._terminate()
                    return self.tokens
                a = units[j + 1] if j + 1 < n else ""
                if a in _LEADING:
                    nxt = ("open", j, j + 1)
                    break
                if (a == "/" and j + 2 < n and units[j + 2] in _LEADING):
                    nxt = ("close", j, j + 2)
                    break
                if units[j + 1:j + 4] == "!--":
                    nxt = ("comment", j, j + 4)
                    break
                if (units[j:j + 9] == chars.DOCTYPE_PREFIX
                        and j + 9 < n and units[j + 9] in _WS):
                    nxt = ("doctype", j, j + 10)
                    break
                i = j + 1

            kind, j, pos = nxt
            if text_start < j:
                tl, tc = lc(text_start)
                emit((TEXT_CONTENT, build(units[text_start:j]), tl, tc))

            if kind == "open":
                pos = self._scan_opening_tag(pos)
            elif kind == "close":
                pos = self._scan_closing_tag(pos)
            elif kind == "comment":
                # lexer.js:1217-1271
                k = units.find("-->", pos)
                if k == -1:
                    self._terminate()
                    return self.tokens
                tl, tc = lc(pos)
                emit((COMMENT, chars.js_trim(build(units[pos:k])),
                           tl, tc))
                pos = k + 3
            else:  # doctype, lexer.js:1394-1425; position backdated to '<'
                k = units.find(">", pos)
                if k == -1:
                    self._terminate()
                    return self.tokens
                tl, tc = lc(j)
                emit((DOCTYPE_DECLARATION,
                           chars.js_trim(build(units[pos:k])), tl, tc))
                pos = k + 1

            if pos < 0:  # terminated inside a sub-scanner
                return self.tokens

    def tokenize_stream(self):
        """INCREMENTAL lexing: a generator yielding each token as soon
        as the state machine produces it — the reference's
        lex-while-consume property (``src/lexer.js:504-511``, tokens
        written to the stream as produced) at token granularity: a
        consumer observes a token before the tail of the input has
        been scanned. ``self.tokens`` still accumulates the full list,
        and ``list(tokenize_stream()) == tokenize()`` is pinned by a
        differential pytest over the fixture corpus. The batch hot
        path keeps calling :meth:`tokenize` (no generator overhead);
        only the single-document streaming surface
        (``HTMLParser.iter_nodes``) pays for laziness."""
        units = self.units
        n = self.n
        build = self.build
        toks = self.tokens
        emit = toks.append
        lc = self.lc
        drained = 0
        pos = 0

        while True:
            text_start = pos
            i = pos
            nxt = None
            while True:
                j = units.find("<", i)
                if j == -1:
                    if self.terminal_error is None and text_start < n:
                        tl, tc = lc(text_start)
                        emit((TEXT_CONTENT, build(units[text_start:n]),
                              tl, tc))
                    self._terminate()
                    yield from toks[drained:]
                    return
                a = units[j + 1] if j + 1 < n else ""
                if a in _LEADING:
                    nxt = ("open", j, j + 1)
                    break
                if (a == "/" and j + 2 < n and units[j + 2] in _LEADING):
                    nxt = ("close", j, j + 2)
                    break
                if units[j + 1:j + 4] == "!--":
                    nxt = ("comment", j, j + 4)
                    break
                if (units[j:j + 9] == chars.DOCTYPE_PREFIX
                        and j + 9 < n and units[j + 9] in _WS):
                    nxt = ("doctype", j, j + 10)
                    break
                i = j + 1

            kind, j, pos = nxt
            if text_start < j:
                tl, tc = lc(text_start)
                emit((TEXT_CONTENT, build(units[text_start:j]), tl, tc))

            if kind == "open":
                pos = self._scan_opening_tag(pos)
            elif kind == "close":
                pos = self._scan_closing_tag(pos)
            elif kind == "comment":
                k = units.find("-->", pos)
                if k == -1:
                    self._terminate()
                    yield from toks[drained:]
                    return
                tl, tc = lc(pos)
                emit((COMMENT, chars.js_trim(build(units[pos:k])),
                      tl, tc))
                pos = k + 3
            else:  # doctype; position backdated to '<'
                k = units.find(">", pos)
                if k == -1:
                    self._terminate()
                    yield from toks[drained:]
                    return
                tl, tc = lc(j)
                emit((DOCTYPE_DECLARATION,
                      chars.js_trim(build(units[pos:k])), tl, tc))
                pos = k + 1

            yield from toks[drained:]
            drained = len(toks)
            if pos < 0:  # terminated inside a sub-scanner
                return

    # -- opening tag (lexer.js:702-850). Returns new pos, or -1 if the
    # document terminated (terminator token already emitted).
    def _scan_opening_tag(self, pos: int) -> int:
        units = self.units
        n = self.n
        emit = self.tokens.append
        lc = self.lc

        m = chars.TAGNAME_RE.match(units, pos)
        name_end = m.end()
        if name_end >= n:
            # EOF while reading the tag name: terminator only
            # (readOpeningTagName returns the terminator, lexer.js:725-727).
            self._terminate()
            return -1
        raw_tag = self.build(units[pos:name_end])
        tl, tc = lc(pos)
        emit((OPENING_TAGNAME, raw_tag, tl, tc))

        # Void / raw-text lookups use the as-written tag name
        # (lexer.js:777,819) — case-sensitive.
        is_void = raw_tag in chars.VOID_TAGS
        is_raw = raw_tag in chars.RAW_TEXT_TAGS

        p = name_end
        prev = ""  # last char pulled by THIS loop (lexer.js:767,848)
        while True:
            if p >= n:
                self._terminate()
                return -1
            ch = units[p]
            if ch not in _WS:
                if ch == ">":
                    el, ec = lc(p)
                    if is_void or (not self.ignore_self_closing
                                   and prev == "/"):
                        emit((SELF_CLOSING_TAG_END, None, el, ec))
                        return p + 1
                    emit((OPENING_TAG_END, None, el, ec))
                    if is_raw:
                        return self._scan_raw_content(p + 1, raw_tag)
                    return p + 1
                if ch not in chars.ATTRNAME_CHARS_ILLEGAL:
                    p2 = self._scan_attribute(p)
                    if p2 < 0:
                        return -1
                    prev = ch
                    p = p2
                    continue
            prev = ch
            p += 1

    # -- one attribute (lexer.js:855-1109). Starts AT the first name
    # char; returns the position of the "unread" terminating char, or -1.
    def _scan_attribute(self, pos: int) -> int:
        units = self.units
        n = self.n
        emit = self.tokens.append
        lc = self.lc

        m = chars.ATTRNAME_RE.match(units, pos)
        name_end = m.end()
        if name_end >= n:
            self._terminate()
            return -1
        tl, tc = lc(pos)
        emit((ATTRIBUTE_NAME, self.build(units[pos:name_end]), tl, tc))

        if units[name_end] != "=":
            return name_end  # boolean attribute; terminator unread

        q = name_end + 1
        if q >= n:
            self._terminate()
            return -1
        c2 = units[q]
        if c2 in "'\"":
            # quoted value (lexer.js:989-1053); token position is the
            # opening quote char.
            body = chars.QUOTED_BODY_RE[c2]
            m2 = body.match(units, q + 1)
            end = m2.end()
            if end >= n or units[end] != c2:
                # EOF (possibly after a trailing backslash): no value token
                self._terminate()
                return -1
            raw = units[q + 1:end]
            if "\\" in raw:
                raw = chars.UNESCAPE_RE.sub(r"\1", raw)
            vl, vc = lc(q)
            emit((ATTRIBUTE_VALUE, self.build(raw), vl, vc))
            return end  # closing quote unread
        if c2 not in chars.UNQUOTED_VALUE_ILLEGAL:
            m2 = chars.UNQUOTED_VALUE_RE.match(units, q)
            vend = m2.end()
            if vend >= n:
                self._terminate()
                return -1
            vl, vc = lc(q)
            emit((ATTRIBUTE_VALUE, self.build(units[q:vend]), vl, vc))
            return vend
        return q  # e.g. "a=" followed by whitespace/'>' — char unread

    # -- closing tag: name + skip to '>' (lexer.js:1117-1206)
    def _scan_closing_tag(self, pos: int) -> int:
        units = self.units
        n = self.n
        m = chars.TAGNAME_RE.match(units, pos)
        name_end = m.end()
        if name_end >= n:
            self._terminate()
            return -1
        tl, tc = self.lc(pos)
        self.tokens.append(
            (CLOSING_TAGNAME, self.build(units[pos:name_end]), tl, tc))
        k = units.find(">", name_end)
        if k == -1:
            self._terminate()
            return -1
        return k + 1

    # -- raw-text content (lexer.js:1283-1383)
    def _scan_raw_content(self, pos: int, tag: str) -> int:
        units = self.units
        n = self.n
        emit = self.tokens.append
        scan = chars.raw_scan_re(tag)
        quotes = chars.RAW_QUOTE_CHARS[tag]
        closer_len = 2 + len(tag)

        i = pos
        while True:
            m = scan.search(units, i)
            if m is None:
                self._terminate()
                return -1
            g = m.group(0)
            if len(g) == 1 and g in quotes:
                # quote mode: consume until unescaped matching quote
                m2 = chars.QUOTE_END_RE[g].match(units, m.end())
                e = m2.end()
                if e >= n or units[e] != g:
                    self._terminate()  # EOF inside quote / after '\'
                    return -1
                i = e + 1
                continue
            close_pos = m.start()
            raw = units[pos:close_pos]
            if raw:
                tl, tc = self.lc(pos)
                emit((TEXT_CONTENT, self.build(raw), tl, tc))
            # CLOSING_TAGNAME position: (line of the char AFTER the
            # closer, its col - len(closer)) — lexer.js:1372-1377.
            after = close_pos + closer_len
            al, ac = self.lc(after)
            emit((CLOSING_TAGNAME, tag, al, ac - closer_len))
            k = units.find(">", after)
            if k == -1:
                self._terminate()
                return -1
            return k + 1


def tokenize_str(raw: str, ignore_self_closing: bool = False,
                 track_positions: bool = True) -> list[tuple]:
    return Tokenizer(decode_string_source(raw), ignore_self_closing,
                     track_positions).tokenize()


def tokenize_bytes(data: bytes, ignore_self_closing: bool = False,
                   track_positions: bool = True) -> list[tuple]:
    return Tokenizer(decode_bytes_source(data), ignore_self_closing,
                     track_positions).tokenize()


def tokenize_str_stream(raw: str, ignore_self_closing: bool = False,
                        track_positions: bool = True):
    """Generator form of :func:`tokenize_str` (incremental lexing)."""
    return Tokenizer(decode_string_source(raw), ignore_self_closing,
                     track_positions).tokenize_stream()


def tokenize_bytes_stream(data: bytes, ignore_self_closing: bool = False,
                          track_positions: bool = True):
    """Generator form of :func:`tokenize_bytes` (incremental lexing)."""
    return Tokenizer(decode_bytes_source(data), ignore_self_closing,
                     track_positions).tokenize_stream()

"""PDF-lite corpus source + layout-aware text extraction.

The north rule names "PDF/layout parse" beside the HTML path: real
extraction corpora mix crawled HTML with document formats whose text
carries explicit LAYOUT (positioned runs) instead of markup order. This
module covers that tier dependency-free:

- **Writer** (test/bench side only — at production scale the PDFs
  already exist): materializes the deterministic synthetic corpus as
  minimal uncompressed PDF 1.4 binaries, one per document, stored as an
  opaque ``binary`` column in Parquet — the brief's multimodal-column
  convention (payload rides the object store, schema + batch sizing are
  the real design surface). Each page's text is deliberately HOSTILE to
  naive stream-order concatenation: chunks are emitted in reverse
  layout order, some lines are split into two runs at different x, the
  content-stream objects appear in the file in reverse page order (only
  the /Kids array knows the true order), and the string encodings cycle
  through literal / hex / TJ-array / Td-relative positioning.

- **Extractor** (the real operator): an actor-pool ``map_batches``
  stage that walks objects sequentially (Length-guided with endstream
  resync fallback — the same index-free tolerance as the WARC source,
  sources/warc_corpus.py), resolves page order from the /Pages /Kids
  array, tokenizes each content stream (literal strings with full
  escape/octal/nesting rules, hex strings, arrays, Tm/Td/TD/TL/T*/'/"
  positioning), and reassembles READING ORDER by sorting text runs per
  page by (y desc, x asc) and grouping equal-y runs into lines. Errors
  never abort (the engine's P5 contract): malformed inputs yield an
  ``error`` string and best-effort text.

Layout contract used by the writer and the closed-form oracle: 8
whitespace tokens per line, 6 lines per page, same-line runs joined by
a single space, lines joined by ``\\n`` across the whole document.
Text bytes inside strings are UTF-8 (a documented simplification — real
PDFs map glyphs through font encodings/CMaps; the corpus here is
ASCII).

Scale notes: parse state (compiled patterns) lives in actor
``__init__``; per-document parse is the task itself (same wave shape as
the HTML parser); PDFs never leave their batch — only (doc_id, text,
counters) flow downstream.
"""

from __future__ import annotations

import math
import re
from pathlib import Path

import pyarrow as pa

import ray
import ray.data

from .jsonl_corpus import _cache_key, _materialize, _ROOT

TOKENS_PER_LINE = 8
LINES_PER_PAGE = 6
_Y0, _DY, _X0, _XSPLIT = 720, 14, 72, 306


# --------------------------------------------------------------------------
# closed-form expectations (tests / oracle mirror)

def doc_lines(text: str) -> list[str]:
    toks = text.split()
    return [" ".join(toks[i:i + TOKENS_PER_LINE])
            for i in range(0, len(toks), TOKENS_PER_LINE)]


def expected_pdf_text(text: str) -> str:
    return "\n".join(doc_lines(text))


def expected_counts(text: str) -> tuple[int, int]:
    """(n_pages, n_chunks) for a document's text."""
    lines = doc_lines(text)
    n_pages = max(1, math.ceil(len(lines) / LINES_PER_PAGE))
    n_chunks = sum(
        2 if (li % 4 == 1
              and len(ln.split()) == TOKENS_PER_LINE) else 1
        for li, ln in enumerate(lines))
    return n_pages, n_chunks


# --------------------------------------------------------------------------
# writer

def _esc(s: str) -> str:
    return (s.replace("\\", "\\\\").replace("(", "\\(")
            .replace(")", "\\)"))


def _line_op(li: int, line: str) -> list[str]:
    """Content-stream ops for global line index ``li`` (0-based).
    Encoding cycle is deterministic; the SPLIT rule (two runs on one
    y) takes precedence and is the only rule that changes chunk
    count."""
    y = _Y0 - _DY * (li % LINES_PER_PAGE)
    toks = line.split()
    if li % 4 == 1 and len(toks) == TOKENS_PER_LINE:
        a, b = " ".join(toks[:4]), " ".join(toks[4:])
        return [f"BT 1 0 0 1 {_X0} {y} Tm ({_esc(a)}) Tj ET",
                f"BT 1 0 0 1 {_XSPLIT} {y} Tm ({_esc(b)}) Tj ET"]
    if li % 5 == 0:
        return [f"BT 1 0 0 1 {_X0} {y} Tm "
                f"<{line.encode('utf-8').hex()}> Tj ET"]
    if li % 5 == 2:
        m = len(line) // 2
        return [f"BT 1 0 0 1 {_X0} {y} Tm "
                f"[({_esc(line[:m])}) -120 ({_esc(line[m:])})] TJ ET"]
    if li % 5 == 4:
        # relative positioning: Td then TD compose translations
        return [f"BT {_X0} 0 Td 0 {y} TD ({_esc(line)}) Tj ET"]
    return [f"BT 1 0 0 1 {_X0} {y} Tm ({_esc(line)}) Tj ET"]


def build_pdf(text: str) -> bytes:
    """One deterministic minimal PDF for a document's text. Objects:
    1 catalog, 2 pages, 3 font, 4..3+P page objects (in order),
    4+P..3+2P content streams — written to the FILE in reverse page
    order so only /Kids-driven extraction reads correctly."""
    lines = doc_lines(text)
    n_pages = max(1, math.ceil(len(lines) / LINES_PER_PAGE))
    page_obj = [4 + p for p in range(n_pages)]
    cont_obj = [4 + n_pages + p for p in range(n_pages)]

    streams: list[bytes] = []
    for p in range(n_pages):
        ops: list[str] = []
        for j, ln in enumerate(lines[p * LINES_PER_PAGE:
                                     (p + 1) * LINES_PER_PAGE]):
            ops.extend(_line_op(p * LINES_PER_PAGE + j, ln))
        ops.reverse()  # hostile to stream-order concatenation
        streams.append(("/F1 12 Tf\n" + "\n".join(ops)).encode("utf-8"))

    bodies: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: ("<< /Type /Pages /Kids ["
            + " ".join(f"{n} 0 R" for n in page_obj)
            + f"] /Count {n_pages} >>").encode("ascii"),
        3: (b"<< /Type /Font /Subtype /Type1 "
            b"/BaseFont /Helvetica >>"),
    }
    for p in range(n_pages):
        bodies[page_obj[p]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cont_obj[p]} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>"
        ).encode("ascii")

    order = [1, 2, 3] + page_obj + list(reversed(cont_obj))
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in order:
        offsets[num] = len(out)
        if num in bodies:
            out += (f"{num} 0 obj\n".encode("ascii") + bodies[num]
                    + b"\nendobj\n")
        else:
            data = streams[cont_obj.index(num)]
            out += (f"{num} 0 obj\n<< /Length {len(data)} >>\n"
                    f"stream\n".encode("ascii") + data
                    + b"\nendstream\nendobj\n")
    xref_at = len(out)
    n_obj = 3 + 2 * n_pages
    out += f"xref\n0 {n_obj + 1}\n".encode("ascii")
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode("ascii")
    out += (f"trailer\n<< /Size {n_obj + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode("ascii")
    return bytes(out)


def pdf_corpus_dir(sf_dir: str) -> Path:
    """documents -> Parquet of (doc_id, pdf:binary), cached per
    (source path, mtime); written BY a Dataset pipeline so the sink
    side streams too."""

    def build(out: Path) -> None:
        docs = ray.data.read_parquet(
            str(Path(sf_dir) / "documents.parquet"),
            columns=["doc_id", "text"])

        def rows(batch: pa.Table) -> pa.Table:
            pdfs = [build_pdf(t)
                    for t in batch.column("text").to_pylist()]
            return pa.table({"doc_id": batch.column("doc_id"),
                             "pdf": pa.array(pdfs, pa.binary())})

        docs.map_batches(rows, batch_format="pyarrow").write_parquet(
            str(out))

    return _materialize(_ROOT / _cache_key(sf_dir) / "pdf", build)


# --------------------------------------------------------------------------
# extractor

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_LEN_RE = re.compile(rb"/Length\s+(\d+)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_CONT_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_CONT_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R\b")
_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*][A-Za-z0-9'\"*]*")
_WS = b"\x00\t\n\x0c\r "

_ESC_MAP = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
            0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}


def _lit_string(buf: bytes, i: int) -> tuple[bytes, int]:
    """Parse a literal string starting at ``buf[i] == '('`` with the
    full spec rules: balanced unescaped parens, \\n\\r\\t\\b\\f\\(\\)
    \\\\ escapes, 1-3 digit octal, backslash-EOL line continuation,
    and lone-backslash-drops-itself. Returns (bytes, next_index)."""
    out = bytearray()
    depth, i, n = 1, i + 1, len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            c2 = buf[i]
            if c2 in _ESC_MAP:
                out.append(_ESC_MAP[c2])
                i += 1
            elif 0x30 <= c2 <= 0x37:  # octal, up to 3 digits
                val, k = 0, 0
                while k < 3 and i < n and 0x30 <= buf[i] <= 0x37:
                    val = val * 8 + (buf[i] - 0x30)
                    i += 1
                    k += 1
                out.append(val & 0xFF)
            elif c2 in (0x0D, 0x0A):  # line continuation
                i += 1
                if c2 == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:  # backslash before anything else: dropped
                out.append(c2)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            i += 1
            if depth == 0:
                return bytes(out), i
            out.append(0x29)
        else:
            out.append(c)
            i += 1
    return bytes(out), i  # unterminated: best effort


def _hex_string(buf: bytes, i: int) -> tuple[bytes, int]:
    end = buf.find(b">", i + 1)
    if end < 0:
        end = len(buf)
    digits = bytes(ch for ch in buf[i + 1:end]
                   if ch not in _WS)
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii")), end + 1
    except ValueError:
        return b"", end + 1


def _parse_content(stream: bytes) -> list[tuple[float, float, int, bytes]]:
    """Content stream -> positioned text runs (y, x, seq, raw bytes).
    Positioning model: per-BT line matrix (lx, ly); Td/TD translate it,
    Tm sets it, T* drops by the leading (set by TL or TD). Unknown
    operators clear the operand stack (their operands are consumed,
    never misattributed to a later Tj)."""
    runs: list[tuple[float, float, int, bytes]] = []
    stack: list = []
    lx = ly = x = y = 0.0
    leading = 0.0
    seq = 0
    i, n = 0, len(stream)

    def _pop_num() -> float:
        while stack:
            v = stack.pop()
            if isinstance(v, float):
                return v
        return 0.0

    def _show(raw: bytes) -> None:
        nonlocal seq
        if raw:
            runs.append((y, x, seq, raw))
            seq += 1

    while i < n:
        c = stream[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # % comment
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == 0x28:  # literal string
            s, i = _lit_string(stream, i)
            stack.append(s)
            continue
        if c == 0x3C:  # hex string (or dict — skipped)
            if i + 1 < n and stream[i + 1] == 0x3C:
                j = stream.find(b">>", i + 2)
                i = n if j < 0 else j + 2
                continue
            s, i = _hex_string(stream, i)
            stack.append(s)
            continue
        if c == 0x5B:  # array open
            stack.append(_MARK)
            i += 1
            continue
        if c == 0x5D:  # array close
            items: list = []
            while stack:
                v = stack.pop()
                if v is _MARK:
                    break
                items.append(v)
            items.reverse()
            stack.append(items)
            i += 1
            continue
        if c == 0x2F:  # name
            j = i + 1
            while j < n and stream[j] not in _WS and stream[j] not in (
                    0x28, 0x29, 0x3C, 0x3E, 0x5B, 0x5D, 0x2F, 0x25):
                j += 1
            stack.append(None)  # names are never positioned text
            i = j
            continue
        m = _NUM_RE.match(stream, i)
        if m and (0x30 <= c <= 0x39 or c in (0x2B, 0x2D, 0x2E)):
            stack.append(float(m.group()))
            i = m.end()
            continue
        m = _OP_RE.match(stream, i)
        if not m:
            i += 1
            continue
        op = m.group()
        i = m.end()
        if op == b"BT":
            lx = ly = x = y = 0.0
            stack.clear()
        elif op == b"Td" or op == b"TD":
            ty, tx = _pop_num(), _pop_num()
            if op == b"TD":
                leading = -ty
            lx, ly = lx + tx, ly + ty
            x, y = lx, ly
        elif op == b"Tm":
            f_ = _pop_num()
            e_ = _pop_num()
            for _ in range(4):  # a b c d (scale/rotation unused)
                _pop_num()
            lx, ly = e_, f_
            x, y = lx, ly
        elif op == b"TL":
            leading = _pop_num()
        elif op == b"T*":
            ly -= leading
            x, y = lx, ly
        elif op == b"Tj":
            v = stack.pop() if stack else b""
            _show(v if isinstance(v, bytes) else b"")
        elif op == b"TJ":
            v = stack.pop() if stack else []
            if isinstance(v, list):
                _show(b"".join(e for e in v if isinstance(e, bytes)))
        elif op == b"'":
            v = stack.pop() if stack else b""
            ly -= leading
            x, y = lx, ly
            _show(v if isinstance(v, bytes) else b"")
        elif op == b'"':
            v = stack.pop() if stack else b""
            _pop_num()
            _pop_num()
            ly -= leading
            x, y = lx, ly
            _show(v if isinstance(v, bytes) else b"")
        else:
            stack.clear()
    return runs


_MARK = object()


def _scan_objects(buf: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Sequential object walk: obj_num -> (dict region, stream payload
    or None). /Length-guided payload skip with endstream-scan fallback
    (the WARC resync posture: declared lengths are trusted only when
    they land on a valid terminator)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(buf, pos)
        if not m:
            break
        num = int(m.group(1))
        body_at = m.end()
        sk = buf.find(b"stream", body_at)
        eo = buf.find(b"endobj", body_at)
        payload = None
        if sk >= 0 and (eo < 0 or sk < eo) and not buf.startswith(
                b"endstream", sk - 3 if sk >= 3 else 0):
            head = buf[body_at:sk]
            data_at = sk + 6
            if buf.startswith(b"\r\n", data_at):
                data_at += 2
            elif data_at < len(buf) and buf[data_at] in (0x0A, 0x0D):
                data_at += 1
            lm = _LEN_RE.search(head)
            end = -1
            if lm:
                cand = data_at + int(lm.group(1))
                tail = buf[cand:cand + 12]
                if tail.lstrip(b"\r\n").startswith(b"endstream"):
                    end = cand
            if end < 0:  # resync: declared length wrong/absent
                es = buf.find(b"endstream", data_at)
                end = es if es >= 0 else len(buf)
            payload = buf[data_at:end].rstrip(b"\r\n")
            objs[num] = (head, payload)
            eo = buf.find(b"endobj", end)
        else:
            objs[num] = (buf[body_at:eo if eo >= 0 else len(buf)], None)
        if eo < 0:
            break
        pos = eo + 6
    return objs


def extract_pdf(buf: bytes) -> tuple[str, int, int, str]:
    """(text, n_pages, n_chunks, error). Reading order: pages in /Kids
    order; within a page, runs sorted by (y desc, x asc); equal-y runs
    form one line joined by single spaces; lines joined by newlines.
    Never raises on malformed input (error column instead)."""
    error = ""
    try:
        objs = _scan_objects(buf)
        kids: list[int] = []
        for head, _ in objs.values():
            if _PAGES_RE.search(head):
                km = _KIDS_RE.search(head)
                if km:
                    kids = [int(r) for r in _REF_RE.findall(km.group(1))]
                break
        page_streams: list[bytes] = []
        if kids:
            for pk in kids:
                head, _ = objs.get(pk, (b"", None))
                refs: list[int] = []
                am = _CONT_ARR_RE.search(head)
                if am:
                    refs = [int(r) for r in _REF_RE.findall(am.group(1))]
                else:
                    cm = _CONT_RE.search(head)
                    if cm:
                        refs = [int(cm.group(1))]
                data = b"\n".join(
                    objs[r][1] or b"" for r in refs if r in objs)
                page_streams.append(data)
        else:
            # no page tree: best-effort, every stream in byte order
            error = "no /Pages object; stream-order fallback"
            page_streams = [s for _, s in objs.values()
                            if s is not None]
        lines_out: list[str] = []
        n_chunks = 0
        for data in page_streams:
            runs = _parse_content(data)
            n_chunks += len(runs)
            runs.sort(key=lambda r: (-round(r[0], 1), r[1], r[2]))
            cur_y: float | None = None
            for yy, _xx, _s, raw in runs:
                ry = round(yy, 1)
                txt = raw.decode("utf-8", errors="replace")
                if cur_y is not None and ry == cur_y:
                    lines_out[-1] += " " + txt
                else:
                    lines_out.append(txt)
                    cur_y = ry
            cur_y = None
        n_pages = len(page_streams)
        return "\n".join(lines_out), n_pages, n_chunks, error
    except Exception as exc:  # pragma: no cover - contract: never abort
        return "", 0, 0, f"{type(exc).__name__}: {exc}"


class PdfExtract:
    """Actor-pool stage: (doc_id, pdf) batches -> extracted layout
    text + structure counters. Patterns are module-compiled; the class
    form keeps the slot open for heavier per-actor state (font maps)
    without changing the pipeline."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, pages, chunks, errs = [], [], [], []
        for buf in batch.column("pdf").to_pylist():
            t, p, c, e = extract_pdf(buf)
            texts.append(t)
            pages.append(p)
            chunks.append(c)
            errs.append(e)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pdf_text": pa.array(texts, pa.string()),
            "n_pages": pa.array(pages, pa.int64()),
            "n_chunks": pa.array(chunks, pa.int64()),
            "error": pa.array(errs, pa.string()),
        })


def read_pdf_corpus(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(str(pdf_corpus_dir(sf_dir)),
                                 columns=["doc_id", "pdf"])

"""Text analysis over a document table (web-scale training-data ops).

All functions are ``map_batches``-shaped (pa.Table -> pa.Table), pure
and deterministic, so each has (where expressible) a DuckDB SQL oracle
in ``__ray_entry__``. Token definition shared by everything here:
``re.split(r"\\s+", text.strip())`` — i.e. maximal whitespace runs
separate tokens; empty text yields zero tokens.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

_WS_SPLIT = re.compile(r"\s+")

# Tiny per-language stopword profiles for the n-gram/stopword-vote
# language-ID heuristic. Deliberately small and deterministic.
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset({"the", "a", "of", "and", "to", "in", "is", "that",
                     "it", "for", "was", "on", "are", "with", "as"}),
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht", "ein",
                     "eine", "zu", "den", "mit", "von", "auf", "für"}),
    "es": frozenset({"el", "la", "de", "que", "y", "en", "un", "una",
                     "es", "no", "los", "se", "del", "por", "con"}),
    "fr": frozenset({"le", "la", "les", "de", "des", "et", "est", "un",
                     "une", "que", "dans", "pour", "qui", "sur", "pas"}),
}

_EN_STOPWORDS = _LANG_STOPWORDS["en"]


def _tokens(text: str) -> list[str]:
    t = text.strip()
    if not t:
        return []
    return _WS_SPLIT.split(t)


def tokenize(text: str | None) -> list[str]:
    """THE whitespace-token contract for corpus-level token operators
    (term/doc frequency, vocabulary, bigrams, HLL) — identical to the
    SQL oracles' ``string_split_regex(trim(text), '\\s+')`` and to
    ``_tokens`` (``str.split()`` splits on maximal whitespace runs and
    drops edge empties). One definition, every operator."""
    return (text or "").split()


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_tokens)."""
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array([len(_tokens(t or "")) for t in texts],
                             pa.int64()),
    })


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring features per document: lengths, vocabulary
    diversity, stopword density (SQL-checkable closed forms)."""
    texts = batch.column("text").to_pylist()
    n_chars: list[int] = []
    n_tokens: list[int] = []
    n_unique: list[int] = []
    stop_ratio: list[float] = []
    for t in texts:
        t = t or ""
        toks = _tokens(t)
        n = len(toks)
        n_chars.append(len(t))
        n_tokens.append(n)
        n_unique.append(len(set(toks)))
        stops = sum(1 for x in toks if x in _EN_STOPWORDS)
        stop_ratio.append(stops / n if n else 0.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_unique_tokens": pa.array(n_unique, pa.int64()),
        "stopword_ratio": pa.array(stop_ratio, pa.float64()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Exact document fingerprint: md5 over UTF-8 text (matches DuckDB
    ``md5(text)``), plus a 64-bit rolling-shingle content fingerprint
    (min of 8-gram polynomial hashes — winnowing-style, not SQL-expressible)."""
    texts = batch.column("text").to_pylist()
    md5s: list[str] = []
    rolling: list[int] = []
    for t in texts:
        t = t or ""
        md5s.append(hashlib.md5(t.encode("utf-8")).hexdigest())
        data = t.encode("utf-8")
        if len(data) < 8:
            rolling.append(_poly_hash(data))
        else:
            m = (1 << 61) - 1
            best = m
            h = 0
            # rolling polynomial hash over byte 8-grams, base 257
            base = 257
            pow7 = pow(base, 7, m)
            for i, b in enumerate(data):
                if i < 8:
                    h = (h * base + b) % m
                    if i == 7 and h < best:
                        best = h
                else:
                    h = ((h - data[i - 8] * pow7) * base + b) % m
                    if h < best:
                        best = h
            rolling.append(best)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fp_md5": pa.array(md5s, pa.string()),
        "fp_shingle": pa.array(rolling, pa.int64()),
    })


def _poly_hash(data: bytes) -> int:
    m = (1 << 61) - 1
    h = 0
    for b in data:
        h = (h * 257 + b) % m
    return h


_CJK_RE = re.compile("[\u3040-\u30ff\u4e00-\u9fff]")


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: CJK char detection, else stopword vote
    over tiny per-language profiles; 'und' when no evidence."""
    texts = batch.column("text").to_pylist()
    preds: list[str] = []
    for t in texts:
        t = t or ""
        if _CJK_RE.search(t):
            preds.append("zh")
            continue
        toks = _tokens(t.lower())
        best_lang, best_score = "und", 0
        for lang in sorted(_LANG_STOPWORDS):
            score = sum(1 for x in toks if x in _LANG_STOPWORDS[lang])
            if score > best_score:
                best_lang, best_score = lang, score
        preds.append(best_lang)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "lang_pred": pa.array(preds, pa.string()),
    })


# BPE-style pretokenizer (simplified GPT-2-ish classes, RE2-compatible so
# the DuckDB oracle can run the SAME pattern): letter runs, digit runs,
# runs of other non-space symbols.
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
_BPE_RE = re.compile(_BPE_PATTERN)


def token_count_regex_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_bpe_tokens) with the BPE-ish
    pretokenizer — approximates subword token counts for budget
    estimation without a vocab file."""
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bpe_tokens": pa.array(
            [len(_BPE_RE.findall(t or "")) for t in texts], pa.int64()),
    })


# Hashing-trick linear classifier (fastText-style model-scoring stage,
# integer-exact so the DuckDB oracle reproduces it bit-for-bit): each
# token hashes to a bucket via md5 (the oracle's md5() agrees), the
# bucket indexes a deterministic weight in [-10, 10], and a document's
# score is the sum of its token weights. The per-process weight memo
# exploits the Zipfian vocabulary (bounded so web-scale tails can't
# grow it without limit).
_W_MEMO: dict[str, int] = {}
_W_MEMO_MAX = 1 << 20


def _token_weight(tok: str) -> int:
    w = _W_MEMO.get(tok)
    if w is None:
        w = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8],
                16) % 21 - 10
        if len(_W_MEMO) < _W_MEMO_MAX:
            _W_MEMO[tok] = w
    return w


def classifier_score_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, score, is_quality): hashed-linear
    model inference per document; ``is_quality`` = score >= 0."""
    texts = batch.column("text").to_pylist()
    scores = [sum(map(_token_weight, tokenize(t))) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id").cast(pa.int64()),
        "score": pa.array(scores, pa.int64()),
        "is_quality": pa.array([1 if s >= 0 else 0 for s in scores],
                               pa.int64()),
    })


# --- BPE merge training (iterative algorithm, vocab-bounded) -------------


def word_frequencies(docs, text_col: str = "text"):
    """Distributed word-frequency table — the ONLY corpus-scale pass a
    BPE trainer needs: per-batch Counter partials (shuffle rows bounded
    by each block's vocabulary, not its token count) -> one
    ``groupby(word).sum``. Returns a Dataset of (word, n)."""
    from collections import Counter

    import ray
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(tokenize(t))
        return pa.table({
            "word": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    return docs.map_batches(partial, batch_format="pyarrow").groupby(
        "word").aggregate(ray.data.aggregate.Sum("n"))


def bpe_merges_from_word_freq(word_freq: dict[str, int],
                              n_merges: int) -> list[tuple[str, str, int]]:
    """Classic BPE merge loop over a word-frequency table (driver-side
    by DESIGN: the table is vocabulary-bounded — millions of rows at
    web scale — while the corpus pass above is the distributed part).
    Deterministic: the most frequent adjacent symbol pair wins each
    round, ties broken lexicographically on (left, right). Returns
    [(left, right, pair_count), ...] in merge order."""
    from collections import Counter

    words: list[tuple[list[str], int]] = [
        (list(w), n) for w, n in sorted(word_freq.items()) if w]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in words:
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (la, rb), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((la, rb, cnt))
        joined = la + rb
        new_words = []
        for sym, n in words:
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == la and sym[i + 1] == rb:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words.append((out, n))
        words = new_words
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]
                    ) -> list[str]:
    """Apply trained BPE merges to one word: repeatedly merge the
    LOWEST-RANK adjacent pair (leftmost on rank ties) until none
    applies — the classic encode dual of
    :func:`bpe_merges_from_word_freq` (equivalent to replaying the
    merges in training order)."""
    sym = list(word)
    while len(sym) > 1:
        best = None
        bi = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        sym[bi:bi + 2] = [sym[bi] + sym[bi + 1]]
    return sym


# --- HTML entity decoding (post-extraction text repair) -------------------

# The reference parser keeps character references literal (its lexer has
# no entity table — src/lexer.js emits text verbatim), so decoding is an
# engine-side post-extraction step. Named table: the HTML5 core set a
# web corpus actually contains; unknown names stay literal (the HTML5
# "not a character reference" rule), as do invalid/surrogate numerics.
_ENTITY_TABLE: dict[str, str] = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "reg": "®",
    "trade": "™", "hellip": "…", "mdash": "—",
    "ndash": "–", "lsquo": "‘", "rsquo": "’",
    "ldquo": "“", "rdquo": "”", "sect": "§",
    "middot": "·", "times": "×", "divide": "÷",
    "euro": "€", "pound": "£", "deg": "°",
}

_ENTITY_RE = re.compile(
    r"&(?:#x([0-9a-fA-F]{1,6})|#([0-9]{1,7})|([a-zA-Z][a-zA-Z0-9]{1,30}));")


def _entity_sub(m: "re.Match[str]") -> str:
    hx, dec, name = m.groups()
    if name is not None:
        return _ENTITY_TABLE.get(name, m.group(0))
    cp = int(hx, 16) if hx is not None else int(dec)
    if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        return m.group(0)  # invalid reference stays literal
    return chr(cp)


def decode_entities_batch(batch: pa.Table, text_col: str = "text",
                          out_col: str = "decoded") -> pa.Table:
    """Single-pass HTML character-reference decoding of a text column.

    ONE left-to-right regex pass per row — each reference is consumed
    exactly once, so ``&amp;lt;`` decodes to the five characters
    ``&lt;`` (never double-decodes to ``<``), matching browser
    semantics. Vectorized gate: rows without ``&`` (the vast majority
    of extracted web text) pass through untouched via an Arrow mask;
    only flagged rows run the compiled single-pass substitution.
    """
    import pyarrow.compute as pc

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    has = pc.match_substring(pc.fill_null(col, ""), "&")
    if pc.any(has).as_py():
        mask = has.to_numpy(zero_copy_only=False)
        vals = col.to_pylist()
        out = pa.array(
            [(_ENTITY_RE.sub(_entity_sub, v) if m and v is not None
              else v) for v, m in zip(vals, mask)], pa.string())
    else:
        out = col.cast(pa.string())
    return batch.append_column(out_col, out)


# --- unicode case/accent folding (match-key normalization) ---------------

_NON_ASCII = r"[^\x00-\x7F]"


def fold_text_batch(batch: pa.Table, text_col: str = "text",
                    out_col: str = "folded") -> pa.Table:
    """Search/match-key normalization: lowercase, then NFKD-decompose
    and drop combining marks (``Čökè`` -> ``coke``) — the fold every
    dedup/matching key pipeline applies before hashing so accent
    variants collide. Vectorized gate: the lowercase pass is one Arrow
    kernel; only rows containing a non-ASCII byte (a small minority of
    web text) take the per-row unicodedata path."""
    import pyarrow.compute as pc
    import unicodedata

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    low = pc.utf8_lower(col)
    needs = pc.match_substring_regex(pc.fill_null(low, ""), _NON_ASCII)
    if pc.any(needs).as_py():
        mask = needs.to_numpy(zero_copy_only=False)
        vals = low.to_pylist()
        out = pa.array(
            [("".join(ch for ch in unicodedata.normalize("NFKD", v)
                      if not unicodedata.combining(ch))
              if m and v is not None else v)
             for v, m in zip(vals, mask)], pa.string())
    else:
        out = low
    return batch.append_column(out_col, out)

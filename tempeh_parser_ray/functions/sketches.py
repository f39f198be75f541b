"""Sketch / summary operators: exact distributed quantiles via value
histograms, and HyperLogLog approximate distinct counts.

Scale notes (100 TB design):

* **Histogram quantiles**: the only exchange is a
  ``groupby(group, value)`` over PRE-COMBINED per-batch value counts —
  rows shuffled are bounded by ``|groups| x |distinct values|`` per
  block, not by row count. The final quantile extraction runs over the
  per-group distinct-value histogram (bounded by the value domain, e.g.
  document lengths), never the raw rows. For unbounded/continuous
  domains, bucket the value first (``value // resolution``) — same
  machinery, bounded error.
* **HyperLogLog**: per-batch register partials (4 KiB per group at
  p=12) merge with an elementwise max — a pure grouped aggregate; no
  token ever shuffles twice and the driver sees ``|groups|`` register
  arrays. This is THE distinct-count path at 10^12 tokens (the exact
  ``groupby(token)`` path materializes the vocabulary).

Determinism: hashing is md5-based (seedless, stable across processes);
no RNG anywhere.
"""

from __future__ import annotations

import hashlib
import math
from typing import Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .textstats import tokenize


# --- exact grouped quantiles via value-count histograms -----------------


def grouped_value_counts(ds: "ray.data.Dataset", group_col: str,
                         value_col: str) -> "ray.data.Dataset":
    """Distributed ``(group, value) -> count`` histogram with a
    map-side combiner (per-batch ``TableGroupBy`` collapse)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, value_col])
        return pa.TableGroupBy(t, [group_col, value_col]).aggregate(
            [([], "count_all")]).rename_columns(
            [group_col, value_col, "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby([group_col, value_col]).aggregate(
        ray.data.aggregate.Sum("n"))


def quantile_disc_from_hist(values: np.ndarray, counts: np.ndarray,
                            qs: Sequence[float]) -> list[int]:
    """Exact discrete quantiles from a sorted value histogram, matching
    DuckDB ``quantile_disc``: the element at sorted index
    ``max(ceil(q*n) - 1, 0)``."""
    order = np.argsort(values, kind="stable")
    values, counts = values[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for q in qs:
        idx = max(math.ceil(q * n) - 1, 0)
        pos = int(np.searchsorted(cum, idx, side="right"))
        out.append(int(values[pos]))
    return out


def grouped_quantiles(ds: "ray.data.Dataset", group_col: str,
                      value_col: str, qs: Sequence[float],
                      q_names: Sequence[str]) -> pa.Table:
    """Exact per-group discrete quantiles of an integer column.

    Only the pre-combined histogram shuffles; the quantile extraction
    reads the per-group distinct-value histogram (bounded by the value
    domain, NOT the row count)."""
    hist = grouped_value_counts(ds, group_col, value_col)
    parts = list(hist.iter_batches(batch_format="pyarrow",
                                   batch_size=None))
    if not parts:
        return pa.table(
            {group_col: pa.array([], pa.string()),
             **{n: pa.array([], pa.int64()) for n in q_names}})
    tbl = pa.concat_tables(parts)
    groups = np.asarray(tbl.column(group_col).to_pylist(), dtype=object)
    vals = np.asarray(tbl.column(value_col).to_pylist(), dtype=np.int64)
    cnts = np.asarray(tbl.column("sum(n)").to_pylist(), dtype=np.int64)
    uniq, inv = np.unique(groups, return_inverse=True)
    out_g: list = []
    out_q: list[list[int]] = [[] for _ in qs]
    for gi, g in enumerate(uniq):
        mask = inv == gi
        qvals = quantile_disc_from_hist(vals[mask], cnts[mask], qs)
        out_g.append(g)
        for i, v in enumerate(qvals):
            out_q[i].append(v)
    cols: dict[str, pa.Array] = {group_col: pa.array(out_g)}
    for name, col in zip(q_names, out_q):
        cols[name] = pa.array(col, pa.int64())
    return pa.table(cols)


# --- Count-Min sketch ---------------------------------------------------

CMS_D = 4       # hash rows
CMS_W = 4096    # counters per row; eps ~ e/W


def _cms_hash_tokens(tokens: list[str]) -> np.ndarray:
    """(len(tokens), CMS_D) column indices from md5 (stable, seedless):
    one digest yields all four rows' positions from 32-bit slices."""
    idx = np.empty((len(tokens), CMS_D), dtype=np.int64)
    for i, t in enumerate(tokens):
        digest = hashlib.md5(t.encode("utf-8")).digest()
        for d in range(CMS_D):
            idx[i, d] = int.from_bytes(
                digest[4 * d:4 * d + 4], "little") % CMS_W
    return idx


def cms_from_counts(counts: dict[str, int]) -> np.ndarray:
    """CMS_D x CMS_W uint64 sketch of a token->count map."""
    sketch = np.zeros((CMS_D, CMS_W), dtype=np.uint64)
    if not counts:
        return sketch
    toks = list(counts)
    idx = _cms_hash_tokens(toks)
    vals = np.asarray([counts[t] for t in toks], dtype=np.uint64)
    for d in range(CMS_D):
        np.add.at(sketch[d], idx[:, d], vals)
    return sketch


def cms_estimate(sketch: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point estimates (upper bounds with the usual CMS guarantee)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    idx = _cms_hash_tokens(tokens)
    ests = np.stack([sketch[d][idx[:, d]] for d in range(CMS_D)])
    return ests.min(axis=0)


def cms_sum_agg(col: str = "cms", name: str = "cms"):
    """Grouped/global aggregate: elementwise sum of sketch rows."""
    from ray.data.block import BlockAccessor

    def acc_block(acc, block):
        t = BlockAccessor.for_block(block).to_arrow()
        for buf in t.column(col).to_pylist():
            s = np.frombuffer(buf, dtype=np.uint64).reshape(CMS_D, CMS_W)
            acc = s.copy() if acc is None else acc + s
        return acc

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a + b

    return ray.data.aggregate.AggregateFn(
        init=lambda k: None,
        accumulate_block=acc_block,
        merge=merge,
        finalize=lambda a: (a if a is not None else np.zeros(
            (CMS_D, CMS_W), np.uint64)).tobytes(),
        name=name)


def heavy_hitter_tokens(ds: "ray.data.Dataset", text_col: str,
                        divisor: int = 200) -> pa.Table:
    """EXACT heavy hitters (tokens with total count >= total_tokens //
    divisor) found with a Count-Min prefilter over ONE tokenization
    pass:

    1. one pass over the corpus emits per-block ``(token, n)`` partial
       counts (the block's local vocabulary — the same rows the exact
       groupby would shuffle anyway), materialized once;
    2. the CMS and the token total are built FROM those partials
       (sketch-of-counts == sketch-of-stream; sketches merge by
       elementwise sum, a pure aggregate over 128 KiB rows);
    3. the candidate filter ALSO reads the partials — tokens whose CMS
       upper bound clears the threshold are a SUPERSET of the true
       heavy hitters (CMS never underestimates) — so the exact groupby
       runs over the tiny candidate set, never the vocabulary, and the
       corpus text is tokenized exactly once end-to-end;
    4. exact counts filter to the final answer.

    The sketch bounds stage-4's input regardless of vocabulary size —
    the pattern that replaces a full token groupby at 10^12 tokens."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(tokenize(t))
        return pa.table({
            "token": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    total = int(parts.sum("n") or 0)

    def cms_partial(batch: pa.Table) -> pa.Table:
        # Ray may coalesce several partial() outputs into one block, so a
        # token can appear more than once per batch — pre-sum before
        # sketching or the dict would keep only the last count and the
        # CMS would underestimate (breaking its no-false-negative bound).
        summed = pa.TableGroupBy(
            batch.select(["token", "n"]), "token").aggregate([("n", "sum")])
        counts = dict(zip(summed.column("token").to_pylist(),
                          (int(x) for x in summed.column("n_sum").to_pylist())))
        return pa.table({
            "cms": pa.array([cms_from_counts(counts).tobytes()],
                            pa.binary()),
        })

    agg = parts.map_batches(
        cms_partial, batch_format="pyarrow").aggregate(
        cms_sum_agg("cms", "cms")) or {}
    raw = agg.get("cms") or np.zeros((CMS_D, CMS_W), np.uint64).tobytes()
    sketch = np.frombuffer(raw, dtype=np.uint64).reshape(CMS_D, CMS_W)
    threshold = max(total // divisor, 1)
    sk_ref = ray.put(sketch)

    def candidates(batch: pa.Table) -> pa.Table:
        from .broadcast import cached_get
        sk = cached_get(sk_ref)
        toks = batch.column("token").to_pylist()
        keep = cms_estimate(sk, toks) >= np.uint64(threshold)
        return batch.filter(pa.array(keep))

    exact = parts.map_batches(
        candidates, batch_format="pyarrow").groupby("token").aggregate(
        ray.data.aggregate.Sum("n"))
    parts2 = list(exact.iter_batches(batch_format="pyarrow",
                                     batch_size=None))
    if not parts2:
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    tbl = pa.concat_tables(parts2)
    tbl = pa.table({
        "token": tbl.column("token"),
        "n": tbl.column("sum(n)").cast(pa.int64()),
    })
    tbl = tbl.filter(pa.compute.greater_equal(tbl.column("n"), threshold))
    return tbl.take(pa.compute.sort_indices(
        tbl, sort_keys=[("n", "descending"), ("token", "ascending")]))


# --- HyperLogLog --------------------------------------------------------

HLL_P = 12  # 4096 registers; relative error ~1.04/sqrt(4096) = 1.6%
_HLL_M = 1 << HLL_P


def _hll_registers(tokens: set[str]) -> np.ndarray:
    """Register array for a set of tokens (md5-hashed -> 64-bit)."""
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    shift = 64 - HLL_P
    mask = (1 << shift) - 1
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8],
                           "little")
        idx = h >> shift
        w = h & mask
        rank = shift - w.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


_HLL_SHIFT = 64 - HLL_P  # max register rank is _HLL_SHIFT + 1


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (no large-range correction needed at 64-bit hashes).

    ``sum(2^-reg)`` is computed as an EXACT scaled integer
    (``sum(2^(R-reg)) / 2^R``) so the value is order-independent and
    bit-reproducible by the SQL oracle — a float accumulation would be
    summation-order dependent."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    R = _HLL_SHIFT + 1
    counts = np.bincount(regs.astype(np.int64), minlength=R + 1)
    s_int = sum(int(c) << (R - r) for r, c in enumerate(counts) if c)
    est = alpha * m * m * float(1 << R) / float(s_int)
    zeros = int(counts[0])
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def hll_merge_agg(reg_col: str = "regs", name: str = "regs"):
    """Grouped aggregate: elementwise max over binary register rows."""
    from ray.data.block import BlockAccessor

    def acc_block(acc: np.ndarray | None, block) -> np.ndarray:
        t = BlockAccessor.for_block(block).to_arrow()
        for buf in t.column(reg_col).to_pylist():
            r = np.frombuffer(buf, dtype=np.uint8)
            acc = r.copy() if acc is None else np.maximum(acc, r)
        return acc

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return np.maximum(a, b)

    return ray.data.aggregate.AggregateFn(
        init=lambda k: None,
        accumulate_block=acc_block,
        merge=merge,
        finalize=lambda a: (a if a is not None
                            else np.zeros(_HLL_M, np.uint8)).tobytes(),
        name=name)


def grouped_hll_distinct(ds: "ray.data.Dataset", group_col: str,
                         text_col: str) -> pa.Table:
    """Approximate distinct-token count per group.

    Per-batch partial: one register array per group present in the
    batch (tokens deduped in-batch first). Exchange: 4 KiB register
    rows, merged by a pure grouped max-aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        per_group: dict = {}
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            per_group.setdefault(g, set()).update(tokenize(t))
        groups = sorted(per_group)
        # explicit type: an empty batch must not emit a null-typed
        # group column (blocks would fail schema unification)
        return pa.table({
            group_col: pa.array(groups, batch.column(group_col).type),
            "regs": pa.array([_hll_registers(per_group[g]).tobytes()
                              for g in groups], pa.binary()),
        })

    merged = ds.map_batches(partial, batch_format="pyarrow").groupby(
        group_col).aggregate(hll_merge_agg("regs", "regs"))
    parts = list(merged.iter_batches(batch_format="pyarrow",
                                     batch_size=None))
    if not parts:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n_distinct_est": pa.array([], pa.int64())})
    tbl = pa.concat_tables(parts)
    # floor(x + 0.5): same half-up rule the SQL oracle's FLOOR uses
    # (Python round() is banker's, which SQL cannot reproduce)
    ests = [int(math.floor(hll_estimate(
        np.frombuffer(b, dtype=np.uint8)) + 0.5))
            for b in tbl.column("regs").to_pylist()]
    out = pa.table({
        group_col: tbl.column(group_col),
        "n_distinct_est": pa.array(ests, pa.int64()),
    })
    idx = pa.compute.sort_indices(out, sort_keys=[(group_col, "ascending")])
    return out.take(idx)


# --- mergeable quantile sketch (KLL/MRL-style, deterministic) -------------

KLL_K = 256


def kll_new() -> dict:
    """Empty sketch: per-level sorted value arrays (weight 2^level) +
    per-level compaction parity. Compaction is DETERMINISTIC (parity
    alternates which half survives) rather than randomized — merge
    results depend on merge order (so sketch queries are rows-only,
    pinned by rank-error pytest bounds), but a given pipeline is
    reproducible run-to-run, which randomized KLL is not."""
    return {"levels": [np.empty(0, np.float64)], "parity": [0]}


def _kll_compact_cascade(sk: dict) -> None:
    levels, parity = sk["levels"], sk["parity"]
    lvl = 0
    while lvl < len(levels):
        if len(levels[lvl]) <= KLL_K:
            lvl += 1
            continue
        buf = np.sort(levels[lvl])
        keep = buf[parity[lvl]::2]
        parity[lvl] ^= 1
        levels[lvl] = np.empty(0, np.float64)
        if lvl + 1 == len(levels):
            levels.append(np.empty(0, np.float64))
            parity.append(0)
        levels[lvl + 1] = np.concatenate([levels[lvl + 1], keep])
        lvl += 1


def kll_update(sk: dict, values: np.ndarray) -> dict:
    sk["levels"][0] = np.concatenate(
        [sk["levels"][0], np.asarray(values, np.float64)])
    _kll_compact_cascade(sk)
    return sk


def kll_merge(a: dict | None, b: dict | None) -> dict | None:
    if a is None:
        return b
    if b is None:
        return a
    la, lb = a["levels"], b["levels"]
    n = max(len(la), len(lb))
    levels, parity = [], []
    for i in range(n):
        xs = la[i] if i < len(la) else np.empty(0, np.float64)
        ys = lb[i] if i < len(lb) else np.empty(0, np.float64)
        levels.append(np.concatenate([xs, ys]))
        parity.append((a["parity"][i] if i < len(la) else 0)
                      ^ (b["parity"][i] if i < len(lb) else 0))
    out = {"levels": levels, "parity": parity}
    _kll_compact_cascade(out)
    return out


def kll_serialize(sk: dict) -> bytes:
    import struct

    parts = [struct.pack("<i", len(sk["levels"]))]
    for arr, par in zip(sk["levels"], sk["parity"]):
        parts.append(struct.pack("<ii", len(arr), par))
        parts.append(np.ascontiguousarray(arr, np.float64).tobytes())
    return b"".join(parts)


def kll_deserialize(buf: bytes) -> dict:
    import struct

    n = struct.unpack_from("<i", buf, 0)[0]
    off = 4
    levels, parity = [], []
    for _ in range(n):
        ln, par = struct.unpack_from("<ii", buf, off)
        off += 8
        levels.append(np.frombuffer(buf, np.float64, ln, off).copy())
        off += 8 * ln
        parity.append(par)
    return {"levels": levels, "parity": parity}


def kll_quantiles(sk: dict, qs: list[float]) -> np.ndarray:
    """Discrete lower quantile over the weighted sample: smallest
    value whose cumulative weight reaches ``ceil(q * W)`` (same rule
    as ``quantile_disc_from_hist``)."""
    vals = np.concatenate([a for a in sk["levels"]]
                          ) if sk["levels"] else np.empty(0)
    if vals.size == 0:
        return np.full(len(qs), np.nan)
    ws = np.concatenate([np.full(len(a), 1 << i, np.int64)
                         for i, a in enumerate(sk["levels"])])
    order = np.argsort(vals, kind="stable")
    vals, ws = vals[order], ws[order]
    cum = np.cumsum(ws)
    total = cum[-1]
    out = np.empty(len(qs), np.float64)
    for j, q in enumerate(qs):
        target = max(1, int(math.ceil(q * total)))
        out[j] = vals[np.searchsorted(cum, target)]
    return out


def kll_merge_agg(sketch_col: str = "kll", name: str = "kll"):
    """Global/grouped aggregate merging serialized sketch rows."""
    from ray.data.block import BlockAccessor

    def acc_block(acc, block):
        t = BlockAccessor.for_block(block).to_arrow()
        for buf in t.column(sketch_col).to_pylist():
            acc = kll_merge(acc, kll_deserialize(buf))
        return acc

    return ray.data.aggregate.AggregateFn(
        init=lambda k: None,
        accumulate_block=acc_block,
        merge=kll_merge,
        finalize=lambda a: kll_serialize(a if a is not None
                                         else kll_new()),
        name=name)


def sketch_quantiles(ds: "ray.data.Dataset", value_col: str,
                     qs: list[float]) -> pa.Table:
    """Approximate quantiles of a numeric column via one map-side
    sketch pass + one tiny global merge: each block contributes ONE
    ~k*log(n) serialized sketch row, so the reduce moves kilobytes at
    any corpus size — the streaming complement to the exact
    value-count-histogram percentile path (``grouped_quantiles``),
    for value domains too large to histogram."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False
                                             ).astype(np.float64)
        return pa.table({"kll": pa.array(
            [kll_serialize(kll_update(kll_new(), v))], pa.binary())})

    merged = ds.map_batches(partial, batch_format="pyarrow"
                            ).aggregate(kll_merge_agg("kll", "kll"))
    sk = kll_deserialize(merged["kll"])
    est = kll_quantiles(sk, qs)
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "estimate": pa.array(est, pa.float64())})


def grouped_sketch_quantiles(ds: "ray.data.Dataset", group_col: str,
                             value_col: str, qs: list[float],
                             q_names: list[str]) -> pa.Table:
    """Per-GROUP approximate quantiles via mergeable sketches: the map
    side contributes one serialized sketch row per (group, block) —
    in-batch grouping is a numpy argsort, no per-row Python — and ONE
    ``groupby(group).aggregate(kll_merge)`` exchange moves kilobytes
    per group regardless of row count. The streaming complement of
    ``grouped_quantiles`` when the per-group value domain is too large
    to histogram exactly."""

    def partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch.column(group_col).to_pylist(),
                       dtype=object)
        v = batch.column(value_col).to_numpy(zero_copy_only=False
                                             ).astype(np.float64)
        order = np.argsort(g, kind="stable")
        g, v = g[order], v[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], g[1:] != g[:-1])))
        out_g: list = []
        out_s: list[bytes] = []
        for i, s in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < len(bounds) else len(g)
            out_g.append(g[s])
            out_s.append(kll_serialize(kll_update(kll_new(), v[s:e])))
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "kll": pa.array(out_s, pa.binary())})

    merged = ds.map_batches(partial, batch_format="pyarrow").groupby(
        group_col).aggregate(kll_merge_agg("kll", "kll")).take_all()
    merged.sort(key=lambda r: r[group_col])
    cols: dict = {group_col: [r[group_col] for r in merged]}
    for nm in q_names:
        cols[nm] = []
    for r in merged:
        est = kll_quantiles(kll_deserialize(r["kll"]), qs)
        for nm, e in zip(q_names, est):
            cols[nm].append(e)
    return pa.table({group_col: pa.array(cols[group_col], pa.string()),
                     **{nm: pa.array(cols[nm], pa.float64())
                        for nm in q_names}})

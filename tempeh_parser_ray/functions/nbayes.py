"""Distributed Naive-Bayes-style text classifier: TRAIN on the corpus
(one map-side-combined count pass) and CLASSIFY every document, all in
fixed-point INTEGER arithmetic so the argmax is exactly reproducible in
SQL (the catalog's existing ``quality_classifier`` only *scores* with a
fixed model; this operator closes the train-then-apply loop).

Model (multinomial NB with add-one smoothing, fixed-point likelihoods):

- ``w(t, c) = ((n_tc + 1) * S) // (n_c + V)`` — the scaled smoothed
  class-conditional likelihood of token ``t`` under class ``c``
  (``n_tc`` = occurrences of ``t`` in class ``c``, ``n_c`` = total
  token occurrences in ``c``, ``V`` = corpus distinct-token count,
  ``S = 10**9``; all int64, floor division).
- ``prior(c) = (D_c * S) // D`` over non-empty documents.
- ``score(d, c) = prior(c) + sum over d's token OCCURRENCES of
  w(t, c)``; predicted class = argmax, ties broken by smaller class
  label. Every quantity is an exact int64 on both the Ray and the
  DuckDB side, so prediction equality is bit-exact — no float log
  whose summation order could differ.

Scale shape (the house pattern, mirroring
:func:`~tempeh_parser_ray.functions.curation.ngram_lm_scores`):

- TRAIN is ONE tokenize pass emitting map-side-combined
  ``(kind, lang, fp, n)`` partials (kind 0 = token count, kind 1 =
  per-class doc count) folded by one groupby — the exchange is
  vocab x classes bounded, never corpus bounded; only 8-byte token
  fingerprints shuffle, never token text.
- CLASSIFY is size-adaptive: a count table within ``broadcast_limit``
  ships once as per-class sorted int64 arrays (per-worker cached) and
  every doc classifies itself in one vectorized searchsorted +
  reduceat pass; a larger table falls back to a distributed inner
  join of per-doc ``(fp, mult)`` rows against the counts — exact
  because ``score(d, c) = prior(c) + M_d * dw_c + sum over present
  (t, c) pairs of mult * (w(t, c) - dw_c)`` where ``dw_c = S //
  (n_c + V)`` is the absent-pair weight and ``M_d`` the doc's token
  count, so the inner join only needs the observed pairs.
- The DuckDB oracle joins on token STRINGS; agreement therefore also
  certifies the fingerprint has no colliding pair on the input.

Reference: the reference repo has no classifier — this is engine-side
scope mandated by the training-data-pipeline brief (quality/language
model scoring as a first-class batch operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .broadcast import cached_get
from .dedup import fp_strings64
from .textstats import tokenize

_SCALE = 10**9


def _fp(strs: list[str]) -> np.ndarray:
    if not strs:
        return np.zeros(0, np.int64)
    return fp_strings64(strs)


def _doc_tokens(batch: pa.Table):
    """Per-doc flattened token fps: (ids, langs, lens, flat_fps) for
    docs with >= 1 token (empty docs carry no signal and are excluded
    on both the Ray and the oracle side)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    langs = batch.column("lang").to_pylist()
    texts = batch.column("text").to_pylist()
    keep_ids: list[int] = []
    keep_langs: list[str] = []
    lens: list[int] = []
    fps: list[np.ndarray] = []
    for i, lg, t in zip(ids, langs, texts):
        toks = tokenize(t)
        if not toks:
            continue
        keep_ids.append(int(i))
        keep_langs.append(lg)
        lens.append(len(toks))
        fps.append(_fp(toks))
    if keep_ids:
        return (np.asarray(keep_ids, np.int64), keep_langs,
                np.asarray(lens, np.int64), np.concatenate(fps))
    return (np.zeros(0, np.int64), [], np.zeros(0, np.int64),
            np.zeros(0, np.int64))


_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                         ("pred_lang", pa.string()),
                         ("pred_score", pa.int64())])


def nb_lang_classify(docs: "ray.data.Dataset", *,
                     broadcast_limit: int = 5_000_000,
                     join_parts: int = 8) -> "ray.data.Dataset":
    """Train the NB language model on ``docs`` (doc_id, text, lang) and
    classify every non-empty document. Returns (doc_id, lang,
    pred_lang, pred_score).

    ``docs`` is consumed 2x (broadcast path) / 3x (distributed path) —
    each pass re-executes the caller's upstream pipeline. That is the
    right trade for a parquet-backed source (re-reading beats pinning
    the full text corpus in the object store at 100 TB); a caller
    feeding an EXPENSIVE computed dataset should pass
    ``docs.materialize()`` instead."""

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        ids, langs, lens, flat = _doc_tokens(batch)
        ndoc = Counter(langs)
        bounds = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        by_lang: dict[str, list[np.ndarray]] = {}
        for j, lg in enumerate(langs):
            by_lang.setdefault(lg, []).append(flat[bounds[j]:bounds[j + 1]])
        out_lg: list[str] = []
        out_f: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        for lg, arrs in by_lang.items():
            u, c = np.unique(np.concatenate(arrs), return_counts=True)
            out_lg.extend([lg] * len(u))
            out_f.append(u)
            out_n.append(c.astype(np.int64))
        n_tok = len(out_lg)
        kinds = np.concatenate([np.zeros(n_tok, np.int64),
                                np.ones(len(ndoc), np.int64)])
        lgs = out_lg + list(ndoc.keys())
        fps = np.concatenate(
            (out_f or [np.zeros(0, np.int64)])
            + [np.zeros(len(ndoc), np.int64)])
        ns = np.concatenate(
            (out_n or [np.zeros(0, np.int64)])
            + [np.fromiter(ndoc.values(), np.int64, len(ndoc))])
        return pa.table({"kind": pa.array(kinds, pa.int64()),
                         "lang": pa.array(lgs, pa.string()),
                         "fp": pa.array(fps, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    counts = docs.map_batches(
        count_partial, batch_format="pyarrow").groupby(
        ["kind", "lang", "fp"]).aggregate(
        ray.data.aggregate.Sum("n")).materialize()

    n_counts = counts.count()
    if n_counts == 0:  # every document empty: nothing to classify
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    if n_counts <= broadcast_limit:
        tbl = pa.concat_tables(list(counts.iter_batches(
            batch_format="pyarrow", batch_size=None)))
        k = tbl.column("kind").to_numpy(zero_copy_only=False)
        lg = np.asarray(tbl.column("lang").to_pylist(), dtype=object)
        f = tbl.column("fp").to_numpy(zero_copy_only=False)
        n = tbl.column("sum(n)").to_numpy(zero_copy_only=False)
        classes = sorted(set(lg[k == 1].tolist()))
        V = len(np.unique(f[k == 0]))
        D = int(n[k == 1].sum())
        model = {}
        for c in classes:
            mt = (k == 0) & (lg == c)
            order = np.argsort(f[mt])
            n_c = int(n[mt].sum())
            d_c = int(n[(k == 1) & (lg == c)].sum())
            assert (n[mt].max(initial=0) + 1) < 2**63 // _SCALE
            wt = ((n[mt][order] + 1) * _SCALE) // (n_c + V)
            model[c] = (f[mt][order], wt.astype(np.int64),
                        _SCALE // (n_c + V), (d_c * _SCALE) // D)
        model_ref = ray.put((classes, model))

        def classify(batch: pa.Table) -> pa.Table:
            classes, model = cached_get(model_ref)
            ids, langs, lens, flat = _doc_tokens(batch)
            if not len(ids):
                return _OUT_SCHEMA.empty_table()
            offsets = np.concatenate(
                ([0], np.cumsum(lens[:-1]))).astype(np.int64)
            scores = np.empty((len(ids), len(classes)), np.int64)
            for j, c in enumerate(classes):
                cf, cw, dw, prior = model[c]
                idx = np.searchsorted(cf, flat)
                idx_c = np.minimum(idx, max(len(cf) - 1, 0))
                hit = (len(cf) > 0) & (cf[idx_c] == flat)
                occ = np.where(hit, cw[idx_c], dw)
                scores[:, j] = np.add.reduceat(occ, offsets) + prior
            best = np.argmax(scores, axis=1)  # first max = smallest c
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "pred_lang": pa.array(
                    [classes[b] for b in best], pa.string()),
                "pred_score": pa.array(
                    scores[np.arange(len(ids)), best], pa.int64()),
            })

        return docs.map_batches(classify, batch_format="pyarrow")

    # distributed path: per-doc (fp, mult) facts join the counts table;
    # absent (t, c) pairs are folded in analytically via M_d * dw_c.
    def meta_partial(batch: pa.Table) -> pa.Table:
        k = batch.column("kind").to_numpy(zero_copy_only=False)
        lg = batch.column("lang").to_pylist()
        n = batch.column("sum(n)").to_numpy(zero_copy_only=False)
        rows: dict[tuple[int, str], int] = {}
        for ki, li, ni in zip(k, lg, n):
            key = (int(ki), li)
            rows[key] = rows.get(key, 0) + int(ni)
        # distinct-V is NOT computable per block (the same fp can
        # appear in several blocks under different langs) — it is
        # resolved by the dedicated fp-level pass below.
        return pa.table({
            "kind": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "v": pa.array(list(rows.values()), pa.int64())})

    meta = pa.concat_tables(list(
        counts.map_batches(meta_partial, batch_format="pyarrow")
        .groupby(["kind", "lang"]).aggregate(ray.data.aggregate.Sum("v"))
        .iter_batches(batch_format="pyarrow", batch_size=None)))

    def fp_only(batch: pa.Table) -> pa.Table:
        k = batch.column("kind").to_numpy(zero_copy_only=False)
        fps = batch.column("fp").to_numpy(zero_copy_only=False)
        return pa.table({"fp": pa.array(np.unique(fps[k == 0]),
                                        pa.int64())})

    V = int(counts.map_batches(fp_only, batch_format="pyarrow")
            .groupby("fp").count().count())

    mk = meta.column("kind").to_numpy(zero_copy_only=False)
    mlg = meta.column("lang").to_pylist()
    mv = meta.column("sum(v)").to_numpy(zero_copy_only=False)
    classes = sorted(lg for ki, lg in zip(mk, mlg) if ki == 1)
    D = int(mv[mk == 1].sum())
    n_c = {lg: int(v) for ki, lg, v in zip(mk, mlg, mv) if ki == 0}
    d_c = {lg: int(v) for ki, lg, v in zip(mk, mlg, mv) if ki == 1}
    consts = {c: (_SCALE // (n_c[c] + V),
                  (d_c[c] * _SCALE) // D) for c in classes}
    consts_ref = ray.put((classes, consts, V, {c: n_c[c] for c in classes}))

    def fact_rows(batch: pa.Table) -> pa.Table:
        """(doc_id, fp, mult) per present token + one kind-1 meta row
        per doc carrying (lang via the lang column, M via mult)."""
        ids, langs, lens, flat = _doc_tokens(batch)
        out_id, out_f, out_m = [], [], []
        pos = 0
        for i, ln_ in zip(ids, lens):
            uniq, cnt = np.unique(flat[pos:pos + ln_],
                                  return_counts=True)
            out_id.append(np.full(len(uniq), i, np.int64))
            out_f.append(uniq)
            out_m.append(cnt.astype(np.int64))
            pos += ln_
        if not out_id:
            return pa.schema([("doc_id", pa.int64()),
                              ("fp", pa.int64()),
                              ("mult", pa.int64())]).empty_table()
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "fp": pa.array(np.concatenate(out_f), pa.int64()),
            "mult": pa.array(np.concatenate(out_m), pa.int64()),
        })

    def tok_counts_side(batch: pa.Table) -> pa.Table:
        mask = pa.compute.equal(batch.column("kind"), 0)
        t = batch.filter(mask)
        return pa.table({"fp": t.column("fp"),
                         "clang": t.column("lang"),
                         "cnt": t.column("sum(n)")})

    facts = docs.map_batches(fact_rows, batch_format="pyarrow")
    tokc = counts.map_batches(tok_counts_side, batch_format="pyarrow")
    joined = facts.join(tokc, join_type="inner",
                        num_partitions=join_parts, on=("fp",))

    def corr_rows(batch: pa.Table) -> pa.Table:
        _, consts, V, n_c = cached_get(consts_ref)
        lg = batch.column("clang").to_pylist()
        n = batch.column("cnt").to_numpy(zero_copy_only=False)
        m = batch.column("mult").to_numpy(zero_copy_only=False)
        denom = np.asarray([n_c[c] + V for c in lg], np.int64)
        dw = np.asarray([consts[c][0] for c in lg], np.int64)
        # same int64 overflow guard the broadcast path has — this IS
        # the big-corpus path, so silent wraparound here would be the
        # worst possible failure mode
        assert (int(n.max(initial=0)) + 1) < 2**63 // _SCALE, \
            "token count overflows the fixed-point scale"
        corr = m * (((n + 1) * _SCALE) // denom - dw)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "clang": batch.column("clang"),
            "corr": pa.array(corr, pa.int64()),
            "is_meta": pa.array(np.zeros(len(corr), np.int64)),
        })

    def doc_meta_rows(batch: pa.Table) -> pa.Table:
        ids, langs, lens, _ = _doc_tokens(batch)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "clang": pa.array(langs, pa.string()),
            "corr": pa.array(lens, pa.int64()),  # corr carries M_d
            "is_meta": pa.array(np.ones(len(ids), np.int64)),
        })

    corr = joined.map_batches(corr_rows, batch_format="pyarrow")
    dmeta = docs.map_batches(doc_meta_rows, batch_format="pyarrow")

    # One mergeable aggregate folds each doc's rows into (per-class
    # corr sums, M_d, true lang) — accumulate_block is ONE vectorized
    # pass over the group's slice (np.add.at), not a per-class rescan,
    # and no per-document pyarrow Table is ever built. The argmax then
    # runs batched in numpy over MANY docs per map_batches call — the
    # same shape the broadcast classify uses.
    from ray.data.block import BlockAccessor

    classes_l, consts_l, _, _ = ray.get(consts_ref)
    cls_idx = {c: i for i, c in enumerate(classes_l)}
    n_cls = len(classes_l)

    def acc_block(acc, block):
        t = BlockAccessor.for_block(block).to_arrow()
        sums, m_d, true_lang = acc
        sums = np.asarray(sums, np.int64).copy()
        is_meta = t.column("is_meta").to_numpy(zero_copy_only=False)
        cr = t.column("corr").to_numpy(zero_copy_only=False)
        lgs = t.column("clang").to_pylist()
        meta = is_meta == 1
        if meta.any():
            mi = int(np.flatnonzero(meta)[0])
            m_d, true_lang = int(cr[mi]), lgs[mi]
        ci = np.asarray([cls_idx[lg] for lg in lgs], np.int64)
        np.add.at(sums, ci[~meta], cr[~meta])
        return (sums.tolist(), m_d, true_lang)

    def merge(a, b):
        sa, ma, la = a
        sb, mb, lb = b
        return ((np.asarray(sa, np.int64)
                 + np.asarray(sb, np.int64)).tolist(),
                mb if ma < 0 else ma, lb if ma < 0 else la)

    agg = ray.data.aggregate.AggregateFn(
        init=lambda k: ([0] * n_cls, -1, ""),
        accumulate_block=acc_block, merge=merge, name="nbacc")
    folded = corr.union(dmeta).groupby("doc_id").aggregate(agg)

    prior_v = np.asarray([consts_l[c][1] for c in classes_l], np.int64)
    dw_v = np.asarray([consts_l[c][0] for c in classes_l], np.int64)

    def explode(batch: pa.Table) -> pa.Table:
        res = batch.column("nbacc").to_pylist()
        if not res:
            return _OUT_SCHEMA.empty_table()
        sums = np.asarray([r[0] for r in res], np.int64)  # (n, C)
        m_d = np.asarray([r[1] for r in res], np.int64)
        scores = prior_v[None, :] + m_d[:, None] * dw_v[None, :] + sums
        best = np.argmax(scores, axis=1)  # first max = lowest class
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "lang": pa.array([r[2] for r in res], pa.string()),
            "pred_lang": pa.array(
                [classes_l[int(b)] for b in best], pa.string()),
            "pred_score": pa.array(
                scores[np.arange(len(best)), best], pa.int64()),
        })

    return folded.map_batches(explode, batch_format="pyarrow")

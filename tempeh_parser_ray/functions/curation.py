"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup: sequence packing (a distributed prefix-sum scan),
benchmark decontamination (n-gram overlap), PII redaction, and
repetition-based quality scoring.

All are ``map_batches``/groupby compositions over Arrow batches — no
driver-side row loops, no whole-corpus materialization. Every operator
here has a DuckDB oracle in ``__ray_entry__`` (token contract:
``textstats.tokenize`` == ``string_split_regex(trim(text), '\\s+')``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .broadcast import cached_get
from .dedup import collect_columns_agg, fp_strings64
from .textstats import tokenize

# --- sequence packing (distributed prefix-sum scan) ---------------------


def sequence_packing(docs: "ray.data.Dataset", *, capacity: int,
                     bucket_size: int = 65_536) -> "ray.data.Dataset":
    """Greedy concat-then-split sequence packing: documents ordered by
    ``doc_id`` are laid end-to-end in token space and cut into chunks of
    ``capacity`` tokens; each doc reports the chunk its first token
    lands in and its offset within that chunk (training-sequence
    assembly for an LLM data loader).

    This is a DISTRIBUTED PREFIX SUM (scan), composed without a global
    sort:

    1. one ``map_batches`` pass computes ``(doc_id, n_tokens,
       bucket = doc_id // bucket_size)`` — the scan runs over the
       pre-existing key order, so no shuffle re-orders data;
    2. per-bucket token sums via ONE pure ``groupby(bucket).sum`` —
       ``n_docs / bucket_size`` rows reach the driver (bounded: 15 M
       rows at 10^12 docs; beyond that, apply the same two stages
       recursively to the bucket-sum table — a two-level scan);
    3. the driver computes EXCLUSIVE bucket offsets (a cumsum over the
       tiny sorted bucket table) and broadcasts sorted (bucket, offset)
       arrays once via ``ray.put``;
    4. a ``groupby(bucket)`` collect (per-group state bounded by
       ``bucket_size`` docs — pure-int64 rows, native Arrow lists)
       resolves each bucket independently: sort by doc_id, exclusive
       cumsum, add the bucket offset via ``np.searchsorted``.
    """
    counts = docs.map_batches(
        _token_count_bucket, batch_format="pyarrow",
        fn_kwargs={"bucket_size": bucket_size})
    return pack_counts(counts, capacity=capacity)


def pack_counts(counts: "ray.data.Dataset", *,
                capacity: int) -> "ray.data.Dataset":
    """Packing scan over pre-computed ``(doc_id, n_tokens, bucket)``
    rows — the entry point for composites that already tokenized
    (stages 2-4 of :func:`sequence_packing`). ``counts`` is consumed
    twice (bucket sums + the per-bucket collect), so it is materialized
    here — int64 rows only, far smaller than the corpus."""
    counts = counts.materialize()
    sums = counts.groupby("bucket").aggregate(
        ray.data.aggregate.Sum("n_tokens")).take_all()
    buckets = np.asarray(sorted(r["bucket"] for r in sums), np.int64)
    per_bucket = {r["bucket"]: r["sum(n_tokens)"] for r in sums}
    totals = np.asarray([per_bucket[b] for b in buckets], np.int64)
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    bcast = ray.put((buckets, offsets))

    def resolve(batch: pa.Table) -> pa.Table:
        # per-worker cached fetch: the (bucket, offset) arrays are 240 MB
        # at 10^12 docs — never re-deserialize them per batch
        bks, offs = cached_get(bcast)
        out_id: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        out_o: list[np.ndarray] = []
        for bkt, rows in zip(batch.column("bucket").to_pylist(),
                             batch.column("rows").to_pylist()):
            arr = np.asarray(rows, dtype=np.int64)  # (doc_id, n_tokens)
            order = np.argsort(arr[:, 0], kind="stable")
            ids, toks = arr[order, 0], arr[order, 1]
            base = offs[np.searchsorted(bks, bkt)]
            before = base + np.concatenate(([0], np.cumsum(toks)[:-1]))
            out_id.append(ids)
            out_n.append(toks)
            out_c.append(before // capacity)
            out_o.append(before % capacity)
        if not out_id:
            z = np.zeros(0, np.int64)
            out_id = out_n = out_c = out_o = [z]
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "n_tokens": pa.array(np.concatenate(out_n), pa.int64()),
            "chunk_id": pa.array(np.concatenate(out_c), pa.int64()),
            "chunk_offset": pa.array(np.concatenate(out_o), pa.int64()),
        })

    grouped = counts.groupby("bucket").aggregate(
        collect_columns_agg(["doc_id", "n_tokens"], "rows"))
    return grouped.map_batches(resolve, batch_format="pyarrow")


def _token_count_bucket(batch: pa.Table, *, bucket_size: int) -> pa.Table:
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").cast(pa.int64())
    return pa.table({
        "doc_id": ids,
        "n_tokens": pa.array([len(tokenize(t)) for t in texts],
                             pa.int64()),
        "bucket": pc.divide(ids, bucket_size).cast(pa.int64()),
    })


# --- benchmark decontamination (n-gram overlap) --------------------------


def decontaminate(docs: "ray.data.Dataset", *, width: int = 8,
                  benchmark_mod: int = 97, join_parts: int = 8,
                  bench_broadcast_limit: int = 5_000_000
                  ) -> "ray.data.Dataset":
    """Benchmark decontamination: flag every non-benchmark document
    sharing at least one ``width``-token shingle with the benchmark set
    (docs with ``doc_id % benchmark_mod == 0``) — the GPT-3-style
    n-gram overlap check run before training.

    Both sides explode to per-doc-DEDUPED ``(doc_id, gram-fp)`` rows
    (the vectorized ``hash_strings64`` kernel over the gram strings — only 8-byte
    fingerprints shuffle, never gram text; the DuckDB oracle joins on
    the gram STRINGS, so agreement also certifies the fp has no
    colliding pair on this input). SIZE-ADAPTIVE overlap test: a
    benchmark key set within ``bench_broadcast_limit`` is broadcast
    once as a sorted int64 array and every doc flags itself in ONE
    pass (vectorized searchsorted, per-worker cached); a larger set
    falls back to a distributed hash join on the fp — no broadcast of
    either side, so the benchmark set may itself be web-scale:

    1. benchmark distinct fps: keys-only groupby (pre-deduped map-side);
    2. candidate hits: fact-side fps ``inner`` join benchmark keys,
       then ONE groupby(doc_id) count -> the contaminated id set;
    3. flag assembly: UNION of (all non-benchmark doc_ids, hit=0) with
       (hit ids, hit=1) -> ``groupby(doc_id).max(hit)``. A union +
       pure aggregate rather than a left_outer join: Ray's hash-join
       aggregator crashes on partitions whose right side received zero
       rows (schema-less empty build), which is the COMMON case when
       the hit set is small — the aggregate path has no such fragility
       and shuffles the same (doc_id, int64) rows.
    """
    def grams(batch: pa.Table, *, side_bench: bool) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_id: list[int] = []
        out_g: list[str] = []
        for i, t in zip(ids, texts):
            if (i % benchmark_mod == 0) != side_bench:
                continue
            toks = tokenize(t)
            seen = {" ".join(toks[j:j + width])
                    for j in range(len(toks) - width + 1)}
            out_id.extend([int(i)] * len(seen))
            out_g.extend(seen)
        fp = fp_strings64(out_g)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "gfp": pa.array(fp, pa.int64())})

    bench_keys = docs.map_batches(
        grams, batch_format="pyarrow",
        fn_kwargs={"side_bench": True}).groupby("gfp").count(
        ).drop_columns(["count()"]).materialize()

    # size-adaptive (the incremental-dedup shape): a benchmark key set
    # that fits the broadcast limit ships once as a sorted int64 array
    # (per-worker cached) and every doc resolves its flag in ONE pass —
    # no join, no flag-assembly exchange. Above the limit, the
    # distributed join below handles web-scale benchmark sets.
    # (n == 0 must also take this path: Ray's hash join crashes on a
    # schema-less empty side, and with no benchmark keys there is
    # nothing to join anyway.)
    n_bench = bench_keys.count()
    if n_bench <= bench_broadcast_limit or n_bench == 0:
        parts = list(bench_keys.iter_batches(batch_format="pyarrow",
                                             batch_size=None))
        keys = (pa.concat_tables(parts).column("gfp").to_numpy(
            zero_copy_only=False).astype(np.int64)
            if parts else np.zeros(0, np.int64))
        keys_ref = ray.put(np.sort(keys))

        def mark(batch: pa.Table) -> pa.Table:
            table = cached_get(keys_ref)
            t = grams(batch, side_bench=False)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            fps = t.column("gfp").to_numpy(zero_copy_only=False)
            if len(table):
                pos = np.searchsorted(table, fps)
                hit = (pos < len(table)) & (
                    table[np.minimum(pos, len(table) - 1)] == fps)
            else:
                hit = np.zeros(len(fps), bool)
            all_ids = batch.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            all_ids = np.unique(all_ids[all_ids % benchmark_mod != 0])
            flags = np.isin(all_ids, ids[hit]).astype(np.int64)
            return pa.table({
                "doc_id": pa.array(all_ids, pa.int64()),
                "contaminated": pa.array(flags, pa.int64()),
            })

        return docs.map_batches(mark, batch_format="pyarrow")

    fact = docs.map_batches(grams, batch_format="pyarrow",
                            fn_kwargs={"side_bench": False})
    def hit_flag(batch: pa.Table) -> pa.Table:
        # canonical (doc_id, hit=1) schema even for empty/schema-less
        # blocks out of the groupby
        if batch.num_rows and "doc_id" in batch.schema.names:
            hids = batch.column("doc_id").cast(pa.int64())
        else:
            hids = pa.array([], pa.int64())
        return pa.table({
            "doc_id": hids,
            "hit": pa.array(np.ones(len(hids), np.int64), pa.int64()),
        })

    hits = fact.join(bench_keys, join_type="inner",
                     num_partitions=join_parts, on=("gfp",)).groupby(
        "doc_id").count().map_batches(hit_flag, batch_format="pyarrow")

    def nonbench_zeros(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids[ids % benchmark_mod != 0].astype(np.int64)
        return pa.table({
            "doc_id": pa.array(keep, pa.int64()),
            "hit": pa.array(np.zeros(len(keep), np.int64), pa.int64()),
        })

    zeros = docs.map_batches(nonbench_zeros, batch_format="pyarrow")
    flags = zeros.union(hits).groupby("doc_id").aggregate(
        ray.data.aggregate.Max("hit"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "contaminated": batch.column("max(hit)").cast(pa.int64()),
        })

    return flags.map_batches(finish, batch_format="pyarrow")


# --- PII redaction --------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_redact_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, clean_text, n_emails, n_phones).

    Fully vectorized RE2 kernels (``pyarrow.compute`` regex = RE2, the
    same engine DuckDB's ``regexp_replace`` uses, so the oracle is
    exact): deterministic PII augmentation (docs with ``doc_id%7==0``
    gain an email, ``%11==0`` a phone number — the corpus itself is
    PII-free), then count + scrub both classes. Zero Python per row."""
    ids = batch.column("doc_id").cast(pa.int64())
    id_str = pc.cast(ids, pa.string())
    mod7 = pc.equal(pc.subtract(
        ids, pc.multiply(pc.divide(ids, 7), 7)), 0)
    mod11 = pc.equal(pc.subtract(
        ids, pc.multiply(pc.divide(ids, 11), 11)), 0)
    mail_sfx = pc.if_else(
        mod7,
        pc.binary_join_element_wise(
            pa.array([" contact u"] * len(batch)), id_str,
            pa.array(["@example.com now"] * len(batch)), ""),
        pa.array([""] * len(batch)))
    phone_sfx = pc.if_else(
        mod11, pa.array([" call 555-0142"] * len(batch)),
        pa.array([""] * len(batch)))
    text = pc.binary_join_element_wise(
        batch.column("text").cast(pa.string()), mail_sfx, phone_sfx, "")
    n_mail = pc.count_substring_regex(text, _EMAIL_RE).cast(pa.int64())
    clean = pc.replace_substring_regex(text, _EMAIL_RE, "<EMAIL>")
    n_phone = pc.count_substring_regex(clean, _PHONE_RE).cast(pa.int64())
    clean = pc.replace_substring_regex(clean, _PHONE_RE, "<PHONE>")
    return pa.table({
        "doc_id": ids,
        "clean_text": clean,
        "n_emails": n_mail,
        "n_phones": n_phone,
    })


# --- repetition-based quality (duplicate n-gram fraction) ----------------


def repetition_stats_batch(batch: pa.Table, *, width: int = 3,
                           dup_pct_cut: int = 20) -> pa.Table:
    """(doc_id, text) -> duplicate ``width``-gram stats per doc — the
    Gopher-style repetition quality signal, integer-exact: ``dup_pct``
    = ``100 * (n_grams - n_distinct) // n_grams`` (0 for gram-less
    docs); ``is_repetitive`` = 1 when ``dup_pct >= dup_pct_cut``."""
    texts = batch.column("text").to_pylist()
    n_g = np.zeros(len(texts), np.int64)
    n_d = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = tokenize(t)
        n = len(toks) - width + 1
        if n <= 0:
            continue
        n_g[i] = n
        n_d[i] = len({tuple(toks[j:j + width]) for j in range(n)})
    dup_pct = np.where(n_g > 0, 100 * (n_g - n_d) // np.maximum(n_g, 1),
                       0)
    return pa.table({
        "doc_id": batch.column("doc_id").cast(pa.int64()),
        "n_grams": pa.array(n_g, pa.int64()),
        "n_distinct": pa.array(n_d, pa.int64()),
        "dup_pct": pa.array(dup_pct, pa.int64()),
        "is_repetitive": pa.array(
            (dup_pct >= dup_pct_cut).astype(np.int64), pa.int64()),
    })


# --- cross-document repetition (duplicated-n-gram fraction) --------------


def cross_doc_gram_stats(docs: "ray.data.Dataset", *, width: int = 5
                         ) -> "ray.data.Dataset":
    """Per-document CROSS-corpus duplication signal (the Lee-et-al
    substring-dedup metric): for each doc, the count and percentage of
    its ``width``-token gram positions whose gram also occurs in at
    least one OTHER document.

    JOIN-FREE, SINGLE-TOKENIZE: a gram with document frequency 1 has
    ALL its occurrences in one document, so ``Min(doc_id)`` carried
    through the df aggregate identifies that owner and ``Sum(cnt)``
    its position count; per doc, ``n_shared = n_grams - n_unique``.
    That turns the natural gram-rows-join-shared-keys plan (an
    all-to-all hash join over the gram table) into one grouped
    aggregate plus a small assembly exchange:

    1. ONE tokenize pass emits, per doc, its per-doc-DEDUPED
       ``(doc_id, gfp, cnt, kind=0)`` gram rows (vectorized siphash
       fps — 8-byte fps shuffle, never gram text; the SQL oracle joins
       gram STRINGS, so agreement also certifies fp collision-freeness
       on the input) PLUS one ``kind=1`` total row carrying
       ``n_grams`` — materialized once, so the corpus is read and
       tokenized exactly once (a block-local gfp combiner was measured
       to dedupe <0.1% of gram rows — per-doc gram sets barely collide
       within a block — so gram rows go straight to the exchange);
    2. ``groupby(gfp).aggregate(Count, Sum(cnt), Min(doc_id))`` over
       the gram rows; df==1 rows collapse (batch-locally pre-summed)
       to per-doc unique-position counts;
    3. assembly: UNION of per-doc ``(n_grams, n_grams)`` totals with
       ``(0, -n_unique)`` unique rows -> ``groupby(doc_id).sum`` gives
       ``n_shared = n_grams - n_unique`` exactly.

    ``shared_pct`` is integer-exact: ``100 * n_shared // n_grams``
    (0 for gram-less docs).
    """
    from collections import Counter

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_id: list[int] = []
        out_g: list[str] = []
        out_c: list[int] = []
        tot_id: list[int] = []
        tot_n: list[int] = []
        for i, t in zip(ids, texts):
            toks = tokenize(t)
            n = max(len(toks) - width + 1, 0)
            tot_id.append(int(i))
            tot_n.append(n)
            if not n:
                continue
            c = Counter(" ".join(toks[j:j + width]) for j in range(n))
            out_id.extend([int(i)] * len(c))
            out_g.extend(c.keys())
            out_c.extend(c.values())
        fp = fp_strings64(out_g)
        return pa.table({
            "doc_id": pa.array(out_id + tot_id, pa.int64()),
            "gfp": pa.array(np.concatenate(
                (fp, np.zeros(len(tot_id), np.int64))), pa.int64()),
            "cnt": pa.array(out_c + tot_n, pa.int64()),
            "kind": pa.array([0] * len(out_id) + [1] * len(tot_id),
                             pa.int64()),
        })

    combined = docs.map_batches(
        emit, batch_format="pyarrow").materialize()

    def gram_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("kind"), 0))
        return t.select(["doc_id", "gfp", "cnt"])

    def total_side(batch: pa.Table) -> pa.Table:
        # n_shared starts at n_grams; unique_contrib rows subtract the
        # df==1 positions, leaving exactly the shared-position count
        t = batch.filter(pc.equal(batch.column("kind"), 1))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_grams": t.column("cnt"),
            "n_shared": t.column("cnt"),
        })

    gram_stats = combined.map_batches(
        gram_side, batch_format="pyarrow").groupby("gfp").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("cnt"),
        ray.data.aggregate.Min("doc_id"))

    def unique_contrib(batch: pa.Table) -> pa.Table:
        """df==1 grams -> per-doc (0, -n_unique) rows, batch-locally
        pre-summed so the assembly exchange carries per-doc partials."""
        if not batch.num_rows or "count()" not in batch.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "n_shared": pa.array([], pa.int64())})
        t = batch.filter(pc.equal(batch.column("count()"), 1))
        ids = t.column("min(doc_id)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cnt = t.column("sum(cnt)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, cnt)
        return pa.table({
            "doc_id": pa.array(uniq, pa.int64()),
            "n_grams": pa.array(np.zeros(len(uniq), np.int64),
                                pa.int64()),
            "n_shared": pa.array(-sums, pa.int64()),
        })

    uniques = gram_stats.map_batches(unique_contrib,
                                     batch_format="pyarrow")
    totals = combined.map_batches(total_side, batch_format="pyarrow")
    merged = totals.union(uniques).groupby("doc_id").aggregate(
        ray.data.aggregate.Sum("n_grams"),
        ray.data.aggregate.Sum("n_shared"))

    def finish(batch: pa.Table) -> pa.Table:
        ng = batch.column("sum(n_grams)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ns = batch.column("sum(n_shared)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pct = np.where(ng > 0, 100 * ns // np.maximum(ng, 1), 0)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_grams": pa.array(ng, pa.int64()),
            "n_shared": pa.array(ns, pa.int64()),
            "shared_pct": pa.array(pct, pa.int64()),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


# --- CCNet-style n-gram LM perplexity scoring ----------------------------


def ngram_lm_scores(docs: "ray.data.Dataset", *,
                    broadcast_limit: int = 5_000_000,
                    join_parts: int = 8) -> "ray.data.Dataset":
    """CCNet-style quality scoring: train an add-one-smoothed bigram LM
    on the corpus itself (one distributed count pass), then score every
    document with its bigram perplexity — the classic "how surprising
    is this text to a model of the corpus" curation signal
    (Wenzek et al. 2020, public; CCNet trains KenLM on Wikipedia, here
    the LM is the corpus's own bigram table so the operator is
    self-contained and exactly SQL-checkable).

    Model: ``P(t_i | t_{i-1}) = (c2(t_{i-1}, t_i) + 1) / (c1(t_{i-1})
    + V)`` with ``V`` = distinct-unigram count; per-doc ``ppl =
    exp(-mean ln P)`` over the doc's ``len - 1`` bigram positions
    (docs with < 2 tokens are skipped — no bigram positions to score).

    Scale shape:
    - TRAIN is one tokenize pass emitting map-side-combined ``(kind,
      fp, n)`` partial counts (kind 0 = unigram, 1 = bigram; fp =
      vectorized siphash of the token / "w1 w2" gram — only 8-byte
      fingerprints shuffle, never token text) folded by ONE
      ``groupby((kind, fp)).sum``; the count table is vocab-bounded,
      not corpus-bounded.
    - SCORE is size-adaptive (the house pattern): a count table within
      ``broadcast_limit`` ships once as sorted int64 arrays
      (per-worker cached) and every doc scores itself in ONE
      vectorized pass (searchsorted + np.add.reduceat per batch); a
      larger table falls back to a distributed inner join of per-doc
      (kind, fp, multiplicity) rows against the counts — exact because
      ``ll = sum(mult_bi * ln(c2+1)) - sum(mult_w1 * ln(c1+V))``
      separates per kind, so one join + one groupby(doc_id) suffices.
    - The DuckDB oracle joins on the gram STRINGS, so agreement also
      certifies the fp has no colliding pair on the input (same
      argument as :func:`decontaminate`).

    Returns (doc_id, n_bigrams, ppl) with ppl rounded to 4 decimals.
    """
    def _fp(strs: list[str]) -> np.ndarray:
        if not strs:
            return np.zeros(0, np.int64)
        return fp_strings64(strs)

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = tokenize(t)
            uni.update(toks)
            if len(toks) >= 2:
                bi.update(a + " " + b for a, b in zip(toks, toks[1:]))
        kinds = np.concatenate([np.zeros(len(uni), np.int64),
                                np.ones(len(bi), np.int64)])
        fps = np.concatenate([_fp(list(uni.keys())),
                              _fp(list(bi.keys()))])
        ns = np.fromiter(uni.values(), np.int64, len(uni))
        ns = np.concatenate([ns, np.fromiter(bi.values(), np.int64,
                                             len(bi))])
        return pa.table({"kind": pa.array(kinds, pa.int64()),
                         "fp": pa.array(fps, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    counts = docs.map_batches(
        count_partial, batch_format="pyarrow").groupby(
        ["kind", "fp"]).aggregate(ray.data.aggregate.Sum("n")
                                  ).materialize()

    def _kind0(batch: pa.Table) -> pa.Table:
        k = batch.column("kind").to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array([int((k == 0).sum())],
                                       pa.int64())})

    vocab = int(counts.map_batches(
        _kind0, batch_format="pyarrow").sum("v"))

    def doc_grams(batch: pa.Table):
        """Yield per-doc (ids, n_bigrams) plus flattened position fps."""
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        keep_ids: list[int] = []
        lens: list[int] = []
        bi_all: list[np.ndarray] = []
        w1_all: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            toks = tokenize(t)
            if len(toks) < 2:
                continue
            keep_ids.append(int(i))
            lens.append(len(toks) - 1)
            bi_all.append(_fp([a + " " + b
                               for a, b in zip(toks, toks[1:])]))
            w1_all.append(_fp(toks[:-1]))
        if keep_ids:
            return (np.asarray(keep_ids, np.int64),
                    np.asarray(lens, np.int64),
                    np.concatenate(bi_all), np.concatenate(w1_all))
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64), np.zeros(0, np.int64))

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_bigrams", pa.int64()),
                            ("ppl", pa.float64())])

    n_counts = counts.count()
    if n_counts <= broadcast_limit:
        parts = list(counts.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
        tbl = pa.concat_tables(parts)
        k = tbl.column("kind").to_numpy(zero_copy_only=False)
        f = tbl.column("fp").to_numpy(zero_copy_only=False)
        n = tbl.column("sum(n)").to_numpy(zero_copy_only=False)
        lm = {}
        for kind in (0, 1):
            m = k == kind
            order = np.argsort(f[m])
            lm[kind] = (f[m][order], n[m][order].astype(np.float64))
        lm_ref = ray.put((lm[0], lm[1], float(vocab)))

        def score(batch: pa.Table) -> pa.Table:
            (uf, un), (bf, bn), V = cached_get(lm_ref)
            ids, lens, bi, w1 = doc_grams(batch)
            if not len(ids):
                return out_schema.empty_table()
            # trained on the same corpus, every scored gram is present
            c2 = bn[np.searchsorted(bf, bi)]
            c1 = un[np.searchsorted(uf, w1)]
            terms = np.log((c2 + 1.0) / (c1 + V))
            offsets = np.concatenate(
                ([0], np.cumsum(lens[:-1]))).astype(np.int64)
            ll = np.add.reduceat(terms, offsets)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(lens, pa.int64()),
                "ppl": pa.array(np.round(np.exp(-ll / lens), 4),
                                pa.float64()),
            })

        return docs.map_batches(score, batch_format="pyarrow")

    # distributed path: per-doc (kind, fp, mult) rows join the counts
    def mult_rows(batch: pa.Table) -> pa.Table:
        ids, lens, bi, w1 = doc_grams(batch)
        out_id: list[np.ndarray] = []
        out_k: list[np.ndarray] = []
        out_f: list[np.ndarray] = []
        out_m: list[np.ndarray] = []
        pos = 0
        for i, ln_ in zip(ids, lens):
            for kind, arr in ((1, bi[pos:pos + ln_]),
                              (0, w1[pos:pos + ln_])):
                uniq, cnt = np.unique(arr, return_counts=True)
                out_id.append(np.full(len(uniq), i, np.int64))
                out_k.append(np.full(len(uniq), kind, np.int64))
                out_f.append(uniq)
                out_m.append(cnt.astype(np.int64))
            pos += ln_
        if not out_id:
            return pa.schema([("doc_id", pa.int64()),
                              ("kind", pa.int64()),
                              ("fp", pa.int64()),
                              ("mult", pa.int64())]).empty_table()
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "kind": pa.array(np.concatenate(out_k), pa.int64()),
            "fp": pa.array(np.concatenate(out_f), pa.int64()),
            "mult": pa.array(np.concatenate(out_m), pa.int64()),
        })

    fact = docs.map_batches(mult_rows, batch_format="pyarrow")
    joined = fact.join(counts, join_type="inner",
                       num_partitions=join_parts, on=("kind", "fp"))
    V = float(vocab)

    def term_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("kind").to_numpy(zero_copy_only=False)
        n = batch.column("sum(n)").to_numpy(
            zero_copy_only=False).astype(np.float64)
        m = batch.column("mult").to_numpy(
            zero_copy_only=False).astype(np.float64)
        term = np.where(k == 1, m * np.log(n + 1.0),
                        -m * np.log(n + V))
        nbi = np.where(k == 1, m, 0.0).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "term": pa.array(term, pa.float64()),
            "nbi": pa.array(nbi, pa.int64()),
        })

    sums = joined.map_batches(term_rows, batch_format="pyarrow").groupby(
        "doc_id").aggregate(ray.data.aggregate.Sum("term"),
                            ray.data.aggregate.Sum("nbi"))

    def finish(batch: pa.Table) -> pa.Table:
        ll = batch.column("sum(term)").to_numpy(zero_copy_only=False)
        nb = batch.column("sum(nbi)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_bigrams": pa.array(nb, pa.int64()),
            "ppl": pa.array(np.round(np.exp(-ll / nb), 4),
                            pa.float64()),
        })

    return sums.map_batches(finish, batch_format="pyarrow")


# --- DSIR-style importance weights ----------------------------------------

_DSIR_BUCKET_CACHE: dict[str, int] = {}


def _dsir_bucket(tok: str, n_buckets: int) -> int:
    """md5-low-32 hashing-trick bucket (the SQL oracle's
    ``('0x'||substr(md5(tok),1,8))::UBIGINT % B``); per-process memo —
    corpora repeat tokens heavily, so the md5 cost amortizes to one
    hash per distinct token per worker. The memo stores the RAW 32-bit
    hash (``% n_buckets`` applied at lookup) so two calls with
    different ``n_buckets`` in the same worker never alias."""
    h = _DSIR_BUCKET_CACHE.get(tok)
    if h is None:
        import hashlib

        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
        if len(_DSIR_BUCKET_CACHE) < 2_000_000:
            _DSIR_BUCKET_CACHE[tok] = h
    return h % n_buckets


def dsir_weights(docs: "ray.data.Dataset", target_lang: str = "en",
                 n_buckets: int = 1024) -> "ray.data.Dataset":
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hashed unigram
    bag-of-words models for the TARGET distribution (here: the
    ``target_lang`` slice of the corpus) and the RAW distribution (the
    whole corpus); each document's weight is

        logw(d) = sum_w [ ln p_tgt(b(w)) - ln p_raw(b(w)) ]

    with add-one smoothing over ``n_buckets`` hash buckets. Documents
    that look most target-like score highest; resampling then keeps
    docs proportional to exp(logw).

    Scale shape: ONE tokenize pass counts BOTH distributions
    (per-batch int64[B] partials, non-zero rows only), the bucket
    exchange is bounded by ``n_buckets`` (never vocabulary or corpus
    size), the per-bucket log-ratio vector (8 KiB at B=1024) is
    broadcast once via ``ray.put``, and the scoring pass streams.
    Output: (doc_id, dsir_logw) with logw rounded to 4 decimals (the
    float-sum-order tolerance contract shared with ngram_lm_scores)."""
    import math

    B = int(n_buckets)

    def count_partial(batch: pa.Table) -> pa.Table:
        raw = np.zeros(B, np.int64)
        tgt = np.zeros(B, np.int64)
        for lang, text in zip(batch.column("lang").to_pylist(),
                              batch.column("text").to_pylist()):
            is_t = lang == target_lang
            for tok in tokenize(text):
                b = _dsir_bucket(tok, B)
                raw[b] += 1
                if is_t:
                    tgt[b] += 1
        nz = np.nonzero(raw)[0]
        return pa.table({
            "bucket": pa.array(nz, pa.int64()),
            "n_raw": pa.array(raw[nz], pa.int64()),
            "n_tgt": pa.array(tgt[nz], pa.int64()),
        })

    hist = (docs.map_batches(count_partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(ray.data.aggregate.Sum("n_raw"),
                       ray.data.aggregate.Sum("n_tgt")))
    tbl = pa.concat_tables(list(hist.iter_batches(
        batch_format="pyarrow", batch_size=None)))  # <= B rows
    raw = np.zeros(B, np.int64)
    tgt = np.zeros(B, np.int64)
    idx = tbl.column("bucket").to_numpy(zero_copy_only=False)
    raw[idx] = tbl.column("sum(n_raw)").to_numpy(zero_copy_only=False)
    tgt[idx] = tbl.column("sum(n_tgt)").to_numpy(zero_copy_only=False)
    n_raw_total = int(raw.sum())
    n_tgt_total = int(tgt.sum())
    logratio = (np.log((tgt + 1.0) / (n_tgt_total + B))
                - np.log((raw + 1.0) / (n_raw_total + B)))
    lr_ref = ray.put(logratio)

    def score(batch: pa.Table) -> pa.Table:
        lr = cached_get(lr_ref)
        out = []
        for text in batch.column("text").to_pylist():
            toks = tokenize(text)
            bs = np.fromiter((_dsir_bucket(t, B) for t in toks),
                             np.int64, len(toks))
            out.append(round(float(lr[bs].sum()), 4))
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "dsir_logw": pa.array(out, pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")

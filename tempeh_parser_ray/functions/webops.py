"""Web-crawl curation ops: SURT canonicalization, robots.txt rules,
anchor-text aggregation, latest-capture (re-crawl) dedup.

The CDX/index side of a Common-Crawl-style pipeline: canonical sort
keys for the URL index (SURT), politeness filtering against per-domain
robots rules, link-anchor aggregation for the web graph, and
keep-newest-capture dedup across crawls. Everything is deterministic
and vectorized:

* SURT reversal/sorting runs as numpy permutations over the FLAT child
  arrays of Arrow list arrays (one ``take`` + ``binary_join`` per
  batch, no per-row Python);
* robots matching is one regex kernel per (host-group, rule) — rules
  per host are few, so the per-batch kernel count is bounded;
* anchor aggregation is two PURE aggregate exchanges (pair-count, then
  per-href rollup) — no join;
* latest-capture reuses the exact-dedup recovery shape (argmax instead
  of argmin): pure aggregate + size-adaptive broadcast / left_semi
  join winner pass.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .broadcast import cached_get
from .urls import _URL_RE

_I32MAX = 2**31 - 1


def _combined(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _join_reversed(la: pa.ListArray, sep: str) -> pa.Array:
    """Per-list reversal via one flat permutation + ``binary_join``."""
    offsets = la.offsets.to_numpy()
    counts = np.diff(offsets)
    if len(la.values) == 0:
        return pc.binary_join(la, sep)
    starts = np.repeat(offsets[:-1], counts)
    ends = np.repeat(offsets[1:], counts)
    perm = starts + (ends - 1 - np.arange(len(la.values)))
    rev = pa.ListArray.from_arrays(la.offsets, la.values.take(
        pa.array(perm, pa.int64())))
    return pc.binary_join(rev, sep)


def _join_sorted(la: pa.ListArray, sep: str) -> pa.Array:
    """Per-list lexicographic sort via one ``np.lexsort`` over (list
    id, value) + ``binary_join``."""
    offsets = la.offsets.to_numpy()
    counts = np.diff(offsets)
    if len(la.values) == 0:
        return pc.binary_join(la, sep)
    ids = np.repeat(np.arange(len(counts)), counts)
    vals = np.asarray(la.values.to_pylist(), dtype=object)
    order = np.lexsort((vals, ids))
    srt = pa.ListArray.from_arrays(la.offsets, la.values.take(
        pa.array(order, pa.int64())))
    return pc.binary_join(srt, sep)


def surt_batch(batch: pa.Table, url_col: str = "url",
               out_col: str = "surt") -> pa.Table:
    """Append the SURT canonical index key: lowercase, scheme and port
    dropped, leading ``www.`` stripped, host labels reversed and
    comma-joined, ``)`` separator, path, query params sorted.
    ``https://www.a.co.uk:81/P/x?b=2&a=1`` -> ``uk,co,a)/p/x?a=1&b=2``.
    Malformed URLs (no scheme-authority) canonicalize from empty
    host/path — never raised."""
    urls = _combined(batch.column(url_col))
    parts = pc.extract_regex(urls, _URL_RE)
    host = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "host"), ""))
    path = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "path"), ""))
    path = pc.if_else(pc.equal(path, ""), "/", path)
    query = pc.fill_null(pc.struct_field(parts, "query"), "")

    host = pc.if_else(
        pc.starts_with(host, "www."),
        pc.utf8_slice_codeunits(host, 4, _I32MAX), host)
    rev_host = _join_reversed(_combined(pc.split_pattern(host, ".")), ",")
    q_sorted = _join_sorted(_combined(pc.split_pattern(query, "&")), "&")
    q_suffix = pc.if_else(
        pc.equal(query, ""), "",
        pc.binary_join_element_wise("?", q_sorted, ""))
    surt = pc.binary_join_element_wise(rev_host, ")", path, q_suffix, "")
    return batch.append_column(out_col, surt)


# --- robots.txt -----------------------------------------------------------


def parse_robots(text: str, agent: str = "graftbot"
                 ) -> list[tuple[bool, str]]:
    """Parse robots.txt into the rule group applying to ``agent``:
    the exact-agent group when present, else the ``*`` group (standard
    group-selection rule). Returns ``[(allow, pattern), ...]``; empty
    patterns (``Disallow:`` = allow all) are dropped. Unknown fields
    and ``#`` comments are ignored; field names are case-insensitive."""
    agent = agent.lower()
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:  # a new group starts
                current = []
                in_rules = False
            name = value.lower()
            current.append(name)
            groups.setdefault(name, [])
        elif field in ("allow", "disallow"):
            in_rules = True
            if not value:
                continue
            for name in current:
                groups.setdefault(name, []).append(
                    (field == "allow", value))
    if agent in groups:
        return groups[agent]
    return groups.get("*", [])


def _rule_regex(pattern: str) -> str:
    """Robots pattern -> anchored regex: ``*`` matches anything
    (including ``/``); trailing ``$`` anchors the end."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(p) for p in body.split("*"))
    return rx + "$" if anchored else rx


def compile_rules(rules: list[tuple[bool, str]]
                  ) -> list[tuple[bool, int, str]]:
    """-> [(allow, specificity=len(pattern), regex)], for
    ``match_paths``. Kept as plain strings so the compiled set is
    cheaply picklable for ``ray.put`` broadcast."""
    return [(allow, len(pat), _rule_regex(pat)) for allow, pat in rules]


def match_paths(rules: list[tuple[bool, int, str]],
                paths: pa.Array) -> np.ndarray:
    """Vectorized allow/deny over a path array: one
    ``match_substring_regex`` kernel per rule; the most specific
    (longest-pattern) matching rule wins, Allow wins ties, no match =
    allowed (Google robots semantics)."""
    n = len(paths)
    best = np.full(n, -1, np.int64)  # specificity*2 + allow
    for allow, spec, rx in rules:
        hit = pc.match_substring_regex(paths, rx)
        hit_np = hit.to_numpy(zero_copy_only=False)
        hit_np = np.where(np.equal(hit_np, None), False,
                          hit_np).astype(bool)
        key = spec * 2 + (1 if allow else 0)
        upd = hit_np & (key > best)
        best[upd] = key
    return (best < 0) | (best % 2 == 1)


def robots_filter(frontier: "ray.data.Dataset",
                  robots_by_domain: "ray.data.Dataset",
                  domain_col: str = "registered_domain",
                  path_col: str = "path",
                  agent: str = "graftbot",
                  broadcast_limit: int = 1_000_000,
                  num_partitions: int = 16) -> "ray.data.Dataset":
    """Append ``allowed`` to ``frontier`` by matching each row's
    ``path`` against its domain's robots rules.

    ``robots_by_domain`` carries ``(domain_col, robots_txt)`` — one row
    per registered domain (how a crawler actually stores fetched
    robots). Size-adaptive: below ``broadcast_limit`` domains the
    compiled rule map broadcasts once via ``ray.put`` and matching is
    per-(host-group, rule) regex kernels; above it, rules explode to
    one row per (domain, rule) and a distributed hash join +
    groupby(argmax specificity) keeps the rule set off the driver
    (the 10^8-domain path). Both paths are pinned equal by pytest."""
    n_domains = robots_by_domain.count()
    if n_domains <= broadcast_limit:
        rule_map: dict[str, list] = {}
        for b in robots_by_domain.iter_batches(batch_format="pyarrow",
                                               batch_size=None):
            for d, t in zip(b.column(domain_col).to_pylist(),
                            b.column("robots_txt").to_pylist()):
                rule_map[d] = compile_rules(parse_robots(t or "", agent))
        map_ref = ray.put(rule_map)

        def allowed_batch(batch: pa.Table) -> pa.Table:
            rm = cached_get(map_ref)
            doms = batch.column(domain_col).to_pylist()
            paths = _combined(batch.column(path_col))
            out = np.ones(batch.num_rows, bool)
            # group rows by domain so each rule kernel runs once per
            # (domain, rule) over a contiguous slice
            order = np.argsort(np.asarray(doms, dtype=object),
                               kind="stable")
            sorted_doms = [doms[i] for i in order]
            i = 0
            while i < len(order):
                j = i
                while j < len(order) and sorted_doms[j] == sorted_doms[i]:
                    j += 1
                rules = rm.get(sorted_doms[i], [])
                if rules:
                    idx = pa.array(order[i:j], pa.int64())
                    out[order[i:j]] = match_paths(rules, paths.take(idx))
                i = j
            return batch.append_column("allowed", pa.array(out))

        return frontier.map_batches(allowed_batch, batch_format="pyarrow")

    # distributed path: one row per (domain, rule), hash join, argmax
    def explode(batch: pa.Table) -> pa.Table:
        doms, allows, specs, rxs = [], [], [], []
        for d, t in zip(batch.column(domain_col).to_pylist(),
                        batch.column("robots_txt").to_pylist()):
            for allow, spec, rx in compile_rules(parse_robots(t or "",
                                                              agent)):
                doms.append(d)
                allows.append(allow)
                specs.append(spec)
                rxs.append(rx)
        return pa.table({
            domain_col: pa.array(doms, pa.string()),
            "_allow": pa.array(allows, pa.bool_()),
            "_spec": pa.array(specs, pa.int64()),
            "_rx": pa.array(rxs, pa.string())})

    rules_ds = robots_by_domain.map_batches(explode, batch_format="pyarrow")
    # Dedup-with-count BEFORE the rules join so (a) exact-duplicate
    # frontier rows survive to the output (re-expanded in finish —
    # same one-row-per-input contract as the broadcast path) and
    # (b) the join fans out once per DISTINCT row, not per duplicate.
    carry = list(frontier.schema().names)
    counted = frontier.groupby(carry).aggregate(
        ray.data.aggregate.Count())
    joined = counted.join(rules_ds, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=(domain_col,))

    def score(batch: pa.Table) -> pa.Table:
        paths = _combined(batch.column(path_col))
        rxs = batch.column("_rx").to_pylist()
        specs = batch.column("_spec").to_pylist()
        allows = batch.column("_allow").to_pylist()
        keys = np.full(batch.num_rows, -1, np.int64)
        for i, rx in enumerate(rxs):
            if rx is None:
                continue
            m = re.match(rx, paths[i].as_py() or "")
            if m:
                keys[i] = specs[i] * 2 + (1 if allows[i] else 0)
        t = batch.drop_columns(["_rx", "_spec", "_allow"])
        return t.append_column("_key", pa.array(keys, pa.int64()))

    scored = joined.map_batches(score, batch_format="pyarrow")
    agg = scored.groupby(carry + ["count()"]).aggregate(
        ray.data.aggregate.Max("_key"))

    def finish(batch: pa.Table) -> pa.Table:
        k = batch.column("max(_key)")
        allowed = pc.or_(pc.less(k, 0),
                         pc.equal(pc.bit_wise_and(k, 1), 1))
        t = batch.drop_columns(["max(_key)"]).append_column(
            "allowed", allowed)
        reps = t.column("count()").to_numpy(zero_copy_only=False)
        t = t.drop_columns(["count()"])
        if (reps == 1).all():
            return t
        return t.take(pa.array(
            np.repeat(np.arange(len(reps)), reps), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


# --- anchor-text aggregation ----------------------------------------------


def anchor_index(links: "ray.data.Dataset", href_col: str = "href",
                 anchor_col: str = "anchor") -> "ray.data.Dataset":
    """Per-target link-anchor rollup: ``(href, n_refs,
    n_distinct_anchors, top_anchor)`` where ``top_anchor`` is the
    lexicographically smallest anchor (deterministic tie-free choice).

    Two PURE aggregate exchanges, no join: pair-count by
    (href, anchor), then per-href Sum / Count / Min — both map-side
    combinable, so only pre-combined partials shuffle (the web-graph
    anchor index at 10^12 edges is exactly this shape)."""
    pairs = links.groupby([href_col, anchor_col]).aggregate(
        ray.data.aggregate.Count())
    agg = pairs.groupby(href_col).aggregate(
        ray.data.aggregate.Sum("count()"),
        ray.data.aggregate.Count(),
        ray.data.aggregate.Min(anchor_col))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            href_col: batch.column(href_col),
            "n_refs": batch.column("sum(count())").cast(pa.int64()),
            "n_distinct_anchors": batch.column("count()").cast(pa.int64()),
            "top_anchor": batch.column(f"min({anchor_col})"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# --- latest-capture (re-crawl) dedup ---------------------------------------


def keep_latest(ds: "ray.data.Dataset", key: str = "url",
                ts_col: str = "warc_ts",
                num_partitions: int = 16,
                broadcast_limit: int = 5_000_000) -> "ray.data.Dataset":
    """Keep the newest capture per ``key`` — the CDX keep-latest dedup
    across crawls. Mirror image of ``dedup.exact_dedup`` (argmax on a
    monotone int64 of the timestamp instead of argmin on id): one pure
    ``groupby(key).aggregate(Max)`` exchange, then size-adaptive winner
    recovery (broadcast map below ``broadcast_limit`` keys, left_semi
    hash join above). Ties on (key, ts) keep all tied rows — callers
    wanting one row add a second tie-break column to ``ts_col``."""
    ds = ds.map_batches(
        lambda b, c=ts_col: b.append_column(
            "_ts", _combined(b.column(c)).cast(pa.int64())),
        batch_format="pyarrow")
    winners = ds.groupby(key).aggregate(
        ray.data.aggregate.Max("_ts")).materialize()

    if winners.count() <= broadcast_limit:
        win_map: dict = {}
        for b in winners.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
            win_map.update(zip(b.column(key).to_pylist(),
                               b.column("max(_ts)").to_pylist()))
        map_ref = ray.put(win_map)

        def keep(batch: pa.Table) -> pa.Table:
            wm = cached_get(map_ref)
            ks = batch.column(key).to_pylist()
            ts = batch.column("_ts").to_pylist()
            return batch.filter(pa.array(
                [wm.get(k) == t for k, t in zip(ks, ts)]))

        out = ds.map_batches(keep, batch_format="pyarrow")
    else:
        keys = winners.map_batches(
            lambda b: pa.table({key: b.column(key),
                                "_ts": b.column("max(_ts)")}),
            batch_format="pyarrow")
        out = ds.join(keys, join_type="left_semi",
                      num_partitions=num_partitions, on=(key, "_ts"))
    return out.drop_columns(["_ts"])


def fetch_slots(frontier: "ray.data.Dataset", *,
                host_col: str = "host", id_col: str = "doc_id",
                bucket_size: int = 65_536) -> "ray.data.Dataset":
    """Crawl-politeness scheduling: assign each frontier URL its
    per-host FETCH SLOT — the url's rank within its host under
    ``id_col`` order. With one request per host per scheduler wave,
    the slot IS the wave number, so a downstream fetcher groups by
    ``slot`` and never hits a host twice in one wave.

    A per-host rank is a windowed count, so this reuses the
    time-bucketed prefix-carry shape (``windows.running_total_events``)
    keyed by host — no group ever holds one host's full url list:

    1. per-``(host, bucket = id // bucket_size)`` counts: ONE pure
       aggregate, O(1) state, map-side combined;
    2. per-host pass over the bounded populated-bucket list emits one
       exclusive-prefix OFFSET carry row per later bucket;
    3. regroup urls + carries by ``(host, bucket)``: each bucket sorts
       its own ids and adds the carried offset — per-group state is
       ``bucket_size`` rows max, even for a 10^9-url host.
    """
    from .dedup import collect_columns_agg

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).cast(pa.int64())
        bucket = pc.divide(ids, bucket_size).cast(pa.int64())
        return pa.table({
            host_col: batch.column(host_col),
            "bucket": bucket,
            id_col: ids,
            "is_carry": pa.array(
                np.zeros(batch.num_rows, np.int64), pa.int64())})

    proj = frontier.map_batches(project, batch_format="pyarrow")

    counts = proj.map_batches(
        lambda b: b.select([host_col, "bucket"]),
        batch_format="pyarrow").groupby(
        [host_col, "bucket"]).count()

    per_host = counts.map_batches(
        lambda b: pa.table({
            host_col: b.column(host_col),
            "bucket": b.column("bucket"),
            "n": b.column("count()").cast(pa.int64())}),
        batch_format="pyarrow").groupby(host_col).aggregate(
        collect_columns_agg(["bucket", "n"], "meta"))

    def offsets(batch: pa.Table) -> pa.Table:
        out_h: list[str] = []
        out_b: list[int] = []
        out_off: list[int] = []
        for host, rows in zip(batch.column(host_col).to_pylist(),
                              batch.column("meta").to_pylist()):
            arr = np.asarray(rows, dtype=np.int64)
            arr = arr[np.argsort(arr[:, 0], kind="stable")]
            pref = 0
            for k in range(1, len(arr)):
                pref += int(arr[k - 1, 1])
                out_h.append(host)
                out_b.append(int(arr[k, 0]))
                out_off.append(pref)
        n = len(out_h)
        return pa.table({
            host_col: pa.array(out_h, pa.string()),
            "bucket": pa.array(out_b, pa.int64()),
            id_col: pa.array(out_off, pa.int64()),
            "is_carry": pa.array([1] * n, pa.int64())})

    carries = per_host.map_batches(offsets, batch_format="pyarrow")

    grouped = proj.union(carries).groupby(
        [host_col, "bucket"]).aggregate(
        collect_columns_agg([id_col, "is_carry"], "rows"))

    def resolve(batch: pa.Table) -> pa.Table:
        out_h: list[str] = []
        out_id: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for host, rows in zip(batch.column(host_col).to_pylist(),
                              batch.column("rows").to_pylist()):
            arr = np.asarray(rows, dtype=np.int64)
            carry = arr[:, 1].astype(bool)
            offset = int(arr[carry, 0].sum())  # 0 or 1 carry rows
            ids = np.sort(arr[~carry, 0])
            out_h.extend([host] * len(ids))
            out_id.append(ids)
            out_s.append(offset + np.arange(len(ids), dtype=np.int64))
        if not out_id:
            z = np.zeros(0, np.int64)
            out_id = out_s = [z]
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            host_col: pa.array(out_h, pa.string()),
            "slot": pa.array(np.concatenate(out_s), pa.int64())})

    return grouped.map_batches(resolve, batch_format="pyarrow")

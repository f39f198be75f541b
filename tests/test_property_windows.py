"""Property-based (hypothesis) checks: the distributed temporal/sketch
operators must equal brute-force single-machine models on arbitrary
small inputs. Few examples, session-scoped Ray — each example runs
real Dataset pipelines."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tempeh_parser_ray.functions import dedup, sketches
from tempeh_parser_ray.pipelines import windows

_SET = settings(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def _collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return pa.schema([]).empty_table()
    return pa.concat_tables(parts)


MIN = 60_000_000

events_strategy = st.lists(
    st.tuples(st.integers(0, 3),                 # user
              st.integers(0, 5000)),             # minutes since epoch
    min_size=1, max_size=60)


@given(events_strategy)
@_SET
def test_salted_sessionization_equals_global_gap_split(ray_session, evs):
    ray = ray_session
    gap = 30 * MIN
    tbl = pa.table({
        "user_id": pa.array([u for u, _ in evs], pa.int64()),
        "ts": pa.array([m * MIN for _, m in evs], pa.int64()).cast(
            pa.timestamp("us")),
    })
    got = _collect(windows.sessionize_salted(
        ray.data.from_arrow(tbl), gap_us=gap)).to_pylist()

    # brute force: global sort per user, split at gap
    expect = []
    for u in sorted({u for u, _ in evs}):
        ts = sorted(m * MIN for uu, m in evs if uu == u)
        sessions = [[ts[0], ts[0], 1]]
        for t in ts[1:]:
            if t - sessions[-1][1] > gap:
                sessions.append([t, t, 1])
            else:
                sessions[-1][1] = t
                sessions[-1][2] += 1
        for i, (s, e, n) in enumerate(sessions):
            expect.append((u, i, n, s, e))
    import datetime
    epoch = datetime.datetime(1970, 1, 1)

    def us(v):  # tz-safe naive-datetime -> epoch micros
        return int((v - epoch).total_seconds() * 1e6) \
            if isinstance(v, datetime.datetime) else int(v)

    got_t = [(r["user_id"], r["session_idx"], r["n_events"],
              us(r["start_ts"]), us(r["end_ts"])) for r in got]
    assert sorted(got_t) == sorted(expect)


asof_strategy = st.lists(
    st.tuples(st.integers(0, 2),                 # user
              st.integers(0, 200),               # ts units
              st.booleans()),                    # is purchase (else click)
    min_size=1, max_size=40)


@given(asof_strategy)
@_SET
def test_asof_equals_bruteforce(ray_session, evs):
    ray = ray_session
    rows = [(i, u, t * MIN, "purchase" if p else "click", 0.0)
            for i, (u, t, p) in enumerate(evs)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    got = {r["event_id"]: r["prior_event_id"]
           for r in _collect(windows.asof_last_event(
               ray.data.from_arrow(tbl), left_type="purchase",
               right_type="click")).to_pylist()}

    purchases = [r for r in rows if r[3] == "purchase"]
    clicks = [r for r in rows if r[3] == "click"]
    assert set(got) == {p[0] for p in purchases}
    for pid, pu, pts, _, _ in purchases:
        cands = [(c[2], c[0]) for c in clicks
                 if c[1] == pu and c[2] <= pts]
        expect = max(cands)[1] if cands else None
        assert got[pid] == expect, (pid, got[pid], expect)


range_strategy = st.lists(
    st.tuples(st.integers(0, 2),                 # user
              st.integers(0, 200),               # ts units (minutes)
              st.booleans(),                     # is purchase (else click)
              st.integers(0, 50)),               # value (scaled)
    min_size=1, max_size=40)


@given(range_strategy)
@_SET
def test_range_join_equals_bruteforce(ray_session, evs):
    """Bucketed range join == brute-force window scan, with a bucket
    width (1 h) small enough that ghosts are exercised (window == the
    1 h bucket)."""
    ray = ray_session
    HOUR = 60 * MIN
    rows = [(i, u, t * MIN, "purchase" if p else "click", v / 4.0)
            for i, (u, t, p, v) in enumerate(evs)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    got = {r["event_id"]: (r["n_right"], r["sum_right_micros"])
           for r in _collect(windows.range_join_events(
               ray.data.from_arrow(tbl), left_type="purchase",
               right_type="click", window_us=HOUR,
               bucket_us=HOUR)).to_pylist()}

    purchases = [r for r in rows if r[3] == "purchase"]
    clicks = [r for r in rows if r[3] == "click"]
    assert set(got) == {p[0] for p in purchases}
    for pid, pu, pts, _, _ in purchases:
        sel = [c for c in clicks
               if c[1] == pu and pts - HOUR <= c[2] <= pts]
        expect = (len(sel), sum(round(c[4] * 1e6) for c in sel))
        assert got[pid] == expect, (pid, got[pid], expect)


pairs_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=0, max_size=25)


@given(pairs_strategy)
@_SET
def test_keep_canonical_equals_bruteforce_components(ray_session, edges):
    ray = ray_session
    edges = [(a, b) for a, b in edges if a != b]
    nodes = list(range(16))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(nodes, pa.int64()),
        "text": pa.array([str(n) for n in nodes], pa.string())}))
    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64())}))
    kept = sorted(_collect(dedup.keep_canonical(docs, pairs))
                  .column("doc_id").to_pylist()) if edges else nodes

    # brute force: connected components via repeated expansion
    comp = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            merged = comp[a] | comp[b]
            for m in merged:
                if comp[m] != merged:
                    comp[m] = merged
                    changed = True
    expect = sorted({min(comp[n]) for n in nodes})
    assert kept == expect


counts_strategy = st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    st.integers(1, 100), min_size=0, max_size=40)


@given(counts_strategy)
@_SET
def test_cms_upper_bound_property(counts):
    sk = sketches.cms_from_counts(counts)
    toks = list(counts)
    est = sketches.cms_estimate(sk, toks)
    for t, e in zip(toks, est):
        assert int(e) >= counts[t]


def test_partition_invariance(ray_session):
    """Representative operators must produce IDENTICAL results whatever
    the block layout — the property that makes single-node runs
    transfer to a 256-node cluster."""
    import pyarrow.parquet as pq
    ray = ray_session
    docs_tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    ev_tbl = pq.read_table("/root/testdata/sf0.001/events.parquet")

    def docs(n):
        return ray.data.from_arrow(docs_tbl).repartition(n)

    def evs(n):
        return ray.data.from_arrow(ev_tbl).repartition(n)

    # grouped histogram quantiles
    a = sketches.grouped_quantiles(docs(1), "lang", "n_chars",
                                   [0.5, 0.99], ["p50", "p99"])
    b = sketches.grouped_quantiles(docs(16), "lang", "n_chars",
                                   [0.5, 0.99], ["p50", "p99"])
    assert a.to_pylist() == b.to_pylist()

    # heavy hitters (CMS prefilter + exact verify)
    ha = sketches.heavy_hitter_tokens(docs(1), "text", divisor=100)
    hb = sketches.heavy_hitter_tokens(docs(8), "text", divisor=100)
    assert ha.to_pylist() == hb.to_pylist()

    # as-of join
    def asof_pairs(n):
        t = _collect(windows.asof_last_event(
            evs(n), left_type="purchase", right_type="click"))
        return sorted((r["event_id"], r["prior_event_id"])
                      for r in t.to_pylist())
    assert asof_pairs(1) == asof_pairs(7)

    # range join
    def range_rows(n):
        t = _collect(windows.range_join_events(
            evs(n), left_type="purchase", right_type="click",
            window_us=3_600_000_000))
        return sorted((r["event_id"], r["n_right"],
                       r["sum_right_micros"]) for r in t.to_pylist())
    assert range_rows(1) == range_rows(7)

    # MinHash candidate + verify pipeline
    def pairs(n):
        ds = docs(n)
        cands = dedup.minhash_lsh_candidates(
            ds, num_perm=64, bands=16, shingle_k=5, concurrency=(1, 2))
        v = _collect(dedup.verify_pairs_jaccard(cands, ds,
                                                threshold=0.5))
        return sorted(zip(v.column("id_a").to_pylist(),
                          v.column("id_b").to_pylist()))
    assert pairs(2) == pairs(16)


def test_partition_invariance_round3(ray_session):
    """Block-layout invariance for the round-3 operators: LAG window,
    Bloom incremental dedup, and sequence packing."""
    import pyarrow.parquet as pq

    from tempeh_parser_ray.functions import curation, incremental

    ray = ray_session
    docs_tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id", "text"])
    ev_tbl = pq.read_table("/root/testdata/sf0.001/events.parquet",
                           columns=["event_id", "user_id", "ts"])

    def docs(n):
        return ray.data.from_arrow(docs_tbl).repartition(n)

    def evs(n):
        return ray.data.from_arrow(ev_tbl).repartition(n)

    def lag_rows(n):
        t = _collect(windows.lag_events(evs(n)))
        return sorted((r["event_id"], r["prev_event_id"], r["gap_us"])
                      for r in t.to_pylist())
    assert lag_rows(1) == lag_rows(7)

    def inc_rows(n):
        snap = docs(n)
        t = _collect(incremental.incremental_dedup(
            snap, docs(max(1, n // 2)), m_bits=1 << 16, k=4,
            join_parts=2))
        return sorted((r["doc_id"], r["is_dup"]) for r in t.to_pylist())
    # snapshot == incoming -> every incoming doc is a dup; layout-free
    ra, rb = inc_rows(1), inc_rows(6)
    assert ra == rb
    assert all(f == 1 for _, f in ra)

    def pack_rows(n):
        t = _collect(curation.sequence_packing(docs(n), capacity=512,
                                               bucket_size=64))
        return sorted((r["doc_id"], r["chunk_id"], r["chunk_offset"])
                      for r in t.to_pylist())
    assert pack_rows(1) == pack_rows(9)

    def lead_rows(n):
        t = _collect(windows.lead_events(evs(n)))
        return sorted((r["event_id"], r["next_event_id"], r["gap_us"])
                      for r in t.to_pylist())
    assert lead_rows(1) == lead_rows(7)

    def sdu_rows(n):
        t = windows.sliding_distinct_users(evs(n))
        return list(map(tuple, t.to_pylist()))
    assert sdu_rows(1) == sdu_rows(7)


lag_strategy = st.lists(
    st.tuples(st.integers(0, 2),                 # user
              st.integers(0, 200)),              # ts units (minutes)
    min_size=1, max_size=40)


@given(lag_strategy)
@_SET
def test_lag_equals_bruteforce(ray_session, evs):
    """lag_events vs a brute-force LAG OVER (PARTITION BY user ORDER BY
    ts, event_id) — random small streams, including ts ties (ordered by
    event_id) and multi-bucket spans (1-min units vs 1-day buckets use
    small bucket_us here to force carries)."""
    ray = ray_session
    rows = [(i, u, t * MIN) for i, (u, t) in enumerate(evs)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
    })
    got = {r["event_id"]: (r["prev_event_id"], r["gap_us"])
           for r in _collect(windows.lag_events(
               ray.data.from_arrow(tbl),
               bucket_us=30 * MIN)).to_pylist()}
    assert set(got) == {r[0] for r in rows}
    for eid, u, ts in rows:
        prior = [(r[2], r[0]) for r in rows
                 if r[1] == u and (r[2], r[0]) < (ts, eid)]
        if prior:
            pts, pid = max(prior)
            assert got[eid] == (pid, ts - pts), (eid, got[eid])
        else:
            assert got[eid] == (None, None), (eid, got[eid])


@given(lag_strategy)
@_SET
def test_lead_equals_bruteforce(ray_session, evs):
    """lead_events (sign-symmetric LAG reuse) vs brute-force LEAD OVER
    (PARTITION BY user ORDER BY ts, event_id) — the negation must
    preserve tie-breaks and bucket-carry behavior exactly."""
    ray = ray_session
    rows = [(i, u, t * MIN) for i, (u, t) in enumerate(evs)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
    })
    got = {r["event_id"]: (r["next_event_id"], r["gap_us"])
           for r in _collect(windows.lead_events(
               ray.data.from_arrow(tbl),
               bucket_us=30 * MIN)).to_pylist()}
    assert set(got) == {r[0] for r in rows}
    for eid, u, ts in rows:
        later = [(r[2], r[0]) for r in rows
                 if r[1] == u and (r[2], r[0]) > (ts, eid)]
        if later:
            nts, nid = min(later)
            assert got[eid] == (nid, nts - ts), (eid, got[eid])
        else:
            assert got[eid] == (None, None), (eid, got[eid])

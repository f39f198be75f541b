"""Temporal operators (as-of join, sliding windows) and sketch
operators (histogram quantiles, HyperLogLog) — semantic checks against
hand-computed and DuckDB-computed expectations."""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
import pyarrow as pa

from tempeh_parser_ray.functions import sketches
from tempeh_parser_ray.pipelines import windows

SF_DIR = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return pa.schema([]).empty_table()
    return pa.concat_tables(parts)


def _events_tbl(rows) -> pa.Table:
    """rows: (event_id, user_id, ts_us, event_type, value)"""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })


def test_asof_matches_latest_prior_with_tie_break(ray_session):
    ray = ray_session
    US = 1_000_000
    rows = [
        # user 1: clicks at t=10 (ids 100,101 tie on ts) and t=50;
        # purchases at t=5 (no prior), t=10 (ties), t=60
        (100, 1, 10 * US, "click", 0.0),
        (101, 1, 10 * US, "click", 0.0),
        (102, 1, 50 * US, "click", 0.0),
        (200, 1, 5 * US, "purchase", 1.0),
        (201, 1, 10 * US, "purchase", 1.0),
        (202, 1, 60 * US, "purchase", 1.0),
        # user 2: purchase with no clicks at all
        (300, 2, 30 * US, "purchase", 1.0),
        # noise types are ignored
        (400, 1, 55 * US, "view", 0.0),
    ]
    out = _collect(windows.asof_last_event(
        ray.data.from_arrow(_events_tbl(rows)),
        left_type="purchase", right_type="click"))
    by_id = {r["event_id"]: r for r in out.to_pylist()}
    assert set(by_id) == {200, 201, 202, 300}
    assert by_id[200]["prior_event_id"] is None
    # tie at ts=10: larger event_id (101) wins
    assert by_id[201]["prior_event_id"] == 101
    assert by_id[202]["prior_event_id"] == 102
    assert by_id[300]["prior_event_id"] is None


def test_asof_bucketed_boundary_crossing(ray_session):
    """One user spanning many time buckets: matches must cross bucket
    boundaries (prior in the immediately-previous bucket AND in a
    bucket several empty buckets back), with per-group state bounded
    by one bucket's events. bucket_us=60s forces many buckets."""
    ray = ray_session
    US = 1_000_000
    BUCKET = 60 * US  # 1-minute buckets
    rows = [
        # bucket 0: click at t=10, purchase at t=20 (in-bucket match)
        (1, 7, 10 * US, "click", 0.0),
        (2, 7, 20 * US, "purchase", 1.0),
        # bucket 1: purchase at t=70 -> prior is bucket-0 click (id 1)
        (3, 7, 70 * US, "purchase", 1.0),
        # bucket 2: click at t=130 (tail of bucket 2)
        (4, 7, 130 * US, "click", 0.0),
        # buckets 3-9 empty; bucket 10: purchase at t=610 -> must reach
        # back EIGHT buckets to the bucket-2 click (id 4)
        (5, 7, 610 * US, "purchase", 1.0),
        # bucket 11: purchase before any click in its bucket, click
        # later in the same bucket must NOT match (ts > left.ts)
        (6, 7, 665 * US, "purchase", 1.0),
        (7, 7, 670 * US, "click", 0.0),
        # bucket 12: purchase at t=730 -> prior is bucket-11 click
        (8, 7, 730 * US, "purchase", 1.0),
        # a second user interleaved everywhere, no clicks at all
        (20, 8, 15 * US, "purchase", 1.0),
        (21, 8, 615 * US, "purchase", 1.0),
    ]
    out = _collect(windows.asof_last_event(
        ray.data.from_arrow(_events_tbl(rows)).repartition(4),
        left_type="purchase", right_type="click", bucket_us=BUCKET))
    by_id = {r["event_id"]: r for r in out.to_pylist()}
    assert set(by_id) == {2, 3, 5, 6, 8, 20, 21}
    assert by_id[2]["prior_event_id"] == 1     # in-bucket
    assert by_id[3]["prior_event_id"] == 1     # previous bucket's tail
    assert by_id[5]["prior_event_id"] == 4     # 8 buckets back
    assert by_id[6]["prior_event_id"] == 4     # carry beats later click
    assert by_id[8]["prior_event_id"] == 7     # boundary-crossing match
    assert by_id[20]["prior_event_id"] is None
    assert by_id[21]["prior_event_id"] is None
    # prior_ts rides along with prior_event_id
    import datetime
    assert by_id[5]["prior_ts"] == datetime.datetime(1970, 1, 1) + \
        datetime.timedelta(microseconds=130 * US)


def test_asof_bucket_width_invariance(ray_session):
    """The result must not depend on the bucket width (1 min vs 1 day
    vs default) — same rows, different carry paths."""
    ray = ray_session
    US = 1_000_000
    rng = np.random.RandomState(5)
    rows = []
    for eid in range(120):
        rows.append((eid, int(rng.randint(0, 4)),
                     int(rng.randint(0, 5000)) * 60 * US,
                     "purchase" if rng.rand() < 0.5 else "click", 0.0))

    def run(bucket_us):
        t = _collect(windows.asof_last_event(
            ray.data.from_arrow(_events_tbl(rows)).repartition(3),
            left_type="purchase", right_type="click",
            bucket_us=bucket_us))
        return sorted(map(tuple, (
            (r["event_id"], r["prior_event_id"]) for r in t.to_pylist())))

    assert run(60 * US) == run(windows.DAY_US) == run(3600 * US)


def test_sliding_hourly_range_semantics_with_gaps(ray_session):
    ray = ray_session
    H = 3_600_000_000
    # type 'a': hours 0,1,2,5 (gap at 3-4); one event per hour, value=1.0
    rows = [(i, 1, h * H, "a", 1.0) for i, h in enumerate([0, 1, 2, 5])]
    out = windows.sliding_hourly(
        ray.data.from_arrow(_events_tbl(rows)), window_hours=3)
    epoch = __import__("datetime").datetime(1970, 1, 1)
    # tz-safe: subtract the naive epoch instead of .timestamp(), which
    # would interpret the naive datetime in the machine's local zone
    got = {int((r["window_start"] - epoch).total_seconds() // 3600):
           r["n_events_3h"] for r in out.to_pylist()}
    # RANGE window: hour 5 only sees hours 3-5 -> itself
    assert got == {0: 1, 1: 2, 2: 3, 5: 1}


def test_sliding_hourly_matches_duckdb_window(ray_session):
    import duckdb
    ray = ray_session
    ev_path = str(Path(SF_DIR) / "events.parquet")
    mine = windows.sliding_hourly(
        ray.data.read_parquet(ev_path), window_hours=3).to_pandas()
    ora = duckdb.sql(f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n,
                   SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS s
            FROM read_parquet('{ev_path}') GROUP BY 1, 2)
        SELECT event_type, window_start,
               CAST(SUM(n) OVER w AS BIGINT) AS n_events_3h,
               CAST(SUM(s) OVER w AS BIGINT) AS sum_value_micros_3h
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY window_start
                     RANGE BETWEEN INTERVAL 2 HOURS PRECEDING
                           AND CURRENT ROW)
        ORDER BY event_type, window_start
    """).df()
    mine = mine.sort_values(["event_type", "window_start"]).reset_index(
        drop=True)
    ora = ora.sort_values(["event_type", "window_start"]).reset_index(
        drop=True)
    assert (mine["n_events_3h"] == ora["n_events_3h"]).all()
    assert (mine["sum_value_micros_3h"]
            == ora["sum_value_micros_3h"]).all()


def test_grouped_quantiles_match_brute_force(ray_session):
    ray = ray_session
    rng = np.random.RandomState(7)
    groups = rng.choice(["x", "y"], size=500).tolist()
    vals = rng.randint(0, 100, size=500).tolist()
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(groups, pa.string()),
        "v": pa.array(vals, pa.int64())}))
    out = sketches.grouped_quantiles(ds, "g", "v", [0.5, 0.9],
                                     ["p50", "p90"])
    got = {r["g"]: (r["p50"], r["p90"]) for r in out.to_pylist()}
    for g in ("x", "y"):
        s = sorted(v for gg, v in zip(groups, vals) if gg == g)
        expect = tuple(s[max(math.ceil(q * len(s)) - 1, 0)]
                       for q in (0.5, 0.9))
        assert got[g] == expect


def test_hll_within_error_bound_of_exact(ray_session):
    ray = ray_session
    docs = str(Path(SF_DIR) / "documents.parquet")
    ds = ray.data.read_parquet(docs)
    est = sketches.grouped_hll_distinct(ds, "lang", "text")
    import duckdb
    exact = duckdb.sql(f"""
        SELECT lang, COUNT(DISTINCT token) AS n FROM (
            SELECT lang, unnest(string_split_regex(trim(text), '\\s+'))
                   AS token
            FROM read_parquet('{docs}') WHERE trim(text) <> '')
        GROUP BY lang
    """).df().set_index("lang")["n"].to_dict()
    for r in est.to_pylist():
        e, x = r["n_distinct_est"], exact[r["lang"]]
        assert abs(e - x) / x < 0.05, (r["lang"], e, x)


def test_hll_merge_is_order_independent():
    a = sketches._hll_registers({"a", "b", "c"})
    b = sketches._hll_registers({"c", "d"})
    merged = np.maximum(a, b)
    direct = sketches._hll_registers({"a", "b", "c", "d"})
    assert np.array_equal(merged, direct)


def test_anti_join_excludes_matched_keys(ray_session):
    ray = ray_session
    from tempeh_parser_ray.pipelines import queries as q
    out = _collect(q.customers_no_urgent_orders(SF_DIR))
    import duckdb
    expect = duckdb.sql(f"""
        SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM read_parquet('{SF_DIR}/orders.parquet')
            WHERE o_orderpriority = '1-URGENT')
    """).df()["c_custkey"].tolist()
    assert sorted(out.column("c_custkey").to_pylist()) == sorted(expect)
    assert len(expect) > 0  # the workload is non-degenerate


def test_topk_per_lang_combiner_equals_global_sort(ray_session):
    from tempeh_parser_ray.pipelines import queries as q
    out = q.top3_docs_per_lang(SF_DIR)
    import duckdb
    ora = duckdb.sql(f"""
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id) AS rank
        FROM read_parquet('{SF_DIR}/documents.parquet')
        QUALIFY rank <= 3 ORDER BY lang, rank
    """).df()
    mine = out.to_pandas().sort_values(["lang", "rank"]).reset_index(
        drop=True)
    assert mine["doc_id"].tolist() == ora["doc_id"].tolist()


def test_keep_canonical_collapses_chain_components(ray_session):
    """A chain a-b, b-c must collapse into ONE component keeping only
    the min id (transitivity, not just pairwise drop)."""
    import pyarrow as pa
    import ray
    from tempeh_parser_ray.functions import dedup

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 10], pa.int64()),
        "text": pa.array(list("abcdez"), pa.string())}))
    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([2, 3, 5], pa.int64()),
        "id_b": pa.array([3, 1, 4], pa.int64())}))
    kept = _collect(dedup.keep_canonical(docs, pairs))
    # components: {1,2,3} -> keep 1; {4,5} -> keep 4; {10} singleton
    assert sorted(kept.column("doc_id").to_pylist()) == [1, 4, 10]


def test_doc_freq_score_join_path_equals_broadcast(ray_session):
    """The at-scale shuffle-join scoring path must equal the broadcast
    fast path exactly (both integer-exact)."""
    import pyarrow as pa
    from tempeh_parser_ray.pipelines import queries as q

    docs = q._documents(SF_DIR)
    tf = docs.map_batches(
        q._explode_tokens, batch_format="pyarrow").groupby(
        "token").count().materialize()
    jp = _collect(q._doc_freq_score_join(docs, tf))
    bp = _collect(q.doc_freq_score(SF_DIR))
    a = dict(zip(jp.column("doc_id").to_pylist(),
                 jp.column("freq_score").to_pylist()))
    b = dict(zip(bp.column("doc_id").to_pylist(),
                 bp.column("freq_score").to_pylist()))
    assert a == b and len(a) == 500


def test_empty_input_robustness(ray_session):
    """Empty datasets flow through the temporal and sketch operators
    without crashing (zero-batch iterators, schema-stable outputs)."""
    import pyarrow as pa
    import ray
    from tempeh_parser_ray.functions import sketches
    from tempeh_parser_ray.pipelines import windows

    empty_ev = ray.data.from_arrow(_events_tbl([]))
    assert _collect(windows.asof_last_event(
        empty_ev, left_type="purchase", right_type="click")).num_rows == 0
    assert windows.sliding_hourly(empty_ev).num_rows == 0

    empty_docs = ray.data.from_arrow(pa.table({
        "g": pa.array([], pa.string()),
        "v": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert sketches.grouped_quantiles(
        empty_docs, "g", "v", [0.5], ["p50"]).num_rows == 0
    assert sketches.grouped_hll_distinct(
        empty_docs, "g", "text").num_rows == 0


def test_exact_dedup_paths_agree_on_duplicate_ids(ray_session):
    """With non-unique id values the broadcast fast path must enforce
    the same (fp, id) pair condition as the left_semi join path."""
    import pyarrow as pa
    import ray
    from tempeh_parser_ray.functions import dedup

    base = pa.table({
        "doc_id": pa.array([5, 5, 7], pa.int64()),
        "text": pa.array(["a", "b", "b"], pa.string()),
    })

    def rows(ds):
        out = _collect(ds)
        return sorted(zip(out.column("doc_id").to_pylist(),
                          out.column("text").to_pylist()))

    bc = rows(dedup.exact_dedup(ray.data.from_arrow(base)))
    jn = rows(dedup.exact_dedup(ray.data.from_arrow(base),
                                broadcast_limit=0))
    assert bc == jn == [(5, "a"), (5, "b")]


def test_salted_sessionization_stitches_bucket_boundaries(ray_session):
    """Events straddling a day boundary within the gap must merge into
    one session; a >gap day-boundary crossing must not. Also a session
    chained across 3 buckets."""
    import pyarrow as pa
    import ray
    from tempeh_parser_ray.pipelines import windows

    DAY = windows.DAY_US
    MIN = 60_000_000
    rows = [
        # user 1: 23:50, 00:10 next day (20 min gap -> ONE session)
        (1, 1, DAY - 10 * MIN, "e", 0.0),
        (2, 1, DAY + 10 * MIN, "e", 0.0),
        # user 2: 23:00, next day 01:00 (2h gap -> TWO sessions)
        (3, 2, DAY - 60 * MIN, "e", 0.0),
        (4, 2, DAY + 60 * MIN, "e", 0.0),
        # user 3: two boundary-straddling pairs a day apart — each
        # pair merges across its boundary, the ~24h gap between them
        # does not
        (5, 3, DAY - 5 * MIN, "e", 0.0),
        (6, 3, DAY + 5 * MIN, "e", 0.0),
        (7, 3, 2 * DAY - 5 * MIN, "e", 0.0),
        (8, 3, 2 * DAY + 5 * MIN, "e", 0.0),
    ]
    out = _collect(windows.sessionize_salted(
        ray.data.from_arrow(_events_tbl(rows)), gap_us=30 * MIN))
    per_user = {}
    for r in out.to_pylist():
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert per_user[1] == [2]
    assert per_user[2] == [1, 1]
    # user 3: (5,6) merge, (7,8) merge, but 6->7 gap is ~24h -> 2 sessions
    assert per_user[3] == [2, 2]


def test_cms_never_underestimates():
    """The Count-Min guarantee the heavy-hitter prefilter relies on:
    estimates are always >= true counts (merge preserves it)."""
    import numpy as np
    rng = np.random.RandomState(3)
    counts_a = {f"t{i}": int(rng.randint(1, 50)) for i in range(300)}
    counts_b = {f"t{i}": int(rng.randint(1, 50)) for i in range(150, 450)}
    sk = (sketches.cms_from_counts(counts_a)
          + sketches.cms_from_counts(counts_b))
    truth = {t: counts_a.get(t, 0) + counts_b.get(t, 0)
             for t in set(counts_a) | set(counts_b)}
    toks = list(truth)
    est = sketches.cms_estimate(sk, toks)
    assert all(int(e) >= truth[t] for e, t in zip(est, toks))


def test_heavy_hitters_match_exact(ray_session):
    import duckdb
    import ray
    from tempeh_parser_ray.functions import sketches as sk
    docs = str(Path(SF_DIR) / "documents.parquet")
    got = sk.heavy_hitter_tokens(
        ray.data.read_parquet(docs), "text", divisor=100)
    ora = duckdb.sql(f"""
        WITH toks AS (
            SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
            FROM read_parquet('{docs}') WHERE trim(text) <> ''),
        tot AS (SELECT COUNT(*) AS c FROM toks)
        SELECT token, COUNT(*) AS n FROM toks GROUP BY token
        HAVING COUNT(*) >= GREATEST((SELECT c FROM tot) // 100, 1)
        ORDER BY n DESC, token ASC
    """).df()
    assert got.column("token").to_pylist() == ora["token"].tolist()
    assert got.column("n").to_pylist() == ora["n"].tolist()


def test_empty_input_robustness_round3(ray_session):
    """Empty datasets flow through the round-3 operators (lag, range
    join, curation, incremental dedup, cross-doc repetition) without
    crashing and with schema-stable empty outputs."""
    import pyarrow as pa
    import ray
    from tempeh_parser_ray.functions import curation, incremental
    from tempeh_parser_ray.pipelines import windows

    empty_ev = ray.data.from_arrow(_events_tbl([]))
    assert _collect(windows.lag_events(empty_ev)).num_rows == 0
    assert _collect(windows.range_join_events(
        empty_ev, left_type="purchase", right_type="click",
        window_us=3_600_000_000)).num_rows == 0

    empty_docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert _collect(curation.sequence_packing(
        empty_docs, capacity=128)).num_rows == 0
    assert _collect(curation.decontaminate(
        empty_docs, join_parts=2)).num_rows == 0
    assert _collect(curation.decontaminate(
        empty_docs, join_parts=2,
        bench_broadcast_limit=0)).num_rows == 0
    assert _collect(curation.cross_doc_gram_stats(
        empty_docs)).num_rows == 0
    for kw in ({}, {"snapshot_broadcast_limit": 0}):
        assert _collect(incremental.incremental_dedup(
            empty_docs, empty_docs, join_parts=2,
            **kw)).num_rows == 0


# --- KLL quantile sketch -----------------------------------------------

def test_kll_rank_error_and_merge_order():
    import numpy as np

    from tempeh_parser_ray.functions import sketches as sk

    rng = np.random.default_rng(11)
    data = rng.lognormal(3.0, 1.5, 100_000)
    chunks = np.array_split(data, 23)
    qs = [0.1, 0.5, 0.9, 0.99]
    srt = np.sort(data)
    for order in (range(23), range(22, -1, -1)):
        s = None
        for i in order:
            s = sk.kll_merge(s, sk.kll_update(sk.kll_new(), chunks[i]))
        est = sk.kll_quantiles(s, qs)
        lo = np.searchsorted(srt, est, side="left") / len(data)
        hi = np.searchsorted(srt, est, side="right") / len(data)
        for q, a, b in zip(qs, lo, hi):
            # estimate's rank interval within 3% of the target rank
            assert a - 0.03 <= q <= b + 0.03, (q, a, b)


def test_kll_serialize_roundtrip_and_empty():
    import numpy as np

    from tempeh_parser_ray.functions import sketches as sk

    s = sk.kll_update(sk.kll_new(), np.arange(5000, dtype=np.float64))
    s2 = sk.kll_deserialize(sk.kll_serialize(s))
    assert [a.tolist() for a in s["levels"]] == [
        a.tolist() for a in s2["levels"]]
    assert s["parity"] == s2["parity"]
    empty = sk.kll_deserialize(sk.kll_serialize(sk.kll_new()))
    assert np.isnan(sk.kll_quantiles(empty, [0.5])).all()


def test_token_quantiles_sketch_matches_exact_small(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from tempeh_parser_ray.pipelines import queries as q

    t = q.token_quantiles_sketch("/root/testdata/sf0.001")
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    counts = np.sort([len((x or "").split())
                      for x in docs.column("text").to_pylist()])
    n = len(counts)
    for row in t.to_pylist():
        est, qq = row["estimate"], row["q"]
        lo = np.searchsorted(counts, est, side="left") / n
        hi = np.searchsorted(counts, est, side="right") / n
        assert lo - 0.05 <= qq <= hi + 0.05, row


def test_grouped_sketch_quantiles_rank_error(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    from tempeh_parser_ray.functions.sketches import \
        grouped_sketch_quantiles

    rng = np.random.RandomState(2)
    rows = []
    for g, n in (("a", 3000), ("b", 800), ("c", 5)):
        vals = rng.exponential(100, n)
        rows += [{"g": g, "v": float(v)} for v in vals]
    ds = ray.data.from_items(rows).repartition(7)
    out = grouped_sketch_quantiles(ds, "g", "v", [0.1, 0.5, 0.9],
                                   ["p10", "p50", "p90"])
    got = {r["g"]: r for r in out.to_pylist()}
    assert sorted(got) == ["a", "b", "c"]
    # per-group rank error <= 5% for the big groups; exact-ish for tiny
    byg = {}
    for r in rows:
        byg.setdefault(r["g"], []).append(r["v"])
    for g, vals in byg.items():
        vals = np.sort(vals)
        for q, nm in ((0.1, "p10"), (0.5, "p50"), (0.9, "p90")):
            est = got[g][nm]
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) <= 0.06 or len(vals) < 50, (g, nm)
    # deterministic: same input, same partitioning -> same estimates
    out2 = grouped_sketch_quantiles(
        ray.data.from_items(rows).repartition(7), "g", "v",
        [0.1, 0.5, 0.9], ["p10", "p50", "p90"])
    assert out2.to_pylist() == out.to_pylist()

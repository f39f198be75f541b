"""Corpus-curation operators (functions/curation.py) and the LAG
window (pipelines/windows.py:lag_events) — semantic checks against
hand-computed expectations plus bucket/partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tempeh_parser_ray.functions import curation
from tempeh_parser_ray.functions.textstats import tokenize
from tempeh_parser_ray.pipelines import windows


def _collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return pa.schema([]).empty_table()
    return pa.concat_tables(parts)


def _events_tbl(rows) -> pa.Table:
    """rows: (event_id, user_id, ts_us)"""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
    })


def _docs_tbl(rows) -> pa.Table:
    """rows: (doc_id, text)"""
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


# --- LAG window ----------------------------------------------------------


def test_lag_pairs_each_event_with_predecessor(ray_session):
    ray = ray_session
    US = 1_000_000
    rows = [
        (100, 1, 10 * US),
        (101, 1, 10 * US),   # tie on ts: ordered after 100 by event_id
        (102, 1, 50 * US),
        (300, 2, 30 * US),   # single-event user: null prev
    ]
    out = _collect(windows.lag_events(
        ray.data.from_arrow(_events_tbl(rows))))
    by_id = {r["event_id"]: r for r in out.to_pylist()}
    assert set(by_id) == {100, 101, 102, 300}
    assert by_id[100]["prev_event_id"] is None
    assert by_id[100]["gap_us"] is None
    assert by_id[101]["prev_event_id"] == 100
    assert by_id[101]["gap_us"] == 0
    assert by_id[102]["prev_event_id"] == 101
    assert by_id[102]["gap_us"] == 40 * US
    assert by_id[300]["prev_event_id"] is None


def test_lag_crosses_bucket_boundaries(ray_session):
    """One user spanning many buckets, including an EMPTY middle
    bucket: each bucket's first event must take the PREVIOUS POPULATED
    bucket's tail as its prev."""
    ray = ray_session
    B = 10 * 1_000_000  # 10s buckets
    rows = [
        (1, 7, 1 * B + 5),       # bucket 1
        (2, 7, 1 * B + 9),       # bucket 1 tail
        (3, 7, 4 * B + 0),       # bucket 4 (buckets 2-3 empty)
        (4, 7, 4 * B + 1),
        (5, 7, 5 * B + 2),       # bucket 5
    ]
    out = _collect(windows.lag_events(
        ray.data.from_arrow(_events_tbl(rows)), bucket_us=B))
    by_id = {r["event_id"]: r for r in out.to_pylist()}
    assert by_id[1]["prev_event_id"] is None
    assert by_id[2]["prev_event_id"] == 1
    assert by_id[3]["prev_event_id"] == 2   # across the empty gap
    assert by_id[4]["prev_event_id"] == 3
    assert by_id[5]["prev_event_id"] == 4
    assert by_id[3]["gap_us"] == (4 * B) - (1 * B + 9)


def test_lag_bucket_width_invariance(ray_session):
    ray = ray_session
    rng = np.random.RandomState(7)
    n = 300
    rows = [(i, int(rng.randint(0, 5)), int(rng.randint(0, 10 ** 8)))
            for i in range(n)]

    def pairs(bucket_us):
        t = _collect(windows.lag_events(
            ray.data.from_arrow(_events_tbl(rows)), bucket_us=bucket_us))
        return sorted((r["event_id"], r["prev_event_id"], r["gap_us"])
                      for r in t.to_pylist())

    assert pairs(10 ** 6) == pairs(windows.DAY_US)


# --- sequence packing ----------------------------------------------------


def _brute_pack(rows, capacity):
    rows = sorted(rows)
    before = 0
    out = {}
    for doc_id, text in rows:
        n = len(tokenize(text))
        out[doc_id] = (n, before // capacity, before % capacity)
        before += n
    return out


def test_sequence_packing_matches_bruteforce(ray_session):
    ray = ray_session
    rng = np.random.RandomState(3)
    rows = [(i, " ".join(["tok"] * int(rng.randint(0, 9))))
            for i in range(200)]
    out = _collect(curation.sequence_packing(
        ray.data.from_arrow(_docs_tbl(rows)), capacity=16))
    exp = _brute_pack(rows, 16)
    assert out.num_rows == len(rows)
    for r in out.to_pylist():
        n, c, o = exp[r["doc_id"]]
        assert (r["n_tokens"], r["chunk_id"], r["chunk_offset"]) \
            == (n, c, o)


def test_sequence_packing_bucket_size_invariance(ray_session):
    ray = ray_session
    rows = [(i, " ".join(["w"] * (i % 7))) for i in range(100)]

    def packed(bucket_size):
        t = _collect(curation.sequence_packing(
            ray.data.from_arrow(_docs_tbl(rows)), capacity=8,
            bucket_size=bucket_size))
        return sorted(map(tuple, t.to_pylist()))

    assert packed(3) == packed(64)


# --- decontamination -----------------------------------------------------


def test_decontaminate_flags_shared_shingles(ray_session):
    ray = ray_session
    bench_text = "a b c d e f g h i j"        # grams: abcdefgh ... cdefghij
    rows = [
        (0, bench_text),                       # benchmark (0 % 3 == 0)
        (1, "x " + bench_text),                # shares full 8-grams -> hit
        (2, "totally different words here with no overlap at all ok"),
        (4, "a b c d e f g"),                  # only 7 shared tokens -> miss
    ]
    # broadcast path (default) and forced join path must agree exactly
    for kw in ({}, {"bench_broadcast_limit": 0}):
        out = _collect(curation.decontaminate(
            ray.data.from_arrow(_docs_tbl(rows)), width=8,
            benchmark_mod=3, join_parts=2, **kw))
        flags = {r["doc_id"]: r["contaminated"] for r in out.to_pylist()}
        assert flags == {1: 1, 2: 0, 4: 0}


# --- PII redaction -------------------------------------------------------


def test_pii_redact_counts_and_scrubs(ray_session):
    batch = _docs_tbl([
        (7, "plain words"),            # 7%7==0 -> email appended
        (11, "call me"),               # 11%11==0 -> phone appended
        (13, "nothing here"),
        (77, "both"),                  # both appended
    ])
    out = curation.pii_redact_batch(batch)
    by_id = {r["doc_id"]: r for r in out.to_pylist()}
    assert by_id[7]["n_emails"] == 1 and by_id[7]["n_phones"] == 0
    assert "<EMAIL>" in by_id[7]["clean_text"]
    assert "@" not in by_id[7]["clean_text"]
    assert by_id[11]["n_phones"] == 1
    assert "<PHONE>" in by_id[11]["clean_text"]
    assert by_id[13]["n_emails"] == 0 and by_id[13]["n_phones"] == 0
    assert by_id[13]["clean_text"] == "nothing here"
    assert by_id[77]["n_emails"] == 1 and by_id[77]["n_phones"] == 1


# --- repetition quality --------------------------------------------------


def test_repetition_stats_flags_repetitive_docs(ray_session):
    batch = _docs_tbl([
        (1, "spam spam spam spam spam spam"),   # all 3-grams identical
        (2, "one two three four five six"),     # all distinct
        (3, "a b"),                              # too short: no grams
    ])
    out = curation.repetition_stats_batch(batch)
    by_id = {r["doc_id"]: r for r in out.to_pylist()}
    assert by_id[1]["n_grams"] == 4 and by_id[1]["n_distinct"] == 1
    assert by_id[1]["dup_pct"] == 75 and by_id[1]["is_repetitive"] == 1
    assert by_id[2]["n_grams"] == 4 and by_id[2]["n_distinct"] == 4
    assert by_id[2]["dup_pct"] == 0 and by_id[2]["is_repetitive"] == 0
    assert by_id[3]["n_grams"] == 0 and by_id[3]["dup_pct"] == 0


# --- BPE merge training --------------------------------------------------


def test_bpe_merges_brute_force():
    """Merge loop vs a hand-checkable case: 'low' x5, 'lower' x2 —
    first merge must be ('l','o') count 7, then ('lo','w') count 7."""
    from tempeh_parser_ray.functions import textstats as ts
    merges = ts.bpe_merges_from_word_freq({"low": 5, "lower": 2}, 3)
    assert merges[0] == ("l", "o", 7)
    assert merges[1] == ("lo", "w", 7)
    # after 'low' is one symbol: pairs are (low,e)x2,(e,r)x2 -> tie
    # broken lexicographically toward ('e','r')
    assert merges[2] == ("e", "r", 2)


def test_bpe_tie_break_lexicographic():
    from tempeh_parser_ray.functions import textstats as ts
    # 'ba' and 'ab' both have count 1 -> ('a','b') must win the tie
    merges = ts.bpe_merges_from_word_freq({"ab": 1, "ba": 1}, 1)
    assert merges[0] == ("a", "b", 1)


def test_word_frequencies_distributed(ray_session):
    import pyarrow as pa
    import ray
    from tempeh_parser_ray.functions import textstats as ts
    docs = ray.data.from_arrow(pa.table({
        "text": pa.array(["a b a", "b c", "", "a"])})).repartition(3)
    wf = {r["word"]: r["sum(n)"]
          for r in ts.word_frequencies(docs).take_all()}
    assert wf == {"a": 3, "b": 2, "c": 1}


# --- curation_pipeline composite ------------------------------------------


def test_curation_pipeline_join_path_equals_broadcast(ray_session):
    """The size-adaptive winner filter: forcing the distributed
    left_semi-join path (broadcast_limit=0) must produce exactly the
    broadcast path's rows — pinning the at-scale branch the composite
    takes when the winner set would not fit on the driver."""
    from tempeh_parser_ray.pipelines import queries as q
    sf = "/root/testdata/sf0.001"
    a = _collect(q.curation_pipeline(sf)).sort_by(
        [("doc_id", "ascending")])
    b = _collect(q.curation_pipeline(sf, broadcast_limit=0)).sort_by(
        [("doc_id", "ascending")])
    assert a.num_rows > 0
    assert a.equals(b)


def test_curation_pipeline_single_tokenize():
    """Structural pin for the one-tokenize-pass claim: the composite's
    source must call tokenize() exactly once (inside feats); the
    bench-key and decontamination stages consume the carried gram
    fingerprints instead of re-tokenizing survivors."""
    import inspect

    from tempeh_parser_ray.pipelines import queries as q
    src = inspect.getsource(q.curation_pipeline)
    assert src.count("_ts.tokenize(") == 1

"""Funnel / retention / gap-fill operators (pipelines/windows.py):
hand-computed pins, both-size-adaptive-paths equality, empty-stream
and negative-ts boundaries."""

import pyarrow as pa
import pytest

from tempeh_parser_ray.pipelines import windows as win

US = 1_000_000
H = win.HOUR_US
D = win.DAY_US


def _events(rows):
    """rows: (user_id, ts_us, event_type)"""
    import ray.data

    return ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    }))


def test_funnel_strict_ordering(ray_session):
    ev = _events([
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 10, "view"), (2, 5, "click"),      # click BEFORE view
        (3, 10, "click"), (3, 20, "purchase"),  # never viewed
        (4, 10, "view"), (4, 10, "click"),      # tie is NOT after
        (5, 0, "view"), (5, 1, "click"), (5, 1, "purchase"),
    ])
    t = win.funnel_stages(ev)
    assert dict(zip(t.column("stage").to_pylist(),
                    t.column("n_users").to_pylist())) == {
        "view": 4, "click": 2, "purchase": 1}


def test_funnel_broadcast_vs_join_paths_equal(ray_session):
    ev = _events([(u, 10 * u + k, t)
                  for u in range(6)
                  for k, t in enumerate(["view", "click", "purchase"])])
    a = win.funnel_stages(ev)
    b = win.funnel_stages(ev, broadcast_limit=0, num_partitions=2)
    assert a.equals(b)
    assert a.column("n_users").to_pylist() == [6, 6, 6]


def test_retention_matrix(ray_session):
    # user 1: days 0,1,3 ; user 2: days 1,2 ; user 3: day 0 twice
    ev = _events([
        (1, 0, "x"), (1, D + 5, "x"), (1, 3 * D, "x"),
        (2, D, "x"), (2, 2 * D + 7, "x"),
        (3, 5, "x"), (3, 6, "x"),
    ])
    out = win.retention_cohorts(ev)
    rows = {(r["cohort_day"].day, r["day_offset"]): r["n_users"]
            for r in out.take_all()}
    # cohort day 1 (1970-01-01): users 1,3 at offset 0; user 1 at 1, 3
    # cohort day 2: user 2 at offsets 0, 1
    assert rows == {(1, 0): 2, (1, 1): 1, (1, 3): 1,
                    (2, 0): 1, (2, 1): 1}


def test_retention_paths_equal(ray_session):
    ev = _events([(u, (u % 3) * D + u, "x") for u in range(8)]
                 + [(u, 4 * D + u, "x") for u in range(8)])
    a = sorted(map(tuple, (r.values() for r in
                           win.retention_cohorts(ev).take_all())))
    b = sorted(map(tuple, (r.values() for r in win.retention_cohorts(
        ev, broadcast_limit=0, num_partitions=2).take_all())))
    assert a == b


def test_gapfill_fills_holes_and_bounds(ray_session):
    ev = _events([(1, 0, "x"), (1, 10, "x"), (1, 3 * H + 1, "x")])
    out = sorted((r["hour_ts"].hour, r["n_events"])
                 for r in win.gapfill_hourly(ev).take_all())
    assert out == [(0, 2), (1, 0), (2, 0), (3, 1)]


def test_gapfill_empty_stream(ray_session):
    ev = _events([])
    assert win.gapfill_hourly(ev).count() == 0


def test_negative_ts_rejected(ray_session):
    ev = _events([(1, -5, "x")])
    with pytest.raises(Exception):
        win.gapfill_hourly(ev).take_all()
    with pytest.raises(Exception):
        win.retention_cohorts(ev).take_all()


# --- chunking + centroids (queries-level ops) -------------------------------

def test_chunk_boundaries(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from tempeh_parser_ray.pipelines import queries as q

    texts = {
        0: "a",                                  # n < chunk: 1 window
        1: " ".join(f"w{i}" for i in range(32)),  # n == chunk: 1
        2: " ".join(f"w{i}" for i in range(33)),  # n = chunk+1: 2
        3: " ".join(f"w{i}" for i in range(56)),  # 24+32: 2, second full
        4: " ".join(f"w{i}" for i in range(57)),  # 3 windows
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    }), tmp_path / "documents.parquet")
    out = {}
    for r in q.chunk_documents(str(tmp_path)).take_all():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"]))
    for d in out:
        out[d].sort()
    assert out[0] == [(0, 1)]
    assert out[1] == [(0, 32)]
    assert out[2] == [(0, 32), (1, 9)]
    assert out[3] == [(0, 32), (1, 32)]
    assert out[4] == [(0, 32), (1, 32), (2, 9)]
    # overlap property: chunk 1 of doc 2 starts at token 24
    rows = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"]
            for r in q.chunk_documents(str(tmp_path)).take_all()}
    assert rows[(2, 1)].split()[0] == "w24"


def test_label_centroids_exact_and_partition_invariant(ray_session):
    import numpy as np

    from tempeh_parser_ray.pipelines import queries as q

    out = q.label_centroids("/root/testdata/sf0.001")
    rows = {(r["label"], r["pos"]): r["centroid"]
            for r in out.take_all()}
    # brute-force reference with the same fixed-point contract
    import pyarrow.parquet as pq_
    t = pq_.read_table("/root/testdata/sf0.001/embeddings.parquet")
    emb = np.array(t.column("embedding").to_pylist(), np.float64)
    lab = t.column("label").to_numpy(zero_copy_only=False)
    qm = np.floor(emb * 100000.0 + 0.5).astype(np.int64)
    for k in np.unique(lab):
        m = lab == k
        exp = qm[m].sum(0).astype(np.float64) / m.sum()
        for p in range(emb.shape[1]):
            assert rows[(int(k), p)] == exp[p]  # bit-exact


def test_crawl_diff_status_rules(ray_session):
    from tempeh_parser_ray.pipelines import queries as q

    rows = {r["url"]: r["status"]
            for r in q.crawl_diff("/root/testdata/sf0.001").take_all()}
    for d in range(500):
        url = f"synth://doc/{d}"
        if d % 7 == 0:
            exp = "removed"      # removal precedes the change rule
        elif d % 10 == 0:
            exp = "changed"
        else:
            exp = "same"
        assert rows[url] == exp, (d, rows[url], exp)
        if d % 13 == 0:
            assert rows[f"synth://doc/{d + 1000000}"] == "added"
    n_added = sum(1 for s in rows.values() if s == "added")
    assert n_added == len([d for d in range(500) if d % 13 == 0])

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

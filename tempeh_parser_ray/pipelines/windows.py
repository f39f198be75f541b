"""Temporal operators the Dataset API lacks as primitives, composed
from groupby + vectorized per-group assembly (the pattern SURVEY.md
§2 prescribes for custom operators: map_batches + groupby + numpy).

* **as-of join** (``asof_last_event``): for each left-type event, the
  most recent right-type event by the same user at or before its
  timestamp. Partitioning assumption: one user's events fit in one
  group (same as sessionization); only ``(user_id, ts, event_id,
  side)`` rows shuffle — never payloads. At 100 TB pre-bucket by
  (user, day) and stitch day boundaries by also probing the previous
  bucket's tail.
* **sliding window** (``sliding_hourly``): hourly pre-aggregation
  (the big, distributed reduction) followed by a RANGE-window sum over
  the bounded ``|types| x |hours|`` hourly series — the series is
  orders of magnitude smaller than the event stream, so the window
  pass is a vectorized searchsorted over cumulative sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.dedup import collect_columns_agg


def asof_last_event(events: "ray.data.Dataset", *,
                    left_type: str, right_type: str,
                    ) -> "ray.data.Dataset":
    """Left as-of join within an event stream: each ``left_type`` event
    gets the latest ``right_type`` event with ``ts <= left.ts`` from
    the same user (ties broken toward the larger event_id), or nulls.

    Shape: ONE grouped collect of ``(ts, event_id, side)`` triples per
    user, then a vectorized searchsorted per user — no per-row Python
    in the match step and no driver materialization (output stays a
    Dataset)."""

    def project(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type")
        keep = pc.or_(pc.equal(types, left_type),
                      pc.equal(types, right_type))
        t = batch.filter(keep)
        side = pc.equal(t.column("event_type"), right_type)
        return pa.table({
            "user_id": t.column("user_id"),
            "ts_us": t.column("ts").cast(pa.int64()),
            "event_id": t.column("event_id"),
            "is_right": side,
        })

    grouped = events.map_batches(
        project, batch_format="pyarrow").groupby("user_id").aggregate(
        collect_columns_agg(["ts_us", "event_id", "is_right"], "rows"))

    def match(batch: pa.Table) -> pa.Table:
        eids: list[np.ndarray] = []
        uids: list[np.ndarray] = []
        tss: list[np.ndarray] = []
        rids: list[np.ndarray] = []
        rtss: list[np.ndarray] = []
        valids: list[np.ndarray] = []
        for uid, rows in zip(batch.column("user_id").to_pylist(),
                             batch.column("rows").to_pylist()):
            arr = np.asarray([r[:2] for r in rows], dtype=np.int64)
            right = np.asarray([bool(r[2]) for r in rows])
            lts, lid = arr[~right, 0], arr[~right, 1]
            rts, rid = arr[right, 0], arr[right, 1]
            # sort rights by (ts, id): searchsorted(..., 'right')-1 then
            # lands on the max-id row among the max-ts <= left.ts rows
            order = np.lexsort((rid, rts))
            rts, rid = rts[order], rid[order]
            pos = np.searchsorted(rts, lts, side="right") - 1
            valid = pos >= 0
            safe = np.where(valid, pos, 0)
            eids.append(lid)
            uids.append(np.full(len(lid), uid, dtype=np.int64))
            tss.append(lts)
            rids.append(np.where(valid, rid[safe] if len(rid) else 0, 0))
            rtss.append(np.where(valid, rts[safe] if len(rts) else 0, 0))
            valids.append(valid)
        if not eids:
            z = np.zeros(0, np.int64)
            eids = uids = tss = rids = rtss = [z]
            valids = [np.zeros(0, bool)]
        valid_all = np.concatenate(valids)
        return pa.table({
            "event_id": pa.array(np.concatenate(eids), pa.int64()),
            "user_id": pa.array(np.concatenate(uids), pa.int64()),
            "ts": pa.array(np.concatenate(tss), pa.int64()).cast(
                pa.timestamp("us")),
            "prior_event_id": pa.array(
                np.concatenate(rids), pa.int64(), mask=~valid_all),
            "prior_ts": pa.array(
                np.concatenate(rtss), pa.int64(),
                mask=~valid_all).cast(pa.timestamp("us")),
        })

    return grouped.map_batches(match, batch_format="pyarrow")


DAY_US = 86_400_000_000


def sessionize_salted(events: "ray.data.Dataset", *,
                      gap_us: int, salt_unit_us: int = DAY_US,
                      ) -> "ray.data.Dataset":
    """Sessionization with HOT-KEY SALTING (FP-Hadoop-style skew
    mitigation): stage 1 groups by ``(user, time-bucket)`` and
    sessionizes each bucket locally, so per-group state is bounded by
    one user's events per bucket, not their full history; stage 2
    groups the per-bucket SESSION SUMMARIES (count, start, end — orders
    of magnitude fewer rows than events) by user and stitches sessions
    across bucket boundaries where the gap <= ``gap_us``.

    Exact: within-bucket splits are correct by construction, and a
    cross-boundary merge can only occur between time-adjacent sessions,
    which the stitch pass checks with real timestamps (bucket width
    must exceed ``gap_us``; default 1 day vs 30 min)."""
    assert salt_unit_us > gap_us

    def ts_salt(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())
        # integer divide (ts are post-epoch, so trunc == floor)
        return pa.table({
            "user_id": batch.column("user_id"),
            "salt": pc.divide(ts, salt_unit_us).cast(pa.int64()),
            "ts_us": ts,
        })

    buckets = events.map_batches(
        ts_salt, batch_format="pyarrow").groupby(
        ["user_id", "salt"]).aggregate(
        collect_columns_agg(["ts_us"], "ts_list"))

    def bucket_sessions(batch: pa.Table) -> pa.Table:
        out_u: list[int] = []
        out_n: list[int] = []
        out_s: list[int] = []
        out_e: list[int] = []
        for uid, ts_list in zip(batch.column("user_id").to_pylist(),
                                batch.column("ts_list").to_pylist()):
            ts = np.sort(np.asarray(ts_list, dtype=np.int64))
            brk = np.nonzero(np.diff(ts) > gap_us)[0] + 1
            starts = np.concatenate(([0], brk))
            ends = np.concatenate((brk, [len(ts)]))
            out_u.extend([uid] * len(starts))
            out_n.extend((ends - starts).tolist())
            out_s.extend(ts[starts].tolist())
            out_e.extend(ts[ends - 1].tolist())
        return pa.table({
            "user_id": pa.array(out_u, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "start_us": pa.array(out_s, pa.int64()),
            "end_us": pa.array(out_e, pa.int64()),
        })

    partial = buckets.map_batches(bucket_sessions, batch_format="pyarrow")
    merged = partial.groupby("user_id").aggregate(
        collect_columns_agg(["n", "start_us", "end_us"], "sess"))

    def stitch(batch: pa.Table) -> pa.Table:
        out_u: list[int] = []
        out_i: list[int] = []
        out_n: list[int] = []
        out_s: list[int] = []
        out_e: list[int] = []
        for uid, sess in zip(batch.column("user_id").to_pylist(),
                             batch.column("sess").to_pylist()):
            arr = np.asarray(sess, dtype=np.int64)
            arr = arr[np.argsort(arr[:, 1], kind="stable")]
            n, s, e = arr[:, 0], arr[:, 1], arr[:, 2]
            # merge where the inter-session gap <= gap_us (only possible
            # at bucket boundaries)
            new = np.ones(len(s), dtype=bool)
            new[1:] = (s[1:] - e[:-1]) > gap_us
            grp = np.cumsum(new) - 1
            k = int(grp[-1]) + 1 if len(grp) else 0
            mn = np.zeros(k, np.int64)
            ms = np.full(k, np.iinfo(np.int64).max)
            me = np.zeros(k, np.int64)
            np.add.at(mn, grp, n)
            np.minimum.at(ms, grp, s)
            np.maximum.at(me, grp, e)
            out_u.extend([uid] * k)
            out_i.extend(range(k))
            out_n.extend(mn.tolist())
            out_s.extend(ms.tolist())
            out_e.extend(me.tolist())
        return pa.table({
            "user_id": pa.array(out_u, pa.int64()),
            "session_idx": pa.array(out_i, pa.int64()),
            "n_events": pa.array(out_n, pa.int64()),
            "start_ts": pa.array(out_s, pa.int64()).cast(
                pa.timestamp("us")),
            "end_ts": pa.array(out_e, pa.int64()).cast(
                pa.timestamp("us")),
        })

    return merged.map_batches(stitch, batch_format="pyarrow").sort(
        ["user_id", "session_idx"])


def sliding_hourly(events: "ray.data.Dataset", *, window_hours: int = 3,
                   ) -> pa.Table:
    """Sliding ``window_hours``-hour totals per event type, evaluated at
    each populated hour (RANGE window semantics: gaps in the hourly
    series contribute nothing, matching SQL ``RANGE BETWEEN h-1 HOURS
    PRECEDING AND CURRENT ROW``).

    The distributed work is the hourly pre-aggregate (integer-micro
    sums, map-side combined by the groupby); the window pass runs over
    the bounded hourly series via two searchsorteds on cumulative
    sums."""

    def hour_micros(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "hour_us": pc.floor_temporal(
                batch.column("ts"), unit="hour").cast(pa.int64()),
            "value_micros": pc.round(pc.multiply(
                batch.column("value").cast(pa.float64()),
                1_000_000.0)).cast(pa.int64()),
        })

    hourly = events.map_batches(
        hour_micros, batch_format="pyarrow").groupby(
        ["event_type", "hour_us"]).aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("value_micros"))
    parts = list(hourly.iter_batches(batch_format="pyarrow",
                                     batch_size=None))
    if not parts:
        return pa.table({
            "event_type": pa.array([], pa.string()),
            "window_start": pa.array([], pa.timestamp("us")),
            "n_events_3h": pa.array([], pa.int64()),
            "sum_value_micros_3h": pa.array([], pa.int64())})
    tbl = pa.concat_tables(parts)

    HOUR_US = 3_600_000_000
    span = (window_hours - 1) * HOUR_US
    types = np.asarray(tbl.column("event_type").to_pylist(), dtype=object)
    hours = np.asarray(tbl.column("hour_us").to_pylist(), dtype=np.int64)
    ns = np.asarray(tbl.column("count()").to_pylist(), dtype=np.int64)
    sums = np.asarray(tbl.column("sum(value_micros)").to_pylist(),
                      dtype=np.int64)

    out_t: list[str] = []
    out_h: list[int] = []
    out_n: list[int] = []
    out_s: list[int] = []
    for t in sorted(set(types)):
        m = types == t
        order = np.argsort(hours[m], kind="stable")
        h, n, s = hours[m][order], ns[m][order], sums[m][order]
        cn = np.concatenate(([0], np.cumsum(n)))
        cs = np.concatenate(([0], np.cumsum(s)))
        lo = np.searchsorted(h, h - span, side="left")
        hi = np.arange(1, len(h) + 1)
        out_t.extend([t] * len(h))
        out_h.extend(h.tolist())
        out_n.extend((cn[hi] - cn[lo]).tolist())
        out_s.extend((cs[hi] - cs[lo]).tolist())
    return pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "window_start": pa.array(out_h, pa.int64()).cast(
            pa.timestamp("us")),
        "n_events_3h": pa.array(out_n, pa.int64()),
        "sum_value_micros_3h": pa.array(out_s, pa.int64()),
    })

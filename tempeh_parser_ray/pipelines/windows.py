"""Temporal operators the Dataset API lacks as primitives, composed
from groupby + vectorized per-group assembly (the pattern SURVEY.md
§2 prescribes for custom operators: map_batches + groupby + numpy).

* **as-of join** (``asof_last_event``): for each left-type event, the
  most recent right-type event by the same user at or before its
  timestamp. TIME-BUCKETED so no group ever holds a user's full event
  history: events group by ``(user, bucket)`` (default 1 day), each
  bucket matches locally, and lefts whose prior lies in an EARLIER
  bucket read a per-bucket "carry" row — the latest right from any
  preceding bucket, derived from O(1)-state per-bucket tail aggregates
  and a per-user pass over the bounded bucket-summary list. Only
  ``(user_id, bucket, ts, event_id, side)`` rows shuffle — never
  payloads; per-group state is bounded by one user's events per
  bucket (the same assumption as ``sessionize_salted``).
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

DAY_US = 86_400_000_000


def _lexmax_pair_agg(ts_col: str, id_col: str, name: str):
    """Grouped aggregate keeping the lexicographically largest
    ``(ts, id)`` pair — O(1) state per group (the per-bucket right
    "tail"). Rows with ``ts < 0`` are sentinels (non-right rows) and
    never win unless the group has no real rights."""
    import numpy as np

    from ray.data.block import BlockAccessor

    def acc_block(acc, block):
        t = BlockAccessor.for_block(block).to_arrow()
        ts = t.column(ts_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ts) == 0:
            return acc
        i = np.lexsort((ids, ts))[-1]
        cand = (int(ts[i]), int(ids[i]))
        return cand if acc is None or cand > acc else acc

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a if a >= b else b

    return ray.data.aggregate.AggregateFn(
        init=lambda k: None,
        accumulate_block=acc_block,
        merge=merge,
        finalize=lambda a: list(a) if a is not None else None,
        name=name)


def _run_bounds(u: np.ndarray, b: np.ndarray):
    """First/last index of each (u, b) run in sorted order."""
    change = (u[1:] != u[:-1]) | (b[1:] != b[:-1])
    starts = np.nonzero(np.concatenate(([True], change)))[0]
    lasts = np.nonzero(np.concatenate((change, [True])))[0]
    return starts, lasts


def _combine_tail_partials(batch: pa.Table) -> pa.Table:
    """Map-side combiner for a per-(user, bucket) lexmax-(ts, id)
    groupby: each input block emits ONE row per (user, bucket) — its
    block-local tail — so the exchange carries group-count rows, not
    event-count rows. lexmax(lexmax partials) == lexmax, so the
    downstream ``_lexmax_pair_agg`` is unchanged."""
    if batch.num_rows == 0:
        return batch
    u = batch.column("user_id").to_numpy(zero_copy_only=False)
    b = batch.column("bucket").to_numpy(zero_copy_only=False)
    ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
    ids = batch.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, ts, b, u))
    u, b, ts, ids = u[order], b[order], ts[order], ids[order]
    _, lasts = _run_bounds(u, b)
    return pa.table({
        "user_id": pa.array(u[lasts], pa.int64()),
        "bucket": pa.array(b[lasts], pa.int64()),
        "ts_us": pa.array(ts[lasts], pa.int64()),
        "event_id": pa.array(ids[lasts], pa.int64()),
    })


def _bucket_summary_agg(name: str):
    """Per-USER grouped aggregate producing the full bucket-summary
    list in ONE exchange: state is ``{bucket: (tail_ts, tail_id,
    n_left)}`` — one entry per POPULATED bucket, i.e. exactly the
    bounded per-user row list the former two-stage shape ((user,
    bucket) groupby -> per-user collect) shipped, minus one exchange.
    Accumulation is vectorized per block (lexsort + run bounds);
    merges are per-bucket lexmax(tail) / sum(n_left). finalize emits
    ``[[bucket, tail_ts, tail_id, n_left], ...]`` sorted by bucket
    (the layout the carry pass consumes)."""
    from ray.data.block import BlockAccessor

    def acc_block(acc, block):
        t = BlockAccessor.for_block(block).to_arrow()
        if t.num_rows == 0:
            return acc
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        rts = t.column("r_ts").to_numpy(zero_copy_only=False)
        rid = t.column("r_id").to_numpy(zero_copy_only=False)
        nl = t.column("n_left").to_numpy(zero_copy_only=False)
        order = np.lexsort((rid, rts, b))
        b, rts, rid, nl = b[order], rts[order], rid[order], nl[order]
        change = b[1:] != b[:-1]
        starts = np.nonzero(np.concatenate(([True], change)))[0]
        lasts = np.nonzero(np.concatenate((change, [True])))[0]
        sums = np.add.reduceat(nl, starts)
        d = dict(acc) if acc else {}
        for s, l, n in zip(starts, lasts, sums):
            bk = int(b[l])
            cand = (int(rts[l]), int(rid[l]))
            cur = d.get(bk)
            if cur is None:
                d[bk] = (cand[0], cand[1], int(n))
            else:
                best = cand if cand > (cur[0], cur[1]) else (cur[0],
                                                             cur[1])
                d[bk] = (best[0], best[1], cur[2] + int(n))
        return d

    def merge(a, b):
        if not a:
            return b or {}
        if not b:
            return a
        d = dict(a)
        for bk, (ts, i, n) in b.items():
            cur = d.get(bk)
            if cur is None:
                d[bk] = (ts, i, n)
            else:
                best = (ts, i) if (ts, i) > (cur[0], cur[1]) \
                    else (cur[0], cur[1])
                d[bk] = (best[0], best[1], cur[2] + n)
        return d

    return ray.data.aggregate.AggregateFn(
        init=lambda k: {},
        accumulate_block=acc_block,
        merge=merge,
        finalize=lambda d: [[bk, *d[bk]] for bk in sorted(d or {})],
        name=name)


def _combine_meta_partials(batch: pa.Table) -> pa.Table:
    """Map-side combiner for the as-of bucket-summary groupby: per
    (user, bucket) per block, the local right-tail lexmax (sentinel
    ``-1`` rows lose automatically) and the local left-count sum —
    both re-aggregable by the unchanged downstream aggregates."""
    if batch.num_rows == 0:
        return batch
    u = batch.column("user_id").to_numpy(zero_copy_only=False)
    b = batch.column("bucket").to_numpy(zero_copy_only=False)
    rts = batch.column("r_ts").to_numpy(zero_copy_only=False)
    rid = batch.column("r_id").to_numpy(zero_copy_only=False)
    nl = batch.column("n_left").to_numpy(zero_copy_only=False)
    order = np.lexsort((rid, rts, b, u))
    u, b, rts, rid, nl = (u[order], b[order], rts[order], rid[order],
                          nl[order])
    starts, lasts = _run_bounds(u, b)
    return pa.table({
        "user_id": pa.array(u[lasts], pa.int64()),
        "bucket": pa.array(b[lasts], pa.int64()),
        "r_ts": pa.array(rts[lasts], pa.int64()),
        "r_id": pa.array(rid[lasts], pa.int64()),
        "n_left": pa.array(np.add.reduceat(nl, starts), pa.int64()),
    })


def asof_last_event(events: "ray.data.Dataset", *,
                    left_type: str, right_type: str,
                    bucket_us: int = DAY_US,
                    ) -> "ray.data.Dataset":
    """Left as-of join within an event stream: each ``left_type`` event
    gets the latest ``right_type`` event with ``ts <= left.ts`` from
    the same user (ties broken toward the larger event_id), or nulls.

    TIME-BUCKETED shape (the 100 TB-safe design this module's docstring
    specifies — no group ever holds a user's full history):

    1. project to ``(user, bucket, ts, event_id, is_right)`` rows;
    2. bucket-summary pass: block-local combine to one row per
       (user, bucket) per block, then ONE ``groupby(user)`` whose
       aggregate state is the per-user ``{bucket: (right-tail lexmax,
       left count)}`` map — one entry per POPULATED bucket, the same
       bounded list the former two-exchange shape ((user, bucket)
       groupby then per-user collect) shipped, one exchange fewer;
    3. per-user carry pass over that BOUNDED bucket-summary list (one
       row per populated bucket): for every bucket containing lefts,
       emit the latest right tail from any STRICTLY EARLIER bucket as
       a carry pseudo-right assigned to that bucket (this is the
       "probe the previous bucket's tail" step, generalized through
       empty buckets);
    4. match pass: ``groupby(user, bucket)`` over real events UNION
       carries; within a group the vectorized searchsorted match is
       exact — a carry's ts is strictly below every in-bucket right's,
       so it only wins for lefts with no in-bucket prior.

    Per-group state is bounded by one user's events per ``bucket_us``
    (default 1 day; same partitioning assumption as
    ``sessionize_salted``). Exactness at boundaries: prior rights in
    earlier buckets always have strictly smaller ts, so "latest right
    <= left.ts across all buckets" equals "latest of (in-bucket rights
    <= left.ts, carry)" — verified by the hypothesis brute-force suite
    and a dedicated multi-bucket boundary pytest."""

    def project(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type")
        keep = pc.or_(pc.equal(types, left_type),
                      pc.equal(types, right_type))
        t = batch.filter(keep)
        side = pc.equal(t.column("event_type"), right_type)
        ts = t.column("ts").cast(pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "bucket": pc.divide(ts, bucket_us).cast(pa.int64()),
            "ts_us": ts,
            "event_id": t.column("event_id"),
            # int64, not bool: the downstream per-group collect rows
            # must stay pure-int64 so the collected column is a native
            # Arrow list column, not a pickled-object fallback
            "is_right": side.cast(pa.int64()),
        })

    proj = events.map_batches(project, batch_format="pyarrow")

    def meta_rows(batch: pa.Table) -> pa.Table:
        is_r = batch.column("is_right").to_numpy(
            zero_copy_only=False).astype(bool)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch.column("user_id"),
            "bucket": batch.column("bucket"),
            "r_ts": pa.array(np.where(is_r, ts, -1), pa.int64()),
            "r_id": pa.array(np.where(is_r, ids, -1), pa.int64()),
            "n_left": pa.array((~is_r).astype(np.int64), pa.int64()),
        })

    per_user = proj.map_batches(
        meta_rows, batch_format="pyarrow").map_batches(
        _combine_meta_partials, batch_format="pyarrow").groupby(
        "user_id").aggregate(_bucket_summary_agg("meta"))

    def carries(batch: pa.Table) -> pa.Table:
        out_u: list[int] = []
        out_b: list[int] = []
        out_ts: list[int] = []
        out_id: list[int] = []
        for uid, rows in zip(batch.column("user_id").to_pylist(),
                             batch.column("meta").to_pylist()):
            # finalize already sorts by bucket; keep rows as-is
            tail_buckets = [r[0] for r in rows if r[1] >= 0]
            tails = [(r[1], r[2]) for r in rows if r[1] >= 0]
            for b, _tts, _tid, n_left in rows:
                if not n_left:
                    continue
                i = np.searchsorted(tail_buckets, b, side="left") - 1
                if i >= 0:
                    out_u.append(uid)
                    out_b.append(b)
                    out_ts.append(tails[i][0])
                    out_id.append(tails[i][1])
        return pa.table({
            "user_id": pa.array(out_u, pa.int64()),
            "bucket": pa.array(out_b, pa.int64()),
            "ts_us": pa.array(out_ts, pa.int64()),
            "event_id": pa.array(out_id, pa.int64()),
            "is_right": pa.array([1] * len(out_u), pa.int64()),
        })

    carry_ds = per_user.map_batches(carries, batch_format="pyarrow")

    grouped = proj.union(carry_ds).groupby(
        ["user_id", "bucket"]).aggregate(
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
            arr = np.asarray(rows, dtype=np.int64)  # pure-int64 rows
            right = arr[:, 2].astype(bool)
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


def range_join_events(events: "ray.data.Dataset", *,
                      left_type: str, right_type: str,
                      window_us: int, bucket_us: int = DAY_US,
                      ) -> "ray.data.Dataset":
    """Range (interval) join within an event stream: each ``left_type``
    event gets the COUNT and exact integer-micro value SUM of
    ``right_type`` events by the same user with
    ``left.ts - window_us <= right.ts <= left.ts`` (both ends
    inclusive, SQL ``BETWEEN`` semantics).

    TIME-BUCKETED like :func:`asof_last_event`, but simpler — the
    window is bounded, so carries degenerate to GHOST ROWS: a right in
    the last ``window_us`` of its bucket is duplicated into the next
    bucket (it is the only right an adjacent bucket's lefts can see,
    given ``window_us <= bucket_us``), then each ``(user, bucket)``
    group resolves its lefts with two searchsorteds over prefix sums.
    Shuffle carries only ``(user, bucket, ts, event_id, side, micros)``
    rows plus the ghost fraction (~window/bucket of rights); per-group
    state is one user's events per bucket."""
    assert window_us <= bucket_us, "window must not exceed the bucket"

    def project(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type")
        keep = pc.or_(pc.equal(types, left_type),
                      pc.equal(types, right_type))
        t = batch.filter(keep)
        side = pc.equal(t.column("event_type"), right_type)
        ts = t.column("ts").cast(pa.int64())
        micros = pc.round(pc.multiply(
            t.column("value").cast(pa.float64()), 1_000_000.0)).cast(
            pa.int64())
        # ONE division convention for base and ghost buckets: numpy
        # floor division (pc.divide truncates toward zero, which would
        # disagree for negative timestamps and strand ghosts in the
        # wrong bucket, losing boundary matches).
        ts_np = ts.to_numpy(zero_copy_only=False)
        bucket_np = ts_np // bucket_us if len(ts_np) else ts_np
        base = pa.table({
            "user_id": t.column("user_id"),
            "bucket": pa.array(bucket_np, pa.int64()),
            "ts_us": ts,
            "event_id": t.column("event_id"),
            # int64 so the per-group collect rows stay pure-int64
            # (native Arrow list column, no pickled-object fallback)
            "is_right": side.cast(pa.int64()),
            "value_micros": micros,
        })
        # ghost rights into the NEXT bucket: only rights within
        # window_us of their bucket's end can serve an adjacent
        # bucket's lefts
        right_np = side.to_numpy(zero_copy_only=False).astype(bool)
        if len(ts_np):
            ghost = right_np & (
                ts_np >= (bucket_np + 1) * bucket_us - window_us)
        else:
            ghost = np.zeros(0, dtype=bool)
        g = base.filter(pa.array(ghost))
        ghosts = pa.table({
            "user_id": g.column("user_id"),
            "bucket": pc.add(g.column("bucket"), 1).cast(pa.int64()),
            "ts_us": g.column("ts_us"),
            "event_id": g.column("event_id"),
            "is_right": g.column("is_right"),
            "value_micros": g.column("value_micros"),
        })
        return pa.concat_tables([base, ghosts])

    grouped = events.map_batches(
        project, batch_format="pyarrow").groupby(
        ["user_id", "bucket"]).aggregate(
        collect_columns_agg(["ts_us", "event_id", "is_right",
                             "value_micros"], "rows"))

    def resolve(batch: pa.Table) -> pa.Table:
        out_e: list[np.ndarray] = []
        out_u: list[np.ndarray] = []
        out_t: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for uid, rows in zip(batch.column("user_id").to_pylist(),
                             batch.column("rows").to_pylist()):
            arr = np.asarray(rows, dtype=np.int64)  # pure-int64 rows
            right = arr[:, 2].astype(bool)
            lts, lid = arr[~right, 0], arr[~right, 1]
            if not len(lts):
                continue
            rts = arr[right, 0]
            rvl = arr[right, 3]
            order = np.argsort(rts, kind="stable")
            rts, rvl = rts[order], rvl[order]
            cs = np.concatenate(([0], np.cumsum(rvl)))
            lo = np.searchsorted(rts, lts - window_us, side="left")
            hi = np.searchsorted(rts, lts, side="right")
            out_e.append(lid)
            out_u.append(np.full(len(lid), uid, dtype=np.int64))
            out_t.append(lts)
            out_n.append(hi - lo)
            out_s.append(cs[hi] - cs[lo])
        if not out_e:
            z = np.zeros(0, np.int64)
            out_e = out_u = out_t = out_n = out_s = [z]
        return pa.table({
            "event_id": pa.array(np.concatenate(out_e), pa.int64()),
            "user_id": pa.array(np.concatenate(out_u), pa.int64()),
            "ts": pa.array(np.concatenate(out_t), pa.int64()).cast(
                pa.timestamp("us")),
            "n_right": pa.array(np.concatenate(out_n), pa.int64()),
            "sum_right_micros": pa.array(
                np.concatenate(out_s), pa.int64()),
        })

    return grouped.map_batches(resolve, batch_format="pyarrow")


def lag_events(events: "ray.data.Dataset", *, bucket_us: int = DAY_US,
               ) -> "ray.data.Dataset":
    """LAG window over an event stream: each event paired with the
    immediately preceding event by the same user under ``(ts,
    event_id)`` ordering (SQL ``LAG(...) OVER (PARTITION BY user_id
    ORDER BY ts, event_id)``), plus the gap in microseconds; nulls for
    a user's first event.

    Same TIME-BUCKETED shape as :func:`asof_last_event` — no group ever
    holds a user's full history:

    1. project to ``(user, bucket, ts, event_id)``;
    2. per-bucket tails via the O(1)-state lexmax aggregate;
    3. per-user pass over the bounded bucket-summary list emits one
       CARRY row per bucket — the preceding populated bucket's tail
       (later buckets' timestamps are strictly larger, so the latest
       earlier event is always the previous populated bucket's tail);
    4. match: group real events + carries by ``(user, bucket)``, sort
       by ``(ts, id)``; each event's LAG is its predecessor in the
       sorted run (the carry, sorting first, serves the bucket's first
       event; carries themselves emit nothing).
    """

    def project(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())
        return pa.table({
            "user_id": batch.column("user_id"),
            "bucket": pc.divide(ts, bucket_us).cast(pa.int64()),
            "ts_us": ts,
            "event_id": batch.column("event_id"),
            "is_carry": pa.array(np.zeros(len(batch), np.int64),
                                 pa.int64()),
        })

    proj = events.map_batches(project, batch_format="pyarrow")

    tails = proj.map_batches(
        lambda b: b.select(["user_id", "bucket", "ts_us", "event_id"]),
        batch_format="pyarrow").map_batches(
        _combine_tail_partials, batch_format="pyarrow").groupby(
        ["user_id", "bucket"]).aggregate(
        _lexmax_pair_agg("ts_us", "event_id", "tail"))

    def flatten(batch: pa.Table) -> pa.Table:
        t = batch.column("tail").to_pylist()
        return pa.table({
            "user_id": batch.column("user_id"),
            "bucket": batch.column("bucket"),
            "tail_ts": pa.array([x[0] for x in t], pa.int64()),
            "tail_id": pa.array([x[1] for x in t], pa.int64()),
        })

    per_user = tails.map_batches(
        flatten, batch_format="pyarrow").groupby("user_id").aggregate(
        collect_columns_agg(["bucket", "tail_ts", "tail_id"], "meta"))

    def carries(batch: pa.Table) -> pa.Table:
        out_u: list[int] = []
        out_b: list[int] = []
        out_ts: list[int] = []
        out_id: list[int] = []
        for uid, rows in zip(batch.column("user_id").to_pylist(),
                             batch.column("meta").to_pylist()):
            arr = np.asarray(rows, dtype=np.int64)
            arr = arr[np.argsort(arr[:, 0], kind="stable")]
            for k in range(1, len(arr)):
                out_u.append(uid)
                out_b.append(int(arr[k, 0]))
                out_ts.append(int(arr[k - 1, 1]))
                out_id.append(int(arr[k - 1, 2]))
        return pa.table({
            "user_id": pa.array(out_u, pa.int64()),
            "bucket": pa.array(out_b, pa.int64()),
            "ts_us": pa.array(out_ts, pa.int64()),
            "event_id": pa.array(out_id, pa.int64()),
            "is_carry": pa.array([1] * len(out_u), pa.int64()),
        })

    carry_ds = per_user.map_batches(carries, batch_format="pyarrow")

    grouped = proj.union(carry_ds).groupby(
        ["user_id", "bucket"]).aggregate(
        collect_columns_agg(["ts_us", "event_id", "is_carry"], "rows"))

    def match(batch: pa.Table) -> pa.Table:
        eids: list[np.ndarray] = []
        uids: list[np.ndarray] = []
        tss: list[np.ndarray] = []
        pids: list[np.ndarray] = []
        ptss: list[np.ndarray] = []
        valids: list[np.ndarray] = []
        for uid, rows in zip(batch.column("user_id").to_pylist(),
                             batch.column("rows").to_pylist()):
            arr = np.asarray(rows, dtype=np.int64)
            order = np.lexsort((arr[:, 1], arr[:, 0]))
            ts, eid = arr[order, 0], arr[order, 1]
            carry = arr[order, 2].astype(bool)
            prev_ts = np.concatenate(([0], ts[:-1]))
            prev_id = np.concatenate(([0], eid[:-1]))
            has_prev = np.ones(len(ts), bool)
            if len(ts):
                has_prev[0] = False
            keep = ~carry
            eids.append(eid[keep])
            uids.append(np.full(int(keep.sum()), uid, dtype=np.int64))
            tss.append(ts[keep])
            pids.append(prev_id[keep])
            ptss.append(prev_ts[keep])
            valids.append(has_prev[keep])
        if not eids:
            z = np.zeros(0, np.int64)
            eids = uids = tss = pids = ptss = [z]
            valids = [np.zeros(0, bool)]
        valid_all = np.concatenate(valids)
        pts = np.concatenate(ptss)
        cts = np.concatenate(tss)
        return pa.table({
            "event_id": pa.array(np.concatenate(eids), pa.int64()),
            "user_id": pa.array(np.concatenate(uids), pa.int64()),
            "ts": pa.array(cts, pa.int64()).cast(pa.timestamp("us")),
            "prev_event_id": pa.array(
                np.concatenate(pids), pa.int64(), mask=~valid_all),
            "prev_ts": pa.array(pts, pa.int64(),
                                mask=~valid_all).cast(pa.timestamp("us")),
            "gap_us": pa.array(cts - pts, pa.int64(), mask=~valid_all),
        })

    return grouped.map_batches(match, batch_format="pyarrow")


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


def lead_events(events: "ray.data.Dataset", *, bucket_us: int = DAY_US,
                ) -> "ray.data.Dataset":
    """LEAD window per user (next event + gap) BY SYMMETRY: the
    successor of (ts, id) under ascending order is exactly the
    predecessor of (-ts, -id) under ascending order, so the whole
    time-bucketed LAG machinery (carries, combiners, bounded groups)
    is reused verbatim on a sign-flipped stream and the output is
    flipped back. The gap comes out non-negative directly:
    ``(-t_cur) - (-t_next) = t_next - t_cur``."""

    def negate(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())
        return pa.table({
            "event_id": pc.negate(
                batch.column("event_id").cast(pa.int64())),
            "user_id": batch.column("user_id"),
            "ts": pc.negate(ts).cast(pa.timestamp("us")),
        })

    lag = lag_events(events.map_batches(negate, batch_format="pyarrow"),
                     bucket_us=bucket_us)

    def flip(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.negate(batch.column("event_id")),
            "user_id": batch.column("user_id"),
            "ts": pc.negate(batch.column("ts").cast(pa.int64())).cast(
                pa.timestamp("us")),
            "next_event_id": pc.negate(batch.column("prev_event_id")),
            "next_ts": pc.negate(
                batch.column("prev_ts").cast(pa.int64())).cast(
                pa.timestamp("us")),
            "gap_us": batch.column("gap_us"),
        })

    return lag.map_batches(flip, batch_format="pyarrow")


HOUR_US = 3_600_000_000


def sliding_distinct_users(events: "ray.data.Dataset", *,
                           window_hours: int = 3) -> pa.Table:
    """EXACT distinct users per sliding ``window_hours``-hour window,
    evaluated at each populated hour (RANGE semantics) — the windowed
    DISTINCT that a naive hourly pre-aggregate cannot produce (distinct
    counts don't sum).

    Shape: one ``(user, hour)`` DEDUPE groupby (the only corpus-scale
    exchange), then each (user, hour) row fans out to the <=
    ``window_hours`` windows it can serve, one ``(user, window)``
    dedupe + count — rows bounded by |users| x |hours| x window, never
    by event count. The populated-hour filter applies at the end
    (windows anchored at unpopulated hours are not emitted)."""

    def user_hours(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())
        return pa.table({
            "user_id": batch.column("user_id"),
            "hour_us": pc.multiply(
                pc.divide(ts, HOUR_US), HOUR_US).cast(pa.int64()),
        })

    uh = events.map_batches(
        user_hours, batch_format="pyarrow").groupby(
        ["user_id", "hour_us"]).count().drop_columns(["count()"]
        ).materialize()

    hours = sorted({r["hour_us"] for r in uh.select_columns(
        ["hour_us"]).groupby("hour_us").count().drop_columns(
        ["count()"]).take_all()})
    hours_arr = np.asarray(hours, np.int64)
    hours_ref = ray.put(hours_arr)

    def fanout(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get
        pop = cached_get(hours_ref)
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        hrs = batch.column("hour_us").to_numpy(zero_copy_only=False)
        out_u: list[np.ndarray] = []
        out_w: list[np.ndarray] = []
        for k in range(window_hours):
            w = hrs + k * HOUR_US
            keep = np.isin(w, pop)  # window anchor must be populated
            out_u.append(users[keep])
            out_w.append(w[keep])
        return pa.table({
            "user_id": pa.array(np.concatenate(out_u), pa.int64()),
            "window_us": pa.array(np.concatenate(out_w), pa.int64()),
        })

    counts = uh.map_batches(fanout, batch_format="pyarrow").groupby(
        ["user_id", "window_us"]).count().drop_columns(
        ["count()"]).groupby("window_us").count()
    tbl = pa.Table.from_pylist(counts.take_all())
    if tbl.num_rows == 0:
        return pa.table({
            "window_start": pa.array([], pa.timestamp("us")),
            "n_users": pa.array([], pa.int64())})
    tbl = tbl.sort_by([("window_us", "ascending")])
    return pa.table({
        "window_start": tbl.column("window_us").cast(
            pa.int64()).cast(pa.timestamp("us")),
        "n_users": tbl.column("count()").cast(pa.int64()),
    })


def running_total_events(events: "ray.data.Dataset", *,
                         bucket_us: int = DAY_US) -> "ray.data.Dataset":
    """Per-user RUNNING cumulative sum (SQL ``SUM(value) OVER
    (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED
    PRECEDING)``) in exact integer micros.

    Same time-bucketed shape as :func:`lag_events` — the prefix state
    that crosses bucket boundaries is ONE int64 offset per populated
    bucket, so no group ever holds a user's full history:

    1. per-``(user, bucket)`` integer-micros sums (O(1) aggregate
       state, map-side combined per block);
    2. per-user pass over the bounded populated-bucket list emits one
       OFFSET carry row per bucket — the exclusive prefix of earlier
       buckets' totals (bucket 0's offset is 0: no row);
    3. regroup real events + offset rows by ``(user, bucket)``; each
       bucket sorts its own events by ``(ts, event_id)`` and adds its
       local cumulative sum to the carried offset.
    """

    def project(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())
        micros = pc.round(pc.multiply(
            batch.column("value").cast(pa.float64()),
            1_000_000.0)).cast(pa.int64())
        return pa.table({
            "user_id": batch.column("user_id"),
            "bucket": pc.divide(ts, bucket_us).cast(pa.int64()),
            "ts_us": ts,
            "event_id": batch.column("event_id"),
            "value_micros": micros,
            "is_carry": pa.array(np.zeros(len(batch), np.int64),
                                 pa.int64()),
        })

    proj = events.map_batches(project, batch_format="pyarrow")

    sums = proj.map_batches(
        lambda b: b.select(["user_id", "bucket", "value_micros"]),
        batch_format="pyarrow").groupby(
        ["user_id", "bucket"]).aggregate(
        ray.data.aggregate.Sum("value_micros"))

    per_user = sums.map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "bucket": b.column("bucket"),
            "bsum": b.column("sum(value_micros)").cast(pa.int64()),
        }), batch_format="pyarrow").groupby("user_id").aggregate(
        collect_columns_agg(["bucket", "bsum"], "meta"))

    def offsets(batch: pa.Table) -> pa.Table:
        out_u: list[int] = []
        out_b: list[int] = []
        out_off: list[int] = []
        for uid, rows in zip(batch.column("user_id").to_pylist(),
                             batch.column("meta").to_pylist()):
            arr = np.asarray(rows, dtype=np.int64)
            arr = arr[np.argsort(arr[:, 0], kind="stable")]
            pref = 0
            for k in range(1, len(arr)):
                pref += int(arr[k - 1, 1])
                out_u.append(uid)
                out_b.append(int(arr[k, 0]))
                out_off.append(pref)
        n = len(out_u)
        return pa.table({
            "user_id": pa.array(out_u, pa.int64()),
            "bucket": pa.array(out_b, pa.int64()),
            "ts_us": pa.array([-1] * n, pa.int64()),
            "event_id": pa.array([-1] * n, pa.int64()),
            "value_micros": pa.array(out_off, pa.int64()),
            "is_carry": pa.array([1] * n, pa.int64()),
        })

    carry_ds = per_user.map_batches(offsets, batch_format="pyarrow")

    grouped = proj.union(carry_ds).groupby(
        ["user_id", "bucket"]).aggregate(
        collect_columns_agg(["ts_us", "event_id", "value_micros",
                             "is_carry"], "rows"))

    def match(batch: pa.Table) -> pa.Table:
        eids: list[np.ndarray] = []
        uids: list[np.ndarray] = []
        tss: list[np.ndarray] = []
        runs: list[np.ndarray] = []
        for uid, rows in zip(batch.column("user_id").to_pylist(),
                             batch.column("rows").to_pylist()):
            arr = np.asarray(rows, dtype=np.int64)
            carry = arr[:, 3].astype(bool)
            offset = int(arr[carry, 2].sum())  # 0 or 1 offset rows
            real = arr[~carry]
            order = np.lexsort((real[:, 1], real[:, 0]))
            ts, eid = real[order, 0], real[order, 1]
            run = offset + np.cumsum(real[order, 2])
            eids.append(eid)
            uids.append(np.full(len(eid), uid, dtype=np.int64))
            tss.append(ts)
            runs.append(run)
        if not eids:
            z = np.zeros(0, np.int64)
            eids = uids = tss = runs = [z]
        return pa.table({
            "event_id": pa.array(np.concatenate(eids), pa.int64()),
            "user_id": pa.array(np.concatenate(uids), pa.int64()),
            "ts": pa.array(np.concatenate(tss),
                           pa.int64()).cast(pa.timestamp("us")),
            "running_micros": pa.array(np.concatenate(runs), pa.int64()),
        })

    return grouped.map_batches(match, batch_format="pyarrow")


# --- funnel / retention / gap-fill (event-stream analytics) ----------------


def _assert_nonneg(ts: np.ndarray, what: str) -> None:
    """Truncating and flooring division disagree below zero — the
    operators here floor-divide, so negative timestamps are rejected at
    the operator boundary rather than silently mis-bucketed."""
    if ts.size and ts.min() < 0:
        raise ValueError(f"{what}: negative timestamps unsupported")


def attach_user_scalar(events: "ray.data.Dataset",
                       scalars: "ray.data.Dataset", *,
                       user_col: str = "user_id", val_col: str = "_ref",
                       broadcast_limit: int = 5_000_000,
                       num_partitions: int = 16) -> "ray.data.Dataset":
    """Attach one per-user int64 scalar (a prior-stage min timestamp, a
    cohort day) to an event-shaped dataset, size-adaptively: below
    ``broadcast_limit`` users the (user -> value) map broadcasts once
    via ``ray.put`` and attachment is a per-batch lookup; above it a
    distributed inner hash join keeps the map off the driver. Users
    absent from ``scalars`` are DROPPED (inner-join semantics on both
    paths)."""
    from ..functions.broadcast import cached_get

    if scalars.count() <= broadcast_limit:
        m: dict = {}
        for b in scalars.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
            m.update(zip(b.column(user_col).to_pylist(),
                         b.column(val_col).to_pylist()))
        ref = ray.put(m)

        def attach(batch: pa.Table) -> pa.Table:
            mm = cached_get(ref)
            vals = [mm.get(u) for u in batch.column(user_col).to_pylist()]
            keep = pa.array([v is not None for v in vals])
            out = batch.append_column(val_col, pa.array(
                [0 if v is None else v for v in vals], pa.int64()))
            return out.filter(keep)

        return events.map_batches(attach, batch_format="pyarrow")
    return events.join(scalars, join_type="inner",
                       num_partitions=num_partitions, on=(user_col,))


def funnel_stages(events: "ray.data.Dataset", *,
                  stages: tuple = ("view", "click", "purchase"),
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts",
                  broadcast_limit: int = 5_000_000,
                  num_partitions: int = 16) -> pa.Table:
    """Ordered-conversion funnel: stage k counts users whose earliest
    stage-k event STRICTLY follows their recorded stage-(k-1) time.

    The classic two-pass distributed funnel: per stage, one map-side
    filter + projection and one PURE ``groupby(user).Min`` exchange;
    between stages only one (user, ts) scalar per user moves — via the
    size-adaptive ``attach_user_scalar`` — never event payloads or
    per-user histories. Returns the small (stage, n_users) table."""
    counts: list[tuple[str, int]] = []
    prev: "ray.data.Dataset | None" = None
    for etype in stages:
        def project(batch: pa.Table, et: str = etype) -> pa.Table:
            t = batch.filter(pc.equal(batch.column(type_col), et))
            return pa.table({
                user_col: t.column(user_col),
                "_ts": t.column(ts_col).cast(pa.int64())})

        f = events.map_batches(project, batch_format="pyarrow")
        if prev is not None:
            f = attach_user_scalar(
                f, prev, user_col=user_col, val_col="_prev",
                broadcast_limit=broadcast_limit,
                num_partitions=num_partitions)
            f = f.map_batches(
                lambda b: b.filter(pc.greater(
                    b.column("_ts"), b.column("_prev"))
                ).drop_columns(["_prev"]),
                batch_format="pyarrow")
        mins = f.groupby(user_col).aggregate(
            ray.data.aggregate.Min("_ts")).materialize()
        counts.append((etype, mins.count()))
        prev = mins.map_batches(
            lambda b: pa.table({user_col: b.column(user_col),
                                "_prev": b.column("min(_ts)")}),
            batch_format="pyarrow")
    return pa.table({
        "stage": pa.array([s for s, _ in counts], pa.string()),
        "n_users": pa.array([n for _, n in counts], pa.int64())})


def retention_cohorts(events: "ray.data.Dataset", *,
                      user_col: str = "user_id", ts_col: str = "ts",
                      broadcast_limit: int = 5_000_000,
                      num_partitions: int = 16) -> "ray.data.Dataset":
    """Cohort retention matrix: users cohorted by first-seen DAY;
    ``(cohort_day, day_offset, n_users)`` counts distinct users from
    that cohort active ``day_offset`` days later.

    Exchanges: one distinct-(user, day) pure aggregate (map-side
    combinable), one per-user Min for the cohort, one size-adaptive
    attach, one final bounded (cohort x offset) count — activity rows
    are already distinct so the final count needs no distinct state."""
    def project(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        _assert_nonneg(ts, "retention_cohorts")
        return pa.table({
            user_col: batch.column(user_col),
            "_day": pa.array(ts // DAY_US, pa.int64())})

    days = events.map_batches(project, batch_format="pyarrow")
    pairs = days.groupby([user_col, "_day"]).aggregate(
        ray.data.aggregate.Count()).map_batches(
        lambda b: b.select([user_col, "_day"]), batch_format="pyarrow"
    ).materialize()
    cohort = pairs.groupby(user_col).aggregate(
        ray.data.aggregate.Min("_day")).map_batches(
        lambda b: pa.table({user_col: b.column(user_col),
                            "_coh": b.column("min(_day)")}),
        batch_format="pyarrow")
    act = attach_user_scalar(pairs, cohort, user_col=user_col,
                             val_col="_coh",
                             broadcast_limit=broadcast_limit,
                             num_partitions=num_partitions)
    mat = act.map_batches(
        lambda b: pa.table({
            "_coh": b.column("_coh"),
            "_off": pc.subtract(b.column("_day"), b.column("_coh"))}),
        batch_format="pyarrow"
    ).groupby(["_coh", "_off"]).aggregate(ray.data.aggregate.Count())

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            # midnight timestamp, not date32: pandas renders date32 as
            # python date objects while SQL DATEs round-trip as
            # datetime64 — a timestamp compares cleanly in both
            "cohort_day": pc.multiply(batch.column("_coh"),
                                      DAY_US).cast(pa.timestamp("us")),
            "day_offset": batch.column("_off").cast(pa.int64()),
            "n_users": batch.column("count()").cast(pa.int64())})

    return mat.map_batches(finish, batch_format="pyarrow")


def gapfill_hourly(events: "ray.data.Dataset", *,
                   ts_col: str = "ts") -> "ray.data.Dataset":
    """Zero-filled hourly event-count series between the stream's
    first and last populated hour.

    The event stream is touched exactly once, by a map-side-combined
    ``groupby(hour)`` count; the resulting hourly table is bounded by
    the TIME SPAN, not the event count (~10^5 rows per decade), so it
    always broadcasts — the grid itself is generated distributedly
    with ``ray.data.range`` and filled by vectorized searchsorted."""
    def project(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        _assert_nonneg(ts, "gapfill_hourly")
        return pa.table({"_hour": pa.array(ts // HOUR_US, pa.int64())})

    counts = events.map_batches(project, batch_format="pyarrow"
                                ).groupby("_hour").aggregate(
        ray.data.aggregate.Count())
    parts = list(counts.iter_batches(batch_format="pyarrow",
                                     batch_size=None))
    tbl = (pa.concat_tables(parts) if parts
           else pa.table({"_hour": pa.array([], pa.int64()),
                          "count()": pa.array([], pa.int64())}))
    if tbl.num_rows == 0:
        return ray.data.from_arrow(pa.table({
            "hour_ts": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64())}))
    hours = tbl.column("_hour").to_numpy(zero_copy_only=False)
    ns = tbl.column("count()").to_numpy(zero_copy_only=False)
    order = np.argsort(hours)
    hours, ns = hours[order], ns[order]
    h0, h1 = int(hours[0]), int(hours[-1])
    ref = ray.put((hours, ns))

    def fill(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get

        hs, counts_np = cached_get(ref)
        h = batch.column("id").to_numpy(zero_copy_only=False) + h0
        pos = np.searchsorted(hs, h)
        pos_c = np.minimum(pos, len(hs) - 1)
        n = np.where(hs[pos_c] == h, counts_np[pos_c], 0)
        return pa.table({
            "hour_ts": pa.array(h * HOUR_US,
                                pa.int64()).cast(pa.timestamp("us")),
            "n_events": pa.array(n, pa.int64())})

    return ray.data.range(h1 - h0 + 1).map_batches(
        fill, batch_format="pyarrow")

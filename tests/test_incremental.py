"""Bloom-prefiltered incremental dedup: filter-level properties the
SQL oracle can't see (no false negatives; real candidate pruning)."""

import hashlib

import numpy as np
import pyarrow as pa

from tempeh_parser_ray.functions import incremental as inc


def _fps(texts):
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def _build_bits(fps, m_bits, k):
    idx = inc._probe_indexes(fps, m_bits, k)
    bits = np.zeros((m_bits + 63) // 64, np.uint64)
    flat = idx.reshape(-1)
    np.bitwise_or.at(bits, flat >> 6,
                     np.uint64(1) << (flat & 63).astype(np.uint64))
    return bits


def test_bloom_no_false_negatives():
    members = _fps([f"doc {i}" for i in range(500)])
    bits = _build_bits(members, 1 << 14, 4)
    assert inc.bloom_might_contain(bits, members, 1 << 14, 4).all()


def test_bloom_prunes_nonmembers():
    members = _fps([f"doc {i}" for i in range(500)])
    bits = _build_bits(members, 1 << 16, 4)
    probes = _fps([f"other {i}" for i in range(2000)])
    hits = inc.bloom_might_contain(bits, probes, 1 << 16, 4)
    # fp rate at n=500, m=65536, k=4 is ~1e-4; allow generous slack
    assert hits.sum() < 20


def test_bloom_agg_matches_local_build(ray_session):
    import ray
    texts = [f"snapshot doc {i}" for i in range(300)]
    fps = _fps(texts)
    ds = ray.data.from_arrow(
        pa.table({"fp": pa.array(fps, pa.string())})).repartition(7)
    got = ds.aggregate(inc.bloom_build_agg(1 << 14, 4))["bloom"]
    want = _build_bits(fps, 1 << 14, 4).tobytes()
    assert got == want


def test_incremental_dedup_end_to_end(ray_session):
    import ray
    snap = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"text {i}" for i in range(100)]),
    })).repartition(4)
    # incoming: 50 exact copies (dup) + 50 fresh (clean)
    inc_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(1000, 1100), pa.int64()),
        "text": pa.array([f"text {i}" if i < 50 else f"fresh {i}"
                          for i in range(100)]),
    })).repartition(4)
    def run(**kw):
        return pa.concat_tables(
            inc.incremental_dedup(snap, inc_ds, m_bits=1 << 14, k=4,
                                  join_parts=2, **kw).iter_batches(
                batch_format="pyarrow", batch_size=None)
        ).sort_by([("doc_id", "ascending")])

    # direct path (snapshot broadcast) and Bloom+join path (forced via
    # snapshot_broadcast_limit=0) must agree exactly
    for out in (run(), run(snapshot_broadcast_limit=0),
                run(snapshot_broadcast_limit=0, broadcast_limit=0)):
        flags = out.column("is_dup").to_pylist()
        assert out.column("doc_id").to_pylist() == list(range(1000, 1100))
        assert flags == [1] * 50 + [0] * 50


def test_incremental_dedup_equals_bruteforce_random(ray_session):
    """Randomized: both paths vs a Python-set reference over corpora
    with planted overlaps, exercising Bloom fp-rate pressure (small m)
    — false positives must never leak into the output."""
    import numpy as np
    import ray
    rng = np.random.RandomState(42)
    for trial in range(3):
        snap_texts = [f"s{trial} {i}" for i in range(rng.randint(5, 60))]
        inc_texts = [
            (snap_texts[rng.randint(len(snap_texts))]
             if rng.rand() < 0.4 else f"i{trial} {j}")
            for j in range(rng.randint(5, 80))]
        snap = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(snap_texts)), pa.int64()),
            "text": pa.array(snap_texts)})).repartition(3)
        inc_ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(100, 100 + len(inc_texts)),
                               pa.int64()),
            "text": pa.array(inc_texts)})).repartition(4)
        want = {100 + j: int(t in set(snap_texts))
                for j, t in enumerate(inc_texts)}
        for kw in ({}, {"snapshot_broadcast_limit": 0, "m_bits": 1 << 8}):
            out = pa.concat_tables(inc.incremental_dedup(
                snap, inc_ds, k=3, join_parts=2, **kw).iter_batches(
                batch_format="pyarrow", batch_size=None))
            got = dict(zip(out.column("doc_id").to_pylist(),
                           out.column("is_dup").to_pylist()))
            assert got == want, (trial, kw)

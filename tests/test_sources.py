"""Unit tests for the manifest-driven parquet corpus source."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tempeh_parser_ray.sources import parquet_corpus as src


def _write(tmp_path, name, n_rows, row_group_size):
    tbl = pa.table({
        "doc_id": pa.array(range(n_rows), pa.int64()),
        "html": pa.array([b"<p>%d</p>" % i for i in range(n_rows)],
                         pa.binary()),
        "extra": pa.array(["x"] * n_rows, pa.string()),
    })
    pq.write_table(tbl, tmp_path / name, row_group_size=row_group_size)


def test_manifest_row_group_granularity(tmp_path):
    _write(tmp_path, "a.parquet", 10, 4)   # 3 row groups
    _write(tmp_path, "b.parquet", 6, 6)    # 1 row group
    man = src.build_manifest(str(tmp_path))
    assert man.num_rows == 4
    rows = sorted(zip(man.column("file").to_pylist(),
                      man.column("row_group").to_pylist(),
                      man.column("n_rows").to_pylist()))
    assert [r[1] for r in rows] == [0, 1, 2, 0]
    assert sum(r[2] for r in rows) == 16


def test_read_corpus_parquet_prunes_and_completes(ray_session, tmp_path):
    _write(tmp_path, "a.parquet", 10, 4)
    _write(tmp_path, "b.parquet", 6, 6)
    ds = src.read_corpus_parquet(str(tmp_path), columns=["doc_id", "html"])
    tbl = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert tbl.num_rows == 16
    assert sorted(tbl.column_names) == ["doc_id", "html"]  # pruned
    assert sorted(tbl.column("doc_id").to_pylist()) == sorted(
        list(range(10)) + list(range(6)))


def test_read_corpus_accepts_file_list(ray_session, tmp_path):
    _write(tmp_path, "a.parquet", 5, 5)
    ds = src.read_corpus_parquet([str(tmp_path / "a.parquet")])
    assert ds.count() == 5


def test_jsonl_and_csv_sources_match_parquet_path(ray_session, tmp_path):
    """Alternate source formats produce identical results to the
    parquet-fed pipelines (including CSV round-trip of embedded
    newlines and quotes through write_csv -> read_csv)."""
    import pyarrow as pa
    from pyarrow import csv as pa_csv
    import ray
    from tempeh_parser_ray.pipelines import queries as q
    from tempeh_parser_ray.functions import textstats

    sf = "/root/testdata/sf0.001"

    def collect(ds):
        return pa.concat_tables(list(ds.iter_batches(
            batch_format="pyarrow", batch_size=None)))

    jl = collect(q.extract_text_jsonl(sf))
    pqt = collect(q.extract_text(sf))
    a = {r["doc_id"]: r["extracted_text"] for r in jl.to_pylist()}
    b = {r["doc_id"]: r["extracted_text"] for r in pqt.to_pylist()}
    assert a == b

    # hostile CSV round-trip: newlines, quotes, commas inside text
    tricky = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(['a "quoted" word', "line\nbreak, comma",
                          ""], pa.string()),
    })
    out = tmp_path / "csv"
    ray.data.from_arrow(tricky).write_csv(str(out))
    back = collect(ray.data.read_csv(
        str(out),
        parse_options=pa_csv.ParseOptions(newlines_in_values=True))
        .map_batches(textstats.token_count_batch,
                     batch_format="pyarrow"))
    got = {r["doc_id"]: r["n_tokens"] for r in back.to_pylist()}
    assert got == {1: 3, 2: 3, 3: 0}


def test_source_cache_rebuild_after_interrupted_build(ray_session, tmp_path):
    """An interrupted materialization (data present, no marker) must be
    rebuilt from scratch, not appended to (review finding: duplicate
    rows survived forever)."""
    from tempeh_parser_ray.sources import jsonl_corpus as jc

    calls = []

    def build(out):
        calls.append(out)
        (out / "data.txt").write_text("v%d" % len(calls))

    out = tmp_path / "cache" / "fmt"
    # simulate a crashed build: leftover final dir + temp dir, no marker
    (out / "stale").mkdir(parents=True)
    (out.parent / "fmt.tmp" / "junk").mkdir(parents=True)
    got = jc._materialize(out, build)
    assert got == out
    assert (out / "data.txt").read_text() == "v1"
    assert not (out / "stale").exists()          # stale dir replaced
    assert not (out.parent / "fmt.tmp").exists()  # temp cleaned
    # second call: marker present -> no rebuild
    jc._materialize(out, build)
    assert len(calls) == 1


def test_ipc_corpus_round_trips_binary_html(ray_session):
    SF_DIR = "/root/testdata/sf0.001"

    from tempeh_parser_ray.sources import synthetic as synth
    from tempeh_parser_ray.sources.ipc_corpus import (ipc_corpus_dir,
                                                      read_ipc)

    d = ipc_corpus_dir(SF_DIR)
    ds = read_ipc(d)
    got = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        assert b.schema.field("html").type == pa.binary()
        for r in b.to_pylist():
            got[r["doc_id"]] = r["html"]

    import ray.data as rd
    ref = {}
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet")
    for b in docs.map_batches(synth.synthesize_batch,
                              batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            ref[r["doc_id"]] = r["html"]
    assert got == ref

"""End-to-end Ray Data pipeline tests: fixture-corpus conformance through
the actor-pool stages, closed-form extraction oracle, skew rebatching,
and shard-granular checkpoint/resume."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tempeh_parser_ray.pipelines import extract_pipeline as ep
from tempeh_parser_ray.sources import synthetic as synth
from tempeh_parser_ray.sources.fixtures import fixture_corpus_table
from tempeh_parser_ray.stages import parse_stage, rebatch
from tempeh_parser_ray.state import lineage

SF_DIR = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))


def test_fixture_corpus_trees_match_goldens(ray_session, goldens_default):
    """read fixtures -> ParseHtmlBatch actor pool -> rebuild nested trees
    -> byte-identical vs reference goldens, keyed by url."""
    ray = ray_session
    ds = ray.data.from_arrow(fixture_corpus_table())
    parsed = ep.parse_dataset(ds, concurrency=(1, 2), passthrough=("url",))
    tbl = _collect(parsed)
    assert tbl.num_rows == len(goldens_default)
    for i in range(tbl.num_rows):
        url = tbl.column("url")[i].as_py()
        name = url.removeprefix("fixture://")
        nested = parse_stage.nested_from_row(
            tbl.column("nodes")[i].as_py(), tbl.column("attrs")[i].as_py())
        assert nested == goldens_default[name], f"tree mismatch {name}"
        assert tbl.column("error")[i].as_py() == ""


def test_extraction_closed_form(ray_session):
    """Synthesized corpus -> fused ExtractBatch -> text matches the
    closed-form oracle byte-for-byte; spans tile the text."""
    ray = ray_session
    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    corpus = ray.data.read_parquet(
        str(Path(SF_DIR) / "documents.parquet")).map_batches(
        synth.synthesize_batch, batch_format="pyarrow")
    out = ep.extract_dataset(corpus, concurrency=(1, 2),
                             passthrough=("doc_id", "url", "lang"))
    tbl = _collect(out)
    expected = {
        d: synth.expected_extracted_text(d, t, l, s)
        for d, t, l, s in zip(docs.column("doc_id").to_pylist(),
                              docs.column("text").to_pylist(),
                              docs.column("lang").to_pylist(),
                              docs.column("source").to_pylist())}
    assert tbl.num_rows == len(expected)
    for i in range(tbl.num_rows):
        did = tbl.column("doc_id")[i].as_py()
        text = tbl.column("extracted_text")[i].as_py()
        assert text == expected[did]
        assert tbl.column("error")[i].as_py() == ""
        assert tbl.column("n_nodes")[i].as_py() == synth.TEMPLATE_N_NODES
        assert tbl.column("n_links")[i].as_py() == synth.TEMPLATE_N_LINKS
        spans = tbl.column("spans")[i].as_py()
        assert "".join(text[s["start"]:s["end"]] for s in spans) == text
        # the walk-accumulated token count IS the whitespace-token
        # contract over the joined text (web_pipeline gates on it
        # without re-tokenizing)
        assert tbl.column("n_tokens")[i].as_py() == len(text.split())


def test_extract_n_tokens_counts_across_node_boundaries():
    """The fused token counter merges a token split across adjacent
    text nodes (concatenation is separator-free) and ignores dropped
    subtrees — exactly len(extracted_text.split())."""
    from tempeh_parser_ray.core import extract as cex
    from tempeh_parser_ray.core.api import HTMLParser

    p = HTMLParser()
    cases = [
        "<p>ab</p><p>cd</p>",              # merge: 1 token
        "<p>ab </p><p>cd</p>",             # no merge: 2
        "<p>a b</p><span>c d</span>",      # boundary merge inside 4
        "<b>a</b><i>b</i><u>c</u>",        # chained merge: 1
        "<p>  </p><p>x</p>",               # ws-only node breaks run
        "<p>a<script>zz zz</script>b</p>",  # dropped subtree
        "<p>　a b</p>",           # unicode whitespace
        "",
    ]
    for html in cases:
        e = cex.extract(p.parse_string(html))
        assert e.n_tokens == len(e.text.split()), (html, e.text)


def test_rebatcher_splits_by_bytes():
    fn = rebatch.make_byte_rebatcher(target_bytes=100)
    batch = pa.table({
        "html": pa.array([b"a" * 10, b"b" * 200, b"c" * 10, b"d" * 95,
                          None, b"e" * 10], pa.binary()),
        "i": pa.array(range(6), pa.int64()),
    })
    parts = list(fn(batch))
    # giant row isolated; order preserved; all rows kept exactly once
    assert [p.num_rows for p in parts] and sum(p.num_rows for p in parts) == 6
    flat = [i for p in parts for i in p.column("i").to_pylist()]
    assert flat == list(range(6))
    for p in parts:
        sizes = [len(x) if x is not None else 0
                 for x in p.column("html").to_pylist()]
        assert p.num_rows == 1 or sum(sizes) <= 100


def test_rebatcher_empty_and_all_null():
    fn = rebatch.make_byte_rebatcher(target_bytes=100)
    empty = pa.table({"html": pa.array([], pa.binary())})
    assert list(fn(empty)) == []
    nulls = pa.table({"html": pa.array([None, None], pa.binary())})
    got = list(fn(nulls))
    assert sum(p.num_rows for p in got) == 2


def test_checkpoint_resume(ray_session, tmp_path):
    """Kill-and-resume at shard granularity: second run skips committed
    shards; a shard with a missing lineage sidecar is re-run."""
    ray = ray_session
    # build 4 small input files from the documents table
    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    corpus = synth.synthesize_batch(docs)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    files = []
    n = corpus.num_rows
    step = n // 4
    for i in range(4):
        part = corpus.slice(i * step, step if i < 3 else n - 3 * step)
        f = in_dir / f"part-{i}.parquet"
        pq.write_table(part, f)
        files.append(str(f))

    out_dir = tmp_path / "out"
    t1 = ep.run_extraction_job(files, out_dir, shard_size=1, spans=False,
                               concurrency=(1, 2))
    assert t1["shards_run"] == 4 and t1["shards_skipped"] == 0
    assert t1["n_docs"] == n and t1["n_errors"] == 0

    # resume: everything committed -> all skipped
    t2 = ep.run_extraction_job(files, out_dir, shard_size=1, spans=False,
                               concurrency=(1, 2))
    assert t2["shards_run"] == 0 and t2["shards_skipped"] == 4

    # simulate a crash mid-shard-2: remove its commit marker
    lineage.lineage_path(out_dir, 2).unlink()
    t3 = ep.run_extraction_job(files, out_dir, shard_size=1, spans=False,
                               concurrency=(1, 2))
    assert t3["shards_run"] == 1 and t3["shards_skipped"] == 3

    # lineage records audit the run
    rec = lineage.read_lineage(out_dir, 2)
    assert rec is not None and rec.n_docs > 0 and rec.html_bytes > 0
    assert rec.input_files == [files[2]]

    # total output rows across shards == corpus rows, no dup from resume
    total = pq.read_table(out_dir / "shard=00002").num_rows + sum(
        pq.read_table(out_dir / f"shard=0000{i}").num_rows
        for i in (0, 1, 3))
    assert total == n


def test_giant_page_does_not_break_parse(ray_session):
    """A page far above target_batch_bytes parses as a singleton batch."""
    ray = ray_session
    big_text = "word " * 200_000  # ~1MB
    html = synth.page_html(1, big_text, "en", "src")
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "html": pa.array([html, synth.page_html(2, "small", "en", "s")],
                         pa.binary())}))
    out = ep.extract_dataset(ds, spans=False, concurrency=(1, 1),
                             passthrough=("doc_id",),
                             target_batch_bytes=64 * 1024)
    tbl = _collect(out)
    assert tbl.num_rows == 2
    texts = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("extracted_text").to_pylist()))
    assert texts[1] == synth.expected_extracted_text(1, big_text, "en", "src")


def test_multi_encoding_extraction_identical(ray_session):
    """utf-8 / utf-8+BOM / utf-16le / utf-16be pages of the same doc
    must extract byte-identically (BOM-sniffing decode, SURVEY.md S1)."""
    import ray
    from tempeh_parser_ray.pipelines import queries as q

    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    expected = {
        d: synth.expected_extracted_text(d, t, l, s)
        for d, t, l, s in zip(docs.column("doc_id").to_pylist(),
                              docs.column("text").to_pylist(),
                              docs.column("lang").to_pylist(),
                              docs.column("source").to_pylist())}
    tbl = _collect(q.extract_multi_encoding(SF_DIR))
    assert tbl.num_rows == len(expected)
    seen_encodings = set()
    for row in tbl.to_pylist():
        assert row["extracted_text"] == expected[row["doc_id"]], row["doc_id"]
        assert row["error"] == ""
        assert row["encoding"] == synth.encoding_for(row["doc_id"])
        seen_encodings.add(row["encoding"])
    assert seen_encodings == set(synth.ENCODINGS)


def test_main_text_drops_nav_keeps_content(ray_session):
    from tempeh_parser_ray.pipelines import queries as q

    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    meta = {r["doc_id"]: r for r in docs.to_pylist()}
    tbl = _collect(q.extract_main_text(SF_DIR))
    for row in tbl.to_pylist():
        d = meta[row["doc_id"]]
        want = f"{d['source']} #{d['doc_id']}{d['text']}contact: "
        assert row["main_text"] == want  # nav + mail link dropped


def test_scale_report_from_lineage(ray_session, tmp_path):
    """scale_report is a pure read of committed lineage sidecars:
    totals match the job's return value, percentiles are well-formed,
    and a shard made artificially slow appears in the stragglers."""
    import json

    ray = ray_session
    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    corpus = synth.synthesize_batch(docs)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    files = []
    n = corpus.num_rows
    step = n // 4
    for i in range(4):
        part = corpus.slice(i * step, step if i < 3 else n - 3 * step)
        f = in_dir / f"part-{i}.parquet"
        pq.write_table(part, f)
        files.append(str(f))
    out = tmp_path / "out"
    tot = ep.run_extraction_job(files, out, shard_size=1, wave_size=2,
                                spans=False, concurrency=(1, 2))
    rep = lineage.scale_report(out)
    assert rep["n_shards"] == 4
    assert rep["totals"]["n_docs"] == tot["n_docs"] == n
    assert rep["totals"]["html_bytes"] == tot["html_bytes"]
    p = rep["percentiles"]["mb_per_sec"]
    assert p["min"] <= p["p10"] <= p["p50"] <= p["p90"] <= p["max"]
    # 2 waves of 2 shards -> wall estimate counts each wave once
    assert 0 < rep["wall_seconds_estimate"] <= tot["wall_seconds"] + 1e-6

    # plant a straggler: rewrite shard 1's sidecar with 100x the bytes
    # over the same wall time (10x would still sit above half-median)
    lp = lineage.lineage_path(out, 1)
    rec = json.loads(lp.read_text())
    rec["mb_per_sec"] = rec["mb_per_sec"] / 100.0
    lp.write_text(json.dumps(rec))
    rep2 = lineage.scale_report(out)
    assert any(s["shard"] == 1 for s in rep2["stragglers"])
    # report never touches shard data: removing parquet output changes
    # nothing (it reads only _lineage/)
    import shutil
    shutil.rmtree(lineage.shard_output_dir(out, 0))
    assert lineage.scale_report(out)["n_shards"] == 4


def test_resume_cleans_crashed_shard(ray_session, tmp_path):
    """A shard dir left by a crashed attempt (output present, no lineage
    record) must be wiped and re-run, yielding exactly-once output."""
    import ray

    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    for i in range(2):
        pq.write_table(synth.synthesize_batch(docs.slice(i * 100, 100)),
                       cdir / f"part-{i}.parquet")
    files = sorted(str(p) for p in cdir.glob("*.parquet"))
    out = tmp_path / "out"

    # simulate a crash: shard 0's dir exists with junk, no lineage
    crashed = lineage.shard_output_dir(out, 0)
    crashed.mkdir(parents=True)
    pq.write_table(pa.table({"garbage": [1, 2, 3]}),
                   crashed / "leftover.parquet")

    tot = ep.run_extraction_job(files, out, shard_size=1,
                                concurrency=(1, 2), spans=False)
    assert tot["shards_run"] == 2 and tot["n_docs"] == 200
    written = pq.read_table(sorted(
        str(p) for p in out.glob("shard=*/*.parquet")))
    assert written.num_rows == 200
    assert "garbage" not in written.column_names


def test_shrunken_input_prunes_stale_shards(ray_session, tmp_path):
    """If the input file list shrinks between runs into the same
    output_dir, shard dirs/lineage beyond the new composition must be
    pruned — a consumer reading the output dir must never mix stale
    shard data into the new run."""
    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    for i in range(3):
        pq.write_table(synth.synthesize_batch(docs.slice(i * 50, 50)),
                       cdir / f"part-{i}.parquet")
    files = sorted(str(p) for p in cdir.glob("*.parquet"))
    out = tmp_path / "out"

    t1 = ep.run_extraction_job(files, out, shard_size=1,
                               concurrency=(1, 2), spans=False)
    assert t1["shards_run"] == 3 and t1["n_docs"] == 150

    # drop the last input file: composition shrinks to 2 shards
    t2 = ep.run_extraction_job(files[:2], out, shard_size=1,
                               concurrency=(1, 2), spans=False)
    assert t2["shards_skipped"] == 2 and t2["shards_run"] == 0
    assert not lineage.shard_output_dir(out, 2).exists()
    assert lineage.read_lineage(out, 2) is None
    total = pq.read_table(sorted(
        str(p) for p in out.glob("shard=*/*.parquet"))).num_rows
    assert total == 100  # stale shard rows are gone from the output dir


def test_wave_pipelined_job_multiwave(ray_session, tmp_path):
    """wave_size < n_shards: multiple waves, per-shard lineage still
    commits with exact counts and the output partitions stay disjoint."""
    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    for i in range(4):
        pq.write_table(synth.synthesize_batch(docs.slice(i * 40, 40)),
                       cdir / f"part-{i}.parquet")
    files = sorted(str(p) for p in cdir.glob("*.parquet"))
    out = tmp_path / "out"
    tot = ep.run_extraction_job(files, out, shard_size=1, wave_size=2,
                                concurrency=(1, 2), spans=False)
    assert tot["shards_run"] == 4 and tot["n_docs"] == 160
    for sid in range(4):
        rec = lineage.read_lineage(out, sid)
        assert rec is not None and rec.n_docs == 40
        assert rec.input_files == [files[sid]]
        got = pq.read_table(out / f"shard={sid:05d}").num_rows
        assert got == 40


def test_resume_invalidates_stale_lineage(ray_session, tmp_path):
    """A lineage record from a different shard composition (shard_size
    changed) must NOT be skipped — the shard re-runs."""
    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    for i in range(2):
        pq.write_table(synth.synthesize_batch(docs.slice(i * 50, 50)),
                       cdir / f"part-{i}.parquet")
    files = sorted(str(p) for p in cdir.glob("*.parquet"))
    out = tmp_path / "out"

    t1 = ep.run_extraction_job(files, out, shard_size=2,
                               concurrency=(1, 2), spans=False)
    assert t1["shards_run"] == 1 and t1["n_docs"] == 100
    # same output dir, DIFFERENT sharding: old record must not match
    t2 = ep.run_extraction_job(files, out, shard_size=1,
                               concurrency=(1, 2), spans=False)
    assert t2["shards_skipped"] == 0 and t2["n_docs"] == 100
    # and a rerun with the same config now skips everything
    t3 = ep.run_extraction_job(files, out, shard_size=1,
                               concurrency=(1, 2), spans=False)
    assert t3["shards_skipped"] == 2 and t3["shards_run"] == 0


def test_shard_writer_retry_is_idempotent(tmp_path):
    """Content-hash file naming: re-running the same batch through the
    writer (as a retried Ray write task would) overwrites its own file
    instead of appending a duplicate."""
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "shard": pa.array([0, 0, 1], pa.int32()),
        "extracted_text": pa.array(["a", "b", "c"], pa.large_string()),
        "n_chars_extracted": pa.array([1, 1, 1], pa.int64()),
        "html_bytes": pa.array([10, 20, 30], pa.int64()),
        "error": pa.array(["", "", ""], pa.string()),
    })
    stats1 = ep._write_shard_batch(batch, out_root=str(tmp_path))
    files1 = sorted(str(p) for p in tmp_path.glob("shard=*/*.parquet"))
    stats2 = ep._write_shard_batch(batch, out_root=str(tmp_path))
    files2 = sorted(str(p) for p in tmp_path.glob("shard=*/*.parquet"))
    assert files1 == files2 and len(files1) == 2  # one per shard, no dups
    assert stats1.to_pylist() == stats2.to_pylist()
    total = sum(pq.read_table(f).num_rows for f in files1)
    assert total == 3
    assert "shard" not in pq.read_table(files1[0]).column_names


def test_streaming_split_ingest_covers_all_docs(ray_session):
    """Training-ingest surface: the extraction output feeds N parallel
    consumers via streaming_split; together they must see every doc
    exactly once (equal-split disabled, order-free)."""
    import threading

    import pyarrow as pa
    import ray

    from tempeh_parser_ray.pipelines import queries as q

    ds = q.extract_text("/root/testdata/sf0.001")
    it_a, it_b = ds.streaming_split(2, equal=False)
    seen: list[set] = [set(), set()]

    def consume(it, acc: set) -> None:
        for batch in it.iter_batches(batch_format="pyarrow"):
            acc.update(batch.column("doc_id").to_pylist())

    threads = [threading.Thread(target=consume, args=(it, s))
               for it, s in zip((it_a, it_b), seen)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not (seen[0] & seen[1])
    assert len(seen[0] | seen[1]) == 500


def test_run_job_cli_subprocess(tmp_path):
    """tools/run_job.py is the `ray job submit` entrypoint: it owns its
    own Ray session (so it runs as a subprocess here), wraps
    run_extraction_job, prints ONE JSON line of totals, and resumes —
    the second invocation skips every lineage-committed shard."""
    import json
    import subprocess
    import sys

    docs = pq.read_table(Path(SF_DIR) / "documents.parquet")
    corpus = synth.synthesize_batch(docs)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    half = corpus.num_rows // 2
    pq.write_table(corpus.slice(0, half), in_dir / "a.parquet")
    pq.write_table(corpus.slice(half), in_dir / "b.parquet")

    repo = Path(__file__).resolve().parent.parent
    cmd = [sys.executable, str(repo / "tools" / "run_job.py"),
           "--input", str(in_dir), "--output", str(tmp_path / "out"),
           "--shard-size", "1", "--no-spans"]
    p1 = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    assert p1.returncode == 0, p1.stderr[-2000:]
    t1 = json.loads(p1.stdout.strip().splitlines()[-1])
    assert t1["shards_run"] == 2 and t1["n_docs"] == corpus.num_rows
    assert t1["n_errors"] == 0

    p2 = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    assert p2.returncode == 0, p2.stderr[-2000:]
    t2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert t2["shards_run"] == 0 and t2["shards_skipped"] == 2

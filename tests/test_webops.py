"""Web-crawl ops (functions/webops.py): SURT canonicalization, robots
parsing/matching semantics, and both-paths-equal pins for the
size-adaptive stages."""

import numpy as np
import pyarrow as pa
import pytest

from tempeh_parser_ray.functions import webops as web


# --- SURT (pure, no Ray) ---------------------------------------------------

def _surt(urls: list[str]) -> list[str]:
    t = web.surt_batch(pa.table({"url": pa.array(urls, pa.string())}))
    return t.column("surt").to_pylist()


def test_surt_canonicalization():
    assert _surt([
        "https://www.A.co.uk:81/P/x?b=2&a=1",
        "http://example.com",                 # no path
        "https://news.example.com/x/",        # subdomain kept
        "http://www.example.com/?z=1",
        "not a url",                          # malformed -> empty host
    ]) == [
        "uk,co,a)/p/x?a=1&b=2",
        "com,example)/",
        "com,example,news)/x/",
        "com,example)/?z=1",
        ")/",
    ]


def test_surt_sorts_duplicate_params_stably():
    assert _surt(["http://h.io/p?b=1&a=2&a=1"]) == ["io,h)/p?a=1&a=2&b=1"]


# --- robots parsing + matching (pure) ---------------------------------------

ROBOTS = """# politeness
User-agent: gptbot
Disallow: /

User-agent: helper
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.zip$
Disallow:
"""


def test_robots_group_selection_and_shared_agents():
    star = web.parse_robots(ROBOTS, agent="graftbot")
    helper = web.parse_robots(ROBOTS, agent="helper")
    gpt = web.parse_robots(ROBOTS, agent="gptbot")
    assert star == helper  # stacked User-agent lines share the group
    assert star == [(False, "/private/"), (True, "/private/ok"),
                    (False, "/*.zip$")]
    assert gpt == [(False, "/")]


def test_robots_match_precedence_and_anchors():
    rules = web.compile_rules(web.parse_robots(ROBOTS, agent="graftbot"))
    got = web.match_paths(rules, pa.array(
        ["/private/x", "/private/ok/y", "/a.zip", "/a.zipx", "/pub"]))
    assert got.tolist() == [False, True, False, True, True]


def test_robots_allow_wins_specificity_tie():
    rules = web.compile_rules([(False, "/a/b"), (True, "/a/*")])
    # same length (5): allow wins the tie
    assert web.match_paths(rules, pa.array(["/a/b"])).tolist() == [True]


def test_robots_no_group_allows_everything():
    assert web.parse_robots("User-agent: other\nDisallow: /\n",
                            agent="me") == []
    assert web.match_paths([], pa.array(["/x"])).tolist() == [True]


# --- size-adaptive both-paths pins (Ray) ------------------------------------

@pytest.fixture()
def frontier_and_robots(ray_session):
    import ray.data

    n = 40
    doms = [f"d{i % 4}.com" for i in range(n)]
    paths = [f"/s{i % 5}/p{i}" for i in range(n)]
    frontier = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "registered_domain": pa.array(doms, pa.string()),
        "path": pa.array(paths, pa.string()),
    }))
    robots = ray.data.from_arrow(pa.table({
        "registered_domain": pa.array([f"d{k}.com" for k in range(4)],
                                      pa.string()),
        "robots_txt": pa.array(
            [f"User-agent: *\nDisallow: /s{k}/\nAllow: /s{k}/p1\n"
             for k in range(4)], pa.string()),
    }))
    return frontier, robots


def test_robots_filter_broadcast_vs_join_paths_equal(frontier_and_robots):
    frontier, robots = frontier_and_robots

    def run(limit):
        out = web.robots_filter(frontier, robots, broadcast_limit=limit,
                                num_partitions=2)
        rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
        return [(r["doc_id"], bool(r["allowed"])) for r in rows]

    a = run(1_000_000)   # broadcast path
    b = run(0)           # distributed explode+join+argmax path
    assert a == b
    # spot semantics: doc 0 -> domain d0, path /s0/p0 -> disallowed;
    # doc 16 -> d0, /s1/p16 -> allowed (rule is /s0/); doc 12 -> d0,
    # /s2/p12 allowed; doc 5 -> d1, /s0/p5 allowed (d1 blocks /s1/)
    d = dict(a)
    assert d[0] is False and d[16] is True and d[5] is True
    # allow override: doc 20 -> d0, /s0/p20 disallowed; find a
    # /s{k}/p1* case: doc 1 -> d1 path /s1/p1 -> allow override
    assert d[20] is False and d[1] is True


def test_robots_filter_duplicate_rows_survive_both_paths(
        frontier_and_robots, ray_session):
    # exact-duplicate frontier rows must each produce an output row in
    # BOTH paths (one-row-per-input contract); the distributed path
    # re-expands via the count() carried through the argmax groupby
    import ray.data

    _, robots = frontier_and_robots
    frontier = ray.data.from_arrow(pa.table({
        "registered_domain": pa.array(
            ["d0.com"] * 3 + ["d1.com"] * 2, pa.string()),
        "path": pa.array(["/s0/p9"] * 3 + ["/s1/p7"] * 2,
                         pa.string()),
    }))
    for limit in (1_000_000, 0):
        out = web.robots_filter(frontier, robots,
                                broadcast_limit=limit,
                                num_partitions=2).take_all()
        rows = sorted((r["registered_domain"], r["path"],
                       bool(r["allowed"])) for r in out)
        assert rows == [("d0.com", "/s0/p9", False)] * 3 \
            + [("d1.com", "/s1/p7", False)] * 2


def test_keep_latest_broadcast_vs_join_paths_equal(ray_session):
    import ray.data

    n = 30
    t = pa.table({
        "url": pa.array([f"u{i % 10}" for i in range(n)], pa.string()),
        "warc_ts": pa.array(range(n), pa.int64()).cast(
            pa.timestamp("ms")),
        "tag": pa.array([str(i) for i in range(n)], pa.string()),
    })
    ds = ray.data.from_arrow(t)

    def run(limit):
        out = web.keep_latest(ds, broadcast_limit=limit,
                              num_partitions=2)
        return sorted((r["url"], r["tag"]) for r in out.take_all())

    a = run(1_000_000)
    b = run(0)
    assert a == b
    # newest capture per url: u_k keeps row 20+k
    assert a == sorted((f"u{k}", str(20 + k)) for k in range(10))


def test_anchor_index_rollup(ray_session):
    import ray.data

    links = ray.data.from_arrow(pa.table({
        "href": pa.array(["/a", "/a", "/a", "/b"], pa.string()),
        "anchor": pa.array(["z", "m", "m", "q"], pa.string()),
    }))
    rows = {r["href"]: r for r in
            web.anchor_index(links).take_all()}
    assert rows["/a"]["n_refs"] == 3
    assert rows["/a"]["n_distinct_anchors"] == 2
    assert rows["/a"]["top_anchor"] == "m"
    assert rows["/b"]["n_refs"] == 1

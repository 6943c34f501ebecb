"""Link-graph operators: href extraction, host edges, integer PageRank.

PageRank's integer arithmetic (floor divisions, int sums) makes the
result partitioning- and order-independent, so expectations here are
hand-computed exact int64 values, not tolerances.
"""

import pyarrow as pa
import pytest

from searchengine_ray.pipelines.graph import (extract_links, host_edges,
                                              pagerank)

PAGES = pa.table({
    "url": ["https://A.test/1", "https://b.test/1",
            "https://c.test/1", "https://d.test/1"],
    "html": [
        b'x<a href="https://b.test/x">l</a>y<a href="https://c.test/y">m</a>',
        b'<a href="https://c.test/z">n</a><a href="HTTPS://c.test/w">n2</a>',
        b'<a href="https://a.test/w">o</a><a href="mailto:x@y">bad</a>'
        b'<a href="/relative/path">bad2</a><a href="https://a.test/v">p</a>'
        b'<a href="https://c.test/self">self</a>',
        b"no links here at all",
    ],
})
# host graph (self-loop c->c and non-http hrefs dropped; A lowercased):
#   a->b w=1, a->c w=1, b->c w=2, c->a w=2
EDGES = [("a.test", "b.test", 1), ("a.test", "c.test", 1),
         ("b.test", "c.test", 2), ("c.test", "a.test", 2)]


def _ds(tbl, parts):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(parts)


@pytest.mark.usefixtures("ray_session")
def test_extract_links_rows():
    got = sorted((r["url"], r["href"])
                 for r in extract_links(_ds(PAGES, 3)).take_all())
    assert got == [
        ("https://A.test/1", "https://b.test/x"),
        ("https://A.test/1", "https://c.test/y"),
        ("https://b.test/1", "HTTPS://c.test/w"),
        ("https://b.test/1", "https://c.test/z"),
        ("https://c.test/1", "/relative/path"),
        ("https://c.test/1", "https://a.test/self"
         .replace("self", "v")),
        ("https://c.test/1", "https://a.test/w"),
        ("https://c.test/1", "https://c.test/self"),
        ("https://c.test/1", "mailto:x@y"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_host_edges_weights_and_drops():
    got = sorted((r["src_host"], r["dst_host"], r["weight"])
                 for r in host_edges(extract_links(_ds(PAGES, 2)))
                 .take_all())
    assert got == EDGES


def _hand_pagerank(edges, iters, d=85, scale=10 ** 9):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    od = {}
    for s, _, w in edges:
        od[s] = od.get(s, 0) + w
    base = ((100 - d) * scale) // 100
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        new = {n: base for n in nodes}
        for s, t, w in edges:
            new[t] += (d * rank[s] * w) // (100 * od[s])
        rank = new
    return sorted(rank.items())


@pytest.mark.usefixtures("ray_session")
def test_pagerank_exact_vs_hand():
    import ray.data

    edges = ray.data.from_arrow(pa.table({
        "src_host": [e[0] for e in EDGES],
        "dst_host": [e[1] for e in EDGES],
        "weight": pa.array([e[2] for e in EDGES], pa.int64()),
    }))
    for parts in (1, 3):
        got = sorted((r["host"], r["rank_q"])
                     for r in pagerank(edges.repartition(parts),
                                       iters=3).take_all())
        assert got == _hand_pagerank(EDGES, 3)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_dangling_and_sources():
    """d.test dangles (in-edges only, mass leaks); a source node with
    no in-edges settles at exactly `base` after round 1."""
    import ray.data

    edges_rows = [("s.test", "d.test", 1)]
    edges = ray.data.from_arrow(pa.table({
        "src_host": [e[0] for e in edges_rows],
        "dst_host": [e[1] for e in edges_rows],
        "weight": pa.array([1], pa.int64()),
    }))
    got = dict((r["host"], r["rank_q"])
               for r in pagerank(edges, iters=2).take_all())
    assert got == dict(_hand_pagerank(edges_rows, 2))
    # source keeps only the teleport mass
    assert got["s.test"] == (15 * 10 ** 9) // 100


@pytest.mark.usefixtures("ray_session")
def test_pagerank_iter0_is_initial_mass():
    import ray.data

    edges = ray.data.from_arrow(pa.table({
        "src_host": ["x.test"], "dst_host": ["y.test"],
        "weight": pa.array([1], pa.int64()),
    }))
    got = sorted((r["host"], r["rank_q"])
                 for r in pagerank(edges, iters=0).take_all())
    assert got == [("x.test", 10 ** 9), ("y.test", 10 ** 9)]


def test_pagerank_rejects_bad_params():
    with pytest.raises(ValueError):
        pagerank(None, iters=-1)
    with pytest.raises(ValueError):
        pagerank(None, damping_pct=101)


def _hand_pagerank_redist(edges, iters, d=85, scale=10 ** 9):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    od = {}
    for s, _, w in edges:
        od[s] = od.get(s, 0) + w
    base = ((100 - d) * scale) // 100
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        dm = sum(r for n, r in rank.items() if n not in od)
        extra = (d * dm) // (100 * len(nodes))
        new = {n: base + extra for n in nodes}
        for s, t, w in edges:
            new[t] += (d * rank[s] * w) // (100 * od[s])
        rank = new
    return sorted(rank.items())


@pytest.mark.usefixtures("ray_session")
def test_pagerank_redistributes_dangling_mass():
    """s->d where d dangles: with redistribution, d's parked mass
    returns uniformly each round. Hand-computed round 1: D = 10^9,
    extra = (85*10^9)//200 = 425e6; s = base+extra = 575e6,
    d = base+extra+(85*10^9)//100 = 1,425e6."""
    import ray.data

    edges_rows = [("s.test", "d.test", 1)]
    edges = ray.data.from_arrow(pa.table({
        "src_host": ["s.test"], "dst_host": ["d.test"],
        "weight": pa.array([1], pa.int64()),
    }))
    got = dict((r["host"], r["rank_q"])
               for r in pagerank(edges, iters=1,
                                 redistribute_dangling=True).take_all())
    assert got == {"s.test": 575_000_000, "d.test": 1_425_000_000}
    # and a second round agrees with the hand loop exactly
    got2 = sorted((r["host"], r["rank_q"])
                  for r in pagerank(edges, iters=2,
                                    redistribute_dangling=True)
                  .take_all())
    assert got2 == _hand_pagerank_redist(edges_rows, 2)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_redistribute_noop_without_dangling():
    """Every node has out-edges → D = 0 every round: the flag must
    not change the result (and the dangling set short-circuits)."""
    import ray.data

    cyc = [("a.test", "b.test", 1), ("b.test", "a.test", 1)]
    edges = ray.data.from_arrow(pa.table({
        "src_host": [e[0] for e in cyc],
        "dst_host": [e[1] for e in cyc],
        "weight": pa.array([1, 1], pa.int64()),
    }))
    plain = sorted((r["host"], r["rank_q"])
                   for r in pagerank(edges, iters=2).take_all())
    redist = sorted((r["host"], r["rank_q"])
                    for r in pagerank(edges, iters=2,
                                      redistribute_dangling=True)
                    .take_all())
    assert plain == redist == _hand_pagerank(cyc, 2)


ANCHOR_PAGES = pa.table({
    "url": ["https://s1.test/p", "https://s2.test/p"],
    "html": [
        b'<a href="https://T.test/a" class="x">Fast Merge-Join!</a>'
        b'<a href="https://t.test/b">merge <b>bold</b></a>'
        b'<a href="https://t.test/c"></a>'
        b'<a href="mailto:x@y">skip me</a>',
        b'<a href="https://t.test/d">merge join</a>'
        b'<a href="https://u.test/e">a Tiny</a>'
        b'<a href="https://broken.test/f" no-close',
    ],
})


@pytest.mark.usefixtures("ray_session")
def test_extract_anchors_text_and_malformed():
    from searchengine_ray.pipelines.graph import extract_anchors

    got = sorted((r["url"], r["href"], r["anchor"])
                 for r in extract_anchors(_ds(ANCHOR_PAGES, 2))
                 .take_all())
    assert got == [
        ("https://s1.test/p", "https://T.test/a", "Fast Merge-Join!"),
        ("https://s1.test/p", "https://t.test/b", "merge "),
        ("https://s1.test/p", "https://t.test/c", ""),
        ("https://s1.test/p", "mailto:x@y", "skip me"),
        # malformed tag: href recovered, anchor blank
        ("https://s2.test/p", "https://broken.test/f", ""),
        ("https://s2.test/p", "https://t.test/d", "merge join"),
        ("https://s2.test/p", "https://u.test/e", "a Tiny"),
    ]


@pytest.mark.usefixtures("ray_session")
def test_anchor_terms_counts_by_target_host():
    from searchengine_ray.pipelines.graph import (anchor_terms,
                                                  extract_anchors)

    got = sorted((r["host"], r["term"], r["cnt"])
                 for r in anchor_terms(
                     extract_anchors(_ds(ANCHOR_PAGES, 2))).take_all())
    # punct→space, lower, len>=2 ('a' dies), mailto target dropped,
    # T.test lowercased into t.test's counts, broken.test's anchor is
    # empty (malformed tag) so it contributes no terms
    assert got == [
        ("t.test", "fast", 1), ("t.test", "join", 2),
        ("t.test", "merge", 3), ("u.test", "tiny", 1),
    ]

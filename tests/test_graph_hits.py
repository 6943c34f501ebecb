"""HITS, co-citation/coupling, and cluster representatives.

Expectations are derived by INDEPENDENT pure-Python re-computation
(dict loops over the edge list) — a different code path from the
Arrow/Ray operators, so a kernel bug cannot self-confirm. All three
operators are integer-exact, so comparisons are equality, not
tolerance.
"""

import pyarrow as pa
import pytest

from searchengine_ray.pipelines.clusters import cluster_representatives
from searchengine_ray.pipelines.graph import cocitation, hits

SCALE = 10 ** 6

# src, dst, weight — small but irregular: a hub (d), a sink (e),
# a 2-cycle (a<->d via d->a), parallel-ish weights
EDGES = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("b", "d", 3),
         ("c", "d", 1), ("d", "a", 1), ("d", "e", 2), ("e", "a", 1)]


def _edges_tbl():
    return pa.table({
        "src_host": [e[0] for e in EDGES],
        "dst_host": [e[1] for e in EDGES],
        "weight": pa.array([e[2] for e in EDGES], pa.int64()),
    })


def _naive_hits(iters: int, scale: int = SCALE):
    nodes = sorted({e[0] for e in EDGES} | {e[1] for e in EDGES})
    auth = {n: scale for n in nodes}
    hub = {n: scale for n in nodes}
    for _ in range(iters):
        raw = {n: sum(hub[s] * w for s, d, w in EDGES if d == n)
               for n in nodes}
        s = sum(raw.values())
        auth = {n: (raw[n] * scale) // s if s else 0 for n in nodes}
        raw = {n: sum(auth[d] * w for s2, d, w in EDGES if s2 == n)
               for n in nodes}
        s = sum(raw.values())
        hub = {n: (raw[n] * scale) // s if s else 0 for n in nodes}
    return {n: (auth[n], hub[n]) for n in nodes}


def _ds(tbl, parts=3):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(parts)


@pytest.mark.usefixtures("ray_session")
def test_hits_matches_naive_python():
    got = {r["host"]: (r["auth_q"], r["hub_q"])
           for r in hits(_ds(_edges_tbl()), iters=2).take_all()}
    assert got == _naive_hits(2)


@pytest.mark.usefixtures("ray_session")
def test_hits_iter0_is_initial_mass():
    got = {r["host"]: (r["auth_q"], r["hub_q"])
           for r in hits(_ds(_edges_tbl()), iters=0).take_all()}
    assert got == {n: (SCALE, SCALE) for n in "abcde"}


@pytest.mark.usefixtures("ray_session")
def test_hits_partition_invariant():
    a = sorted((r["host"], r["auth_q"], r["hub_q"])
               for r in hits(_ds(_edges_tbl(), 1), iters=3).take_all())
    b = sorted((r["host"], r["auth_q"], r["hub_q"])
               for r in hits(_ds(_edges_tbl(), 6), iters=3).take_all())
    assert a == b


def test_hits_rejects_negative_iters():
    with pytest.raises(ValueError):
        hits(None, iters=-1)


def _naive_pairs(mode: str):
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d, _ in EDGES:
        if mode == "cocited":
            adj[s].add(d)          # key = citing host, vals = targets
        else:
            adj[d].add(s)          # key = cited host, vals = sources
    counts = defaultdict(int)
    for vals in adj.values():
        vs = sorted(vals)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                counts[(vs[i], vs[j])] += 1
    return {(a, b, c, False) for (a, b), c in counts.items()}


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["cocited", "coupled"])
def test_cocitation_matches_naive(mode):
    got = {(r["host_a"], r["host_b"], r["n_common"], r["truncated"])
           for r in cocitation(_ds(_edges_tbl()), mode=mode).take_all()}
    assert got == _naive_pairs(mode)


@pytest.mark.usefixtures("ray_session")
def test_cocitation_min_common_filters():
    got = cocitation(_ds(_edges_tbl()), mode="cocited",
                     min_common=2).take_all()
    want = {t for t in _naive_pairs("cocited") if t[2] >= 2}
    assert {(r["host_a"], r["host_b"], r["n_common"], r["truncated"])
            for r in got} == want


@pytest.mark.usefixtures("ray_session")
def test_cocitation_fanout_cap_is_loud():
    # one src links to 6 hosts; max_fanout=3 keeps the 3 smallest and
    # flags every surviving pair from the capped key
    tbl = pa.table({
        "src_host": ["hub"] * 6,
        "dst_host": [f"t{i}" for i in range(6)],
        "weight": pa.array([1] * 6, pa.int64()),
    })
    got = sorted((r["host_a"], r["host_b"], r["n_common"], r["truncated"])
                 for r in cocitation(_ds(tbl, 1), mode="cocited",
                                     max_fanout=3).take_all())
    assert got == [("t0", "t1", 1, True), ("t0", "t2", 1, True),
                   ("t1", "t2", 1, True)]


def test_cocitation_rejects_bad_mode():
    with pytest.raises(ValueError):
        cocitation(None, mode="nope")


@pytest.mark.usefixtures("ray_session")
def test_cluster_representatives_keep_longest_tie_min_id():
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": ["aa", "aaaa", "aaaa",       # cluster 0: 1 and 2 tie
                 "béé",                      # cluster 3: 3 codepoints
                 "zz", "unclustered"],       # 4 alone; 5 not labeled
    })
    clusters = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "cluster": pa.array([0, 0, 0, 3, 4], pa.int64()),
    })
    got = sorted(
        (r["cluster"], r["rep_doc_id"], r["rep_chars"], r["n_members"])
        for r in cluster_representatives(
            _ds(clusters, 2), _ds(docs, 3)).take_all())
    # cluster 0: docs 1 and 2 both have 4 chars -> min id 1 wins;
    # rep_chars counts CODEPOINTS (3 for 'béé', not utf-8 bytes)
    assert got == [(0, 1, 4, 3), (3, 3, 3, 1), (4, 4, 2, 1)]


def _naive_ppr(seeds, iters, d=85, scale=10 ** 9):
    nodes = sorted({e[0] for e in EDGES} | {e[1] for e in EDGES})
    od = {}
    for s, _, w in EDGES:
        od[s] = od.get(s, 0) + w
    r = {n: (scale if n in seeds else 0) for n in nodes}
    base = ((100 - d) * scale) // 100
    for _ in range(iters):
        nxt = {n: (base if n in seeds else 0) for n in nodes}
        for s, t, w in EDGES:
            nxt[t] += (d * r[s] * w) // (100 * od[s])
        r = nxt
    return r


@pytest.mark.usefixtures("ray_session")
def test_personalized_pagerank_matches_naive():
    from searchengine_ray.pipelines.graph import personalized_pagerank

    got = {r["host"]: r["rank_q"]
           for r in personalized_pagerank(
               _ds(_edges_tbl()), seeds=["a", "e"], iters=3).take_all()}
    assert got == _naive_ppr({"a", "e"}, 3)


@pytest.mark.usefixtures("ray_session")
def test_personalized_pagerank_mass_decays_from_seed():
    from searchengine_ray.pipelines.graph import personalized_pagerank

    got = {r["host"]: r["rank_q"]
           for r in personalized_pagerank(
               _ds(_edges_tbl()), seeds=["a"], iters=2).take_all()}
    # a is the seed; its direct targets (b, c) hold walk mass; e is
    # two hops out through d and holds strictly less than b
    assert got["a"] > got["b"] > got["e"] >= 0
    assert set(got) == set("abcde")


def test_personalized_pagerank_guards():
    from searchengine_ray.pipelines.graph import personalized_pagerank

    with pytest.raises(ValueError):
        personalized_pagerank(None, seeds=[])
    with pytest.raises(ValueError):
        personalized_pagerank(None, seeds=["a"], iters=-1)


@pytest.mark.usefixtures("ray_session")
def test_empty_graph_yields_typed_empty():
    """An edgeless graph must produce a schema'd empty result from
    every graph operator (the LSH typed-empty rule) — the join path
    cannot key schemaless empty blocks."""
    import ray.data

    from searchengine_ray.pipelines.graph import (pagerank,
                                                  personalized_pagerank)

    empty = ray.data.from_arrow(pa.table({
        "src_host": pa.array([], pa.string()),
        "dst_host": pa.array([], pa.string()),
        "weight": pa.array([], pa.int64())}))
    assert pagerank(empty, iters=2).take_all() == []
    assert personalized_pagerank(empty, seeds=["x"]).take_all() == []
    assert hits(empty, iters=2).take_all() == []
    assert cocitation(empty).take_all() == []
    assert sorted(hits(empty, iters=0).schema().names) == [
        "auth_q", "host", "hub_q"]


@pytest.mark.usefixtures("ray_session")
def test_cluster_representatives_empty_labels():
    import ray.data

    ec = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "cluster": pa.array([], pa.int64())}))
    ed = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    out = cluster_representatives(ec, ed)
    assert out.take_all() == []
    assert sorted(out.schema().names) == [
        "cluster", "n_members", "rep_chars", "rep_doc_id"]


@pytest.mark.usefixtures("ray_session")
def test_graph_ops_random_graphs():
    """Randomized cross-check of hits / cocitation / PPR against the
    naive dict recomputations on dense little multigraph-free graphs
    (fixed seeds — deterministic)."""
    import random

    from searchengine_ray.pipelines.graph import personalized_pagerank

    for seed in (5, 23):
        rng = random.Random(seed)
        hosts = [f"h{i}" for i in range(6)]
        edges = sorted({(rng.choice(hosts), rng.choice(hosts))
                        for _ in range(14)})
        edges = [(s, d, rng.randint(1, 3)) for s, d in edges if s != d]
        if not edges:
            continue
        tbl = pa.table({
            "src_host": [e[0] for e in edges],
            "dst_host": [e[1] for e in edges],
            "weight": pa.array([e[2] for e in edges], pa.int64()),
        })
        global EDGES
        saved = EDGES
        try:
            EDGES = edges
            got = {r["host"]: (r["auth_q"], r["hub_q"])
                   for r in hits(_ds(tbl), iters=2).take_all()}
            assert got == _naive_hits(2), seed
            for mode in ("cocited", "coupled"):
                gotp = {(r["host_a"], r["host_b"], r["n_common"],
                         r["truncated"])
                        for r in cocitation(_ds(tbl),
                                            mode=mode).take_all()}
                assert gotp == _naive_pairs(mode), (seed, mode)
            seeds_set = {edges[0][0]}
            gotr = {r["host"]: r["rank_q"]
                    for r in personalized_pagerank(
                        _ds(tbl), seeds=sorted(seeds_set),
                        iters=2).take_all()}
            assert gotr == _naive_ppr(seeds_set, 2), seed
        finally:
            EDGES = saved


@pytest.mark.usefixtures("ray_session")
def test_host_components_disjoint_clusters():
    import numpy as np

    from searchengine_ray.pipelines.dedup import _hash_tokens
    from searchengine_ray.pipelines.graph import host_components

    # two disjoint clusters {a,b,c} (a->b, b->c) and {x,y} (x->y, y->x)
    tbl = pa.table({
        "src_host": ["a.t", "b.t", "x.t", "y.t"],
        "dst_host": ["b.t", "c.t", "y.t", "x.t"],
        "weight": pa.array([1, 1, 1, 1], pa.int64()),
    })
    got = {r["host"]: r["component"]
           for r in host_components(_ds(tbl)).take_all()}
    h = {s: int(_hash_tokens(pa.array([s]))[0].view(np.int64))
         for s in ("a.t", "b.t", "c.t", "x.t", "y.t")}
    c1 = min(h["a.t"], h["b.t"], h["c.t"])
    c2 = min(h["x.t"], h["y.t"])
    assert got == {"a.t": c1, "b.t": c1, "c.t": c1,
                   "x.t": c2, "y.t": c2}
    assert c1 != c2


@pytest.mark.usefixtures("ray_session")
def test_host_components_empty_graph():
    import ray.data

    from searchengine_ray.pipelines.graph import host_components

    empty = ray.data.from_arrow(pa.table({
        "src_host": pa.array([], pa.string()),
        "dst_host": pa.array([], pa.string()),
        "weight": pa.array([], pa.int64())}))
    assert host_components(empty).take_all() == []


@pytest.mark.usefixtures("ray_session")
def test_dup_clusters_extreme_int64_labels():
    """Regression: the convergence witness must not SUM label values —
    ids near ±2⁶² (e.g. host_components' FNV hashes) overflowed int64
    and dropped Ray into a pickled-object fallback that crawled. The
    witness is now a bounded changed-row count."""
    import ray.data

    from searchengine_ray.pipelines.clusters import dup_clusters

    big = 1 << 62
    pairs = pa.table({
        "doc_a": pa.array([big, big + 1, -big], pa.int64()),
        "doc_b": pa.array([big + 1, big + 2, -big + 5], pa.int64()),
    })
    got = {r["doc_id"]: r["cluster"]
           for r in dup_clusters(
               ray.data.from_arrow(pairs).repartition(2)).take_all()}
    assert got == {big: big, big + 1: big, big + 2: big,
                   -big: -big, -big + 5: -big}

"""BM25 × PageRank-prior blended ranking (query/prior.py).

The blend is quantize-then-integer-multiply, so expectations are
computed by hand from the searcher's own scores and an explicit prior
dict — exact int64 equality, no tolerances."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.query.prior import (NEUTRAL_RANK_Q, host_prior,
                                          search_with_prior)

DOCS = [
    "stream engine merges sorted runs of postings into shards",
    "merge policies and compaction of sorted runs",
    "postings lists compress well with delta gaps",
    "the stream table joins happen before the merge stage",
    "sorted strings tables and log structured merge trees",
]
URLS = [f"https://h{i % 2}.test/p/{i}" for i in range(len(DOCS))]


@pytest.fixture(scope="module")
def index(ray_session, tmp_path_factory):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig

    d = tmp_path_factory.mktemp("prior")
    src = str(d / "docs.parquet")
    pq.write_table(pa.table({
        "url": pa.array(URLS, pa.string()),
        "text": pa.array(DOCS, pa.string()),
    }), src)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(num_shards=2))
    return idx


def _expected(searcher, query, prior, top_n):
    t = searcher.search(query, n=len(DOCS), with_urls=True)
    rows = []
    for doc_id, score, url in zip(t["doc_id"].to_pylist(),
                                  t["score"].to_pylist(),
                                  t["url"].to_pylist()):
        host = url.split("//")[1].split("/")[0]
        q4 = int(np.rint(score * 10_000))
        rows.append((q4 * prior.get(host, NEUTRAL_RANK_Q), doc_id))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return [(i + 1, d, s) for i, (s, d) in enumerate(rows[:top_n])]


def test_blend_reorders_by_host_authority(index):
    from searchengine_ray.query.engine import Searcher

    s = Searcher(index)
    # h0.test gets 3x the authority of h1.test — exact int64 agreement
    # with the hand blend, and h0 docs outrank near-tied h1 docs
    prior = {"h0.test": 3 * 10 ** 9, "h1.test": 10 ** 9}
    got = [(r["rank"], r["doc_id"], r["score_b"])
           for r in search_with_prior(s, "sorted merge", prior,
                                      top_n=4).to_pylist()]
    assert got == _expected(s, "sorted merge", prior, 4)
    top_hosts = {URLS[d].split("//")[1].split("/")[0]
                 for _, d, _ in got[:2]}
    assert top_hosts == {"h0.test"}


def test_neutral_prior_preserves_bm25_order(index):
    from searchengine_ray.query.engine import Searcher

    s = Searcher(index)
    plain = s.search("sorted merge", n=4, with_urls=False)
    got = search_with_prior(s, "sorted merge", {}, top_n=4)
    assert got["doc_id"].to_pylist() == plain["doc_id"].to_pylist()
    # blended score is exactly score_q4 * neutral mass
    q4 = np.rint(np.asarray(plain["score"]) * 10_000).astype(np.int64)
    assert got["score_b"].to_pylist() == (q4 * NEUTRAL_RANK_Q).tolist()


def test_host_fn_override(index):
    from searchengine_ray.query.engine import Searcher

    s = Searcher(index)
    # every doc mapped to one synthetic host: order stays bm25, scores
    # all scaled by that host's mass
    prior = {"only.test": 7 * 10 ** 8}
    got = search_with_prior(
        s, "postings", prior, top_n=3,
        host_fn=lambda ids, urls: ["only.test"] * len(ids))
    plain = s.search("postings", n=3, with_urls=False)
    assert got["doc_id"].to_pylist() == plain["doc_id"].to_pylist()
    q4 = np.rint(np.asarray(plain["score"]) * 10_000).astype(np.int64)
    assert got["score_b"].to_pylist() == (q4 * 7 * 10 ** 8).tolist()


def test_host_prior_collects_pagerank(ray_session):
    import ray.data

    from searchengine_ray.pipelines.graph import pagerank

    edges = ray.data.from_arrow(pa.table({
        "src_host": ["a.test"], "dst_host": ["b.test"],
        "weight": pa.array([1], pa.int64()),
    }))
    d = host_prior(pagerank(edges, iters=1))
    assert set(d) == {"a.test", "b.test"}
    assert d["a.test"] == (15 * 10 ** 9) // 100

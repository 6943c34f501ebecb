"""MMR diversification: near-duplicate results must be demoted below
a distinct relevant doc; greedy selection must match a naive
recomputation from the engine's own primitives."""

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig
from searchengine_ray.query.engine import Searcher
from searchengine_ray.query.mmr import (
    candidate_vectors,
    mmr_search,
    _pair_sim,
)

TEXTS = (
    ["alpha beta alpha beta gamma common phrasing"] * 3   # near-dups
    + ["alpha beta epsilon zeta unrelated wording"]       # distinct
    + [f"filler{i} pad{i} noise{i}" for i in range(30)]
)


@pytest.fixture(scope="module")
def mmr_setup(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("mmr")
    docs = str(d / "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(len(TEXTS))]),
        "text": pa.array(TEXTS, pa.large_string()),
    }), docs)
    idx = str(d / "idx")
    build_index(docs, idx, IndexConfig(num_shards=2, min_token_length=2,
                                       use_stop_words=False,
                                       language=None),
                id_column="doc_id", text_column="text", url_column="url")
    return Searcher(idx), docs


def test_duplicates_demoted(mmr_setup):
    s, docs = mmr_setup
    plain = s.search("alpha beta", 4, with_urls=False)["doc_id"].to_pylist()
    # rel is the RAW (quantized) BM25 score, so the sim penalty (≤1)
    # competes with absolute score gaps — a diversity-heavy lambda
    # makes the effect visible on this corpus
    mmr = mmr_search(s, docs, "alpha beta", n=4, m=10, lam=0.2)
    got = mmr["doc_id"].to_pylist()
    # plain BM25 ranks the three copies first; diversity-weighted MMR
    # pulls the distinct doc 3 ahead of the 2nd duplicate
    assert plain[:3] == [0, 1, 2]
    assert got[0] == 0 and got[1] == 3
    assert set(got) == {0, 1, 2, 3}


def test_matches_naive_greedy(mmr_setup):
    s, docs = mmr_setup
    import numpy as np

    t = s.search("alpha beta", 10, with_urls=False)
    ids = t["doc_id"].to_pylist()
    q4 = np.round(t["score"].to_numpy(zero_copy_only=False)
                  * 10_000).astype(np.int64)
    rel = {d: int(q) / 10000.0 for d, q in zip(ids, q4)}
    vec = candidate_vectors(docs, ids)
    lam = 0.5
    sel, cand = [], sorted(rel)
    while cand and len(sel) < 4:
        scored = []
        for d in cand:
            pen = max((_pair_sim(vec.get(d), vec.get(x)) for x in sel),
                      default=0.0)
            scored.append((-(lam * rel[d] - (1 - lam) * pen), d))
        _, pick = min(scored)
        sel.append(pick)
        cand.remove(pick)
    out = mmr_search(s, docs, "alpha beta", n=4, m=10, lam=lam)
    assert out["doc_id"].to_pylist() == sel


def test_identical_docs_sim_one(mmr_setup):
    _, docs = mmr_setup
    vec = candidate_vectors(docs, [0, 1, 3])
    assert math.isclose(_pair_sim(vec[0], vec[1]), 1.0)
    assert _pair_sim(vec[0], vec[3]) < 0.99

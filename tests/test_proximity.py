"""Proximity (slop) search: slop=0 must equal exact phrase, windows
must behave per the p_k − p1 ≤ (k−1)+slop rule, and counts must match
a naive all-chains reference."""

from itertools import combinations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig, PostingType, RankerType
from searchengine_ray.query.engine import Searcher

TEXTS = [
    "aa bb cc",              # consecutive: phrase + any slop
    "aa xx bb cc",           # aa..bb gap 1: needs slop>=1 for "aa bb"
    "aa xx yy bb",           # gap 2
    "bb aa",                 # wrong order: never matches "aa bb"
    "aa bb aa xx bb",        # two starts for "aa bb" at slop>=1
    "cc dd ee",
    "aa",                    # missing bb
]


@pytest.fixture(scope="module")
def prox_index(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("prox")
    path = str(d / "c.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"u{i}" for i in range(len(TEXTS))]),
        "text": pa.array(TEXTS, pa.large_string()),
    }), path)
    idx = str(d / "idx")
    build_index(path, idx, IndexConfig(
        num_shards=2, min_token_length=2, use_stop_words=False,
        language=None, ranker=RankerType.BM25_OPTIMIZED,
        posting_type=PostingType.POSITIONAL))
    return idx


def _naive_counts(query_terms, slop):
    """All-chains existence per start position, brute force."""
    out = {}
    w = len(query_terms) - 1 + slop
    for doc, text in enumerate(TEXTS):
        toks = text.split()
        pos = {t: [i for i, x in enumerate(toks) if x == t]
               for t in set(query_terms)}
        starts = 0
        for p1 in pos.get(query_terms[0], []):
            def chains(i, cur):
                if i == len(query_terms):
                    return True
                return any(chains(i + 1, p)
                           for p in pos.get(query_terms[i], [])
                           if cur < p <= p1 + w)
            if chains(1, p1):
                starts += 1
        if starts:
            out[doc] = starts
    return out


@pytest.mark.parametrize("slop", [0, 1, 2, 5])
@pytest.mark.parametrize("terms", [["aa", "bb"], ["aa", "bb", "cc"]])
def test_matches_naive(prox_index, terms, slop):
    s = Searcher(prox_index)
    t = s.search_proximity(" ".join(terms), 20, slop=slop)
    got = dict(zip(t["doc_id"].to_pylist(), t["n_matches"].to_pylist()))
    assert got == _naive_counts(terms, slop), (terms, slop)


def test_slop_zero_equals_phrase(prox_index):
    s = Searcher(prox_index)
    for q in ("aa bb", "aa bb cc", "bb cc"):
        a = s.search_proximity(q, 20, slop=0)
        b = s.search_phrase(q, 20)
        assert a.equals(b), q


def test_wrong_order_never_matches(prox_index):
    s = Searcher(prox_index)
    t = s.search_proximity("cc aa", 20, slop=50)
    assert 3 not in t["doc_id"].to_pylist()  # "bb aa" has no cc
    assert t.num_rows == 0

"""Pseudo-relevance feedback: expansion must retrieve docs that share
no term with the original query (the point of PRF), stay deterministic,
and degrade to plain search when the query matches nothing."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig
from searchengine_ray.query.engine import Searcher


@pytest.fixture(scope="module")
def prf_index(tmp_path_factory, ray_session):
    """Docs 0-4 contain the query term 'alpha' alongside 'beta'/'gamma';
    docs 5-9 contain only 'beta'/'gamma' — reachable from the query
    'alpha' only through feedback expansion. Filler docs pad idf."""
    texts = (
        ["alpha beta gamma ocean"] * 5
        + ["beta gamma harbor"] * 5
        + [f"filler{i} noise{i} pad{i}" for i in range(40)]
    )
    d = tmp_path_factory.mktemp("prf")
    path = str(d / "corpus.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "text": pa.array(texts, pa.large_string()),
    }), path)
    idx = str(d / "idx")
    build_index(path, idx, IndexConfig(num_shards=2, min_token_length=2,
                                       use_stop_words=False, language=None))
    return idx


def test_expansion_reaches_disjoint_docs(prf_index):
    s = Searcher(prf_index)
    plain = set(s.search("alpha", 20, with_urls=False)["doc_id"].to_pylist())
    prf = s.search_prf("alpha", 20, fb_docs=3, fb_terms=2)
    got = set(prf["doc_id"].to_pylist())
    assert plain == {0, 1, 2, 3, 4}
    assert {5, 6, 7, 8, 9} <= got          # expansion-only docs retrieved
    assert prf["rank"].to_pylist() == list(range(1, prf.num_rows + 1))
    # deterministic across searcher instances
    again = Searcher(prf_index).search_prf("alpha", 20, fb_docs=3,
                                           fb_terms=2)
    assert prf.equals(again)


def test_no_match_query_degrades_gracefully(prf_index):
    s = Searcher(prf_index)
    t = s.search_prf("zzzqqq", 10)
    assert t.num_rows == 0

"""search_wildcard: trailing-* prefix expansion over the stemmed
index vocabulary (Lucene top-terms scoring_boolean rewrite), scored
as plain BM25 over the distinct expanded term set."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig
from searchengine_ray.query.engine import Searcher

VOCAB = ["spark", "sparse", "spartan", "merge", "merit", "data",
         "join", "joint", "windmill", "window"] \
    + [f"w{i}" for i in range(20)]


@pytest.fixture(scope="module")
def wc_index(tmp_path_factory, ray_session):
    rng = random.Random(11)
    texts = [" ".join(rng.choices(VOCAB, k=rng.randint(4, 25)))
             for _ in range(300)]
    d = tmp_path_factory.mktemp("wc")
    p = str(d / "c.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "text": pa.array(texts, pa.large_string()),
    }), p)
    idx = str(d / "idx")
    build_index(p, idx, IndexConfig(num_shards=3, min_token_length=2,
                                    use_stop_words=False, language=None))
    return idx


def test_wildcard_equals_manual_expansion(wc_index):
    """'spar*' must score identically to the explicit OR of every
    index term with that prefix (each at query-tf 1)."""
    s = Searcher(wc_index)
    terms = s.expand_prefix("spar")
    assert set(terms) == {"spark", "sparse", "spartan"}
    a = s.search_wildcard("spar* data", 10, with_urls=False)
    ids, scores = s.search_tokens(
        [t for t in terms] + ["data"], 10)
    assert a["doc_id"].to_pylist() == list(ids)
    assert a["score"].to_pylist() == list(scores)


def test_wildcard_plain_query_equals_search(wc_index):
    """No wildcard in the query → identical to plain search()."""
    s = Searcher(wc_index)
    a = s.search_wildcard("merge data", 10, with_urls=False)
    b = s.search("merge data", 10, with_urls=False)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_wildcard_expansion_cap_is_df_ranked(wc_index):
    """max_expansions keeps the highest-df prefix matches (ties term
    asc) and logs the drop; 'w*' spans w0..w19 + window + windmill."""
    s = Searcher(wc_index)
    full = s.expand_prefix("w")
    capped = s.expand_prefix("w", max_expansions=5)
    assert len(full) == 22 and capped == full[:5]


def test_wildcard_no_match_prefix_is_empty(wc_index):
    s = Searcher(wc_index)
    assert s.expand_prefix("zzz") == []
    t = s.search_wildcard("zzz*", 10, with_urls=False)
    assert t.num_rows == 0
    assert sorted(t.column_names) == ["doc_id", "rank", "score"]


def test_wildcard_bare_star_is_plain_token(wc_index):
    """A lone '*' (no prefix) is not a wildcard; it tokenizes away —
    combined with a real term the query still works."""
    s = Searcher(wc_index)
    a = s.search_wildcard("* merge", 10, with_urls=False)
    b = s.search("merge", 10, with_urls=False)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()


def test_wildcard_urls_attached(wc_index):
    s = Searcher(wc_index)
    t = s.search_wildcard("spar*", 3)
    assert t.num_rows == 3 and all(
        u.startswith("u") for u in t["url"].to_pylist())

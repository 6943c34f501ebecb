"""End-to-end golden-relevance evaluation — the reference's real
correctness instrument (``queries.relevance.txt`` + the
``efficiency.py:94-147`` loop), reproduced over a committed fixture.

The fixture (tests/fixtures/queries.relevance.txt, reference text
format) was generated ONCE by an engine-independent content rule —
summed query-term frequency / doc length over the sf0.001 corpus,
graded 3/2/1 by rank band — and is frozen; the goldens below pin the
whole chain (build → tokenize → BM25 → top-k → url join → P/R/F1/NDCG)
to six decimal places.
"""

import pytest

from searchengine_ray.config import IndexConfig

FIXTURE = "tests/fixtures/queries.relevance.txt"

# frozen goldens (BM25 k1=1.2 b=0.75, full tokenizer, n=10)
GOLDEN = {
    "precision": 0.683333,
    "recall": 0.227778,
    "f1": 0.341667,
    "ndcg": 0.317109,
}


@pytest.fixture(scope="module")
def golden_index(ray_session, tmp_path_factory):
    from searchengine_ray.build.pipeline import build_index

    idx = str(tmp_path_factory.mktemp("golden") / "idx")
    build_index(
        "/root/testdata/sf0.001/documents.parquet", idx,
        IndexConfig(num_shards=2),
        id_column="doc_id", text_column="text", url_column=None,
    )
    return idx


def test_relevance_file_parses():
    from searchengine_ray.eval.metrics import load_relevance_txt

    parsed = load_relevance_txt(FIXTURE)
    assert len(parsed) == 6
    for q, rels in parsed:
        assert q and rels
        assert set(rels.values()) <= {1, 2, 3}


def test_golden_evaluation_end_to_end(golden_index):
    from searchengine_ray.eval.metrics import evaluate_relevance_file
    from searchengine_ray.query.engine import Searcher

    res = evaluate_relevance_file(Searcher(golden_index), FIXTURE, n=10)
    assert len(res["per_query"]) == 6
    for k, v in GOLDEN.items():
        assert res[k] == pytest.approx(v, abs=5e-7), (k, res[k])
    assert res["queries_per_sec"] > 0


def test_golden_evaluation_wand_identical(golden_index):
    """WAND serving path yields the same metrics (score-preserving)."""
    from searchengine_ray.eval.metrics import evaluate_relevance_file
    from searchengine_ray.query.engine import Searcher

    res = evaluate_relevance_file(
        Searcher(golden_index, use_wand=True), FIXTURE, n=10
    )
    for k, v in GOLDEN.items():
        assert res[k] == pytest.approx(v, abs=5e-7), (k, res[k])

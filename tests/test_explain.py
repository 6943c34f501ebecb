"""explain: contributions sum (in token order) to the exact search
score; non-BM25 rankers refuse."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig, RankerType
from searchengine_ray.query.engine import Searcher


@pytest.fixture(scope="module")
def exp_index(tmp_path_factory, ray_session):
    import random

    rng = random.Random(7)
    vocab = ["fast", "spark", "merge", "join", "data"] \
        + [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(4, 25)))
             for _ in range(300)]
    d = tmp_path_factory.mktemp("exp")
    p = str(d / "c.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "text": pa.array(texts, pa.large_string()),
    }), p)
    idx = str(d / "idx")
    build_index(p, idx, IndexConfig(num_shards=2, min_token_length=2,
                                    use_stop_words=False, language=None))
    return idx


def test_contribs_sum_to_score(exp_index):
    s = Searcher(exp_index)
    for q in ("fast spark", "merge data join", "fast fast w3"):
        top = s.search(q, 5, with_urls=False)
        for d, score in zip(top["doc_id"].to_pylist(),
                            top["score"].to_pylist()):
            ex = s.explain(q, d)
            assert ex.num_rows >= 1
            total = 0.0
            for c in ex["contrib"].to_pylist():
                total += c                  # token order == fold order
            assert total == score, (q, d)   # bit-exact


def test_non_bm25_refused(exp_index):
    s = Searcher(exp_index, ranker=RankerType.RAW)
    with pytest.raises(ValueError, match="BM25"):
        s.explain("fast", 0)
    # unmatched doc → empty table, still well-formed
    sb = Searcher(exp_index)
    assert sb.explain("zzzz", 0).num_rows == 0

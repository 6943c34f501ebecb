"""QueryActor modes: every distributed batch mode must equal the
one-shot Searcher call, including empty-result batches (stable
schema)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig, PostingType, RankerType
from searchengine_ray.query.engine import Searcher, search_dataset


@pytest.fixture(scope="module")
def mode_index(tmp_path_factory, ray_session):
    texts = ["fast spark merge", "slow merge join", "stream data fast",
             "window stream", "fast fast spark", "data engine"] * 10
    d = tmp_path_factory.mktemp("modes")
    p = str(d / "c.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "text": pa.array(texts, pa.large_string()),
    }), p)
    idx = str(d / "idx")
    build_index(p, idx, IndexConfig(num_shards=2, min_token_length=2,
                                    use_stop_words=False, language=None,
                                    ranker=RankerType.BM25_OPTIMIZED,
                                    posting_type=PostingType.POSITIONAL))
    return idx


QUERIES = ["fast spark", "stream data", "zzz missing"]


@pytest.mark.parametrize("mode", ["phrase", "proximity", "boolean"])
def test_bulk_mode_equals_oneshot(mode_index, mode):
    import ray

    qds = ray.data.from_arrow(pa.table({
        "query_id": pa.array(range(len(QUERIES)), pa.int64()),
        "query": pa.array(QUERIES, pa.string()),
    })).repartition(2)
    got = search_dataset(qds, mode_index, n=5, mode=mode) \
        .to_pandas().sort_values(["query_id"] + (
            ["rank"] if mode != "boolean" else ["doc_id"])) \
        .reset_index(drop=True)
    s = Searcher(mode_index)
    rows = []
    for qid, q in enumerate(QUERIES):
        if mode == "phrase":
            r = s.search_phrase(q, 5)
        elif mode == "proximity":
            r = s.search_proximity(q, 5)
        else:
            r = s.search_boolean_expr(q, 5)
        for row in r.to_pylist():
            rows.append({"query_id": qid, **row})
    import pandas as pd

    want = pd.DataFrame(rows, columns=list(got.columns))
    want = want.sort_values(list(got.columns[:2])).reset_index(drop=True)
    assert len(got) == len(want)
    for c in got.columns:
        assert got[c].astype("int64" if got[c].dtype.kind in "iu"
                             else got[c].dtype).tolist() \
            == want[c].tolist(), (mode, c)

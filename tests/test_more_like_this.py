"""more_like_this: cluster retrieval, seed exclusion, doc_terms
forward-index lookup."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXTS = [
    "apple banana cherry fruit salad",          # 0 cluster F
    "banana apple fruit smoothie",              # 1 cluster F
    "cherry apple fruit pie",                   # 2 cluster F
    "engine piston turbo exhaust",              # 3 cluster C
    "turbo engine exhaust manifold",            # 4 cluster C
    "piston turbo engine block",                # 5 cluster C
    "zebra quark xylophone",                    # 6 loner
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig

    d = tmp_path_factory.mktemp("mlt")
    src = str(d / "pages.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"https://t/{i}" for i in range(len(TEXTS))]),
        "text": pa.array(TEXTS, pa.string()),
    }), src)
    out = str(d / "idx")
    build_index(src, out, IndexConfig(
        num_shards=2, use_stop_words=False, min_token_length=2,
        language=None,
    ))
    return out


def test_doc_terms_roundtrip(ray_session, idx):
    from searchengine_ray.query.engine import Searcher

    terms, tfs = Searcher(idx).doc_terms(0)
    assert dict(zip(terms, tfs)) == {
        "apple": 1, "banana": 1, "cherry": 1, "fruit": 1, "salad": 1}
    with pytest.raises(KeyError):
        Searcher(idx).doc_terms(999)


def test_mlt_returns_same_cluster_first(ray_session, idx):
    from searchengine_ray.query.engine import Searcher

    s = Searcher(idx)
    for seed, cluster in ((0, {1, 2}), (4, {3, 5})):
        got = s.more_like_this(seed, n=2)
        ids = got["doc_id"].to_pylist()
        assert seed not in ids
        assert set(ids) == cluster, (seed, ids)
        assert got["rank"].to_pylist() == [1, 2]
        assert all(u.startswith("https://t/") for u in
                   got["url"].to_pylist())

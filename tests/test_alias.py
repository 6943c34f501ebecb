"""Serving alias: atomic swap, pass-through for dirs, guards."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig
from searchengine_ray.query.engine import Searcher
from searchengine_ray.state.alias import resolve_alias, set_alias


@pytest.fixture(scope="module")
def two_indexes(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("alias")
    out = []
    for name, text in (("a", "apple orange"), ("b", "banana kiwi")):
        p = str(d / f"{name}.parquet")
        pq.write_table(pa.table({
            "url": pa.array([f"{name}{i}" for i in range(5)]),
            "text": pa.array([text] * 5, pa.large_string()),
        }), p)
        idx = str(d / f"idx_{name}")
        build_index(p, idx, IndexConfig(num_shards=1, min_token_length=2,
                                        use_stop_words=False,
                                        language=None))
        out.append(idx)
    return str(d / "live.json"), out[0], out[1]


def test_swap_is_atomic_and_pinned(two_indexes):
    alias, ia, ib = two_indexes
    set_alias(alias, ia)
    s1 = Searcher(alias)
    assert s1.search("apple", 5).num_rows == 5
    set_alias(alias, ib)               # blue/green swap
    assert s1.search("apple", 5).num_rows == 5   # pinned old index
    s2 = Searcher(alias)
    assert s2.search("apple", 5).num_rows == 0
    assert s2.search("banana", 5).num_rows == 5
    # plain directories pass through untouched
    assert resolve_alias(ia) == ia


def test_alias_guards(two_indexes, tmp_path):
    alias, ia, _ = two_indexes
    with pytest.raises(ValueError, match="manifest"):
        set_alias(str(tmp_path / "x.json"), str(tmp_path))
    chain = str(tmp_path / "chain.json")
    set_alias(chain, ia)
    other = str(tmp_path / "outer.json")
    import json

    with open(other, "w") as f:
        json.dump({"index_dir": chain}, f)
    with pytest.raises(ValueError, match="chains"):
        resolve_alias(other)

"""Prefix suggest: df ordering, tie rule, shard-range routing."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig
from searchengine_ray.query.engine import Searcher


@pytest.fixture(scope="module")
def sugg_index(tmp_path_factory, ray_session):
    texts = (["apple apply banana"] * 5 + ["apple apricot"] * 3
             + ["banana grape"] * 7 + ["appliance"] * 2)
    d = tmp_path_factory.mktemp("sugg")
    p = str(d / "c.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "text": pa.array(texts, pa.large_string()),
    }), p)
    idx = str(d / "idx")
    build_index(p, idx, IndexConfig(num_shards=3, min_token_length=2,
                                    use_stop_words=False, language=None))
    return Searcher(idx)


def test_prefix_df_order(sugg_index):
    got = sugg_index.suggest("ap", k=10).to_pylist()
    # df: apple 8, apply 5, apricot 3, appliance 2 (stemless cfg)
    assert [(r["term"], r["df"]) for r in got] == [
        ("apple", 8), ("apply", 5), ("apricot", 3), ("appliance", 2)]
    assert sugg_index.suggest("banana", k=5).to_pylist() == [
        {"term": "banana", "df": 12}]
    assert sugg_index.suggest("zz", k=5).num_rows == 0


def test_top_k_cut_and_case(sugg_index):
    assert sugg_index.suggest("AP", k=2).to_pylist() == [
        {"term": "apple", "df": 8}, {"term": "apply", "df": 5}]

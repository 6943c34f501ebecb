"""Evaluation metrics (reference efficiency.py semantics)."""

import math

import pyarrow as pa

from searchengine_ray.eval.metrics import ndcg, precision_recall_f1


def test_precision_recall_f1():
    p, r, f = precision_recall_f1([1, 2, 3, 4], {1, 2, 9})
    assert p == 2 / 4
    assert r == 2 / 3
    assert f == 2 * p * r / (p + r)
    assert precision_recall_f1([], {1}) == (0.0, 0.0, 0.0)
    assert precision_recall_f1([1], set()) == (1 / 1 * 0 + 0.0, 0.0, 0.0)


def test_ndcg_perfect_order():
    rels = {1: 3, 2: 2, 3: 1}
    assert ndcg([1, 2, 3], rels) == 1.0
    worse = ndcg([3, 2, 1], rels)
    assert 0 < worse < 1.0


def test_ndcg_formula():
    rels = {7: 2}
    got = ndcg([5, 7], rels)
    dcg = (2**2 - 1) / math.log2(1 + 2)
    idcg = (2**2 - 1) / math.log2(0 + 2)
    assert got == dcg / idcg


def test_evaluate_end_to_end(ray_session, tmp_path):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.eval.metrics import evaluate
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.sources.pages import materialize_pages

    pages = materialize_pages("/root/testdata/sf0.001", str(tmp_path / "p"), 2)
    idx = str(tmp_path / "idx")
    build_index(pages, idx, IndexConfig(num_shards=2))
    s = Searcher(idx)
    top = s.search("fast spark join", 3)
    qrels = pa.table({
        "query_id": pa.array([0, 0], pa.int64()),
        "doc_id": pa.array(top["doc_id"].to_pylist()[:2], pa.int64()),
        "relevance": pa.array([3, 2], pa.int32()),
    })
    out = evaluate(s, {0: "fast spark join"}, qrels, n=3)
    assert out["precision"] == 2 / 3
    assert out["recall"] == 1.0
    assert out["ndcg"] == 1.0
    assert out["queries_per_sec"] > 0


def test_mrr_and_map_hand_computed():
    from searchengine_ray.eval.metrics import (
        average_precision,
        reciprocal_rank,
    )

    rel = {2, 5, 9}
    ret = [7, 2, 3, 5, 1]
    assert reciprocal_rank(ret, rel) == 1 / 2
    # AP: hits at ranks 2 (1/2) and 4 (2/4), |relevant| = 3
    assert average_precision(ret, rel) == (1 / 2 + 2 / 4) / 3
    assert reciprocal_rank([7, 3], rel) == 0.0
    assert average_precision([], rel) == 0.0
    assert average_precision([2], set()) == 0.0
    # perfect ranking: RR = 1, AP = 1
    assert reciprocal_rank([2, 5, 9], rel) == 1.0
    assert average_precision([2, 5, 9], rel) == 1.0


def test_rbo_properties():
    from searchengine_ray.eval.metrics import rbo

    # identical lists → 1 (geometric sum telescopes exactly)
    assert abs(rbo([1, 2, 3], [1, 2, 3]) - 1.0) < 1e-12
    assert rbo([], []) == 1.0
    assert rbo([1, 2], []) == 0.0
    # disjoint → 0
    assert rbo([1, 2, 3], [4, 5, 6]) == 0.0
    # a swap near the top hurts more than one near the bottom
    base = list(range(10))
    top_swap = [1, 0] + base[2:]
    bot_swap = base[:8] + [9, 8]
    assert rbo(base, top_swap) < rbo(base, bot_swap)
    # hand-computed: a=[1,2], b=[1,3], p=0.5
    # d1: overlap 1 → 0.5*1/1; d2: overlap still 1 → 0.25*1/2
    # rbo = (0.5/0.5)*(0.5 + 0.125) + 0.25*1/2 = 0.75
    assert abs(rbo([1, 2], [1, 3], p=0.5) - 0.75) < 1e-12
    # symmetric
    assert rbo([1, 2, 3], [2, 1, 4]) == rbo([2, 1, 4], [1, 2, 3])

"""RRF fusion: hand-computed scores, rank-only behavior, tie rule."""

import numpy as np
import pyarrow as pa

from searchengine_ray.query.fusion import rrf_fuse


def _tbl(pairs):
    return pa.table({
        "rank": pa.array([r for r, _ in pairs], pa.int32()),
        "doc_id": pa.array([d for _, d in pairs], pa.int64()),
    })


def test_hand_computed():
    a = _tbl([(1, 10), (2, 20), (3, 30)])
    b = _tbl([(1, 20), (2, 40)])
    out = rrf_fuse([a, b], n=10)
    got = dict(zip(out["doc_id"].to_pylist(), out["rrf_q6"].to_pylist()))
    want = {
        10: int(np.round(1 / 61 * 1e6)),
        20: int(np.round((1 / 62 + 1 / 61) * 1e6)),
        30: int(np.round(1 / 63 * 1e6)),
        40: int(np.round(1 / 62 * 1e6)),
    }
    assert got == want
    # doc 20 appears in both lists → first
    assert out["doc_id"][0].as_py() == 20


def test_scores_ignored_and_ties_doc_asc():
    # identical ranks in two lists → tie broken by doc_id ascending
    a = _tbl([(1, 7)])
    b = _tbl([(1, 3)])
    out = rrf_fuse([a, b], n=10)
    assert out["doc_id"].to_pylist() == [3, 7]
    assert out["rrf_q6"][0] == out["rrf_q6"][1]


def test_empty_and_topn():
    assert rrf_fuse([], n=5).num_rows == 0
    a = _tbl([(i, i) for i in range(1, 20)])
    out = rrf_fuse([a], n=5)
    assert out.num_rows == 5
    assert out["rank"].to_pylist() == [1, 2, 3, 4, 5]

"""Bounded-fold tests (pipelines/fold.py): the distributed hash-exchange
fold must be value-identical to the driver fold, and must never fan the
unpruned partial set into the driver (VERDICT r03 "What's wrong #1")."""

import numpy as np
import pyarrow as pa
import pytest


def _with_ids(ds):
    import ray.data

    tbl = pa.Table.from_pandas(ds.to_pandas())
    tbl = tbl.append_column(
        "doc_id", pa.array(np.arange(tbl.num_rows, dtype=np.int64))
    )
    return ray.data.from_arrow(tbl.select(["doc_id", "text"]))


def _norm(t: pa.Table):
    return t.sort_by([(c, "ascending") for c in t.column_names]).to_pydict()


def test_lm_fold_modes_identical(ray_session):
    import ray.data

    from searchengine_ray.pipelines.lm import bigram_lm_train

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    for mc in (1, 2):
        uni_d, bi_d, v_d = bigram_lm_train(docs, min_count=mc,
                                           fold_mode="driver")
        uni_x, bi_x, v_x = bigram_lm_train(docs, min_count=mc,
                                           fold_mode="distributed")
        assert v_d == v_x
        assert _norm(uni_d) == _norm(uni_x)
        assert _norm(bi_d) == _norm(bi_x)


def test_keywords_fold_modes_identical(ray_session):
    import ray.data

    from searchengine_ray.pipelines.analysis import keywords_topk

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    kd = keywords_topk(docs, k=3, fold_mode="driver").take_all()
    kx = keywords_topk(docs, k=3, fold_mode="distributed").take_all()
    key = lambda r: (r["doc_id"], r["rank"])
    assert sorted(kd, key=key) == sorted(kx, key=key)


def test_keywords_single_scan_ndocs(ray_session):
    """The doc count is folded into the df-partials pass (sentinel row);
    zero-token docs still count toward N (idf must use the true corpus
    size)."""
    import math

    import ray.data

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(
            ["apple banana apple", "banana cherry", "", "!!"], pa.string()
        ),
    })
    from searchengine_ray.pipelines.analysis import keywords_topk

    out = keywords_topk(ray.data.from_arrow(docs), k=2).take_all()
    by = {(r["doc_id"], r["term"]): r["score_q4"] for r in out}
    # N=4 (empty docs included): idf(apple)=round(ln(4/1),3)
    assert by[(0, "apple")] == round(
        2 * round(math.log(4 / 1), 3) * 10_000
    )
    assert by[(1, "banana")] == round(
        1 * round(math.log(4 / 2), 3) * 10_000
    )
    assert not any(r["doc_id"] in (2, 3) for r in out)


def test_distributed_fold_driver_bounded(ray_session, tmp_path, monkeypatch):
    """On a realistic-vocabulary Zipf corpus, the distributed fold's
    driver only ever materializes the PRUNED bucket outputs — no table
    the size of the raw partial set ever crosses ray.get on the
    driver."""
    import ray
    import ray.data

    from searchengine_ray.pipelines.lm import (
        _counts_partial,
        bigram_lm_train,
    )
    from tools.zipf_bench import make_corpus

    paths = make_corpus(str(tmp_path / "zipf"), 1200, 2500, files=4)
    raw = ray.data.read_parquet(paths)
    docs = _with_ids(raw)

    raw_partial_rows = docs.map_batches(
        _counts_partial, batch_format="pyarrow"
    ).count()

    fetched: list[int] = []
    real_get = ray.get

    def spy(refs, **kw):
        out = real_get(refs, **kw)
        seq = out if isinstance(out, list) else [out]
        for t in seq:
            if isinstance(t, pa.Table):
                fetched.append(t.num_rows)
        return out

    monkeypatch.setattr(ray, "get", spy)
    uni, bi, v = bigram_lm_train(docs, min_count=3,
                                 fold_mode="distributed")
    monkeypatch.undo()

    pruned_rows = uni.num_rows + bi.num_rows
    # the floor must actually prune on this corpus, else the bound is
    # vacuous
    assert pruned_rows < raw_partial_rows / 3
    assert fetched, "driver fetched no fold outputs?"
    assert sum(fetched) == pruned_rows
    # and the distributed result matches the driver fold
    uni_d, bi_d, v_d = bigram_lm_train(docs, min_count=3,
                                       fold_mode="driver")
    assert (v, _norm(uni), _norm(bi)) == (v_d, _norm(uni_d), _norm(bi_d))


def test_fold_empty_and_sentinel_edge(ray_session):
    """All-empty text: fold still returns typed tables; keywords yields
    zero rows without error."""
    import ray.data

    from searchengine_ray.pipelines.analysis import keywords_topk
    from searchengine_ray.pipelines.lm import bigram_lm_train

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["", "?!"], pa.string()),
    })
    ds = ray.data.from_arrow(docs)
    for mode in ("driver", "distributed"):
        uni, bi, v = bigram_lm_train(ds, fold_mode=mode)
        assert v == 0 and uni.num_rows == 0 and bi.num_rows == 0
        assert keywords_topk(ds, k=2, fold_mode=mode).take_all() == []

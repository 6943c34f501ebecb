"""weighted_sample (Efraimidis-Spirakis A-ES): exact size,
partitioning independence, naive-reference equality, and weight
proportionality (longer docs drawn more often across salts)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.pipelines.curate import weighted_sample


def _table(n):
    # lengths spread over two orders of magnitude so weighting matters
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x" * (1 + (i * 37) % 200) for i in range(n)],
                         pa.string()),
    })


def _ds(n, parts):
    import ray

    return ray.data.from_arrow(_table(n)).repartition(parts)


def _naive(tbl, k, salt="wsample"):
    """Single-process reference: full A-ES keys, no prune."""
    from searchengine_ray.pipelines.analysis import _splitmix64
    from searchengine_ray.pipelines.dedup import _hash_tokens

    doc = tbl["doc_id"].to_numpy()
    w = np.maximum(
        np.asarray([len(t) for t in tbl["text"].to_pylist()], np.int64), 1)
    keys = pa.array([f"{salt}:{d}" for d in doc], pa.string())
    h = _splitmix64(_hash_tokens(keys))
    lk = np.asarray([math.log((int(x) + 0.5) / 2.0 ** 64) for x in h],
                    np.float64) / w
    top = np.lexsort((doc, -lk))[:k]
    return [(int(doc[i]), int(w[i]), int(np.round(lk[i] * 1e6)))
            for i in top]


@pytest.mark.usefixtures("ray_session")
def test_matches_naive_and_partition_independent():
    want = _naive(_table(400), k=30)
    a = weighted_sample(_ds(400, 1), k=30).to_pylist()
    b = weighted_sample(_ds(400, 7), k=30).to_pylist()
    got = [(r["doc_id"], r["w"], r["key_q6"]) for r in a]
    assert got == want
    assert a == b
    assert len({r["doc_id"] for r in a}) == 30


@pytest.mark.usefixtures("ray_session")
def test_weight_proportional_inclusion():
    # across many independent salts, long docs must be picked more
    # often than short ones (the point of weighted sampling)
    ds = _ds(200, 3)
    long_ids = {i for i in range(200) if 1 + (i * 37) % 200 > 150}
    hits_long = hits_short = 0
    for s in range(8):
        picked = {r["doc_id"]
                  for r in weighted_sample(ds, k=40,
                                           salt=f"s{s}").to_pylist()}
        hits_long += len(picked & long_ids)
        hits_short += len(picked - long_ids)
    n_long = len(long_ids)
    # per-doc hit rate: long docs should beat short docs clearly
    assert hits_long / n_long > 1.5 * (hits_short / (200 - n_long))


@pytest.mark.usefixtures("ray_session")
def test_k_overflow_returns_all():
    allrows = weighted_sample(_ds(25, 4), k=100).to_pylist()
    assert sorted(r["doc_id"] for r in allrows) == list(range(25))

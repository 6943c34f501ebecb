"""Feature-hashing vectorizer: sparse integer rows vs a naive
reference, and the dense variant feeding cosine similarity end-to-end."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.pipelines.dedup import _hash_tokens
from searchengine_ray.pipelines.vectorize import (
    hash_vectorize_batch,
    hash_vectorize_dense,
)

DIM = 64


def _simple_toks(text):
    toks = re.sub(r"[^\w\s]", " ", text).lower().split()
    return [t for t in toks if len(t) >= 2]


def _naive(texts):
    rows = set()
    for d, text in enumerate(texts):
        acc = Counter()
        for t in _simple_toks(text):
            h = int(_hash_tokens(pa.array([t]))[0])
            sgn = 1 if ((h // DIM) & 1) == 1 else -1
            acc[h % DIM] += sgn
        acc = {k: v for k, v in acc.items() if v != 0}
        nsq = sum(v * v for v in acc.values())
        for k, v in acc.items():
            rows.add((d, k, v, nsq))
    return sorted(rows)


TEXTS = ["fast spark join merge", "fast spark join merge extra",
         "totally different words here", "fast fast fast", ""]


def test_sparse_matches_naive():
    t = hash_vectorize_batch(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }), dim=DIM)
    got = sorted(zip(*(t[c].to_pylist()
                       for c in ("doc_id", "dim", "c", "norm_sq"))))
    assert got == _naive(TEXTS)


def test_lsh_planes_are_order_independent():
    """Regression for the ~1/7 full-suite near-dup flake: hyperplanes
    must be a pure function of dim. The old implementation drew them
    lazily from a shared module-level RandomState STREAM, so a reused
    Ray worker that had already generated planes for some other test's
    dim produced different dim-64 planes than a fresh worker — the two
    halves of a duplicate pair then hashed to different buckets and the
    candidate silently vanished. Emulate the worker-reuse history by
    clearing the cache between draws: planes for a dim must not depend
    on which dims were generated before it."""
    from searchengine_ray.pipelines import similarity as sim

    saved = sim._PLANES
    try:
        sim._PLANES = None
        fresh = sim._planes(64).copy()          # fresh worker: dim 64 first
        sim._PLANES = None
        sim._planes(16)                         # reused worker: other dim…
        sim._PLANES = None
        reused = sim._planes(64).copy()         # …then dim 64
        np.testing.assert_array_equal(fresh, reused)
    finally:
        sim._PLANES = saved


@pytest.mark.usefixtures("ray_session")
def test_composes_with_embedding_near_dup():
    """Raw text → hashed vectors → the existing embedding near-dup
    operator, end to end: near-identical docs pair up, unrelated ones
    do not."""
    import ray

    from searchengine_ray.pipelines.similarity import embedding_near_dup

    texts = ["fast spark join merge stream table",
             "fast spark join merge stream table extra",
             "completely unrelated vocabulary entirely elsewhere",
             "another disjoint set of rare tokens"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    vecs = hash_vectorize_dense(ds, dim=DIM)
    pairs = {(r["doc_a"], r["doc_b"])
             for r in embedding_near_dup(vecs, threshold=0.8).take_all()}
    # diagnostics on failure: this test flaked ~2/7 FULL-suite runs
    # (never standalone or in its file neighborhood) — if it fires
    # again, the context below localizes which stage went wrong
    if pairs != {(0, 1)}:
        from searchengine_ray.pipelines.similarity import (
            lsh_candidate_pairs,
        )

        cand = lsh_candidate_pairs(
            hash_vectorize_dense(ds, dim=DIM)).take_all()
        rows = sorted(hash_vectorize_dense(ds, dim=DIM).take_all(),
                      key=lambda r: r["vec_id"])
        m = np.array([r["embedding"] for r in rows], dtype=np.float64)
        msg = (f"pairs={sorted(pairs)} cand={cand} "
               f"sim01={float(m[0] @ m[1]):.4f} "
               f"norms={np.linalg.norm(m, axis=1).round(4).tolist()}")
        # persist the diagnosis — log tails of CI-style runs truncate
        # the traceback, and this fires ~1/7 full-suite runs only
        import json as _json

        with open("/tmp/graft_flake_diag.json", "a") as fh:
            fh.write(_json.dumps({"msg": msg}) + "\n")
        raise AssertionError(msg)


@pytest.mark.usefixtures("ray_session")
def test_dense_vectors_rank_similar_docs():
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })).repartition(2)
    rows = sorted(hash_vectorize_dense(ds, dim=DIM).take_all(),
                  key=lambda r: r["vec_id"])
    mat = np.array([r["embedding"] for r in rows[:4]], dtype=np.float64)
    # unit norms for non-empty docs
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0)
    sims = mat @ mat.T
    # near-duplicate docs 0/1 are far more similar than unrelated 0/2
    assert sims[0, 1] > 0.8 > sims[0, 2]
    # empty doc yields a zero vector
    assert not any(rows[4]["embedding"])

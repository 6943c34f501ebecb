"""KMV distinct estimate: exact regime, estimate regime accuracy,
partitioning independence."""

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.pipelines.analysis import vocab_kmv_estimate


def _ds(texts, parts=4):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(parts)


@pytest.mark.usefixtures("ray_session")
def test_exact_regime():
    texts = ["aa bb cc", "bb cc dd", "ee"]
    r = vocab_kmv_estimate(_ds(texts), k=1024).to_pylist()[0]
    assert r["k_used"] == 5 and r["est_distinct"] == 5


@pytest.mark.usefixtures("ray_session")
def test_estimate_regime_accuracy_and_partition_independence():
    rng = np.random.default_rng(2)
    vocab = [f"w{i:05d}" for i in range(5000)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(400)]
    true = len({t for tx in texts for t in tx.split()})
    r1 = vocab_kmv_estimate(_ds(texts, 1), k=512).to_pylist()[0]
    r8 = vocab_kmv_estimate(_ds(texts, 8), k=512).to_pylist()[0]
    assert r1 == r8                      # deterministic across layouts
    assert r1["k_used"] == 512
    # KMV relative error ~ 1/sqrt(k) ≈ 4.4%; allow 4 sigma
    assert abs(r1["est_distinct"] - true) / true < 0.18


@pytest.mark.usefixtures("ray_session")
def test_empty_corpus():
    r = vocab_kmv_estimate(_ds(["", ""]), k=16).to_pylist()[0]
    assert r["est_distinct"] == 0 and r["k_used"] == 0

"""DSIR importance scoring vs a naive pure-Python reference."""

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.pipelines.dsir import dsir_scores, dsir_train


def _simple_toks(text: str) -> list[str]:
    toks = re.sub(r"[^\w\s]", " ", text).lower().split()
    return [t for t in toks if len(t) >= 2]


def _naive(texts, sources, target):
    ct, cr = Counter(), Counter()
    for text, s in zip(texts, sources):
        (ct if s == target else cr).update(_simple_toks(text))
    vocab = set(ct) | set(cr)
    v, nt, nr = len(vocab), sum(ct.values()), sum(cr.values())

    def q(t):
        return int(np.round((math.log((ct[t] + 1) / (nt + v))
                             - math.log((cr[t] + 1) / (nr + v))) * 1e6))

    out = []
    for d, text in enumerate(texts):
        toks = _simple_toks(text)
        out.append({"doc_id": d, "n_tokens": len(toks),
                    "dsir_q6": sum(q(t) for t in toks)})
    return out


def _ds(texts, sources, parts=4):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(sources, pa.string()),
    })).repartition(parts)


TEXTS = [
    "wiki facts wiki science",
    "spam click spam buy buy",
    "science facts method",
    "buy click now",
    "wiki method science facts",
    "",                          # empty doc scores 0
]
SOURCES = ["wiki", "web", "wiki", "web", "web", "web"]


@pytest.mark.usefixtures("ray_session")
def test_dsir_matches_naive_and_partitioning_invariant():
    want = sorted(_naive(TEXTS, SOURCES, "wiki"),
                  key=lambda r: r["doc_id"])
    for parts in (1, 4):
        got = sorted(
            dsir_scores(_ds(TEXTS, SOURCES, parts),
                        target_value="wiki").take_all(),
            key=lambda r: r["doc_id"],
        )
        assert got == want, parts
    # target-domain docs outrank off-domain docs
    by_id = {r["doc_id"]: r["dsir_q6"] for r in want}
    assert min(by_id[0], by_id[2]) > max(by_id[1], by_id[3])


@pytest.mark.usefixtures("ray_session")
def test_dsir_select_topk():
    from searchengine_ray.pipelines.dsir import dsir_select

    want = sorted(_naive(TEXTS, SOURCES, "wiki"),
                  key=lambda r: (-r["dsir_q6"], r["doc_id"]))[:3]
    got = dsir_select(_ds(TEXTS, SOURCES), target_value="wiki",
                      k=3).to_pylist()
    assert got == want
    assert dsir_select(_ds(TEXTS, SOURCES), target_value="wiki",
                       k=100).num_rows == len(TEXTS)


@pytest.mark.usefixtures("ray_session")
def test_dsir_min_count_floors_to_oov():
    vocab, q, q_oov = dsir_train(_ds(TEXTS, SOURCES),
                                 target_value="wiki", min_count=3)
    kept = set(vocab.to_pylist())
    full = Counter()
    for t in TEXTS:
        full.update(_simple_toks(t))
    assert kept == {t for t, c in full.items() if c >= 3}
    assert len(q) == len(kept)
    assert isinstance(q_oov, int)


@pytest.mark.usefixtures("ray_session")
def test_dsir_sample_gumbel():
    from searchengine_ray.pipelines.dsir import dsir_sample, dsir_select

    # partitioning-independent and deterministic
    a = dsir_sample(_ds(TEXTS, SOURCES, 1), target_value="wiki",
                    k=3).to_pylist()
    b = dsir_sample(_ds(TEXTS, SOURCES, 5), target_value="wiki",
                    k=3).to_pylist()
    assert a == b and len(a) == 3
    # a different salt is an independent draw over the same scores
    c = dsir_sample(_ds(TEXTS, SOURCES, 3), target_value="wiki",
                    k=3, salt="other").to_pylist()
    assert {r["doc_id"] for r in c} != {r["doc_id"] for r in a} or \
        [r["key_q6"] for r in c] != [r["key_q6"] for r in a]
    # the key decomposes as score/T + gumbel(salted hash): recompute
    import math

    from searchengine_ray.pipelines.analysis import _splitmix64
    from searchengine_ray.pipelines.dedup import _hash_tokens

    for r in a:
        h = int(_splitmix64(_hash_tokens(
            pa.array([f"gsample:{r['doc_id']}"])))[0])
        g = -math.log(-math.log((h + 0.5) / 2.0 ** 64))
        want = int(np.round((r["dsir_q6"] / 1e6 / 1.0 + g) * 1e6))
        assert r["key_q6"] == want
    # temperature -> 0 degrades to greedy top-k (argmax by score)
    greedy = dsir_select(_ds(TEXTS, SOURCES), target_value="wiki", k=3)
    cold = dsir_sample(_ds(TEXTS, SOURCES), target_value="wiki", k=3,
                       temperature=1e-9)
    assert cold["doc_id"].to_pylist() == greedy["doc_id"].to_pylist()

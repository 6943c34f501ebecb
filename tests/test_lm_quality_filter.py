"""lm_quality_filter: the kept set equals a naive percentile filter
over bigram_lm_score's own output (threshold semantics + tie keep)."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _ds(texts):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(4)


@pytest.mark.usefixtures("ray_session")
def test_filter_matches_naive_percentile():
    from searchengine_ray.pipelines.lm import (
        bigram_lm_score,
        lm_quality_filter,
    )

    rng = np.random.default_rng(23)
    common = ["the quick brown fox", "data over rows flows",
              "spark joins the stream"]
    texts = []
    for i in range(80):
        if i % 8 == 0:   # garbage docs: unique token soup → low logprob
            texts.append(" ".join(
                f"zz{rng.integers(0, 10**6):06d}" for _ in range(12)))
        else:
            texts.append(common[i % 3])
    texts.append("solo")           # zero bigrams → dropped

    scored = {r["doc_id"]: r
              for r in bigram_lm_score(_ds(texts), add_k=0.5).take_all()}
    avgs = sorted(r["logprob_q6"] / r["n_bigrams"]
                  for r in scored.values() if r["n_bigrams"] > 0)
    thr = avgs[max(math.ceil(10 * len(avgs) / 100), 1) - 1]
    want = sorted(d for d, r in scored.items()
                  if r["n_bigrams"] > 0
                  and r["logprob_q6"] / r["n_bigrams"] >= thr)

    got = sorted(r["doc_id"] for r in
                 lm_quality_filter(_ds(texts), drop_pct=10,
                                   add_k=0.5).take_all())
    assert got == want
    # here every garbage doc has the IDENTICAL avg (unique tokens →
    # same smoothed lp), so the p10 threshold lands on the tie and
    # PERCENTILE_DISC tie-keep retains them all — pin that semantics
    garbage = {i for i in range(80) if i % 8 == 0}
    assert garbage <= set(got)
    assert len(texts) - 1 not in got        # zero-bigram doc dropped


@pytest.mark.usefixtures("ray_session")
def test_filter_drops_strictly_worse_docs():
    from searchengine_ray.pipelines.lm import lm_quality_filter

    texts = ["common words flow here"] * 45
    # garbage docs with DIFFERENT garbage ratios → distinct avgs
    texts += ["common words " + " ".join(f"g{j}x{i}"
                                         for i in range(1 + 2 * j))
              for j in range(5)]
    got = {r["doc_id"] for r in
           lm_quality_filter(_ds(texts), drop_pct=10,
                             add_k=0.5).take_all()}
    assert set(range(45)) <= got            # common docs all kept
    assert len(got) < len(texts)            # something was dropped

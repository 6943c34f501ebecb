"""token_quantiles (exact histogram quantiles) and heavy_hitters
(two-pass Misra-Gries exact top-k) vs naive pure-Python references."""

import math
import re
from collections import Counter

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings

from searchengine_ray.pipelines.analysis import (
    _MG_DEFICIT_SENTINEL,
    heavy_hitters,
    mg_sketch_batch,
    token_quantiles,
)

TOKENS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "longword", "x"]),
    min_size=0, max_size=40,
)
TEXTS = st.lists(TOKENS.map(" ".join), min_size=1, max_size=12)


def _simple_toks(text: str) -> list[str]:
    toks = re.sub(r"[^\w\s]", " ", text).lower().split()
    return [t for t in toks if len(t) >= 2]


def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


@given(TEXTS)
@settings(max_examples=40, deadline=None)
def test_mg_sketch_bound(texts):
    """Every sketched count under-estimates by at most the carried
    deficit; every dropped term's true count is <= deficit."""
    true = Counter()
    for t in texts:
        true.update(_simple_toks(t))
    sk = mg_sketch_batch(_docs_table(texts), capacity=3).to_pylist()
    deficit = sum(r["c_hat"] for r in sk if r["term"] == _MG_DEFICIT_SENTINEL)
    kept = {r["term"]: r["c_hat"] for r in sk
            if r["term"] != _MG_DEFICIT_SENTINEL}
    for term, c_hat in kept.items():
        assert c_hat <= true[term] <= c_hat + deficit
    for term, cf in true.items():
        if term not in kept:
            assert cf <= deficit


def _pct_disc(sorted_vals, p):
    """PERCENTILE_DISC: smallest value at cumulative rank
    ceil(p/100 * N)."""
    n = len(sorted_vals)
    return sorted_vals[max(math.ceil(p * n / 100), 1) - 1]


@pytest.mark.usefixtures("ray_session")
def test_token_quantiles_matches_naive():
    import ray

    rng = np.random.default_rng(7)
    texts = [" ".join(["tok"] * int(rng.integers(0, 50)))
             for _ in range(400)]
    dls = sorted(len(_simple_toks(t)) for t in texts)
    ds = ray.data.from_arrow(_docs_table(texts)).repartition(8)
    got = {r["pct"]: r["dl_q"]
           for r in token_quantiles(ds).to_pylist()}
    for p in (25, 50, 75, 90, 99):
        assert got[p] == _pct_disc(dls, p), p


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_exact_both_paths():
    """Top-k is exact both when the sketch provably suffices (large
    capacity) and when the fallback full aggregate must kick in
    (capacity=1 forces a huge deficit)."""
    import ray

    rng = np.random.default_rng(11)
    vocab = [f"w{i:02d}" for i in range(40)]
    weights = np.arange(len(vocab), 0, -1, dtype=float)
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, size=30, p=weights))
             for _ in range(200)]
    true = Counter()
    for t in texts:
        true.update(_simple_toks(t))
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    ds = ray.data.from_arrow(_docs_table(texts)).repartition(6)
    for cap in (4096, 1):
        got = [(r["term"], r["cf"])
               for r in heavy_hitters(ds, k=10, capacity=cap).to_pylist()]
        assert got == want, cap


@pytest.mark.usefixtures("ray_session")
def test_lang_top_terms_matches_naive_both_fold_modes():
    """Per-language top-k, driver AND distributed folds (the latter
    exercises the exact per-bucket top-k prune)."""
    import ray

    from searchengine_ray.pipelines.analysis import lang_top_terms

    rng = np.random.default_rng(3)
    langs = ["en", "de", "fr"]
    vocab = [f"w{i:02d}" for i in range(20)]
    texts, lang_col = [], []
    for i in range(150):
        lang = langs[i % 3]
        # language-skewed frequencies so top-10 differs per lang
        w = np.roll(np.arange(len(vocab), 0, -1, dtype=float),
                    langs.index(lang) * 7)
        texts.append(" ".join(rng.choice(vocab, size=20, p=w / w.sum())))
        lang_col.append(lang)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang_col, pa.string()),
    })).repartition(6)

    cf = Counter()
    for t, lg in zip(texts, lang_col):
        for term in _simple_toks(t):
            cf[(lg, term)] += 1
    want = []
    for lg in sorted(langs):
        rows = sorted(((t, c) for (l2, t), c in cf.items() if l2 == lg),
                      key=lambda tc: (-tc[1], tc[0]))[:10]
        want += [{"lang": lg, "term": t, "cf": c} for t, c in rows]

    for mode in ("driver", "distributed"):
        got = sorted(lang_top_terms(ds, k=10, fold_mode=mode).to_pylist(),
                     key=lambda r: (r["lang"], -r["cf"], r["term"]))
        assert got == want, mode


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_fewer_terms_than_k():
    import ray

    ds = ray.data.from_arrow(_docs_table(["aa bb aa", "bb aa"]))
    got = [(r["term"], r["cf"])
           for r in heavy_hitters(ds, k=100).to_pylist()]
    assert got == [("aa", 3), ("bb", 2)]

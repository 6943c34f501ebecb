"""pmi_pairs vs a naive pure-Python PMI over distinct doc-term pairs."""

import math
import re
from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.pipelines.cooccur import pmi_pairs


def _simple_toks(text: str) -> list[str]:
    toks = re.sub(r"[^\w\s]", " ", text).lower().split()
    return [t for t in toks if len(t) >= 2]


def _naive(texts, min_df, min_pairs, k, max_vocab):
    doc_terms = [set(_simple_toks(t)) for t in texts]
    df = Counter()
    for s in doc_terms:
        df.update(s)
    cand = sorted(((t, c) for t, c in df.items() if c >= min_df),
                  key=lambda tc: (-tc[1], tc[0]))[:max_vocab]
    cset = dict(cand)
    n = len(texts)
    nab = Counter()
    for s in doc_terms:
        for a, b in combinations(sorted(t for t in s if t in cset), 2):
            nab[(a, b)] += 1
    rows = []
    for (a, b), c in nab.items():
        if c < min_pairs:
            continue
        q = int(np.round(math.log((c * n) / (cset[a] * cset[b])) * 1e6))
        rows.append((-q, a, b, c))
    rows.sort()
    return [{"term_a": a, "term_b": b, "n_ab": c, "pmi_q6": -negq}
            for negq, a, b, c in rows[:k]]


def _ds(texts):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(4)


@pytest.mark.usefixtures("ray_session")
def test_pmi_matches_naive():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    texts = []
    for i in range(120):
        base = list(rng.choice(vocab, size=int(rng.integers(1, 7)),
                               replace=False))
        if i % 3 == 0:
            base += ["pairx", "pairy"]        # a strong collocation
        texts.append(" ".join(base))
    got = pmi_pairs(_ds(texts), min_df=2, min_pairs=2, k=30,
                    max_vocab=1000).to_pylist()
    want = _naive(texts, 2, 2, 30, 1000)
    assert got == want
    assert got[0]["term_a"] == "pairx" and got[0]["term_b"] == "pairy"


@pytest.mark.usefixtures("ray_session")
def test_pmi_vocab_cap_and_thresholds():
    texts = ["aa bb", "aa bb", "aa bb cc", "cc dd", "ee"]
    # cap vocab to the 2 highest-df terms => only the (aa,bb) pair
    got = pmi_pairs(_ds(texts), min_df=1, min_pairs=1, k=10,
                    max_vocab=2).to_pylist()
    assert got == _naive(texts, 1, 1, 10, 2)
    assert [(r["term_a"], r["term_b"]) for r in got] == [("aa", "bb")]
    # min_pairs filters singletons
    got2 = pmi_pairs(_ds(texts), min_df=1, min_pairs=2, k=10,
                     max_vocab=100).to_pylist()
    assert got2 == _naive(texts, 1, 2, 10, 100)


@pytest.mark.usefixtures("ray_session")
def test_expand_query_matches_naive():
    from searchengine_ray.pipelines.cooccur import expand_query

    texts = (["pairx pairy aa"] * 10 + ["pairx bb"] * 5
             + ["aa bb cc"] * 8 + ["cc dd"] * 4)
    got = expand_query(_ds(texts), ["pairx", "cc", "missing"], k=2,
                       min_df=1, min_pairs=1, max_vocab=100).to_pylist()
    pairs = _naive(texts, 1, 1, 10**9, 100)
    want = []
    for q in sorted({"pairx", "cc", "missing"}):
        cands = sorted(
            (-p["pmi_q6"], p["term_b"] if p["term_a"] == q
             else p["term_a"])
            for p in pairs if q in (p["term_a"], p["term_b"]))[:2]
        want += [{"qterm": q, "term": t, "pmi_q6": -nq} for nq, t in cands]
    assert got == want
    assert not any(r["qterm"] == "missing" for r in got)


@pytest.mark.usefixtures("ray_session")
def test_pmi_empty_and_degenerate():
    assert pmi_pairs(_ds(["aa", "bb"]), min_df=1, min_pairs=1).num_rows == 0
    assert pmi_pairs(_ds(["", ""]), min_df=1, min_pairs=1).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_window_pmi_naive():
    import math
    import re
    from collections import Counter

    import numpy as np
    import ray

    from searchengine_ray.pipelines.cooccur import window_pmi

    texts = ["aa bb cc aa bb", "bb aa zz yy aa", "cc cc dd aa bb cc"]
    W, MIN_C = 2, 2

    def toks(t):
        return [x for x in re.sub(r"[^\w\s]", " ", t).lower().split()
                if len(x) >= 2]

    cf = Counter(t for x in texts for t in toks(x))
    cand = {t for t, c in cf.items() if c >= MIN_C}
    s = sum(cf[t] for t in cand)
    pair = Counter()
    for x in texts:
        tt = toks(x)
        for i in range(len(tt)):
            for d in range(1, W + 1):
                j = i + d
                if j < len(tt) and tt[i] in cand and tt[j] in cand \
                        and tt[i] != tt[j]:
                    pair[tuple(sorted((tt[i], tt[j])))] += 1
    pt = sum(pair.values())
    want = []
    for (a, b), nab in pair.items():
        if nab < 2:
            continue
        q = int(np.round(math.log(
            (nab * s * s) / (pt * cf[a] * cf[b])) * 1e6))
        want.append((-q, a, b, nab))
    want.sort()
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    got = window_pmi(ds, window=W, min_count=MIN_C, min_pairs=2, k=50)
    assert [(r["term_a"], r["term_b"], r["n_ab"], r["pmi_q6"])
            for r in got.to_pylist()] \
        == [(a, b, n, -q) for q, a, b, n in want]

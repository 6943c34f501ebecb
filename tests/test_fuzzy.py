"""Fuzzy term suggestion: DP vs naive Levenshtein, the SymSpell
blocking guarantee (no false negatives), and end-to-end agreement with
a brute-force vocabulary cross join."""

import functools
import re
from collections import Counter

import hypothesis.strategies as st
import pyarrow as pa
import pytest
from hypothesis import given, settings

from searchengine_ray.query.fuzzy import (
    deletion_variants,
    fuzzy_suggest,
    levenshtein,
)

WORD = st.text(alphabet="abcd", min_size=0, max_size=7)


def _naive_lev(a: str, b: str) -> int:
    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
    return d(len(a), len(b))


@given(WORD, WORD)
@settings(max_examples=300, deadline=None)
def test_levenshtein_matches_naive(a, b):
    assert levenshtein(a, b) == _naive_lev(a, b)


@given(WORD, WORD, st.integers(1, 2))
@settings(max_examples=300, deadline=None)
def test_blocking_has_no_false_negatives(a, b, d):
    """lev(a,b) <= d  =>  the <=d-deletion neighborhoods intersect
    (the SymSpell property fuzzy_suggest's candidate filter relies on)."""
    if _naive_lev(a, b) <= d:
        assert not deletion_variants(a, d).isdisjoint(deletion_variants(b, d))


def _simple_toks(text: str) -> list[str]:
    toks = re.sub(r"[^\w\s]", " ", text).lower().split()
    return [t for t in toks if len(t) >= 2]


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_suggest_matches_bruteforce():
    import ray

    vocab = ["query", "queue", "quest", "scan", "scans", "span",
             "join", "joint", "coin", "window", "widow", "winnow"]
    texts = []
    for i, w in enumerate(vocab):
        for rep in range(i + 1):          # distinct dfs -> stable ranks
            texts.append(f"{w} filler{rep:02d}")
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    qterms = ["qurey", "scann", "jion", "windw", "zzzzzz"]
    got = fuzzy_suggest(ray.data.from_arrow(tbl).repartition(4),
                        qterms, max_dist=2, k=3).to_pylist()

    df = Counter()
    for t in texts:
        for term in set(_simple_toks(t)):
            df[term] += 1
    want = []
    for q in qterms:
        scored = sorted(
            (dist, -cnt, t)
            for t, cnt in df.items()
            if (dist := _naive_lev(q, t)) <= 2
        )[:3]
        want += [{"qterm": q, "term": t, "dist": d, "df": -ndf}
                 for d, ndf, t in scored]
    assert got == want
    assert not any(r["qterm"] == "zzzzzz" for r in got)

"""snippet_windows vs a naive pure-Python best-window reference."""

import re

import hypothesis.strategies as st
import pyarrow as pa
import pytest
from hypothesis import given, settings

from searchengine_ray.query.snippets import (
    snippet_windows,
    snippet_windows_batch,
)

QUERY = ["aa", "bb", "cc"]
TOKENS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "x", "longword"]),
    min_size=0, max_size=40,
)
TEXTS = st.lists(TOKENS.map(" ".join), min_size=1, max_size=10)


def _simple_toks(text: str) -> list[str]:
    toks = re.sub(r"[^\w\s]", " ", text).lower().split()
    return [t for t in toks if len(t) >= 2]


def _naive(texts, width, k):
    rows = []
    for d, text in enumerate(texts):
        toks = _simple_toks(text)
        hits = [(p, t) for p, t in enumerate(toks) if t in QUERY]
        best = None
        for p, _ in hits:
            cov = len({t for q, t in hits if p <= q < p + width})
            if best is None or cov > best[1]:
                best = (p, cov)
        if best is not None:
            rows.append({
                "doc_id": d, "win_start": best[0], "n_terms": best[1],
                "snippet": " ".join(toks[best[0]:best[0] + width]),
            })
    rows.sort(key=lambda r: (-r["n_terms"], r["doc_id"]))
    return rows[:k]


def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


@given(TEXTS, st.integers(1, 10))
@settings(max_examples=80, deadline=None)
def test_batch_best_windows_match_naive(texts, width):
    got = snippet_windows_batch(_docs_table(texts), QUERY, width, k=100)
    assert got.to_pylist() == _naive(texts, width, k=100)


@pytest.mark.usefixtures("ray_session")
def test_snippet_windows_distributed_topk():
    import ray

    texts = (["aa dd bb dd cc"] * 3          # full coverage
             + ["aa dd dd dd bb"] * 4        # 2 terms
             + ["x aa x"] * 5                # 1 term
             + ["dd ee"] * 6)                # no match
    ds = ray.data.from_arrow(_docs_table(texts)).repartition(5)
    got = snippet_windows(ds, QUERY, width=4, k=6).to_pylist()
    assert got == _naive(texts, 4, 6)


@pytest.mark.usefixtures("ray_session")
def test_snippet_windows_no_matches():
    import ray

    ds = ray.data.from_arrow(_docs_table(["dd ee", "x y"]))
    assert snippet_windows(ds, QUERY).num_rows == 0

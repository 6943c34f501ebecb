"""Winnowing fingerprints vs a naive pure-Python reference, plus the
guarantee property (shared >= k+w-1 token run => shared fingerprint)."""

import re

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
from hypothesis import given, settings

from searchengine_ray.pipelines.winnow import winnow_fingerprints_batch

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
MASK = (1 << 64) - 1

TOKENS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
    min_size=0, max_size=30,
)
TEXTS = st.lists(TOKENS.map(" ".join), min_size=1, max_size=8)


def _simple_toks(text):
    toks = re.sub(r"[^\w\s]", " ", text).lower().split()
    return [t for t in toks if len(t) >= 2]


def _fnv(tok: str) -> int:
    h = FNV_OFFSET
    for b in tok.encode():
        h = ((h ^ b) * FNV_PRIME) & MASK
    return h


def _grams(toks, k):
    hs = [_fnv(t) for t in toks]
    out = []
    for i in range(len(toks) - k + 1):
        g = hs[i]
        for j in range(1, k):
            g = (g * FNV_PRIME + hs[i + j]) & MASK
        out.append(g)
    return out


def _naive(texts, k, w):
    rows = set()
    for d, text in enumerate(texts):
        g = _grams(_simple_toks(text), k)
        if not g:
            continue
        windows = ([(s, w) for s in range(len(g) - w + 1)]
                   if len(g) >= w else [(0, len(g))])
        for s, wl in windows:
            win = g[s:s + wl]
            fp = min(win)
            pos = s + max(i for i, h in enumerate(win) if h == fp)
            rows.add((d, pos, fp if fp < 1 << 63 else fp - (1 << 64)))
    return sorted(rows)


def _got(texts, k, w):
    t = winnow_fingerprints_batch(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), k=k, w=w)
    return sorted((r["doc_id"], r["pos"], r["fp_i64"])
                  for r in t.to_pylist())


@given(TEXTS, st.integers(2, 4), st.integers(2, 6))
@settings(max_examples=60, deadline=None)
def test_winnow_matches_naive(texts, k, w):
    assert _got(texts, k, w) == _naive(texts, k, w)


def _naive_pairs(texts, k, w, min_shared):
    fps = {}
    for d, p, fp in _naive(texts, k, w):
        fps.setdefault(d, set()).add(fp)
    out = []
    docs = sorted(fps)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            n = len(fps[a] & fps[b])
            if n >= min_shared:
                out.append({"doc_a": a, "doc_b": b, "n_shared": n,
                            "truncated": 0})
    return out


def test_winnow_pairs_match_naive(ray_session):
    import ray

    from searchengine_ray.pipelines.winnow import winnow_pairs

    shared = "one two three four five six seven eight"
    texts = [
        f"{shared} tailone", f"{shared} tailtwo",     # heavy overlap
        "three four five six unrelated",              # partial overlap
        "zz yy xx ww vv",                             # none
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    k, w = 3, 4
    for min_shared in (1, 2):
        got = sorted(winnow_pairs(ds, k=k, w=w,
                                  min_shared=min_shared).take_all(),
                     key=lambda r: (r["doc_a"], r["doc_b"]))
        assert got == _naive_pairs(texts, k, w, min_shared), min_shared
    assert winnow_pairs(ds, k=k, w=w, min_shared=10_000).count() == 0


def test_winnow_guarantee_shared_run_shares_fingerprint():
    """Two docs sharing a >= k+w-1 token run share a fingerprint value
    (the winnowing guarantee, SIGMOD'03 thm.)."""
    k, w = 3, 4
    rng = np.random.default_rng(9)
    shared = " ".join(f"run{i:02d}" for i in range(k + w - 1))
    docs = []
    for i in range(6):
        pre = " ".join(rng.choice(["xx", "yy", "zz"], size=int(
            rng.integers(0, 8))))
        post = " ".join(rng.choice(["pp", "qq"], size=int(
            rng.integers(0, 8))))
        docs.append(f"{pre} {shared} {post}".strip())
    rows = _got(docs, k, w)
    fps = [set(fp for d2, _, fp in rows if d2 == d) for d in range(6)]
    common = set.intersection(*fps)
    assert common, "shared run must yield a common fingerprint"

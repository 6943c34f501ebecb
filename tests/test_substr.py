"""duplicate_spans: exact stride-1 n-gram substring dedup.

Expectations come from an independent pure-Python tuple-key
recomputation (no hashing, no Arrow) — a different derivation path
from the engine's FNV-fold kernels.
"""

import re
from collections import defaultdict

import pyarrow as pa
import pytest

from searchengine_ray.pipelines.substr import duplicate_spans

TEXTS = [
    "aa bb cc dd ee ff gg hh unique1 unique2",             # shared prefix
    "xx aa bb cc dd ee ff gg hh yy zz",                    # SHIFTED copy
    "totally different words here none repeat ever once",
    "qq ww ee rr tt yy uu ii qq ww ee rr tt yy uu ii",     # self-repeat
    "",
    "short doc",
]


def _naive(texts, L):
    occ = defaultdict(list)
    for d, t in enumerate(texts):
        toks = [w for w in
                re.sub(r"[^\w\s]", " ", t.lower()).split() if len(w) >= 2]
        for p in range(len(toks) - L + 1):
            occ[tuple(toks[p:p + L])].append((d, p))
    flagged = sorted(pp for g, pps in occ.items()
                     if len(pps) >= 2 for pp in pps)
    out = []
    for d, p in flagged:
        if out and out[-1][0] == d and p - out[-1][4] <= L:
            out[-1] = [d, out[-1][1], p + L, out[-1][3] + 1, p]
        else:
            out.append([d, p, p + L, 1, p])
    return sorted(tuple(e[:4]) for e in out)


def _ds(texts, parts=3):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(parts)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("L", [3, 8])
def test_duplicate_spans_matches_naive(L):
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_starts"])
        for r in duplicate_spans(_ds(TEXTS), min_tokens=L).take_all())
    assert got == _naive(TEXTS, L)
    assert got  # the fixture does contain duplicates


@pytest.mark.usefixtures("ray_session")
def test_duplicate_spans_unaligned_copy_found():
    """The tile-dedup blind spot: a duplicate shifted by one token.
    duplicate_spans must flag it at BOTH alignments."""
    got = {(r["doc_id"], r["span_start"])
           for r in duplicate_spans(_ds(TEXTS), min_tokens=8).take_all()}
    assert (0, 0) in got and (1, 1) in got


@pytest.mark.usefixtures("ray_session")
def test_duplicate_spans_partition_invariant():
    a = sorted(map(tuple, (r.values() for r in duplicate_spans(
        _ds(TEXTS, 1), min_tokens=4).take_all())))
    b = sorted(map(tuple, (r.values() for r in duplicate_spans(
        _ds(TEXTS, 6), min_tokens=4).take_all())))
    assert a == b


@pytest.mark.usefixtures("ray_session")
def test_duplicate_spans_clean_corpus_is_empty():
    texts = ["alpha beta gamma delta", "wholly disjoint token stream"]
    assert duplicate_spans(_ds(texts), min_tokens=3).take_all() == []


def test_duplicate_spans_guard():
    with pytest.raises(ValueError):
        duplicate_spans(None, min_tokens=1)


def _naive_strip(texts, L):
    occ = defaultdict(list)
    tok = {d: [w for w in
               re.sub(r"[^\w\s]", " ", t.lower()).split() if len(w) >= 2]
           for d, t in enumerate(texts)}
    for d, ts in tok.items():
        for p in range(len(ts) - L + 1):
            occ[tuple(ts[p:p + L])].append((d, p))
    out = []
    for d, ts in tok.items():
        nc = [0] * len(ts)
        cn = [0] * len(ts)
        for g, pps in occ.items():
            if len(pps) < 2:
                continue
            canon = min(pps)
            for (dd, pp) in pps:
                if dd != d:
                    continue
                tgt = cn if (dd, pp) == canon else nc
                for t in range(pp, pp + L):
                    tgt[t] += 1
        kept = [w for i, w in enumerate(ts)
                if not (nc[i] > 0 and cn[i] == 0)]
        out.append((d, " ".join(kept), len(ts) - len(kept)))
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("L", [3, 8])
def test_strip_duplicate_spans_matches_naive(L):
    from searchengine_ray.pipelines.substr import strip_duplicate_spans

    got = sorted((r["doc_id"], r["text"], r["n_tokens_removed"])
                 for r in strip_duplicate_spans(
                     _ds(TEXTS), min_tokens=L).take_all())
    assert got == _naive_strip(TEXTS, L)
    assert any(n for _, _, n in got)  # something was actually removed


@pytest.mark.usefixtures("ray_session")
def test_strip_keeps_exactly_one_copy():
    """Canonical protection: of two identical docs, the first keeps
    its text and the second is fully excised."""
    from searchengine_ray.pipelines.substr import strip_duplicate_spans

    texts = ["aa bb cc dd ee ff gg hh", "aa bb cc dd ee ff gg hh"]
    got = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
           for r in strip_duplicate_spans(
               _ds(texts, 2), min_tokens=8).take_all()}
    assert got[0] == ("aa bb cc dd ee ff gg hh", 0)
    assert got[1] == ("", 8)


@pytest.mark.usefixtures("ray_session")
def test_strip_clean_corpus_untouched():
    from searchengine_ray.pipelines.substr import strip_duplicate_spans

    texts = ["alpha beta gamma delta", "wholly disjoint token stream"]
    got = sorted((r["doc_id"], r["text"], r["n_tokens_removed"])
                 for r in strip_duplicate_spans(
                     _ds(texts), min_tokens=3).take_all())
    assert got == [(0, "alpha beta gamma delta", 0),
                   (1, "wholly disjoint token stream", 0)]


@pytest.mark.usefixtures("ray_session")
def test_strip_partition_invariant():
    from searchengine_ray.pipelines.substr import strip_duplicate_spans

    a = sorted((r["doc_id"], r["text"], r["n_tokens_removed"])
               for r in strip_duplicate_spans(
                   _ds(TEXTS, 1), min_tokens=4).take_all())
    b = sorted((r["doc_id"], r["text"], r["n_tokens_removed"])
               for r in strip_duplicate_spans(
                   _ds(TEXTS, 6), min_tokens=4).take_all())
    assert a == b


@pytest.mark.usefixtures("ray_session")
def test_duplicate_and_strip_random_corpora():
    """Randomized cross-check vs the naive tuple-key implementation:
    tiny alphabet forces heavy repetition, unaligned overlaps and
    within-doc duplicates; fixed seeds keep it deterministic."""
    import random

    from searchengine_ray.pipelines.substr import strip_duplicate_spans

    for seed in (3, 17):
        rng = random.Random(seed)
        texts = [" ".join(rng.choices(["aa", "bb", "cc", "dd"],
                                      k=rng.randint(0, 18)))
                 for _ in range(12)]
        L = rng.choice([2, 3])
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"],
             r["n_dup_starts"])
            for r in duplicate_spans(_ds(texts, 4),
                                     min_tokens=L).take_all())
        assert got == _naive(texts, L), (seed, L)
        got2 = sorted((r["doc_id"], r["text"], r["n_tokens_removed"])
                      for r in strip_duplicate_spans(
                          _ds(texts, 4), min_tokens=L).take_all())
        assert got2 == _naive_strip(texts, L), (seed, L)

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

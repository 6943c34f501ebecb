"""Exact phrase search over the positional index.

A phrase matches where the query's tokens (after the index's own
tokenization: punctuation strip, lower, min-length, stop words,
stemming) occur at CONSECUTIVE positions of a document's filtered
token sequence — the classic positional-index phrase operator
(Manning/Raghavan/Schütze IR ch. 2; the reference engine stores the
same positions, bm25_positional.py, but exposes no phrase query).

Fully vectorized: candidate docs are the searchsorted intersection of
all terms' posting lists; per-doc positions come through the lazy
subset decoder (only candidate docs' position bytes are touched), and
the consecutiveness join is one composite-key (doc<<32 | pos)
membership test per adjacent term pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SHIFT = np.int64(32)


def _empty_result() -> pa.Table:
    return pa.table({
        "rank": pa.array([], pa.int32()),
        "doc_id": pa.array([], pa.int64()),
        "n_matches": pa.array([], pa.int64()),
    })


def _rank(doc_ids: np.ndarray, counts: np.ndarray, n: int) -> pa.Table:
    hit = counts > 0
    doc_ids, counts = doc_ids[hit], counts[hit]
    order = np.lexsort((doc_ids, -counts))[:n]
    return pa.table({
        "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int32),
                         pa.int32()),
        "doc_id": pa.array(doc_ids[order], pa.int64()),
        "n_matches": pa.array(counts[order].astype(np.int64), pa.int64()),
    })


def phrase_search(searcher, query: str, n: int = 10) -> pa.Table:
    """→ (rank, doc_id, n_matches): docs containing the tokenized query
    as a consecutive run, most matches first (doc_id ascending ties).
    Requires a positional index."""
    tokens = searcher.tokenizer.tokenize(query)
    if not tokens:
        return _empty_result()
    recs = searcher.reader.fetch(tokens)
    rs = [recs.get(t) for t in tokens]
    if any(r is None for r in rs):
        return _empty_result()          # a missing term → no phrase doc
    if any(r.positions is None for r in rs):
        raise ValueError(
            "phrase search needs a positional index (build with "
            "posting_type=POSITIONAL)"
        )
    if len(tokens) == 1:
        r = rs[0]
        return _rank(r.doc_ids, r.tfs.astype(np.int64), n)

    # candidate docs: in EVERY term's posting list (probe the smallest
    # list into the others — O(min_df * log df) per term)
    cand = rs[int(np.argmin([r.doc_ids.size for r in rs]))].doc_ids
    for r in rs:
        if cand.size == 0:
            return _empty_result()
        idx = np.searchsorted(r.doc_ids, cand)
        np.clip(idx, 0, max(0, r.doc_ids.size - 1), out=idx)
        cand = cand[r.doc_ids[idx] == cand]
    if cand.size == 0:
        return _empty_result()

    # composite keys (doc_index << 32 | position) per term, candidates
    # only — positions decode lazily for exactly these docs
    keys = []
    for r in rs:
        rows = np.searchsorted(r.doc_ids, cand)
        flat, lens, _ = r.positions_slices(rows)
        doc_idx = np.repeat(np.arange(cand.size, dtype=np.int64), lens)
        keys.append((doc_idx << _SHIFT) | flat.astype(np.int64))

    survivors = keys[0]
    for k in keys[1:]:
        if survivors.size == 0:
            return _empty_result()
        want = survivors + 1            # next consecutive position
        idx = np.searchsorted(k, want)  # keys ascend (docs asc, pos asc)
        np.clip(idx, 0, max(0, k.size - 1), out=idx)
        # advance to the matched position so the following term is
        # tested at p+2, p+3, …
        survivors = want[k[idx] == want]

    counts = np.bincount((survivors >> _SHIFT).astype(np.int64),
                         minlength=cand.size)
    return _rank(cand, counts, n)


def proximity_search(searcher, query: str, n: int = 10,
                     slop: int = 2) -> pa.Table:
    """→ (rank, doc_id, n_matches): ordered proximity match — the
    tokenized query's terms occur IN ORDER at strictly increasing
    positions p1 < … < pk with p_k − p1 ≤ (k−1) + ``slop`` (slop = 0
    degrades to the exact phrase). ``n_matches`` counts distinct start
    positions from which such a chain exists.

    Existence is decided GREEDILY and that is exact: advancing each
    term to its smallest admissible position minimizes p_k, so a chain
    from a start exists iff the greedy chain meets the window bound.
    Same lazy candidate-only position decode as ``phrase_search``."""
    if slop < 0:
        raise ValueError("slop must be >= 0")
    tokens = searcher.tokenizer.tokenize(query)
    if not tokens:
        return _empty_result()
    recs = searcher.reader.fetch(tokens)
    rs = [recs.get(t) for t in tokens]
    if any(r is None for r in rs):
        return _empty_result()
    if any(r.positions is None for r in rs):
        raise ValueError(
            "proximity search needs a positional index (build with "
            "posting_type=POSITIONAL)"
        )
    if len(tokens) == 1:
        r = rs[0]
        return _rank(r.doc_ids, r.tfs.astype(np.int64), n)

    cand = rs[int(np.argmin([r.doc_ids.size for r in rs]))].doc_ids
    for r in rs:
        if cand.size == 0:
            return _empty_result()
        idx = np.searchsorted(r.doc_ids, cand)
        np.clip(idx, 0, max(0, r.doc_ids.size - 1), out=idx)
        cand = cand[r.doc_ids[idx] == cand]
    if cand.size == 0:
        return _empty_result()

    keys = []
    for r in rs:
        rows = np.searchsorted(r.doc_ids, cand)
        flat, lens, _ = r.positions_slices(rows)
        doc_idx = np.repeat(np.arange(cand.size, dtype=np.int64), lens)
        keys.append((doc_idx << _SHIFT) | flat.astype(np.int64))

    start = keys[0]
    cur = keys[0]
    for k in keys[1:]:
        if cur.size == 0:
            return _empty_result()
        idx = np.searchsorted(k, cur + 1)   # greedy: smallest pos > cur
        valid = idx < k.size
        np.clip(idx, 0, max(0, k.size - 1), out=idx)
        nxt = k[idx]
        keep = valid & ((nxt >> _SHIFT) == (cur >> _SHIFT))
        start, cur = start[keep], nxt[keep]
    window = np.int64(len(tokens) - 1 + slop)
    ok = (cur - start) <= window            # same doc → position delta
    counts = np.bincount((start[ok] >> _SHIFT).astype(np.int64),
                         minlength=cand.size)
    return _rank(cand, counts, n)

"""Block-max WAND top-k for BM25 — a score-preserving skipping
optimization (Ding & Suel 2011, "Faster top-k document retrieval using
block-max indexes"; public literature, new to this engine — the
reference scores every posting of every query term, ``bm25.py:44-55``).

Exactness contract: any document whose returned score could reach the
top-k is FULLY evaluated term-at-a-time in unique-query-term order —
the same accumulation order as the TAAT scorer — so returned (doc_id,
score) pairs are bit-identical to ``BM25Scorer`` + ``top_k`` (asserted
in tests). Skipping only prunes documents provably below the running
threshold:

- term upper bound:   idf · (k+1)                     (tf/(tf+c) < 1)
- block upper bound:  idf · bmtf·(k+1)/(bmtf + k·(1−b))
  using the per-128-posting ``block_max_tf`` stored at build time
  (state/codec.py) and the minimal length normalizer (1−b).
"""

from __future__ import annotations

import heapq

import numpy as np

from searchengine_ray.state.codec import BLOCK


class _TermCursor:
    __slots__ = ("rec", "idf", "pos", "n", "contrib", "order", "block_ub",
                 "term_ub")

    def __init__(self, rec, contrib: np.ndarray, order: int, k1: float, b: float):
        self.rec = rec
        self.idf = rec.idf
        self.pos = 0
        self.n = rec.doc_ids.size
        self.contrib = contrib  # full per-posting contributions (vectorized)
        self.order = order      # position in unique-query-term order
        self.term_ub = float(rec.idf * (k1 + 1))
        bm = np.asarray(rec.block_max_tf, dtype=np.float64) \
            if rec.block_max_tf is not None else None
        if bm is None or bm.size == 0:
            nblocks = (self.n + BLOCK - 1) // BLOCK
            self.block_ub = np.full(nblocks, rec.idf * (k1 + 1))
        else:
            self.block_ub = rec.idf * (bm * (k1 + 1)) / (bm + k1 * (1 - b))

    def doc(self) -> int:
        return int(self.rec.doc_ids[self.pos]) if self.pos < self.n else 1 << 62

    def seek(self, target: int) -> None:
        if self.pos < self.n and self.rec.doc_ids[self.pos] < target:
            self.pos += int(
                np.searchsorted(self.rec.doc_ids[self.pos:], target, side="left")
            )

    def current_block_ub(self) -> float:
        if self.pos >= self.n:
            return 0.0
        return float(self.block_ub[self.pos // BLOCK])

    def next_block_start_doc(self) -> int:
        blk = self.pos // BLOCK + 1
        if blk * BLOCK >= self.n:
            return 1 << 62
        return int(self.rec.doc_ids[blk * BLOCK])


def bm25_wand_topk(query_tokens: list[str], recs: dict, scorer, k: int):
    """→ (doc_ids, scores, stats) identical to full TAAT + top_k.

    ``scorer`` is a BM25Scorer (provides k/b and cached per-record
    contribution arrays via term_contrib)."""
    uniq = list(dict.fromkeys(query_tokens))
    cursors: list[_TermCursor] = []
    for order, t in enumerate(uniq):
        rec = recs.get(t)
        if rec is None or rec.doc_ids.size == 0:
            continue
        contrib = scorer.term_contrib(rec)
        cursors.append(_TermCursor(rec, contrib, order, scorer.k, scorer.b))
    if not cursors:
        return np.empty(0, np.int64), np.empty(0, np.float64), {}

    eval_order = sorted(cursors, key=lambda c: c.order)
    # heap of (score, -doc_id): root = weakest of current top-k
    heap: list[tuple[float, int]] = []
    stats = {"evaluated": 0, "block_skips": 0, "candidates": 0}

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else -np.inf

    def evaluate(doc: int) -> float:
        # unique-term order, one add per matching term — identical float
        # op sequence to the TAAT fold for this doc
        s = 0.0
        for c in eval_order:
            i = np.searchsorted(c.rec.doc_ids, doc)
            if i < c.n and c.rec.doc_ids[i] == doc:
                s = s + float(c.contrib[i])
        return s

    while True:
        live = [c for c in cursors if c.pos < c.n]
        if not live:
            break
        live.sort(key=lambda c: c.doc())
        # find pivot: smallest doc where cumulative term UBs reach theta
        acc = 0.0
        pivot_idx = None
        for i, c in enumerate(live):
            acc += c.term_ub
            if acc >= theta():
                pivot_idx = i
                break
        if pivot_idx is None:
            break  # even all terms together can't reach the top-k
        pivot_doc = live[pivot_idx].doc()
        # include every cursor tied at the pivot doc: their upper bounds
        # belong to the pivot's potential score (omitting them makes the
        # block-max check under-estimate and skip true top-k docs)
        while pivot_idx + 1 < len(live) and live[pivot_idx + 1].doc() == pivot_doc:
            pivot_idx += 1
        stats["candidates"] += 1

        # block-max check: refine UB with current blocks
        block_acc = 0.0
        for c in live[: pivot_idx + 1]:
            c.seek(pivot_doc) if c.doc() < pivot_doc else None
            block_acc += c.current_block_ub()
        if block_acc < theta():
            # skip to the nearest next block boundary among pivot terms,
            # clamped to the next non-prefix cursor's doc (a new term's
            # upper bound enters there and must be re-checked)
            nxt = min(c.next_block_start_doc() for c in live[: pivot_idx + 1])
            if pivot_idx + 1 < len(live):
                nxt = min(nxt, live[pivot_idx + 1].doc())
            target = max(pivot_doc + 1, min(nxt, 1 << 62))
            for c in live[: pivot_idx + 1]:
                c.seek(target)
            stats["block_skips"] += 1
            continue

        if live[0].doc() == pivot_doc:
            s = evaluate(pivot_doc)
            stats["evaluated"] += 1
            entry = (s, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
            for c in live:
                if c.doc() == pivot_doc:
                    c.pos += 1
        else:
            # advance pre-pivot terms to the pivot
            for c in live[:pivot_idx]:
                c.seek(pivot_doc)

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    docs = np.asarray([-d for _, d in out], dtype=np.int64)
    scores = np.asarray([s for s, _ in out], dtype=np.float64)
    return docs, scores, stats

"""Query-time scorers with reference-exact semantics, vectorized.

Each scorer consumes decoded ``PostingsRec`` objects (query/postings.py)
and corpus stats from the manifest, and returns ``(doc_ids, scores)``
numpy arrays whose per-doc accumulation ORDER matches the reference's
term-at-a-time fold (stable sort + ``np.add.reduceat`` = left fold in
term order), so float sums are bit-identical to the reference's
``scores[doc] += ...`` loops.

Semantics cited per scorer; quantization points kept exactly:
- idf stored as ``round(ln(N/df),3)`` (bm25.py:105-106, merge-time)
- dl/avgdl as ``round(dl/avgdl,3)`` (bm25.py:76-81, computed here via a
  distinct-dl lookup table using Python ``round`` for parity)
- TF-IDF doc weights stored ``round(w,3)`` (the at-rest representation
  the reference searcher actually loads — tf_idf.py:115,138)
"""

from __future__ import annotations

import math

import numpy as np

from searchengine_ray.config import IndexConfig, RankerType
from searchengine_ray.functions.smart import uniform_tf, uniform_weight

BOOST_MAX_DISTANCE = 10          # bm25_positional.py:30
BOOST_C = math.log10(15)         # log10(max_distance * 1.5), :31
BM25_BOOST_WEIGHT = 0.01         # :29
TFIDF_BOOST_WEIGHT = 0.1         # td_idf_positional.py:33


def _unique_in_order(tokens: list[str]) -> list[str]:
    return list(dict.fromkeys(tokens))


def _fold_scores(doc_chunks, contrib_chunks):
    """Concatenate per-term (docs, contribs) and fold per doc in term
    order. ``np.bincount`` accumulates strictly sequentially in array
    order — the exact float-add sequence of the reference's
    ``scores[doc] += …`` loop (np.add.reduceat is NOT sequential: it
    unrolls with partial accumulators and differs in the last ulp)."""
    if not doc_chunks:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    docs = np.concatenate(doc_chunks)
    contribs = np.concatenate(contrib_chunks)
    max_doc = int(docs.max())
    if max_doc <= 4 * docs.size + 1_000_000:
        # dense ids: direct bincount accumulate (same per-bin add order —
        # array order — as the sparse path; no O(M log M) sort)
        sums_d = np.bincount(docs, weights=contribs, minlength=max_doc + 1)
        seen = np.zeros(max_doc + 1, dtype=bool)
        seen[docs] = True
        uniq = np.flatnonzero(seen)
        return uniq, sums_d[uniq]
    uniq, inv = np.unique(docs, return_inverse=True)
    sums = np.bincount(inv, weights=contribs, minlength=uniq.size)
    return uniq, sums


def top_k(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    """Deterministic top-k: (score desc, doc_id asc) — documented tie
    rule (the reference's tie order is dict-insertion, SURVEY §7.7).
    Partition-select for k << n, exact under score ties."""
    if doc_ids.size == 0:
        return doc_ids[:0], scores[:0]
    if doc_ids.size > 4 * k:
        kth = -np.partition(-scores, k - 1)[k - 1]  # k-th largest score
        cand = np.flatnonzero(scores >= kth)  # includes boundary ties
        order = cand[np.lexsort((doc_ids[cand], -scores[cand]))[:k]]
    else:
        order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


class DlDivTable:
    """Distinct-dl → Python-``round(dl/avgdl, 3)`` lookup (bit-exact
    parity with the reference footer values, vectorized application)."""

    def __init__(self, avgdl: float):
        self.avgdl = avgdl
        self._cache: dict[int, float] = {}

    def __call__(self, dls: np.ndarray) -> np.ndarray:
        uniq, inv = np.unique(dls, return_inverse=True)
        cache = self._cache
        lut = np.empty(uniq.size, np.float64)
        for i, d in enumerate(uniq):
            d = int(d)
            v = cache.get(d)
            if v is None:
                v = round(d / self.avgdl, 3) if self.avgdl else 0.0
                cache[d] = v
            lut[i] = v
        return lut[inv]


class BM25Scorer:
    """Reference ``bm25.py:34-57``: unique query terms (query tf
    computed but unused), term-at-a-time, ascending-doc posting order."""

    def __init__(self, cfg: IndexConfig, stats: dict):
        self.k = cfg.k
        self.b = cfg.b
        self.dldiv = DlDivTable(stats["avgdl"])

    def term_contrib(self, rec):
        if rec._contrib is not None:
            return rec._contrib
        tf = rec.tfs_f64()
        if rec._dldiv is None:
            rec._dldiv = self.dldiv(rec.dls)
        k, b = self.k, self.b
        rec._contrib = (
            rec.idf * (tf * (k + 1)) / (tf + k * (1 - b + b * rec._dldiv))
        )
        return rec._contrib

    def score(self, query_tokens: list[str], recs: dict) -> tuple:
        doc_chunks, contrib_chunks = [], []
        for t in _unique_in_order(query_tokens):
            rec = recs.get(t)
            if rec is None:
                continue
            doc_chunks.append(rec.doc_ids)
            contrib_chunks.append(self.term_contrib(rec))
        return _fold_scores(doc_chunks, contrib_chunks)


class TfIdfScorer:
    """Reference ``tf_idf.py:76-106``. Query side: SMART schema[4..6]
    over MATCHED terms; doc side: stored (rounded) weight × query-time
    idf factor. Reference quirk preserved: at query time
    ``documents_length`` is empty, so doc-side schema[1] 't'/'p' →
    ValueError → 0; only 'n' yields 1 (tf_idf.py:102,178-187)."""

    def __init__(self, cfg: IndexConfig, stats: dict):
        self.schema = cfg.smart_schema
        self.doc_idf_factor = 1.0 if self.schema[1] == "n" else 0.0

    def score(self, query_tokens: list[str], recs: dict) -> tuple:
        schema = self.schema
        matched = [t for t in _unique_in_order(query_tokens) if recs.get(t) is not None]
        ltc = {}
        for t in matched:
            tf_q = uniform_tf(query_tokens.count(t), schema[4])
            ltc[t] = tf_q * recs[t].idf
        if not ltc:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        uniformed = uniform_weight(ltc, schema[6])
        doc_chunks, contrib_chunks = [], []
        for t in matched:
            rec = recs[t]
            lnc = self.doc_idf_factor * rec.weights
            doc_chunks.append(rec.doc_ids)
            contrib_chunks.append(lnc * uniformed[t])
        return _fold_scores(doc_chunks, contrib_chunks)


def _compute_distance(i: int, positions1, j: int, positions2) -> float:
    """Reference ``bm25_positional.py:33-49`` (identical copy in
    td_idf_positional.py:54-70), including its off-by-one query-distance
    convention (caller passes j+i+1)."""
    score = 0.0
    query_distance = j - i
    for p1 in positions1:
        max_score = 0.0
        for p2 in positions2:
            pd = p2 - p1
            if abs(pd) > BOOST_MAX_DISTANCE:
                continue
            signal = -1 if pd < 0 else 1
            distance = signal * (query_distance - pd)
            if distance >= 0:
                aux = -math.log10(distance + 1) + BOOST_C
            else:
                aux = (math.log10(-distance + 1) + BOOST_C) * 0.8
            if aux > max_score:
                max_score = aux
        score += max_score
    return score


def positional_boost(query_tokens: list[str], doc_id: int, recs: dict) -> float:
    """Reference ``calculate_boost`` (bm25_positional.py:52-71): pairwise
    over the FULL query token list (duplicates included, equal terms
    skipped), 1-based indices, log10-compressed."""
    term_to_positions = {}
    for t in query_tokens:
        rec = recs.get(t)
        term_to_positions[t] = (
            rec.positions_of(doc_id) if rec is not None else []
        )
    score = 0.0
    for i, t1 in enumerate(query_tokens, start=1):
        p1 = term_to_positions[t1]
        for j, t2 in enumerate(query_tokens[i:], start=1):
            if t1 == t2:
                continue
            score += _compute_distance(i, p1, j + i + 1, term_to_positions[t2])
    return math.log10(score) if score > 0 else 0


class BM25PositionalScorer(BM25Scorer):
    """BM25 over positional postings (freq = #positions) + proximity
    boost normalized by document length — reference
    ``bm25_positional.py:73-103``. Deviation from the reference
    (documented): docs whose dl_div_avgdl equals the corpus minimum make
    the reference divide by log2(1)=0 and crash; we skip the boost for
    those docs instead."""

    def __init__(self, cfg: IndexConfig, stats: dict):
        super().__init__(cfg, stats)
        self.min_dldiv = stats["min_dldiv"]
        self.max_dldiv = stats["max_dldiv"]

    def score(self, query_tokens: list[str], recs: dict) -> tuple:
        docs, scores = super().score(query_tokens, recs)
        if docs.size == 0:
            return docs, scores
        # per-doc dldiv for the normalization (values are the rounded ones)
        dldiv_of: dict[int, float] = {}
        for rec in recs.values():
            if rec is None:
                continue
            if rec._dldiv is None:
                rec._dldiv = self.dldiv(rec.dls)
            dldiv = rec._dldiv
            for d, v in zip(rec.doc_ids.tolist(), dldiv.tolist()):
                dldiv_of.setdefault(d, v)
        span = self.max_dldiv - self.min_dldiv
        out = scores.copy()
        for idx, d in enumerate(docs.tolist()):
            boost = positional_boost(query_tokens, d, recs)
            if boost > 0 and span > 0:
                norm = math.log2((dldiv_of[d] - self.min_dldiv) / span + 1)
                if norm > 0:
                    out[idx] = scores[idx] + BM25_BOOST_WEIGHT * boost / norm
        return docs, out


class TfIdfPositionalScorer(TfIdfScorer):
    """TF-IDF + flat-weighted proximity boost — reference
    ``td_idf_positional.py:94-130``."""

    def score(self, query_tokens: list[str], recs: dict) -> tuple:
        docs, scores = super().score(query_tokens, recs)
        out = scores.copy()
        for idx, d in enumerate(docs.tolist()):
            boost = positional_boost(query_tokens, int(d), recs)
            if boost > 0:
                out[idx] = scores[idx] + TFIDF_BOOST_WEIGHT * boost
        return docs, out


class RawScorer:
    """Reference base ``Ranker.order`` (ranker.py:58-65): every doc of
    every matched term with score 0 (duplicates preserved)."""

    def __init__(self, cfg: IndexConfig, stats: dict):
        pass

    def score(self, query_tokens: list[str], recs: dict) -> tuple:
        chunks = [rec.doc_ids for rec in recs.values() if rec is not None]
        if not chunks:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs = np.concatenate(chunks)
        return docs, np.zeros(docs.size, np.float64)


def make_scorer(cfg: IndexConfig, stats: dict):
    return {
        RankerType.RAW: RawScorer,
        RankerType.BM25: BM25Scorer,
        RankerType.TF_IDF: TfIdfScorer,
        RankerType.BM25_OPTIMIZED: BM25PositionalScorer,
        RankerType.TF_IDF_OPTIMIZED: TfIdfPositionalScorer,
    }[cfg.ranker](cfg, stats)

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


def _pair_boost_scores(rec1, rec2, qd: int, docs_sorted: np.ndarray):
    """Vectorized ``compute_distance`` over every common doc of one
    ordered term pair. Float-op order matches the reference exactly:
    per-pos1 max is order-independent (max), the per-doc sum over pos1
    uses sequential ``bincount`` in position order, and log10 is libm's.
    → per-doc scores aligned to ``docs_sorted`` (zeros elsewhere).
    ``docs_sorted`` may be a SUBSET of the matched docs (boost pruning):
    common docs outside it are skipped — per-doc values are independent,
    so the survivors' floats are unchanged."""
    if docs_sorted.size == 0 or rec1.doc_ids.size == 0 \
            or rec2.doc_ids.size == 0:
        return None
    # subset-first membership: probe the (often pruned, tiny) eval set
    # into each term's doc array — O(|eval| log |postings|) instead of a
    # full-list intersect1d sort. Same common docs in the same ascending
    # order → float-op order identical to the reference loop.
    i1 = np.searchsorted(rec1.doc_ids, docs_sorted)
    np.clip(i1, 0, rec1.doc_ids.size - 1, out=i1)
    keep = rec1.doc_ids[i1] == docs_sorted
    i2 = np.searchsorted(rec2.doc_ids, docs_sorted)
    np.clip(i2, 0, rec2.doc_ids.size - 1, out=i2)
    keep &= rec2.doc_ids[i2] == docs_sorted
    out_pos = np.flatnonzero(keep)
    if out_pos.size == 0:
        return None
    common = docs_sorted[out_pos]
    i1, i2 = i1[out_pos], i2[out_pos]
    # subset position gather — only the common docs' payloads move
    # (salted terms never materialize their full merged positions)
    p1c, len1, _ = rec1.positions_slices(i1)
    f2, len2, st2 = rec2.positions_slices(i2)
    tot1 = int(len1.sum())
    if tot1 == 0:
        return None
    # cross-product rows: each p1 element against its doc's p2 segment
    rep = np.repeat(len2, len1)            # per-p1-element segment size
    total = int(rep.sum())
    seg_start = np.concatenate(([0], np.cumsum(rep)[:-1]))
    within = np.arange(total) - np.repeat(seg_start, rep)
    p2x = f2[np.repeat(np.repeat(st2, len1), rep) + within]
    p1x = np.repeat(p1c, rep)

    pd = p2x - p1x
    valid = np.abs(pd) <= BOOST_MAX_DISTANCE
    dist = np.where(pd < 0, -1, 1) * (qd - pd)
    aux = np.empty(total, np.float64)
    m = dist >= 0
    aux[m] = -np.log10(dist[m] + 1) + BOOST_C
    aux[~m] = (np.log10(-dist[~m] + 1) + BOOST_C) * 0.8
    aux[~valid] = -np.inf
    segmax = np.maximum.reduceat(aux, seg_start) if total else aux
    per_pos1 = np.maximum(segmax, 0.0)     # reference max_score floor
    doc_of_p1 = np.repeat(np.arange(common.size), len1)
    pair_common = np.bincount(doc_of_p1, weights=per_pos1,
                              minlength=common.size)
    out = np.zeros(docs_sorted.size, np.float64)
    out[out_pos] = pair_common
    return out


def positional_boost_all(query_tokens: list[str], docs_sorted: np.ndarray,
                         recs: dict) -> np.ndarray:
    """Vectorized ``calculate_boost`` for every scored doc at once —
    pair iteration order, per-pair accumulation order and the
    log10-compression match the reference loop (bm25_positional.py:52-71)."""
    toks = list(query_tokens)
    totals = np.zeros(docs_sorted.size, np.float64)
    for a in range(len(toks)):
        rec1 = recs.get(toks[a])
        if rec1 is None or rec1.positions is None:
            continue
        for b in range(a + 1, len(toks)):
            if toks[a] == toks[b]:
                continue
            rec2 = recs.get(toks[b])
            if rec2 is None or rec2.positions is None:
                continue
            pair = _pair_boost_scores(rec1, rec2, b - a + 1, docs_sorted)
            if pair is not None:
                totals += pair             # one add per pair, pair order
    boosts = np.zeros(docs_sorted.size, np.float64)
    mask = totals > 0
    boosts[mask] = np.log10(totals[mask])
    return boosts


def _aux_max_of_qd(qd: int) -> float:
    """max over pd ∈ [−10, 10] of the reference aux value — the per-p1
    ceiling used by the boost upper bound."""
    best = 0.0
    for pd in range(-BOOST_MAX_DISTANCE, BOOST_MAX_DISTANCE + 1):
        signal = -1 if pd < 0 else 1
        distance = signal * (qd - pd)
        if distance >= 0:
            aux = -math.log10(distance + 1) + BOOST_C
        else:
            aux = (math.log10(-distance + 1) + BOOST_C) * 0.8
        if aux > best:
            best = aux
    return best


def boost_total_upper_bound(query_tokens: list[str], docs_sorted: np.ndarray,
                            recs: dict) -> np.ndarray:
    """Per-doc upper bound on the proximity-boost TOTAL: for each
    ordered pair, every p1 contributes at most ``aux_max(qd)``, so
    ``total(doc) ≤ Σ_pairs tf₁(doc)·aux_max`` — O(postings), no
    position cross-product. Used for score-preserving boost pruning
    (only docs whose bound could reach the top-k get the exact boost)."""
    toks = list(query_tokens)
    ub = np.zeros(docs_sorted.size, np.float64)
    for a in range(len(toks)):
        rec1 = recs.get(toks[a])
        if rec1 is None or rec1.positions is None:
            continue
        amax_total = 0.0
        for b in range(a + 1, len(toks)):
            if toks[a] == toks[b]:
                continue
            rec2 = recs.get(toks[b])
            if rec2 is None or rec2.positions is None:
                continue
            amax_total += _aux_max_of_qd(b - a + 1)
        if amax_total > 0.0 and rec1.doc_ids.size:
            # one probe per LEFT term, not per pair (the bound sums
            # linearly over pairs for a fixed rec1); tiny inflation
            # keeps the bound valid under float reassociation
            pos = np.searchsorted(docs_sorted, rec1.doc_ids)
            ub[pos] += rec1.tfs_f64() * (amax_total * (1.0 + 1e-12))
    return ub


class BM25PositionalScorer(BM25Scorer):
    """BM25 over positional postings (freq = #positions) + proximity
    boost normalized by document length — reference
    ``bm25_positional.py:73-103``. Deviation from the reference
    (documented): docs whose dl_div_avgdl equals the corpus minimum make
    the reference divide by log2(1)=0 and crash; we skip the boost for
    those docs instead.

    With ``top_n`` set, the exact boost is evaluated ONLY for docs whose
    boost upper bound could lift them into the top-n (score-preserving
    pruning, same contract as WAND: returned (doc, score) pairs are
    bit-identical to the exhaustive evaluation)."""

    def __init__(self, cfg: IndexConfig, stats: dict):
        super().__init__(cfg, stats)
        self.min_dldiv = stats["min_dldiv"]
        self.max_dldiv = stats["max_dldiv"]

    def score(self, query_tokens: list[str], recs: dict,
              top_n: int | None = None) -> tuple:
        docs, scores = super().score(query_tokens, recs)
        if docs.size == 0:
            return docs, scores
        span = self.max_dldiv - self.min_dldiv
        if span <= 0:
            return docs, scores.copy()
        # per-doc dldiv (rounded values; any matching rec gives the same)
        dldiv_arr = np.full(docs.size, np.nan)
        for rec in recs.values():
            if rec is None:
                continue
            if rec._dldiv is None:
                rec._dldiv = self.dldiv(rec.dls)
            pos = np.searchsorted(docs, rec.doc_ids)
            need = np.isnan(dldiv_arr[pos])
            dldiv_arr[pos[need]] = rec._dldiv[need]
        norm = np.log2((dldiv_arr - self.min_dldiv) / span + 1)

        eval_docs = docs
        if top_n is not None and docs.size > 4 * top_n:
            ub_total = boost_total_upper_bound(query_tokens, docs, recs)
            boost_ub = np.zeros(docs.size)
            m = (ub_total > 1) & (norm > 0)
            boost_ub[m] = np.log10(ub_total[m])
            score_ub = scores.copy()
            score_ub[m] += BM25_BOOST_WEIGHT * boost_ub[m] / norm[m]
            # θ = top_n-th best LOWER bound (bm25 itself: boost ≥ 0);
            # keep every doc whose upper bound could reach or tie it
            kth = -np.partition(-scores, top_n - 1)[top_n - 1]
            cand = score_ub >= kth
            eval_docs = docs[cand]
        boosts_sub = positional_boost_all(query_tokens, eval_docs, recs)
        boosts = np.zeros(docs.size)
        if eval_docs.size:
            boosts[np.searchsorted(docs, eval_docs)] = boosts_sub
        out = scores.copy()
        apply = (boosts > 0) & (norm > 0)
        out[apply] = scores[apply] + BM25_BOOST_WEIGHT * boosts[apply] \
            / norm[apply]
        return docs, out


class TfIdfPositionalScorer(TfIdfScorer):
    """TF-IDF + flat-weighted proximity boost — reference
    ``td_idf_positional.py:94-130``. Same score-preserving ``top_n``
    pruning as the BM25 variant (flat weight → norm-free bound)."""

    def score(self, query_tokens: list[str], recs: dict,
              top_n: int | None = None) -> tuple:
        docs, scores = super().score(query_tokens, recs)
        if docs.size == 0:
            return docs, scores
        eval_docs = docs
        if top_n is not None and docs.size > 4 * top_n:
            ub_total = boost_total_upper_bound(query_tokens, docs, recs)
            boost_ub = np.where(ub_total > 1, np.log10(
                np.maximum(ub_total, 1e-300)), 0.0)
            score_ub = scores + TFIDF_BOOST_WEIGHT * boost_ub
            kth = -np.partition(-scores, top_n - 1)[top_n - 1]
            cand = score_ub >= kth
            eval_docs = docs[cand]
        boosts_sub = positional_boost_all(query_tokens, eval_docs, recs)
        boosts = np.zeros(docs.size)
        if eval_docs.size:
            boosts[np.searchsorted(docs, eval_docs)] = boosts_sub
        out = scores.copy()
        apply = boosts > 0
        out[apply] = scores[apply] + TFIDF_BOOST_WEIGHT * boosts[apply]
        return docs, out


class RawScorer:
    """Reference base ``Ranker.order`` (ranker.py:58-65): every doc of
    every matched term with score 0 (duplicates preserved). Terms are
    visited in unique-query order — deterministic regardless of the
    posting cache's insertion order."""

    def __init__(self, cfg: IndexConfig, stats: dict):
        pass

    def score(self, query_tokens: list[str], recs: dict) -> tuple:
        chunks = [recs[t].doc_ids for t in _unique_in_order(query_tokens)
                  if recs.get(t) is not None]
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

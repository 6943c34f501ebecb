"""MMR (maximal marginal relevance, Carbonell & Goldstein SIGIR'98)
diversified re-ranking: greedily pick argmax of
``lam·rel(d) − (1−lam)·max_{s∈selected} sim(d, s)``
over the BM25 top-m candidates — the standard knob between relevance
and redundancy in result lists.

Everything is oracle-exact by construction: rel is the 4-decimal
quantized BM25 score (score_q4/10⁴ — the same integer the contract
already hash-verifies) so both sides start from identical doubles;
doc-doc similarity is the cosine of the feature-hashed SIGNED-COUNT
vectors (pipelines/vectorize.py), whose dot product is INTEGER
arithmetic — no float summation order anywhere — and whose
normalization is one correctly-rounded sqrt + divide. A missing
vector (empty doc) or dim-disjoint pair contributes sim 0 exactly.

Scale shape: stage 1 is an index search; the greedy loop touches only
the m candidate docs (driver-bounded by design — MMR is a result-list
re-ranker, not a corpus op), whose texts come from ONE row-filtered
parquet read."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _pair_sim(va, vb) -> float:
    """Cosine of two sparse integer vectors ((dims, counts, norm_sq));
    0.0 when either is missing/zero — matching the SQL coalesce."""
    if va is None or vb is None:
        return 0.0
    da, ca, na = va
    db, cb, nb = vb
    if na == 0 or nb == 0:
        return 0.0
    ia = np.searchsorted(da, db)
    valid = ia < da.size
    hit = np.zeros(db.size, bool)
    hit[valid] = da[ia[valid]] == db[valid]
    if not hit.any():
        return 0.0
    dot = int(np.sum(ca[ia[hit]] * cb[hit]))   # exact integer
    return dot / math.sqrt(float(na * nb))


def candidate_vectors(docs_path, doc_ids: list[int],
                      dim: int = 64) -> dict:
    """Sparse hashed vectors for the candidate docs from ONE
    row-filtered parquet read → {doc_id: (dims, counts, norm_sq)}."""
    import pyarrow.dataset as pads

    from searchengine_ray.pipelines.vectorize import hash_vectorize_batch

    dset = pads.dataset(docs_path)
    tbl = dset.to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(doc_ids))
    rows = hash_vectorize_batch(tbl, dim=dim)
    out: dict[int, tuple] = {}
    ids = rows["doc_id"].to_numpy(zero_copy_only=False)
    dims = rows["dim"].to_numpy(zero_copy_only=False)
    cs = rows["c"].to_numpy(zero_copy_only=False)
    nsq = rows["norm_sq"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dims, ids))
    ids, dims, cs, nsq = ids[order], dims[order], cs[order], nsq[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(ids)) + 1)) \
        if ids.size else np.empty(0, np.int64)
    ends = np.append(starts[1:], ids.size)
    for s, e in zip(starts, ends):
        out[int(ids[s])] = (dims[s:e], cs[s:e], int(nsq[s]))
    return out


def mmr_rerank(doc_ids: list[int], rel_q4: list[int], vec_of: dict,
               n: int, lam: float = 0.5) -> pa.Table:
    """Greedy MMR over candidates with quantized relevance
    (rel = rel_q4 / 10⁴) → (rank, doc_id, mmr_q6)."""
    rel = {d: q / 10000.0 for d, q in zip(doc_ids, rel_q4)}
    cand = sorted(rel)
    selected: list[int] = []
    scores: list[float] = []
    while cand and len(selected) < n:
        best_d, best_s = None, None
        for d in cand:
            pen = max((_pair_sim(vec_of.get(d), vec_of.get(s))
                       for s in selected), default=0.0)
            s_ = lam * rel[d] - (1.0 - lam) * pen
            if best_s is None or s_ > best_s or (s_ == best_s
                                                 and d < best_d):
                best_d, best_s = d, s_
        selected.append(best_d)
        scores.append(best_s)
        cand.remove(best_d)
    return pa.table({
        "rank": pa.array(np.arange(1, len(selected) + 1,
                                   dtype=np.int32), pa.int32()),
        "doc_id": pa.array(selected, pa.int64()),
        "mmr_q6": pa.array(
            np.round(np.asarray(scores) * 1e6).astype(np.int64)
            if selected else [], pa.int64()),
    })


def mmr_search(searcher, docs_path, query: str, n: int = 10,
               m: int = 20, lam: float = 0.5, dim: int = 64) -> pa.Table:
    """BM25 top-``m`` → MMR-diversified top-``n``
    → (rank, doc_id, mmr_q6)."""
    t = searcher.search(query, m, with_urls=False)
    doc_ids = t["doc_id"].to_pylist()
    if not doc_ids:
        return mmr_rerank([], [], {}, n, lam)
    q4 = np.round(t["score"].to_numpy(zero_copy_only=False)
                  * 10_000).astype(np.int64).tolist()
    vec_of = candidate_vectors(docs_path, doc_ids, dim=dim)
    return mmr_rerank(doc_ids, q4, vec_of, n, lam)

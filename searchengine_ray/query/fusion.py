"""Reciprocal-rank fusion (RRF, Cormack/Clarke/Büttcher SIGIR'09):
combine rankings from different scorers (BM25, TF-IDF, ANN, ...)
by summing 1/(k0 + rank) per document — the standard ensemble /
hybrid-retrieval combiner, robust to incomparable score scales.

Float discipline: each contribution 1/(k0+rank) is one correctly-
rounded IEEE divide of small integers, identical in numpy and DuckDB;
a document gets at most len(rankings) contributions and IEEE addition
of ≤2 terms is order-free (commutative), so with two input rankings
the fused score is bit-identical to the SQL oracle before the final
round-to-int quantization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rrf_fuse(rankings: list[pa.Table], n: int = 10,
             k0: int = 60) -> pa.Table:
    """→ (rank, doc_id, rrf_q6): fuse ranked result tables (each with
    ``rank`` and ``doc_id`` columns, rank starting at 1) by RRF score
    sum(1/(k0+rank)) — descending, ties doc_id ascending."""
    acc: dict[int, float] = {}
    for t in rankings:
        for d, r in zip(t["doc_id"].to_pylist(), t["rank"].to_pylist()):
            acc[d] = acc.get(d, 0.0) + 1.0 / (k0 + int(r))
    if not acc:
        return pa.table({"rank": pa.array([], pa.int32()),
                         "doc_id": pa.array([], pa.int64()),
                         "rrf_q6": pa.array([], pa.int64())})
    doc = np.asarray(list(acc.keys()), np.int64)
    sc = np.asarray(list(acc.values()), np.float64)
    order = np.lexsort((doc, -sc))[:n]
    return pa.table({
        "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int32),
                         pa.int32()),
        "doc_id": pa.array(doc[order], pa.int64()),
        "rrf_q6": pa.array(np.round(sc[order] * 1e6).astype(np.int64),
                           pa.int64()),
    })

"""Snippet windows: for each document matching a query, the best
fixed-width token window — the one covering the most distinct query
terms (tie: leftmost). The classic result-snippet primitive a serving
layer needs; the reference engine (tiagorainho/SearchEngine) returns
bare urls, so this extends the query surface.

Semantics: token positions are ordinals in the simple-token stream
(post min-length filter), and windows START AT A QUERY-TERM HIT —
lossless for coverage (shifting a window right to its first hit keeps
every hit inside) and it makes the tie rule deterministic.

Scale path: everything is doc-local, so one vectorized ``map_batches``
pass computes each doc's best window with numpy searchsorted over a
composite (doc, position) coordinate — no per-row loop, no shuffle.
Each batch then emits only its local top-k rows, so the driver folds
k × n_blocks tiny partials (the cosine_topk pattern), never one row
per matching document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.pipelines.analysis import simple_tokens_flat

_EMPTY = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "win_start": pa.array([], pa.int64()),
    "n_terms": pa.array([], pa.int64()),
})

# Composite coordinate stride: windows never cross documents because
# width << 2^32 while consecutive docs sit 2^32 apart.
_DOC_STRIDE = np.int64(1) << 32


def snippet_windows_batch(
    batch: pa.Table, query_terms: list[str], width: int, k: int
) -> pa.Table:
    """Per-batch best window per matching doc, pruned to the batch-local
    top-k by (n_terms desc, doc_id asc) — exact for a global top-k fold
    because a doc never spans batches."""
    flat, parents = simple_tokens_flat(batch["text"])
    if len(flat) == 0:
        return _EMPTY
    par = np.asarray(parents, dtype=np.int64)
    # post-filter ordinal of each token within its doc
    boundary = np.empty(len(par), dtype=bool)
    boundary[0] = True
    np.not_equal(par[1:], par[:-1], out=boundary[1:])
    seg_start = np.where(boundary)[0]
    seg_len = np.diff(np.append(seg_start, len(par)))
    pos = np.arange(len(par), dtype=np.int64) - np.repeat(seg_start, seg_len)

    qarr = pa.array(query_terms, pa.string())
    term_id = np.asarray(
        pc.fill_null(pc.index_in(flat, value_set=qarr), -1), dtype=np.int64
    )
    m = term_id >= 0
    if not m.any():
        return _EMPTY
    hit_par, hit_pos, hit_tid = par[m], pos[m], term_id[m]
    g = hit_par * _DOC_STRIDE + hit_pos          # sorted ascending
    n_terms = np.zeros(len(g), dtype=np.int64)
    for t in range(len(query_terms)):
        gt = g[hit_tid == t]
        n_terms += np.searchsorted(gt, g + width) > np.searchsorted(gt, g)

    # best window per doc: lexsort by (doc, -coverage, start), keep the
    # first row of each doc run
    order = np.lexsort((hit_pos, -n_terms, hit_par))
    sp = hit_par[order]
    first = np.empty(len(sp), dtype=bool)
    first[0] = True
    np.not_equal(sp[1:], sp[:-1], out=first[1:])
    sel = order[first]

    doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)[hit_par[sel]]
    best_start, best_cov = hit_pos[sel], n_terms[sel]
    # batch-local top-k prune
    top = np.lexsort((doc_ids, -best_cov))[:k]
    return pa.table({
        "doc_id": pa.array(doc_ids[top], pa.int64()),
        "win_start": pa.array(best_start[top], pa.int64()),
        "n_terms": pa.array(best_cov[top], pa.int64()),
    })


def snippet_windows(
    docs_ds, query_terms: list[str], width: int = 8, k: int = 20
) -> pa.Table:
    """→ pa.Table (doc_id, win_start, n_terms): the global top-``k``
    matching docs by (coverage desc, doc_id asc), each with its best
    window start."""
    parts = docs_ds.map_batches(
        snippet_windows_batch,
        fn_kwargs={"query_terms": list(query_terms),
                   "width": int(width), "k": int(k)},
        batch_format="pyarrow",
    ).take_all()                                  # ≤ k rows per block
    if not parts:
        return _EMPTY
    t = pa.Table.from_pylist(parts, schema=_EMPTY.schema)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    cov = t["n_terms"].to_numpy(zero_copy_only=False)
    top = np.lexsort((doc, -cov))[:k]
    return t.take(pa.array(top, pa.int64()))

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
    "snippet": pa.array([], pa.string()),
})

# Composite coordinate stride: windows never cross documents because
# width << 2^32 while consecutive docs sit 2^32 apart.
_SHIFT = np.int64(32)
_DOC_STRIDE = np.int64(1) << _SHIFT


def _best_window_per_doc(g: np.ndarray, tid: np.ndarray, n_query_terms: int,
                         width: int):
    """Core kernel. ``g``: SORTED composite (doc << 32 | pos) hit
    coordinates; ``tid``: query-term id per hit. → (doc_part, win_start,
    coverage) arrays with one row per doc — its max-coverage window,
    leftmost on ties."""
    n_terms = np.zeros(len(g), dtype=np.int64)
    for t in range(n_query_terms):
        gt = g[tid == t]
        n_terms += np.searchsorted(gt, g + width) > np.searchsorted(gt, g)
    doc = (g >> _SHIFT).astype(np.int64)
    pos = (g & (_DOC_STRIDE - 1)).astype(np.int64)
    order = np.lexsort((pos, -n_terms, doc))
    sd = doc[order]
    first = np.empty(len(sd), dtype=bool)
    first[0] = True
    np.not_equal(sd[1:], sd[:-1], out=first[1:])
    sel = order[first]
    return doc[sel], pos[sel], n_terms[sel]


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
    g = par[m] * _DOC_STRIDE + pos[m]            # sorted ascending
    best_par, best_start, best_cov = _best_window_per_doc(
        g, term_id[m], len(query_terms), width
    )
    doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)[best_par]
    # batch-local top-k prune
    top = np.lexsort((doc_ids, -best_cov))[:k]
    best_par, best_start, best_cov = best_par[top], best_start[top], \
        best_cov[top]
    # snippet text: gather the window's tokens and join — one ragged
    # take + one binary_join, no per-row loop
    counts = np.diff(np.append(seg_start, len(par)))
    row_of_seg = par[seg_start]                    # parent row per segment
    seg_of_par = np.full(int(par.max()) + 1, -1, dtype=np.int64)
    seg_of_par[row_of_seg] = np.arange(len(seg_start))
    seg_idx = seg_of_par[best_par]
    lens = np.minimum(width, counts[seg_idx] - best_start)
    offs = np.concatenate(([0], np.cumsum(lens)))
    flat_idx = (np.repeat(seg_start[seg_idx] + best_start, lens)
                + np.arange(int(offs[-1])) - np.repeat(offs[:-1], lens))
    toks = flat.take(pa.array(flat_idx, pa.int64()))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), toks)
    return pa.table({
        "doc_id": pa.array(doc_ids[top], pa.int64()),
        "win_start": pa.array(best_start, pa.int64()),
        "n_terms": pa.array(best_cov, pa.int64()),
        "snippet": pc.binary_join(lists, " "),
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


def index_snippets(searcher, query: str, n: int | None = None,
                   width: int = 8) -> pa.Table:
    """→ pa.Table (rank, doc_id, score, win_start, n_terms): the
    searcher's top-n results, each with its best query-coverage window
    computed FROM THE POSITIONAL INDEX — no document text is re-read or
    re-tokenized at serve time; positions decode lazily for exactly the
    top-n docs (the phrase-search subset decoder). Window positions are
    ordinals in the index's filtered token stream (post stop-word /
    stemming), and coverage counts distinct POST-TOKENIZATION query
    terms, so duplicate query words collapse.

    Serving-scale note: cost is O(top_n · |terms| · log df) searchsorted
    probes plus the candidate-only position decode — independent of
    corpus size given the fetched postings (which the posting LRU
    already holds right after scoring)."""
    tokens = searcher.tokenizer.tokenize(query)
    doc_ids, scores = searcher.search_tokens(tokens, n)
    out_base = {
        "rank": pa.array(np.arange(1, doc_ids.size + 1, dtype=np.int32),
                         pa.int32()),
        "doc_id": pa.array(doc_ids, pa.int64()),
        "score": pa.array(scores, pa.float64()),
    }
    empty_win = {
        "win_start": pa.array(np.full(doc_ids.size, -1), pa.int64()),
        "n_terms": pa.array(np.zeros(doc_ids.size, np.int64), pa.int64()),
    }
    uniq = list(dict.fromkeys(tokens))
    if doc_ids.size == 0 or not uniq:
        return pa.table({**out_base, **empty_win})
    recs = searcher.reader.fetch(uniq)
    rs = {t: recs[t] for t in uniq if t in recs}
    if any(r.positions is None for r in rs.values()):
        raise ValueError(
            "index snippets need a positional index (build with "
            "posting_type=POSITIONAL)"
        )
    rank_order = np.argsort(doc_ids, kind="stable")
    sorted_docs = doc_ids[rank_order].astype(np.int64)
    gs, tids = [], []
    for t_id, t in enumerate(uniq):
        r = rs.get(t)
        if r is None:
            continue
        idx = np.searchsorted(r.doc_ids, sorted_docs)
        np.clip(idx, 0, max(0, r.doc_ids.size - 1), out=idx)
        present = r.doc_ids[idx] == sorted_docs
        if not present.any():
            continue
        flat, lens, _ = r.positions_slices(idx[present])
        drank = np.repeat(rank_order[present].astype(np.int64), lens)
        gs.append(drank * _DOC_STRIDE + flat.astype(np.int64))
        tids.append(np.full(flat.size, t_id, dtype=np.int64))
    if not gs:
        return pa.table({**out_base, **empty_win})
    g = np.concatenate(gs)
    tid = np.concatenate(tids)
    order = np.argsort(g, kind="stable")
    best_rank, best_start, best_cov = _best_window_per_doc(
        g[order], tid[order], len(uniq), width
    )
    win = np.full(doc_ids.size, -1, dtype=np.int64)
    cov = np.zeros(doc_ids.size, dtype=np.int64)
    win[best_rank] = best_start
    cov[best_rank] = best_cov
    return pa.table({
        **out_base,
        "win_start": pa.array(win, pa.int64()),
        "n_terms": pa.array(cov, pa.int64()),
    })

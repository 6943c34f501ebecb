"""Document-level term co-occurrence and PMI (pointwise mutual
information): which term pairs appear in the same document far more
often than chance — the classic collocation / topic-signal statistic
for corpus analysis (Church & Hanks 1990).

Scale path: naive pair counting explodes — a doc with m distinct terms
yields m(m-1)/2 pairs, and the pair vocabulary is |V|^2. Two bounds
make it tractable at web scale:

  1. the pair alphabet is capped FIRST: a bounded df fold (fold.py)
     picks the candidate vocabulary (df >= min_df, top max_vocab by
     (df desc, term asc)) and broadcasts it once via ``ray.put`` —
     per-doc pairs are generated only among candidates, so the pair
     key space is at most max_vocab^2 and in practice far smaller;
  2. per-batch combiners count pairs locally (one row per distinct
     pair per batch) before the bounded fold, so the shuffle payload
     is distinct-pair-sized, not occurrence-sized.

Pair generation is vectorized by grouping docs by their candidate-set
size m and applying ``np.triu_indices(m)`` to all docs of that size at
once — no per-doc Python loop.

Float discipline (the lm.py pattern): PMI is emitted as
``pmi_q6 = round(ln((n_ab*N)/(n_a*n_b)) * 1e6)`` int64, computed with
``math.log`` over exact integer ratios — bit-identical to the DuckDB
oracle's ``round(ln(..) * 1000000)``. The integer products assume
n_ab*N and n_a*n_b fit int64 (N < ~3e9 at full precision; above that,
switch the oracle and this op to log-difference form together).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.pipelines.analysis import simple_tokens_flat

_EMPTY_PAIRS = pa.table({
    "term_a": pa.array([], pa.string()),
    "term_b": pa.array([], pa.string()),
    "n_ab_partial": pa.array([], pa.int64()),
})

_EMPTY_OUT = pa.table({
    "term_a": pa.array([], pa.string()),
    "term_b": pa.array([], pa.string()),
    "n_ab": pa.array([], pa.int64()),
    "pmi_q6": pa.array([], pa.int64()),
})


class PairCountStage:
    """Actor-pool stage: per-batch distinct-pair counts over the
    broadcast candidate vocabulary (``ray.put`` once, fetched per actor
    in ``__init__``)."""

    def __init__(self, vocab_ref) -> None:
        import ray

        self.vocab: pa.Array = ray.get(vocab_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents = simple_tokens_flat(batch["text"])
        if len(flat) == 0:
            return _EMPTY_PAIRS
        par = np.asarray(parents, dtype=np.int64)
        tid = np.asarray(
            pc.fill_null(pc.index_in(flat, value_set=self.vocab), -1),
            dtype=np.int64,
        )
        m = tid >= 0
        if not m.any():
            return _EMPTY_PAIRS
        # distinct (doc, candidate term) — composite key unique
        nv = np.int64(len(self.vocab))
        comp = np.unique(par[m] * nv + tid[m])
        doc, term = comp // nv, comp % nv
        # segment sizes per doc (comp sorted => doc grouped)
        _, seg_start, seg_len = np.unique(doc, return_index=True,
                                          return_counts=True)
        a_parts, b_parts = [], []
        for sz in np.unique(seg_len):
            if sz < 2:
                continue
            rows = seg_start[seg_len == sz]
            # (n_docs, sz) matrix of term ids for every doc of size sz
            mat = term[rows[:, None] + np.arange(sz)[None, :]]
            iu, ju = np.triu_indices(int(sz), k=1)
            a_parts.append(mat[:, iu].ravel())
            b_parts.append(mat[:, ju].ravel())
        if not a_parts:
            return _EMPTY_PAIRS
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        # per-batch combiner: count distinct pairs (terms sorted => a<b)
        pk, cnt = np.unique(a * nv + b, return_counts=True)
        return pa.table({
            "term_a": self.vocab.take(pa.array(pk // nv, pa.int64())),
            "term_b": self.vocab.take(pa.array(pk % nv, pa.int64())),
            "n_ab_partial": pa.array(cnt.astype(np.int64), pa.int64()),
        })


def pmi_pairs(
    docs_ds,
    min_df: int = 2,
    min_pairs: int = 2,
    k: int = 50,
    max_vocab: int = 100_000,
    concurrency=None,
    fold_mode: str = "auto",
) -> pa.Table:
    """→ pa.Table (term_a, term_b, n_ab, pmi_q6): the top-``k``
    candidate-term pairs by document-level PMI (ties: term_a, term_b
    asc). n_ab counts docs containing both terms; PMI uses document
    frequencies and the total doc count N."""
    import ray

    from searchengine_ray.pipelines.analysis import term_df_partial_batch
    from searchengine_ray.pipelines.fold import fold_count_partials
    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    n_docs = docs_ds.count()
    df_tbl = fold_count_partials(
        docs_ds.map_batches(term_df_partial_batch, batch_format="pyarrow"),
        key_cols=["term"],
        sum_col="df_partial",
        mode=fold_mode,
        empty_result=pa.table({"term": pa.array([], pa.string()),
                               "df_partial_sum": pa.array([], pa.int64())}),
    )
    cand = [(t, int(d)) for t, d in zip(df_tbl["term"].to_pylist(),
                                        df_tbl["df_partial_sum"].to_pylist())
            if d >= min_df]
    if len(cand) > max_vocab:             # deterministic df-desc cap
        cand.sort(key=lambda td: (-td[1], td[0]))
        cand = cand[:max_vocab]
    if len(cand) < 2:
        return _EMPTY_OUT
    cand.sort(key=lambda td: td[0])       # sorted => tid asc = term asc
    vocab = pa.array([t for t, _ in cand], pa.string())
    df_of = dict(cand)

    folded = fold_count_partials(
        docs_ds.map_batches(
            PairCountStage,
            fn_constructor_kwargs={"vocab_ref": ray.put(vocab)},
            batch_format="pyarrow",
            concurrency=concurrency or autoscale_concurrency(),
        ),
        key_cols=["term_a", "term_b"],
        sum_col="n_ab_partial",
        mode=fold_mode,
        empty_result=pa.table({
            "term_a": pa.array([], pa.string()),
            "term_b": pa.array([], pa.string()),
            "n_ab_partial_sum": pa.array([], pa.int64()),
        }),
    )
    rows = []
    lut: dict[tuple[int, int], int] = {}
    for ta, tb, nab in zip(folded["term_a"].to_pylist(),
                           folded["term_b"].to_pylist(),
                           folded["n_ab_partial_sum"].to_pylist()):
        if nab < min_pairs:
            continue
        na, nb = df_of[ta], df_of[tb]
        key = (nab * n_docs, na * nb)
        q = lut.get(key)
        if q is None:
            q = int(np.round(math.log(key[0] / key[1]) * 1_000_000))
            lut[key] = q
        rows.append((-q, ta, tb, nab))
    rows.sort()
    return pa.table({
        "term_a": pa.array([r[1] for r in rows[:k]], pa.string()),
        "term_b": pa.array([r[2] for r in rows[:k]], pa.string()),
        "n_ab": pa.array([r[3] for r in rows[:k]], pa.int64()),
        "pmi_q6": pa.array([-r[0] for r in rows[:k]], pa.int64()),
    })


def expand_query(docs_ds, query_terms: list[str], k: int = 3,
                 min_df: int = 2, min_pairs: int = 2,
                 max_vocab: int = 100_000, **kw) -> pa.Table:
    """→ pa.Table (qterm, term, pmi_q6): PMI query expansion — for each
    query term, the top-``k`` most-associated corpus terms (ties term
    asc). Runs the pmi_pairs pipeline with an UNCAPPED pair list
    (k=all) restricted to pairs touching a query term, then picks each
    query term's best partners on the driver (q×k rows)."""
    qset = {q.lower() for q in query_terms}
    pairs = pmi_pairs(docs_ds, min_df=min_df, min_pairs=min_pairs,
                      k=2**31 - 1, max_vocab=max_vocab, **kw)
    best: dict[str, list] = {q: [] for q in sorted(qset)}
    for ta, tb, q6 in zip(pairs["term_a"].to_pylist(),
                          pairs["term_b"].to_pylist(),
                          pairs["pmi_q6"].to_pylist()):
        if ta in qset:
            best[ta].append((-q6, tb))
        if tb in qset:
            best[tb].append((-q6, ta))
    out_q, out_t, out_p = [], [], []
    for q in sorted(best):
        for negq6, t in sorted(best[q])[:k]:
            out_q.append(q)
            out_t.append(t)
            out_p.append(-negq6)
    return pa.table({
        "qterm": pa.array(out_q, pa.string()),
        "term": pa.array(out_t, pa.string()),
        "pmi_q6": pa.array(out_p, pa.int64()),
    })


class WindowPairStage:
    """Per-batch WINDOWED co-occurrence partials (skip-gram counting,
    word2vec-style statistics): ordered position pairs (i < j,
    j − i ≤ w) of DISTINCT candidate terms, canonicalized (a < b) and
    counted per instance — plus candidate-instance unigram partials.
    Vectorized per offset d ∈ 1..w (tid[:-d] vs tid[d:], same-doc
    mask) — no per-doc loop."""

    def __init__(self, vocab_ref, window: int) -> None:
        import ray

        self.vocab: pa.Array = ray.get(vocab_ref)
        self.window = int(window)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents = simple_tokens_flat(batch["text"])
        if len(flat) == 0:
            return _EMPTY_PAIRS
        par = np.asarray(parents, dtype=np.int64)
        tid = np.asarray(
            pc.fill_null(pc.index_in(flat, value_set=self.vocab), -1),
            dtype=np.int64,
        )
        nv = np.int64(len(self.vocab))
        a_parts, b_parts = [], []
        for d in range(1, self.window + 1):
            if tid.size <= d:
                break
            a, b = tid[:-d], tid[d:]
            ok = (par[:-d] == par[d:]) & (a >= 0) & (b >= 0) & (a != b)
            if ok.any():
                lo = np.minimum(a[ok], b[ok])
                hi = np.maximum(a[ok], b[ok])
                a_parts.append(lo)
                b_parts.append(hi)
        if not a_parts:
            return _EMPTY_PAIRS
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        pk, cnt = np.unique(a * nv + b, return_counts=True)
        return pa.table({
            "term_a": self.vocab.take(pa.array(pk // nv, pa.int64())),
            "term_b": self.vocab.take(pa.array(pk % nv, pa.int64())),
            "n_ab_partial": pa.array(cnt.astype(np.int64), pa.int64()),
        })


def window_pmi(
    docs_ds,
    window: int = 3,
    min_count: int = 2,
    min_pairs: int = 2,
    k: int = 50,
    max_vocab: int = 100_000,
    concurrency=None,
    fold_mode: str = "auto",
) -> pa.Table:
    """→ pa.Table (term_a, term_b, n_ab, pmi_q6): top-``k`` candidate
    pairs by WINDOWED PMI — co-occurrence within ±``window`` token
    positions, counted per INSTANCE (where ``pmi_pairs`` counts whole
    documents). The word-embedding-style association statistic:
    p(a) = n_a/S over candidate-token instances, p(ab) = n_ab/P over
    in-window distinct-candidate pairs, pmi = ln(n_ab·S·S / (P·n_a·n_b))
    quantized exactly like pmi_pairs (single int-ratio math.log; the
    integer products bound the corpus at ~2^53 candidate instances —
    beyond that switch op and oracle to log-difference together).

    Scale shape = pmi_pairs: bounded instance-count fold picks the
    candidate vocabulary (broadcast once), per-batch pair combiners,
    bounded pair fold — two passes, both pre-aggregated."""
    import ray

    from searchengine_ray.pipelines.analysis import term_cf_partial_batch
    from searchengine_ray.pipelines.fold import fold_count_partials
    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    cf_tbl = fold_count_partials(
        docs_ds.map_batches(term_cf_partial_batch, batch_format="pyarrow"),
        key_cols=["term"],
        sum_col="cf_partial",
        mode=fold_mode,
        empty_result=pa.table({"term": pa.array([], pa.string()),
                               "cf_partial_sum": pa.array([], pa.int64())}),
    )
    cand = [(t, int(c)) for t, c in zip(cf_tbl["term"].to_pylist(),
                                        cf_tbl["cf_partial_sum"].to_pylist())
            if c >= min_count]
    if len(cand) > max_vocab:            # deterministic cf-desc cap
        cand.sort(key=lambda tc: (-tc[1], tc[0]))
        cand = cand[:max_vocab]
    if len(cand) < 2:
        return _EMPTY_OUT
    cand.sort(key=lambda tc: tc[0])      # sorted => tid asc = term asc
    vocab = pa.array([t for t, _ in cand], pa.string())
    cf_of = dict(cand)
    s_total = sum(cf_of.values())

    folded = fold_count_partials(
        docs_ds.map_batches(
            WindowPairStage,
            fn_constructor_kwargs={"vocab_ref": ray.put(vocab),
                                   "window": int(window)},
            batch_format="pyarrow",
            concurrency=concurrency or autoscale_concurrency(),
        ),
        key_cols=["term_a", "term_b"],
        sum_col="n_ab_partial",
        mode=fold_mode,
        empty_result=pa.table({
            "term_a": pa.array([], pa.string()),
            "term_b": pa.array([], pa.string()),
            "n_ab_partial_sum": pa.array([], pa.int64()),
        }),
    )
    tab = folded["term_a"].to_pylist()
    tbb = folded["term_b"].to_pylist()
    nabs = folded["n_ab_partial_sum"].to_pylist()
    p_total = sum(nabs)
    rows = []
    for ta, tb, nab in zip(tab, tbb, nabs):
        if nab < min_pairs:
            continue
        q = int(np.round(math.log(
            (nab * s_total * s_total)
            / (p_total * cf_of[ta] * cf_of[tb])) * 1_000_000))
        rows.append((-q, ta, tb, nab))
    rows.sort()
    return pa.table({
        "term_a": pa.array([r[1] for r in rows[:k]], pa.string()),
        "term_b": pa.array([r[2] for r in rows[:k]], pa.string()),
        "n_ab": pa.array([r[3] for r in rows[:k]], pa.int64()),
        "pmi_q6": pa.array([-r[0] for r in rows[:k]], pa.int64()),
    })

"""Exact quantiles of an UNBOUNDED numeric column without a global
sort — the distributed selection algorithm (sample pivots → exact rank
counts → bounded gap collection; the classic approach behind
Munro-Paterson / sample-based exact selection):

  pass A: every batch contributes a deterministic stride sample of its
          sorted values (no RNG — answers must not depend on luck);
          the driver merges them into ≤ ``max_pivots`` pivots.
  pass B: every batch emits exact counts of values < pivot AND
          ≤ pivot (two vectorized searchsorteds per batch) — folded
          into global ranks per pivot (a pivot-sized fold).
  pass C: each requested rank either lands inside some pivot value's
          duplicate run (answered immediately from the counts) or in
          one open pivot gap, whose EXACT size is known from pass B
          before anything is fetched. Gaps that fit the ``max_collect``
          budget are collected (chunked so no single fetch exceeds the
          budget) and the k-th smallest picked locally; oversized gaps
          are REFINED instead — pass A+B re-run restricted to the gap,
          which shrinks the unresolved range by ~the sampling density
          per round — until every rank resolves. Only ``max_depth``
          fruitless refinement rounds raise (degenerate distributions
          resolve via the duplicate-run shortcut long before that).

The ANSWER is exact for any pivot quality — pivots only bound pass C's
fetch sizes. Compare: ``ds.sort`` + rank pick moves every row across
the cluster; ``token_quantiles``'s histogram trick needs a bounded
value domain. This op needs neither.

Semantics: PERCENTILE_DISC (DuckDB ``quantile_disc``): the smallest
value whose cumulative count reaches ceil(pct/100 · N).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

_LOG = logging.getLogger(__name__)


def _restrict(batch: pa.Table, col: str, lo, hi) -> np.ndarray:
    v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    v = v[~np.isnan(v)]
    if lo is not None:
        v = v[v >= lo]
    if hi is not None:
        v = v[v < hi]
    return v


def _sample_batch(batch: pa.Table, col: str, stride_target: int,
                  lo=None, hi=None) -> pa.Table:
    v = np.sort(_restrict(batch, col, lo, hi))
    if v.size == 0:
        return pa.table({"pivot": pa.array([], pa.float64())})
    step = max(1, v.size // stride_target)
    return pa.table({"pivot": pa.array(v[::step], pa.float64())})


def _count_batch(batch: pa.Table, col: str, pivots: list,
                 lo=None, hi=None) -> pa.Table:
    """Interleaved (lt_0, le_0, lt_1, le_1, …, total) counts within
    [lo, hi) — one emitted row per counter so the pivot-sized fold
    stays a single sum column."""
    v = np.sort(_restrict(batch, col, lo, hi))
    p = np.asarray(pivots, np.float64)
    cnt = np.empty(2 * p.size + 1, dtype=np.int64)
    cnt[0:2 * p.size:2] = np.searchsorted(v, p, side="left")
    cnt[1:2 * p.size:2] = np.searchsorted(v, p, side="right")
    cnt[-1] = v.size
    idx = np.arange(cnt.size)
    return pa.table({
        "pidx": pa.array(idx, pa.int64()),
        "pkey": pa.array([str(i) for i in idx], pa.string()),
        "cnt": pa.array(cnt, pa.int64()),
    })


def _collect_batch(batch: pa.Table, col: str, intervals: list) -> pa.Table:
    v = _restrict(batch, col, None, None)
    keep = np.zeros(v.size, dtype=bool)
    for lo, hi in intervals:
        m = np.ones(v.size, dtype=bool)
        if lo is not None:
            m &= v >= lo
        if hi is not None:
            m &= v < hi
        keep |= m
    return pa.table({"v": pa.array(v[keep], pa.float64())})


def _pivots_in(ds, col: str, lo, hi, stride_target: int,
               max_pivots: int) -> np.ndarray:
    samp = ds.map_batches(
        _sample_batch,
        fn_kwargs={"col": col, "stride_target": stride_target,
                   "lo": lo, "hi": hi},
        batch_format="pyarrow",
    ).take_all()  # bounded: ≤ stride_target rows per input block
    pivots = np.unique(np.asarray([r["pivot"] for r in samp], np.float64))
    if pivots.size > max_pivots:
        step = int(np.ceil(pivots.size / max_pivots))
        pivots = pivots[::step]
    return pivots


def _rank_counts(ds, col: str, pivots: np.ndarray, lo, hi, fold_mode):
    """→ (lt, le, total): exact global counts of values < / ≤ each
    pivot within [lo, hi), plus the interval's total count."""
    from searchengine_ray.pipelines.fold import fold_count_partials

    folded = fold_count_partials(
        ds.map_batches(
            _count_batch,
            fn_kwargs={"col": col, "pivots": [float(x) for x in pivots],
                       "lo": lo, "hi": hi},
            batch_format="pyarrow",
        ),
        key_cols=["pidx", "pkey"],
        sum_col="cnt",
        bucket_col="pkey",
        mode=fold_mode,
    )
    arr = np.zeros(2 * pivots.size + 1, dtype=np.int64)
    arr[folded["pidx"].to_numpy(zero_copy_only=False)] = \
        folded["cnt_sum"].to_numpy(zero_copy_only=False)
    return arr[0:-1:2], arr[1:-1:2], int(arr[-1])


def _dispatch(pivots: np.ndarray, lt: np.ndarray, le: np.ndarray,
              total: int, lo, hi, jobs: list):
    """Route each (key, local_rank) job: duplicate runs of a pivot
    value answer immediately; the rest land in one open sub-gap whose
    exact size is known. → (resolved {key: value},
    subjobs [(key, sub_local_rank, sub_lo, sub_hi, sub_count)])."""
    resolved, subjobs = {}, []
    for key, r in jobs:
        j = int(np.searchsorted(le, r, side="left"))  # first le_j >= r
        if j < pivots.size and lt[j] < r <= le[j]:
            resolved[key] = float(pivots[j])
            continue
        if j < pivots.size:
            sub_lo = (float(np.nextafter(pivots[j - 1], np.inf))
                      if j > 0 else lo)
            sub_hi = float(pivots[j])
            below = int(le[j - 1]) if j > 0 else 0
            count = int(lt[j]) - below
        else:
            sub_lo = (float(np.nextafter(pivots[-1], np.inf))
                      if pivots.size else lo)
            sub_hi = hi
            below = int(le[-1]) if pivots.size else 0
            count = total - below
        subjobs.append((key, r - below, sub_lo, sub_hi, count))
    return resolved, subjobs


def exact_quantiles(ds, col: str, pcts=(25, 50, 75, 90, 99),
                    max_pivots: int = 2048, stride_target: int = 256,
                    max_collect: int = 5_000_000,
                    fold_mode: str = "auto",
                    max_depth: int = 8) -> pa.Table:
    """→ pa.Table (pct, v_q float64): exact discrete quantiles of
    ``ds[col]`` (NaNs ignored). Sample/count/collect passes, no global
    sort; oversized pivot gaps are recursively re-pivoted (up to
    ``max_depth`` rounds) instead of aborting, so a degenerate pivot
    draw costs extra bounded passes, not the job."""
    empty = pa.table({"pct": pa.array([], pa.int64()),
                      "v_q": pa.array([], pa.float64())})

    pivots = _pivots_in(ds, col, None, None, stride_target, max_pivots)
    if pivots.size == 0:
        return empty
    lt, le, n = _rank_counts(ds, col, pivots, None, None, fold_mode)
    if n == 0:
        return empty

    jobs = [(int(p), max((int(p) * n + 99) // 100, 1)) for p in pcts]
    answers, pending = _dispatch(pivots, lt, le, n, None, None, jobs)

    for depth in range(max_depth + 1):
        if not pending:
            break
        # gaps that fit the budget are fetched (chunked so no single
        # fetch exceeds max_collect); oversized gaps are refined
        by_gap: dict[tuple, list] = {}
        for key, r, lo, hi, count in pending:
            by_gap.setdefault((lo, hi, count), []).append((key, r))
        fetch, refine = [], []
        for (lo, hi, count), gjobs in by_gap.items():
            (fetch if count <= max_collect else refine).append(
                (lo, hi, count, gjobs))

        chunk: list = []
        chunk_count = 0
        chunks = []
        for item in sorted(fetch, key=lambda it: (it[0] is None,
                                                  it[0] or 0.0)):
            if chunk and chunk_count + item[2] > max_collect:
                chunks.append(chunk)
                chunk, chunk_count = [], 0
            chunk.append(item)
            chunk_count += item[2]
        if chunk:
            chunks.append(chunk)
        for ch in chunks:
            got = ds.map_batches(
                _collect_batch,
                fn_kwargs={"col": col,
                           "intervals": [(lo, hi) for lo, hi, _, _ in ch]},
                batch_format="pyarrow",
            ).take_all()  # bounded: Σ gap counts ≤ max_collect by
            # construction (sizes are exact pass-B counts)
            vals = np.sort(np.asarray([r["v"] for r in got], np.float64))
            for lo, hi, _, gjobs in ch:
                m = np.ones(vals.size, dtype=bool)
                if lo is not None:
                    m &= vals >= lo
                if hi is not None:
                    m &= vals < hi
                gap_vals = vals[m]
                for key, r in gjobs:
                    answers[key] = float(gap_vals[r - 1])

        pending = []
        if refine and depth == max_depth:
            worst = max(c for _, _, c, _ in refine)
            raise RuntimeError(
                f"quantile gap of {worst} rows still exceeds "
                f"max_collect={max_collect} after {max_depth} "
                f"re-pivot rounds; raise max_collect or max_depth")
        for lo, hi, count, gjobs in refine:
            _LOG.info(
                "re-pivoting oversized quantile gap [%s, %s) of %d rows "
                "(round %d)", lo, hi, count, depth + 1)
            sub_p = _pivots_in(ds, col, lo, hi, stride_target, max_pivots)
            s_lt, s_le, s_total = _rank_counts(ds, col, sub_p, lo, hi,
                                               fold_mode)
            res, subs = _dispatch(sub_p, s_lt, s_le, s_total, lo, hi, gjobs)
            answers.update(res)
            pending.extend(subs)

    out_p = sorted(answers)
    return pa.table({"pct": pa.array(out_p, pa.int64()),
                     "v_q": pa.array([answers[p] for p in out_p],
                                     pa.float64())})

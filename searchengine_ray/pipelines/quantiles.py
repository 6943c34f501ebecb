"""Exact quantiles of an UNBOUNDED numeric column without a global
sort — the distributed selection algorithm (sample pivots → exact rank
counts → bounded gap collection; the classic approach behind
Munro-Paterson / sample-based exact selection):

  pass A: every batch contributes a deterministic stride sample of its
          sorted values (no RNG — answers must not depend on luck);
          the driver merges them into ≤ ``max_pivots`` pivots.
  pass B: every batch emits exact counts of values < each pivot (one
          vectorized searchsorted per batch) — folded into global
          cumulative ranks per pivot (a pivot-sized fold).
  pass C: for each requested rank the answer lies in one pivot gap;
          one filter pass collects the union of needed gaps (expected
          gap size ≈ N / |pivots|) and the exact k-th smallest is
          picked locally.

The ANSWER is exact for any pivot quality — pivots only bound pass C's
collection size (``max_collect`` guards against a degenerate sample;
a corpus where one value fills a whole gap still collects fine since
duplicates of a candidate value land in one gap by the strict-< count
convention). Compare: ``ds.sort`` + rank pick moves every row across
the cluster; ``token_quantiles``'s histogram trick needs a bounded
value domain. This op needs neither.

Semantics: PERCENTILE_DISC (DuckDB ``quantile_disc``): the smallest
value whose cumulative count reaches ceil(pct/100 · N).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sample_batch(batch: pa.Table, col: str, stride_target: int) -> pa.Table:
    v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    v = np.sort(v[~np.isnan(v)])
    if v.size == 0:
        return pa.table({"pivot": pa.array([], pa.float64())})
    step = max(1, v.size // stride_target)
    return pa.table({"pivot": pa.array(v[::step], pa.float64())})


def _count_batch(batch: pa.Table, col: str, pivots: list) -> pa.Table:
    v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    v = np.sort(v[~np.isnan(v)])
    cnt = np.searchsorted(v, np.asarray(pivots, np.float64), side="left")
    return pa.table({
        "pidx": pa.array(np.arange(len(pivots)), pa.int64()),
        "pkey": pa.array([str(i) for i in range(len(pivots))],
                         pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def _collect_batch(batch: pa.Table, col: str, intervals: list) -> pa.Table:
    v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    v = v[~np.isnan(v)]
    keep = np.zeros(v.size, dtype=bool)
    for lo, hi in intervals:
        m = v >= lo
        if hi is not None:
            m &= v < hi
        keep |= m
    return pa.table({"v": pa.array(v[keep], pa.float64())})


def exact_quantiles(ds, col: str, pcts=(25, 50, 75, 90, 99),
                    max_pivots: int = 2048, stride_target: int = 256,
                    max_collect: int = 5_000_000,
                    fold_mode: str = "auto") -> pa.Table:
    """→ pa.Table (pct, v_q float64): exact discrete quantiles of
    ``ds[col]`` (NaNs ignored). Three passes, no global sort."""
    from searchengine_ray.pipelines.fold import fold_count_partials

    # pass A — deterministic pivots
    samp = ds.map_batches(
        _sample_batch, fn_kwargs={"col": col,
                                  "stride_target": stride_target},
        batch_format="pyarrow",
    ).take_all()
    empty = pa.table({"pct": pa.array([], pa.int64()),
                      "v_q": pa.array([], pa.float64())})
    if not samp:
        return empty
    pivots = np.unique(np.asarray([r["pivot"] for r in samp], np.float64))
    if pivots.size > max_pivots:
        step = int(np.ceil(pivots.size / max_pivots))
        pivots = pivots[::step]
    plist = [float(x) for x in pivots]

    # pass B — exact global rank below each pivot; a trailing +inf
    # sentinel pivot makes its count the total non-NaN N for free
    folded = fold_count_partials(
        ds.map_batches(_count_batch,
                       fn_kwargs={"col": col,
                                  "pivots": plist + [float("inf")]},
                       batch_format="pyarrow"),
        key_cols=["pidx", "pkey"],
        sum_col="cnt",
        bucket_col="pkey",
        mode=fold_mode,
    )
    cum_all = np.zeros(len(plist) + 1, dtype=np.int64)
    cum_all[folded["pidx"].to_numpy(zero_copy_only=False)] = \
        folded["cnt_sum"].to_numpy(zero_copy_only=False)
    cum, n = cum_all[:-1], int(cum_all[-1])
    if n == 0:
        return empty

    # locate each target rank's pivot gap
    targets = {int(p): max((int(p) * n + 99) // 100, 1) for p in pcts}
    intervals = []
    gap_of = {}
    for p, r in targets.items():
        i = int(np.searchsorted(cum, r, side="left"))  # first cum >= r
        lo = plist[i - 1] if i > 0 else float("-inf")
        hi = plist[i] if i < len(plist) else None
        below = int(cum[i - 1]) if i > 0 else 0
        gap_of[p] = (lo, hi, below)
        intervals.append((lo, hi))
    # merge duplicate intervals
    intervals = sorted(set(intervals),
                       key=lambda ab: (ab[0], ab[1] is None,
                                       ab[1] if ab[1] is not None else 0))

    # pass C — collect the gaps, pick k-th smallest locally
    got = ds.map_batches(
        _collect_batch, fn_kwargs={"col": col, "intervals": intervals},
        batch_format="pyarrow",
    ).take_all()
    if len(got) > max_collect:
        raise RuntimeError(
            f"quantile gap collection exceeded max_collect "
            f"({len(got)} > {max_collect}); raise max_pivots")
    vals = np.sort(np.asarray([r["v"] for r in got], np.float64))
    out_p, out_v = [], []
    for p in sorted(targets):
        lo, hi, below = gap_of[p]
        m = vals >= lo
        if hi is not None:
            m &= vals < hi
        gap_vals = vals[m]
        out_p.append(p)
        out_v.append(float(gap_vals[targets[p] - below - 1]))
    return pa.table({"pct": pa.array(out_p, pa.int64()),
                     "v_q": pa.array(out_v, pa.float64())})

"""exact_quantiles (pivot-selection, no global sort) vs naive
PERCENTILE_DISC, across pivot budgets, duplicates and NaNs."""

import math

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.pipelines.quantiles import exact_quantiles

PCTS = (25, 50, 75, 90, 99)


def _naive(vals):
    v = np.sort(np.asarray([x for x in vals if not math.isnan(x)]))
    return {p: float(v[max(math.ceil(p * v.size / 100), 1) - 1])
            for p in PCTS}


def _ds(vals, parts=6):
    import ray

    return ray.data.from_arrow(pa.table({
        "value": pa.array(vals, pa.float64()),
    })).repartition(parts)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("max_pivots,stride", [(2048, 256), (4, 2)])
def test_quantiles_match_naive(max_pivots, stride):
    """Exact for generous AND degenerate pivot budgets — pivots only
    bound pass C's collection, never the answer."""
    rng = np.random.default_rng(17)
    vals = np.concatenate([
        rng.normal(0, 100, 3000),
        np.repeat(42.5, 500),           # heavy duplicate block
        rng.integers(-5, 5, 500).astype(float),
        [float("nan")] * 20,
    ])
    rng.shuffle(vals)
    got = {r["pct"]: r["v_q"]
           for r in exact_quantiles(_ds(list(vals)), "value",
                                    max_pivots=max_pivots,
                                    stride_target=stride).to_pylist()}
    assert got == _naive(vals)


@pytest.mark.usefixtures("ray_session")
def test_quantiles_single_value_and_empty():
    got = {r["pct"]: r["v_q"]
           for r in exact_quantiles(_ds([7.0] * 50), "value").to_pylist()}
    assert got == {p: 7.0 for p in PCTS}
    assert exact_quantiles(_ds([float("nan")] * 10), "value").num_rows == 0

@pytest.mark.usefixtures("ray_session")
def test_quantiles_repivot_oversized_gap():
    """A collection budget far below the gap sizes forces the
    re-pivot path (the old code raised here); the answer must still be
    exact, within bounded rounds."""
    rng = np.random.default_rng(23)
    vals = rng.normal(0, 1000, 4000)
    got = {r["pct"]: r["v_q"]
           for r in exact_quantiles(_ds(list(vals)), "value",
                                    max_pivots=4, stride_target=2,
                                    max_collect=40).to_pylist()}
    assert got == _naive(vals)


@pytest.mark.usefixtures("ray_session")
def test_quantiles_duplicate_run_resolves_without_collection():
    """A value whose duplicate run dwarfs max_collect must resolve via
    the pass-B run counts (no fetch can hold it); re-pivoting alone
    would loop forever on an unsplittable gap."""
    vals = np.concatenate([
        np.repeat(3.25, 5000),             # run >> max_collect
        np.linspace(10, 20, 300),
    ])
    got = {r["pct"]: r["v_q"]
           for r in exact_quantiles(_ds(list(vals)), "value",
                                    max_pivots=8, stride_target=4,
                                    max_collect=50).to_pylist()}
    assert got == _naive(vals)


@pytest.mark.usefixtures("ray_session")
def test_quantiles_still_loud_when_unresolvable():
    """max_depth exhausted -> loud error, never a silent wrong answer.
    (Collection budget of 0 can never fetch a nonempty gap.)"""
    vals = list(np.linspace(0, 1, 400))
    with pytest.raises(RuntimeError, match="re-pivot rounds"):
        exact_quantiles(_ds(vals), "value", max_pivots=4,
                        stride_target=2, max_collect=0, max_depth=2)

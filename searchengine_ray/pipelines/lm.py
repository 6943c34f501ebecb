"""Distributed bigram language model: train + perplexity-style scoring.

The CCNet/RefinedWeb-style curation signal: train an n-gram LM on the
corpus (or a reference corpus), score every document's tokens, and
filter on the score. Here: an add-k-smoothed bigram model.

Scale shape (100 TB): training is per-batch COUNT PARTIALS (combiner)
folded into one vocabulary-bounded table — the same
aggregate-then-broadcast pattern as keywords_topk; at web scale the
bigram table is pruned to a count floor / top-M before the broadcast
(``min_count``). Scoring is ONE shuffle-free map_batches pass with the
model shipped once per actor via ``ray.put``.

Float discipline: each bigram's log-probability is quantized to an
int64 (round(ln(p)·10⁶)) BEFORE the per-doc sum, so the result is
order-independent and value-exact against the SQL oracle (a float sum
would depend on accumulation order). ln comes from a ``math.log`` LUT
over distinct (bigram count, context count) pairs — np.log differs
from libm in the last ulp.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.pipelines.analysis import (
    _ngram_join,
    simple_tokens_flat,
)

QUANT = 1_000_000


def _counts_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial unigram + bigram counts (combiner). Bigrams
    carry kind=2, unigrams kind=1, in one table."""
    flat, parents = simple_tokens_flat(batch["text"])
    par = np.asarray(parents, dtype=np.int64)
    uni = pc.value_counts(flat)
    grams, _ = _ngram_join(flat, par, 2)
    big = pc.value_counts(grams) if len(grams) else None
    cols_g, cols_k, cols_c = [], [], []
    if len(uni):
        cols_g.append(uni.field("values"))
        cols_k.append(pa.array([1] * len(uni), pa.int8()))
        cols_c.append(uni.field("counts").cast(pa.int64()))
    if big is not None and len(big):
        cols_g.append(big.field("values"))
        cols_k.append(pa.array([2] * len(big), pa.int8()))
        cols_c.append(big.field("counts").cast(pa.int64()))
    if not cols_g:
        return pa.table({"g": pa.array([], pa.string()),
                         "kind": pa.array([], pa.int8()),
                         "c": pa.array([], pa.int64())})
    return pa.table({
        "g": pa.concat_arrays([a.combine_chunks() if isinstance(
            a, pa.ChunkedArray) else a for a in cols_g]),
        "kind": pa.concat_arrays(cols_k),
        "c": pa.concat_arrays(cols_c),
    })


def _lm_prune(min_count: int):
    """In-reduce prune: drop bigrams (kind=2) below the count floor.
    Exact wherever it runs — a gram below floor in its complete global
    sum is below floor, and hash partitioning puts each gram's
    complete sum in one bucket. Unigrams are never floored (they are
    the smoothing contexts and define V)."""

    def prune(t: pa.Table) -> pa.Table:
        if min_count <= 1:
            return t
        keep = pc.or_(pc.equal(t["kind"], 1),
                      pc.greater_equal(t["c_sum"], min_count))
        return t.filter(keep)

    return prune


def bigram_lm_train(docs_ds, min_count: int = 1, fold_mode: str = "auto"):
    """→ (unigrams: Table(g,c), bigrams: Table(g,c), vocab_size):
    add-k-ready corpus counts via per-batch partials + a bounded fold
    (``pipelines/fold.py``): driver-side Arrow group_by below the row
    limit, a hash-exchange fold with the ``min_count`` floor applied
    INSIDE the reduce above it — the driver never holds the unpruned
    partial set. Pruned bigrams fall back to the smoothed floor at
    scoring time (the 100 TB knob)."""
    from searchengine_ray.pipelines.fold import fold_count_partials

    tbl = fold_count_partials(
        docs_ds.map_batches(_counts_partial, batch_format="pyarrow"),
        key_cols=["kind", "g"],
        sum_col="c",
        bucket_col="g",
        prune=_lm_prune(min_count),
        mode=fold_mode,
    )
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    uni = tbl.filter(pa.array(kind == 1)).select(["g", "c_sum"])
    bi = tbl.filter(pa.array(kind == 2)).select(["g", "c_sum"])
    return uni, bi, uni.num_rows


class BigramLmScoreStage:
    """Actor-pool scoring stage: per doc, the int64 sum of quantized
    bigram log-probs lp = round(ln((c(w1w2)+k)/(c(w1)+k·V))·10⁶).
    Model (unigram + bigram count tables) ships once per actor."""

    def __init__(self, lm_ref, add_k: float = 0.5):
        import ray

        lm = lm_ref
        if isinstance(lm, ray.ObjectRef):
            lm = ray.get(lm)
        uni, bi, self.v = lm
        self.uni_g = uni["g"].combine_chunks()
        self.uni_c = uni["c_sum"].to_numpy(zero_copy_only=False)
        self.bi_g = bi["g"].combine_chunks()
        self.bi_c = bi["c_sum"].to_numpy(zero_copy_only=False)
        self.add_k = add_k
        self._lut: dict[tuple[int, int], int] = {}

    def _quantized(self, cb: np.ndarray, cu: np.ndarray) -> np.ndarray:
        """math.log LUT over distinct (bigram, context) count pairs —
        bit-identical to the oracle's ln()."""
        k, v = self.add_k, self.v
        pairs = np.stack([cb, cu], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        vals = np.empty(len(uniq), np.int64)
        for i, (b, u) in enumerate(uniq):
            key = (int(b), int(u))
            q = self._lut.get(key)
            if q is None:
                q = int(np.round(
                    math.log((b + k) / (u + k * v)) * QUANT))
                self._lut[key] = q
            vals[i] = q
        return vals[inv]

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents = simple_tokens_flat(batch["text"])
        par = np.asarray(parents, dtype=np.int64)
        grams, gpar = _ngram_join(flat, par, 2)
        n = batch.num_rows
        n_bi = (np.bincount(gpar, minlength=n).astype(np.int64)
                if len(gpar) else np.zeros(n, np.int64))
        lp_sum = np.zeros(n, np.int64)
        if len(grams):
            # c(w1): first token of each bigram = flat token at the
            # bigram's position; cheaper: look the w1 substring up via
            # the same flat array (bigram i starts at flat position i
            # within its doc) — recompute by index_in on the gram's
            # first word
            w1 = pc.list_element(
                pc.split_pattern(grams, " ", max_splits=1), 0)
            bi_idx = pc.index_in(grams, value_set=self.bi_g) \
                .fill_null(-1).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            uni_idx = pc.index_in(w1, value_set=self.uni_g) \
                .fill_null(-1).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cb = np.where(bi_idx >= 0, self.bi_c[np.maximum(bi_idx, 0)], 0)
            cu = np.where(uni_idx >= 0,
                          self.uni_c[np.maximum(uni_idx, 0)], 0)
            lp = self._quantized(cb.astype(np.int64), cu.astype(np.int64))
            lp_sum = np.bincount(gpar, weights=lp, minlength=n) \
                .astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(n_bi, pa.int64()),
            "logprob_q6": pa.array(lp_sum, pa.int64()),
        })


def bigram_lm_score(docs_ds, train_ds=None, add_k: float = 0.5,
                    min_count: int = 1, concurrency=None,
                    fold_mode: str = "auto"):
    """→ Dataset (doc_id, n_bigrams, logprob_q6): add-k bigram LM
    score of every doc under a model trained on ``train_ds`` (default:
    the same corpus). Training = partials + bounded fold; scoring =
    shuffle-free map_batches with the model broadcast via ray.put."""
    import ray

    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    uni, bi, v = bigram_lm_train(train_ds or docs_ds, min_count=min_count,
                                 fold_mode=fold_mode)
    lm_ref = ray.put((uni, bi, v))
    return docs_ds.map_batches(
        BigramLmScoreStage,
        fn_constructor_kwargs={"lm_ref": lm_ref, "add_k": add_k},
        batch_format="pyarrow",
        concurrency=concurrency or autoscale_concurrency(),
    )


def lm_quality_filter(docs_ds, drop_pct: int = 10, add_k: float = 0.5,
                      min_count: int = 1, fold_mode: str = "auto"):
    """→ Dataset (doc_id, n_bigrams, logprob_q6): the corpus with its
    worst ``drop_pct`` percent dropped by average bigram log-prob —
    the CCNet-style perplexity-bucket filter with an EXACT global
    threshold at any scale.

    Composition of two scale-honest primitives: ``bigram_lm_score``
    (train fold + broadcast scoring) produces per-doc scores, and
    ``pipelines/quantiles.exact_quantiles`` finds the drop_pct-th
    percentile of avg = logprob_q6 / n_bigrams exactly WITHOUT a
    global sort (pivot selection, 3 passes). Docs keep iff
    avg >= threshold (PERCENTILE_DISC ties keep); docs with zero
    bigrams are dropped (no quality evidence). The scored dataset is
    materialized once (three int64 columns per doc) so the quantile
    passes re-read blocks instead of re-running the scorer.
    """
    import pyarrow.compute as pc

    from searchengine_ray.pipelines.quantiles import exact_quantiles

    scored = bigram_lm_score(docs_ds, add_k=add_k, min_count=min_count,
                             fold_mode=fold_mode)

    def with_avg(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["n_bigrams"], 0))
        lq = b["logprob_q6"].to_numpy(zero_copy_only=False)
        nb = b["n_bigrams"].to_numpy(zero_copy_only=False)
        return b.append_column("avg", pa.array(lq / nb, pa.float64()))

    avg_ds = scored.map_batches(with_avg,
                                batch_format="pyarrow").materialize()
    thr_tbl = exact_quantiles(avg_ds, "avg", pcts=(int(drop_pct),),
                              fold_mode=fold_mode)
    if thr_tbl.num_rows == 0:
        return avg_ds.map_batches(
            lambda b: b.drop_columns(["avg"]), batch_format="pyarrow")
    thr = thr_tbl["v_q"][0].as_py()
    return avg_ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b["avg"], thr))
                   .drop_columns(["avg"]),
        batch_format="pyarrow",
    )

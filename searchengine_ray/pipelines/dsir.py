"""DSIR-style importance scoring for training-data selection: score
every document by the log-likelihood ratio between a TARGET domain's
unigram LM and the LM of the rest of the corpus (Xie et al., "Data
Selection for Language Models via Importance Resampling", NeurIPS
2023 — here with word unigrams instead of hashed n-grams). Documents
that look like the target domain score high; downstream selection
keeps the top fraction (or Gumbel-resamples on the score).

Scale shape (100 TB): ONE fold trains both LMs — per-batch count
partials tagged target/rest flow through the bounded fold of
``pipelines/fold.py`` (driver Arrow group_by at bench scale, hash
exchange above the row limit). The per-term quantized ratio table is
broadcast once via ``ray.put`` (vocabulary-bounded — the same
memory assumption as the bigram-LM model broadcast; prune with
``min_count`` at web scale), and scoring is one shuffle-free
``map_batches`` pass.

Float discipline (the lm.py pattern): each term's ratio is quantized
to int64 ``round((ln p_t - ln p_r)·10⁶)`` BEFORE the per-doc sum, so
document scores are order-independent and value-exact against the SQL
oracle; ln comes from a ``math.log`` LUT over distinct (target count,
rest count) pairs.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.pipelines.analysis import simple_tokens_flat

QUANT = 1_000_000


def _tagged_counts_partial(target_col: str, target_value: str):
    def partial(batch: pa.Table) -> pa.Table:
        out_t, out_k, out_c = [], [], []
        is_t = pc.equal(batch[target_col], target_value)
        for kind, mask in ((1, is_t), (2, pc.invert(is_t))):
            flat, _ = simple_tokens_flat(
                batch.filter(mask)["text"])
            vc = pc.value_counts(flat)
            if len(vc) == 0:
                continue
            vals = vc.field("values")
            out_t.append(vals.combine_chunks()
                         if isinstance(vals, pa.ChunkedArray) else vals)
            out_k.append(pa.array([kind] * len(vc), pa.int8()))
            out_c.append(vc.field("counts").cast(pa.int64()))
        if not out_t:
            return pa.table({"term": pa.array([], pa.string()),
                             "kind": pa.array([], pa.int8()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"term": pa.concat_arrays(out_t),
                         "kind": pa.concat_arrays(out_k),
                         "c": pa.concat_arrays(out_c)})

    return partial


def dsir_train(docs_ds, target_value: str, target_col: str = "source",
               min_count: int = 1, fold_mode: str = "auto"):
    """→ (vocab: pa.Array, q: int64 ndarray, q_oov: int) — the
    per-term quantized log-likelihood ratios. ``min_count`` floors the
    summed (target+rest) count inside the reduce (exact: a term's
    complete sum lives in one hash bucket) — the web-scale vocabulary
    knob; floored terms score as OOV."""
    from searchengine_ray.pipelines.fold import fold_count_partials

    tbl = fold_count_partials(
        docs_ds.map_batches(
            _tagged_counts_partial(target_col, target_value),
            batch_format="pyarrow",
        ),
        key_cols=["kind", "term"],
        sum_col="c",
        bucket_col="term",
        mode=fold_mode,
        empty_result=pa.table({"kind": pa.array([], pa.int8()),
                               "term": pa.array([], pa.string()),
                               "c_sum": pa.array([], pa.int64())}),
    )
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    ct: dict[str, int] = dict(zip(
        tbl.filter(pa.array(kind == 1))["term"].to_pylist(),
        tbl.filter(pa.array(kind == 1))["c_sum"].to_pylist()))
    cr: dict[str, int] = dict(zip(
        tbl.filter(pa.array(kind == 2))["term"].to_pylist(),
        tbl.filter(pa.array(kind == 2))["c_sum"].to_pylist()))
    nt, nr = sum(ct.values()), sum(cr.values())
    terms = sorted(set(ct) | set(cr))
    v = len(terms)
    if min_count > 1:
        terms = [t for t in terms
                 if ct.get(t, 0) + cr.get(t, 0) >= min_count]
    lut: dict[tuple[int, int], int] = {}

    def _q(a: int, b: int) -> int:
        key = (a, b)
        got = lut.get(key)
        if got is None:
            got = int(np.round(
                (math.log((a + 1) / (nt + v))
                 - math.log((b + 1) / (nr + v))) * QUANT))
            lut[key] = got
        return got

    q = np.fromiter((_q(ct.get(t, 0), cr.get(t, 0)) for t in terms),
                    dtype=np.int64, count=len(terms))
    return pa.array(terms, pa.string()), q, _q(0, 0)


class DsirScoreStage:
    """Actor-pool scoring stage: per-doc int64 sum of the broadcast
    quantized per-term ratios (``ray.put`` once, fetched in
    ``__init__``); one shuffle-free pass."""

    def __init__(self, model_ref) -> None:
        import ray

        self.vocab, self.q, self.q_oov = ray.get(model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, parents = simple_tokens_flat(batch["text"])
        par = np.asarray(parents, dtype=np.int64)
        idx = np.asarray(
            pc.fill_null(pc.index_in(flat, value_set=self.vocab), -1),
            dtype=np.int64,
        )
        tok_q = np.where(idx >= 0, self.q[np.clip(idx, 0, None)],
                         self.q_oov)
        # bincount float sums of int64 values stay exact: every partial
        # sum is an integer far below 2^53
        sums = np.bincount(par, weights=tok_q.astype(np.float64),
                           minlength=n).astype(np.int64)
        counts = np.bincount(par, minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(counts, pa.int64()),
            "dsir_q6": pa.array(sums, pa.int64()),
        })


def dsir_scores(docs_ds, target_value: str, target_col: str = "source",
                min_count: int = 1, concurrency=None,
                fold_mode: str = "auto"):
    """→ Dataset (doc_id, n_tokens, dsir_q6): per-document quantized
    DSIR importance scores against the target domain."""
    import ray

    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    model = dsir_train(docs_ds, target_value, target_col,
                       min_count=min_count, fold_mode=fold_mode)
    return docs_ds.map_batches(
        DsirScoreStage,
        fn_constructor_kwargs={"model_ref": ray.put(model)},
        batch_format="pyarrow",
        concurrency=concurrency or autoscale_concurrency(),
    )


def _topk_batch(batch: pa.Table, k: int) -> pa.Table:
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    sc = batch["dsir_q6"].to_numpy(zero_copy_only=False)
    top = np.lexsort((doc, -sc))[:k]
    return batch.take(pa.array(np.sort(top), pa.int64()))


def dsir_select(docs_ds, target_value: str, k: int = 50,
                target_col: str = "source", **kw) -> pa.Table:
    """→ pa.Table (doc_id, n_tokens, dsir_q6): the k most target-like
    documents by (score desc, doc_id asc) — exact top-k selection on
    the DSIR scores. Each batch prunes to its local top-k, so the
    driver folds k × n_blocks rows (the cosine_topk pattern); k must
    therefore be driver-bounded — for keep-a-FRACTION selection at
    100 TB, compute a score threshold from a histogram instead and
    filter shuffle-free."""
    parts = dsir_scores(docs_ds, target_value, target_col, **kw) \
        .map_batches(_topk_batch, fn_kwargs={"k": int(k)},
                     batch_format="pyarrow").take_all()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "dsir_q6": pa.array([], pa.int64())})
    if not parts:
        return empty
    t = pa.Table.from_pylist(parts, schema=empty.schema)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    sc = t["dsir_q6"].to_numpy(zero_copy_only=False)
    top = np.lexsort((doc, -sc))[:k]
    return t.take(pa.array(top, pa.int64()))


def _gumbel_prune_batch(b: pa.Table, k: int, salt: str,
                        temperature: float) -> pa.Table:
    """Per-batch top-(k+8) prune on the Gumbel keys (vectorized np.log;
    the driver recomputes survivors with math.log for oracle parity)."""
    import pyarrow.compute as pc

    from searchengine_ray.pipelines.analysis import _splitmix64
    from searchengine_ray.pipelines.dedup import _hash_tokens

    keys = pc.binary_join_element_wise(
        pa.array([f"{salt}:"] * b.num_rows, pa.string()),
        b["doc_id"].cast(pa.string()), "",
    )
    h = _splitmix64(_hash_tokens(keys))
    u = (h.astype(np.float64) + 0.5) / 2.0 ** 64
    sc = b["dsir_q6"].to_numpy(zero_copy_only=False)
    key = (sc / 1e6) / temperature - np.log(-np.log(u))
    doc = b["doc_id"].to_numpy(zero_copy_only=False)
    top = np.lexsort((doc, -key))[:k + 8]
    return pa.table({
        "doc_id": pa.array(doc[top], pa.int64()),
        "dsir_q6": pa.array(sc[top], pa.int64()),
        "h": pa.array(h[top].view(np.int64), pa.int64()),
    })


def dsir_sample(docs_ds, target_value: str, k: int = 50,
                temperature: float = 1.0, salt: str = "gsample",
                target_col: str = "source", **kw) -> pa.Table:
    """→ pa.Table (doc_id, dsir_q6, key_q6): GUMBEL TOP-K sampling on
    the DSIR scores — k documents drawn WITHOUT replacement with
    probability ∝ exp(score / temperature) (the Gumbel-max trick:
    top-k of score/T + G_i, G_i = −ln(−ln(u_i))). Where ``dsir_select``
    takes the k highest scores deterministically, this trades score
    for diversity under a temperature knob, which is how DSIR-style
    selection is actually deployed (greedy top-k overfits the target
    domain's head). u_i derives from splitmix64(FNV64(salt||doc_id)) —
    no RNG state, partition-independent, a new salt is a fresh draw.

    Scale shape: one scoring pass + per-batch top-(k+8) prune →
    k × n_blocks driver fold (prune-safe: the global top-k by key is
    contained in the union of per-batch top-ks); k driver-bounded.
    Float parity with the DuckDB oracle: u is a power-of-two scaling
    of an integer hash, both ln calls are the same libm, divide/add
    are IEEE — the driver recomputes survivor keys with math.log."""
    import math

    parts = dsir_scores(docs_ds, target_value, target_col, **kw) \
        .map_batches(_gumbel_prune_batch,
                     fn_kwargs={"k": int(k), "salt": salt,
                                "temperature": float(temperature)},
                     batch_format="pyarrow").take_all()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "dsir_q6": pa.array([], pa.int64()),
                      "key_q6": pa.array([], pa.int64())})
    if not parts:
        return empty
    doc = np.asarray([r["doc_id"] for r in parts], np.int64)
    sc = np.asarray([r["dsir_q6"] for r in parts], np.int64)
    h = np.asarray([r["h"] for r in parts], np.int64).view(np.uint64)
    g = np.asarray(
        [-math.log(-math.log((int(x) + 0.5) / 2.0 ** 64)) for x in h],
        np.float64)
    key = (sc / 1e6) / temperature + g
    top = np.lexsort((doc, -key))[:k]
    return pa.table({
        "doc_id": pa.array(doc[top], pa.int64()),
        "dsir_q6": pa.array(sc[top], pa.int64()),
        "key_q6": pa.array(np.round(key[top] * 1e6).astype(np.int64),
                           pa.int64()),
    })

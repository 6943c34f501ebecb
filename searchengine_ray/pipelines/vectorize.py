"""Feature-hashing document vectorizer (the hashing trick —
Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning", ICML 2009): a model-free text → embedding map. Each token's
FNV-1a hash picks a dimension (and a sign bit, which unbiases the
inner product); term counts accumulate and the vector is
L2-normalized. The result feeds the ANN / embedding-dedup operators
directly, so raw text flows end-to-end into vector similarity with no
model download.

Fully doc-local and shuffle-free (one vectorized map_batches pass).
Float discipline: the SPARSE contract output is pure integers —
signed counts plus the per-doc squared norm — because a quantized
c/sqrt(norm_sq) ratio CAN land exactly on a .5 quantum (c·1e6/k with
k | 2e6), where numpy's banker's rounding and DuckDB's half-away
diverge (the round-2 gotcha). The dense variant normalizes in float
internally for the ANN consumers, where no oracle compares bits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.analysis import simple_tokens_flat
from searchengine_ray.pipelines.dedup import _hash_tokens

_EMPTY = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "dim": pa.array([], pa.int64()),
    "c": pa.array([], pa.int64()),
    "norm_sq": pa.array([], pa.int64()),
})


def hash_vectorize_batch(batch: pa.Table, dim: int = 64) -> pa.Table:
    """→ (doc_id, dim, c, norm_sq) sparse integer rows of each doc's
    hashed signed-count vector (component value = c / sqrt(norm_sq));
    zero-token and all-cancelled docs emit nothing."""
    flat, parents = simple_tokens_flat(batch["text"])
    th = _hash_tokens(flat)
    if th.size == 0:
        return _EMPTY
    par = np.asarray(parents, dtype=np.int64)
    d = (th % np.uint64(dim)).astype(np.int64)
    # sign from the next hash bit (unbiases E[<x,y>], the classic trick)
    sign = np.where(((th // np.uint64(dim)) & np.uint64(1)) == 1, 1, -1)
    comp = par * np.int64(dim) + d
    uniq, inv = np.unique(comp, return_inverse=True)
    acc = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(acc, inv, sign)
    keep = acc != 0
    uniq, acc = uniq[keep], acc[keep]
    if uniq.size == 0:
        return _EMPTY
    updoc = uniq // dim
    # squared L2 norm per doc over its nonzero components
    docs, doc_inv = np.unique(updoc, return_inverse=True)
    sq = np.zeros(docs.size, dtype=np.int64)
    np.add.at(sq, doc_inv, acc * acc)
    doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)[updoc]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "dim": pa.array(uniq % dim, pa.int64()),
        "c": pa.array(acc, pa.int64()),
        "norm_sq": pa.array(sq[doc_inv], pa.int64()),
    })


def hash_vectorize(docs_ds, dim: int = 64):
    """→ Dataset (doc_id, dim, c, norm_sq) sparse integer embedding
    rows."""
    return docs_ds.map_batches(
        hash_vectorize_batch, fn_kwargs={"dim": int(dim)},
        batch_format="pyarrow",
    )


def hash_vectorize_dense(docs_ds, dim: int = 64):
    """→ Dataset (vec_id=doc_id, embedding list<float>): dense variant
    shaped like the embeddings table, ready for cosine_topk / IVF /
    embedding_near_dup."""
    def densify(batch: pa.Table) -> pa.Table:
        sparse = hash_vectorize_batch(batch, dim)
        n = batch.num_rows
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        pos_of = {int(v): i for i, v in enumerate(ids)}
        mat = np.zeros((n, dim), dtype=np.float32)
        sd = sparse["doc_id"].to_numpy(zero_copy_only=False)
        dd = sparse["dim"].to_numpy(zero_copy_only=False)
        cc = sparse["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        nsq = sparse["norm_sq"].to_numpy(zero_copy_only=False)
        rows = np.fromiter((pos_of[int(x)] for x in sd), dtype=np.int64,
                           count=len(sd))
        mat[rows, dd] = (cc / np.sqrt(nsq.astype(np.float64))).astype(
            np.float32)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), pa.float32()), dim).cast(
                pa.list_(pa.float32())),
        })

    return docs_ds.map_batches(densify, batch_format="pyarrow")

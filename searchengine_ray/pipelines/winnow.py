"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
2003): slide a window of ``w`` consecutive token-k-gram hashes over
each document and select each window's minimum (rightmost on ties) —
the guaranteed-density local fingerprint set used for plagiarism /
near-dup / overlap detection. Any shared substring of at least
``k + w - 1`` tokens between two documents is guaranteed to share a
selected fingerprint.

Hashing reuses the dedup machinery byte-for-byte: FNV-1a token hashes
(``dedup._hash_tokens``) combined with the shingle multiplier, so the
SQL oracle reproduces values exactly with HUGEINT mod-2^64 arithmetic.

Scale shape (100 TB): entirely doc-local — one vectorized
``map_batches`` pass (stacked-shift sliding min, rightmost tie via
reversed argmin; no per-doc loop), no shuffle, output is a streaming
Dataset of (doc_id, pos, fp_i64) rows at the winnowing density
~2/(w+1) per gram. Docs with fewer than k tokens yield no
fingerprints; docs with fewer than w grams contribute one whole-doc
window (standard convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.analysis import simple_tokens_flat
from searchengine_ray.pipelines.dedup import _SHINGLE_MULT, _hash_tokens

_EMPTY = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "pos": pa.array([], pa.int64()),
    "fp_i64": pa.array([], pa.int64()),
})

_POS_STRIDE = np.int64(1) << 32


def winnow_fingerprints_batch(batch: pa.Table, k: int = 4,
                              w: int = 5) -> pa.Table:
    flat, parents = simple_tokens_flat(batch["text"])
    th = _hash_tokens(flat)
    if th.size == 0:
        return _EMPTY
    par = np.asarray(parents, dtype=np.int64)
    n = batch.num_rows
    counts = np.bincount(par, minlength=n).astype(np.int64)
    doc_start = np.concatenate(([0], np.cumsum(counts)))
    pos_in_doc = np.arange(th.size, dtype=np.int64) - doc_start[par]

    # k-gram hashes at every start position (grams stay contiguous and
    # position-ordered per doc)
    wi = np.flatnonzero(pos_in_doc <= counts[par] - k)
    if wi.size == 0:
        return _EMPTY
    g = th[wi].copy()
    for j in range(1, k):
        g = g * _SHINGLE_MULT + th[wi + j]          # uint64 wraparound
    gdoc, gpos = par[wi], pos_in_doc[wi]
    m = np.bincount(gdoc, minlength=n).astype(np.int64)

    sel_doc_l, sel_pos_l, sel_fp_l = [], [], []

    # full windows (docs with m >= w): stacked-shift sliding min
    starts = np.flatnonzero(gpos <= m[gdoc] - w)
    if starts.size:
        wmat = np.stack([g[starts + j] for j in range(w)], axis=1)
        # rightmost min: first argmin of the REVERSED window
        off = w - 1 - np.argmin(wmat[:, ::-1], axis=1)
        sel_doc_l.append(gdoc[starts])
        sel_pos_l.append(gpos[starts] + off)
        sel_fp_l.append(wmat[np.arange(starts.size), off])

    # short docs (0 < m < w): one whole-doc window; lexsort by
    # (doc, hash asc, pos desc) and keep each doc's first row
    short = (m > 0) & (m < w)
    if short.any():
        sm = short[gdoc]
        sd, sp, sg = gdoc[sm], gpos[sm], g[sm]
        order = np.lexsort((-sp, sg, sd))
        sdo = sd[order]
        first = np.empty(sdo.size, dtype=bool)
        first[0] = True
        np.not_equal(sdo[1:], sdo[:-1], out=first[1:])
        sel = order[first]
        sel_doc_l.append(sd[sel])
        sel_pos_l.append(sp[sel])
        sel_fp_l.append(sg[sel])

    if not sel_doc_l:
        return _EMPTY
    sdoc = np.concatenate(sel_doc_l)
    spos = np.concatenate(sel_pos_l)
    sfp = np.concatenate(sel_fp_l)
    # adjacent windows often select the same gram — distinct (doc, pos)
    comp = sdoc * _POS_STRIDE + spos
    _, idx = np.unique(comp, return_index=True)
    doc_ids = np.asarray(batch["doc_id"], dtype=np.int64)[sdoc[idx]]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "pos": pa.array(spos[idx], pa.int64()),
        "fp_i64": pa.array(sfp[idx].view(np.int64), pa.int64()),
    })


def winnow_fingerprints(docs_ds, k: int = 4, w: int = 5):
    """→ Dataset (doc_id, pos, fp_i64): each document's winnowing
    fingerprint set (selected k-gram hash + its token position)."""
    return docs_ds.map_batches(
        winnow_fingerprints_batch,
        fn_kwargs={"k": int(k), "w": int(w)},
        batch_format="pyarrow",
    )


def _distinct_doc_fp_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fp_i64) distinct — exact doc-locally (a doc never spans
    batches), so the fp shuffle ships one row per (doc, fingerprint)."""
    doc = np.asarray(batch["doc_id"], dtype=np.int64)
    fp = np.asarray(batch["fp_i64"], dtype=np.int64)
    comp = np.stack([doc, fp], axis=1)
    uniq = np.unique(comp, axis=0)
    return pa.table({"doc_id": pa.array(uniq[:, 0], pa.int64()),
                     "fp_i64": pa.array(uniq[:, 1], pa.int64())})


_EMPTY_PAIRS = pa.table({
    "doc_a": pa.array([], pa.int64()),
    "doc_b": pa.array([], pa.int64()),
    "truncated": pa.array([], pa.int32()),
})


def _fp_group_pairs(group: pa.Table, max_bucket: int) -> pa.Table:
    docs = np.unique(np.asarray(group["doc_id"], dtype=np.int64))
    truncated = docs.size > max_bucket
    docs = docs[:max_bucket]
    if docs.size < 2:
        return _EMPTY_PAIRS
    iu, ju = np.triu_indices(docs.size, k=1)
    return pa.table({
        "doc_a": pa.array(docs[iu], pa.int64()),
        "doc_b": pa.array(docs[ju], pa.int64()),
        "truncated": pa.array(
            np.full(iu.size, int(truncated), np.int32), pa.int32()),
    })


def winnow_pairs(docs_ds, k: int = 4, w: int = 5, min_shared: int = 2,
                 max_bucket: int = 200):
    """→ Dataset (doc_a, doc_b, n_shared, truncated): document pairs
    sharing at least ``min_shared`` winnowing fingerprints — the
    overlap-candidate join the fingerprints exist for. Two keyed
    shuffles, both bounded: the fingerprint groupby ships one row per
    (doc, fp) with hot (boilerplate) fingerprints capped at
    ``max_bucket`` docs (``truncated`` marks affected pairs, the LSH
    convention), and the pair-count groupby ships candidate pairs
    only. The result is materialized (pair-scale, the small side) so an
    empty-candidate corpus still returns a typed schema (ADVICE r03
    empty-block rule)."""
    import ray.data
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max

    fps = winnow_fingerprints(docs_ds, k, w).map_batches(
        _distinct_doc_fp_batch, batch_format="pyarrow")
    pairs = fps.groupby("fp_i64").map_groups(
        lambda g: _fp_group_pairs(g, max_bucket), batch_format="pyarrow")
    def _finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["n_shared"], min_shared))
        return b.set_column(                   # BIGINT for the contract
            b.schema.get_field_index("truncated"), "truncated",
            pc.cast(b["truncated"], pa.int64()))

    agg = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_shared"),
        Max("truncated", alias_name="truncated"),
    ).map_batches(_finish, batch_format="pyarrow").materialize()
    if agg.count() == 0:
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "n_shared": pa.array([], pa.int64()),
            "truncated": pa.array([], pa.int64()),
        }))
    return agg

"""Exact duplicated-SUBSTRING spans: stride-1 n-gram dedup.

``duplicate_spans`` finds, for every document, the maximal token
ranges covered by an ``min_tokens``-gram that occurs MORE THAN ONCE in
the corpus (any document, any alignment) — the exact substring-level
duplication signal of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022), which tile (fixed-window) dedup
(`curate.span_dedup`) under-reports: a duplicate shifted by one token
straddles two tiles and matches neither.

Shape (all skinny token-level rows — no text ever shuffles):

1. one shuffle-free ``map_batches``: tokenize (the analysis.py simple
   chain), per-token FNV-1a (the dedup.py vectorized hasher), then a
   rolling FNV-1a FOLD over each ``min_tokens`` window — k loop
   iterations of fully-vectorized xor-multiply, windows never cross a
   doc boundary — emitting (gh, doc_id, pos);
2. ONE range sort on ``gh`` co-locates each gram's occurrences; a
   vectorized run-length pass keeps occurrences of grams seen ≥ 2
   times (membership only — never pair expansion, so a degenerate
   all-same-token corpus stays linear);
3. ONE range sort on (doc_id, pos); a vectorized gaps-and-islands
   pass merges flagged starts with gap ≤ min_tokens into maximal
   [start, end) spans.

The gram key is the FNV-1a fold of the window's token hashes —
replicated exactly in the DuckDB oracle (`oracles.sql_duplicate_spans`
uses the same per-token `fnv_expr` + `fnv_fold_list_expr`), so engine
and oracle agree even on the (astronomically unlikely) collision.

At 100 TB: both exchanges ship (uint64, int64, int64) rows — one per
token — which is the irreducible cost of exact substring dedup; the
suffix-array formulation moves the same order of data. Skew is
benign: a hot gram only lengthens one run in pass 2 (linear), and a
doc's flagged starts are doc-local in pass 3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import simple_tokens_flat
from .dedup import _FNV_OFFSET, _FNV_PRIME, _hash_tokens

_GRAM_SCHEMA = pa.schema([("gh", pa.uint64()), ("doc_id", pa.int64()),
                          ("pos", pa.int64())])
_SPAN_SCHEMA = pa.schema([("doc_id", pa.int64()),
                          ("span_start", pa.int64()),
                          ("span_end", pa.int64()),
                          ("n_dup_starts", pa.int64())])


def gram_rows_batch(batch: pa.Table, min_tokens: int,
                    text_col: str = "text") -> pa.Table:
    """(doc_id, text) batch → (gh, doc_id, pos) rows: one row per
    ``min_tokens``-gram start, gh = FNV-1a fold of the window's token
    hashes, pos = token index within the doc's filtered stream."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    flat, parents = simple_tokens_flat(t)
    th = _hash_tokens(flat)
    n = th.size
    L = min_tokens
    if n < L:
        return _GRAM_SCHEMA.empty_table()
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    # windows must not cross a document boundary
    valid = par[: n - L + 1] == par[L - 1:]
    h = np.full(n - L + 1, _FNV_OFFSET, dtype=np.uint64)
    for k in range(L):
        h = (h ^ th[k: n - L + 1 + k]) * _FNV_PRIME
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = par[1:] != par[:-1]
    doc_start = np.maximum.accumulate(
        np.where(change, np.arange(n), 0))
    pos = np.arange(n) - doc_start
    keep = np.flatnonzero(valid)
    ids = batch["doc_id"].take(pa.array(par[keep])).cast(pa.int64())
    return pa.table({
        "gh": pa.array(h[keep], pa.uint64()),
        "doc_id": ids,
        "pos": pa.array(pos[keep], pa.int64()),
    })


_FLAG_SCHEMA = pa.schema([("gh", pa.uint64()), ("doc_id", pa.int64()),
                          ("pos", pa.int64()), ("canon", pa.bool_())])


def _dup_members_batch(batch: pa.Table) -> pa.Table:
    """One gh-range-sorted block → only the rows whose gram occurs
    ≥ 2 times in the corpus (run length over the sorted key), each
    tagged ``canon`` = is this the gram's corpus-FIRST occurrence
    (min doc_id, then pos — a global, partitioning-independent
    choice). Requires each gh's rows to live entirely in this block —
    the range-partitioned ``Dataset.sort`` guarantee."""
    if batch.num_rows == 0:
        return _FLAG_SCHEMA.empty_table()
    t = batch.take(pc.sort_indices(
        batch, sort_keys=[("gh", "ascending"), ("doc_id", "ascending"),
                          ("pos", "ascending")]))
    gh = t["gh"].to_numpy(zero_copy_only=False)
    n = gh.size
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = gh[1:] != gh[:-1]
    gid = np.cumsum(new) - 1
    runs = np.bincount(gid)
    t = t.append_column("canon", pa.array(new, pa.bool_()))
    return t.filter(pa.array(runs[gid] >= 2))


def _islands_batch(batch: pa.Table, min_tokens: int) -> pa.Table:
    """One (doc_id, pos)-range-sorted block of flagged starts →
    maximal merged [span_start, span_end) rows: a new island begins
    when the doc changes or the gap exceeds ``min_tokens`` (windows
    of length L starting ≤ L apart overlap or touch)."""
    if batch.num_rows == 0:
        return _SPAN_SCHEMA.empty_table()
    t = batch.take(pc.sort_indices(
        batch, sort_keys=[("doc_id", "ascending"), ("pos", "ascending")]))
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    p = t["pos"].to_numpy(zero_copy_only=False)
    n = d.size
    brk = np.empty(n, dtype=bool)
    brk[0] = True
    brk[1:] = (d[1:] != d[:-1]) | (p[1:] - p[:-1] > min_tokens)
    gid = np.cumsum(brk) - 1
    first = np.flatnonzero(brk)
    counts = np.bincount(gid)
    last = first + counts - 1
    return pa.table({
        "doc_id": pa.array(d[first], pa.int64()),
        "span_start": pa.array(p[first], pa.int64()),
        "span_end": pa.array(p[last] + min_tokens, pa.int64()),
        "n_dup_starts": pa.array(counts, pa.int64()),
    })


def duplicate_spans(docs_ds, min_tokens: int = 8,
                    text_col: str = "text"):
    """→ Dataset (doc_id, span_start, span_end, n_dup_starts): every
    maximal token range covered by a ``min_tokens``-gram occurring
    ≥ 2 times anywhere in the corpus. See module docstring."""
    if min_tokens < 2:
        raise ValueError("min_tokens must be >= 2")
    grams = docs_ds.map_batches(
        gram_rows_batch,
        fn_kwargs={"min_tokens": min_tokens, "text_col": text_col},
        batch_format="pyarrow")
    flagged = grams.sort("gh").map_batches(
        _dup_members_batch, batch_format="pyarrow")
    # sort on doc_id ALONE: the range-sort co-location guarantee holds
    # per identical key, so sorting on (doc_id, pos) could split one
    # doc's rows across blocks and break its islands at the boundary;
    # _islands_batch re-sorts by pos locally
    return flagged.sort("doc_id").map_batches(
        _islands_batch, fn_kwargs={"min_tokens": min_tokens},
        batch_format="pyarrow")


# intervals ride the hash join as a compact "a-b,a-b,…" STRING — the
# Acero join rejects list-typed non-key columns
_IV_SCHEMA = pa.schema([("doc_id", pa.int64()), ("riv", pa.string())])


def _removal_intervals_batch(batch: pa.Table, min_tokens: int) -> pa.Table:
    """One doc_id-range-sorted block of flagged starts (gh, doc_id,
    pos, canon) → per-doc removal intervals (doc_id, rms, rme):
    token ranges covered by ≥ 1 NON-canonical duplicated gram and by
    NO canonical one (the canonical occurrence of every gram is
    protected, so at least one copy of each duplicated substring
    survives corpus-wide). A segmented event sweep: ±1 deltas on two
    channels at pos / pos+L, segmented cumsum per doc, qualifying
    inter-event intervals emitted — no per-row Python."""
    L = min_tokens
    if batch.num_rows == 0:
        return _IV_SCHEMA.empty_table()
    d0 = batch["doc_id"].to_numpy(zero_copy_only=False)
    p0 = batch["pos"].to_numpy(zero_copy_only=False)
    c0 = batch["canon"].to_numpy(zero_copy_only=False).astype(bool)
    # two events per start: (+1 at p, -1 at p+L) on the start's channel
    d = np.concatenate([d0, d0])
    q = np.concatenate([p0, p0 + L])
    dnc = np.concatenate([~c0, ~c0]).astype(np.int64)
    dnc[d0.size:] *= -1
    dcn = np.concatenate([c0, c0]).astype(np.int64)
    dcn[d0.size:] *= -1
    order = np.lexsort((q, d))
    d, q, dnc, dcn = d[order], q[order], dnc[order], dcn[order]
    # combine events at identical (doc, pos)
    n = d.size
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (q[1:] != q[:-1])
    gid = np.cumsum(new) - 1
    ud = d[new]
    uq = q[new]
    unc = np.bincount(gid, weights=dnc).astype(np.int64)
    ucn = np.bincount(gid, weights=dcn).astype(np.int64)
    # segmented cumsum per doc: state in the interval [uq[i], uq[i+1])
    doc_new = np.empty(ud.size, dtype=bool)
    doc_new[0] = True
    doc_new[1:] = ud[1:] != ud[:-1]
    cnc = np.cumsum(unc)
    ccn = np.cumsum(ucn)
    base_nc = np.maximum.accumulate(
        np.where(doc_new, cnc - unc, np.int64(-1)))
    base_cn = np.maximum.accumulate(
        np.where(doc_new, ccn - ucn, np.int64(-1)))
    snc = cnc - base_nc
    scn = ccn - base_cn
    # interval [uq[i], uq[i+1]) exists only while the next point is in
    # the same doc; channel sums return to 0 at each doc's last event,
    # so qualifying intervals always have a same-doc successor
    same = np.zeros(ud.size, dtype=bool)
    same[:-1] = ~doc_new[1:]
    keep = same & (snc > 0) & (scn == 0)
    idx = np.flatnonzero(keep)
    if idx.size == 0:
        return _IV_SCHEMA.empty_table()
    ivd = ud[idx]
    iva = uq[idx]
    ivb = uq[idx + 1]
    # pack per doc into one "a-b,a-b,…" string (sorted by a within doc)
    dnew = np.empty(ivd.size, dtype=bool)
    dnew[0] = True
    dnew[1:] = ivd[1:] != ivd[:-1]
    offsets = np.append(np.flatnonzero(dnew), ivd.size).astype(np.int32)
    pair = pc.binary_join_element_wise(
        pa.array(iva.astype(str), pa.string()),
        pa.array(ivb.astype(str), pa.string()), "-")
    packed = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), pair), ",")
    return pa.table({
        "doc_id": pa.array(ivd[dnew], pa.int64()),
        "riv": packed,
    })


def _strip_batch(batch: pa.Table, text_col: str) -> pa.Table:
    """(doc_id, text, rms?, rme?) joined rows → (doc_id, text,
    n_tokens_removed): re-tokenize (the simple chain), drop tokens
    inside any removal interval, join the survivors with single
    spaces. Output text is the NORMALIZED token stream for every doc
    (the span_dedup reconstruction convention), so stripped and
    untouched docs are uniform."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    flat, parents = simple_tokens_flat(t)
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    n = par.size
    nrows = batch.num_rows
    # token pos within doc row
    if n:
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = par[1:] != par[:-1]
        doc_start = np.maximum.accumulate(
            np.where(change, np.arange(n), 0))
        pos = np.arange(n) - doc_start
    else:
        pos = np.empty(0, dtype=np.int64)
    # decode this batch's "a-b,a-b,…" interval strings, flat with
    # their parent row index (all Arrow kernels)
    riv = batch["riv"] if "riv" in batch.column_names else None
    if riv is not None and isinstance(riv, pa.ChunkedArray):
        riv = riv.combine_chunks()
    removed = np.zeros(n, dtype=bool)
    if riv is not None and n and pc.any(riv.is_valid()).as_py():
        parts = pc.split_pattern(pc.coalesce(riv, ""), ",")
        flat_iv = pc.list_flatten(parts)
        iv_par0 = pc.list_parent_indices(parts)
        ok = pc.not_equal(flat_iv, "")
        flat_iv = flat_iv.filter(ok)
        m = pc.extract_regex(flat_iv, r"^(?P<a>\d+)-(?P<b>\d+)$")
        riv_par = iv_par0.filter(ok).to_numpy(
            zero_copy_only=False).astype(np.int64)
        a = pc.struct_field(m, "a").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        b = pc.struct_field(m, "b").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # one global searchsorted via the packed row·2³²+pos key
        # (intervals are disjoint and sorted within a row)
        B = np.int64(1) << np.int64(32)
        akey = riv_par * B + a
        tkey = par * B + pos
        j = np.searchsorted(akey, tkey, side="right") - 1
        valid = j >= 0
        jv = np.clip(j, 0, max(akey.size - 1, 0))
        if akey.size:
            removed = (valid & (riv_par[jv] == par)
                       & (pos < b[jv]) & (pos >= a[jv]))
    kept = np.flatnonzero(~removed)
    # rebuild one space-joined string per row from the kept tokens
    kept_par = par[kept]
    counts = np.bincount(kept_par, minlength=nrows)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    toks = flat.take(pa.array(kept))
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), toks)
    joined = pc.binary_join(lists, " ")
    n_removed = np.bincount(par[removed], minlength=nrows) \
        if n else np.zeros(nrows, dtype=np.int64)
    return pa.table({
        "doc_id": batch["doc_id"].cast(pa.int64()),
        "text": joined.cast(pa.string()),
        "n_tokens_removed": pa.array(n_removed.astype(np.int64),
                                     pa.int64()),
    })


def strip_duplicate_spans(docs_ds, min_tokens: int = 8,
                          text_col: str = "text",
                          num_partitions: int = 16):
    """→ Dataset (doc_id, text, n_tokens_removed): the corpus with
    duplicated substrings EXCISED — the apply step of Lee et al.
    (ACL 2022) substring dedup. For every duplicated
    ``min_tokens``-gram the corpus-first occurrence (min doc_id, then
    pos) is canonical and protected; a token is removed iff it is
    covered by some non-canonical duplicated gram and by no canonical
    one, so exactly ≥ 1 copy of every duplicated substring survives.
    Output text is the normalized token stream (the span_dedup
    reconstruction convention).

    Shape: the duplicate_spans exchanges (two skinny range sorts) +
    ONE left-outer hash join of the docs against the per-doc removal
    intervals + a vectorized strip map. Deterministic and
    partitioning-independent (the canonical choice is a global min)."""
    if min_tokens < 2:
        raise ValueError("min_tokens must be >= 2")
    grams = docs_ds.map_batches(
        gram_rows_batch,
        fn_kwargs={"min_tokens": min_tokens, "text_col": text_col},
        batch_format="pyarrow")
    flagged = grams.sort("gh").map_batches(
        _dup_members_batch, batch_format="pyarrow")
    intervals = flagged.sort("doc_id").map_batches(
        _removal_intervals_batch,
        fn_kwargs={"min_tokens": min_tokens},
        batch_format="pyarrow").materialize()
    n_iv = intervals.count()
    if n_iv == 0:
        # clean corpus: nothing to excise — skip the join (and its
        # schemaless-empty-block hazard); _strip_batch still emits the
        # normalized token stream uniformly
        joined = docs_ds
    else:
        # repartition merges away the sort's schemaless empty blocks,
        # which the hash join cannot key; size partitions to the data
        # (the pagerank/clusters guard)
        np_ = max(2, min(num_partitions, n_iv // 1000 + 2))
        joined = docs_ds.join(
            intervals.repartition(np_), join_type="left_outer",
            num_partitions=np_,
            on=("doc_id",), right_on=("doc_id",),
            right_suffix="_iv")
    return joined.map_batches(
        _strip_batch, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow")

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


def _dup_members_batch(batch: pa.Table) -> pa.Table:
    """One gh-range-sorted block → only the rows whose gram occurs
    ≥ 2 times in the corpus (run length over the sorted key).
    Requires each gh's rows to live entirely in this block — the
    range-partitioned ``Dataset.sort`` guarantee."""
    if batch.num_rows == 0:
        return _GRAM_SCHEMA.empty_table()
    t = batch.take(pc.sort_indices(batch, sort_keys=[("gh", "ascending")]))
    gh = t["gh"].to_numpy(zero_copy_only=False)
    n = gh.size
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = gh[1:] != gh[:-1]
    gid = np.cumsum(new) - 1
    runs = np.bincount(gid)
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

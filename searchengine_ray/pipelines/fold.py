"""Bounded fold for vocabulary-style count partials.

The aggregate-then-broadcast operators (``keywords_topk``'s df table,
the bigram LM's count tables) fold per-batch partial-count tables into
one vocabulary-bounded table that is then shipped to every scoring
actor. The broadcast OUTPUT is bounded by the vocabulary (plus any
count floor), but the fold INPUT is O(Σ per-batch distinct grams) —
far larger than the output on a web corpus, and an unbounded driver
fan-in if folded with ``take_all()``.

``fold_count_partials`` keeps two exact-equivalent paths:

- **driver** — fetch the partial blocks and fold with one Arrow
  ``group_by``. Fastest at bench scale, where Ray's shuffle barrier
  costs seconds of fixed overhead for a broadcast-sized aggregate
  (see BASELINE.md), but driver memory is O(input).
- **distributed** — a two-wave hash exchange over object-store
  blocks: per-block split tasks bucket rows by an FNV-1a hash of the
  key (``num_returns`` fan-out, data crosses the store once, like a
  shuffle), then per-bucket reduce tasks ``group_by``-sum and apply
  the caller's prune INSIDE the reduce. Because every key lands in
  exactly one bucket, each bucket holds the key's complete global
  sum, so pruning on the aggregated value (a count floor) per bucket
  is exact. The driver only ever receives pruned, vocabulary-bounded
  bucket results. Reduce-task memory is O(vocab / num_buckets +
  largest single partial block).

``mode="auto"`` materializes the partials once and picks by metadata
row count — the driver fast path below ``driver_row_limit``, the
exchange above it. Both paths return byte-identical tables up to row
order (callers sort or group downstream).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

# Above this many partial rows the driver fold is considered unbounded
# and the hash exchange takes over. ~2M rows of (gram, int64) is tens
# of MB — comfortably a driver-side fold, while anything web-scale
# blows past it immediately.
DRIVER_ROW_LIMIT = 2_000_000


def _bucket_of(keys: pa.Array, num_buckets: int) -> np.ndarray:
    from searchengine_ray.pipelines.dedup import _hash_tokens

    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    return (_hash_tokens(keys) % np.uint64(num_buckets)).astype(np.int64)


def _split_blocks(tbl: pa.Table, key_col: str, num_buckets: int):
    """One split wave input block → ``num_buckets`` bucket tables."""
    if tbl.num_rows == 0 or key_col not in tbl.schema.names:
        return tuple(tbl.slice(0, 0) for _ in range(num_buckets))
    b = _bucket_of(tbl[key_col], num_buckets)
    order = np.argsort(b, kind="stable")
    sorted_tbl = tbl.take(pa.array(order, pa.int64()))
    counts = np.bincount(b, minlength=num_buckets)
    offs = np.concatenate([[0], np.cumsum(counts)])
    return tuple(
        sorted_tbl.slice(offs[i], counts[i]) for i in range(num_buckets)
    )


def _has_cols(t: pa.Table, cols) -> bool:
    return set(cols) <= set(t.schema.names)


def _reduce_bucket(key_cols, sum_col, prune, *tables):
    need = list(key_cols) + [sum_col]
    live = [t for t in tables
            if t is not None and t.num_rows and _has_cols(t, need)]
    if not live:
        # Ray's fused maps skip empty input blocks, so a fully-empty
        # partition yields schemaless () tables here — there is no
        # typed schema to build an empty result from; the caller
        # substitutes ``empty_result``.
        typed = [t for t in tables if t is not None and _has_cols(t, need)]
        if not typed:
            return None
        schema = typed[0].schema
        return pa.table({
            **{k: pa.array([], schema.field(k).type) for k in key_cols},
            f"{sum_col}_sum": pa.array([], pa.int64()),
        })
    folded = pa.concat_tables(live).group_by(key_cols).aggregate(
        [(sum_col, "sum")]
    )
    return prune(folded) if prune is not None else folded


def fold_count_partials(
    parts_ds,
    key_cols: list[str],
    sum_col: str,
    *,
    bucket_col: str | None = None,
    prune: Callable[[pa.Table], pa.Table] | None = None,
    mode: str = "auto",
    driver_row_limit: int = DRIVER_ROW_LIMIT,
    num_buckets: int | None = None,
    empty_result: pa.Table | None = None,
) -> pa.Table:
    """Fold a Dataset of partial-count tables into one exact global
    count table (columns ``key_cols + [sum_col + '_sum']``).

    ``prune`` (optional) is applied to the fully-aggregated table —
    per bucket on the distributed path (exact: hash partitioning puts
    each key's complete sum in one bucket), once at the end on the
    driver path. ``bucket_col`` (default: first key col) must be a
    string column; it is the hash-exchange key.

    ``empty_result`` (optional, a typed empty table) is returned when
    the partials contain no typed blocks at all — Ray's fused maps
    skip empty input blocks, so an empty corpus yields schemaless ()
    blocks whose types cannot be recovered here; without it, that
    case raises.
    """
    import ray

    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown fold mode {mode!r}")
    bucket_col = bucket_col or key_cols[0]

    parts = parts_ds.materialize()
    use_driver = mode == "driver" or (
        mode == "auto" and parts.count() <= driver_row_limit
    )
    refs = parts.to_arrow_refs()

    if not refs:
        raise ValueError(
            "fold_count_partials: partials dataset produced no blocks; "
            "the partial fn must emit a typed empty table per batch"
        )

    if use_driver:
        tables = ray.get(refs)
        live = [t for t in tables if t.num_rows] or tables[:1]
        out = _reduce_bucket(key_cols, sum_col, prune, *live)
        if out is None:
            if empty_result is not None:
                return empty_result
            raise ValueError(
                "fold_count_partials: no typed partial blocks (empty "
                "input corpus?); pass empty_result= to handle this"
            )
        return out

    n_buckets = num_buckets or max(
        4, int(ray.cluster_resources().get("CPU", 4))
    )
    split = ray.remote(num_returns=n_buckets)(_split_blocks)
    reduce = ray.remote(_reduce_bucket)
    # wave 1: bucket-split every partial block (one object-store pass)
    columns: list[list] = [[] for _ in range(n_buckets)]
    for ref in refs:
        outs = split.remote(ref, bucket_col, n_buckets)
        if n_buckets == 1:
            outs = [outs]
        for i, o in enumerate(outs):
            columns[i].append(o)
    # wave 2: per-bucket fold + in-reduce prune; the driver receives
    # only pruned, vocabulary-bounded results
    pruned = ray.get([
        reduce.remote(key_cols, sum_col, prune, *columns[i])
        for i in range(n_buckets)
    ])
    live = [t for t in pruned if t is not None]
    if not live:
        if empty_result is not None:
            return empty_result
        raise ValueError(
            "fold_count_partials: no typed partial blocks (empty "
            "input corpus?); pass empty_result= to handle this"
        )
    return pa.concat_tables(live)

"""End-to-end corpus curation: the composition a training-data
pipeline actually runs — quality signals → rule filter → language id →
exact dedup → partitioned, resumable parquet output.

All rules are INTEGER comparisons (rational-exact, no float knife
edges), so the whole pipeline is value-exact verifiable in DuckDB
(__ray_entry__.oracle_sql: ``curate_corpus``). One keyed shuffle
total (the dedup groupby); everything else is per-batch Arrow kernels.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.pipelines.analysis import (
    LangIdStage,
    fingerprint_batch,
    quality_stats_batch,
)

# keep-rules, integer-exact:
#   n_tokens >= MIN_TOKENS
#   punct density < 1/PUNCT_DEN   (n_punct_chars * PUNCT_DEN < n_chars)
#   digit density < 1/DIGIT_DEN   (n_digit_chars * DIGIT_DEN < n_chars)
MIN_TOKENS = 5
PUNCT_DEN = 5
DIGIT_DEN = 3


class CurateStage:
    """Per-batch: quality stats + language id + fingerprint + the rule
    filter — one pass over the text, no shuffle. Stateful marker
    tables built once per actor."""

    def __init__(self):
        self.langid = LangIdStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = quality_stats_batch(batch)
        lang = self.langid(batch)["lang_pred"]
        fp = fingerprint_batch(batch)["fingerprint"]
        n_chars = q["n_chars"].to_numpy(zero_copy_only=False)
        keep = (
            (q["n_tokens"].to_numpy(zero_copy_only=False) >= MIN_TOKENS)
            & (q["n_punct_chars"].to_numpy(zero_copy_only=False)
               * PUNCT_DEN < n_chars)
            & (q["n_digit_chars"].to_numpy(zero_copy_only=False)
               * DIGIT_DEN < n_chars)
            & np.asarray(pc.not_equal(lang, "und"), dtype=bool)
        )
        mask = pa.array(keep)
        return pa.table({
            "doc_id": batch["doc_id"].filter(mask),
            "lang_pred": lang.filter(mask),
            "fingerprint": fp.filter(mask),
            "n_tokens": q["n_tokens"].filter(mask),
        })


def curate_corpus(docs_ds, out_dir: str | None = None, *,
                  overwrite: bool = False):
    """→ Dataset (doc_id, lang_pred, n_tokens) of surviving docs:
    rule-filtered AND exact-deduplicated (min doc_id per fingerprint
    wins — ONE keyed shuffle). With ``out_dir``, the survivors are
    also written as parquet PARTITIONED BY LANGUAGE (one directory per
    lang — the resumable/restartable output layout).

    The write STREAMS into a temp dir beside ``out_dir`` and is
    published by one atomic rename — no full-dataset materialization
    barrier, and a rerun can never see (or append into) a half-written
    output. Replacing an existing ``out_dir`` requires an explicit
    ``overwrite=True`` (a typo'd path must not silently lose data)."""
    if out_dir is not None and os.path.isdir(out_dir) and os.listdir(out_dir) \
            and not overwrite:
        raise ValueError(
            f"curate_corpus out_dir {out_dir!r} exists and is not empty; "
            "pass overwrite=True to replace it"
        )
    staged = docs_ds.map_batches(
        CurateStage, batch_format="pyarrow", num_cpus=1,
        concurrency=_concurrency(),
    )

    def dedup_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        i = int(np.argmin(ids))
        return g.select(["doc_id", "lang_pred", "n_tokens"]).slice(i, 1)

    out = staged.groupby("fingerprint").map_groups(
        dedup_group, batch_format="pyarrow"
    )
    if out_dir is not None:
        import glob
        import shutil

        import ray.data

        tmp_dir = out_dir.rstrip("/") + f".tmp{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        out.write_parquet(tmp_dir, partition_cols=["lang_pred"])
        if os.path.isdir(out_dir):
            if not overwrite:  # re-check: racing writer created it
                shutil.rmtree(tmp_dir, ignore_errors=True)
                raise ValueError(
                    f"curate_corpus out_dir {out_dir!r} appeared during the "
                    "write; pass overwrite=True to replace it"
                )
            shutil.rmtree(out_dir)
        os.replace(tmp_dir, out_dir)
        if glob.glob(os.path.join(out_dir, "**", "*.parquet"),
                     recursive=True):
            # serve the published files — the caller's reads don't
            # re-execute the whole pipeline
            return ray.data.read_parquet(out_dir)
    return out


def stratified_sample(docs_ds, rates: dict[str, int],
                      default_permille: int = 0):
    """Deterministic stratified sampling: keep a doc iff
    ``fnv64('doc:' || doc_id) mod 1000 < rates[lang]`` (permille per
    ``lang`` column) — reproducible anywhere, independent of
    partitioning, ordering or cluster size, and exactly expressible in
    the DuckDB oracle. Pure per-batch vectorized filter — no shuffle,
    no RNG state."""
    from searchengine_ray.pipelines.dedup import _hash_tokens

    def sample(b: pa.Table) -> pa.Table:
        langs = b["lang"].to_pylist()
        gates = np.asarray(
            [rates.get(lang, default_permille) for lang in langs], np.int64
        )
        keys = pc.binary_join_element_wise(
            pa.array(["doc:"] * b.num_rows, pa.string()),
            b["doc_id"].cast(pa.string()), "",
        )
        hv = (_hash_tokens(keys) % np.uint64(1000)).astype(np.int64)
        mask = pa.array(hv < gates)
        return pa.table({
            "doc_id": b["doc_id"].filter(mask),
            "lang": b["lang"].filter(mask),
        })

    return docs_ds.map_batches(sample, batch_format="pyarrow")


def _concurrency():
    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    return autoscale_concurrency()


def _cap_lowest_per_host(tbl: pa.Table, cap: int,
                         host_col: str) -> pa.Table:
    """Keep the ``cap`` lowest-doc_id rows of each host, vectorized:
    one sort by (host, doc_id), then a run-length rank filter."""
    t = tbl.select(["doc_id", host_col]).sort_by(
        [(host_col, "ascending"), ("doc_id", "ascending")]
    )
    if t.num_rows == 0:
        return t
    codes = pc.dictionary_encode(t[host_col]).combine_chunks() \
        .indices.to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.diff(codes, prepend=codes[0] - 1))
    rank = np.arange(len(codes)) - np.repeat(
        starts, np.diff(np.append(starts, len(codes))))
    return t.filter(pa.array(rank < cap))


def host_cap_sample(docs_ds, cap: int, host_col: str = "source"):
    """Per-host document cap (Common-Crawl-style curation: no single
    host may dominate the corpus): keep the ``cap`` lowest-doc_id docs
    of each host. A per-batch COMBINER keeps each batch's ``cap``
    lowest doc_ids per host before the shuffle — exact, because the
    global lowest-``cap`` set of a host is contained in the union of
    per-partition lowest-``cap`` sets — cutting shuffle volume from N
    rows to <= cap x hosts x partitions. Then ONE keyed shuffle
    (groupby host) finishes the cap; deterministic and
    partitioning-independent. → Dataset (doc_id, host_col)."""

    def cap_local(b: pa.Table) -> pa.Table:
        return _cap_lowest_per_host(b, cap, host_col)

    def cap_group(g: pa.Table) -> pa.Table:
        return _cap_lowest_per_host(g, cap, host_col)

    return docs_ds.map_batches(
        cap_local, batch_format="pyarrow"
    ).groupby(host_col).map_groups(cap_group, batch_format="pyarrow")


def chunk_documents_batch(batch: pa.Table, chunk_tokens: int = 64,
                          stride: int = 48) -> pa.Table:
    """→ (doc_id, chunk_seq, n_tokens, chunk_fp): fixed-size token
    windows with stride (overlap = chunk_tokens - stride), the standard
    training-prep chunking step. Chunk text is the ' '-join of the
    simple-token window; the md5 fingerprint pins exact content while
    keeping the contract compare small. Vectorized: one list_slice +
    binary_join per chunk INDEX (a short loop over the batch's max
    chunk count), never per document."""
    import hashlib

    from searchengine_ray.pipelines.analysis import MIN_TOKEN_LEN, PUNCT_CLASS

    cleaned = pc.replace_substring_regex(
        batch["text"], pattern=PUNCT_CLASS, replacement=" ")
    lists = pc.utf8_split_whitespace(pc.utf8_lower(cleaned))
    # re-filter short tokens inside the lists (same rule as
    # simple_tokens_flat, kept as a ListArray for list_slice)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.greater_equal(pc.utf8_length(flat), MIN_TOKEN_LEN)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
        parents = parents.combine_chunks()
        keep = keep.combine_chunks()
    flat = flat.filter(keep)
    par = np.asarray(parents.filter(keep), dtype=np.int64)
    counts = np.bincount(par, minlength=batch.num_rows)
    offsets = np.zeros(batch.num_rows + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)

    n = counts
    doc_ids_np = batch["doc_id"].to_numpy(zero_copy_only=False)
    out_doc, out_seq, out_ntok, out_fp = [], [], [], []
    max_chunks = int(np.ceil(n.max() / stride)) if len(n) and n.max() else 0
    for c in range(max_chunks):
        start = c * stride
        live = n > start
        if not live.any():
            break
        sliced = pc.list_slice(lists, start, start + chunk_tokens)
        joined = pc.binary_join(sliced, " ")
        idx = np.flatnonzero(live)
        out_doc.append(doc_ids_np[idx])
        out_seq.append(np.full(idx.size, c, np.int64))
        out_ntok.append(np.minimum(n[idx] - start, chunk_tokens))
        txts = joined.take(pa.array(idx, pa.int64())).to_pylist()
        out_fp.extend(hashlib.md5(t.encode("utf-8")).hexdigest()
                      for t in txts)
    if not out_doc:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "chunk_seq": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_fp": pa.array([], pa.string()),
        })
    return pa.table({
        "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
        "chunk_seq": pa.array(np.concatenate(out_seq), pa.int64()),
        "n_tokens": pa.array(np.concatenate(out_ntok).astype(np.int64),
                             pa.int64()),
        "chunk_fp": pa.array(out_fp, pa.string()),
    })


# -- domain temperature resampling -----------------------------------------

def domain_resample(docs_ds, alpha: float = 0.5,
                    group_col: str = "source", fold_mode: str = "auto"):
    """CCNet/Pile-style domain rebalancing: keep each doc of domain *s*
    with probability q_s = (n_min / n_s) ** alpha, where n_s is the
    domain's doc count and n_min the smallest domain's — head domains
    are downsampled toward the temperature ``alpha`` (alpha=1 →
    proportional flattening to the smallest domain, alpha=0 → keep
    everything), the classic corpus-rebalancing step before LM
    training.

    Two scans, no shuffle: (1) per-batch domain-count partials through
    the bounded fold of ``pipelines/fold.py`` (domain cardinality is
    the classic small side; the driver never holds unpruned partials at
    scale), (2) a deterministic FNV hash gate per doc — reproducible
    under any partitioning/cluster size and exactly expressible in the
    DuckDB oracle. Float discipline: q_s comes from glibc ``pow`` on
    BOTH sides (math.pow here, pow() in DuckDB — correctly rounded),
    and the gate compares double(fnv) < q_s * 2.0**64 with identical
    IEEE ops, so there is no quantization knife edge.

    → Dataset (doc_id, ``group_col``)."""
    import math

    import ray

    from searchengine_ray.pipelines.dedup import _hash_tokens
    from searchengine_ray.pipelines.fold import fold_count_partials

    def count_partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b[group_col])
        if len(vc) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        return pa.table({group_col: vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    folded = fold_count_partials(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"),
        key_cols=[group_col], sum_col="c", mode=fold_mode,
        empty_result=pa.table({group_col: pa.array([], pa.string()),
                               "c_sum": pa.array([], pa.int64())}),
    )
    counts = folded["c_sum"].to_numpy(zero_copy_only=False)
    if len(counts) == 0:    # empty corpus — keep a typed empty result
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            group_col: pa.array([], pa.string()),
        }))
    n_min = int(counts.min())
    qv = np.array([math.pow(n_min / int(c), alpha) for c in counts],
                  np.float64)
    ref = ray.put((folded[group_col].combine_chunks(), qv))

    def gate(b: pa.Table) -> pa.Table:
        src_vals, q = ray.get(ref)  # zero-copy plasma read per task
        idx = pc.index_in(b[group_col], value_set=src_vals) \
            .fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        thresh = np.where(idx >= 0, q[np.maximum(idx, 0)], 0.0) * 2.0 ** 64
        keys = pc.binary_join_element_wise(
            pa.array(["doc:"] * b.num_rows, pa.string()),
            b["doc_id"].cast(pa.string()), "",
        )
        hv = _hash_tokens(keys).astype(np.float64)
        mask = pa.array(hv < thresh)
        return pa.table({
            "doc_id": b["doc_id"].filter(mask),
            group_col: b[group_col].filter(mask),
        })

    return docs_ds.map_batches(gate, batch_format="pyarrow")


# -- greedy sequence packing -----------------------------------------------

def sequence_pack(docs_ds, capacity: int = 512, num_parts: int = 64):
    """Greedy fixed-capacity sequence packing (training-batch
    construction): documents are assigned to hash partitions
    (``doc_id % num_parts``); within each partition, docs in doc_id
    order are packed first-fit into sequences of at most ``capacity``
    pre-tokens (the BPE-ish pre-token count of ``token_counts``) — a
    new pack starts when the next doc would overflow; an oversize doc
    forms a singleton pack. Deterministic for a fixed ``num_parts``
    (the parallelism knob: packs never cross partitions, so the wide
    step is ONE keyed shuffle and per-partition work is independent).

    Per-group packing is O(#packs · log n) — a searchsorted per pack
    over the cumulative-length array, not a per-doc Python loop.

    → Dataset (doc_id, part, pack_id, pack_seq, n_pretokens); the
    global pack key is (part, pack_id)."""
    from searchengine_ray.pipelines.analysis import _TOKEN_RE_BPE

    def lens(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        counts = pc.count_substring_regex(b["text"], pattern=_TOKEN_RE_BPE)
        return pa.table({
            "doc_id": b["doc_id"],
            "part": pa.array(doc % num_parts, pa.int64()),
            "n_pretokens": counts.cast(pa.int64()),
        })

    def pack_group(g: pa.Table) -> pa.Table:
        t = g.sort_by([("doc_id", "ascending")])
        ln = t["n_pretokens"].to_numpy(zero_copy_only=False)
        n = len(ln)
        cum = np.cumsum(ln)
        pack_of = np.empty(n, np.int64)
        seq = np.empty(n, np.int64)
        s, pack = 0, 0
        while s < n:
            base = cum[s - 1] if s else 0
            e = int(np.searchsorted(cum, base + capacity, side="right"))
            if e == s:          # single doc exceeds capacity → singleton
                e = s + 1
            pack_of[s:e] = pack
            seq[s:e] = np.arange(1, e - s + 1)
            pack += 1
            s = e
        return pa.table({
            "doc_id": t["doc_id"],
            "part": t["part"],
            "pack_id": pa.array(pack_of, pa.int64()),
            "pack_seq": pa.array(seq, pa.int64()),
            "n_pretokens": t["n_pretokens"],
        })

    return docs_ds.map_batches(
        lens, batch_format="pyarrow"
    ).groupby("part").map_groups(pack_group, batch_format="pyarrow")


# -- exact span (tile) dedup ------------------------------------------------

def _span_explode_batch(batch: pa.Table, span_tokens: int) -> pa.Table:
    """(doc_id, span_no, span): non-overlapping ``span_tokens``-token
    tiles of the whitespace token stream. Vectorized: one list_slice +
    binary_join per tile INDEX (a short loop over the batch's max tile
    count), never per document."""
    lists = pc.utf8_split_whitespace(batch["text"])
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.greater(pc.utf8_length(flat), 0)   # drop empty tokens
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
        parents = parents.combine_chunks()
        keep = keep.combine_chunks()
    flat = flat.filter(keep)
    par = np.asarray(parents.filter(keep), dtype=np.int64)
    counts = np.bincount(par, minlength=batch.num_rows)
    offsets = np.zeros(batch.num_rows + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    doc_np = batch["doc_id"].to_numpy(zero_copy_only=False)
    out_doc, out_no, out_span = [], [], []
    max_tiles = int(np.ceil(counts.max() / span_tokens)) \
        if len(counts) and counts.max() else 0
    for c in range(max_tiles):
        start = c * span_tokens
        live = counts > start
        if not live.any():
            break
        joined = pc.binary_join(
            pc.list_slice(lists, start, start + span_tokens), " ")
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        idx = np.flatnonzero(live)
        out_doc.append(doc_np[idx])
        out_no.append(np.full(idx.size, c, np.int64))
        out_span.append(joined.take(pa.array(idx, pa.int64())))
    if not out_doc:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "span_no": pa.array([], pa.int64()),
                         "span": pa.array([], pa.string())})
    return pa.table({
        "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
        "span_no": pa.array(np.concatenate(out_no), pa.int64()),
        "span": pa.concat_arrays(out_span),
    })


def span_dedup(docs_ds, span_tokens: int = 4):
    """C4/CCNet-style exact span dedup with document reconstruction:
    keep the globally FIRST occurrence (lowest (doc_id, span_no)) of
    every ``span_tokens``-token tile, drop every other occurrence, and
    reassemble each document from its kept tiles (a document whose
    every tile loses disappears; assumes non-negative doc ids).

    TWO keyed shuffles — the minimum for a global dedup that must
    reconstruct documents:

    1. ``groupby(span)`` runs as a NATIVE Min aggregate over a
       zero-padded ``(doc_id, span_no)`` sort key (lexicographic min ==
       numeric min), so Ray pre-combines per block before the exchange
       and no per-group Python UDF ever runs — a boilerplate span
       repeated millions of times at 100 TB ships one row per block,
       not one per occurrence. The winner's coordinates are then
       PARSED BACK from the key (kept set == winner set; no join
       against the exploded rows is needed).
    2. ``groupby(doc_id)`` reassembles kept tiles in span order; the
       per-group join is the output payload itself.

    → Dataset (doc_id, text, n_spans_kept)."""
    from ray.data.aggregate import Min

    def explode(b: pa.Table) -> pa.Table:
        t = _span_explode_batch(b, span_tokens)
        wkey = pc.binary_join_element_wise(
            pc.utf8_lpad(t["doc_id"].cast(pa.string()), 19, "0"),
            pc.utf8_lpad(t["span_no"].cast(pa.string()), 10, "0"),
            ":")
        return pa.table({"span": t["span"], "wkey": wkey})

    winners = docs_ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("span").aggregate(Min("wkey"))

    def parse_winners(b: pa.Table) -> pa.Table:
        w = b["min(wkey)"]
        return pa.table({
            "doc_id": pc.utf8_slice_codeunits(w, 0, 19).cast(pa.int64()),
            "span_no": pc.utf8_slice_codeunits(w, 20, 30).cast(pa.int64()),
            "span": b["span"],
        })

    def reassemble(g: pa.Table) -> pa.Table:
        g = g.sort_by([("span_no", "ascending")])
        return pa.table({
            "doc_id": pa.array([g["doc_id"][0].as_py()], pa.int64()),
            "text": pa.array([" ".join(g["span"].to_pylist())],
                             pa.string()),
            "n_spans_kept": pa.array([g.num_rows], pa.int64()),
        })

    return winners.map_batches(parse_winners, batch_format="pyarrow") \
        .groupby("doc_id").map_groups(reassemble, batch_format="pyarrow")


def split_corpus(docs_ds, splits: dict[str, int] | None = None,
                 salt: str = "split"):
    """→ Dataset (doc_id, split): deterministic train/val/test
    assignment — split = the permille range containing
    FNV64('<salt>:'||doc_id) mod 1000 (ranges in dict order, must sum
    to 1000). No RNG state, partitioning/cluster-size independent,
    stable across reruns and incremental corpus growth (a doc's split
    never changes when other docs arrive) — the properties an ML data
    split actually needs. Shuffle-free per-batch gate."""
    from searchengine_ray.pipelines.dedup import _hash_tokens

    splits = splits or {"train": 980, "val": 10, "test": 10}
    if sum(splits.values()) != 1000 or any(v < 0 for v in splits.values()):
        raise ValueError("split permilles must be >= 0 and sum to 1000")
    names = list(splits)
    bounds = np.cumsum([splits[s] for s in names])

    def assign(b: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.array([f"{salt}:"] * b.num_rows, pa.string()),
            b["doc_id"].cast(pa.string()), "",
        )
        hv = (_hash_tokens(keys) % np.uint64(1000)).astype(np.int64)
        idx = np.searchsorted(bounds, hv, side="right")
        return pa.table({
            "doc_id": b["doc_id"].cast(pa.int64()),
            "split": pa.array([names[i] for i in idx], pa.string()),
        })

    return docs_ds.map_batches(assign, batch_format="pyarrow")


def group_sample(docs_ds, k: int, group_col: str = "lang",
                 salt: str = "pergroup") -> pa.Table:
    """→ pa.Table (group, doc_id, h): an EXACT-size-k-PER-GROUP
    deterministic uniform sample — within each group (language,
    domain, ...), the k documents with the smallest salted FNV hash
    (ties doc_id asc). The balanced-eval-set draw: where
    ``stratified_sample`` keeps an expected FRACTION per group and
    ``exact_sample`` k documents overall, this pins k per group with
    no RNG state and no partitioning/ordering dependence.

    Scale shape: per-batch per-group top-k prune (global per-group
    top-k ⊆ union of per-batch per-group top-ks) → driver fold of
    ≤ k × groups × blocks rows; k and the group cardinality must be
    driver-bounded (languages/domains, not user ids)."""
    from searchengine_ray.pipelines.dedup import _hash_tokens

    def topk_batch(b: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.array([f"{salt}:"] * b.num_rows, pa.string()),
            b["doc_id"].cast(pa.string()), "",
        )
        h = _hash_tokens(keys).view(np.int64)
        hs = h ^ np.int64(-2 ** 63)      # unsigned sort order
        doc = np.asarray(b["doc_id"], dtype=np.int64)
        grp = np.asarray(b[group_col].to_pylist(), dtype=object)
        order = np.lexsort((doc, hs, grp))
        g_s = grp[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(g_s[1:] != g_s[:-1]) + 1))
        ends = np.append(starts[1:], g_s.size)
        keep = np.concatenate([order[s:min(s + k, e)]
                               for s, e in zip(starts, ends)]) \
            if g_s.size else np.empty(0, np.int64)
        return pa.table({
            "group": pa.array(grp[keep].tolist(), pa.string()),
            "doc_id": pa.array(doc[keep], pa.int64()),
            "h": pa.array(h[keep], pa.int64()),
        })

    parts = docs_ds.map_batches(topk_batch,
                                batch_format="pyarrow").take_all()
    empty = pa.table({"group": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64()),
                      "h": pa.array([], pa.int64())})
    if not parts:
        return empty
    grp = np.asarray([r["group"] for r in parts], dtype=object)
    doc = np.asarray([r["doc_id"] for r in parts], np.int64)
    h = np.asarray([r["h"] for r in parts], np.int64)
    hs = h ^ np.int64(-2 ** 63)
    order = np.lexsort((doc, hs, grp))
    g_s = grp[order]
    starts = np.concatenate(([0], np.flatnonzero(g_s[1:] != g_s[:-1]) + 1))
    ends = np.append(starts[1:], g_s.size)
    keep = np.concatenate([order[s:min(s + k, e)]
                           for s, e in zip(starts, ends)])
    return pa.table({
        "group": pa.array(grp[keep].tolist(), pa.string()),
        "doc_id": pa.array(doc[keep], pa.int64()),
        "h": pa.array(h[keep], pa.int64()),
    })


def weighted_sample(docs_ds, k: int, salt: str = "wsample") -> pa.Table:
    """→ pa.Table (doc_id, w, key_q6): EXACT-size weighted sampling
    WITHOUT replacement (Efraimidis & Spirakis 2006, algorithm A-ES):
    keep the k documents with the largest key_i = ln(u_i) / w_i, where
    w_i = max(chars(text), 1) is the document weight and u_i ∈ (0,1)
    is a deterministic uniform derived from
    splitmix64(FNV64('<salt>:'||doc_id)) — inclusion probability
    proportional to weight, but with no RNG state: the sample is a
    pure function of (corpus, salt), independent of partitioning and
    execution order, and changing ``salt`` draws an independent
    sample. Complements ``exact_sample`` (uniform) and
    ``stratified_sample`` (expected-size): this is the
    size-proportional pick a token-budgeted training mix needs.

    Scale shape: per-batch top-(k+8) prune (the A-ES key order is
    prune-safe: the global top-k is contained in the union of
    per-partition top-ks) → k×n_blocks driver fold; k must be
    driver-bounded. Float parity with the DuckDB oracle: u is an
    exact power-of-two scaling of an integer hash, ln is libm on both
    sides, divide is IEEE-exact — the batch prune uses vectorized
    np.log with a +8 margin, then the driver recomputes survivors'
    keys with math.log (the oracle-exact path) before the final cut.
    """
    import math

    from searchengine_ray.pipelines.analysis import _splitmix64
    from searchengine_ray.pipelines.dedup import _hash_tokens

    def topk_batch(b: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.array([f"{salt}:"] * b.num_rows, pa.string()),
            b["doc_id"].cast(pa.string()), "",
        )
        h = _splitmix64(_hash_tokens(keys))          # uint64
        w = np.maximum(
            pc.utf8_length(b["text"]).cast(pa.int64())
            .to_numpy(zero_copy_only=False), 1)
        u = (h.astype(np.float64) + 0.5) / 2.0 ** 64
        lk = np.log(u) / w                           # prune key only
        doc = np.asarray(b["doc_id"], dtype=np.int64)
        top = np.lexsort((doc, -lk))[:k + 8]
        return pa.table({
            "doc_id": pa.array(doc[top], pa.int64()),
            "w": pa.array(w[top], pa.int64()),
            "h": pa.array(h[top].view(np.int64), pa.int64()),
        })

    parts = docs_ds.map_batches(topk_batch,
                                batch_format="pyarrow").take_all()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64()),
                      "key_q6": pa.array([], pa.int64())})
    if not parts:
        return empty
    doc = np.asarray([r["doc_id"] for r in parts], np.int64)
    w = np.asarray([r["w"] for r in parts], np.int64)
    h = np.asarray([r["h"] for r in parts], np.int64).view(np.uint64)
    lk = np.asarray([math.log((int(x) + 0.5) / 2.0 ** 64) for x in h],
                    np.float64) / w
    top = np.lexsort((doc, -lk))[:k]
    return pa.table({
        "doc_id": pa.array(doc[top], pa.int64()),
        "w": pa.array(w[top], pa.int64()),
        "key_q6": pa.array(np.round(lk[top] * 1e6).astype(np.int64),
                           pa.int64()),
    })


def exact_sample(docs_ds, k: int, salt: str = "sample") -> pa.Table:
    """→ pa.Table (doc_id, h): an EXACT-size deterministic uniform
    sample — the k documents with the smallest FNV64('<salt>:'||doc_id)
    hash (ties doc_id asc). Complements ``stratified_sample``, whose
    permille gate gives only an EXPECTED size: here the size is exact,
    the choice is still reproducible anywhere (no RNG state, no
    partitioning/ordering dependence — hash-order is a fixed global
    order), and changing ``salt`` draws an independent sample.

    Scale shape: per-batch top-k prune by (h, doc_id) → k×n_blocks
    driver fold (the cosine_topk pattern); k must be driver-bounded —
    for keep-a-fraction sampling use the stratified permille gate
    instead. ``h`` is emitted two's-complement int64 so the contract
    stays integer-exact."""
    from searchengine_ray.pipelines.dedup import _hash_tokens

    def topk_batch(b: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.array([f"{salt}:"] * b.num_rows, pa.string()),
            b["doc_id"].cast(pa.string()), "",
        )
        h = _hash_tokens(keys).view(np.int64)
        # order by UNSIGNED hash: flip the sign bit so int64 sort order
        # matches uint64 order
        hs = h ^ np.int64(-2**63)
        doc = np.asarray(b["doc_id"], dtype=np.int64)
        top = np.lexsort((doc, hs))[:k]
        return pa.table({"doc_id": pa.array(doc[top], pa.int64()),
                         "h": pa.array(h[top], pa.int64())})

    parts = docs_ds.map_batches(topk_batch,
                                batch_format="pyarrow").take_all()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "h": pa.array([], pa.int64())})
    if not parts:
        return empty
    t = pa.Table.from_pylist(parts, schema=empty.schema)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    hs = t["h"].to_numpy(zero_copy_only=False) ^ np.int64(-2**63)
    top = np.lexsort((doc, hs))[:k]
    return t.take(pa.array(top, pa.int64()))

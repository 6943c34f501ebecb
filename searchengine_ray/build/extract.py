"""Extract stage: pages → per-document tokenized rows (doc-major
"SPIMI block" analogue).

The reference accumulates a ``Dict[term, PostingList]`` per process and
spills sorted text blocks (``spimi.py:76-114``). Here each Arrow batch
is tokenized into ONE doc-major table::

    doc_id:int64, url:string, dl:int32,
    terms:list<string>, tfs:list<int32>,
    positions:list<list<int32>>, tf_weights:list<float64>

— one row per document, one list entry per distinct term (first-
occurrence order, like the reference's insertion-ordered dict,
``index.py:173-180``). This single table serves three consumers with no
re-tokenization: docmap/docstats (scalar columns), and the postings
explode that feeds the term shuffle (merge.py).

Stateful setup (stop words, stemmer memo cache — SURVEY.md §2.3
ST1) happens once per actor in ``__init__``; work per batch in
``__call__`` (actor-pool ``map_batches`` pattern).
"""

from __future__ import annotations

import os
import re
import string

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from searchengine_ray.config import IndexConfig, PostingType, RankerType
from searchengine_ray.functions.smart import doc_tf_weights
from searchengine_ray.text.tokenizer import (
    DEFAULT_STOP_WORDS,
    Tokenizer,
)

_PUNCT_RE = "[" + re.escape(string.punctuation) + "]"
_WS_RE = "[\\r\\x0b\\x0c]"  # \S-whitespace that survives the punct map

TOKENIZED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("dl", pa.int32()),
        ("terms", pa.list_(pa.string())),
        ("tfs", pa.list_(pa.int32())),
        ("positions", pa.list_(pa.list_(pa.int32()))),
        ("tf_weights", pa.list_(pa.float64())),
    ]
)


def make_tokenizer(cfg: IndexConfig) -> Tokenizer:
    return Tokenizer(
        min_token_length=cfg.min_token_length,
        stop_words=DEFAULT_STOP_WORDS if cfg.use_stop_words else None,
        language=cfg.language,
    )


class TokenizeStage:
    """Callable-class stage for ``map_batches(..., concurrency=N)``.

    ``text_column`` / ``url_column`` parameterize the corpus shape
    (pages use ``text``/``url``; the testdata ``documents`` table has no
    url so ``url_column=None`` falls back to ``str(doc_id)`` — the
    reference's external-id role, ``indexer.py:52``).
    """

    def __init__(self, cfg: IndexConfig, text_column: str = "text",
                 url_column: str | None = "url"):
        self.cfg = cfg
        self.text_column = text_column
        self.url_column = url_column
        self.tokenizer = make_tokenizer(cfg)
        self.need_positions = cfg.posting_type == PostingType.POSITIONAL
        self.need_weights = cfg.ranker in (
            RankerType.TF_IDF, RankerType.TF_IDF_OPTIMIZED
        )

    # -- vectorized ASCII fast path ---------------------------------------
    # Arrow kernels reproduce the reference tokenizer EXACTLY for
    # ASCII-only rows (punct→space, \r\f\v are \S-separators, lower,
    # \t/\n become literal one-char tokens, min-len, stop words, stem on
    # DISTINCT tokens only). Rows containing non-ASCII take the per-row
    # Python path (full-Unicode str.lower parity).

    def _flat_tokens_vector(self, texts: pa.Array):
        """→ (flat_stemmed pa.StringArray, parents int64 ndarray) for the
        concatenated token streams of all rows (order preserved)."""
        t = pc.replace_substring_regex(texts, pattern=_PUNCT_RE, replacement=" ")
        t = pc.replace_substring_regex(t, pattern=_WS_RE, replacement=" ")
        t = pc.ascii_lower(t)
        t = pc.replace_substring(t, pattern="\t", replacement=" \t ")
        t = pc.replace_substring(t, pattern="\n", replacement=" \n ")
        lists = pc.split_pattern(t, pattern=" ")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(parents, pa.ChunkedArray):
            parents = parents.combine_chunks()
        lens = pc.utf8_length(flat)
        keep = pc.greater_equal(lens, max(1, self.cfg.min_token_length or 1)) \
            if self.cfg.min_token_length else pc.greater_equal(lens, 1)
        flat = flat.filter(keep)
        parents = parents.filter(keep)
        stop = self.tokenizer.stop_words
        if stop:
            keep2 = pc.invert(pc.is_in(flat, value_set=pa.array(sorted(stop))))
            flat = flat.filter(keep2)
            parents = parents.filter(keep2)
        if self._stem is not None and len(flat):
            denc = pc.dictionary_encode(flat)
            if isinstance(denc, pa.ChunkedArray):
                denc = denc.combine_chunks()
            stem = self._stem
            stemmed_uniq = pa.array(
                [stem(u) for u in denc.dictionary.to_pylist()], pa.string()
            )
            flat = stemmed_uniq.take(denc.indices)
        return flat, np.asarray(parents, dtype=np.int64)

    def _doc_major_vector(self, n_docs: int, flat: pa.Array,
                          parents: np.ndarray):
        """Flat (stemmed) token stream → per-doc list columns, all numpy/
        Arrow (no per-doc Python)."""
        need_pos, need_w = self.need_positions, self.need_weights
        total = len(flat)
        dls = np.bincount(parents, minlength=n_docs).astype(np.int32) \
            if total else np.zeros(n_docs, np.int32)
        if total == 0:
            empty_off = np.zeros(n_docs + 1, np.int32)
            es = pa.ListArray.from_arrays(pa.array(empty_off, pa.int32()),
                                          pa.array([], pa.string()))
            ei = pa.ListArray.from_arrays(pa.array(empty_off, pa.int32()),
                                          pa.array([], pa.int32()))
            epos = pa.ListArray.from_arrays(
                pa.array(empty_off, pa.int32()),
                pa.ListArray.from_arrays(pa.array([0], pa.int32()),
                                         pa.array([], pa.int32())))
            ew = pa.ListArray.from_arrays(pa.array(empty_off, pa.int32()),
                                          pa.array([], pa.float64()))
            return dls, es, ei, epos, ew
        # token position within its doc (parents nondecreasing)
        doc_first = np.searchsorted(parents, np.arange(n_docs))
        pos_in_doc = (np.arange(total) - doc_first[parents]).astype(np.int32)
        # integer codes in ONE hash pass (dictionary order = first
        # occurrence = pc.unique order)
        denc = pc.dictionary_encode(flat)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        uniq = denc.dictionary
        codes = np.asarray(denc.indices, dtype=np.int64)
        # single-key STABLE sort == lexsort((pos, codes, parents)): the
        # stream is already pos-ascending within each doc, so stability
        # supplies the tertiary key; one composite int64 key halves the
        # sort's memory traffic (the 8→32 scaling limiter)
        order = np.argsort(parents * len(uniq) + codes, kind="stable")
        p_s, c_s, pos_s = parents[order], codes[order], pos_in_doc[order]
        change = np.empty(total, dtype=bool)
        change[0] = True
        np.not_equal(p_s[1:], p_s[:-1], out=change[1:])
        change[1:] |= c_s[1:] != c_s[:-1]
        starts = np.flatnonzero(change)
        run_len = np.diff(np.append(starts, total)).astype(np.int32)
        run_parent = p_s[starts]
        run_code = c_s[starts]
        # reorder runs to FIRST-OCCURRENCE order within each doc — the
        # reference's insertion-ordered dict (index.py:173-180): list
        # columns and, crucially, the cosine-norm float fold below then
        # accumulate in exactly the reference's order (ADVICE r1 #4)
        run_first = pos_s[starts]
        perm = np.lexsort((run_first, run_parent))
        identity = np.array_equal(perm, np.arange(perm.size))
        if not identity:
            starts = starts[perm]
            run_len = run_len[perm]
            run_parent = run_parent[perm]
            run_code = run_code[perm]
        runs_per_doc = np.bincount(run_parent, minlength=n_docs)
        doc_off = np.concatenate(([0], np.cumsum(runs_per_doc))).astype(np.int32)

        term_values = uniq.take(pa.array(run_code, pa.int64()))
        terms_col = pa.ListArray.from_arrays(pa.array(doc_off, pa.int32()),
                                             term_values)
        tfs_col = pa.ListArray.from_arrays(pa.array(doc_off, pa.int32()),
                                           pa.array(run_len, pa.int32()))
        if need_pos:
            seg_pref = np.concatenate(([0], np.cumsum(run_len))).astype(np.int64)
            if identity:
                pos_vals = pos_s
            else:  # gather each run's positions in the permuted order
                idx = np.repeat(starts.astype(np.int64) - seg_pref[:-1],
                                run_len) + np.arange(total)
                pos_vals = pos_s[idx]
            inner = pa.ListArray.from_arrays(
                pa.array(seg_pref.astype(np.int32), pa.int32()),
                pa.array(pos_vals, pa.int32()),
            )
            pos_col = pa.ListArray.from_arrays(pa.array(doc_off, pa.int32()),
                                               inner)
        else:
            eoff = np.zeros(n_docs + 1, np.int32)
            pos_col = pa.ListArray.from_arrays(
                pa.array(eoff, pa.int32()),
                pa.ListArray.from_arrays(pa.array([0], pa.int32()),
                                         pa.array([], pa.int32())))
        if need_w:
            schema0 = self.cfg.smart_schema[0]
            tf = run_len.astype(np.float64)
            if schema0 == "l":
                # libm's log via a distinct-tf LUT: np.log differs from
                # math.log in the last ulp for some inputs (e.g. log 3),
                # which would break bit-exact parity with the reference
                import math

                uniq_tf, inv = np.unique(run_len, return_inverse=True)
                lut = np.array(
                    [1.0 + math.log(float(t)) if t > 0 else 0.0
                     for t in uniq_tf], np.float64)
                w = lut[inv]
            elif schema0 == "b":
                w = np.ones_like(tf)
            else:
                w = tf
            if self.cfg.smart_schema[2] == "c":
                sumsq = np.bincount(run_parent, weights=w * w,
                                    minlength=n_docs)
                norm = np.sqrt(sumsq)
                norm[norm == 0] = 1.0
                w = w / norm[run_parent]
            else:
                w = np.ones_like(w)
            w_col = pa.ListArray.from_arrays(pa.array(doc_off, pa.int32()),
                                             pa.array(w, pa.float64()))
        else:
            eoff = np.zeros(n_docs + 1, np.int32)
            w_col = pa.ListArray.from_arrays(pa.array(eoff, pa.int32()),
                                             pa.array([], pa.float64()))
        return dls, terms_col, tfs_col, pos_col, w_col

    def _rows_python(self, texts: list):
        """Reference-exact per-row path (full Unicode)."""
        tokenize = self.tokenizer.tokenize
        schema0 = self.cfg.smart_schema
        need_pos, need_w = self.need_positions, self.need_weights
        dls, terms_col, tfs_col, pos_col, w_col = [], [], [], [], []
        for text in texts:
            tokens = tokenize(text) if text else []
            dls.append(len(tokens))
            pos_of: dict[str, list[int]] = {}
            for position, tok in enumerate(tokens):
                lst = pos_of.get(tok)
                if lst is None:
                    pos_of[tok] = [position]
                else:
                    lst.append(position)
            terms_col.append(list(pos_of.keys()))
            tfs_col.append([len(v) for v in pos_of.values()])
            pos_col.append(list(pos_of.values()) if need_pos else [])
            if need_w:
                counts = {t: len(v) for t, v in pos_of.items()}
                w = doc_tf_weights(counts, schema0) if counts else {}
                w_col.append(list(w.values()))
            else:
                w_col.append([])
        return dls, terms_col, tfs_col, pos_col, w_col

    @property
    def _stem(self):
        st = self.tokenizer._stemmer
        return st.stem if st is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"]
        n = batch.num_rows
        if self.url_column is not None and self.url_column in batch.column_names:
            urls = batch[self.url_column].cast(pa.string())
        else:
            urls = pa.array([str(d) for d in doc_ids.to_pylist()], pa.string())
        texts = batch[self.text_column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.cast(pa.large_string())
        texts = pc.fill_null(texts, "")
        # ASCII iff byte length == char length
        ascii_all = pc.all(
            pc.equal(pc.binary_length(texts), pc.utf8_length(texts))
        ).as_py()
        if ascii_all:
            flat, parents = self._flat_tokens_vector(texts)
            dls, terms_col, tfs_col, pos_col, w_col = self._doc_major_vector(
                n, flat, parents
            )
            return pa.table({
                "doc_id": doc_ids.cast(pa.int64()),
                "url": urls,
                "dl": pa.array(dls, pa.int32()),
                "terms": terms_col,
                "tfs": tfs_col,
                "positions": pos_col,
                "tf_weights": w_col,
            })
        dls, terms_col, tfs_col, pos_col, w_col = self._rows_python(
            texts.to_pylist()
        )
        return pa.table(
            {
                "doc_id": doc_ids.cast(pa.int64()),
                "url": urls,
                "dl": pa.array(dls, pa.int32()),
                "terms": pa.array(terms_col, pa.list_(pa.string())),
                "tfs": pa.array(tfs_col, pa.list_(pa.int32())),
                "positions": pa.array(pos_col, pa.list_(pa.list_(pa.int32()))),
                "tf_weights": pa.array(w_col, pa.list_(pa.float64())),
            }
        )


def fragment_key(doc_offset: int, num_rows: int, path: str) -> str:
    """Checkpoint resume key: offset + row count + source-path hash.
    Offset alone (round 1) could silently reuse a stale checkpoint when
    the input FILE SET changes and offsets shift — content-keying makes
    any layout change miss the cache instead of corrupting it."""
    import hashlib

    h8 = hashlib.md5(path.encode()).hexdigest()[:8]
    return f"tok-{doc_offset:012d}-{num_rows}-{h8}"


def tokenized_checkpoint_path(out_dir: str, doc_offset: int, num_rows: int,
                              path: str) -> str:
    """Deterministic per-fragment checkpoint file name (resume key)."""
    return os.path.join(
        out_dir, fragment_key(doc_offset, num_rows, path) + ".parquet"
    )


def fragment_stats_path(out_dir: str, doc_offset: int, num_rows: int,
                        path: str) -> str:
    """Sidecar stats live OUTSIDE the parquet dir (directory reads must
    see only parquet)."""
    return os.path.join(
        os.path.dirname(out_dir.rstrip("/")), "tokenized_stats",
        fragment_key(doc_offset, num_rows, path) + ".stats.json",
    )


def _fragment_stats(tok: pa.Table, sample_cap: int = 500) -> dict:
    """Per-fragment stats + deterministic term sample, computed while the
    data is hot — saves the driver two full corpus passes (corpus stats,
    boundary sampling)."""
    import numpy as np
    import pyarrow.compute as pc

    dls = tok["dl"].to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(tok["terms"])
    n_postings = len(flat)
    step = max(1, n_postings // sample_cap)
    sample = flat.combine_chunks()[::step].to_pylist() if n_postings else []
    doc_ids = tok["doc_id"].to_numpy(zero_copy_only=False)
    return {
        "docs": int(tok.num_rows),
        "postings": int(n_postings),
        "sum_dl": int(dls.sum()) if dls.size else 0,
        "min_dl": int(dls.min()) if dls.size else 0,
        "max_dl": int(dls.max()) if dls.size else 0,
        "min_doc": int(doc_ids.min()) if doc_ids.size else -1,
        "max_doc": int(doc_ids.max()) if doc_ids.size else -1,
        "sample": sample,
    }


_STAGE_CACHE: dict[tuple, TokenizeStage] = {}


def _cached_stage(cfg_manifest: tuple, cfg: IndexConfig, text_column: str,
                  url_column: str | None) -> TokenizeStage:
    """Per-worker-process tokenizer cache (stemmer memo ST1) — lets the
    tokenize stage run as plain TASKS on pre-started workers instead of
    paying an actor-pool spawn."""
    st = _STAGE_CACHE.get(cfg_manifest)
    if st is None:
        st = TokenizeStage(cfg, text_column=text_column, url_column=url_column)
        _STAGE_CACHE[cfg_manifest] = st
    return st


def make_fragment_build_fn(cfg: IndexConfig, out_dir: str, spill_dir: str,
                           boundaries: list[str],
                           hot_salt_of: dict[str, int],
                           id_column: str | None = None,
                           text_column: str = "text",
                           url_column: str | None = "url",
                           doc32: bool = False):
    """FUSED per-fragment build task: read fragment → tokenize →
    checkpoint (tok parquet + stats sidecar) → locally aggregate → spill
    (one row group per gkey). One wave of tasks does all the heavy
    compute; only small stats rows return to the driver. Fully resumable
    per fragment (all three artifacts exist → nothing recomputed)."""
    import json

    from searchengine_ray.build.merge import SpillWriter

    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(spill_dir, exist_ok=True)
    cfg_key = (tuple(sorted(cfg.to_manifest().items())), text_column,
               url_column, "v1")
    spiller = SpillWriter(spill_dir, boundaries, hot_salt_of, doc32=doc32)

    def build_fragment(batch: pa.Table) -> pa.Table:
        import time as _time

        from searchengine_ray.build.docids import Fragment, _read_fragment

        stage = _cached_stage(cfg_key, cfg, text_column, url_column)
        outs = []
        # per-phase worker-seconds, one value per emitted stats row —
        # folded by the driver into wave_*_cpu_sec (the ds.stats()-style
        # breakdown that locates regressions inside the fused task)
        times: dict[str, list[float]] = {
            "t_read": [], "t_tok": [], "t_ckpt": [], "t_spill": [],
        }
        for row in batch.to_pylist():
            tr = tt = tc = tsp = 0.0
            frag = Fragment(
                fragment_id=row["fragment_id"],
                path=row["path"],
                row_groups=tuple(row["row_groups"]),
                num_rows=row["num_rows"],
                doc_offset=row["doc_offset"],
            )
            path = tokenized_checkpoint_path(
                out_dir, frag.doc_offset, frag.num_rows, frag.path
            )
            spath = fragment_stats_path(
                out_dir, frag.doc_offset, frag.num_rows, frag.path
            )
            sp_path = os.path.join(
                spill_dir, f"spill-{frag.doc_offset:012d}-{frag.num_rows}.parquet"
            )
            os.makedirs(os.path.dirname(spath), exist_ok=True)
            if os.path.exists(path) and os.path.exists(spath):
                if os.path.exists(sp_path):  # fully done → stats only
                    st = spiller.stats_of_existing(sp_path)
                    outs.append(st)
                    for _ in range(st.num_rows):
                        for k in times:
                            times[k].append(0.0)
                    continue
                tok = None  # spill missing → read the checkpoint back
            else:
                cols = None
                if text_column:
                    cols = [text_column]
                    if url_column:
                        cols.append(url_column)
                t0 = _time.perf_counter()
                (src,) = list(_read_fragment(frag, cols, id_column))
                tr = _time.perf_counter() - t0
                t0 = _time.perf_counter()
                tok = stage(src)
                tt = _time.perf_counter() - t0
                t0 = _time.perf_counter()
                stats_json = json.dumps(_fragment_stats(tok))
                tmp = path + f".tmp{os.getpid()}"
                pq.write_table(tok, tmp, row_group_size=max(1, tok.num_rows),
                               compression="zstd", compression_level=1)
                with open(spath + f".tmp{os.getpid()}", "w") as f:
                    f.write(stats_json)
                os.replace(spath + f".tmp{os.getpid()}", spath)
                os.replace(tmp, path)  # parquet last → stats always exist
                tc = _time.perf_counter() - t0
            if tok is None:
                tok = pq.read_table(path)
            t0 = _time.perf_counter()
            st = spiller(tok, sp_path)
            tsp = _time.perf_counter() - t0
            outs.append(st)
            for _ in range(st.num_rows):
                times["t_read"].append(tr)
                times["t_tok"].append(tt)
                times["t_ckpt"].append(tc)
                times["t_spill"].append(tsp)
        out = pa.concat_tables(outs)
        for k, v in times.items():
            out = out.append_column(k, pa.array(v, pa.float64()))
        return out

    return build_fragment



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

import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.config import IndexConfig, PostingType, RankerType
from searchengine_ray.functions.smart import doc_tf_weights
from searchengine_ray.text.tokenizer import (
    DEFAULT_STOP_WORDS,
    Tokenizer,
)

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        if self.url_column is not None and self.url_column in batch.column_names:
            urls = batch[self.url_column].to_pylist()
        else:
            urls = [str(d) for d in doc_ids]

        tokenize = self.tokenizer.tokenize
        schema0 = self.cfg.smart_schema
        need_pos, need_w = self.need_positions, self.need_weights

        dls: list[int] = []
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        pos_col: list[list[list[int]]] = []
        w_col: list[list[float]] = []

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

        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "dl": pa.array(dls, pa.int32()),
                "terms": pa.array(terms_col, pa.list_(pa.string())),
                "tfs": pa.array(tfs_col, pa.list_(pa.int32())),
                "positions": pa.array(pos_col, pa.list_(pa.list_(pa.int32()))),
                "tf_weights": pa.array(w_col, pa.list_(pa.float64())),
            }
        )


def tokenized_checkpoint_path(out_dir: str, doc_offset: int) -> str:
    """Deterministic per-fragment checkpoint file name (resume key)."""
    return os.path.join(out_dir, f"tok-{doc_offset:012d}.parquet")


def fragment_stats_path(out_dir: str, doc_offset: int) -> str:
    """Sidecar stats live OUTSIDE the parquet dir (directory reads must
    see only parquet)."""
    return os.path.join(
        os.path.dirname(out_dir.rstrip("/")), "tokenized_stats",
        f"tok-{doc_offset:012d}.stats.json",
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
                           url_column: str | None = "url"):
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
    spiller = SpillWriter(spill_dir, boundaries, hot_salt_of)

    def build_fragment(batch: pa.Table) -> pa.Table:
        from searchengine_ray.build.docids import Fragment, _read_fragment

        stage = _cached_stage(cfg_key, cfg, text_column, url_column)
        outs = []
        for row in batch.to_pylist():
            frag = Fragment(
                fragment_id=row["fragment_id"],
                path=row["path"],
                row_groups=tuple(row["row_groups"]),
                num_rows=row["num_rows"],
                doc_offset=row["doc_offset"],
            )
            path = tokenized_checkpoint_path(out_dir, frag.doc_offset)
            spath = fragment_stats_path(out_dir, frag.doc_offset)
            sp_path = os.path.join(
                spill_dir, f"spill-{frag.doc_offset:012d}-{frag.num_rows}.parquet"
            )
            os.makedirs(os.path.dirname(spath), exist_ok=True)
            if os.path.exists(path) and os.path.exists(spath):
                if os.path.exists(sp_path):  # fully done → stats only
                    outs.append(spiller.stats_of_existing(sp_path))
                    continue
                tok = None  # spill missing → read the checkpoint back
            else:
                cols = None
                if text_column:
                    cols = [text_column]
                    if url_column:
                        cols.append(url_column)
                (src,) = list(_read_fragment(frag, cols, id_column))
                tok = stage(src)
                stats_json = json.dumps(_fragment_stats(tok))
                tmp = path + f".tmp{os.getpid()}"
                pq.write_table(tok, tmp, row_group_size=max(1, tok.num_rows),
                               compression="zstd", compression_level=1)
                with open(spath + f".tmp{os.getpid()}", "w") as f:
                    f.write(stats_json)
                os.replace(spath + f".tmp{os.getpid()}", spath)
                os.replace(tmp, path)  # parquet last → stats always exist
            if tok is None:
                tok = pq.read_table(path)
            outs.append(spiller(tok, sp_path))
        return pa.concat_tables(outs)

    return build_fragment



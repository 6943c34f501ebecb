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


class FragmentTokenizeTask(TokenizeStage):
    """Resumable fragment task: the input batch is a table of fragment
    DESCRIPTORS (fragment_id, path, row_groups, num_rows, doc_offset);
    each task reads its fragment, tokenizes, and atomically publishes
    ``tok-{doc_offset:012d}.parquet`` (tmp + rename). Fragments whose
    checkpoint already exists are skipped — this is the build's
    per-partition resume unit (north rule; the reference has none,
    ``spimi.py:273-275`` even deletes its blocks).

    Runs as an actor pool so the stemmer memo cache (ST1) is shared
    across fragments handled by the same actor.
    """

    def __init__(self, cfg: IndexConfig, out_dir: str, id_column: str | None = None,
                 **kw):
        super().__init__(cfg, **kw)
        self.out_dir = out_dir
        self.id_column = id_column
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from searchengine_ray.build.docids import Fragment, _read_fragment

        out_rows = {"file": [], "docs": [], "postings": [], "skipped": []}
        for row in batch.to_pylist():
            frag = Fragment(
                fragment_id=row["fragment_id"],
                path=row["path"],
                row_groups=tuple(row["row_groups"]),
                num_rows=row["num_rows"],
                doc_offset=row["doc_offset"],
            )
            path = tokenized_checkpoint_path(self.out_dir, frag.doc_offset)
            if os.path.exists(path):
                meta = pq.read_metadata(path)
                out_rows["file"].append(path)
                out_rows["docs"].append(meta.num_rows)
                out_rows["postings"].append(-1)
                out_rows["skipped"].append(True)
                continue
            cols = None
            if self.text_column:
                cols = [self.text_column]
                if self.url_column:
                    cols.append(self.url_column)
            (src,) = list(_read_fragment(frag, cols, self.id_column))
            tok = TokenizeStage.__call__(self, src)
            n_postings = int(pc.sum(pc.list_value_length(tok["terms"])).as_py() or 0)
            tmp = path + f".tmp{os.getpid()}"
            pq.write_table(tok, tmp)
            os.replace(tmp, path)
            out_rows["file"].append(path)
            out_rows["docs"].append(tok.num_rows)
            out_rows["postings"].append(n_postings)
            out_rows["skipped"].append(False)
        return pa.table(
            {
                "file": pa.array(out_rows["file"], pa.string()),
                "docs": pa.array(out_rows["docs"], pa.int64()),
                "postings": pa.array(out_rows["postings"], pa.int64()),
                "skipped": pa.array(out_rows["skipped"], pa.bool_()),
            }
        )

"""BM25F — per-field boosted ranking over a body index + a title index.

The standard web-search upgrade the reference's single-text-column
design never had (reference ``bm25.py:34-57`` scores one field): each
field's term frequency is normalized by its OWN length statistics,
weighted, and summed BEFORE the BM25 saturation — the "simple BM25F"
of Robertson/Zaragoza (Probabilistic Relevance Framework):

    tf*(t, d) = Σ_f  w_f · tf_f(t, d) / (1 − b_f + b_f · dl_f/avgdl_f)
    score(d)  = Σ_t  idf(t) · tf*(k1 + 1) / (tf* + k1)

with idf over the UNION of the fields' posting doc sets (document-
level df) and the engine's quantization conventions kept per field
(``round(ln(N/df), 3)``; ``round(dl/avgdl, 3)`` via DlDivTable), so
``w_title = 0, w_body = 1`` reproduces the plain BM25 ranking
whenever every title token also occurs in its own body (guaranteed by
``derive_title_batch``, which takes the title from the body's leading
whitespace tokens):

    idf · (tf/B)(k+1) / (tf/B + k)  ==  idf · tf(k+1) / (tf + k·B)

(algebraically; in floats the two association orders differ by at
most an ulp, so scores agree to ~1e-14 relative and rankings match)

Architecture: two ordinary single-field indexes over the SAME doc ids
(the title index is just ``build_index`` over a derived title column),
so every existing index facility — sharding, salting, checkpoints,
merge/delete, serving actors — applies to each field unchanged, and a
field can be rebuilt without touching the others.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TITLE_TOKENS = 5


def derive_title_batch(batch: pa.Table, text_col: str = "text",
                       num_tokens: int = TITLE_TOKENS) -> pa.Table:
    """(doc_id, text=title) rows: the title is the body's first
    ``num_tokens`` whitespace tokens — fully vectorized (arrow ltrim →
    regex split → list slice → join). Titles derived from the body
    guarantee title tokens ⊆ body tokens per doc, which is what makes
    the w_title=0 ⇒ BM25 equality exact (see module docstring)."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_ltrim_whitespace(t), r"\s+")
    title = pc.binary_join(pc.list_slice(toks, 0, num_tokens), " ")
    return pa.table({
        "doc_id": batch["doc_id"],
        "text": title,
    })


class Bm25fSearcher:
    """Holds one Searcher per field; per-query work is a posting fetch
    per field plus a vectorized union/normalize/saturate fold — the
    same shape (and actor-pool compatibility) as the plain scorers."""

    def __init__(self, body_index: str, title_index: str,
                 w_body: float = 1.0, w_title: float = 2.0,
                 b_title: float | None = None):
        from searchengine_ray.query.engine import Searcher
        from searchengine_ray.query.scorers import DlDivTable

        self.body = Searcher(body_index)
        self.title = Searcher(title_index)
        if self.body.stats["n_docs"] != self.title.stats["n_docs"]:
            raise ValueError(
                "body and title indexes cover different corpora "
                f"({self.body.stats['n_docs']} vs "
                f"{self.title.stats['n_docs']} docs)")
        cfg = self.body.cfg
        self.k = cfg.k
        self.b_body = cfg.b
        self.b_title = cfg.b if b_title is None else b_title
        self.w_body = w_body
        self.w_title = w_title
        self.n_docs = self.body.stats["n_docs"]
        self._dldiv_body = DlDivTable(self.body.stats["avgdl"])
        self._dldiv_title = DlDivTable(self.title.stats["avgdl"])

    def _field_part(self, rec, union, w, b, dldiv) -> np.ndarray:
        part = np.zeros(union.size, np.float64)
        if rec is not None and w != 0.0:
            bnorm = 1 - b + b * dldiv(rec.dls)
            part[np.searchsorted(union, rec.doc_ids)] = \
                w * (rec.tfs_f64() / bnorm)
        return part

    def search_tokens(self, tokens: list[str], n: int | None = None):
        from searchengine_ray.query.scorers import (
            _fold_scores,
            _unique_in_order,
            top_k,
        )

        n = n or self.body.cfg.default_top_k
        recs_b = self.body.reader.fetch(tokens)
        recs_t = self.title.reader.fetch(tokens)
        doc_chunks, contrib_chunks = [], []
        for t in _unique_in_order(tokens):
            rb, rt = recs_b.get(t), recs_t.get(t)
            if rb is None and rt is None:
                continue
            sets = [r.doc_ids for r in (rb, rt) if r is not None]
            union = sets[0] if len(sets) == 1 else np.union1d(*sets)
            idf = round(math.log(self.n_docs / union.size), 3)
            tf_star = self._field_part(
                rb, union, self.w_body, self.b_body, self._dldiv_body)
            tf_star += self._field_part(
                rt, union, self.w_title, self.b_title, self._dldiv_title)
            live = tf_star > 0.0   # w=0 fields contribute no postings
            union, tf_star = union[live], tf_star[live]
            k = self.k
            doc_chunks.append(union)
            contrib_chunks.append(
                idf * tf_star * (k + 1) / (tf_star + k))
        doc_ids, scores = _fold_scores(doc_chunks, contrib_chunks)
        return top_k(doc_ids, scores, n)

    def search(self, query: str, n: int | None = None,
               with_urls: bool = True) -> pa.Table:
        """→ pyarrow Table (rank, doc_id, score[, url]) — the same
        surface as Searcher.search."""
        tokens = self.body.tokenizer.tokenize(query)
        doc_ids, scores = self.search_tokens(tokens, n)
        cols = {
            "rank": pa.array(np.arange(1, doc_ids.size + 1,
                                       dtype=np.int32)),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
        if with_urls:
            cols["url"] = pa.array(self.body.urls_of(doc_ids),
                                   pa.string())
        return pa.table(cols)

"""Federated search: query-time fan-out over DOCUMENT-PARTITIONED
indexes — the serving topology of an actual web-scale deployment
(each node owns a doc-range index; a query visits every partition and
the per-partition top-ks merge). The alternative to ``merge_indexes``
when partitions must stay independently owned/updated.

Bit-exact by construction: the corpus-global quantities are
recomputed from the shards' INTEGER totals (N = Σ n_docs, avgdl =
Σ total_dl / N, df(t) = Σ df_k(t) — so idf = round(ln(N/df),3) is the
single-index value), every per-doc contribution is the same double a
single full index computes, each document lives in exactly ONE
partition (so its fold sequence is unchanged), and the global merge
uses the engine's (score desc, doc asc) top-k. Verified against the
full-corpus BM25 oracle VERBATIM (contract ``search_bm25_federated``).

Plain-BM25 TAAT only (stored TF-IDF doc weights and WAND bounds bake
in per-index stats; federation recomputes from the raw tf/dl payload
the postings already carry)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from searchengine_ray.config import RankerType
from searchengine_ray.functions.smart import bm25_idf
from searchengine_ray.query.engine import Searcher
from searchengine_ray.query.scorers import DlDivTable, _fold_scores, top_k

_SEMANTIC_CFG = ("ranker", "posting_type", "min_token_length",
                 "use_stop_words", "language", "k", "b")


class FederatedSearcher:
    def __init__(self, index_dirs: list[str], **searcher_kw):
        if len(index_dirs) < 2:
            raise ValueError("federation needs at least two indexes")
        self.shards = [Searcher(d, **searcher_kw) for d in index_dirs]
        s0 = self.shards[0]
        if s0.cfg.ranker != RankerType.BM25:
            raise ValueError(
                "federated search supports the plain BM25 ranker only "
                f"(got {s0.cfg.ranker})")
        for sh in self.shards[1:]:
            if sh.manifest["tokenizer"] != s0.manifest["tokenizer"]:
                raise ValueError("tokenizer config differs across "
                                 "federated indexes")
            for kf in _SEMANTIC_CFG:
                if getattr(sh.cfg, kf) != getattr(s0.cfg, kf):
                    raise ValueError(
                        f"config field {kf!r} differs across federated "
                        "indexes")
        self.n_docs = sum(sh.stats["n_docs"] for sh in self.shards)
        total_dl = sum(sh.stats["total_dl"] for sh in self.shards)
        self.avgdl = total_dl / self.n_docs if self.n_docs else 0.0
        self.dldiv = DlDivTable(self.avgdl)
        self.tokenizer = s0.tokenizer
        self.k = s0.cfg.k
        self.b = s0.cfg.b
        self.default_top_k = s0.cfg.default_top_k

    def search(self, query: str, n: int | None = None) -> pa.Table:
        """→ (rank, doc_id, score): global BM25 top-n across all
        partitions, bit-identical to one index over the union."""
        n = n or self.default_top_k
        tokens = list(dict.fromkeys(self.tokenizer.tokenize(query)))
        per_shard = [sh.reader.fetch(tokens) for sh in self.shards]
        gdf = {t: sum(r[t].df for r in per_shard if t in r and r[t])
               for t in tokens}
        idf = {t: bm25_idf(self.n_docs, d)
               for t, d in gdf.items() if d > 0}
        k, b = self.k, self.b
        docs_l, scores_l = [], []
        for recs in per_shard:
            dchunks, cchunks = [], []
            for t in tokens:
                rec = recs.get(t)
                if rec is None or t not in idf:
                    continue
                tf = rec.tfs_f64()
                # fresh global dldiv — never rec._dldiv (that cache
                # belongs to the shard-local scorer's stats)
                dv = self.dldiv(rec.dls)
                dchunks.append(rec.doc_ids)
                cchunks.append(
                    idf[t] * (tf * (k + 1)) / (tf + k * (1 - b + b * dv)))
            d, s = _fold_scores(dchunks, cchunks)
            docs_l.append(d)
            scores_l.append(s)
        docs = np.concatenate(docs_l) if docs_l else np.empty(0, np.int64)
        scores = np.concatenate(scores_l) if scores_l else \
            np.empty(0, np.float64)
        docs, scores = top_k(docs, scores, n)
        return pa.table({
            "rank": pa.array(np.arange(1, docs.size + 1, dtype=np.int32),
                             pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        })

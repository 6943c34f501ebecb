"""Query engine: searcher + serving actor pool.

``Searcher`` is the in-process engine (reference ``searcher.py:41-58``
lifecycle: tokenize query → fetch posting lists → rank → top-n → join
external ids). ``QueryActor`` wraps it as a callable class for
``map_batches(QueryActor, concurrency=N)`` over a queries dataset —
the scatter/serving path (each actor holds the manifest, shard readers
and caches once; reference ST5).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from searchengine_ray.build.extract import make_tokenizer
from searchengine_ray.build.pipeline import load_manifest
from searchengine_ray.config import IndexConfig, RankerType
from searchengine_ray.query.postings import ShardReader
from searchengine_ray.query.scorers import make_scorer, top_k
from searchengine_ray.state.alias import resolve_alias

_LOG = logging.getLogger(__name__)


def _validate_override(built: IndexConfig, cfg: IndexConfig) -> None:
    """Reject query-time ranker overrides the stored index can't serve —
    the reference raises 'not compatible' in ``load_metadata``
    (searcher.py:14-38). Two hard constraints:

    - idf family: BM25-family indexes store ``round(ln(N/df),3)``; the
      TF-IDF family stores ``calculate_idf(schema[5])`` and per-posting
      weights (absent otherwise). Cross-family overrides either crash
      (weights is None) or silently mis-score.
    - positional boosts need positional postings.
    """
    from searchengine_ray.config import PostingType

    _BM25 = {RankerType.BM25, RankerType.BM25_OPTIMIZED}
    _TFIDF = {RankerType.TF_IDF, RankerType.TF_IDF_OPTIMIZED}
    r = cfg.ranker
    if r != built.ranker and r != RankerType.RAW:
        if (r in _BM25) != (built.ranker in _BM25) or (
            r in _TFIDF) != (built.ranker in _TFIDF):
            raise ValueError(
                f"ranker {r.value!r} is not compatible with an index built "
                f"with {built.ranker.value!r} (stored idf/weights belong to "
                "the build-time ranker family; rebuild or drop the override)"
            )
    if r in (RankerType.BM25_OPTIMIZED, RankerType.TF_IDF_OPTIMIZED) and \
            built.posting_type != PostingType.POSITIONAL:
        raise ValueError(
            f"ranker {r.value!r} needs positional postings; index was built "
            f"with posting_type={built.posting_type.value!r}"
        )
    if r in _TFIDF and cfg.smart_schema[5] != built.smart_schema[5]:
        raise ValueError(
            f"smart schema idf {cfg.smart_schema!r} is not compatible with "
            f"the stored idf (built with {built.smart_schema!r}); the query "
            "idf factor is baked into the shard files at build time"
        )


class Searcher:
    def __init__(
        self,
        index_dir: str,
        *,
        ranker: RankerType | None = None,
        k: float | None = None,
        b: float | None = None,
        smart_schema: str | None = None,
        cache_size: int = 10_000,
        use_wand: bool = False,
    ):
        index_dir = resolve_alias(index_dir)
        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir)
        built = IndexConfig.from_manifest(self.manifest["config"])
        cfg = IndexConfig.from_manifest(self.manifest["config"])
        # query-time overrides (reference CLI --ranker/--k/--b, searcher.py:14-38)
        if ranker is not None:
            cfg.ranker = ranker
        if k is not None:
            cfg.k = k
        if b is not None:
            cfg.b = b
        if smart_schema is not None:
            cfg.smart_schema = smart_schema
        _validate_override(built, cfg)
        self.cfg = cfg
        # WAND's upper bounds (idf·(k+1); block bound with denominator
        # bm + k·(1−b)) are only valid for 0 ≤ b ≤ 1 and k ≥ 0 — outside
        # that range fall back to the exhaustive scorer so the
        # "bit-identical to full TAAT" contract still holds.
        if use_wand and not (0.0 <= cfg.b <= 1.0 and cfg.k >= 0.0):
            use_wand = False
        self.use_wand = use_wand
        self.wand_stats: dict = {}
        self.stats = self.manifest["corpus"]
        self.tokenizer = make_tokenizer(cfg)
        self.scorer = make_scorer(cfg, self.stats)
        self.reader = ShardReader(self.manifest, cache_size=cache_size)
        self._docmap_files: list | None = None
        self._url_cache: dict[int, str] = {}

    # -- core --------------------------------------------------------------

    def search_tokens(self, tokens: list[str], n: int | None = None):
        """→ (doc_ids, scores) arrays, top-n by (score desc, doc_id asc)."""
        n = n or self.cfg.default_top_k
        recs = self.reader.fetch(tokens)
        if self.use_wand and self.cfg.ranker == RankerType.BM25:
            from searchengine_ray.query.wand import bm25_wand_topk

            docs, scores, self.wand_stats = bm25_wand_topk(
                tokens, recs, self.scorer, n
            )
            return docs, scores
        from searchengine_ray.query.scorers import (
            BM25PositionalScorer,
            TfIdfPositionalScorer,
        )

        if isinstance(self.scorer, (BM25PositionalScorer,
                                    TfIdfPositionalScorer)):
            # score-preserving boost pruning: exact boost only for docs
            # whose upper bound could reach the top-n
            doc_ids, scores = self.scorer.score(tokens, recs, top_n=n)
        else:
            doc_ids, scores = self.scorer.score(tokens, recs)
        if self.cfg.ranker == RankerType.RAW:
            return doc_ids[:n], scores[:n]  # reference truncates unsorted
        return top_k(doc_ids, scores, n)

    def search_phrase(self, query: str, n: int | None = None) -> pa.Table:
        """Exact phrase query over a positional index →
        (rank, doc_id, n_matches); see query/phrase.py."""
        from searchengine_ray.query.phrase import phrase_search

        return phrase_search(self, query, n or self.cfg.default_top_k)

    def explain(self, query: str, doc_id: int) -> pa.Table:
        """Score explanation for one (query, doc): per matched term →
        (term, tf, df, idf, contrib), where contrib is THE SCORER'S OWN
        per-term value (``BM25Scorer.term_contrib`` — no reimplemented
        arithmetic to drift) and the contribs sum to the doc's search
        score in token order. Plain-BM25 only (the positional boost is
        a pairwise quantity with no per-term decomposition)."""
        from searchengine_ray.query.scorers import BM25Scorer

        if not isinstance(self.scorer, BM25Scorer):
            raise ValueError(
                "explain supports the plain BM25 ranker only "
                f"(index/override ranker is {self.cfg.ranker})")
        tokens = list(dict.fromkeys(self.tokenizer.tokenize(query)))
        recs = self.reader.fetch(tokens)
        terms, tfs, dfs, idfs, contribs = [], [], [], [], []
        for t in tokens:
            rec = recs.get(t)
            if rec is None:
                continue
            i = int(np.searchsorted(rec.doc_ids, doc_id))
            if i >= rec.doc_ids.size or rec.doc_ids[i] != doc_id:
                continue
            terms.append(t)
            tfs.append(int(rec.tfs[i]))
            dfs.append(int(rec.df))
            idfs.append(float(rec.idf))
            contribs.append(float(self.scorer.term_contrib(rec)[i]))
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "df": pa.array(dfs, pa.int64()),
            "idf": pa.array(idfs, pa.float64()),
            "contrib": pa.array(contribs, pa.float64()),
        })

    def suggest(self, prefix: str, k: int = 10) -> pa.Table:
        """Prefix autocomplete → (term, df) — the ``k`` highest-df
        index terms starting with ``prefix`` (ties term asc). The
        lexicographic shard layout makes this cheap: a prefix spans a
        CONTIGUOUS shard range (shard_of(prefix) .. shard_of(prefix +
        chr(0x10FFFF))), and only those shards' (term, df) columns are
        read — never postings, never other shards."""
        prefix = prefix.lower()
        if not prefix:
            raise ValueError("suggest needs a non-empty prefix")
        lo = self.reader.shard_of(prefix)
        hi = self.reader.shard_of(prefix + chr(0x10FFFF))
        best: dict[str, int] = {}
        for s in range(lo, hi + 1):
            for f in self.reader.files_of_shard.get(s, []):
                t = pq.read_table(f, columns=["term", "df"])
                mask = pc.starts_with(t["term"], prefix)
                t = t.filter(mask)
                for term, df in zip(t["term"].to_pylist(),
                                    t["df"].to_pylist()):
                    # salted terms repeat per salt row with the same
                    # global df — dict collapse keeps one
                    best[term] = int(df)
        order = sorted(best, key=lambda t: (-best[t], t))[:k]
        return pa.table({
            "term": pa.array(order, pa.string()),
            "df": pa.array([best[t] for t in order], pa.int64()),
        })

    def expand_prefix(self, prefix: str,
                      max_expansions: int = 128) -> list[str]:
        """All index terms starting with ``prefix``, capped at
        ``max_expansions`` by (df desc, term asc) — Lucene's top-terms
        wildcard rewrite. The lexicographic shard layout confines the
        scan to the prefix's contiguous shard range, (term, df)
        columns only. A truncated expansion logs the drop count
        loudly (the no-silent-caps rule)."""
        prefix = prefix.lower()
        if not prefix:
            raise ValueError("wildcard needs a non-empty prefix")
        lo = self.reader.shard_of(prefix)
        hi = self.reader.shard_of(prefix + chr(0x10FFFF))
        best: dict[str, int] = {}
        for s in range(lo, hi + 1):
            for f in self.reader.files_of_shard.get(s, []):
                t = pq.read_table(f, columns=["term", "df"])
                t = t.filter(pc.starts_with(t["term"], prefix))
                for term, df in zip(t["term"].to_pylist(),
                                    t["df"].to_pylist()):
                    best[term] = int(df)
        order = sorted(best, key=lambda t: (-best[t], t))
        if len(order) > max_expansions:
            _LOG.warning(
                "wildcard '%s*' expands to %d terms; keeping the "
                "%d highest-df, dropping %d", prefix, len(order),
                max_expansions, len(order) - max_expansions)
            order = order[:max_expansions]
        return order

    def search_wildcard(self, query: str, n: int | None = None,
                        max_expansions: int = 128,
                        with_urls: bool = True) -> pa.Table:
        """BM25 search with trailing-* prefix wildcards: a query word
        ending in ``*`` expands to the index terms sharing its prefix
        (capped, df-ranked — Lucene's scoring_boolean rewrite), each
        scored with its own idf at query-tf 1; other words go through
        the normal tokenizer (stem + stop). Wildcard prefixes match
        the STEMMED index vocabulary directly (the standard engine
        caveat: wildcards skip analysis)."""
        n = n or self.cfg.default_top_k
        plain: list[str] = []
        terms: list[str] = []
        for w in query.split():
            if w.endswith("*") and len(w) > 1:
                for t in self.expand_prefix(
                        w[:-1], max_expansions=max_expansions):
                    if t not in terms:
                        terms.append(t)
            else:
                plain.append(w)
        if plain:
            for t in self.tokenizer.tokenize(" ".join(plain)):
                if t not in terms:
                    terms.append(t)
        if not terms:
            cols = {
                "rank": pa.array([], pa.int32()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
            if with_urls:
                cols["url"] = pa.array([], pa.string())
            return pa.table(cols)
        doc_ids, scores = self.search_tokens(terms, n)
        cols = {
            "rank": pa.array(np.arange(1, doc_ids.size + 1,
                                       dtype=np.int32)),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
        if with_urls:
            cols["url"] = pa.array(self.urls_of(doc_ids), pa.string())
        return pa.table(cols)

    def search_proximity(self, query: str, n: int | None = None,
                         slop: int = 2) -> pa.Table:
        """Ordered proximity query (terms in order within a slop-padded
        window) over a positional index → (rank, doc_id, n_matches);
        see query/phrase.py::proximity_search."""
        from searchengine_ray.query.phrase import proximity_search

        return proximity_search(self, query, n or self.cfg.default_top_k,
                                slop)

    def search_boolean_expr(self, expr: str,
                            n: int | None = None) -> pa.Table:
        """Boolean AND/OR/NOT retrieval over the posting lists →
        (doc_id,) ascending; see query/boolexpr.py (a bare NOT branch
        reads the doc universe once — prefer 'a NOT b' forms)."""
        from searchengine_ray.query.boolexpr import evaluate_index

        return evaluate_index(self, expr, n)

    def all_doc_ids(self) -> np.ndarray:
        """Sorted unique doc-id universe, read once from the docmap
        fragments (footer-pruned columnar reads) and cached — only
        needed by bare-NOT boolean branches."""
        if getattr(self, "_all_doc_ids", None) is None:
            import glob
            import os

            files = sorted(glob.glob(
                os.path.join(self.index_dir, "tokenized", "*.parquet")))
            parts = [pq.read_table(f, columns=["doc_id"])["doc_id"]
                     .to_numpy(zero_copy_only=False) for f in files]
            self._all_doc_ids = (np.unique(np.concatenate(parts))
                                 if parts else np.empty(0, np.int64))
        return self._all_doc_ids

    def doc_terms(self, doc_id: int):
        """→ (terms, tfs) of one document from the tokenized
        checkpoints (the forward index the build already persists);
        same footer-range file routing as ``urls_of``."""
        import glob
        import os

        files = sorted(glob.glob(
            os.path.join(self.index_dir, "tokenized", "*.parquet")))
        for f in files:
            meta = pq.read_metadata(f)
            idx = meta.schema.names.index("doc_id")
            lo = min(meta.row_group(i).column(idx).statistics.min
                     for i in range(meta.num_row_groups))
            hi = max(meta.row_group(i).column(idx).statistics.max
                     for i in range(meta.num_row_groups))
            if lo <= doc_id <= hi:
                t = pq.read_table(f, columns=["doc_id", "terms", "tfs"])
                pos = pc.index(t["doc_id"], doc_id).as_py()
                if pos >= 0:
                    return (t["terms"][pos].as_py(),
                            t["tfs"][pos].as_py())
        raise KeyError(f"doc_id {doc_id} not in index")

    def more_like_this(self, doc_id: int, n: int | None = None,
                       max_terms: int = 10) -> pa.Table:
        """Similar documents to ``doc_id`` (classic MLT): the doc's
        top-``max_terms`` terms by tf·idf (ties term-asc) become the
        query; the seed doc is excluded from the results →
        (rank, doc_id, score, url)."""
        n = n or self.cfg.default_top_k
        terms, tfs = self.doc_terms(doc_id)
        recs = self.reader.fetch(terms)
        scored = sorted(
            (-tf * recs[t].idf, t)
            for t, tf in zip(terms, tfs) if t in recs
        )[:max_terms]
        tokens = [t for _, t in scored]
        doc_ids, scores = self.search_tokens(tokens, n + 1)
        keep = doc_ids != doc_id
        doc_ids, scores = doc_ids[keep][:n], scores[keep][:n]
        return pa.table({
            "rank": pa.array(np.arange(1, doc_ids.size + 1,
                                       dtype=np.int32), pa.int32()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score": pa.array(scores, pa.float64()),
            "url": pa.array(self.urls_of(doc_ids), pa.string()),
        })

    def search_prf(self, query: str, n: int | None = None,
                   fb_docs: int = 3, fb_terms: int = 5) -> pa.Table:
        """Pseudo-relevance-feedback search (Rocchio-style query
        expansion): run the query, take the top-``fb_docs`` results as
        presumed-relevant, pick the ``fb_terms`` strongest terms from
        them (by feedback-tf·idf, ties term-asc, original query terms
        excluded), append them to the query, and re-rank →
        (rank, doc_id, score, url). The feedback-term weight uses the
        stored quantized idf, so the whole loop is value-exact
        reproducible in SQL (oracle ``search_prf``).

        Scale shape: two index searches plus ``fb_docs`` forward-index
        row fetches — no corpus scan, no shuffle."""
        n = n or self.cfg.default_top_k
        tokens = list(dict.fromkeys(self.tokenizer.tokenize(query)))
        fb_ids, _ = self.search_tokens(tokens, fb_docs)
        acc: dict[str, int] = {}
        for d in fb_ids:
            terms, tfs = self.doc_terms(int(d))
            for t, f in zip(terms, tfs):
                acc[t] = acc.get(t, 0) + f
        qset = set(tokens)
        cand = [t for t in acc if t not in qset]
        recs = self.reader.fetch(cand)
        scored = sorted(
            (-acc[t] * recs[t].idf, t) for t in cand if t in recs
        )[:fb_terms]
        expanded = tokens + [t for _, t in scored]
        doc_ids, scores = self.search_tokens(expanded, n)
        return pa.table({
            "rank": pa.array(np.arange(1, doc_ids.size + 1,
                                       dtype=np.int32), pa.int32()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score": pa.array(scores, pa.float64()),
            "url": pa.array(self.urls_of(doc_ids), pa.string()),
        })

    def search_snippets(self, query: str, n: int | None = None,
                        width: int = 8) -> pa.Table:
        """Top-n results with their best query-coverage window straight
        from the positional index → (rank, doc_id, score, win_start,
        n_terms); see query/snippets.py."""
        from searchengine_ray.query.snippets import index_snippets

        return index_snippets(self, query, n or self.cfg.default_top_k,
                              width)

    def search(self, query: str, n: int | None = None, with_urls: bool = True):
        """→ pyarrow Table (rank, doc_id, score[, url])."""
        tokens = self.tokenizer.tokenize(query)
        doc_ids, scores = self.search_tokens(tokens, n)
        cols = {
            "rank": pa.array(np.arange(1, doc_ids.size + 1, dtype=np.int32)),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
        if with_urls:
            cols["url"] = pa.array(self.urls_of(doc_ids), pa.string())
        return pa.table(cols)

    # -- docmap join (reference J2: top-k is tiny → lookup, no shuffle).
    # The docmap IS the tokenized checkpoint: files are named by their
    # doc-offset and doc-sorted inside, so a doc_id binary-searches to
    # exactly one file and the read prunes to the (doc_id, url) columns.

    def urls_of(self, doc_ids: np.ndarray) -> list[str]:
        import glob
        import os

        if self._docmap_files is None:
            files = sorted(
                glob.glob(os.path.join(self.index_dir, "tokenized", "*.parquet"))
            )
            ranges = []
            for f in files:  # footer-only reads: (min, max) doc_id per file
                meta = pq.read_metadata(f)
                idx = meta.schema.names.index("doc_id")
                lo = min(meta.row_group(i).column(idx).statistics.min
                         for i in range(meta.num_row_groups))
                hi = max(meta.row_group(i).column(idx).statistics.max
                         for i in range(meta.num_row_groups))
                ranges.append((lo, hi, f))
            self._docmap_files = ranges
        wanted = [int(d) for d in doc_ids]
        if not wanted:
            return []
        url_of = self._url_cache
        by_file: dict[str, list[int]] = {}
        for d in wanted:
            if d in url_of:
                continue
            # collect EVERY file whose [min,max] range contains the id:
            # with a custom id_column the corpus need not be id-sorted,
            # so fragment ranges can overlap (no early break)
            for lo, hi, f in self._docmap_files:
                if lo <= d <= hi:
                    by_file.setdefault(f, []).append(d)
        for f, ds in by_file.items():
            # one columnar read caches the whole fragment's mapping (a
            # fragment is ~10^5 rows — bounded; hot fragments amortize)
            tbl = pq.read_table(f, columns=["doc_id", "url"])
            url_of.update(zip(tbl["doc_id"].to_pylist(), tbl["url"].to_pylist()))
        return [url_of.get(d, "") for d in wanted]


class QueryActor:
    """Actor-pool stage: batch of (query_id, query) → top-k rows.

    Index load happens once per actor in ``__init__``; per-query work in
    ``__call__`` (SURVEY §2.3 ST5 as an actor pool)."""

    def __init__(self, index_dir: str, n: int = 10, with_urls: bool = False,
                 warm_cache_ref=None, result_cache_size: int = 0,
                 mode: str = "rank", slop: int = 2, prf_docs: int = 3,
                 prf_terms: int = 5, **searcher_kw):
        import collections

        import ray

        self.searcher = Searcher(index_dir, **searcher_kw)
        if warm_cache_ref is not None:
            warm = warm_cache_ref
            if isinstance(warm, ray.ObjectRef):
                warm = ray.get(warm)
            self.searcher.reader.load_cache(warm)
        self.n = n
        self.with_urls = with_urls
        # query mode: every search type the Searcher serves one-shot is
        # also a fleet-scale batch mode (bulk PRF over a query log, a
        # phrase sweep, a boolean audit). One mode per run → one output
        # schema per run.
        if mode not in ("rank", "phrase", "proximity", "prf", "boolean"):
            raise ValueError(f"unknown query mode {mode!r}")
        self.mode = mode
        self.slop = slop
        self.prf_docs = prf_docs
        self.prf_terms = prf_terms
        base = {"query_id": pa.int64()}
        if mode in ("phrase", "proximity"):
            base |= {"rank": pa.int32(), "doc_id": pa.int64(),
                     "n_matches": pa.int64()}
        elif mode == "boolean":
            base |= {"doc_id": pa.int64()}
        elif mode == "prf":
            base |= {"rank": pa.int32(), "doc_id": pa.int64(),
                     "score": pa.float64(), "url": pa.string()}
        else:
            base |= {"rank": pa.int32(), "doc_id": pa.int64(),
                     "score": pa.float64()}
            if with_urls:
                base["url"] = pa.string()
        self._empty = pa.table(
            {k: pa.array([], t) for k, t in base.items()})
        # cross-batch query→result LRU (the classic search result
        # cache; sound because the index is immutable for the actor's
        # lifetime). 0 = off.
        self.result_cache_size = result_cache_size
        self._result_cache: collections.OrderedDict[str, pa.Table] = \
            collections.OrderedDict()

    def _run_query(self, query: str) -> pa.Table:
        if self.mode == "phrase":
            return self.searcher.search_phrase(query, self.n)
        if self.mode == "proximity":
            return self.searcher.search_proximity(query, self.n,
                                                  slop=self.slop)
        if self.mode == "prf":
            return self.searcher.search_prf(query, self.n,
                                            fb_docs=self.prf_docs,
                                            fb_terms=self.prf_terms)
        if self.mode == "boolean":
            return self.searcher.search_boolean_expr(query, self.n)
        return self.searcher.search(query, self.n,
                                    with_urls=self.with_urls)

    def _search_memo(self, query: str) -> pa.Table:
        if self.result_cache_size:
            res = self._result_cache.get(query)
            if res is not None:
                self._result_cache.move_to_end(query)
                return res
        res = self._run_query(query)
        if self.result_cache_size:
            self._result_cache[query] = res
            if len(self._result_cache) > self.result_cache_size:
                self._result_cache.popitem(last=False)
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        # dedup identical query strings within the batch: score once,
        # fan the result out per query_id (identical output — real
        # query streams repeat their head queries heavily)
        res_of: dict[str, pa.Table] = {}
        pieces = []
        order = self._empty.column_names
        for qid, query in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            res = res_of.get(query)
            if res is None:
                res = res_of[query] = self._search_memo(query)
            if res.num_rows:
                pieces.append(res.append_column(
                    "query_id", pa.array([qid] * res.num_rows, pa.int64())
                ).select(order))
        if not pieces:
            return self._empty
        return pa.concat_tables(pieces).cast(self._empty.schema)


def search_dataset(queries_ds, index_dir: str, n: int = 10,
                   concurrency=None, batch_size: int = 8,
                   warm_queries: list[str] | None = None, **kw):
    """Distributed query serving: Dataset[(query_id, query)] → Dataset of
    top-k rows via an actor pool. Small batches keep every actor busy
    (a batch is the unit of assignment); ``concurrency=None`` →
    autoscale to the node.

    ``warm_queries``: head queries whose decoded posting lists are
    fetched ONCE on the driver and broadcast via ``ray.put`` so every
    actor starts with a warm cache instead of re-reading and
    re-decoding the same head-term lists (the standard serving-fleet
    prewarm; identical results, tested)."""
    import ray

    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    ctor = dict(index_dir=index_dir, n=n, **kw)
    if warm_queries:
        s = Searcher(index_dir, **{
            k: v for k, v in kw.items()
            if k not in ("with_urls", "result_cache_size", "mode",
                         "slop", "prf_docs", "prf_terms")
        })
        terms: list[str] = []
        for q in warm_queries:
            terms.extend(s.tokenizer.tokenize(q))
        s.reader.fetch(terms)
        ctor["warm_cache_ref"] = ray.put(s.reader.export_cache())
    return queries_ds.map_batches(
        QueryActor,
        fn_constructor_kwargs=ctor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_concurrency(),
        num_cpus=1,
    )

"""Static-prior blended ranking: BM25 relevance × host authority.

Web rankers blend a query-dependent relevance score with a
query-INDEPENDENT document prior (classically PageRank — Brin & Page
WWW'98 §4.5.2 combine PageRank with the IR score). This module blends
the two hash-verified engines this repo already has:

    blended(d) = round(bm25(d) · 10⁴) · prior_q(host(d))

The BM25 score is quantized FIRST (the contract's score_q4 int64),
then integer-multiplied by the host's int64 PageRank mass
(``pipelines/graph.pagerank``'s rank_q) — so the blend is pure int64
arithmetic on two independently hash-verified quantities and is itself
value-exact against a DuckDB oracle (a float product would amplify
last-ulp engine/oracle drift by the ~10⁹ prior scale; quantize-then-
multiply keeps both sides bit-identical). Hosts absent from the prior
table get ``neutral`` (= one unit of rank mass, i.e. prior 1.0).

Scale shape: the prior table is HOST-bounded (not corpus-bounded) —
built once per graph epoch by ``pagerank``, shipped to serving actors
via ``ray.put`` and looked up per result row; at sf scale it is a
driver dict. Blending happens over the FULL match set (the scorer's
TAAT accumulator already scores every matching doc), then the top-n
cut — a low-relevance doc on a high-authority host can enter the
top-n, which a post-hoc re-rank of the relevance top-n would miss.
A WAND-style skip path would need prior-aware upper bounds
(max-prior per posting block); TAAT blending is the exact baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.web import _HOST

NEUTRAL_RANK_Q = 10 ** 9  # pagerank's default scale: prior 1.0


def host_prior(pagerank_ds) -> dict[str, int]:
    """pagerank's (host, rank_q) Dataset → lookup dict. Host-bounded
    (a few rows per crawl host, NOT per doc) — safe to collect; at
    cluster scale hand the dict to ``ray.put`` once and read the ref
    inside serving actors."""
    return {r["host"]: r["rank_q"] for r in pagerank_ds.take_all()}


def _hosts_of(urls: list[str]) -> list[str]:
    import re

    pat = re.compile(_HOST)
    out = []
    for u in urls:
        m = pat.match(u)
        out.append(m.group("h").lower() if m else "")
    return out


def search_with_prior(searcher, query: str, prior: dict[str, int],
                      top_n: int = 10,
                      neutral: int = NEUTRAL_RANK_Q,
                      host_fn=None) -> pa.Table:
    """→ (rank, doc_id, score_b): top-n by blended int64 score
    ``round(bm25·10⁴) · prior_q(host)``, ties doc_id ascending.

    ``host_fn(doc_ids, urls) -> list[str]`` overrides the default
    host derivation (authority of the doc's indexed url) — needed when
    the index's id column is not a real url (e.g. test corpora indexed
    by bare doc_id)."""
    n_docs = searcher.manifest["corpus"]["n_docs"]
    t = searcher.search(query, n=n_docs, with_urls=True)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
    score_q4 = np.rint(
        t["score"].to_numpy(zero_copy_only=False) * 10_000
    ).astype(np.int64)
    urls = t["url"].to_pylist()
    hosts = host_fn(doc_ids, urls) if host_fn else _hosts_of(urls)
    pr = np.fromiter(
        (prior.get(h, neutral) for h in hosts),
        dtype=np.int64, count=len(doc_ids))
    blended = score_q4 * pr
    order = np.lexsort((doc_ids, -blended))[:top_n]
    return pa.table({
        "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int64)),
        "doc_id": pa.array(doc_ids[order], pa.int64()),
        "score_b": pa.array(blended[order], pa.int64()),
    })

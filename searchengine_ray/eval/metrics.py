"""IR evaluation metrics — reference ``efficiency.py`` re-expressed.

The reference aggregates precision / recall / F-score / NDCG / query
throughput over a golden relevance corpus (``efficiency.py:44-87``,
qrels format ``Q:<query>`` + ``doc\trelevance{1..3}`` lines,
``efficiency.py:28-39``). Here qrels are a Parquet/Arrow table
``(query_id, doc_id, relevance)`` and the evaluation runs the engine's
searcher per query.
"""

from __future__ import annotations

import math
import time

import pyarrow as pa


def precision_recall_f1(retrieved: list[int], relevant: set[int]):
    """Reference ``efficiency.py:44-64``: precision = |hits|/|retrieved|,
    recall = |hits|/|relevant|, F = 2PR/(P+R)."""
    if not retrieved:
        return 0.0, 0.0, 0.0
    hits = sum(1 for d in retrieved if d in relevant)
    p = hits / len(retrieved)
    r = hits / len(relevant) if relevant else 0.0
    f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return p, r, f


def ndcg(retrieved: list[int], relevance_of: dict[int, int]) -> float:
    """Reference ``efficiency.py:65-78``: DCG with gain (2^rel − 1) /
    log2(i + 2) over retrieved order; IDCG over the golden docs in
    descending relevance, same positions."""
    dcg = 0.0
    for i, d in enumerate(retrieved):
        rel = relevance_of.get(d, 0)
        dcg += (2**rel - 1) / math.log2(i + 2)
    ideal = sorted(relevance_of.values(), reverse=True)[: len(retrieved)]
    idcg = sum((2**rel - 1) / math.log2(i + 2) for i, rel in enumerate(ideal))
    return dcg / idcg if idcg > 0 else 0.0


def reciprocal_rank(retrieved: list, relevant: set) -> float:
    """RR = 1/rank of the first relevant result (0 when none retrieved);
    mean over queries = MRR (standard IR eval, beyond the reference's
    E1-E3 but computed over the same golden format)."""
    for i, d in enumerate(retrieved):
        if d in relevant:
            return 1.0 / (i + 1)
    return 0.0


def average_precision(retrieved: list, relevant: set) -> float:
    """AP = mean over relevant ranks of precision@rank (denominator =
    |relevant|, the TREC convention); mean over queries = MAP."""
    if not relevant:
        return 0.0
    hits = 0
    acc = 0.0
    for i, d in enumerate(retrieved):
        if d in relevant:
            hits += 1
            acc += hits / (i + 1)
    return acc / len(relevant)


def rbo(a: list, b: list, p: float = 0.9) -> float:
    """Rank-biased overlap (Webber/Moffat/Zobel TOIS'10), extrapolated
    form: compare two (possibly different-length, uneven) rankings with
    top-weighted emphasis — the standard way to quantify how much two
    rankers agree (BM25 vs PRF, old vs new index). 1 = identical
    prefix order, 0 = disjoint. Truncated at the longer list with the
    min-overlap extrapolation of eq. 32's simple RBO_ext variant:
    RBO = (1−p)/p · Σ_{d=1..k} p^d · |A_d ∩ B_d| / d  +  p^k · X_k/k
    where k = max(len(a), len(b)) and X_k is the overlap at depth k."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    k = max(len(a), len(b))
    seen_a: set = set()
    seen_b: set = set()
    overlap = 0
    acc = 0.0
    for d in range(1, k + 1):
        if d <= len(a):
            x = a[d - 1]
            if x in seen_b:
                overlap += 1
            seen_a.add(x)
        if d <= len(b):
            x = b[d - 1]
            # a[d-1] == b[d-1] lands here exactly once: the a-side
            # check above ran before x entered seen_b
            if x in seen_a:
                overlap += 1
            seen_b.add(x)
        acc += (p ** d) * overlap / d
    return (1 - p) / p * acc + (p ** k) * overlap / k


def load_relevance_txt(path: str) -> list[tuple[str, dict[str, int]]]:
    """Parse the reference's golden-relevance text format
    (``queries.relevance.txt``; reference ``efficiency.py:28-39``):
    ``Q:<query text>`` starts a block, followed by ``<external_id>\\t<rel>``
    lines with rel ∈ {1,2,3}. → ordered [(query, {external_id: rel})]."""
    out: list[tuple[str, dict[str, int]]] = []
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if line.startswith("Q:"):
                # reference strips the query text (efficiency.py:
                # line.split(':')[1].strip()) — trailing whitespace must
                # not change the query sent to the searcher
                out.append((line[2:].strip(), {}))
                continue
            if not out:
                raise ValueError(
                    f"{path}:{lineno}: relevance line {line!r} before any "
                    "'Q:' query block"
                )
            parts = line.split("\t")
            if len(parts) < 2 or not parts[0]:
                raise ValueError(
                    f"{path}:{lineno}: expected '<external_id>\\t<rel>', "
                    f"got {line!r}"
                )
            try:
                rel = int(parts[1])
            except ValueError:
                raise ValueError(
                    f"{path}:{lineno}: relevance {parts[1]!r} is not an "
                    f"integer in line {line!r}"
                ) from None
            out[-1][1][parts[0]] = rel
    return out


def evaluate_relevance_file(searcher, path: str, n: int = 10) -> dict:
    """The reference's end-to-end golden evaluation loop
    (``efficiency.py:94-147``): for each ``Q:`` block run the searcher,
    match on EXTERNAL ids (urls), aggregate P/R/F1/NDCG + throughput."""
    parsed = load_relevance_txt(path)
    per_query = []
    times = []
    for qid, (text, rels) in enumerate(parsed):
        t0 = time.perf_counter()
        res = searcher.search(text, n, with_urls=True)
        times.append(time.perf_counter() - t0)
        retrieved = res["url"].to_pylist()
        p, r, f = precision_recall_f1(retrieved, set(rels))
        per_query.append(
            {"query_id": qid, "query": text, "precision": p, "recall": r,
             "f1": f, "ndcg": ndcg(retrieved, rels),
             "rr": reciprocal_rank(retrieved, set(rels)),
             "ap": average_precision(retrieved, set(rels))}
        )
    m = len(per_query) or 1
    total_time = sum(times) or 1e-9
    return {
        "per_query": per_query,
        "precision": sum(q["precision"] for q in per_query) / m,
        "recall": sum(q["recall"] for q in per_query) / m,
        "f1": sum(q["f1"] for q in per_query) / m,
        "ndcg": sum(q["ndcg"] for q in per_query) / m,
        "mrr": sum(q["rr"] for q in per_query) / m,
        "map": sum(q["ap"] for q in per_query) / m,
        "queries_per_sec": len(per_query) / total_time,
    }


def evaluate(searcher, queries: dict[int, str], qrels: pa.Table,
             n: int = 10) -> dict:
    """Run ``queries`` {query_id: text} against ``searcher``, score vs
    ``qrels`` (query_id, doc_id, relevance). → aggregate metrics dict
    (means over queries + throughput, reference efficiency.py:80-87)."""
    rel_of: dict[int, dict[int, int]] = {}
    for r in qrels.to_pylist():
        rel_of.setdefault(r["query_id"], {})[r["doc_id"]] = r["relevance"]

    per_query = []
    times = []
    for qid, text in queries.items():
        t0 = time.perf_counter()
        res = searcher.search(text, n, with_urls=False)
        times.append(time.perf_counter() - t0)
        retrieved = res["doc_id"].to_pylist()
        rels = rel_of.get(qid, {})
        p, r, f = precision_recall_f1(retrieved, set(rels))
        per_query.append(
            {"query_id": qid, "precision": p, "recall": r, "f1": f,
             "ndcg": ndcg(retrieved, rels),
             "rr": reciprocal_rank(retrieved, set(rels)),
             "ap": average_precision(retrieved, set(rels))}
        )
    m = len(per_query) or 1
    total_time = sum(times) or 1e-9
    return {
        "per_query": per_query,
        "precision": sum(q["precision"] for q in per_query) / m,
        "recall": sum(q["recall"] for q in per_query) / m,
        "f1": sum(q["f1"] for q in per_query) / m,
        "ndcg": sum(q["ndcg"] for q in per_query) / m,
        "mrr": sum(q["rr"] for q in per_query) / m,
        "map": sum(q["ap"] for q in per_query) / m,
        "queries_per_sec": len(per_query) / total_time,
        "median_latency_ms": sorted(times)[len(times) // 2] * 1000 if times else 0,
    }

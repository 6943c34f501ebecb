"""CLI mirroring the reference's two entry points (``indexer.py:64-152``,
``searcher.py:14-38``) on the Ray engine.

    python -m searchengine_ray.cli index --documents pages/*.parquet \
        --output /tmp/idx --ranker bm25 --posting-list-type frequency
    python -m searchengine_ray.cli search --search-index /tmp/idx \
        --query "hello world" --n 10

Owns its Ray session (the library never calls ray.init — driver
contract); reference defect D5 (swapped k/b defaults) is not
replicated: defaults are k1=1.2, b=0.75.
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_index_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--documents", nargs="+", required=True,
                   help="input parquet file(s)/dir of pages")
    p.add_argument("--output", required=True)
    p.add_argument("--ranker", default="bm25",
                   choices=["raw", "bm25", "tf_idf", "bm25_optimized",
                            "tf_idf_optimized"])
    p.add_argument("--posting-list-type", default=None,
                   choices=[None, "boolean", "frequency", "positional"])
    p.add_argument("--min-token-length", type=int, default=3)
    p.add_argument("--no-stop-words", action="store_true")
    p.add_argument("--language", default="english",
                   help="'english' or 'none' (no stemming)")
    p.add_argument("--k", type=float, default=1.2)
    p.add_argument("--b", type=float, default=0.75)
    p.add_argument("--schema", default="lnc.ltc")
    p.add_argument("--num-shards", type=int, default=8)
    p.add_argument("--hot-salts", type=int, default=1)
    p.add_argument("--text-column", default="text")
    p.add_argument("--url-column", default="url")
    p.add_argument("--id-column", default=None)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)


def cmd_index(args) -> int:
    import ray

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig, PostingType, RankerType

    ranker = RankerType(args.ranker)
    posting = (
        PostingType(args.posting_list_type) if args.posting_list_type else
        (PostingType.POSITIONAL
         if ranker in (RankerType.BM25_OPTIMIZED, RankerType.TF_IDF_OPTIMIZED)
         else PostingType.FREQUENCY)
    )
    cfg = IndexConfig(
        min_token_length=args.min_token_length,
        use_stop_words=not args.no_stop_words,
        language=None if args.language in ("none", "None") else args.language,
        posting_type=posting,
        ranker=ranker,
        k=args.k, b=args.b, smart_schema=args.schema,
        num_shards=args.num_shards, hot_salts=args.hot_salts,
    )
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    docs = args.documents[0] if len(args.documents) == 1 else args.documents
    manifest = build_index(
        docs, args.output, cfg,
        id_column=args.id_column, text_column=args.text_column,
        url_column=args.url_column, overwrite=args.overwrite,
    )
    print(json.dumps({"n_docs": manifest["corpus"]["n_docs"],
                      "shards": len(manifest["shards"]),
                      "metrics": manifest["metrics"]}))
    ray.shutdown()
    return 0


def cmd_search(args) -> int:
    from searchengine_ray.config import RankerType
    from searchengine_ray.query.engine import Searcher

    s = Searcher(
        args.search_index,
        ranker=RankerType(args.ranker) if args.ranker else None,
        k=args.k, b=args.b, use_wand=args.wand,
    )
    if args.query:
        res = s.search(args.query, args.n)
        for row in res.to_pylist():
            print(f"{row['rank']:3d}  {row['score']:.6f}  "
                  f"{row['doc_id']}  {row['url']}")
        return 0
    for line in sys.stdin:  # interactive loop (reference searcher.py:74-84)
        q = line.strip()
        if not q:
            break
        for row in s.search(q, args.n).to_pylist():
            print(f"{row['rank']:3d}  {row['score']:.6f}  "
                  f"{row['doc_id']}  {row['url']}")
    return 0


def cmd_eval(args) -> int:
    """Reference efficiency.py role: metrics over a qrels parquet
    (query_id, doc_id, relevance) + a queries parquet (query_id, query)."""
    import pyarrow.parquet as pq

    from searchengine_ray.eval.metrics import evaluate
    from searchengine_ray.query.engine import Searcher

    s = Searcher(args.search_index)
    queries = {
        int(r["query_id"]): r["query"]
        for r in pq.read_table(args.queries).to_pylist()
    }
    qrels = pq.read_table(args.qrels)
    out = evaluate(s, queries, qrels, n=args.n)
    out.pop("per_query", None)
    print(json.dumps(out))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="searchengine_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("index")
    _add_index_args(pi)
    ps = sub.add_parser("search")
    ps.add_argument("--search-index", required=True)
    ps.add_argument("--query", default=None)
    ps.add_argument("--n", type=int, default=10)
    ps.add_argument("--ranker", default=None)
    ps.add_argument("--k", type=float, default=None)
    ps.add_argument("--b", type=float, default=None)
    ps.add_argument("--wand", action="store_true")
    pe = sub.add_parser("eval")
    pe.add_argument("--search-index", required=True)
    pe.add_argument("--queries", required=True)
    pe.add_argument("--qrels", required=True)
    pe.add_argument("--n", type=int, default=10)
    args = ap.parse_args(argv)
    if args.cmd == "index":
        return cmd_index(args)
    if args.cmd == "eval":
        return cmd_eval(args)
    return cmd_search(args)


if __name__ == "__main__":
    sys.exit(main())

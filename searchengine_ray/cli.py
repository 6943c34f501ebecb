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

import pyarrow as pa


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
                   help="any of the 16 Snowball languages ('english' = "
                        "Porter2, 'porter' = original 1980 Porter, ... "
                        "'arabic'), or 'none' (no stemming)")
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

    if args.federate:
        from searchengine_ray.query.federated import FederatedSearcher

        fs = FederatedSearcher([args.search_index] + args.federate,
                               k=args.k, b=args.b)
        if not args.query:
            raise SystemExit("--federate needs --query")
        for row in fs.search(args.query, args.n).to_pylist():
            print(f"{row['rank']:3d}  {row['score']:.6f}  "
                  f"{row['doc_id']}")
        return 0

    if args.title_index:
        from searchengine_ray.query.bm25f import Bm25fSearcher

        if not args.query:
            raise SystemExit("--title-index (BM25F) needs --query")
        fs = Bm25fSearcher(args.search_index, args.title_index,
                           w_title=args.title_weight)
        for row in fs.search(args.query, args.n).to_pylist():
            print(f"{row['rank']:3d}  {row['score']:.6f}  "
                  f"{row['doc_id']}  {row['url']}")
        return 0

    s = Searcher(
        args.search_index,
        ranker=RankerType(args.ranker) if args.ranker else None,
        k=args.k, b=args.b, use_wand=args.wand,
    )

    def _run(q: str) -> pa.Table:
        if args.boolean:
            res = s.search_boolean_expr(q, args.n)
            ids = res["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "rank": pa.array(range(1, len(ids) + 1), pa.int32()),
                "doc_id": res["doc_id"],
                "score": pa.array([1.0] * len(ids), pa.float64()),
                "url": pa.array(s.urls_of(ids), pa.string()),
            })
        if args.snippets:
            res = s.search_snippets(q, args.n, width=args.snippet_width)
            urls = s.urls_of(res["doc_id"].to_numpy(zero_copy_only=False))
            return res.append_column("url", pa.array(urls, pa.string()))
        if args.prf:
            return s.search_prf(q, args.n, fb_docs=args.prf_docs,
                                fb_terms=args.prf_terms)
        if args.wildcard:
            return s.search_wildcard(
                q, args.n, max_expansions=args.max_expansions)
        if args.proximity is not None:
            res = s.search_proximity(q, args.n, slop=args.proximity)
            ids = res["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "rank": res["rank"],
                "doc_id": res["doc_id"],
                "score": res["n_matches"].cast(pa.float64()),
                "url": pa.array(s.urls_of(ids), pa.string()),
            })
        return s.search(q, args.n)

    def _show(row: dict) -> None:
        extra = (f"  [win@{row['win_start']} covers {row['n_terms']}]"
                 if "win_start" in row and row["win_start"] >= 0 else "")
        print(f"{row['rank']:3d}  {row['score']:.6f}  "
              f"{row['doc_id']}  {row['url']}{extra}")

    if args.explain is not None:
        if not args.query:
            raise SystemExit("--explain needs --query")
        total = 0.0
        for row in s.explain(args.query, args.explain).to_pylist():
            total += row["contrib"]
            print(f"{row['contrib']:12.6f}  {row['term']}  "
                  f"tf={row['tf']} df={row['df']} idf={row['idf']:.3f}")
        print(f"{total:12.6f}  = score of doc {args.explain}")
        return 0
    if args.suggest is not None:
        for row in s.suggest(args.suggest, args.n).to_pylist():
            print(f"{row['df']:8d}  {row['term']}")
        return 0
    if args.more_like is not None:
        for row in s.more_like_this(args.more_like, args.n).to_pylist():
            _show(row)
        return 0
    if args.query:
        for row in _run(args.query).to_pylist():
            _show(row)
        return 0
    # interactive loop (reference searcher.py:74-84: prompt, 'q' quits,
    # per-query latency reported like the reference's Efficiency stats)
    import time as _time

    interactive = sys.stdin.isatty()
    while True:
        if interactive:
            try:
                line = input("Search (exit interactive search with 'q'): ")
            except EOFError:
                break
        else:
            line = sys.stdin.readline()
            if not line:
                break
        q = line.strip()
        if not q or q.lower() == "q":
            break
        t0 = _time.perf_counter()
        res = _run(q)
        dt = _time.perf_counter() - t0
        for row in res.to_pylist():
            _show(row)
        print(f"# {res.num_rows} results in {dt * 1000:.2f} ms")
    return 0


def cmd_eval(args) -> int:
    """Reference efficiency.py role: metrics over a qrels parquet
    (query_id, doc_id, relevance) + a queries parquet (query_id, query),
    or the reference's ``queries.relevance.txt`` format directly
    (``--qrels-txt``)."""
    import pyarrow.parquet as pq

    from searchengine_ray.eval.metrics import evaluate, evaluate_relevance_file
    from searchengine_ray.query.engine import Searcher

    s = Searcher(args.search_index)
    if args.qrels_txt:
        out = evaluate_relevance_file(s, args.qrels_txt, n=args.n)
    else:
        if not (args.queries and args.qrels):
            raise SystemExit(
                "eval needs either --qrels-txt or BOTH --queries and "
                "--qrels"
            )
        queries = {
            int(r["query_id"]): r["query"]
            for r in pq.read_table(args.queries).to_pylist()
        }
        qrels = pq.read_table(args.qrels)
        out = evaluate(s, queries, qrels, n=args.n)
    out.pop("per_query", None)
    print(json.dumps(out))
    return 0


def cmd_dedup(args) -> int:
    """Corpus dedup: exact (md5 groups), minhash (LSH candidate pairs)
    or simhash (Hamming-near pairs) over a documents parquet → parquet
    out."""
    import ray.data

    from searchengine_ray.pipelines.dedup import (
        exact_dedup,
        minhash_candidates,
        simhash_pairs,
    )

    ds = ray.data.read_parquet(args.documents,
                               columns=[args.id_column, args.text_column])
    if args.id_column != "doc_id" or args.text_column != "text":
        ds = ds.map_batches(
            lambda b: b.rename_columns(["doc_id", "text"]),
            batch_format="pyarrow",
        )
    from searchengine_ray.pipelines.dedup import normalized_dedup

    out = {"exact": exact_dedup, "minhash": minhash_candidates,
           "simhash": simhash_pairs,
           "normalized": normalized_dedup}[args.method](ds)
    out.write_parquet(args.output)
    print(json.dumps({"method": args.method, "rows": out.count(),
                      "output": args.output}))
    return 0


def cmd_ann(args) -> int:
    """Similarity search over an embeddings parquet: exact cosine or
    the persisted-IVF approximate path."""
    import ray.data

    from searchengine_ray.pipelines.similarity import cosine_topk, ivf_topk

    ds = ray.data.read_parquet(args.embeddings)
    qids = [int(x) for x in args.query_ids.split(",")]
    if args.method == "cosine":
        t = cosine_topk(ds, query_ids=qids, k=args.k)
    else:
        t = ivf_topk(ds, query_ids=qids, k=args.k,
                     n_centroids=args.n_centroids, nprobe=args.nprobe,
                     index_dir=args.ivf_index)
    for row in t.to_pylist():
        print(f"{row['query_id']:8d}  {row['rank']:3d}  "
              f"{row['vec_id']:8d}  {row['sim']:.6f}")
    return 0


def cmd_bulk(args) -> int:
    """Batch serving: a queries parquet (query_id, query) → top-k rows
    parquet via the QueryActor pool."""
    import ray.data

    from searchengine_ray.query.engine import search_dataset

    qds = ray.data.read_parquet(args.queries)
    out = search_dataset(qds, args.search_index, n=args.n,
                         with_urls=args.urls, mode=args.mode)
    out.write_parquet(args.output)
    print(json.dumps({"queries": qds.count(), "rows": out.count(),
                      "output": args.output}))
    return 0


def cmd_curate_op(args) -> int:
    """Single curation/analysis op over a documents (or events) parquet
    → parquet out. Ops: chunk (stride token windows), decontam (n-gram
    overlap vs --probe docs), keywords (per-doc top-k TF-IDF), pii
    (email/phone redaction stats), repetition (Gopher dup counters),
    hostcap (per-host doc cap), sessionize (gap sessions over events)."""
    import json as _json
    import os as _os
    import shutil as _shutil

    import ray.data

    if _os.path.isdir(args.output) and _os.listdir(args.output):
        if not args.overwrite:
            raise SystemExit(
                f"output dir {args.output!r} exists and is not empty; "
                "pass --overwrite to replace it (a rerun would otherwise "
                "append duplicate files)"
            )
        _shutil.rmtree(args.output)

    if args.op == "sessionize":
        from searchengine_ray.pipelines.events import sessionize

        ds = ray.data.read_parquet(
            args.documents, columns=["event_id", "ts", "user_id"])
        out = sessionize(ds, gap_us=args.gap_us)
    elif args.op == "hostcap":
        from searchengine_ray.pipelines.curate import host_cap_sample

        ds = ray.data.read_parquet(
            args.documents, columns=["doc_id", args.host_column])
        out = host_cap_sample(ds, cap=args.cap, host_col=args.host_column)
    elif args.op == "resample":
        from searchengine_ray.pipelines.curate import domain_resample

        ds = ray.data.read_parquet(
            args.documents, columns=["doc_id", args.group_column])
        out = domain_resample(ds, alpha=args.alpha,
                              group_col=args.group_column)
    elif args.op == "pack":
        from searchengine_ray.pipelines.curate import sequence_pack

        ds = ray.data.read_parquet(args.documents,
                                   columns=["doc_id", "text"])
        out = sequence_pack(ds, capacity=args.capacity,
                            num_parts=args.num_parts)
    elif args.op == "spandedup":
        from searchengine_ray.pipelines.curate import span_dedup

        ds = ray.data.read_parquet(args.documents,
                                   columns=["doc_id", "text"])
        out = span_dedup(ds, span_tokens=args.span_tokens)
    elif args.op == "dsir":
        from searchengine_ray.pipelines.dsir import dsir_sample, dsir_scores

        ds = ray.data.read_parquet(
            args.documents, columns=["doc_id", "text", args.host_column])
        if args.sample_k:
            out = dsir_sample(ds, target_value=args.target,
                              target_col=args.host_column,
                              k=args.sample_k,
                              temperature=args.temperature,
                              min_count=args.min_count)
        else:
            out = dsir_scores(ds, target_value=args.target,
                              target_col=args.host_column,
                              min_count=args.min_count)
    else:
        ds = ray.data.read_parquet(args.documents,
                                   columns=["doc_id", "text"])
        if args.op == "chunk":
            from searchengine_ray.pipelines.curate import (
                chunk_documents_batch,
            )

            ct, st = args.chunk_tokens, args.stride
            out = ds.map_batches(
                lambda b: chunk_documents_batch(b, ct, st),
                batch_format="pyarrow",
            )
        elif args.op == "decontam":
            from searchengine_ray.pipelines.decontam import decontaminate

            probe = ray.data.read_parquet(args.probe,
                                          columns=["doc_id", "text"])
            out = decontaminate(ds, probe, n=args.ngram)
        elif args.op == "keywords":
            from searchengine_ray.pipelines.analysis import keywords_topk

            out = keywords_topk(ds, k=args.k)
        elif args.op == "lm":
            from searchengine_ray.pipelines.lm import bigram_lm_score

            train = (ray.data.read_parquet(args.probe,
                                           columns=["doc_id", "text"])
                     if args.probe else None)
            out = bigram_lm_score(ds, train_ds=train, add_k=args.add_k,
                                  min_count=args.min_count)
        elif args.op == "pii":
            from searchengine_ray.pipelines.analysis import pii_redact_batch

            out = ds.map_batches(pii_redact_batch, batch_format="pyarrow")
        elif args.op == "winnow":
            from searchengine_ray.pipelines.winnow import winnow_fingerprints

            out = winnow_fingerprints(ds, k=args.ngram, w=args.window)
        elif args.op == "pmi":
            import ray.data as _rd

            from searchengine_ray.pipelines.cooccur import pmi_pairs

            out = _rd.from_arrow(pmi_pairs(ds, k=args.k_pairs))
        elif args.op == "qualityfilter":
            from searchengine_ray.pipelines.lm import lm_quality_filter

            out = lm_quality_filter(ds, drop_pct=args.drop_pct,
                                    add_k=args.add_k,
                                    min_count=args.min_count)
        else:   # repetition
            from searchengine_ray.pipelines.analysis import (
                repetition_stats_batch,
            )

            out = ds.map_batches(repetition_stats_batch,
                                 batch_format="pyarrow")
    if not hasattr(out, "write_parquet"):   # driver-bounded pa.Table
        out = ray.data.from_arrow(out)
    if args.format == "jsonl":
        # NDJSON sink — the interchange twin of the sources/jsonl.py
        # reader (one object per line, one file per block)
        out.write_json(args.output)
        n = ray.data.read_json(args.output).count()
    else:
        out.write_parquet(args.output)
        n = ray.data.read_parquet(args.output).count()
    print(_json.dumps({"op": args.op, "rows": n, "output": args.output}))
    return 0


def cmd_analyze(args) -> int:
    """Corpus/event analytics op over parquet → parquet. Ops:
    heavyhitters, tokenquantiles, langtopterms (documents parquet);
    valuequantiles, funnel, retention (events parquet); fuzzy, expand
    (documents parquet + --terms)."""
    import json as _json
    import os as _os
    import shutil as _shutil

    import ray.data

    if _os.path.isdir(args.output) and _os.listdir(args.output):
        if not args.overwrite:
            raise SystemExit(
                f"output dir {args.output!r} exists and is not empty; "
                "pass --overwrite to replace it")
        _shutil.rmtree(args.output)

    def docs(cols):
        return ray.data.read_parquet(args.documents, columns=cols)

    if args.op == "heavyhitters":
        from searchengine_ray.pipelines.analysis import heavy_hitters

        res = heavy_hitters(docs(["doc_id", "text"]), k=args.k)
    elif args.op == "tokenquantiles":
        from searchengine_ray.pipelines.analysis import token_quantiles

        res = token_quantiles(docs(["doc_id", "text"]))
    elif args.op == "langtopterms":
        from searchengine_ray.pipelines.analysis import lang_top_terms

        res = lang_top_terms(docs(["doc_id", "text", "lang"]), k=args.k)
    elif args.op == "valuequantiles":
        from searchengine_ray.pipelines.quantiles import exact_quantiles

        res = exact_quantiles(docs([args.col]), args.col)
    elif args.op == "clusters":
        from searchengine_ray.pipelines.similarity import (
            embedding_clusters,
        )

        res = embedding_clusters(
            ray.data.read_parquet(args.documents), n_centroids=args.k)
    elif args.op == "funnel":
        from searchengine_ray.pipelines.events import funnel_counts

        res = funnel_counts(docs(["user_id", "ts", "event_type"]),
                            args.steps)
    elif args.op == "retention":
        from searchengine_ray.pipelines.events import retention_cohorts

        res = retention_cohorts(docs(["user_id", "ts"]),
                                period_hours=args.period_hours)
    elif args.op == "dau":
        from searchengine_ray.pipelines.events import daily_active

        res = daily_active(docs(["ts", "user_id"]),
                           period_hours=args.period_hours)
    elif args.op == "langconfusion":
        from searchengine_ray.pipelines.analysis import lang_confusion

        res = lang_confusion(docs(["doc_id", "text", "lang"]))
    elif args.op == "windowpmi":
        from searchengine_ray.pipelines.cooccur import window_pmi

        res = window_pmi(docs(["doc_id", "text"]), k=args.k)
    elif args.op == "fuzzy":
        from searchengine_ray.query.fuzzy import fuzzy_suggest

        res = fuzzy_suggest(docs(["doc_id", "text"]), args.terms,
                            max_dist=2, k=args.k)
    else:   # expand
        from searchengine_ray.pipelines.cooccur import expand_query

        res = expand_query(docs(["doc_id", "text"]), args.terms,
                           k=args.k)

    out = (res if hasattr(res, "write_parquet")
           else ray.data.from_arrow(res))
    out.write_parquet(args.output)
    n = ray.data.read_parquet(args.output).count()
    print(_json.dumps({"op": args.op, "rows": n, "output": args.output}))
    return 0


def cmd_corpus_report(args) -> int:
    """One-command corpus profile: doc/token counts, token-length
    quantiles, KMV vocabulary estimate, exact-dup and normalized-dup
    rates, top terms — a single JSON report (the first thing an
    analyst runs on a new crawl drop). Each section is one of the
    oracle-verified operators; the report only composes them."""
    import json as _json

    import ray.data

    from searchengine_ray.pipelines.analysis import (
        heavy_hitters,
        token_quantiles,
        vocab_kmv_estimate,
    )
    from searchengine_ray.pipelines.dedup import (
        exact_dedup,
        normalized_dedup,
    )

    ds = ray.data.read_parquet(args.documents,
                               columns=["doc_id", "text"])
    n_docs = ds.count()
    report: dict = {"n_docs": n_docs}
    tq = token_quantiles(ds).to_pylist()
    report["token_length_quantiles"] = {
        f"p{r['pct']}": r["dl_q"] for r in tq}
    kmv = vocab_kmv_estimate(ds).to_pylist()[0]
    report["vocab_estimate"] = kmv["est_distinct"]
    ex = exact_dedup(ds).count()
    nd = normalized_dedup(ds).count()
    report["exact_dup_rate"] = round(1 - ex / n_docs, 6) if n_docs else 0
    report["normalized_dup_rate"] = \
        round(1 - nd / n_docs, 6) if n_docs else 0
    report["top_terms"] = [
        {"term": r["term"], "cf": r["cf"]}
        for r in heavy_hitters(ds, k=args.k).to_pylist()]
    print(_json.dumps(report))
    if args.output:
        with open(args.output, "w") as f:
            _json.dump(report, f, indent=1)
    return 0


def cmd_index_stats(args) -> int:
    """Operational snapshot of an index: corpus stats, config, build
    metrics/lineage, per-shard on-disk sizes."""
    import glob
    import os

    from searchengine_ray.build.pipeline import load_manifest

    m = load_manifest(args.search_index)
    shard_files = sorted(glob.glob(
        os.path.join(args.search_index, "shards", "*.parquet")))
    sizes = [os.path.getsize(f) for f in shard_files]
    out = {
        "corpus": m["corpus"],
        "config": {k: m["config"][k] for k in
                   ("ranker", "posting_type", "language", "num_shards")
                   if k in m["config"]},
        "n_shard_files": len(shard_files),
        "index_bytes": sum(sizes),
        "largest_shard_bytes": max(sizes) if sizes else 0,
        "metrics": m.get("metrics", {}),
        "lineage": m.get("lineage", {}),
    }
    print(json.dumps(out))
    return 0



def cmd_graph(args) -> int:
    """Link-graph analytics over a pages parquet dir (url, html):
    host edges -> the chosen operator. --out writes partitioned
    parquet (resumable); otherwise the top rows print."""
    import ray.data

    from searchengine_ray.pipelines.graph import (cocitation,
                                                  extract_links,
                                                  hits,
                                                  host_components,
                                                  host_edges,
                                                  pagerank,
                                                  personalized_pagerank)

    ds = ray.data.read_parquet(args.input, columns=["url", "html"])
    edges = host_edges(extract_links(ds))
    if args.op == "pagerank":
        out = pagerank(edges, iters=args.iters,
                       redistribute_dangling=args.redistribute_dangling)
        key = "rank_q"
    elif args.op == "ppr":
        if not args.seeds:
            raise SystemExit("ppr needs --seeds HOST [HOST ...]")
        out = personalized_pagerank(edges, seeds=args.seeds,
                                    iters=args.iters)
        key = "rank_q"
    elif args.op == "hits":
        out = hits(edges, iters=args.iters)
        key = "auth_q"
    elif args.op == "components":
        out = host_components(edges)
        key = None
    else:  # cocited / coupled
        out = cocitation(edges, mode=args.op)
        key = "n_common"
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"op": args.op, "rows": out.count(),
                          "out": args.out}))
        return 0
    rows = out.take_all()
    if key:
        rows.sort(key=lambda r: (-r[key], str(sorted(r.items()))))
    for r in rows[: args.n]:
        print(json.dumps(r))
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
    ps.add_argument("--snippets", action="store_true",
                    help="attach best query-coverage window per result "
                         "(positional index only)")
    ps.add_argument("--snippet-width", type=int, default=8)
    ps.add_argument("--boolean", action="store_true",
                    help="treat the query as a boolean AND/OR/NOT "
                         "expression (returns matching docs, unranked)")
    ps.add_argument("--prf", action="store_true",
                    help="pseudo-relevance feedback: expand the query "
                    "with the strongest terms of its top results and "
                    "re-rank")
    ps.add_argument("--prf-docs", type=int, default=3)
    ps.add_argument("--prf-terms", type=int, default=5)
    ps.add_argument("--wildcard", action="store_true",
                    help="expand trailing-* query words over the "
                         "stemmed index vocabulary (prefix wildcard, "
                         "df-ranked capped expansion)")
    ps.add_argument("--max-expansions", type=int, default=128)
    ps.add_argument("--proximity", type=int, default=None, metavar="SLOP",
                    help="ordered proximity query: terms in order "
                         "within a window padded by SLOP (0 = exact "
                         "phrase; positional index only)")
    ps.add_argument("--title-index", default=None,
                    help="second index built over a title field -> "
                         "BM25F per-field scoring (see --title-weight)")
    ps.add_argument("--title-weight", type=float, default=2.0)
    ps.add_argument("--federate", nargs="+", default=None,
                    metavar="INDEX",
                    help="additional doc-partitioned indexes: fan the "
                         "query out and merge with globalized stats "
                         "(bit-identical to one merged index)")
    ps.add_argument("--explain", type=int, default=None, metavar="DOC_ID",
                    help="print the per-term BM25 score breakdown of "
                         "this doc for --query instead of searching")
    ps.add_argument("--suggest", default=None, metavar="PREFIX",
                    help="prefix autocomplete: top index terms by df "
                         "instead of a search")
    ps.add_argument("--more-like", type=int, default=None,
                    help="similar-document query: use this doc_id's "
                         "top tf-idf terms instead of --query")
    pe = sub.add_parser("eval")
    pe.add_argument("--search-index", required=True)
    pe.add_argument("--queries", default=None)
    pe.add_argument("--qrels", default=None)
    pe.add_argument("--qrels-txt", default=None,
                    help="reference queries.relevance.txt format")
    pe.add_argument("--n", type=int, default=10)
    pd = sub.add_parser("dedup")
    pd.add_argument("--documents", nargs="+", required=True)
    pd.add_argument("--output", required=True)
    pd.add_argument("--method", default="exact",
                    choices=["exact", "minhash", "simhash",
                             "normalized"])
    pd.add_argument("--id-column", default="doc_id")
    pd.add_argument("--text-column", default="text")
    pb = sub.add_parser("bulk")
    pb.add_argument("--search-index", required=True)
    pb.add_argument("--queries", nargs="+", required=True,
                    help="parquet of (query_id, query)")
    pb.add_argument("--output", required=True)
    pb.add_argument("--n", type=int, default=10)
    pb.add_argument("--urls", action="store_true")
    pb.add_argument("--mode", default="rank",
                    choices=["rank", "phrase", "proximity", "prf",
                             "boolean"],
                    help="query type for the whole batch run")
    pa_ = sub.add_parser("ann")
    pa_.add_argument("--embeddings", nargs="+", required=True)
    pa_.add_argument("--query-ids", required=True,
                     help="comma-separated vec_ids")
    pa_.add_argument("--k", type=int, default=5)
    pa_.add_argument("--method", default="cosine",
                     choices=["cosine", "ivf"])
    pa_.add_argument("--n-centroids", type=int, default=16)
    pa_.add_argument("--nprobe", type=int, default=4)
    pa_.add_argument("--ivf-index", default=None)
    pc_ = sub.add_parser("curate")
    pc_.add_argument("--op", required=True,
                     choices=["chunk", "decontam", "keywords", "pii",
                              "repetition", "hostcap", "sessionize",
                              "lm", "resample", "pack", "spandedup",
                              "dsir", "winnow", "pmi", "qualityfilter"])
    pc_.add_argument("--documents", nargs="+", required=True,
                     help="documents parquet (events parquet for "
                          "sessionize)")
    pc_.add_argument("--output", required=True)
    pc_.add_argument("--probe", nargs="+", default=None,
                     help="decontam: probe/eval docs parquet")
    pc_.add_argument("--ngram", type=int, default=5)
    pc_.add_argument("--chunk-tokens", type=int, default=64)
    pc_.add_argument("--stride", type=int, default=48)
    pc_.add_argument("--k", type=int, default=3)
    pc_.add_argument("--cap", type=int, default=1000)
    pc_.add_argument("--host-column", default="source")
    pc_.add_argument("--gap-us", type=int, default=1_800_000_000)
    pc_.add_argument("--overwrite", action="store_true",
                     help="replace a non-empty output dir")
    pc_.add_argument("--add-k", type=float, default=0.5,
                     help="lm: add-k smoothing constant")
    pc_.add_argument("--target", default=None,
                     help="dsir: target domain value in --host-column")
    pc_.add_argument("--window", type=int, default=5,
                     help="winnow: window size w (--ngram is k)")
    pc_.add_argument("--k-pairs", type=int, default=50,
                     help="pmi: number of top pairs to keep")
    pc_.add_argument("--drop-pct", type=int, default=10,
                     help="qualityfilter: percent of worst docs to drop")
    pan = sub.add_parser("analyze")
    pan.add_argument("--op", required=True,
                     choices=["heavyhitters", "tokenquantiles",
                              "langtopterms", "valuequantiles",
                              "funnel", "retention", "fuzzy", "expand",
                              "clusters", "dau", "langconfusion",
                              "windowpmi"])
    pan.add_argument("--documents", nargs="+", required=True,
                     help="documents parquet (events parquet for "
                          "valuequantiles/funnel/retention; embeddings "
                          "parquet for clusters)")
    pan.add_argument("--output", required=True)
    pan.add_argument("--k", type=int, default=10)
    pan.add_argument("--col", default="value",
                     help="valuequantiles: numeric column")
    pan.add_argument("--steps", nargs="+",
                     default=["view", "click", "purchase"],
                     help="funnel: ordered event types")
    pan.add_argument("--period-hours", type=int, default=24)
    pan.add_argument("--terms", nargs="+", default=None,
                     help="fuzzy/expand: query terms")
    pan.add_argument("--num-cpus", type=int, default=None)
    pan.add_argument("--overwrite", action="store_true")
    pst = sub.add_parser("index-stats")
    pst.add_argument("--search-index", required=True)
    pcr = sub.add_parser("corpus-report",
                         help="one-command corpus profile (counts, "
                              "quantiles, vocab estimate, dup rates, "
                              "top terms) as a single JSON")
    pcr.add_argument("--documents", nargs="+", required=True)
    pcr.add_argument("--output", default=None,
                     help="also write the JSON report here")
    pcr.add_argument("--k", type=int, default=20,
                     help="top terms to include")
    pm = sub.add_parser("merge-indexes",
                        help="merge indexes built over disjoint "
                             "document sets into one (exact: answers "
                             "match a single full build bit-for-bit)")
    pm.add_argument("--indexes", nargs="+", required=True)
    pm.add_argument("--output", required=True)
    pm.add_argument("--overwrite", action="store_true")
    pal = sub.add_parser("set-alias",
                         help="atomically point a serving alias file "
                              "at an index dir (blue/green swap); "
                              "search --search-index <alias> resolves "
                              "it")
    pal.add_argument("--alias", required=True)
    pal.add_argument("--search-index", required=True)
    pg = sub.add_parser("graph",
                        help="link-graph analytics over a pages dir")
    pg.add_argument("op", choices=["pagerank", "ppr", "hits",
                                   "components", "cocited", "coupled"])
    pg.add_argument("--input", required=True,
                    help="pages parquet file/dir with url + html")
    pg.add_argument("--iters", type=int, default=3)
    pg.add_argument("--redistribute-dangling", action="store_true")
    pg.add_argument("--seeds", nargs="+", default=None)
    pg.add_argument("--out", default=None,
                    help="write partitioned parquet here instead of "
                         "printing")
    pg.add_argument("--n", type=int, default=20)
    pdl = sub.add_parser("delete-docs",
                         help="remove documents from an index into a "
                              "new index (exact: answers match a fresh "
                              "build over the survivors)")
    pdl.add_argument("--search-index", required=True)
    pdl.add_argument("--output", required=True)
    pdl.add_argument("--doc-ids", type=int, nargs="*", default=None)
    pdl.add_argument("--doc-ids-file", default=None,
                     help="newline-separated doc ids (for big takedown "
                          "lists)")
    pdl.add_argument("--overwrite", action="store_true")
    pc_.add_argument("--min-count", type=int, default=1,
                     help="lm: prune bigrams below this count before "
                          "the broadcast (the web-scale knob)")
    pc_.add_argument("--alpha", type=float, default=0.5,
                     help="resample: temperature (1=flatten to the "
                          "smallest domain, 0=keep everything)")
    pc_.add_argument("--group-column", default="source",
                     help="resample: domain column")
    pc_.add_argument("--capacity", type=int, default=512,
                     help="pack: max pre-tokens per packed sequence")
    pc_.add_argument("--num-parts", type=int, default=64,
                     help="pack: hash partitions (parallelism knob; "
                          "packs never cross partitions)")
    pc_.add_argument("--span-tokens", type=int, default=4,
                     help="spandedup: tile size in whitespace tokens")
    pc_.add_argument("--format", default="parquet",
                     choices=["parquet", "jsonl"],
                     help="output format (jsonl = NDJSON, one object "
                          "per line)")
    pc_.add_argument("--sample-k", type=int, default=0,
                     help="dsir: Gumbel top-k sample this many docs "
                          "(∝ exp(score/T)) instead of emitting scores")
    pc_.add_argument("--temperature", type=float, default=1.0,
                     help="dsir --sample-k: sampling temperature")
    args = ap.parse_args(argv)
    if args.cmd == "analyze" and args.op in ("fuzzy", "expand") \
            and not args.terms:
        raise SystemExit(f"analyze --op {args.op} needs --terms")
    if args.cmd == "curate" and args.op == "dsir" and not args.target:
        raise SystemExit("curate --op dsir needs --target (domain value)")
    if args.cmd == "curate" and args.op == "decontam" and not args.probe:
        ap.error("--probe is required for --op decontam")
    if args.cmd in ("dedup", "ann", "bulk", "curate", "analyze",
                    "merge-indexes", "delete-docs",
                    "corpus-report"):  # need Ray
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
    if args.cmd == "index":
        return cmd_index(args)
    if args.cmd == "eval":
        return cmd_eval(args)
    if args.cmd == "dedup":
        return cmd_dedup(args)
    if args.cmd == "ann":
        return cmd_ann(args)
    if args.cmd == "bulk":
        return cmd_bulk(args)
    if args.cmd == "curate":
        return cmd_curate_op(args)
    if args.cmd == "analyze":
        return cmd_analyze(args)
    if args.cmd == "index-stats":
        return cmd_index_stats(args)
    if args.cmd == "corpus-report":
        return cmd_corpus_report(args)
    if args.cmd == "merge-indexes":
        import json as _json

        from searchengine_ray.build.merge_indexes import merge_indexes

        m = merge_indexes(args.indexes, args.output,
                          overwrite=args.overwrite)
        print(_json.dumps({"n_docs": m["corpus"]["n_docs"],
                           "shards": len(m["shards"]),
                           "metrics": m["metrics"]}))
        return 0
    if args.cmd == "graph":
        return cmd_graph(args)
    if args.cmd == "set-alias":
        from searchengine_ray.state.alias import set_alias

        set_alias(args.alias, args.search_index)
        print(f"{args.alias} -> {args.search_index}")
        return 0
    if args.cmd == "delete-docs":
        import json as _json

        from searchengine_ray.build.merge_indexes import delete_docs

        ids = list(args.doc_ids or [])
        if args.doc_ids_file:
            with open(args.doc_ids_file) as fh:
                ids.extend(int(x) for x in fh.read().split())
        if not ids:
            raise SystemExit("delete-docs needs --doc-ids or "
                             "--doc-ids-file")
        m = delete_docs(args.search_index, args.output, ids,
                        overwrite=args.overwrite)
        print(_json.dumps({"n_docs": m["corpus"]["n_docs"],
                           "shards": len(m["shards"]),
                           "metrics": m["metrics"]}))
        return 0
    return cmd_search(args)


if __name__ == "__main__":
    sys.exit(main())

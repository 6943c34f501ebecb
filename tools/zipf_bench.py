"""Realistic-vocabulary check: the driver testdata has a ~30-term
vocabulary; this tool builds a deterministic Zipf-distributed corpus
(default 200k docs, 50k-term vocabulary, ~12M postings), indexes it,
and reports build throughput + warm query latency over head / torso /
tail terms. Guards against anything in the pipeline assuming a tiny
vocabulary (boundary sampling, salting, shard row-group pruning).

Usage: python tools/zipf_bench.py [--docs N] [--vocab V]
Prints one JSON line; corpus + index are cached under /tmp by shape.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(out_dir: str, n_docs: int, vocab: int, files: int = 32,
                mean_len: int = 60) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    words = np.asarray([f"w{i:05d}" for i in range(vocab)], dtype=object)
    # zipf-ish pmf over ranks (fixed constants → identical every run)
    p = 1.0 / np.power(np.arange(1, vocab + 1), 1.1)
    cdf = np.cumsum(p / p.sum())
    rs = np.random.RandomState(7)
    per = (n_docs + files - 1) // files
    paths = []
    for f in range(files):
        path = os.path.join(out_dir, f"zipf-{f:04d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        nd = min(per, n_docs - f * per)
        lens = rs.poisson(mean_len, nd).clip(5)
        total = int(lens.sum())
        ids = np.searchsorted(cdf, rs.rand(total))
        toks = words[ids]
        offs = np.concatenate(([0], np.cumsum(lens)))
        texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(nd)]
        urls = [f"https://z.test/{f * per + i:09d}" for i in range(nd)]
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
        }), tmp, row_group_size=max(1, nd))
        os.replace(tmp, path)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--vocab", type=int, default=50_000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    corpus_dir = f"/tmp/zipf_corpus_{args.docs}_{args.vocab}"
    paths = make_corpus(corpus_dir, args.docs, args.vocab)
    idx = f"/tmp/zipf_idx_{args.docs}_{args.vocab}"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = build_index(paths, idx, IndexConfig(num_shards=16,
                                                   hot_salts=8))
    build_sec = time.perf_counter() - t0

    s = Searcher(idx)
    # head / torso / tail query mix (ranks 0.., 1000.., 30000..)
    queries = [
        "w00000 w00001 w00002", "w01000 w01013 w01111",
        "w30000 w31234 w32222", "w00003 w02000 w40000",
    ]
    for q in queries:
        s.search(q, 10, with_urls=False)  # warm
    lats = []
    for _ in range(5):
        for q in queries:
            t = time.perf_counter()
            s.search(q, 10, with_urls=False)
            lats.append((time.perf_counter() - t) * 1000)
    print(json.dumps({
        "metric": "zipf-vocab build+query",
        "n_docs": manifest["corpus"]["n_docs"],
        "vocab_target": args.vocab,
        "postings": manifest["metrics"]["tokenize_postings"],
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(manifest["corpus"]["n_docs"] / build_sec, 1),
        "query_p50_warm_ms": round(sorted(lats)[len(lats) // 2], 2),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

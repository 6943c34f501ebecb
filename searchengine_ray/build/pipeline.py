"""Index build driver: corpus parquet → tokenized checkpoints → term
shards + manifest. Resumable, metered, Ray-Data-first.

Stage graph (cf. reference lifecycle ``indexer.py:21-62``, SURVEY §3.1,
re-expressed as Dataset pipelines):

1. plan fragments (parquet footers only) → deterministic doc ids
2. tokenize: ``map_batches(FragmentTokenizeTask, concurrency=actors)``
   over PENDING fragment descriptors; per-fragment atomic checkpoint
   (the resume unit — a rerun skips finished fragments)
3. corpus stats: Sum/Count/Min/Max over the ``dl`` column (replaces the
   reference's O(N) doc_length_normalization JSON footer,
   ``bm25.py:76-81``)
4. docmap: (doc_id, url) sorted by doc_id → parquet (reference
   ``indexer.py:40-53`` mapping file)
5. shard boundaries + hot-term detection from a deterministic sample
6. the term shuffle (merge.py) → shard parquet files
7. manifest.json: config, corpus stats, shard map, lineage, metrics
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa

from searchengine_ray.build.docids import Fragment, plan_fragments
from searchengine_ray.build.extract import (
    FragmentTokenizeTask,
    make_tokenizer,
    tokenized_checkpoint_path,
)
from searchengine_ray.build.merge import (
    ShardWriter,
    assign_gkey,
    exact_hot_df,
    explode_batch,
    sample_term_boundaries,
)
from searchengine_ray.config import IndexConfig, PostingType, RankerType

MANIFEST_NAME = "manifest.json"


def _fragments_to_table(frags: list[Fragment]) -> pa.Table:
    return pa.table(
        {
            "fragment_id": pa.array([f.fragment_id for f in frags], pa.int64()),
            "path": pa.array([f.path for f in frags], pa.string()),
            "row_groups": pa.array(
                [list(f.row_groups) for f in frags], pa.list_(pa.int32())
            ),
            "num_rows": pa.array([f.num_rows for f in frags], pa.int64()),
            "doc_offset": pa.array([f.doc_offset for f in frags], pa.int64()),
        }
    )


def build_index(
    input_paths: list[str] | str,
    out_dir: str,
    cfg: IndexConfig | None = None,
    *,
    id_column: str | None = None,
    text_column: str = "text",
    url_column: str | None = "url",
    overwrite: bool = False,
) -> dict:
    """Build a full index under ``out_dir``; returns the manifest dict.

    Idempotent/resumable: finished tokenize fragments and shard files
    are detected by their deterministic file names and skipped.
    """
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    cfg = cfg or IndexConfig()
    if overwrite and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    tok_dir = os.path.join(out_dir, "tokenized")
    shard_dir = os.path.join(out_dir, "shards")
    docmap_dir = os.path.join(out_dir, "docmap")
    metrics: dict = {}

    # -- 1. plan -----------------------------------------------------------
    frags = plan_fragments(input_paths)
    n_input_rows = sum(f.num_rows for f in frags)

    # -- 2. tokenize (per-fragment checkpoints) ----------------------------
    t0 = time.perf_counter()
    pending = [
        f for f in frags
        if not os.path.exists(tokenized_checkpoint_path(tok_dir, f.doc_offset))
    ]
    if pending:
        import ray as _ray

        n_cpus = int(_ray.cluster_resources().get("CPU", 4))
        concurrency = cfg.extract_concurrency or max(1, min(len(pending), n_cpus - 2))
        frag_ds = ray.data.from_arrow(_fragments_to_table(pending)).repartition(
            len(pending)
        )
        stats = frag_ds.map_batches(
            FragmentTokenizeTask,
            fn_constructor_kwargs=dict(
                cfg=cfg, out_dir=tok_dir, id_column=id_column,
                text_column=text_column, url_column=url_column,
            ),
            batch_size=1,
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        ).take_all()
        metrics["tokenize_postings"] = sum(
            r["postings"] for r in stats if r["postings"] >= 0
        )
    metrics["tokenize_sec"] = round(time.perf_counter() - t0, 3)
    metrics["tokenize_fragments"] = len(frags)
    metrics["tokenize_fragments_resumed"] = len(frags) - len(pending)

    # -- 3. corpus stats ---------------------------------------------------
    t0 = time.perf_counter()
    tok_cols = ["terms", "tfs", "doc_id", "dl"]
    if cfg.posting_type == PostingType.POSITIONAL:
        tok_cols.append("positions")
    if cfg.ranker in (RankerType.TF_IDF, RankerType.TF_IDF_OPTIMIZED):
        tok_cols.append("tf_weights")

    dl_ds = ray.data.read_parquet(tok_dir, columns=["dl"])
    agg = dl_ds.aggregate(Count(), Sum("dl"), Min("dl"), Max("dl"))
    n_docs = int(agg["count()"])
    total_dl = int(agg["sum(dl)"] or 0)
    avgdl = total_dl / n_docs if n_docs else 0.0
    # reference B4 needs global min/max of round(dl/avgdl,3) — monotonic in dl
    min_dldiv = round(int(agg["min(dl)"]) / avgdl, 3) if n_docs and avgdl else 0.0
    max_dldiv = round(int(agg["max(dl)"]) / avgdl, 3) if n_docs and avgdl else 0.0
    metrics["stats_sec"] = round(time.perf_counter() - t0, 3)

    # -- 4. docmap ---------------------------------------------------------
    t0 = time.perf_counter()
    if not os.path.isdir(docmap_dir) or overwrite or not os.listdir(docmap_dir):
        tmp_dir = docmap_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        (
            ray.data.read_parquet(tok_dir, columns=["doc_id", "url", "dl"])
            .sort("doc_id")
            .write_parquet(tmp_dir)
        )
        shutil.rmtree(docmap_dir, ignore_errors=True)
        os.replace(tmp_dir, docmap_dir)
    metrics["docmap_sec"] = round(time.perf_counter() - t0, 3)

    # -- 5. boundaries + skew ---------------------------------------------
    t0 = time.perf_counter()
    terms_ds = ray.data.read_parquet(tok_dir, columns=["terms"])
    boundaries, hot_salt_of = sample_term_boundaries(
        terms_ds, cfg.num_shards, hot_salts=cfg.hot_salts,
        hot_frac=cfg.hot_frac,
    )
    hot_df = exact_hot_df(terms_ds, list(hot_salt_of)) if hot_salt_of else {}
    metrics["boundaries_sec"] = round(time.perf_counter() - t0, 3)

    # -- 6. the term shuffle ----------------------------------------------
    t0 = time.perf_counter()
    tok_ds = ray.data.read_parquet(tok_dir, columns=tok_cols)
    postings = tok_ds.map_batches(explode_batch, batch_format="pyarrow")
    keyed = postings.map_batches(
        lambda b: assign_gkey(b, boundaries, hot_salt_of),
        batch_format="pyarrow",
    )
    writer = ShardWriter(shard_dir, cfg, n_docs, hot_df)

    def write_shard(group):
        return writer(group)

    shard_stats = (
        keyed.groupby("gkey")
        .map_groups(write_shard, batch_format="pyarrow")
        .take_all()
    )
    metrics["merge_sec"] = round(time.perf_counter() - t0, 3)
    total_postings = sum(r["n_postings"] for r in shard_stats if r["n_postings"] >= 0)
    metrics["merge_fan_in"] = len(frags)  # every fragment can feed every shard
    if metrics["merge_sec"] > 0:
        metrics["docs_per_sec"] = round(n_docs / max(
            1e-9, metrics["tokenize_sec"] + metrics["merge_sec"]), 1)
        metrics["postings_per_sec"] = round(
            total_postings / max(1e-9, metrics["merge_sec"]), 1)

    # -- 7. manifest -------------------------------------------------------
    manifest = {
        "version": 1,
        "config": cfg.to_manifest(),
        "tokenizer": make_tokenizer(cfg).config(),
        "corpus": {
            "n_docs": n_docs,
            "total_dl": total_dl,
            "avgdl": avgdl,
            "min_dldiv": min_dldiv,
            "max_dldiv": max_dldiv,
            "n_input_rows": n_input_rows,
        },
        "lineage": {
            "input": input_paths if isinstance(input_paths, list) else [input_paths],
            "fragments": [
                {"id": f.fragment_id, "path": f.path, "rows": f.num_rows,
                 "offset": f.doc_offset} for f in frags
            ],
            "stage_version": 1,
        },
        "boundaries": boundaries,
        "hot_df": hot_df,
        "hot_salt_of": hot_salt_of,
        "shards": [
            {"shard": int(r["shard"]), "salt": int(r["salt"]), "file": r["file"],
             "n_terms": int(r["n_terms"]), "n_postings": int(r["n_postings"])}
            for r in sorted(shard_stats, key=lambda r: (r["shard"], r["salt"]))
        ],
        "metrics": metrics,
    }
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return manifest


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        return json.load(f)

"""Index build driver: corpus parquet → tokenized checkpoints → term
shards + manifest. Resumable, metered, Ray-Data-first.

Stage graph (cf. reference lifecycle ``indexer.py:21-62``, SURVEY §3.1,
re-expressed as Dataset pipelines):

1. plan fragments (parquet footers only) → deterministic doc ids
2. boundary pre-sample: a cluster-size-independent stride of fragments
   → lexicographic shard boundaries + hot-term (salting) detection
3. the FUSED build wave: one task per fragment — tokenize → atomic
   checkpoint + stats sidecar → local aggregation → keyed spill (one
   row group per gkey). The fragment is the resume unit (north rule;
   the reference has none — ``spimi.py:273-275`` deletes its blocks).
4. corpus stats (N, avgdl, min/max dl) folded from the sidecars — no
   extra pass; replaces the reference's O(N) JSON footer
   (``bm25.py:76-81``). docmap/docstats are views of the checkpoints.
5. the reduce wave: one task per gkey-range reads its spill row groups
   by index → encoded term shards (merge.py).
6. manifest.json: config, corpus stats, boundaries, shard map,
   lineage, per-stage metrics.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow as pa

from searchengine_ray.build.docids import (
    Fragment,
    external_ids_fit_int32,
    plan_fragments,
)
from searchengine_ray.build.extract import (
    fragment_stats_path,
    make_fragment_build_fn,
    make_tokenizer,
    tokenized_checkpoint_path,
)
from searchengine_ray.build.merge import (
    ShardMergeTask,
    ShardWriter,
    SpillWriter,
    boundaries_from_sample,
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


def _presample_boundaries(
    frags: list[Fragment],
    cfg: IndexConfig,
    id_column: str | None,
    text_column: str,
    url_column: str | None,
    max_frags: int = 8,
    docs_per_frag: int = 1500,
):
    """Deterministic boundary/hot pre-sample: a stride of fragments,
    first ``docs_per_frag`` docs of each, tokenized with the real
    tokenizer, every k-th term kept. Independent of cluster size →
    identical boundaries at every parallelism level."""
    import ray.data

    from searchengine_ray.build.extract import TokenizeStage

    stride = max(1, len(frags) // max_frags)
    sampled = frags[::stride][:max_frags]

    def sample_fragment(batch: pa.Table) -> pa.Table:
        from searchengine_ray.build.docids import Fragment as F
        from searchengine_ray.build.docids import _read_fragment

        stage = TokenizeStage(cfg, text_column=text_column,
                              url_column=url_column)
        terms: list[str] = []
        for row in batch.to_pylist():
            frag = F(row["fragment_id"], row["path"],
                     tuple(row["row_groups"][:1]), row["num_rows"],
                     row["doc_offset"])
            (src,) = list(_read_fragment(frag, [text_column] if text_column
                                         else None, id_column))
            tok = stage(src.slice(0, docs_per_frag))
            import pyarrow.compute as pc

            flat = pc.list_flatten(tok["terms"])
            if len(flat):
                step = max(1, len(flat) // 2000)
                terms.extend(flat.combine_chunks()[::step].to_pylist())
        return pa.table({"term": pa.array(terms, pa.string())})

    rows = (
        ray.data.from_arrow(_fragments_to_table(sampled))
        .repartition(len(sampled))
        .map_batches(sample_fragment, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    return boundaries_from_sample(
        [r["term"] for r in rows], cfg.num_shards,
        hot_salts=cfg.hot_salts, hot_frac=cfg.hot_frac,
    )


BUILD_CONFIG_NAME = "build_config.json"


def _guard_resume_config(out_dir: str, cfg: IndexConfig,
                         id_column, text_column, url_column) -> None:
    """Write the build config next to the artifacts on first run; on a
    resume, refuse to proceed if it differs (checkpoints/shards carry no
    config in their names, so a mismatched resume would mix data from
    two configs — e.g. a tf_idf manifest over weightless BM25 shards)."""
    current = {
        "config": cfg.to_manifest(),
        "id_column": id_column,
        "text_column": text_column,
        "url_column": url_column,
    }
    path = os.path.join(out_dir, BUILD_CONFIG_NAME)
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        if existing != current:
            changed = sorted(
                k for k in set(existing) | set(current)
                if existing.get(k) != current.get(k)
            )
            raise ValueError(
                f"out_dir {out_dir!r} holds artifacts built with a "
                f"different config (differs in {changed}); pass "
                "overwrite=True or use a fresh out_dir"
            )
        return
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(current, f, indent=1)
    os.replace(tmp, path)


def _sync_spill_schema(spill_dir: str, doc32: bool) -> None:
    """Spill parquet schema depends on the doc32 narrowing decision,
    which is not part of the fragment-set key (a code upgrade or an
    id-domain change can flip it on an unchanged corpus). Record it in
    a marker file; on mismatch, purge the spill files (cheap — they
    regenerate from the tokenized checkpoints) so a resume never mixes
    int32/int64 spill schemas in the reduce."""
    os.makedirs(spill_dir, exist_ok=True)
    marker = os.path.join(spill_dir, "spill_schema.json")
    current = {"version": 1, "doc32": bool(doc32)}
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                existing = json.load(fh)
        except (OSError, json.JSONDecodeError):
            existing = None
        if existing == current:
            return
        for f in glob.glob(os.path.join(spill_dir, "*.parquet")):
            try:
                os.remove(f)
            except OSError:
                pass
    elif glob.glob(os.path.join(spill_dir, "*.parquet")):
        # pre-marker spills: schema unknown → purge once
        for f in glob.glob(os.path.join(spill_dir, "*.parquet")):
            try:
                os.remove(f)
            except OSError:
                pass
    tmp = marker + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(current, fh)
    os.replace(tmp, marker)


def _sync_fragment_set(out_dir, tok_dir, shard_dir, spill_dir, frags):
    """Record the planned fragment set in ``fragments.json``; when it
    differs from the previous build's, delete the shard/spill artifacts
    (stale: corpus stats changed) and prune checkpoints that belong to
    no current fragment (their doc ranges could overlap the new layout
    and poison the docmap)."""
    from searchengine_ray.build.extract import fragment_key

    keys = sorted(
        fragment_key(f.doc_offset, f.num_rows, f.path) for f in frags
    )
    path = os.path.join(out_dir, "fragments.json")
    prev = None
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
    if prev == keys:
        return
    if prev is not None:
        shutil.rmtree(shard_dir, ignore_errors=True)
        shutil.rmtree(spill_dir, ignore_errors=True)
        try:
            os.remove(os.path.join(out_dir, MANIFEST_NAME))
        except OSError:
            pass
        valid = set(keys)
        for d, suffix in ((tok_dir, ".parquet"),
                          (os.path.join(out_dir, "tokenized_stats"),
                           ".stats.json")):
            if os.path.isdir(d):
                for fn in os.listdir(d):
                    if fn.endswith(suffix) and \
                            fn[: -len(suffix)] not in valid:
                        try:
                            os.remove(os.path.join(d, fn))
                        except OSError:
                            pass
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(keys, fh)
    os.replace(tmp, path)


def build_index(
    input_paths: list[str] | str,
    out_dir: str,
    cfg: IndexConfig | None = None,
    *,
    id_column: str | None = None,
    text_column: str = "text",
    url_column: str | None = "url",
    overwrite: bool = False,
    consolidate_above: int = 512,
    consolidate_factor: int | None = None,
    target_rows_per_fragment: int = 250_000,
) -> dict:
    """Build a full index under ``out_dir``; returns the manifest dict.

    Idempotent/resumable: finished tokenize fragments and shard files
    are detected by their deterministic file names and skipped.
    """
    import ray.data

    cfg = cfg or IndexConfig()
    if cfg.posting_type == PostingType.BOOLEAN and \
            cfg.ranker != RankerType.RAW:
        raise ValueError(
            "boolean posting lists store doc ids only (no tf/dl payload) "
            "and cannot serve a scored ranker; build with ranker=RAW "
            "(the reference pairs its boolean index with the unscored "
            "boolean searcher)"
        )
    if overwrite and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # Resume artifacts (tokenized checkpoints, spill, shard files) are
    # keyed by doc extent, NOT by config — resuming into an out_dir built
    # with a DIFFERENT config would silently reuse stale data under a
    # manifest claiming the new config. Refuse loudly instead.
    _guard_resume_config(out_dir, cfg, id_column, text_column, url_column)
    tok_dir = os.path.join(out_dir, "tokenized")
    shard_dir = os.path.join(out_dir, "shards")
    spill_dir = os.path.join(out_dir, "spill")
    metrics: dict = {}
    # sweep partial .tmp files from a crashed run (publishes are atomic
    # renames, so anything still named .tmp* is garbage)
    for root in (tok_dir, shard_dir, os.path.join(out_dir, "spill"),
                 os.path.join(out_dir, "tokenized_stats")):
        if os.path.isdir(root):
            for f in os.listdir(root):
                if ".tmp" in f:
                    try:
                        os.remove(os.path.join(root, f))
                    except OSError:
                        pass

    # -- 1. plan -----------------------------------------------------------
    frags = plan_fragments(input_paths, target_rows_per_fragment)
    n_input_rows = sum(f.num_rows for f in frags)

    import ray as _ray

    n_cpus = int(_ray.cluster_resources().get("CPU", 4))
    # fragment-set guard: if the planned fragments differ from the last
    # build into this out_dir (input files added/removed/resized), the
    # SHARDS are stale (df/idf/N change with any corpus change) — wipe
    # them plus any stale checkpoints, but keep every still-valid
    # tokenized checkpoint: an APPEND resumes the expensive tokenize
    # work and re-runs only the cheap reduce.
    _sync_fragment_set(out_dir, tok_dir, shard_dir, spill_dir, frags)

    # narrow spill doc ids to int32 only when the ACTUAL id domain
    # fits: the row-count rule is valid only for self-assigned ids
    # (0..n-1); external id columns carry arbitrary int64 values, so
    # gate on parquet footer min/max statistics instead (ADVICE r03)
    doc32 = (
        n_input_rows < 2**31 if id_column is None
        else external_ids_fit_int32(frags, id_column)
    )
    # spill files are reused on resume, but their schema depends on
    # doc32 — purge spills written under a different schema so a
    # resumed/upgraded build never mixes list<int32>/list<int64>
    _sync_spill_schema(spill_dir, doc32)

    pending = [
        f for f in frags
        if not (
            os.path.exists(tokenized_checkpoint_path(
                tok_dir, f.doc_offset, f.num_rows, f.path))
            and os.path.exists(fragment_stats_path(
                tok_dir, f.doc_offset, f.num_rows, f.path))
        )
    ]

    # -- 2. shard boundaries + hot terms from a deterministic pre-sample --
    # (stride of fragments, first rows of each — independent of cluster
    # size, so boundaries are stable across runs and parallelism levels)
    t0 = time.perf_counter()
    boundaries, hot_salt_of = _presample_boundaries(
        frags, cfg, id_column, text_column, url_column
    )
    metrics["boundaries_sec"] = round(time.perf_counter() - t0, 3)

    # -- 3. the FUSED build wave: fragment → tokenize → checkpoint +
    # sidecar → local aggregation → spill (one row group per gkey).
    # One wave of tasks does all heavy compute; only stats return.
    t0 = time.perf_counter()
    frag_ds = ray.data.from_arrow(_fragments_to_table(frags)).repartition(
        len(frags)
    )
    spill_stats = frag_ds.map_batches(
        make_fragment_build_fn(
            cfg, tok_dir, spill_dir, boundaries, hot_salt_of,
            id_column=id_column, text_column=text_column,
            url_column=url_column,
            # one schema per build, final shards byte-identical;
            # decided above from the actual id domain
            doc32=doc32,
        ),
        batch_size=None,
        batch_format="pyarrow",
        num_cpus=1,
    ).take_all()
    metrics["tokenize_sec"] = round(time.perf_counter() - t0, 3)
    metrics["tokenize_fragments"] = len(frags)
    metrics["tokenize_fragments_resumed"] = len(frags) - len(pending)
    # per-phase worker-seconds summed over fragments (wall ≈ sum/cpus):
    # locates regressions inside the fused task without a profiler run
    for col, name in (("t_read", "read"), ("t_tok", "tokenize"),
                      ("t_ckpt", "checkpoint"), ("t_spill", "spill")):
        metrics[f"wave_{name}_cpu_sec"] = round(
            sum(r.get(col) or 0.0 for r in spill_stats), 3)

    # -- 4. corpus stats from the per-fragment sidecars (no extra pass).
    # Small builds fold serially; big builds fold with ONE distributed
    # wave that returns a single partial row per task (the promised
    # task-tree fold — the driver never opens 10^5 sidecar files).
    t0 = time.perf_counter()
    if len(frags) <= 2048:
        frag_stats = []
        for f in frags:
            with open(fragment_stats_path(
                    tok_dir, f.doc_offset, f.num_rows, f.path)) as fh:
                frag_stats.append(json.load(fh))
    else:
        def fold_sidecars(batch: pa.Table) -> pa.Table:
            docs = postings = sum_dl = 0
            min_dl, max_dl = None, None
            for row in batch.to_pylist():
                with open(fragment_stats_path(
                        tok_dir, row["doc_offset"], row["num_rows"],
                        row["path"])) as fh:
                    s = json.load(fh)
                docs += s["docs"]
                postings += s["postings"]
                sum_dl += s["sum_dl"]
                if s["docs"]:
                    min_dl = s["min_dl"] if min_dl is None \
                        else min(min_dl, s["min_dl"])
                    max_dl = s["max_dl"] if max_dl is None \
                        else max(max_dl, s["max_dl"])
            return pa.table({
                "docs": [docs], "postings": [postings], "sum_dl": [sum_dl],
                "min_dl": [min_dl if min_dl is not None else 0],
                "max_dl": [max_dl if max_dl is not None else 0],
            })

        frag_stats = ray.data.from_arrow(
            pa.table({
                "doc_offset": pa.array(
                    [f.doc_offset for f in frags], pa.int64()),
                "num_rows": pa.array(
                    [f.num_rows for f in frags], pa.int64()),
                "path": pa.array([f.path for f in frags], pa.string()),
            })
        ).repartition(n_cpus).map_batches(
            fold_sidecars, batch_format="pyarrow", batch_size=None,
            num_cpus=1,
        ).take_all()
    n_docs = sum(s["docs"] for s in frag_stats)
    total_dl = sum(s["sum_dl"] for s in frag_stats)
    total_postings = sum(s["postings"] for s in frag_stats)
    avgdl = total_dl / n_docs if n_docs else 0.0
    nonempty = [s for s in frag_stats if s["docs"]]
    # reference B4 needs global min/max of round(dl/avgdl,3) — monotonic in dl
    min_dldiv = round(min(s["min_dl"] for s in nonempty) / avgdl, 3) \
        if nonempty and avgdl else 0.0
    max_dldiv = round(max(s["max_dl"] for s in nonempty) / avgdl, 3) \
        if nonempty and avgdl else 0.0
    metrics["tokenize_postings"] = total_postings
    metrics["stats_sec"] = round(time.perf_counter() - t0, 3)

    # -- 5. docmap / docstats: no extra stage — doc_id→(url, dl) lookups
    # are served straight from the tokenized checkpoints (files are named
    # by doc-offset and internally doc-sorted, so the query side binary-
    # searches the fragment then column-prunes the read; reference
    # mapping file indexer.py:40-53 is subsumed).

    # -- 6. the reduce wave of the exchange --------------------------------
    t0 = time.perf_counter()
    # exact global dfs for salted terms, folded from the spill stats
    # (a salted term's records can't see their siblings at merge time)
    hot_df: dict[str, int] = {}
    for r in spill_stats:
        for t, d in zip(r["hot_terms"], r["hot_dfs"]):
            hot_df[t] = hot_df.get(t, 0) + int(d)
    n_spill_files = len(spill_stats)
    metrics["spill_files"] = n_spill_files

    # hierarchical spill consolidation: with >>10^3 fragments a gkey's
    # rows live in thousands of files; one extra wave cuts per-gkey
    # fan-in by ``consolidate_factor`` before any merge task runs
    if n_spill_files > consolidate_above:
        from searchengine_ray.build.merge import consolidate_spill_files

        files_sorted = sorted(r["file"] for r in spill_stats)
        # √n groups of √n files each: one wave suffices at any scale
        # (10^5 spill files → ~316 consolidated files, fan-in ~316)
        fac = consolidate_factor or max(8, min(256, int(
            n_spill_files ** 0.5 + 0.999)))
        groups = [files_sorted[i:i + fac]
                  for i in range(0, len(files_sorted), fac)]

        def consolidate(batch: pa.Table) -> pa.Table:
            outs = []
            for row in batch.to_pylist():
                out_path = os.path.join(
                    spill_dir,
                    f"consol-{row['group_id']:06d}-{len(row['files'])}.parquet",
                )
                outs.append(consolidate_spill_files(row["files"], out_path))
            return pa.concat_tables(outs)

        group_tbl = pa.table({
            "group_id": pa.array(range(len(groups)), pa.int64()),
            "files": pa.array(groups, pa.list_(pa.string())),
        })
        cons_stats = (
            ray.data.from_arrow(group_tbl)
            .repartition(len(groups))
            .map_batches(consolidate, batch_format="pyarrow",
                         batch_size=None, num_cpus=1)
            .take_all()
        )
        spill_index = [{"file": r["file"], "gkeys": r["gkeys"]}
                       for r in cons_stats]
        metrics["consolidate_waves"] = 1
    else:
        spill_index = spill_stats
    from searchengine_ray.build.merge import invert_spill_stats

    files_of_gkey = invert_spill_stats(spill_index)
    active_gkeys = sorted(files_of_gkey)
    metrics["spill_sec"] = round(time.perf_counter() - t0, 3)

    t1 = time.perf_counter()
    writer = ShardWriter(shard_dir, cfg, n_docs, hot_df)
    # each row carries exactly its own gkey's (file, row-group) list —
    # merge tasks ship/scan O(own fan-in), not O(all spill files)
    gkey_tbl = pa.table({
        "gkey": pa.array(active_gkeys, pa.int64()),
        "files": pa.array(
            [[f for f, _ in files_of_gkey[g]] for g in active_gkeys],
            pa.list_(pa.string()),
        ),
        "rgs": pa.array(
            [[i for _, i in files_of_gkey[g]] for g in active_gkeys],
            pa.list_(pa.int32()),
        ),
    })
    gkey_ds = ray.data.from_arrow(gkey_tbl).repartition(
        max(1, min(len(active_gkeys), n_cpus))
    )
    shard_stats = gkey_ds.map_batches(
        ShardMergeTask(writer),
        batch_format="pyarrow",
        batch_size=None,
        num_cpus=1,
    ).take_all()
    metrics["reduce_sec"] = round(time.perf_counter() - t1, 3)
    metrics["merge_sec"] = round(time.perf_counter() - t0, 3)
    total_postings = sum(r["n_postings"] for r in shard_stats if r["n_postings"] >= 0)
    metrics["merge_fan_in"] = max(
        (len(v) for v in files_of_gkey.values()), default=0
    )  # max spill files any one merge task reads
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
    # build complete → drop the spill exchange (reference deletes its
    # block files on success too, spimi.py:273-275; an interrupted build
    # keeps them as the resume point)
    shutil.rmtree(spill_dir, ignore_errors=True)
    return manifest


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        return json.load(f)

"""JSONL / JSONL.gz source — the lingua franca of web-text corpora
(one JSON object per line: Common Crawl derivatives, Dolma, RedPajama
dumps). The reference engine ingests gzip-TSV only (parser.py); this
adds the format a webtext user actually arrives with.

Parsing is VECTORIZED: each file is decompressed as a stream and
handed to ``pyarrow.json.read_json`` (C++ NDJSON parser) — no
json.loads per row. Gzip streams are not splittable, so one Ray task
reads one file (the tsv.py convention); shard your corpus into many
files for parallelism, as every large corpus already is.

Doc ids are deterministic WITHOUT a counting pass:
``doc_id = file_index << 40 | row_index`` (unique for < 2^40 rows per
file and < 2^23 files) — unlike tsv.py, there is no reference
insertion-counter to reproduce, and ``build_index`` re-assigns its own
contiguous ids from parquet order anyway.
"""

from __future__ import annotations

import gzip

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj

_FILE_SHIFT = 40


def _read_one(path: str) -> pa.Table:
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return pj.read_json(f)
    return pj.read_json(path)


def read_jsonl_corpus(
    paths: list[str],
    text_fields: list[str],
    url_field: str = "url",
):
    """→ ray Dataset (doc_id:int64, url:string, text:string): each
    line's ``text_fields`` joined with a single space (missing/null
    fields become empty), ``url_field`` carried through (empty when
    absent)."""
    import ray.data

    paths = sorted(paths)
    items = [{"path": p, "fidx": i} for i, p in enumerate(paths)]

    def read_file(batch: pa.Table):
        for row in batch.to_pylist():
            t = _read_one(row["path"])
            n = t.num_rows
            parts = []
            for f in text_fields:
                col = (t[f] if f in t.column_names
                       else pa.nulls(n, pa.string()))
                parts.append(pc.fill_null(pc.cast(col, pa.string()), ""))
            text = parts[0] if len(parts) == 1 else \
                pc.binary_join_element_wise(*parts, " ")
            url = (pc.fill_null(pc.cast(t[url_field], pa.string()), "")
                   if url_field in t.column_names
                   else pa.array([""] * n, pa.string()))
            base = row["fidx"] << _FILE_SHIFT
            yield pa.table({
                "doc_id": pa.array(
                    base + pa.array(range(n), pa.int64()).to_numpy(),
                    pa.int64()),
                "url": url,
                "text": text,
            })

    return (
        ray.data.from_items(items)
        .repartition(max(len(items), 1))
        .map_batches(read_file, batch_size=None, batch_format="pyarrow")
    )


def jsonl_to_pages_parquet(
    paths: list[str],
    out_dir: str,
    text_fields: list[str],
    url_field: str = "url",
) -> list[str]:
    """JSONL(.gz) corpus → parquet pages directory ready for
    ``build_index``. Returns the written parquet paths."""
    import glob
    import os

    read_jsonl_corpus(paths, text_fields, url_field).write_parquet(out_dir)
    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))

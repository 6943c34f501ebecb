"""Gzip-TSV conformance source — the reference's input format
(Amazon-review TSVs read via ``csv.DictReader`` over
``gzip.open(rt, utf-8)``, reference ``parser.py:36-51``).

Per-row semantics kept EXACTLY (csv-module quoting, selected columns
joined with a single space in FILE COLUMN ORDER, ``None`` fields
skipped) by using the csv module itself inside each read task — row
parity beats vectorization for this compatibility path; the primary
web-scale input is the parquet pages corpus (`sources/pages.py`).

One Ray task per file (gzip streams aren't splittable); doc_ids are
assigned per file from a prefix sum of row counts — requires one
counting pass per file at plan time (cheap relative to tokenize, and
only for this legacy format).
"""

from __future__ import annotations

import csv
import gzip
import sys

import pyarrow as pa


def _count_rows(path: str) -> int:
    with gzip.open(path, "rt", encoding="utf-8") as f:
        n = sum(1 for _ in csv.DictReader(f, delimiter="\t"))
    return n


def parse_tsv_rows(path: str, doc_id_column: str, columns: list[str],
                   delimiter: str = "\t"):
    """Reference-exact row generator: (ext_id, text)."""
    csv.field_size_limit(sys.maxsize)
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for row in csv.DictReader(f, delimiter=delimiter):
            values = " ".join(
                [row[k] for k in row.keys() if k in columns and row[k] is not None]
            )
            yield (row[doc_id_column], values)


def read_tsv_corpus(
    paths: list[str],
    doc_id_column: str,
    columns: list[str],
    delimiter: str = "\t",
    batch_rows: int = 20_000,
):
    """→ ray Dataset (doc_id:int64, url:string=external id, text) with
    deterministic sequential doc ids matching the reference's insertion
    counter (``indexer.py:39,51-53``)."""
    import ray.data

    paths = sorted(paths)
    offsets = []
    off = 0
    for p in paths:
        offsets.append(off)
        off += _count_rows(p)

    items = [
        {"path": p, "offset": o, "doc_id_column": doc_id_column,
         "columns": list(columns), "delimiter": delimiter}
        for p, o in zip(paths, offsets)
    ]

    def read_file(batch: pa.Table):
        for row in batch.to_pylist():
            ids, urls, texts = [], [], []
            doc_id = row["offset"]
            for ext_id, text in parse_tsv_rows(
                row["path"], row["doc_id_column"], row["columns"],
                row["delimiter"],
            ):
                ids.append(doc_id)
                urls.append(ext_id)
                texts.append(text)
                doc_id += 1
                if len(ids) >= batch_rows:
                    yield pa.table({
                        "doc_id": pa.array(ids, pa.int64()),
                        "url": pa.array(urls, pa.string()),
                        "text": pa.array(texts, pa.large_string()),
                    })
                    ids, urls, texts = [], [], []
            if ids:
                yield pa.table({
                    "doc_id": pa.array(ids, pa.int64()),
                    "url": pa.array(urls, pa.string()),
                    "text": pa.array(texts, pa.large_string()),
                })

    return (
        ray.data.from_items(items)
        .repartition(len(items))
        .map_batches(read_file, batch_size=None, batch_format="pyarrow")
    )


def tsv_to_pages_parquet(
    paths: list[str],
    out_dir: str,
    doc_id_column: str,
    columns: list[str],
    delimiter: str = "\t",
) -> list[str]:
    """Gzip-TSV corpus → parquet pages directory ready for
    ``build_index`` (the reference's ingest path, end to end: its
    Amazon-review TSVs become an indexable Ray corpus in one call).
    Returns the written parquet paths."""
    ds = read_tsv_corpus(paths, doc_id_column, columns, delimiter)
    ds.write_parquet(out_dir)
    import glob
    import os

    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))

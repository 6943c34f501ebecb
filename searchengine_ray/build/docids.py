"""Deterministic doc-id assignment without a serial counter.

The reference assigns sequential internal ids with a single-process
counter (``indexer.py:39,51-53``) — inherently serial. Here the id is a
pure function of the input layout: fragments (parquet row groups) are
enumerated in sorted-file order, their row counts come from parquet
footers (cheap metadata reads), and a prefix sum gives each fragment a
fixed offset:

    doc_id = fragment_offset + row_index_within_fragment

Stable across cluster sizes, resumes, and retries (SURVEY.md §7.8).
The fragment is also the checkpoint/resume unit of the build.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask


@dataclass(frozen=True)
class Fragment:
    """One deterministic unit of input: a contiguous row-group range of
    one parquet file, with its global doc-id offset."""

    fragment_id: int
    path: str
    row_groups: tuple[int, ...]
    num_rows: int
    doc_offset: int


def plan_fragments(
    paths: list[str] | str,
    target_rows_per_fragment: int = 250_000,
) -> list[Fragment]:
    """Enumerate fragments from parquet footers only (no data read).

    Row groups of a file are packed greedily into fragments of up to
    ``target_rows_per_fragment`` rows; files are visited in sorted path
    order so offsets are reproducible.
    """
    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(glob.glob(os.path.join(paths, "*.parquet")))
        else:
            files = [paths]
    else:
        files = sorted(paths)
    frags: list[Fragment] = []
    offset = 0
    fid = 0
    for f in files:
        meta = pq.read_metadata(f)
        rg_sizes = [meta.row_group(i).num_rows for i in range(meta.num_row_groups)]
        cur: list[int] = []
        cur_rows = 0
        for i, n in enumerate(rg_sizes):
            cur.append(i)
            cur_rows += n
            if cur_rows >= target_rows_per_fragment:
                frags.append(Fragment(fid, f, tuple(cur), cur_rows, offset))
                offset += cur_rows
                fid += 1
                cur, cur_rows = [], 0
        if cur:
            frags.append(Fragment(fid, f, tuple(cur), cur_rows, offset))
            offset += cur_rows
            fid += 1
    return frags


def _read_fragment(frag: Fragment, columns: list[str] | None, id_column: str | None):
    """Read one fragment, yielding Arrow tables with a ``doc_id`` column.

    With ``id_column`` set, the corpus brings its own unique int64 id
    (e.g. the testdata ``documents.doc_id``) which is renamed/copied to
    ``doc_id``; otherwise ids are ``doc_offset + row_index``.
    """
    pf = pq.ParquetFile(frag.path)
    read_cols = columns
    if read_cols is not None and id_column is not None and id_column not in read_cols:
        read_cols = list(read_cols) + [id_column]
    row = frag.doc_offset
    tbl = pf.read_row_groups(list(frag.row_groups), columns=read_cols)
    if id_column is not None:
        ids = tbl[id_column].cast(pa.int64())
        if id_column != "doc_id":
            tbl = tbl.drop_columns([id_column])
    else:
        ids = pa.array(range(row, row + tbl.num_rows), pa.int64())
    if "doc_id" in tbl.column_names:
        tbl = tbl.drop_columns(["doc_id"])
    yield tbl.add_column(0, "doc_id", ids)


class CorpusDatasource(Datasource):
    """Ray Data datasource over planned fragments: one read task per
    fragment, each yielding exactly one block whose first column is the
    deterministic ``doc_id``. Blocks therefore line up 1:1 with
    checkpoint partitions downstream."""

    def __init__(
        self,
        fragments: list[Fragment],
        columns: list[str] | None = None,
        id_column: str | None = None,
    ):
        self._fragments = fragments
        self._columns = columns
        self._id_column = id_column

    def estimate_inmemory_data_size(self):
        return None

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        tasks = []
        for frag in self._fragments:
            meta = BlockMetadata(
                num_rows=frag.num_rows,
                size_bytes=None,
                exec_stats=None,
                input_files=[frag.path],
            )
            tasks.append(
                ReadTask(
                    lambda f=frag: _read_fragment(f, self._columns, self._id_column),
                    meta,
                )
            )
        return tasks


def read_corpus(
    paths: list[str] | str,
    columns: list[str] | None = None,
    id_column: str | None = None,
    fragments: list[Fragment] | None = None,
):
    """→ ray.data.Dataset with a deterministic ``doc_id`` first column."""
    import ray.data

    frags = fragments if fragments is not None else plan_fragments(paths)
    return ray.data.read_datasource(
        CorpusDatasource(frags, columns=columns, id_column=id_column)
    )


def external_ids_fit_int32(frags: list[Fragment], id_column: str) -> bool:
    """Footer-statistics check that every external doc id in the planned
    fragments fits int32 (metadata only — no data read). With
    ``id_column`` set, ids are arbitrary corpus values (hash/snowflake
    ids), so the build's row-count rule says nothing about their
    domain; this gates the int32 spill narrowing on the ACTUAL id
    range. Any row group missing min/max statistics disables the
    narrowing (safe wide default)."""
    lo, hi = -(2**31), 2**31 - 1
    meta_cache: dict[str, object] = {}
    for frag in frags:
        md = meta_cache.get(frag.path)
        if md is None:
            md = pq.ParquetFile(frag.path).metadata
            meta_cache[frag.path] = md
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        try:
            ci = names.index(id_column)
        except ValueError:
            return False
        for rg in frag.row_groups:
            st = md.row_group(rg).column(ci).statistics
            if (st is None or not st.has_min_max
                    or not isinstance(st.min, int)
                    or not isinstance(st.max, int)):
                return False
            if st.min < lo or st.max > hi:
                return False
    return True

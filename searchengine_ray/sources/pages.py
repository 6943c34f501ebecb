"""Synthetic Common-Crawl-style ``pages`` table (BASELINE.json input_hint:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``).

Deterministically derived from the driver-generated ``documents`` table
(``/root/testdata/sf*/documents.parquet``) — no external data, seed-free
(content-addressed). The reference consumed gzip-TSV Amazon reviews
(``parser.py:36-51``); the rebuild's primary input is this pages shape.

``text`` is the per-row invariant field: ``title + " " + body`` where the
title is the first words of the document text — byte-identical per url on
every regeneration (the north rule's extractor invariant).
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH_US = 1_609_459_200_000_000  # 2021-01-01T00:00:00Z in µs — fixed, no wall clock


def _title_of(text: str) -> str:
    return " ".join(text.split(" ")[:4])


def pages_table_from_documents(doc_table: pa.Table) -> pa.Table:
    """Map documents(doc_id,text,lang,source,n_chars) → pages (deterministic)."""
    doc_ids = doc_table["doc_id"].to_pylist()
    texts = doc_table["text"].to_pylist()
    langs = doc_table["lang"].to_pylist()
    sources = doc_table["source"].to_pylist()

    urls, tss, htmls, out_texts = [], [], [], []
    for doc_id, text, source in zip(doc_ids, texts, sources):
        title = _title_of(text)
        body = text
        urls.append(f"https://{source}.example.test/doc/{doc_id:010d}")
        tss.append(_EPOCH_US + doc_id * 1_000_000)
        htmls.append(
            b"<html><head><title>" + title.encode() + b"</title></head><body><p>"
            + body.encode() + b"</p></body></html>"
        )
        out_texts.append(title + " " + body)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def materialize_pages(sf_dir: str, out_dir: str, files: int = 8) -> list[str]:
    """Write the deterministic pages table for ``sf_dir`` as ``files``
    parquet fragments (multiple fragments → real partition/resume paths).
    Idempotent: skips files that already exist. Returns sorted paths."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    doc_table = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    pages = pages_table_from_documents(doc_table)
    n = pages.num_rows
    files = max(1, min(files, n))
    per = (n + files - 1) // files
    paths = []
    for i in range(files):
        p = out / f"pages-{i:05d}.parquet"
        paths.append(str(p))
        if p.exists():
            continue
        chunk = pages.slice(i * per, per)
        tmp = str(p) + ".tmp"
        pq.write_table(chunk, tmp, row_group_size=2500)
        os.replace(tmp, p)  # atomic publish
    return sorted(paths)


def materialize_bench_corpus(
    sf_dir: str, out_dir: str, replicas: int = 20, replicas_per_file: int = 4
) -> list[str]:
    """Deterministic inflated bench corpus: the sf pages table replicated
    ``replicas`` times with unique urls (`?r=N`) — sized so index-build
    throughput dominates fixed pipeline overheads at bench scale.
    Idempotent per (sf_dir, replicas)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    doc_table = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    base = pages_table_from_documents(doc_table)
    paths = []
    for r0 in range(0, replicas, replicas_per_file):
        p = out / f"pages-r{r0:04d}.parquet"
        paths.append(str(p))
        if p.exists():
            continue
        chunks = []
        for r in range(r0, min(r0 + replicas_per_file, replicas)):
            urls = pa.array(
                [f"{u}?r={r}" for u in base["url"].to_pylist()], pa.string()
            )
            chunks.append(base.set_column(0, "url", urls))
        tbl = pa.concat_tables(chunks)
        tmp = str(p) + ".tmp"
        # one row group per replica so plan_fragments can split files
        # into balanced sub-file fragments (row groups are the smallest
        # schedulable read unit)
        pq.write_table(tbl, tmp, row_group_size=base.num_rows)
        os.replace(tmp, p)
    return sorted(paths)


def linked_pages_batch(batch: pa.Table, n_docs: int,
                       links_per_doc: int = 3,
                       n_hosts: int = 16,
                       rich_anchors: bool = False) -> pa.Table:
    """documents(doc_id) batch → linked pages (url, html): doc ``d``
    lives on host ``src{d % n_hosts}.example.test`` and anchors to docs
    ``t_j = (31·d + 7·j + 1) % n_docs`` (j < links_per_doc) on THEIR
    arithmetic hosts — a deterministic, sf-independent link fixture for
    the graph operators, mirrored verbatim by
    ``oracles.sql_linked_pages()``. Host self-links arise whenever
    ``t_j ≡ d (mod n_hosts)`` and exercise ``host_edges``' drop_self.
    ``rich_anchors`` swaps the constant anchor label for a varied,
    deterministic one (``ref {t} link{j}``) so anchor-TEXT operators
    get a non-trivial term distribution."""
    ids = batch["doc_id"].to_pylist()
    urls, htmls = [], []
    for d in ids:
        urls.append(f"https://src{d % n_hosts}.example.test/doc/{d:010d}")
        anchors = "".join(
            f'<a href="https://src{t % n_hosts}.example.test'
            f'/doc/{t:010d}">'
            + (f"ref {t} link{j}" if rich_anchors else "l") + "</a>"
            for j, t in ((j, (31 * d + 7 * j + 1) % n_docs)
                         for j in range(links_per_doc)))
        htmls.append(f"<html><head><title>doc {d}</title></head>"
                     f"<body>{anchors}</body></html>".encode())
    return pa.table({"url": pa.array(urls, pa.string()),
                     "html": pa.array(htmls, pa.binary())})


def unit_pages() -> pa.Table:
    """Tiny handcrafted corpus covering the FIXTURES.md nasty cases:
    ASCII punctuation, Unicode words, literal tabs/newlines, short tokens,
    stop words, stemmable families, repeated terms, a head term in ~all
    docs ('game')."""
    rows = [
        ("https://a.test/0", "good old games games game"),
        ("https://a.test/1", "the gaming GAMER plays games\tand-wins"),
        ("https://a.test/2", "naïve café résumé game\nnew lines"),
        ("https://a.test/3", "caresses ponies ties cats games, games; games!"),
        ("https://a.test/4", "a ab abc this is a stop word test game"),
        ("https://a.test/5", "it's the player's game_board -- truly"),
    ]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [_EPOCH_US + i for i in range(len(rows))], pa.timestamp("us")
            ),
            "html": pa.array(
                [b"<html><body>" + r[1].encode() + b"</body></html>" for r in rows],
                pa.binary(),
            ),
            "text": pa.array([r[1] for r in rows], pa.large_string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )

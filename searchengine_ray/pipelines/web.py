"""Web-metadata curation: URL canonicalization and HTML title
extraction — the normalize-before-dedup steps a crawl pipeline runs
first. Everything is vectorized RE2 kernels (pyarrow.compute uses RE2,
DuckDB's regexp_* too — identical semantics, the same shared-pattern
discipline as the PII op), so both ops are value-exact verifiable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# canonicalization chain — ORDER MATTERS and is mirrored verbatim in
# the SQL oracle (oracles.sql_canonical_url). The scheme+authority is
# lowercased FIRST (path/query stay case-sensitive) so every later
# rule sees a normal-form prefix:
#  1. lowercase the scheme+authority
#  2. strip the fragment
#  3. drop utm_* tracking params (mid-query, first-with-more, trailing)
#  4. strip default ports (:443 https, :80 http)
#  5. strip a leading www.
#  6. strip ONE trailing slash on non-root paths
_CHAIN: list[tuple[str, str]] = [
    (r"#.*$", ""),
    (r"&utm_[^&]*", ""),
    (r"\?utm_[^&]*&", "?"),
    (r"\?utm_[^&]*$", ""),
    (r"^(https://[^/:?#]*):443(/|\?|$)", r"\1\2"),
    (r"^(http://[^/:?#]*):80(/|\?|$)", r"\1\2"),
    (r"^(https?://)www\.", r"\1"),
    (r"^(https?://[^/]+/.+?)/$", r"\1"),
]
_AUTH = r"^(?P<a>[hH][tT][tT][pP][sS]?://[^/?#]*)"


def canonical_url_batch(batch: pa.Table,
                        url_col: str = "url") -> pa.Table:
    u = batch[url_col]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    auth = pc.extract_regex(u, _AUTH + r"(?P<rest>.*)$")
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(auth, "a")),
        pc.struct_field(auth, "rest"), "")
    # non-http(s) strings pass through unchanged (extract gives null)
    u = pc.coalesce(lowered, u)
    for pat, rep in _CHAIN:
        u = pc.replace_substring_regex(u, pattern=pat, replacement=rep)
    cols = {n: batch[n] for n in batch.column_names}
    cols["canonical_url"] = u
    return pa.table(cols)


def extract_title_batch(batch: pa.Table,
                        html_col: str = "html") -> pa.Table:
    h = batch[html_col]
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    s = h.cast(pa.string())           # payloads are utf-8 html
    m = pc.extract_regex(s, r"<title>(?P<t>.*?)</title>")
    title = pc.coalesce(pc.struct_field(m, "t"), "")
    cols = {n: batch[n] for n in batch.column_names if n != html_col}
    cols["title"] = title
    cols["title_chars"] = pc.utf8_length(title).cast(pa.int64())
    return pa.table(cols)


def canonical_urls(ds, url_col: str = "url"):
    """→ Dataset with a ``canonical_url`` column appended (doc-local,
    shuffle-free; feed into exact_dedup keyed on it for URL dedup)."""
    return ds.map_batches(canonical_url_batch,
                          fn_kwargs={"url_col": url_col},
                          batch_format="pyarrow")


def url_dedup(ds, url_col: str = "url", id_col: str = "doc_id"):
    """→ Dataset (canonical_url, doc_id, n_dups): one winner per
    CANONICAL url (lowest id; n_dups = multiplicity) — crawl dedup by
    canonical URL, the composition the canonicalizer exists for. ONE
    keyed shuffle; the shuffle rows are (canonical_url, id) only."""
    from ray.data.aggregate import Count, Min

    canon = ds.map_batches(
        canonical_url_batch, fn_kwargs={"url_col": url_col},
        batch_format="pyarrow",
    ).map_batches(
        lambda b: b.select(["canonical_url", id_col]),
        batch_format="pyarrow",
    )
    agg = canon.groupby("canonical_url").aggregate(
        Min(id_col), Count())

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "canonical_url": b["canonical_url"],
            "doc_id": b[f"min({id_col})"].cast(pa.int64()),
            "n_dups": b["count()"].cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


_HOST = r"^[hH][tT][tT][pP][sS]?://(?P<h>[^/:?#]+)"


def host_stats(ds, url_col: str = "url", bytes_col: str = "html"):
    """→ Dataset (host, n_docs, total_bytes): per-host doc counts and
    payload volume — the crawl-monitoring rollup. Host extraction is
    one RE2 kernel; ONE keyed aggregate over (host, bytes) rows (host
    cardinality is web-bounded, not corpus-bounded)."""
    from ray.data.aggregate import Count, Sum

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b[url_col], _HOST)
        host = pc.utf8_lower(pc.coalesce(pc.struct_field(m, "h"), ""))
        nb = pc.fill_null(
            pc.binary_length(b[bytes_col]).cast(pa.int64()), 0)
        return pa.table({"host": host, "nb": nb})

    agg = ds.map_batches(extract, batch_format="pyarrow") \
        .groupby("host").aggregate(Count(), Sum("nb"))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "host": b["host"],
            "n_docs": b["count()"].cast(pa.int64()),
            "total_bytes": b["sum(nb)"].cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def url_blocklist_filter(ds, patterns: list[str],
                         url_col: str = "url"):
    """→ Dataset of rows whose url matches NO blocklist RE2 pattern —
    the domain/path denylist step of crawl curation. Patterns are
    OR-folded per batch (shuffle-free); the list ships in the task
    closure and must be driver-bounded (a denylist, not a corpus)."""
    pats = list(patterns)
    if not pats:
        raise ValueError("empty blocklist — nothing to filter")

    def keep(b: pa.Table) -> pa.Table:
        bad = None
        for p in pats:
            m = pc.match_substring_regex(b[url_col], p)
            bad = m if bad is None else pc.or_(bad, m)
        return b.filter(pc.invert(bad))

    return ds.map_batches(keep, batch_format="pyarrow")


def extract_titles(ds, html_col: str = "html"):
    """→ Dataset (…, title, title_chars) with the html payload dropped
    (metadata extraction, project-early)."""
    return ds.map_batches(extract_title_batch,
                          fn_kwargs={"html_col": html_col},
                          batch_format="pyarrow")

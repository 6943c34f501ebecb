"""Explicit Arrow schemas for every table crossing a stage boundary.

The reference has no schema system (types implicit in hand-rolled text
formats — SURVEY.md §1); here every boundary is a typed Arrow schema.
"""

import pyarrow as pa

# Primary input (BASELINE.json input_hint): Common-Crawl-style pages.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

# Pages after deterministic doc-id assignment (build/docids.py).
PAGES_WITH_ID = PAGES.insert(0, pa.field("doc_id", pa.int64()))

# Raw postings emitted by the extract stage (SPIMI block rows).
POSTINGS = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
        ("positions", pa.list_(pa.int32())),
        ("tf_weight", pa.float64()),  # TF-IDF doc-side stored weight (M9)
    ]
)

# Per-document scalar columns of the tokenized checkpoint — these ARE
# the docmap/docstats tables (served by fragment-pruned reads; no
# separate stage writes them).
DOCS = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("dl", pa.int32()),
    ]
)

# Merged per-term shard record (index at rest).
TERM_RECORD = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),          # 0 normally; >0 = doc-range sub-list of a hot term
        ("df", pa.int64()),
        ("idf", pa.float64()),         # round(ln(N/df),3) — bm25.py:105-106
        ("n", pa.int64()),             # postings in this record
        ("docs_enc", pa.binary()),
        ("tfs_enc", pa.binary()),
        ("dls_enc", pa.binary()),
        ("weights", pa.list_(pa.float64())),   # TF-IDF stored weights (empty unless tf_idf)
        ("positions_enc", pa.binary()),        # empty unless positional
        ("skip_docs", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
    ]
)

TOPK_RESULT = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("score", pa.float64()),
    ]
)

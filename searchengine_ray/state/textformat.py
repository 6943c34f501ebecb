"""Reference on-disk text grammars (SURVEY Appendix A) as debug /
golden-dump formatters — the Ray index stores Parquet, but conformance
tests and human inspection want the reference's exact line formats:

    boolean      := term " " doc (" " doc)*
    frequency    := term " " doc ":" tf …          (BM25)
    freq+weight  := term " " doc ":" tf "/" w …    (TF_IDF, w=round(·,3))
    positional   := term " " doc ":" p ("," p)* …  (+ "/" w for TF_IDF_OPT)
    tiny         := term " " idf

Serializers mirror ``frequency_posting_list.py:48-52``,
``positional_posting_list.py:50-54``, ``tf_idf.py:114-118``,
``td_idf_positional.py:133-134``; parsers are their inverses.
"""

from __future__ import annotations

from searchengine_ray.config import PostingType, RankerType
from searchengine_ray.query.postings import PostingsRec


def term_line(rec: PostingsRec, posting_type: PostingType,
              ranker: RankerType) -> str:
    """One index-file line for a term (reference ``spimi.py:230``)."""
    weighted = ranker in (RankerType.TF_IDF, RankerType.TF_IDF_OPTIMIZED)
    parts = []
    for i, doc in enumerate(rec.doc_ids.tolist()):
        if posting_type == PostingType.BOOLEAN:
            parts.append(str(doc))
            continue
        if posting_type == PostingType.POSITIONAL:
            body = ",".join(str(p) for p in rec.positions[i])
        else:
            body = str(int(rec.tfs[i]))
        if weighted and rec.weights is not None:
            body += f"/{round(float(rec.weights[i]), 3)}"
        parts.append(f"{doc}:{body}")
    return f"{rec.term} " + " ".join(parts)


def tiny_line(rec: PostingsRec) -> str:
    """Tiny-file line (``spimi.py:234-236``): term + idf."""
    return f"{rec.term} {rec.idf}"


def parse_term_line(line: str, posting_type: PostingType,
                    weighted: bool = False) -> dict:
    """Inverse of ``term_line`` → {term, docs, tfs|positions, weights}.
    Accepts the optional ``#idf`` suffix the reference TF-IDF loaders
    handle (``tf_idf.py:128-132``)."""
    term, rest = line.split(" ", 1)
    idf = None
    if "#" in rest:
        rest, idf_s = rest.rsplit("#", 1)
        idf = float(idf_s)
        rest = rest.rstrip()
    docs, tfs, positions, weights = [], [], [], []
    for posting in rest.split(" "):
        if posting_type == PostingType.BOOLEAN:
            docs.append(int(posting))
            continue
        head, _, body = posting.partition(":")
        docs.append(int(head))
        if weighted:
            body, _, w = body.rpartition("/")
            weights.append(float(w))
        if posting_type == PostingType.POSITIONAL:
            positions.append([int(p) for p in body.split(",")])
        else:
            tfs.append(int(body))
    out = {"term": term, "docs": docs, "idf": idf}
    if posting_type == PostingType.POSITIONAL:
        out["positions"] = positions
    else:
        out["tfs"] = tfs
    if weighted:
        out["weights"] = weights
    return out


def dump_index_lines(searcher, terms: list[str]) -> list[str]:
    """Golden-dump: the reference-format lines for ``terms`` from a Ray
    index (sorted by term, like the merged index file)."""
    cfg = searcher.cfg
    recs = searcher.reader.fetch(terms)
    lines = []
    for t in sorted(recs):
        rec = recs[t]
        if rec is not None:
            lines.append(term_line(rec, cfg.posting_type, cfg.ranker))
    return lines

"""Boolean expression queries: ``(fast OR spark) AND merge NOT join``.

The reference engine's boolean postings answer bag-of-terms queries
only (raw ranker); this adds the classic boolean retrieval operators
(Manning/Raghavan/Schütze IR ch. 1) on top of the same index:

- grammar (case-sensitive keywords):
    expr := and_expr ('OR' and_expr)*
    and_expr := unary (('AND' | 'NOT')? unary)*   # juxtaposition = AND,
                                                  # 'a NOT b' = a AND NOT b
    unary := 'NOT' unary | '(' expr ')' | term
  terms run through the index's own tokenizer (stem/stop/minlen); a
  term that tokenizes to several tokens becomes their AND; a term that
  tokenizes to nothing (e.g. a stop word) matches nothing.

- index-side evaluation (``evaluate_index`` / Searcher.search_boolean_expr):
  posting doc-id arrays are sorted+unique, so AND/OR/NOT are
  np.intersect1d / union1d / setdiff1d. A top-level NOT needs the doc
  universe — read once from the docmap fragments and cached; at
  10^12 docs a complement is inherently corpus-sized, so prefer
  'a NOT b' (difference) forms, which never materialize the universe
  unless a branch is a bare negation.

- corpus-side evaluation (``boolean_search``): doc-local membership
  bitmaps per distinct term (one vectorized index_in pass), combined
  with numpy logical ops — one shuffle-free map_batches; the SQL twin
  (``to_sql_condition``) is generated from the same AST so the oracle
  and the engine cannot drift.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r'"[^"]*"|\(|\)|[^\s()]+')
_WORD_NORM_RE = re.compile(r"[^\w\s]")
_NEAR_RE = re.compile(r"^NEAR/(\d+)$")


def _phrase_words(raw: str) -> tuple[str, ...]:
    """Normalize a quoted phrase body with the simple-token rules the
    corpus-side evaluators use (punct→space, lower, min length 2), so
    the engine's and the oracle's phrase words are the same."""
    return tuple(w for w in _WORD_NORM_RE.sub(" ", raw).lower().split()
                 if len(w) >= 2)


class BoolParseError(ValueError):
    pass


def parse(expr: str):
    """→ AST of ('term', str) | ('and'|'or', l, r) | ('not', x)."""
    toks = _TOKEN_RE.findall(expr)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        if pos >= len(toks):
            raise BoolParseError("unexpected end of expression")
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        node = parse_and()
        while peek() == "OR":
            take()
            node = ("or", node, parse_and())
        return node

    def parse_and():
        node = parse_unary()
        while peek() is not None and peek() not in ("OR", ")"):
            m = _NEAR_RE.match(peek() or "")
            if m:
                take()
                rhs = parse_unary()
                if node[0] != "term" or rhs[0] != "term":
                    raise BoolParseError(
                        "NEAR/k joins two plain terms")
                node = ("near", int(m.group(1)), node[1], rhs[1])
                continue
            if peek() == "AND":
                take()
                rhs = parse_unary()
            elif peek() == "NOT":
                take()
                rhs = ("not", parse_unary())
            else:
                rhs = parse_unary()
            node = ("and", node, rhs)
        return node

    def parse_unary():
        t = peek()
        if t is None:
            raise BoolParseError("unexpected end of expression")
        if t == "NOT":
            take()
            return ("not", parse_unary())
        if t == "(":
            take()
            node = parse_or()
            if take() != ")":
                raise BoolParseError("missing ')'")
            return node
        if t in ("AND", "OR", ")"):
            raise BoolParseError(f"unexpected {t!r}")
        if t.startswith('"'):
            words = _phrase_words(take()[1:-1])
            if not words:
                return ("none",)
            if len(words) == 1:
                return ("term", words[0])
            return ("phrase", words)
        return ("term", take())

    node = parse_or()
    if pos != len(toks):
        raise BoolParseError(f"trailing input at {toks[pos]!r}")
    return node


def ast_terms(node) -> list[str]:
    if node[0] == "term":
        return [node[1]]
    if node[0] == "phrase":
        return list(node[1])
    if node[0] == "near":
        return [node[2], node[3]]
    if node[0] in ("not", "none"):
        return ast_terms(node[1]) if node[0] == "not" else []
    return ast_terms(node[1]) + ast_terms(node[2])


def ast_phrases(node) -> list[tuple[str, ...]]:
    if node[0] == "phrase":
        return [node[1]]
    if node[0] == "not":
        return ast_phrases(node[1])
    if node[0] in ("term", "none", "near"):
        return []
    return ast_phrases(node[1]) + ast_phrases(node[2])


def ast_nears(node) -> list[tuple[int, str, str]]:
    if node[0] == "near":
        return [(node[1], node[2], node[3])]
    if node[0] == "not":
        return ast_nears(node[1])
    if node[0] in ("term", "none", "phrase"):
        return []
    return ast_nears(node[1]) + ast_nears(node[2])


def _tokenize_ast(node, tokenize):
    """Rewrite raw terms through the index tokenizer: multi-token →
    AND chain; empty (stopword) → ('none',)."""
    if node[0] == "term":
        toks = tokenize(node[1])
        if not toks:
            return ("none",)
        out = ("term", toks[0])
        for t in toks[1:]:
            out = ("and", out, ("term", t))
        return out
    if node[0] in ("phrase", "near"):
        raise BoolParseError(
            "quoted phrases / NEAR are supported in corpus-side "
            "evaluation (percolate / boolean_search) only — index-side "
            "boolean retrieval uses Searcher.search_phrase / "
            "search_proximity for positional queries")
    if node[0] == "none":
        return node
    if node[0] == "not":
        return ("not", _tokenize_ast(node[1], tokenize))
    return (node[0], _tokenize_ast(node[1], tokenize),
            _tokenize_ast(node[2], tokenize))


def evaluate_index(searcher, expr: str, n: int | None = None) -> pa.Table:
    """→ pa.Table (doc_id,) ascending (first n if given): docs
    satisfying the boolean expression, evaluated on posting lists."""
    ast = _tokenize_ast(parse(expr), searcher.tokenizer.tokenize)
    recs = searcher.reader.fetch(sorted(set(ast_terms(ast))))
    universe: dict[str, np.ndarray] = {}

    def _universe() -> np.ndarray:
        if "u" not in universe:
            ids = searcher.all_doc_ids()
            universe["u"] = ids
        return universe["u"]

    def ev(node) -> np.ndarray:
        kind = node[0]
        if kind == "none":
            return np.empty(0, np.int64)
        if kind == "term":
            r = recs.get(node[1])
            return (np.empty(0, np.int64) if r is None
                    else r.doc_ids.astype(np.int64))
        if kind == "not":
            return np.setdiff1d(_universe(), ev(node[1]),
                                assume_unique=True)
        a, b = ev(node[1]), ev(node[2])
        if kind == "and":
            # 'x AND NOT y' evaluates as a difference — no universe
            if node[2][0] == "not":
                return np.setdiff1d(a, ev(node[2][1]), assume_unique=True)
            return np.intersect1d(a, b, assume_unique=True)
        return np.union1d(a, b)

    ids = ev(ast)
    if n is not None:
        ids = ids[:n]
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


# -- corpus-side (contract) evaluation --------------------------------------

def _membership_eval(node, member: dict, n: int) -> np.ndarray:
    kind = node[0]
    if kind == "none":
        return np.zeros(n, dtype=bool)
    if kind in ("term", "phrase"):
        return member[node[1]]
    if kind == "near":
        return member[(node[1], node[2], node[3])]
    if kind == "not":
        return ~_membership_eval(node[1], member, n)
    a = _membership_eval(node[1], member, n)
    b = _membership_eval(node[2], member, n)
    return (a & b) if kind == "and" else (a | b)


def _build_members(asts: list, batch: pa.Table) -> tuple[dict, int]:
    """Per-batch membership bitmaps for every term AND quoted phrase of
    the given ASTs — ONE tokenization pass shared by all of them.
    Phrase runs exploit doc-contiguity of the flat token stream: a
    candidate run is a hit iff its first and last token share a parent
    (tokens of one doc are consecutive, so equality at the endpoints
    implies the whole run is in-doc)."""
    from searchengine_ray.pipelines.analysis import simple_tokens_flat

    n = batch.num_rows
    terms = sorted({t for a in asts for t in ast_terms(a)})
    phrases = sorted({p for a in asts for p in ast_phrases(a)})
    flat, parents = simple_tokens_flat(batch["text"])
    par = np.asarray(parents, dtype=np.int64)
    tid = np.asarray(
        pc.fill_null(pc.index_in(flat, value_set=pa.array(
            terms, pa.string())), -1),
        dtype=np.int64,
    )
    member: dict = {}
    for i, t in enumerate(terms):
        hit = np.zeros(n, dtype=bool)
        hit[par[tid == i]] = True
        member[t] = hit
    idx_of = {t: i for i, t in enumerate(terms)}
    nears = sorted({s for a in asts for s in ast_nears(a)})
    if nears and par.size:
        # per-flat-position doc bounds: same-doc tokens are contiguous
        change = (np.diff(par) != 0)
        run_id = np.cumsum(np.concatenate(([0], change.astype(np.int64))))
        run_starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        run_ends = np.concatenate((run_starts[1:], [par.size])) - 1
        starts_of = run_starts[run_id]
        ends_of = run_ends[run_id]
    for (kk, ta, tb) in nears:
        hit = np.zeros(n, dtype=bool)
        if par.size:
            pa_ = np.flatnonzero(tid == idx_of[ta])
            pb_ = np.flatnonzero(tid == idx_of[tb])
            if pa_.size and pb_.size:
                lo = np.maximum(pa_ - kk, starts_of[pa_])
                hi = np.minimum(pa_ + kk, ends_of[pa_])
                j = np.searchsorted(pb_, lo)
                ok = (j < pb_.size) & \
                    (pb_[np.minimum(j, pb_.size - 1)] <= hi)
                hit[par[pa_[ok]]] = True
        member[(kk, ta, tb)] = hit
    for words in phrases:
        k = len(words)
        hit = np.zeros(n, dtype=bool)
        if tid.size >= k:
            m = tid.size - k + 1
            ok = tid[:m] == idx_of[words[0]]
            for j in range(1, k):
                ok &= tid[j:m + j] == idx_of[words[j]]
            ok &= par[:m] == par[k - 1:]
            hit[par[:m][ok]] = True
        member[words] = hit
    return member, n


def boolean_search_batch(batch: pa.Table, ast) -> pa.Table:
    member, n = _build_members([ast], batch)
    keep = _membership_eval(ast, member, n)
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"].filter(pa.array(keep)),
                          pa.int64()),
    })


def boolean_search(docs_ds, expr: str):
    """→ Dataset (doc_id,): docs whose simple-token set satisfies the
    expression — doc-local membership bitmaps, one shuffle-free pass
    (NOT is doc-local here, no universe materialization)."""
    ast = parse(expr)
    return docs_ds.map_batches(
        boolean_search_batch, fn_kwargs={"ast": ast},
        batch_format="pyarrow",
    )


class PercolateStage:
    """Reverse search (the Elasticsearch-percolator shape): a REGISTERED
    set of boolean queries is matched against a stream of documents —
    alerting / routing / saved-search evaluation at ingest time.

    Actor-pool stage: ASTs are parsed and the union term list is built
    ONCE per actor in ``__init__``; per batch, ONE tokenization pass
    builds membership bitmaps for the union vocabulary and every query
    evaluates against them as numpy boolean algebra — cost is
    O(tokens + queries × docs) per batch, independent of query count
    during tokenization. Emits (doc_id, query_id) match pairs."""

    def __init__(self, exprs: list[str]):
        self.asts = [parse(e) for e in exprs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        member, n = _build_members(self.asts, batch)
        doc = np.asarray(batch["doc_id"], dtype=np.int64)
        out_d, out_q = [], []
        for qid, ast in enumerate(self.asts):
            keep = _membership_eval(ast, member, n)
            ids = doc[keep]
            out_d.append(ids)
            out_q.append(np.full(ids.size, qid, np.int64))
        return pa.table({
            "doc_id": pa.array(
                np.concatenate(out_d) if out_d else
                np.empty(0, np.int64), pa.int64()),
            "query_id": pa.array(
                np.concatenate(out_q) if out_q else
                np.empty(0, np.int64), pa.int64()),
        })


def percolate(docs_ds, exprs: list[str], concurrency=None):
    """→ Dataset (doc_id, query_id): every (document, registered query)
    match under simple tokenization. Shuffle-free; the query set is
    driver-bounded (it ships in the actor constructor)."""
    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    return docs_ds.map_batches(
        PercolateStage,
        fn_constructor_kwargs={"exprs": list(exprs)},
        batch_format="pyarrow",
        concurrency=concurrency or autoscale_concurrency(),
    )


def to_sql_condition(node) -> str:
    """The AST as a DuckDB predicate over a ``toks`` list column —
    generated from the same parse the engine evaluates, so oracle and
    engine cannot drift."""
    kind = node[0]
    if kind == "none":
        return "FALSE"
    if kind == "term":
        return f"list_contains(toks, '{node[1]}')"
    if kind == "phrase":
        k = len(node[1])
        conj = " AND ".join(
            f"toks[i + {j}] = '{w}'" for j, w in enumerate(node[1]))
        return (f"(len(list_filter(range(1, len(toks) - {k} + 2), "
                f"i -> {conj})) > 0)")
    if kind == "near":
        k, ta, tb = node[1], node[2], node[3]
        return (
            f"(len(list_filter(range(1, len(toks) + 1), "
            f"i -> toks[i] = '{ta}' AND len(list_filter("
            f"range(greatest(1, i - {k}), "
            f"least(len(toks), i + {k}) + 1), "
            f"j -> toks[j] = '{tb}')) > 0)) > 0)")
    if kind == "not":
        return f"(NOT {to_sql_condition(node[1])})"
    op = "AND" if kind == "and" else "OR"
    return (f"({to_sql_condition(node[1])} {op} "
            f"{to_sql_condition(node[2])})")

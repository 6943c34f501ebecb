"""Fuzzy term suggestion ("did you mean"): deletion-neighborhood
blocking + exact Levenshtein verification, ranked by document
frequency.

The reference engine (tiagorainho/SearchEngine) exposes no fuzzy
matching; this extends the query surface with the classic
spell-suggest primitive a web-scale index needs.

Scale path: the naive plan — materialize the full (term, df)
vocabulary, then cross-join it against the query terms with an edit-
distance predicate — shuffles the whole vocabulary (10^8+ terms at
10^12 docs) and evaluates O(|vocab| x |queries|) DP matrices. Instead
the SymSpell deletion-neighborhood property (Garbe's SymSpell; also
FastSS, Bocek et al. 2007) guarantees that lev(q, t) <= d implies the
<=d-deletion variant sets of q and t intersect. So:

  1. broadcast the query terms' variant set once (``ray.put``, read in
     each actor's ``__init__``),
  2. inside ``map_batches`` keep only batch terms whose own variant
     set hits the broadcast set (a per-actor memo skips re-deriving
     variants for terms repeated across batches — web vocabulary is
     heavy-tailed),
  3. fold only the surviving terms' df partials (bounded fold,
     fold.py), and
  4. verify the tiny candidate table with exact Levenshtein on the
     driver.

Nothing vocabulary-sized ever crosses the wire: the shuffle payload is
|candidates| ~ O(|queries| x neighborhood), independent of corpus
size. Blocking is a NECESSARY condition (no false negatives); the
exact-DP verify removes the false positives, so results are identical
to the brute-force cross join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def deletion_variants(term: str, d: int) -> set[str]:
    """All strings reachable from ``term`` by at most ``d`` single-
    character deletions (including ``term`` itself)."""
    out = {term}
    frontier = {term}
    for _ in range(d):
        frontier = {
            s[:i] + s[i + 1:] for s in frontier for i in range(len(s))
        }
        out |= frontier
    return out


def levenshtein(a: str, b: str) -> int:
    """Exact Levenshtein distance (unit insert/delete/substitute) via
    the classic two-row DP, vectorized over the inner row with numpy."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        sub = prev[:-1] + (bv != ord(ca))
        # np.minimum over insert (prev[1:]+1) and substitute; the
        # delete transition depends on cur[j-1] so it needs the running
        # minimum scan below.
        np.minimum(prev[1:] + 1, sub, out=cur[1:])
        # delete transitions: cur[j] = min(cur[j], cur[j-1] + 1) is a
        # prefix-min recurrence; resolve it with one pass (amortized
        # cheap — terms are short).
        run = cur[0]
        for j in range(1, len(cur)):
            run = min(run + 1, cur[j])
            cur[j] = run
        prev, cur = cur, prev
    return int(prev[-1])


class FuzzyCandidateStage:
    """Actor-pool stage: per-batch (term, df_partial) restricted to
    terms whose deletion neighborhood hits the broadcast query-variant
    set. The variant set is ``ray.put`` once and fetched per actor in
    ``__init__`` (ObjectRefs nested in fn_constructor_kwargs are not
    auto-resolved); a per-actor memo caches the match decision per
    distinct term across batches."""

    def __init__(self, qvariants_ref, max_dist: int) -> None:
        import ray

        self.qvariants: frozenset[str] = ray.get(qvariants_ref)
        self.max_dist = max_dist
        self._memo: dict[str, bool] = {}

    def _matches(self, term: str) -> bool:
        hit = self._memo.get(term)
        if hit is None:
            hit = not self.qvariants.isdisjoint(
                deletion_variants(term, self.max_dist)
            )
            self._memo[term] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        from searchengine_ray.pipelines.analysis import term_df_partial_batch

        part = term_df_partial_batch(batch)
        terms = part["term"].to_pylist()
        keep = pa.array([self._matches(t) for t in terms], pa.bool_())
        return part.filter(keep)


def fuzzy_suggest(
    docs_ds,
    query_terms: list[str],
    max_dist: int = 2,
    k: int = 5,
    concurrency=None,
    fold_mode: str = "auto",
) -> pa.Table:
    """→ pa.Table (qterm, term, dist, df): for each query term, the
    top-``k`` corpus terms within Levenshtein distance ``max_dist``,
    ordered by (dist asc, df desc, term asc) — identical to the
    brute-force vocabulary cross join (see module docstring for why).
    """
    import ray

    from searchengine_ray.pipelines.fold import fold_count_partials
    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    qterms = [q.lower() for q in query_terms]
    qvariants = frozenset().union(
        *(deletion_variants(q, max_dist) for q in qterms)
    )
    cand = fold_count_partials(
        docs_ds.map_batches(
            FuzzyCandidateStage,
            fn_constructor_kwargs={
                "qvariants_ref": ray.put(qvariants),
                "max_dist": max_dist,
            },
            batch_format="pyarrow",
            concurrency=concurrency or autoscale_concurrency(),
        ),
        key_cols=["term"],
        sum_col="df_partial",
        mode=fold_mode,
        empty_result=pa.table({
            "term": pa.array([], pa.string()),
            "df_partial_sum": pa.array([], pa.int64()),
        }),
    )
    terms = cand["term"].to_pylist()
    dfs = cand["df_partial_sum"].to_pylist()
    rows = []
    for q in qterms:
        scored = [
            (dist, -df, t)
            for t, df in zip(terms, dfs)
            if (dist := levenshtein(q, t)) <= max_dist
        ]
        for dist, ndf, t in sorted(scored)[:k]:
            rows.append((q, t, dist, -ndf))
    return pa.table({
        "qterm": pa.array([r[0] for r in rows], pa.string()),
        "term": pa.array([r[1] for r in rows], pa.string()),
        "dist": pa.array([r[2] for r in rows], pa.int64()),
        "df": pa.array([r[3] for r in rows], pa.int64()),
    })

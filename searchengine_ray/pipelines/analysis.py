"""Text-analysis operators over a documents corpus — vectorized Arrow
kernels inside ``map_batches``; each has a DuckDB-expressible oracle
(see __ray_entry__.oracle_sql).

The "simple tokenization" here is deliberately SQL-parity (ASCII
punctuation → space, lower, whitespace split, length >= 2) so every
operator can be cross-checked against DuckDB on the same parquet. The
full reference tokenizer (stemming, stop words — text/tokenizer.py) is
exercised by the index-build pipelines instead.
"""

from __future__ import annotations

import hashlib
import re
import string

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe character class of ASCII string.punctuation (reference M1 set)
PUNCT_CLASS = "[" + re.escape(string.punctuation) + "]"
# the same class for embedding in a single-quoted SQL literal
PUNCT_CLASS_SQL = PUNCT_CLASS.replace("'", "''")

MIN_TOKEN_LEN = 2


def simple_tokens_flat(texts) -> tuple[pa.Array, pa.Array]:
    """→ (flat_terms, parent_row_indices), all Arrow kernels."""
    cleaned = pc.replace_substring_regex(texts, pattern=PUNCT_CLASS, replacement=" ")
    lists = pc.utf8_split_whitespace(pc.utf8_lower(cleaned))
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    mask = pc.greater_equal(pc.utf8_length(flat), MIN_TOKEN_LEN)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
        parents = parents.combine_chunks()
        mask = mask.combine_chunks()
    return flat.filter(mask), parents.filter(mask)


def _doc_ids_for(batch: pa.Table, parents: pa.Array) -> pa.Array:
    return pc.take(batch["doc_id"], parents)


# -- per-batch transforms (doc-local → final, no shuffle needed) -----------

def postings_tf_batch(batch: pa.Table) -> pa.Table:
    """(term, doc_id, tf) — doc-local counts are final (a doc never spans
    batches)."""
    flat, parents = simple_tokens_flat(batch["text"])
    t = pa.table({"term": flat, "doc_id": _doc_ids_for(batch, parents)})
    out = t.group_by(["term", "doc_id"]).aggregate([([], "count_all")])
    return out.rename_columns(["term", "doc_id", "tf"])


def doc_lengths_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, dl) under simple tokenization; zero-token docs included."""
    flat, parents = simple_tokens_flat(batch["text"])
    n = batch.num_rows
    counts = np.bincount(
        np.asarray(parents, dtype=np.int64), minlength=n
    ).astype(np.int64)
    return pa.table({"doc_id": batch["doc_id"], "dl": pa.array(counts, pa.int64())})


def term_df_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial document frequencies (combiner before the small
    groupby-sum — aggregation-at-scale pattern)."""
    pt = postings_tf_batch(batch)
    out = pt.group_by("term").aggregate([([], "count_all")])
    return out.rename_columns(["term", "df_partial"])


def term_cf_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial collection frequencies."""
    flat, _ = simple_tokens_flat(batch["text"])
    vc = pc.value_counts(flat)
    if len(vc) == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "cf_partial": pa.array([], pa.int64())})
    return pa.table({"term": vc.field("values"),
                     "cf_partial": vc.field("counts").cast(pa.int64())})


_TOKEN_RE_BPE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish pre-token count: letter runs, digit runs, single other
    non-space chars (same regex as the SQL oracle)."""
    counts = pc.count_substring_regex(batch["text"], pattern=_TOKEN_RE_BPE)
    return pa.table(
        {"doc_id": batch["doc_id"], "n_pretokens": counts.cast(pa.int64())}
    )


_STOP_SQL = ["the", "and", "of", "to", "in", "is", "it", "on", "for", "as"]


def quality_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality signals: chars, tokens, digit chars, punct chars,
    stop-token hits, summed token length (integer-exact for the SQL
    oracle; mean = sum/n downstream)."""
    text = batch["text"]
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_digits = pc.count_substring_regex(text, pattern="[0-9]").cast(pa.int64())
    n_punct = pc.count_substring_regex(text, pattern=PUNCT_CLASS).cast(pa.int64())
    flat, parents = simple_tokens_flat(text)
    n = batch.num_rows
    par = np.asarray(parents, dtype=np.int64)
    n_tokens = np.bincount(par, minlength=n).astype(np.int64)
    tok_len = np.asarray(pc.utf8_length(flat), dtype=np.int64)
    sum_len = np.bincount(par, weights=tok_len, minlength=n)
    stop_mask = np.asarray(
        pc.is_in(flat, value_set=pa.array(_STOP_SQL)), dtype=bool
    )
    n_stop = np.bincount(par[stop_mask], minlength=n).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_digit_chars": n_digits,
            "n_punct_chars": n_punct,
            "n_stop_tokens": pa.array(n_stop, pa.int64()),
            "sum_token_len": pa.array(sum_len.astype(np.int64), pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint = md5 hex of the raw text (exact-dup key;
    SQL oracle: ``md5(text)``)."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
           for t in batch["text"].to_pylist()]
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.string())}
    )


def bigram_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial word-bigram counts (combiner before the small
    groupby-sum): consecutive token pairs within a doc, joined with one
    space."""
    flat, parents = simple_tokens_flat(batch["text"])
    par = np.asarray(parents, dtype=np.int64)
    if len(flat) < 2:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "cf_partial": pa.array([], pa.int64())})
    same_doc = par[1:] == par[:-1]
    left = flat.slice(0, len(flat) - 1).filter(pa.array(same_doc))
    right = flat.slice(1).filter(pa.array(same_doc))
    bigrams = pc.binary_join_element_wise(left, right, " ")
    vc = pc.value_counts(bigrams)
    if len(vc) == 0:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "cf_partial": pa.array([], pa.int64())})
    return pa.table({"bigram": vc.field("values"),
                     "cf_partial": vc.field("counts").cast(pa.int64())})


_PROPS_KEY_RE = '"k":\\s*(\\d+)'


def props_k_batch(batch: pa.Table) -> pa.Table:
    """Extract the integer ``k`` field from the JSON ``props`` column
    (vectorized regex — the schema is fixed; a general pipeline would
    swap in a JSON kernel here). Rows without a match are dropped."""
    ext = pc.extract_regex(batch["props"], pattern='"k":\\s*(?P<k>\\d+)')
    valid = ext.is_valid()
    ks = pc.struct_field(ext.filter(valid), "k").cast(pa.int64())
    return pa.table({"k": ks})


# -- language id (heuristic; rows-only oracle) -----------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "with", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "pas", "des", "une", "que", "dans"},
    "es": {"el", "la", "los", "de", "que", "es", "en", "una", "por", "con"},
    "pt": {"de", "que", "não", "uma", "os", "das", "em", "para", "com", "um"},
}


class LangIdStage:
    """Stop-word-hit language classifier (n-gram-free heuristic): the
    language whose marker set hits the most tokens wins; ties and
    zero-hit docs → 'und' (undetermined). Stateful marker tables built
    once per actor."""

    def __init__(self):
        self.markers = {
            lang: pa.array(sorted(ws)) for lang, ws in _LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents = simple_tokens_flat(batch["text"])
        n = batch.num_rows
        par = np.asarray(parents, dtype=np.int64)
        hits = np.zeros((len(self.markers), n), dtype=np.int64)
        for i, (lang, vs) in enumerate(self.markers.items()):
            mask = np.asarray(pc.is_in(flat, value_set=vs), dtype=bool)
            hits[i] = np.bincount(par[mask], minlength=n)
        langs = list(self.markers.keys())
        best = hits.argmax(axis=0)
        best_hits = hits.max(axis=0)
        if hits.shape[0] > 1:
            sorted_hits = np.sort(hits, axis=0)
            tied = sorted_hits[-1] == sorted_hits[-2]
        else:
            tied = np.zeros(n, dtype=bool)
        pred = [
            "und" if best_hits[j] == 0 or tied[j] else langs[best[j]]
            for j in range(n)
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(pred, pa.string())}
        )


# -- per-doc repetition signals (Gopher-style quality rules) ---------------

def _ngram_join(flat: pa.Array, par: np.ndarray, k: int):
    """Consecutive within-doc k-grams of the filtered token stream →
    (gram strings, parent doc row index)."""
    n = len(flat)
    if n < k:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    same = np.ones(n - k + 1, dtype=bool)
    for j in range(1, k):
        same &= par[j:n - k + 1 + j] == par[:n - k + 1]
    idx = np.flatnonzero(same)
    if idx.size == 0:
        return pa.array([], pa.string()), idx
    parts = [flat.take(pa.array(idx + j, pa.int64())) for j in range(k)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return grams, par[idx]


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc repetition signals (the Gopher-rule family, integer-exact
    for the SQL oracle): total/most-frequent word-bigram counts and the
    number of trigram occurrences belonging to repeated trigrams.
    Downstream rules compare ratios as integer cross-products."""
    flat, parents = simple_tokens_flat(batch["text"])
    par = np.asarray(parents, dtype=np.int64)
    n = batch.num_rows

    def _per_doc(k: int):
        grams, gpar = _ngram_join(flat, par, k)
        total = np.bincount(gpar, minlength=n).astype(np.int64) \
            if len(gpar) else np.zeros(n, np.int64)
        top = np.zeros(n, np.int64)
        dup_occ = np.zeros(n, np.int64)
        if len(grams):
            t = pa.table({"p": pa.array(gpar, pa.int64()), "g": grams})
            c = t.group_by(["p", "g"]).aggregate([([], "count_all")])
            cp = c["p"].to_numpy(zero_copy_only=False)
            cn = c["count_all"].to_numpy(zero_copy_only=False)
            np.maximum.at(top, cp, cn)
            rep = cn > 1
            dup_occ = np.bincount(cp[rep], weights=cn[rep],
                                  minlength=n).astype(np.int64)
        return total, top, dup_occ

    n_bi, top_bi, _ = _per_doc(2)
    n_tri, _, dup_tri = _per_doc(3)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_bigrams": pa.array(n_bi, pa.int64()),
        "top_bigram_count": pa.array(top_bi, pa.int64()),
        "n_trigrams": pa.array(n_tri, pa.int64()),
        "dup_trigram_occurrences": pa.array(dup_tri, pa.int64()),
    })


# -- per-doc TF-IDF keywords (broadcast-df pattern) -----------------------

class KeywordStage:
    """Actor-pool stage: per-doc top-k TF-IDF keywords. The term→idf
    map (vocabulary-bounded — the classic small broadcast side) ships
    once per actor via ``ray.put``; scoring is one shuffle-free
    ``map_batches`` pass. idf = round(ln(N/df), 3) — the same
    quantization convention the search oracles pin."""

    def __init__(self, idf_ref, k: int):
        import ray

        idf = idf_ref
        if isinstance(idf, ray.ObjectRef):
            idf = ray.get(idf)
        self.terms, self.idf = idf          # (string array, float64 np)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents = simple_tokens_flat(batch["text"])
        if len(flat) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "score_q4": pa.array([], pa.int64()),
            })
        t = pa.table({
            "p": pc.take(batch["doc_id"], parents),
            "term": flat,
        })
        tf = t.group_by(["p", "term"]).aggregate([([], "count_all")])
        idx = pc.index_in(tf["term"], value_set=self.terms)
        score = (tf["count_all"].to_numpy(zero_copy_only=False)
                 .astype(np.float64)
                 * self.idf[idx.to_numpy(zero_copy_only=False)])
        scored = pa.table({
            "doc_id": tf["p"],
            "term": tf["term"],
            "score": pa.array(score, pa.float64()),
        }).sort_by([("doc_id", "ascending"), ("score", "descending"),
                    ("term", "ascending")])
        docs = scored["doc_id"].to_numpy(zero_copy_only=False)
        _, starts = np.unique(docs, return_index=True)
        offs = np.zeros(len(docs), np.int64)
        offs[starts] = 1
        rank = np.arange(len(docs)) - np.repeat(
            starts, np.diff(np.append(starts, len(docs)))) + 1
        keep = rank <= self.k
        out = scored.filter(pa.array(keep))
        return pa.table({
            "doc_id": out["doc_id"],
            "rank": pa.array(rank[keep], pa.int64()),
            "term": out["term"],
            "score_q4": pa.array(
                np.round(out["score"].to_numpy(zero_copy_only=False)
                         * 10_000).astype(np.int64), pa.int64()),
        })


def _df_and_ndocs_partial_batch(batch: pa.Table) -> pa.Table:
    """df partials plus a doc-count sentinel row (term ``""`` — tokens
    are always >= MIN_TOKEN_LEN chars, so the empty string can never
    collide with a real term). Folds the corpus doc count into the
    same pass as the df partials: one scan instead of two."""
    t = term_df_partial_batch(batch)
    return pa.table({
        "term": pa.concat_arrays([
            t["term"].combine_chunks(),
            pa.array([""], pa.string()),
        ]),
        "df_partial": pa.concat_arrays([
            t["df_partial"].combine_chunks(),
            pa.array([batch.num_rows], pa.int64()),
        ]),
    })


def keywords_topk(docs_ds, k: int = 3, concurrency=None,
                  fold_mode: str = "auto"):
    """→ Dataset (doc_id, rank, term, score_q4): each doc's top-k
    simple-token TF-IDF keywords (score desc, term asc ties). TWO
    corpus scans total: the df aggregate runs as per-batch partials
    (with the doc count folded in as a sentinel row) through the
    bounded fold of ``pipelines/fold.py`` — driver Arrow group_by for
    broadcast-sized inputs, hash-exchange fold above the row limit so
    the driver never holds the unpruned partial set — then the scoring
    pass broadcasts the vocabulary-bounded idf table and needs no
    shuffle."""
    import math

    import ray

    from searchengine_ray.pipelines.fold import fold_count_partials
    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    folded = fold_count_partials(
        docs_ds.map_batches(
            _df_and_ndocs_partial_batch, batch_format="pyarrow"
        ),
        key_cols=["term"],
        sum_col="df_partial",
        mode=fold_mode,
    )
    sentinel = pc.equal(folded["term"], "")
    n_docs = int(
        pc.sum(folded.filter(sentinel)["df_partial_sum"]).as_py() or 0
    )
    folded = folded.filter(pc.invert(sentinel))
    terms = folded["term"].combine_chunks()
    dfs = folded["df_partial_sum"].to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    # libm log over distinct values (np.log differs in the last ulp)
    idf = np.array([round(math.log(n_docs / d), 3) for d in dfs],
                   np.float64)
    idf_ref = ray.put((terms, idf))
    return docs_ds.map_batches(
        KeywordStage,
        fn_constructor_kwargs={"idf_ref": idf_ref, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency or autoscale_concurrency(),
    )


# -- PII redaction ---------------------------------------------------------

# RE2-compatible (both Arrow and DuckDB use RE2 — identical semantics)
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"[0-9]{3}[-.][0-9]{4}"


def pii_redact_batch(batch: pa.Table) -> pa.Table:
    """Redact emails then phone numbers from ``text`` (same order as the
    SQL oracle's nested regexp_replace) → (doc_id, n_emails, n_phones,
    redacted_fp). The fingerprint (md5 of the redacted text) keeps the
    value-compare small while pinning the exact replacement output."""
    text = batch["text"]
    n_em = pc.count_substring_regex(text, pattern=PII_EMAIL_RE).cast(pa.int64())
    red = pc.replace_substring_regex(text, pattern=PII_EMAIL_RE,
                                     replacement="<EMAIL>")
    n_ph = pc.count_substring_regex(red, pattern=PII_PHONE_RE).cast(pa.int64())
    red = pc.replace_substring_regex(red, pattern=PII_PHONE_RE,
                                     replacement="<PHONE>")
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
           for t in red.to_pylist()]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_emails": n_em,
        "n_phones": n_ph,
        "redacted_fp": pa.array(fps, pa.string()),
    })


# -- exact distributed quantiles -------------------------------------------

def dl_hist_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch histogram partial of simple-token document lengths:
    (dl, dl_key, cnt). The histogram DOMAIN is bounded by the longest
    document, not by the corpus, so the folded table stays tiny at any
    scale; ``dl_key`` is the stringified dl that fold.py's hash
    exchange buckets on (it hashes string keys)."""
    t = doc_lengths_batch(batch)
    vc = pc.value_counts(t["dl"])
    if len(vc) == 0:
        return pa.table({"dl": pa.array([], pa.int64()),
                         "dl_key": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    vals = vc.field("values").cast(pa.int64())
    return pa.table({
        "dl": vals,
        "dl_key": pc.cast(vals, pa.string()),
        "cnt": vc.field("counts").cast(pa.int64()),
    })


def token_quantiles(docs_ds, pcts=(25, 50, 75, 90, 99),
                    fold_mode: str = "auto") -> pa.Table:
    """→ pa.Table (pct, dl_q): exact discrete quantiles of the
    simple-token document-length distribution.

    Scale path: quantiles of a huge column come EXACTLY from a value
    histogram whenever the value domain is bounded (token counts are
    bounded by the longest document): per-batch ``value_counts``
    partials → bounded fold (fold.py: driver Arrow group_by at bench
    scale, hash exchange above the row limit) → tiny sorted histogram
    → cumulative-count lookup. No global sort, no shuffle of the data
    itself — the classic alternative (``ds.sort`` + rank pick) moves
    every row across the cluster.

    ``dl_q`` follows PERCENTILE_DISC semantics (DuckDB
    ``quantile_disc``): the smallest value whose cumulative count
    reaches ``ceil(pct/100 * N)`` — integer arithmetic throughout, so
    there is no float boundary wobble against the SQL oracle.
    """
    from searchengine_ray.pipelines.fold import fold_count_partials

    folded = fold_count_partials(
        docs_ds.map_batches(dl_hist_partial_batch, batch_format="pyarrow"),
        key_cols=["dl", "dl_key"],
        sum_col="cnt",
        bucket_col="dl_key",
        mode=fold_mode,
    )
    empty = pa.table({"pct": pa.array([], pa.int64()),
                      "dl_q": pa.array([], pa.int64())})
    if folded.num_rows == 0:
        return empty
    dl = folded["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = folded["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(dl, kind="stable")
    dl, cnt = dl[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    if n == 0:
        return empty
    out_p, out_v = [], []
    for p in pcts:
        target = max((int(p) * n + 99) // 100, 1)   # ceil(p/100 * N)
        i = int(np.searchsorted(cum, target, side="left"))
        out_p.append(int(p))
        out_v.append(int(dl[min(i, len(dl) - 1)]))
    return pa.table({"pct": pa.array(out_p, pa.int64()),
                     "dl_q": pa.array(out_v, pa.int64())})


# -- per-language top-k terms ----------------------------------------------

def lang_term_cf_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial (lang, term) collection frequencies."""
    flat, parents = simple_tokens_flat(batch["text"])
    t = pa.table({"lang": pc.take(batch["lang"], parents), "term": flat})
    out = t.group_by(["lang", "term"]).aggregate([([], "count_all")])
    return out.rename_columns(["lang", "term", "cf"])


def _topk_per_lang(t: pa.Table, k: int, cf_col: str) -> pa.Table:
    """Keep each language's top-k rows by (cf desc, term asc) —
    vectorized: sort, then running index within lang runs."""
    t = t.sort_by([("lang", "ascending"), (cf_col, "descending"),
                   ("term", "ascending")])
    if t.num_rows == 0:
        return t
    lang = t["lang"].to_numpy(zero_copy_only=False)
    new = np.empty(len(lang), dtype=bool)
    new[0] = True
    new[1:] = lang[1:] != lang[:-1]
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(lang)),
                                               0))
    rank = np.arange(len(lang)) - run_start
    return t.filter(pa.array(rank < k))


def lang_top_terms(docs_ds, k: int = 10, fold_mode: str = "auto") -> pa.Table:
    """→ pa.Table (lang, term, cf): each language's top-k terms by
    collection frequency (ties term-asc).

    Scale path: per-batch (lang, term) combiners → bounded fold with a
    PER-BUCKET top-k prune (exact: hash partitioning puts each
    (lang, term)'s complete sum in one bucket, and any global top-k row
    is also top-k within its bucket) → final k×langs-sized driver
    top-k. Nothing vocabulary-sized reaches the driver on the
    distributed path."""
    from searchengine_ray.pipelines.fold import fold_count_partials

    folded = fold_count_partials(
        docs_ds.map_batches(lang_term_cf_partial_batch,
                            batch_format="pyarrow"),
        key_cols=["lang", "term"],
        sum_col="cf",
        bucket_col="term",
        prune=lambda t: _topk_per_lang(t, k, "cf_sum"),
        mode=fold_mode,
        empty_result=pa.table({"lang": pa.array([], pa.string()),
                               "term": pa.array([], pa.string()),
                               "cf_sum": pa.array([], pa.int64())}),
    )
    return _topk_per_lang(folded, k, "cf_sum").rename_columns(
        ["lang", "term", "cf"])


# -- heavy hitters (two-pass exact top-k via Misra-Gries sketches) ---------

# Whitespace can never survive tokenization, so this key cannot collide
# with a real term; it carries each batch's MG decrement (deficit).
_MG_DEFICIT_SENTINEL = "\t"


def mg_sketch_batch(batch: pa.Table, capacity: int = 4096) -> pa.Table:
    """Per-batch Misra-Gries summary of simple-token counts: the exact
    batch ``value_counts`` compressed to ≤ ``capacity`` entries by
    subtracting the (capacity+1)-th largest count from every entry and
    dropping the non-positive ones (the standard MG decrement). Each
    term's count is under-estimated by at most the subtracted
    threshold, which is ≤ N_batch/(capacity+1); the threshold itself
    rides along as a sentinel row so the driver can bound the GLOBAL
    under-estimate D = Σ per-batch thresholds without a second scan
    (MG summaries merge by summation — Agarwal et al., "Mergeable
    Summaries", PODS 2012)."""
    flat, _ = simple_tokens_flat(batch["text"])
    vc = pc.value_counts(flat)
    terms = vc.field("values")
    counts = np.asarray(vc.field("counts"), dtype=np.int64)
    deficit = 0
    if len(counts) > capacity:
        kth = len(counts) - capacity - 1
        thresh = int(np.partition(counts, kth)[kth])
        keep = counts > thresh
        terms = terms.filter(pa.array(keep))
        counts = counts[keep] - thresh
        deficit = thresh
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    return pa.table({
        "term": pa.concat_arrays(
            [terms, pa.array([_MG_DEFICIT_SENTINEL], pa.string())]
        ),
        "c_hat": pa.array(np.concatenate([counts, [deficit]]), pa.int64()),
    })


class CandidateCountStage:
    """Actor-pool stage: exact counts restricted to the broadcast
    candidate set (``ray.put`` once, ``ray.get`` in ``__init__`` — the
    broadcast pattern; ObjectRefs nested in fn_constructor_kwargs are
    not auto-resolved)."""

    def __init__(self, terms_ref) -> None:
        import ray

        self.value_set = ray.get(terms_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, _ = simple_tokens_flat(batch["text"])
        hits = flat.filter(pc.is_in(flat, value_set=self.value_set))
        vc = pc.value_counts(hits)
        if len(vc) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "cf_partial": pa.array([], pa.int64())})
        return pa.table({"term": vc.field("values"),
                         "cf_partial": vc.field("counts").cast(pa.int64())})


def heavy_hitters(docs_ds, k: int = 100, capacity: int = 4096,
                  concurrency=None, fold_mode: str = "auto") -> pa.Table:
    """→ pa.Table (term, cf): the EXACT top-k most frequent simple
    tokens, computed without shuffling the vocabulary.

    Two passes: (1) per-batch Misra-Gries sketches (≤ capacity rows
    each) folded into a candidate set — any term whose true count
    exceeds the summed MG deficit D survives in it; (2) exact counts
    of the candidates only (broadcast membership filter, per-batch
    partials, bounded fold). The result is PROVABLY exact when the
    k-th candidate count is > D (every non-candidate is ≤ D, so none
    can reach — or tie into — the top k); on the rare miss the
    operator falls back to the full exact aggregate. Versus
    ``top_terms``'s partial-aggregate groupby, the shuffle payload
    shrinks from the whole vocabulary to ~capacity rows per batch in
    pass 1 and |candidates| rows in pass 2."""
    import ray

    from searchengine_ray.pipelines.fold import fold_count_partials
    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    sketch = fold_count_partials(
        docs_ds.map_batches(
            mg_sketch_batch, fn_kwargs={"capacity": capacity},
            batch_format="pyarrow",
        ),
        key_cols=["term"],
        sum_col="c_hat",
        mode=fold_mode,
    )
    sentinel = pc.equal(sketch["term"], _MG_DEFICIT_SENTINEL)
    deficit = int(pc.sum(sketch.filter(sentinel)["c_hat_sum"]).as_py() or 0)
    candidates = sketch.filter(pc.invert(sentinel))["term"].combine_chunks()

    exact = fold_count_partials(
        docs_ds.map_batches(
            CandidateCountStage,
            fn_constructor_kwargs={"terms_ref": ray.put(candidates)},
            batch_format="pyarrow",
            concurrency=concurrency or autoscale_concurrency(),
        ),
        key_cols=["term"],
        sum_col="cf_partial",
        mode=fold_mode,
        empty_result=pa.table({"term": pa.array([], pa.string()),
                               "cf_partial_sum": pa.array([], pa.int64())}),
    )
    top = exact.rename_columns(["term", "cf"]).sort_by(
        [("cf", "descending"), ("term", "ascending")]
    ).slice(0, k)
    kth = top["cf"][k - 1].as_py() if top.num_rows >= k else None
    provably_exact = (kth is not None and kth > deficit) or deficit == 0
    if not provably_exact:
        full = fold_count_partials(
            docs_ds.map_batches(term_cf_partial_batch,
                                batch_format="pyarrow"),
            key_cols=["term"],
            sum_col="cf_partial",
            mode=fold_mode,
        )
        top = full.rename_columns(["term", "cf"]).sort_by(
            [("cf", "descending"), ("term", "ascending")]
        ).slice(0, k)
    return top


class _LangConfusionStage:
    """(label, prediction) rows per doc — marker tables once per actor."""

    def __init__(self):
        self.langid = LangIdStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pred = self.langid(batch)["lang_pred"]
        return pa.table({"lang": batch["lang"], "lang_pred": pred})


def lang_confusion(docs_ds, concurrency=None):
    """→ Dataset (lang, lang_pred, n): the language-ID confusion
    matrix against the corpus labels — the classifier-eval rollup.
    One scan + ONE tiny keyed aggregate (languages² rows)."""
    from ray.data.aggregate import Count

    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    rows = docs_ds.map_batches(
        _LangConfusionStage, batch_format="pyarrow",
        concurrency=concurrency or autoscale_concurrency(), num_cpus=1,
    )
    agg = rows.groupby(["lang", "lang_pred"]).aggregate(
        Count(alias_name="n"))

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({"lang": b["lang"], "lang_pred": b["lang_pred"],
                         "n": b["n"].cast(pa.int64())})

    return agg.map_batches(cast, batch_format="pyarrow")


# -- KMV distinct-count estimation ------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (Steele/Lea/Flood; public domain constants):
    KMV needs UNIFORM hashes near 0, and raw FNV-1a is measurably
    non-uniform there for short sequential tokens (a 0.224 vs 0.102
    k-th-minimum on a 5000-word vocab → a 2.2× cardinality error);
    the avalanche mix restores uniformity. Mirrored exactly in the SQL
    oracle with HUGEINT mod-2^64 arithmetic."""
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def kmv_partial_batch(batch: pa.Table, k: int) -> pa.Table:
    """Per-batch k-minimum-values partial: the k smallest DISTINCT
    mixed token hashes (two's-complement int64 rows)."""
    from searchengine_ray.pipelines.dedup import _hash_tokens

    flat, _ = simple_tokens_flat(batch["text"])
    h = np.unique(_splitmix64(_hash_tokens(flat)))   # uint64, ascending
    return pa.table({"h": pa.array(h[:k].view(np.int64), pa.int64())})


def vocab_kmv_estimate(docs_ds, k: int = 1024) -> pa.Table:
    """→ pa.Table (k_used, kth_hash, est_distinct), one row: the KMV
    (k-minimum-values) estimate of the DISTINCT token count
    (Bar-Yossef et al. 2002): with the k smallest distinct hash values
    of the stream, est = (k-1) · 2^64 // h_k — integer arithmetic
    throughout, so the "estimate" is a deterministic exact function of
    the data and the oracle reproduces it bit-for-bit. Fewer than k
    distinct hashes → the count is simply exact.

    Scale shape: exact distinct counting needs a vocabulary-sized
    fold; KMV ships k rows per block and folds k values total —
    cardinality estimation at 100 TB for the cost of a top-k. FNV is
    deterministic, so the estimate is partitioning-independent."""
    parts = docs_ds.map_batches(
        kmv_partial_batch, fn_kwargs={"k": int(k)},
        batch_format="pyarrow",
    ).take_all()
    if not parts:
        return pa.table({"k_used": pa.array([0], pa.int64()),
                         "kth_hash": pa.array([0], pa.int64()),
                         "est_distinct": pa.array([0], pa.int64())})
    h = np.unique(np.asarray([r["h"] for r in parts],
                             np.int64).view(np.uint64))
    h = np.sort(h)[:k]
    if h.size < k:                      # exact regime
        return pa.table({
            "k_used": pa.array([int(h.size)], pa.int64()),
            "kth_hash": pa.array(
                [int(h[-1].view(np.int64)) if h.size else 0], pa.int64()),
            "est_distinct": pa.array([int(h.size)], pa.int64()),
        })
    kth = int(h[-1])                    # python int (unsigned value)
    est = (k - 1) * (1 << 64) // kth
    return pa.table({
        "k_used": pa.array([k], pa.int64()),
        "kth_hash": pa.array([int(np.uint64(kth).view(np.int64))],
                             pa.int64()),
        "est_distinct": pa.array([est], pa.int64()),
    })

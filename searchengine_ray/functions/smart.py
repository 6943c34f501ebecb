"""SMART / BM25 scalar functions with the reference's exact semantics,
including its ``round(x, 3)`` quantization points.

Reference: ``tf_idf.py:167-202`` (uniform_tf / calculate_idf /
uniform_weight), ``bm25.py:105-106`` (BM25 idf). These are pure
functions shared by the build (merge-time idf, doc-side weights) and
the query engine (query-side weights).
"""

from __future__ import annotations

import math


def uniform_tf(tf: float, alg: str) -> float:
    """SMART tf component — reference ``tf_idf.py:167-176``."""
    if alg == "l":
        try:
            return 1 + math.log(tf) if tf > 0 else 0
        except ValueError:
            return 0
    elif alg == "b":
        return 1 if tf > 0 else 0
    elif alg == "n":
        return tf
    raise ValueError(f"unknown tf alg {alg!r}")


def calculate_idf(n_docs: int, df: int, alg: str) -> float:
    """SMART idf component — reference ``tf_idf.py:178-187``.

    ``n_docs`` is the corpus size at computation time. NOTE the
    reference quirk: at query time its ``documents_length`` is empty,
    so doc-side 't'/'p' idf raises ValueError → 0 (see scorers).
    """
    try:
        if alg == "t":
            return round(math.log(n_docs / df), 3)
        elif alg == "p":
            return round(max(0, math.log((n_docs - df) / df)), 3)
        elif alg == "n":
            return 1
    except ValueError:
        return 0
    except ZeroDivisionError:
        return 0
    raise ValueError(f"unknown idf alg {alg!r}")


def bm25_idf(n_docs: int, df: int) -> float:
    """BM25 idf: ``round(ln(N/df), 3)`` — reference ``bm25.py:105-106``."""
    return round(math.log(n_docs / df), 3)


def uniform_weight(weights: dict, alg: str) -> dict:
    """SMART normalization over a term→weight dict — ``tf_idf.py:189-202``.

    'c' = cosine: divide by sqrt(sum of squares); 'n' = all ones.
    """
    if alg == "c":
        sqrt_weights = math.sqrt(sum(w * w for w in weights.values()))
        return {t: w / sqrt_weights for t, w in weights.items()}
    elif alg == "n":
        return {t: 1 for t in weights}
    raise ValueError(f"unknown weight alg {alg!r}")


def validate_smart_schema(schema: str) -> None:
    """Validate the 7-char ``ddd.qqq`` SMART string — ``tf_idf.py:48-58``."""
    ok = (
        len(schema) == 7
        and schema[3] == "."
        and schema[0] in "nlb"
        and schema[1] in "ntp"
        and schema[2] in "nc"
        and schema[4] in "nlb"
        and schema[5] in "ntp"
        and schema[6] in "nc"
    )
    if not ok:
        raise ValueError(f"SMART schema {schema!r} not supported")


def doc_tf_weights(term_counts: dict, schema: str) -> dict:
    """Per-doc stored TF-IDF weights (build side, reference M9:
    ``tf_idf.py:142-165``): ``uniform_tf(count, schema[0])`` per distinct
    term, then ``uniform_weight(·, schema[2])`` over the doc's terms."""
    tfs = {t: uniform_tf(c, schema[0]) for t, c in term_counts.items()}
    return uniform_weight(tfs, schema[2])

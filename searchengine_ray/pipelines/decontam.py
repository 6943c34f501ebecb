"""Benchmark decontamination: flag documents that share any word
n-gram with a probe (benchmark/eval) set.

The standard training-data hygiene step (the "13-gram overlap"
published with GPT-2/GPT-3 and reused by most open corpora): an eval
set's n-grams are collected once, then every training document is
checked for overlap and dropped/flagged.

Scale shape (100 TB): the probe set is SMALL (an eval suite — at most
millions of n-grams), so it is collected once, deduplicated, put in
the object store with ``ray.put`` and read zero-copy by every actor;
the corpus-side check is a single ``map_batches`` pass with NO shuffle
at all — per-batch n-grams via Arrow take/join kernels and one
``pc.is_in`` against the shared value set (hash table built once per
actor in ``__init__``, not per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.pipelines.analysis import (
    _ngram_join,
    simple_tokens_flat,
)


def _batch_ngrams(batch: pa.Table, n: int):
    """→ (gram strings, parent row indices) for a batch of (text)."""
    flat, parents = simple_tokens_flat(batch["text"])
    par = np.asarray(parents, dtype=np.int64)
    return _ngram_join(flat, par, n)


def collect_probe_ngrams(probe_ds, n: int = 5) -> pa.Array:
    """Distinct word n-grams of the probe set → one Arrow string array
    (bounded by probe-set size — the ONLY materialized piece)."""
    parts = probe_ds.map_batches(
        lambda b: pa.table({"g": _batch_ngrams(b, n)[0].unique()}),
        batch_format="pyarrow",
    ).take_all()
    if not parts:
        return pa.array([], pa.string())
    grams = pa.array([r["g"] for r in parts], pa.string())
    return grams.unique()


class DecontaminateStage:
    """Actor-pool stage: per-doc count of n-gram occurrences that
    appear in the broadcast probe set. ``probe_ref`` is a
    ``ray.ObjectRef`` (or a plain Arrow array in tests) so the set
    ships once per actor, not once per batch."""

    def __init__(self, probe_ref, n: int = 5):
        import ray

        probe = probe_ref
        if isinstance(probe, ray.ObjectRef):
            probe = ray.get(probe)
        self.probe = probe
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams, gpar = _batch_ngrams(batch, self.n)
        hits = np.zeros(batch.num_rows, np.int64)
        if len(grams) and len(self.probe):
            m = pc.is_in(grams, value_set=self.probe)
            mask = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
            if mask.any():
                hits = np.bincount(
                    gpar[mask], minlength=batch.num_rows
                ).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array((hits > 0).astype(np.int64),
                                     pa.int64()),
        })


def decontaminate(docs_ds, probe_ds, n: int = 5, concurrency=None):
    """→ Dataset (doc_id, n_hits, contaminated): per training doc, the
    number of its n-gram occurrences found in the probe set's distinct
    n-grams. No shuffle; the probe set is broadcast via ``ray.put``."""
    import ray

    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    probe_ref = ray.put(collect_probe_ngrams(probe_ds, n))
    return docs_ds.map_batches(
        DecontaminateStage,
        fn_constructor_kwargs={"probe_ref": probe_ref, "n": n},
        batch_format="pyarrow",
        concurrency=concurrency or autoscale_concurrency(),
    )

"""Multimodal column plumbing: opaque ``binary`` payloads (html / image
/ audio / video) processed by actor-pool ``map_batches`` stages.

The decode libraries (PIL, ffmpeg, soundfile) are NOT in this container
— the actual decode is stubbed behind ``decoder="real"`` (raises
NotImplementedError) while ``decoder="fake"`` produces a deterministic
content-derived feature vector so the Ray-side plumbing (schema, batch
sizing for large binaries, actor signature, output layout) is real and
tested. Swap ``_fake_features`` for a real model/decoder at deploy time.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 8


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in features: md5 of the payload → 8 floats in
    [0, 1) (content-addressed, stable across runs/cluster sizes)."""
    h = hashlib.md5(payload).digest()
    vals = np.frombuffer(h, dtype=np.uint16).astype(np.float64) / 65536.0
    return vals[:FEATURE_DIM].tolist()


class BinaryFeatureStage:
    """Actor-pool stage over a binary column → typed metadata + feature
    vector. Large payloads → use small ``batch_size`` so
    batch × concurrency fits worker heaps (see pipelines in
    __ray_entry__)."""

    def __init__(self, column: str = "html", decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.column = column
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError(
                "real image/audio decode requires PIL/ffmpeg — not in this "
                "container; use decoder='fake' for the plumbing path"
            )
        import pyarrow.compute as pc

        col = batch[self.column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # metadata via Arrow kernels: byte length from the offsets
        # buffer, magic from a 4-byte kernel slice (the Python loop over
        # the sliced heads touches ≤4 bytes/row, never the payloads)
        n_bytes = pc.fill_null(pc.binary_length(col).cast(pa.int64()), 0)
        head = pc.binary_slice(col.cast(pa.binary()), 0, 4)
        magic = pa.array(
            [h.hex() if h is not None else "" for h in head.to_pylist()],
            pa.string(),
        )
        # md5 is inherently per-item — the only remaining per-payload
        # loop (stands in for the real per-item decoder call)
        feats = [
            _fake_features(p) if p is not None and len(p) else
            [0.0] * FEATURE_DIM
            for p in col.to_pylist()
        ]
        cols = {}
        for name in batch.column_names:
            if name != self.column:  # drop the heavy payload after decode
                cols[name] = batch[name]
        cols["payload_bytes"] = n_bytes
        cols["magic"] = magic
        cols["features"] = pa.array(feats, pa.list_(pa.float64(), FEATURE_DIM))
        return pa.table(cols)


def extract_binary_features(ds, column: str = "html", concurrency=None,
                            batch_size: int = 256):
    """Dataset with a binary column → Dataset with (payload_bytes, magic,
    features) and the payload dropped (project-early for downstream).
    ``concurrency=None`` → autoscaling actor pool sized to the node."""
    from searchengine_ray.pipelines.similarity import autoscale_concurrency

    return ds.map_batches(
        BinaryFeatureStage,
        fn_constructor_kwargs=dict(column=column),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or autoscale_concurrency(),
        num_cpus=1,
    )

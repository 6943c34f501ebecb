"""frame_sample: naive reference over handcrafted payload sizes
(empty, sub-frame, exact-grid, long) + payload drop."""

import hashlib

import pyarrow as pa
import pytest

from searchengine_ray.pipelines.multimodal import frame_sample


def _naive(p, fb, ev, mf):
    nf = (len(p) + fb - 1) // fb
    idxs = range(0, min(nf, ev * mf), ev)
    sample = b"".join(p[i * fb:(i + 1) * fb] for i in idxs)
    return nf, len(list(idxs)), len(sample), hashlib.md5(sample).digest()


@pytest.mark.usefixtures("ray_session")
def test_matches_naive():
    import numpy as np
    import ray

    payloads = [b"", b"x" * 5, b"ab" * 32, bytes(range(256)) * 7,
                b"q" * 64 * 13]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(payloads)), pa.int64()),
        "html": pa.array(payloads, pa.binary()),
    })).repartition(2)
    got = frame_sample(ds, frame_bytes=64, every=3, max_frames=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert "html" not in got.columns          # payload dropped
    for i, p in enumerate(payloads):
        nf, ns, sb, d = _naive(p, 64, 3, 4)
        row = got.iloc[i]
        assert (row.n_frames, row.n_sampled, row.sampled_bytes) \
            == (nf, ns, sb), i
        assert row.fp_hi == np.uint64(
            int.from_bytes(d[:8], "little")).view(np.int64)
        assert row.fp_lo == np.uint64(
            int.from_bytes(d[8:], "little")).view(np.int64)

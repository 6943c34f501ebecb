"""CLI completions: analyze --op clusters and the curate JSONL sink
(round-trips through the sources/jsonl reader)."""

import json
import subprocess
import sys

import pytest

SF = "/root/testdata/sf0.001"


def _run(args):
    r = subprocess.run([sys.executable, "-m", "searchengine_ray.cli",
                        *args], capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-800:]
    return r.stdout.strip().splitlines()[-1]


@pytest.mark.usefixtures("ray_session")
def test_analyze_clusters_cli(tmp_path):
    out = str(tmp_path / "cells")
    line = _run(["analyze", "--op", "clusters",
                 "--documents", f"{SF}/embeddings.parquet",
                 "--output", out, "--k", "4"])
    rep = json.loads(line)
    assert rep["op"] == "clusters"
    import pyarrow.dataset as pads

    t = pads.dataset(out).to_table()
    assert set(t.column_names) == {"vec_id", "cell"}
    assert 1 < len(set(t["cell"].to_pylist())) <= 4


@pytest.mark.usefixtures("ray_session")
def test_curate_jsonl_sink_roundtrip(tmp_path):
    out = str(tmp_path / "kw")
    line = _run(["curate", "--op", "keywords",
                 "--documents", f"{SF}/documents.parquet",
                 "--output", out, "--format", "jsonl"])
    rep = json.loads(line)
    assert rep["rows"] > 0
    import glob

    files = glob.glob(f"{out}/*.json")
    assert files
    with open(files[0]) as fh:
        first = json.loads(fh.readline())
    assert "doc_id" in first


@pytest.mark.usefixtures("ray_session")
def test_corpus_report_cli(tmp_path):
    out = str(tmp_path / "rep.json")
    line = _run(["corpus-report", "--documents",
                 f"{SF}/documents.parquet", "--output", out, "--k", "3"])
    rep = json.loads(line)
    assert rep["n_docs"] == 500
    assert set(rep["token_length_quantiles"]) == \
        {"p25", "p50", "p75", "p90", "p99"}
    assert rep["vocab_estimate"] > 0
    assert len(rep["top_terms"]) == 3
    assert 0 <= rep["exact_dup_rate"] <= rep["normalized_dup_rate"] <= 1
    with open(out) as fh:
        assert json.load(fh) == rep

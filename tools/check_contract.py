"""Driver-contract mimic: run every __ray_entry__.queries() entry at a
given sf and compare SQL-expressible ones against oracle_sql() via
DuckDB (value-exact after canonical column/row sort). Usage:

    python tools/check_contract.py [query_name ...]

Exits nonzero on any mismatch — the local stand-in for the driver's
CORRECTNESS gate.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import duckdb
import pandas as pd
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as e

SF = os.environ.get("GRAFT_CHECK_SF", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def to_pandas(res):
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset

def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

qs = e.queries()
oracles = e.oracle_sql()
only = sys.argv[1:] or list(qs)
fails = []
for name in only:
    fn = qs[name]
    t0 = time.time()
    try:
        ours = to_pandas(fn(SF))
        if name in oracles:
            ours = canon(ours)
    except Exception as ex:
        import traceback; traceback.print_exc()
        fails.append((name, f"RAY FAIL {ex}"))
        continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"{name:24s} rows-only rows={len(ours)} ({dt:.1f}s)")
        if len(ours) == 0 and name != "lsh_candidates":
            fails.append((name, "0 rows"))
        continue
    try:
        theirs = canon(con.sql(oracles[name]).df())
    except Exception as ex:
        fails.append((name, f"SQL FAIL {ex}"))
        continue
    ok_shape = list(ours.columns) == list(theirs.columns) and len(ours) == len(theirs)
    ok_vals = ok_shape and ours.equals(theirs)
    if not ok_vals and ok_shape:
        # look closer: dtype-insensitive compare
        try:
            pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)
            ok_vals = True
        except AssertionError as ex:
            detail = str(ex).splitlines()[:6]
            print("DETAIL", name, detail)
    status = "OK" if ok_vals else "MISMATCH"
    print(f"{name:24s} {status} rows={len(ours)}/{len(theirs)} cols={list(ours.columns)} ({dt:.1f}s)")
    if not ok_vals:
        fails.append((name, "mismatch"))
        print("  ours:", ours.head(3).to_dict("records"))
        print("  sql :", theirs.head(3).to_dict("records"))

print("\nFAILS:", fails if fails else "none")
ray.shutdown()
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran
  2. runs each oracle_sql.json query in DuckDB with views over <sfDir>
  3. compares to the Spark parquet dump: columns sorted by name, rows
     sorted, exact value equality (reports max |diff| for floats).
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = norm(pd.concat([pd.read_parquet(p) for p in sorted(files)]))
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        ok = True
        # dtype parity matters beyond value equality: the driver hashes
        # FORMATTED values, so int64 3365 vs float64 3365.0 (e.g. a DuckDB
        # HUGEINT sum() surfacing as float in pandas) hash-mismatches even
        # when every value compares equal numerically.
        for c in got.columns:
            gk = got[c].dtype.kind
            wk = want[c].dtype.kind
            if gk != wk and not (len(got) == 0):
                print(f"FAIL {name}: col {c} dtype kind {got[c].dtype}"
                      f" != {want[c].dtype} (driver hash would diverge)")
                ok = False
        for c in got.columns:
            g, w = got[c], want[c]
            try:
                gf = pd.to_numeric(g, errors="raise")
                wf = pd.to_numeric(w, errors="raise")
                if not (gf.fillna(-1e308) == wf.fillna(-1e308)).all():
                    mx = (gf - wf).abs().max()
                    print(f"FAIL {name}: col {c} maxdiff={mx}")
                    ok = False
            except (ValueError, TypeError):
                if not (g.fillna("\0") == w.fillna("\0")).all():
                    bad = (g.fillna("\0") != w.fillna("\0"))
                    print(f"FAIL {name}: col {c} first mismatch: "
                          f"{g[bad].iloc[0]!r} != {w[bad].iloc[0]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
        else:
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [outDir] [sfDir]
Reads outDir/<name>/ parquet (from graft.Verify) and outDir/oracle_sql.json,
runs each SQL in DuckDB with the sfDir tables registered as views, and
compares after sorting columns by name and rows by all columns.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), ignore_index=True)
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}")
        fails += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    # value compare: exact string repr (proxy for the driver's hash)
    diff_cols = []
    for c in g.columns:
        a = g[c].astype(str).values
        b = e[c].astype(str).values
        if not (a == b).all():
            n = int((a != b).sum())
            i = int((a != b).argmax())
            diff_cols.append(f"{c}({n} diffs, e.g. {a[i]!r} vs {b[i]!r}; "
                             f"dtypes {g[c].dtype}/{e[c].dtype})")
    if diff_cols:
        print(f"FAIL {name}: {'; '.join(diff_cols)}"); fails += 1
    else:
        print(f"PASS {name} ({len(g)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query
result parquet dumped by `graft.Verify`, run the matching oracle SQL in
DuckDB over the raw testdata tables and compare (columns sorted by
name, rows sorted, exact values modulo float rounding).

Usage: python3 tools/check_oracles.py <verifyOutDir> <sfDir>
"""
import json, math, sys
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df):
    # Emulate the driver: go through pandas (so DuckDB HUGEINT -> float64
    # dtype promotion is visible, exactly as the driver sees it), sort
    # columns by name, stringify values dtype-sensitively, sort rows.
    df = df[sorted(df.columns)]
    out = []
    for r in df.itertuples(index=False):
        vals = []
        for v in r:
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0: v = 0.0
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

failures = []
for name, sql in sorted(oracles.items()):
    try:
        got_df = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        got_df.columns = [c.lower() for c in got_df.columns]
        got_cols = list(got_df.columns)
        got = canon(got_df)
        exp_df = con.sql(sql).df()
        exp_df.columns = [c.lower() for c in exp_df.columns]
        exp_cols = list(exp_df.columns)
        exp = canon(exp_df)
    except Exception as e:
        failures.append(name)
        print(f"FAIL {name}: exception {type(e).__name__}: {e}")
        continue
    if sorted(got_cols) != sorted(exp_cols):
        failures.append(name)
        print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
    elif got != exp:
        failures.append(name)
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        gs, es = set(got), set(exp)
        for x in list(gs - es)[:3]: print(f"  spark-only: {x!r}")
        for x in list(es - gs)[:3]: print(f"  oracle-only: {x!r}")
    else:
        print(f"ok   {name} ({len(got)} rows)")

import os
rows_only = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}") and d not in oracles)
for name in rows_only:
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
    if n <= 0:
        failures.append(name)
        print(f"FAIL {name}: rows-only query returned 0 rows")
    else:
        print(f"ok   {name} (rows-only, {n} rows)")

print(f"\n{len(oracles) - len(failures)}/{len(oracles)} oracle-checked queries match; "
      f"{len(rows_only)} rows-only checked")
sys.exit(1 if failures else 0)

#!/usr/bin/env python3
"""Dev-only checker mimicking the driver's correctness gate:
runs graft.Verify output against DuckDB oracles and compares
(sorted-columns, sorted-rows) value hashes. Not part of the library.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns-truncated-to-us strings
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].dt.floor("us").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name in sorted(oracle):
    pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not pq:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = canon(pd.read_parquet(os.path.join(out_dir, name)))
    try:
        want = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    eq = got.equals(want)
    if not eq:
        diff = (got != want) & ~(got.isna() & want.isna())
        cells = int(diff.values.sum())
        print(f"FAIL {name}: {cells} differing cells")
        idx = diff.any(axis=1)
        print(pd.concat([got[idx].head(3), want[idx].head(3)], keys=["got","want"]))
        fails += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)

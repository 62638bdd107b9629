#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: replay oracle_sql.json in
DuckDB over the same sf dir, compare against Verify's parquet dumps
(columns sorted by name, values compared exactly)."""
import sys, json, glob, duckdb, pandas as pd, numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)): return "NULL"
        if isinstance(v, float): return repr(v)
        if isinstance(v, (list, np.ndarray)): return str(list(v))
        return str(v)
    return [[cell(v) for v in row] for row in df.itertuples(index=False)]

fails, passes = [], []
for name in sorted(oracle):
    pq = f"{out_dir}/{name}"
    files = glob.glob(f"{pq}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    sdf = pd.read_parquet(pq)
    if sorted(sdf.columns) != sorted(odf.columns):
        fails.append((name, f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")); continue
    if len(sdf) != len(odf):
        fails.append((name, f"rows: spark={len(sdf)} oracle={len(odf)}")); continue
    a, b = canon(sdf), canon(odf)
    if a != b:
        bad = next(i for i in range(len(a)) if a[i] != b[i])
        fails.append((name, f"values differ at row {bad}: spark={a[bad]} oracle={b[bad]}")); continue
    passes.append(name)
print(f"PASS {len(passes)}  FAIL {len(fails)}")
for n, why in fails: print(f"  FAIL {n}: {why[:300]}")

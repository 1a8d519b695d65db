#!/usr/bin/env python3
"""Local twin of the driver's DuckDB oracle compare: run each oracle SQL
against the sf parquet tables + Verify fixtures, compare to the Spark
parquet dumps (rows, schema by sorted column names, value hash)."""
import duckdb, json, sys, glob
import pandas as pd
import pandas.util

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
sql = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails = []
for name in sorted(sql):
    if only and name not in only: continue
    try:
        odf = con.sql(sql[name]).df()
        files = glob.glob(f"{out}/{name}/*.parquet")
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        o, s = norm(odf), norm(sdf)
        rows = len(o) == len(s)
        schema = list(o.columns) == list(s.columns)
        h = False
        if rows and schema:
            h = pandas.util.hash_pandas_object(o.astype(str), index=False).sum() == \
                pandas.util.hash_pandas_object(s.astype(str), index=False).sum()
        status = "OK" if (rows and schema and h) else f"FAIL rows={len(s)}/{len(o)} schema={schema} hash={h}"
        if not (rows and schema and h): fails.append(name)
        print(f"{name}: {status}")
    except Exception as e:
        fails.append(name)
        print(f"{name}: ERROR {str(e)[:300]}")
print("\nFAILED:", fails if fails else "none")

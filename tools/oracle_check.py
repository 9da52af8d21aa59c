#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py /tmp/verify_out /root/testdata/sf0.01
Compares each <out>/<query> parquet against the DuckDB result of
<out>/oracle_sql.json[query], with columns sorted by name and rows sorted.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    files = glob.glob(spark_path + "/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
    spark = pd.read_parquet(spark_path)
    try:
        d, s = canon(duck), canon(spark)
    except Exception as e:
        print(f"FAIL {name}: canon error: {e}"); n_fail += 1; continue
    if list(d.columns) != list(s.columns):
        print(f"FAIL {name}: columns {list(d.columns)} vs {list(s.columns)}"); n_fail += 1; continue
    if len(d) != len(s):
        print(f"FAIL {name}: rows {len(d)} vs {len(s)}"); n_fail += 1; continue
    ok = True
    for c in d.columns:
        dv, sv = d[c].values, s[c].values
        if dv.dtype.kind == 'f' or sv.dtype.kind == 'f':
            eq = np.array_equal(dv.astype(float), sv.astype(float), equal_nan=True)
        else:
            eq = (pd.Series(dv).astype(str) == pd.Series(sv).astype(str)).all()
        if not eq:
            ok = False
            mask = ~(pd.Series(dv).astype(str) == pd.Series(sv).astype(str))
            idx = np.where(mask)[0][:3]
            print(f"FAIL {name}: col {c} differs at rows {idx.tolist()}"
                  f" duck={dv[idx][:3].tolist()} spark={sv[idx][:3].tolist()}"
                  f" dtypes d={dv.dtype} s={sv.dtype}")
            break
    if ok:
        # dtype strictness report (value-equal but type-differs)
        dt = [(c, str(d[c].dtype), str(s[c].dtype)) for c in d.columns
              if str(d[c].dtype) != str(s[c].dtype)]
        note = f"  [dtype diff: {dt}]" if dt else ""
        print(f"PASS {name} ({len(d)} rows){note}"); n_pass += 1
    else:
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, "
      f"{len(glob.glob(out_dir + '/*')) - 1 - len(oracle)} rows-only (no oracle)")

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py /tmp/verify_out /root/testdata/sf0.01 [out.json]
Compares each <out>/<query> parquet against the DuckDB result of
<out>/oracle_sql.json[query], with columns sorted by name and rows sorted.
With a third argument, also writes the per-query verdicts in the driver's
CORRECTNESS format: {query: {rows_match, schema_match, hash_match, err}}.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
verdicts = {}

def record(name, rows=False, schema=False, hashm=False, err=None):
    verdicts[name] = {"rows_match": bool(rows), "schema_match": bool(schema),
                      "hash_match": bool(hashm), "err": err}
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
        print(f"FAIL {name}: no spark output"); n_fail += 1
        record(name, err="no spark output"); continue
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1
        record(name, err=f"duckdb error: {e}"); continue
    spark = pd.read_parquet(spark_path)
    try:
        d, s = canon(duck), canon(spark)
    except Exception as e:
        print(f"FAIL {name}: canon error: {e}"); n_fail += 1
        record(name, err=f"canon error: {e}"); continue
    if list(d.columns) != list(s.columns):
        print(f"FAIL {name}: columns {list(d.columns)} vs {list(s.columns)}"); n_fail += 1
        record(name, rows=len(d) == len(s),
               err=f"columns {list(d.columns)} vs {list(s.columns)}"); continue
    if len(d) != len(s):
        print(f"FAIL {name}: rows {len(d)} vs {len(s)}"); n_fail += 1
        record(name, schema=True, err=f"rows {len(d)} vs {len(s)}"); continue
    ok = True
    for c in d.columns:
        dv, sv = d[c].values, s[c].values
        if dv.dtype.kind == 'f' or sv.dtype.kind == 'f':
            eq = np.array_equal(dv.astype(float), sv.astype(float), equal_nan=True)
        else:
            eq = (pd.Series(dv).astype(str) == pd.Series(sv).astype(str)).all()
        if not eq:
            ok = False
            badcol = c
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
        record(name, rows=True, schema=True, hashm=True)
    else:
        n_fail += 1
        record(name, rows=True, schema=True, err=f"col {badcol} value mismatch")

print(f"\n{n_pass} pass, {n_fail} fail, "
      f"{len(glob.glob(out_dir + '/*')) - 1 - len(oracle)} rows-only (no oracle)")
if json_out:
    json.dump(verdicts, open(json_out, "w"), indent=1, sort_keys=True)
    print(f"wrote {json_out} ({len(verdicts)} queries)")

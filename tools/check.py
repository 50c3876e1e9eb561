#!/usr/bin/env python3
"""Local oracle cross-check: compare Verify.scala parquet dumps vs DuckDB
running SparkEntry.oracleSql over the same sf-dir tables. Mirrors the
driver's t2 gate (values sorted by column name; dtypes reported)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{spark_dir}/*.parquet"))])
    except Exception as e:
        print(f"FAIL {name}: no spark result ({e})"); fail += 1; continue
    try:
        ddf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}"); fail += 1; continue
    problems = []
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
    elif len(sdf) != len(ddf):
        problems.append(f"rows spark={len(sdf)} duck={len(ddf)}")
    else:
        s = sdf[scols].sort_values(scols).reset_index(drop=True)
        dd = ddf[dcols].sort_values(dcols).reset_index(drop=True)
        for c in scols:
            a, b = s[c], dd[c]
            if a.dtype != b.dtype:
                try:
                    a = a.astype("object"); b = b.astype("object")
                except Exception: pass
            eq = a.fillna("__N__").astype(str).eq(b.fillna("__N__").astype(str))
            if not eq.all():
                i = int(np.argmin(eq.values))
                problems.append(f"col {c}: first diff row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
        # dtype report (informational mismatch)
        for c in scols:
            if str(sdf[c].dtype) != str(ddf[c].dtype):
                problems.append(f"DTYPE col {c}: spark={sdf[c].dtype} duck={ddf[c].dtype}")
    if any(not p.startswith("DTYPE") for p in problems):
        print(f"FAIL {name}")
        for p in problems[:6]: print(f"   {p}")
        fail += 1
    else:
        tag = " (dtype diff: " + "; ".join(p for p in problems) + ")" if problems else ""
        print(f"OK   {name} rows={len(sdf)}{tag}")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

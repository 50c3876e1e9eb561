#!/usr/bin/env python3
"""Dev helper mirroring the driver's DuckDB oracle compare: for each query
name, read the Spark parquet dump and run the oracle SQL from SparkEntry
against the sf-dir parquet tables, then compare sorted values."""
import sys, glob, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, oracle_json, *names):
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    for t in TABLES:
        files = glob.glob(f"{sf_dir}/{t}.parquet")
        if files:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    for name in names:
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        sdf = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        odf = con.execute(oracles[name]).fetchdf()
        # normalize: sort columns by name, sort rows, compare as strings
        scols = sorted(sdf.columns); ocols = sorted(odf.columns)
        print(f"== {name}: spark {len(sdf)} rows, oracle {len(odf)} rows")
        if scols != ocols:
            print(f"  SCHEMA MISMATCH: {scols} vs {ocols}"); continue
        s = sdf[scols].astype(str).sort_values(scols).reset_index(drop=True)
        o = odf[ocols].astype(str).sort_values(ocols).reset_index(drop=True)
        if len(s) != len(o):
            print("  ROWCOUNT MISMATCH")
        eq = s.equals(o)
        print(f"  values match: {eq}")
        if not eq and len(s) == len(o):
            neq = (s != o).any(axis=1)
            print(s[neq].head(5)); print(o[neq].head(5))

if __name__ == "__main__":
    main(*sys.argv[1:])

#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs the
matching oracle_sql.json query in DuckDB with tables registered as views
over <sfDir>/*.parquet. Compares row count, sorted-column-name schema, and
a hash over values with rows sorted canonically.
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(repr(v) for v in t))
    return cols, sorted(rows)

fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        print(f"MISSING  {name}"); fails += 1; continue
    sp = con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
    du = con.execute(sql).df()
    sc, sr = canon(sp)
    dc, dr = canon(du)
    if sc != dc:
        print(f"SCHEMA   {name}: spark={sc} duck={dc}"); fails += 1; continue
    if len(sr) != len(dr):
        print(f"ROWCOUNT {name}: spark={len(sr)} duck={len(dr)}"); fails += 1; continue
    if sr != dr:
        bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
        print(f"VALUES   {name}: first diffs at rows {bad}")
        for i in bad:
            print(f"  spark: {sr[i]}\n  duck : {dr[i]}")
        fails += 1; continue
    print(f"OK       {name} ({len(sr)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)

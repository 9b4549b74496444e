#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle_sql.json
query in DuckDB over the sf parquet tables, compare to the Verify.scala parquet
dumps (columns sorted by name, rows sorted, values compared)."""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    spark_tbl = pq.read_table(files[0]).to_pylist()
    try:
        duck = con.execute(sql)
        cols = [d[0] for d in duck.description]
        duck_rows = [dict(zip(cols, r)) for r in duck.fetchall()]
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue

    def norm(rows):
        out = []
        for r in rows:
            nr = {}
            for k in sorted(r):
                v = r[k]
                if hasattr(v, "isoformat"):
                    v = v.isoformat()
                if isinstance(v, float) and math.isnan(v):
                    v = "NaN"
                nr[k] = v
            out.append(tuple(nr.items()))
        return sorted(out, key=repr)

    a, b = norm(spark_tbl), norm(duck_rows)

    # Mimic the driver's hash canonicalization: it reads both sides through
    # pandas (duckdb .df() downcasts DECIMAL/HUGEINT to float64; spark parquet
    # keeps decimal128/int64 as object/int64). A dtype-kind mismatch means the
    # driver's hash_match would fail even when the Python values above agree.
    import pandas as pd
    spark_df = pq.read_table(files[0]).to_pandas()
    duck_df = con.execute(sql).df()
    dtype_mismatch = []
    for c in sorted(set(spark_df.columns) & set(duck_df.columns)):
        ks, kd = spark_df[c].dtype.kind, duck_df[c].dtype.kind
        if ks != kd:
            dtype_mismatch.append((c, str(spark_df[c].dtype), str(duck_df[c].dtype)))

    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
        fail += 1
    elif a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"FAIL {name}: {len([1 for x,y in zip(a,b) if x!=y])} mismatched rows; first: {diffs}")
        fail += 1
    elif dtype_mismatch:
        print(f"FAIL {name}: values equal but dtype kinds differ (driver hash would fail): {dtype_mismatch}")
        fail += 1
    else:
        print(f"OK   {name}: {len(a)} rows")
print(f"{'ALL OK' if fail == 0 else str(fail) + ' FAILURES'}")
sys.exit(1 if fail else 0)

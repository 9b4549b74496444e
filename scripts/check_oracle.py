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
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
        fail += 1
    elif a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"FAIL {name}: {len([1 for x,y in zip(a,b) if x!=y])} mismatched rows; first: {diffs}")
        fail += 1
    else:
        print(f"OK   {name}: {len(a)} rows")
print(f"{'ALL OK' if fail == 0 else str(fail) + ' FAILURES'}")
sys.exit(1 if fail else 0)

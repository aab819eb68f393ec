#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs oracle_sql.json in
DuckDB against the sf parquet tables and compares with the Spark results
dumped by graft.Verify (column-name-sorted, row-sorted, value-normalized)."""
import sys, json, glob, math
import duckdb

verify_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool): return str(int(v))
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out)

fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{verify_dir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    srel = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
    scols = [d[0] for d in srel.description]; srows = srel.fetchall()
    try:
        orel = con.execute(sql)
        ocols = [d[0] for d in orel.description]; orows = orel.fetchall()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails += 1; continue
    if sorted(scols) != sorted(ocols):
        print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"); fails += 1; continue
    a, b = canon(srows, scols), canon(orows, ocols)
    if a == b:
        print(f"{name}: OK ({len(a)} rows)")
    else:
        fails += 1
        print(f"{name}: VALUE MISMATCH spark_rows={len(a)} oracle_rows={len(b)}")
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"  first diff at row {i}:\n    spark : {x}\n    oracle: {y}")
                break
        else:
            if len(a) != len(b):
                print(f"  row count differs; spark extra: {a[len(b):len(b)+2]} oracle extra: {b[len(a):len(a)+2]}")

# rows-only checks for queries without oracle
all_dirs = {d.split('/')[-1] for d in glob.glob(f"{verify_dir}/*") if not d.endswith('.json')}
for name in sorted(all_dirs - set(oracle)):
    try:
        n = con.execute(f"SELECT count(*) FROM '{verify_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"{name}: rows-only n={n}" + (" (EMPTY!)" if n == 0 else ""))
    except Exception as e:
        print(f"{name}: rows-only FAILED {e}"); fails += 1

sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py [sf_dir] [verify_out_dir] [only...]

Runs each oracle SQL from verify_out/oracle_sql.json in DuckDB over the
testdata parquet, loads the Spark result parquet written by graft.Verify,
canonicalizes both (columns sorted by name, doubles rounded to 9 dp, rows
sorted), and diffs. Dev-only tool; the real gate is driver-side.
"""
import duckdb, sys, json, math, decimal, datetime

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def cv(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(cv(x) for x in v)
    return v

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(cv(r[i]) for i in idx) for r in rows]
    return sorted(data, key=lambda r: tuple((x is None, str(x)) for x in r))

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        ddf = con.execute(sql).fetchdf()
        scols, dcols = list(sdf.columns), list(ddf.columns)
        if sorted(scols) != sorted(dcols):
            print(f"{name}: COLS MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            fails.append(name)
            continue
        # The driver hashes pandas values, so dtype families must agree:
        # a DuckDB HUGEINT sum materializes as float64 while Spark writes
        # int64 — identical values, different hash. Catch that here.
        def fam(dt):
            k = dt.kind
            return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, "other")
        dtbad = [c for c in scols if fam(sdf[c].dtype) != fam(ddf[c].dtype)]
        if dtbad:
            print(f"{name}: DTYPE MISMATCH " + ", ".join(
                f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}" for c in dtbad))
            fails.append(name)
            continue
        srows = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchall()
        drows = con.execute(sql).fetchall()
        a, b = canon(srows, scols), canon(drows, dcols)
        if a != b:
            print(f"{name}: ROWS MISMATCH spark={len(a)} duck={len(b)} cols={sorted(scols)}")
            shown = 0
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:3]:
                print(f"  spark-only: {r}")
            for r in list(sb - sa)[:3]:
                print(f"  duck-only : {r}")
            fails.append(name)
        else:
            print(f"{name}: OK ({len(a)} rows)")
    except Exception as e:
        print(f"{name}: ERROR {e}")
        fails.append(name)

print("FAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)

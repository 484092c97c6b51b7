#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet result written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the sf
tables, and compares: column names (sorted), row count, and a hash over
rows sorted with columns in name order — mirroring the driver's compare
as documented (sorts columns by name before hashing values).
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if val != val:
            return "nan"
        # normalized float formatting: 12 significant digits
        return f"{val:.12g}"
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet({files!r})")
            sp_cols = [c[0] for c in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(oracle[name])
            du_cols = [c[0] for c in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(sp_cols) != sorted(du_cols):
            problems.append(f"cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
        if len(sp_rows) != len(du_rows):
            problems.append(f"rows spark={len(sp_rows)} duck={len(du_rows)}")
        if not problems and table_hash(sp_cols, sp_rows) != table_hash(du_cols, du_rows):
            order = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
            a = sorted("|".join(canon(r[i]) for i in order) for r in sp_rows)
            dorder = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
            b = sorted("|".join(canon(r[i]) for i in dorder) for r in du_rows)
            diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), None)
            problems.append(f"hash mismatch; first diff row {diff}:\n  spark={a[diff][:300] if diff is not None else '?'}\n  duck ={b[diff][:300] if diff is not None else '?'}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>
       python3 scripts/check.py --selftest

Reads each <out>/<name> parquet result written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the sf
tables, and compares: column names (sorted), column type classes, row
count, and a hash over rows sorted with columns in name order —
mirroring the driver's compare as documented (sorts columns by name
before hashing values).

Each side is compared on two planes, fetched differently on purpose:
 - TYPE CLASSES come from pandas dtypes (fetchdf), mirroring the
   driver's canonicalization: DuckDB HUGEINT (integer SUM) surfaces as
   float64 there while Spark's BIGINT stays int64, so an uncast
   integer-SUM oracle fails HERE exactly as it does at the driver gate
   (round 1 passed 82/82 locally while the driver failed 3 for this).
   The dtypes MUST come from the real result, not a `LIMIT 0` schema
   probe: pandas dtype mapping is value-dependent — a BIGINT column
   that CONTAINS nulls surfaces as float64, while the same column's
   empty probe stays int64 — so a probe would diverge from the driver
   exactly the way this gate exists to prevent. The query therefore
   executes twice (once per plane); oracle queries are sf0.01-sized,
   so the cost is noise.
 - VALUES come from one fetchall() of the real query: pandas float
   columns conflate NULL with a computed NaN, so hashing pandas rows
   would silently pass a NaN-vs-NULL divergence; fetchall keeps None
   and float('nan') distinct. (fetchall alone can't replace the dtype
   plane: HUGEINT -> Python int -> str would collide with int64.)
"""
import sys, os, json, glob, hashlib
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def type_class(dtype):
    """Coarse class of a pandas/numpy dtype for compatibility compare.

    int64-vs-float64 (the HUGEINT trap) must differ; int32-vs-int64 or
    float32-vs-float64 are the same logical type at different widths.
    """
    k = getattr(dtype, "kind", None)
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "timestamp"
    return "object"  # strings, lists, decimals-as-object, bytes, dates

def fetch(con, sql):
    """Fetch both planes of the compare: fetchdf of the REAL result for
    the driver's dtype-class canonicalization (value-dependent: e.g.
    BIGINT-with-nulls -> float64, so no LIMIT 0 schema probe can stand
    in), fetchall for values (pandas float columns conflate NULL with a
    computed NaN; fetchall keeps None and float('nan') distinct). See
    module docstring."""
    df = con.execute(sql).fetchdf()
    cols = list(df.columns)
    classes = [type_class(df[c].dtype) for c in cols]
    rows = con.execute(sql).fetchall()
    return cols, classes, rows

def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if val != val:
            return "NaN"  # a COMPUTED NaN is data, not NULL
        # normalized float formatting: 12 significant digits
        return f"{val:.12g}"
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, (list, np.ndarray)):
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

def compare(sp_cols, sp_classes, sp_rows, du_cols, du_classes, du_rows):
    """Return a list of problem strings (empty = match)."""
    problems = []
    if sorted(sp_cols) != sorted(du_cols):
        problems.append(f"cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
        return problems
    # name-aligned type-class compare: catches HUGEINT-vs-BIGINT and
    # float-vs-int divergences even when the rendered values collide
    sp_by = dict(zip(sp_cols, sp_classes))
    du_by = dict(zip(du_cols, du_classes))
    for c in sorted(sp_by):
        if sp_by[c] != du_by[c]:
            problems.append(f"type class mismatch on '{c}': spark={sp_by[c]} duck={du_by[c]}")
    if len(sp_rows) != len(du_rows):
        problems.append(f"rows spark={len(sp_rows)} duck={len(du_rows)}")
    if not problems and table_hash(sp_cols, sp_rows) != table_hash(du_cols, du_rows):
        order = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
        a = sorted("|".join(canon(r[i]) for i in order) for r in sp_rows)
        dorder = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
        b = sorted("|".join(canon(r[i]) for i in dorder) for r in du_rows)
        diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), None)
        problems.append(
            f"hash mismatch; first diff row {diff}:\n"
            f"  spark={a[diff][:300] if diff is not None else '?'}\n"
            f"  duck ={b[diff][:300] if diff is not None else '?'}")
    return problems

def selftest():
    """Regression: an uncast integer SUM must FAIL the gate (HUGEINT ->
    float64 vs Spark int64), and the CAST(... AS BIGINT) form must PASS."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(x AS INTEGER) AS x FROM range(5) r(x)")
    # "spark side": what Spark would emit for sum(int) — an int64 column
    sp = fetch(con, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM t")
    bad = fetch(con, "SELECT SUM(x) AS s FROM t")          # HUGEINT
    good = fetch(con, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM t")
    p_bad = compare(*sp, *bad)
    p_good = compare(*sp, *good)
    assert p_bad, "uncast integer SUM should fail the gate but passed"
    assert any("type class" in p for p in p_bad), f"expected type-class problem, got {p_bad}"
    assert not p_good, f"cast integer SUM should pass, got {p_good}"
    # computed NaN is DATA: it must not silently pass against a NULL
    nan = fetch(con, "SELECT CAST('NaN' AS DOUBLE) AS v")
    nul = fetch(con, "SELECT CAST(NULL AS DOUBLE) AS v")
    p_nan_null = compare(*nan, *nul)
    p_nan_nan = compare(*nan, *fetch(con, "SELECT CAST('NaN' AS DOUBLE) AS v"))
    assert p_nan_null, "NaN vs NULL should fail the gate but passed"
    assert not p_nan_nan, f"NaN vs NaN should pass, got {p_nan_nan}"
    # dtype classes must come from the REAL result, not a schema probe:
    # pandas maps BIGINT-with-nulls to float64, so an int-with-null
    # column compares as float against a float oracle (what the driver
    # sees); a LIMIT 0 probe would call it int and fail spuriously
    int_null = fetch(con, "SELECT CAST(NULL AS BIGINT) AS v UNION ALL SELECT 1")
    dbl_null = fetch(con, "SELECT CAST(NULL AS DOUBLE) AS v UNION ALL SELECT 1.0")
    p_int_dbl = compare(*int_null, *dbl_null)
    assert not p_int_dbl, f"nullable-int vs double should pass (both float64), got {p_int_dbl}"
    print("selftest OK: uncast integer SUM fails, CAST AS BIGINT passes, "
          "NaN!=NULL, NaN==NaN, nullable-int==double")

def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
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
            sp = fetch(con, f"SELECT * FROM read_parquet({files!r})")
            du = fetch(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = compare(*sp, *du)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp[2])} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

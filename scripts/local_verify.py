#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/local_verify.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by graft.Verify plus oracle_sql.json,
runs every oracle in DuckDB against the sf parquet tables, and compares:
column names (sorted), row counts, cell values (rows sorted, NaN-safe),
AND column type-classes (DESCRIBE both sides). The driver's hash is
type-sensitive beyond integer width: an oracle emitting HUGEINT/decimal128
(e.g. an uncast sum() over ints) fails at the driver even when values are
identical — round 6 shipped exactly that (q59/q60/q62). Int-width diffs
(INTEGER vs BIGINT vs TINYINT...) stay tolerated to match the driver.
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}

def type_class(t):
    """Collapse a DuckDB type name to the class the driver's hash cares about.
    Int widths collapse together (driver-normalized); DECIMAL/HUGEINT do NOT
    collapse into int — that is the round-6 failure class."""
    t = t.upper()
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT"):
        return "decimal"
    if t in _INT_TYPES:
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("VARCHAR") or t in ("STRING", "TEXT"):
        return "string"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t

def describe_types(con, sql):
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("\x01".join(norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Declared-query manifest (written by Verify): any declared query with no
    # output dir is a hard failure — round 7 lost q33 to exactly this
    # (AnalysisException swallowed to stderr, row absent from the gate).
    declared = []
    mpath = f"{out_dir}/queries.json"
    if os.path.exists(mpath):
        declared = json.load(open(mpath))
    results = {}
    dirs = {n for n in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, n))}
    for name in declared:
        if name not in dirs:
            results[name] = "MISSING: declared in SparkEntry.queries but no output dir"
    for name in sorted(dirs):
        d = os.path.join(out_dir, name)
        if os.path.exists(f"{d}/_error.txt"):
            results[name] = "QUERY_ERROR: " + open(f"{d}/_error.txt").read().strip()[:300]
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchall()
        got_cols = [c[0] for c in con.description]
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if not got else "")
            continue
        try:
            want = con.execute(oracles[name]).fetchall()
            want_cols = [c[0] for c in con.description]
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        gc, gk = frame_key(got_cols, got)
        wc, wk = frame_key(want_cols, want)
        type_errs = []
        try:
            got_t = describe_types(con, f"SELECT * FROM '{d}/*.parquet'")
            want_t = describe_types(con, oracles[name])
            for col in sorted(set(got_t) & set(want_t)):
                a, b = type_class(got_t[col]), type_class(want_t[col])
                if a != b:
                    type_errs.append(f"{col}: spark={got_t[col]}({a}) vs oracle={want_t[col]}({b})")
        except Exception as e:
            type_errs.append(f"DESCRIBE failed: {e}")
        if gc != wc:
            results[name] = f"SCHEMA_MISMATCH got={gc} want={wc}"
        elif type_errs:
            results[name] = "TYPE_MISMATCH " + "; ".join(type_errs)
        elif len(gk) != len(wk):
            results[name] = f"ROWCOUNT got={len(gk)} want={len(wk)}"
        elif gk != wk:
            bad = next(i for i in range(len(gk)) if gk[i] != wk[i])
            results[name] = (f"VALUE_MISMATCH first at sorted-row {bad}:\n"
                             f"    got : {gk[bad][:300]}\n"
                             f"    want: {wk[bad][:300]}")
        else:
            results[name] = f"OK rows={len(gk)}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(f"{'✓' if v.startswith('OK') else '✗' if 'ONLY' not in v else '~'} {k}: {v}")
    print(f"\n{n_ok}/{len([k for k in results if k in oracles])} oracle-checked OK, "
          f"{len(results)} total")
    hard_fail = [k for k, v in results.items()
                 if not (v.startswith("OK") or v.startswith("ROWS_ONLY"))]
    if declared and len(dirs) != len(declared):
        print(f"GATE FAIL: {len(declared)} queries declared, {len(dirs)} output dirs")
        sys.exit(1)
    if hard_fail:
        print(f"GATE FAIL: {len(hard_fail)} failing: {', '.join(hard_fail)}")
        sys.exit(1)
    print("GATE PASS")

if __name__ == "__main__":
    main()

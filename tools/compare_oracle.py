#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table as a view, runs every oracle SQL from
oracle_sql.json, and compares against the Spark-written parquet result:
column names (sorted), row counts, and values (rows sorted, NaN-safe).
"""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
# Engine provenance first (VERDICT r12 #5): every red-row adjudication
# starts with "which DuckDB disagreed". The driver runs its own DuckDB
# build; this line pins what the LOCAL compare ran.
print(f"engines: duckdb={duckdb.__version__} (local compare; "
      f"driver build may differ — see _meta.json for the Spark side)")
con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sfdir}/{tbl}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    return repr(v)

fails = 0
# Oracle-type lint (root cause of the r10-r12 driver-red trio): DuckDB's
# SUM(BIGINT) returns HUGEINT (int128). Python fetchall() coerces it to
# int — so a LOCAL compare passes — but the driver's canonicalization is
# type-sensitive for int128 and the row goes red driver-side only. Every
# final oracle column must therefore be a type Spark parquet can also
# carry. Hard-fail here so the class can never ship again. (int64-vs-int32
# and DECIMAL-vs-DOUBLE cross-type pairs are driver-green-proven benign:
# q_calibration/q_isotonic/q_pr_table.)
EXOTIC = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t) in EXOTIC]
        if bad:
            print(f"FAIL {name}: oracle emits driver-unsafe column type(s) "
                  f"{bad} — CAST the aggregate to BIGINT")
            fails += 1
    except Exception:
        pass  # the value compare below reports query errors
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql)
        exp_cols = sorted(exp.columns)
        exp_rows = exp.fetchall()
        got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        got_cols = sorted(got.columns)
        got_rows = got.fetchall()
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns differ\n  spark: {got_cols}\n  duck:  {exp_cols}")
            fails += 1
            continue
        # reorder values by sorted column name, then sort rows canonically
        def keyed(rows, cols):
            idx = [cols.index(c) for c in sorted(cols)]
            return sorted([tuple(canon(r[i]) for i in idx) for r in rows])
        ge, ee = keyed(got_rows, got.columns), keyed(exp_rows, exp.columns)
        if len(ge) != len(ee):
            print(f"FAIL {name}: row count {len(ge)} vs {len(ee)}")
            fails += 1
        elif ge != ee:
            bad = [(a, b) for a, b in zip(ge, ee) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {bad}")
            fails += 1
        else:
            print(f"OK   {name}: {len(ge)} rows")
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1

import os
result_dirs = {d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d))}
rows_only = sorted(result_dirs - set(oracle))
no_result = sorted(set(oracle) - result_dirs)
if rows_only:
    print(f"\nrows-only (no oracle): {', '.join(rows_only)}")
if no_result:
    print(f"ORACLE WITHOUT RESULT DIR (query failed?): {', '.join(no_result)}")
    fails += len(no_result)
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Registry-wide oracle-robustness lint over DEGENERATE fixtures
(VERDICT r13 #4): run every oracle against the empty (n0) and
single-row (n1) corpora from graft.DegenerateCorpus, classify both
sides, and fail on the divergence classes the point-wise ADVICE fixes
belonged to:

  DIFF           both sides ok but values differ            -> FAIL
  POISON         exactly one side emits NaN/Inf             -> FAIL
  ORACLE_FRAGILE oracle errors while the engine succeeded   -> FAIL
  CONTRACT       engine raised (require/contract) — oracle
                 outcome irrelevant; listed, not failed
  PASS           both ok and equal (or both raised)

Usage: degenerate_lint.py <degTableDir> <verifyOutDir> [allowlist.json]

<degTableDir>  one variant dir (e.g. /tmp/graft_degenerate/n0)
<verifyOutDir> graft.Verify output over that same dir
allowlist      optional {query: reason} for justified divergences
"""
import json, math, os, sys
import duckdb

degdir, outdir = sys.argv[1], sys.argv[2]
allow = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else {}

print(f"engines: duckdb={duckdb.__version__} over {degdir}")
con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    # DegenerateCorpus writes Spark-style directories; glob the parts
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{degdir}/{tbl}.parquet/*.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
engine_fail = json.load(open(f"{outdir}/_verify_failures.json"))


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


def nonfinite(rows):
    def bad(v):
        if isinstance(v, float):
            return math.isnan(v) or math.isinf(v)
        if isinstance(v, list):
            return any(bad(x) for x in v)
        return False
    return any(bad(v) for r in rows for v in r)


counts = {"PASS": 0, "CONTRACT": 0, "DIFF": 0, "POISON": 0,
          "ORACLE_FRAGILE": 0, "ALLOWED": 0}
fails = []
for name, sql in sorted(oracle.items()):
    if name in engine_fail:
        # the engine refused the degenerate input by contract; record and
        # move on — a require() raise is the DOCUMENTED behavior, and the
        # driver never runs an oracle without its engine row
        counts["CONTRACT"] += 1
        continue
    try:
        exp = con.sql(sql)
        exp_cols, exp_rows = exp.columns, exp.fetchall()
    except Exception as e:
        if name in allow:
            counts["ALLOWED"] += 1
            continue
        counts["ORACLE_FRAGILE"] += 1
        fails.append((name, f"oracle error on degenerate input: {e}"))
        continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        got_cols, got_rows = got.columns, got.fetchall()
    except Exception:
        # engine wrote no readable result (e.g. zero part files for an
        # empty frame written by an old Spark) — treat as empty
        got_cols, got_rows = exp_cols, []
    verdict = None
    if nonfinite(exp_rows) != nonfinite(got_rows):
        verdict = ("POISON", "NaN/Inf on exactly one side "
                   f"(oracle={nonfinite(exp_rows)}, engine={nonfinite(got_rows)})")
    else:
        def keyed(rows, cols):
            idx = [cols.index(c) for c in sorted(cols)]
            return sorted(tuple(canon(r[i]) for i in idx) for r in rows)
        ge, ee = keyed(got_rows, got_cols), keyed(exp_rows, exp_cols)
        if sorted(got_cols) != sorted(exp_cols):
            verdict = ("DIFF", f"columns differ: {sorted(got_cols)} vs {sorted(exp_cols)}")
        elif ge != ee:
            sample = [(a, b) for a, b in zip(ge, ee) if a != b][:2]
            verdict = ("DIFF", f"rows {len(ge)} vs {len(ee)}, first diffs {sample}")
    if verdict is None:
        counts["PASS"] += 1
    elif name in allow:
        counts["ALLOWED"] += 1
    else:
        counts[verdict[0]] += 1
        fails.append((name, verdict[1]))

for name, why in fails:
    print(f"FAIL {name}: {why}")
contracts = sorted(set(engine_fail))
print(f"\ncontract raises (engine refused degenerate input): {len(contracts)}")
for n in contracts:
    print(f"  CONTRACT {n}: {engine_fail[n][:120]}")
print(f"\nsummary: {counts} over {len(oracle)} oracled queries")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the engine's parquet dumps
(columns sorted by name, rows sorted, values hashed). Usage:
  python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, os, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    got_path = f"{outdir}/{name}"
    if not os.path.isdir(got_path):
        print(f"{name}: MISSING ENGINE OUTPUT"); fails.append(name); continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails.append(name); continue
    got = con.sql(f"SELECT * FROM '{got_path}/*.parquet'").df()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"{name}: COLUMN MISMATCH exp={list(exp.columns)} got={list(got.columns)}")
        fails.append(name); continue
    if len(exp) != len(got):
        print(f"{name}: ROWCOUNT exp={len(exp)} got={len(got)}")
        fails.append(name); continue
    exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    dtype_note = ""
    for c in exp.columns:
        if str(exp[c].dtype) != str(got[c].dtype):
            dtype_note += f" [dtype {c}: exp={exp[c].dtype} got={got[c].dtype}]"
    ok = True
    for c in exp.columns:
        e, g = exp[c], got[c]
        try:
            eq = (e == g) | (e.isna() & g.isna())
        except Exception:
            eq = e.astype(str) == g.astype(str)
        if not eq.all():
            i = eq[~eq].index[0]
            print(f"{name}: VALUE MISMATCH col={c} row={i}: exp={e.iloc[i]!r} got={g.iloc[i]!r}{dtype_note}")
            ok = False; break
    if not ok:
        fails.append(name); continue
    print(f"{name}: OK ({len(exp)} rows){dtype_note}")

rows_only = [os.path.basename(d) for d in glob.glob(f"{outdir}/*")
             if os.path.isdir(d) and os.path.basename(d) not in oracle]
for name in sorted(rows_only):
    n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
    print(f"{name}: rows-only ({n} rows)")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle-checked OK; failures: {fails}")
sys.exit(1 if fails else 0)

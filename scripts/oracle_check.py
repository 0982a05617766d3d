#!/usr/bin/env python3
"""Local replica of the driver's t2 check: run each oracle_sql.json query in
DuckDB over the fixture parquet, compare to the Spark result parquet
(columns sorted by name, rows sorted, exact value compare)."""
import duckdb, json, sys, glob, math

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    try:
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}")); continue
    exp = exp[sorted(exp.columns)]; got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"cols exp={list(exp.columns)} got={list(got.columns)}")); continue
    if len(exp) != len(got):
        fails.append((name, f"rows exp={len(exp)} got={len(got)}")); continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    bad = None
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            eq = (a == b) or (a is None and b is None)
            try:
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = (math.isnan(a) and math.isnan(b)) or a == b
            except Exception:
                pass
            try:
                import pandas as pd
                if not eq and (pd.isna(a) and pd.isna(b)):
                    eq = True
            except Exception:
                pass
            if not eq:
                bad = f"col {c} row {i}: exp={a!r} got={b!r}"; break
        if bad: break
    if bad: fails.append((name, bad))
    else: print(f"  OK {name} ({len(exp)} rows)")
if fails:
    print("FAILURES:")
    for n, m in fails: print(f"  FAIL {n}: {m}")
    sys.exit(1)
print("all queries match")

#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: runs each oracle SQL in
DuckDB over the same parquet tables and compares against the Spark results
dumped by graft.Verify (column-name-sorted, row-sorted, value-level)."""
import duckdb, json, sys, glob, os
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify-out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
timings = {}
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.exists(spark_path):
        results[name] = "MISSING_SPARK_OUTPUT"
        continue
    import time as _t
    t0 = _t.time()
    try:
        ora = con.execute(sql).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    finally:
        timings[name] = _t.time() - t0
    spk = con.execute(
        f"SELECT * FROM '{spark_path}/*.parquet'").fetchdf()
    # driver-style compare: sort columns by name, then rows, then values
    ora = ora.reindex(sorted(ora.columns), axis=1)
    spk = spk.reindex(sorted(spk.columns), axis=1)
    if list(ora.columns) != list(spk.columns):
        results[name] = f"SCHEMA_MISMATCH: oracle={list(ora.columns)} spark={list(spk.columns)}"
        continue
    # dtype-strict (the driver's hash is type-WIDTH-sensitive: round 1
    # passed this twin 23/23 while the driver failed q01 on
    # DECIMAL(28,2)-vs-(38,2) and q06 on BIGINT-vs-HUGEINT): compare
    # DuckDB DESCRIBE types of both sides, sorted by column name
    ora_ty = dict(r[:2] for r in con.execute(f"DESCRIBE {sql}").fetchall())
    spk_ty = dict(r[:2] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{spark_path}/*.parquet'").fetchall())
    ty_mism = [f"{c}: oracle={ora_ty.get(c)} spark={spk_ty.get(c)}"
               for c in sorted(set(ora_ty) | set(spk_ty))
               if ora_ty.get(c) != spk_ty.get(c)]
    if ty_mism:
        results[name] = "DTYPE_MISMATCH: " + "; ".join(ty_mism)
        continue
    if len(ora) != len(spk):
        results[name] = f"ROWCOUNT_MISMATCH: oracle={len(ora)} spark={len(spk)}"
        continue
    ora_s = ora.sort_values(by=list(ora.columns)).reset_index(drop=True)
    spk_s = spk.sort_values(by=list(spk.columns)).reset_index(drop=True)
    try:
        mism = []
        for c in ora.columns:
            a, b = ora_s[c], spk_s[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                bad = ~(np.isclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=0) | (a.isna() & b.isna()))
            else:
                bad = ~((a.astype(str) == b.astype(str)) | (a.isna() & b.isna()))
            if bad.any():
                i = bad.idxmax()
                mism.append(f"{c}[row {i}]: oracle={a[i]!r} spark={b[i]!r}")
        results[name] = "OK" if not mism else "VALUE_MISMATCH: " + "; ".join(mism[:3])
    except Exception as e:
        results[name] = f"COMPARE_ERROR: {e}"

ok = sum(1 for v in results.values() if v == "OK")
for name, v in sorted(results.items()):
    t = f" [{timings.get(name, 0):5.1f}s]" if timings.get(name, 0) >= 0.5 else ""
    print(("PASS " if v == "OK" else "FAIL ") + name + t + ("" if v == "OK" else f"  {v}"))
print(f"\n{ok}/{len(results)} oracle-checked queries match "
      f"(oracle wall {sum(timings.values()):.0f}s)")
sys.exit(0 if ok == len(results) else 1)

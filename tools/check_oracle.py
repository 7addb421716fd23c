#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify's parquet
dumps + oracle_sql.json, runs each oracle in DuckDB over the same sf dir,
and compares rows/schema/values (columns sorted by name, like the driver).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1]
out = sys.argv[2]
only = set(sys.argv[3:])

with open(os.path.join(out, "oracle_sql.json")) as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

fails = 0
for name in sorted(oracles):
    if only and name not in only:
        continue
    pdir = os.path.join(out, name)
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    if not files:
        print(f"{name}: MISSING spark output")
        fails += 1
        continue
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
    try:
        ora_df = canon(con.sql(oracles[name]).df())
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        fails += 1
        continue
    ok_rows = len(spark_df) == len(ora_df)
    ok_cols = list(spark_df.columns) == list(ora_df.columns)
    ok_types = ok_cols and all(
        str(spark_df[c].dtype) == str(ora_df[c].dtype) for c in spark_df.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            ok_vals = True
            for c in spark_df.columns:
                a, b = spark_df[c].values, ora_df[c].values
                if spark_df[c].dtype == object:
                    eq = all(x == y for x, y in zip(a, b))
                elif np.issubdtype(spark_df[c].dtype, np.floating):
                    eq = np.array_equal(a, b, equal_nan=True)
                else:
                    eq = np.array_equal(a, b)
                if not eq:
                    ok_vals = False
                    idx = next(i for i in range(len(a))
                               if not (a[i] == b[i] or (pd.isna(a[i]) and pd.isna(b[i]))))
                    print(f"  {name}.{c}: first diff at row {idx}: "
                          f"spark={a[idx]!r} oracle={b[idx]!r}")
        except Exception as e:
            print(f"  {name}: compare error {e}")
    status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
    if status == "FAIL":
        fails += 1
        print(f"{name}: {status} rows {len(spark_df)}/{len(ora_df)} "
              f"cols_match={ok_cols} types_match={ok_types}")
        if not ok_cols:
            print(f"  spark cols: {list(spark_df.columns)}")
            print(f"  oracle cols: {list(ora_df.columns)}")
        elif not ok_types:
            for c in spark_df.columns:
                if str(spark_df[c].dtype) != str(ora_df[c].dtype):
                    print(f"  dtype {c}: spark={spark_df[c].dtype} oracle={ora_df[c].dtype}")
    else:
        note = "" if ok_types else " (dtype diff: " + ",".join(
            f"{c}:{spark_df[c].dtype}/{ora_df[c].dtype}" for c in spark_df.columns
            if str(spark_df[c].dtype) != str(ora_df[c].dtype)) + ")"
        print(f"{name}: OK ({len(spark_df)} rows){note}")
print(f"\n{fails} failing")
sys.exit(1 if fails else 0)

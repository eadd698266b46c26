#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf-dir parquet tables, load the engine's Verify output
parquet, sort columns by name + rows by all columns, and compare values.

Usage: python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to naive UTC
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            except Exception:
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True)

def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if list(a.columns) != list(b.columns):
        return f"SCHEMA: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = ((av.isna() & bv.isna()) |
                  (abs(av.astype(float) - bv.astype(float)) <= 1e-9 +
                   1e-9 * abs(bv.astype(float)).fillna(0))).all()
        else:
            ok = (av.fillna("<N>") == bv.fillna("<N>")).all() if av.dtype == object \
                else ((av.isna() & bv.isna()) | (av == bv)).all()
        if not ok:
            bad = None
            for i in range(len(av)):
                x, y = av.iloc[i], bv.iloc[i]
                same = (pd.isna(x) and pd.isna(y)) or x == y
                if not same:
                    bad = (i, x, y); break
            return f"VALUES col={c} first_diff={bad}"
    return "OK"

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}"); fails += 1; continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"{name}: SPARK-OUT-ERROR {e}"); fails += 1; continue
        r = compare(got, want)
        print(f"{name}: {r}" + (f" ({len(got)} rows)" if r == "OK" else ""))
        fails += r != "OK"
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
